"""Create a resharded copy of an sf dir: every table split into multiple
parquet shards with ROWS IN SHUFFLED ORDER (seeded). The engine must return
identical results on it (tests/test_order_invariance.py pins a sample;
`python tools/check_oracles.py <out_dir>` runs the FULL registry against
the shuffled layout).

Usage: python tools/reshard.py [sf_dir] [out_dir] [seed]
"""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def reshard(sf_dir: str, out_dir: str, seed: int = 123, shards: int = 5) -> str:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        df = pd.read_parquet(os.path.join(sf_dir, f"{t}.parquet"))
        df = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
        tdir = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        n = max(1, min(shards, len(df)))
        for i, idx in enumerate(np.array_split(np.arange(len(df)), n)):
            pq.write_table(
                pa.Table.from_pandas(
                    df.iloc[idx].reset_index(drop=True), preserve_index=False
                ),
                os.path.join(tdir, f"part-{i}.parquet"),
            )
    return out_dir


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/resharded_" + os.path.basename(sf.rstrip("/"))
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 123
    print(reshard(sf, out, seed))
