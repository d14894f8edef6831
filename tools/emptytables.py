"""Create a ZERO-ROW copy of an sf dir (every table keeps its schema, loses
its rows). At 100 TB empty partitions are routine -- every query must either
return an empty result that matches its SQL twin or raise a CLEAR seed-data
error (the ANN queries need a query vector by contract), never crash with an
incidental KeyError/IndexError deep in a kernel:

    python tools/emptytables.py [sf_dir] [out_dir]
    python tools/check_oracles.py <out_dir>
"""

import os
import shutil
import sys

import pyarrow.parquet as pq


def make_empty(sf_dir: str, out_dir: str) -> str:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(sf_dir, f))
            pq.write_table(t.slice(0, 0), os.path.join(out_dir, f))
    return out_dir


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_empty"
    print(make_empty(sf, out))
