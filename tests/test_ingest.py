import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from wikidata_qrank_ray.stages.ingest import global_turn_sort, restore_turn_order


def _shuffled_turns():
    rows = []
    for c in ["c2", "c0", "c1"]:
        for t in [3, 0, 2, 1]:
            rows.append((c, t, f"{c}-t{t}"))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(df["turn_idx"], "s")
    return ray.data.from_arrow(pa.Table.from_pandas(df.sample(frac=1, random_state=3), preserve_index=False))


def test_restore_turn_order_within_conversation():
    out = restore_turn_order(_shuffled_turns()).to_pandas()
    # conversations contiguous, turns ordered inside each
    seen = []
    for conv, g in out.groupby("conv_id", sort=False):
        idx = out.index[out["conv_id"] == conv]
        assert list(idx) == list(range(idx.min(), idx.max() + 1))  # contiguous
        assert g["turn_idx"].tolist() == sorted(g["turn_idx"].tolist())
        seen.append(conv)
    assert sorted(seen) == ["c0", "c1", "c2"]


def test_global_turn_sort_total_order():
    out = global_turn_sort(_shuffled_turns()).to_pandas()
    keys = list(zip(out["conv_id"], out["turn_idx"]))
    assert keys == sorted(keys)
    assert out["text"].tolist()[0] == "c0-t0"
