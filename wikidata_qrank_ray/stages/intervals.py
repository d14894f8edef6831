"""Interval (temporal) overlap join: all pairs of intervals from DIFFERENT
owners that overlap in time -- the concurrency-analysis primitive
(co-active user sessions, overlapping tool spans, GPU-job contention).

Distributed shape: a fixed time GRID. Each interval explodes to the grid
cells it spans (flat, vectorized), cells co-partition by hash, and a pair
is tested inside every shared cell but EMITTED exactly once -- in the
anchor cell containing max(start_a, start_b), which any overlapping pair
shares by construction. No pair-dedup shuffle, no sort, and the only skew
bound is the same O(m^2)-per-hot-cell one every equi-key pair generator
has (m = intervals alive in one cell; pick ``cell_us`` near the typical
interval length to keep m small and spans short).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def interval_overlap_join(
    ds: ray.data.Dataset,
    owner_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    cell_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """(owner, id, start, end) -> (owner_a, id_a, owner_b, id_b, ov_us)
    for every INCLUSIVE overlap (start_a <= end_b and start_b <= end_a)
    between intervals of distinct owners, oriented owner_a < owner_b
    (ties impossible: same-owner pairs are excluded by contract).
    ov_us = min(end) - max(start) in integer microseconds (0 = touching).
    start/end columns must be datetime64[us] or integer microseconds."""
    from .groupby import hash_partition_apply

    def _to_us(col) -> np.ndarray:
        arr = col.to_numpy()
        if arr.dtype.kind == "M":
            return arr.astype("datetime64[us]").astype(np.int64)
        return arr.astype(np.int64)

    def _cells(batch: pd.DataFrame) -> pd.DataFrame:
        st = _to_us(batch[start_col])
        en = _to_us(batch[end_col])
        c0 = st // cell_us
        c1 = en // cell_us
        reps = (c1 - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(batch)), reps)
        # cell sequence per interval: base + intra-run offset
        offs = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        return pd.DataFrame(
            {
                "cell": c0[idx] + offs,
                "owner": batch[owner_col].to_numpy()[idx],
                "iid": batch[id_col].to_numpy()[idx],
                "st": st[idx],
                "en": en[idx],
            }
        )

    cells = ds.map_batches(_cells, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "owner_a": pd.Series(dtype="int64"),
                "id_a": pd.Series(dtype="int64"),
                "owner_b": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "ov_us": pd.Series(dtype="int64"),
            }
        )
        if len(g) == 0:
            return empty
        m = g.merge(g, on="cell")
        m = m[m["owner_x"] < m["owner_y"]]
        if len(m) == 0:
            return empty
        st_max = np.maximum(m["st_x"].to_numpy(), m["st_y"].to_numpy())
        en_min = np.minimum(m["en_x"].to_numpy(), m["en_y"].to_numpy())
        anchor = (st_max // cell_us) == m["cell"].to_numpy()
        keep = (st_max <= en_min) & anchor
        m = m[keep]
        return pd.DataFrame(
            {
                "owner_a": m["owner_x"].to_numpy(dtype=np.int64),
                "id_a": m["iid_x"].to_numpy(dtype=np.int64),
                "owner_b": m["owner_y"].to_numpy(dtype=np.int64),
                "id_b": m["iid_y"].to_numpy(dtype=np.int64),
                "ov_us": en_min[keep] - st_max[keep],
            }
        )

    return hash_partition_apply(
        cells, ["cell"], _pairs, num_partitions, stamp_batch_size=None
    )
