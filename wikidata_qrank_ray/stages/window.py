"""Sliding event-time window aggregates (RANGE-frame semantics).

For each row, the count and exact scaled-int sum of a value column over all
rows of the SAME key whose timestamp lies in ``[ts - window, ts]`` --
identical to SQL's

    COUNT(*)/SUM(v) OVER (PARTITION BY key ORDER BY ts
                          RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)

including peer semantics: rows that tie on ``ts`` share one frame that
contains every peer (the ``side="right"`` upper bound below).

Distribution: ONE hash-partition shuffle on the key (the engine-wide
partitioning primitive, stages/groupby.py), then each partition is swept
fully vectorized -- lexsort by (key, ts), a per-group-offset composite axis
so BOTH frame bounds come from two global ``np.searchsorted`` calls, and a
prefix-sum difference for the windowed sum. No per-row or per-group Python
loop; nothing row-scaled on the driver. At 100 TB the window state never
materializes: each partition holds only its own key's rows, and the sweep
is O(n log n) in the partition.

Reference analogue: the reference's per-key ordered accumulation
(pageviews.go:418-464 merge-sum discipline) generalized to a moving frame;
windowed aggregation itself is beyond the reference (its counters are
whole-period), motivated by rate/velocity features in training-data and
event pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .groupby import hash_partition_apply


def sliding_window_aggregate(
    ds: ray.data.Dataset,
    by: str,
    ts_col: str,
    value_col: str,
    window_us: int,
    id_cols: list[str] | None = None,
    out_count: str = "w_count",
    out_sum: str = "w_sum",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """-> (id_cols..., by, out_count, out_sum) one row per input row.

    ``value_col`` must already be an exact integer column (scale floats to
    cents with ``queries._cents`` BEFORE calling -- the sum is int64-exact).
    ``window_us`` is the frame width in the same units as ``ts_col``'s
    integer representation (microseconds for Arrow ``timestamp[us]``).
    """
    id_cols = list(id_cols or [])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g[id_cols + [by]].assign(
                **{
                    out_count: pd.Series([], dtype=np.int64),
                    out_sum: pd.Series([], dtype=np.int64),
                }
            )
        key_codes, _ = pd.factorize(g[by], sort=True)
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64) \
            if np.issubdtype(g[ts_col].to_numpy().dtype, np.datetime64) \
            else g[ts_col].to_numpy(np.int64)
        order = np.lexsort((ts, key_codes))
        ks = key_codes[order]
        ts_s = ts[order] - ts.min()  # rebase to keep the composite small
        vals = g[value_col].to_numpy(np.int64)[order]
        span = np.int64(ts_s.max()) + np.int64(window_us) + 2
        n_groups = int(ks[-1]) + 1
        if span > 0 and n_groups > (2**62) // int(span):
            # composite axis would overflow int64: fall back to a per-group
            # sweep (only reachable with >~10^5 distinct keys in ONE
            # partition AND a year-scale time span; raise num_partitions)
            return _sweep_grouped(
                g, by, ts_col, value_col, window_us, id_cols, out_count, out_sum
            )
        # strictly increasing across groups, ordered within: two global
        # searchsorted calls give every row's frame bounds at once
        adj = ks.astype(np.int64) * span + ts_s
        lo = np.searchsorted(adj, adj - np.int64(window_us), side="left")
        hi = np.searchsorted(adj, adj, side="right")
        # a lower bound that underflows into the previous group clamps to
        # the group start (frames never cross keys)
        group_start = np.zeros(len(ks), dtype=np.int64)
        new_grp = np.flatnonzero(np.diff(ks)) + 1
        group_start[new_grp] = new_grp
        group_start = np.maximum.accumulate(group_start)
        lo = np.maximum(lo, group_start)
        prefix = np.concatenate([[0], np.cumsum(vals, dtype=np.int64)])
        out = g.iloc[order][id_cols + [by]].reset_index(drop=True)
        out[out_count] = (hi - lo).astype(np.int64)
        out[out_sum] = (prefix[hi] - prefix[lo]).astype(np.int64)
        return out

    return hash_partition_apply(ds, [by], sweep, num_partitions)


def _sweep_grouped(
    g: pd.DataFrame,
    by: str,
    ts_col: str,
    value_col: str,
    window_us: int,
    id_cols: list[str],
    out_count: str,
    out_sum: str,
) -> pd.DataFrame:
    """Overflow fallback: identical output, per-group searchsorted."""
    outs = []
    for _, grp in g.groupby(by, sort=False):
        grp = grp.sort_values(ts_col, kind="mergesort")
        ts = grp[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64) \
            if np.issubdtype(grp[ts_col].to_numpy().dtype, np.datetime64) \
            else grp[ts_col].to_numpy(np.int64)
        vals = grp[value_col].to_numpy(np.int64)
        lo = np.searchsorted(ts, ts - np.int64(window_us), side="left")
        hi = np.searchsorted(ts, ts, side="right")
        prefix = np.concatenate([[0], np.cumsum(vals, dtype=np.int64)])
        o = grp[id_cols + [by]].reset_index(drop=True)
        o[out_count] = (hi - lo).astype(np.int64)
        o[out_sum] = (prefix[hi] - prefix[lo]).astype(np.int64)
        outs.append(o)
    return pd.concat(outs, ignore_index=True)
