"""Rank statistics -- the buildStats analogue (cmd/qrank-builder/stats.go:28-139):
entity count, median rank value by rank position, and log-log curve samples
(always keeping the top-N and the minimum).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def rank_stats(qrank_df: pd.DataFrame, top_n: int = 5, max_samples: int = 50) -> dict:
    """qrank table (qid, rank_value, rank_pos ordered desc) -> stats dict:
    {"entity_count", "median", "samples": [[pos, qid, value], ...]}.

    Median = value at 1-based position (n+1)//2 of the rank-desc order
    (stats.go picks by rank position, not by value distribution). Samples
    follow the reference's log-log curve sampling: walk the curve in
    (log10(pos), log10(value)) space and keep points at least ``dist``
    apart, always keeping top-N and the last point (stats.go:58-102).
    """
    n = len(qrank_df)
    if n == 0:
        return {"entity_count": 0, "median": 0, "samples": []}
    med = int(qrank_df["rank_value"].iloc[(n + 1) // 2 - 1])
    pos = qrank_df["rank_pos"].to_numpy()
    val = qrank_df["rank_value"].to_numpy()
    qid = qrank_df["qid"].to_numpy()
    samples = []
    last_xy = None
    # scale factors mirroring the reference's sample-space distance idea
    for i in range(n):
        keep = i < top_n or i == n - 1
        x, y = math.log10(max(1, pos[i])), math.log10(max(1, val[i]))
        if not keep and last_xy is not None:
            d = math.hypot((x - last_xy[0]) * 10, (y - last_xy[1]) * 10)
            keep = d >= 4.0
        if keep:
            samples.append([int(pos[i]), str(qid[i]), int(val[i])])
            last_xy = (x, y)
        if len(samples) >= max_samples:
            break
    return {"entity_count": int(n), "median": med, "samples": samples}


def reference_stats(
    rows: list[tuple[str, int]], top_n: int, num_samples: int
) -> dict:
    """Exact reference semantics of buildStats (stats.go:27-105), verified
    against the stats_test.go:15-55 golden: rank-desc (id, value) rows ->
    {"Median": <index into Samples>, "Samples": [[id, rank, value], ...]}.

    - medianRank = n//2 + 1 (1-based position in rank order)
    - curve sampling in (rank * S/n, log10(value) * S/log10(max)) space,
      squared-distance threshold 4.0^2 to the LAST SAMPLED point
    - top-N and the median rank always kept; a near-median predecessor is
      dropped unless it is within the top-N; the final sample is always
      replaced by the minimum (last) row
    - "Median" is the INDEX of the median sample within Samples
    """
    n = len(rows)
    if n == 0:
        return {"Median": 0, "Samples": []}
    median_rank = n // 2 + 1
    scale_x = num_samples / n
    scale_y = num_samples / math.log10(max(2.0, float(rows[0][1])))
    samples: list[list] = []
    last_x = last_y = 0.0
    median_idx = 0
    for i, (ident, value) in enumerate(rows):
        rank = i + 1
        x = rank * scale_x
        y = math.log10(max(1.0, float(value))) * scale_y
        near = (x - last_x) ** 2 + (y - last_y) ** 2 < 16.0
        if rank == median_rank:
            if near and len(samples) > top_n:
                samples.pop()
            median_idx = len(samples)
        if (not near) or rank <= top_n or rank == median_rank:
            samples.append([ident, rank, int(value)])
            last_x, last_y = x, y
    samples[-1] = [rows[-1][0], n, int(rows[-1][1])]
    return {"Median": median_idx, "Samples": samples}


def rank_stats_table(qrank_df: pd.DataFrame) -> pd.DataFrame:
    """Scalar stats as a one-row table for oracle comparison:
    (entity_count, median_value, max_value, min_value, total_mass)."""
    n = len(qrank_df)
    if n == 0:
        return pd.DataFrame(
            [{"entity_count": 0, "median_value": 0, "max_value": 0, "min_value": 0, "total_mass": 0}]
        ).astype(np.int64)
    med = int(qrank_df["rank_value"].iloc[(n + 1) // 2 - 1])
    return pd.DataFrame(
        [
            {
                "entity_count": np.int64(n),
                "median_value": np.int64(med),
                "max_value": np.int64(qrank_df["rank_value"].max()),
                "min_value": np.int64(qrank_df["rank_value"].min()),
                "total_mass": np.int64(qrank_df["rank_value"].sum()),
            }
        ]
    )


def grouped_linear_fit(
    ds, keys: list[str], x_col: str, y_col: str, num_partitions: int = 64
):
    """Distributed per-group OLS line fit via MERGEABLE INTEGER sufficient
    statistics -- the canonical 100 TB regression shape: each batch folds
    its rows into (n, sum_x, sum_y, sum_xx, sum_xy) partials (all int64;
    callers pass pre-scaled integer x/y, e.g. epoch-hours and cents), one
    hash-partitioned aggregate merges them, and the closed-form slope is
    emitted as an exact RATIONAL (slope_num, slope_den):

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)

    so no float ever enters the pipeline and a SQL oracle reproduces every
    cell bitwise. den == 0 marks a degenerate group (single distinct x).
    Bounds: |x| <= 2^20 and |y| <= 2^31 keep every cell inside int64 up to
    ~2^22 rows per group; rescale x's origin/unit upstream for longer
    spans (the caller owns the quantization, as with _cents).
    """
    import ray.data  # noqa: F401  (callers hand us a Dataset)

    from .groupby import hash_partition_aggregate

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.int64)
        y = df[y_col].to_numpy(dtype=np.int64)
        t = pd.DataFrame({k: df[k] for k in keys})
        t["n"] = np.int64(1)
        t["sx"] = x
        t["sy"] = y
        t["sxx"] = x * x
        t["sxy"] = x * y
        return t.groupby(keys, as_index=False, sort=False).sum()

    agg = hash_partition_aggregate(
        ds.map_batches(_partial, batch_format="pandas"),
        keys,
        {c: (c, "sum") for c in ["n", "sx", "sy", "sxx", "sxy"]},
        num_partitions,
    )

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.int64)
        sx = df["sx"].to_numpy(dtype=np.int64)
        sy = df["sy"].to_numpy(dtype=np.int64)
        sxx = df["sxx"].to_numpy(dtype=np.int64)
        sxy = df["sxy"].to_numpy(dtype=np.int64)
        out = df.copy()
        out["slope_num"] = n * sxy - sx * sy
        out["slope_den"] = n * sxx - sx * sx
        return out

    return agg.map_batches(_finalize, batch_format="pandas")


def grouped_weighted_median(
    ds, keys: list[str], value_col: str, weight_col: str, num_partitions: int = 64
):
    """Per-group WEIGHTED (lower) median: the smallest value v whose
    cumulative weight reaches half the group total (2*cum(v) >= total) --
    the robust-aggregation primitive (quantity-weighted price, token-count
    weighted score). Integer-exact: callers pass pre-scaled integer values
    and weights, the halving test is the doubled comparison, no division.

    One hash-partition shuffle on the group keys; the sweep is a fully
    vectorized (key, value) rollup + grouped cumsum + first-qualifying-row
    pick. Weights collapse per distinct value BEFORE the scan, so ties are
    handled at value granularity (the SQL-window-reproducible definition).
    """
    from .groupby import hash_partition_apply

    def _sweep(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {k: pd.Series(dtype=part[k].dtype if k in part else "int64")
                 for k in keys}
                | {"w_median": pd.Series(dtype="int64"),
                   "total_w": pd.Series(dtype="int64")}
            )
        v = part[value_col].to_numpy(dtype=np.int64)
        w = part[weight_col].to_numpy(dtype=np.int64)
        t = pd.DataFrame({k: part[k] for k in keys})
        t["v"] = v
        t["w"] = w
        per_v = t.groupby(keys + ["v"], as_index=False, sort=False)["w"].sum()
        per_v = per_v.sort_values(keys + ["v"], kind="mergesort")
        g = per_v.groupby(keys, sort=False)["w"]
        tot = g.transform("sum").to_numpy(dtype=np.int64)
        cum = g.cumsum().to_numpy(dtype=np.int64)
        hit = per_v[2 * cum >= tot].copy()
        hit["total_w"] = tot[2 * cum >= tot]
        out = hit.groupby(keys, as_index=False, sort=False).first()
        return out.rename(columns={"v": "w_median"})[
            keys + ["w_median", "total_w"]
        ]

    return hash_partition_apply(ds, keys, _sweep, num_partitions)
