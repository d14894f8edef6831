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
