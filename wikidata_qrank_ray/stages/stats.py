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
