"""Pareto-frontier (skyline) operator: rows not dominated on a
(minimize, maximize) criteria pair.

Distributed shape is the classic two-level skyline: a fully vectorized
LOCAL skyline per block (dominated rows can never re-enter the frontier,
and dominance is a strict partial order, so every globally dominated row
is dominated by some maximal row that survives its own block), then ONE
merge pass over the unioned local frontiers. The merge input is
frontier-sized, not data-sized -- the standard skyline assumption; a
pathological anti-correlated dataset where the frontier IS the dataset
degrades to a single-block sort, stated rather than hidden.

No reference analogue (the reference has no multi-criteria operator);
this is the data-curation "best quality at every cost level" primitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _skyline_sweep(df: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    """Rows of ``df`` not dominated within ``df``. X dominates Y iff
    X.min_col <= Y.min_col and X.max_col >= Y.max_col with at least one
    strict; ties on BOTH axes survive together (neither dominates).
    One mergesort + two vectorized prefix scans, no Python row loop."""
    if len(df) == 0:
        return df
    srt = df.sort_values([min_col, max_col], ascending=[True, False], kind="mergesort")
    mn = srt[min_col].to_numpy()
    mx = srt[max_col].to_numpy(dtype=np.int64)
    new_grp = np.empty(len(mn), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = mn[1:] != mn[:-1]
    gid = np.cumsum(new_grp) - 1
    # sorted desc within each equal-min group, so the group's max is its
    # first row; prefix max over STRICTLY smaller min values
    grp_max = mx[new_grp]
    run = np.maximum.accumulate(grp_max)
    prefix_before = np.empty(len(grp_max), dtype=np.int64)
    prefix_before[0] = np.iinfo(np.int64).min
    prefix_before[1:] = run[:-1]
    dominated = (prefix_before[gid] >= mx) | (grp_max[gid] > mx)
    return srt[~dominated]


def skyline(
    ds: ray.data.Dataset, min_col: str, max_col: str
) -> ray.data.Dataset:
    """Global Pareto frontier of ``ds`` on (minimize min_col, maximize
    max_col): block-local sweeps prune in parallel, the surviving
    frontier candidates merge in one final single-block sweep."""
    local = ds.map_batches(
        lambda df, a=min_col, b=max_col: _skyline_sweep(df, a, b),
        batch_format="pandas",
    )
    return local.repartition(1).map_batches(
        lambda df, a=min_col, b=max_col: _skyline_sweep(df, a, b),
        batch_format="pandas",
        batch_size=None,
    )
