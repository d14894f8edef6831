"""Entity-rank rollup + final QRank ordering.

- ``rollup``: the qviews analogue (cmd/qrank-builder/qviews.go:109-121 --
  per-entity sum of per-page counts) as a two-phase aggregate: the matcher
  already emits per-batch partial counts (map-side combine), then a small
  ``groupby(qid).sum`` finishes. ``salted_rollup`` adds explicit hot-key
  salting -- ``groupby((qid, salt)) -> groupby(qid)`` -- the skew pattern
  the north rule requires at power-law 10^12-turn scale (the reference never
  needed it: single-node sorted scans are skew-immune, SURVEY.md §4).
- ``qrank_order``: the BuildQRank ordering oracle
  (cmd/qrank-builder/qrank.go:45-53): rank value desc, numeric qid asc
  tiebreak, with 1-based ``rank_pos``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.qid import qid_num


def rollup(partial: ray.data.Dataset, key: str = "qid", cnt: str = "cnt") -> ray.data.Dataset:
    """groupby(key).sum(cnt) over per-batch partials -> (key, mention_count)."""
    agg = partial.groupby(key).sum(cnt)
    return agg.map_batches(
        lambda t: t.rename_columns([key, "mention_count"]), batch_format="pyarrow"
    )


def salted_rollup(
    partial: ray.data.Dataset, key: str = "qid", cnt: str = "cnt", salt_buckets: int = 16
) -> ray.data.Dataset:
    """Two-phase skew-tamed aggregate: phase 1 groups on (key, salt) so a
    power-law hot key spreads over ``salt_buckets`` reducers; phase 2 merges
    the per-salt partials (tiny: #keys x salt rows). Salt is a stable hash
    of the batch-local row index -- deterministic, no wall-clock."""

    def _add_salt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        salt = (np.arange(n, dtype=np.int64) % salt_buckets)
        return t.append_column("salt", pa.array(salt))

    phase1 = (
        partial.map_batches(_add_salt, batch_format="pyarrow")
        .groupby([key, "salt"])
        .sum(cnt)
    )
    phase2 = phase1.groupby(key).sum(f"sum({cnt})")
    return phase2.map_batches(
        lambda t: t.rename_columns([key, "mention_count"]), batch_format="pyarrow"
    )


def qrank_order(rank_ds: ray.data.Dataset, value_col: str = "mention_count") -> pd.DataFrame:
    """Final ordering (qrank.go:45-53): value desc, numeric qid asc; adds
    1-based ``rank_pos``. The ranked entity table is small (distinct
    entities, not turns) -- materializing it is the intended pattern; at
    larger entity spaces this becomes ``ds.sort`` + per-block offset ranks.
    """
    df = rank_ds.to_pandas()
    if len(df) == 0 and "qid" not in df.columns:
        # zero-block Dataset lost its schema through to_pandas; an empty
        # corpus ranks to an empty, correctly-typed table
        df = pd.DataFrame(
            {
                "qid": pd.Series(dtype=object),
                value_col: pd.Series(dtype="int64"),
            }
        )
    df["_qn"] = qid_num(df["qid"])
    df = df.sort_values([value_col, "_qn"], ascending=[False, True], kind="mergesort")
    df = df.drop(columns=["_qn"]).reset_index(drop=True)
    df["rank_pos"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df = df.rename(columns={value_col: "rank_value"})
    return df[["qid", "rank_value", "rank_pos"]]
