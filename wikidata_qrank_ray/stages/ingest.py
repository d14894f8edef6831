"""Ingest + stable turn-order restore.

The reference guarantees a deterministic total order via sorted files and a
k-way merge with stream-name tiebreak (cmd/qrank-builder/linemerger.go:112-131)
and re-sorts inputs that are only *mostly* sorted
(cmd/qrank-builder/page_items.go:110-114: never trust input order). Ray's
shuffle is unordered, so order is restored explicitly: co-locate each
conversation with a ``groupby(conv_id)`` and sort by ``turn_idx`` inside the
group. Downstream per-conversation stages may then rely on contiguous,
ordered turns within a block.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def restore_turn_order(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Shuffle #1 (key=conv_id): conversations co-located, turns sorted by
    turn_idx within each conversation (stable, ts as tiebreak)."""

    def _sort_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["turn_idx", "ts"], kind="mergesort")

    return ds.groupby("conv_id").map_groups(_sort_group, batch_format="pandas")


def global_turn_sort(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Total order over (conv_id, turn_idx) -- the stronger guarantee used
    for golden-output tests (per-turn text equality under stable ordering)."""
    return ds.sort(["conv_id", "turn_idx"])
