"""High-cardinality grouped aggregation.

Ray Data's ``groupby(keys).aggregate(...)`` degrades badly when the number
of distinct groups is large (per-group overhead dominates): ~95k groups
took 190s on this box. The scalable pattern -- and the one that maps to a
multi-node shuffle -- is:

1. map-side partial aggregate per batch (vectorized pandas groupby),
2. add ``part = stable_hash(keys) % P`` and shuffle by the LOW-cardinality
   ``part`` column only (P ~ 2-4x cores),
3. finish with one vectorized pandas groupby per partition.

Every row of one key lands in exactly one partition, so the two-phase sum
is exact. ``P`` bounds both shuffle fan-out and per-task memory; skewed
keys spread over partitions by hash (use salted_rollup for the single
hottest-key case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _stable_part_arrow(t: pa.Table, keys: list[str], num_partitions: int) -> pa.Array:
    """Partition id from the KEY columns only -- the value columns never
    leave Arrow (the old pandas round-trip converted whole blocks)."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        col = t[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h ^= pd.util.hash_pandas_object(
            pd.Series(col.to_pandas()), index=False, hash_key="0123456789123456"
        ).to_numpy()
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


def _arrow_groupby(
    t: pa.Table, keys: list[str], specs: dict[str, tuple[str, str]]
) -> pa.Table:
    """pa.TableGroupBy aggregate -> columns renamed/ordered keys-first as
    ``specs`` (out -> (in_col, how)) names them. Vectorized Acero kernel,
    no pandas."""
    uniq_specs = list({(col, how) for col, how in specs.values()})
    in_cols = [c for c in dict.fromkeys(c for c, _ in uniq_specs)]
    g = pa.TableGroupBy(t.select(list(dict.fromkeys(keys + in_cols))), keys).aggregate(
        uniq_specs
    )
    cols = {k: g[k] for k in keys}
    for out, (col, how) in specs.items():
        cols[out] = g[f"{col}_{how}"]
    return pa.table(cols)


def hash_partition_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    agg: dict[str, tuple[str, str]],
    num_partitions: int = 64,
    partial: bool = True,
    stamp_batch_size: int | None = 65536,
) -> ray.data.Dataset:
    """Exact grouped aggregate for high-cardinality keys.

    ``agg``: output_col -> (input_col, how) with how in
    {"sum", "count", "min", "max"}. Count/sum compose across the partial
    phase (count becomes sum of partial counts).

    ``stamp_batch_size``: bundling width of the partition-stamp stage.
    The 65536 default amortizes per-task overhead on row-heavy inputs
    (events/lineitem scale). Pass None when the upstream map EXPLODES a
    small table (shingles, band rows): the stamp's bundling is computed on
    the pre-explosion row count, so a 5k-doc table would otherwise bundle
    into ONE task and serialize the whole fused explode pipeline.

    Arrow-native end to end: partial and final phases run as
    pyarrow.TableGroupBy (Acero) over zero-copy blocks, and only the key
    columns are materialized (for the stable partition hash) -- blocks
    through the shuffle stay Arrow, cutting object-store page traffic vs a
    pandas round trip.
    """

    named = {out: (col, how) for out, (col, how) in agg.items()}
    merged_how = {out: ("sum" if how in ("count", "sum") else how) for out, (_, how) in named.items()}

    def _partial(t: pa.Table) -> pa.Table:
        return _arrow_groupby(t, keys, named)

    def _add_part(t: pa.Table) -> pa.Table:
        # strip pandas schema metadata here -- these blocks feed the
        # groupby shuffle, whose reduce tasks hash block schemas for
        # dedup; the (unhashable) metadata dict from any upstream
        # pandas-returning map defeats that and spams every reduce worker
        t = t.replace_schema_metadata(None)
        return t.append_column("part", _stable_part_arrow(t, keys, num_partitions))

    def _final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        return _arrow_groupby(t, keys, {out: (out, merged_how[out]) for out in named})

    stage = ds
    if partial:
        # the partial phase inherits the same bundling rule: with
        # stamp_batch_size=None (explosive upstream over a small table) a
        # hardcoded 65536 here would re-collapse the fused chain to one task
        stage = stage.map_batches(
            _partial, batch_format="pyarrow", batch_size=stamp_batch_size
        )
    stage = stage.map_batches(
        _add_part, batch_format="pyarrow", batch_size=stamp_batch_size
    )
    return stage.groupby("part").map_groups(_final, batch_format="pyarrow")


def hash_partition_apply(
    ds: ray.data.Dataset,
    keys: list[str],
    part_fn,
    num_partitions: int = 64,
    stamp_batch_size: int | None = 65536,
) -> ray.data.Dataset:
    """Co-locate all rows of each key into one partition (shuffle by the
    LOW-cardinality hashed partition id) and apply ``part_fn`` to each whole
    partition DataFrame. ``part_fn`` must be a vectorized sweep that handles
    multiple keys at once -- this is the workhorse for windowing /
    sessionization / bucket joins at high key cardinality.
    ``stamp_batch_size``: see hash_partition_aggregate (None for explosive
    upstream maps over small tables)."""

    def _add_part(t: pa.Table) -> pa.Table:
        # partition id computed from the KEY columns only; value columns
        # ride through as zero-copy Arrow until the per-partition pandas
        # sweep (the one place a pandas conversion is inherent).
        # metadata strip: see hash_partition_aggregate._add_part
        t = t.replace_schema_metadata(None)
        return t.append_column("part", _stable_part_arrow(t, keys, num_partitions))

    def _per_part(part_df: pd.DataFrame):
        return _strip_pandas_meta(part_fn(part_df.drop(columns=["part"])))

    staged = ds.map_batches(
        _add_part, batch_format="pyarrow", batch_size=stamp_batch_size
    )
    return staged.groupby("part").map_groups(_per_part, batch_format="pandas")


def _strip_pandas_meta(out):
    """Re-emit a pandas partition result as an Arrow block WITHOUT the
    pandas schema-metadata dict: Ray dedups task outputs by hashing block
    schemas, and the (unhashable) pandas metadata defeats that for every
    reduce task ("Failed to hash the schemas" spam). Central fix for every
    hash_partition_apply/map_groups call site. Empty frames stay pandas --
    Arrow would infer ``null`` for empty object columns (text/sig payloads)
    and poison downstream schema unification."""
    if not isinstance(out, pd.DataFrame) or len(out) == 0:
        return out
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


def hash_partition_map_groups(
    ds: ray.data.Dataset,
    keys: list[str],
    fn,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Run ``fn`` once per key-group, shuffling only by the hashed partition
    id. Beats ``ds.groupby(keys).map_groups`` when groups >> cores, but the
    per-group Python call still dominates for tiny groups -- prefer
    ``hash_partition_apply`` with a fully vectorized partition sweep."""

    def _per_part(part_df: pd.DataFrame) -> pd.DataFrame:
        outs = [fn(g) for _, g in part_df.groupby(keys, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return fn(part_df.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    return hash_partition_apply(ds, keys, _per_part, num_partitions)


def group_topk(
    ds: ray.data.Dataset,
    keys: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tie_cols: list[str] | None = None,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Top-k rows PER GROUP by ``order_col`` (ties broken by ``tie_cols``
    ascending -- deterministic, matching a ROW_NUMBER() OVER (PARTITION BY
    keys ORDER BY order_col, ties) <= k oracle). The per-domain diversity
    cap of a data pipeline: k>1 generalization of the argmax-per-group
    pattern.

    One hash-partition shuffle on the group keys; the partition sweep is a
    vectorized sort + C-level grouped cumcount -- group sizes ride the
    partitions, k does not bound memory anywhere but the output."""
    tie_cols = list(tie_cols or [])

    def _pick(part: pd.DataFrame) -> pd.DataFrame:
        srt = part.sort_values(
            keys + [order_col] + tie_cols,
            ascending=[True] * len(keys) + [ascending] + [True] * len(tie_cols),
            kind="mergesort",
        )
        rank = srt.groupby(keys, sort=False).cumcount()
        return srt[rank < k]

    return hash_partition_apply(ds, keys, _pick, num_partitions)
