"""Distributed joins.

The reference's joins are all sort-merge cogroups over sorted text streams
(SURVEY.md §2.4). Ray-Data-native equivalents, chosen by side size:

- ``broadcast_semi_join``: small key side -> ``ray.put`` the key array once,
  vectorized ``np.isin``/searchsorted membership inside ``map_batches``
  (semi/anti; no shuffle at all).
- ``bucketed_hash_join``: both sides large -> add ``part = hash(key) % P``
  to both, pad to a shared schema with typed nulls, union, shuffle by the
  LOW-cardinality part column only, and pandas-merge the co-located sides
  inside each partition (the guide's explicit partitioned hash join).
- ``bucketed_asof_join``: as-of (most-recent-at-or-before) joins -- same
  co-partitioning, ``pd.merge_asof`` per partition after an in-partition
  sort.

Skew note: a hot join key hashes to one partition; raise ``num_partitions``
or salt the hot key into sub-buckets (duplicate the build side per salt)
when one key's rows exceed a partition's memory budget.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .groupby import hash_partition_apply

_SIDE = "__side__"


def _restore_dtypes(df: pd.DataFrame, types: dict) -> pd.DataFrame:
    """Undo the int->float upcast from typed-null padding, null-safely:
    an integer column that (still) contains nulls -- genuine source nulls,
    not padding -- stays float/NaN instead of crashing the cast."""
    conv = {}
    for c, t in types.items():
        if c not in df.columns:
            continue
        if np.issubdtype(t, np.integer) and df[c].isna().any():
            continue
        conv[c] = t
    return df.astype(conv)


def bloom_semi_prefilter(
    ds: ray.data.Dataset,
    key: str,
    keys: np.ndarray,
    fp_rate: float = 0.01,
) -> ray.data.Dataset:
    """Approximate semi-join pre-filter: broadcast a Bloom filter of the key
    set instead of the keys themselves (~1.2 bytes/key at 1% fp). Output is
    a SUPERSET of the true semi-join (no false negatives); follow with the
    exact join downstream. The scale path when the key set itself is too
    big to broadcast."""
    from ..functions.hashing import BloomFilter

    bf = BloomFilter(len(keys), fp_rate)
    bf.add_many(keys)
    bf_ref = ray.put(bf)

    class Filter:
        def __init__(self):
            self.bf = ray.get(bf_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch[self.bf.contains_many(batch[key].to_numpy())]

    return ds.map_batches(Filter, batch_format="pandas", batch_size=65536, concurrency=2)


def broadcast_semi_join(
    ds: ray.data.Dataset,
    key: str,
    keys: np.ndarray,
    anti: bool = False,
) -> ray.data.Dataset:
    """Keep rows whose ``key`` is (not, if anti) in the broadcast key set."""
    keys_ref = ray.put(np.sort(np.unique(np.asarray(keys))))

    class Filter:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mask = np.isin(batch[key].to_numpy(), self.keys, assume_unique=False)
            return batch[~mask] if anti else batch[mask]

    return ds.map_batches(Filter, batch_format="pandas", batch_size=65536, concurrency=2)


def _pad_union(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    shared: tuple[str, ...] = (),
) -> tuple[ray.data.Dataset, list[str], list[str], dict, dict]:
    """Union both sides under a shared superset schema (typed null padding,
    side tag); returns (union, left_cols, right_cols, left_dtypes,
    right_dtypes). Key columns are both renamed to ``__key__``. Columns in
    ``shared`` exist on BOTH sides with the same type (e.g. a salt) and are
    carried through once, never null-padded."""
    import pyarrow as pa

    def _as_arrow(ds):
        # upstream stages that emit pandas blocks (e.g. map_groups finals)
        # report a PandasBlockSchema; force Arrow blocks so the join's
        # typed-null padding has a real pyarrow schema to work from
        if isinstance(ds.schema().base_schema, pa.Schema):
            return ds
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    left, right = _as_arrow(left), _as_arrow(right)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = [c for c in lschema.names if c != left_key and c not in shared]
    rcols = [c for c in rschema.names if c != right_key and c not in shared]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision in join: {overlap}")
    ltypes = {n: lschema.field(n).type for n in lcols}
    rtypes = {n: rschema.field(n).type for n in rcols}

    # identical column ORDER on both sides (union is positional-schema picky)
    out_order = ["__key__", _SIDE] + list(shared) + lcols + rcols

    def pad(side: int, own_key: str, other_types: dict):
        def _pad(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"__key__": batch[own_key], _SIDE: pa.array(np.full(n, side, dtype=np.int8))}
            for name in batch.schema.names:
                if name != own_key:
                    cols[name] = batch[name]
            for name, typ in other_types.items():
                cols[name] = pa.nulls(n, type=typ)
            return pa.table({name: cols[name] for name in out_order})

        return _pad

    u = left.map_batches(pad(0, left_key, rtypes), batch_format="pyarrow").union(
        right.map_batches(pad(1, right_key, ltypes), batch_format="pyarrow")
    )

    def _np_dtype(t: pa.DataType):
        try:
            return np.dtype(t.to_pandas_dtype())
        except (TypeError, NotImplementedError):
            return np.dtype(object)

    lpd = {n: _np_dtype(t) for n, t in ltypes.items()}
    rpd = {n: _np_dtype(t) for n, t in rtypes.items()}
    return u, lcols, rcols, lpd, rpd


def bucketed_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    how: str = "inner",
    num_partitions: int = 64,
    salt_buckets: int = 1,
) -> ray.data.Dataset:
    """Equi-join two large Datasets: co-partition by key hash, pandas merge
    per partition. Output columns: key (named ``left_key``) + both sides'
    non-key columns. ``how``: inner | left | right | outer.

    Every key's rows land in exactly one output PARTITION -- but Ray may
    split an oversized partition output into several physical blocks, so
    downstream per-block grouped aggregates must treat their results as
    partials and finish with a (small) keyed aggregate.

    ``salt_buckets > 1`` is the hot-key recipe (inner/left only): left rows
    take a deterministic round-robin salt, the (smaller) right side is
    replicated once per salt value, and the shuffle key becomes
    (key, salt) -- a pathological key's rows spread over ``salt_buckets``
    partitions instead of melting one reducer."""
    if salt_buckets > 1 and how not in ("inner", "left"):
        raise ValueError("salted join supports how=inner|left only "
                         "(replicating the right side would duplicate unmatched rows)")
    if salt_buckets > 1:
        import pyarrow as pa

        def _salt_left(t: pa.Table) -> pa.Table:
            salt = np.arange(t.num_rows, dtype=np.int64) % salt_buckets
            return t.append_column("__salt__", pa.array(salt))

        def _replicate_right(t: pa.Table) -> pa.Table:
            reps = [t.append_column(
                "__salt__", pa.array(np.full(t.num_rows, s, dtype=np.int64))
            ) for s in range(salt_buckets)]
            return pa.concat_tables(reps)

        left = left.map_batches(_salt_left, batch_format="pyarrow")
        right = right.map_batches(_replicate_right, batch_format="pyarrow")

    # a zero-block side has no readable schema (Ray drops it), so the typed
    # null padding is unconstructible. The join semantics stay exact: an
    # empty side contributes no matches, so inner/semi results ARE the
    # empty side, and left/right/outer keep the intact side (its would-be
    # null-padded columns are untypable and therefore absent -- only
    # reachable when the other side is a schema-less empty).
    ls, rs = left.schema(), right.schema()
    if ls is None or rs is None:
        if ls is None and rs is None:
            return left
        if ls is None:
            return right if how in ("right", "outer") else left
        return left if how in ("left", "outer") else right

    shared = ("__salt__",) if salt_buckets > 1 else ()
    u, lcols, rcols, ltypes, rtypes = _pad_union(
        left, right, left_key, right_key, shared=shared
    )
    # merge on (key, salt) so each left row joins its own replica of the
    # right side exactly once
    merge_on = ["__key__", *shared]

    def _merge(part: pd.DataFrame) -> pd.DataFrame:
        lf = part[part[_SIDE] == 0][merge_on + lcols]
        rf = part[part[_SIDE] == 1][merge_on + rcols]
        # restore dtypes lost to null padding (int -> float upcast)
        lf = _restore_dtypes(lf, ltypes)
        rf = _restore_dtypes(rf, rtypes)
        out = lf.merge(rf, on=merge_on, how=how)
        if salt_buckets > 1:
            out = out.drop(columns=["__salt__"])
        return out.rename(columns={"__key__": left_key})

    return hash_partition_apply(u, merge_on, _merge, num_partitions)


def bucketed_range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by_left: str,
    by_right: str,
    on_left: str,
    lo_right: str,
    hi_right: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Range (interval) join: pair each left row with every right row of
    the same ``by`` key whose [lo, hi] interval contains the left ``on``
    value (lo inclusive, hi inclusive). Co-partition both sides by the
    by-key hash; within a partition the join runs as one sort +
    per-interval searchsorted slice sweep -- no per-row Python comparisons
    against the whole partition. The custom-operator tier for semantics
    Ray Data lacks (SURVEY.md §1.4): composition of map_batches + one
    hash shuffle."""
    import pyarrow as pa

    # inner-join semantics: a zero-block (schema-less) side means an empty
    # result -- return that empty side (see bucketed_hash_join note)
    if left.schema() is None or right.schema() is None:
        return left if left.schema() is None else right

    def _as_arrow(ds):
        # pandas-block inputs report a PandasBlockSchema; force Arrow so
        # the typed-null padding has a real pyarrow schema (same coercion
        # as _pad_union's)
        if isinstance(ds.schema().base_schema, pa.Schema):
            return ds
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    left, right = _as_arrow(left), _as_arrow(right)

    lsel = left.map_batches(
        lambda t: t.rename_columns(["__by__" if c == by_left else c for c in t.schema.names]),
        batch_format="pyarrow",
    )
    rsel = right.map_batches(
        lambda t: t.rename_columns(["__by__" if c == by_right else c for c in t.schema.names]),
        batch_format="pyarrow",
    )
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = [c for c in lschema.names if c != by_left]
    rcols = [c for c in rschema.names if c != by_right]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision in range join: {overlap}")

    def _np_dtype(t):
        try:
            return np.dtype(t.to_pandas_dtype())
        except (TypeError, NotImplementedError):
            return np.dtype(object)

    ltypes = {c: _np_dtype(lschema.field(c).type) for c in lcols}
    rtypes = {c: _np_dtype(rschema.field(c).type) for c in rcols}

    def pad(side: int, own_cols: list[str], other: ray.data.Dataset, other_cols: list[str]):
        oschema = other.schema().base_schema

        def _pad(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {"__by__": t["__by__"], _SIDE: pa.array(np.full(n, side, dtype=np.int8))}
            for c in own_cols:
                cols[c] = t[c]
            for c in other_cols:
                cols[c] = pa.nulls(n, type=oschema.field(c).type)
            return pa.table({k: cols[k] for k in ["__by__", _SIDE] + lcols + rcols})

        return _pad

    u = lsel.map_batches(pad(0, lcols, right, rcols), batch_format="pyarrow").union(
        rsel.map_batches(pad(1, rcols, left, lcols), batch_format="pyarrow")
    )

    def _range(part: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized sweep over the whole partition -- no per-key
        # Python loop (the original per-group groupby/iloc/concat loop
        # measured ~10 s for 1500 keys at sf0.1; this path is ~50x less).
        # All by-keys and interval bounds collapse to ONE int64 composite
        # sort key: code * K + joint-rank(value). The joint rank transform
        # (np.unique over left values + both bounds) is order-preserving
        # and dtype-agnostic (timestamps, ints, floats, strings), so the
        # two searchsorted calls respect key boundaries exactly.
        empty = part.iloc[0:0][["__by__"] + lcols + rcols].astype(
            {**ltypes, **rtypes})
        # null by-keys never match (SQL join semantics; pd.factorize would
        # otherwise give both sides' nulls the same -1 sentinel code)
        part = part[part["__by__"].notna()]
        lf = part[part[_SIDE] == 0]
        rf = part[part[_SIDE] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return empty
        # restore dtypes lost to typed-null padding (int64 -> float64
        # upcast would silently corrupt ids > 2^53 downstream);
        # null-safe: columns with genuine nulls stay float
        lf = _restore_dtypes(lf, ltypes)
        rf = _restore_dtypes(rf, rtypes)
        codes, _ = pd.factorize(
            pd.concat([lf["__by__"], rf["__by__"]], ignore_index=True),
            sort=False)
        lc = codes[: len(lf)].astype(np.int64)
        rc = codes[len(lf):].astype(np.int64)
        lv = lf[on_left].to_numpy()
        lo_v = rf[lo_right].to_numpy()
        hi_v = rf[hi_right].to_numpy()
        uniq = np.unique(np.concatenate([lv, lo_v, hi_v]))
        K = np.int64(len(uniq) + 1)
        lkey = lc * K + np.searchsorted(uniq, lv).astype(np.int64)
        order = np.argsort(lkey, kind="mergesort")
        lkey_s = lkey[order]
        # lo inclusive (side=left) / hi inclusive (side=right): equal
        # values share a rank, so the sides behave exactly as a per-key
        # searchsorted on the raw values would
        starts = np.searchsorted(
            lkey_s, rc * K + np.searchsorted(uniq, lo_v).astype(np.int64),
            side="left")
        ends = np.searchsorted(
            lkey_s, rc * K + np.searchsorted(uniq, hi_v).astype(np.int64),
            side="right")
        n_match = np.maximum(0, ends - starts)
        total = int(n_match.sum())
        if total == 0:
            return empty
        r_idx = np.repeat(np.arange(len(rf)), n_match)
        cum0 = np.concatenate([[0], np.cumsum(n_match)[:-1]])
        l_pos = (np.repeat(starts, n_match)
                 + (np.arange(total) - np.repeat(cum0, n_match)))
        l_idx = order[l_pos]
        lo_df = lf.iloc[l_idx][["__by__"] + lcols].reset_index(drop=True)
        ro = rf.iloc[r_idx][rcols].reset_index(drop=True)
        return pd.concat([lo_df, ro], axis=1)

    joined = hash_partition_apply(u.map_batches(lambda df: df, batch_format="pandas"),
                                  ["__by__"], _range, num_partitions)
    return joined.map_batches(
        lambda df: df.rename(columns={"__by__": by_left}), batch_format="pandas"
    )


def bucketed_asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by_left: str,
    by_right: str,
    right_value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_r",
) -> ray.data.Dataset:
    """As-of join: for each left row, the right row with the greatest
    ``on`` <= left's ``on`` (direction=backward) within the same ``by`` key.
    Co-partition by the by-key hash, sort within partition, pd.merge_asof."""
    import pyarrow as pa

    if left.schema() is None:
        return left  # no left rows -> empty result (schema-less empty)
    if right.schema() is None:
        # no right rows: every left row keeps null asof columns; right
        # value types are unreadable from a zero-block side -> null-typed
        right = ray.data.from_arrow(
            pa.table(
                {by_right: pa.array([], type=left.schema().base_schema.field(by_left).type),
                 on: pa.array([], type=left.schema().base_schema.field(on).type)}
                | {c: pa.array([], type=pa.null()) for c in right_value_cols}
            )
        )

    rsel = right.map_batches(
        lambda t: t.select([by_right, on] + right_value_cols).rename_columns(
            ["__by__", f"{on}{suffix}"] + [f"{c}{suffix}" for c in right_value_cols]
        ),
        batch_format="pyarrow",
    )
    lsel = left.map_batches(
        lambda t: t.rename_columns(
            ["__by__" if c == by_left else c for c in t.schema.names]
        ),
        batch_format="pyarrow",
    )
    # schema lookups hoisted OUT of the pad closures: a Dataset handle
    # captured in a task closure serializes the whole plan into every task
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = [c for c in lschema.names if c != by_left]
    ltypes = {c: lschema.field(c).type for c in lcols}
    rtypes = {c: rschema.field(c).type for c in right_value_cols}
    on_type = lschema.field(on).type
    # one canonical column order for BOTH sides: a union of blocks with the
    # same names in different orders trips Ray's schema-consistency check
    lnames = ["__by__" if c == by_left else c for c in lschema.names]
    order = lnames + [_SIDE, f"{on}{suffix}"] + [f"{c}{suffix}" for c in right_value_cols]

    def pad_l(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: t[c] for c in t.schema.names}
        cols[_SIDE] = pa.array(np.zeros(n, dtype=np.int8))
        cols[f"{on}{suffix}"] = pa.nulls(n, type=on_type)
        for c in right_value_cols:
            cols[f"{c}{suffix}"] = pa.nulls(n, type=rtypes[c])
        return pa.table({c: cols[c] for c in order})

    def pad_r(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: t[c] for c in t.schema.names}
        cols[_SIDE] = pa.array(np.ones(n, dtype=np.int8))
        for c in lcols:
            cols[c] = pa.nulls(n, type=ltypes[c])
        # asof key for the right side lives in its suffixed column
        cols[on] = t[f"{on}{suffix}"]
        return pa.table({c: cols[c] for c in order})

    u = lsel.map_batches(pad_l, batch_format="pyarrow").union(
        rsel.map_batches(pad_r, batch_format="pyarrow")
    )
    return asof_join_tagged(
        u, on, right_value_cols=right_value_cols, direction=direction, suffix=suffix
    )


def asof_join_tagged(
    u: ray.data.Dataset,
    on: str,
    right_value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_r",
) -> ray.data.Dataset:
    """As-of join over a PRE-TAGGED union dataset (the layout
    ``bucketed_asof_join`` builds): left columns with the by-key renamed
    ``__by__``, an int8 ``_SIDE`` column (0=left, 1=right), and suffixed
    right columns; right rows carry their asof key in BOTH ``on`` and
    ``on+suffix`` and nulls in left-only columns.

    Single-SOURCE self-asof joins (two event-type slices of one stream)
    should build this union in one ``map_batches`` pass over the source and
    call this directly -- one scan and one operator instead of two padded
    branches, same partitioned merge_asof."""

    def _asof(part: pd.DataFrame) -> pd.DataFrame:
        rsuff = [f"{on}{suffix}"] + [f"{c}{suffix}" for c in right_value_cols]
        lf = part[part[_SIDE] == 0].drop(columns=[_SIDE]).sort_values(on, kind="mergesort")
        rf = part[part[_SIDE] == 1][["__by__"] + rsuff].sort_values(
            f"{on}{suffix}", kind="mergesort"
        )
        if len(lf) == 0:
            return lf.drop(columns=rsuff, errors="ignore")
        return pd.merge_asof(
            lf.drop(columns=rsuff),
            rf,
            left_on=on,
            right_on=f"{on}{suffix}",
            by="__by__",
            direction=direction,
            allow_exact_matches=True,
        )

    return hash_partition_apply(u, ["__by__"], _asof)
