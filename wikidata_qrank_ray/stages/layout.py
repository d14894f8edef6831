"""Z-order (Morton-curve) storage layout: interleave two bucketed sort
keys bit-by-bit so rows close in BOTH dimensions land close in the one
physical sort order -- the standard multi-dimensional clustering layout
for scan pruning at 100 TB (a range predicate on either dimension touches
O(sqrt) of the files instead of all of them).

The global row number comes from the bucket-offset scheme, not a global
sort: a distributed histogram over the top bits of the z-value (4096
buckets -- bucket-domain-sized, never row-scaled), a driver prefix sum
over those 4096 counts, then ONE hash-partition sweep that sorts each
bucket locally and adds its broadcast base offset. Total: one tiny
aggregate + one shuffle, and no all-to-all sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def morton_interleave16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave the low 16 bits of x (even positions, higher) and y
    (odd positions) -> 32-bit Morton code, fully vectorized int64
    bit-twiddling (the classic spread-bits magic masks)."""

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.int64) & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return (spread(x) << 1) | spread(y)


def zorder_rank(
    ds: ray.data.Dataset,
    id_col: str,
    x_col: str,
    y_col: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """(id, x, y) -> (id, zval, zrank): zval = 32-bit Morton interleave of
    the low 16 bits of x/y (caller owns the bucketing, as with _cents),
    zrank = 1-based global ROW_NUMBER in (zval, id) order, computed via
    bucket offsets instead of a global sort. Ties are impossible: id
    breaks them deterministically."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    def _z(df: pd.DataFrame) -> pd.DataFrame:
        z = morton_interleave16(
            df[x_col].to_numpy(dtype=np.int64), df[y_col].to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(dtype=np.int64),
                "zval": z,
                "zb": z >> 20,
            }
        )

    zed = ds.map_batches(_z, batch_format="pandas")
    hist = hash_partition_aggregate(
        zed, ["zb"], {"n": ("zb", "count")}, num_partitions
    ).to_pandas()
    if len(hist) == 0:
        return zed.map_batches(
            lambda df: df.assign(zrank=np.int64(0))[[id_col, "zval", "zrank"]],
            batch_format="pandas",
        )
    hist = hist.sort_values("zb").reset_index(drop=True)
    keys = hist["zb"].to_numpy(dtype=np.int64)
    vals = (hist["n"].cumsum().shift(1, fill_value=0) + 1).to_numpy(dtype=np.int64)
    base_ref = ray.put((keys, vals))

    def _rank(part: pd.DataFrame, ref=base_ref) -> pd.DataFrame:
        keys, vals = ray.get(ref)
        srt = part.sort_values(["zval", id_col], kind="mergesort")
        local = srt.groupby("zb", sort=False).cumcount().to_numpy(dtype=np.int64)
        zb = srt["zb"].to_numpy(dtype=np.int64)
        b = vals[np.searchsorted(keys, zb)]
        out = srt[[id_col, "zval"]].copy()
        out["zrank"] = b + local
        return out

    return hash_partition_apply(zed, ["zb"], _rank, num_partitions)


def ranked_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """(id, key int64) -> (id, key, rnk): rnk = 1-based global ROW_NUMBER
    in (key, id) order WITHOUT a global sort -- the zorder_rank bucket-
    offset scheme generalized to an arbitrary integer key: distributed
    per-key histogram, driver exclusive prefix sum (key-DOMAIN-sized, the
    watermark-bucket precedent; for huge domains shift the key into
    buckets first), broadcast bases, one bucket-hashed sweep."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    hist = hash_partition_aggregate(
        ds.map_batches(
            lambda df: pd.DataFrame({"kb": df[key_col].to_numpy(np.int64)}),
            batch_format="pandas"),
        ["kb"], {"n": ("kb", "count")}, num_partitions,
    ).to_pandas()
    if len(hist) == 0:
        return ds.map_batches(
            lambda df: pd.DataFrame(
                {id_col: pd.Series(dtype=np.int64),
                 key_col: pd.Series(dtype=np.int64),
                 "rnk": pd.Series(dtype=np.int64)}),
            batch_format="pandas")
    hist = hist.sort_values("kb").reset_index(drop=True)
    keys = hist["kb"].to_numpy(dtype=np.int64)
    vals = (hist["n"].cumsum().shift(1, fill_value=0) + 1).to_numpy(dtype=np.int64)
    base_ref = ray.put((keys, vals))

    def _rank(part: pd.DataFrame, ref=base_ref) -> pd.DataFrame:
        keys, vals = ray.get(ref)
        srt = part.sort_values([key_col, id_col], kind="mergesort")
        local = srt.groupby(key_col, sort=False).cumcount().to_numpy(np.int64)
        kb = srt[key_col].to_numpy(np.int64)
        b = vals[np.searchsorted(keys, kb)]
        out = srt[[id_col, key_col]].copy()
        out["rnk"] = b + local
        return out

    return hash_partition_apply(ds, [key_col], _rank, num_partitions)
