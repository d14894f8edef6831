"""Mergeable sketches: distributed approximate aggregates.

The reference has no sketch/approximate operators (SURVEY.md §2.5 notes the
absence); at 100 TB they are the only sane way to answer distinct-count /
quantile questions without an all-to-all shuffle. Pattern (guide): emit one
serialized sketch per batch from ``map_batches`` (map-side), merge the tiny
sketches on the driver (or in one reduce task) -- data motion is
O(batches x sketch_size), independent of row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import sqlhash64
from ..functions.tokenize import py_tokens


class HyperLogLog:
    """Classic HLL (Flajolet et al.): 2^p registers of leading-zero ranks.
    Standard error ~ 1.04/sqrt(2^p); mergeable by register-wise max.

    Hash = sqlhash64 (codepoint polynomial + splitmix64 finalizer), so the
    whole sketch -- registers, harmonic sum, small-range correction -- is
    value-exact replayable in DuckDB: registers are an order-free per-bucket
    max, the harmonic sum is kept as the EXACT integer S = sum(2^(64-reg))
    (fits HUGEINT: <= 2^12 * 2^64), and the float estimate expression is
    written identically on both sides (verified bitwise for all 2^p zeros
    values and random S in tests)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] = v[mask] << np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        arr = np.asarray(values)
        if arr.dtype == object:
            arr = arr[~pd.isna(arr)]  # COUNT(DISTINCT x) skips nulls
        self.add_hashes(sqlhash64(arr.astype(str)))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        """Flajolet estimate, evaluated exactly as the DuckDB oracle does:
        harmonic sum as the exact integer S (no float sum-order drift), then
        one canonical float expression -- (alpha*m^2)*2^64/S, small-range
        m*ln(m/zeros). Parity with SQL is pinned in tests/test_sketches.py."""
        import math

        m = self.m
        cnt = np.bincount(self.registers, minlength=1)
        s_int = sum(int(c) << (64 - r) for r, c in enumerate(cnt) if c)
        zeros = int(cnt[0])
        alpha = 0.7213 / (1 + 1.079 / m)
        e = (alpha * (m * m)) * 18446744073709551616.0 / float(s_int)
        if e <= 2.5 * m and zeros:
            e = m * math.log(m / float(zeros))  # small-range correction
        return float(e)

    def estimate_int(self) -> int:
        """Integer estimate: floor(e + 0.5) (half-up, matching the SQL
        CAST(floor(e + 0.5) AS BIGINT) -- Python round() is half-even)."""
        import math

        return int(math.floor(self.estimate() + 0.5))


def approx_distinct(ds: ray.data.Dataset, column: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT column): one HLL per batch, register-wise
    max merge of the (batches x 4 KiB) sketches on the driver. Returns the
    integer estimate (value-exact vs the DuckDB HLL replay)."""

    def _sketch(batch: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add(batch[column].dropna().to_numpy())
        return pd.DataFrame({"registers": [h.registers.tobytes()]})

    parts = ds.map_batches(_sketch, batch_format="pandas", batch_size=65536).to_pandas()
    merged = HyperLogLog(p)
    if len(parts) == 0:
        return 0  # empty stream: zero distinct (zero-block schema loss)
    for buf in parts["registers"]:
        other = HyperLogLog(p)
        other.registers = np.frombuffer(buf, dtype=np.uint8).copy()
        merged.merge(other)
    return merged.estimate_int()


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequency sketch)
# ---------------------------------------------------------------------------


def misra_gries_summary(values: np.ndarray, k: int) -> dict:
    """One-pass Misra-Gries summary with k counters: every item with true
    frequency > n/(k+1) is guaranteed present; counts underestimate by at
    most n/(k+1). Vectorized: exact value_counts of the batch, then one
    decrement step to shrink to k counters."""
    s = pd.Series(values).value_counts()
    if len(s) <= k:
        return s.to_dict()
    cut = int(s.iloc[k])  # (k+1)-th largest count
    s = s - cut
    return s[s > 0].head(k).to_dict()


def merge_misra_gries(a: dict, b: dict, k: int) -> dict:
    """Mergeable-summary combine (Agarwal et al.): sum counters, then if
    more than k remain subtract the (k+1)-th largest and drop <= 0 -- the
    error bound adds across merges, staying <= n_total/(k+1)."""
    out = dict(a)
    for key, cnt in b.items():
        out[key] = out.get(key, 0) + cnt
    if len(out) <= k:
        return out
    counts = sorted(out.values(), reverse=True)
    cut = counts[k]
    return {key: c - cut for key, c in out.items() if c - cut > 0}


def approx_heavy_hitters(
    ds: ray.data.Dataset, column: str, k: int = 50, tokenize: bool = False
) -> pd.DataFrame:
    """Approximate top items of a column (or of its whitespace tokens):
    one k-counter Misra-Gries summary PER BATCH (map-side, k-bounded data
    motion regardless of cardinality), driver-side mergeable combine.
    -> (item, est) sorted desc; est is a lower bound within n/(k+1) of the
    true count. The exact twin is the top_tokens query."""

    def _summary(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[column].to_numpy()
        if tokenize:
            vals = (np.concatenate([py_tokens(str(v)) for v in vals])
                    if len(vals) else vals)
        mg = misra_gries_summary(vals, k)
        return pd.DataFrame({"item": list(mg.keys()), "cnt": list(mg.values())})

    parts = ds.map_batches(_summary, batch_format="pandas", batch_size=65536).to_pandas()
    merged: dict = {}
    for item, cnt in zip(parts["item"], parts["cnt"]):
        merged[item] = merged.get(item, 0) + int(cnt)
    if len(merged) > k:
        counts = sorted(merged.values(), reverse=True)
        cut = counts[k]
        merged = {key: c - cut for key, c in merged.items() if c - cut > 0}
    out = pd.DataFrame({"item": list(merged.keys()), "est": list(merged.values())})
    return out.sort_values(["est", "item"], ascending=[False, True]).reset_index(drop=True)


def histogram_quantiles(
    ds: "ray.data.Dataset",
    column: str,
    bins: int = 4096,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> "pd.DataFrame":
    """Mergeable fixed-bin histogram quantile sketch -> (q, est) rows:
    est is the LOWER EDGE of the bin holding the k-th value (k =
    ceil(q*n), 1-indexed). Error bound: one bin width = (max-min)/bins.

    The canonical 100 TB quantile pattern: pass 1 is a (min, max, n)
    aggregate; pass 2 emits a FIXED-SIZE partial per batch (np.bincount
    over ``bins`` slots) merged by vector sum -- partial size is
    data-independent, unlike the exact cent-histogram twin
    (value_percentiles) whose partial rides the value cardinality.

    Fully deterministic, so it is ORACLE-EXACT, not rows-only: binning is
    floor(((v - min) * bins) / (max - min)) -- every float op IEEE
    round-to-nearest with this exact association, reproduced verbatim in
    the DuckDB twin."""
    import pandas as pd
    import ray.data  # noqa: F401
    from ray.data.aggregate import Count, Max, Min

    agg = ds.aggregate(Min(column), Max(column), Count())
    n = int(agg.get("count()", 0) or 0)
    if n == 0:
        return pd.DataFrame({"q": pd.Series(dtype=np.float64),
                             "est": pd.Series(dtype=np.float64)})
    mn = float(agg[f"min({column})"])
    mx = float(agg[f"max({column})"])
    fbins = float(bins)

    def hist(batch: "pd.DataFrame") -> "pd.DataFrame":
        v = batch[column].to_numpy(dtype=np.float64)
        if mx == mn:
            b = np.zeros(len(v), dtype=np.int64)
        else:
            b = np.floor(((v - mn) * fbins) / (mx - mn)).astype(np.int64)
            b = np.minimum(b, bins - 1)
        return pd.DataFrame({"c": np.bincount(b, minlength=bins).astype(np.int64),
                             "bin": np.arange(bins, dtype=np.int64)})

    # fixed-size partials: driver merge is bins-sized regardless of data
    parts = ds.map_batches(hist, batch_format="pandas", batch_size=65536).to_pandas()
    counts = parts.groupby("bin")["c"].sum().reindex(range(bins), fill_value=0)
    cum = counts.cumsum().to_numpy()

    out_q, out_est = [], []
    for q in quantiles:
        k = int(np.ceil(q * n))
        b = int(np.searchsorted(cum, k))
        out_q.append(q)
        out_est.append(mn + ((float(b) * (mx - mn)) / fbins))
    return pd.DataFrame({"q": np.array(out_q, dtype=np.float64),
                         "est": np.array(out_est, dtype=np.float64)})


def count_min_sketch(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> "pd.DataFrame":
    """Count-min sketch over the corpus token stream -> its nonzero cells
    (r, c, n). The third mergeable sketch next to HLL (distinct) and
    Misra-Gries (heavy hitters): point-query estimate for any token is
    min over rows of cell(r, hash_r(token)), always an OVERestimate with
    the standard (eps, delta) bound.

    Per-batch partials are FIXED-SIZE depth x width int64 grids merged by
    vector sum -- integer, order-independent, so the whole sketch is
    BITWISE deterministic and (unusually for a sketch) value-oracle-able:
    row hashes are the corpus polyhash64 recurrence over 'cms{r}:' + token,
    reproduced verbatim in SQL."""
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import polyhash64
    from ..functions.tokenize import flat_tokens

    def grid(t: "pa.Table") -> "pd.DataFrame":
        flat, _ = flat_tokens(t[text_col], fill_null=True)
        toks = np.asarray(flat.to_pandas(), dtype=object)
        g = np.zeros((depth, width), dtype=np.int64)
        for r in range(depth):
            keyed = np.array([f"cms{r}:" + s for s in toks], dtype=object)
            cols = (polyhash64(keyed) % np.uint64(width)).astype(np.int64)
            g[r] = np.bincount(cols, minlength=width)
        rr, cc = np.nonzero(g)
        return pd.DataFrame({"r": rr.astype(np.int64), "c": cc.astype(np.int64),
                             "n": g[rr, cc]})

    parts = ds.map_batches(grid, batch_format="pyarrow", batch_size=4096).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"r": pd.Series(dtype=np.int64),
                             "c": pd.Series(dtype=np.int64),
                             "n": pd.Series(dtype=np.int64)})
    out = parts.groupby(["r", "c"], as_index=False)["n"].sum()
    return out.astype({"r": np.int64, "c": np.int64, "n": np.int64})


def grouped_approx_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    column: str,
    p: int = 10,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT column) PER GROUP -- the mergeable-sketch
    groupby, the shape that replaces exact two-level pair dedup when the
    pair space itself is too hot to shuffle: each batch emits one 2^p-byte
    HLL register block per (batch, group), one key-hashed shuffle merges
    them by register-wise max, and the estimate happens inside the
    partition sweep. Data motion per group is sketch-sized (2^p bytes),
    independent of that group's row count -- a hot key costs the same as a
    cold one. Default p=10 (1 KiB, ~3.2% standard error); bump p for
    tighter bounds."""
    from .groupby import hash_partition_apply

    def _partials(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {k: batch[k] for k in keys} | {"registers": pd.Series(dtype=object)}
            )
        rows = []
        for kv, g in batch.groupby(keys, sort=False):
            h = HyperLogLog(p)
            h.add(g[column].dropna().to_numpy())
            if not isinstance(kv, tuple):
                kv = (kv,)
            rows.append((*kv, h.registers.tobytes()))
        return pd.DataFrame(rows, columns=keys + ["registers"])

    parts = ds.map_batches(_partials, batch_format="pandas", batch_size=65536)

    def _merge(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {k: part[k] for k in keys} | {"approx_n": pd.Series(dtype="int64")}
            )
        rows = []
        for kv, g in part.groupby(keys, sort=False):
            regs = np.maximum.reduce(
                [np.frombuffer(b, dtype=np.uint8) for b in g["registers"]]
            )
            h = HyperLogLog(p)
            h.registers = regs.copy()
            if not isinstance(kv, tuple):
                kv = (kv,)
            rows.append((*kv, np.int64(h.estimate_int())))
        return pd.DataFrame(rows, columns=keys + ["approx_n"])

    return hash_partition_apply(parts, keys, _merge, num_partitions,
                                stamp_batch_size=None)
