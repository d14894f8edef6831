"""Deduplication operators over the ``documents`` table.

Beyond the reference's exact sorted-stream dedup (links.go:60-77), these are
the large-scale training-data dedup family:

- exact: hash/groupby-partition, keep min doc_id per identical text
- MinHash + LSH: shingle -> minhash signature -> band buckets -> candidate
  pairs -> Jaccard verify -> connected components (union-find on the small
  verified-pair set)
- SimHash: 64-bit signature, bucket by signature (near-dup at hamming 0;
  band variant for hamming<=k)
- n-gram Jaccard: exact pairwise verification within LSH buckets

All heavy stages are vectorized ``map_batches``; only provably small
results (candidate pairs, cluster edges) reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import (
    minhash_coeffs,
    minhash_signatures_batch,
    polyhash64,
    shingles,
    simhash64_batch,
)
from ..functions.tokenize import flat_tokens, kgram_join, kgram_starts

# Version tag of the MinHash signature hash function. Persisted in the
# index manifest by write_minhash_index and checked by
# incremental_minhash_dedup: signatures made with different hashes never
# collide, so mixing them silently hides every cross-increment duplicate.
SIG_HASH_FN = "polyhash64-v1"

# per-call input cap of edit_near_dups' key/replication map: one call
# builds a 2*sub_blocks-fold replicated object-dtype frame, so cap the
# rows one slice stages (65536 in -> ~1M staged rows) independent of how
# many rows the byte-targeted read packs into a block
_KEYS_SLICE_ROWS = 65536


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Keep the smallest doc_id per identical text -> (doc_id, text).
    Group count == distinct-text count (high cardinality), so this is a
    map-side partial min + hash-partitioned final min, not a per-group
    Ray aggregate (stages/groupby.py rationale)."""
    from .groupby import hash_partition_aggregate

    agg = hash_partition_aggregate(docs, ["text"], {"doc_id": ("doc_id", "min")})
    return agg.map_batches(lambda df: df[["doc_id", "text"]], batch_format="pandas")


class _SigStage:
    """Actor-pool base: MinHash signature parameters held per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        self.k = shingle_k
        self.num_perm = num_perm
        self.seed = seed


def _minhash_sig_batch(
    batch: pa.Table, num_perm: int = 64, shingle_k: int = 3, seed: int = 7
) -> pd.DataFrame:
    """Fully vectorized MinHash signatures for one batch: Arrow whitespace
    split + positional k-gram concat (_shingle_arrays), one hash pass, one
    segmented min -- no per-document Python shingle loop. Coefficient state
    is tiny + deterministic, so this runs as ELASTIC TASKS (per-process
    coeff cache), not an actor pool -- the signature stage scales to every
    CPU instead of a reserved pool (BASELINE.md engine lesson)."""
    a, b = _cached_minhash_coeffs(num_perm, seed)
    sh, pos = _shingle_arrays(batch, shingle_k)
    n = batch.num_rows
    if len(sh):
        # seedless codepoint-polynomial shingle hash (functions.hashing
        # .polyhash64): the one hash choice that lets the DuckDB oracle
        # recompute the IDENTICAL signature (HUGEINT list_reduce mod 2^64),
        # making minhash_dedup value-exact instead of rows-only
        hashes = polyhash64(sh)
        order = np.argsort(pos, kind="stable")
        hashes = hashes[order]
        counts = np.bincount(pos, minlength=n)
    else:
        hashes = np.array([], dtype=np.uint64)
        counts = np.zeros(n, dtype=np.int64)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    sigs = minhash_signatures_batch(hashes, starts, a, b)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(),
            "sig": [s.astype(np.int64).tobytes() for s in sigs],
        }
    )


_MINHASH_COEFF_CACHE: dict = {}


def _cached_minhash_coeffs(num_perm: int, seed: int):
    # plain-dict per-process cache, NOT functools.lru_cache: an
    # lru_cache wrapper pickles BY REFERENCE (module+qualname), so a
    # worker without the repo on sys.path raises ModuleNotFoundError the
    # moment a by-value task function references it (foreign-cwd driver)
    key = (num_perm, seed)
    if key not in _MINHASH_COEFF_CACHE:
        _MINHASH_COEFF_CACHE[key] = minhash_coeffs(num_perm, seed)
    return _MINHASH_COEFF_CACHE[key]


class MinHashSignatures(_SigStage):
    """Actor-pool wrapper kept for API compatibility; the elastic
    ``_minhash_sig_batch`` is the default execution tier."""

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        return _minhash_sig_batch(batch, self.num_perm, self.k, self.seed)


def minhash_band_rows(sig_ds: ray.data.Dataset, bands: int, rows_per_band: int) -> ray.data.Dataset:
    """Explode signatures to (band_id, band_hash, doc_id) rows for the LSH
    bucket groupby."""

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame({"band_id": pd.Series([], dtype=np.int64),
                                 "band_hash": pd.Series([], dtype=np.int64),
                                 "doc_id": pd.Series([], dtype=np.int64)})
        sigs = np.frombuffer(b"".join(batch["sig"]), dtype=np.int64).reshape(n, -1)
        usigs = sigs.view(np.uint64)
        out_band, out_hash, out_doc = [], [], []
        doc = batch["doc_id"].to_numpy()
        for b in range(bands):
            seg = usigs[:, b * rows_per_band:(b + 1) * rows_per_band]
            # polynomial fold of the band's signature values in uint64
            # wraparound -- SQL-reproducible (list_reduce mod 2^64), unlike
            # the former pandas siphash
            h = np.zeros(n, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(seg.shape[1]):
                    h = h * np.uint64(1000003) + seg[:, j]
            out_band.append(np.full(n, b, dtype=np.int64))
            out_hash.append(h.view(np.int64))
            out_doc.append(doc)
        return pd.DataFrame(
            {
                "band_id": np.concatenate(out_band),
                "band_hash": np.concatenate(out_hash),
                "doc_id": np.concatenate(out_doc),
            }
        )

    return sig_ds.map_batches(_explode, batch_format="pandas")


def lsh_candidate_pairs_ds(band_rows: ray.data.Dataset) -> ray.data.Dataset:
    """(band_id, band_hash) buckets -> DISTINCT doc-id pair Dataset (a, b).
    Bucket count ~= doc count x bands (high cardinality), so buckets are
    co-located by a hash-partitioned shuffle and paired with one vectorized
    sweep per partition; the pair set never leaves the object store.

    Each doc is paired with BOTH its bucket minimum and its sorted-order
    predecessor (still O(n) edges per bucket, not O(n^2)): min-edges alone
    lose recall after verification when the bucket min is dissimilar to two
    docs that are near-dups of each other -- the consecutive edges keep
    within-bucket chains connected through verification survivors."""
    from .groupby import hash_partition_apply

    def _pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["band_id", "band_hash", "doc_id"]).sort_values(
            ["band_id", "band_hash", "doc_id"], kind="mergesort"
        )
        grp = g.groupby(["band_id", "band_hash"], sort=False)["doc_id"]
        first = grp.transform("first").to_numpy()
        prev = grp.shift(1).to_numpy()
        doc = g["doc_id"].to_numpy()
        mask = doc != first
        a = np.concatenate([first[mask], prev[mask].astype(np.int64)])
        b = np.concatenate([doc[mask], doc[mask]])
        return pd.DataFrame({"a": a, "b": b}).query("a != b")

    # distributed pair dedup BEFORE the driver collect: a pair matching in
    # many bands (near-identical docs) arrives once, so driver traffic is
    # bounded by distinct candidate pairs, not band hits
    from .groupby import hash_partition_aggregate

    pairs = hash_partition_apply(
        band_rows, ["band_id", "band_hash"], _pairs_part, stamp_batch_size=None
    )
    deduped = hash_partition_aggregate(
        pairs, ["a", "b"], {"n": ("a", "count")}, stamp_batch_size=None
    )
    return deduped.map_batches(lambda d: d[["a", "b"]], batch_format="pandas")


def lsh_candidate_pairs(band_rows: ray.data.Dataset) -> pd.DataFrame:
    """Driver-side convenience wrapper around lsh_candidate_pairs_ds."""
    return lsh_candidate_pairs_ds(band_rows).to_pandas().reset_index(drop=True)


def _shingle_hash_sets(texts: np.ndarray, k: int) -> list[np.ndarray]:
    """Unique texts -> per-text SORTED unique uint64 shingle-hash arrays
    (polyhash64 over the exact shingles() strings): ONE vectorized
    tokenize+shingle+hash pass over the whole text subset, replacing
    per-pair Python set construction in verification."""
    tbl = pa.table(
        {"text": pa.array([t if isinstance(t, str) else "" for t in texts],
                          type=pa.string())}
    )
    sh, pos = _shingle_arrays(tbl, k)
    out: list[np.ndarray] = [np.array([], dtype=np.uint64)] * len(texts)
    if len(sh):
        h = polyhash64(sh)
        order = np.argsort(pos, kind="stable")
        pos_s, h_s = pos[order], h[order]
        bounds = np.searchsorted(pos_s, np.arange(len(texts) + 1))
        for i in range(len(texts)):
            out[i] = np.unique(h_s[bounds[i]:bounds[i + 1]])
    return out


def _pair_jaccard_vec(ta: np.ndarray, tb: np.ndarray, k: int) -> np.ndarray:
    """Exact shingle-set Jaccard for aligned text pairs: dedupe the texts,
    hash-shingle them once (vectorized), then per-pair sorted-array
    intersections (C-speed intersect1d) -- no Python string set ops.
    Both-empty pairs (identical empty docs) define jaccard = 1."""
    allt = pd.unique(np.concatenate([np.asarray(ta, dtype=object),
                                     np.asarray(tb, dtype=object)]))
    idx = {t: i for i, t in enumerate(allt)}
    sets = _shingle_hash_sets(allt, k)
    jac = np.empty(len(ta), dtype=np.float64)
    for j, (x, y) in enumerate(zip(ta, tb)):
        sa, sb = sets[idx[x]], sets[idx[y]]
        if len(sa) == 0 and len(sb) == 0:
            jac[j] = 1.0
        else:
            i = np.intersect1d(sa, sb, assume_unique=True).size
            jac[j] = i / max(1, len(sa) + len(sb) - i)
    return jac


# ---------------------------------------------------------------------------
# Exact distributed shingle-Jaccard (no LSH approximation anywhere)
# ---------------------------------------------------------------------------


def _shingle_arrays(batch, k: int) -> tuple[np.ndarray, np.ndarray]:
    """One batch of docs -> (shingle_strings, batch_row_index) for EVERY
    token k-gram (multiset; duplicates kept), fully vectorized: Arrow
    whitespace split, positional k-gram join via numpy object concat,
    per-doc whole-text fallback for short docs (matching
    functions.hashing.shingles semantics exactly)."""
    flat_a, parent = flat_tokens(batch["text"], fill_null=True)
    flat = np.asarray(flat_a.to_numpy(zero_copy_only=False), dtype=object)
    n = batch.num_rows
    counts = np.bincount(parent, minlength=n)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    # full k-grams (docs with >= k tokens): starts where endpoints share a doc
    base = kgram_starts(parent, k)
    sh = kgram_join(flat, base, k)
    out_pos = parent[base] if len(base) else np.array([], dtype=np.int64)
    # short docs (1..k-1 tokens): the whole tokenized text joined is the one
    # shingle -- joined from the FILTERED tokens (binary_join over raw parts
    # would keep the phantom ""s and emit e.g. "a " for "a ")
    short = np.nonzero((counts > 0) & (counts < k))[0]
    if len(short):
        joined = np.array(
            [" ".join(flat[starts[i]: starts[i] + counts[i]]) for i in short],
            dtype=object,
        )
        sh = np.concatenate([sh, joined])
        out_pos = np.concatenate([out_pos, short])
    return sh, out_pos.astype(np.int64)


def _shingle_rows_batch(batch, k: int) -> pd.DataFrame:
    """One batch of docs -> DISTINCT (doc_id, s, sz) shingle rows."""
    sh, pos = _shingle_arrays(batch, k)
    doc_ids = batch["doc_id"].to_numpy()
    out_doc = doc_ids[pos] if len(pos) else np.array([], dtype=np.int64)
    out = pd.DataFrame({"doc_id": out_doc, "s": sh}).drop_duplicates()
    # each doc lives entirely in one batch, so the per-doc distinct-shingle
    # SIZE is exact here; riding it on every row lets the pair stage carry
    # |A| and |B| through the shuffle -- no separate size aggregate + joins
    out["sz"] = out.groupby("doc_id", sort=False)["s"].transform("size").astype(np.int64)
    return out


def shingle_rows(
    docs: ray.data.Dataset, shingle_k: int = 3, hot_ref=None
) -> ray.data.Dataset:
    """documents -> distinct (doc_id, s:str, sz:int64) token-k-shingle rows
    (sz = the doc's distinct-shingle count, constant per doc).
    ``hot_ref``: optional ``ray.put`` ObjectRef of a shingle ndarray to DROP
    (document-frequency cap); sizes are recomputed AFTER the drop so
    downstream Jaccard denominators stay consistent with the reduced
    shingle space."""

    def _batch(b, k=shingle_k, hot_ref=hot_ref) -> pd.DataFrame:
        out = _shingle_rows_batch(b, k)
        if hot_ref is not None:
            out = _drop_hot_resize(out, ray.get(hot_ref))
        return out

    return docs.map_batches(_batch, batch_format="pyarrow")


def _drop_hot_resize(out: pd.DataFrame, hot: np.ndarray) -> pd.DataFrame:
    """Drop rows whose shingle is in the PRE-SORTED ``hot`` array
    (sorted-array membership instead of rebuilding a hash set per batch)
    and recompute the per-doc ``sz`` over the reduced shingle space.
    Requires every doc's rows to sit wholly inside ``out`` (true for
    shingle-explosion batches and for block-aligned re-maps of them)."""
    sv = out["s"].to_numpy()
    if len(hot) and len(sv):
        pos = np.searchsorted(hot, sv)
        pos[pos == len(hot)] = 0
        keep = hot[pos] != sv
        out = out[keep].copy()
        out["sz"] = (
            out.groupby("doc_id", sort=False)["s"]
            .transform("size")
            .astype(np.int64)
        )
    return out


def hot_shingles(
    docs: ray.data.Dataset, shingle_k: int, df_cutoff: int,
    num_partitions: int = 64,
) -> np.ndarray:
    """Shingles whose document frequency exceeds ``df_cutoff`` -- the
    broadcast payload for the skew cap. Distributed count (shingle rows are
    distinct per doc, so df = row count per shingle); only the hot TAIL
    (at most corpus_docs/df_cutoff values) reaches the driver."""
    return hot_from_shingle_rows(
        shingle_rows(docs, shingle_k), df_cutoff, num_partitions)


def hot_from_shingle_rows(
    rows: ray.data.Dataset, df_cutoff: int, num_partitions: int = 64,
) -> np.ndarray:
    """``hot_shingles`` over an ALREADY-SHINGLED row Dataset (distinct per
    doc, so df = row count per shingle) -- lets single-pass callers pin the
    rows once and count over the pinned blocks."""
    from .groupby import hash_partition_aggregate

    df = hash_partition_aggregate(
        rows.map_batches(lambda d: d[["doc_id", "s"]], batch_format="pandas"),
        ["s"], {"n": ("doc_id", "count")}, num_partitions,
        stamp_batch_size=None,
    )
    hot = df.map_batches(
        lambda d, c=df_cutoff: d[d["n"] > c][["s"]], batch_format="pandas"
    ).to_pandas()
    return np.sort(hot.get("s", pd.Series(dtype=object)).to_numpy())


def exact_jaccard_pairs(
    docs: ray.data.Dataset, shingle_k: int = 3, threshold: float = 0.5,
    num_partitions: int = 64, df_cutoff: int | None = None,
    df_cutoff_sizes: str = "reduced",
) -> ray.data.Dataset:
    """EXACT all-pairs token-k-gram Jaccard >= threshold -> (a, b, jaccard),
    with no LSH approximation and no driver-side loops: explode distinct
    shingles, co-partition by shingle to generate shared-shingle pair
    partials, hash-partition-aggregate pair intersection counts, join
    per-doc shingle-set sizes (bucketed joins), then
    jaccard = |A∩B| / (|A| + |B| - |A∩B|) as one exact int division.

    Pairs with zero shared shingles (jaccard 0) never materialize anywhere.
    Only TWO shuffles total: shingle co-partition (pair partials, with both
    docs' set sizes riding along) and the (a, b) pair-count aggregate.
    Skew: a shingle shared by m docs contributes O(m^2) pair partials.
    ``df_cutoff`` caps m: shingles with document frequency > cutoff are
    counted distributedly, broadcast once (``ray.put``; the hot tail is at
    most docs/cutoff values), and dropped BEFORE pairing. Two documented
    denominator policies via ``df_cutoff_sizes``:

    - ``"reduced"`` (default): per-doc set sizes are recomputed on the
      reduced shingle space -- Jaccard is exact over that space (the
      standard stopword-cap tradeoff). The resize needs whole-doc
      visibility, which only the shingling map itself has, so this policy
      shingles the corpus TWICE (once for the hot count, once capped) --
      the intended cost of exact reduced-space denominators.
    - ``"full"``: denominators keep the FULL-space sizes; intersections
      count only non-hot shingles, so the score is a conservative lower
      bound of true Jaccard. This policy shingles the corpus ONCE: rows
      are pinned, the hot tail is counted over the pinned blocks, and the
      drop re-maps the same blocks (no per-doc resize needed).

    The oracle query runs with df_cutoff=None (fully exact); both policies
    equal it when no shingle crosses the cutoff (tier-equality tested).
    """
    from .groupby import hash_partition_aggregate, hash_partition_apply

    if df_cutoff_sizes not in ("reduced", "full"):
        raise ValueError(f"df_cutoff_sizes must be 'reduced' or 'full', "
                         f"got {df_cutoff_sizes!r}")
    if df_cutoff is not None and df_cutoff_sizes == "full":
        sh = shingle_rows(docs, shingle_k).materialize()
        hot = hot_from_shingle_rows(sh, df_cutoff, num_partitions)
        if len(hot):
            hot_ref = ray.put(hot)

            def _drop(df: pd.DataFrame, hot_ref=hot_ref) -> pd.DataFrame:
                hot = ray.get(hot_ref)
                sv = df["s"].to_numpy()
                if not (len(hot) and len(sv)):
                    return df
                pos = np.searchsorted(hot, sv)
                pos[pos == len(hot)] = 0
                return df[hot[pos] != sv]

            sh = sh.map_batches(_drop, batch_format="pandas")
    else:
        hot_ref = None
        if df_cutoff is not None:
            hot = hot_shingles(docs, shingle_k, df_cutoff, num_partitions)
            if len(hot):
                hot_ref = ray.put(hot)
        sh = shingle_rows(docs, shingle_k, hot_ref)

    def _pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="s")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m.groupby(["doc_id_x", "doc_id_y"], as_index=False, sort=False).agg(
            i=("s", "size"), sz_a=("sz_x", "first"), sz_b=("sz_y", "first")
        )
        return out.rename(columns={"doc_id_x": "a", "doc_id_y": "b"})

    pair_partials = hash_partition_apply(
        sh, ["s"], _pair_partials, num_partitions, stamp_batch_size=None
    )
    inter = hash_partition_aggregate(
        pair_partials,
        ["a", "b"],
        {"i": ("i", "sum"), "sz_a": ("sz_a", "min"), "sz_b": ("sz_b", "min")},
        num_partitions,
        stamp_batch_size=None,
    )

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        i = df["i"].to_numpy(dtype=np.int64)
        union = (df["sz_a"].to_numpy(dtype=np.int64)
                 + df["sz_b"].to_numpy(dtype=np.int64) - i)
        jac = i / union
        out = pd.DataFrame(
            {
                "a": df["a"].to_numpy(dtype=np.int64),
                "b": df["b"].to_numpy(dtype=np.int64),
                "jaccard": jac,
            }
        )
        return out[jac >= threshold]

    return inter.map_batches(_finalize, batch_format="pandas")


def _pair_overlap_vec(ta: np.ndarray, tb: np.ndarray, k: int) -> np.ndarray:
    """Exact distinct-shingle INTERSECTION COUNT for aligned text pairs --
    the overlap-join sibling of ``_pair_jaccard_vec`` (same dedupe + one
    vectorized hash-shingle pass + C-speed sorted intersections)."""
    allt = pd.unique(np.concatenate([np.asarray(ta, dtype=object),
                                     np.asarray(tb, dtype=object)]))
    idx = {t: i for i, t in enumerate(allt)}
    sets = _shingle_hash_sets(allt, k)
    out = np.empty(len(ta), dtype=np.int64)
    for j, (x, y) in enumerate(zip(ta, tb)):
        out[j] = np.intersect1d(
            sets[idx[x]], sets[idx[y]], assume_unique=True
        ).size
    return out


def overlap_join(
    docs: ray.data.Dataset,
    shingle_k: int = 3,
    min_overlap: int = 3,
    num_partitions: int = 64,
    method: str = "count",
) -> ray.data.Dataset:
    """Exact set-overlap join |A ∩ B| >= c over distinct token-k-gram sets
    -> (a, b, overlap). Two tiers with identical output, chosen by the
    c-to-set-size regime:

    - ``method="count"`` (default): shared-shingle co-partition pair
      partials -> one (a, b) count aggregate -> filter >= c. Two shuffles,
      fully vectorized, cost rides the number of SHARING pairs -- right
      whenever c is small relative to typical set size (the common case;
      the one-threshold-lower sibling of exact_jaccard_pairs).
    - ``method="prefix"``: PREFIX FILTERING (Chaudhuri et al., ICDE'06):
      order each doc's shingles by (document frequency ASC, shingle ASC)
      and only its first |A| - c + 1 generate candidates -- any pair with
      overlap >= c MUST share a prefix key -- then verify candidates with
      one vectorized hash-shingle pass over the joined texts. The filter
      prunes by sz - (c - 1) per doc, so it pays when c approaches the
      set size (boilerplate/near-identity detection with long docs); at
      small c it degenerates to all sharing pairs plus overhead, which is
      why it is not the default. Tier equality is pinned in tests."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    rows = shingle_rows(docs, shingle_k)
    if method == "count":
        slim = rows.map_batches(
            lambda df: df[["doc_id", "s"]], batch_format="pandas"
        )

        def _pair_counts(g: pd.DataFrame) -> pd.DataFrame:
            m = g.merge(g, on="s")
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            out = m.groupby(["doc_id_x", "doc_id_y"], as_index=False,
                            sort=False).size()
            return out.rename(
                columns={"doc_id_x": "a", "doc_id_y": "b", "size": "i"}
            )

        partials = hash_partition_apply(
            slim, ["s"], _pair_counts, num_partitions, stamp_batch_size=None
        )
        inter = hash_partition_aggregate(
            partials, ["a", "b"], {"overlap": ("i", "sum")}, num_partitions,
            stamp_batch_size=None,
        )
        return inter.map_batches(
            lambda df, c=min_overlap: df[df["overlap"].to_numpy() >= c],
            batch_format="pandas",
        )
    rows = rows.map_batches(
        lambda df, c=min_overlap: df[df["sz"] >= c], batch_format="pandas"
    )
    dfreq = hash_partition_aggregate(
        rows, ["s"], {"df": ("doc_id", "count")}, num_partitions,
        stamp_batch_size=None,
    )
    from .join import bucketed_hash_join

    ranked = bucketed_hash_join(rows, dfreq, "s", "s",
                                num_partitions=num_partitions)

    def _prefix(part: pd.DataFrame, c=min_overlap) -> pd.DataFrame:
        srt = part.sort_values(["doc_id", "df", "s"], kind="mergesort")
        pos = srt.groupby("doc_id", sort=False).cumcount()
        keep = pos < (srt["sz"].to_numpy(dtype=np.int64) - c + 1)
        return srt[keep][["doc_id", "s"]]

    prefix_rows = hash_partition_apply(
        ranked, ["doc_id"], _prefix, num_partitions, stamp_batch_size=None
    )

    def _cand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="s")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return m[["doc_id_x", "doc_id_y"]].rename(
            columns={"doc_id_x": "a", "doc_id_y": "b"}
        ).drop_duplicates()

    cand = hash_partition_aggregate(
        hash_partition_apply(
            prefix_rows, ["s"], _cand, num_partitions, stamp_batch_size=None
        ),
        ["a", "b"],
        {"one": ("a", "count")},
        num_partitions,
        stamp_batch_size=None,
    ).map_batches(lambda df: df[["a", "b"]], batch_format="pandas")
    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return cand.map_batches(
            lambda df: df.assign(overlap=np.int64(0)), batch_format="pandas"
        )
    texts = docs.map_batches(
        lambda df: df[["doc_id", "text"]], batch_format="pandas"
    )
    joined = pair_join_values(cand, texts, "text", n_cand)

    def _verify(df: pd.DataFrame, k=shingle_k, c=min_overlap) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "overlap": pd.Series(dtype="int64")}
            )
        ov = _pair_overlap_vec(
            df["text_a"].to_numpy(object), df["text_b"].to_numpy(object), k
        )
        out = pd.DataFrame(
            {"a": df["a"].to_numpy(np.int64), "b": df["b"].to_numpy(np.int64),
             "overlap": ov}
        )
        return out[ov >= c]

    return joined.map_batches(_verify, batch_format="pandas")


def _shingle_count_rows_batch(batch, k: int, hot: np.ndarray | None = None) -> pd.DataFrame:
    """One batch of docs -> (doc_id, s, c, nsq) TERM-FREQUENCY shingle rows:
    c = the shingle's multiplicity within the doc (the multiset kept, unlike
    ``_shingle_rows_batch``'s distinct set), nsq = the doc's squared L2 norm
    sum(c^2), constant per doc and riding on every row so the pair stage can
    carry both norms through the shuffle without extra joins. ``hot``: an
    optional PRE-SORTED shingle array to drop (document-frequency skew
    cap); norms are computed AFTER the drop, so cosine stays exact over
    the reduced term space (the exact_jaccard_pairs df_cutoff contract)."""
    sh, pos = _shingle_arrays(batch, k)
    doc_ids = batch["doc_id"].to_numpy()
    out_doc = doc_ids[pos] if len(pos) else np.array([], dtype=np.int64)
    if hot is not None and len(hot) and len(sh):
        p = np.searchsorted(hot, sh)
        p[p == len(hot)] = 0
        keep = hot[p] != sh
        sh, out_doc = sh[keep], out_doc[keep]
    flat = pd.DataFrame({"doc_id": out_doc, "s": sh})
    out = flat.groupby(["doc_id", "s"], as_index=False, sort=False).size()
    out = out.rename(columns={"size": "c"})
    out["c"] = out["c"].astype(np.int64)
    csq = out["c"].to_numpy() ** 2
    out["nsq"] = (
        pd.Series(csq, index=out.index)
        .groupby(out["doc_id"], sort=False)
        .transform("sum")
        .astype(np.int64)
    )
    return out


def tf_cosine_pairs(
    docs: ray.data.Dataset,
    shingle_k: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    num_partitions: int = 64,
    df_cutoff: int | None = None,
) -> ray.data.Dataset:
    """EXACT all-pairs WEIGHTED (term-frequency) cosine similarity join over
    token-k-gram count vectors -> (a, b, dot, nsq_a, nsq_b), keeping pairs
    with cos(A, B) >= threshold_num/threshold_den. The sibling of
    ``exact_jaccard_pairs`` for multiplicity-aware similarity: a doc that
    repeats a passage 5x is close to one repeating it 4x even though their
    shingle SETS are identical to a single-copy doc.

    Everything stays integer-exact: the threshold is a rational num/den and
    cos >= t  <=>  dot^2 * den^2 >= num^2 * nsq_a * nsq_b (dot >= 0 always,
    counts are non-negative), so no float ever enters the gate and the
    DuckDB oracle reproduces every cell bitwise.

    Same two-shuffle scale shape as exact_jaccard_pairs: shingle-count rows
    co-partitioned by shingle emit shared-shingle dot-product partials (a
    shingle with document frequency m contributes O(m^2) partials), then
    one hash-partition aggregate over (a, b). Norms ride the rows;
    zero-overlap pairs never materialize. ``df_cutoff`` is the same skew
    cap as exact_jaccard_pairs: shingles with document frequency > cutoff
    are counted distributedly, broadcast once, and dropped BEFORE pairing,
    with norms recomputed on the reduced term space (cosine stays exact
    over that space; the oracle query runs with df_cutoff=None)."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    hot_ref = None
    if df_cutoff is not None:
        hot = hot_shingles(docs, shingle_k, df_cutoff, num_partitions)
        if len(hot):
            hot_ref = ray.put(hot)

    def _rows_batch(b, k=shingle_k, ref=hot_ref):
        return _shingle_count_rows_batch(
            b, k, None if ref is None else ray.get(ref)
        )

    rows = docs.map_batches(_rows_batch, batch_format="pyarrow")

    def _pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="s")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        m = m.assign(dotp=m["c_x"].to_numpy() * m["c_y"].to_numpy())
        out = m.groupby(["doc_id_x", "doc_id_y"], as_index=False, sort=False).agg(
            dot=("dotp", "sum"), nsq_a=("nsq_x", "first"), nsq_b=("nsq_y", "first")
        )
        return out.rename(columns={"doc_id_x": "a", "doc_id_y": "b"})

    partials = hash_partition_apply(
        rows, ["s"], _pair_partials, num_partitions, stamp_batch_size=None
    )
    agg = hash_partition_aggregate(
        partials,
        ["a", "b"],
        {"dot": ("dot", "sum"), "nsq_a": ("nsq_a", "min"), "nsq_b": ("nsq_b", "min")},
        num_partitions,
        stamp_batch_size=None,
    )
    num2 = int(threshold_num) ** 2
    den2 = int(threshold_den) ** 2

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        dot = df["dot"].to_numpy(dtype=np.int64)
        na = df["nsq_a"].to_numpy(dtype=np.int64)
        nb = df["nsq_b"].to_numpy(dtype=np.int64)
        keep = dot * dot * den2 >= num2 * na * nb
        return pd.DataFrame(
            {
                "a": df["a"].to_numpy(dtype=np.int64)[keep],
                "b": df["b"].to_numpy(dtype=np.int64)[keep],
                "dot": dot[keep],
                "nsq_a": na[keep],
                "nsq_b": nb[keep],
            }
        )

    return agg.map_batches(_finalize, batch_format="pandas")


def minhash_dedup(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    concurrency: int = 4,
    cc: str = "driver",
) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline -> (doc_id, dup_of) for every doc
    in a near-dup cluster (dup_of = smallest doc_id in the cluster;
    representatives map to themselves). Verification re-reads only candidate
    docs' text (semi-join via broadcast id set).

    ``cc`` selects the clustering tier over the verified edge set:
    "driver" (default) runs path-compressed union-find on the driver --
    right while edges fit in one process; "distributed" runs the
    large-star/small-star contraction (stages/graph.connected_components),
    the 100 TB path for dup-heavy corpora whose verified-pair set is itself
    huge; "auto" dispatches by verified-edge count
    (graph.connected_components_auto). All tiers are output-identical
    (tests/test_dedup.py).
    """
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        _minhash_sig_batch,
        fn_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
    )
    # materialized: pair-set-sized in the object store; feeds the id-set
    # aggregate AND both verify joins without re-executing the LSH chain
    cand_ds = lsh_candidate_pairs_ds(
        minhash_band_rows(sigs, bands, rows_per_band)
    ).materialize()
    n_cand = cand_ds.count()
    empty = pd.DataFrame({"doc_id": [], "dup_of": []}, dtype=np.int64)
    if n_cand == 0:
        return empty
    vp_ds = verified_pairs_ds(docs, cand_ds, n_cand, shingle_k, threshold)
    if cc in ("distributed", "auto"):
        from .graph import connected_components, connected_components_auto

        comp = (
            connected_components_auto(vp_ds)
            if cc == "auto"
            else connected_components(vp_ds)
        ).to_pandas()
        if comp.empty:
            return empty
        return (
            comp.rename(columns={"node": "doc_id", "rep": "dup_of"})
            .astype(np.int64)
            .sort_values("doc_id", kind="mergesort")
            .reset_index(drop=True)
        )
    verified = vp_ds.to_pandas().reset_index(drop=True)
    # union-find over the (small) verified edge set
    return _union_find_links(verified["a"], verified["b"])


def _pair_endpoint_ids(cand_ds: ray.data.Dataset) -> np.ndarray:
    """Distinct doc ids on either end of a pair Dataset: per-batch partial
    unique -> driver union (the array IS the broadcast payload, so it must
    reach the driver anyway; no shuffle)."""

    def _ids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.unique(
                    np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()])
                )
            }
        )

    ids = cand_ds.map_batches(_ids, batch_format="pandas").to_pandas()
    return np.unique(ids["doc_id"].to_numpy(dtype=np.int64))


def _union_find_links(a_vals, b_vals) -> pd.DataFrame:
    """Driver-tier clustering of an edge list -> (doc_id, dup_of) with
    dup_of = smallest member of each connected component (path-compressed
    union-find; shared by batch and incremental dedup)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(a_vals, b_vals):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    members = sorted({int(x) for x in a_vals} | {int(x) for x in b_vals})
    return pd.DataFrame(
        {"doc_id": members, "dup_of": [find(m) for m in members]}, dtype=np.int64
    )


def pair_join_values(
    pairs: ray.data.Dataset,
    values: ray.data.Dataset,
    val_col: str,
    n_pairs: int,
) -> ray.data.Dataset:
    """Attach a per-doc value to both endpoints of a pair Dataset:
    (a, b) x (doc_id, <val_col>) -> (a, b, <val_col>_a, <val_col>_b) via
    two co-partitioned bucketed hash joins -- the scale-safe lookup used by
    both the text-verify join tier and the incremental signature verify."""
    from .join import bucketed_hash_join

    va = values.map_batches(
        lambda df, c=val_col: df.rename(columns={c: f"{c}_a"}),
        batch_format="pandas",
    )
    vb = values.map_batches(
        lambda df, c=val_col: df.rename(
            columns={"doc_id": "doc_id_b", c: f"{c}_b"}
        ),
        batch_format="pandas",
    )
    # partition count sized to the pair set: tiny candidate sets don't pay
    # for a 64-way sort; large ones still spread
    parts = int(min(64, max(4, n_pairs // 512)))
    j1 = bucketed_hash_join(pairs, va, "a", "doc_id", num_partitions=parts)
    # pair-set-sized: materialize so the second join's schema probe and
    # execution don't re-run the first join's shuffle
    j1 = j1.materialize()
    return bucketed_hash_join(j1, vb, "b", "doc_id_b", num_partitions=parts)


def verified_pairs_ds(
    docs: ray.data.Dataset,
    cand_ds: ray.data.Dataset,
    n_cand: int,
    shingle_k: int,
    threshold: float,
    broadcast_max_bytes: int = 128 << 20,
) -> ray.data.Dataset:
    """Distributed candidate verification: broadcast the candidate doc-id
    set ONCE (ray.put -- never closure-captured per task), semi-filter the
    corpus to candidate docs, then verify candidate pairs with an exact
    shingle-set Jaccard in one of two tiers:

    - broadcast tier (candidate-text subset <= ``broadcast_max_bytes``,
      the common case -- the subset is dup-rate-bounded, not corpus-
      bounded): ship the texts once via ``ray.put`` and verify with a
      single shuffle-free map over the pair Dataset;
    - join tier (dup-heavy corpora): bucket-join the pairs against the
      texts on each end and verify inside the co-located partitions --
      nothing text-sized is ever broadcast.

    The only driver-side objects are the distinct candidate-id array and
    (broadcast tier only) the size-gated text subset -- both ARE the
    broadcast payloads. -> Dataset (a, b, jaccard), jaccard >= threshold.
    """
    need = _pair_endpoint_ids(cand_ds)
    need_ref = ray.put(need)

    # elastic tasks, not an actor pool: this dataset feeds two join sides,
    # and reserved actor pools can starve the shuffle stages on a small
    # cluster; the task closure captures only the ObjectRef (ray.get is a
    # zero-copy local object-store read, not a per-task reshipment)
    def _cand_filter(batch: pd.DataFrame, need_ref=need_ref) -> pd.DataFrame:
        mask = np.isin(batch["doc_id"].to_numpy(), ray.get(need_ref))
        out = batch[mask][["doc_id", "text"]].copy()
        out["text"] = out["text"].fillna("")  # lenient null policy
        return out

    # materialize the candidate-text subset ONCE (bounded by the LSH
    # candidate set, lives in the object store): both join sides and their
    # schema fetches would otherwise each re-run the corpus filter pass
    sub = docs.map_batches(_cand_filter, batch_format="pandas").materialize()

    if sub.size_bytes() <= broadcast_max_bytes:
        # broadcast tier: one ray.put of the size-gated text subset, one
        # shuffle-free vectorized-lookup map over the pair Dataset.
        # drop_duplicates: a corpus with duplicate doc_id rows would make
        # the reindex raise on duplicate labels (same guard as the
        # incremental signature path)
        texts_df = sub.to_pandas().drop_duplicates("doc_id")
        text_ref = ray.put(
            pd.Series(
                texts_df["text"].to_numpy(), index=texts_df["doc_id"].to_numpy()
            )
        )

        def _verify_bcast(
            df: pd.DataFrame, text_ref=text_ref, k=shingle_k, thr=threshold
        ) -> pd.DataFrame:
            s = ray.get(text_ref)
            ta = s.reindex(df["a"].to_numpy()).to_numpy()
            tb = s.reindex(df["b"].to_numpy()).to_numpy()
            jac = _pair_jaccard_vec(ta, tb, k)
            out = pd.DataFrame(
                {
                    "a": df["a"].to_numpy(dtype=np.int64),
                    "b": df["b"].to_numpy(dtype=np.int64),
                    "jaccard": jac,
                }
            )
            return out[jac >= thr]

        return cand_ds.map_batches(_verify_bcast, batch_format="pandas")

    j2 = pair_join_values(cand_ds, sub, "text", n_cand)

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        # exact shingle-set Jaccard, vectorized over the batch (texts
        # hash-shingled once, per-pair sorted intersections); the pair set
        # is LSH-bounded and spread over partitions -- the kernel runs in
        # workers, not the driver. Docs with zero shingles (empty text)
        # only ever pair with other empty docs (identical signatures),
        # where jaccard is defined as 1 (identical empties are also
        # exact_dedup's job)
        jac = _pair_jaccard_vec(
            df["text_a"].to_numpy(), df["text_b"].to_numpy(), shingle_k
        )
        out = pd.DataFrame(
            {
                "a": df["a"].to_numpy(dtype=np.int64),
                "b": df["b"].to_numpy(dtype=np.int64),
                "jaccard": jac,
            }
        )
        return out[jac >= threshold]

    return j2.map_batches(_verify, batch_format="pandas")


def verified_pairs(
    docs: ray.data.Dataset, cand: pd.DataFrame, shingle_k: int, threshold: float
) -> pd.DataFrame:
    """Driver-side convenience wrapper around verified_pairs_ds."""
    cand_ds = ray.data.from_pandas(cand[["a", "b"]].astype(np.int64))
    return (
        verified_pairs_ds(docs, cand_ds, len(cand), shingle_k, threshold)
        .to_pandas()
        .reset_index(drop=True)
    )


def _simhash_batch(batch: pa.Table) -> pd.DataFrame:
    """Token hash = seedless codepoint-polynomial (functions.hashing.polyhash64)
    so the DuckDB oracle can recompute the identical 64-bit signature
    (HUGEINT list_reduce per token + per-bit vote aggregate). Tokenization
    is the Arrow whitespace split (same \\S+ semantics as the oracle's
    regexp_extract_all); the whole batch is one flat token array + one
    segmented bit-vote -- no per-row Python."""
    flat_a, parent = flat_tokens(batch["text"], fill_null=True)
    flat = flat_a.to_numpy(zero_copy_only=False)
    n = batch.num_rows
    counts = np.bincount(parent, minlength=n)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    hashes = polyhash64(flat)
    sigs = simhash64_batch(hashes, starts)
    return pd.DataFrame(
        {"doc_id": batch["doc_id"].to_numpy(), "simhash": sigs.view(np.int64)}
    )


class SimHasher:
    """Actor-pool wrapper kept for API compatibility; the elastic
    ``_simhash_batch`` is the default execution tier."""

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        return _simhash_batch(batch)


def simhash_signatures(docs: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    """(doc_id, simhash:int64) -- bucket-by-signature gives hamming-0
    near-dup groups; simhash_near_dup_pairs does hamming<=k via lossless
    16-bit band blocking. Stateless + vectorized -> elastic tasks (all
    CPUs), no actor pool; ``concurrency`` kept for API compatibility."""
    return docs.map_batches(_simhash_batch, batch_format="pyarrow")


def ngram_jaccard_pairs(
    docs: ray.data.Dataset, shingle_k: int = 3, threshold: float = 0.5
) -> ray.data.Dataset:
    """ALL doc pairs with token-k-gram Jaccard >= threshold -> Dataset
    (a, b, jaccard) -- exact (shared-shingle co-partitioning, not LSH), so
    a SQL oracle over the same shingle definition matches value-for-value.
    For blocking-based near-dup clustering use minhash_dedup instead."""
    return exact_jaccard_pairs(docs, shingle_k=shingle_k, threshold=threshold)


def simhash_near_dup_pairs(
    docs: ray.data.Dataset,
    max_hamming: int = 3,
    bands: int | None = None,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """EXACT SimHash near-dup pairs -> (a, b, hamming) for every doc pair
    with signature hamming distance <= max_hamming.

    By pigeonhole, any pair within hamming ``max_hamming < bands`` agrees
    exactly on at least one of the ``bands`` 16-bit signature bands, so
    band-bucketing is a lossless blocking step, not an approximation --
    the standard SimHash trick (Manku et al., WWW'07), and the reason this
    operator gets a full value-exact SQL oracle while MinHash-LSH stays
    rows-only. Skew: a band value shared by m docs generates O(m^2) pair
    partials inside one partition (same bound and caveat as
    exact_jaccard_pairs; near-identical corpora need an upstream cap).
    """
    if bands is None:
        # pigeonhole needs MORE bands than differing bits; pick the smallest
        # divisor of 64 that exceeds max_hamming so band widths stay equal
        bands = next(b for b in (1, 2, 4, 8, 16, 32) if b > max_hamming)
    if max_hamming >= bands:
        raise ValueError(
            f"band blocking is lossy for max_hamming={max_hamming} with "
            f"bands={bands}: a pair can differ in every band (need "
            f"max_hamming < bands for the EXACT contract)"
        )
    from .groupby import hash_partition_aggregate, hash_partition_apply
    from ..functions.hashing import popcount64

    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    sigs = simhash_signatures(docs, concurrency=concurrency)

    def _band_rows(df: pd.DataFrame) -> pd.DataFrame:
        sig = df["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        doc = df["doc_id"].to_numpy(dtype=np.int64)
        n = len(df)
        out = {
            "band_id": np.repeat(np.arange(bands, dtype=np.int64), n),
            "band_val": np.concatenate(
                [((sig >> np.uint64(j * width)) & mask).view(np.int64) for j in range(bands)]
            ),
            "doc_id": np.tile(doc, bands),
            "sig": np.tile(sig.view(np.int64), bands),
        }
        return pd.DataFrame(out)

    band_rows = sigs.map_batches(_band_rows, batch_format="pandas")

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_val"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame(
            {
                "a": m["doc_id_x"].to_numpy(dtype=np.int64),
                "b": m["doc_id_y"].to_numpy(dtype=np.int64),
                "sig_a": m["sig_x"].to_numpy(dtype=np.int64),
                "sig_b": m["sig_y"].to_numpy(dtype=np.int64),
            }
        ).drop_duplicates(["a", "b"])

    pairs = hash_partition_apply(
        band_rows, ["band_id", "band_val"], _bucket_pairs, stamp_batch_size=None
    )
    # a pair sharing several bands arrives once per band: distributed dedup
    # (sigs are constant per doc -> min is the identity)
    deduped = hash_partition_aggregate(
        pairs,
        ["a", "b"],
        {"sig_a": ("sig_a", "min"), "sig_b": ("sig_b", "min")},
        stamp_batch_size=None,
    )

    def _hamming(df: pd.DataFrame) -> pd.DataFrame:
        x = df["sig_a"].to_numpy(dtype=np.int64).view(np.uint64) ^ df[
            "sig_b"
        ].to_numpy(dtype=np.int64).view(np.uint64)
        h = popcount64(x)
        out = pd.DataFrame(
            {
                "a": df["a"].to_numpy(dtype=np.int64),
                "b": df["b"].to_numpy(dtype=np.int64),
                "hamming": h,
            }
        )
        return out[h <= max_hamming]

    return deduped.map_batches(_hamming, batch_format="pandas")


# ---------------------------------------------------------------------------
# Incremental near-dup detection against a persistent signature index
# ---------------------------------------------------------------------------
#
# The reference never reprocesses finished inputs (stage skip / freshness
# gating, pageviews.go:87-93, itemsignals.go:140-152); this applies the same
# discipline to dedup: a crawl increment is checked against the ACCUMULATED
# corpus without recomputing anything for old documents. Old docs exist only
# as MinHash signatures (512 B/doc at 64 perms), so verification uses the
# signature-estimate Jaccard (matching-component fraction -- the standard
# unbiased MinHash estimator), not a text re-read: approximate by design,
# value-checked against planted dups in tests.


def write_minhash_index(
    docs: ray.data.Dataset,
    index_dir: str,
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 7,
) -> str:
    """(Re)build a persistent MinHash signature index: parquet shards of
    (doc_id, sig) under ``index_dir/sigs`` plus a params manifest that
    later increments validate against. Returns ``index_dir``."""
    import json
    import os
    import shutil

    sig_dir = os.path.join(index_dir, "sigs")
    shutil.rmtree(sig_dir, ignore_errors=True)
    os.makedirs(sig_dir, exist_ok=True)
    sigs = docs.map_batches(
        _minhash_sig_batch,
        fn_kwargs={"num_perm": num_perm, "shingle_k": shingle_k, "seed": seed},
        batch_format="pyarrow",
    )
    sigs.write_parquet(sig_dir, compression="zstd")
    # hash_fn versions the signature hash: signatures produced by a
    # different hash share ~0 components with these, so a silent mix would
    # make every cross-increment duplicate invisible. Increments refuse to
    # run against a manifest whose hash_fn doesn't match the code's.
    manifest = {
        "num_perm": num_perm,
        "shingle_k": shingle_k,
        "seed": seed,
        "hash_fn": SIG_HASH_FN,
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return index_dir


def _read_index_manifest(index_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def _sig_band_rows(
    sig_ds: ray.data.Dataset, bands: int, rows_per_band: int, is_new: int
) -> ray.data.Dataset:
    """minhash_band_rows + an is_new tag (0 = indexed, 1 = increment)."""
    rows = minhash_band_rows(sig_ds, bands, rows_per_band)
    return rows.map_batches(
        lambda df, t=is_new: df.assign(is_new=np.int64(t)), batch_format="pandas"
    )


def incremental_minhash_dedup(
    new_docs: ray.data.Dataset,
    index_dir: str,
    bands: int = 16,
    threshold: float = 0.8,
    append: bool = True,
    broadcast_max_bytes: int = 128 << 20,
) -> pd.DataFrame:
    """Near-dup links for a corpus INCREMENT against the accumulated index
    -> (doc_id, dup_of) for every NEW doc matching an indexed doc or
    another new doc (dup_of = smallest doc id in the matched group; may be
    an old doc). Old-old pairs are never generated -- they were resolved
    when their shards were the increment. With ``append`` (default) the new
    signatures join the index, so the next increment sees them.

    Candidate generation co-partitions old+new band rows and emits only
    pairs touching a new doc; verification is the signature-estimate
    Jaccard over a bucketed pair-sig join. Everything is increment-bounded:
    the index is only ever READ as a streamed Dataset.
    """
    import os
    import uuid

    man = _read_index_manifest(index_dir)
    idx_hash = man.get("hash_fn", "<unversioned pre-polyhash index>")
    if idx_hash != SIG_HASH_FN:
        raise ValueError(
            f"MinHash index at {index_dir} was built with signature hash "
            f"{idx_hash!r} but this code produces {SIG_HASH_FN!r}; mixed "
            "signatures never collide, so duplicates would be silently "
            "missed. Rebuild the index with write_minhash_index."
        )
    num_perm = man["num_perm"]
    rows_per_band = num_perm // bands
    assert num_perm % bands == 0

    new_sigs = new_docs.map_batches(
        _minhash_sig_batch,
        fn_kwargs={
            "num_perm": num_perm,
            "shingle_k": man["shingle_k"],
            "seed": man["seed"],
        },
        batch_format="pyarrow",
    ).materialize()
    sig_dir = os.path.join(index_dir, "sigs")
    old_sigs = ray.data.read_parquet(sig_dir)

    band_rows = _sig_band_rows(old_sigs, bands, rows_per_band, 0).union(
        _sig_band_rows(new_sigs, bands, rows_per_band, 1)
    )

    def _pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["band_id", "band_hash", "doc_id"]).sort_values(
            ["band_id", "band_hash", "doc_id"], kind="mergesort"
        )
        grp = g.groupby(["band_id", "band_hash"], sort=False)
        first = grp["doc_id"].transform("first").to_numpy()
        first_new = grp["is_new"].transform("first").to_numpy().astype(bool)
        prev = grp["doc_id"].shift(1).to_numpy()
        prev_new = grp["is_new"].shift(1).to_numpy()
        doc = g["doc_id"].to_numpy()
        new = g["is_new"].to_numpy().astype(bool)
        non_head = doc != first
        m1 = non_head & (new | first_new)
        m2 = non_head & (new | (prev_new == 1))
        a = np.concatenate([first[m1], prev[m2].astype(np.int64)])
        b = np.concatenate([doc[m1], doc[m2]])
        return pd.DataFrame({"a": a, "b": b}).query("a != b")

    from .groupby import hash_partition_aggregate, hash_partition_apply

    pairs = hash_partition_apply(
        band_rows, ["band_id", "band_hash"], _pairs_part, stamp_batch_size=None
    )
    cand_ds = hash_partition_aggregate(
        pairs, ["a", "b"], {"n": ("a", "count")}, stamp_batch_size=None
    ).map_batches(lambda d: d[["a", "b"]], batch_format="pandas").materialize()
    n_cand = cand_ds.count()
    empty = pd.DataFrame({"doc_id": [], "dup_of": []}, dtype=np.int64)
    if n_cand == 0:
        if append:
            new_sigs.write_parquet(
                os.path.join(sig_dir, f"inc-{uuid.uuid4().hex}"), compression="zstd"
            )
        return empty

    # semi-filter both sig sources to candidate endpoints BEFORE the pair
    # join: the join side is then candidate-bounded, not index-bounded (an
    # increment against a 10^10-doc index must not shuffle the whole index).
    # Tier gates are DRIVER-COMPUTABLE bounds (pair count from the pinned
    # cand_ds; endpoint count x exact per-doc sig bytes), so the candidate
    # sig pull is ONE fused execution -- no materialize-then-probe, no
    # separate endpoint-scan + filter + verify chain (each chained
    # execution costs a fixed ~1 s regardless of data size).
    sig_bytes_per_doc = num_perm * 8 + 32
    pairs_fit = n_cand * 24 <= broadcast_max_bytes
    if pairs_fit:
        # small-pair tier pull: the pair list is its own endpoint source
        cpd = cand_ds.to_pandas()
        need = np.unique(np.concatenate(
            [cpd["a"].to_numpy(np.int64), cpd["b"].to_numpy(np.int64)]))
    else:
        cpd = None
        need = _pair_endpoint_ids(cand_ds)
    need_ref = ray.put(need)

    def _sig_filter(df: pd.DataFrame, need_ref=need_ref) -> pd.DataFrame:
        need = ray.get(need_ref)
        pos = np.searchsorted(need, df["doc_id"].to_numpy())
        pos[pos == len(need)] = 0
        return df[need[pos] == df["doc_id"].to_numpy()][["doc_id", "sig"]]

    sub = old_sigs.union(new_sigs).map_batches(_sig_filter, batch_format="pandas")

    def _est(sa: np.ndarray, sb: np.ndarray, a, b) -> pd.DataFrame:
        est = (sa == sb).mean(axis=1)
        out = pd.DataFrame(
            {
                "a": np.asarray(a, dtype=np.int64),
                "b": np.asarray(b, dtype=np.int64),
                "est_jaccard": est,
            }
        )
        return out[est >= threshold]

    if len(need) * sig_bytes_per_doc <= broadcast_max_bytes:
        # broadcast tier (the common case: candidate sigs are ~520 B/doc):
        # the filtered index scan streams straight to the driver (one
        # execution). A doc re-ingested or re-appended appears twice with
        # an IDENTICAL signature (deterministic params); keep one so the
        # lookup Series has unique labels (the join tier absorbs the
        # duplicate rows in union-find -- same final links)
        sdf = sub.to_pandas().drop_duplicates("doc_id")
        s = pd.Series(sdf["sig"].to_numpy(), index=sdf["doc_id"].to_numpy())

        def _sig_matrix(lookup: pd.Series, ids: np.ndarray) -> np.ndarray:
            return np.frombuffer(
                b"".join(lookup.reindex(ids)), dtype=np.int64
            ).reshape(len(ids), -1)

        if cpd is not None:
            # pairs already on the driver: verify is one vectorized numpy
            # kernel, zero extra executions
            verified = _est(_sig_matrix(s, cpd["a"].to_numpy(np.int64)),
                            _sig_matrix(s, cpd["b"].to_numpy(np.int64)),
                            cpd["a"].to_numpy(), cpd["b"].to_numpy())
        else:
            sig_ref = ray.put(s)

            def _verify_bcast(df: pd.DataFrame, sig_ref=sig_ref) -> pd.DataFrame:
                n = len(df)
                if n == 0:
                    return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                         "b": pd.Series([], dtype=np.int64),
                                         "est_jaccard": pd.Series([], dtype=np.float64)})
                lk = ray.get(sig_ref)
                return _est(_sig_matrix(lk, df["a"].to_numpy()),
                            _sig_matrix(lk, df["b"].to_numpy()),
                            df["a"].to_numpy(), df["b"].to_numpy())

            verified = cand_ds.map_batches(
                _verify_bcast, batch_format="pandas"
            ).to_pandas()
    else:
        joined = pair_join_values(cand_ds, sub.materialize(), "sig", n_cand)

        def _verify(df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            if n == 0:
                return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                     "b": pd.Series([], dtype=np.int64),
                                     "est_jaccard": pd.Series([], dtype=np.float64)})
            sa = np.frombuffer(b"".join(df["sig_a"]), dtype=np.int64).reshape(n, -1)
            sb = np.frombuffer(b"".join(df["sig_b"]), dtype=np.int64).reshape(n, -1)
            return _est(sa, sb, df["a"].to_numpy(), df["b"].to_numpy())

        verified = joined.map_batches(_verify, batch_format="pandas").to_pandas()

    # which ids are new (for output filtering): increment-bounded
    new_ids = set(
        int(x)
        for b in new_sigs.map_batches(
            lambda df: df[["doc_id"]], batch_format="pandas"
        ).iter_batches(batch_format="pandas")
        for x in b["doc_id"]
    )

    links = _union_find_links(verified["a"], verified["b"])
    out = links[links["doc_id"].isin(new_ids)].reset_index(drop=True)
    if append:
        new_sigs.write_parquet(
            os.path.join(sig_dir, f"inc-{uuid.uuid4().hex}"), compression="zstd"
        )
    return out


def repeated_passages(
    docs: ray.data.Dataset, window: int = 10, num_partitions: int = 64
) -> ray.data.Dataset:
    """Cross-document repeated-passage statistics -> (doc_id, n_windows,
    n_repeated): distinct ``window``-token passages per doc, and how many of
    them also occur in at least one OTHER document -- the passage-granular
    form of exact-substring dedup (flag training docs dominated by
    boilerplate shared across the corpus). Exact integers end to end.

    CONTRACT for short docs (1..window-1 tokens): the whole tokenized text
    counts as the doc's ONE window (the shingle fallback), so two short
    docs with identical text flag each other as 100% repeated -- that is
    the intended boilerplate signal, and the SQL oracle encodes the same
    fallback. Docs with zero tokens report (0, 0).

    Plumbing: TWO shuffles total (was four -- df-count shuffle, join-back
    shuffle, per-doc shuffle, zero-doc left-join shuffle). Passage rows
    are distinct (doc, s), so once a passage's rows co-locate, its
    document frequency is just the group size -- the repeated flag and the
    map-side per-doc reduction happen in the SAME s-keyed partition, and
    zero-window docs ride the final doc-keyed aggregate as literal zero
    rows instead of a left join. Nothing corpus-scaled on the driver."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    rows = shingle_rows(docs, window).map_batches(
        lambda d: d[["doc_id", "s"]], batch_format="pandas"
    )

    def _flag_partial(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "n_windows": pd.Series(dtype=np.int64),
                "n_repeated": pd.Series(dtype=np.int64)})
        df_s = part.groupby("s", sort=False)["doc_id"].transform("size")
        g = pd.DataFrame({
            "doc_id": part["doc_id"].to_numpy(np.int64),
            "n_windows": np.ones(len(part), dtype=np.int64),
            "n_repeated": (df_s.to_numpy(np.int64) > 1).astype(np.int64)})
        return g.groupby("doc_id", as_index=False).agg(
            n_windows=("n_windows", "sum"), n_repeated=("n_repeated", "sum"))

    partials = hash_partition_apply(
        rows, ["s"], _flag_partial, num_partitions, stamp_batch_size=None)
    # docs with no windows (zero tokens) contribute literal zero rows
    zeros = docs.map_batches(
        lambda b: pd.DataFrame({
            "doc_id": np.asarray(
                b["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64),
            "n_windows": np.zeros(b.num_rows, dtype=np.int64),
            "n_repeated": np.zeros(b.num_rows, dtype=np.int64)}),
        batch_format="pyarrow")
    return hash_partition_aggregate(
        partials.union(zeros), ["doc_id"],
        {"n_windows": ("n_windows", "sum"), "n_repeated": ("n_repeated", "sum")},
        num_partitions, stamp_batch_size=None)


def survivor_selection(
    quality: ray.data.Dataset,
    members: ray.data.Dataset,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_rep",
    score_col: str = "n_tokens",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Quality-aware dedup survivor policy: for each near-dup cluster keep
    the member with the highest ``score_col`` (ties -> lowest id), and map
    every doc to its cluster's survivor -> (doc_id, survivor, kept).

    ``quality`` covers the WHOLE corpus (id, score); ``members`` is the
    cluster membership (id, cluster) from connected components -- docs
    absent from it are singletons and survive as themselves.

    Scale shape: two hash-partition shuffles and nothing else. Stage 1
    co-partitions quality+membership by id (tagged union) and attaches each
    doc's cluster (self when unclustered); stage 2 co-partitions by cluster
    and broadcasts the per-cluster argmax to its members inside the
    partition sweep. Cluster sizes ride the partitions; the driver never
    sees a row. The policy half of exact/MinHash dedup: those stages decide
    WHO is duplicated, this decides WHICH copy a training set keeps.
    """
    from .groupby import hash_partition_apply

    def _tag_quality(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "id": pc.cast(t[id_col], pa.int64()),
                "cluster": pa.nulls(n, type=pa.int64()),
                "score": pc.cast(t[score_col], pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def _tag_members(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "id": pc.cast(t[id_col], pa.int64()),
                "cluster": pc.cast(t[cluster_col], pa.int64()),
                "score": pa.nulls(n, type=pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    u = quality.map_batches(_tag_quality, batch_format="pyarrow").union(
        members.map_batches(_tag_members, batch_format="pyarrow")
    )

    def _attach(part: pd.DataFrame) -> pd.DataFrame:
        q = part[part["side"] == 0][["id", "score"]]
        m = part[part["side"] == 1][["id", "cluster"]]
        out = q.merge(m, on="id", how="left")
        out["cluster"] = out["cluster"].fillna(out["id"]).astype(np.int64)
        return out[["id", "cluster", "score"]]

    attached = hash_partition_apply(u, ["id"], _attach, num_partitions)

    def _pick(part: pd.DataFrame) -> pd.DataFrame:
        srt = part.sort_values(
            ["cluster", "score", "id"], ascending=[True, False, True],
            kind="mergesort",
        )
        surv = srt.groupby("cluster", sort=False)["id"].transform("first")
        return pd.DataFrame(
            {
                "doc_id": srt["id"].to_numpy(np.int64),
                "survivor": surv.to_numpy(np.int64),
                "kept": (srt["id"].to_numpy() == surv.to_numpy()),
            }
        )

    return hash_partition_apply(attached, ["cluster"], _pick, num_partitions)


# ---------------------------------------------------------------------------
# Edit-distance (Levenshtein) near-dup join
# ---------------------------------------------------------------------------


def _levenshtein_pairs_vec(
    keys_a: np.ndarray, keys_b: np.ndarray
) -> np.ndarray:
    """Unit-cost Levenshtein distance for npairs (a, b) string pairs at
    once: the DP loops run over CHARACTER POSITIONS (<= max key length),
    every step a numpy op across all pairs -- no per-pair Python loop.

    The in-row left-to-right dependency (cur[j] = min(cand[j],
    cur[j-1]+1)) is resolved with a min-plus prefix scan: cur[j] =
    j + running_min(cand[i] - i), so each DP row is O(npairs * Lb)
    vector work instead of a scalar inner loop."""
    n = len(keys_a)
    if n == 0:
        return np.array([], dtype=np.int64)
    # numpy unicode arrays are fixed-width UCS4 -> zero-copy codepoint grid,
    # padded with NUL (never read: positions beyond la/lb cannot influence
    # prev[:, lb] because DP dependencies flow left-to-right)
    aw = max(1, max(len(s) for s in keys_a))
    bw = max(1, max(len(s) for s in keys_b))
    A = np.array(list(keys_a), dtype=f"U{aw}").view(np.uint32).reshape(n, aw)
    B = np.array(list(keys_b), dtype=f"U{bw}").view(np.uint32).reshape(n, bw)
    la = np.fromiter((len(s) for s in keys_a), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in keys_b), dtype=np.int64, count=n)
    # int16 DP: distances are bounded by the key width (<< 32767) and the
    # halved memory traffic is the dominant cost at millions of pairs
    prev = np.broadcast_to(
        np.arange(bw + 1, dtype=np.int16), (n, bw + 1)
    ).copy()
    pos = np.arange(bw + 1, dtype=np.int16)
    for i in range(1, int(la.max()) + 1 if n else 1):
        active = la >= i
        cost = (A[:, i - 1 : i] != B).astype(np.int16)  # (n, bw)
        cand = np.empty((n, bw + 1), dtype=np.int16)
        cand[:, 0] = i  # cur[0] = i deletions
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=cand[:, 1:])
        cur = np.minimum.accumulate(cand - pos, axis=1) + pos
        prev[active] = cur[active]
    return prev[np.arange(n), lb].astype(np.int64)


def _charbag(keys: np.ndarray, dims: int = 64) -> np.ndarray:
    """Folded bag-of-chars count matrix (n, dims) int16: codepoint %% dims.
    One edit changes a key's TRUE bag by at most 2 in L1; folding only
    merges counters, so folded-L1 <= true-L1 -- folded-L1 > 2*max_dist is
    a LOSSLESS rejection of a candidate pair."""
    n = len(keys)
    out = np.zeros((n, dims), dtype=np.int16)
    if n == 0:
        return out
    w = max(1, max(len(s) for s in keys))
    codes = np.array(list(keys), dtype=f"U{w}").view(np.uint32).reshape(n, w)
    folded = (codes % dims).astype(np.int64) + dims * np.arange(n)[:, None]
    np.add.at(out.reshape(-1), folded[codes != 0].ravel(), 1)
    return out


def edit_near_dups(
    docs: ray.data.Dataset,
    key_tokens: int = 4,
    max_dist: int = 3,
    num_partitions: int = 64,
    sub_blocks: int = 8,
    dp_chunk: int = 262_144,
) -> ray.data.Dataset:
    """All doc pairs whose title key (first ``key_tokens`` whitespace
    tokens of ``text``, single-space joined) is within unit-cost
    Levenshtein distance ``max_dist`` -> (a, b, dist), a < b by doc_id.
    The typo-tolerant near-dup join (title/URL variant collapsing) the
    set-similarity family cannot express -- Jaccard sees 'chapter 1' and
    'chapter 2' as disjoint tokens; edit distance sees one substitution.

    Blocking is LOSSLESS length banding: |len(ka)-len(kb)| <= max_dist is
    necessary for dist <= max_dist, so each key goes to its native band
    floor(len/(max_dist+1)) plus a ghost copy in the next band; a
    qualifying pair either shares a band (both native there) or straddles
    adjacent bands (ghost meets native) -- emitted exactly once by the
    not-both-ghosts rule.

    The in-band quadratic is DECOMPOSED, not hoped away: every row is
    salted into one of ``sub_blocks`` sub-blocks by doc_id and replicated
    to each (its-block, other-block) pair, so the shuffle key is
    (band, blo, bhi) and a partition holds only the two sub-blocks whose
    cross product it owns -- per-partition pair count is
    (band_size/sub_blocks)^2 regardless of band skew, and the band's pair
    work spreads over sub_blocks^2/2 cores. Each surviving candidate runs
    a folded bag-of-chars L1 rejection (lossless: one edit moves the bag
    by <= 2) and the vectorized multi-pair DP in ``dp_chunk`` slices
    (bounded memory). Replication factor is 2 * sub_blocks tiny key rows
    per doc -- the disk/shuffle cost of making worst-case skew flat.

    Token-less docs (null/empty/whitespace text) DO NOT participate: an
    empty key is degenerate -- at corpus scale the millions of empty docs
    would all collide in band 0 and generate O(m^2) dist-0 pairs of pure
    noise. (The SQL twin encodes the same contract naturally:
    array_to_string([]) is NULL, and NULL keys never satisfy the join.)"""
    from .groupby import hash_partition_apply

    width = max_dist + 1
    S = max(1, sub_blocks)

    def _keys(t: pa.Table):
        # generator: one output frame per <= _KEYS_SLICE_ROWS input rows.
        # Bounds the 2*sub_blocks-fold replicated staged frame a single
        # call builds (a byte-targeted read block of short docs can hold
        # millions of rows), while keeping batch_size=None below so small
        # corpora keep the read's block fan-out (see comment there).
        if t.num_rows == 0:
            yield _keys_slice(t)  # keep the staged schema on empty blocks
            return
        for s in range(0, t.num_rows, _KEYS_SLICE_ROWS):
            yield _keys_slice(t.slice(s, _KEYS_SLICE_ROWS))

    def _keys_slice(t: pa.Table) -> pd.DataFrame:
        flat, parent = flat_tokens(t["text"], fill_null=True)
        toks = np.asarray(flat.to_pandas(), dtype=object)
        nrow = t.num_rows
        rows = np.arange(nrow, dtype=np.int64)
        first = np.searchsorted(parent, rows, side="left")
        cnt = np.searchsorted(parent, rows, side="right") - first
        take = np.minimum(cnt, key_tokens)
        key = np.full(nrow, "", dtype=object)
        has = take >= 1
        key[has] = toks[first[has]].copy()
        for j in range(1, key_tokens):
            m = take > j
            key[m] = key[m] + " "
            key[m] = key[m] + toks[first[m] + j]
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # token-less docs are out by contract (see docstring)
        doc_id, key = doc_id[has], key[has]
        klen = np.fromiter((len(s) for s in key), dtype=np.int64, count=len(key))
        band = klen // width
        # native copy + ghost copy in the next band up ...
        doc2 = np.concatenate([doc_id, doc_id])
        key2 = np.concatenate([key, key])
        band2 = np.concatenate([band, band + 1])
        ghost2 = np.repeat([False, True], len(key))
        # ... then each row replicated to every sub-block pair it joins:
        # a row in block b appears in partitions (band, min(b,o), max(b,o))
        # for o in 0..S-1 -- each unordered row pair meets exactly once
        blk = (doc2 % S).astype(np.int64)
        n2 = len(doc2)
        oth = np.tile(np.arange(S, dtype=np.int64), n2)
        rep = np.repeat(np.arange(n2), S)
        return pd.DataFrame(
            {
                "doc_id": doc2[rep],
                "key": key2[rep],
                "band": band2[rep],
                "ghost": ghost2[rep],
                "blk": blk[rep],
                "blo": np.minimum(blk[rep], oth),
                "bhi": np.maximum(blk[rep], oth),
            }
        )

    # batch_size=None: per-BLOCK stamping. An explicit batch_size here
    # BUNDLES the upstream read blocks into one giant batch at small
    # corpus sizes, which collapses the sort-shuffle to ONE partition and
    # runs the whole quadratic sweep serially on one core (measured 4.3 s
    # single-task at sf0.1); per-block keeps the read's fan-out so the
    # sweep parallelizes, and at scale blocks are already batch-sized.
    staged = docs.map_batches(_keys, batch_format="pyarrow", batch_size=None)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "dist": pd.Series(dtype=np.int64),
            }
        )

    def _score(ids, keys, klen, bags, ghost, ii, jj, outs) -> None:
        keep = ~(ghost[ii] & ghost[jj])
        keep &= np.abs(klen[ii] - klen[jj]) <= max_dist
        keep &= ids[ii] != ids[jj]  # a doc never pairs with its ghost
        ii, jj = ii[keep], jj[keep]
        if not len(ii):
            return
        # lossless folded-bag rejection before the DP
        bagd = np.abs(
            bags[ii].astype(np.int32) - bags[jj].astype(np.int32)
        ).sum(axis=1)
        ok = bagd <= 2 * max_dist
        ii, jj = ii[ok], jj[ok]
        if not len(ii):
            return
        # identical-key fast path: near-dup corpora are mostly exact key
        # collisions, and those need no DP at all
        eq = keys[ii] == keys[jj]
        if eq.any():
            a = np.minimum(ids[ii][eq], ids[jj][eq])
            b = np.maximum(ids[ii][eq], ids[jj][eq])
            outs.append(pd.DataFrame(
                {"a": a, "b": b, "dist": np.zeros(int(eq.sum()), dtype=np.int64)}
            ))
            ii, jj = ii[~eq], jj[~eq]
        for s in range(0, len(ii), dp_chunk):
            i_c, j_c = ii[s : s + dp_chunk], jj[s : s + dp_chunk]
            dist = _levenshtein_pairs_vec(keys[i_c], keys[j_c])
            hit = dist <= max_dist
            a = np.minimum(ids[i_c][hit], ids[j_c][hit])
            b = np.maximum(ids[i_c][hit], ids[j_c][hit])
            outs.append(pd.DataFrame({"a": a, "b": b, "dist": dist[hit]}))

    def _pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (_, blo, bhi), g in part.groupby(["band", "blo", "bhi"], sort=False):
            ids = g["doc_id"].to_numpy(np.int64)
            keys = g["key"].to_numpy()
            ghost = g["ghost"].to_numpy()
            blk = g["blk"].to_numpy(np.int64)
            m = len(g)
            klen = np.fromiter((len(s) for s in keys), dtype=np.int64, count=m)
            bags = _charbag(keys)
            if blo == bhi:
                sel = np.nonzero(blk == blo)[0]
                if len(sel) < 2:
                    continue
                ti, tj = np.triu_indices(len(sel), 1)
                _score(ids, keys, klen, bags, ghost, sel[ti], sel[tj], outs)
            else:
                p = np.nonzero(blk == blo)[0]
                q = np.nonzero(blk == bhi)[0]
                if not len(p) or not len(q):
                    continue
                ii = np.repeat(p, len(q))
                jj = np.tile(q, len(p))
                _score(ids, keys, klen, bags, ghost, ii, jj, outs)
        if not outs:
            return _empty()
        out = pd.concat(outs, ignore_index=True)
        # a same-band pair exists as native-native in band b AND
        # ghost-ghost in band b+1; the not-both-ghosts rule already drops
        # the latter, so rows here are unique -- keep a cheap invariant
        # dedup for safety under future rule edits
        return out.drop_duplicates(["a", "b"], ignore_index=True)

    return hash_partition_apply(
        staged, ["band", "blo", "bhi"], _pairs, num_partitions,
        stamp_batch_size=None,
    )

def containment_pairs(
    docs: ray.data.Dataset, shingle_k: int = 3,
    pct_num: int = 4, pct_den: int = 5,
    num_partitions: int = 64, df_cutoff: int | None = None,
) -> ray.data.Dataset:
    """ASYMMETRIC containment join: directed pairs (inner, outer) where at
    least pct_num/pct_den (default 80%) of inner's DISTINCT token
    k-shingles also appear in outer -- the quote-inclusion / boilerplate-
    wrapper relation that symmetric Jaccard misses (a short doc fully
    embedded in a long one has low Jaccard but containment 1.0). Same
    two-shuffle plan as exact_jaccard_pairs (shared-shingle co-partition
    pair partials with both set sizes riding along, then one (a, b)
    intersection aggregate); the finalize emits each undirected pair in
    up to BOTH directions with the exact integer test
    pct_den * shared >= pct_num * sz_inner -- no float thresholds, so the
    oracle compare is bitwise. Output (inner, outer, shared, sz_inner),
    all int64. ``df_cutoff`` is the same documented stopword-cap skew
    tradeoff as exact_jaccard_pairs (oracle runs with None)."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    hot_ref = None
    if df_cutoff is not None:
        hot = hot_shingles(docs, shingle_k, df_cutoff, num_partitions)
        if len(hot):
            hot_ref = ray.put(hot)
    sh = shingle_rows(docs, shingle_k, hot_ref)

    def _pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="s")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m.groupby(["doc_id_x", "doc_id_y"], as_index=False, sort=False).agg(
            i=("s", "size"), sz_a=("sz_x", "first"), sz_b=("sz_y", "first")
        )
        return out.rename(columns={"doc_id_x": "a", "doc_id_y": "b"})

    pair_partials = hash_partition_apply(
        sh, ["s"], _pair_partials, num_partitions, stamp_batch_size=None
    )
    inter = hash_partition_aggregate(
        pair_partials,
        ["a", "b"],
        {"i": ("i", "sum"), "sz_a": ("sz_a", "min"), "sz_b": ("sz_b", "min")},
        num_partitions,
        stamp_batch_size=None,
    )

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        i = df["i"].to_numpy(dtype=np.int64)
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        sa = df["sz_a"].to_numpy(dtype=np.int64)
        sb = df["sz_b"].to_numpy(dtype=np.int64)
        ka = pct_den * i >= pct_num * sa  # a contained in b
        kb = pct_den * i >= pct_num * sb  # b contained in a
        return pd.DataFrame({
            "inner_doc": np.concatenate([a[ka], b[kb]]),
            "outer_doc": np.concatenate([b[ka], a[kb]]),
            "shared": np.concatenate([i[ka], i[kb]]),
            "sz_inner": np.concatenate([sa[ka], sb[kb]]),
        })

    return inter.map_batches(_finalize, batch_format="pandas")


def lsh_eval(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Approximation audit for the MinHash-LSH pipeline: exact tp/fp/fn of
    the LSH candidate EDGE set (the bucket-min + sorted-predecessor rule
    the real pipeline uses, lsh_candidate_pairs_ds -- not all-in-bucket
    pairs) against ground truth = exact shingle-set Jaccard >= threshold,
    with the minhash convention that two shingle-LESS docs are perfect
    duplicates (jaccard(empty, empty) = 1). -> one row (tp, fp, fn), all
    int64 -- the recall/precision evidence a 100 TB dedup run records
    before trusting the approximate tier.

    Counting plan, nothing pair-set-sized on the driver: candidates and
    truth pairs are tagged 1/2 and reduced by ONE (a, b)-keyed
    hash-partition aggregate (tag sum 3 = intersection); the shingle-less
    doc ids are a small broadcast (their C(m,2) truth pairs are counted
    ANALYTICALLY, never materialized); per-block partial counts sum on
    the driver (#blocks-sized)."""
    from .groupby import hash_partition_aggregate
    from .textstats import token_counts

    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        _minhash_sig_batch,
        fn_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
    )
    cand = lsh_candidate_pairs_ds(
        minhash_band_rows(sigs, bands, rows_per_band)
    ).materialize()
    n_cand = cand.count()

    truth = exact_jaccard_pairs(docs, shingle_k, threshold, num_partitions)

    emp = token_counts(docs).map_batches(
        lambda df: df[df["n_tokens"] == 0][["doc_id"]],
        batch_format="pandas").to_pandas()
    empty_ids = (np.sort(emp["doc_id"].to_numpy(dtype=np.int64))
                 if len(emp) else np.array([], dtype=np.int64))
    m = len(empty_ids)
    n_empty_truth = m * (m - 1) // 2
    empty_ref = ray.put(empty_ids)

    def _tag(k):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "a": df["a"].to_numpy(dtype=np.int64),
                "b": df["b"].to_numpy(dtype=np.int64),
                "tag": np.full(len(df), k, dtype=np.int64)})
        return fn

    tagged = cand.map_batches(_tag(1), batch_format="pandas").union(
        truth.map_batches(_tag(2), batch_format="pandas"))
    groups = hash_partition_aggregate(
        tagged, ["a", "b"], {"tag": ("tag", "sum")},
        num_partitions, stamp_batch_size=None)

    def _partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "tp1": [int((df["tag"].to_numpy() == 3).sum())],
            "n_truth_j": [int((df["tag"].to_numpy() >= 2).sum())]})

    parts = groups.map_batches(
        _partial_counts, batch_format="pandas").to_pandas()
    tp1 = int(parts["tp1"].sum()) if len(parts) else 0
    n_truth_j = int(parts["n_truth_j"].sum()) if len(parts) else 0

    def _empty_pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(empty_ref)
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        both = np.isin(a, ids) & np.isin(b, ids)
        return pd.DataFrame({"tp2": [int(both.sum())]})

    tp2 = 0
    if m and n_cand:
        ep = cand.map_batches(
            _empty_pair_counts, batch_format="pandas").to_pandas()
        tp2 = int(ep["tp2"].sum()) if len(ep) else 0

    tp = tp1 + tp2
    fp = n_cand - tp
    fn = (n_truth_j + n_empty_truth) - tp
    return pd.DataFrame({"tp": [np.int64(tp)], "fp": [np.int64(fp)],
                         "fn": [np.int64(fn)]})


def winnow_fingerprints_batch(
    batch: pa.Table, k: int = 3, w: int = 4
) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): k-token shingle hashes, then from every window of ``w``
    consecutive shingle positions select the RIGHTMOST minimum; the
    distinct (position, hash) picks are the doc's fingerprints -- the
    guarantee-bearing variant of sampled fingerprinting (every shared run
    of length >= w+k-1 tokens yields a shared pick).

    Fully vectorized across the batch: one polyhash pass over all
    shingles, one sentinel-padded sliding_window_view for ALL docs at once
    (uint64-max pads separate docs; a pad can win a window only when every
    real value ties it, and the clip to the doc's last position restores
    the rightmost REAL minimum, matching the SQL twin). Docs are whole
    rows, so per-batch output is final -- no shuffle.

    -> (doc_id, pos, fp) with fp = polyhash64(shingle) % 2^63 (BIGINT-safe
    for the oracle compare; selection uses the full uint64 hash)."""
    empty = pd.DataFrame({
        "doc_id": pd.Series(dtype=np.int64),
        "pos": pd.Series(dtype=np.int64),
        "fp": pd.Series(dtype=np.int64)})
    sh, rows = _shingle_arrays(batch, k)
    if len(sh) == 0:
        return empty
    # per-doc shingle positions: full k-grams sit at their token start
    # index; the short-doc fallback shingle is position 0. _shingle_arrays
    # emits full k-grams first (ordered by (row, token pos)) then shorts,
    # so a (row, pos) lexsort restores per-doc order.
    flat_a, parent = flat_tokens(batch["text"], fill_null=True)
    nrows = batch.num_rows
    counts = np.bincount(parent, minlength=nrows)
    starts = np.zeros(nrows, dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    base = kgram_starts(parent, k)
    pos_full = (base - starts[parent[base]]) if len(base) else np.array([], dtype=np.int64)
    n_short = len(sh) - len(pos_full)
    pos = np.concatenate([pos_full, np.zeros(n_short, dtype=np.int64)])
    order = np.lexsort((pos, rows))
    sh, rows, pos = sh[order], rows[order], pos[order]
    h = polyhash64(sh)

    # per-doc shingle counts and padded layout: each doc's hash run is
    # followed by (w-1) uint64-max sentinels so one sliding window pass
    # serves every doc
    nsh = np.bincount(rows, minlength=nrows)
    docs = np.nonzero(nsh)[0]
    seg = nsh[docs]
    pad_len = seg + (w - 1)
    pad_starts = np.zeros(len(docs), dtype=np.int64)
    pad_starts[1:] = np.cumsum(pad_len)[:-1]
    total = int(pad_len.sum())
    padded = np.full(total, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    # real positions: doc d's shingles land at pad_starts[d] .. +seg[d]-1
    real_idx = np.repeat(pad_starts, seg) + _grouped_arange(seg)
    padded[real_idx] = h

    win = np.lib.stride_tricks.sliding_window_view(padded, w)
    # valid window starts per doc: local offsets 0 .. max(seg-w, 0)
    nwin = np.maximum(seg - w + 1, 1)
    wstart = np.repeat(pad_starts, nwin) + _grouped_arange(nwin)
    wdoc_i = np.repeat(np.arange(len(docs)), nwin)
    sub = win[wstart]
    rarg = np.argmin(sub[:, ::-1], axis=1)
    local = (wstart - pad_starts[wdoc_i]) + (w - 1 - rarg)
    # clip: only reachable when a sentinel tied an all-max short window
    local = np.minimum(local, seg[wdoc_i] - 1)
    sel_global_real = np.repeat(
        np.concatenate([[0], np.cumsum(seg)[:-1]]), nwin) + local
    out = pd.DataFrame({
        "row": docs[wdoc_i],
        "pos": pos[sel_global_real],
        "hh": h[sel_global_real]}).drop_duplicates()
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pd.DataFrame({
        "doc_id": doc_ids[out["row"].to_numpy()].astype(np.int64),
        "pos": out["pos"].to_numpy(np.int64),
        "fp": (out["hh"].to_numpy()
               % np.uint64(0x8000000000000000)).astype(np.int64)})


def _grouped_arange(sizes: np.ndarray) -> np.ndarray:
    """[0..sizes[0]-1, 0..sizes[1]-1, ...] without a Python loop."""
    if len(sizes) == 0 or sizes.sum() == 0:
        return np.array([], dtype=np.int64)
    total = int(sizes.sum())
    idx = np.arange(total, dtype=np.int64)
    offs = np.repeat(np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes)
    return idx - offs


def winnow_fingerprints(
    docs: ray.data.Dataset, k: int = 3, w: int = 4
) -> ray.data.Dataset:
    """Dataset wrapper: per-batch winnowing (docs are whole rows, output
    is final), elastic tasks, Arrow in."""
    return docs.map_batches(
        lambda t, k=k, w=w: winnow_fingerprints_batch(t, k=k, w=w),
        batch_format="pyarrow")
