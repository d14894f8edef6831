import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.stages.dedup import (
    exact_dedup,
    minhash_dedup,
    simhash_signatures,
)


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
        )
    )


def test_exact_dedup_keeps_min_id():
    ds = _docs(["aa bb", "cc dd", "aa bb", "ee", "cc dd"])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1, 3]


def test_minhash_finds_planted_near_dup():
    base = " ".join(f"w{i}" for i in range(60))
    near = " ".join(f"w{i}" for i in range(59)) + " zz"  # ~0.95 shingle overlap
    other = " ".join(f"x{i}" for i in range(60))
    ds = _docs([base, other, near])
    out = minhash_dedup(ds, threshold=0.8, concurrency=1)
    got = dict(zip(out["doc_id"], out["dup_of"]))
    assert got.get(2) == 0 and got.get(0) == 0
    assert 1 not in got


def test_simhash_identical_docs_same_signature():
    ds = _docs(["alpha beta gamma", "alpha beta gamma", "omega psi chi"])
    out = simhash_signatures(ds, concurrency=1).to_pandas().sort_values("doc_id")
    sigs = out["simhash"].tolist()
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]


def test_exact_jaccard_pairs_matches_bruteforce():
    from wikidata_qrank_ray.functions.hashing import shingles
    from wikidata_qrank_ray.stages.dedup import exact_jaccard_pairs

    texts = [
        "a b c d e f g",
        "a b c d e f zz",      # high overlap with 0
        "p q r s t u v",
        "a b c x y z w",       # partial overlap with 0/1
        "short",               # < k tokens -> whole-text shingle
        "short",               # identical short doc
        "",                    # empty: never pairs
    ]
    ds = _docs(texts)
    got = (
        exact_jaccard_pairs(ds, shingle_k=3, threshold=0.2)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # brute force over all pairs
    sets = [set(shingles(t.split(), 3)) for t in texts]
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= 0.2:
                want.append((i, j, jac))
    want_df = pd.DataFrame(want, columns=["a", "b", "jaccard"])
    assert got[["a", "b"]].to_numpy().tolist() == want_df[["a", "b"]].to_numpy().tolist()
    assert np.allclose(got["jaccard"], want_df["jaccard"], rtol=0, atol=0)
    # the identical short docs pair at jaccard 1.0
    assert ((got["a"] == 4) & (got["b"] == 5) & (got["jaccard"] == 1.0)).any()


def test_tf_cosine_pairs_matches_bruteforce():
    """Weighted-cosine join == brute force over Counter vectors, including
    the multiplicity case Jaccard is blind to (doc 1 repeats doc 0's text
    3x: identical shingle SET, different count vector -- still cos 1.0 for
    the repeated k-grams here since counts are proportional only when the
    whole vector scales; the planted proportional pair checks that)."""
    from collections import Counter
    from math import sqrt

    from wikidata_qrank_ray.functions.hashing import shingles
    from wikidata_qrank_ray.stages.dedup import tf_cosine_pairs

    texts = [
        "a b c d e f g",
        "a b c d e f g a b c d e f g",   # doubled: proportional counts? (no: cross k-grams)
        "a b c a b c a b c",             # periodic
        "a b c a b c",                   # proportional to 2 on shared support? close
        "p q r s t",
        "short",
        "short",                          # identical short docs: cos 1.0
        "",
    ]
    ds = _docs(texts)
    got = (
        tf_cosine_pairs(ds, shingle_k=3, threshold_num=4, threshold_den=5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    vecs = [Counter(shingles(t.split(), 3)) for t in texts]
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            dot = sum(c * vecs[j][s] for s, c in vecs[i].items())
            if dot == 0:
                continue
            na = sum(c * c for c in vecs[i].values())
            nb = sum(c * c for c in vecs[j].values())
            if dot * dot * 25 >= 16 * na * nb:
                want.append((i, j, dot, na, nb))
    want_df = pd.DataFrame(want, columns=["a", "b", "dot", "nsq_a", "nsq_b"])
    assert got.to_numpy().tolist() == want_df.to_numpy().tolist()
    # identical short docs pair at exactly cos 1.0
    row = got[(got["a"] == 5) & (got["b"] == 6)]
    assert len(row) == 1
    r = row.iloc[0]
    assert r["dot"] == sqrt(r["nsq_a"] * r["nsq_b"])


def test_minhash_planted_dups_larger_corpus():
    """Planted near-dups in a 2000-doc corpus: every planted pair is found
    and clustered to its base; unrelated docs never join a cluster."""
    rng = np.random.RandomState(3)
    vocab = np.array([f"t{i}" for i in range(500)], dtype=object)
    texts, planted = [], {}
    for i in range(2000):
        toks = vocab[rng.randint(0, len(vocab), size=30)]
        texts.append(" ".join(toks))
    for base in (17, 400, 1234):
        dup = base + 500  # overwrite a later doc with a near-copy
        toks = texts[base].split()
        toks[-1] = "zz"
        texts[dup] = " ".join(toks)
        planted[dup] = base
    ds = _docs(texts)
    out = minhash_dedup(ds, threshold=0.8, concurrency=2)
    got = dict(zip(out["doc_id"], out["dup_of"]))
    for dup, base in planted.items():
        assert got.get(dup) == base, (dup, base, got.get(dup))
    # no false clusters: only planted pairs + their bases appear
    assert set(got) <= set(planted) | set(planted.values())


def test_minhash_cc_tiers_identical():
    """Driver union-find tier == distributed star-contraction tier on a
    corpus with multi-doc clusters (chained near-dups)."""
    rng = np.random.default_rng(3)
    texts = []
    # 5 clusters of 4 chained variants + 10 unrelated docs
    for c in range(5):
        base = [f"c{c}w{i}" for i in range(60)]
        for v in range(4):
            t = list(base)
            t[v] = f"var{v}"  # each variant differs in one token
            texts.append(" ".join(t))
    for u in range(10):
        texts.append(" ".join(f"u{u}x{i}" for i in range(60)))
    ds = _docs(texts)
    drv = minhash_dedup(ds, threshold=0.7, concurrency=1, cc="driver")
    dist = minhash_dedup(ds, threshold=0.7, concurrency=1, cc="distributed")
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dist.reset_index(drop=True)
    )
    # sanity: the 5 planted clusters actually collapsed
    assert drv["dup_of"].nunique() == 5
    assert len(drv) == 20


def test_popcount64_matches_python():
    from wikidata_qrank_ray.functions.hashing import popcount64

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 2**63, 1000, dtype=np.int64).view(np.uint64)
    xs[0] = np.uint64(0)
    xs[1] = np.uint64(0xFFFFFFFFFFFFFFFF)
    got = popcount64(xs)
    want = [bin(int(x)).count("1") for x in xs]
    assert got.tolist() == want


def test_simhash_near_dup_pairs_matches_bruteforce():
    """Banded (pigeonhole-lossless) pipeline == brute-force all-pairs
    hamming over the same signatures, on a corpus with planted near-dups."""
    from wikidata_qrank_ray.functions.hashing import popcount64
    from wikidata_qrank_ray.stages.dedup import simhash_near_dup_pairs

    texts = []
    base = [f"tok{i}" for i in range(80)]
    texts.append(" ".join(base))
    v = list(base); v[3] = "CHANGED"          # near-dup of doc 0
    texts.append(" ".join(v))
    texts.append(" ".join(base))              # exact dup of doc 0 (hamming 0)
    texts += [" ".join(f"z{j}w{i}" for i in range(80)) for j in range(5)]
    ds = _docs(texts)
    got = (
        simhash_near_dup_pairs(ds, max_hamming=6, concurrency=1)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    sigs = (
        __import__("wikidata_qrank_ray.stages.dedup", fromlist=["simhash_signatures"])
        .simhash_signatures(ds, concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    sv = sigs["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
    rows = []
    for i in range(len(sv)):
        for j in range(i + 1, len(sv)):
            h = int(popcount64(np.array([sv[i] ^ sv[j]], dtype=np.uint64))[0])
            if h <= 6:
                rows.append((i, j, h))
    want = pd.DataFrame(rows, columns=["a", "b", "hamming"]).astype(np.int64)
    pd.testing.assert_frame_equal(got.astype(np.int64), want)
    # the planted exact dup is at hamming 0
    assert ((got["a"] == 0) & (got["b"] == 2) & (got["hamming"] == 0)).any()


def test_exact_jaccard_df_cutoff_caps_hot_shingles():
    """A shingle present in EVERY doc (stopword prefix) is dropped by the
    df cap; pairs are exact Jaccard over the reduced shingle space (sizes
    recomputed after the drop)."""
    from wikidata_qrank_ray.functions.hashing import shingles as mk_shingles
    from wikidata_qrank_ray.stages.dedup import exact_jaccard_pairs, hot_shingles

    prefix = "the of and"  # one ubiquitous shingle across all docs
    texts = []
    base = [f"w{i}" for i in range(20)]
    texts.append(prefix + " " + " ".join(base))
    v = list(base); v[5] = "CHANGED"
    texts.append(prefix + " " + " ".join(v))
    texts += [prefix + " " + " ".join(f"u{j}x{i}" for i in range(20)) for j in range(4)]
    ds = _docs(texts)

    hot = hot_shingles(ds, shingle_k=3, df_cutoff=3)
    assert "the of and" in set(hot)

    got = (
        exact_jaccard_pairs(ds, shingle_k=3, threshold=0.3, df_cutoff=3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # brute force over the reduced space
    hot_set = set(hot)
    sets = [
        {s for s in mk_shingles(t.split(), 3) if s not in hot_set} for t in texts
    ]
    rows = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            jac = inter / len(sets[i] | sets[j])
            if jac >= 0.3:
                rows.append((i, j, jac))
    want = pd.DataFrame(rows, columns=["a", "b", "jaccard"])
    pd.testing.assert_frame_equal(
        got.astype({"a": np.int64, "b": np.int64}), want.astype({"a": np.int64, "b": np.int64})
    )
    assert ((got["a"] == 0) & (got["b"] == 1)).any()  # planted pair survives


def test_exact_jaccard_df_cutoff_full_sizes():
    """df_cutoff_sizes='full' (the single-shingle-pass policy): hot
    shingles leave the intersections but denominators keep the FULL-space
    sizes -- a conservative lower bound, brute-forced here; and with a
    cutoff no shingle crosses, BOTH policies equal the uncapped result
    (tier equality)."""
    from wikidata_qrank_ray.functions.hashing import shingles as mk_shingles
    from wikidata_qrank_ray.stages.dedup import exact_jaccard_pairs, hot_shingles

    prefix = "the of and"
    base = [f"w{i}" for i in range(20)]
    v = list(base); v[5] = "CHANGED"
    texts = [prefix + " " + " ".join(base), prefix + " " + " ".join(v)]
    texts += [prefix + " " + " ".join(f"u{j}x{i}" for i in range(20)) for j in range(4)]
    ds = _docs(texts)

    hot_set = set(hot_shingles(ds, shingle_k=3, df_cutoff=3))
    got = (exact_jaccard_pairs(ds, shingle_k=3, threshold=0.3, df_cutoff=3,
                               df_cutoff_sizes="full")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    full_sets = [set(mk_shingles(t.split(), 3)) for t in texts]
    red_sets = [{s for s in fs if s not in hot_set} for fs in full_sets]
    rows = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(red_sets[i] & red_sets[j])
            if inter == 0:
                continue
            jac = inter / (len(full_sets[i]) + len(full_sets[j]) - inter)
            if jac >= 0.3:
                rows.append((i, j, jac))
    want = pd.DataFrame(rows, columns=["a", "b", "jaccard"])
    pd.testing.assert_frame_equal(
        got.astype({"a": np.int64, "b": np.int64}),
        want.astype({"a": np.int64, "b": np.int64}))

    # tier equality at a cutoff nothing crosses: full == reduced == uncapped
    uncapped = (exact_jaccard_pairs(ds, shingle_k=3, threshold=0.3)
                .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    for sizes in ("reduced", "full"):
        capped = (exact_jaccard_pairs(ds, shingle_k=3, threshold=0.3,
                                      df_cutoff=10**6, df_cutoff_sizes=sizes)
                  .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(capped, uncapped)


def test_verify_tiers_identical():
    """Broadcast verify tier == bucket-join verify tier on the same
    candidate set."""
    from wikidata_qrank_ray.stages.dedup import (
        MinHashSignatures, lsh_candidate_pairs_ds, minhash_band_rows,
        verified_pairs_ds)
    from wikidata_qrank_ray.context import pool_size

    texts = []
    base = [f"w{i}" for i in range(60)]
    for v in range(4):
        t = list(base); t[v] = f"var{v}"
        texts.append(" ".join(t))
    texts += [" ".join(f"u{u}x{i}" for i in range(60)) for u in range(6)]
    ds = _docs(texts)
    sigs = ds.map_batches(
        MinHashSignatures, fn_constructor_kwargs={"num_perm": 64, "shingle_k": 3},
        batch_format="pyarrow", concurrency=pool_size(1))
    cand = lsh_candidate_pairs_ds(minhash_band_rows(sigs, 16, 4)).materialize()
    n = cand.count()
    assert n > 0
    def run(limit):
        return (
            verified_pairs_ds(ds, cand, n, 3, 0.7, broadcast_max_bytes=limit)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(run(128 << 20), run(0))


def test_incremental_minhash_index(tmp_path):
    """Build index on corpus A; increments find near-dups against A and
    within the increment; a second increment sees docs appended by the
    first; non-dups stay absent."""
    from wikidata_qrank_ray.stages.dedup import (
        incremental_minhash_dedup, write_minhash_index)

    def docs_with_ids(pairs):
        import pyarrow as pa
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([i for i, _ in pairs], type=pa.int64()),
            "text": [t for _, t in pairs]}))

    base = [f"w{i}" for i in range(60)]
    a_doc = " ".join(base)
    idx = str(tmp_path / "minhash_index")
    corpus_a = [(0, a_doc)] + [
        (i, " ".join(f"a{i}x{j}" for j in range(60))) for i in range(1, 6)
    ]
    write_minhash_index(docs_with_ids(corpus_a), idx)

    # increment B: near-dup of A doc 0, an internal B near-dup pair, uniques
    v = list(base); v[3] = "CHANGED"
    b_near_a = " ".join(v)
    b_pair_1 = " ".join(f"b{j}" for j in range(60))
    w = [f"b{j}" for j in range(60)]; w[7] = "EDIT"
    b_pair_2 = " ".join(w)
    corpus_b = [(100, b_near_a), (101, b_pair_1), (102, b_pair_2),
                (103, " ".join(f"u{j}" for j in range(60)))]
    out = incremental_minhash_dedup(docs_with_ids(corpus_b), idx, threshold=0.7)
    got = dict(zip(out["doc_id"], out["dup_of"]))
    assert got.get(100) == 0          # links to the INDEXED doc
    assert got.get(102) == 101        # internal increment pair
    assert 103 not in got             # unique stays out
    assert 0 not in got and 1 not in got  # old docs never re-emitted

    # increment C: near-dup of a doc that arrived in increment B
    u = [f"b{j}" for j in range(60)]; u[11] = "OTHER"
    out2 = incremental_minhash_dedup(
        docs_with_ids([(200, " ".join(u)), (201, " ".join(f"z{j}" for j in range(60)))]),
        idx, threshold=0.7)
    got2 = dict(zip(out2["doc_id"], out2["dup_of"]))
    assert got2.get(200) == 101       # appended signatures are visible
    assert 201 not in got2


def test_incremental_minhash_rejects_foreign_hash_index(tmp_path):
    """An index built with a different (or unversioned) signature hash is
    refused: mixed-hash signatures never collide, so increments would
    silently miss every cross-increment duplicate."""
    import json
    import os

    import pytest

    from wikidata_qrank_ray.stages.dedup import (
        incremental_minhash_dedup, write_minhash_index)

    idx = str(tmp_path / "idx")
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": [" ".join(f"w{i}" for i in range(20))]})
    )
    write_minhash_index(docs, idx)
    man_path = os.path.join(idx, "manifest.json")
    man = json.load(open(man_path))
    assert man["hash_fn"]  # written by write_minhash_index
    del man["hash_fn"]     # simulate a pre-versioning index
    json.dump(man, open(man_path, "w"))
    with pytest.raises(ValueError, match="signature hash"):
        incremental_minhash_dedup(docs, idx)


def test_repeated_passages_matches_bruteforce():
    from wikidata_qrank_ray.functions.hashing import shingles as mk_shingles
    from wikidata_qrank_ray.stages.dedup import repeated_passages

    rng = np.random.default_rng(17)
    shared = [f"boiler{i}" for i in range(12)]  # cross-doc repeated passage
    texts = []
    for d in range(20):
        own = [f"d{d}w{i}" for i in range(rng.integers(5, 25))]
        toks = own + (shared if d % 3 == 0 else [])
        texts.append(" ".join(toks))
    texts.append("")  # zero-window doc
    ds = _docs(texts)
    got = (
        repeated_passages(ds, window=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(np.int64)
    )
    wins = [set(mk_shingles(t.split(), 10)) for t in texts]
    from collections import Counter
    df_count = Counter(w for ws in wins for w in ws)
    want = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "n_windows": [len(ws) for ws in wins],
            "n_repeated": [sum(1 for w in ws if df_count[w] > 1) for ws in wins],
        }
    ).astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    assert (got.loc[got["doc_id"] % 3 == 0, "n_repeated"] > 0).all()
    assert got.loc[got["doc_id"] == len(texts) - 1, "n_windows"].item() == 0


def test_shingles_whitespace_padding_parity():
    """Padded / whitespace-only / empty docs: the vectorized Arrow shingle
    and signature paths must match the \\S+ contract exactly (the Arrow
    split emits phantom "" tokens around whitespace)."""
    from wikidata_qrank_ray.functions.hashing import shingles as mk_shingles
    from wikidata_qrank_ray.stages.dedup import shingle_rows

    texts = ["a b c  ", "  x y", " ", "", "a ", "  lone  ", "p q r s"]
    ds = _docs(texts)
    got = shingle_rows(ds, shingle_k=3).to_pandas()
    for i, t in enumerate(texts):
        want = sorted(set(mk_shingles(t.split(), 3)))
        have = sorted(got.loc[got["doc_id"] == i, "s"])
        assert have == want, (i, t, have, want)


def test_incremental_verify_tiers_identical(tmp_path):
    """Broadcast signature-verify tier == bucketed-join tier."""
    from wikidata_qrank_ray.stages.dedup import (
        incremental_minhash_dedup, write_minhash_index)

    base = [f"w{i}" for i in range(60)]
    docs_a = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": [" ".join(base), " ".join(f"q{i}" for i in range(60))]}))
    v = list(base); v[5] = "EDIT"
    docs_b = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([50], type=pa.int64()), "text": [" ".join(v)]}))
    idx1, idx2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    write_minhash_index(docs_a, idx1)
    write_minhash_index(docs_a, idx2)
    bc = incremental_minhash_dedup(docs_b, idx1, threshold=0.7)
    jn = incremental_minhash_dedup(docs_b, idx2, threshold=0.7,
                                   broadcast_max_bytes=0)
    pd.testing.assert_frame_equal(bc, jn)
    assert dict(zip(bc["doc_id"], bc["dup_of"])) == {50: 0}


def test_minhash_cc_auto_tier_matches_driver():
    import ray
    import ray.data

    from wikidata_qrank_ray.stages.dedup import minhash_dedup

    texts = []
    for i in range(40):
        base = f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(12))
        texts.append(base)
        if i % 4 == 0:
            texts.append(base + " tail")  # near-dup partner
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )
    a = minhash_dedup(docs, cc="driver").reset_index(drop=True)
    b = minhash_dedup(docs, cc="auto").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_survivor_selection_policy():
    """Highest score survives per cluster (tie -> lowest id); singletons
    keep themselves; every doc maps to exactly one survivor."""
    import pyarrow as pa
    import ray.data

    from wikidata_qrank_ray.stages.dedup import survivor_selection

    quality = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 4, 5, 6], "n_tokens": [5, 9, 9, 2, 7, 7]})
    )
    # cluster A = {1,2,3} (2 and 3 tie at 9 -> 2 wins), cluster B = {5,6}
    # (tie -> 5), doc 4 is a singleton
    members = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 5, 6], "cluster_rep": [1, 1, 1, 5, 5]})
    )
    out = (
        survivor_selection(quality, members)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3, 4, 5, 6]
    assert list(out["survivor"]) == [2, 2, 2, 4, 5, 5]
    assert list(out["kept"]) == [False, True, False, True, True, False]


def _lev_ref(a: str, b: str) -> int:
    """Textbook scalar Levenshtein (the spec the vectorized DP must match)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_levenshtein_vec_matches_scalar():
    import itertools
    import random

    import numpy as np

    from wikidata_qrank_ray.stages.dedup import _levenshtein_pairs_vec

    rng = random.Random(7)
    words = ["", "a", "ab", "abc", "kitten", "sitting", "flaw", "lawn",
             "chapter 1", "chapter 2", "über", "uber", "日本語", "日本"]
    pool = words + ["".join(rng.choice("abc x") for _ in range(rng.randint(1, 12)))
                    for _ in range(30)]
    pairs = list(itertools.product(pool, repeat=2))
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = _levenshtein_pairs_vec(a, b)
    want = np.array([_lev_ref(x, y) for x, y in pairs])
    assert (got == want).all()


def test_edit_near_dups_planted():
    """Planted typo pairs across length-band boundaries come back with
    exact distances; far keys and cross-band-unreachable keys don't."""
    import pyarrow as pa
    import ray.data

    from wikidata_qrank_ray.stages.dedup import edit_near_dups

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "the quick brown fox jumps",      # key len 19
            "the quick brown fx jumps",       # deletion -> dist 1
            "the quick brown cat naps",       # dist > 3 from 1/2
            "zz",                             # short key, its own band
            "zzq",                            # dist 1 from doc 4, adjacent band
            "completely different words here",
        ],
    }))
    # token-less docs never participate (empty keys are out by contract)
    import pandas as pd
    extra = ray.data.from_arrow(pa.table({
        "doc_id": [7, 8], "text": ["", "   \t "],
    }))
    docs = docs.union(extra)
    out = (
        edit_near_dups(docs, key_tokens=4, max_dist=3, num_partitions=8)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    got = {(r.a, r.b): r.dist for r in out.itertuples()}
    assert got[(1, 2)] == 1
    assert got[(4, 5)] == 1
    assert got[(1, 3)] == 3  # fox -> cat: exactly 3 substitutions
    assert not any(6 in p for p in got)  # far key pairs with nothing
    assert not any(7 in p or 8 in p for p in got)  # token-less excluded
    assert all(a < b for a, b in got)


def test_edit_near_dups_empty_input():
    import pyarrow as pa
    import ray.data

    from wikidata_qrank_ray.stages.dedup import edit_near_dups

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    )
    out = edit_near_dups(docs).to_pandas()
    assert len(out) == 0


def test_overlap_join_matches_bruteforce():
    """Prefix-filtered overlap join == brute-force intersection counts --
    the no-false-negative guarantee of the filter is the property under
    test (a wrong prefix length silently drops true pairs)."""
    from wikidata_qrank_ray.functions.hashing import shingles
    from wikidata_qrank_ray.stages.dedup import overlap_join

    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab -> dense shared 3-grams
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(4, 20)))
        for _ in range(40)
    ]
    texts += ["a b", "a b", "", "w0 w1 w2 w3 w4", "w0 w1 w2 w3 zz"]
    ds = _docs(texts)
    got = (
        overlap_join(ds, shingle_k=3, min_overlap=2)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # tier equality: the prefix-filtered path returns the identical pairs
    got_prefix = (
        overlap_join(ds, shingle_k=3, min_overlap=2, method="prefix")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(np.int64), got_prefix[got.columns].astype(np.int64)
    )
    sets = [set(shingles(t.split(), 3)) for t in texts]
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            ov = len(sets[i] & sets[j])
            if ov >= 2:
                want.append([i, j, ov])
    assert got.to_numpy().tolist() == want
    assert len(want) >= 1  # the planted w0..w4 / w0..zz pair at least


def test_tf_cosine_df_cutoff_exact_on_reduced_space():
    """df_cutoff drops the ubiquitous shingle everywhere and cosine stays
    exact over the reduced term space (norms recomputed after the drop)."""
    from collections import Counter

    from wikidata_qrank_ray.functions.hashing import shingles
    from wikidata_qrank_ray.stages.dedup import tf_cosine_pairs

    common = "the of and"  # one shingle shared by every doc
    texts = [common + " " + " ".join(f"w{i}{j}" for j in range(6))
             for i in range(8)]
    texts.append(common + " w00 w01 w02 w03 w04 zz")  # near doc 0
    ds = _docs(texts)
    got = (
        tf_cosine_pairs(ds, shingle_k=3, threshold_num=1, threshold_den=2,
                        df_cutoff=5)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    # brute force on the REDUCED space: shingles with df > 5 removed
    vecs = [Counter(shingles(t.split(), 3)) for t in texts]
    df = Counter(s for v in vecs for s in v)
    hot = {s for s, n in df.items() if n > 5}
    vecs = [Counter({s: c for s, c in v.items() if s not in hot}) for v in vecs]
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            dot = sum(c * vecs[j][s] for s, c in vecs[i].items())
            if dot == 0:
                continue
            na = sum(c * c for c in vecs[i].values())
            nb = sum(c * c for c in vecs[j].values())
            if dot * dot * 4 >= 1 * na * nb:
                want.append([i, j, dot, na, nb])
    assert got.to_numpy().tolist() == want
    assert len(want) >= 1


def test_title_resolution_assignment_tiers_identical():
    """The size-gated broadcast assignment (sorted-array searchsorted
    lookup) and the bucketed left-join fallback in q_title_resolution
    produce the identical whole-corpus (doc_id, canon_id) assignment."""
    import wikidata_qrank_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    saved = Q.TITLE_RES_BROADCAST_MAX_MEMBERS
    try:
        # -1 forces the join tier even for an EMPTY membership set
        # (count() <= 0 would still pick the broadcast tier)
        Q.TITLE_RES_BROADCAST_MAX_MEMBERS = -1
        via_join = (
            Q.q_title_resolution(sf)
            .sort_values("doc_id").reset_index(drop=True)
        )
        Q.TITLE_RES_BROADCAST_MAX_MEMBERS = saved  # broadcast tier
        via_bcast = (
            Q.q_title_resolution(sf)
            .sort_values("doc_id").reset_index(drop=True)
        )
    finally:
        Q.TITLE_RES_BROADCAST_MAX_MEMBERS = saved
    import pandas as pd
    pd.testing.assert_frame_equal(via_join, via_bcast)
    # some docs must actually be remapped for the test to mean anything
    assert (via_bcast["doc_id"] != via_bcast["canon_id"]).any()


def test_edit_near_dups_key_slice_invariant(monkeypatch):
    """The generator slicing of the key/replication map is output-invariant:
    forcing 2-row slices (many yielded blocks per input block) returns the
    identical pair set as the default 65536-row cap."""
    import pyarrow as pa
    import ray.data

    import wikidata_qrank_ray.stages.dedup as D

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "text": [
            "the quick brown fox jumps",
            "the quick brown fx jumps",
            "the quick brown cat naps",
            "zz", "zzq",
            "completely different words here",
            "",
        ],
    }))

    def pairs():
        return (
            D.edit_near_dups(docs, key_tokens=4, max_dist=3, num_partitions=8)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )

    base = pairs()
    monkeypatch.setattr(D, "_KEYS_SLICE_ROWS", 2)
    sliced = pairs()
    import pandas as pd
    pd.testing.assert_frame_equal(base, sliced)
    assert len(base) > 0
