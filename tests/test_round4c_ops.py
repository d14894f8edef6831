"""Planted-case and brute-force twins for the round-4c batch:
knn_label_noise, shingle_containment, shard_assignment, dedup_savings,
pair_lifespan. The sf0.01 oracle gate covers the exact compare; these pin
the SEMANTICS on inputs where the interesting cases are guaranteed to
exist (the base corpus has no exact-duplicate texts, so dedup_savings is
vacuous there)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from wikidata_qrank_ray.pipelines.queries import (
    q_dedup_savings,
    q_shard_assignment,
    q_shingle_containment,
)
from wikidata_qrank_ray.stages.similarity import knn_label_audit
import ray.data


def _write_docs(tmp_path, texts):
    tmp_path.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["src0"] * len(texts),
        "n_chars": [len(t or "") for t in texts],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dedup_savings_planted(tmp_path):
    texts = ["aa bb cc", "unique one", "aa bb cc", "aa bb cc",
             "xx yy", "xx yy", None]
    d = _write_docs(tmp_path / "ds", texts)
    got = (q_dedup_savings(d).to_pandas()
           .sort_values("rep_doc").reset_index(drop=True))
    want = pd.DataFrame({
        "rep_doc": np.array([0, 4], dtype=np.int64),
        "n_copies": np.array([3, 2], dtype=np.int64),
        "saved_chars": np.array([2 * 8, 1 * 5], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(got, want)


def test_dedup_savings_zero_dup_schema(tmp_path):
    # duplicate-free corpus (the round-4 driver red cell): the result must
    # keep the typed (rep_doc, n_copies, saved_chars) int64 schema even at
    # zero rows -- a zero-block Dataset would lose it.
    d = _write_docs(tmp_path / "dz", ["alpha", "beta", "gamma", None])
    res = q_dedup_savings(d)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    assert len(got) == 0
    assert list(sorted(got.columns)) == ["n_copies", "rep_doc", "saved_chars"]
    assert all(got[c].dtype == np.int64
               for c in ("rep_doc", "n_copies", "saved_chars"))


def test_containment_planted(tmp_path):
    # doc 0 (4 tokens -> 2 distinct 3-shingles) fully inside doc 1; the
    # reverse direction must NOT appear (doc 1 has 6 shingles, only 2
    # shared). doc 2 shares nothing.
    texts = ["a b c d",
             "x a b c d y z w",
             "p q r s t"]
    d = _write_docs(tmp_path / "ct", texts)
    got = q_shingle_containment(d).to_pandas()
    rows = set(zip(got["inner_doc"], got["outer_doc"],
                   got["shared"], got["sz_inner"]))
    assert (0, 1, 2, 2) in rows
    assert not any(r[0] == 1 for r in rows)
    assert not any(2 in (r[0], r[1]) for r in rows)


def test_shard_assignment_brute(tmp_path):
    rng = np.random.RandomState(7)
    texts = [" ".join(["t"] * int(n)) if n else ""
             for n in rng.randint(0, 40, 120)]
    d = _write_docs(tmp_path / "sa", texts)
    got = (q_shard_assignment(d).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    nt = np.array([len(t.split()) for t in texts], dtype=np.int64)
    order = np.lexsort((np.arange(len(nt)), nt))
    start = np.zeros(len(nt), dtype=np.int64)
    start[order] = np.cumsum(nt[order]) - nt[order]
    assert (got["n_tokens"].to_numpy() == nt).all()
    assert (got["start_tok"].to_numpy() == start).all()
    assert (got["shard"].to_numpy() == start // 512).all()
    # packing invariant: shard boundaries are non-decreasing in the
    # curriculum order and every shard start offset is < capacity apart
    assert (np.diff(start[order]) >= 0).all()


def test_knn_label_audit_brute():
    rng = np.random.RandomState(11)
    n, dim = 60, 8
    vecs = rng.randn(n, dim).astype(np.float64)
    labels = rng.randint(0, 3, n).astype(np.int64)
    emb = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs.astype(np.float32)),
        "label": labels,
    }))
    got = (knn_label_audit(emb, k=3, num_blocks=4).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    # brute twin on the identical quant grid
    q = np.sign(vecs.astype(np.float32).astype(np.float64) * 1e6) * np.floor(
        np.abs(vecs.astype(np.float32).astype(np.float64) * 1e6) + 0.5)
    q = q.astype(np.int64)
    for i in range(n):
        d2 = ((q - q[i]) ** 2).sum(axis=1)
        cand = [(int(d2[j]), j) for j in range(n) if j != i]
        cand.sort()
        top = cand[:3]
        votes = {}
        for _, j in top:
            votes[labels[j]] = votes.get(labels[j], 0) + 1
        maj = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        n_same = votes.get(labels[i], 0)
        row = got.iloc[i]
        assert row["vec_id"] == i
        assert row["maj_label"] == maj, i
        assert row["n_same"] == n_same, i
        assert row["noisy"] == (1 if n_same == 0 else 0)


def test_dedup_eval_planted(tmp_path):
    from wikidata_qrank_ray.pipelines.queries import q_dedup_eval

    # 2 exact dups (always same signature -> candidate AND truth), one
    # unrelated doc, two token-less docs (the jaccard(empty,empty)=1
    # convention pair -- also identical all-max signatures)
    texts = ["w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5", "zz yy xx qq", "", "   "]
    d = _write_docs(tmp_path / "de", texts)
    got = q_dedup_eval(d)
    assert int(got["tp"][0]) == 2      # (0,1) and (3,4)
    assert int(got["fp"][0]) == 0
    assert int(got["fn"][0]) == 0


def test_stratified_kfold_balance(tmp_path):
    from wikidata_qrank_ray.pipelines.queries import q_stratified_kfold

    texts = ["t"] * 23
    d = _write_docs(tmp_path / "kf", texts)
    # overwrite with two strata
    df = pd.DataFrame({
        "doc_id": np.arange(23, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * 13 + ["de"] * 10,
        "source": ["s0"] * 23,
        "n_chars": [1] * 23,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "kf" / "documents.parquet"))
    got = q_stratified_kfold(d).to_pandas()
    assert len(got) == 23
    # every stratum balanced within 1, folds assigned in doc_id order
    for lang, n in (("en", 13), ("de", 10)):
        sub = got[got["lang"] == lang].sort_values("doc_id")
        counts = sub["fold"].value_counts()
        assert counts.max() - counts.min() <= 1
        assert (sub["fold"].to_numpy()
                == np.arange(n, dtype=np.int64) % 5).all()
