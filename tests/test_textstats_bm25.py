"""BM25 top-k retrieval (stages.textstats.bm25_topk) — round-4j.

Three pins:
- the idf ln replay is bitwise CPython == DuckDB over a (N, df) sweep
  (the HLL float-tail precedent extended to the BM25-reachable operands);
- the integer-grid scores agree with a straightforward float BM25 twin's
  RANKING on a planted corpus (the grid quantizes values, never order,
  when float gaps exceed the milli grid);
- null/empty-text docs and term-free corpora are handled (score 0, never
  a crash), and the result is reshard-invariant.
"""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from wikidata_qrank_ray.functions.tokenize import py_tokens
from wikidata_qrank_ray.stages.textstats import bm25_topk

TERMS = ("merge", "sort", "window", "stream")


def test_idf_ln_replay_bitwise():
    import duckdb

    con = duckdb.connect()
    cases = [(n, df) for n in (1, 2, 3, 7, 50, 999, 5000, 123456)
             for df in (0, 1, 2, 3, n // 3, n // 2, n - 1, n) if 0 <= df <= n]
    exprs = ", ".join(
        f"CAST(floor(1000.0*ln(1.0 + (2.0*CAST({n} - {df} AS DOUBLE) + 1.0)"
        f"/(2.0*CAST({df} AS DOUBLE) + 1.0)) + 0.5) AS BIGINT)"
        for n, df in cases
    )
    got = con.sql(f"SELECT {exprs}").fetchone()
    for (n, df), sq in zip(cases, got):
        py = int(math.floor(
            1000.0 * math.log(1.0 + (2.0 * (n - df) + 1.0) / (2.0 * df + 1.0))
            + 0.5))
        assert py == sq, (n, df, py, sq)


def _float_bm25(texts, terms, k1=1.2, b=0.75):
    toks = [t.split() for t in texts]
    dls = [len(t) for t in toks]
    n = len(texts)
    avgdl = sum(dls) / n
    scores = np.zeros(n)
    for term in terms:
        tfs = np.array([t.count(term) for t in toks], dtype=float)
        df = int((tfs > 0).sum())
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        denom = tfs + k1 * (1.0 - b + b * np.array(dls) / avgdl)
        scores += idf * tfs * (k1 + 1.0) / denom
    return scores


def _int_bm25_twin(texts, terms, k):
    """Sequential pure-Python replay of the exact integer contract
    (py_tokens = the shared RE2 \\S+ class, NOT str.split(), so the twin
    cannot desync from bm25_topk on \\x0b/unicode-space corpora)."""
    toks = [py_tokens(t) for t in texts]
    dls = [len(t) for t in toks]
    n, s = len(texts), sum(dls)
    a = (2 * s * 1_000_000 + n) // (2 * n)
    rows = []
    for i, t in enumerate(toks):
        score = 0
        for term in terms:
            df = sum(1 for tt in toks if term in tt)
            idf = int(math.floor(
                1000.0 * math.log(
                    1.0 + (2.0 * (n - df) + 1.0) / (2.0 * df + 1.0)) + 0.5))
            tf = t.count(term)
            score += (idf * 22 * a * tf) // (10 * a * tf + 3 * a
                                             + 9_000_000 * dls[i])
        if score > 0:
            rows.append((i, score))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(rows[:k], columns=["doc_id", "score_milli"]).astype(
        {"doc_id": np.int64, "score_milli": np.int64})


def test_matches_sequential_integer_twin_and_float_scale():
    rng = np.random.default_rng(11)
    vocab = list(TERMS) + ["filler", "pad", "noise", "x", "y"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 40))))
        for _ in range(120)
    ]
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": texts})
    )
    got = bm25_topk(docs, TERMS, k=10)
    pd.testing.assert_frame_equal(got, _int_bm25_twin(texts, TERMS, 10))
    # the grid quantizes values, not semantics: milli scores sit within a
    # couple of grid steps x terms of the true float BM25
    fs = _float_bm25(texts, TERMS)
    approx = got["score_milli"].to_numpy() / 1000.0
    assert np.all(np.abs(approx - fs[got["doc_id"].to_numpy()]) < 0.02)


def test_null_and_empty_and_matchless():
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["merge sort", None, "", "filler only"],
    }))
    got = bm25_topk(docs, TERMS, k=5)
    assert got["doc_id"].tolist() == [0]
    assert (got["score_milli"] > 0).all()
    # a corpus with no matching term at all -> empty, typed
    none = bm25_topk(
        ray.data.from_pandas(pd.DataFrame(
            {"doc_id": np.array([9], dtype=np.int64), "text": ["filler"]})),
        TERMS, k=5)
    assert len(none) == 0
    assert list(none.columns) == ["doc_id", "score_milli"]


def test_all_empty_corpus_and_vt_token():
    # all-empty corpus: a == 0 (avgdl micro grid), dl == 0 everywhere --
    # the score's floor division would be 0 // 0; must return empty, never
    # warn/crash (the SQL twin's NULL-scored rows fail `> 0` identically)
    import warnings

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["", None, "   \t\n "],
    }))
    with warnings.catch_warnings():
        # scoped to RuntimeWarning (the 0//0 divide signature) so benign
        # Ray/pandas deprecation warnings can't fail this test spuriously
        warnings.simplefilter("error", RuntimeWarning)
        got = bm25_topk(docs, TERMS, k=5)
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "score_milli"]
    # \x0b is ASCII whitespace but NOT RE2 \s: "merge\x0bsort" is ONE
    # token under the \S+ contract, so it must NOT count as a 'merge' hit
    vt = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["merge\x0bsort merge", "merge"],
    }))
    got = bm25_topk(vt, ("merge",), k=5)
    # doc 0: dl=2 (merge\x0bsort, merge), tf=1; doc 1: dl=1, tf=1 ->
    # doc 1 scores strictly higher (shorter doc, same tf)
    assert got["doc_id"].tolist() == [1, 0]
    # an empty term tuple (e.g. a query stopword-filtered to nothing)
    # returns the typed empty head, never max([]) crashing
    none = bm25_topk(vt, (), k=5)
    assert len(none) == 0
    assert list(none.columns) == ["doc_id", "score_milli"]


def test_bm25_sql_escapes_quoted_terms():
    # the generic (terms, k) SQL builder must survive terms containing a
    # single quote -- DuckDB must parse it and count the literal token
    import duckdb

    from wikidata_qrank_ray.pipelines.queries import _bm25_sql

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM (VALUES "
            "(0, 'o''brien wrote this'), (1, 'no hit here')) "
            "AS t(doc_id, text)")
    out = con.sql(_bm25_sql(("o'brien",), 5)).df()
    assert out["doc_id"].tolist() == [0]


def test_reshard_invariant():
    rng = np.random.default_rng(5)
    vocab = list(TERMS) + ["a", "b", "c"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 25))))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})
    one = bm25_topk(ray.data.from_pandas(df), TERMS, k=15)
    perm = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    many = bm25_topk(
        ray.data.from_pandas(
            [perm.iloc[i::7].reset_index(drop=True) for i in range(7)]),
        TERMS, k=15)
    pd.testing.assert_frame_equal(one, many)
