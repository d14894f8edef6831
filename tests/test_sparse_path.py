"""The dense presence-matrix co-occurrence path and the sparse fallback
(vocabularies beyond DENSE_MAX_ENTITIES) must agree exactly."""

import pandas as pd
import pyarrow as pa

from wikidata_qrank_ray.stages.triples import TripleExtractor


def _batch():
    return pa.table(
        {
            "conv_id": ["c0", "c0", "c1"],
            "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
            "text": ["spark merge sort", "merge sort", "spark spark sort"],
            "tool": ["calc", "", "exec"],
        }
    )


def _gaz():
    return pd.DataFrame(
        {"qid": ["Q1", "Q2", "Q10"], "surface": ["spark", "merge", "sort"], "prior": [9, 5, 2]}
    )


def _norm(df):
    return (
        df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)[
            ["subj", "pred", "obj", "w"]
        ]
    )


def test_sparse_equals_dense(monkeypatch):
    dense = TripleExtractor(_gaz())
    out_dense = _norm(dense(_batch()).to_pandas())

    monkeypatch.setattr(TripleExtractor, "DENSE_MAX_ENTITIES", 0)
    sparse = TripleExtractor(_gaz())
    out_sparse = _norm(sparse(_batch()).to_pandas())

    pd.testing.assert_frame_equal(out_dense, out_sparse)
    assert len(out_dense) > 0


def test_sparse_equals_dense_with_counts(monkeypatch):
    dense = TripleExtractor(_gaz(), emit_counts=True)
    out_dense = _norm(dense(_batch()).to_pandas())
    monkeypatch.setattr(TripleExtractor, "DENSE_MAX_ENTITIES", 0)
    sparse = TripleExtractor(_gaz(), emit_counts=True)
    out_sparse = _norm(sparse(_batch()).to_pandas())
    pd.testing.assert_frame_equal(out_dense, out_sparse)
