"""Lenient-parse policy: malformed/null inputs are tolerated, never fatal
(the reference logs and continues on malformed namespace files,
wikisites_test.go:139-188 / bug 41-42 regressions)."""

import pyarrow as pa
import ray.data

from wikidata_qrank_ray.stages.mentions import GazetteerMatcher, _tokenize_arrow
from wikidata_qrank_ray.stages.normalize import normalize_stage
from wikidata_qrank_ray.stages.triples import TripleExtractor
import pandas as pd


def _null_batch():
    return pa.table(
        {
            "conv_id": ["c0", "c1", "c2"],
            "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
            "text": ["spark merge", None, "   "],
            "tool": ["", None, "calc"],
        }
    )


def _gaz():
    return pd.DataFrame({"qid": ["Q1", "Q2"], "surface": ["spark", "merge"], "prior": [2, 1]})


def test_tokenizer_tolerates_nulls_and_whitespace_only():
    flat, parent = _tokenize_arrow(_null_batch()["text"])
    assert flat.to_pylist() == ["spark", "merge"]
    assert parent.tolist() == [0, 0]


def test_normalize_stage_tolerates_nulls():
    ds = ray.data.from_arrow(_null_batch())
    out = normalize_stage(ds).to_pandas()
    assert out["norm_text"].tolist()[1] == ""  # null -> empty, not a crash


def test_matcher_tolerates_nulls():
    m = GazetteerMatcher(_gaz(), mode="partial_counts")
    out = m(_null_batch()).to_pandas()
    assert dict(zip(out["qid"], out["cnt"])) == {"Q1": 1, "Q2": 1}


def test_extractor_tolerates_null_tool():
    ex = TripleExtractor(_gaz(), emit_counts=True)
    out = ex(_null_batch()).to_pandas()
    assert len(out) > 0
    assert (out[out["pred"] == "co_occurs"]["w"] == 1).all()
