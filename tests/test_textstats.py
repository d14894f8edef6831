import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.stages.textstats import (
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)


def _docs(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    )


def test_token_counts_edge_cases():
    ds = _docs(["a b c", "  leading  and   multi ", "", "one"])
    out = token_counts(ds).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [3, 3, 0, 1]


def test_quality_scores():
    ds = _docs(["the fast a cat", "no stop words"])
    out = quality_scores(ds).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [4, 3]
    assert out["stopword_cnt"].tolist() == [2, 0]
    assert out["n_chars"].tolist() == [14, 13]


def test_lang_id_heuristic():
    ds = _docs(
        [
            "the thing and the other thing going",
            "der hund und die katze schlafen",
            "这是一个中文句子",
        ]
    )
    out = lang_id(ds, concurrency=1).to_pandas().sort_values("doc_id")
    assert out["pred_lang"].tolist() == ["en", "de", "zh"]


def test_fingerprints_deterministic():
    ds = _docs(["abc", "abc", "abd"])
    out = fingerprints(ds).to_pandas().sort_values("doc_id")
    fps = out["fingerprint"].tolist()
    assert fps[0] == fps[1] != fps[2]
