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
