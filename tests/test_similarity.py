import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.stages.similarity import ann_brute_topk, ann_lsh_topk


def _emb_ds(n=50, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([row.tolist() for row in m], type=pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(t), m


def test_brute_topk_matches_numpy_oracle():
    ds, m = _emb_ds()
    q = m[0].astype(np.float64)
    out = ann_brute_topk(ds, q, k=5)
    sims = (m.astype(np.float64) @ q) / (
        np.linalg.norm(m.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    expect = np.lexsort((np.arange(len(m)), -sims))[:5]
    assert out["vec_id"].tolist() == expect.tolist()
    assert out["pos"].tolist() == [1, 2, 3, 4, 5]
    assert out["vec_id"].iloc[0] == 0  # self is nearest


def test_lsh_topk_returns_query_bucket_subset():
    ds, m = _emb_ds()
    q = m[0].astype(np.float64)
    out = ann_lsh_topk(ds, q, k=5, bits=4)
    assert len(out) >= 1
    assert out["vec_id"].iloc[0] == 0  # query's own vector shares its bucket
    # approximate: results are a subset of the full candidate set
    assert set(out["vec_id"]) <= set(range(50))
