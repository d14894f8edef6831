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


def test_lsh_blocked_near_dups_recall_vs_exact():
    """The approximate LSH-blocked pair finder is a strict subset of the
    exact block-pair result (precision 1.0) with usable recall at 4 bits."""
    from wikidata_qrank_ray.sources.tables import read_table
    from wikidata_qrank_ray.stages.similarity import all_pairs_cosine, lsh_blocked_near_dups

    sf = "/root/testdata/sf0.001"
    emb = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    exact = all_pairs_cosine(emb, threshold=0.4)
    approx = lsh_blocked_near_dups(emb, threshold=0.4, bits=4).to_pandas()
    eset = set(map(tuple, exact[["a", "b"]].to_numpy()))
    aset = set(map(tuple, approx[["a", "b"]].to_numpy()))
    assert aset <= eset  # no false positives: in-bucket verify is exact
    recall = len(aset & eset) / max(1, len(eset))
    assert recall >= 0.5, recall  # multi-table OR recovers recall
