import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from wikidata_qrank_ray.stages.similarity import ann_brute_topk, ann_ivf_topk


def _emb_ds(n=200, dim=8, seed=4):
    rng = np.random.RandomState(seed)
    # clustered embeddings so the IVF quantizer has real structure
    centers = rng.normal(scale=4.0, size=(4, dim))
    m = (centers[rng.randint(0, 4, n)] + rng.normal(size=(n, dim))).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], type=pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(t), m


def test_ivf_finds_self_and_high_recall_on_clustered_data():
    ds, m = _emb_ds()
    q = m[0].astype(np.float64)
    ivf = ann_ivf_topk(ds, q, k=10, n_lists=4, n_probe=2)
    brute = ann_brute_topk(ds, q, k=10)
    assert ivf["vec_id"].iloc[0] == 0  # query's own vector always in its list
    recall = len(set(ivf["vec_id"]) & set(brute["vec_id"])) / 10
    assert recall >= 0.7  # clustered data: probing 2/4 lists keeps most of top-10
