import numpy as np
import pandas as pd
import ray.data

from wikidata_qrank_ray.stages.similarity import pq_adc_topk, pq_train_encode

from test_similarity import _kmeans_numpy_twin


def _emb_ds(vecs, ids, nparts=4):
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    return ray.data.from_pandas(df).repartition(nparts)


def _pq_twin(vecs, ids, m, k, iters):
    d = vecs.shape[1]
    bounds = [(si * d // m, (si + 1) * d // m) for si in range(m)]
    cents, codes = [], {}
    for si, (lo, hi) in enumerate(bounds):
        cent, assign = _kmeans_numpy_twin(vecs[:, lo:hi], ids, k, iters)
        cents.append(cent)
        codes[f"code_{si}"] = assign
    out = pd.DataFrame({"vec_id": ids} | codes)
    return cents, out


def test_pq_codes_bitwise_match_twin_and_reshard():
    rng = np.random.RandomState(6)
    n, d = 400, 16
    vecs = rng.randn(n, d)
    ids = np.arange(n, dtype=np.int64)
    cbs, codes = pq_train_encode(_emb_ds(vecs, ids), m=4, k=8, iters=3)
    got = codes.to_pandas().sort_values("vec_id").reset_index(drop=True)
    tc, want = _pq_twin(vecs, ids, m=4, k=8, iters=3)
    want = want.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns].astype(np.int64), want.astype(np.int64)
    )
    for a, b in zip(cbs, tc):
        assert np.array_equal(a, b)
    # reshard invariance
    _, codes1 = pq_train_encode(_emb_ds(vecs, ids, nparts=1), m=4, k=8, iters=3)
    got1 = codes1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns].astype(np.int64), got1[want.columns].astype(np.int64)
    )


def test_pq_adc_recall_on_clustered_data():
    """On well-separated clusters, ADC top-10 recovers most of the exact
    top-10 (the compression is 16 floats -> 4 codes here)."""
    rng = np.random.RandomState(9)
    centers = rng.randn(8, 16) * 6
    vecs = np.concatenate(
        [c + rng.randn(60, 16) * 0.4 for c in centers], axis=0
    )
    ids = np.arange(len(vecs), dtype=np.int64)
    cbs, codes = pq_train_encode(_emb_ds(vecs, ids), m=4, k=16, iters=4)
    codes_df = codes.to_pandas()
    q = centers[3] + rng.randn(16) * 0.1
    got = set(pq_adc_topk(cbs, codes_df, q, topk=10)["vec_id"])
    # 4-byte codes collapse same-cluster members to near-identical
    # distances, so the right granularity to test is cluster recovery
    # (every ADC hit in the true cluster) + overlap with a coarser exact
    # neighborhood
    cluster3 = set(range(3 * 60, 4 * 60))
    assert got <= cluster3
    exact30 = set(
        ids[np.argsort(((vecs - q[None, :]) ** 2).sum(axis=1))[:30]]
    )
    assert len(got & exact30) >= 6
