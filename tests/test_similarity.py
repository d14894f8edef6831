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


def _kmeans_numpy_twin(vecs, ids, k, iters, quant_scale=1e6):
    """Single-threaded reference with the same integer-quantized rules."""
    import numpy as np

    q = (np.sign(vecs) * np.floor(np.abs(vecs) * quant_scale + 0.5)).astype(np.int64)
    order = np.argsort(ids)
    seed = order[:k]
    cent = q[seed].astype(np.float64) / quant_scale
    for _ in range(iters):
        x = q.astype(np.float64) / quant_scale
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(cent)):
            m = assign == j
            if m.any():
                cent[j] = (q[m].sum(axis=0).astype(np.float64) / m.sum()) / quant_scale
    x = q.astype(np.float64) / quant_scale
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return cent, d2.argmin(axis=1)


def test_kmeans_train_bitwise_matches_twin_and_reshard():
    import numpy as np
    import pandas as pd
    import ray.data

    from wikidata_qrank_ray.stages.similarity import kmeans_train

    rng = np.random.RandomState(3)
    # three separated blobs + noise dims
    centers = np.array([[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]], dtype=np.float64)
    vecs = np.concatenate(
        [c + 0.3 * rng.standard_normal((40, 4)) for c in centers]
    )
    ids = rng.permutation(len(vecs)).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs.astype(np.float32))})

    ds = ray.data.from_pandas(df)
    cent, assign = kmeans_train(ds, k=3, iters=4)
    got = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)

    tc, ta = _kmeans_numpy_twin(
        np.stack(df["embedding"].to_numpy()).astype(np.float64),
        df["vec_id"].to_numpy(), 3, 4,
    )
    twin = pd.DataFrame({"vec_id": df["vec_id"], "cluster": ta}).sort_values(
        "vec_id"
    ).reset_index(drop=True)
    assert (np.asarray(cent).view(np.int64) == tc.view(np.int64)).all()  # bitwise
    assert got["cluster"].tolist() == twin["cluster"].tolist()

    # reshard invariance: different block structure, identical output
    ds2 = ray.data.from_pandas(
        [df.iloc[:17], df.iloc[17:60], df.iloc[60:]]
    )
    cent2, assign2 = kmeans_train(ds2, k=3, iters=4)
    got2 = assign2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert (np.asarray(cent2).view(np.int64) == np.asarray(cent).view(np.int64)).all()
    assert got2["cluster"].tolist() == got["cluster"].tolist()

    # planted blobs are recovered: each blob maps to one pure cluster
    blob = np.repeat([0, 1, 2], 40)
    m = pd.DataFrame({"blob": blob, "cluster": ta})
    purity = m.groupby("blob")["cluster"].nunique()
    assert (purity == 1).all()
