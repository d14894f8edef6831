import numpy as np
import pandas as pd
import ray.data

from wikidata_qrank_ray.stages.layout import morton_interleave16, zorder_rank


def test_morton_known_values():
    x = np.array([0, 1, 0, 0xFFFF, 3], dtype=np.int64)
    y = np.array([0, 0, 1, 0xFFFF, 5], dtype=np.int64)
    z = morton_interleave16(x, y)
    # x fills the even-from-top (higher) bit of each pair
    # interleave(3, 5): x bits 1,1 at positions 1,3; y bits 1,0,1 at
    # positions 0,2(=0),4 -> 0b11011 = 27
    assert z.tolist() == [0, 2, 1, 0xFFFFFFFF, 0b11011]


def test_morton_matches_bit_by_bit():
    rng = np.random.RandomState(5)
    x = rng.randint(0, 1 << 16, size=200).astype(np.int64)
    y = rng.randint(0, 1 << 16, size=200).astype(np.int64)
    z = morton_interleave16(x, y)
    want = np.zeros_like(z)
    for b in range(16):
        want |= ((x >> b) & 1) << (2 * b + 1)
        want |= ((y >> b) & 1) << (2 * b)
    assert (z == want).all()


def test_zorder_rank_is_exact_permutation():
    rng = np.random.RandomState(9)
    n = 5000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "x": rng.randint(0, 1 << 16, size=n),
            "y": rng.randint(0, 1 << 16, size=n),
        }
    )
    out = (
        zorder_rank(ray.data.from_pandas(df).repartition(7), "id", "x", "y",
                    num_partitions=8)
        .to_pandas()
        .sort_values("zrank")
        .reset_index(drop=True)
    )
    assert out["zrank"].tolist() == list(range(1, n + 1))
    # rank order IS (zval, id) order
    srt = out.sort_values(["zval", "id"]).reset_index(drop=True)
    assert (srt["zrank"].to_numpy() == np.arange(1, n + 1)).all()


def test_ranked_by_key_matches_row_number():
    """ranked_by_key == ROW_NUMBER() OVER (ORDER BY key, id) without a
    global sort, including heavy key ties."""
    import numpy as np
    import pandas as pd
    import ray.data

    from wikidata_qrank_ray.stages.layout import ranked_by_key

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"id": np.arange(1000, dtype=np.int64),
                       "k": rng.randint(0, 7, 1000).astype(np.int64)})
    out = (ranked_by_key(ray.data.from_pandas(df).repartition(8), "k", "id",
                         num_partitions=8)
           .to_pandas().sort_values("rnk").reset_index(drop=True))
    want = df.sort_values(["k", "id"], kind="mergesort").reset_index(drop=True)
    assert out["id"].tolist() == want["id"].tolist()
    assert out["rnk"].tolist() == list(range(1, 1001))
