import numpy as np
import pandas as pd

from wikidata_qrank_ray.stages.streaming import KeyedStateRunner


def test_keyed_state_across_batches():
    runner = KeyedStateRunner(num_shards=2)
    try:
        b1 = pd.DataFrame({"u": [1, 2, 1], "v": [1.0, 2.0, 3.0], "ts": [1, 2, 3]})
        b2 = pd.DataFrame({"u": [2, 3], "v": [4.0, 5.0], "ts": [4, 5]})
        runner.feed(b1, "u", "v", "ts")
        runner.feed(b2, "u", "v", "ts")  # state survives across batches
        out = runner.result().set_index("key")
        assert out.loc[1, "n"] == 2 and out.loc[1, "total"] == 4.0
        assert out.loc[2, "n"] == 2 and out.loc[2, "total"] == 6.0
        assert out.loc[3, "n"] == 1 and out.loc[3, "total"] == 5.0
        assert out.loc[2, "last_ts"] == 4
    finally:
        runner.shutdown()


def test_keyed_state_matches_pandas_oracle():
    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "u": rng.randint(0, 20, 200),
            "v": rng.random_sample(200),
            "ts": np.arange(200),
        }
    )
    runner = KeyedStateRunner(num_shards=3)
    try:
        for i in range(0, 200, 50):
            runner.feed(df.iloc[i:i + 50], "u", "v", "ts")
        out = runner.result().set_index("key")
        want = df.groupby("u").agg(n=("v", "size"), total=("v", "sum"), last_ts=("ts", "max"))
        assert (out["n"] == want["n"]).all()
        assert np.allclose(out["total"], want["total"])
        assert (out["last_ts"] == want["last_ts"]).all()
    finally:
        runner.shutdown()
