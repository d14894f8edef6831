import numpy as np
import pandas as pd
import ray.data

from wikidata_qrank_ray.stages.intervals import interval_overlap_join


def test_interval_overlap_join_matches_bruteforce():
    rng = np.random.RandomState(21)
    n = 120
    df = pd.DataFrame(
        {
            "owner": rng.randint(0, 8, size=n).astype(np.int64),
            "iid": np.arange(n, dtype=np.int64),
            "st": rng.randint(0, 10_000, size=n).astype(np.int64),
        }
    )
    df["en"] = df["st"] + rng.randint(0, 3_000, size=n)
    out = (
        interval_overlap_join(
            ray.data.from_pandas(df).repartition(5),
            "owner", "iid", "st", "en",
            cell_us=1024, num_partitions=8,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = []
    for i in range(n):
        for j in range(n):
            a, b = df.iloc[i], df.iloc[j]
            if a["owner"] < b["owner"] and a["st"] <= b["en"] and b["st"] <= a["en"]:
                want.append(
                    (a["owner"], a["iid"], b["owner"], b["iid"],
                     min(a["en"], b["en"]) - max(a["st"], b["st"]))
                )
    want_df = (
        pd.DataFrame(want, columns=["owner_a", "id_a", "owner_b", "id_b", "ov_us"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want_df)
    pd.testing.assert_frame_equal(
        out[want_df.columns].astype(np.int64), want_df.astype(np.int64)
    )


def test_interval_overlap_join_datetime_input():
    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "owner": np.array([1, 2], dtype=np.int64),
            "iid": np.array([10, 20], dtype=np.int64),
            "st": [base, base + np.timedelta64(30, "m")],
            "en": [base + np.timedelta64(60, "m"), base + np.timedelta64(90, "m")],
        }
    )
    out = interval_overlap_join(
        ray.data.from_pandas(df), "owner", "iid", "st", "en"
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["ov_us"] == 30 * 60 * 1_000_000
