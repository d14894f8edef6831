import numpy as np
import pandas as pd
import ray.data

from wikidata_qrank_ray.stages.stats import grouped_linear_fit


def test_grouped_linear_fit_matches_polyfit():
    rng = np.random.RandomState(11)
    rows = []
    for key, slope, icept in [(0, 3, 7), (1, -2, 100), (2, 0, 5)]:
        x = rng.randint(0, 50, size=40)
        y = slope * x + icept + rng.randint(-2, 3, size=40)
        rows.append(pd.DataFrame({"k": key, "x": x, "y": y}))
    # a single-point group (degenerate: den == 0) and a vertical pair
    rows.append(pd.DataFrame({"k": [3], "x": [9], "y": [4]}))
    rows.append(pd.DataFrame({"k": [4, 4], "x": [6, 6], "y": [1, 9]}))
    df = pd.concat(rows, ignore_index=True)

    out = (
        grouped_linear_fit(
            ray.data.from_pandas(df).repartition(5), ["k"], "x", "y",
            num_partitions=4,
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for key, g in df.groupby("k"):
        r = out.loc[key]
        n = len(g)
        assert r["n"] == n
        assert r["sx"] == g["x"].sum() and r["sy"] == g["y"].sum()
        num = n * (g["x"] * g["y"]).sum() - g["x"].sum() * g["y"].sum()
        den = n * (g["x"] ** 2).sum() - g["x"].sum() ** 2
        assert r["slope_num"] == num and r["slope_den"] == den
        if den != 0:
            want = np.polyfit(g["x"], g["y"], 1)[0]
            assert abs(num / den - want) < 1e-8
        else:
            assert key in (3, 4)


def test_grouped_weighted_median_roundtrip():
    from wikidata_qrank_ray.stages.stats import grouped_weighted_median

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 5, size=400),
            "v": rng.randint(-50, 50, size=400),
            "w": rng.randint(1, 8, size=400),
        }
    )
    out = (
        grouped_weighted_median(
            ray.data.from_pandas(df).repartition(6), ["k"], "v", "w",
            num_partitions=4,
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    for key, g in df.groupby("k"):
        expanded = np.sort(np.repeat(g["v"].to_numpy(), g["w"].to_numpy()))
        assert out.loc[key, "w_median"] == expanded[(len(expanded) - 1) // 2]
        assert out.loc[key, "total_w"] == g["w"].sum()
