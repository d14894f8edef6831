import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from wikidata_qrank_ray.stages.join import (
    broadcast_semi_join,
    bucketed_asof_join,
    bucketed_hash_join,
)


def _ds(df):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_bucketed_hash_join_matches_pandas():
    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
    right = pd.DataFrame({"rk": [2, 3, 3, 4], "rv": [10, 20, 30, 40]})
    out = (
        bucketed_hash_join(_ds(left), _ds(right), "k", "rk", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right.rename(columns={"rk": "k"}), on="k")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert out[["k", "lv", "rv"]].astype({"rv": np.int64}).equals(
        expect[["k", "lv", "rv"]]
    )


def test_bucketed_hash_join_collision_raises():
    left = pd.DataFrame({"k": [1], "v": [1]})
    right = pd.DataFrame({"rk": [1], "v": [2]})
    with pytest.raises(ValueError):
        bucketed_hash_join(_ds(left), _ds(right), "k", "rk")


def test_broadcast_semi_and_anti():
    ds = _ds(pd.DataFrame({"k": [1, 2, 3, 4], "v": list("abcd")}))
    semi = broadcast_semi_join(ds, "k", np.array([2, 4])).to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    anti = broadcast_semi_join(ds, "k", np.array([2, 4]), anti=True).to_pandas()
    assert sorted(anti["k"]) == [1, 3]


def test_asof_join_backward():
    left = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "u": [7, 7, 7, 9],
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                                  "2024-01-01 09:00", "2024-01-01 10:30"]),
        }
    )
    right = pd.DataFrame(
        {
            "u2": [7, 7, 9],
            "ts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 10:30",
                                  "2024-01-01 11:00"]),
            "mark": ["x", "y", "z"],
        }
    )
    out = (
        bucketed_asof_join(
            _ds(left), _ds(right), on="ts", by_left="u", by_right="u2",
            right_value_cols=["mark"], direction="backward",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # id1@10:00 -> x(9:30); id2@11:00 -> y(10:30); id3@9:00 -> none;
    # id4(u=9)@10:30 -> none (z is later)
    got = dict(zip(out["id"].astype(int), out["mark_r"]))
    assert got[1] == "x" and got[2] == "y"
    assert pd.isna(got[3]) and pd.isna(got[4])


def test_right_outer_join_keeps_unmatched_right():
    import pyarrow as pa

    left = ray.data.from_arrow(
        pa.table({"lk": pa.array([1, 1, 2], type=pa.int64()),
                  "lval": pa.array([10, 11, 20], type=pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, 3], type=pa.int64()),
                  "rval": pa.array([100, 300], type=pa.int64())})
    )
    out = bucketed_hash_join(left, right, "lk", "rk", how="right").to_pandas()
    # key 3 survives with null lval; key 2 (left-only) is dropped
    assert set(out["lk"]) == {1, 3}
    assert out[out["lk"] == 3]["lval"].isna().all()
    assert len(out[out["lk"] == 1]) == 2


def test_outer_join_keeps_both_sides():
    import pyarrow as pa

    left = ray.data.from_arrow(
        pa.table({"lk": pa.array([1, 2], type=pa.int64()),
                  "lval": pa.array([10, 20], type=pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 3], type=pa.int64()),
                  "rval": pa.array([200, 300], type=pa.int64())})
    )
    out = bucketed_hash_join(left, right, "lk", "rk", how="outer").to_pandas()
    assert set(out["lk"]) == {1, 2, 3}


def test_salted_join_equals_unsalted():
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(5)
    # hot key 7 dominates the left side
    lk = np.where(rng.random_sample(500) < 0.8, 7, rng.randint(0, 20, size=500))
    left = ray.data.from_arrow(
        pa.table({"lk": pa.array(lk, type=pa.int64()),
                  "lval": pa.array(np.arange(500), type=pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(np.arange(20), type=pa.int64()),
                  "rval": pa.array(np.arange(20) * 100, type=pa.int64())})
    )
    plain = (
        bucketed_hash_join(left, right, "lk", "rk", how="inner")
        .to_pandas().sort_values(["lk", "lval"]).reset_index(drop=True)
    )
    salted = (
        bucketed_hash_join(left, right, "lk", "rk", how="inner", salt_buckets=4)
        .to_pandas().sort_values(["lk", "lval"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)
