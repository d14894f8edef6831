"""Direct twins for the vectorized bucketed_range_join kernel (the joint
rank-transform composite-key sweep): string by-keys, duplicate values,
inclusive bounds, floats, and empty-match rows -- cases the
purchases_within_week oracle (timestamps, int keys) does not exercise."""

import numpy as np
import pandas as pd
import ray.data

from wikidata_qrank_ray.stages.join import bucketed_range_join


def _brute(left: pd.DataFrame, right: pd.DataFrame, on, lo, hi):
    out = []
    for lr in left.itertuples(index=False):
        for rr in right.itertuples(index=False):
            if lr.k == rr.k and getattr(rr, lo) <= getattr(lr, on) <= getattr(rr, hi):
                out.append((lr.k, getattr(lr, on), rr.rid))
    return sorted(out)


def _run(left: pd.DataFrame, right: pd.DataFrame) -> list:
    got = bucketed_range_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        by_left="k", by_right="k", on_left="v",
        lo_right="lo", hi_right="hi", num_partitions=4,
    ).to_pandas()
    if len(got) == 0:
        # zero-block Datasets lose their schema (the engine's documented
        # empty contract; production pulls go through queries._pd)
        return []
    return sorted(map(tuple, got[["k", "v", "rid"]].itertuples(index=False)))


def test_range_join_string_keys_and_ties():
    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 60),
        "v": rng.randint(0, 20, 60).astype(np.int64)})
    right = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 25),
        "lo": rng.randint(0, 18, 25).astype(np.int64)})
    right["hi"] = right["lo"] + rng.randint(0, 5, 25)
    right["rid"] = np.arange(25, dtype=np.int64)
    want = _brute(left, right, "v", "lo", "hi")
    assert _run(left, right) == want
    assert len(want) > 0  # the case actually exercises matches


def test_range_join_inclusive_bounds_exact():
    left = pd.DataFrame({"k": ["x"] * 5,
                         "v": np.array([1, 2, 3, 3, 4], dtype=np.int64)})
    right = pd.DataFrame({"k": ["x", "x", "x"],
                          "lo": np.array([2, 3, 5], dtype=np.int64),
                          "hi": np.array([3, 3, 9], dtype=np.int64),
                          "rid": np.array([0, 1, 2], dtype=np.int64)})
    got = _run(left, right)
    # [2,3] matches 2,3,3; [3,3] matches 3,3; [5,9] matches nothing
    assert got == sorted([("x", 2, 0), ("x", 3, 0), ("x", 3, 0),
                          ("x", 3, 1), ("x", 3, 1)])


def test_range_join_float_values():
    rng = np.random.RandomState(11)
    left = pd.DataFrame({"k": rng.choice(["p", "q"], 40),
                         "v": np.round(rng.uniform(0, 10, 40), 2)})
    right = pd.DataFrame({"k": rng.choice(["p", "q"], 15),
                          "lo": np.round(rng.uniform(0, 9, 15), 2)})
    right["hi"] = right["lo"] + np.round(rng.uniform(0, 3, 15), 2)
    right["rid"] = np.arange(15, dtype=np.int64)
    assert _run(left, right) == _brute(left, right, "v", "lo", "hi")


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    lrows=st.lists(st.tuples(st.sampled_from("abcd"),
                             st.integers(0, 30)), min_size=0, max_size=40),
    rrows=st.lists(st.tuples(st.sampled_from("abcde"),
                             st.integers(0, 30), st.integers(0, 8)),
                   min_size=1, max_size=20),
)
def test_range_join_property(lrows, rrows):
    left = pd.DataFrame(lrows or [("a", -99)], columns=["k", "v"]).astype(
        {"v": np.int64})
    right = pd.DataFrame(
        [(k, lo, lo + w, i) for i, (k, lo, w) in enumerate(rrows)],
        columns=["k", "lo", "hi", "rid"]).astype(
        {"lo": np.int64, "hi": np.int64, "rid": np.int64})
    assert _run(left, right) == _brute(left, right, "v", "lo", "hi")


def test_range_join_null_keys_never_match():
    """SQL join semantics: a NULL by-key matches nothing, on either side
    (pd.factorize's shared -1 sentinel must not pair them up)."""
    left = pd.DataFrame({"k": pd.Series(["a", None, None], dtype=object),
                         "v": np.array([5, 5, 7], dtype=np.int64)})
    right = pd.DataFrame({"k": pd.Series([None, "a"], dtype=object),
                          "lo": np.array([0, 0], dtype=np.int64),
                          "hi": np.array([100, 100], dtype=np.int64),
                          "rid": np.array([0, 1], dtype=np.int64)})
    assert _run(left, right) == [("a", 5, 1)]


def test_range_join_no_matches_and_disjoint_keys():
    left = pd.DataFrame({"k": ["a", "b"], "v": np.array([1, 2], dtype=np.int64)})
    right = pd.DataFrame({"k": ["c"], "lo": np.array([0], dtype=np.int64),
                          "hi": np.array([100], dtype=np.int64),
                          "rid": np.array([9], dtype=np.int64)})
    assert _run(left, right) == []
