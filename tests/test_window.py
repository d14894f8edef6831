"""Sliding-window aggregate: RANGE-frame semantics vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from wikidata_qrank_ray.stages.window import _sweep_grouped, sliding_window_aggregate


def _brute(df, window):
    rows = []
    for _, r in df.iterrows():
        m = df[
            (df["k"] == r["k"]) & (df["t"] >= r["t"] - window) & (df["t"] <= r["t"])
        ]
        rows.append((r["i"], r["k"], len(m), int(m["v"].sum())))
    return (
        pd.DataFrame(rows, columns=["i", "k", "w_count", "w_sum"])
        .sort_values("i")
        .reset_index(drop=True)
    )


def _run(df, window):
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    )
    out = sliding_window_aggregate(
        ds, by="k", ts_col="t", value_col="v", window_us=window, id_cols=["i"]
    )
    return out.to_pandas().sort_values("i").reset_index(drop=True)


def test_matches_brute_force_random():
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "i": np.arange(n),
            "k": rng.integers(0, 12, n),
            "t": rng.integers(0, 1000, n).astype(np.int64),
            "v": rng.integers(-50, 50, n).astype(np.int64),
        }
    )
    got = _run(df, 100)
    want = _brute(df, 100)
    pd.testing.assert_frame_equal(
        got.astype({"w_count": np.int64, "w_sum": np.int64}), want.astype(
            {"w_count": np.int64, "w_sum": np.int64}
        ), check_dtype=False
    )


def test_timestamp_peers_share_frame():
    # RANGE semantics: rows tying on ts are peers -- every peer's frame
    # includes ALL peers (not just earlier-indexed ones)
    df = pd.DataFrame(
        {"i": [0, 1, 2], "k": [1, 1, 1], "t": [10, 10, 10], "v": [1, 2, 4]}
    )
    got = _run(df, 5)
    assert list(got["w_count"]) == [3, 3, 3]
    assert list(got["w_sum"]) == [7, 7, 7]


def test_window_lower_bound_inclusive_and_keys_isolated():
    df = pd.DataFrame(
        {
            "i": [0, 1, 2, 3, 4],
            "k": [1, 1, 1, 1, 2],
            "t": [0, 100, 200, 301, 100],
            "v": [1, 10, 100, 1000, 7],
        }
    )
    got = _run(df, 100)
    by_i = got.set_index("i")
    assert by_i.loc[1, "w_sum"] == 11  # t=0 is exactly at 100-100: included
    assert by_i.loc[2, "w_sum"] == 110  # frame [100,200]: t=0 fell out
    assert by_i.loc[3, "w_sum"] == 1000  # frame [201,301]: alone
    assert by_i.loc[4, "w_sum"] == 7  # other key untouched


def test_overflow_fallback_equality():
    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame(
        {
            "i": np.arange(n),
            "k": rng.integers(0, 9, n),
            "t": rng.integers(0, 500, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    fast = _run(df, 60)
    slow = (
        _sweep_grouped(df, "k", "t", "v", 60, ["i"], "w_count", "w_sum")
        .sort_values("i")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_gapfill_plants_zero_hours(tmp_path):
    """A type with a 3-hour hole gets exactly those hours back at zero."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines.queries import q_events_gapfill

    d = tmp_path / "sf"
    d.mkdir()
    ts = pd.to_datetime(
        ["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 04:10",
         "2024-01-01 01:10"]
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table({
            "event_id": [1, 2, 3, 4],
            "ts": ts,
            "user_id": [1, 1, 2, 3],
            "event_type": ["a", "a", "a", "b"],
            "value": [1.0, 1.0, 1.0, 1.0],
            "props": ["{}"] * 4,
        }),
        d / "events.parquet",
    )
    df = q_events_gapfill(str(d)).sort_values(["event_type", "hour"])
    a = df[df["event_type"] == "a"]
    assert len(a) == 5  # hours 00..04 inclusive
    assert list(a["n_events"]) == [2, 0, 0, 0, 1]
    b = df[df["event_type"] == "b"]
    assert len(b) == 1 and int(b["n_events"].iloc[0]) == 1


def test_event_funnel_ordering_semantics(tmp_path):
    """Stage times must be strictly increasing: a purchase BEFORE the
    first click doesn't count; a user with no view is stage 0."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines.queries import q_event_funnel

    d = tmp_path / "sf"
    d.mkdir()
    rows = [
        # user 1: full ordered chain
        (1, "view", "2024-01-01 00:00"), (1, "click", "2024-01-01 01:00"),
        (1, "purchase", "2024-01-01 02:00"),
        # user 2: purchase precedes click -> stalls at stage 2
        (2, "view", "2024-01-01 00:00"), (2, "purchase", "2024-01-01 00:30"),
        (2, "click", "2024-01-01 01:00"),
        # user 3: clicks but never viewed -> stage 0
        (3, "click", "2024-01-01 00:00"),
        # user 4: only non-funnel events -> absent from output
        (4, "error", "2024-01-01 00:00"),
    ]
    pq.write_table(
        pa.table({
            "event_id": list(range(len(rows))),
            "ts": pd.to_datetime([r[2] for r in rows]).astype("datetime64[us]"),
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }),
        d / "events.parquet",
    )
    df = q_event_funnel(str(d)).set_index("user_id").sort_index()
    assert list(df.index) == [1, 2, 3]
    assert list(df["funnel_stage"]) == [3, 2, 0]
    assert pd.isna(df.loc[2, "t3"]) and pd.isna(df.loc[3, "t1"])
