"""Round-4f operators: integer CUSUM changepoint, lag-1 autocovariance
sufficient statistics, sweep-line peak session concurrency -- brute-force
single-process twins over the real sf0.001 tables."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _hourly_series(ev: pd.DataFrame) -> dict[str, np.ndarray]:
    HOUR_US = 3_600_000_000
    h = ev["ts"].dt.floor("h").astype("datetime64[us]").astype("int64")
    out = {}
    for et, g in ev.assign(h=h).groupby("event_type"):
        cnt = g.groupby("h").size()
        grid = np.arange(cnt.index.min(), cnt.index.max() + 1, HOUR_US)
        out[et] = (grid, cnt.reindex(grid, fill_value=0).to_numpy(np.int64))
    return out


def test_cusum_changepoint_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_cusum_changepoint

    ev = pq.read_table(SF + "/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    want = {}
    for et, (grid, x) in _hourly_series(ev).items():
        n = len(x)
        if n < 2:
            continue
        best = None
        pk = np.cumsum(x)
        for k in range(1, n):
            stat = abs(n * int(pk[k - 1]) - k * int(pk[-1]))
            if best is None or stat > best[2]:
                best = (k, int(grid[k - 1]), stat)
        want[et] = (n, *best)
    got = q_cusum_changepoint(SF)
    got_map = {r.event_type: (int(r.n_hours), int(r.split_k),
                              int(r.split_hour.value // 1000),
                              int(r.stat))
               for r in got.itertuples(index=False)}
    assert got_map == want


def test_lag_autocov_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_lag_autocov

    ev = pq.read_table(SF + "/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    want = {}
    for et, (_, x) in _hourly_series(ev).items():
        if len(x) < 2:
            continue
        m = len(x) - 1
        sxy = int((x[:-1] * x[1:]).sum())
        sx, sy = int(x[:-1].sum()), int(x[1:].sum())
        want[et] = (m, sxy, sx, sy, m * sxy - sx * sy)
    got = q_lag_autocov(SF).to_pandas()
    got_map = {r.event_type: (int(r.m), int(r.sxy), int(r.sx), int(r.sy),
                              int(r.cov_num))
               for r in got.itertuples(index=False)}
    assert got_map == want
    # the numerator decomposes exactly: cov_num = m*sxy - sx*sy
    for m, sxy, sx, sy, cn in got_map.values():
        assert cn == m * sxy - sx * sy


def test_peak_concurrency_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import (
        q_peak_concurrency, q_sessionize)

    sess = q_sessionize(SF).to_pandas()
    s = sess["session_start"].astype("datetime64[us]").astype("int64").to_numpy()
    e = sess["session_end"].astype("datetime64[us]").astype("int64").to_numpy() + 1
    t = np.concatenate([s, e])
    d = np.concatenate([np.ones(len(s), dtype=np.int64),
                        -np.ones(len(e), dtype=np.int64)])
    order = np.lexsort((d, t))
    c = np.cumsum(d[order])
    peak = int(c.max())
    at = int(t[order][c == peak].min())
    got = q_peak_concurrency(SF)
    assert len(got) == 1
    assert int(got["peak"].iloc[0]) == peak
    assert int(got["at_ts"].iloc[0].value // 1000) == at
    # sanity: peak is positive and bounded by the session count
    assert 1 <= peak <= len(sess)


def test_peak_concurrency_synthetic_overlap():
    """Three hand-placed sessions: [0,10], [5,20], [15,30] (minutes) ->
    peak 2, first reached at t=5min. Exercises the end+1us boundary rule
    (end at 10 and start at 15 never overlap; end 10 vs start 5 do)."""
    import ray
    import ray.data

    from wikidata_qrank_ray.pipelines import queries as Q

    base = pd.Timestamp("2025-01-01")
    ev = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3, 3],
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": [base, base + pd.Timedelta(minutes=10),
               base + pd.Timedelta(minutes=5),
               base + pd.Timedelta(minutes=20),
               base + pd.Timedelta(minutes=15),
               base + pd.Timedelta(minutes=30)],
    })
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ev.to_parquet(os.path.join(td, "events.parquet"))
        got = Q.q_peak_concurrency(td)
    assert int(got["peak"].iloc[0]) == 2
    assert got["at_ts"].iloc[0] == base + pd.Timedelta(minutes=5)
