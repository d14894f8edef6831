"""Property tests for the round-4b event operators: sessionize and the
ordered funnel, each pinned against a single-process brute-force twin on
random event tables (the kmeans/BPE twin precedent)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from wikidata_qrank_ray.pipelines.queries import (
    SESSION_GAP_US,
    _cents,
    q_funnel_stages,
    q_sessionize_value,
)


def _rand_events(seed: int, n: int = 400, n_users: int = 12) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.randint(0, 5 * 86400, n).astype(np.int64) * 1_000_000
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.randint(0, n_users, n).astype(np.int64),
        "event_type": rng.choice(
            ["signup", "click", "purchase", "view"], n),
        "value": rng.randint(0, 10_000, n) / 100.0,
        "props": ["{}"] * n,
    })


def _write_dir(tmp_path, df: pd.DataFrame) -> str:
    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _brute_sessions(df: pd.DataFrame) -> set:
    out = set()
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = _cents(g["value"].to_numpy())
        sid, rows = 0, []
        prev = None
        for i in range(len(g)):
            if prev is None or us[i] - prev > SESSION_GAP_US:
                sid += 1
                rows.append([us[i], us[i], 0, 0])
            prev = us[i]
            rows[-1][1] = us[i]
            rows[-1][2] += 1
            rows[-1][3] += int(cents[i])
        for pos, (s, e, n, c) in enumerate(rows, start=1):
            out.add((int(uid), pos, n, s, e, c))
    return out


def test_sessionize_random_tables(tmp_path):
    for seed in (1, 2):
        df = _rand_events(seed)
        got = q_sessionize_value(
            _write_dir(tmp_path / f"s{seed}", df)).to_pandas()
        got_set = set(zip(got["user_id"].astype(int),
                          got["session_pos"].astype(int),
                          got["n_events"].astype(int),
                          got["start_us"].astype(int),
                          got["end_us"].astype(int),
                          got["value_cents"].astype(int)))
        assert got_set == _brute_sessions(df)


def _brute_funnel(df: pd.DataFrame) -> set:
    out = set()
    for uid, g in df.groupby("user_id"):
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        t1 = min((int(t) for t, e in zip(us, et) if e == "signup"),
                 default=None)
        t2 = None if t1 is None else min(
            (int(t) for t, e in zip(us, et) if e == "click" and t > t1),
            default=None)
        t3 = None if t2 is None else min(
            (int(t) for t, e in zip(us, et) if e == "purchase" and t > t2),
            default=None)
        stage = (t1 is not None) + (t2 is not None) + (t3 is not None)
        out.add((int(uid), stage,
                 -1 if t1 is None else t1,
                 -1 if t2 is None else t2,
                 -1 if t3 is None else t3))
    return out


def test_funnel_random_tables(tmp_path):
    for seed in (3, 4):
        df = _rand_events(seed)
        got = q_funnel_stages(_write_dir(tmp_path / f"f{seed}", df)).to_pandas()
        got_set = set(zip(got["user_id"].astype(int),
                          got["stage"].astype(int),
                          got["signup_us"].astype(int),
                          got["click_us"].astype(int),
                          got["purchase_us"].astype(int)))
        assert got_set == _brute_funnel(df)
