import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from wikidata_qrank_ray.stages.sketches import HyperLogLog, approx_distinct


def test_hll_accuracy():
    h = HyperLogLog(p=12)
    h.add([f"u{i}" for i in range(10000)])
    est = h.estimate()
    assert abs(est - 10000) / 10000 < 0.05  # ~1.6% expected at p=12


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add([f"x{i}" for i in range(3000)])
    b.add([f"x{i}" for i in range(1500, 4500)])  # overlapping
    u = HyperLogLog(12)
    u.add([f"x{i}" for i in range(4500)])
    a.merge(b)
    assert (a.registers == u.registers).all()  # register-wise max == union


def test_approx_distinct_dataset():
    n = 5000
    df = pd.DataFrame({"user_id": np.arange(n) % 737})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    est = approx_distinct(ds, "user_id")
    assert abs(est - 737) / 737 < 0.06


def test_misra_gries_guarantee_and_merge():
    """Every item with frequency > n/(k+1) survives the sketch, and the
    estimate underestimates by at most n/(k+1)."""
    import numpy as np

    from wikidata_qrank_ray.stages.sketches import (
        merge_misra_gries,
        misra_gries_summary,
    )

    rng = np.random.RandomState(2)
    # heavy item 'h' at ~30%, long tail
    vals = np.where(rng.random_sample(10000) < 0.3, "h",
                    np.char.add("t", rng.randint(0, 2000, 10000).astype(str)))
    k = 20
    halves = [misra_gries_summary(vals[:5000], k), misra_gries_summary(vals[5000:], k)]
    merged = merge_misra_gries(halves[0], halves[1], k)
    true_h = int((vals == "h").sum())
    assert "h" in merged
    assert 0 <= true_h - merged["h"] <= len(vals) // (k + 1) * 2 + k


def test_approx_heavy_hitters_dataset():
    import pandas as pd
    import ray
    import ray.data

    from wikidata_qrank_ray.stages.sketches import approx_heavy_hitters

    df = pd.DataFrame({"text": ["spark spark table", "spark merge", "table row"] * 500})
    ds = ray.data.from_pandas(df)
    out = approx_heavy_hitters(ds, "text", k=8, tokenize=True)
    assert out["item"].iloc[0] == "spark"  # dominant token surfaces first


def test_histogram_quantiles_error_bound():
    """Sketch estimate within one bin width of the exact order statistic,
    and exactly equal when the sketch is rebuilt at 1 bin per cent."""
    import numpy as np

    from wikidata_qrank_ray.pipelines.queries import (
        q_approx_value_quantiles,
        q_value_percentiles,
    )

    sf = "/root/testdata/sf0.001"
    est = q_approx_value_quantiles(sf).set_index("q")["est"]
    exact = q_value_percentiles(sf)
    import duckdb

    mn, mx = duckdb.sql(
        f"SELECT min(value), max(value) FROM '{sf}/events.parquet'"
    ).fetchone()
    width = (mx - mn) / 4096.0
    for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        assert abs(est[q] - exact[col].iloc[0]) <= width + 1e-9


def test_histogram_quantiles_constant_column():
    """All-equal values: zero width, every quantile = the value."""
    import pyarrow as pa
    import ray.data

    from wikidata_qrank_ray.stages.sketches import histogram_quantiles

    ds = ray.data.from_arrow(pa.table({"v": [7.5] * 100}))
    out = histogram_quantiles(ds, "v")
    assert (out["est"] == 7.5).all()


def test_count_min_point_query_bounds():
    """Point-query estimate (min over rows) is always >= the true count,
    and equals it when no token collides in some row."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from wikidata_qrank_ray.functions.hashing import polyhash64
    from wikidata_qrank_ray.stages.sketches import count_min_sketch

    texts = ["a b a c", "b b d", "a e"]
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    cells = count_min_sketch(ds, depth=4, width=64)
    grid = np.zeros((4, 64), dtype=np.int64)
    grid[cells["r"], cells["c"]] = cells["n"]

    true = pd.Series(" ".join(texts).split()).value_counts()
    for tok, cnt in true.items():
        # % with a python int would promote uint64 -> float64 and corrupt
        # the modulus; keep the reduction in uint64 like the stage does
        cols = [
            int(polyhash64(np.array([f"cms{r}:{tok}"], dtype=object))[0] % np.uint64(64))
            for r in range(4)
        ]
        est = min(grid[r, c] for r, c in enumerate(cols))
        assert est >= cnt
    # total mass per row equals the token count (no token lost)
    assert (grid.sum(axis=1) == len(" ".join(texts).split())).all()


def test_grouped_approx_distinct_error_bound():
    """Grouped HLL estimate within 5 sigma (sigma ~ 1.04/sqrt(2^p)) of the
    exact per-group distinct count, and reshard-invariant."""
    from wikidata_qrank_ray.stages.sketches import grouped_approx_distinct

    rng = np.random.RandomState(13)
    n = 20000
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 4, size=n),
            "v": rng.randint(0, 3000, size=n),
        }
    )
    # a group with tiny cardinality exercises the small-range correction
    df.loc[df["k"] == 3, "v"] = df.loc[df["k"] == 3, "v"] % 7
    p = 10
    sigma = 1.04 / np.sqrt(1 << p)
    out1 = (
        grouped_approx_distinct(
            ray.data.from_pandas(df).repartition(6), ["k"], "v", p=p
        ).to_pandas().set_index("k").sort_index()
    )
    out2 = (
        grouped_approx_distinct(
            ray.data.from_pandas(df).repartition(1), ["k"], "v", p=p
        ).to_pandas().set_index("k").sort_index()
    )
    pd.testing.assert_frame_equal(out1, out2)  # register-max is order-free
    for key, g in df.groupby("k"):
        exact = g["v"].nunique()
        got = out1.loc[key, "approx_n"]
        assert abs(got - exact) <= max(2, 5 * sigma * exact), (key, got, exact)


def test_sqlhash64_matches_duckdb_replay():
    """The HLL hash (polyhash64 + splitmix64) is bit-identical to the
    oracle's HUGEINT chain (decomposed multiplies, xor on HUGEINT)."""
    import duckdb

    from wikidata_qrank_ray.functions.hashing import sqlhash64

    # '' needs the explicit CASE guard used by _hll_sql: DuckDB's
    # string_split_regex('', '') yields [''] and unicode('') is -1, which
    # would seed the fold with -1 instead of polyhash64('') == 0
    vals = [f"u{i}" for i in range(500)] + [str(i) for i in range(500)] + [
        "héllo wörld", "日本語テキスト", "a" * 300, "0", "-17", ""]
    py = sqlhash64(np.asarray(vals, dtype=object))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in vals])
    sql = r"""
WITH h0 AS (SELECT s, CASE WHEN s = '' THEN 0
                 ELSE list_reduce([CAST(unicode(c) AS HUGEINT) FOR c IN string_split_regex(s, '')],
                 (acc, x) -> (acc * 1000003 + x) % 18446744073709551616) END AS h FROM t),
x1 AS (SELECT s, xor(h, h // 1073741824) AS h FROM h0),
m1 AS (SELECT s, ((h * 484763065) + ((h * 3210233709) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS h FROM x1),
x2 AS (SELECT s, xor(h, h // 134217728) AS h FROM m1),
m2 AS (SELECT s, ((h * 321982955) + ((h * 2496678331) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS h FROM x2)
SELECT s, xor(h, h // 2147483648) FROM m2"""
    got = dict(con.execute(sql).fetchall())
    for s, hv in zip(vals, py):
        assert int(hv) == int(got[s]), s


def test_hll_estimate_matches_duckdb_expression():
    """The estimate's float tail is bitwise-stable across engines after the
    half-up integer rounding: exhaustive over every reachable zeros value
    (small-range branch) and randomized exact-integer harmonic sums S
    (raw branch), at both registry precisions p=10 and p=12."""
    import math
    import random

    import duckdb

    con = duckdb.connect()
    for p in (10, 12):
        m = 1 << p
        rows = con.execute(
            f"SELECT z, CAST(floor({m}.0 * ln({m}.0 / CAST(z AS DOUBLE)) + 0.5) AS BIGINT)"
            f" FROM generate_series(1, {m - 1}) g(z)").fetchall()
        for z, sq in rows:
            assert sq == math.floor(m * math.log(m / float(z)) + 0.5), (p, z)
        rng = random.Random(7)
        ss = [rng.randrange(m, m * (1 << 64)) for _ in range(500)]
        con.execute("CREATE OR REPLACE TABLE ss(S HUGEINT)")
        con.executemany("INSERT INTO ss VALUES (?)", [(s,) for s in ss])
        rows = con.execute(
            f"SELECT S, CAST(floor(((0.7213 / (1 + 1.079 / {m})) * {m * m})"
            f" * 18446744073709551616.0 / CAST(S AS DOUBLE) + 0.5) AS BIGINT) FROM ss"
        ).fetchall()
        alpha = 0.7213 / (1 + 1.079 / m)
        for S, sq in rows:
            py = math.floor(
                (alpha * (m * m)) * 18446744073709551616.0 / float(int(S)) + 0.5)
            assert py == sq, (p, S)


def test_grouped_hll_all_null_group_matches_oracle():
    """A group whose values are ALL NULL must appear with estimate 0 on
    both engines (COUNT(DISTINCT) semantics: values skipped, group kept),
    and NULL group keys are dropped -- the code-review-found divergence
    pinned as a permanent oracle-parity case."""
    import duckdb

    from wikidata_qrank_ray.pipelines.queries import _hll_sql
    from wikidata_qrank_ray.stages.sketches import (
        approx_distinct,
        grouped_approx_distinct,
    )

    df = pd.DataFrame(
        {"event_type": ["a", "a", "b", "b", None],
         "user_id": pd.array([1, 2, None, None, 5], dtype="Int64")})
    ds = ray.data.from_pandas(df).repartition(2)
    got = (grouped_approx_distinct(ds, ["event_type"], "user_id", p=10)
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT * FROM df")
    want = con.execute(
        _hll_sql(10, "CAST(user_id AS VARCHAR)", "events", "approx_n",
                 group_col="event_type")
    ).df().sort_values("event_type").reset_index(drop=True)
    assert got["event_type"].tolist() == ["a", "b"] == want["event_type"].tolist()
    assert got["approx_n"].astype(int).tolist() == want["approx_n"].astype(int).tolist()
    # ungrouped: NULL values skipped on both sides
    est = approx_distinct(ds, "user_id", p=12)
    u = con.execute(
        _hll_sql(12, "CAST(user_id AS VARCHAR)", "events", "approx_users")
    ).fetchone()[0]
    assert est == u == 3
