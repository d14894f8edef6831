"""Local stand-in for the driver's correctness gate: run each queries()
entry AND its oracle_sql() twin at a given sf dir, sort columns by name and
rows by value, and compare values EXACTLY (floats bitwise). Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if len(got) == 0 and len(want) == 0 and len(got.columns) == 0:
        # a Ray Dataset with zero blocks has no schema to read back --
        # to_pandas() gives a column-less empty frame. The driver compares
        # schema even for zero-row results, so this IS a failure: queries
        # must return a typed empty frame (queries._pd / typed-empty head).
        return ["schema: zero-block result lost its schema "
                f"(want {sorted(want.columns)}); return a typed empty frame"]
    if sorted(got.columns) != sorted(want.columns):
        return [f"schema: got {sorted(got.columns)} want {sorted(want.columns)}"]
    if len(got) != len(want):
        issues.append(f"rows: got {len(got)} want {len(want)}")
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                eq = np.array_equal(
                    np.asarray(gv, dtype=np.float64).view(np.int64),
                    np.asarray(wv, dtype=np.float64).view(np.int64),
                )
            else:
                eq = bool((pd.Series(gv).astype(str) == pd.Series(wv).astype(str)).all())
            if not eq:
                bad = None
                try:
                    neq = np.nonzero(pd.Series(gv).astype(str).to_numpy()
                                     != pd.Series(wv).astype(str).to_numpy())[0]
                    if len(neq):
                        i = neq[0]
                        bad = f" first diff row {i}: got {gv[i]!r} want {wv[i]!r}"
                except Exception:
                    pass
                issues.append(f"values differ in column {c!r}{bad or ''}")
    return issues


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        tp = os.path.join(sf, f"{t}.parquet")
        # sharded table directory (e.g. from tools/reshard.py) or one file
        src = f"{tp}/*.parquet" if os.path.isdir(tp) else tp
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    n_pass = n_fail = n_noorc = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_df(fn(sf))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"---- {name}: no oracle ({len(got)} rows)")
            n_noorc += 1
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        issues = compare(got, want)
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noorc} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
