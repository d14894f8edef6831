"""The acceptance-criteria oracles made explicit (BASELINE.json):

- P/R >= 0.95 on emitted (subj, pred, obj) triples vs the
  reference-semantics oracle (DuckDB re-derivation of the same corpus) --
  ours is exact, so P = R = 1.0.
- Rank-order agreement on the qrank table (qviews.go:109-121 rollup +
  qrank.go:45-53 ordering).
"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_triple_precision_recall(con):
    got = E.queries()["canonical_triples"](SF).to_pandas()
    want = con.sql(E.oracle_sql()["canonical_triples"]).df()
    gset = set(map(tuple, got[["subj", "pred", "obj"]].to_numpy()))
    wset = set(map(tuple, want[["subj", "pred", "obj"]].to_numpy()))
    tp = len(gset & wset)
    precision = tp / max(1, len(gset))
    recall = tp / max(1, len(wset))
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # exact by construction


def test_rank_order_agreement(con):
    got = E.queries()["canonical_qrank"](SF)
    want = con.sql(E.oracle_sql()["canonical_qrank"]).df().sort_values("rank_pos")
    assert got["qid"].tolist() == want["qid"].tolist()
    assert got["rank_value"].tolist() == want["rank_value"].tolist()


def test_weights_agree(con):
    got = (
        E.queries()["canonical_triples"](SF)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = (
        con.sql(E.oracle_sql()["canonical_triples"]).df()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
