"""Round-4i operators: CUBE grouping sets, supplier HHI concentration,
vocabulary coverage curve, DSIR-style hashed-bigram importance weights,
SemDeDup cluster-then-dedup -- planted cases + brute-force single-process
twins over the real sf0.001 tables (the DuckDB oracles are the primary
gate; these pin the kernels independently)."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from wikidata_qrank_ray.functions.tokenize import py_tokens

SF = "/root/testdata/sf0.001"


def _poly64(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 1000003 + ord(ch)) % (1 << 64)
    return h


def test_revenue_cube_grouping_sets_consistent():
    from wikidata_qrank_ray.pipelines.queries import q_revenue_cube

    got = q_revenue_cube(SF)
    fine = got[got["o_orderstatus"].notna() & got["c_mktsegment"].notna()]
    by_status = got[got["o_orderstatus"].notna() & got["c_mktsegment"].isna()]
    by_seg = got[got["o_orderstatus"].isna() & got["c_mktsegment"].notna()]
    grand = got[got["o_orderstatus"].isna() & got["c_mktsegment"].isna()]
    assert len(grand) == 1
    assert int(grand["n_orders"].iloc[0]) == int(fine["n_orders"].sum())
    assert int(by_status["n_orders"].sum()) == int(fine["n_orders"].sum())
    assert int(by_seg["n_orders"].sum()) == int(fine["n_orders"].sum())
    # every fine (status, segment) combination present exactly once
    assert not fine.duplicated(["o_orderstatus", "c_mktsegment"]).any()
    want_status = fine.groupby("o_orderstatus")["n_orders"].sum().to_dict()
    got_status = dict(zip(by_status["o_orderstatus"], by_status["n_orders"]))
    assert {k: int(v) for k, v in got_status.items()} == {
        k: int(v) for k, v in want_status.items()}


def test_cube_rollup_null_key_groups_match_sql(tmp_path):
    """A data-NULL grouping key is its own group in SQL GROUP BY, and the
    coarser CUBE/ROLLUP sets must keep it: pandas groupby's default
    dropna=True silently dropped those rows from the driver-side lattice
    re-aggregation (caught by review, not by the oracle corpora -- none
    had NULL keys). Permanent NULL-key corpus pin for both queries."""
    import shutil

    import duckdb

    from wikidata_qrank_ray.pipelines.queries import (
        oracle_sql, q_revenue_cube, q_revenue_rollup)

    for f in ("orders", "customer", "nation", "region"):
        shutil.copy(f"{SF}/{f}.parquet", str(tmp_path / f"{f}.parquet"))
    o = pq.read_table(str(tmp_path / "orders.parquet")).to_pandas()
    o.loc[o.index[:5], "o_orderstatus"] = None
    o.loc[o.index[5:9], "o_orderpriority"] = None
    pq.write_table(pa.Table.from_pandas(o, preserve_index=False),
                   str(tmp_path / "orders.parquet"))
    c = pq.read_table(str(tmp_path / "customer.parquet")).to_pandas()
    c.loc[c.index[:3], "c_mktsegment"] = None
    pq.write_table(pa.Table.from_pandas(c, preserve_index=False),
                   str(tmp_path / "customer.parquet"))

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')")
    sql = oracle_sql()
    for q, fn in (("revenue_cube", q_revenue_cube),
                  ("revenue_rollup", q_revenue_rollup)):
        got = fn(str(tmp_path)).fillna(np.nan)
        want = con.sql(sql[q]).df().fillna(np.nan)
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        g = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
        w = want[cols].astype(str).sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w)


def test_supplier_hhi_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_supplier_hhi

    li = pq.read_table(
        SF + "/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"]).to_pandas()
    sup = pq.read_table(
        SF + "/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(
        SF + "/nation.parquet",
        columns=["n_nationkey", "n_name"]).to_pandas()
    li["rev_c4"] = (
        np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        * (100 - np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)))
    rev = li.groupby("l_suppkey")["rev_c4"].sum()
    nk = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    tot = Counter()
    for sk, r in rev.items():
        tot[nk[sk]] += int(r)
    want = Counter()
    n_sup = Counter()
    for sk, r in rev.items():
        share = int(r) * 1_000_000 // tot[nk[sk]] if tot[nk[sk]] > 0 else 0
        want[name[nk[sk]]] += share * share
        n_sup[name[nk[sk]]] += 1
    got = q_supplier_hhi(SF)
    got_map = {r.n_name: (int(r.n_suppliers), int(r.hhi))
               for r in got.itertuples(index=False)}
    assert got_map == {k: (n_sup[k], v) for k, v in want.items()}


def test_vocab_coverage_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_vocab_coverage

    docs = pq.read_table(SF + "/documents.parquet", columns=["text"]).to_pandas()
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(py_tokens(t))
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    got = q_vocab_coverage(SF)
    for r in got.itertuples(index=False):
        covered = sum(c for _, c in ordered[: int(r.k)])
        assert int(r.total_tokens) == total
        assert int(r.covered_tokens) == covered
        assert int(r.n_top_tokens) == min(int(r.k), len(ordered))
        assert int(r.coverage_ppm) == (covered * 1_000_000 // total if total else 0)


def test_importance_weights_all_target_is_unity(tmp_path):
    """When every document IS the target slice, every bucket ratio is
    exactly 1e6 and imp_score == n_bigrams * 1e6."""
    from wikidata_qrank_ray.pipelines.queries import q_importance_weights

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["a b c", "b c d e", "x", ""]),
        "source": pa.array(["src0"] * 4),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = q_importance_weights(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert got["n_bigrams"].tolist() == [2, 3, 0, 0]
    assert (got["imp_score"].to_numpy()
            == got["n_bigrams"].to_numpy() * 1_000_000).all()


def test_importance_weights_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_importance_weights

    docs = pq.read_table(
        SF + "/documents.parquet",
        columns=["doc_id", "text", "source"]).to_pandas()
    raw = Counter()
    tgt = Counter()
    per_doc = {}
    for r in docs.itertuples(index=False):
        toks = py_tokens(r.text)
        buckets = [_poly64(f"{a} {b}") % 64 for a, b in zip(toks, toks[1:])]
        per_doc[int(r.doc_id)] = buckets
        raw.update(buckets)
        if r.source == "src0":
            tgt.update(buckets)
    ratio = {b: tgt.get(b, 0) * 1_000_000 // n for b, n in raw.items()}
    got = q_importance_weights(SF).to_pandas()
    for r in got.itertuples(index=False):
        buckets = per_doc[int(r.doc_id)]
        assert int(r.n_bigrams) == len(buckets)
        assert int(r.imp_score) == sum(ratio[b] for b in buckets)


def test_semantic_dedup_planted_exact_duplicate(tmp_path):
    """An exact embedding copy (d2 = 0) must always be flagged on the
    higher vec_id; well-separated singletons must never be flagged."""
    from wikidata_qrank_ray.pipelines.queries import q_semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.uniform(-1, 1, size=(20, 64)).astype(np.float32) * 2.0
    # spread the non-dup vectors far apart (quant-grid d2 >> T)
    base += np.arange(20, dtype=np.float32)[:, None] * 3.0
    emb = np.vstack([base, base[2:3]])  # vec 20 == vec 2 exactly
    t = pa.table({
        "vec_id": pa.array(np.arange(21, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in emb],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(21, dtype=np.int32)),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = q_semantic_dedup(str(tmp_path)).sort_values("vec_id")
    assert int(got.loc[got["vec_id"] == 20, "is_dup"].iloc[0]) == 1
    assert (got.loc[got["vec_id"] == 20, "cluster"].iloc[0]
            == got.loc[got["vec_id"] == 2, "cluster"].iloc[0])
    assert int(got["is_dup"].sum()) == 1


def test_semantic_dedup_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_semantic_dedup
    from wikidata_qrank_ray.stages.similarity import _quant_int

    T = 1_300_000_000_000
    t = pq.read_table(SF + "/embeddings.parquet")
    got = q_semantic_dedup(SF).sort_values("vec_id").reset_index(drop=True)
    q = _quant_int(np.stack(t["embedding"].to_pylist()).astype(np.float64), 1e6)
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    q, ids = q[order], ids[order]
    cl = got.set_index("vec_id")["cluster"]
    clu = cl.loc[ids].to_numpy()
    want = {}
    for c in np.unique(clu):
        sel = clu == c
        m, vid = q[sel], ids[sel]
        n2 = (m * m).sum(axis=1)
        d2 = n2[:, None] + n2[None, :] - 2 * (m @ m.T)
        dup = np.tril(d2 <= T, k=-1).any(axis=1)
        want.update(dict(zip(vid.tolist(), dup.astype(int).tolist())))
    got_map = dict(zip(got["vec_id"].tolist(), got["is_dup"].tolist()))
    assert got_map == want
