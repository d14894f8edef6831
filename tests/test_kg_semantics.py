"""Flagship (fused) pipeline semantics == the oracle-gated unfused ops.

Pins the alias-closure weight semantics: canonicalization must be applied
AFTER per-turn pair generation (rewrite-then-merge), so a turn mentioning
two surfaces of one canonical entity plus a third entity contributes
co_occurs weight 2, matching canonicalize_triples / the DuckDB oracle.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.sources.gazetteer import build_aliases
from wikidata_qrank_ray.stages.canonicalize import canonicalize_triples, resolve_aliases
from wikidata_qrank_ray.stages.triples import MENTIONS_PRED, TripleExtractor, extract_triples


def _gaz5():
    # aliases rule: Q5 -> Q4 -> Q2 (2-hop chain), Q4 -> Q2
    return pd.DataFrame(
        {
            "qid": [f"Q{i}" for i in range(1, 6)],
            "surface": [f"s{i}" for i in range(1, 6)],
            "prior": [50, 40, 30, 20, 10],
        }
    )


def _turns(texts):
    return pa.table(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
            "text": texts,
            "tool": [""] * len(texts),
        }
    )


def test_alias_pair_weight_is_rewrite_then_merge():
    gaz = _gaz5()
    mapping = resolve_aliases(build_aliases(gaz))
    assert mapping == {"Q5": "Q2", "Q4": "Q2"}
    # one turn: two surfaces of canonical Q2 (s4, s5) plus s1 -> the
    # canonical edge (Q1, Q2) must weigh 2 (one per raw pair), and the
    # collapsed (Q4, Q5) pair must NOT surface as a self-loop
    ex = TripleExtractor(gaz, mapping_ref=mapping)
    out = ex(_turns(["s1 s4 s5"])).to_pandas()
    co = out[out["pred"] == "co_occurs"].set_index(["subj", "obj"])["w"].to_dict()
    assert co == {("Q1", "Q2"): 2}


def test_fused_equals_unfused_canonicalization():
    gaz = _gaz5()
    mapping = resolve_aliases(build_aliases(gaz))
    texts = ["s1 s4 s5 s3", "s2 s5", "s4 s4 s1", "s3", "s5 s4"]
    ds = ray.data.from_arrow(_turns(texts))

    fused = TripleExtractor(gaz, mapping_ref=mapping, emit_counts=False)
    got = (
        ds.map_batches(fused, batch_format="pyarrow")
        .to_pandas()
        .groupby(["subj", "pred", "obj"], as_index=False)["w"]
        .sum()
        .rename(columns={"w": "weight"})
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = (
        canonicalize_triples(extract_triples(ds, ray.put(gaz), concurrency=1), ray.put(mapping))
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_distributed_combine_equals_driver_combine():
    from wikidata_qrank_ray.pipelines.kg_build import _combine_triple_partials

    gaz = _gaz5()
    mapping = resolve_aliases(build_aliases(gaz))
    texts = ["s1 s4 s5 s3", "s2 s5", "s4 s4 s1", "s3", "s5 s4"] * 40
    ds = ray.data.from_arrow(_turns(texts * 1))
    ex = TripleExtractor(gaz, mapping_ref=mapping, emit_counts=True)
    partial = ds.map_batches(ex, batch_format="pyarrow", batch_size=32)
    a = (
        _combine_triple_partials(partial, len(gaz), distributed=False)
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    b = (
        _combine_triple_partials(partial, len(gaz), distributed=True)
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_large_vocab_sparse_path_distributed_combine():
    """10^5-surface gazetteer: the extractor takes the sparse path (dense
    presence matrix would blow memory) and the combine runs distributed;
    result equals the driver combine on the same data."""
    from wikidata_qrank_ray.pipelines.kg_build import (
        DRIVER_COMBINE_MAX_SURFACES,
        _combine_triple_partials,
    )

    n_vocab = 100_000
    assert n_vocab > DRIVER_COMBINE_MAX_SURFACES
    gaz = pd.DataFrame(
        {
            "qid": [f"Q{i}" for i in range(1, n_vocab + 1)],
            "surface": [f"w{i}" for i in range(1, n_vocab + 1)],
            "prior": np.arange(n_vocab, 0, -1),
        }
    )
    rng = np.random.RandomState(7)
    texts = [
        " ".join(f"w{k}" for k in rng.randint(1, n_vocab + 1, size=8))
        for _ in range(2000)
    ]
    ds = ray.data.from_arrow(_turns(texts))
    ex = TripleExtractor(gaz, emit_counts=True)
    assert len(ex.ent_names) > ex.DENSE_MAX_ENTITIES  # sparse path
    partial = ds.map_batches(ex, batch_format="pyarrow", batch_size=256)
    b = _combine_triple_partials(partial, len(gaz))  # auto -> distributed
    a = _combine_triple_partials(partial, len(gaz), distributed=False)
    a = a.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = b.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # sanity: counts rows cover every mentioned surface
    assert (b["pred"] == MENTIONS_PRED).sum() > 0


def test_streaming_distributed_tier_equals_driver_tier(tmp_path):
    """run_streaming's distributed (Dataset-sink) tier produces the same
    triples + qrank as its driver-combine tier on the same input -- the
    100x path never diverges from the small path, and the triple set stays
    off the driver (result is a Dataset)."""
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines import kg_build

    texts = ["s1 s4 s5 s3", "s2 s5", "s4 s4 s1", "s3", "s5 s4"] * 30
    tbl = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
            "role": ["user"] * len(texts),
            "text": texts,
            "tool": [""] * len(texts),
        }
    )
    src = str(tmp_path / "turns.parquet")
    pq.write_table(tbl, src)

    small = kg_build.run_streaming(src, concurrency=2, distributed=False)
    big = kg_build.run_streaming(src, concurrency=2, distributed=True)
    assert isinstance(big["triples"], ray.data.Dataset)
    got = (
        big["triples"].to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = (
        small["triples"]
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    pd.testing.assert_frame_equal(
        big["qrank"].reset_index(drop=True), small["qrank"].reset_index(drop=True)
    )
    # sink variant: out_dir writes partitioned Parquet with the same rows
    out = str(tmp_path / "sink")
    kg_build.run_streaming(src, concurrency=2, distributed=True, out_dir=out)
    sunk = (
        ray.data.read_parquet(out + "/triples")
        .to_pandas()[["subj", "pred", "obj", "weight"]]
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        sunk.astype({"weight": "int64"}), want, check_dtype=False
    )


def test_flagship_triples_match_canonical_oracle(tmp_path):
    """End-to-end value parity: kg_build.run's triple output equals the
    DuckDB canonical_triples oracle on the same derived corpus (the e2e
    invariant tests check shape; this pins the VALUES)."""
    import duckdb

    import __ray_entry__ as E
    from wikidata_qrank_ray.pipelines import kg_build

    SF = "/root/testdata/sf0.001"
    out = kg_build.run(
        transcripts_path=None, run_dir=str(tmp_path / "run"), sf_dir=SF, concurrency=2
    )
    got = (
        ray.data.read_parquet(out["triples"])
        .to_pandas()[["subj", "pred", "obj", "weight"]]
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = (
        con.sql(E.oracle_sql()["canonical_triples"])
        .df()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_gazetteer_merge_distributed_equals_driver():
    """The distributed gazetteer merge tier (hash-partitioned aggregate +
    per-block top-N candidates) equals the driver pandas merge, including
    the (cnt desc, surface asc) tie rule and stopword drop."""
    from wikidata_qrank_ray.pipelines.kg_build import _gazetteer_from_turns

    rng = np.random.RandomState(11)
    vocab = [f"tok{i}" for i in range(400)] + ["the", "a"]  # incl stopwords
    texts = [
        " ".join(vocab[k] for k in rng.randint(0, len(vocab), size=12))
        for _ in range(800)
    ]
    ds = ray.data.from_arrow(_turns(texts)).repartition(6)
    a = _gazetteer_from_turns(ds, top_n=25, distributed=False)
    b = _gazetteer_from_turns(ds, top_n=25, distributed=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert not set(a["surface"]) & {"the", "a"}
    assert len(a) == 25
