import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.stages.triples import TripleExtractor, extract_triples


def _gaz():
    return pd.DataFrame(
        {"qid": ["Q1", "Q2", "Q10"], "surface": ["spark", "merge", "sort"], "prior": [9, 5, 2]}
    )


def test_triple_extractor_golden():
    t = pa.table(
        {
            "conv_id": ["c0", "c0"],
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "text": ["spark merge sort spark", "merge alone"],
            "tool": ["calc", ""],
        }
    )
    out = TripleExtractor(_gaz())(t).to_pandas()
    co = out[out["pred"] == "co_occurs"].set_index(["subj", "obj"])["w"].to_dict()
    # numeric order: Q1<Q2<Q10 -> pairs (Q1,Q2),(Q1,Q10),(Q2,Q10)
    assert co == {("Q1", "Q2"): 1, ("Q1", "Q10"): 1, ("Q2", "Q10"): 1}
    tools = out[out["pred"] == "observed_via_tool"].set_index(["subj", "obj"])["w"].to_dict()
    assert tools == {("Q1", "calc"): 1, ("Q2", "calc"): 1, ("Q10", "calc"): 1}


def test_extract_triples_dedup_across_batches():
    # same pair in many turns -> one triple row, summed weight
    n = 10
    t = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(n)],
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "text": ["spark merge"] * n,
            "tool": [""] * n,
        }
    )
    ds = ray.data.from_arrow(t)
    out = extract_triples(ds, ray.put(_gaz()), concurrency=1, batch_size=3).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["weight"] == n
    assert (out.iloc[0]["subj"], out.iloc[0]["obj"]) == ("Q1", "Q2")
