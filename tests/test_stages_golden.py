"""Stage tests on tiny deterministic Arrow tables with exact expected
outputs -- the reference's golden-test layer translated
(qviews_test.go:13-45, qrank_test.go:13-33, pageviews_test.go:341-364,
stats_test.go:15-55, links dedup links_test.go:39).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.stages.canonicalize import (
    canonicalize_triples,
    resolve_aliases,
)
from wikidata_qrank_ray.stages.rank import qrank_order, rollup, salted_rollup
from wikidata_qrank_ray.stages.stats import rank_stats


def _partials(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "qid": pa.array([r[0] for r in rows]),
                "cnt": pa.array([r[1] for r in rows], type=pa.int64()),
            }
        )
    )


def test_rollup_merge_counts_golden():
    # MergeCounts golden (pageviews_test.go:341-364): foo,A,77 / qux,X,33 /
    # qux,X,1 / qux,Y,7 -> foo,A,77 / qux,X,34 / qux,Y,7
    ds = _partials([("foo/A", 77), ("qux/X", 33), ("qux/X", 1), ("qux/Y", 7)])
    out = rollup(ds).to_pandas().sort_values("qid").reset_index(drop=True)
    assert out.to_dict("list") == {
        "qid": ["foo/A", "qux/X", "qux/Y"],
        "mention_count": [77, 34, 7],
    }


def test_salted_rollup_equals_plain():
    rows = [(f"Q{i % 5 + 1}", i % 7 + 1) for i in range(200)]
    a = rollup(_partials(rows)).to_pandas().sort_values("qid").reset_index(drop=True)
    b = salted_rollup(_partials(rows)).to_pandas().sort_values("qid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_qrank_ordering_golden():
    # qrank_test.go:13-33: Q1:1 Q2:42 Q3:1 Q4:77 Q5:42 -> Q4,Q2,Q5,Q1,Q3
    ds = _partials([("Q1", 1), ("Q2", 42), ("Q3", 1), ("Q4", 77), ("Q5", 42)])
    out = qrank_order(rollup(ds))
    assert out["qid"].tolist() == ["Q4", "Q2", "Q5", "Q1", "Q3"]
    assert out["rank_value"].tolist() == [77, 42, 42, 1, 1]
    assert out["rank_pos"].tolist() == [1, 2, 3, 4, 5]


def test_qrank_numeric_tiebreak():
    # numeric qid order, not lexicographic: Q10 after Q2 at equal rank
    ds = _partials([("Q10", 5), ("Q2", 5)])
    out = qrank_order(rollup(ds))
    assert out["qid"].tolist() == ["Q2", "Q10"]


def test_resolve_aliases_chains_and_diamond():
    aliases = pd.DataFrame(
        {"from_qid": ["Q5", "Q4", "Q9", "Q8"], "to_qid": ["Q4", "Q2", "Q2", "Q2"]}
    )
    m = resolve_aliases(aliases)
    assert m == {"Q5": "Q2", "Q4": "Q2", "Q9": "Q2", "Q8": "Q2"}


def test_resolve_aliases_cycle_raises():
    import pytest

    aliases = pd.DataFrame({"from_qid": ["Q1", "Q2"], "to_qid": ["Q2", "Q1"]})
    with pytest.raises(ValueError):
        resolve_aliases(aliases)


def test_canonicalize_triples_selfloop_drop_and_remerge():
    # links.go:60-77 semantics: after rewrite, duplicate edges merge and
    # self-links drop. Q5->Q2, Q4->Q2: edge (Q4,Q5) becomes a self-loop.
    triples = ray.data.from_arrow(
        pa.table(
            {
                "subj": ["Q4", "Q1", "Q1"],
                "pred": ["co_occurs", "co_occurs", "co_occurs"],
                "obj": ["Q5", "Q4", "Q5"],
                "weight": pa.array([3, 2, 4], type=pa.int64()),
            }
        )
    )
    mapping = {"Q5": "Q2", "Q4": "Q2"}
    out = (
        canonicalize_triples(triples, ray.put(mapping))
        .to_pandas()
        .sort_values(["subj", "obj"])
        .reset_index(drop=True)
    )
    # (Q4,Q5)->dropped; (Q1,Q4)+(Q1,Q5)->(Q1,Q2) weight 6
    assert out.to_dict("list") == {
        "subj": ["Q1"],
        "pred": ["co_occurs"],
        "obj": ["Q2"],
        "weight": [6],
    }


def test_canonicalize_reorders_swapped_pairs():
    # rewrite can invert numeric order: (Q3, Q10) with Q3->Q20 => (Q10, Q20)
    triples = ray.data.from_arrow(
        pa.table(
            {
                "subj": ["Q3"],
                "pred": ["co_occurs"],
                "obj": ["Q10"],
                "weight": pa.array([1], type=pa.int64()),
            }
        )
    )
    out = canonicalize_triples(triples, ray.put({"Q3": "Q20"})).to_pandas()
    assert out.iloc[0]["subj"] == "Q10" and out.iloc[0]["obj"] == "Q20"


def test_rank_stats_golden():
    # stats_test.go:15-55 shape: 9 ranks, median at position 5
    df = pd.DataFrame(
        {
            "qid": [f"Q{i}" for i in range(1, 10)],
            "rank_value": [100, 90, 80, 70, 60, 50, 40, 30, 20],
            "rank_pos": list(range(1, 10)),
        }
    )
    st = rank_stats(df, top_n=3)
    assert st["entity_count"] == 9
    assert st["median"] == 60
    top = [s[1] for s in st["samples"][:3]]
    assert top == ["Q1", "Q2", "Q3"]
    assert st["samples"][-1][0] == 9  # min always kept
