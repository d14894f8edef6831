"""(subj, pred, obj) triple extraction from turns.

The graph-edge analogue of the reference's pagelinks chain
(pagelinks.go:161-311 joins emitting (Qsrc,Qdst); links.go:60-77 dedups and
drops self-links). Predicates:

- ``co_occurs``: two distinct entities mentioned in the same turn, subject =
  smaller numeric qid (undirected edge canonical form); weight = number of
  turns where the pair co-occurs.
- ``observed_via_tool``: entity mentioned in a tool turn -> (qid,
  observed_via_tool, tool); weight = number of such turns.

Extraction runs inside one ``map_batches`` over turn rows (each turn is one
row, so per-turn pair generation never crosses block boundaries) and emits
per-batch partial weights -- map-side combine -- before the global
``groupby(subj,pred,obj).sum`` dedup+rollup shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .mentions import GazetteerMatcher, _tokenize_with_parents

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("w", pa.int64()),
    ]
)


class TripleExtractor(GazetteerMatcher):
    """Actor-pool stage: gazetteer automaton from __init__ (broadcast ref),
    per-batch vectorized pair generation (pandas self-merge on row id)."""

    def __init__(self, gaz_ref, text_col: str = "text"):
        super().__init__(gaz_ref, mode="mentions", text_col=text_col)

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        tokens, parent = _tokenize_with_parents(batch[self.text_col])
        qids, hit = self._lookup(tokens)
        parent = parent[hit]
        qids = qids[hit]
        m = pd.DataFrame({"row": parent, "qid": qids}).drop_duplicates()
        m["qn"] = m["qid"].str.slice(1).astype(np.int64)

        # co-occurrence pairs within a turn (vectorized self-merge)
        pairs = m.merge(m, on="row", suffixes=("_a", "_b"))
        pairs = pairs[pairs["qn_a"] < pairs["qn_b"]]
        co = (
            pairs.groupby(["qid_a", "qid_b"], sort=False).size().reset_index(name="w")
        )
        co = pd.DataFrame(
            {"subj": co["qid_a"], "pred": "co_occurs", "obj": co["qid_b"], "w": co["w"]}
        )

        # tool triples: entity observed in a tool turn
        tool = batch["tool"].to_numpy(zero_copy_only=False)
        mt = m[np.asarray(tool, dtype=object)[m["row"].to_numpy()] != ""]
        if len(mt):
            mt = pd.DataFrame(
                {"qid": mt["qid"].to_numpy(), "tool": np.asarray(tool, dtype=object)[mt["row"].to_numpy()]}
            )
            tt = mt.groupby(["qid", "tool"], sort=False).size().reset_index(name="w")
            tt = pd.DataFrame(
                {"subj": tt["qid"], "pred": "observed_via_tool", "obj": tt["tool"], "w": tt["w"]}
            )
            out = pd.concat([co, tt], ignore_index=True)
        else:
            out = co
        out["w"] = out["w"].astype(np.int64)
        return pa.Table.from_pandas(out, schema=TRIPLE_SCHEMA, preserve_index=False)


def extract_triples(
    turns: ray.data.Dataset,
    gaz_ref,
    concurrency: int = 4,
    batch_size: int = 8192,
    text_col: str = "text",
) -> ray.data.Dataset:
    """turns -> deduplicated weighted triples (subj, pred, obj, weight).

    Per-batch partials then one groupby shuffle; the groupby IS the dedup
    (links.go:60-77 semantics: duplicates collapse; self-links cannot occur
    by construction since subj_qn < obj_qn and tool names are not qids)."""
    partial = turns.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"gaz_ref": gaz_ref, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    agg = partial.groupby(["subj", "pred", "obj"]).sum("w")
    return agg.map_batches(
        lambda t: t.rename_columns(["subj", "pred", "obj", "weight"]),
        batch_format="pyarrow",
    )
