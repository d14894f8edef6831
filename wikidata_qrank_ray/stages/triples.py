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

    # above this many distinct entities the dense presence matrix would blow
    # memory; fall back to the pandas self-merge path
    DENSE_MAX_ENTITIES = 4096

    def __init__(self, gaz_ref, text_col: str = "text"):
        super().__init__(gaz_ref, mode="mentions", text_col=text_col)
        # stable entity column index for the dense co-occurrence counter,
        # ordered by numeric qid so column i < column j implies subj=col_i
        qids = sorted({c[0] for c in self.best.values()}, key=lambda q: int(q[1:]))
        self.ent_cols = {q: i for i, q in enumerate(qids)}
        self.ent_names = np.array(qids, dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        tokens, parent = _tokenize_with_parents(batch[self.text_col])
        qids, hit = self._lookup(tokens)
        parent = parent[hit]
        qids = qids[hit]
        if len(self.ent_cols) <= self.DENSE_MAX_ENTITIES:
            out = self._dense(batch, parent, qids)
        else:
            out = self._merge(batch, parent, qids)
        out["w"] = out["w"].astype(np.int64)
        return pa.Table.from_pandas(out, schema=TRIPLE_SCHEMA, preserve_index=False)

    def _dense(self, batch: pa.Table, parent: np.ndarray, qids: np.ndarray) -> pd.DataFrame:
        """Presence-matrix co-occurrence: pair weight = #turns where both
        entities appear = upper triangle of P^T P for the 0/1 turn x entity
        matrix. O(rows x ents) memory, one int matmul per batch -- no
        quadratic pair explosion."""
        n, e = batch.num_rows, len(self.ent_cols)
        pres = np.zeros((n, e), dtype=np.int64)
        if len(parent):
            cols = np.fromiter((self.ent_cols[q] for q in qids), dtype=np.int64, count=len(qids))
            pres[parent, cols] = 1
        co_mat = pres.T @ pres
        iu, ju = np.triu_indices(e, k=1)
        w = co_mat[iu, ju]
        nz = w > 0
        co = pd.DataFrame(
            {
                "subj": self.ent_names[iu[nz]],
                "pred": "co_occurs",
                "obj": self.ent_names[ju[nz]],
                "w": w[nz],
            }
        )
        tool = np.asarray(batch["tool"].to_numpy(zero_copy_only=False), dtype=object)
        frames = [co]
        tool_rows = np.nonzero(tool != "")[0]
        if len(tool_rows):
            tdf = pd.DataFrame(pres[tool_rows])
            tdf["tool"] = tool[tool_rows]
            per_tool = tdf.groupby("tool", sort=False).sum()
            tw = per_tool.to_numpy()
            ti, tj = np.nonzero(tw)
            frames.append(
                pd.DataFrame(
                    {
                        "subj": self.ent_names[tj],
                        "pred": "observed_via_tool",
                        "obj": per_tool.index.to_numpy()[ti],
                        "w": tw[ti, tj],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if len(frames) > 1 else co

    def _merge(self, batch: pa.Table, parent: np.ndarray, qids: np.ndarray) -> pd.DataFrame:
        """Sparse fallback for very large entity vocabularies."""
        m = pd.DataFrame({"row": parent, "qid": qids}).drop_duplicates()
        m["qn"] = m["qid"].str.slice(1).astype(np.int64)
        pairs = m.merge(m, on="row", suffixes=("_a", "_b"))
        pairs = pairs[pairs["qn_a"] < pairs["qn_b"]]
        co = pairs.groupby(["qid_a", "qid_b"], sort=False).size().reset_index(name="w")
        co = pd.DataFrame(
            {"subj": co["qid_a"], "pred": "co_occurs", "obj": co["qid_b"], "w": co["w"]}
        )
        tool = np.asarray(batch["tool"].to_numpy(zero_copy_only=False), dtype=object)
        mt = m[tool[m["row"].to_numpy()] != ""]
        if len(mt):
            mt = pd.DataFrame({"qid": mt["qid"].to_numpy(), "tool": tool[mt["row"].to_numpy()]})
            tt = mt.groupby(["qid", "tool"], sort=False).size().reset_index(name="w")
            tt = pd.DataFrame(
                {"subj": tt["qid"], "pred": "observed_via_tool", "obj": tt["tool"], "w": tt["w"]}
            )
            return pd.concat([co, tt], ignore_index=True)
        return co


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
