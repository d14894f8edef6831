"""Batched model inference over the embedding column -- the "model loaded
once, batch-scored" stage family (weights broadcast once; a real model
would load in an actor's __init__ and batch-infer in __call__).

The shipped model is a deterministic linear multi-head classifier whose
arithmetic is EXACT end-to-end so a SQL oracle can reproduce it
value-for-value: embeddings quantize to integers with FLOOR(x * 1000)
(floor, not round -- round-half ties differ across engines), heads are
seeded integer weight matrices, scores are int64 dot products, and the
class is the argmax with lowest-head tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

N_HEADS = 4
QUANT = 1000


def head_weights(dim: int, n_heads: int = N_HEADS, seed: int = 23) -> np.ndarray:
    """(n_heads, dim) integer weights in [-3, 3], seeded -- fixed by
    (dim, n_heads, seed) so the oracle embeds them as literals."""
    rng = np.random.RandomState(seed)
    return rng.randint(-3, 4, size=(n_heads, dim)).astype(np.int64)


def classify_embeddings(
    emb: ray.data.Dataset, dim: int = 64, n_heads: int = N_HEADS, seed: int = 23
) -> ray.data.Dataset:
    """-> (vec_id, cls, score): integer-exact linear scoring.
    score_h = sum_j floor(x_j * 1000) * W[h, j];  cls = argmax_h
    (ties -> lowest h); score = the winning head's score."""
    w = head_weights(dim, n_heads, seed)

    def _score(batch: pd.DataFrame, w=w) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(m * QUANT).astype(np.int64)
        scores = q @ w.T  # (rows, heads) int64
        cls = scores.argmax(axis=1)  # argmax returns the FIRST max -> lowest head
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy().astype(np.int64),
                "cls": cls.astype(np.int64),
                "score": scores[np.arange(len(cls)), cls].astype(np.int64),
            }
        )

    return emb.map_batches(_score, batch_format="pandas", batch_size=4096)


def classify_sql(dim: int = 64, n_heads: int = N_HEADS, seed: int = 23) -> str:
    """DuckDB twin: the same integer quantization, literal weight arrays,
    argmax with lowest-head tie-break."""
    w = head_weights(dim, n_heads, seed)
    score_exprs = []
    for h in range(n_heads):
        terms = f"[{', '.join(str(int(x)) for x in w[h])}]"
        score_exprs.append(
            f"list_sum(list_transform(list_zip(q, {terms}), "
            f"p -> p[1] * p[2])) AS s{h}"
        )
    best = "GREATEST(" + ", ".join(f"s{h}" for h in range(n_heads)) + ")"
    cls_case = " ".join(
        f"WHEN s{h} = {best} THEN {h}" for h in range(n_heads)
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS q
  FROM embeddings),
sc AS (SELECT vec_id, {", ".join(score_exprs)} FROM q)
SELECT vec_id,
       CAST(CASE {cls_case} END AS BIGINT) AS cls,
       CAST({best} AS BIGINT) AS score
FROM sc"""
