"""Iterative graph algorithms over the canonical co-occurrence edges --
the genuinely non-SQL-expressible operator family (fixed-point iteration).

Weighted PageRank with two execution tiers sharing one kernel:

- driver tier: the aggregated edge list is entity-space-bounded (it is the
  OUTPUT of the canonical triple aggregation), so the power iteration runs
  as deterministic numpy matvecs on the driver;
- distributed tier: for graphs whose edge list exceeds driver memory, each
  iteration broadcasts the current rank vector (``ray.put``) and
  map_batches over the edge Dataset emits per-batch dense contribution
  partials (entity-space-sized, the mergeable-sketch pattern); the driver
  sums the (batches x |V|) partials. Proven equal to the driver tier in
  tests.

Undirected edges contribute both directions; transition probability is
weight / weighted-degree. Dangling mass (isolated vertices cannot occur
here -- every vertex has an edge) and the teleport term use the standard
damping formulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _index_edges(edges: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(src_idx, dst_idx, weight, names) for the undirected edge list,
    vertex order = sorted by numeric qid (deterministic)."""
    names = sorted(
        set(edges["subj"]) | set(edges["obj"]), key=lambda q: int(q[1:])
    )
    idx = {q: i for i, q in enumerate(names)}
    s = edges["subj"].map(idx).to_numpy(dtype=np.int64)
    o = edges["obj"].map(idx).to_numpy(dtype=np.int64)
    w = edges["weight"].to_numpy(dtype=np.float64)
    return s, o, w, np.array(names, dtype=object)


def pagerank_edges(
    edges: pd.DataFrame, damping: float = 0.85, iters: int = 20
) -> pd.DataFrame:
    """Deterministic driver-tier weighted PageRank -> (qid, pagerank)."""
    if len(edges) == 0:
        return pd.DataFrame({"qid": pd.Series([], dtype=object),
                             "pagerank": pd.Series([], dtype=np.float64)})
    s, o, w, names = _index_edges(edges)
    n = len(names)
    deg = np.zeros(n)
    np.add.at(deg, s, w)
    np.add.at(deg, o, w)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, o, r[s] / deg[s] * w)
        np.add.at(contrib, s, r[o] / deg[o] * w)
        r = (1.0 - damping) / n + damping * contrib
    return pd.DataFrame({"qid": names, "pagerank": r})


def pagerank_distributed(
    edge_ds: ray.data.Dataset,
    names: np.ndarray,
    damping: float = 0.85,
    iters: int = 20,
) -> pd.DataFrame:
    """Distributed-matvec tier: rank vector broadcast per iteration,
    per-batch dense contribution partials (|V|-sized) merged on the
    driver. Edge batches never leave the object store; data motion per
    iteration is batches x |V| doubles, independent of edge count."""
    n = len(names)
    idx = {q: i for i, q in enumerate(names)}
    idx_ref = ray.put(idx)

    def _to_idx(df: pd.DataFrame) -> pd.DataFrame:
        ix = ray.get(idx_ref)
        return pd.DataFrame(
            {
                "s": df["subj"].map(ix).astype(np.int64),
                "o": df["obj"].map(ix).astype(np.int64),
                "w": df["weight"].astype(np.float64),
            }
        )

    indexed = edge_ds.map_batches(_to_idx, batch_format="pandas").materialize()

    # weighted degree: one pass of |V|-sized partials
    def _deg(df: pd.DataFrame) -> pd.DataFrame:
        d = np.zeros(n)
        np.add.at(d, df["s"].to_numpy(), df["w"].to_numpy())
        np.add.at(d, df["o"].to_numpy(), df["w"].to_numpy())
        return pd.DataFrame({"vec": [d.tobytes()]})

    deg = np.zeros(n)
    for buf in indexed.map_batches(_deg, batch_format="pandas").to_pandas()["vec"]:
        deg += np.frombuffer(buf)
    # deg is |V|-sized like the rank vector: broadcast ONCE, not
    # closure-shipped with every task of every iteration
    deg_ref = ray.put(deg)

    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r_ref = ray.put(r)

        def _contrib(df: pd.DataFrame, r_ref=r_ref, deg_ref=deg_ref) -> pd.DataFrame:
            rv = ray.get(r_ref)
            dg = ray.get(deg_ref)
            c = np.zeros(n)
            s, o, w = df["s"].to_numpy(), df["o"].to_numpy(), df["w"].to_numpy()
            np.add.at(c, o, rv[s] / dg[s] * w)
            np.add.at(c, s, rv[o] / dg[o] * w)
            return pd.DataFrame({"vec": [c.tobytes()]})

        contrib = np.zeros(n)
        for buf in indexed.map_batches(_contrib, batch_format="pandas").to_pandas()["vec"]:
            contrib += np.frombuffer(buf)
        r = (1.0 - damping) / n + damping * contrib
    return pd.DataFrame({"qid": names, "pagerank": r})
