"""Iterative graph algorithms over the canonical co-occurrence edges --
the genuinely non-SQL-expressible operator family (fixed-point iteration).

Two operators:

- ``connected_components``: alternating large-star / small-star contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  over an edge Dataset -- the scale tier for clustering verified near-dup
  pairs (stages/dedup.py) and redirect chains, replacing the driver-side
  union-find when the edge set exceeds driver memory. Each round is one
  hash-partitioned shuffle keyed by node; converges in O(log^2 n) rounds;
  the driver sees only an (edge-count, checksum) scalar per round.

- weighted PageRank with two execution tiers sharing one kernel:

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
    """Distributed tier with SPARSE per-batch partials: each edge batch
    emits (node, contribution) rows only for the nodes it touches (bounded
    by 2x batch rows, NOT |V|), a hash-partitioned aggregate sums them,
    and the driver sees one |V|-row frame per iteration -- the algorithm
    state itself (rank + degree vectors, broadcast via ray.put as
    object-store reads), never batches x |V| buffers. Documented tier
    limit: the state vectors are |V|-sized in the object store and on the
    driver once per iteration; beyond that, partition the rank Dataset and
    co-shuffle edges per iteration (one more shuffle per round).

    Node ids are dense ordinals of ``names`` so the state vectors index
    directly; output matches pagerank_edges bit-for-bit up to float
    summation order (tier-equality pinned in tests/test_graph.py)."""
    from .groupby import hash_partition_aggregate

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

    def _sparse(node_arr: np.ndarray, val_arr: np.ndarray) -> pd.DataFrame:
        """Sum values per batch-local node -> sparse (node, c) rows."""
        uniq, inv = np.unique(node_arr, return_inverse=True)
        c = np.bincount(inv, weights=val_arr, minlength=len(uniq))
        return pd.DataFrame({"node": uniq.astype(np.int64), "c": c})

    # weighted degree: sparse partials + one hash-partitioned aggregate
    def _deg_part(df: pd.DataFrame) -> pd.DataFrame:
        s, o, w = df["s"].to_numpy(), df["o"].to_numpy(), df["w"].to_numpy()
        return _sparse(np.concatenate([s, o]), np.concatenate([w, w]))

    deg_df = hash_partition_aggregate(
        indexed.map_batches(_deg_part, batch_format="pandas"),
        ["node"], {"c": ("c", "sum")}, stamp_batch_size=None,
    ).to_pandas()
    deg = np.zeros(n)
    deg[deg_df["node"].to_numpy(dtype=np.int64)] = deg_df["c"].to_numpy()
    deg_ref = ray.put(deg)

    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r_ref = ray.put(r)

        def _contrib(df: pd.DataFrame, r_ref=r_ref, deg_ref=deg_ref) -> pd.DataFrame:
            rv = ray.get(r_ref)
            dg = ray.get(deg_ref)
            s, o, w = df["s"].to_numpy(), df["o"].to_numpy(), df["w"].to_numpy()
            return _sparse(
                np.concatenate([o, s]),
                np.concatenate([rv[s] / dg[s] * w, rv[o] / dg[o] * w]),
            )

        cdf = hash_partition_aggregate(
            indexed.map_batches(_contrib, batch_format="pandas"),
            ["node"], {"c": ("c", "sum")}, stamp_batch_size=None,
        ).to_pandas()
        contrib = np.zeros(n)
        contrib[cdf["node"].to_numpy(dtype=np.int64)] = cdf["c"].to_numpy()
        r = (1.0 - damping) / n + damping * contrib
    return pd.DataFrame({"qid": names, "pagerank": r})


# above this many edges the driver tier's full edge pull stops being
# "entity-space-bounded small" and the sparse distributed tier takes over
PAGERANK_DRIVER_MAX_EDGES = 200_000

# above this many NODES the broadcast tier's per-iteration |V|-sized
# ray.put / ray.get of the rank vector stops being cheap (10^9 canonical
# entities ~ 8 GB x iters broadcasts) and the co-shuffled tier takes over
PAGERANK_BROADCAST_MAX_NODES = 5_000_000


def pagerank_coshuffled(
    edge_ds: ray.data.Dataset,
    damping: float = 0.85,
    iters: int = 20,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Fully co-shuffled tier: the rank vector lives as a DATASET keyed by
    node and is hash-co-partition-joined to the edges each iteration --
    NO |V|-sized driver array and NO |V|-sized ``ray.put`` anywhere.
    Driver state per iteration: one scalar (the node count).

    Setup (once): mirror the undirected edges to directed, aggregate
    weighted degree per source, co-partition-join it back onto the edges
    so the transition normalization is folded into the edge weight
    (``wn = w / deg(u)``), and materialize the normalized directed edge
    Dataset. Per iteration: (1) the rank Dataset is tag-unioned with the
    edges and shuffled ONCE by hash(u), so each partition holds every
    edge with source u together with r(u); the partition sweep emits
    contribution partials (node=v, c=r_u*wn) pre-summed per partition;
    (2) a hash-partitioned aggregate sums partials by node and applies
    the teleport term, producing the next rank Dataset (materialized to
    bound lineage). Two shuffles per round, each moving |E|+|V| rows
    through the object store; the reference analogue is the extsort
    pipeline never holding a full table in one process (qviews.go:94-121).

    Equal to ``pagerank_edges`` up to float summation order
    (tier-equality pinned in tests/test_graph.py, incl. a 10^6-node run
    recorded in SCALING.md)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .groupby import hash_partition_aggregate, hash_partition_apply

    def _mirror(t: pa.Table) -> pa.Table:
        u = pa.chunked_array([t["subj"], t["obj"]]).combine_chunks()
        v = pa.chunked_array([t["obj"], t["subj"]]).combine_chunks()
        w = pa.chunked_array([t["weight"], t["weight"]]).combine_chunks()
        return pa.table({"u": u, "v": v, "w": pc.cast(w, pa.float64())})

    directed = edge_ds.map_batches(_mirror, batch_format="pyarrow")
    deg = hash_partition_aggregate(
        directed, ["u"], {"deg": ("w", "sum")},
        num_partitions=num_partitions, stamp_batch_size=None,
    ).materialize()
    n = deg.count()

    # fold deg into the edge weight: one co-partition join, setup-only
    def _tag_deg(t: pa.Table) -> pa.Table:
        m = t.num_rows
        return pa.table({
            "u": t["u"], "tag": pa.array(np.zeros(m, dtype=np.int8)),
            "deg": t["deg"], "v": pa.nulls(m, pa.string()),
            "w": pa.nulls(m, pa.float64()),
        })

    def _tag_edge(t: pa.Table) -> pa.Table:
        m = t.num_rows
        return pa.table({
            "u": t["u"], "tag": pa.array(np.ones(m, dtype=np.int8)),
            "deg": pa.nulls(m, pa.float64()), "v": t["v"], "w": t["w"],
        })

    tagged = deg.map_batches(_tag_deg, batch_format="pyarrow").union(
        directed.map_batches(_tag_edge, batch_format="pyarrow")
    )

    def _norm_part(df: pd.DataFrame) -> pd.DataFrame:
        eg = df[df["tag"] == 1]
        dg = df[df["tag"] == 0]
        if len(eg) == 0:
            return pd.DataFrame({"u": pd.Series([], dtype=object),
                                 "v": pd.Series([], dtype=object),
                                 "wn": pd.Series([], dtype=np.float64)})
        dmap = pd.Series(dg["deg"].to_numpy(), index=dg["u"].to_numpy())
        wn = eg["w"].to_numpy() / eg["u"].map(dmap).to_numpy(np.float64)
        return pd.DataFrame({"u": eg["u"].to_numpy(),
                             "v": eg["v"].to_numpy(), "wn": wn})

    norm = hash_partition_apply(
        tagged, ["u"], _norm_part,
        num_partitions=num_partitions, stamp_batch_size=None,
    ).materialize()

    def _rank0(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t["u"],
            "r": pa.array(np.full(t.num_rows, 1.0 / n, dtype=np.float64)),
        })

    rank = deg.map_batches(_rank0, batch_format="pyarrow").materialize()

    def _tag_rank(t: pa.Table) -> pa.Table:
        m = t.num_rows
        return pa.table({
            "u": t["u"], "tag": pa.array(np.zeros(m, dtype=np.int8)),
            "r": t["r"], "v": pa.nulls(m, pa.string()),
            "wn": pa.nulls(m, pa.float64()),
        })

    def _tag_norm(t: pa.Table) -> pa.Table:
        m = t.num_rows
        return pa.table({
            "u": t["u"], "tag": pa.array(np.ones(m, dtype=np.int8)),
            "r": pa.nulls(m, pa.float64()), "v": t["v"], "wn": t["wn"],
        })

    def _contrib_part(df: pd.DataFrame) -> pd.DataFrame:
        eg = df[df["tag"] == 1]
        rk = df[df["tag"] == 0]
        if len(eg) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype=np.float64)})
        rmap = pd.Series(rk["r"].to_numpy(), index=rk["u"].to_numpy())
        vals = eg["u"].map(rmap).to_numpy(np.float64) * eg["wn"].to_numpy()
        v = eg["v"].to_numpy()
        uniq, inv = np.unique(v, return_inverse=True)
        c = np.bincount(inv, weights=vals, minlength=len(uniq))
        return pd.DataFrame({"node": uniq, "c": c})

    norm_tagged = norm.map_batches(_tag_norm, batch_format="pyarrow").materialize()
    teleport = (1.0 - damping) / n

    def _apply_teleport(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t["node"],
            "r": pc.add(teleport, pc.multiply(damping, t["c"])),
        })

    for _ in range(iters):
        partials = hash_partition_apply(
            rank.map_batches(_tag_rank, batch_format="pyarrow").union(norm_tagged),
            ["u"], _contrib_part,
            num_partitions=num_partitions, stamp_batch_size=None,
        )
        agg = hash_partition_aggregate(
            partials, ["node"], {"c": ("c", "sum")},
            num_partitions=num_partitions, stamp_batch_size=None,
        )
        rank = agg.map_batches(
            _apply_teleport, batch_format="pyarrow"
        ).materialize()

    def _final(t: pa.Table) -> pa.Table:
        return pa.table({"qid": t["u"], "pagerank": t["r"]})

    return rank.map_batches(_final, batch_format="pyarrow")


def pagerank_auto(
    edge_ds: ray.data.Dataset, damping: float = 0.85, iters: int = 20
) -> pd.DataFrame:
    """Tier dispatch over an EDGE DATASET (subj, obj, weight) -- the edge
    set never reaches the driver in the distributed tier; the node-name
    vector (== the output's own row space) is the only |V|-sized driver
    object, derived by a distributed distinct."""
    n_edges = edge_ds.count()
    if n_edges == 0:
        return pd.DataFrame({"qid": pd.Series([], dtype=object),
                             "pagerank": pd.Series([], dtype=np.float64)})
    if n_edges <= PAGERANK_DRIVER_MAX_EDGES:
        return pagerank_edges(edge_ds.to_pandas(), damping, iters)
    from .groupby import hash_partition_aggregate

    def _nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"qid": pd.unique(np.concatenate([df["subj"].to_numpy(),
                                              df["obj"].to_numpy()]))}
        )

    nd = hash_partition_aggregate(
        edge_ds.map_batches(_nodes, batch_format="pandas"),
        ["qid"], {"n": ("qid", "count")}, stamp_batch_size=None,
    ).materialize()
    if nd.count() > PAGERANK_BROADCAST_MAX_NODES:
        # co-shuffled tier: rank never leaves the object store; the pull
        # here is only the |V|-row RESULT (at true scale call
        # pagerank_coshuffled directly and write_parquet the Dataset)
        out = pagerank_coshuffled(edge_ds, damping, iters).to_pandas()
        return out.sort_values(
            "qid", key=lambda s: s.str[1:].astype(np.int64)
        ).reset_index(drop=True)
    names = np.array(
        sorted(nd.to_pandas()["qid"].tolist(), key=lambda q: int(q[1:])),
        dtype=object,
    )
    return pagerank_distributed(edge_ds, names, damping, iters)


# ---------------------------------------------------------------------------
# Distributed connected components (alternating star contraction)
# ---------------------------------------------------------------------------


def _large_star_part(g: pd.DataFrame) -> pd.DataFrame:
    """One co-located partition of MIRRORED edges (u, v): for each node u,
    connect every neighbor v > u to m = min(neighborhood ∪ {u})."""
    gm = g.groupby("u", sort=False)["v"].transform("min").to_numpy()
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    m = np.minimum(gm, u)
    mask = v > u
    out = pd.DataFrame({"u": v[mask], "v": m[mask]})
    return out[out["u"] != out["v"]].drop_duplicates()


def _small_star_part(g: pd.DataFrame) -> pd.DataFrame:
    """One co-located partition of (hi, lo)-ORIENTED edges keyed by hi: for
    each node u, connect u and all smaller neighbors to
    m = min(neighborhood ∪ {u}) (= min smaller neighbor)."""
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    m = g.groupby("u", sort=False)["v"].transform("min").to_numpy()
    # (v, m) for each smaller neighbor, plus (u, m) once per group
    first = np.zeros(len(g), dtype=bool)
    if len(g):
        order = np.argsort(u, kind="stable")
        su = u[order]
        head = np.ones(len(su), dtype=bool)
        head[1:] = su[1:] != su[:-1]
        first[order[head]] = True
    out = pd.DataFrame(
        {
            "u": np.concatenate([v, u[first]]),
            "v": np.concatenate([m, m[first]]),
        }
    )
    return out[out["u"] != out["v"]].drop_duplicates()


def _edge_checksum(edges: ray.data.Dataset) -> tuple[int, int]:
    """(count, order-independent checksum) of the canonical (hi, lo) edge
    multiset -- per-batch partials, one small driver sum."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        hi = np.maximum(df["u"].to_numpy(), df["v"].to_numpy()).astype(np.uint64)
        lo = np.minimum(df["u"].to_numpy(), df["v"].to_numpy()).astype(np.uint64)
        mix = (hi * np.uint64(0x9E3779B97F4A7C15)) ^ (lo + np.uint64(0xD1B54A32D192ED03))
        mix ^= mix >> np.uint64(33)
        mix *= np.uint64(0xFF51AFD7ED558CCD)
        return pd.DataFrame({"n": [np.int64(len(df))], "h": [np.uint64(mix.sum())]})

    parts = edges.map_batches(_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return 0, 0
    return int(parts["n"].sum()), int(np.uint64(parts["h"].to_numpy().sum()))


# below this many edges the star-contraction rounds' fixed per-stage cost
# (one shuffle per round x ~4 rounds) dominates; driver union-find is
# output-identical (tests/test_dedup.py) and one object-store pull
CC_DRIVER_MAX_EDGES = 65536


def connected_components_auto(
    edges: ray.data.Dataset, driver_max_edges: int = CC_DRIVER_MAX_EDGES
) -> ray.data.Dataset:
    """Tier dispatch for connected components over an (a, b) edge Dataset:
    small edge sets run path-compressed union-find on the driver (the
    star-contraction fixpoint costs ~4 chained shuffles of fixed overhead
    that dwarfs toy inputs); large ones run the distributed contraction.
    Both tiers return the identical (node, rep) contract; self-loop edges
    (a == b) are ignored by BOTH tiers, so a node incident only to a
    self-loop is absent from the output."""
    # pair-set-sized in the object store; the count is then metadata and
    # the small tier's pull doesn't re-execute the upstream pair pipeline
    edges = edges.materialize()
    n = edges.count()
    if n <= driver_max_edges:
        from .dedup import _union_find_links

        if n == 0:
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "rep": pd.Series([], dtype=np.int64)})
            )
        df = edges.to_pandas()
        # drop self-loops BEFORE union-find so this tier matches the
        # distributed contraction, whose _canon filters them: a node
        # incident only to (x, x) appears in neither tier's output
        df = df[df["a"] != df["b"]]
        if df.empty:
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "rep": pd.Series([], dtype=np.int64)})
            )
        links = _union_find_links(df["a"], df["b"])
        return ray.data.from_pandas(
            links.rename(columns={"doc_id": "node", "dup_of": "rep"})
        )
    return connected_components(edges)


def connected_components(
    edges: ray.data.Dataset,
    num_partitions: int | None = None,
    max_iters: int = 50,
) -> ray.data.Dataset:
    """Undirected edge Dataset (a:int64, b:int64) -> (node, rep) for every
    node incident to an edge, rep = smallest node id in its component
    (identical contract to the driver union-find in stages/dedup.py, which
    remains the tier for edge sets that fit on the driver).

    Alternating large-star / small-star: each round is ONE
    hash-partition-by-node shuffle with a fully vectorized partition sweep;
    the edge set provably shrinks toward the star fixpoint (every node
    pointing at its component min) and nothing edge-count-scaled ever
    reaches the driver. Rounds are materialized (edge-set-sized, object
    store) so the convergence probe doesn't re-execute the chain.
    """
    from .groupby import hash_partition_apply

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"u": np.maximum(a, b), "v": np.minimum(a, b)})
        return out[out["u"] != out["v"]].drop_duplicates()

    cur = edges.map_batches(_canon, batch_format="pandas").materialize()
    state = _edge_checksum(cur)
    if state[0] == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                          "rep": pd.Series([], dtype=np.int64)})
        )
    if num_partitions is None:
        # partition width sized to the edge set (the count is free -- the
        # convergence probe already computed it): small graphs don't pay a
        # 64-way sort per round, big ones still spread
        num_partitions = int(min(64, max(4, state[0] // 4096)))
    converged = False
    for _ in range(max_iters):
        # large-star over the mirrored neighborhood
        def _mirror(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "u": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
                    "v": np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()]),
                }
            )

        mirrored = cur.map_batches(_mirror, batch_format="pandas")
        large = hash_partition_apply(
            mirrored, ["u"], _large_star_part, num_partitions, stamp_batch_size=None
        )
        # small-star over the (hi, lo) orientation (large-star emits (v, m)
        # with v > m already, so rows are canonical)
        cur = hash_partition_apply(
            large, ["u"], _small_star_part, num_partitions, stamp_batch_size=None
        ).materialize()
        new_state = _edge_checksum(cur)
        if new_state == state:
            converged = True
            break
        state = new_state
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach the star fixpoint within "
            f"{max_iters} rounds (last edge count {state[0]}); raise "
            f"max_iters -- returning partially contracted components would "
            f"be silently wrong"
        )
    # fixpoint edges are (node, rep); roots appear only as targets -> add
    # the reflexive rows and dedup (a node reached from several partitions
    # already collapsed during the star rounds)
    from .groupby import hash_partition_aggregate

    def _with_roots(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
                "rep": np.concatenate([df["v"].to_numpy(), df["v"].to_numpy()]),
            }
        )

    return hash_partition_aggregate(
        cur.map_batches(_with_roots, batch_format="pandas"),
        ["node"],
        {"rep": ("rep", "min")},
        num_partitions,
        stamp_batch_size=None,
    )


# ---------------------------------------------------------------------------
# Distributed triangle counting (node-iterator with id orientation)
# ---------------------------------------------------------------------------


def triangle_counts(
    edges: ray.data.Dataset, num_partitions: int = 64
) -> ray.data.Dataset:
    """Per-node triangle participation over an undirected edge Dataset
    (a:int64, b:int64) -> (node, triangles).

    Classic two-round MapReduce shape: orient each edge low->high, generate
    wedges (u, v, w) at each triangle's LOWEST node (one co-partitioned
    sweep keyed by u), then close them against the edge set with a second
    co-partition on (v, w) -- no joins by composite surrogate keys, no
    driver-side edge data. Wedge fan-out is O(d^2) per lowest node under id
    orientation; for adversarial degree skew orient by (degree, id) first
    (the standard arboricity bound) -- documented, not needed for the
    entity co-occurrence graphs this serves.
    """
    from .groupby import hash_partition_aggregate, hash_partition_apply

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"u": np.minimum(a, b), "v": np.maximum(a, b)})
        return out[out["u"] != out["v"]].drop_duplicates()

    canon = hash_partition_aggregate(
        edges.map_batches(_canon, batch_format="pandas"),
        ["u", "v"],
        {"n": ("u", "count")},
        num_partitions,
        stamp_batch_size=None,
    ).map_batches(lambda d: d[["u", "v"]], batch_format="pandas").materialize()

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        # all neighbor pairs above each lowest node: vectorized self-merge
        m = g.merge(g, on="u")
        m = m[m["v_x"] < m["v_y"]]
        return pd.DataFrame(
            {
                "v": m["v_x"].to_numpy(dtype=np.int64),
                "w": m["v_y"].to_numpy(dtype=np.int64),
                "u": m["u"].to_numpy(dtype=np.int64),
                "kind": np.int64(1),
            }
        )

    wedges = hash_partition_apply(
        canon, ["u"], _wedges, num_partitions, stamp_batch_size=None
    )
    edge_keys = canon.map_batches(
        lambda d: pd.DataFrame(
            {
                "v": d["u"].to_numpy(dtype=np.int64),
                "w": d["v"].to_numpy(dtype=np.int64),
                "u": np.int64(-1),
                "kind": np.int64(0),
            }
        ),
        batch_format="pandas",
    )

    def _close(g: pd.DataFrame) -> pd.DataFrame:
        present = g.loc[g["kind"] == 0, ["v", "w"]]
        tri = g.loc[g["kind"] == 1].merge(present, on=["v", "w"])
        if tri.empty:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        nodes = np.concatenate(
            [tri["u"].to_numpy(), tri["v"].to_numpy(), tri["w"].to_numpy()]
        ).astype(np.int64)
        vals, cnts = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": vals, "n": cnts.astype(np.int64)})

    partials = hash_partition_apply(
        wedges.union(edge_keys), ["v", "w"], _close, num_partitions,
        stamp_batch_size=None,
    )
    return hash_partition_aggregate(
        partials, ["node"], {"triangles": ("n", "sum")}, num_partitions,
        stamp_batch_size=None,
    )


def bfs_levels(
    edges: ray.data.Dataset,
    source_nodes: list,
    max_hops: int,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Multi-source BFS hop distances over an undirected edge Dataset with
    columns (u, v) -> (node, dist) for every node within ``max_hops`` of a
    source. The bounded-neighborhood primitive (entity context expansion,
    contamination blast radius, link-spam neighborhoods).

    Level-synchronous: each round is ONE co-partitioned join of the
    current frontier against the edge list plus one keyed min-aggregate --
    a hop costs two key-hashed shuffles and nothing node- or edge-scaled
    ever lands on the driver (the early-exit probe is a count()). Frontier
    dedup happens in the min-aggregate, so revisits die at round
    boundaries exactly like the textbook BFS invariant."""
    from .groupby import hash_partition_aggregate
    from .join import bucketed_hash_join

    def _undirect(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[["u", "v"]].rename(columns={"u": "src", "v": "dst"})
        rev = df[["v", "u"]].rename(columns={"v": "src", "u": "dst"})
        return pd.concat([fwd, rev], ignore_index=True)

    und = edges.map_batches(_undirect, batch_format="pandas").materialize()

    dist = ray.data.from_pandas(
        pd.DataFrame({"node": source_nodes, "dist": np.int64(0)})
    ).materialize()
    for k in range(max_hops):
        frontier = dist.map_batches(
            lambda df, k=k: df[df["dist"] == k][["node"]].rename(
                columns={"node": "src"}
            ),
            batch_format="pandas",
        )
        if frontier.count() == 0:
            break
        hop = bucketed_hash_join(
            frontier, und, "src", "src", num_partitions=num_partitions
        ).map_batches(
            lambda df, k=k: pd.DataFrame(
                {"node": df["dst"], "dist": np.int64(k + 1)}
            ),
            batch_format="pandas",
        )
        dist = hash_partition_aggregate(
            dist.union(hop), ["node"], {"dist": ("dist", "min")},
            num_partitions, stamp_batch_size=None,
        ).materialize()
    return dist


def sssp_bounded(
    edges: ray.data.Dataset,
    source_nodes: list,
    max_hops: int,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Bounded-hop single/multi-source WEIGHTED shortest path over an
    undirected edge Dataset (u, v, w integer cost) -> (node, cost) with
    cost = minimum total edge cost over paths of <= max_hops edges. The
    min-plus generalization of bfs_levels (Bellman-Ford rounds): each
    round relaxes every edge out of the CURRENT cost table with one
    co-partitioned join + one keyed min-aggregate, all integer-exact.

    Unlike BFS, a node's cost can improve in later rounds (a longer path
    can be cheaper), so every round relaxes from the full cost table, not
    a frontier; round count is the hop bound, shuffles stay key-hashed,
    and nothing node- or edge-scaled lands on the driver. Early exit when
    a round changes nothing ((count, sum) probe -- costs only ever
    decrease, so an unchanged aggregate pair means a fixpoint)."""
    from .groupby import hash_partition_aggregate
    from .join import bucketed_hash_join

    def _undirect(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[["u", "v", "w"]].rename(columns={"u": "src", "v": "dst"})
        rev = df[["v", "u", "w"]].rename(columns={"v": "src", "u": "dst"})
        return pd.concat([fwd, rev], ignore_index=True)

    und = edges.map_batches(_undirect, batch_format="pandas").materialize()

    cost = ray.data.from_pandas(
        pd.DataFrame({"node": source_nodes, "cost": np.int64(0)})
    ).materialize()
    probe = (cost.count(), 0)
    for _ in range(max_hops):
        relaxed = bucketed_hash_join(
            cost.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas",
            ),
            und, "src", "src", num_partitions=num_partitions,
        ).map_batches(
            lambda df: pd.DataFrame(
                {"node": df["dst"],
                 "cost": df["cost"].to_numpy(np.int64) + df["w"].to_numpy(np.int64)}
            ),
            batch_format="pandas",
        )
        cost = hash_partition_aggregate(
            cost.union(relaxed), ["node"], {"cost": ("cost", "min")},
            num_partitions, stamp_batch_size=None,
        ).materialize()
        nxt = (
            cost.count(),
            int(cost.sum("cost") or 0),
        )
        if nxt == probe:
            break
        probe = nxt
    return cost


def label_propagation(
    edges: ray.data.Dataset,
    n_rounds: int = 3,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """SYNCHRONOUS weighted label propagation (community detection) over an
    undirected edge Dataset (u, v, w integer weight) -> (node, label):
    every node starts as its own label; each round every node adopts the
    label with the highest total incident weight among its neighbors'
    CURRENT labels (ties -> smallest label). Fixed round count + the total
    (weight DESC, label ASC) order make the whole trainer deterministic
    AND SQL-expressible -- each round is one chained CTE in the oracle, so
    unlike classic async LPA this variant is value-exact-testable.

    Per round: one co-partitioned edge x label join, one (node, label)
    weight aggregate, one grouped argmax (group_topk k=1), one node-list
    left join so isolated nodes keep their own label. Nothing node- or
    edge-scaled touches the driver."""
    from .groupby import group_topk, hash_partition_aggregate
    from .join import bucketed_hash_join

    def _undirect(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[["u", "v", "w"]].rename(columns={"u": "src", "v": "dst"})
        rev = df[["v", "u", "w"]].rename(columns={"v": "src", "u": "dst"})
        return pd.concat([fwd, rev], ignore_index=True)

    und = edges.map_batches(_undirect, batch_format="pandas").materialize()
    # auto-size the shuffle width to the edge count: a 64-way exchange on a
    # toy graph is pure fixed cost, and each ROUND pays it
    num_partitions = min(num_partitions, max(2, und.count() // 10_000 + 1))
    nodes = hash_partition_aggregate(
        und.map_batches(lambda df: df[["dst"]].rename(columns={"dst": "node"}),
                        batch_format="pandas"),
        ["node"], {"one": ("node", "count")}, num_partitions,
    ).map_batches(lambda df: df[["node"]], batch_format="pandas").materialize()

    labels = nodes.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"].to_numpy(dtype=np.int64),
             "label": df["node"].to_numpy(dtype=np.int64)}
        ),
        batch_format="pandas",
    ).materialize()

    for _ in range(n_rounds):
        j = bucketed_hash_join(
            und,
            labels.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas",
            ),
            "src", "src", num_partitions=num_partitions,
        )
        votes = hash_partition_aggregate(
            j.map_batches(
                lambda df: df[["dst", "label", "w"]], batch_format="pandas"
            ),
            ["dst", "label"], {"wt": ("w", "sum")}, num_partitions,
        )
        win = group_topk(votes, ["dst"], "wt", 1, ascending=False,
                         tie_cols=["label"], num_partitions=num_partitions)
        new_labels = win.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["dst"].to_numpy(dtype=np.int64),
                 "new_label": df["label"].to_numpy(dtype=np.int64)}
            ),
            batch_format="pandas",
        )
        # isolated nodes (none in a co-occurrence graph, but the operator
        # contract allows them): keep their own id as label
        merged = bucketed_hash_join(
            new_labels, nodes, "node", "node", how="right",
            num_partitions=num_partitions,
        )
        labels = merged.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"].to_numpy(dtype=np.int64),
                 "label": df["new_label"].fillna(
                     pd.Series(df["node"].to_numpy(), index=df.index)
                 ).to_numpy(dtype=np.int64)}
            ),
            batch_format="pandas",
        ).materialize()
    return labels


def pagerank_fixedpoint(
    edges: ray.data.Dataset,
    n_iters: int = 3,
    scale: int = 1_000_000_000,
    d_num: int = 17,
    d_den: int = 20,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Fixed-point INTEGER PageRank over an undirected weighted edge
    Dataset (u, v, w) -> (node, rank_i): ranks live in units of
    1/``scale``, every per-edge contribution is the truncating integer
    division (rank(u) * w) // wdeg(u), and the damping update is
    base + (d_num * inflow) // d_den with d = d_num/d_den (default 17/20 =
    0.85) and base = ((d_den - d_num) * scale) // d_den.

    Integer arithmetic is associative, so partial sums can land in any
    order and the result is BITWISE deterministic -- which makes the
    fixed-iteration variant fully SQL-unrollable (chained CTEs), unlike
    float PageRank whose non-associative sums defeat value-exact oracles.
    The truncation bias per incoming edge is < 1 rank unit (1/scale);
    callers pick ``scale`` for the precision they need. Per iteration: one
    co-partitioned join + one keyed sum; weighted out-degree rides the
    edge rows. Nodes = edge endpoints (an isolated node has no rank mass
    to exchange and is excluded by contract)."""
    from .groupby import hash_partition_aggregate
    from .join import bucketed_hash_join

    def _undirect(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[["u", "v", "w"]].rename(columns={"u": "src", "v": "dst"})
        rev = df[["v", "u", "w"]].rename(columns={"v": "src", "u": "dst"})
        return pd.concat([fwd, rev], ignore_index=True)

    und = edges.map_batches(_undirect, batch_format="pandas").materialize()
    # same per-round fixed-cost control as label_propagation
    num_partitions = min(num_partitions, max(2, und.count() // 10_000 + 1))
    wdeg = hash_partition_aggregate(
        und.map_batches(
            lambda df: df[["src", "w"]], batch_format="pandas"
        ),
        ["src"], {"wdeg": ("w", "sum")}, num_partitions,
    )
    und_deg = bucketed_hash_join(
        und, wdeg, "src", "src", num_partitions=num_partitions
    ).materialize()

    rank = wdeg.map_batches(
        lambda df, s=scale: pd.DataFrame(
            {"node": df["src"].to_numpy(dtype=np.int64),
             "rank_i": np.full(len(df), s, dtype=np.int64)}
        ),
        batch_format="pandas",
    ).materialize()
    base = ((d_den - d_num) * scale) // d_den

    for _ in range(n_iters):
        j = bucketed_hash_join(
            und_deg,
            rank.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas",
            ),
            "src", "src", num_partitions=num_partitions,
        )
        contrib = j.map_batches(
            lambda df: pd.DataFrame(
                {"dst": df["dst"].to_numpy(dtype=np.int64),
                 "c": (df["rank_i"].to_numpy(dtype=np.int64)
                       * df["w"].to_numpy(dtype=np.int64))
                      // df["wdeg"].to_numpy(dtype=np.int64)}
            ),
            batch_format="pandas",
        )
        inflow = hash_partition_aggregate(
            contrib, ["dst"], {"inflow": ("c", "sum")}, num_partitions,
        )
        rank = inflow.map_batches(
            lambda df, b=base, dn=d_num, dd=d_den: pd.DataFrame(
                {"node": df["dst"].to_numpy(dtype=np.int64),
                 "rank_i": b + (dn * df["inflow"].to_numpy(dtype=np.int64)) // dd}
            ),
            batch_format="pandas",
        ).materialize()
    return rank


# ---------------------------------------------------------------------------
# Round-4 structural operators (two-hop reach, neighborhood Jaccard, k-core)
# ---------------------------------------------------------------------------


def two_hop_counts(und: ray.data.Dataset, num_partitions: int = 64) -> ray.data.Dataset:
    """MIRRORED edge Dataset (u, v) -> (a, n_two_hop): per node, the count
    of DISTINCT nodes exactly two hops away (via a shared neighbor, not a
    direct neighbor, not self). Composition: bucketed self-join on the
    middle node, pair-key co-partitioned anti-join against the direct
    edges (tag-union, one shuffle), hash-partitioned final count. Nothing
    graph-scaled on the driver."""
    from .groupby import hash_partition_aggregate, hash_partition_apply
    from .join import bucketed_hash_join

    left = und.map_batches(
        lambda df: pd.DataFrame({"a": df["u"], "x": df["v"]}),
        batch_format="pandas")
    right = und.map_batches(
        lambda df: pd.DataFrame({"x2": df["u"], "b": df["v"]}),
        batch_format="pandas")
    two = bucketed_hash_join(left, right, "x", "x2",
                             num_partitions=num_partitions).map_batches(
        lambda df: df[df["a"] != df["b"]][["a", "b"]],
        batch_format="pandas")

    direct = und.map_batches(
        lambda df: pd.DataFrame({"a": df["u"], "b": df["v"],
                                 "tag": np.zeros(len(df), dtype=np.int8)}),
        batch_format="pandas")
    cand = two.map_batches(
        lambda df: pd.DataFrame({"a": df["a"], "b": df["b"],
                                 "tag": np.ones(len(df), dtype=np.int8)}),
        batch_format="pandas")

    def _anti(part: pd.DataFrame) -> pd.DataFrame:
        d = part[part["tag"] == 0][["a", "b"]].drop_duplicates()
        t = part[part["tag"] == 1][["a", "b"]].drop_duplicates()
        m = t.merge(d, on=["a", "b"], how="left", indicator=True)
        return m[m["_merge"] == "left_only"][["a", "b"]]

    pairs = hash_partition_apply(
        direct.union(cand), ["a", "b"], _anti,
        num_partitions=num_partitions, stamp_batch_size=None,
    )
    return hash_partition_aggregate(
        pairs, ["a"], {"n_two_hop": ("b", "count")},
        num_partitions=num_partitions, stamp_batch_size=None,
    )


def neighborhood_jaccard_pairs(
    und: ray.data.Dataset,
    num_threshold: int = 1,
    den_threshold: int = 3,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """MIRRORED DISTINCT edge Dataset (u, v) -> unordered pairs (a < b)
    whose neighbor sets overlap with Jaccard >= num/den (integer
    cross-multiplied: den*inter >= num*(deg_a+deg_b-inter)) ->
    (a, b, inter, uni). Pair generation co-partitions on the SHARED
    NEIGHBOR (the shingle-join pattern from stages/dedup.py); degrees are
    a node-space-bounded broadcast lookup."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    deg_df = hash_partition_aggregate(
        und, ["u"], {"deg": ("v", "count")},
        num_partitions=num_partitions, stamp_batch_size=None,
    ).to_pandas()
    deg_map = dict(zip(deg_df.get("u", pd.Series(dtype=np.int64)).astype(np.int64),
                       deg_df.get("deg", pd.Series(dtype=np.int64)).astype(np.int64)))
    deg_ref = ray.put(deg_map)

    def _pairs(part: pd.DataFrame) -> pd.DataFrame:
        srt = part.sort_values(["u", "v"], kind="mergesort")
        u = srt["u"].to_numpy(np.int64)
        v = srt["v"].to_numpy(np.int64)
        # vectorized within-group pair explosion: for each group of size
        # g, emit all C(g,2) ordered index pairs via offset arithmetic
        outs = []
        starts = np.concatenate([[0], np.where(u[1:] != u[:-1])[0] + 1, [len(u)]])
        for s0, s1 in zip(starts[:-1], starts[1:]):
            g = s1 - s0
            if g < 2:
                continue
            ii, jj = np.triu_indices(g, k=1)
            outs.append(pd.DataFrame({"a": v[s0 + ii], "b": v[s0 + jj]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    shared = hash_partition_apply(
        und, ["u"], _pairs, num_partitions=num_partitions,
        stamp_batch_size=None,
    )
    inter = hash_partition_aggregate(
        shared, ["a", "b"], {"inter": ("a", "count")},
        num_partitions=num_partitions, stamp_batch_size=None,
    )

    def _jac(df: pd.DataFrame, deg_ref=deg_ref, num=num_threshold,
             den=den_threshold) -> pd.DataFrame:
        dm = ray.get(deg_ref)
        da = df["a"].map(dm).to_numpy(np.int64)
        db = df["b"].map(dm).to_numpy(np.int64)
        it = df["inter"].to_numpy(np.int64)
        uni = da + db - it
        keep = den * it >= num * uni
        return pd.DataFrame({"a": df["a"].to_numpy(np.int64)[keep],
                             "b": df["b"].to_numpy(np.int64)[keep],
                             "inter": it[keep], "uni": uni[keep]})

    return inter.map_batches(_jac, batch_format="pandas")


def _link_prediction_kernel(
    und: ray.data.Dataset, num_partitions: int = 64
) -> ray.data.Dataset:
    """Shared link-prediction kernel on a MIRRORED DISTINCT edge Dataset
    (u, v): for every NON-adjacent unordered pair (a < b) with at least
    one shared neighbor -> (a, b, cn, ra_micro, pa) carrying all three
    classic integer scores at once -- cn = |N(a) ∩ N(b)|,
    ra_micro = sum over shared neighbors z of 1e6 // deg(z)
    (resource allocation, Zhou/Lu/Zhang 2009: the integer-exact cousin of
    Adamic-Adar), pa = deg(a) * deg(b) (preferential attachment). Shape:
    candidate pairs co-partition on the SHARED NEIGHBOR (the shingle-join
    pattern) with the middle node's inverse-degree weight attached at
    generation time, adjacency is removed with a tag-union anti-join
    co-partitioned on the pair key (the two_hop_counts pattern), degrees
    are a node-space-bounded broadcast lookup. Nothing edge- or
    pair-scaled ever reaches the driver. Public selections:
    link_prediction_cn (cn, pa) and link_prediction_ra (cn, ra_micro)."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    deg_df = hash_partition_aggregate(
        und, ["u"], {"deg": ("v", "count")},
        num_partitions=num_partitions, stamp_batch_size=None,
    ).to_pandas()
    deg_map = dict(zip(deg_df.get("u", pd.Series(dtype=np.int64)).astype(np.int64),
                       deg_df.get("deg", pd.Series(dtype=np.int64)).astype(np.int64)))
    deg_ref = ray.put(deg_map)

    def _pairs(part: pd.DataFrame, deg_ref=deg_ref) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64),
                              "w": pd.Series(dtype=np.int64)})
        if len(part) == 0:
            return empty
        dm = ray.get(deg_ref)
        srt = part.sort_values(["u", "v"], kind="mergesort")
        u = srt["u"].to_numpy(np.int64)
        v = srt["v"].to_numpy(np.int64)
        w_mid = 1_000_000 // srt["u"].map(dm).to_numpy(np.int64)
        outs = []
        starts = np.concatenate([[0], np.where(u[1:] != u[:-1])[0] + 1,
                                 [len(u)]])
        for s0, s1 in zip(starts[:-1], starts[1:]):
            g = s1 - s0
            if g < 2:
                continue
            ii, jj = np.triu_indices(g, k=1)
            outs.append(pd.DataFrame({
                "a": v[s0 + ii], "b": v[s0 + jj],
                "w": np.full(len(ii), w_mid[s0], dtype=np.int64)}))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    shared = hash_partition_apply(
        und, ["u"], _pairs, num_partitions=num_partitions,
        stamp_batch_size=None,
    )
    inter = hash_partition_aggregate(
        shared, ["a", "b"],
        {"cn": ("w", "count"), "ra_micro": ("w", "sum")},
        num_partitions=num_partitions, stamp_batch_size=None,
    )

    # anti-join against the (a < b)-oriented edge set: tag union
    # co-partitioned on the pair key, direct edges win
    direct = und.map_batches(
        lambda df: pd.DataFrame(
            {"a": np.minimum(df["u"], df["v"]).astype(np.int64),
             "b": np.maximum(df["u"], df["v"]).astype(np.int64),
             "cn": np.zeros(len(df), dtype=np.int64),
             "ra_micro": np.zeros(len(df), dtype=np.int64),
             "tag": np.zeros(len(df), dtype=np.int8)}),
        batch_format="pandas")
    cand = inter.map_batches(
        lambda df: pd.DataFrame(
            {"a": df["a"].to_numpy(np.int64),
             "b": df["b"].to_numpy(np.int64),
             "cn": df["cn"].to_numpy(np.int64),
             "ra_micro": df["ra_micro"].to_numpy(np.int64),
             "tag": np.ones(len(df), dtype=np.int8)}),
        batch_format="pandas")

    def _anti(part: pd.DataFrame, deg_ref=deg_ref) -> pd.DataFrame:
        d = part[part["tag"] == 0][["a", "b"]].drop_duplicates()
        t = part[part["tag"] == 1][["a", "b", "cn", "ra_micro"]]
        m = t.merge(d, on=["a", "b"], how="left", indicator=True)
        m = m[m["_merge"] == "left_only"]
        if m.empty:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "cn": pd.Series(dtype=np.int64),
                                 "ra_micro": pd.Series(dtype=np.int64),
                                 "pa": pd.Series(dtype=np.int64)})
        dm = ray.get(deg_ref)
        da = m["a"].map(dm).to_numpy(np.int64)
        db = m["b"].map(dm).to_numpy(np.int64)
        return pd.DataFrame({"a": m["a"].to_numpy(np.int64),
                             "b": m["b"].to_numpy(np.int64),
                             "cn": m["cn"].to_numpy(np.int64),
                             "ra_micro": m["ra_micro"].to_numpy(np.int64),
                             "pa": da * db})

    return hash_partition_apply(
        direct.union(cand), ["a", "b"], _anti,
        num_partitions=num_partitions, stamp_batch_size=None,
    )


def link_prediction_cn(
    und: ray.data.Dataset, num_partitions: int = 64
) -> ray.data.Dataset:
    """Common-neighbor link prediction -> (a, b, cn, pa); the (cn, pa)
    selection of _link_prediction_kernel (one shared implementation for
    both scoring families)."""
    return _link_prediction_kernel(und, num_partitions).map_batches(
        lambda df: df[["a", "b", "cn", "pa"]], batch_format="pandas")


def link_prediction_ra(
    und: ray.data.Dataset, num_partitions: int = 64
) -> ray.data.Dataset:
    """Resource-allocation link prediction -> (a, b, cn, ra_micro); the
    (cn, ra_micro) selection of _link_prediction_kernel."""
    return _link_prediction_kernel(und, num_partitions).map_batches(
        lambda df: df[["a", "b", "cn", "ra_micro"]], batch_format="pandas")


def kcore_peel(
    und: ray.data.Dataset, k: int = 2, rounds: int = 3,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Fixed-round k-core peeling on a MIRRORED edge Dataset (u, v): each
    round drops nodes with degree < k and restricts the edges to
    survivors; returns (u, kcore_deg) for every node still present after
    ``rounds`` rounds. Degrees via the hash-partitioned aggregate; the
    survivor node set is node-space-bounded and broadcast per round
    (beyond ~10^8 nodes the filter becomes a co-partition semi-join --
    stages/join.py machinery; documented tier). Fixed round count keeps
    it SQL-unrollable (the LPA precedent)."""
    from .groupby import hash_partition_aggregate

    for _ in range(rounds):
        deg = hash_partition_aggregate(
            und, ["u"], {"deg": ("v", "count")},
            num_partitions=num_partitions, stamp_batch_size=None,
        ).to_pandas()
        if len(deg) == 0:
            break
        surv = set(deg[deg["deg"] >= k]["u"].astype(np.int64))
        surv_ref = ray.put(surv)

        def _filt(df: pd.DataFrame, surv_ref=surv_ref) -> pd.DataFrame:
            s = ray.get(surv_ref)
            keep = df["u"].isin(s).to_numpy() & df["v"].isin(s).to_numpy()
            return df[keep]

        und = und.map_batches(_filt, batch_format="pandas").materialize()
    return hash_partition_aggregate(
        und, ["u"], {"kcore_deg": ("v", "count")},
        num_partitions=num_partitions, stamp_batch_size=None,
    )


def ppr_fixedpoint(
    edges: ray.data.Dataset,
    seed_node: int,
    n_iters: int = 3,
    scale: int = 1_000_000_000,
    d_num: int = 17,
    d_den: int = 20,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Personalized fixed-point INTEGER PageRank: identical arithmetic to
    ``pagerank_fixedpoint`` (truncating integer contributions -> bitwise
    deterministic, SQL-unrollable) except ALL teleport mass returns to
    ``seed_node``: r0 = scale at the seed / 0 elsewhere, and the damping
    base ((d_den-d_num)*scale)//d_den is added at the seed only. The
    personalized-retrieval primitive (seed-anchored relevance) of a KG
    feature pipeline. -> (node, rank_i)."""
    from .groupby import hash_partition_aggregate
    from .join import bucketed_hash_join

    def _undirect(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df[["u", "v", "w"]].rename(columns={"u": "src", "v": "dst"})
        rev = df[["v", "u", "w"]].rename(columns={"v": "src", "u": "dst"})
        return pd.concat([fwd, rev], ignore_index=True)

    und = edges.map_batches(_undirect, batch_format="pandas").materialize()
    num_partitions = min(num_partitions, max(2, und.count() // 10_000 + 1))
    wdeg = hash_partition_aggregate(
        und.map_batches(lambda df: df[["src", "w"]], batch_format="pandas"),
        ["src"], {"wdeg": ("w", "sum")}, num_partitions,
    )
    und_deg = bucketed_hash_join(
        und, wdeg, "src", "src", num_partitions=num_partitions
    ).materialize()

    rank = wdeg.map_batches(
        lambda df, s=scale, sd=seed_node: pd.DataFrame(
            {"node": df["src"].to_numpy(dtype=np.int64),
             "rank_i": np.where(df["src"].to_numpy(np.int64) == sd, s, 0
                                ).astype(np.int64)}),
        batch_format="pandas",
    ).materialize()
    base = ((d_den - d_num) * scale) // d_den

    for _ in range(n_iters):
        j = bucketed_hash_join(
            und_deg,
            rank.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas",
            ),
            "src", "src", num_partitions=num_partitions,
        )
        contrib = j.map_batches(
            lambda df: pd.DataFrame(
                {"dst": df["dst"].to_numpy(dtype=np.int64),
                 "c": (df["rank_i"].to_numpy(dtype=np.int64)
                       * df["w"].to_numpy(dtype=np.int64))
                      // df["wdeg"].to_numpy(dtype=np.int64)}),
            batch_format="pandas",
        )
        inflow = hash_partition_aggregate(
            contrib, ["dst"], {"inflow": ("c", "sum")}, num_partitions,
        )
        rank = inflow.map_batches(
            lambda df, b=base, dn=d_num, dd=d_den, sd=seed_node: pd.DataFrame(
                {"node": df["dst"].to_numpy(dtype=np.int64),
                 "rank_i": np.where(df["dst"].to_numpy(np.int64) == sd, b, 0)
                 + (dn * df["inflow"].to_numpy(dtype=np.int64)) // dd}),
            batch_format="pandas",
        ).materialize()
    return rank


def deterministic_walks(
    und: ray.data.Dataset, num_partitions: int = 64
) -> ray.data.Dataset:
    """Deterministic 2-step 'random' walks from EVERY node over a MIRRORED
    DISTINCT edge Dataset (u, v) -- node2vec-style positive-pair sampling
    with NO RNG: step s from current node picks the k-th neighbor in
    (v asc) order where k = polyhash64('<start>|<s>') mod degree, so the
    walk is a pure function of the graph and SQL-replayable (the
    edge_negatives hash idiom). -> (start, hop1, hop2). Step 1 is pure
    map-side (the pick predicate evaluates per neighbor row); step 2 is
    one bucketed join on the hop-1 node."""
    from ..functions.hashing import polyhash64
    from .groupby import hash_partition_apply
    from .join import bucketed_hash_join

    def _rank_nb(part: pd.DataFrame) -> pd.DataFrame:
        srt = part.sort_values(["u", "v"], kind="mergesort")
        idx = srt.groupby("u", sort=False).cumcount().to_numpy(np.int64)
        deg = srt.groupby("u", sort=False)["v"].transform("size").to_numpy(np.int64)
        return pd.DataFrame({"u": srt["u"].to_numpy(np.int64),
                             "v": srt["v"].to_numpy(np.int64),
                             "idx": idx, "deg": deg})

    nb = hash_partition_apply(
        und, ["u"], _rank_nb, num_partitions=num_partitions,
        stamp_batch_size=None,
    ).materialize()

    def _step1(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"start": pd.Series(dtype=np.int64),
                                 "hop1": pd.Series(dtype=np.int64)})
        keys = (df["u"].astype(np.int64).astype(str) + "|1").to_numpy(dtype=object)
        k = (polyhash64(keys) % df["deg"].to_numpy(np.uint64)).astype(np.int64)
        keep = df["idx"].to_numpy(np.int64) == k
        return pd.DataFrame({"start": df["u"].to_numpy(np.int64)[keep],
                             "hop1": df["v"].to_numpy(np.int64)[keep]})

    s1 = nb.map_batches(_step1, batch_format="pandas")
    j = bucketed_hash_join(
        s1.map_batches(lambda df: df.rename(columns={"hop1": "nbu"}),
                       batch_format="pandas"),
        nb.map_batches(lambda df: df.rename(columns={"u": "nbu2"}),
                       batch_format="pandas"),
        "nbu", "nbu2", num_partitions=num_partitions,
    )

    def _step2(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"start": pd.Series(dtype=np.int64),
                                 "hop1": pd.Series(dtype=np.int64),
                                 "hop2": pd.Series(dtype=np.int64)})
        keys = (df["start"].astype(np.int64).astype(str) + "|2").to_numpy(dtype=object)
        k = (polyhash64(keys) % df["deg"].to_numpy(np.uint64)).astype(np.int64)
        keep = df["idx"].to_numpy(np.int64) == k
        return pd.DataFrame({"start": df["start"].to_numpy(np.int64)[keep],
                             "hop1": df["nbu"].to_numpy(np.int64)[keep],
                             "hop2": df["v"].to_numpy(np.int64)[keep]})

    return j.map_batches(_step2, batch_format="pandas")


def transitive_closure(
    edges: ray.data.Dataset,
    num_partitions: int = 32,
    max_rounds: int = 20,
) -> ray.data.Dataset:
    """Ancestor closure of a FOREST (each node has at most one parent) by
    pointer doubling: round k composes the closure with itself, so covered
    path length doubles per round and a depth-D hierarchy closes in
    ceil(log2 D) shuffle rounds -- the distributed analogue of the
    reference's redirect-chain resolution (titles.go:394-483), generalized
    from the fixed two-level alias chain to arbitrary-depth is-a taxonomies.

    ``edges``: Dataset with int64 columns (child, anc) -- the depth-1
    parent links. Returns (child, anc, depth) for EVERY ancestor pair.
    In a forest each (child, anc) pair has exactly one path, so the
    composition step can only regenerate a pair at its unique depth
    (split as s + (t - s) for every s the doubling has materialized);
    the per-round distinct collapses those duplicates exactly.

    Scale shape: each round is one co-partitioned hash join plus one
    distinct aggregate -- closure size is O(V * depth), never driver-held;
    the convergence probe pulls only the row COUNT."""
    from .groupby import hash_partition_aggregate
    from .join import bucketed_hash_join

    def _base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "child": df["child"].to_numpy(np.int64),
            "anc": df["anc"].to_numpy(np.int64),
            "depth": np.ones(len(df), dtype=np.int64)})

    closure = edges.map_batches(_base, batch_format="pandas").materialize()
    n_prev = closure.count()
    for _ in range(max_rounds):
        lhs = closure.map_batches(
            lambda df: pd.DataFrame({"mid": df["anc"].to_numpy(np.int64),
                                     "child": df["child"].to_numpy(np.int64),
                                     "d1": df["depth"].to_numpy(np.int64)}),
            batch_format="pandas")
        rhs = closure.map_batches(
            lambda df: pd.DataFrame({"mid": df["child"].to_numpy(np.int64),
                                     "anc2": df["anc"].to_numpy(np.int64),
                                     "d2": df["depth"].to_numpy(np.int64)}),
            batch_format="pandas")
        composed = bucketed_hash_join(
            lhs, rhs, "mid", "mid", num_partitions=num_partitions,
        ).map_batches(
            lambda df: pd.DataFrame({
                "child": df["child"].to_numpy(np.int64),
                "anc": df["anc2"].to_numpy(np.int64),
                "depth": df["d1"].to_numpy(np.int64)
                         + df["d2"].to_numpy(np.int64)})
            if len(df) else pd.DataFrame({
                "child": pd.Series(dtype=np.int64),
                "anc": pd.Series(dtype=np.int64),
                "depth": pd.Series(dtype=np.int64)}),
            batch_format="pandas")
        merged = hash_partition_aggregate(
            closure.union(composed), ["child", "anc", "depth"],
            {"n": ("depth", "count")}, num_partitions=num_partitions,
            stamp_batch_size=None,
        ).map_batches(
            lambda df: df[["child", "anc", "depth"]].astype(np.int64)
            if len(df) else pd.DataFrame({
                "child": pd.Series(dtype=np.int64),
                "anc": pd.Series(dtype=np.int64),
                "depth": pd.Series(dtype=np.int64)}),
            batch_format="pandas").materialize()
        n_now = merged.count()
        closure = merged
        if n_now == n_prev:
            break
        n_prev = n_now
    return closure
