"""Property tests for the round-4 kernels: each distributed operator is
pinned against a single-process brute-force twin on random graphs/corpora
(the kmeans/BPE twin precedent)."""

import numpy as np
import pandas as pd
import ray.data

from wikidata_qrank_ray.stages.graph import (
    deterministic_walks,
    kcore_peel,
    neighborhood_jaccard_pairs,
    ppr_fixedpoint,
    two_hop_counts,
)


def _rand_graph(seed: int, n_nodes: int = 30, n_edges: int = 60) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    e = pd.DataFrame({"u": rng.randint(0, n_nodes, n_edges),
                      "v": rng.randint(0, n_nodes, n_edges)})
    e = e[e["u"] != e["v"]].drop_duplicates()
    # undirected-unique: keep one orientation
    lo = np.minimum(e["u"], e["v"])
    hi = np.maximum(e["u"], e["v"])
    return pd.DataFrame({"u": lo, "v": hi}).drop_duplicates().astype(np.int64)


def _mirror(e: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {"u": np.concatenate([e["u"], e["v"]]),
         "v": np.concatenate([e["v"], e["u"]])}).astype(np.int64)


def _adj(e: pd.DataFrame) -> dict:
    adj: dict = {}
    for u, v in e.itertuples(index=False):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def test_two_hop_counts_random_graphs():
    for seed in (1, 2, 3):
        e = _rand_graph(seed)
        adj = _adj(e)
        want = {}
        for s, nbrs in adj.items():
            two = set()
            for x in nbrs:
                two |= adj[x]
            two -= nbrs
            two.discard(s)
            if two:
                want[s] = len(two)
        und = ray.data.from_pandas(_mirror(e)).repartition(3)
        out = two_hop_counts(und, num_partitions=4).to_pandas()
        got = dict(zip(out["a"].astype(int), out["n_two_hop"].astype(int)))
        assert got == want


def test_kcore_peel_random_graphs_fixpoint():
    """With enough rounds the fixed-round peel reaches the true 2-core
    (classic iterative deletion twin)."""
    for seed in (4, 5):
        e = _rand_graph(seed)
        adj = {k: set(v) for k, v in _adj(e).items()}
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < 2:
                    for m in adj[n]:
                        adj[m].discard(n)
                    del adj[n]
                    changed = True
        want = {n: len(v) for n, v in adj.items()}
        und = ray.data.from_pandas(_mirror(e)).repartition(3)
        out = kcore_peel(und, k=2, rounds=40).to_pandas()
        got = dict(zip(out["u"].astype(int), out["kcore_deg"].astype(int)))
        assert got == want


def test_neighborhood_jaccard_random_graphs():
    for seed in (6, 7):
        e = _rand_graph(seed)
        adj = _adj(e)
        nodes = sorted(adj)
        want = {}
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                it = len(adj[a] & adj[b])
                uni = len(adj[a] | adj[b])
                if it and 3 * it >= uni:
                    want[(a, b)] = (it, uni)
        und = ray.data.from_pandas(_mirror(e).drop_duplicates()).repartition(3)
        out = neighborhood_jaccard_pairs(und, num_partitions=4).to_pandas()
        got = {(int(r.a), int(r.b)): (int(r.inter), int(r.uni))
               for r in out.itertuples(index=False)}
        # the kernel counts union via deg_a + deg_b - inter over the
        # MIRRORED DISTINCT edge list == set sizes
        assert got == want


def test_deterministic_walks_twin_and_reshard():
    from wikidata_qrank_ray.functions.hashing import polyhash64

    e = _rand_graph(8)
    adj = _adj(e)
    want = {}
    for s in sorted(adj):
        nb1 = sorted(adj[s])
        # NB: int(...) BEFORE %: a numpy uint64 SCALAR % python int
        # promotes to float64 and corrupts the low bits
        k1 = int(polyhash64(np.array([f"{s}|1"], dtype=object))[0]) % len(nb1)
        h1 = nb1[k1]
        nb2 = sorted(adj[h1])
        k2 = int(polyhash64(np.array([f"{s}|2"], dtype=object))[0]) % len(nb2)
        want[s] = (h1, nb2[k2])
    for parts in (2, 5):
        und = ray.data.from_pandas(_mirror(e)).repartition(parts)
        out = deterministic_walks(und, num_partitions=4).to_pandas()
        got = {int(r.start): (int(r.hop1), int(r.hop2))
               for r in out.itertuples(index=False)}
        assert got == want  # one walk per node, reshard-invariant


def test_ppr_fixedpoint_twin():
    """Distributed personalized PageRank == single-process integer twin."""
    rng = np.random.RandomState(9)
    e = _rand_graph(9)
    e = e.assign(w=rng.randint(1, 5, len(e)).astype(np.int64))
    seed_node = int(e["u"].iloc[0])
    scale, dn, dd = 1_000_000_000, 17, 20
    # twin
    und = pd.DataFrame({
        "src": np.concatenate([e["u"], e["v"]]),
        "dst": np.concatenate([e["v"], e["u"]]),
        "w": np.concatenate([e["w"], e["w"]])}).astype(np.int64)
    wdeg = und.groupby("src")["w"].sum()
    rank = {n: (scale if n == seed_node else 0) for n in wdeg.index}
    base = ((dd - dn) * scale) // dd
    for _ in range(3):
        inflow: dict = {}
        for s, d, w in und.itertuples(index=False):
            inflow[d] = inflow.get(d, 0) + (rank[s] * w) // wdeg[s]
        rank = {n: (base if n == seed_node else 0) + (dn * c) // dd
                for n, c in inflow.items()}
    ds = ray.data.from_pandas(e).repartition(3)
    out = ppr_fixedpoint(ds, seed_node, n_iters=3).to_pandas()
    got = dict(zip(out["node"].astype(int), out["rank_i"].astype(int)))
    assert got == rank
