"""PageRank: analytic golden on a star graph, probability-mass invariant,
and driver-tier == distributed-tier equality."""

import numpy as np
import pandas as pd
import ray
import ray.data

from wikidata_qrank_ray.stages.graph import (
    _index_edges,
    pagerank_distributed,
    pagerank_edges,
)


def _star_edges():
    # hub Q1 connected to Q2..Q5, unit weights
    return pd.DataFrame(
        {
            "subj": ["Q1"] * 4,
            "obj": [f"Q{i}" for i in range(2, 6)],
            "weight": [1] * 4,
        }
    )


def test_pagerank_star_graph_analytic():
    """Star graph stationary point: leaves are symmetric; the hub holds
    the analytically computable share. With damping d and n=5:
    r_hub = (1-d)/n + d * sum(leaf) and each leaf = (1-d)/n + d*r_hub/4.
    Verify the fixed point is satisfied to 1e-9 after 300 iterations
    (convergence rate is d^k)."""
    d = 0.85
    pr = pagerank_edges(_star_edges(), damping=d, iters=300).set_index("qid")["pagerank"]
    leaves = [pr[f"Q{i}"] for i in range(2, 6)]
    assert np.allclose(leaves, leaves[0])
    assert np.isclose(pr["Q1"], (1 - d) / 5 + d * sum(leaves), atol=1e-9)
    assert np.isclose(leaves[0], (1 - d) / 5 + d * pr["Q1"] / 4, atol=1e-9)
    assert np.isclose(pr.sum(), 1.0, atol=1e-9)
    assert pr["Q1"] > leaves[0]


def test_pagerank_weight_sensitivity():
    # heavier edge pulls more rank toward its endpoint
    e = pd.DataFrame(
        {"subj": ["Q1", "Q1"], "obj": ["Q2", "Q3"], "weight": [10, 1]}
    )
    pr = pagerank_edges(e).set_index("qid")["pagerank"]
    assert pr["Q2"] > pr["Q3"]


def test_pagerank_distributed_equals_driver():
    rng = np.random.RandomState(4)
    n_e = 300
    edges = pd.DataFrame(
        {
            "subj": [f"Q{i}" for i in rng.randint(1, 40, n_e)],
            "obj": [f"Q{i}" for i in rng.randint(40, 80, n_e)],
            "weight": rng.randint(1, 5, n_e),
        }
    ).drop_duplicates(["subj", "obj"])
    driver = pagerank_edges(edges, iters=10).sort_values("qid").reset_index(drop=True)
    _, _, _, names = _index_edges(edges)
    dist = (
        pagerank_distributed(
            ray.data.from_pandas(edges).repartition(4), names, iters=10
        )
        .sort_values("qid")
        .reset_index(drop=True)
    )
    assert driver["qid"].tolist() == dist["qid"].tolist()
    assert np.allclose(driver["pagerank"], dist["pagerank"], rtol=0, atol=1e-12)


def test_pagerank_coshuffled_equals_driver():
    """Co-shuffled tier (rank as a Dataset, joined to edges by hash
    co-partition each round -- no |V|-sized ray.put) matches the driver
    tier up to float summation order."""
    from wikidata_qrank_ray.stages.graph import pagerank_coshuffled

    rng = np.random.RandomState(7)
    n_e = 400
    edges = pd.DataFrame(
        {
            "subj": [f"Q{i}" for i in rng.randint(1, 50, n_e)],
            "obj": [f"Q{i}" for i in rng.randint(50, 120, n_e)],
            "weight": rng.randint(1, 5, n_e),
        }
    ).drop_duplicates(["subj", "obj"])
    driver = pagerank_edges(edges, iters=8).sort_values("qid").reset_index(drop=True)
    co = (
        pagerank_coshuffled(
            ray.data.from_pandas(edges).repartition(4), iters=8,
            num_partitions=8,
        )
        .to_pandas()
        .sort_values("qid")
        .reset_index(drop=True)
    )
    assert driver["qid"].tolist() == co["qid"].tolist()
    assert np.allclose(driver["pagerank"], co["pagerank"], rtol=1e-12, atol=1e-15)
    assert np.isclose(co["pagerank"].sum(), 1.0, atol=1e-9)


# ---------------------------------------------------------------------------
# Distributed connected components
# ---------------------------------------------------------------------------

from wikidata_qrank_ray.stages.graph import connected_components


def _uf_reference(edges: pd.DataFrame) -> pd.DataFrame:
    """Driver union-find ground truth (same contract as stages/dedup.py)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edges["a"], edges["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    members = sorted({int(x) for x in edges["a"]} | {int(x) for x in edges["b"]})
    return pd.DataFrame(
        {"node": members, "rep": [find(m) for m in members]}, dtype=np.int64
    )


def _cc_df(edges: pd.DataFrame, num_partitions: int = 8) -> pd.DataFrame:
    ds = ray.data.from_pandas(edges.astype(np.int64))
    out = connected_components(ds, num_partitions=num_partitions).to_pandas()
    return (
        out.astype(np.int64)
        .sort_values("node", kind="mergesort")
        .reset_index(drop=True)[["node", "rep"]]
    )


def test_cc_random_graph_matches_union_find():
    rng = np.random.default_rng(42)
    edges = pd.DataFrame(
        {"a": rng.integers(0, 200, 300), "b": rng.integers(0, 200, 300)}
    )
    edges = edges[edges["a"] != edges["b"]].reset_index(drop=True)
    got = _cc_df(edges)
    want = _uf_reference(edges)
    pd.testing.assert_frame_equal(got, want)


def test_cc_long_chain():
    """Path graphs are the worst case for naive min-propagation; the
    star-contraction rounds must still converge to one component."""
    n = 60
    edges = pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    got = _cc_df(edges)
    assert (got["rep"] == 0).all()
    assert list(got["node"]) == list(range(n))


def test_cc_two_components_and_reversed_edges():
    edges = pd.DataFrame(
        {"a": [5, 3, 3, 20, 21], "b": [3, 4, 5, 21, 22]}
    )
    got = _cc_df(edges)
    want = _uf_reference(edges)
    pd.testing.assert_frame_equal(got, want)


def test_cc_empty():
    edges = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64)})
    out = connected_components(ray.data.from_pandas(edges))
    assert out.count() == 0
    # Dataset schema keeps the contract columns (Ray's to_pandas() drops
    # columns for 0-row datasets, so assert on the schema)
    assert out.schema().names == ["node", "rep"]


def test_cc_property_random_graphs():
    """Distributed star contraction == union-find across random graph
    shapes (sparse, supercritical, dense-small) and seeds."""
    for seed, n_nodes, n_edges in [(0, 50, 20), (1, 80, 80), (2, 30, 200), (3, 120, 60)]:
        rng = np.random.default_rng(seed)
        edges = pd.DataFrame(
            {"a": rng.integers(0, n_nodes, n_edges), "b": rng.integers(0, n_nodes, n_edges)}
        )
        edges = edges[edges["a"] != edges["b"]].reset_index(drop=True)
        if edges.empty:
            continue
        got = _cc_df(edges, num_partitions=4)
        want = _uf_reference(edges)
        pd.testing.assert_frame_equal(got, want, obj=f"seed={seed}")


# ---------------------------------------------------------------------------
# Distributed triangle counting
# ---------------------------------------------------------------------------

from wikidata_qrank_ray.stages.graph import triangle_counts


def _tri_df(edges: pd.DataFrame) -> pd.DataFrame:
    ds = ray.data.from_pandas(edges.astype(np.int64))
    return (
        triangle_counts(ds, num_partitions=4)
        .to_pandas()
        .astype(np.int64)
        .sort_values("node")
        .reset_index(drop=True)
    )


def _tri_brute(edges: pd.DataFrame) -> pd.DataFrame:
    es = {tuple(sorted((int(a), int(b)))) for a, b in zip(edges["a"], edges["b"]) if a != b}
    nodes = sorted({x for e in es for x in e})
    from itertools import combinations
    cnt = {n: 0 for n in nodes}
    for u, v, w in combinations(nodes, 3):
        if (u, v) in es and (v, w) in es and (u, w) in es:
            cnt[u] += 1; cnt[v] += 1; cnt[w] += 1
    out = pd.DataFrame(
        {"node": nodes, "triangles": [cnt[n] for n in nodes]}, dtype=np.int64
    )
    return out[out["triangles"] > 0].reset_index(drop=True)


def test_triangles_k4():
    # K4: 4 triangles total, every node in exactly 3
    from itertools import combinations
    e = pd.DataFrame(list(combinations(range(4), 2)), columns=["a", "b"])
    got = _tri_df(e)
    assert got["node"].tolist() == [0, 1, 2, 3]
    assert got["triangles"].tolist() == [3, 3, 3, 3]


def test_triangles_random_matches_bruteforce():
    rng = np.random.default_rng(5)
    e = pd.DataFrame({"a": rng.integers(0, 30, 120), "b": rng.integers(0, 30, 120)})
    e = e[e["a"] != e["b"]].reset_index(drop=True)
    got = _tri_df(e)
    want = _tri_brute(e)
    pd.testing.assert_frame_equal(got, want)


def test_triangles_triangle_free():
    # path graph has no triangles -> empty result
    e = pd.DataFrame({"a": [0, 1, 2], "b": [1, 2, 3]})
    got = triangle_counts(ray.data.from_pandas(e.astype(np.int64)), num_partitions=4)
    assert got.count() == 0


def test_pagerank_sparse_tier_equality_1m_nodes():
    """10^6-node graph through the distributed tier: per-batch partials are
    SPARSE (node, contribution) rows -- no |V|-dense buffer per batch --
    and the result equals the driver-tier power iteration."""
    from wikidata_qrank_ray.stages.graph import _index_edges

    rng = np.random.RandomState(11)
    n_nodes, n_e = 1_000_000, 1_500_000
    subj = rng.randint(1, n_nodes, n_e)
    obj = subj + 1 + rng.randint(0, 50, n_e)  # guarantees subj != obj
    edges = pd.DataFrame(
        {
            "subj": pd.Series(subj).map(lambda i: f"Q{i}"),
            "obj": pd.Series(obj).map(lambda i: f"Q{i}"),
            "weight": rng.randint(1, 4, n_e),
        }
    ).drop_duplicates(["subj", "obj"])
    driver = pagerank_edges(edges, iters=3).sort_values("qid").reset_index(drop=True)
    _, _, _, names = _index_edges(edges)
    dist = (
        pagerank_distributed(
            ray.data.from_pandas(edges).repartition(8), names, iters=3
        )
        .sort_values("qid")
        .reset_index(drop=True)
    )
    assert driver["qid"].tolist() == dist["qid"].tolist()
    assert np.allclose(driver["pagerank"], dist["pagerank"], rtol=0, atol=1e-15)


def test_pagerank_auto_tiers_agree():
    from wikidata_qrank_ray.stages.graph import pagerank_auto

    rng = np.random.RandomState(9)
    n_e = 500
    edges = pd.DataFrame(
        {
            "subj": [f"Q{i}" for i in rng.randint(1, 30, n_e)],
            "obj": [f"Q{i}" for i in rng.randint(30, 60, n_e)],
            "weight": rng.randint(1, 5, n_e),
        }
    ).drop_duplicates(["subj", "obj"])
    ds = ray.data.from_pandas(edges).repartition(4)
    small = pagerank_auto(ds, iters=8).sort_values("qid").reset_index(drop=True)
    # force the distributed tier on the same edges
    import wikidata_qrank_ray.stages.graph as G

    old = G.PAGERANK_DRIVER_MAX_EDGES
    G.PAGERANK_DRIVER_MAX_EDGES = 0
    try:
        big = pagerank_auto(ds, iters=8).sort_values("qid").reset_index(drop=True)
    finally:
        G.PAGERANK_DRIVER_MAX_EDGES = old
    assert small["qid"].tolist() == big["qid"].tolist()
    assert np.allclose(small["pagerank"], big["pagerank"], rtol=0, atol=1e-12)


def test_connected_components_auto_self_loops_ignored_in_both_tiers():
    """A node incident ONLY to a self-loop edge appears in neither tier's
    output (the distributed _canon drops (x, x); the driver tier must
    match)."""
    from wikidata_qrank_ray.stages.graph import connected_components_auto

    e = pd.DataFrame({"a": [1, 2, 9], "b": [2, 3, 9]})
    ds = ray.data.from_pandas(e)
    for cap in (1_000_000, 0):
        out = (
            connected_components_auto(ds, driver_max_edges=cap)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert list(out["node"]) == [1, 2, 3]
        assert list(out["rep"]) == [1, 1, 1]
    # all-self-loop edge set -> empty output in both tiers
    loops = ray.data.from_pandas(pd.DataFrame({"a": [4, 5], "b": [4, 5]}))
    for cap in (1_000_000, 0):
        assert connected_components_auto(loops, driver_max_edges=cap).count() == 0


def test_connected_components_auto_tiers_agree():
    from wikidata_qrank_ray.stages.graph import connected_components_auto

    rng = np.random.RandomState(3)
    e = pd.DataFrame(
        {"a": rng.randint(0, 500, 2000), "b": rng.randint(0, 500, 2000)}
    )
    e = e[e["a"] != e["b"]]
    ds = ray.data.from_pandas(e).repartition(4)
    small = (
        connected_components_auto(ds, driver_max_edges=1_000_000)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    big = (
        connected_components_auto(ds, driver_max_edges=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        small.astype(np.int64), big.astype(np.int64)
    )


def test_bfs_levels_path_graph():
    """Path graph 0-1-2-3-4-5-6: hop distances from node 0 stop at
    max_hops; disconnected node 9 never appears; undirected edges walk
    both ways from a mid-path source."""
    import pandas as pd
    import ray.data

    from wikidata_qrank_ray.stages.graph import bfs_levels

    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [0, 1, 2, 3, 4, 5, 9], "v": [1, 2, 3, 4, 5, 6, 9]})
    )
    out = (
        bfs_levels(edges, [0], max_hops=4, num_partitions=8)
        .to_pandas().set_index("node")["dist"].sort_index()
    )
    assert dict(out) == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}

    mid = (
        bfs_levels(edges, [3], max_hops=2, num_partitions=8)
        .to_pandas().set_index("node")["dist"].sort_index()
    )
    assert dict(mid) == {1: 2, 2: 1, 3: 0, 4: 1, 5: 2}


def test_bfs_levels_multi_source_min():
    """Two sources: every node takes the NEARER source's distance."""
    import pandas as pd
    import ray.data

    from wikidata_qrank_ray.stages.graph import bfs_levels

    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [0, 1, 2, 3], "v": [1, 2, 3, 4]})
    )
    out = (
        bfs_levels(edges, [0, 4], max_hops=4, num_partitions=8)
        .to_pandas().set_index("node")["dist"].sort_index()
    )
    assert dict(out) == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0}


def test_sssp_bounded_prefers_lighter_longer_path():
    """Weighted min-plus: the 2-hop path 0-1-2 (cost 2) beats the direct
    heavy edge 0-2 (cost 10); the hop bound cuts deeper paths off."""
    import pandas as pd
    import ray.data

    from wikidata_qrank_ray.stages.graph import sssp_bounded

    edges = ray.data.from_pandas(
        pd.DataFrame({"u": [0, 1, 0, 2, 3, 4],
                      "v": [1, 2, 2, 3, 4, 5],
                      "w": [1, 1, 10, 1, 1, 1]})
    )
    out = (
        sssp_bounded(edges, [0], max_hops=2, num_partitions=8)
        .to_pandas().set_index("node")["cost"].sort_index()
    )
    # node 2: lighter 2-hop 0-1-2 (2) beats direct 0-2 (10);
    # node 3: only the heavy 0-2-3 fits in 2 hops (11); deeper nodes cut off
    assert dict(out) == {0: 0, 1: 1, 2: 2, 3: 11}

    out3 = (
        sssp_bounded(edges, [0], max_hops=3, num_partitions=8)
        .to_pandas().set_index("node")["cost"].sort_index()
    )
    assert out3[3] == 3  # one more hop unlocks 0-1-2-3


def test_label_propagation_two_communities():
    """Two 5-cliques joined by one weak bridge: synchronous LPA (3 rounds,
    (weight DESC, label ASC) adoption) == a straightforward Python twin,
    and each clique converges to one community label."""
    import numpy as np
    import pandas as pd
    import ray.data

    from wikidata_qrank_ray.stages.graph import label_propagation

    edges = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j, 5))
    edges.append((4, 10, 1))  # weak bridge
    df = pd.DataFrame(edges, columns=["u", "v", "w"])

    got = dict(
        label_propagation(
            ray.data.from_pandas(df).repartition(3), n_rounds=3,
            num_partitions=4,
        ).to_pandas().set_index("node")["label"]
    )

    # python twin: same synchronous rounds
    und = {}
    for u, v, w in edges:
        und.setdefault(u, []).append((v, w))
        und.setdefault(v, []).append((u, w))
    labels = {n: n for n in und}
    for _ in range(3):
        new = {}
        for n in und:
            votes = {}
            for m, w in und[n]:
                votes[labels[m]] = votes.get(labels[m], 0) + w
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        labels = new
    assert got == labels
    # each clique is one community
    assert len({got[n] for n in range(5)}) == 1
    assert len({got[n] for n in range(10, 15)}) == 1


def test_pagerank_fixedpoint_bitwise_and_close_to_float():
    """Integer fixed-point PageRank == Python integer twin BITWISE (any
    partitioning), and within truncation bias of a float reference."""
    import numpy as np
    import pandas as pd
    import ray.data

    from wikidata_qrank_ray.stages.graph import pagerank_fixedpoint

    rng = np.random.RandomState(2)
    edges = []
    for _ in range(60):
        u, v = rng.randint(0, 20, size=2)
        if u != v:
            edges.append((u, v, int(rng.randint(1, 9))))
    df = pd.DataFrame(edges, columns=["u", "v", "w"]).drop_duplicates(["u", "v"])

    got = dict(
        pagerank_fixedpoint(
            ray.data.from_pandas(df).repartition(4), n_iters=3,
            num_partitions=4,
        ).to_pandas().set_index("node")["rank_i"]
    )
    got2 = dict(
        pagerank_fixedpoint(
            ray.data.from_pandas(df).repartition(1), n_iters=3,
            num_partitions=2,
        ).to_pandas().set_index("node")["rank_i"]
    )
    assert got == got2  # partitioning-invariant (bitwise)

    SCALE, DN, DD = 1_000_000_000, 17, 20
    und = {}
    for u, v, w in df.itertuples(index=False):
        und.setdefault(u, []).append((v, w))
        und.setdefault(v, []).append((u, w))
    wdeg = {n: sum(w for _, w in nb) for n, nb in und.items()}
    r = {n: SCALE for n in und}
    base = ((DD - DN) * SCALE) // DD
    for _ in range(3):
        inflow = {n: 0 for n in und}
        for u, nb in und.items():
            for v, w in nb:
                inflow[v] += (r[u] * w) // wdeg[u]
        r = {n: base + (DN * inflow[n]) // DD for n in und}
    assert got == r  # bitwise vs the sequential twin

    # float reference: per-node relative gap bounded by accumulated
    # truncation bias (each edge truncates < 1 unit; 3 rounds, deg <= ~20)
    rf = {n: 1.0 for n in und}
    for _ in range(3):
        inf = {n: 0.0 for n in und}
        for u, nb in und.items():
            for v, w in nb:
                inf[v] += rf[u] * w / wdeg[u]
        rf = {n: (DD - DN) / DD + DN * inf[n] / DD for n in und}
    for n in und:
        assert abs(got[n] / SCALE - rf[n]) < 1e-6


# ---------------------------------------------------------------------------
# Round-4 structural operators
# ---------------------------------------------------------------------------


def _mirror(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {"u": pd.concat([df["u"], df["v"]], ignore_index=True).to_numpy(np.int64),
         "v": pd.concat([df["v"], df["u"]], ignore_index=True).to_numpy(np.int64)}
    )


def test_two_hop_counts_path_graph():
    """Path 1-2-3-4: exact-2-hop pairs are (1,3),(2,4) both ways."""
    from wikidata_qrank_ray.stages.graph import two_hop_counts

    e = pd.DataFrame({"u": [1, 2, 3], "v": [2, 3, 4]})
    und = ray.data.from_pandas(_mirror(e)).repartition(3)
    out = two_hop_counts(und, num_partitions=4).to_pandas()
    got = dict(zip(out["a"].astype(int), out["n_two_hop"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_hop_excludes_direct_and_self():
    """Triangle 1-2-3 plus pendant 4 on 1: inside the triangle every
    2-hop target is also direct (count 0 -> absent); 4's only 2-hop
    reaches are 2 and 3."""
    from wikidata_qrank_ray.stages.graph import two_hop_counts

    e = pd.DataFrame({"u": [1, 2, 3, 1], "v": [2, 3, 1, 4]})
    und = ray.data.from_pandas(_mirror(e)).repartition(2)
    out = two_hop_counts(und, num_partitions=4).to_pandas()
    got = dict(zip(out["a"].astype(int), out["n_two_hop"].astype(int)))
    assert got == {4: 2, 2: 1, 3: 1}  # 2 and 3 reach 4 via 1


def test_neighborhood_jaccard_planted():
    """Nodes 1 and 2 share neighbors {3,4} and have no others ->
    inter=2, uni=2, jaccard 1. Node 5 attached only to 3 dilutes 3's
    set, leaving (1,2) the only pair at >= 1/3... plus pairs through
    shared neighbor 3."""
    from wikidata_qrank_ray.stages.graph import neighborhood_jaccard_pairs

    e = pd.DataFrame({"u": [1, 1, 2, 2], "v": [3, 4, 3, 4]})
    und = ray.data.from_pandas(_mirror(e).drop_duplicates()).repartition(2)
    out = neighborhood_jaccard_pairs(und, num_partitions=4).to_pandas()
    row = out[(out["a"] == 1) & (out["b"] == 2)]
    assert len(row) == 1
    assert int(row["inter"].iloc[0]) == 2 and int(row["uni"].iloc[0]) == 2
    # 3 and 4 both neighbor exactly {1,2}: inter=2, uni=2 as well
    row34 = out[(out["a"] == 3) & (out["b"] == 4)]
    assert int(row34["inter"].iloc[0]) == 2 and int(row34["uni"].iloc[0]) == 2


def test_kcore_peel_pendant_chain():
    """Triangle 1-2-3 with chain 3-4-5: k=2 peeling removes 5 (deg 1)
    then 4; the triangle survives with degree 2 each. One round only
    removes 5; three rounds reach the fixpoint."""
    from wikidata_qrank_ray.stages.graph import kcore_peel

    e = pd.DataFrame({"u": [1, 2, 3, 3, 4], "v": [2, 3, 1, 4, 5]})
    und = ray.data.from_pandas(_mirror(e)).repartition(2)
    one = kcore_peel(und, k=2, rounds=1).to_pandas()
    assert set(one["u"].astype(int)) == {1, 2, 3, 4}  # 5 peeled, 4 not yet
    out = kcore_peel(und, k=2, rounds=3).to_pandas()
    got = dict(zip(out["u"].astype(int), out["kcore_deg"].astype(int)))
    assert got == {1: 2, 2: 2, 3: 2}
