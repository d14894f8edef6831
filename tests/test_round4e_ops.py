"""Round-4e operators: taxonomy closure / hierarchical rollup / triple
temporal qualifiers -- brute-force single-process twins plus a long-chain
doubling check the tiny gazetteer forest (depth <= 5) cannot exercise."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from wikidata_qrank_ray.functions.tokenize import py_tokens

SF = "/root/testdata/sf0.001"


def _closure_bruteforce(parent: dict[int, int]) -> set[tuple[int, int, int]]:
    out = set()
    for c in parent:
        cur, d = c, 0
        while cur in parent:
            cur = parent[cur]
            d += 1
            out.add((c, cur, d))
    return out


def test_transitive_closure_matches_bruteforce_forest():
    from wikidata_qrank_ray.stages.graph import transitive_closure

    # irregular forest: two trees, varying branch factors
    parent = {2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 6, 8: 7, 9: 7,
              11: 10, 12: 11, 13: 12}
    edges = ray.data.from_pandas(pd.DataFrame({
        "child": list(parent), "anc": [parent[c] for c in parent]}))
    got = transitive_closure(edges, num_partitions=4)
    got_set = set(map(tuple, got.to_pandas()[["child", "anc", "depth"]]
                      .astype(np.int64).itertuples(index=False)))
    assert got_set == _closure_bruteforce(parent)


def test_transitive_closure_long_chain_doubles():
    """A depth-40 chain closes in ceil(log2 40) = 6 doubling rounds; the
    closure of a length-n chain has n*(n+1)/2 pairs."""
    from wikidata_qrank_ray.stages.graph import transitive_closure

    n = 40
    edges = ray.data.from_pandas(pd.DataFrame({
        "child": np.arange(1, n + 1, dtype=np.int64),
        "anc": np.arange(0, n, dtype=np.int64)}))
    got = transitive_closure(edges, num_partitions=4).to_pandas()
    assert len(got) == n * (n + 1) // 2
    # deepest pair: node n reaches root 0 at depth n
    deep = got[(got["child"] == n) & (got["anc"] == 0)]
    assert list(deep["depth"]) == [n]


def test_taxonomy_closure_query_is_forest_chain():
    from wikidata_qrank_ray.pipelines.queries import q_taxonomy_closure
    from wikidata_qrank_ray.sources.gazetteer import build_gazetteer

    n = len(build_gazetteer(SF))
    got = q_taxonomy_closure(SF).to_pandas()
    parent = {c: c // 2 for c in range(2, n + 1)}
    want = _closure_bruteforce(parent)
    got_set = {(int(r.desc_qid[1:]), int(r.anc_qid[1:]), int(r.depth))
               for r in got.itertuples(index=False)}
    assert got_set == want


def test_taxonomy_rollup_subtree_sums():
    from wikidata_qrank_ray.pipelines.queries import (
        q_entity_rank, q_taxonomy_rollup)

    own = q_entity_rank(SF).to_pandas()
    own_map = {int(q[1:]): int(c) for q, c in
               zip(own["qid"], own["mention_count"])}
    got = q_taxonomy_rollup(SF).to_pandas()
    assert len(got) == len(own_map)
    for r in got.itertuples(index=False):
        node = int(r.qid[1:])
        # descendants of `node` under parent=n//2: all m whose halving
        # chain passes through node
        sub = 0
        for m, c in own_map.items():
            cur = m
            while cur >= 1:
                if cur == node:
                    sub += c
                    break
                if cur == 1:
                    break
                cur //= 2
        assert int(r.own_count) == own_map[node]
        assert int(r.subtree_count) == sub


def test_triple_qualifiers_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_triple_qualifiers
    from wikidata_qrank_ray.sources.gazetteer import (
        build_aliases, build_gazetteer)
    from wikidata_qrank_ray.sources.transcripts import derive_transcripts
    from wikidata_qrank_ray.stages.canonicalize import resolve_aliases

    gaz = build_gazetteer(SF)
    mapping = resolve_aliases(build_aliases(gaz))
    surf2qid = dict(zip(gaz["surface"], gaz["qid"]))
    turns = derive_transcripts(SF).to_pandas()

    want: dict[tuple[str, str], list] = {}
    for r in turns.itertuples(index=False):
        qs = {mapping.get(surf2qid[t], surf2qid[t])
              for t in py_tokens(str(r.text)) if t in surf2qid}
        sec = int(r.conv_id[1:]) * 8 + int(r.turn_idx)
        qs = sorted(qs, key=lambda q: int(q[1:]))
        for i in range(len(qs)):
            for j in range(i + 1, len(qs)):
                k = (qs[i], qs[j])
                if k not in want:
                    want[k] = [sec, sec, 0]
                want[k][0] = min(want[k][0], sec)
                want[k][1] = max(want[k][1], sec)
                want[k][2] += 1

    got = q_triple_qualifiers(SF).to_pandas()
    assert len(got) == len(want)
    base = pd.Timestamp("2024-01-01")
    for r in got.itertuples(index=False):
        lo, hi, n = want[(r.subj, r.obj)]
        assert r.first_seen == base + pd.Timedelta(seconds=lo)
        assert r.last_seen == base + pd.Timedelta(seconds=hi)
        assert int(r.n_turns) == n


def test_transitive_closure_empty_edges():
    from wikidata_qrank_ray.stages.graph import transitive_closure

    edges = ray.data.from_pandas(pd.DataFrame({
        "child": pd.Series(dtype=np.int64),
        "anc": pd.Series(dtype=np.int64)}))
    assert transitive_closure(edges, num_partitions=2).count() == 0


def _canon_setup():
    from wikidata_qrank_ray.sources.gazetteer import (
        build_aliases, build_gazetteer)
    from wikidata_qrank_ray.sources.transcripts import derive_transcripts
    from wikidata_qrank_ray.stages.canonicalize import resolve_aliases

    gaz = build_gazetteer(SF)
    mapping = resolve_aliases(build_aliases(gaz))
    surf2qid = dict(zip(gaz["surface"], gaz["qid"]))
    turns = derive_transcripts(SF).to_pandas()
    return gaz, mapping, surf2qid, turns


def test_entity_typing_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_entity_typing

    gaz, mapping, surf2qid, turns = _canon_setup()
    own: dict[str, set] = {}
    for s, q in surf2qid.items():
        own.setdefault(mapping.get(q, q), set()).add(s)
    counts: dict[tuple[str, str], int] = {}
    for r in turns.itertuples(index=False):
        toks = py_tokens(str(r.text))
        ents = {mapping.get(surf2qid[t], surf2qid[t])
                for t in toks if t in surf2qid}
        for e in ents:
            for t in toks:
                if t not in own[e]:
                    counts[(e, t)] = counts.get((e, t), 0) + 1
    want = {}
    for (e, t), c in counts.items():
        cur = want.get(e)
        if cur is None or c > cur[1] or (c == cur[1] and t < cur[0]):
            want[e] = (t, c)
    got = q_entity_typing(SF).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        assert (r.type_token, int(r.cnt)) == want[r.qid]


def test_entity_hits_int_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import (
        q_canonical_triples, q_entity_hits_int)

    SCALE = 1_000_000
    ct = q_canonical_triples(SF).to_pandas()
    e = ct[ct["pred"] == "observed_via_tool"]
    hub = {int(q[1:]): SCALE for q in e["subj"].unique()}
    auth = {}
    edges = [(int(s[1:]), o, int(w))
             for s, o, w in zip(e["subj"], e["obj"], e["weight"])]
    for _ in range(2):
        auth = {}
        for ei, t, w in edges:
            auth[t] = auth.get(t, 0) + hub[ei] * w
        amax = max(auth.values())
        auth = {t: (a * SCALE) // amax for t, a in auth.items()}
        hub = {}
        for ei, t, w in edges:
            hub[ei] = hub.get(ei, 0) + auth[t] * w
        hmax = max(hub.values())
        hub = {k: (h * SCALE) // hmax for k, h in hub.items()}
    got = q_entity_hits_int(SF).to_pandas()
    ge = got[got["kind"] == "entity"]
    gt = got[got["kind"] == "tool"]
    assert {int(n[1:]): int(s) for n, s in zip(ge["node"], ge["score"])} == hub
    assert dict(zip(gt["node"], gt["score"].astype(int))) == auth


def test_assoc_rules_confidence_and_support():
    from wikidata_qrank_ray.pipelines.queries import (
        q_assoc_rules, q_triple_qualifiers)

    gaz, mapping, surf2qid, turns = _canon_setup()
    ant = {}
    for r in turns.itertuples(index=False):
        for e in {mapping.get(surf2qid[t], surf2qid[t])
                  for t in py_tokens(str(r.text)) if t in surf2qid}:
            ant[e] = ant.get(e, 0) + 1
    qual = q_triple_qualifiers(SF).to_pandas()
    pc = {(s, o): int(n)
          for s, o, n in zip(qual["subj"], qual["obj"], qual["n_turns"])}
    got = q_assoc_rules(SF).to_pandas()
    n_expected = 2 * sum(1 for v in pc.values() if v >= 2)
    assert len(got) == n_expected
    for r in got.itertuples(index=False):
        k = (r.antecedent, r.consequent)
        kk = k if k in pc else (r.consequent, r.antecedent)
        assert int(r.pair_turns) == pc[kk] and pc[kk] >= 2
        assert int(r.ant_turns) == ant[r.antecedent]
        assert int(r.conf_ppm) == (1_000_000 * pc[kk]) // ant[r.antecedent]


def test_winnow_fingerprints_bruteforce_twin():
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.functions.hashing import polyhash64
    from wikidata_qrank_ray.pipelines.queries import q_winnow_fingerprints

    K, W = 3, 4
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    want = set()
    for r in docs.itertuples(index=False):
        toks = py_tokens(str(r.text) if r.text is not None else "")
        if len(toks) >= K:
            sh = [" ".join(toks[i:i + K]) for i in range(len(toks) - K + 1)]
        elif toks:
            sh = [" ".join(toks)]
        else:
            continue
        h = polyhash64(np.array(sh, dtype=object))
        n = len(h)
        for ws in range(max(n - W + 1, 1)):
            win = h[ws:ws + W]
            mn = win.min()
            pos = ws + max(np.nonzero(win == mn)[0])
            want.add((int(r.doc_id), int(pos),
                      int(mn % np.uint64(2 ** 63))))
    got = q_winnow_fingerprints(SF).to_pandas()
    got_set = {(int(a), int(b), int(c)) for a, b, c in
               zip(got["doc_id"], got["pos"], got["fp"])}
    assert got_set == want


def test_winnow_shared_run_guarantee():
    """Two docs sharing a token run of length >= w + k - 1 share at least
    one fingerprint (the winnowing guarantee)."""
    import ray.data as rd

    from wikidata_qrank_ray.stages.dedup import winnow_fingerprints

    run = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["xx yy " + run + " qq", "aa " + run + " bb cc dd"]}))
    out = winnow_fingerprints(docs).to_pandas()
    f1 = set(out[out["doc_id"] == 1]["fp"])
    f2 = set(out[out["doc_id"] == 2]["fp"])
    assert f1 & f2


def test_bigram_surprisal_bruteforce_twin():
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines.queries import q_bigram_surprisal

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    cnt: dict[str, int] = {}
    per_doc: dict[int, list] = {}
    for r in docs.itertuples(index=False):
        toks = py_tokens(str(r.text) if r.text is not None else "")
        bgs = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
        per_doc[int(r.doc_id)] = bgs
        for b in bgs:
            cnt[b] = cnt.get(b, 0) + 1
    got = q_bigram_surprisal(SF).to_pandas()
    want = {d: (len(bgs),
                sum(cnt[b].bit_length() - 1 for b in bgs),
                min(cnt[b] for b in bgs))
            for d, bgs in per_doc.items() if bgs}
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        assert (int(r.n_bigrams), int(r.surprisal),
                int(r.min_count)) == want[int(r.doc_id)]


def test_mad_outliers_bruteforce_twin():
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines.queries import q_mad_outliers

    ev = pq.read_table(SF + "/events.parquet",
                       columns=["event_id", "event_type", "value"]).to_pandas()
    vc = np.floor(np.abs(ev["value"].to_numpy()) * 100 + 0.5).astype(np.int64) \
        * np.sign(ev["value"].to_numpy()).astype(np.int64)

    def lower_median(vals):
        vals = np.sort(np.asarray(vals, dtype=np.int64))
        cum = np.arange(1, len(vals) + 1)
        return int(vals[np.nonzero(2 * cum >= len(vals))[0][0]])

    ev = ev.assign(vc=vc)
    want = set()
    for t, g in ev.groupby("event_type"):
        med = lower_median(g["vc"])
        dev = np.abs(g["vc"].to_numpy(np.int64) - med)
        mad = lower_median(dev)
        for eid, v, d in zip(g["event_id"], g["vc"], dev):
            if d > 3 * mad:
                want.add((int(eid), t, int(v), int(d), mad))
    got = q_mad_outliers(SF).to_pandas()
    got_set = {(int(a), b, int(c), int(d), int(e)) for a, b, c, d, e in
               zip(got["event_id"], got["event_type"], got["value_cents"],
                   got["dev"], got["mad"])}
    assert got_set == want


def test_fps_coreset_bruteforce_twin():
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines.queries import q_fps_coreset
    from wikidata_qrank_ray.stages.similarity import _quant_int

    emb = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    want = []
    for lab, g in emb.groupby("label"):
        ids = g["vec_id"].to_numpy(np.int64)
        q = _quant_int(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        order = np.argsort(ids)
        ids, q = ids[order], q[order]
        sel = [0]
        want.append((int(lab), 0, int(ids[0]), 0))
        for rnd in range(1, 4):
            if len(sel) >= len(ids):
                break
            diff = q[:, None, :] - q[sel][None, :, :]
            dmin = (diff * diff).sum(axis=2).min(axis=1)
            cand = [i for i in range(len(ids)) if i not in sel]
            best = min(cand, key=lambda i: (-dmin[i], ids[i]))
            sel.append(best)
            want.append((int(lab), rnd, int(ids[best]), int(dmin[best])))
    got = q_fps_coreset(SF)
    got_set = set(map(tuple, got[["label", "rnd", "vec_id", "d2"]]
                      .astype(np.int64).itertuples(index=False)))
    assert got_set == set(want)


def test_functional_violations_twin():
    from wikidata_qrank_ray.pipelines.queries import (
        q_canonical_triples, q_functional_violations)

    ct = q_canonical_triples(SF).to_pandas()
    e = ct[ct["pred"] == "observed_via_tool"]
    want = {}
    for q, g in e.groupby("subj"):
        if len(g) >= 2:
            want[q] = (len(g), g["obj"].min(), g["obj"].max())
    got = q_functional_violations(SF).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        assert (int(r.n_tools), r.first_tool, r.last_tool) == want[r.qid]


def test_table_profile_duckdb_twin_semantics():
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines.queries import q_table_profile

    orders = pq.read_table(SF + "/orders.parquet").to_pandas()
    got = q_table_profile(SF)
    got = {r.column_name: r for r in got.itertuples(index=False)}
    assert set(got) == {"o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate", "o_orderpriority"}
    ok = got["o_orderkey"]
    vals = orders["o_orderkey"].astype(np.int64).astype(str)
    assert int(ok.n_rows) == len(orders) and int(ok.n_null) == 0
    assert int(ok.n_distinct) == vals.nunique()
    assert ok.min_val == vals.min() and ok.max_val == vals.max()
    tp = got["o_totalprice"]
    cents = np.floor(np.abs(orders["o_totalprice"].to_numpy()) * 100 + 0.5)
    cents = (np.sign(orders["o_totalprice"].to_numpy()) * cents).astype(np.int64)
    s = pd.Series(cents).astype(str)
    assert int(tp.n_distinct) == s.nunique()
    assert tp.min_val == s.min() and tp.max_val == s.max()


def test_trigram_paths_bruteforce_twin():
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines.queries import q_trigram_paths

    ev = pq.read_table(SF + "/events.parquet",
                       columns=["event_id", "user_id", "event_type",
                                "ts"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    want: dict[tuple, int] = {}
    for _, g in ev.groupby("user_id"):
        t = g["event_type"].to_list()
        for i in range(len(t) - 2):
            k = (t[i], t[i + 1], t[i + 2])
            want[k] = want.get(k, 0) + 1
    got = q_trigram_paths(SF).to_pandas()
    got_map = {(a, b, c): int(n) for a, b, c, n in
               zip(got["t1"], got["t2"], got["t3"], got["n"])}
    assert got_map == want


def test_rank_fusion_rrf_values():
    from wikidata_qrank_ray.pipelines.queries import (
        q_canonical_rank, q_rank_fusion)

    got = q_rank_fusion(SF)
    crank = q_canonical_rank(SF).to_pandas()
    assert set(got["qid"]) == set(crank["qid"])
    n = len(got)
    assert sorted(got["r1"]) == list(range(1, n + 1))
    assert sorted(got["r2"]) == list(range(1, n + 1))
    for r in got.itertuples(index=False):
        assert int(r.rrf_micro) == (1_000_000 // (60 + int(r.r1))
                                    + 1_000_000 // (60 + int(r.r2)))
    # r1 respects (mention_count DESC, qid ASC)
    cr = dict(zip(crank["qid"], crank["mention_count"]))
    byr1 = got.sort_values("r1")
    keys = [(-int(cr[q]), int(q[1:])) for q in byr1["qid"]]
    assert keys == sorted(keys)


def test_mention_spans_twin():
    from wikidata_qrank_ray.pipelines.queries import q_mention_spans
    from wikidata_qrank_ray.sources.gazetteer import build_gazetteer
    from wikidata_qrank_ray.sources.transcripts import derive_transcripts

    gaz = build_gazetteer(SF)
    surf2qid = dict(zip(gaz["surface"], gaz["qid"]))
    turns = derive_transcripts(SF).to_pandas()
    want = set()
    for r in turns.itertuples(index=False):
        for i, t in enumerate(py_tokens(str(r.text))):
            if t in surf2qid:
                want.add((r.conv_id, int(r.turn_idx), surf2qid[t], i))
    got = q_mention_spans(SF).to_pandas()
    got_set = {(c, int(t), q, int(p)) for c, t, q, p in
               zip(got["conv_id"], got["turn_idx"], got["qid"],
                   got["token_pos"])}
    assert got_set == want
    assert len(got) == len(want)  # occurrences are distinct by position


def test_topic_segments_twin():
    from wikidata_qrank_ray.pipelines.queries import q_topic_segments

    gaz, mapping, surf2qid, turns = _canon_setup()
    ent = {}
    for r in turns.itertuples(index=False):
        ent[(r.conv_id, int(r.turn_idx))] = {
            mapping.get(surf2qid[t], surf2qid[t])
            for t in py_tokens(str(r.text)) if t in surf2qid}
    want = {}
    for conv, g in turns.groupby("conv_id"):
        seg = 0
        for t in sorted(g["turn_idx"].astype(int)):
            if t > 0 and not (ent[(conv, t - 1)] & ent[(conv, t)]):
                seg += 1
            want[(conv, t)] = seg
    got = q_topic_segments(SF).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        assert int(r.segment) == want[(r.conv_id, int(r.turn_idx))]


def test_centroid_distances_twin():
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.pipelines.queries import q_centroid_distances
    from wikidata_qrank_ray.stages.similarity import _int_round_div, _quant_int

    emb = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    cents = {}
    for lab, g in emb.groupby("label"):
        q = _quant_int(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        cents[int(lab)] = _int_round_div(
            q.sum(axis=0), np.full(q.shape[1], len(g), dtype=np.int64))
    labs = sorted(cents)
    want = {(a, b): int(((cents[a] - cents[b]) ** 2).sum())
            for i, a in enumerate(labs) for b in labs[i + 1:]}
    got = q_centroid_distances(SF)
    got_map = {(int(a), int(b)): int(d) for a, b, d in
               zip(got["label_a"], got["label_b"], got["d2"])}
    assert got_map == want
