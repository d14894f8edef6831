"""Round-4f operators: integer CUSUM changepoint, lag-1 autocovariance
sufficient statistics, sweep-line peak session concurrency -- brute-force
single-process twins over the real sf0.001 tables."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _hourly_series(ev: pd.DataFrame) -> dict[str, np.ndarray]:
    HOUR_US = 3_600_000_000
    h = ev["ts"].dt.floor("h").astype("datetime64[us]").astype("int64")
    out = {}
    for et, g in ev.assign(h=h).groupby("event_type"):
        cnt = g.groupby("h").size()
        grid = np.arange(cnt.index.min(), cnt.index.max() + 1, HOUR_US)
        out[et] = (grid, cnt.reindex(grid, fill_value=0).to_numpy(np.int64))
    return out


def test_cusum_changepoint_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_cusum_changepoint

    ev = pq.read_table(SF + "/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    want = {}
    for et, (grid, x) in _hourly_series(ev).items():
        n = len(x)
        if n < 2:
            continue
        best = None
        pk = np.cumsum(x)
        for k in range(1, n):
            stat = abs(n * int(pk[k - 1]) - k * int(pk[-1]))
            if best is None or stat > best[2]:
                best = (k, int(grid[k - 1]), stat)
        want[et] = (n, *best)
    got = q_cusum_changepoint(SF)
    got_map = {r.event_type: (int(r.n_hours), int(r.split_k),
                              int(r.split_hour.value // 1000),
                              int(r.stat))
               for r in got.itertuples(index=False)}
    assert got_map == want


def test_lag_autocov_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_lag_autocov

    ev = pq.read_table(SF + "/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    want = {}
    for et, (_, x) in _hourly_series(ev).items():
        if len(x) < 2:
            continue
        m = len(x) - 1
        sxy = int((x[:-1] * x[1:]).sum())
        sx, sy = int(x[:-1].sum()), int(x[1:].sum())
        want[et] = (m, sxy, sx, sy, m * sxy - sx * sy)
    got = q_lag_autocov(SF).to_pandas()
    got_map = {r.event_type: (int(r.m), int(r.sxy), int(r.sx), int(r.sy),
                              int(r.cov_num))
               for r in got.itertuples(index=False)}
    assert got_map == want
    # the numerator decomposes exactly: cov_num = m*sxy - sx*sy
    for m, sxy, sx, sy, cn in got_map.values():
        assert cn == m * sxy - sx * sy


def test_peak_concurrency_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import (
        q_peak_concurrency, q_sessionize)

    sess = q_sessionize(SF).to_pandas()
    s = sess["session_start"].astype("datetime64[us]").astype("int64").to_numpy()
    e = sess["session_end"].astype("datetime64[us]").astype("int64").to_numpy() + 1
    t = np.concatenate([s, e])
    d = np.concatenate([np.ones(len(s), dtype=np.int64),
                        -np.ones(len(e), dtype=np.int64)])
    order = np.lexsort((d, t))
    c = np.cumsum(d[order])
    peak = int(c.max())
    at = int(t[order][c == peak].min())
    got = q_peak_concurrency(SF)
    assert len(got) == 1
    assert int(got["peak"].iloc[0]) == peak
    assert int(got["at_ts"].iloc[0].value // 1000) == at
    # sanity: peak is positive and bounded by the session count
    assert 1 <= peak <= len(sess)


def test_peak_concurrency_synthetic_overlap():
    """Three hand-placed sessions: [0,10], [5,20], [15,30] (minutes) ->
    peak 2, first reached at t=5min. Exercises the end+1us boundary rule
    (end at 10 and start at 15 never overlap; end 10 vs start 5 do)."""
    import ray
    import ray.data

    from wikidata_qrank_ray.pipelines import queries as Q

    base = pd.Timestamp("2025-01-01")
    ev = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 3, 3],
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": [base, base + pd.Timedelta(minutes=10),
               base + pd.Timedelta(minutes=5),
               base + pd.Timedelta(minutes=20),
               base + pd.Timedelta(minutes=15),
               base + pd.Timedelta(minutes=30)],
    })
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ev.to_parquet(os.path.join(td, "events.parquet"))
        got = Q.q_peak_concurrency(td)
    assert int(got["peak"].iloc[0]) == 2
    assert got["at_ts"].iloc[0] == base + pd.Timedelta(minutes=5)


def test_user_type_gini_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_user_type_gini

    ev = pq.read_table(SF + "/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    want = {}
    for uid, g in ev.groupby("user_id"):
        c = g["event_type"].value_counts()
        n = int(c.sum())
        want[int(uid)] = (n, len(c), n * n - int((c ** 2).sum()))
    got = q_user_type_gini(SF).to_pandas()
    got_map = {int(r.user_id): (int(r.n), int(r.k), int(r.gini_num))
               for r in got.itertuples(index=False)}
    assert got_map == want
    # impurity numerator bounds: 0 <= gini_num < n^2
    for n, k, gn in got_map.values():
        assert 0 <= gn < n * n or (k == 1 and gn == 0)


def test_activation_lag_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_activation_lag

    ev = pq.read_table(SF + "/events.parquet",
                       columns=["user_id", "event_id", "ts"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    want = {}
    for uid, g in ev.groupby("user_id"):
        if len(g) < 2:
            continue
        f = g["ts"].iloc[0].value // 1000
        s = g["ts"].iloc[1].value // 1000
        want[int(uid)] = (f, s, s - f)
    got = q_activation_lag(SF).to_pandas()
    got_map = {int(r.user_id): (r.first_ts.value // 1000,
                                r.second_ts.value // 1000, int(r.lag_us))
               for r in got.itertuples(index=False)}
    assert got_map == want


def test_supplier_share_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_supplier_share

    li = pq.read_table(SF + "/lineitem.parquet",
                       columns=["l_suppkey", "l_extendedprice",
                                "l_discount"]).to_pandas()
    sup = pq.read_table(SF + "/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(SF + "/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    pc_ = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    dc = np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)
    li = li.assign(rev=pc_ * (100 - dc))
    rev = li.groupby("l_suppkey")["rev"].sum()
    sup = sup.set_index("s_suppkey")
    names = nat.set_index("n_nationkey")["n_name"]
    tot: dict[int, int] = {}
    for sk, r in rev.items():
        if sk in sup.index:
            nk = int(sup.loc[sk, "s_nationkey"])
            tot[nk] = tot.get(nk, 0) + int(r)
    want = {}
    for sk, r in rev.items():
        if sk not in sup.index:
            continue
        nk = int(sup.loc[sk, "s_nationkey"])
        share = int(r) * 1_000_000 // tot[nk] if tot[nk] else 0
        want[int(sk)] = (names.loc[nk], int(r), share)
    got = q_supplier_share(SF).to_pandas()
    got_map = {int(r.s_suppkey): (r.n_name, int(r.rev_c4), int(r.share_ppm))
               for r in got.itertuples(index=False)}
    assert got_map == want
    # per-nation floor shares sum to within n_suppliers of exactly 1e6
    bynat = got.groupby("n_name")["share_ppm"].agg(["sum", "size"])
    for _, row in bynat.iterrows():
        assert 1_000_000 - row["size"] < row["sum"] <= 1_000_000


def test_supplier_share_overflow_safe():
    """rev_c4 * 1e6 exceeding int64 must flow through the arbitrary-
    precision path, not wrap: 20 suppliers x 5e14 rev_c4 -> nation total
    1e16, numerators 5e20."""
    import os
    import tempfile

    from wikidata_qrank_ray.pipelines.queries import q_supplier_share

    n = 20
    li = pd.DataFrame({
        "l_suppkey": np.arange(n, dtype=np.int64),
        "l_extendedprice": np.full(n, 5e10),
        "l_discount": np.zeros(n)})
    sup = pd.DataFrame({
        "s_suppkey": np.arange(n, dtype=np.int64),
        "s_nationkey": np.zeros(n, dtype=np.int32)})
    nat = pd.DataFrame({"n_nationkey": np.array([0], dtype=np.int32),
                        "n_name": ["ZED"]})
    with tempfile.TemporaryDirectory() as td:
        li.to_parquet(os.path.join(td, "lineitem.parquet"))
        sup.to_parquet(os.path.join(td, "supplier.parquet"))
        nat.to_parquet(os.path.join(td, "nation.parquet"))
        got = q_supplier_share(td).to_pandas()
    assert len(got) == n
    assert (got["rev_c4"] == 5 * 10**14).all()
    assert (got["share_ppm"] == 1_000_000 // n).all()


def test_quality_quantile_norm_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_quality_quantile_norm

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "source", "text"]).to_pandas()
    docs["n_tokens"] = docs["text"].fillna("").str.count(r"\S+").astype(int)
    want = {}
    for src, g in docs.groupby("source"):
        g = g.sort_values(["n_tokens", "doc_id"], kind="mergesort")
        ns = len(g)
        for i, r in enumerate(g.itertuples(index=False), start=1):
            q = (i - 1) * 1_000_000 // (ns - 1) if ns > 1 else 0
            want[int(r.doc_id)] = (src, int(r.n_tokens), i, q)
    got = q_quality_quantile_norm(SF).to_pandas()
    got_map = {int(r.doc_id): (r.source, int(r.n_tokens), int(r.src_rank),
                               int(r.qnorm_ppm))
               for r in got.itertuples(index=False)}
    assert got_map == want
    # the normalized grid is [0, 1e6] with both ends hit per multi-doc source
    for src, g in got.groupby("source"):
        if len(g) > 1:
            assert g["qnorm_ppm"].min() == 0
            assert g["qnorm_ppm"].max() == 1_000_000


def test_lang_confusion_bruteforce_twin():
    from wikidata_qrank_ray.pipelines.queries import q_lang_confusion
    from wikidata_qrank_ray.stages.textstats import LangId

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "lang", "text"]).to_pandas()
    pred = LangId()(docs)["pred_lang"]
    want = (pd.DataFrame({"lang": docs["lang"].fillna(""), "pred": pred})
            .groupby(["lang", "pred"]).size().to_dict())
    got = q_lang_confusion(SF).to_pandas()
    got_map = {(r.lang, r.pred_lang): int(r.n_docs)
               for r in got.itertuples(index=False)}
    assert got_map == want
    assert sum(got_map.values()) == len(docs)


def test_resource_allocation_bruteforce_and_cn_consistency():
    from wikidata_qrank_ray.pipelines.queries import (
        q_link_prediction, q_resource_allocation)

    got = q_resource_allocation(SF).to_pandas()
    lp = q_link_prediction(SF).to_pandas()
    # identical candidate set and common-neighbor counts as link_prediction
    key = lambda df: {(a, b): int(c) for a, b, c in
                      zip(df["qid_a"], df["qid_b"], df["cn"])}
    assert key(got) == key(lp)
    # brute-force RA twin from the adjacency implied by the pairs:
    # rebuild the strong-tie graph exactly as _canon_cooccur_und does
    from wikidata_qrank_ray.pipelines.queries import _canon_cooccur_und

    und = _canon_cooccur_und(SF, strong=True).to_pandas()
    adj: dict[int, set[int]] = {}
    for u, v in zip(und["u"].astype(int), und["v"].astype(int)):
        adj.setdefault(u, set()).add(v)
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b in adj[a]:
                continue
            shared = adj[a] & adj[b]
            if not shared:
                continue
            want[(f"Q{a}", f"Q{b}")] = (
                len(shared),
                sum(1_000_000 // len(adj[z]) for z in shared))
    got_map = {(a, b): (int(c), int(r)) for a, b, c, r in
               zip(got["qid_a"], got["qid_b"], got["cn"], got["ra_micro"])}
    assert got_map == want
    # every wedge middle has deg >= 2, so ra_micro <= cn * 500_000
    for cn, ra in got_map.values():
        assert 0 < ra <= cn * 500_000


def test_audio_frames_real_decode_twin():
    from wikidata_qrank_ray.pipelines.queries import (
        q_audio_features, q_audio_frames)
    from wikidata_qrank_ray.stages.multimodal import AUDIO_FRAME_WIN

    got = q_audio_frames(SF).to_pandas()
    # brute-force twin straight from the synth formula
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    want = {}
    for mid in docs["doc_id"].dropna().astype(int):
        n = 100 + mid % 50
        k = np.arange(n, dtype=np.int64)
        s = ((mid * 1000003 + k * 37) % 65536) - 32768
        for w0 in range(0, n, AUDIO_FRAME_WIN):
            seg = s[w0:w0 + AUDIO_FRAME_WIN]
            want[(mid, w0 // AUDIO_FRAME_WIN)] = (
                len(seg), int((seg * seg).sum()), int(np.abs(seg).max()))
    got_map = {(int(r.media_id), int(r.win)):
               (int(r.n_samples), int(r.sumsq), int(r.peak))
               for r in got.itertuples(index=False)}
    assert got_map == want
    # window features roll up exactly to the per-clip audio_features
    feats = q_audio_features(SF).to_pandas().set_index("media_id")
    roll = got.groupby("media_id").agg(
        n=("n_samples", "sum"), ss=("sumsq", "sum"), pk=("peak", "max"))
    for mid, r in roll.iterrows():
        assert int(r["n"]) == int(feats.loc[mid, "n_frames"])
        assert int(r["ss"]) == int(feats.loc[mid, "sumsq"])
        assert int(r["pk"]) == int(feats.loc[mid, "peak"])


def _brute_canon_triples(turns: pd.DataFrame, surf2qid: dict,
                         mapping: dict) -> dict:
    """Raw per-turn DISTINCT qid pairs -> canonical rewrite -> re-aggregate
    (the reference chain's order: pairs are generated on RAW ids, so two
    raw aliases of one canon in a turn contribute weight 2 to their
    cross pairs and 0 to the collapsed self pair)."""
    from collections import Counter

    cnt: Counter = Counter()
    for r in turns.itertuples(index=False):
        raw = sorted({surf2qid[t] for t in str(r.text).split()
                      if t in surf2qid}, key=lambda q: int(q[1:]))
        for i in range(len(raw)):
            for j in range(i + 1, len(raw)):
                a = mapping.get(raw[i], raw[i])
                b = mapping.get(raw[j], raw[j])
                if a == b:
                    continue
                if int(a[1:]) > int(b[1:]):
                    a, b = b, a
                cnt[(a, "co_occurs", b)] += 1
        if r.tool:
            for q in raw:
                cnt[(mapping.get(q, q), "observed_via_tool", r.tool)] += 1
    return dict(cnt)


def test_triples_delta_bruteforce_twin():
    from test_round4e_ops import _canon_setup

    from wikidata_qrank_ray.pipelines.queries import q_triples_delta

    gaz, mapping, surf2qid, turns = _canon_setup()
    even = turns[turns["conv_id"].str[1:].astype(int) % 2 == 0]
    old = _brute_canon_triples(even, surf2qid, mapping)
    new = _brute_canon_triples(turns, surf2qid, mapping)
    want = {}
    for k in set(old) | set(new):
        wo, wn = old.get(k, 0), new.get(k, 0)
        if wo != wn:
            status = ("added" if wo == 0 else "removed" if wn == 0
                      else "grown" if wn > wo else "shrunk")
            want[k] = (wo, wn, status)
    got = q_triples_delta(SF).to_pandas()
    got_map = {(r.subj, r.pred, r.obj): (int(r.w_old), int(r.w_new), r.status)
               for r in got.itertuples(index=False)}
    assert got_map == want
    # old is a subset of new, so only added/grown can occur
    assert set(got["status"]) <= {"added", "grown"}


def test_alias_mentions_bruteforce_twin():
    from test_round4e_ops import _canon_setup

    from wikidata_qrank_ray.pipelines.queries import q_alias_mentions

    gaz, mapping, surf2qid, turns = _canon_setup()
    want: dict[tuple, int] = {}
    for r in turns.itertuples(index=False):
        for t in str(r.text).split():
            q = surf2qid.get(t)
            if q is not None and mapping.get(q, q) != q:
                k = (t, q, mapping[q])
                want[k] = want.get(k, 0) + 1
    got = q_alias_mentions(SF).to_pandas()
    got_map = {(r.surface, r.qid, r.canon): int(r.n_mentions)
               for r in got.itertuples(index=False)}
    assert got_map == want
    # every reported row really is a redirect
    assert (got["qid"] != got["canon"]).all()


def test_entity_salience_bruteforce_twin():
    from test_round4e_ops import _canon_setup

    from wikidata_qrank_ray.pipelines.queries import q_entity_salience

    gaz, mapping, surf2qid, turns = _canon_setup()
    conv_n = turns.groupby("conv_id")["turn_idx"].size()
    seen: dict[tuple, set] = {}
    for r in turns.itertuples(index=False):
        for t in str(r.text).split():
            q = surf2qid.get(t)
            if q is not None:
                seen.setdefault((r.conv_id, mapping.get(q, q)),
                                set()).add(int(r.turn_idx))
    want = {k: (len(v), min(v), 1_000_000 * len(v) // int(conv_n[k[0]]))
            for k, v in seen.items()}
    got = q_entity_salience(SF).to_pandas()
    got_map = {(r.conv_id, r.qid): (int(r.n_turns_mentioned),
                                    int(r.first_turn), int(r.salience_ppm))
               for r in got.itertuples(index=False)}
    assert got_map == want
    assert (got["salience_ppm"] <= 1_000_000).all()
