"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: per-batch numpy matmul against a broadcast
  query matrix (float64 accumulation), per-batch partial top-k, tiny
  driver-side final merge. This is the baseline; wall-clock scales linearly
  with rows and is embarrassingly parallel (no shuffle at all).
- LSH-bucketed variant (random hyperplanes): the scale path -- restrict the
  scan to the query's bucket (+ optional multi-probe), trading recall for a
  ~2^bits scan reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _cosine_partial_topk(batch: pd.DataFrame, q: np.ndarray, k: int) -> pd.DataFrame:
    emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
    # dot / (|e| * |q|) -- matches DuckDB list_cosine_similarity's formula so
    # the ordering agrees bit-for-bit with the SQL oracle in practice
    sims = (emb @ q) / (np.linalg.norm(emb, axis=1) * np.linalg.norm(q))
    order = np.lexsort((batch["vec_id"].to_numpy(), -sims))[:k]
    return pd.DataFrame(
        {"vec_id": batch["vec_id"].to_numpy()[order], "sim": sims[order]}
    )


def ann_brute_topk(
    emb: ray.data.Dataset, query_vec: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """-> (pos, vec_id) of the k nearest by cosine (ties: vec_id asc).
    Only integer columns are returned so the result is exactly comparable
    against a SQL oracle (float sims differ in ulps across engines).
    The query vector is a few hundred bytes -- closure-captured on elastic
    tasks (no actor-pool startup; scales to every CPU)."""
    q = np.asarray(query_vec, dtype=np.float64)

    def _partial(batch: pd.DataFrame, q=q) -> pd.DataFrame:
        return _cosine_partial_topk(batch, q, k)

    partial = emb.map_batches(_partial, batch_format="pandas", batch_size=4096)
    df = partial.to_pandas()  # tiny: k rows per batch
    order = np.lexsort((df["vec_id"].to_numpy(), -df["sim"].to_numpy()))[:k]
    out = df.iloc[order].reset_index(drop=True)
    return pd.DataFrame(
        {"pos": np.arange(1, len(out) + 1, dtype=np.int64), "vec_id": out["vec_id"].astype(np.int64)}
    )


def _pair_block_sims(ta: pa.Table, tb: pa.Table, threshold: float, same: bool) -> pd.DataFrame:
    empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64)})
    # an all-empty input repartitions into schema-less blocks
    if "vec_id" not in ta.column_names or "vec_id" not in tb.column_names:
        return empty
    ids_a = ta["vec_id"].to_numpy()
    ids_b = tb["vec_id"].to_numpy()
    if len(ids_a) == 0 or len(ids_b) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    ma = np.stack(ta["embedding"].to_pandas().to_numpy()).astype(np.float64)
    mb = np.stack(tb["embedding"].to_pandas().to_numpy()).astype(np.float64)
    sims = (ma @ mb.T) / (
        np.linalg.norm(ma, axis=1)[:, None] * np.linalg.norm(mb, axis=1)[None, :]
    )
    hit = sims >= threshold
    if same:
        # within one block each unordered pair shows up twice; keep a < b
        hit &= ids_a[:, None] < ids_b[None, :]
    ii, jj = np.nonzero(hit)
    lo = np.minimum(ids_a[ii], ids_b[jj])
    hi = np.maximum(ids_a[ii], ids_b[jj])
    return pd.DataFrame({"a": lo.astype(np.int64), "b": hi.astype(np.int64)})


def all_pairs_cosine(
    emb: ray.data.Dataset, threshold: float, num_blocks: int = 8
) -> pd.DataFrame:
    """EXACT all-pairs cosine near-dup pairs -> (a, b) with sim >= threshold,
    a < b, computed as a block-pair cross product: the table is split into
    ``num_blocks`` object-store blocks and one Ray task per (i, j<=i) block
    pair fetches exactly two blocks (zero-copy plasma reads) and matmuls
    them. No O(N) full-matrix broadcast, no driver-side materialization of
    the embeddings -- the driver holds only block refs and the (small)
    qualifying pair set. Compute is inherently O(N^2); for the approximate
    scale path see lsh_bucket_ids (bucket both sides, verify in-bucket).
    Raw Ray tasks are the documented narrow tier here: the Dataset API has
    no self-cross-join."""
    packed = emb.map_batches(
        lambda t: t.select(["vec_id", "embedding"]), batch_format="pyarrow"
    ).repartition(num_blocks)
    refs = packed.to_arrow_refs()

    @ray.remote
    def _task(ta, tb, same: bool) -> pd.DataFrame:
        return _pair_block_sims(ta, tb, threshold, same)

    futs = [
        _task.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    parts = [p for p in ray.get(futs) if len(p)]
    if not parts:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    return pd.concat(parts, ignore_index=True).sort_values(["a", "b"]).reset_index(drop=True)


def lsh_blocked_near_dups(
    emb: ray.data.Dataset,
    threshold: float,
    bits: int = 4,
    n_tables: int = 8,
    seed: int = 11,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """APPROXIMATE near-dup pairs -> (a, b): rows hash into ``n_tables``
    independent hyperplane tables inside map_batches, (table, bucket)
    groups co-locate through one hash-partitioned shuffle, and exact
    cosine verification runs only WITHIN each bucket; duplicate pairs
    found by several tables collapse in a final pair aggregate. Multi-
    table OR is the recall lever (miss probability ~(1-p^bits)^n_tables);
    compute drops from O(N^2) to n_tables x sum of bucket^2 -- the scale
    path next to the exact block-pair all_pairs_cosine."""
    from .groupby import hash_partition_aggregate, hash_partition_apply

    def _bucket(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        frames = []
        for t in range(n_tables):
            planes = lsh_hyperplanes(m.shape[1], bits, seed + 7919 * t)
            frames.append(
                pd.DataFrame(
                    {
                        "table": np.full(len(ids), t, dtype=np.int64),
                        "bucket": lsh_bucket_ids(m, planes),
                        "vec_id": ids,
                        "embedding": batch["embedding"],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    bucketed = emb.map_batches(_bucket, batch_format="pandas")

    def _within(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby(["table", "bucket"], sort=False):
            if len(grp) < 2:
                continue
            ids = grp["vec_id"].to_numpy()
            m = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
            sims = (m @ m.T) / (
                np.linalg.norm(m, axis=1)[:, None] * np.linalg.norm(m, axis=1)[None, :]
            )
            ii, jj = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
            if len(ii):
                outs.append(pd.DataFrame({"a": ids[ii], "b": ids[jj]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    raw = hash_partition_apply(bucketed, ["table", "bucket"], _within, num_partitions)
    # collapse pairs found by several tables (distinct (a, b))
    dedup = hash_partition_aggregate(
        raw.map_batches(lambda df: df.assign(n=np.int64(1)), batch_format="pandas"),
        ["a", "b"],
        {"n": ("n", "sum")},
        num_partitions,
    )
    return dedup.map_batches(lambda df: df[["a", "b"]], batch_format="pandas")


def kmeans_centroids(sample: np.ndarray, k: int, iters: int = 10, seed: int = 13) -> np.ndarray:
    """Deterministic k-means coarse quantizer (the IVF training step): runs
    driver-side on a SAMPLE of the embeddings, never the full set."""
    rng = np.random.RandomState(seed)
    x = sample.astype(np.float64)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(cent)):
            mask = assign == j
            if mask.any():
                cent[j] = x[mask].mean(axis=0)
    return cent


def _quant_int(m: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """Half-away-from-zero integer quantization (== DuckDB ROUND)."""
    return (np.sign(m) * np.floor(np.abs(m) * scale + 0.5)).astype(np.int64)


def _int_round_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """round-half-away-from-zero of the rational s/n in pure int64
    (n > 0) -- elementwise, exactly reproducible in SQL integer ops."""
    s = s.astype(np.int64)
    n = n.astype(np.int64)
    mag = (2 * np.abs(s) + n) // (2 * n)
    return np.where(s < 0, -mag, mag)


def ivf_train_integer(
    emb: ray.data.Dataset,
    n_lists: int = 8,
    iters: int = 3,
    quant_scale: float = 1e6,
) -> np.ndarray:
    """INTEGER-DOMAIN Lloyd's k-means coarse quantizer for IVF: centroids
    are int64 vectors on the quant grid, distances are int64 L2 sums
    (order-independent, EXACT), centroid updates are rounded rational
    means in pure integer arithmetic -- so training is bitwise
    deterministic, reshard-invariant AND reproducible by a DuckDB oracle
    in SQL integer ops (no float summation anywhere). Init = vectors of
    the n_lists smallest vec_ids (per-batch partial min-k). Driver state:
    n_lists x (d+1) integers per iteration (the mergeable-partials
    pattern, same shape as kmeans_train)."""
    def _quant(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(np.int64),
             "q": list(_quant_int(m, quant_scale))}
        )

    quant = emb.map_batches(_quant, batch_format="pandas", batch_size=4096).materialize()
    seed_rows = quant.map_batches(
        lambda d: d.nsmallest(n_lists, "vec_id"), batch_format="pandas"
    ).to_pandas()
    if len(seed_rows):
        seed_rows = seed_rows.nsmallest(n_lists, "vec_id")
    if len(seed_rows) == 0:
        return np.zeros((0, 0), dtype=np.int64)
    cent = np.stack(seed_rows["q"].to_numpy()).astype(np.int64)
    kk = len(cent)

    def _partials(batch: pd.DataFrame, cent=None) -> pd.DataFrame:
        qi = np.stack(batch["q"].to_numpy()).astype(np.int64)
        d2 = ((qi[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # int64-exact; ties -> lowest cluster
        sums = np.zeros((kk, qi.shape[1]), dtype=np.int64)
        np.add.at(sums, assign, qi)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        return pd.DataFrame(
            {"cluster": np.arange(kk, dtype=np.int64),
             "n": counts, "s": list(sums)}
        )

    for _ in range(iters):
        parts = quant.map_batches(
            _partials, fn_kwargs={"cent": cent},
            batch_format="pandas", batch_size=4096,
        ).to_pandas()
        g = parts.groupby("cluster", sort=True)
        n = g["n"].sum().to_numpy(np.int64)
        s = np.stack(
            g["s"].apply(lambda col: np.sum(np.stack(col.to_numpy()), axis=0)).to_numpy()
        )
        upd = n > 0
        cent = cent.copy()
        cent[upd] = _int_round_div(s[upd], n[upd, None])
    return cent


def ann_ivf_topk(
    emb: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 2,
    iters: int = 3,
    quant_scale: float = 1e6,
) -> pd.DataFrame:
    """IVF (inverted-file) cosine top-k -- the scale path: an integer-
    domain k-means coarse quantizer (``ivf_train_integer``, bitwise and
    SQL-reproducible) assigns every row to a list inside ``map_batches``
    (centroids are KBs, closure-captured); only rows in the ``n_probe``
    lists nearest the query are cosine-scored. Approximate by design
    (recall < 1); scan cost ~ n_probe/n_lists of brute force. Value-exact
    DuckDB oracle: the oracle SQL unrolls the same integer iterations
    (queries._ann_ivf_sql). -> (pos, vec_id)"""
    cent = ivf_train_integer(emb, n_lists, iters, quant_scale)
    empty = pd.DataFrame({"pos": pd.Series([], dtype=np.int64),
                          "vec_id": pd.Series([], dtype=np.int64)})
    if cent.size == 0:
        return empty
    q = np.asarray(query_vec, dtype=np.float64)
    qq = _quant_int(q[None, :], quant_scale)[0]
    qd = ((cent - qq[None, :]) ** 2).sum(axis=1)  # int64-exact
    probe_arr = np.sort(np.argsort(qd, kind="stable")[:n_probe])

    # centroids + probe list are KBs -- closure-captured on elastic tasks
    def _list_scan(batch: pd.DataFrame, cent=cent, probe=probe_arr,
                   q=q, scale=quant_scale) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        qi = _quant_int(m, scale)
        d = ((qi[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        keep = np.isin(assign, probe)
        if not keep.any():
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype=np.int64), "sim": pd.Series([], dtype=np.float64)}
            )
        return _cosine_partial_topk(batch[keep], q, k)

    partial = emb.map_batches(_list_scan, batch_format="pandas", batch_size=4096)
    df = partial.to_pandas()
    if df.empty:
        return empty
    order = np.lexsort((df["vec_id"].to_numpy(), -df["sim"].to_numpy()))[:k]
    out = df.iloc[order].reset_index(drop=True)
    return pd.DataFrame(
        {"pos": np.arange(1, len(out) + 1, dtype=np.int64), "vec_id": out["vec_id"].astype(np.int64)}
    )


def lsh_hyperplanes(dim: int, bits: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).astype(np.float64)


def lsh_bucket_ids(emb_matrix: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per row: uint in [0, 2^bits)."""
    bits = (emb_matrix.astype(np.float64) @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


def ann_lsh_topk(
    emb: ray.data.Dataset, query_vec: np.ndarray, k: int = 10, bits: int = 6, seed: int = 11
) -> pd.DataFrame:
    """LSH-restricted cosine top-k: hash every row to a hyperplane bucket
    inside ``map_batches`` (planes broadcast once), scan only rows in the
    query's bucket. Approximate: recall < 1 by design; -> (pos, vec_id, bucket).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    dim = q.shape[0]
    planes = lsh_hyperplanes(dim, bits, seed)
    qbucket = int(lsh_bucket_ids(q[None, :], planes)[0])

    # planes are bits x dim doubles (KBs) -- closure-captured elastic tasks
    def _bucket_scan(batch: pd.DataFrame, planes=planes, qbucket=qbucket, q=q) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        keep = lsh_bucket_ids(m, planes) == qbucket
        if not keep.any():
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64), "sim": pd.Series([], dtype=np.float64)})
        return _cosine_partial_topk(batch[keep], q, k)

    partial = emb.map_batches(_bucket_scan, batch_format="pandas", batch_size=4096)
    df = partial.to_pandas()
    if df.empty:
        return pd.DataFrame({"pos": pd.Series([], dtype=np.int64), "vec_id": pd.Series([], dtype=np.int64)})
    order = np.lexsort((df["vec_id"].to_numpy(), -df["sim"].to_numpy()))[:k]
    out = df.iloc[order].reset_index(drop=True)
    return pd.DataFrame(
        {"pos": np.arange(1, len(out) + 1, dtype=np.int64), "vec_id": out["vec_id"].astype(np.int64)}
    )


def kmeans_train(
    emb: ray.data.Dataset,
    k: int = 8,
    iters: int = 5,
    quant_scale: float = 1e6,
) -> tuple[np.ndarray, ray.data.Dataset]:
    """Distributed full-corpus Lloyd's k-means -> (centroids (k, d) float64,
    assignment Dataset (vec_id, cluster)). The iterative-training shape:
    per iteration one map_batches pass emits a FIXED-SIZE partial per batch
    (k x (d+1): integer coordinate sums + counts), the driver merges k x d
    numbers and updates centroids -- driver state is model-sized, never
    data-sized, exactly like the histogram-sketch and scoring stages.

    BITWISE-DETERMINISTIC by construction, so the distributed run equals a
    single-threaded NumPy twin and any resharding of the input:
    coordinates are quantized to integers once (round(x * quant_scale)) and
    all cross-row reductions are INTEGER sums (order-independent, exact);
    per-row distances to float64 centroids reduce over the fixed dimension
    axis only; argmin ties break to the lowest cluster id; empty clusters
    keep their previous centroid. Init = the vectors of the k smallest
    vec_ids (found with per-batch partial min-k, no global sort)."""
    def _quant(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        # half-away-from-zero (queries._cents semantics), one shared rule
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(np.int64),
             "q": list(_quant_int(m, quant_scale))}
        )

    quant = emb.map_batches(_quant, batch_format="pandas", batch_size=4096).materialize()

    # deterministic init: k smallest vec_ids via fixed-size per-batch min-k
    seed_rows = quant.map_batches(
        lambda d: d.nsmallest(k, "vec_id"), batch_format="pandas"
    ).to_pandas()
    # zero-block Dataset loses its schema -> column-less empty frame
    if len(seed_rows):
        seed_rows = seed_rows.nsmallest(k, "vec_id")
    if len(seed_rows) == 0:
        return (np.zeros((0, 0)), ray.data.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series(dtype=np.int64),
             "cluster": pd.Series(dtype=np.int64)})))
    cent = np.stack(seed_rows["q"].to_numpy()).astype(np.float64) / quant_scale
    kk = len(cent)

    def _partials(batch: pd.DataFrame, cent_ref) -> pd.DataFrame:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        x = np.stack(batch["q"].to_numpy()).astype(np.float64) / quant_scale
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties -> lowest cluster id
        qi = np.stack(batch["q"].to_numpy()).astype(np.int64)
        dims = qi.shape[1]
        sums = np.zeros((kk, dims), dtype=np.int64)
        np.add.at(sums, assign, qi)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        return pd.DataFrame(
            {"cluster": np.arange(kk, dtype=np.int64),
             "n": counts, "s": list(sums)}
        )

    for _ in range(iters):
        cent_ref = ray.put(cent)
        parts = quant.map_batches(
            _partials, fn_kwargs={"cent_ref": cent_ref},
            batch_format="pandas", batch_size=4096,
        ).to_pandas()
        # integer merge: exact and order-independent
        g = parts.groupby("cluster", sort=True)
        n = g["n"].sum().to_numpy(np.int64)
        s = np.stack(g["s"].apply(lambda col: np.sum(np.stack(col.to_numpy()), axis=0)).to_numpy())
        upd = n > 0
        cent = cent.copy()
        cent[upd] = (s[upd].astype(np.float64) / n[upd, None]) / quant_scale

    cent_ref = ray.put(cent)

    def _assign(batch: pd.DataFrame, cent_ref=cent_ref) -> pd.DataFrame:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        x = np.stack(batch["q"].to_numpy()).astype(np.float64) / quant_scale
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(np.int64),
             "cluster": d2.argmin(axis=1).astype(np.int64)}
        )

    return cent, quant.map_batches(_assign, batch_format="pandas", batch_size=4096)


def pq_train_encode(
    emb: ray.data.Dataset,
    m: int = 4,
    k: int = 16,
    iters: int = 4,
    quant_scale: float = 1e6,
) -> tuple[list, ray.data.Dataset]:
    """Product quantization (Jegou et al., TPAMI'11) -- the 100 TB
    vector-compression path: split each d-dim embedding into ``m``
    contiguous subvectors, train an independent k-means codebook per
    subspace (the same BITWISE-deterministic integer-quantized Lloyd
    rules as ``kmeans_train``), and encode every vector as m small codes
    (m * log2(k) bits instead of d floats; 64-dim float32 -> 4 bytes at
    the defaults). Returns (codebooks: list of m (k, d/m) arrays,
    codes Dataset (vec_id, code_0..code_{m-1})).

    Determinism is inherited from the trainer (integer partial sums, ties
    to the lowest centroid id), so the whole pipeline is reshard-invariant
    and pinned against a single-process twin in tests. The m trainings
    advance JOINTLY (like pq_encode_integer): one quantized materialized
    pass, one shared seed scan, one map_batches pass per Lloyd iteration
    emitting all m fixed-size partials, one assignment pass emitting all
    m code columns -- m x fewer corpus passes than sequential subspace
    training, bitwise-identical output (elementwise rounding commutes
    with column slicing). Nothing vector-count-scaled on the driver."""
    # probe dim from one row (schema-safe on empty input)
    head = emb.limit(1).to_pandas()
    if len(head) == 0:
        return [], ray.data.from_pandas(
            pd.DataFrame({"vec_id": pd.Series(dtype=np.int64)})
        )
    d = len(head["embedding"].iloc[0])
    bounds = [(si * d // m, (si + 1) * d // m) for si in range(m)]

    def _quant(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(np.int64),
             "q": list(_quant_int(v, quant_scale))})

    quant = emb.map_batches(
        _quant, batch_format="pandas", batch_size=4096).materialize()

    seed_rows = quant.map_batches(
        lambda dd: dd.nsmallest(k, "vec_id"), batch_format="pandas"
    ).to_pandas()
    if len(seed_rows):
        seed_rows = seed_rows.nsmallest(k, "vec_id")
    if len(seed_rows) == 0:
        return [], ray.data.from_pandas(
            pd.DataFrame({"vec_id": pd.Series(dtype=np.int64)})
        )
    qseed = np.stack(seed_rows["q"].to_numpy()).astype(np.int64)
    cents = [qseed[:, lo:hi].astype(np.float64) / quant_scale
             for lo, hi in bounds]
    kk = len(qseed)

    def _partials(batch: pd.DataFrame, cents_ref=None) -> pd.DataFrame:
        cs = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        qi = np.stack(batch["q"].to_numpy()).astype(np.int64)
        frames = []
        for si, (lo, hi) in enumerate(bounds):
            subq = qi[:, lo:hi]
            x = subq.astype(np.float64) / quant_scale
            d2 = ((x[:, None, :] - cs[si][None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lowest cluster id
            sums = np.zeros((kk, subq.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, subq)
            frames.append(pd.DataFrame(
                {"si": np.full(kk, si, dtype=np.int64),
                 "cluster": np.arange(kk, dtype=np.int64),
                 "n": np.bincount(assign, minlength=kk).astype(np.int64),
                 "s": list(sums)}))
        return pd.concat(frames, ignore_index=True)

    for _ in range(iters):
        cents_ref = ray.put(cents)
        parts = quant.map_batches(
            _partials, fn_kwargs={"cents_ref": cents_ref},
            batch_format="pandas", batch_size=4096,
        ).to_pandas()
        nxt = []
        for si in range(m):
            p = parts[parts["si"] == si]
            g = p.groupby("cluster", sort=True)
            n = g["n"].sum().to_numpy(np.int64)
            s = np.stack(
                g["s"].apply(
                    lambda col: np.sum(np.stack(col.to_numpy()), axis=0)
                ).to_numpy())
            upd = n > 0
            c = cents[si].copy()
            c[upd] = (s[upd].astype(np.float64) / n[upd, None]) / quant_scale
            nxt.append(c)
        cents = nxt

    cents_ref = ray.put(cents)

    def _assign(batch: pd.DataFrame, cents_ref=cents_ref) -> pd.DataFrame:
        cs = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        qi = np.stack(batch["q"].to_numpy()).astype(np.int64)
        out = {"vec_id": batch["vec_id"].to_numpy(np.int64)}
        for si, (lo, hi) in enumerate(bounds):
            x = qi[:, lo:hi].astype(np.float64) / quant_scale
            d2 = ((x[:, None, :] - cs[si][None, :, :]) ** 2).sum(axis=2)
            out[f"code_{si}"] = d2.argmin(axis=1).astype(np.int64)
        return pd.DataFrame(out)

    codes = quant.map_batches(_assign, batch_format="pandas", batch_size=4096)
    return cents, codes


def pq_adc_topk(
    codebooks: list,
    codes_df: pd.DataFrame,
    query: np.ndarray,
    topk: int = 10,
) -> pd.DataFrame:
    """Asymmetric-distance top-k against PQ codes: one (m x k) lookup
    table of exact subspace distances to the query, then distance(v) =
    sum of m table lookups -- the scan is table lookups + integer adds
    over the code columns, never touching original vectors. Driver-side
    helper over a code table slice; the batch form drops straight into
    map_batches for a distributed scan."""
    m = len(codebooks)
    off = 0
    luts = []
    for cb in codebooks:
        qs = query[off:off + cb.shape[1]]
        luts.append(((cb - qs[None, :]) ** 2).sum(axis=1))
        off += cb.shape[1]
    dist = np.zeros(len(codes_df), dtype=np.float64)
    for si in range(m):
        dist += luts[si][codes_df[f"code_{si}"].to_numpy(np.int64)]
    out = pd.DataFrame({"vec_id": codes_df["vec_id"].to_numpy(np.int64),
                        "adc_dist": dist})
    return out.nsmallest(topk, ["adc_dist", "vec_id"]).reset_index(drop=True)


def integer_assign_batch(
    batch: pd.DataFrame,
    cent: np.ndarray,
    quant_scale: float,
    with_q: bool = False,
) -> pd.DataFrame:
    """The ONE Python home of the integer-grid assignment rule (quantize,
    int64 L2, argmin with lowest-cluster tie-break == _lloyd_ctes
    ``afin``). kmeans_integer_assign and the SemDeDup query both route
    through here so they cannot desynchronize from the SQL twin.
    ``with_q`` additionally carries the quantized vectors as a list
    column (the SemDeDup sweep needs them downstream)."""
    if len(batch) == 0:
        # np.stack raises on zero rows; keep the typed empty contract
        out = {"vec_id": pd.Series(dtype=np.int64),
               "cluster": pd.Series(dtype=np.int64)}
        if with_q:
            out["q"] = pd.Series(dtype=object)
        return pd.DataFrame(out)
    qi = _quant_int(
        np.stack(batch["embedding"].to_numpy()).astype(np.float64), quant_scale)
    d2 = ((qi[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    out = {
        "vec_id": batch["vec_id"].to_numpy(np.int64),
        "cluster": d2.argmin(axis=1).astype(np.int64),
    }
    if with_q:
        out["q"] = list(qi)
    return pd.DataFrame(out)


def kmeans_integer_assign(
    emb: ray.data.Dataset,
    k: int = 8,
    iters: int = 3,
    quant_scale: float = 1e6,
) -> ray.data.Dataset:
    """Distributed k-means -> (vec_id, cluster) assignments on the pure
    INTEGER quant grid (``ivf_train_integer``): training and assignment
    use int64 L2 distances only, so the whole query is bitwise
    deterministic AND value-exact against a DuckDB oracle that unrolls
    the same Lloyd iterations in SQL integer ops (queries._kmeans_sql)."""
    cent = ivf_train_integer(emb, k, iters, quant_scale)
    if cent.size == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series(dtype=np.int64),
             "cluster": pd.Series(dtype=np.int64)}))

    def _assign(batch: pd.DataFrame, cent=cent, scale=quant_scale) -> pd.DataFrame:
        return integer_assign_batch(batch, cent, scale)

    return emb.map_batches(_assign, batch_format="pandas", batch_size=4096)


def pq_encode_integer(
    emb: ray.data.Dataset,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    quant_scale: float = 1e6,
) -> ray.data.Dataset:
    """Product-quantization ENCODING on the pure integer quant grid:
    per contiguous subspace an integer-domain Lloyd codebook, assignment
    by int64 L2 -- bitwise deterministic AND value-exact against a DuckDB
    oracle that unrolls all m trainers (queries._pq_codes_sql).
    -> (vec_id, code_0..code_{m-1}).

    All m subspace trainers advance JOINTLY: one quantized materialized
    pass, one seed scan, then per Lloyd iteration a SINGLE map_batches
    pass that emits the m fixed-size (k x (d/m + 1)) integer partials
    side by side, and one final pass emitting all m code columns (no
    per-subspace join). m x fewer passes over the corpus than training
    the subspaces sequentially -- the dominant cost at scale -- with
    bitwise-identical output: elementwise rounding commutes with column
    slicing, the seed rows (k smallest vec_ids) are shared by every
    subspace, and each subspace's integer sums/argmins are untouched
    (pinned vs the sequential single-process twin in tests/test_pq.py).
    The float-mean pq_train_encode remains the ADC/topk path with its
    own bitwise twin."""
    head = emb.limit(1).to_pandas()
    if len(head) == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"vec_id": pd.Series(dtype=np.int64)}))
    d = len(head["embedding"].iloc[0])
    bounds = [(si * d // m, (si + 1) * d // m) for si in range(m)]

    def _quant(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(np.int64),
             "q": list(_quant_int(v, quant_scale))})

    quant = emb.map_batches(
        _quant, batch_format="pandas", batch_size=4096).materialize()

    seed_rows = quant.map_batches(
        lambda dd: dd.nsmallest(k, "vec_id"), batch_format="pandas"
    ).to_pandas()
    if len(seed_rows):
        seed_rows = seed_rows.nsmallest(k, "vec_id")
    if len(seed_rows) == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"vec_id": pd.Series(dtype=np.int64)}))
    qseed = np.stack(seed_rows["q"].to_numpy()).astype(np.int64)
    cents = [qseed[:, lo:hi].copy() for lo, hi in bounds]
    kk = len(qseed)

    def _partials(batch: pd.DataFrame, cents=None) -> pd.DataFrame:
        qi = np.stack(batch["q"].to_numpy()).astype(np.int64)
        frames = []
        for si, (lo, hi) in enumerate(bounds):
            sub = qi[:, lo:hi]
            c = cents[si]
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # int64-exact; ties -> lowest
            sums = np.zeros((kk, sub.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, sub)
            frames.append(pd.DataFrame(
                {"si": np.full(kk, si, dtype=np.int64),
                 "cluster": np.arange(kk, dtype=np.int64),
                 "n": np.bincount(assign, minlength=kk).astype(np.int64),
                 "s": list(sums)}))
        return pd.concat(frames, ignore_index=True)

    for _ in range(iters):
        parts = quant.map_batches(
            _partials, fn_kwargs={"cents": cents},
            batch_format="pandas", batch_size=4096,
        ).to_pandas()
        nxt = []
        for si in range(m):
            p = parts[parts["si"] == si]
            g = p.groupby("cluster", sort=True)
            n = g["n"].sum().to_numpy(np.int64)
            s = np.stack(
                g["s"].apply(
                    lambda col: np.sum(np.stack(col.to_numpy()), axis=0)
                ).to_numpy())
            upd = n > 0
            c = cents[si].copy()
            c[upd] = _int_round_div(s[upd], n[upd, None])
            nxt.append(c)
        cents = nxt

    def _assign(batch: pd.DataFrame, cents=cents) -> pd.DataFrame:
        qi = np.stack(batch["q"].to_numpy()).astype(np.int64)
        out = {"vec_id": batch["vec_id"].to_numpy(np.int64)}
        for si, (lo, hi) in enumerate(bounds):
            sub = qi[:, lo:hi]
            d2 = ((sub[:, None, :] - cents[si][None, :, :]) ** 2).sum(axis=2)
            out[f"code_{si}"] = d2.argmin(axis=1).astype(np.int64)
        return pd.DataFrame(out)

    return quant.map_batches(_assign, batch_format="pandas", batch_size=4096)


def _hn_block_mins(
    qa: np.ndarray, ia: np.ndarray, la: np.ndarray,
    qb: np.ndarray, ib: np.ndarray, lb: np.ndarray,
) -> pd.DataFrame:
    """For every anchor row of (qa, ia, la): the nearest row of
    (qb, ib, lb) with a DIFFERENT label, by exact int64 L2 on the quant
    grid (tie -> smaller neg_id). Self-pairs are excluded for free: a
    vector shares its own label. Pure integer matmul so the result is
    bitwise reproducible in SQL."""
    empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                          "label": pd.Series([], dtype=np.int64),
                          "neg_id": pd.Series([], dtype=np.int64),
                          "d2": pd.Series([], dtype=np.int64)})
    if len(ia) == 0 or len(ib) == 0:
        return empty
    d2 = (
        (qa * qa).sum(axis=1)[:, None]
        + (qb * qb).sum(axis=1)[None, :]
        - 2 * (qa @ qb.T)
    )
    big = np.int64(np.iinfo(np.int64).max)
    valid = la[:, None] != lb[None, :]
    d2 = np.where(valid, d2, big)
    md = d2.min(axis=1)
    hit = md < big
    if not hit.any():
        return empty
    cand = np.where(d2[hit] == md[hit][:, None], ib[None, :], big)
    neg = cand.min(axis=1)
    return pd.DataFrame({"vec_id": ia[hit], "label": la[hit],
                         "neg_id": neg.astype(np.int64),
                         "d2": md[hit]})


def cross_class_hard_negatives(
    emb: ray.data.Dataset,
    anchor_mod: int = 10,
    num_blocks: int = 8,
    quant_scale: float = 1e6,
) -> ray.data.Dataset:
    """Hard-negative mining for contrastive training: for every ANCHOR
    vector (vec_id % anchor_mod == 0 -- the deterministic anchor sample
    that keeps the exact scan corpus x anchors, not corpus^2) the nearest
    vector of a DIFFERENT label -> (vec_id, label, neg_id, d2), exact
    int64 L2 on the quant grid. Block-pair Ray tasks over zero-copy Arrow
    refs (the all_pairs_cosine pattern -- no full-matrix broadcast, no
    driver materialization); the partial per-block minima flow back as a
    Dataset and one vec_id-keyed shuffle picks the global argmin. The
    approximate scale path swaps the block cross product for IVF probing
    (ann_ivf_topk); this is the exact baseline."""
    from .groupby import hash_partition_apply

    packed = emb.map_batches(
        lambda t: t.select(["vec_id", "embedding", "label"]),
        batch_format="pyarrow",
    ).repartition(num_blocks)
    refs = packed.to_arrow_refs()

    @ray.remote
    def _task(ta: pa.Table, tb: pa.Table, same: bool) -> pd.DataFrame:
        if ("vec_id" not in ta.column_names
                or "vec_id" not in tb.column_names):
            return _hn_block_mins(*(np.empty((0, 0), np.int64),) * 6)

        def unpack(t: pa.Table):
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                return np.empty((0, 0), np.int64), ids, lab
            q = _quant_int(
                np.stack(t["embedding"].to_pandas().to_numpy()).astype(
                    np.float64), quant_scale)
            return q, ids, lab

        qa, ia, la = unpack(ta)
        qb, ib, lb = unpack(tb)
        am_a = ia % anchor_mod == 0
        parts = [_hn_block_mins(qa[am_a], ia[am_a], la[am_a], qb, ib, lb)]
        if not same:
            am_b = ib % anchor_mod == 0
            parts.append(
                _hn_block_mins(qb[am_b], ib[am_b], lb[am_b], qa, ia, la))
        return pd.concat(parts, ignore_index=True)

    futs = [
        _task.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    partials = ray.data.from_pandas_refs(futs)

    def _argmin(part: pd.DataFrame) -> pd.DataFrame:
        srt = part.sort_values(["vec_id", "d2", "neg_id"], kind="mergesort")
        return srt[srt.groupby("vec_id", sort=False).cumcount() == 0]

    return hash_partition_apply(partials, ["vec_id"], _argmin,
                                stamp_batch_size=None)


def _knn_block_topk(
    qa: np.ndarray, ia: np.ndarray, la: np.ndarray,
    qb: np.ndarray, ib: np.ndarray, lb: np.ndarray, k: int,
) -> pd.DataFrame:
    """For every anchor row of (qa, ia, la): its k nearest rows of
    (qb, ib, lb) by exact int64 L2 on the quant grid, self excluded by
    vec_id, ties broken by smaller neighbor id. Fully vectorized: the
    per-anchor ranking is ONE flat lexsort over (anchor, d2, nn_id)
    followed by a cumcount mask -- no per-row Python loop."""
    empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                          "label": pd.Series([], dtype=np.int64),
                          "nn_id": pd.Series([], dtype=np.int64),
                          "nn_label": pd.Series([], dtype=np.int64),
                          "d2": pd.Series([], dtype=np.int64)})
    na, nb = len(ia), len(ib)
    if na == 0 or nb == 0:
        return empty
    d2 = (
        (qa * qa).sum(axis=1)[:, None]
        + (qb * qb).sum(axis=1)[None, :]
        - 2 * (qa @ qb.T)
    )
    valid = (ia[:, None] != ib[None, :]).ravel()
    if not valid.any():
        return empty
    ai = np.repeat(np.arange(na, dtype=np.int64), nb)[valid]
    d2f = d2.ravel()[valid]
    idf = np.tile(ib, na)[valid]
    labf = np.tile(lb, na)[valid]
    order = np.lexsort((idf, d2f, ai))
    ai, d2f, idf, labf = ai[order], d2f[order], idf[order], labf[order]
    first = np.empty(len(ai), dtype=bool)
    first[:1] = True
    first[1:] = ai[1:] != ai[:-1]
    # position within each anchor's sorted candidate run
    starts = np.flatnonzero(first)
    pos = np.arange(len(ai)) - np.repeat(starts, np.diff(
        np.append(starts, len(ai))))
    keep = pos < k
    return pd.DataFrame({"vec_id": ia[ai[keep]], "label": la[ai[keep]],
                         "nn_id": idf[keep], "nn_label": labf[keep],
                         "d2": d2f[keep]})


def knn_label_audit(
    emb: ray.data.Dataset,
    k: int = 3,
    num_blocks: int = 8,
    quant_scale: float = 1e6,
) -> ray.data.Dataset:
    """Label-noise detection by exact k-NN majority vote (the Confident
    Learning / cleanlab-style audit a labeled training set runs before
    fine-tuning): for every vector its k exact nearest neighbors (int64
    L2 on the quant grid, self excluded, ties -> smaller id), then
    -> (vec_id, label, maj_label, n_same, noisy) where maj_label is the
    most common neighbor label (tie -> smaller label), n_same counts
    neighbors sharing the vector's own label and noisy=1 iff NO neighbor
    agrees. Exact-scan tier: block-pair Ray tasks over zero-copy Arrow
    refs emit per-block top-k partials; one vec_id-keyed shuffle reduces
    to the global top-k and votes. The 100x scale path swaps the block
    cross product for IVF probing (ann_ivf_topk) -- same reduce."""
    from .groupby import hash_partition_apply

    packed = emb.map_batches(
        lambda t: t.select(["vec_id", "embedding", "label"]),
        batch_format="pyarrow",
    ).repartition(num_blocks)
    refs = packed.to_arrow_refs()

    @ray.remote
    def _task(ta: pa.Table, tb: pa.Table, same: bool) -> pd.DataFrame:
        def unpack(t: pa.Table):
            if "vec_id" not in t.column_names or t.num_rows == 0:
                z = np.empty(0, np.int64)
                return np.empty((0, 0), np.int64), z, z
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            q = _quant_int(
                np.stack(t["embedding"].to_pandas().to_numpy()).astype(
                    np.float64), quant_scale)
            return q, ids, lab

        qa, ia, la = unpack(ta)
        qb, ib, lb = unpack(tb)
        parts = [_knn_block_topk(qa, ia, la, qb, ib, lb, k)]
        if not same:
            parts.append(_knn_block_topk(qb, ib, lb, qa, ia, la, k))
        return pd.concat(parts, ignore_index=True)

    futs = [
        _task.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    partials = ray.data.from_pandas_refs(futs)

    def _vote(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype=np.int64),
                "label": pd.Series([], dtype=np.int64),
                "maj_label": pd.Series([], dtype=np.int64),
                "n_same": pd.Series([], dtype=np.int64),
                "noisy": pd.Series([], dtype=np.int64)})
        srt = part.sort_values(["vec_id", "d2", "nn_id"], kind="mergesort")
        top = srt[srt.groupby("vec_id", sort=False).cumcount() < k]
        votes = top.groupby(["vec_id", "label", "nn_label"],
                            as_index=False, sort=False).size()
        votes = votes.sort_values(["vec_id", "size", "nn_label"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
        maj = votes[votes.groupby("vec_id", sort=False).cumcount() == 0]
        same = (votes[votes["nn_label"] == votes["label"]]
                .set_index("vec_id")["size"])
        out = maj.rename(columns={"nn_label": "maj_label"})[
            ["vec_id", "label", "maj_label"]].copy()
        out["n_same"] = (
            out["vec_id"].map(same).fillna(0).astype(np.int64))
        out["noisy"] = (out["n_same"] == 0).astype(np.int64)
        return out

    return hash_partition_apply(partials, ["vec_id"], _vote,
                                stamp_batch_size=None)
