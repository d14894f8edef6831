"""Text analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All stateless vectorized ``map_batches`` except LangId (compiled profiles
held per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..context import pool_size

from ..functions.hashing import rolling_fingerprint
from ..functions.tokenize import flat_tokens
from ..sources.gazetteer import STOPWORDS


def _count_tokens(batch: pa.Table) -> pa.Table:
    _, parent_np = flat_tokens(batch["text"])
    n = batch.num_rows
    counts = np.bincount(parent_np, minlength=n).astype(np.int64)
    return pa.table({"doc_id": batch["doc_id"], "n_tokens": pa.array(counts)})


def token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens): whitespace-token count, \\S+ semantics."""
    return docs.map_batches(_count_tokens, batch_format="pyarrow")


# BPE-ish pre-tokenizer: letter runs | digit runs | punctuation runs
# (the GPT-2-style split simplified to RE2-compatible explicit classes so
# the DuckDB oracle can run the identical pattern)
# the whitespace class is spelled out because \s diverges between engines:
# RE2 (DuckDB, Arrow) \s = [ \t\n\f\r] while Python's ASCII \s adds \v
# (\x0b) -- an explicit class compiles to identical semantics in both, so
# the SQL twin interpolates THIS string (queries.oracle_sql)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]+"


def _count_bpe(batch: pa.Table) -> pa.Table:
    import re

    pat = re.compile(BPE_PATTERN)
    texts = batch["text"].to_numpy(zero_copy_only=False)
    counts = np.fromiter(
        (len(pat.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
    )
    return pa.table({"doc_id": batch["doc_id"], "n_bpe_tokens": pa.array(counts)})


def bpe_token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens): BPE-style pre-tokenization count."""
    return docs.map_batches(_count_bpe, batch_format="pyarrow")


def _quality(batch: pa.Table) -> pa.Table:
    text = pc.fill_null(batch["text"], "")
    flat_f, parent_np = flat_tokens(text)
    n = batch.num_rows
    n_tokens = np.bincount(parent_np, minlength=n).astype(np.int64)
    is_stop = pc.is_in(flat_f, value_set=pa.array(list(STOPWORDS))).to_numpy(zero_copy_only=False)
    stop_cnt = np.bincount(parent_np[is_stop], minlength=n).astype(np.int64)
    n_chars = pc.utf8_length(text).to_numpy().astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "stopword_cnt": pa.array(stop_cnt),
        }
    )


def quality_scores(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_chars, n_tokens, stopword_cnt) -- integer quality signals
    (length / stopword ratios are derived downstream; integers keep exact
    oracle parity)."""
    return docs.map_batches(_quality, batch_format="pyarrow")


# character-trigram profiles per language (tiny deterministic stand-in for a
# real n-gram model; container has no langid lib)
_LANG_PROFILES = {
    "en": ("the", " th", "ing", "and", " an"),
    "de": ("der", "die", "und", "sch", "ein"),
    "fr": ("les", " de", "ent", "que", " la"),
    "es": (" de", "los", " la", "que", "ión"),
    "zh": (),  # CJK: detected by codepoint range instead
}


class LangId:
    """Actor-pool language-ID heuristic: trigram profiles compiled once per
    actor; per-batch vectorized scoring."""

    def __init__(self):
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").str.lower()
        scores = pd.DataFrame(index=batch.index)
        for lang, grams in self.profiles.items():
            s = None
            for g in grams:
                c = texts.str.count(g, flags=0) if g else 0
                s = c if s is None else s + c
            scores[lang] = s
        cjk = texts.str.contains(r"[一-鿿]", regex=True)
        pred = scores.idxmax(axis=1).where(scores.max(axis=1) > 0, "und")
        pred = pred.mask(cjk, "zh")
        return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})


def lang_id(docs: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    # profiles are a handful of strings: prebuilt instance on elastic tasks
    # (no actor-pool startup; the class stays the API for big real models,
    # pass it with concurrency=N then)
    return docs.map_batches(LangId(), batch_format="pandas")


def _fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
    fps = np.fromiter(
        (rolling_fingerprint(t or "") & 0x7FFFFFFFFFFFFFFF for t in batch["text"]),
        dtype=np.int64,
        count=len(batch),
    )
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, fingerprint): deterministic rolling-hash document id."""
    return docs.map_batches(_fingerprint, batch_format="pandas")


def hash_split(
    docs: ray.data.Dataset,
    key_col: str = "doc_id",
    ratios: tuple[float, float, float] = (0.9, 0.05, 0.05),
    salt: str = "split",
) -> ray.data.Dataset:
    """Leakage-safe deterministic train/val/test assignment -> input columns
    + ``split`` in {train, val, test}.

    The split is a pure function of the KEY (codepoint-polynomial hash of
    salt+key, mod 10000 against cumulative ratio thresholds), so every row
    sharing a key lands in the same split on every machine and every run --
    the grouping key (conv_id, dedup cluster rep, ...) is how a pipeline
    keeps near-duplicates out of eval. Embarrassingly parallel, no shuffle;
    the hash recurrence is the same one the fingerprint oracle reproduces
    in SQL, so the assignment itself is value-oracle-able."""
    import numpy as np

    from ..functions.hashing import polyhash64

    t1 = int(round(ratios[0] * 10000))
    t2 = t1 + int(round(ratios[1] * 10000))

    def _assign(df):
        keys = np.array([salt + str(k) for k in df[key_col]], dtype=object)
        # multiplicative finisher: the raw polyhash of consecutive integer
        # keys is itself consecutive (only the last codepoint differs), so
        # neighbors would stripe into the same split; one odd-constant
        # multiply mod 2^64 (Weyl step, odd constant < 2^62 so the SQL
        # twin's INT128 product cannot overflow -- still pure mul/mod, so the SQL
        # twin reproduces it) scatters neighbors across the whole range
        with np.errstate(over="ignore"):
            h = (polyhash64(keys) * np.uint64(2177342782468422677)) % np.uint64(10000)
        split = np.where(h < t1, "train", np.where(h < t2, "val", "test"))
        out = df.copy()
        out["split"] = split
        return out

    return docs.map_batches(_assign, batch_format="pandas")


def _token_rows(batch: pa.Table) -> pd.DataFrame:
    """(doc_id, t) for every whitespace token (multiset; \\S+ semantics --
    the Arrow split emits "" for empty/whitespace-only docs, which \\S+
    never matches, so empty tokens are dropped)."""
    flat_a, parent = flat_tokens(batch["text"], fill_null=True)
    flat = flat_a.to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy()
    return pd.DataFrame({"doc_id": doc_ids[parent], "t": flat})


def token_frequencies(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus-global token frequencies -> (t, freq) Dataset
    (vocabulary-sized; the TF side of quality/commonness signals)."""
    from .groupby import hash_partition_aggregate

    toks = docs.map_batches(_token_rows, batch_format="pyarrow")
    return hash_partition_aggregate(
        toks, ["t"], {"freq": ("t", "count")}, stamp_batch_size=None
    )


def doc_commonness(
    docs: ray.data.Dataset, broadcast_max_bytes: int = 256 << 20
) -> ray.data.Dataset:
    """Corpus-statistics enrichment -> (doc_id, n_tokens, freq_sum): per-doc
    token count and the SUM of each token's corpus-global frequency -- the
    exact-integer backbone of rare-token / perplexity-style quality filters
    (avg corpus frequency = freq_sum / n_tokens, derived downstream so the
    oracle stays integer-exact).

    Two tiers on the vocabulary side: broadcast the (t, freq) table via
    ``ray.put`` when it fits ``broadcast_max_bytes`` (one shuffle total);
    above that, co-partition token rows against the frequency table with a
    bucketed hash join and aggregate per doc (no vocabulary-sized object
    anywhere on the driver)."""
    from .groupby import hash_partition_aggregate
    from .join import bucketed_hash_join

    freq = token_frequencies(docs).materialize()

    def _doc_sums(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_tokens=("freq", "size"), freq_sum=("freq", "sum")
        )
        g["n_tokens"] = g["n_tokens"].astype(np.int64)
        g["freq_sum"] = g["freq_sum"].astype(np.int64)
        return g

    if freq.size_bytes() <= broadcast_max_bytes:
        fdf = freq.to_pandas()
        if len(fdf) == 0 and "freq" not in fdf.columns:
            # zero-block frequency table lost its schema (empty corpus)
            fdf = pd.DataFrame(
                {"t": pd.Series(dtype=object), "freq": pd.Series(dtype="int64")}
            )
        freq_ref = ray.put(
            pd.Series(fdf["freq"].to_numpy(np.int64), index=fdf["t"].to_numpy())
        )

        def _enrich(batch: pa.Table, freq_ref=freq_ref) -> pd.DataFrame:
            rows = _token_rows(batch)
            s = ray.get(freq_ref)
            rows["freq"] = s.reindex(rows["t"].to_numpy()).to_numpy(np.int64)
            out = _doc_sums(rows)
            # docs with zero tokens still appear, with zeros
            all_ids = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
            out = all_ids.merge(out, on="doc_id", how="left").fillna(0)
            out["n_tokens"] = out["n_tokens"].astype(np.int64)
            out["freq_sum"] = out["freq_sum"].astype(np.int64)
            return out

        return docs.map_batches(_enrich, batch_format="pyarrow")

    # join tier: token rows ⨝ freq by token, then per-doc aggregate
    toks = docs.map_batches(_token_rows, batch_format="pyarrow")
    joined = bucketed_hash_join(toks, freq, "t", "t")
    sums = hash_partition_aggregate(
        joined.map_batches(lambda d: d[["doc_id", "freq"]], batch_format="pandas"),
        ["doc_id"],
        {"freq_sum": ("freq", "sum"), "n_tokens": ("freq", "count")},
        stamp_batch_size=None,
    )
    # re-attach zero-token docs
    ids = docs.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    out = bucketed_hash_join(ids, sums, "doc_id", "doc_id", how="left")
    return out.map_batches(
        lambda d: pd.DataFrame(
            {
                "doc_id": d["doc_id"].to_numpy(np.int64),
                "n_tokens": d["n_tokens"].fillna(0).to_numpy(np.int64),
                "freq_sum": d["freq_sum"].fillna(0).to_numpy(np.int64),
            }
        ),
        batch_format="pandas",
    )


def weighted_sample(
    ds: ray.data.Dataset,
    key_col: str = "doc_id",
    weight_col: str = "n_tokens",
    scale: int = 50,
    salt: str = "wsample",
) -> ray.data.Dataset:
    """Deterministic importance sampling: keep a row with probability
    min(1, weight*scale/10000), decided by the same keyed hash as
    ``hash_split`` -- reproducible across runs/machines and independent of
    partitioning (the data-mixing primitive: upweight long/rare-source
    docs without an RNG the oracle can't replay)."""
    from ..functions.hashing import polyhash64

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = np.array([salt + str(k) for k in df[key_col]], dtype=object)
        with np.errstate(over="ignore"):
            h = (polyhash64(keys) * np.uint64(2177342782468422677)) % np.uint64(10000)
        thresh = np.minimum(10000, df[weight_col].to_numpy(dtype=np.int64) * scale)
        return df[h.astype(np.int64) < thresh]

    return ds.map_batches(_keep, batch_format="pandas")


def mixture_sample(
    ds: ray.data.Dataset,
    weights: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    hash_mod: int = 1_000_000,
    weight_scale: int = 10_000,
) -> ray.data.Dataset:
    """Deterministic mixture rebalancing: downsample each source so the
    kept corpus approaches the target mixture ``weights`` (integer weights,
    any scale) WITHOUT upsampling.

    Exact integer rate derivation (SQL-reproducible end to end):
      n_s        = COUNT(*) per source (distributed, exact)
      C          = min_s floor(n_s * weight_scale / w_s)   -- the largest
                   total the target mixture supports with rate <= 1
      target_s   = floor(C * w_s / weight_scale)
      thresh_s   = floor(hash_mod * target_s / n_s)
      keep row  <=> keyed_hash(salt+key) % hash_mod < thresh_s
    The keep decision is the hash_split mul/mod recurrence -- a pure
    function of the key, independent of partitioning, no RNG.

    Scale shape: the per-source count is a distributed aggregate whose
    result is #sources-sized (the gazetteer-broadcast discipline:
    driver holds only the vocabulary-scale table, thresholds ship to the
    elastic filter tasks in the closure); the filter pass itself is
    embarrassingly parallel. Sources absent from ``weights`` get weight 0
    (dropped) -- the domain-blocklist special case.
    """
    from ..functions.hashing import polyhash64

    counts = {
        r[source_col]: int(r["count()"])
        for r in ds.groupby(source_col).count().take_all()
    }
    rates = {}
    c = None
    for s, n in counts.items():
        w = int(weights.get(s, 0))
        if w > 0:
            c_s = n * weight_scale // w
            c = c_s if c is None else min(c, c_s)
    for s, n in counts.items():
        w = int(weights.get(s, 0))
        if w <= 0 or c is None:
            rates[s] = 0
        else:
            target = c * w // weight_scale
            rates[s] = hash_mod * target // n

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = np.array([salt + str(k) for k in df[key_col]], dtype=object)
        with np.errstate(over="ignore"):
            h = (polyhash64(keys) * np.uint64(2177342782468422677)) % np.uint64(
                hash_mod
            )
        thresh = df[source_col].map(rates).fillna(0).to_numpy(np.int64)
        return df[h.astype(np.int64) < thresh]

    return ds.map_batches(_keep, batch_format="pandas")


def chunk_documents(
    docs: ray.data.Dataset,
    chunk_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Context-window chunking: split each doc into consecutive
    ``chunk_tokens``-token windows -> (doc_id, chunk_idx, chunk_text,
    n_tokens). The truncation/packing primitive of a training pipeline --
    long docs become multiple training rows instead of being clipped.

    Embarrassingly parallel (doc-local, no shuffle) and fully
    Arrow-vectorized: one flat-token explode (the shared tokenize kernel),
    chunk boundaries as a ListArray offsets vector, one
    ``pc.binary_join`` to re-assemble chunk texts. Rows scale with token
    count exactly as the shingle stages do; zero-token docs produce no
    rows.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.tokenize import flat_tokens

    def _chunk(t: pa.Table) -> pa.Table:
        flat, parent = flat_tokens(t[text_col], fill_null=True)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(parent)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_idx": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
            }
        )
        if n == 0:
            return empty
        # within-doc token position (vectorized run reset at doc changes)
        starts = np.zeros(n, dtype=np.int64)
        newdoc = np.flatnonzero(np.diff(parent)) + 1
        starts[newdoc] = newdoc
        starts = np.maximum.accumulate(starts)
        pos = np.arange(n, dtype=np.int64) - starts
        # a chunk starts at every in-doc position that is a multiple of C
        head = np.flatnonzero(pos % chunk_tokens == 0)
        offsets = np.concatenate([head, [n]]).astype(np.int32)
        chunk_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), flat), " "
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[parent[head]], type=pa.int64()),
                "chunk_idx": pa.array(pos[head] // chunk_tokens, type=pa.int64()),
                "chunk_text": chunk_text,
                "n_tokens": pa.array(np.diff(offsets).astype(np.int64)),
            }
        )

    return docs.map_batches(_chunk, batch_format="pyarrow")


def inverted_index(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Corpus inverted index -> (token, df, postings) where ``postings`` is
    the comma-joined ascending doc-id list of docs containing the token
    (distinct containment, not term frequency).

    Scale shape: flat-token explode + per-batch (token, doc) dedup, ONE
    hash-partition shuffle on the token, per-partition vectorized sort +
    C-level groupby join. Posting lists ride their token's partition --
    a hot token's list is partition-local, never driver-side; the classic
    retrieval-index build re-expressed as a Dataset transform.
    """
    import pyarrow as pa

    from ..functions.tokenize import flat_tokens
    from .groupby import hash_partition_apply

    def _explode(t: pa.Table) -> pa.Table:
        flat, parent = flat_tokens(t[text_col], fill_null=True)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pd.DataFrame({"token": flat.to_pandas(), "doc_id": ids[parent]})
        # map-side distinct: shrink before the shuffle
        out = out.drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def _index(part: pd.DataFrame) -> pa.Table:
        part = part.drop_duplicates().sort_values(
            ["token", "doc_id"], kind="mergesort"
        )
        if len(part) == 0:
            return pa.table(
                {
                    "token": pa.array([], type=pa.string()),
                    "df": pa.array([], type=pa.int64()),
                    "postings": pa.array([], type=pa.string()),
                }
            )
        toks = part["token"].to_numpy()
        n = len(toks)
        head = np.concatenate([[0], np.flatnonzero(toks[1:] != toks[:-1]) + 1])
        offsets = np.concatenate([head, [n]]).astype(np.int32)
        ids_str = pa.array(part["doc_id"].astype(str).to_numpy(dtype=object))
        postings = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), ids_str), ","
        )
        return pa.table(
            {
                "token": pa.array(toks[head]),
                "df": pa.array(np.diff(offsets).astype(np.int64)),
                "postings": postings,
            }
        )

    return hash_partition_apply(
        docs.map_batches(_explode, batch_format="pyarrow"),
        ["token"],
        _index,
        num_partitions,
    )


def sequence_pack_offsets(
    docs: ray.data.Dataset,
    context_tokens: int = 512,
    pack_partitions: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Token-stream sequence packing layout (the GPT-style packer): within
    each deterministic pack partition (``doc_id % pack_partitions`` -- mod,
    not hash, so the layout is reproducible anywhere) docs are concatenated
    in doc-id order and the stream is cut every ``context_tokens`` tokens;
    docs may straddle a cut. Emits per doc:
    (doc_id, pack_partition, n_tokens, start_offset, end_offset,
    first_bin, last_bin) -- everything a writer needs to materialize packed
    training rows without ever holding the stream.

    Fully vectorized: per-doc token counts (shared kernel), ONE
    hash-partition shuffle on the pack partition, per-partition sort +
    cumsum. The greedy never-split packer is sequential by nature; this
    offset layout is the scalable equivalent (pure prefix sum) and is what
    large trainers actually use.
    """
    from .groupby import hash_partition_apply

    def _count(t: pa.Table) -> pa.Table:
        # flat_tokens is a module-top import: a relative import INSIDE a
        # worker closure raises ModuleNotFoundError under foreign-cwd
        # by-value pickling (verify-skill gotcha)
        _, parent = flat_tokens(t[text_col], fill_null=True)
        n = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "p": pa.array(ids % pack_partitions),
                "n_tokens": pa.array(n),
            }
        )

    def _pack(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["p", "doc_id"], kind="mergesort")
        n = part["n_tokens"].to_numpy(np.int64)
        # per-p cumsum (reset at partition-key change, vectorized)
        cum = np.cumsum(n)
        pvals = part["p"].to_numpy(np.int64)
        new_p = np.flatnonzero(np.diff(pvals)) + 1
        base = np.zeros(len(part), dtype=np.int64)
        base[new_p] = cum[new_p - 1]
        base = np.maximum.accumulate(base)
        cum = cum - base
        start = cum - n
        last = np.where(n > 0, (cum - 1) // context_tokens, start // context_tokens)
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"].to_numpy(np.int64),
                "pack_partition": pvals,
                "n_tokens": n,
                "start_offset": start,
                "end_offset": cum,
                "first_bin": start // context_tokens,
                "last_bin": last,
            }
        )

    return hash_partition_apply(
        docs.map_batches(_count, batch_format="pyarrow"), ["p"], _pack
    )


def bm25_topk(
    docs: ray.data.Dataset,
    terms: tuple[str, ...],
    k: int = 20,
) -> pd.DataFrame:
    """BM25 top-k lexical retrieval (the classic training-data mining /
    retrieval-based-decontamination primitive) for a fixed query-term set
    -> the k best-matching docs as (doc_id, score_milli), score DESC then
    doc_id ASC, matching docs only (score > 0).

    Exact integer contract (Lucene-form BM25, k1 = 6/5, b = 3/4, both
    exact rationals), so the DuckDB twin is value-exact:

    - ``avgdl_micro = (2*S*10^6 + N) // (2*N)`` -- half-up integer micro
      grid over total tokens S and doc count N.
    - ``idf_milli(t) = floor(1000*ln(1 + (2(N-df)+1)/(2df+1)) + 0.5)`` --
      the always-positive +1 idf; the float tail (int->double casts, one
      division, add, ln) is bitwise CPython==DuckDB, the HLL-precedent
      rule, pinned over a (N, df) sweep in tests/test_textstats_bm25.py.
    - per (doc, term): with A = avgdl_micro the exact-rational tf
      normalization collapses to one integer floor division:
      ``idf_milli * 22*A*tf // (10*A*tf + 3*A + 9*10^6*dl)``
      (derivation: 1-b+b*dl/avgdl = (A+3e6*dl)/(4A); k1*(...) =
      (3A+9e6*dl)/(10A); tf*(k1+1) = 22*tf/10). All positive, so numpy
      and SQL integer division agree. int64-safe while
      idf_milli*22*A*tf < 2^63 (holds to ~10^3-token avg docs, tf 10^3,
      idf 30; the SQL twin runs the same products in HUGEINT).
    - score_milli = sum over terms: an order-free integer sum.

    Scale shape: ONE tokenize pass emits a fixed-schema per-doc row
    (doc_id, dl, tf per query term -- q known up front), materialized
    once; corpus stats (N, S, df_t) are a blocks-bounded one-row-partial
    reduce; idf/avgdl broadcast as plain kwargs; scoring is a stateless
    map; the head is per-block partial top-k re-reduced on the driver
    (every global top-k row is in some block's top-k). ZERO all-to-all
    shuffles, nothing corpus-scaled on the driver.
    """
    q = len(terms)
    tf_cols = [f"tf{i}" for i in range(q)]
    if q == 0:
        # no query terms -> no positive score is possible; return the
        # typed empty head without touching the corpus (max(idf) below
        # would raise on the empty list)
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "score_milli": pd.Series(dtype=np.int64)}
        )

    def _perdoc(t: pa.Table, terms=tuple(terms)) -> pa.Table:
        flat, parent = flat_tokens(t["text"], fill_null=True)
        n = t.num_rows
        dl = np.bincount(parent, minlength=n).astype(np.int64)
        cols = {
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            "dl": dl,
        }
        for i, term in enumerate(terms):
            hit = parent[pc.equal(flat, term).to_numpy(zero_copy_only=False)]
            cols[f"tf{i}"] = np.bincount(hit, minlength=n).astype(np.int64)
        return pa.table(cols)

    perdoc = docs.map_batches(_perdoc, batch_format="pyarrow").materialize()

    def _stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(np.int64)
        row = {
            "n": np.int64(len(df)),
            "s": dl.sum(),
            "dlmax": dl.max() if len(dl) else np.int64(0),
        }
        for c in tf_cols:
            row[f"df_{c}"] = np.int64((df[c].to_numpy(np.int64) > 0).sum())
        return pd.DataFrame([row])

    st_df = perdoc.map_batches(
        _stat_partial, batch_format="pandas", batch_size=None
    ).to_pandas()
    empty = pd.DataFrame(
        {"doc_id": pd.Series(dtype=np.int64),
         "score_milli": pd.Series(dtype=np.int64)}
    )
    # a zero-block Dataset loses its schema on the driver pull
    if len(st_df) == 0:
        return empty
    st = st_df.sum()
    n_docs, s_tokens = int(st["n"]), int(st["s"])
    dl_max = int(st_df["dlmax"].max())
    if n_docs == 0:
        return empty
    a = (2 * s_tokens * 1_000_000 + n_docs) // (2 * n_docs)
    if a == 0:
        # all-empty corpus: s_tokens == 0 so every dl/tf is 0, every score
        # is 0, and the denominator would hit 0 // 0 (the SQL twin's
        # NULL-scored rows fail `> 0` the same way) -- short-circuit
        return empty
    import math

    idf = [
        int(math.floor(
            1000.0 * math.log(
                1.0 + (2.0 * (n_docs - int(st[f"df_{c}"])) + 1.0)
                / (2.0 * int(st[f"df_{c}"]) + 1.0)
            ) + 0.5
        ))
        for c in tf_cols
    ]
    # tf <= dl <= dl_max, so these exact Python-int bounds cover every
    # int64 product/sum in _score below; the HUGEINT twin stays exact past
    # 2**63, so overflow here must be a loud error, not a silent
    # wrap/misrank (needs avgdl ~ 4e5 tokens to trip)
    num_bound = max(idf) * 22 * a * max(dl_max, 1)
    den_bound = 10 * a * dl_max + 3 * a + 9_000_000 * dl_max
    if max(num_bound, den_bound) >= 2**63:
        raise OverflowError(
            "bm25_topk int64 grid exceeded: "
            f"max(idf)={max(idf)} a={a} dl_max={dl_max}"
        )

    def _score(df: pd.DataFrame, a=a, idf=tuple(idf), k=k) -> pd.DataFrame:
        dl = df["dl"].to_numpy(np.int64)
        score = np.zeros(len(df), dtype=np.int64)
        for i, c in enumerate(tf_cols):
            tf = df[c].to_numpy(np.int64)
            score += (idf[i] * 22 * a * tf) // (10 * a * tf + 3 * a + 9_000_000 * dl)
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "score_milli": score}
        )
        out = out[out["score_milli"] > 0]
        # per-block partial top-k: the global head is a subset of the
        # per-block heads, so the driver pull is blocks x k rows
        return out.sort_values(
            ["score_milli", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    head = perdoc.map_batches(
        _score, batch_format="pandas", batch_size=None
    ).to_pandas()
    if len(head) == 0:
        return empty
    return (
        head.sort_values(["score_milli", "doc_id"], ascending=[False, True],
                         kind="mergesort")
        .head(k)
        .reset_index(drop=True)
        .astype({"doc_id": np.int64, "score_milli": np.int64})
    )
