"""Gazetteer + alias dictionary tables (analogues of sitelinks / titles /
redirects, reference entities.go:151-220, titles.go:26-115, titles.go:394-483).

The gazetteer is DERIVED from the corpus itself by a pure, SQL-expressible
rule so the DuckDB oracle can rebuild the identical table: token frequency
over ``documents.text`` (tokens = ``\\S+`` runs), stopwords dropped, top-N by
(count desc, surface asc), qid = 'Q' + rank. Popularity ``prior`` = count
(the qviews-like prior driving linking ties).

Computation is Ray-Data-native with map-side combine: per-batch token
value_counts (partial aggregate) -> small groupby sum -> driver-side ranking
of the tiny distinct-surface table (guide: pre-aggregate before a shuffle).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import flat_tokens, kgram_join, kgram_starts
from .tables import read_table

GAZETTEER_TOP_N = 30
STOPWORDS = ("the", "a")

def tokens_of_batch(text_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """All \\S+ tokens of a string column, flattened (shared kernel in
    functions.tokenize; ascii whitespace split == RE2 \\s+, the oracle's
    regexp_extract_all('\\S+'))."""
    flat, _ = flat_tokens(text_col)
    return flat


def _partial_counts(batch: pa.Table) -> pa.Table:
    toks = tokens_of_batch(batch["text"])
    vc = toks.value_counts()
    return pa.table(
        {
            "surface": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def _schemaful_partials(partial_df: pd.DataFrame) -> pd.DataFrame:
    """An all-empty Dataset loses its schema through to_pandas (zero
    blocks); restore the (surface, cnt) columns so an EMPTY corpus yields
    an empty gazetteer instead of a KeyError deep in the merge."""
    if len(partial_df) == 0 and "surface" not in partial_df.columns:
        return pd.DataFrame(
            {"surface": pd.Series(dtype=object), "cnt": pd.Series(dtype="int64")}
        )
    return partial_df


def merge_token_partials(partial_df: pd.DataFrame, top_n: int) -> pd.DataFrame:
    """Driver-side final combine of per-batch token-count partials (the
    mergeable-sketch pattern: partials are vocabulary-sized, so the merge is
    trivially small -- Ray's Aggregate operator costs ~0.2s per input block
    and would dominate here)."""
    partial_df = _schemaful_partials(partial_df)
    df = partial_df.groupby("surface", as_index=False)["cnt"].sum()
    df = df[~df["surface"].isin(STOPWORDS)]
    return _rank_surface_counts(df, top_n)


def _rank_surface_counts(df: pd.DataFrame, top_n: int) -> pd.DataFrame:
    """(surface, cnt) -> gazetteer frame: top_n by (cnt desc, surface asc),
    qid = 'Q' + rank. Shared final step of both merge tiers."""
    df = df.sort_values(["cnt", "surface"], ascending=[False, True], kind="mergesort")
    df = df.head(top_n).reset_index(drop=True)
    return pd.DataFrame(
        {
            "qid": pd.Series(
                ["Q" + str(i + 1) for i in range(len(df))], dtype=object
            ),
            "surface": pd.Series(df["surface"].to_numpy(), dtype=object),
            "prior": df["cnt"].astype("int64").to_numpy(),
        }
    )


# above this many partial rows (blocks x per-block vocab) the driver merge
# would pull an unbounded table; the distributed tier takes over
DRIVER_MERGE_MAX_PARTIAL_ROWS = 2_000_000


def merge_token_partials_distributed(partial, top_n: int) -> pd.DataFrame:
    """Distributed final combine for LARGE vocabularies (round-3 VERDICT
    item 3): hash-partitioned exact aggregate over (surface, cnt) partials,
    then per-output-block top-N candidates -- exact for the GLOBAL top-N
    because after hash partitioning every surface's complete count lives in
    exactly one block -- so the driver sees only blocks x top_n candidate
    rows, never the distinct-surface table. Same (cnt desc, surface asc)
    rule as merge_token_partials; tier equality pinned in tests."""
    from ..stages.groupby import hash_partition_aggregate

    agg = hash_partition_aggregate(
        partial, ["surface"], {"cnt": ("cnt", "sum")}, stamp_batch_size=None
    )

    def _candidates(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t["surface"], value_set=pa.array(STOPWORDS)))
        t = t.filter(mask)
        order = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("surface", "ascending")]
        )
        return t.take(order.slice(0, top_n))

    cand = agg.map_batches(
        _candidates, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    cand = _schemaful_partials(cand)
    return _rank_surface_counts(cand, top_n)


def build_gazetteer(sf_dir: str, top_n: int = GAZETTEER_TOP_N) -> pd.DataFrame:
    """-> DataFrame(qid, surface, prior) with qid='Q'+rank, rank by
    (count desc, surface asc). Map-side partial value_counts per batch,
    driver-side merge of the tiny partials."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    partial = docs.map_batches(_partial_counts, batch_format="pyarrow")
    return merge_token_partials(partial.to_pandas(), top_n)


BIGRAM_TOP_N = 15
BIGRAM_QID_OFFSET = 100


def _partial_ngram_counts(batch: pa.Table, k: int) -> pa.Table:
    """Per-batch adjacent-token k-gram counts (map-side combine),
    vectorized: one whitespace split, k-1 object-array concats over
    same-doc positions."""
    flat_a, parent = flat_tokens(batch["text"])
    empty = pa.table({"surface": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    # k-gram starts where endpoints share a doc (positions are contiguous)
    idxs = kgram_starts(parent, k)
    if not len(idxs):
        return empty
    toks = np.asarray(flat_a.to_numpy(zero_copy_only=False), dtype=object)
    cand = kgram_join(toks, idxs, k)
    vc = pd.Series(cand).value_counts()
    return pa.table(
        {
            "surface": pa.array(vc.index.to_numpy(), type=pa.string()),
            "cnt": pa.array(vc.to_numpy().astype(np.int64)),
        }
    )


def _partial_bigram_counts(batch: pa.Table) -> pa.Table:
    return _partial_ngram_counts(batch, 2)


def merge_bigram_partials(
    partial_df: pd.DataFrame, top_n: int = BIGRAM_TOP_N, offset: int = BIGRAM_QID_OFFSET
) -> pd.DataFrame:
    """Driver-side merge of the (vocabulary-sized) bigram partials; qid
    space offset so phrase entities never collide with unigram qids."""
    partial_df = _schemaful_partials(partial_df)
    df = partial_df.groupby("surface", as_index=False)["cnt"].sum()
    df = df.sort_values(["cnt", "surface"], ascending=[False, True], kind="mergesort")
    df = df.head(top_n).reset_index(drop=True)
    return pd.DataFrame(
        {
            "qid": pd.Series(
                ["Q" + str(offset + i + 1) for i in range(len(df))], dtype=object
            ),
            "surface": pd.Series(df["surface"].to_numpy(), dtype=object),
            "prior": df["cnt"].astype("int64").to_numpy(),
        }
    )


def build_bigram_gazetteer(
    sf_dir: str, top_n: int = BIGRAM_TOP_N, offset: int = BIGRAM_QID_OFFSET
) -> pd.DataFrame:
    """Top-N adjacent-token bigram surfaces -> (qid, surface, prior) with
    qid = 'Q' + (offset + rank) -- the multi-word dictionary analogue of the
    reference's multi-word titles (titles.go:26-115)."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    partial = docs.map_batches(_partial_bigram_counts, batch_format="pyarrow")
    return merge_bigram_partials(partial.to_pandas(), top_n, offset)


# arbitrary-length phrase surfaces: qid offset per length keeps the phrase
# entity spaces disjoint (2 -> Q101.., 3 -> Q201.., 4 -> Q301..)
NGRAM_TOP_N = 10
NGRAM_QID_OFFSET = {3: 200, 4: 300}


def build_ngram_gazetteer(
    sf_dir: str, k: int, top_n: int = NGRAM_TOP_N, offset: int | None = None
) -> pd.DataFrame:
    """Top-N adjacent-token k-gram surfaces -> (qid, surface, prior),
    qid = 'Q' + (offset + rank): the arbitrary-length dictionary-key
    analogue of the reference's multi-word titles (titles.go:26-115, e.g.
    3+-token namespace-prefixed titles titles.go:160-169)."""
    if offset is None:
        offset = NGRAM_QID_OFFSET[k]
    docs = read_table(sf_dir, "documents", columns=["text"])
    partial = docs.map_batches(
        lambda b, k=k: _partial_ngram_counts(b, k), batch_format="pyarrow"
    )
    return merge_bigram_partials(partial.to_pandas(), top_n, offset)


def build_aliases(gazetteer: pd.DataFrame) -> pd.DataFrame:
    """Deterministic redirect/alias chains over the derived qid space
    (analogue of redirects, titles.go:394-483): for qid number n,
    n%5==0 -> Q(n-1), n%5==4 -> Q(n-2). By construction this yields 2-hop
    chains (e.g. Q5->Q4->Q2) and no cycles, exercising union-find
    canonicalization while staying expressible as two chained SQL joins."""
    nums = gazetteer["qid"].str.slice(1).astype(int).to_numpy()
    rows = []
    for n in nums:
        if n % 5 == 0 and n - 1 >= 1:
            rows.append((f"Q{n}", f"Q{n - 1}"))
        elif n % 5 == 4 and n - 2 >= 1:
            rows.append((f"Q{n}", f"Q{n - 2}"))
    return pd.DataFrame(rows, columns=["from_qid", "to_qid"])
