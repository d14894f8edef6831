"""Distributed BPE (byte-pair-encoding) vocabulary learner.

The tokenizer-training stage of an LLM data pipeline, shaped for 100 TB:
the corpus collapses ONCE into a (word, count) table (vocabulary-sized,
not corpus-sized -- the classic Sennrich et al. 2016 reduction), and every
merge round runs two vocabulary-parallel passes:

  1. pair counting: adjacent-symbol pairs weighted by word count, folded
     map-side per block, finished by a hash-partitioned aggregate; each
     block then surfaces only its LOCAL best pair, so the driver reduces a
     block-count-sized list, never the pair table;
  2. merge application: a vectorized flat-array sweep (greedy leftmost,
     non-overlapping -- the run-parity trick resolves overlap chains like
     "a a a" without a Python scan) rewrites the word table in place.

Determinism: the winning pair is max by (weight DESC, left ASC, right
ASC) -- a total order, so the whole trainer is bitwise deterministic and
pinned against a single-process twin in tests (the kmeans precedent).
State on the driver: N winning pairs. Everything else stays a Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.tokenize import flat_tokens


def word_counts(docs: ray.data.Dataset, num_partitions: int = 64) -> ray.data.Dataset:
    """documents(text) -> (word, n) table: \\S+ tokens, map-side partial
    counts, one hash-partitioned merge."""
    from .groupby import hash_partition_aggregate

    def _partial(batch: pa.Table) -> pd.DataFrame:
        flat, _ = flat_tokens(batch["text"], fill_null=True)
        s = pd.Series(flat.to_numpy(zero_copy_only=False))
        c = s.groupby(s, sort=False).size()
        return pd.DataFrame({"word": c.index.to_numpy(dtype=object),
                             "n": c.to_numpy(dtype=np.int64)})

    return hash_partition_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow"),
        ["word"], {"n": ("n", "sum")}, num_partitions,
        stamp_batch_size=None,
    )


def _explode_symbols(words: np.ndarray, counts: np.ndarray):
    """(word strings, counts) -> flat (symbol, word_index) char-level
    arrays. One Python pass per unique word ONLY at explode time; every
    later round works on the flat arrays."""
    syms: list[str] = []
    widx: list[int] = []
    for i, w in enumerate(words):
        cs = list(w)
        syms.extend(cs)
        widx.extend([i] * len(cs))
    return (np.array(syms, dtype=object), np.array(widx, dtype=np.int64),
            counts.astype(np.int64))


def _pair_counts_flat(syms, widx, wn) -> pd.DataFrame:
    """Adjacent same-word symbol pairs weighted by word count."""
    if len(syms) < 2:
        return pd.DataFrame({"left": pd.Series(dtype=object),
                             "right": pd.Series(dtype=object),
                             "w": pd.Series(dtype="int64")})
    same = widx[:-1] == widx[1:]
    l = syms[:-1][same]
    r = syms[1:][same]
    w = wn[widx[:-1][same]]
    df = pd.DataFrame({"left": l, "right": r, "w": w})
    return df.groupby(["left", "right"], as_index=False, sort=False)["w"].sum()


def _apply_merge_flat(syms, widx, left: str, right: str):
    """Greedy leftmost non-overlapping merge of (left, right) -> left+right
    on the flat arrays. Overlap chains (e.g. 'a a a' merging ('a','a'))
    keep run-parity-even matches only -- identical to the sequential
    left-to-right scan, fully vectorized."""
    n = len(syms)
    if n < 2:
        return syms, widx
    m = np.zeros(n - 1, dtype=bool)
    same = widx[:-1] == widx[1:]
    m = same & (syms[:-1] == left) & (syms[1:] == right)
    if not m.any():
        return syms, widx
    # left==right chains overlap: a match at i invalidates a match at i+1.
    # For runs of consecutive matches keep even offsets within the run.
    starts = m & ~np.concatenate([[False], m[:-1]])
    run_start_pos = np.where(starts, np.arange(n - 1), 0)
    run_start_pos = np.maximum.accumulate(np.where(m, run_start_pos, 0))
    if left == right:
        keep = m & (((np.arange(n - 1) - run_start_pos) % 2) == 0)
    else:
        # distinct symbols cannot chain: 'ab' match at i and i+1 would
        # need syms[i+1] == 'b' == 'a'
        keep = m
    out_syms = syms.copy()
    idx = np.where(keep)[0]
    out_syms[idx] = left + right
    drop = np.zeros(n, dtype=bool)
    drop[idx + 1] = True
    return out_syms[~drop], widx[~drop]


def bpe_learn(
    docs: ray.data.Dataset,
    n_merges: int = 8,
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus -> DataFrame
    (step, left, right, weight), bitwise deterministic. The word table is
    distributed; the driver sees one winning pair per round plus
    block-local candidate tops."""
    words_ds = word_counts(docs, num_partitions).materialize()

    def _explode_block(df: pd.DataFrame) -> pd.DataFrame:
        syms, widx, wn = _explode_symbols(
            df["word"].to_numpy(dtype=object), df["n"].to_numpy(dtype=np.int64)
        )
        # one row per block: the flat state rides as list payloads
        return pd.DataFrame(
            {"syms": [syms.tolist()], "widx": [widx.tolist()],
             "wn": [wn.tolist()]}
        )

    state = words_ds.map_batches(
        _explode_block, batch_format="pandas", batch_size=None
    ).materialize()

    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):

        def _local_top(df: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for _, row in df.iterrows():
                syms = np.array(row["syms"], dtype=object)
                widx = np.array(row["widx"], dtype=np.int64)
                wn = np.array(row["wn"], dtype=np.int64)
                outs.append(_pair_counts_flat(syms, widx, wn))
            if not outs:
                return pd.DataFrame({"left": pd.Series(dtype=object),
                                     "right": pd.Series(dtype=object),
                                     "w": pd.Series(dtype="int64")})
            return pd.concat(outs, ignore_index=True)

        from .groupby import hash_partition_aggregate

        pair_ds = hash_partition_aggregate(
            state.map_batches(_local_top, batch_format="pandas",
                              batch_size=None),
            ["left", "right"], {"w": ("w", "sum")}, num_partitions,
            stamp_batch_size=None,
        )

        def _block_best(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            srt = df.sort_values(["w", "left", "right"],
                                 ascending=[False, True, True],
                                 kind="mergesort")
            return srt.head(1)

        tops = pair_ds.map_batches(
            _block_best, batch_format="pandas"
        ).to_pandas()
        if len(tops) == 0:
            break
        tops = tops.sort_values(["w", "left", "right"],
                                ascending=[False, True, True],
                                kind="mergesort")
        best = tops.iloc[0]
        if int(best["w"]) < 2:
            break
        left, right, weight = str(best["left"]), str(best["right"]), int(best["w"])
        merges.append((step, left, right, weight))

        def _apply(df: pd.DataFrame, l=left, r=right) -> pd.DataFrame:
            rows = []
            for _, row in df.iterrows():
                syms = np.array(row["syms"], dtype=object)
                widx = np.array(row["widx"], dtype=np.int64)
                syms, widx = _apply_merge_flat(syms, widx, l, r)
                rows.append({"syms": syms.tolist(), "widx": widx.tolist(),
                             "wn": row["wn"]})
            if not rows:
                # keep the 3-column schema on empty blocks (schema-change
                # warnings otherwise)
                return pd.DataFrame(
                    {"syms": pd.Series(dtype=object),
                     "widx": pd.Series(dtype=object),
                     "wn": pd.Series(dtype=object)}
                )
            return pd.DataFrame(rows)

        state = state.map_batches(
            _apply, batch_format="pandas", batch_size=None
        ).materialize()

    return pd.DataFrame(merges, columns=["step", "left", "right", "weight"])


def bpe_learn_reference(texts: list[str], n_merges: int = 8) -> pd.DataFrame:
    """Single-process textbook twin (dict-of-tuples), same tie-break --
    the bitwise pin for tests."""
    from collections import Counter

    wc = Counter(t for txt in texts for t in (txt or "").split())
    words = {w: list(w) for w in wc}
    merges = []
    for step in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), weight = best
        if weight < 2:
            break
        merges.append((step, l, r, weight))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return pd.DataFrame(merges, columns=["step", "left", "right", "weight"])
