"""Mention detection + entity linking -- the stateful actor-pool stage.

Analogue of the reference's "dictionary loaded once, streamed against"
stages: the interwiki prefix resolver (wikisites.go:188-195,
interwikilinks.go:162-209) and the sitelinks merge-join (qviews.go:163-213).
Here the dictionary is a gazetteer (surface -> [(qid, prior), ...]) built
once per actor in ``__init__`` from a ``ray.put`` broadcast ref -- never
re-shipped per batch -- and matching is a token-level automaton:

- single-token surfaces (the hot path): Arrow dictionary-encode the token
  stream once, resolve only the (tiny) unique-token set through the dict,
  then work entirely in integer entity ordinals -- counts via np.bincount,
  no per-token Python or object arrays;
- multi-token surfaces: greedy longest-match over the token stream per turn
  (Aho-Corasick semantics for a small pattern set; unit-tested path).

Entity linking picks the candidate with the highest popularity prior
(qviews-like prior column), ties broken by ascending numeric qid --
the reference's priors-by-pageviews idea.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..context import pool_size
from ..functions.tokenize import flat_tokens, kgram_join, kgram_starts


# shared \S+ tokenization kernel (phantom-"" filtering, parent indices):
# single-sourced in functions.tokenize so the gazetteer counter, the
# phrase matcher and the dedup shinglers cannot desynchronize
_tokenize_arrow = flat_tokens


def gazetteer_to_dict(gaz: pd.DataFrame) -> dict[str, list[tuple[str, int]]]:
    """surface -> candidate list [(qid, prior), ...] sorted best-first
    (prior desc, numeric qid asc)."""
    d: dict[str, list[tuple[str, int]]] = {}
    for surface, qid, prior in zip(gaz["surface"], gaz["qid"], gaz["prior"]):
        d.setdefault(surface, []).append((qid, int(prior)))
    for surface, cands in d.items():
        cands.sort(key=lambda c: (-c[1], int(c[0][1:])))
    return d


class GazetteerMatcher:
    """Actor-pool callable: ``map_batches(GazetteerMatcher,
    fn_constructor_kwargs={"gaz_ref": ref, "mode": ...}, concurrency=N)``.

    Modes:
    - "mentions":   distinct (conv_id, turn_idx, qid, surface) per turn
    - "occurrences": one row per token occurrence that linked to an entity
    - "partial_counts": per-batch (qid, cnt) partial sums -- the map-side
      combiner feeding the rank rollup (guide: pre-aggregate before the
      groupby shuffle; reference analogue: run-length pre-sum,
      pageviews.go:520-523)
    """

    def __init__(self, gaz_ref, mode: str = "mentions", text_col: str = "text"):
        gaz = ray.get(gaz_ref) if isinstance(gaz_ref, ray.ObjectRef) else gaz_ref
        self.cands = gazetteer_to_dict(gaz)
        # best (linked) candidate per surface, precomputed once per actor
        self.best = {s: c[0] for s, c in self.cands.items()}
        self.mode = mode
        self.text_col = text_col
        # integer entity ordinals, ordered by numeric qid (the rank /
        # pair-canonicalization sort key). NOTE: alias canonicalization is
        # deliberately NOT folded into these ordinals -- pre-pair folding
        # dedups same-canonical surfaces per turn and silently diverges
        # from rewrite-then-merge semantics (a turn mentioning two surfaces
        # of one canonical entity plus a third gets co_occurs weight 1, not
        # 2); TripleExtractor rewrites AFTER pair generation instead.
        qids = sorted({c[0] for c in self.best.values()}, key=lambda q: int(q[1:]))
        ord_of_qid = {q: i for i, q in enumerate(qids)}
        self.ord_of_surface = {s: ord_of_qid[c[0]] for s, c in self.best.items()}
        self.ent_names = np.array(qids, dtype=object)

    def _lookup_ords(self, flat: pa.Array) -> np.ndarray:
        """token ordinal per token (-1 = no entity): dictionary-encode once,
        resolve only unique tokens through the dict."""
        d = flat.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        ords = np.fromiter(
            (self.ord_of_surface.get(u, -1) for u in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        idx = d.indices.to_numpy(zero_copy_only=False)
        return ords[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parent = _tokenize_arrow(batch[self.text_col])
        tok = self._lookup_ords(flat)
        m = tok >= 0
        if self.mode == "partial_counts":
            counts = np.bincount(tok[m], minlength=len(self.ent_names))
            nz = np.nonzero(counts)[0]
            return pa.table(
                {
                    "qid": pa.array(self.ent_names[nz], type=pa.string()),
                    "cnt": pa.array(counts[nz].astype(np.int64)),
                }
            )
        sel = np.nonzero(m)[0]
        parent_h = parent[sel]
        tok_h = tok[sel]
        if self.mode == "mentions":
            # distinct per turn: each turn is one input row, so per-row
            # dedup IS global dedup -- no shuffle needed.
            key = parent_h.astype(np.int64) * len(self.ent_names) + tok_h
            _, first = np.unique(key, return_index=True)
            sel, parent_h, tok_h = sel[first], parent_h[first], tok_h[first]
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        tix = batch["turn_idx"].to_numpy()
        surfaces = flat.take(pa.array(sel, type=pa.int64()))
        return pa.table(
            {
                "conv_id": pa.array(conv[parent_h], type=pa.string()),
                "turn_idx": pa.array(tix[parent_h], type=pa.int32()),
                "qid": pa.array(self.ent_names[tok_h], type=pa.string()),
                "surface": surfaces,
            }
        )

class PhraseGazetteerMatcher:
    """Multi-token (phrase) gazetteer matching for ARBITRARY-length
    surfaces -- left-to-right greedy maximal munch, the semantics of the
    reference's longest-match dictionary keys (multi-word titles,
    titles.go:26-115; namespace-prefixed titles titles.go:160-169): at
    each unconsumed position take the LONGEST matching phrase starting
    there and jump past its span, else advance one token.

    Vectorized in two stages:
    1. per-position longest-match tables: for each phrase length k, one
       object-array concat over same-turn positions + one dict map --
       L(p), qid(p), surface(p) with longer k overwriting shorter;
    2. a BATCH-WIDE frontier walk: one cursor per turn, all turns advanced
       together per step (cur += L or 1), so the Python loop runs
       max-tokens-per-turn times regardless of batch size -- every step is
       O(#turns) numpy, no per-token Python.

    For dictionaries whose longest surface is 2 tokens this reproduces the
    former run-parity implementation exactly (proven by the unchanged
    mentions_phrases oracle); the greedy walk is also expressible in SQL
    as a recursive CTE over (turn, position), so k>=3 stays oracle-gated
    (mentions_phrases_k4).
    """

    def __init__(self, gaz_ref, text_col: str = "text"):
        gaz = ray.get(gaz_ref) if isinstance(gaz_ref, ray.ObjectRef) else gaz_ref
        cands = gazetteer_to_dict(gaz)
        best = {s: c[0][0] for s, c in cands.items()}
        self.by_len: dict[int, dict[str, str]] = {}
        for s, q in best.items():
            k = s.count(" ") + 1
            self.by_len.setdefault(k, {})[s] = q
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parent = _tokenize_arrow(batch[self.text_col])
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        n = len(toks)
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        tix = batch["turn_idx"].to_numpy()
        empty = pa.table(
            {
                "conv_id": pa.array([], type=pa.string()),
                "turn_idx": pa.array([], type=pa.int32()),
                "qid": pa.array([], type=pa.string()),
                "surface": pa.array([], type=pa.string()),
            }
        )
        if n == 0:
            return empty
        # stage 1: longest match per position (ascending k; longer wins)
        L = np.zeros(n, dtype=np.int64)
        qid = np.empty(n, dtype=object)
        surf = np.empty(n, dtype=object)
        for k in sorted(self.by_len):
            d = self.by_len[k]
            if k == 1:
                idxs = np.arange(n)
                cand = toks
            else:
                # p..p+k-1 in one turn <=> endpoints share a parent
                idxs = kgram_starts(parent, k)
                if not len(idxs):
                    continue
                cand = kgram_join(toks, idxs, k)
            m = pd.Series(cand).map(d).to_numpy()
            hit = pd.notna(m)
            hi = idxs[hit]
            L[hi] = k
            qid[hi] = m[hit]
            surf[hi] = cand[hit]
        step = np.where(L > 0, L, 1)
        # stage 2: batch-wide greedy walk (one cursor per turn)
        n_turns = int(parent[-1]) + 1 if n else 0
        starts = np.searchsorted(parent, np.arange(n_turns))
        ends = np.searchsorted(parent, np.arange(n_turns), side="right")
        cur = starts.copy()
        taken: list[np.ndarray] = []
        while True:
            alive = cur < ends
            if not alive.any():
                break
            c = cur[alive]
            taken.append(c[L[c] > 0])
            cur[alive] = c + step[c]
        mp = np.concatenate(taken) if taken else np.array([], dtype=np.int64)
        if not len(mp):
            return empty
        out = pd.DataFrame(
            {"parent": parent[mp], "qid": qid[mp], "surface": surf[mp]}
        ).drop_duplicates(["parent", "qid", "surface"])
        return pa.table(
            {
                "conv_id": pa.array(conv[out["parent"].to_numpy()], type=pa.string()),
                "turn_idx": pa.array(tix[out["parent"].to_numpy()], type=pa.int32()),
                "qid": pa.array(out["qid"].to_numpy(), type=pa.string()),
                "surface": pa.array(out["surface"].to_numpy(), type=pa.string()),
            }
        )


def detect_mentions_phrases(
    ds: ray.data.Dataset,
    gaz_ref,
    concurrency: int = 4,
    batch_size: int = 8192,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Phrase-aware mention detection (unigram + bigram surfaces, greedy
    longest-match); same size-based execution tier as detect_mentions."""
    gaz = ray.get(gaz_ref) if isinstance(gaz_ref, ray.ObjectRef) else gaz_ref
    if len(gaz) <= ELASTIC_MAX_SURFACES:
        return ds.map_batches(
            PhraseGazetteerMatcher(gaz, text_col=text_col),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        PhraseGazetteerMatcher,
        fn_constructor_kwargs={"gaz_ref": gaz_ref, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
    )


# below this many surfaces a prebuilt matcher instance on elastic tasks
# beats an actor pool (no pool startup, scales to every CPU); above it the
# dictionary is built once per actor instead of shipped per task
ELASTIC_MAX_SURFACES = 2048


def detect_mentions(
    ds: ray.data.Dataset,
    gaz_ref,
    mode: str = "mentions",
    concurrency: int = 4,
    batch_size: int = 8192,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Mention detection; execution tier picked by dictionary size:
    small gazetteer -> prebuilt matcher instance on elastic tasks,
    large gazetteer -> actor pool (automaton built once per actor from the
    broadcast ref in __init__)."""
    gaz = ray.get(gaz_ref) if isinstance(gaz_ref, ray.ObjectRef) else gaz_ref
    if len(gaz) <= ELASTIC_MAX_SURFACES:
        return ds.map_batches(
            GazetteerMatcher(gaz, mode=mode, text_col=text_col),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        GazetteerMatcher,
        fn_constructor_kwargs={"gaz_ref": gaz_ref, "mode": mode, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
    )


class SpanMatcher(GazetteerMatcher):
    """Mention SPAN anchoring: one row per linked token occurrence with its
    0-based token position inside the turn -> (conv_id, turn_idx, qid,
    token_pos) -- the provenance anchor an entity-linking pipeline stores
    next to each KG statement. Positions come from the same flat-token
    layout the matcher already walks (parent indices are nondecreasing),
    so the stage stays one vectorized pass, shuffle-free."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        flat, parent = _tokenize_arrow(batch[self.text_col])
        tok = self._lookup_ords(flat)
        n = batch.num_rows
        counts = np.bincount(parent, minlength=n) if len(parent) else np.zeros(n, dtype=np.int64)
        starts = np.zeros(n, dtype=np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        pos_all = (np.arange(len(parent), dtype=np.int64) - starts[parent]
                   if len(parent) else np.array([], dtype=np.int64))
        sel = np.nonzero(tok >= 0)[0]
        parent_h, tok_h, pos_h = parent[sel], tok[sel], pos_all[sel]
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        tix = batch["turn_idx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "conv_id": pa.array(conv[parent_h], type=pa.string()),
            "turn_idx": pa.array(
                np.asarray(tix, dtype=np.int32)[parent_h], type=pa.int32()),
            "qid": pa.array(self.ent_names[tok_h], type=pa.string()),
            "token_pos": pa.array(pos_h, type=pa.int64()),
        })
