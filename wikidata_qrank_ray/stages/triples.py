"""(subj, pred, obj) triple extraction from turns.

The graph-edge analogue of the reference's pagelinks chain
(pagelinks.go:161-311 joins emitting (Qsrc,Qdst); links.go:60-77 dedups and
drops self-links). Predicates:

- ``co_occurs``: two distinct entities mentioned in the same turn, subject =
  smaller numeric qid (undirected edge canonical form); weight = number of
  turns where the pair co-occurs.
- ``observed_via_tool``: entity mentioned in a tool turn -> (qid,
  observed_via_tool, tool); weight = number of such turns.

Extraction runs inside one ``map_batches`` over turn rows (each turn is one
row, so per-turn pair generation never crosses block boundaries) and emits
per-batch partial weights -- map-side combine -- before the global
``groupby(subj,pred,obj).sum`` dedup+rollup shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..context import pool_size

from .mentions import GazetteerMatcher, _tokenize_arrow

# reserved predicate tag for occurrence-count partials riding the triple
# shuffle in the fused single-pass build (never a real predicate)
MENTIONS_PRED = "__mentions__"

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("w", pa.int64()),
    ]
)


class TripleExtractor(GazetteerMatcher):
    """Actor-pool stage: gazetteer automaton from __init__ (broadcast ref);
    per-batch work stays in integer entity ordinals."""

    # above this many distinct entities the dense presence matrix would blow
    # memory; fall back to the sparse pandas path
    DENSE_MAX_ENTITIES = 4096

    def __init__(self, gaz_ref, text_col: str = "text", mapping_ref=None,
                 emit_counts: bool = False):
        super().__init__(gaz_ref, mode="mentions", text_col=text_col)
        # alias closure applied AFTER per-turn pair generation in RAW
        # ordinal space (post-pair remap == rewrite-then-merge semantics
        # exactly; folding it into the token ordinals would dedup
        # same-canonical surfaces per turn and change co_occurs weights --
        # see GazetteerMatcher note). The remap is one precomputed int
        # lookup (canon_of_ord) + numpy reorder/self-drop/packed-key
        # bincount in __call__ -- no pandas string ops on the hot path.
        self.mapping = (
            ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef)
            else mapping_ref
        )
        if self.mapping is not None:
            raw = list(self.ent_names)
            canon = [self.mapping.get(q, q) for q in raw]
            canon_names = sorted(set(canon), key=lambda q: int(q[1:]))
            canon_idx = {q: i for i, q in enumerate(canon_names)}
            self.canon_of_ord = np.fromiter(
                (canon_idx[c] for c in canon), dtype=np.int64, count=len(canon)
            )
            self.canon_names = np.array(canon_names, dtype=object)
        self.emit_counts = emit_counts

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        flat, parent = _tokenize_arrow(batch[self.text_col])
        tok = self._lookup_ords(flat)
        m = tok >= 0
        parent, tok = parent[m], tok[m]
        if len(self.ent_names) <= self.DENSE_MAX_ENTITIES:
            ia, ja, w, tools = self._dense_ord(batch, parent, tok)
        else:
            ia, ja, w, tools = self._sparse_ord(batch, parent, tok)
        names = self.ent_names
        counts = (
            np.bincount(tok, minlength=len(self.ent_names))
            if self.emit_counts else None
        )
        if self.mapping is not None:
            # ordinal-space canonical rewrite: map raw -> canonical ordinal
            # (one int lookup), restore lo < hi order, drop self-loops, and
            # re-combine merged pair keys with one packed-key bincount
            e2 = len(self.canon_names)
            ca, cb = self.canon_of_ord[ia], self.canon_of_ord[ja]
            lo, hi = np.minimum(ca, cb), np.maximum(ca, cb)
            keep = lo != hi
            key = lo[keep] * e2 + hi[keep]
            uk, inv = np.unique(key, return_inverse=True)
            w = np.bincount(inv, weights=w[keep]).astype(np.int64)
            ia, ja = uk // e2, uk % e2
            tools = [
                (tname, *self._combine_ord(self.canon_of_ord[tj], tw, e2))
                for tname, tj, tw in tools
            ]
            if counts is not None:
                cc = np.zeros(e2, dtype=np.int64)
                np.add.at(cc, self.canon_of_ord, counts)
                counts = cc
            names = self.canon_names
        frames = [
            pd.DataFrame(
                {"subj": names[ia], "pred": "co_occurs", "obj": names[ja], "w": w}
            )
        ]
        for tname, tj, tw in tools:
            frames.append(
                pd.DataFrame(
                    {"subj": names[tj], "pred": "observed_via_tool",
                     "obj": tname, "w": tw}
                )
            )
        if counts is not None:
            # occurrence-count partials ride the same shuffle, tagged with a
            # reserved predicate; split out after the global aggregate
            nz = np.nonzero(counts)[0]
            frames.append(
                pd.DataFrame(
                    {"subj": names[nz], "pred": MENTIONS_PRED, "obj": "",
                     "w": counts[nz]}
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out["w"] = out["w"].astype(np.int64)
        # strip the from_pandas metadata: the nested dict makes the schema
        # unhashable, defeating Ray's schema dedup (log-spams every task)
        return pa.Table.from_pandas(
            out, schema=TRIPLE_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    @staticmethod
    def _combine_ord(ords: np.ndarray, w: np.ndarray, size: int) -> tuple[np.ndarray, np.ndarray]:
        """Sum weights of duplicate ordinals (post-remap combine)."""
        acc = np.zeros(size, dtype=np.int64)
        np.add.at(acc, ords, w)
        nz = np.nonzero(acc)[0]
        return nz, acc[nz]

    def _dense_ord(self, batch: pa.Table, parent: np.ndarray, tok: np.ndarray):
        """Presence-matrix co-occurrence in RAW ordinals: pair weight =
        #turns where both entities appear = upper triangle of P^T P for the
        0/1 turn x entity matrix. O(rows x ents) memory, one int matmul per
        batch -- no quadratic pair explosion. Returns (ia, ja, w, tools)
        with ia < ja (ordinals are numeric-qid ordered)."""
        n, e = batch.num_rows, len(self.ent_names)
        pres = np.zeros((n, e), dtype=np.int64)
        if len(parent):
            pres[parent, tok] = 1
        co_mat = pres.T @ pres
        iu, ju = np.triu_indices(e, k=1)
        w = co_mat[iu, ju]
        nz = w > 0
        ia, ja, w = iu[nz], ju[nz], w[nz]
        tool_arr = batch["tool"]
        if isinstance(tool_arr, pa.ChunkedArray):
            tool_arr = tool_arr.combine_chunks()
        tenc = tool_arr.dictionary_encode()
        tool_names = tenc.dictionary.to_pylist()
        tool_idx = tenc.indices.to_numpy(zero_copy_only=False)
        tools = []
        for tname_i, tname in enumerate(tool_names):
            if tname == "":
                continue
            rows = np.nonzero(tool_idx == tname_i)[0]
            if len(rows) == 0:
                continue
            tw = pres[rows].sum(axis=0)  # per-entity count of this tool's turns
            tj = np.nonzero(tw)[0]
            if len(tj):
                tools.append((tname, tj, tw[tj]))
        return ia, ja, w, tools

    def _sparse_ord(self, batch: pa.Table, parent: np.ndarray, tok: np.ndarray):
        """Sparse fallback for very large entity vocabularies: per-turn
        distinct (row, ord) pairs, vectorized self-merge; RAW ordinals."""
        m = pd.DataFrame({"row": parent, "t": tok}).drop_duplicates()
        pairs = m.merge(m, on="row", suffixes=("_a", "_b"))
        pairs = pairs[pairs["t_a"] < pairs["t_b"]]
        co = pairs.groupby(["t_a", "t_b"], sort=False).size().reset_index(name="w")
        ia = co["t_a"].to_numpy(dtype=np.int64)
        ja = co["t_b"].to_numpy(dtype=np.int64)
        w = co["w"].to_numpy(dtype=np.int64)
        tool = np.asarray(batch["tool"].to_numpy(zero_copy_only=False), dtype=object)
        tools = []
        mt = m[tool[m["row"].to_numpy()] != ""]
        if len(mt):
            mt = pd.DataFrame({"t": mt["t"].to_numpy(), "tool": tool[mt["row"].to_numpy()]})
            tt = mt.groupby(["tool", "t"], sort=False).size().reset_index(name="w")
            for tname, g in tt.groupby("tool", sort=False):
                tools.append(
                    (tname, g["t"].to_numpy(dtype=np.int64), g["w"].to_numpy(dtype=np.int64))
                )
        return ia, ja, w, tools


def triple_partials(
    turns: ray.data.Dataset,
    gaz_ref,
    text_col: str = "text",
    mapping_ref=None,
    emit_counts: bool = False,
    concurrency: int = 4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Per-batch (subj, pred, obj, w) triple partials with the execution
    tier picked by dictionary size -- the ONE place the dispatch lives:
    small gazetteer -> prebuilt extractor instance on elastic tasks (no
    pool startup, scales to every CPU); large -> actor pool built once per
    actor from broadcast refs (never shipped per task)."""
    from .mentions import ELASTIC_MAX_SURFACES

    gaz = ray.get(gaz_ref) if isinstance(gaz_ref, ray.ObjectRef) else gaz_ref
    if len(gaz) <= ELASTIC_MAX_SURFACES:
        mapping = (
            ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef)
            else mapping_ref
        )
        return turns.map_batches(
            TripleExtractor(gaz, text_col=text_col, mapping_ref=mapping,
                            emit_counts=emit_counts),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    if not isinstance(gaz_ref, ray.ObjectRef):
        gaz_ref = ray.put(gaz_ref)
    if mapping_ref is not None and not isinstance(mapping_ref, ray.ObjectRef):
        mapping_ref = ray.put(mapping_ref)
    return turns.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={
            "gaz_ref": gaz_ref,
            "text_col": text_col,
            "mapping_ref": mapping_ref,
            "emit_counts": emit_counts,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
    )


def extract_triples(
    turns: ray.data.Dataset,
    gaz_ref,
    concurrency: int = 4,
    batch_size: int = 8192,
    text_col: str = "text",
) -> ray.data.Dataset:
    """turns -> deduplicated weighted triples (subj, pred, obj, weight).

    Per-batch partials then one groupby shuffle; the groupby IS the dedup
    (links.go:60-77 semantics: duplicates collapse; self-links cannot occur
    by construction since subj ordinal < obj ordinal and tool names are not
    qids)."""
    partial = triple_partials(
        turns, gaz_ref, text_col=text_col,
        concurrency=concurrency, batch_size=batch_size,
    )
    agg = partial.groupby(["subj", "pred", "obj"]).sum("w")
    return agg.map_batches(
        lambda t: t.rename_columns(["subj", "pred", "obj", "weight"]),
        batch_format="pyarrow",
    )


class QualifierExtractor(GazetteerMatcher):
    """Per-canonical-pair TEMPORAL QUALIFIERS -- the statement-metadata
    step of a KG build (when was this edge first/last observed, across how
    many turns). Each batch emits partial (subj, obj, first_sec, last_sec,
    n_turns) rows over canonical entity ordinals; turns are whole input
    rows, so per-batch distinct pairs ARE per-turn distinct pairs and the
    partials compose under (min, max, sum). A canonical pair exists in a
    turn iff the turn mentions both canonical entities (any surfaces), so
    folding the alias map into the ordinals BEFORE pair generation is
    exact here -- unlike co_occurs WEIGHTS, which count raw-pair
    multiplicity (see GazetteerMatcher note)."""

    def __init__(self, gaz_ref, mapping_ref=None, text_col: str = "text"):
        super().__init__(gaz_ref, mode="mentions", text_col=text_col)
        mapping = (
            ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef)
            else (mapping_ref or {})
        )
        raw = list(self.ent_names)
        canon = [mapping.get(q, q) for q in raw]
        canon_names = sorted(set(canon), key=lambda q: int(q[1:]))
        canon_idx = {q: i for i, q in enumerate(canon_names)}
        self.canon_of_ord = np.fromiter(
            (canon_idx[c] for c in canon), dtype=np.int64, count=len(canon)
        )
        self.canon_names = np.array(canon_names, dtype=object)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:  # type: ignore[override]
        # NOTE: _tokenize_arrow comes from the MODULE-LEVEL import -- an
        # inline relative import here would execute inside the pickled-by-
        # value callable and break when the driver runs outside the repo
        # (see tests/test_e2e.py::test_no_relative_imports_in_worker_closures)
        empty = pd.DataFrame({
            "subj": pd.Series(dtype=object), "obj": pd.Series(dtype=object),
            "first_sec": pd.Series(dtype=np.int64),
            "last_sec": pd.Series(dtype=np.int64),
            "n_turns": pd.Series(dtype=np.int64)})
        flat, parent = _tokenize_arrow(batch[self.text_col])
        tok = self._lookup_ords(flat)
        m = tok >= 0
        parent, tok = parent[m], tok[m]
        if len(parent) == 0:
            return empty
        cord = self.canon_of_ord[tok]
        mdf = pd.DataFrame({"row": parent, "t": cord}).drop_duplicates()
        pairs = mdf.merge(mdf, on="row", suffixes=("_a", "_b"))
        pairs = pairs[pairs["t_a"] < pairs["t_b"]]
        if len(pairs) == 0:
            return empty
        conv = pd.Series(
            batch["conv_id"].to_numpy(zero_copy_only=False), dtype="object")
        tix = np.asarray(
            batch["turn_idx"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sec = conv.str[1:].astype(np.int64).to_numpy() * 8 + tix
        g = pairs.assign(sec=sec[pairs["row"].to_numpy()]).groupby(
            ["t_a", "t_b"], as_index=False).agg(
            first_sec=("sec", "min"), last_sec=("sec", "max"),
            n_turns=("sec", "count"))
        return pd.DataFrame({
            "subj": self.canon_names[g["t_a"].to_numpy(np.int64)],
            "obj": self.canon_names[g["t_b"].to_numpy(np.int64)],
            "first_sec": g["first_sec"].to_numpy(np.int64),
            "last_sec": g["last_sec"].to_numpy(np.int64),
            "n_turns": g["n_turns"].to_numpy(np.int64)})


def triple_qualifiers(
    turns: ray.data.Dataset,
    gaz_ref,
    mapping_ref=None,
    concurrency: int = 4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """turns -> (subj, obj, first_sec, last_sec, n_turns) per canonical
    co-occurrence pair: map-side partials from QualifierExtractor, one
    pair-keyed hash-partitioned final combine (min/max/sum compose)."""
    from ..context import pool_size
    from .groupby import hash_partition_aggregate
    from .mentions import ELASTIC_MAX_SURFACES

    gaz = ray.get(gaz_ref) if isinstance(gaz_ref, ray.ObjectRef) else gaz_ref
    if len(gaz) <= ELASTIC_MAX_SURFACES:
        mapping = (
            ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef)
            else mapping_ref
        )
        partial = turns.map_batches(
            QualifierExtractor(gaz, mapping_ref=mapping),
            batch_format="pyarrow", batch_size=batch_size)
    else:
        partial = turns.map_batches(
            QualifierExtractor,
            fn_constructor_kwargs={"gaz_ref": gaz_ref,
                                   "mapping_ref": mapping_ref},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=pool_size(concurrency))
    return hash_partition_aggregate(
        partial, ["subj", "obj"],
        {"first_sec": ("first_sec", "min"),
         "last_sec": ("last_sec", "max"),
         "n_turns": ("n_turns", "sum")})


class ContextTyper(QualifierExtractor):
    """Per-batch partials for entity TYPE ASSIGNMENT from context: for
    every canonical entity mentioned in a turn, count every token of that
    turn (with multiplicity) EXCEPT the entity's own surfaces -> (qid,
    token, cnt). The downstream argmax per entity ((cnt DESC, token ASC)
    total order) is the ontology-typing step of a KG build: an entity's
    type is its dominant context word."""

    def __call__(self, batch: pa.Table) -> pd.DataFrame:  # type: ignore[override]
        empty = pd.DataFrame({
            "qid": pd.Series(dtype=object),
            "token": pd.Series(dtype=object),
            "cnt": pd.Series(dtype=np.int64)})
        flat, parent = _tokenize_arrow(batch[self.text_col])
        if len(parent) == 0:
            return empty
        tok = self._lookup_ords(flat)
        m = tok >= 0
        if not m.any():
            return empty
        mdf = pd.DataFrame({
            "row": parent[m],
            "e": self.canon_of_ord[tok[m]]}).drop_duplicates()
        # every token of the turn, with its own canonical ordinal (-1 when
        # the token is not a gazetteer surface) for the own-surface filter
        tcanon = np.where(m, self.canon_of_ord[np.maximum(tok, 0)], -1)
        tokdf = pd.DataFrame({
            "row": parent,
            "token": flat.to_numpy(zero_copy_only=False),
            "tc": tcanon})
        pairs = mdf.merge(tokdf, on="row")
        pairs = pairs[pairs["e"].to_numpy() != pairs["tc"].to_numpy()]
        if len(pairs) == 0:
            return empty
        g = pairs.groupby(["e", "token"], as_index=False).size()
        return pd.DataFrame({
            "qid": self.canon_names[g["e"].to_numpy(np.int64)],
            "token": g["token"],
            "cnt": g["size"].to_numpy(np.int64)})


class CanonTurnCounter(QualifierExtractor):
    """Per-batch (qid, n) partials of DISTINCT-TURN mention counts per
    canonical entity -- the antecedent supports of the association-rule
    operator. Turns are whole input rows, so per-batch distinct is exact
    and the partials compose under sum."""

    def __call__(self, batch: pa.Table) -> pd.DataFrame:  # type: ignore[override]
        empty = pd.DataFrame({
            "qid": pd.Series(dtype=object), "n": pd.Series(dtype=np.int64)})
        flat, parent = _tokenize_arrow(batch[self.text_col])
        tok = self._lookup_ords(flat)
        m = tok >= 0
        if not m.any():
            return empty
        mdf = pd.DataFrame({
            "row": parent[m],
            "e": self.canon_of_ord[tok[m]]}).drop_duplicates()
        vc = mdf["e"].value_counts()
        return pd.DataFrame({
            "qid": self.canon_names[vc.index.to_numpy(np.int64)],
            "n": vc.to_numpy(np.int64)})


def _matcher_partials(
    turns: ray.data.Dataset,
    cls,
    gaz_ref,
    mapping_ref=None,
    concurrency: int = 4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Shared elastic/actor-pool tier dispatch for the matcher-derived
    partial stages (same size gate as detect_mentions)."""
    from ..context import pool_size
    from .mentions import ELASTIC_MAX_SURFACES

    gaz = ray.get(gaz_ref) if isinstance(gaz_ref, ray.ObjectRef) else gaz_ref
    if len(gaz) <= ELASTIC_MAX_SURFACES:
        mapping = (
            ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef)
            else mapping_ref
        )
        return turns.map_batches(
            cls(gaz, mapping_ref=mapping),
            batch_format="pyarrow", batch_size=batch_size)
    return turns.map_batches(
        cls,
        fn_constructor_kwargs={"gaz_ref": gaz_ref, "mapping_ref": mapping_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool_size(concurrency))


class CanonMentions(QualifierExtractor):
    """Distinct (conv_id, turn_idx, canonical qid) rows per turn -- the
    per-turn canonical entity SETS downstream dialog analytics consume
    (topic segmentation, entity density). Turns are whole input rows, so
    per-batch distinct is exact; no shuffle here."""

    def __call__(self, batch: pa.Table) -> pd.DataFrame:  # type: ignore[override]
        empty = pd.DataFrame({
            "conv_id": pd.Series(dtype=object),
            "turn_idx": pd.Series(dtype=np.int64),
            "q": pd.Series(dtype=object)})
        flat, parent = _tokenize_arrow(batch[self.text_col])
        tok = self._lookup_ords(flat)
        m = tok >= 0
        if not m.any():
            return empty
        mdf = pd.DataFrame({
            "row": parent[m],
            "e": self.canon_of_ord[tok[m]]}).drop_duplicates()
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        tix = np.asarray(batch["turn_idx"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        r = mdf["row"].to_numpy()
        return pd.DataFrame({
            "conv_id": conv[r],
            "turn_idx": tix[r],
            "q": self.canon_names[mdf["e"].to_numpy(np.int64)]})
