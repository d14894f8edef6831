"""Canonicalization: union-find over QID redirect/alias chains.

Generalizes the reference's redirect resolution (buildRedirects,
cmd/qrank-builder/titles.go:394-483: alias title -> canonical item fan-out).
The alias table is small (dimension-sized), so the closure is computed
driver-side with path-compressed union-find and broadcast via ``ray.put``;
the rewrite itself is a stateless vectorized ``map_batches`` (guide:
broadcast the small side, never shuffle-join a dimension table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def resolve_aliases(aliases: pd.DataFrame) -> dict[str, str]:
    """(from_qid, to_qid) rows -> {qid: canonical_qid} transitive closure.
    Path-compressed iterative find; raises on cycles (the reference's
    panic-on-violation stance, linemerger.go:127-131)."""
    parent = dict(zip(aliases["from_qid"], aliases["to_qid"]))
    out: dict[str, str] = {}
    for q in parent:
        seen = []
        cur = q
        while cur in parent and cur not in out:
            seen.append(cur)
            cur = parent[cur]
            if cur in seen:
                raise ValueError(f"alias cycle at {cur}")
        root = out.get(cur, cur)
        for s in seen:
            out[s] = root
    return out


def _rewrite_col(arr: np.ndarray, mapping: dict[str, str]) -> np.ndarray:
    s = pd.Series(arr, dtype="object")
    mapped = s.map(mapping)
    return mapped.fillna(s).to_numpy()


def rewrite_triples_df(df: pd.DataFrame, mapping: dict[str, str]) -> pd.DataFrame:
    """Vectorized canonical rewrite of one triple frame: subj/obj through
    the closure, canonical undirected form (subj_qn < obj_qn) for
    entity-entity edges, self-loops dropped (links.go:69-71 semantics).
    Weights are NOT re-merged here -- callers follow with a groupby-sum
    (shared by the Dataset op below and the flagship's fused combine, so
    both paths have provably identical semantics)."""
    df = df.copy()
    df["subj"] = _rewrite_col(df["subj"].to_numpy(), mapping)
    is_ent_obj = df["obj"].str.match(r"^Q\d+$")
    df.loc[is_ent_obj, "obj"] = _rewrite_col(df.loc[is_ent_obj, "obj"].to_numpy(), mapping)
    both = is_ent_obj
    sn = df["subj"].str.slice(1)
    on = df["obj"].where(both).str.slice(1)
    sw = both & (pd.to_numeric(sn, errors="coerce") > pd.to_numeric(on, errors="coerce"))
    s, o = df.loc[sw, "subj"].copy(), df.loc[sw, "obj"].copy()
    df.loc[sw, "subj"], df.loc[sw, "obj"] = o.to_numpy(), s.to_numpy()
    return df[df["subj"] != df["obj"]]


def canonicalize_triples(triples: ray.data.Dataset, mapping_ref) -> ray.data.Dataset:
    """Rewrite subj/obj through the closure, restore canonical form
    (subj_qn < obj_qn for co_occurs), drop self-loops (links.go:69-71
    semantics), re-merge weights (one groupby shuffle)."""

    def _rewrite(batch: pa.Table) -> pa.Table:
        mapping = ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        df = rewrite_triples_df(batch.to_pandas(), mapping)
        # metadata stripped: the nested pandas dict makes the schema
        # unhashable and defeats Ray's schema dedup
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    rewritten = triples.map_batches(_rewrite, batch_format="pyarrow")
    agg = rewritten.groupby(["subj", "pred", "obj"]).sum("weight")
    return agg.map_batches(
        lambda t: t.rename_columns(["subj", "pred", "obj", "weight"]),
        batch_format="pyarrow",
    )


def canonicalize_ranks(rank_ds: ray.data.Dataset, mapping_ref) -> ray.data.Dataset:
    """Merge rank mass of aliased entities into their canonical qid."""

    def _rewrite(batch: pa.Table) -> pa.Table:
        mapping = ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        qid = _rewrite_col(batch["qid"].to_numpy(zero_copy_only=False), mapping)
        return pa.table(
            {"qid": pa.array(qid, type=pa.string()), "mention_count": batch["mention_count"]}
        )

    agg = rank_ds.map_batches(_rewrite, batch_format="pyarrow").groupby("qid").sum("mention_count")
    return agg.map_batches(
        lambda t: t.rename_columns(["qid", "mention_count"]), batch_format="pyarrow"
    )
