"""Dynamic-schema payload extraction -- the analogue of the reference's
SQL-dump reader, which discovers column names at runtime from `CREATE
TABLE` and lets consumers index by name (sqlreader.go:30-87,
pagesignals.go:126-129), including schema BRANCHING between old and new
layouts (pagelinks.go:122-128 -> linktarget.go:28-105).

Here the payload is a semi-structured JSON-object column: a discovery pass
(map-side per-batch key->type partials, driver merge) infers the unified
schema across heterogeneous payload generations, then an extraction pass
projects every discovered key into a typed column (missing keys -> null),
so a consumer written against key names keeps working when the payload
layout evolves.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# type lattice: promotion order when the same key carries mixed types
# across payload generations (int < float < str)
_RANK = {"int": 0, "float": 1, "str": 2}
_PA_TYPE = {"int": pa.int64(), "float": pa.float64(), "str": pa.string()}


def _type_of(v) -> str:
    if isinstance(v, bool):
        return "str"  # JSON bools stay stringly-typed (rare, lossless)
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return "str"


def _schema_partial(batch: pd.DataFrame, col: str) -> pd.DataFrame:
    seen: dict[tuple[str, str], int] = {}
    for raw in batch[col]:
        try:
            obj = json.loads(raw) if raw else {}
        except (json.JSONDecodeError, TypeError):
            continue  # lenient-parse policy (wikisites.go:273-330 stance)
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            key = (k, _type_of(v))
            seen[key] = seen.get(key, 0) + 1
    if not seen:
        return pd.DataFrame({"key": pd.Series([], dtype=object),
                             "typ": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype=np.int64)})
    ks, ts = zip(*seen.keys())
    return pd.DataFrame({"key": ks, "typ": ts, "cnt": list(seen.values())})


def discover_payload_schema(ds: ray.data.Dataset, col: str = "props") -> dict[str, str]:
    """One pass over the payload column -> {key: 'int'|'float'|'str'}.
    Map-side (key, type) count partials; the driver merges the (schema-
    sized, not row-sized) partials and promotes mixed types up the lattice.
    """
    partial = ds.map_batches(
        lambda b, c=col: _schema_partial(b, c), batch_format="pandas"
    ).to_pandas()
    schema: dict[str, str] = {}
    if len(partial) == 0:
        return schema  # empty stream discovers an empty schema
    for key, typ in zip(partial["key"], partial["typ"]):
        cur = schema.get(key)
        if cur is None or _RANK[typ] > _RANK[cur]:
            schema[key] = typ
    return schema


def extract_payload(
    ds: ray.data.Dataset,
    schema: dict[str, str],
    col: str = "props",
    keep_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Project every discovered key into a typed column (missing -> null),
    preserving ``keep_cols``. Consumers index by key name, so payload
    layout evolution (new keys, retired keys) never breaks them -- the
    schema-branching shim as one unified projection."""
    keys = sorted(schema)

    def _extract(batch: pa.Table) -> pa.Table:
        raws = batch[col].to_pylist()
        cols: dict[str, list] = {k: [None] * len(raws) for k in keys}
        for i, raw in enumerate(raws):
            try:
                obj = json.loads(raw) if raw else {}
            except (json.JSONDecodeError, TypeError):
                continue
            if not isinstance(obj, dict):
                continue
            for k in keys:
                if k in obj:
                    v = obj[k]
                    t = schema[k]
                    if t == "str" and not isinstance(v, str):
                        v = json.dumps(v) if isinstance(v, (dict, list, bool)) else str(v)
                    cols[k][i] = v
        out = {c: batch[c] for c in keep_cols}
        for k in keys:
            out[k] = pa.array(cols[k], type=_PA_TYPE[schema[k]])
        return pa.table(out)

    return ds.map_batches(_extract, batch_format="pyarrow")
