"""Parquet table readers with column pruning.

The reference discovers inputs by directory scan + regex newest-first
(cmd/qrank-builder/pageviews.go:34-59, util.go:62-113); here inputs are
Parquet tables in an sf directory and pruning happens at the read
(``columns=[...]`` -> only needed columns leave storage).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def table_path(sf_dir: str, name: str) -> str:
    p = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(p):
        raise FileNotFoundError(p)
    return p


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with column pruning; one Dataset per table.

    The explicit metadata-FREE schema matters: pandas-written Parquet
    carries a pandas metadata dict in the file schema, Ray hashes block
    schemas for dedup when splitting/bundling blocks, and the unhashable
    dict defeats that inside every read task (log spam + duplicated schema
    objects). Overriding the schema strips it at the source -- blocks are
    born clean."""
    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        shards = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if not shards:
            raise FileNotFoundError(
                f"table {name!r}: no *.parquet files in directory {path}"
            )
        sample = os.path.join(path, shards[0])
    else:
        sample = path
    import pyarrow.parquet as pq

    full = pq.read_schema(sample).remove_metadata()
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return ray.data.read_parquet(path, schema=schema, columns=columns)
