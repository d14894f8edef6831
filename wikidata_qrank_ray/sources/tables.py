"""Parquet table readers with column pruning.

The reference discovers inputs by directory scan + regex newest-first
(cmd/qrank-builder/pageviews.go:34-59, util.go:62-113); here inputs are
Parquet tables in an sf directory and pruning happens at the read
(``columns=[...]`` -> only needed columns leave storage).
"""

from __future__ import annotations

import os

import ray.data


def table_path(sf_dir: str, name: str) -> str:
    p = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(p):
        raise FileNotFoundError(p)
    return p


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with column pruning; one Dataset per table."""
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns)
