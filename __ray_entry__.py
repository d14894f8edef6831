"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable
from typing import Any

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: full checkpointed KG build (normalize ->
    gazetteer -> triples -> canonical qrank -> stats), returns the canonical
    triples Dataset."""
    import ray.data

    from wikidata_qrank_ray.pipelines import kg_build

    run_dir = tempfile.mkdtemp(prefix="kgbuild_entry_")
    out = kg_build.run(transcripts_path=None, run_dir=run_dir, sf_dir=SF_SMOKE, concurrency=2)
    return ray.data.read_parquet(out["triples"])


def queries() -> dict[str, Callable[[str], Any]]:
    from wikidata_qrank_ray.pipelines.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from wikidata_qrank_ray.pipelines.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
