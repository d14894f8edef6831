"""Per-partition checkpointing: one input shard -> one output shard, with a
partition manifest recording lineage + rows + wall time per partition.

This is the reference's output-exists-skip (build.go:87-94) pushed down to
partition granularity, as the north rule requires: a failed run resumes by
recomputing ONLY the partitions whose outputs are missing or whose input
lineage changed; completed partitions are never touched (their outputs are
committed atomically via write-tmp-then-rename, pageviews.go:98-102).

The shard map is deterministic (input file -> output file), which the
Dataset API cannot express (write_parquet controls its own file layout), so
each partition runs as one Ray task -- the documented narrow use of raw
tasks (SURVEY.md §1.4).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

import ray

from .checkpoint import lineage_fingerprint


def _load(manifest_path: str) -> dict:
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    return {}


def _commit(manifest_path: str, manifest: dict) -> None:
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, manifest_path)


def run_partitioned(
    out_dir: str,
    partitions: list[tuple[str, str]],
    fn: Callable[[str, str], int],
    extra_lineage: str = "",
    full_listing: bool = True,
) -> dict:
    """Run ``fn(input_path, tmp_output_path) -> row_count`` once per
    (input_path, output_name) partition, in parallel Ray tasks, skipping
    partitions already committed with matching lineage. Returns the
    partition manifest {output_name: {lineage, rows, wall_sec}}.

    Contract: with ``full_listing=True`` (default), ``partitions`` is the
    COMPLETE current partition list and committed outputs whose input no
    longer appears are garbage-collected (a deleted/renamed input shard
    must not leave its stale output silently included downstream --
    reference version-GC stance, build.go:101-113). A caller submitting a
    deliberate SUBSET (incremental drip of new shards) must pass
    ``full_listing=False`` so untouched partitions are preserved."""
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_PARTITIONS.json")
    manifest = _load(manifest_path)

    current = {out_name for _, out_name in partitions}
    stale_names = [k for k in manifest if k not in current] if full_listing else []
    for stale in stale_names:
        del manifest[stale]
        stale_path = os.path.join(out_dir, stale)
        if os.path.exists(stale_path):
            os.remove(stale_path)

    todo = []
    for input_path, out_name in partitions:
        lineage = lineage_fingerprint(input_path, extra_lineage)
        out_path = os.path.join(out_dir, out_name)
        e = manifest.get(out_name)
        if e and e.get("lineage") == lineage and os.path.exists(out_path):
            continue
        todo.append((input_path, out_name, lineage, out_path))

    @ray.remote
    def _one(input_path: str, out_path: str) -> tuple[int, float]:
        t0 = time.monotonic()
        tmp = out_path + f".tmp{os.getpid()}"
        rows = fn(input_path, tmp)
        os.replace(tmp, out_path)  # atomic per-partition commit
        return rows, time.monotonic() - t0

    refs = [_one.remote(ip, op) for ip, _, _, op in todo]
    for (ip, out_name, lineage, op), (rows, wall) in zip(todo, ray.get(refs)):
        manifest[out_name] = {
            "lineage": lineage,
            "rows": int(rows),
            "wall_sec": round(wall, 3),
        }
    if todo or stale_names:
        _commit(manifest_path, manifest)
    return manifest
