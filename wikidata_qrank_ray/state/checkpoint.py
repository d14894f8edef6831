"""Per-stage / per-partition checkpoint manifest with lineage + metrics.

The reference skips whole stages when their output object already exists
(pageviews.go:87-93, build.go:87-94, itemsignals.go:140-152) and commits
atomically via write-tmp-then-rename (pageviews.go:98-102). This manager
generalizes that to: one manifest JSON per run directory recording, per
stage, the input lineage fingerprint, output path, row count and wall time;
``run_stage`` skips recompute when the lineage matches, and outputs are
directories of Parquet part files written to a tmp path and renamed -- so a
failed run resumes from the last committed stage and a re-run is a no-op.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable


def lineage_fingerprint(*parts: object) -> str:
    """Stable fingerprint of stage inputs (paths+mtimes, params, upstream
    fingerprints)."""
    h = hashlib.sha256()
    for p in parts:
        if isinstance(p, str) and os.path.exists(p):
            st = os.stat(p)
            h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
        else:
            h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


class CheckpointManager:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.manifest_path = os.path.join(run_dir, "MANIFEST.json")
        self.manifest: dict = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)

    def _commit_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def is_done(self, stage: str, lineage: str) -> bool:
        e = self.manifest.get(stage)
        return bool(e and e.get("lineage") == lineage and os.path.exists(e.get("output", "")))

    def output_path(self, stage: str) -> str:
        return os.path.join(self.run_dir, stage)

    def run_stage(
        self,
        stage: str,
        lineage: str,
        write_fn: Callable[[str], int],
    ) -> str:
        """Run ``write_fn(tmp_output_dir) -> row_count`` unless this stage is
        already committed with the same lineage. Atomic: tmp dir renamed to
        the final path only after write_fn succeeds; manifest appended after
        the rename. Returns the committed output path."""
        out = self.output_path(stage)
        if self.is_done(stage, lineage):
            return out
        tmp = out + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.makedirs(tmp)
        t0 = time.monotonic()
        rows = write_fn(tmp)
        os.replace(tmp, out)
        self.manifest[stage] = {
            "lineage": lineage,
            "output": out,
            "rows": int(rows),
            "wall_sec": round(time.monotonic() - t0, 3),
        }
        self._commit_manifest()
        return out

    def stage_metrics(self) -> dict:
        return {k: {kk: vv for kk, vv in v.items() if kk != "output"} for k, v in self.manifest.items()}
