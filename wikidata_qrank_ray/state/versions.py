"""Versioned-output janitor -- the reference's GC that keeps the last ~3
versions of each per-site artifact and deletes stale cache entries
(cmd/qrank-builder/build.go:101-113, cleanup.go:37-83).

Artifacts are named ``<stem>-<version>.<ext>`` (version = sortable string,
e.g. YYYYMMDD or a lineage hash ordered by mtime); ``gc_versions`` keeps
the newest ``keep`` per stem and removes the rest.
"""

from __future__ import annotations

import os
import re
import shutil
from collections import defaultdict

_VERSIONED = re.compile(r"^(?P<stem>.+)-(?P<version>[0-9A-Za-z_.]+?)(?P<ext>\.[A-Za-z0-9.]+)?$")


def gc_versions(dir_path: str, keep: int = 3) -> list[str]:
    """Delete all but the newest ``keep`` versions of each artifact stem in
    ``dir_path`` (newest = version string desc, mtime as tiebreak).
    Returns the deleted paths."""
    groups: dict[tuple[str, str | None], list[tuple[str, float, str]]] = defaultdict(list)
    for name in os.listdir(dir_path):
        m = _VERSIONED.match(name)
        if not m:
            continue
        path = os.path.join(dir_path, name)
        groups[(m.group("stem"), m.group("ext"))].append(
            (m.group("version"), os.path.getmtime(path), path)
        )
    deleted = []
    for _, entries in groups.items():
        entries.sort(key=lambda e: (e[0], e[1]), reverse=True)
        for _, _, path in entries[keep:]:
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
            deleted.append(path)
    return sorted(deleted)
