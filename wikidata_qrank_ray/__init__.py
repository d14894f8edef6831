"""ray-kg-qrank: Ray-Data-native knowledge-graph construction engine.

A from-scratch reimagination of brawer/wikidata-qrank (reference at
/root/reference, snapshot 2025-08-08) as idiomatic Ray Data pipelines over
zero-copy Arrow batches, retargeted at multi-turn conversation/agent
transcripts: mention detection -> entity linking -> triple extraction ->
canonicalization -> salted rank rollup -> sorted, deduplicated Parquet
output equivalent to the reference's qrank.csv ordering
(cmd/qrank-builder/qrank.go:45-53).

Subpackages:
- functions: pure scalar/vector functions (text normalization, qid codec,
  hashing) -- the util.go analogues.
- sources: table readers + deterministic synthetic corpus derivation.
- stages: Dataset -> Dataset operators (normalize, mentions, triples,
  canonicalize, rank, dedup, similarity, textstats, stats, multimodal).
- pipelines: end-to-end flagship build + the queries() registry.
- state: per-partition checkpoint manifest / lineage (the reference's
  output-exists-skip, build.go:87-94, at partition granularity).
"""

__version__ = "0.1.0"

# Ray workers may not have this repo on sys.path (the driver controls
# ray.init). Registering the package for pickle-by-value makes every
# map_batches fn/class self-contained: cloudpickle ships the code with the
# task instead of importing it by name on the worker (parent-package
# registration covers all submodules).
import sys as _sys

try:
    from ray import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - ray not installed / old cloudpickle
    pass
