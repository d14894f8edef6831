"""Benchmark harness.

Headline: the flagship KG build (normalize -> gazetteer -> mentions ->
triples -> canonical qrank -> stats) over a deterministic synthetic
transcript corpus (Zipf-skewed entities), reported as wall seconds and
turns/sec. Per-query timings over $GRAFT_SF_DIR (default sf0.1) cover the
other operator families.

Usage:
  python bench.py              # one JSON line
  python bench.py --scaling    # same job at 8 and 32 CPUs in fresh
                               # processes; prints throughputs + efficiency

Env: GRAFT_SF_DIR, RAY_GRAFT_CPUS, GRAFT_BENCH_TURNS (default 500_000).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("GRAFT_BENCH_TURNS", "500000"))
CORPUS_DIR = os.environ.get(
    "GRAFT_BENCH_CORPUS", f"/tmp/graft_bench_corpus_{BENCH_TURNS}"
)

QUERY_NAMES = [
    "mentions",
    "entity_rank_salted",
    "canonical_triples",
    "canonical_qrank",
    "pricing_summary",
    "top_orders_by_revenue",
    "events_hourly",
    "sessionize",
    "dedup_exact",
    "token_counts",
    "ann_topk",
    "minhash_dedup",
]


def _consume(res) -> int:
    """Force execution; return row count without re-executing."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return len(res)
    if isinstance(res, pa.Table):
        return res.num_rows
    total = 0
    for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
        total += b.num_rows
    return total


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from wikidata_qrank_ray.pipelines import kg_build
    from wikidata_qrank_ray.pipelines.queries import queries as all_queries
    from wikidata_qrank_ray.sources.transcripts import synth_transcripts_parquet

    # corpus: deterministic, cached across runs/parallelism levels
    synth_transcripts_parquet(CORPUS_DIR, BENCH_TURNS, seed=42, shards=32)

    # warm the OS page cache (untimed) so we measure compute+shuffle
    ray.data.read_parquet(CORPUS_DIR).count()

    # headline: full KG build, fresh run dir (no checkpoint skip)
    run_dir = tempfile.mkdtemp(prefix="kgbench_")
    t0 = time.monotonic()
    out = kg_build.run(
        transcripts_path=CORPUS_DIR,
        run_dir=run_dir,
        concurrency=max(2, NUM_CPUS // 2),
        batch_size=16384,
    )
    headline = time.monotonic() - t0
    shutil.rmtree(run_dir, ignore_errors=True)

    qtimes = {}
    qs = all_queries()
    for name in QUERY_NAMES:
        t0 = time.monotonic()
        n = _consume(qs[name](SF_DIR))
        qtimes[name] = round(time.monotonic() - t0, 3)

    result = {
        "metric": "kg_build_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1),
        "num_cpus": NUM_CPUS,
        "bench_turns": BENCH_TURNS,
        "turns_per_sec": round(BENCH_TURNS / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    tput_lo, tput_hi = r_lo["turns_per_sec"], r_hi["turns_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "turns_per_sec_lo": tput_lo,
        "turns_per_sec_hi": tput_hi,
        "bench_turns": r_lo["bench_turns"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
