"""CLI -- the qrank-builder `main()` analogue (cmd/qrank-builder/main.go):

  python -m wikidata_qrank_ray build  --input DIR|PARQUET --run-dir DIR
  python -m wikidata_qrank_ray stream --input DIR|PARQUET [--out JSON]
  python -m wikidata_qrank_ray gc     --dir DIR [--keep 3]

The CLI owns its Ray session (entry points / bench / tests own sessions;
library code never calls ray.init, per the driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="wikidata_qrank_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="checkpointed staged KG build (resumable)")
    b.add_argument("--input", required=True, help="transcripts parquet file or shard dir")
    b.add_argument("--run-dir", required=True)
    b.add_argument("--num-cpus", type=int, default=None)
    b.add_argument("--concurrency", type=int, default=8)
    b.add_argument("--batch-size", type=int, default=32768)

    s = sub.add_parser("stream", help="fully streaming KG build (no intermediates)")
    s.add_argument("--input", required=True)
    s.add_argument("--out", default=None, help="write results JSON here (default stdout summary)")
    s.add_argument("--num-cpus", type=int, default=None)
    s.add_argument("--concurrency", type=int, default=8)

    g = sub.add_parser("gc", help="keep newest-k versions of artifacts in a dir")
    g.add_argument("--dir", required=True)
    g.add_argument("--keep", type=int, default=3)

    q = sub.add_parser("query", help="run a registry query against an sf dir")
    q.add_argument("name", nargs="?", default=None,
                   help="query name (omit to list all)")
    q.add_argument("--sf-dir", required=True, help="directory with the parquet tables")
    q.add_argument("--out", default=None, help="write result parquet here")
    q.add_argument("--num-cpus", type=int, default=None)
    q.add_argument("--head", type=int, default=10)

    d = sub.add_parser(
        "dedup-index",
        help="build or increment a persistent MinHash near-dup index",
    )
    d.add_argument("--docs", required=True, help="parquet file/dir with (doc_id, text)")
    d.add_argument("--index-dir", required=True)
    d.add_argument("--build", action="store_true",
                   help="(re)build the index instead of incrementing")
    d.add_argument("--threshold", type=float, default=0.8)
    d.add_argument("--out", default=None, help="write (doc_id, dup_of) parquet here")
    d.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "dedup-index":
        ray = _init_ray(args.num_cpus)
        try:
            import ray.data as rd

            from .stages.dedup import incremental_minhash_dedup, write_minhash_index

            docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
            if args.build:
                write_minhash_index(docs, args.index_dir)
                print(json.dumps({"built": args.index_dir}))
            else:
                out = incremental_minhash_dedup(
                    docs, args.index_dir, threshold=args.threshold
                )
                if args.out:
                    out.to_parquet(args.out, index=False)
                print(json.dumps({"new_docs_linked": len(out)}))
            return 0
        finally:
            ray.shutdown()

    if args.cmd == "gc":
        from .state.versions import gc_versions

        deleted = gc_versions(args.dir, keep=args.keep)
        print(json.dumps({"deleted": deleted}))
        return 0

    if args.cmd == "query":
        from .pipelines.queries import queries as all_queries

        qs = all_queries()
        if not args.name:
            print(json.dumps(sorted(qs)))
            return 0
        if args.name not in qs:
            print(json.dumps({"error": f"unknown query {args.name!r}"}))
            return 2
        ray = _init_ray(args.num_cpus)
        try:
            import pandas as pd
            import pyarrow as pa
            import ray.data as rd

            res = qs[args.name](args.sf_dir)
            if isinstance(res, rd.Dataset):
                df = res.to_pandas()
            elif isinstance(res, pa.Table):
                df = res.to_pandas()
            else:
                df = res
            if args.out:
                df.to_parquet(args.out, index=False)
            print(json.dumps({"query": args.name, "rows": len(df),
                              "columns": list(map(str, df.columns))}))
            with pd.option_context("display.width", 200):
                print(df.head(args.head).to_string(index=False))
            return 0
        finally:
            ray.shutdown()

    ray = _init_ray(args.num_cpus)
    try:
        from .pipelines import kg_build

        if args.cmd == "build":
            out = kg_build.run(
                transcripts_path=args.input,
                run_dir=args.run_dir,
                concurrency=args.concurrency,
                batch_size=args.batch_size,
            )
            print(json.dumps({"outputs": {k: v for k, v in out.items() if k != "metrics"},
                              "metrics": out["metrics"]}, indent=1))
        else:
            if args.out:
                os.makedirs(args.out, exist_ok=True)
            # out_dir flows into run_streaming so the distributed tier sinks
            # triples straight to Parquet (no materialize-then-rewrite)
            res = kg_build.run_streaming(
                args.input, concurrency=args.concurrency,
                out_dir=args.out or None,
            )
            tri = res["triples"]
            is_ds = not hasattr(tri, "to_parquet")  # Dataset above the combine threshold
            if args.out:
                # count from written Parquet metadata: Dataset.count() after
                # write_parquet would re-execute the whole pipeline
                import pyarrow.dataset as pads

                n_triples = pads.dataset(
                    res["triples_path"], format="parquet", partitioning="hive"
                ).count_rows()
                res["qrank"].to_csv(os.path.join(args.out, "qrank.csv"), index=False)
                with open(os.path.join(args.out, "stats.json"), "w") as f:
                    json.dump(res["stats"], f, sort_keys=True)
            else:
                n_triples = tri.count() if is_ds else len(tri)
            summary = {
                "triples": n_triples,
                "entities": len(res["qrank"]),
                "stats": res["stats"],
            }
            print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
