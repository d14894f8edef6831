"""Flagship end-to-end KG build -- the `Build()` analogue
(cmd/qrank-builder/build.go:20-56): transcripts -> normalize -> mentions ->
triples + rank rollup -> canonicalize -> sorted, deduplicated Parquet
partitions + stats JSON, every stage checkpointed with lineage + metrics
(resume skips committed stages; reruns are no-ops).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..sources.gazetteer import build_aliases
from ..sources.transcripts import derive_transcripts
from ..stages.canonicalize import canonicalize_ranks, canonicalize_triples, resolve_aliases
from ..stages.mentions import detect_mentions
from ..stages.normalize import normalize_stage
from ..stages.rank import qrank_order, salted_rollup
from ..stages.stats import rank_stats
from ..stages.triples import extract_triples
from ..state.checkpoint import CheckpointManager, lineage_fingerprint


def _gazetteer_from_turns(
    turns: ray.data.Dataset, top_n: int = 30, text_col: str = "text"
) -> pd.DataFrame:
    """Gazetteer from the corpus itself (token frequency, stopwords dropped,
    qid = 'Q'+rank). Map-side partial value_counts -> tiny groupby."""
    from ..sources.gazetteer import STOPWORDS, _partial_counts

    partial = turns.map_batches(
        lambda t: _partial_counts(t.select([text_col]).rename_columns(["text"])),
        batch_format="pyarrow",
    )
    df = partial.groupby("surface").sum("cnt").to_pandas()
    df = df[~df["surface"].isin(STOPWORDS)]
    df = df.sort_values(["sum(cnt)", "surface"], ascending=[False, True], kind="mergesort")
    df = df.head(top_n).reset_index(drop=True)
    return pd.DataFrame(
        {
            "qid": ["Q" + str(i + 1) for i in range(len(df))],
            "surface": df["surface"].to_numpy(),
            "prior": df["sum(cnt)"].astype("int64").to_numpy(),
        }
    )


def run(
    transcripts_path: str,
    run_dir: str,
    sf_dir: str | None = None,
    concurrency: int = 8,
    batch_size: int = 8192,
) -> dict:
    """Run the full build. ``transcripts_path`` is a Parquet file/dir with
    the input_hint schema; if None-like and ``sf_dir`` given, transcripts are
    derived from documents. Returns output paths + per-stage metrics."""
    ckpt = CheckpointManager(run_dir)

    if transcripts_path:
        turns = ray.data.read_parquet(transcripts_path)
        src_lineage = lineage_fingerprint(transcripts_path)
    else:
        turns = derive_transcripts(sf_dir)
        src_lineage = lineage_fingerprint(os.path.join(sf_dir, "documents.parquet"))

    # Stage 1: normalize (full casefold+NFC semantics), preserve raw text for
    # the per-turn text-equality invariant.
    def _rows_in_dir(d: str) -> int:
        return sum(
            pq.read_metadata(os.path.join(d, f)).num_rows
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    def write_norm(tmp: str) -> int:
        normalize_stage(turns).write_parquet(tmp)
        return _rows_in_dir(tmp)

    norm_path = ckpt.run_stage("normalized", lineage_fingerprint(src_lineage, "norm-v1"), write_norm)
    norm = ray.data.read_parquet(norm_path)

    # Stage 2: gazetteer + aliases (small dimension tables; broadcast refs).
    gaz_file = os.path.join(run_dir, "gazetteer.parquet")
    gl = lineage_fingerprint(norm_path, "gaz-v1")
    if not (ckpt.manifest.get("gazetteer", {}).get("lineage") == gl and os.path.exists(gaz_file)):
        gaz = _gazetteer_from_turns(norm, text_col="norm_text")
        pq.write_table(pa.Table.from_pandas(gaz, preserve_index=False), gaz_file)
        ckpt.manifest["gazetteer"] = {"lineage": gl, "output": gaz_file, "rows": len(gaz)}
        ckpt._commit_manifest()
    gaz = pq.read_table(gaz_file).to_pandas()
    aliases = build_aliases(gaz)
    mapping = resolve_aliases(aliases)
    gaz_ref = ray.put(gaz)
    mapping_ref = ray.put(mapping)

    # Stage 3: triples (extract -> canonicalize -> sort -> partitioned parquet)
    def write_triples(tmp: str) -> int:
        tr = extract_triples(
            norm, gaz_ref, concurrency=concurrency, batch_size=batch_size, text_col="norm_text"
        )
        ct = canonicalize_triples(tr, mapping_ref)
        ct = ct.sort(["subj", "pred", "obj"])
        ct.write_parquet(tmp)
        return _rows_in_dir(tmp)

    triples_path = ckpt.run_stage(
        "triples", lineage_fingerprint(norm_path, gl, "triples-v1"), write_triples
    )

    # Stage 4: entity rank (salted rollup -> canonicalize -> qrank order)
    def write_rank(tmp: str) -> int:
        partial = detect_mentions(
            norm,
            gaz_ref,
            mode="partial_counts",
            concurrency=concurrency,
            batch_size=batch_size,
            text_col="norm_text",
        )
        ranked = canonicalize_ranks(salted_rollup(partial), mapping_ref)
        qdf = qrank_order(ranked)
        pq.write_table(
            pa.Table.from_pandas(qdf, preserve_index=False), os.path.join(tmp, "qrank.parquet")
        )
        qdf.to_csv(os.path.join(tmp, "qrank.csv"), index=False)
        return len(qdf)

    rank_path = ckpt.run_stage(
        "qrank", lineage_fingerprint(norm_path, gl, "rank-v1"), write_rank
    )

    # Stage 5: stats JSON (stats.go:28-139 semantics)
    def write_stats(tmp: str) -> int:
        qdf = pq.read_table(os.path.join(rank_path, "qrank.parquet")).to_pandas()
        st = rank_stats(qdf)
        with open(os.path.join(tmp, "stats.json"), "w") as f:
            json.dump(st, f, sort_keys=True)
        return 1

    stats_path = ckpt.run_stage(
        "stats", lineage_fingerprint(rank_path, "stats-v1"), write_stats
    )

    return {
        "normalized": norm_path,
        "gazetteer": gaz_file,
        "triples": triples_path,
        "qrank": rank_path,
        "stats": stats_path,
        "metrics": ckpt.stage_metrics(),
    }
