"""Transcript corpus: the engine's prime input table
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]) per BASELINE.json input_hint.

Two deterministic producers:

- ``derive_transcripts(sf_dir)``: derive the corpus 1:1 from the driver's
  ``documents`` table with a pure-function mapping of ``doc_id`` so a DuckDB
  oracle can express the identical derivation in SQL (correctness gate).
- ``synth_transcripts_parquet(...)``: seeded generator at arbitrary scale
  (bench / scaling runs), Zipf-skewed entity surfaces so hot-key salting
  paths are exercised (FIXTURES.md §5).

Mapping (mirrored in pipelines/queries.TRANSCRIPTS_CTE):
  conv_id  = 'c' + str(doc_id // 8)
  turn_idx = doc_id % 8
  role     = ['user','assistant','tool'][doc_id % 3]
  tool     = source if role == 'tool' else ''
  ts       = 2024-01-01T00:00:00 + doc_id seconds
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from .tables import read_table

TURNS_PER_CONV = 8
_ROLES = ("user", "assistant", "tool")
_TS_BASE_US = 1704067200000000  # 2024-01-01T00:00:00 UTC in microseconds


def _docs_to_turns(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"]
    conv = pc.binary_join_element_wise(
        "c", pc.cast(pc.divide(doc_id, TURNS_PER_CONV), pa.string()), ""
    )
    turn_idx = pc.cast(pc.subtract(doc_id, pc.multiply(pc.divide(doc_id, TURNS_PER_CONV), TURNS_PER_CONV)), pa.int32())
    role_idx = pc.subtract(doc_id, pc.multiply(pc.divide(doc_id, 3), 3)).to_numpy()
    roles = np.array(_ROLES, dtype=object)[role_idx]
    src = batch["source"].to_numpy(zero_copy_only=False)
    tool = np.where(role_idx == 2, src, "")
    ts = pa.array(_TS_BASE_US + doc_id.to_numpy() * 1_000_000, type=pa.timestamp("us"))
    return pa.table(
        {
            "conv_id": conv,
            "turn_idx": turn_idx,
            "role": pa.array(roles, type=pa.string()),
            # lenient policy: null text coerced to '' (mirrored by
            # COALESCE in the oracle's turns CTE)
            "text": pc.fill_null(batch["text"], ""),
            "tool": pa.array(tool, type=pa.string()),
            "ts": ts,
        }
    )


def derive_transcripts(sf_dir: str) -> ray.data.Dataset:
    """documents -> transcripts, zero-copy Arrow map_batches (stateless)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return docs.map_batches(_docs_to_turns, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Seeded large-scale generator (bench + scaling evidence)
# ---------------------------------------------------------------------------

_VOCAB_ENTITIES = [
    "spark", "table", "merge", "join", "sort", "window", "batch", "vector",
    "stream", "filter", "query", "column", "hash", "scan", "group", "order",
    "customer", "line", "value", "key", "part", "row", "data", "agg",
]
_VOCAB_FILLER = ["the", "a", "fast", "slow", "small", "big", "dup"]
_TOOLS = ["search", "calc", "browse", "exec"]


def synth_transcripts_parquet(
    out_dir: str,
    n_turns: int,
    seed: int = 42,
    shards: int = 32,
    tokens_per_turn: int = 40,
    vocab_entities: int | None = None,
) -> str:
    """Write a deterministic transcript corpus as ``shards`` Parquet files
    under ``out_dir`` (resumable layout: one file per shard; skip if the
    directory is already complete). Entity surfaces are Zipf(s=1.1)-skewed
    so the hot-key (power-law) paths of the rank rollup are exercised.
    Returns ``out_dir``.
    """
    done = os.path.join(out_dir, "_DONE")
    marker = f"{n_turns}:{seed}:{shards}:{tokens_per_turn}:{vocab_entities}"
    if os.path.exists(done):
        with open(done) as f:
            if f.read() == marker:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per_shard = n_turns // shards
    args = []
    for s in range(shards):
        n = per_shard if s < shards - 1 else n_turns - per_shard * (shards - 1)
        args.append((out_dir, s, seed, s * per_shard, n, tokens_per_turn, vocab_entities))
    import ray

    if ray.is_initialized():
        # generation is embarrassingly parallel: one Ray task per shard
        fn = ray.remote(_write_synth_shard)
        ray.get([fn.remote(*a) for a in args])
    else:
        for a in args:
            _write_synth_shard(*a)
    with open(done, "w") as f:
        f.write(marker)
    return out_dir


def _write_synth_shard(
    out_dir: str, s: int, seed: int, start: int, n: int, tokens_per_turn: int,
    vocab_entities: int | None = None,
) -> str:
    # vocab_entities: synthetic large-vocabulary mode for scale tests of
    # the actor-pool extractor / sparse pair path / distributed combine
    # (the default corpus has a deliberately small entity vocabulary)
    if vocab_entities:
        ent = np.array([f"ent{i}" for i in range(vocab_entities)], dtype=object)
    else:
        ent = np.array(_VOCAB_ENTITIES, dtype=object)
    fil = np.array(_VOCAB_FILLER, dtype=object)
    # Zipf ranks over entities, fixed across shards.
    zipf_w = 1.0 / np.arange(1, len(ent) + 1) ** 1.1
    zipf_w /= zipf_w.sum()
    path = os.path.join(out_dir, f"part-{s:05d}.parquet")
    rng = np.random.RandomState(seed * 1000 + s)
    gid = np.arange(start, start + n, dtype=np.int64)
    ntok = tokens_per_turn
    is_ent = rng.random_sample((n, ntok)) < 0.6
    ent_pick = ent[rng.choice(len(ent), size=(n, ntok), p=zipf_w)]
    fil_pick = fil[rng.randint(0, len(fil), size=(n, ntok))]
    words = np.where(is_ent, ent_pick, fil_pick)
    texts = [" ".join(row) for row in words]
    role_idx = (gid % 3).astype(np.int64)
    roles = np.array(_ROLES, dtype=object)[role_idx]
    tools = np.where(
        role_idx == 2,
        np.array(_TOOLS, dtype=object)[(gid % len(_TOOLS)).astype(np.int64)],
        "",
    )
    t = pa.table(
        {
            "conv_id": pa.array([f"c{int(g) // TURNS_PER_CONV}" for g in gid], type=pa.string()),
            "turn_idx": pa.array((gid % TURNS_PER_CONV).astype(np.int32)),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(_TS_BASE_US + gid * 1_000_000, type=pa.timestamp("us")),
        }
    )
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)  # atomic per-shard commit (pageviews.go:98-102 idea)
    return path
