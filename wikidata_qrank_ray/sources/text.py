"""Text-format sources/sinks -- the reference ingests line-oriented text
dumps (bz2 pageview logs, SQL dumps) and publishes gzip CSV
(qrank.go:66-99). A user migrating from it may still hold JSONL / CSV
inputs, so the engine reads those natively (Ray Data readers + schema
coercion with the lenient-parse policy) and publishes the byte-compatible
final CSV artifact.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _coerce_transcripts(batch: pa.Table) -> pa.Table:
    """Coerce a read batch to the input_hint schema, leniently
    (wikisites.go:273-330 stance: tolerate, coerce, continue): ANY missing
    column materializes as its default, nulls coerce to ''/0, string
    timestamps parse leniently (ISO variants incl. fractional seconds /
    timezone suffixes; unparseable -> epoch) -- a malformed shard must
    never kill the pipeline."""
    n = batch.num_rows
    cols = {}
    names = set(batch.schema.names)

    def _str_col(name: str):
        if name not in names:
            return pa.array([""] * n, type=pa.string())
        col = batch[name]
        try:
            # cast first (numeric -> string succeeds), then fill nulls
            return pc.fill_null(pc.cast(col, pa.string()), "")
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            vals = ["" if v is None else str(v) for v in col.to_pylist()]
            return pa.array(vals, type=pa.string())

    cols["conv_id"] = _str_col("conv_id")
    if "turn_idx" in names:
        try:
            cols["turn_idx"] = pc.cast(pc.fill_null(batch["turn_idx"], 0), pa.int32())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            ti = pd.to_numeric(batch["turn_idx"].to_pandas(), errors="coerce")
            # out-of-range values coerce to the default (no int32 wraparound)
            ti = ti.where((ti >= -(2 ** 31)) & (ti < 2 ** 31), 0)
            cols["turn_idx"] = pa.array(
                ti.fillna(0).astype("int32").to_numpy(), type=pa.int32()
            )
    else:
        cols["turn_idx"] = pa.array(np.zeros(n, dtype=np.int32), type=pa.int32())
    cols["role"] = _str_col("role")
    cols["text"] = _str_col("text")
    cols["tool"] = _str_col("tool")

    def _lenient_ts(ts) -> pa.Array:
        if pa.types.is_string(ts.type) or pa.types.is_large_string(ts.type):
            parsed = pd.to_datetime(ts.to_pandas(), errors="coerce", utc=True)
            parsed = parsed.dt.tz_localize(None)
        else:
            try:
                return pc.cast(pc.fill_null(ts, 0), pa.timestamp("us"))
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                # per-VALUE salvage (only offending values become epoch,
                # valid timestamps in the batch survive)
                parsed = pd.to_datetime(ts.to_pandas(), errors="coerce")
        parsed = parsed.fillna(pd.Timestamp(0))
        return pa.array(
            parsed.astype("datetime64[us]").to_numpy(), type=pa.timestamp("us")
        )

    cols["ts"] = (
        _lenient_ts(batch["ts"]) if "ts" in names
        else pa.array([0] * n, type=pa.timestamp("us"))
    )
    return pa.table(cols)


def read_jsonl_transcripts(path: str) -> ray.data.Dataset:
    """JSONL transcript shards -> input_hint-schema Dataset (parallel file
    reads are native to read_json; coercion is a stateless Arrow map)."""
    return ray.data.read_json(path).map_batches(
        _coerce_transcripts, batch_format="pyarrow"
    )


def read_csv_transcripts(path: str) -> ray.data.Dataset:
    """CSV transcript shards -> input_hint-schema Dataset."""
    return ray.data.read_csv(path).map_batches(
        _coerce_transcripts, batch_format="pyarrow"
    )


def publish_qrank_csv_gz(qdf: pd.DataFrame, out_path: str) -> str:
    """Write the reference's final artifact format (qrank.go:66-99):
    gzip CSV with header ``Entity,QRank`` and rows in rank order
    (value desc, numeric qid asc -- the qrank.go:45-53 comparator, which
    ``qrank_order`` already applied). Atomic tmp+rename."""
    tmp = out_path + f".tmp{os.getpid()}"
    with gzip.open(tmp, "wt", newline="") as f:
        f.write("Entity,QRank\n")
        for qid, val in zip(qdf["qid"], qdf["rank_value"]):
            f.write(f"{qid},{int(val)}\n")
    os.replace(tmp, out_path)
    return out_path
