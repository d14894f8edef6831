"""Per-turn text normalization stage -- the `formatLine` analogue
(cmd/qrank-builder/util.go:119-251) as a stateless zero-copy Arrow
``map_batches``.

Two variants:
- ``normalize_stage``: full casefold+NFC+ctrl->"_" (library semantics,
  golden-tested against the reference's util_test.go:67-161 cases).
- ``normalize_stage_sql_parity``: lower+NFC, exactly DuckDB's
  ``nfc_normalize(lower(text))`` -- used by oracle-checked queries.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.textnorm import normalize_text


def _norm_full(batch: pa.Table) -> pa.Table:
    # append, don't overwrite: the raw ``text`` column must survive end-to-end
    # (per-turn text equality invariant, BASELINE.json input_hint).
    #
    # Vectorized fast path: for ASCII strings casefold==lower and NFC is the
    # identity, so lower + ctrl->"_" runs entirely in Arrow kernels; only
    # non-ASCII rows take the per-row casefold+NFC fallback.
    # metadata strip: pandas-written source Parquet carries an unhashable
    # pandas metadata dict that defeats Ray's block-schema dedup downstream
    batch = batch.replace_schema_metadata(None)
    col = batch["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # lenient-parse policy (reference: tolerate malformed inputs, log and
    # continue, wikisites.go:273-330): null text -> empty string
    col = pc.fill_null(col, "")
    fast = pc.replace_substring_regex(pc.utf8_lower(col), r"[\x00-\x1f\x7f-\x9f]", "_")
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    if bool(ascii_mask.all()):
        out_arr = fast
    else:
        vals = np.asarray(fast.to_numpy(zero_copy_only=False), dtype=object)
        texts = col.to_numpy(zero_copy_only=False)
        for i in np.nonzero(~ascii_mask)[0]:
            vals[i] = normalize_text(texts[i])
        out_arr = pa.array(vals, type=pa.string())
    return batch.append_column("norm_text", out_arr)


def _norm_sql(batch: pa.Table) -> pa.Table:
    # utf8_lower is the vectorized Arrow kernel; for ASCII rows NFC is the
    # identity, so the Python NFC fallback runs ONLY on the (rare)
    # non-ASCII rows -- the same fast-path mask _norm_full uses.
    batch = batch.replace_schema_metadata(None)  # see _norm_full
    col = batch["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    lowered = pc.utf8_lower(col)
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    if bool(ascii_mask.all()):
        out_arr = lowered
    else:
        vals = np.asarray(lowered.to_numpy(zero_copy_only=False), dtype=object)
        for i in np.nonzero(~ascii_mask)[0]:
            vals[i] = unicodedata.normalize("NFC", vals[i])
        out_arr = pa.array(vals, type=pa.string())
    return batch.append_column("norm_text", out_arr)


def normalize_stage(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(_norm_full, batch_format="pyarrow")


def normalize_stage_sql_parity(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(_norm_sql, batch_format="pyarrow")
