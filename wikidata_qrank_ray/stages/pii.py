"""PII detection + redaction over a document corpus.

A first-class training-data-pipeline operator: emails, IPv4 addresses and
phone numbers are counted and replaced with placeholder tokens, fully
vectorized (one ``pc.count_substring_regex`` + ``pc.replace_substring_regex``
pass per pattern per batch -- no Python row loop, no state, elastic tasks).

Exactness contract: Arrow's regex kernels and DuckDB's regexp functions are
BOTH RE2, so the identical pattern strings produce identical non-overlapping
leftmost matches in the Ray stage and the SQL oracle -- the redacted text is
value-exact, not approximately equal. Patterns are deliberately strict
(anchored shapes, no catastrophic alternation) so the three passes cannot
interfere with each other: an IPv4 octet run never matches the phone shape,
a redacted ``<EMAIL>`` token contains no digits for later passes to eat.

Reference analogue: the reference's per-line regex filters
(pageviews.go:268-294) applied with the same vectorize-don't-iterate
discipline as the title filter; redaction itself is beyond the reference
(its corpus is public pageview counts), motivated by LLM training-data
hygiene.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# RE2-safe patterns, shared verbatim with the SQL oracle (queries.py).
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
]


def _redact_batch(batch: pa.Table, text_col: str) -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    cols: dict = {"doc_id": batch["doc_id"]}
    red = text
    # counts are taken on the ORIGINAL text, then patterns are applied in
    # declaration order (same order as the oracle's regexp_replace chain)
    for name, pat, _ in PII_PATTERNS:
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64()
        )
    for _, pat, repl in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pat, repl)
    cols["redacted"] = red
    return pa.table(cols)


def redact_pii(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, text) -> (doc_id, n_email, n_ip, n_phone, redacted).

    Stateless and elastic: plain tasks scale to every core; per-batch work
    is three RE2 scans + three RE2 replaces over one Arrow string column,
    zero-copy in and out. At 100 TB this runs at read speed -- there is no
    shuffle, no state, and nothing leaves the batch but its own rows."""
    return docs.map_batches(
        _redact_batch, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    )
