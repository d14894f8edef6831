"""Shared whitespace tokenization + positional k-gram kernels.

ONE home for the three subtle invariants every token-level operator
(gazetteer n-gram counting, phrase mention matching, shingle-based dedup)
must agree on, so they cannot silently desynchronize:

- \\S+ token semantics: ``pc.ascii_split_whitespace`` splits on
  [ \\t\\n\\v\\f\\r], which matches RE2's \\s+ (the DuckDB oracles'
  ``regexp_extract_all('\\S+')``) on every character EXCEPT \\x0b
  (vertical tab -- ASCII whitespace, but NOT in RE2's \\s class), and is
  ~6x faster than the regex kernel. Only the ROWS that actually contain
  \\x0b (detected with one cheap substring scan) take the
  ``pc.split_pattern_regex(r"\\s+")`` path instead: Arrow's regex kernel
  IS RE2, the same library DuckDB binds, so parity there is by
  construction; the other rows of the same block keep the fast kernel
  and a stable sort on the source row index re-merges the two streams
  in (row, position) order. Both paths emit phantom "" fragments around
  leading/trailing/isolated whitespace that \\S+ never produces -- they
  are filtered here, once.
- parent-boundary masking: a k-gram starting at flat position p is valid
  iff p and p+k-1 belong to the same source row (positions within a row
  are contiguous after the phantom filter, so endpoint equality suffices).
- copy-before-concat: the numpy object-array join must start from a copy
  (``toks[idxs].copy()``) or the += style concat would mutate the shared
  token array.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2's \S is [^ \t\n\f\r]; Python's \S (even with re.ASCII) additionally
# excludes \v (\x0b), and str.split() also splits on unicode spaces -- the
# explicit class makes plain-Python code (test twins, sketch tokenizers)
# match the Arrow/DuckDB contract exactly
_S_PLUS = re.compile(r"[^ \t\n\f\r]+")


def py_tokens(text) -> list:
    """\\S+ tokens of ONE Python string under the shared RE2 contract --
    the sequential-twin counterpart of :func:`flat_tokens`."""
    return _S_PLUS.findall(text or "")


def flat_tokens(
    text_col, *, fill_null: bool = False
) -> tuple[pa.Array, np.ndarray]:
    """Column of strings -> (tokens as ONE flat Arrow string array, parent
    row index per token), \\S+ semantics. ``fill_null`` treats null text as
    "" (token-less) instead of propagating a null list."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    if fill_null:
        text_col = pc.fill_null(text_col, "")
    vt_rows = pc.fill_null(pc.match_substring(text_col, "\x0b"), False)
    if not bool(pc.any(vt_rows).as_py()):
        return _flatten(pc.ascii_split_whitespace(text_col), None)
    # ROW-granular slow path: only the rows that actually contain \x0b pay
    # the ~6x regex tax (exact RE2 \s+ semantics, see module docstring --
    # \x0b is NOT RE2 whitespace, so the fast ASCII splitter would
    # over-split them); every other row keeps the fast kernel. Each row
    # lands wholly in one branch, so a stable sort on the original row
    # index restores global (row, position) order.
    m = vt_rows.to_numpy(zero_copy_only=False).astype(bool)
    rows = np.arange(len(text_col), dtype=np.int64)
    flat_s, par_s = _flatten(
        pc.split_pattern_regex(text_col.filter(pa.array(m)), r"\s+"),
        rows[m])
    flat_f, par_f = _flatten(
        pc.ascii_split_whitespace(text_col.filter(pa.array(~m))),
        rows[~m])
    flat = pa.concat_arrays([flat_s, flat_f])
    parent = np.concatenate([par_s, par_f])
    order = np.argsort(parent, kind="stable")
    return flat.take(pa.array(order)), parent[order]


def _flatten(parts, row_ids) -> tuple[pa.Array, np.ndarray]:
    """List-of-tokens column -> (flat tokens, ORIGINAL row index per
    token): drops the phantom "" fragments both split kernels emit and
    maps local list positions back through ``row_ids`` (None = identity,
    the no-\\x0b fast path -- skips the gather)."""
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parent = parent.filter(mask)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    local = parent.to_numpy()
    if row_ids is None or not len(local):
        return flat, local.astype(np.int64, copy=False)
    return flat, row_ids[local]


def kgram_starts(parent: np.ndarray, k: int) -> np.ndarray:
    """Flat positions where a full k-gram fits inside one source row:
    p such that parent[p] == parent[p + k - 1]."""
    n = len(parent)
    if n < k:
        return np.array([], dtype=np.int64)
    if k == 1:
        return np.arange(n, dtype=np.int64)
    ok = parent[: n - k + 1] == parent[k - 1:]
    return np.nonzero(ok)[0].astype(np.int64)


def kgram_join(toks: np.ndarray, idxs: np.ndarray, k: int) -> np.ndarray:
    """Single-space join of toks[i..i+k-1] for each start i in ``idxs``.
    ``toks`` must be a numpy object array; returns a fresh object array."""
    if not len(idxs):
        return np.array([], dtype=object)
    if k == 1:
        return toks[idxs].copy()
    cand = toks[idxs].copy()
    for j in range(1, k):
        cand = cand + " "
        cand = cand + toks[idxs + j]
    return cand
