"""Entity-ID codec -- the `ParseItem` / `Item.String` analogue.

The reference packs "Q72" / "L123" into a uint64 with a high-bit lexeme mask
(cmd/qrank-builder/util.go:32-60). We keep the same idea -- a sortable int64
with a kind bit -- so rank sorts tie-break on numeric id, not lexicographic
string order ("Q10" must sort after "Q2", cmd/qrank-builder/qrank.go:45-53).
"""

from __future__ import annotations

import numpy as np

_LEXEME_BIT = 1 << 62


def parse_qid(s: str) -> int:
    """'Q72' -> 72; 'L123' -> 123 | LEXEME_BIT. Raises ValueError otherwise."""
    if len(s) < 2:
        raise ValueError(f"bad entity id: {s!r}")
    kind, num = s[0], s[1:]
    if not num.isdigit():
        raise ValueError(f"bad entity id: {s!r}")
    n = int(num)
    if kind == "Q":
        return n
    if kind == "L":
        return n | _LEXEME_BIT
    raise ValueError(f"bad entity id kind: {s!r}")


def format_qid(n: int) -> str:
    if n & _LEXEME_BIT:
        return f"L{n & ~_LEXEME_BIT}"
    return f"Q{n}"


def qid_num(arr) -> np.ndarray:
    """Vectorized 'Q##' -> int64 for plain Q-ids (the hot path: rank sort
    keys). Accepts a numpy/pandas string array; assumes 'Q' prefix."""
    import pandas as pd

    s = pd.Series(arr, dtype="object")
    return s.str.slice(1).astype("int64").to_numpy()
