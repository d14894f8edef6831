"""The shared \\S+ tokenizer contract (functions/tokenize.py) -- the ONE
place engine (Arrow), oracle (DuckDB RE2) and sequential-twin (Python)
tokenization must agree, pinned on the characters where the stdlib
diverges: \\x0b (vertical tab -- ASCII whitespace but NOT RE2 \\s),
\\x0c, \\x1c-\\x1f (Python str.split() separators), NBSP and unicode
spaces (Python \\s in unicode mode)."""

import duckdb
import pyarrow as pa

from wikidata_qrank_ray.functions.tokenize import flat_tokens, py_tokens

CASES = [
    "",
    "   ",
    "plain text here",
    "merge\x0bsort merge",          # \x0b: ONE token under RE2
    "\x0b",
    "x\x0b \x0c y",                 # \x0c IS RE2 whitespace
    "a\x1cb \x1d \x1e\x1f",         # \x1c-\x1f: str.split() splits, RE2 no
    "nb\xa0sp and em",         # unicode spaces: RE2 \s is ASCII-only
    "​zero width",             # ZWSP is not whitespace anywhere
    "tab\tand\nnewline\rand\fff",
    None,
]


def _three_way(cases):
    con = duckdb.connect()
    flat, parent = flat_tokens(pa.array(cases, type=pa.string()),
                               fill_null=True)
    engine = [(int(p), t) for p, t in zip(parent, flat.to_pylist())]
    oracle, twin = [], []
    for i, s in enumerate(cases):
        toks = con.execute(
            "select regexp_extract_all(?, '\\S+')", [s or ""]).fetchone()[0]
        oracle += [(i, t) for t in toks]
        twin += [(i, t) for t in py_tokens(s)]
    assert engine == oracle
    assert engine == twin


def test_three_way_parity_regex_path():
    # CASES contains \x0b, so the whole column takes the RE2 regex path
    _three_way(CASES)


def test_three_way_parity_fast_path():
    # the \x0b-free subset exercises pc.ascii_split_whitespace (the hot
    # path) against the same oracle/twin on every OTHER divergent class
    # (\x1c-\x1f, NBSP, unicode spaces, ZWSP)
    fast = [c for c in CASES if c is None or "\x0b" not in c]
    assert len(fast) >= 7
    _three_way(fast)


def test_bpe_pattern_python_equals_re2():
    # the BPE pre-tokenizer pattern is shared verbatim engine<->SQL; the
    # explicit whitespace class must mean the same thing in both regex
    # engines on the divergent characters
    import re

    from wikidata_qrank_ray.stages.textstats import BPE_PATTERN

    con = duckdb.connect()
    pat = re.compile(BPE_PATTERN)
    for s in [c for c in CASES if c is not None]:
        py = pat.findall(s)
        sq = con.execute(
            "select regexp_extract_all(?, ?)", [s, BPE_PATTERN]).fetchone()[0]
        assert py == sq, (s, py, sq)
