"""Property-based tests (hypothesis) over the core kernels -- going beyond
the reference's table-driven tests (it has no randomized testing,
SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from wikidata_qrank_ray.functions.hashing import (
    minhash_coeffs,
    minhash_signatures_batch,
    stable_hash64,
)
from wikidata_qrank_ray.functions.textnorm import normalize_text
from wikidata_qrank_ray.stages.mentions import GazetteerMatcher

texts = st.text(max_size=60)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@given(texts)
@settings(max_examples=200, deadline=None)
def test_normalize_no_control_chars(s):
    out = normalize_text(s)
    assert not any("\x00" <= c <= "\x1f" or "\x7f" <= c <= "\x9f" for c in out)


@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=30), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_matcher_partial_counts_match_python_count(texts_list):
    gaz = pd.DataFrame(
        {"qid": ["Q1", "Q2"], "surface": ["ab", "cd"], "prior": [5, 3]}
    )
    m = GazetteerMatcher(gaz, mode="partial_counts")
    batch = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(len(texts_list))],
            "turn_idx": pa.array([0] * len(texts_list), type=pa.int32()),
            "text": texts_list,
            "tool": [""] * len(texts_list),
        }
    )
    got = dict(zip(*[c.to_pylist() for c in m(batch).columns]))
    expect = {}
    for t in texts_list:
        for tok in t.split():
            if tok == "ab":
                expect["Q1"] = expect.get("Q1", 0) + 1
            elif tok == "cd":
                expect["Q2"] = expect.get("Q2", 0) + 1
    assert got == expect


@given(st.lists(st.text(alphabet="xyz", min_size=1, max_size=5), min_size=0, max_size=50))
@settings(max_examples=100, deadline=None)
def test_stable_hash_is_stable_and_injective_enough(tokens):
    if not tokens:
        return
    h1, h2 = stable_hash64(tokens), stable_hash64(tokens)
    assert (h1 == h2).all()
    # equal inputs hash equal
    df = pd.DataFrame({"t": tokens, "h": h1})
    assert (df.groupby("t")["h"].nunique() == 1).all()


@given(st.integers(1, 30), st.integers(0, 5))
@settings(max_examples=50, deadline=None)
def test_minhash_batch_matches_per_doc(n_sh, extra):
    a, b = minhash_coeffs(16)
    h1 = stable_hash64([f"s{i}" for i in range(n_sh)])
    h2 = stable_hash64([f"t{i}" for i in range(n_sh + extra)])
    both = np.concatenate([h1, h2])
    starts = np.array([0, len(h1)], dtype=np.int64)
    batch = minhash_signatures_batch(both, starts, a, b)
    solo1 = minhash_signatures_batch(h1, np.array([0]), a, b)[0]
    solo2 = minhash_signatures_batch(h2, np.array([0]), a, b)[0]
    assert (batch[0] == solo1).all()
    assert (batch[1] == solo2).all()
