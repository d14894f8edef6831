"""Property tests for round-2 kernels: each vectorized implementation is
pinned against an independent naive model (the reference's
table-driven-golden discipline, generalized with hypothesis)."""

import urllib.parse

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# url_query_unescape vs an independent stdlib-based model
# ---------------------------------------------------------------------------

_HEXDIG = set("0123456789abcdefABCDEF")


def _model_unescape(s: str):
    # validity: every '%' must be followed by two hex digits
    i = 0
    while (i := s.find("%", i)) != -1:
        if i + 2 >= len(s) or s[i + 1] not in _HEXDIG or s[i + 2] not in _HEXDIG:
            return s  # fallback to raw
        i += 3
    raw = urllib.parse.unquote_to_bytes(s.replace("+", " "))
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return None


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from("ab%+0129AFzé "), max_size=24))
def test_url_unescape_matches_model(s):
    from wikidata_qrank_ray.functions.textnorm import url_query_unescape

    assert url_query_unescape(s) == _model_unescape(s)


# ---------------------------------------------------------------------------
# polyhash64 vs per-token Python reduce
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=20))
def test_polyhash64_matches_scalar_reduce(tokens):
    from wikidata_qrank_ray.functions.hashing import polyhash64

    got = polyhash64(np.array(tokens, dtype=object))
    for t, h in zip(tokens, got):
        acc = 0
        for ch in t:
            acc = (acc * 1000003 + ord(ch)) % (1 << 64)
        assert int(h) == acc


# ---------------------------------------------------------------------------
# PhraseGazetteerMatcher (run-parity vectorized) vs a sequential greedy scan
# ---------------------------------------------------------------------------


def _sequential_greedy(tokens, uni, bi):
    out = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and (s2 := tokens[i] + " " + tokens[i + 1]) in bi:
            out.append((bi[s2], s2))
            i += 2
            continue
        if tokens[i] in uni:
            out.append((uni[tokens[i]], tokens[i]))
        i += 1
    return set(out)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=14),
    st.sets(st.sampled_from("abcde"), max_size=3),
    st.sets(
        st.tuples(st.sampled_from("abcde"), st.sampled_from("abcde")), max_size=6
    ),
)
def test_phrase_matcher_matches_sequential_greedy(tokens, uni_surf, bi_pairs):
    from wikidata_qrank_ray.stages.mentions import PhraseGazetteerMatcher

    uni = {s: f"Q{i + 1}" for i, s in enumerate(sorted(uni_surf))}
    bi = {f"{x} {y}": f"Q{100 + i}" for i, (x, y) in enumerate(sorted(bi_pairs))}
    gaz = pd.DataFrame(
        {
            "qid": list(uni.values()) + list(bi.values()),
            "surface": list(uni.keys()) + list(bi.keys()),
            "prior": [1] * (len(uni) + len(bi)),
        }
    )
    if gaz.empty:
        return
    m = PhraseGazetteerMatcher(gaz)
    t = pa.table(
        {
            "conv_id": ["c0"],
            "turn_idx": pa.array([0], type=pa.int32()),
            "text": [" ".join(tokens)],
        }
    )
    got = set(map(tuple, m(t).to_pandas()[["qid", "surface"]].to_numpy()))
    want = _sequential_greedy(tokens, uni, bi)
    assert got == want, (tokens, uni, bi)


def test_cents_matches_duckdb_round():
    """_cents (half-away-from-zero) == DuckDB ROUND on adversarial values,
    including exact half-cents that np.round (half-to-even) gets wrong."""
    import duckdb
    import numpy as np

    from wikidata_qrank_ray.pipelines.queries import _cents

    vals = [0.125, -0.125, 1.005, -1.005, 0.135, 2.675, -2.675, 0.0, 123.455]
    got = _cents(np.array(vals)).tolist()
    con = duckdb.connect()
    want = [
        int(con.execute("SELECT CAST(ROUND(? * 100) AS BIGINT)", [v]).fetchone()[0])
        for v in vals
    ]
    assert got == want
