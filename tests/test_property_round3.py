"""Property tests for round-3 kernels, each pinned against an independent
naive model (the reference's table-driven-golden discipline generalized
with hypothesis):

- PhraseGazetteerMatcher (vectorized batch-wide frontier walk) vs a plain
  per-turn Python maximal-munch scanner;
- the poly-fold MinHash band hash vs a per-value Python fold;
- _pair_jaccard_vec vs per-pair Python set Jaccard.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# small closed vocabulary so phrases actually collide
_VOCAB = ["new", "york", "city", "big", "apple", "x"]


def _model_maximal_munch(tokens: list[str], dict_by_len: dict[int, dict[str, str]]):
    """Independent sequential reference: at each unconsumed position take
    the longest matching phrase, jump its span, else advance one."""
    out = []
    maxk = max(dict_by_len) if dict_by_len else 1
    p = 0
    while p < len(tokens):
        hit = None
        for k in range(min(maxk, len(tokens) - p), 0, -1):
            s = " ".join(tokens[p:p + k])
            q = dict_by_len.get(k, {}).get(s)
            if q is not None:
                hit = (q, s, k)
                break
        if hit is None:
            p += 1
        else:
            out.append((hit[0], hit[1]))
            p += hit[2]
    return set(out)


@st.composite
def _corpus(draw):
    n_turns = draw(st.integers(1, 5))
    turns = [
        " ".join(draw(st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=10)))
        for _ in range(n_turns)
    ]
    n_surf = draw(st.integers(1, 6))
    surfaces = draw(
        st.lists(
            st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=4).map(" ".join),
            min_size=n_surf, max_size=n_surf, unique=True,
        )
    )
    return turns, surfaces


@settings(max_examples=200, deadline=None)
@given(_corpus())
def test_maximal_munch_matches_sequential_model(data):
    from wikidata_qrank_ray.stages.mentions import PhraseGazetteerMatcher

    turns, surfaces = data
    gaz = pd.DataFrame(
        {
            "qid": [f"Q{i + 1}" for i in range(len(surfaces))],
            "surface": surfaces,
            "prior": list(range(len(surfaces), 0, -1)),
        }
    )
    m = PhraseGazetteerMatcher(gaz)
    batch = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(len(turns))],
            "turn_idx": pa.array([0] * len(turns), type=pa.int32()),
            "text": turns,
        }
    )
    out = m(batch).to_pandas()
    best = {s: q for s, q in zip(gaz["surface"], gaz["qid"])}
    by_len: dict[int, dict[str, str]] = {}
    for s, q in best.items():
        by_len.setdefault(s.count(" ") + 1, {})[s] = q
    for i, text in enumerate(turns):
        want = _model_maximal_munch(text.split(), by_len)
        got = set(
            map(
                tuple,
                out[out["conv_id"] == f"c{i}"][["qid", "surface"]].to_numpy(),
            )
        )
        assert got == want, f"turn {i}: {text!r}"


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 2**64 - 1), min_size=4, max_size=4),
        min_size=1, max_size=8,
    )
)
def test_band_poly_fold_matches_scalar_model(sig_rows):
    """The vectorized uint64 poly fold over band segments == the per-value
    scalar fold mod 2^64 the SQL oracle computes."""
    from wikidata_qrank_ray.stages.dedup import minhash_band_rows
    import ray
    import ray.data

    n = len(sig_rows)
    sigs = np.array(sig_rows, dtype=np.uint64)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "sig": [s.view(np.int64).tobytes() for s in sigs],
        }
    )
    rows = (
        minhash_band_rows(ray.data.from_pandas(df), bands=2, rows_per_band=2)
        .to_pandas()
        .sort_values(["doc_id", "band_id"])
        .reset_index(drop=True)
    )
    for _, r in rows.iterrows():
        seg = sigs[int(r["doc_id"]), int(r["band_id"]) * 2:(int(r["band_id"]) + 1) * 2]
        h = 0
        for v in seg:
            h = (h * 1000003 + int(v)) % (1 << 64)
        got = np.int64(r["band_hash"]).astype(np.uint64)
        assert got == np.uint64(h), (r.to_dict(), h)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.sampled_from("ab c"), max_size=12),
            st.text(alphabet=st.sampled_from("ab c"), max_size=12),
        ),
        min_size=1, max_size=6,
    )
)
def test_pair_jaccard_vec_matches_set_model(pairs):
    from wikidata_qrank_ray.functions.hashing import shingles
    from wikidata_qrank_ray.stages.dedup import _pair_jaccard_vec

    ta = np.array([a for a, _ in pairs], dtype=object)
    tb = np.array([b for _, b in pairs], dtype=object)
    got = _pair_jaccard_vec(ta, tb, 3)
    for j, (a, b) in enumerate(pairs):
        s1 = set(shingles(a.split(), 3))
        s2 = set(shingles(b.split(), 3))
        want = 1.0 if (not s1 and not s2) else len(s1 & s2) / max(1, len(s1 | s2))
        assert got[j] == want, (a, b)
