import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from wikidata_qrank_ray.functions.tokenize import py_tokens

from wikidata_qrank_ray.stages.bpe import (
    _apply_merge_flat,
    bpe_learn,
    bpe_learn_reference,
)


def _docs(texts, nparts=4):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": texts}
        )
    ).repartition(nparts)


def test_bpe_matches_reference_twin_bitwise():
    rng = np.random.RandomState(4)
    vocab = ["banana", "bandana", "cabana", "anaconda", "data", "adapt", "naan"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 12)))
             for _ in range(300)]
    texts += ["", "a", "aaaa aaaa aaaa", None]
    got = bpe_learn(_docs(texts), n_merges=10, num_partitions=8)
    want = bpe_learn_reference(texts, n_merges=10)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 10


def test_bpe_reshard_invariant():
    rng = np.random.RandomState(8)
    vocab = ["hello", "help", "hold", "hollow", "yellow"]
    texts = [" ".join(rng.choice(vocab, size=6)) for _ in range(100)]
    a = bpe_learn(_docs(texts, nparts=1), n_merges=6)
    b = bpe_learn(_docs(texts, nparts=9), n_merges=6)
    pd.testing.assert_frame_equal(a, b)


def test_apply_merge_flat_overlap_chain():
    """'aaaa' merging ('a','a') -> greedy leftmost: aa aa, not aa a a."""
    syms = np.array(list("aaaa") + list("aaa"), dtype=object)
    widx = np.array([0] * 4 + [1] * 3, dtype=np.int64)
    out_s, out_w = _apply_merge_flat(syms, widx, "a", "a")
    assert out_s.tolist() == ["aa", "aa", "aa", "a"]
    assert out_w.tolist() == [0, 0, 1, 1]


def test_apply_merge_flat_word_boundary():
    """A pair split across two words never merges."""
    syms = np.array(["x", "a", "b", "y"], dtype=object)
    widx = np.array([0, 0, 1, 1], dtype=np.int64)
    out_s, _ = _apply_merge_flat(syms, widx, "a", "b")
    assert out_s.tolist() == ["x", "a", "b", "y"]


def test_bpe_tiers_equal():
    """Driver-merge pair tier == distributed hash-partitioned tier,
    bitwise (same argmax rule on both sides)."""
    import ray
    import ray.data

    from wikidata_qrank_ray.stages.bpe import bpe_learn

    texts = ["low lower lowest " * 3, "new newer newest " * 2,
             "wide wider widest", "low newer low"] * 5
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(4)
    a = bpe_learn(ds, n_merges=6, distributed=False)
    b = bpe_learn(ds, n_merges=6, distributed=True)
    pd.testing.assert_frame_equal(a, b)


def test_bpe_tokenize_matches_sequential_twin():
    """Distributed apply == per-word sequential greedy scan, bitwise,
    across resharding (and an overlap-chain vocab that stresses the
    run-parity rule)."""
    from wikidata_qrank_ray.stages.bpe import (
        bpe_tokenize_counts,
        bpe_tokenize_reference,
    )

    rng = np.random.RandomState(11)
    vocab = ["banana", "bandana", "cabana", "aaaa", "aaa", "data", "naan"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 9)))
             for _ in range(200)]
    texts += ["", "a", "aaaa aaaa aaaa", None]
    merges_df = bpe_learn(_docs(texts), n_merges=8)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    want = bpe_tokenize_reference(texts, merges)
    for nparts in (1, 7):
        got = (bpe_tokenize_counts(_docs(texts, nparts=nparts),
                                   merges=merges)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["n_tokens"].tolist() == want
        assert got["n_words"].tolist() == [
            len(py_tokens(t)) for t in texts]
