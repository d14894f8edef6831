import numpy as np

from wikidata_qrank_ray.functions.hashing import (
    _token_hashes,
    minhash_coeffs,
    minhash_signature,
    rolling_fingerprint,
    shingles,
    simhash64,
    stable_hash64,
)


def test_stable_hash_deterministic():
    a = stable_hash64(["foo", "bar", "foo"])
    b = stable_hash64(["foo", "bar", "foo"])
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]


def test_shingles():
    assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert shingles(["a"], 3) == ["a"]
    assert shingles([], 3) == []


def test_minhash_jaccard_estimate():
    a, b = minhash_coeffs(128)
    t1 = [f"w{i}" for i in range(100)]
    t2 = t1[:80] + [f"x{i}" for i in range(20)]  # high overlap
    s1 = minhash_signature(_token_hashes(shingles(t1, 3)), a, b)
    s2 = minhash_signature(_token_hashes(shingles(t2, 3)), a, b)
    est = (s1 == s2).mean()
    sh1, sh2 = set(shingles(t1, 3)), set(shingles(t2, 3))
    true_j = len(sh1 & sh2) / len(sh1 | sh2)
    assert abs(est - true_j) < 0.15


def test_simhash_similarity():
    h1 = simhash64(_token_hashes(["alpha", "beta", "gamma", "delta"] * 5))
    h2 = simhash64(_token_hashes(["alpha", "beta", "gamma", "delta"] * 5))
    h3 = simhash64(_token_hashes(["zeta", "eta", "theta", "iota"] * 5))
    assert h1 == h2
    ham = bin(int(h1) ^ int(h3)).count("1")
    assert ham > 8  # dissimilar docs differ in many bits


def test_rolling_fingerprint():
    assert rolling_fingerprint("abc") == rolling_fingerprint("abc")
    assert rolling_fingerprint("abc") != rolling_fingerprint("acb")
