"""Stable, vectorized hashing for dedup / fingerprinting / salting.

No dependence on Python's randomized ``hash()``; everything here is
deterministic across processes (a requirement for distributed shuffles and
resume -- the reference gets determinism from byte-sorted text files,
cmd/qrank-builder/linemerger.go:112-131; we get it from stable hashes).
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)

_MERSENNE_P = (1 << 61) - 1  # modulus for universal hashing in MinHash


def stable_hash64(values) -> np.ndarray:
    """Deterministic 64-bit hash of a string array (vectorized via pandas'
    siphash with a fixed key). Returns uint64 ndarray."""
    import pandas as pd

    s = pd.Series(values, dtype="object")
    return pd.util.hash_pandas_object(s, index=False, hash_key="0123456789123456").to_numpy()


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """FNV-1a per token -> uint64 array (wrap-around multiply is intended)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(tokens):
            h = _FNV_OFFSET
            for b in t.encode("utf-8"):
                h = (h ^ np.uint64(b)) * _FNV_PRIME
            out[i] = h
    return out


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Token k-shingles; falls back to the whole text for short docs."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature of one document.

    ``a``/``b`` are the (num_perm,) universal-hash coefficients (odd a).
    h_i(x) = ((a_i * x + b_i) mod p) for p = 2^61-1, then min over shingles.
    Returns (num_perm,) uint64.
    """
    if shingle_hashes.size == 0:
        return np.full(a.shape, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingle_hashes.astype(np.object_)  # python ints: exact mod-p arithmetic
    sig = np.empty(a.shape, dtype=np.uint64)
    for i in range(a.shape[0]):
        vals = (int(a[i]) * x + int(b[i])) % _MERSENNE_P
        sig[i] = np.uint64(min(vals))
    return sig


def minhash_coeffs(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.int64) | 1
    b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.int64)
    return a.astype(np.uint64), b.astype(np.uint64)


def simhash64(token_hash_arr: np.ndarray) -> np.uint64:
    """64-bit SimHash over token hashes (unweighted)."""
    if token_hash_arr.size == 0:
        return np.uint64(0)
    bits = ((token_hash_arr[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for j in range(64):
        if votes[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return out


def rolling_fingerprint(text: str, base: int = 257, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash over the whole text (document fingerprint)."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * base + b) % mod
    return h
