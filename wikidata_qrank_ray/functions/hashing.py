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
    """MinHash signature of one document: min over shingles of the affine
    mixes h_i(x) = a_i*x + b_i in uint64 wrap-around arithmetic (the
    standard vectorized MinHash construction; wrap-around multiply by an
    odd constant is a bijection on Z_2^64, so each h_i is a permutation).
    Returns (num_perm,) uint64.
    """
    if shingle_hashes.size == 0:
        return np.full(a.shape, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        m = a[None, :] * x[:, None] + b[None, :]
    return m.min(axis=0)


def minhash_signatures_batch(
    shingle_hashes: np.ndarray, starts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Batched MinHash: one (total_shingles,) hash array + per-doc start
    offsets -> (n_docs, num_perm) uint64 via a single segmented min
    (np.minimum.reduceat). Empty docs (start == next start) get max."""
    n_docs = len(starts)
    if shingle_hashes.size == 0:
        return np.full((n_docs, a.shape[0]), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        m = a[None, :] * x[:, None] + b[None, :]
    # reduceat requires strictly valid starts; guard empty segments
    counts = np.diff(np.append(starts, len(x)))
    safe_starts = np.minimum(starts, len(x) - 1)
    sig = np.minimum.reduceat(m, safe_starts, axis=0)
    sig[counts == 0] = np.iinfo(np.uint64).max
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
    return simhash64_batch(token_hash_arr, np.array([0]))[0]


def simhash64_batch(token_hashes: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Batched SimHash: (total_tokens,) hashes + per-doc starts ->
    (n_docs,) uint64 via one segmented bit-vote sum."""
    n_docs = len(starts)
    if token_hashes.size == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes01 = np.add.reduceat(bits, np.minimum(starts, len(token_hashes) - 1), axis=0)
    counts = np.diff(np.append(starts, len(token_hashes)))
    votes = 2 * votes01 - counts[:, None]  # +1 per set bit, -1 per unset
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    out = ((votes > 0).astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    out[counts == 0] = np.uint64(0)
    return out


class BloomFilter:
    """Vectorized Bloom filter for broadcast semi-join pre-filtering (guide:
    broadcast the key set OR a Bloom filter of it). Double hashing
    h_i = h1 + i*h2 over k slots; no false negatives, fp_rate-bounded false
    positives. Serializes to ~1.2 bytes/key at 1% fp -- the thing to
    broadcast when the exact key set is too big for the object store."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        import math

        m = max(8, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = np.uint64(m)
        self.k = max(1, int(round(m / max(1, capacity) * math.log(2))))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)

    def _slots(self, keys) -> np.ndarray:
        h1 = stable_hash64(np.asarray(keys).astype(str))
        import pandas as pd

        h2 = pd.util.hash_pandas_object(
            pd.Series(np.asarray(keys).astype(str)), index=False, hash_key="6543210987654321"
        ).to_numpy() | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((h1[:, None] + i[None, :] * h2[:, None]) % self.m).astype(np.int64)

    def add_many(self, keys) -> None:
        s = self._slots(keys).ravel()
        np.bitwise_or.at(self.bits, s >> 3, (1 << (s & 7)).astype(np.uint8))

    def contains_many(self, keys) -> np.ndarray:
        s = self._slots(keys)
        got = (self.bits[s >> 3] >> (s & 7).astype(np.uint8)) & 1
        return got.all(axis=1)


def rolling_fingerprint(text: str, base: int = 257, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash over the text's CODEPOINTS (document
    fingerprint). Codepoints, not utf-8 bytes, so the identical recurrence
    is expressible in ANSI-ish SQL (DuckDB unicode() + list_reduce) for the
    value-exact oracle."""
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h


_POLY_BASE = np.uint64(1000003)


def polyhash64(tokens: np.ndarray) -> np.ndarray:
    """Vectorized per-token codepoint-polynomial hash in uint64 wraparound:
    h = fold(h * 1000003 + codepoint). Deterministic, seedless, and exactly
    reproducible in SQL via HUGEINT list_reduce mod 2^64 -- the token-hash
    kernel for SimHash parity. ~max-token-length vectorized steps per batch,
    no per-token Python."""
    n = len(tokens)
    if n == 0:
        return np.array([], dtype=np.uint64)
    joined = "".join(tokens)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    h = np.zeros(n, dtype=np.uint64)
    maxlen = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            alive = lens > j
            idx = starts[alive] + j
            h[alive] = h[alive] * _POLY_BASE + codes[idx]
    return h


_SPLITMIX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(h: np.ndarray) -> np.ndarray:
    """The splitmix64 finalizer (Steele et al., public domain): xor-shift +
    odd-multiply rounds give full avalanche, which a plain polynomial hash
    lacks (sequential ids share structured high bits -- measured 25% HLL
    error unmixed vs ~2 sigma mixed). Exactly reproducible in SQL: xor()
    works on HUGEINT, and each 64x64 multiply mod 2^64 decomposes as
    h*lo + (h*hi mod 2^32)*2^32 so no intermediate exceeds HUGEINT."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * _SPLITMIX_M1
        h = (h ^ (h >> np.uint64(27))) * _SPLITMIX_M2
        h ^= h >> np.uint64(31)
    return h


def sqlhash64(tokens: np.ndarray) -> np.ndarray:
    """SQL-reproducible full-avalanche 64-bit string hash: polyhash64
    codepoint polynomial followed by the splitmix64 finalizer. Use this
    (not pandas siphash) wherever a value-exact DuckDB oracle must replay
    the hash AND the downstream op needs uniform bits (HLL buckets/ranks)."""
    return splitmix64(polyhash64(tokens))


_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (numpy<2 has no bitwise_count):
    four 16-bit table lookups. x: uint64 array -> int64 counts."""
    x = x.astype(np.uint64, copy=False)
    return (
        _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
        + _POP16[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[((x >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)]
    )
