"""Mergeable sketches: distributed approximate aggregates.

The reference has no sketch/approximate operators (SURVEY.md §2.5 notes the
absence); at 100 TB they are the only sane way to answer distinct-count /
quantile questions without an all-to-all shuffle. Pattern (guide): emit one
serialized sketch per batch from ``map_batches`` (map-side), merge the tiny
sketches on the driver (or in one reduce task) -- data motion is
O(batches x sketch_size), independent of row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..functions.hashing import stable_hash64


class HyperLogLog:
    """Classic HLL (Flajolet et al.): 2^p registers of leading-zero ranks.
    Standard error ~ 1.04/sqrt(2^p); mergeable by register-wise max."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] = v[mask] << np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        self.add_hashes(stable_hash64(np.asarray(values).astype(str)))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)


def approx_distinct(ds: ray.data.Dataset, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): one HLL per batch, register-wise
    max merge of the (batches x 4 KiB) sketches on the driver."""

    def _sketch(batch: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add(batch[column].to_numpy())
        return pd.DataFrame({"registers": [h.registers.tobytes()]})

    parts = ds.map_batches(_sketch, batch_format="pandas", batch_size=65536).to_pandas()
    merged = HyperLogLog(p)
    for buf in parts["registers"]:
        other = HyperLogLog(p)
        other.registers = np.frombuffer(buf, dtype=np.uint8).copy()
        merged.merge(other)
    return merged.estimate()
