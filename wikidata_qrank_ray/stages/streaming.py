"""Keyed incremental state via raw Ray actors -- the last-resort tier of
the operator hierarchy (SURVEY.md: Dataset API first, actor pools second,
raw actors only where semantics genuinely need shared mutable state).

``KeyedStateRunner`` shards keys across N state actors by stable hash; the
driver feeds batches in timestamp order and each actor maintains running
per-key accumulators across batches -- the shape a true streaming source
(Kafka-like) would need, which the Dataset API cannot express because state
must OUTLIVE any one batch/task.

Partitioning assumption (documented per the brief): all rows of one key
route to one actor (stable hash), and batches arrive in global ts order;
within a batch, rows may be unordered (the actor sorts its slice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..functions.hashing import stable_hash64


@ray.remote
class _KeyStateActor:
    """Running per-key (count, sum, last_ts) accumulators."""

    def __init__(self):
        self.state: dict = {}

    def update(self, keys: np.ndarray, values: np.ndarray, ts: np.ndarray) -> int:
        order = np.argsort(ts, kind="stable")
        for k, v, t in zip(keys[order], values[order], ts[order]):
            c, s, _ = self.state.get(k, (0, 0.0, None))
            self.state[k] = (c + 1, s + float(v), t)
        return len(keys)

    def snapshot(self) -> pd.DataFrame:
        rows = [
            {"key": k, "n": c, "total": s, "last_ts": t}
            for k, (c, s, t) in self.state.items()
        ]
        return pd.DataFrame(rows, columns=["key", "n", "total", "last_ts"])


class KeyedStateRunner:
    def __init__(self, num_shards: int = 4):
        self.actors = [_KeyStateActor.remote() for _ in range(num_shards)]
        self.num_shards = num_shards

    def _shard_of(self, keys: np.ndarray) -> np.ndarray:
        return (stable_hash64(keys.astype(str)) % np.uint64(self.num_shards)).astype(np.int64)

    def feed(self, df: pd.DataFrame, key: str, value: str, ts: str) -> None:
        """Feed one (ts-ordered) batch; rows are routed to their key's actor."""
        shards = self._shard_of(df[key].to_numpy())
        refs = []
        for s in range(self.num_shards):
            m = shards == s
            if m.any():
                refs.append(
                    self.actors[s].update.remote(
                        df[key].to_numpy()[m], df[value].to_numpy()[m], df[ts].to_numpy()[m]
                    )
                )
        ray.get(refs)

    def result(self) -> pd.DataFrame:
        parts = ray.get([a.snapshot.remote() for a in self.actors])
        out = pd.concat(parts, ignore_index=True)
        return out.sort_values("key").reset_index(drop=True)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
