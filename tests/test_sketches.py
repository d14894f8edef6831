import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from wikidata_qrank_ray.stages.sketches import HyperLogLog, approx_distinct


def test_hll_accuracy():
    h = HyperLogLog(p=12)
    h.add([f"u{i}" for i in range(10000)])
    est = h.estimate()
    assert abs(est - 10000) / 10000 < 0.05  # ~1.6% expected at p=12


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add([f"x{i}" for i in range(3000)])
    b.add([f"x{i}" for i in range(1500, 4500)])  # overlapping
    u = HyperLogLog(12)
    u.add([f"x{i}" for i in range(4500)])
    a.merge(b)
    assert (a.registers == u.registers).all()  # register-wise max == union


def test_approx_distinct_dataset():
    n = 5000
    df = pd.DataFrame({"user_id": np.arange(n) % 737})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    est = approx_distinct(ds, "user_id")
    assert abs(est - 737) / 737 < 0.06
