import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.functions.hashing import BloomFilter
from wikidata_qrank_ray.stages.join import bloom_semi_prefilter


def test_bloom_no_false_negatives_and_bounded_fp():
    keys = [f"k{i}" for i in range(5000)]
    bf = BloomFilter(len(keys), fp_rate=0.01)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()  # never a false negative
    absent = [f"x{i}" for i in range(5000)]
    fp = bf.contains_many(absent).mean()
    assert fp < 0.03  # ~1% target with slack


def test_bloom_prefilter_is_superset_of_semi_join():
    df = pd.DataFrame({"k": [f"k{i}" for i in range(2000)], "v": range(2000)})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    wanted = np.array([f"k{i}" for i in range(0, 2000, 7)])
    out = bloom_semi_prefilter(ds, "k", wanted).to_pandas()
    assert set(wanted) <= set(out["k"])  # superset: all true members kept
    assert len(out) < len(df)  # and it actually filtered
