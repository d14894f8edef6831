"""Input-layout invariance: query results must be IDENTICAL when the input
tables are resharded into a different file count with rows in a different
order -- no hidden dependence on row position, shard boundaries, or block
order anywhere in the engine (float aggregation order, per-block grouping
assumptions, positional derivations would all fail this)."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from tools.reshard import reshard

SF = "/root/testdata/sf0.001"

# representative slice of every operator family
QUERIES = [
    "canonical_triples",     # flagship KG path
    "entity_rank_salted",    # salted rollup
    "pricing_summary",       # exact-int money aggregate
    "order_customer_join",   # bucketed hash join
    "sessionize",            # windowing
    "events_grouped_percentiles",  # grouped order statistics
    "dedup_clusters",        # exact jaccard + distributed CC
    "simhash_near_dups",     # banded hamming pairs
    "doc_commonness",        # corpus-stats enrichment
    "doc_splits",            # keyed hash ops
]


@pytest.fixture(scope="module")
def resharded_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("resharded_sf")
    return reshard(SF, str(out), seed=123)


def _canon(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    df = res[sorted(res.columns)].reset_index(drop=True)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_resharding(resharded_dir, name):
    from wikidata_qrank_ray.pipelines.queries import queries

    q = queries()[name]
    base = _canon(q(SF))
    shuf = _canon(q(resharded_dir))
    pd.testing.assert_frame_equal(base, shuf)
