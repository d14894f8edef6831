"""Dynamic payload schema discovery + typed extraction (the SQL-dump
reader / schema-branching analogue, sqlreader.go:30-87 +
pagelinks.go:122-128)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.stages.payload import discover_payload_schema, extract_payload


def _ds(payloads):
    return ray.data.from_arrow(
        pa.table({"event_id": pa.array(range(len(payloads)), type=pa.int64()),
                  "props": payloads})
    )


def test_schema_discovery_union_and_promotion():
    # old layout {a:int, b:str}; new layout {a:float, c:int}; junk tolerated
    ds = _ds(['{"a": 1, "b": "x"}', '{"a": 2.5, "c": 7}', "not json", ""])
    schema = discover_payload_schema(ds)
    assert schema == {"a": "float", "b": "str", "c": "int"}


def test_extract_branching_layouts():
    ds = _ds(['{"a": 1, "b": "x"}', '{"a": 2.5, "c": 7}', "", '{"c": 9}'])
    schema = discover_payload_schema(ds)
    out = (
        extract_payload(ds, schema, keep_cols=("event_id",))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["a"].tolist()[:2] == [1.0, 2.5]
    assert out["b"].tolist()[0] == "x" and pd.isna(out["b"][1])
    assert pd.isna(out["c"][0]) and out["c"][3] == 9
    assert out["a"].dtype == np.float64


def test_extract_over_events_matches_regex_path():
    # on the driver tables props is {"k": int}; the dynamically discovered
    # schema must reproduce the hand-written single-key extraction
    sf = "/root/testdata/sf0.001"
    from wikidata_qrank_ray.sources.tables import read_table

    ev = read_table(sf, "events", columns=["event_id", "props"])
    schema = discover_payload_schema(ev)
    assert schema == {"k": "int"}
    out = (
        extract_payload(ev, schema, keep_cols=("event_id",))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        ev.to_pandas()
        .assign(k=lambda d: d["props"].str.extract(r'"k": (\d+)', expand=False).astype(np.int64))
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == want["k"].tolist()
