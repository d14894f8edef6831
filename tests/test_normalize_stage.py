import pyarrow as pa
import ray.data

from wikidata_qrank_ray.stages.normalize import normalize_stage


def test_ascii_fast_path_and_unicode_fallback_agree():
    texts = [
        "Hello World",          # ascii fast path
        "ctrl\x01here",         # ascii ctrl chars
        "Straße GROSS",         # non-ascii: casefold
        "Café\x85x",            # non-ascii + NEL control
    ]
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    out = normalize_stage(ds).to_pandas()
    assert out["norm_text"].tolist() == [
        "hello world",
        "ctrl_here",
        "strasse gross",
        "café_x",
    ]
    # raw text preserved (per-turn text equality invariant)
    assert out["text"].tolist() == texts
