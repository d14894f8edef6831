import os

from wikidata_qrank_ray.state.versions import gc_versions


def test_gc_keeps_newest_k(tmp_path):
    for v in ["20240101", "20240102", "20240103", "20240104", "20240105"]:
        (tmp_path / f"item_signals-{v}.csv").write_text(v)
    (tmp_path / "qrank-20240101.csv").write_text("x")
    (tmp_path / "MANIFEST.json").write_text("{}")  # non-versioned: untouched

    deleted = gc_versions(str(tmp_path), keep=3)
    left = sorted(os.listdir(tmp_path))
    assert "item_signals-20240105.csv" in left
    assert "item_signals-20240104.csv" in left
    assert "item_signals-20240103.csv" in left
    assert "item_signals-20240102.csv" not in left
    assert "item_signals-20240101.csv" not in left
    assert "qrank-20240101.csv" in left  # only 1 version of its stem
    assert "MANIFEST.json" in left
    assert len(deleted) == 2
