import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from wikidata_qrank_ray.state.partitioned import run_partitioned


def _mk_inputs(d, n=4):
    paths = []
    for i in range(n):
        p = os.path.join(d, f"in-{i}.parquet")
        pq.write_table(pa.table({"x": list(range(i + 1))}), p)
        paths.append((p, f"out-{i}.parquet"))
    return paths


def _make_copy_fn():
    # defined as a closure so cloudpickle ships it by value (a module-level
    # function in a test module is not importable on Ray workers)
    def _copy_fn(input_path, tmp_out):
        t = pq.read_table(input_path)
        pq.write_table(t, tmp_out)
        return t.num_rows

    return _copy_fn


def test_partitioned_run_and_skip(tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    out = str(tmp_path / "out")
    parts = _mk_inputs(str(ind))
    m1 = run_partitioned(out, parts, _make_copy_fn())
    assert len(m1) == 4
    assert sorted(os.listdir(out))[:1] == ["_PARTITIONS.json"]
    # rerun: nothing recomputed -> manifest identical (incl. wall times)
    m2 = run_partitioned(out, parts, _make_copy_fn())
    assert m1 == m2


def test_partitioned_resume_only_lost_partition(tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    out = str(tmp_path / "out")
    parts = _mk_inputs(str(ind))
    m1 = run_partitioned(out, parts, _make_copy_fn())
    os.remove(os.path.join(out, "out-2.parquet"))
    m2 = run_partitioned(out, parts, _make_copy_fn())
    # only the lost partition re-ran: its wall changed, others identical
    assert m2["out-0.parquet"] == m1["out-0.parquet"]
    assert m2["out-1.parquet"] == m1["out-1.parquet"]
    assert m2["out-3.parquet"] == m1["out-3.parquet"]
    assert os.path.exists(os.path.join(out, "out-2.parquet"))
    assert m2["out-2.parquet"]["rows"] == m1["out-2.parquet"]["rows"]


def test_partitioned_lineage_invalidation(tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    out = str(tmp_path / "out")
    parts = _mk_inputs(str(ind), n=2)
    run_partitioned(out, parts, _make_copy_fn())
    # change one input -> only that partition recomputes
    pq.write_table(pa.table({"x": [1, 2, 3, 4, 5, 6, 7]}), parts[0][0])
    os.utime(parts[0][0], (1, 1))  # force distinct mtime component
    m2 = run_partitioned(out, parts, _make_copy_fn())
    assert m2["out-0.parquet"]["rows"] == 7
    assert m2["out-1.parquet"]["rows"] == 2


def test_stale_partitions_garbage_collected(tmp_path):
    """A deleted/renamed input shard must remove its output shard and
    manifest entry on the next run (no stale data silently included)."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.state.partitioned import run_partitioned

    ind = tmp_path / "in"
    ind.mkdir()
    for name in ("a.parquet", "b.parquet"):
        pq.write_table(pa.table({"x": [1, 2]}), str(ind / name))
    out = str(tmp_path / "out")

    def fn(input_path, tmp_out):
        t = pq.read_table(input_path)
        pq.write_table(t, tmp_out)
        return t.num_rows

    parts = [(str(ind / n), n) for n in ("a.parquet", "b.parquet")]
    m1 = run_partitioned(out, parts, fn)
    assert set(m1) == {"a.parquet", "b.parquet"}
    # drop input b -> rerun with only a
    m2 = run_partitioned(out, parts[:1], fn)
    assert set(m2) == {"a.parquet"}
    assert not os.path.exists(os.path.join(out, "b.parquet"))
    with open(os.path.join(out, "_PARTITIONS.json")) as f:
        assert set(json.load(f)) == {"a.parquet"}


def test_incremental_append_recomputes_only_new_shard(tmp_path):
    """Appending an input shard to a completed run recomputes ONLY the new
    partition (existing partition outputs untouched, byte-identical)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wikidata_qrank_ray.state.partitioned import run_partitioned

    ind = tmp_path / "in"
    ind.mkdir()
    pq.write_table(pa.table({"x": [1, 2]}), str(ind / "a.parquet"))
    out = str(tmp_path / "out")

    def fn(input_path, tmp_out):
        t = pq.read_table(input_path)
        pq.write_table(t, tmp_out)
        return t.num_rows

    run_partitioned(out, [(str(ind / "a.parquet"), "a.parquet")], fn)
    mtime_a = os.path.getmtime(os.path.join(out, "a.parquet"))

    # append shard b, rerun with both -> a's output untouched
    time.sleep(0.05)
    pq.write_table(pa.table({"x": [3]}), str(ind / "b.parquet"))
    parts = [(str(ind / n), n) for n in ("a.parquet", "b.parquet")]
    m = run_partitioned(out, parts, fn)
    assert os.path.getmtime(os.path.join(out, "a.parquet")) == mtime_a
    assert set(m) == {"a.parquet", "b.parquet"}

    # mutate shard a's content -> lineage change -> a recomputes, b doesn't
    mtime_b = os.path.getmtime(os.path.join(out, "b.parquet"))
    time.sleep(0.05)
    pq.write_table(pa.table({"x": [9, 9]}), str(ind / "a.parquet"))
    run_partitioned(out, parts, fn)
    assert os.path.getmtime(os.path.join(out, "a.parquet")) > mtime_a
    assert os.path.getmtime(os.path.join(out, "b.parquet")) == mtime_b
    assert pq.read_table(os.path.join(out, "a.parquet"))["x"].to_pylist() == [9, 9]
