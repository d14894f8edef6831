import json
import os

from wikidata_qrank_ray.state.checkpoint import CheckpointManager, lineage_fingerprint


def test_run_skip_and_invalidate(tmp_path):
    run_dir = str(tmp_path / "run")
    ckpt = CheckpointManager(run_dir)
    calls = []

    def write(tmp):
        calls.append(1)
        with open(os.path.join(tmp, "out.txt"), "w") as f:
            f.write("data")
        return 1

    p1 = ckpt.run_stage("s1", "lin-a", write)
    assert os.path.exists(os.path.join(p1, "out.txt"))
    assert len(calls) == 1

    # same lineage -> skip (no recompute; mirrors build.go:87-94)
    ckpt2 = CheckpointManager(run_dir)
    ckpt2.run_stage("s1", "lin-a", write)
    assert len(calls) == 1

    # changed lineage -> recompute
    ckpt2.run_stage("s1", "lin-b", write)
    assert len(calls) == 2


def test_resume_after_deleted_output(tmp_path):
    run_dir = str(tmp_path / "run")
    ckpt = CheckpointManager(run_dir)
    calls = []

    def write(tmp):
        calls.append(1)
        open(os.path.join(tmp, "x"), "w").close()
        return 0

    out = ckpt.run_stage("s", "l", write)
    import shutil

    shutil.rmtree(out)  # simulate partial loss
    ckpt3 = CheckpointManager(run_dir)
    ckpt3.run_stage("s", "l", write)
    assert len(calls) == 2
    assert os.path.exists(os.path.join(out, "x"))


def test_lineage_fingerprint_changes_with_params():
    a = lineage_fingerprint("param", 1)
    b = lineage_fingerprint("param", 2)
    assert a != b and a == lineage_fingerprint("param", 1)


def test_manifest_metrics(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "r"))
    ckpt.run_stage("s", "l", lambda tmp: 42)
    m = ckpt.stage_metrics()
    assert m["s"]["rows"] == 42
    assert "wall_sec" in m["s"]
