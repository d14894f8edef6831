"""CLI contract tests (subprocess: the CLI owns its own Ray session,
so it cannot share the pytest session fixture)."""

import json
import os
import subprocess
import sys

import pandas as pd


def _run_cli(*args: str) -> str:
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "wikidata_qrank_ray", *args],
        capture_output=True, text=True, env=env, cwd="/tmp", check=True,
    )
    return r.stdout.strip().splitlines()[-1]


def test_cli_dedup_index_build_and_increment(tmp_path):
    base = " ".join(f"w{i}" for i in range(60))
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    pd.DataFrame(
        {"doc_id": [0, 1], "text": [base, " ".join(f"x{i}" for i in range(60))]}
    ).to_parquet(a)
    v = base.split(); v[3] = "CHANGED"
    pd.DataFrame({"doc_id": [100], "text": [" ".join(v)]}).to_parquet(b)
    idx = str(tmp_path / "idx")
    out1 = json.loads(_run_cli(
        "dedup-index", "--docs", str(a), "--index-dir", idx, "--build",
        "--num-cpus", "2"))
    assert out1 == {"built": idx}
    links = tmp_path / "links.parquet"
    out2 = json.loads(_run_cli(
        "dedup-index", "--docs", str(b), "--index-dir", idx,
        "--threshold", "0.7", "--out", str(links), "--num-cpus", "2"))
    assert out2 == {"new_docs_linked": 1}
    got = pd.read_parquet(links)
    assert got["doc_id"].tolist() == [100]
    assert got["dup_of"].tolist() == [0]


def test_cli_query_listing():
    names = json.loads(_run_cli("query", "--sf-dir", "/root/testdata/sf0.001"))
    assert "dedup_clusters" in names and "entity_triangles" in names
