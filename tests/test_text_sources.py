"""Text-format sources/sinks: JSONL/CSV transcript ingestion with lenient
coercion, and the reference's exact qrank.csv.gz artifact format
(qrank_test.go:13-33 golden)."""

import gzip
import json
import os

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.sources.text import (
    TRANSCRIPT_SCHEMA,
    publish_qrank_csv_gz,
    read_csv_transcripts,
    read_jsonl_transcripts,
)


def test_jsonl_transcripts_coerced(tmp_path):
    rows = [
        {"conv_id": "c0", "turn_idx": 0, "role": "user", "text": "hello world",
         "tool": "", "ts": "2024-01-01T00:00:00"},
        {"conv_id": "c0", "turn_idx": 1, "role": None, "text": None,
         "tool": None, "ts": "2024-01-01T00:00:01"},  # nulls coerce
    ]
    p = tmp_path / "t.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_jsonl_transcripts(str(p))
    df = ds.to_pandas()
    assert list(df.columns) == [f.name for f in TRANSCRIPT_SCHEMA]
    assert df["text"].tolist() == ["hello world", ""]
    assert df["role"].tolist() == ["user", ""]
    assert str(df["ts"].iloc[0]) == "2024-01-01 00:00:00"


def test_csv_transcripts_missing_optional_columns(tmp_path):
    p = tmp_path / "t.csv"
    pd.DataFrame(
        {"conv_id": ["c0", "c1"], "turn_idx": [0, 0], "text": ["a b", "c d"]}
    ).to_csv(p, index=False)
    df = read_csv_transcripts(str(p)).to_pandas()
    assert df["tool"].tolist() == ["", ""]
    assert df["role"].tolist() == ["", ""]
    assert df["turn_idx"].dtype == "int32"


def test_jsonl_feeds_mention_pipeline(tmp_path):
    p = tmp_path / "t.jsonl"
    with open(p, "w") as f:
        for i, text in enumerate(["spark merge", "spark spark"]):
            f.write(json.dumps({"conv_id": f"c{i}", "turn_idx": 0, "text": text}) + "\n")
    from wikidata_qrank_ray.stages.mentions import detect_mentions

    gaz = pd.DataFrame({"qid": ["Q1", "Q2"], "surface": ["spark", "merge"], "prior": [2, 1]})
    out = detect_mentions(read_jsonl_transcripts(str(p)), gaz).to_pandas()
    got = set(map(tuple, out[["conv_id", "qid"]].to_numpy()))
    assert got == {("c0", "Q1"), ("c0", "Q2"), ("c1", "Q1")}


def test_qrank_csv_gz_reference_golden(tmp_path):
    """Byte-exact reference artifact (qrank_test.go:23-28): qviews
    'Q1 1, Q2 42, Q3 1, Q4 77, Q5 42' -> the exact gzip CSV."""
    from wikidata_qrank_ray.stages.rank import qrank_order

    ranks = ray.data.from_pandas(
        pd.DataFrame({"qid": ["Q1", "Q2", "Q3", "Q4", "Q5"],
                      "mention_count": [1, 42, 1, 77, 42]})
    )
    qdf = qrank_order(ranks)
    out = str(tmp_path / "qrank.csv.gz")
    publish_qrank_csv_gz(qdf, out)
    with gzip.open(out, "rt") as f:
        got = f.read()
    assert got == "Entity,QRank\nQ4,77\nQ2,42\nQ5,42\nQ1,1\nQ3,1\n"
    assert not any(n.endswith(".tmp") for n in os.listdir(tmp_path))


def test_lenient_missing_required_and_bad_ts(tmp_path):
    """Shards missing required columns or carrying nonconforming
    timestamps coerce to defaults instead of raising."""
    rows = [
        {"text": "only text"},                                   # no conv/turn/ts
        {"conv_id": "c1", "turn_idx": None, "text": "bad turn",
         "ts": "2024-01-01T00:00:00.123Z"},                      # fractional+Z
        {"conv_id": "c2", "turn_idx": 2, "text": "bad ts", "ts": "not a time"},
    ]
    p = tmp_path / "weird.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = read_jsonl_transcripts(str(p)).to_pandas().sort_values("text").reset_index(drop=True)
    assert len(df) == 3
    assert set(df.columns) == {f.name for f in TRANSCRIPT_SCHEMA}
    bad_ts = df[df["text"] == "bad ts"].iloc[0]
    assert str(bad_ts["ts"]) == "1970-01-01 00:00:00"
    frac = df[df["text"] == "bad turn"].iloc[0]
    assert str(frac["ts"]).startswith("2024-01-01 00:00:00")


def test_lenient_numeric_conv_id_and_huge_turn_idx(tmp_path):
    rows = [
        {"conv_id": 123, "turn_idx": 4000000000, "text": "weird types"},
        {"conv_id": 124, "turn_idx": 1, "text": "fine"},
    ]
    p = tmp_path / "types.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = read_jsonl_transcripts(str(p)).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert df["conv_id"].tolist() == ["123", "124"]   # numeric id -> string
    assert df["turn_idx"].tolist() == [0, 1]           # overflow -> default, no wraparound
