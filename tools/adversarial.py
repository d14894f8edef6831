"""Create an edge-case-injected copy of an sf dir: the documents table gets
appended rows with empty / whitespace-only / NBSP / unicode / null texts.
Every oracled query must still match its SQL twin on it (the engines must
agree on ANY input of the declared schema, not just clean synthetic text):

    python tools/adversarial.py [sf_dir] [out_dir]
    python tools/check_oracles.py <out_dir>
"""

import os
import shutil
import sys

import pandas as pd

ADVERSARIAL_TEXTS = [
    "", "   ", "\t\n ", "  padded text here  ", "nbsp token", None,
    "", "éàü unicode tokens déjà vu", "a", "a b",
    # vertical tab: ASCII whitespace but NOT in RE2's \s class -- RE2
    # (the \S+ oracles AND the engine tokenizer, functions/tokenize.py)
    # keeps "merge\x0bsort" as ONE token; a naive ascii splitter
    # over-splits and silently desyncs every dl/tf-derived result
    "merge\x0bsort merge", "\x0b", "x\x0b \x0c y",
]


def make_adversarial(sf_dir: str, out_dir: str) -> str:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(sf_dir, f), os.path.join(out_dir, f))
    docs = pd.read_parquet(os.path.join(out_dir, "documents.parquet"))
    base = int(docs["doc_id"].max()) + 1
    tmpl = docs.iloc[0].to_dict()
    rows = []
    for i, t in enumerate(ADVERSARIAL_TEXTS):
        r = dict(tmpl)
        r["doc_id"] = base + i
        r["text"] = t
        rows.append(r)
    pd.concat([docs, pd.DataFrame(rows)], ignore_index=True).to_parquet(
        os.path.join(out_dir, "documents.parquet"), index=False
    )
    # events edge cases: exact half-cents (np.round half-to-even would
    # diverge from SQL ROUND here -- pinned by queries._cents), negatives,
    # zero, and a duplicated timestamp
    ev = pd.read_parquet(os.path.join(out_dir, "events.parquet"))
    ebase = int(ev["event_id"].max()) + 1
    etmpl = ev.iloc[0].to_dict()
    erows = []
    for i, v in enumerate([0.125, -0.125, 2.675, -2.675, 0.0, 1.005]):
        r = dict(etmpl)
        r["event_id"] = ebase + i
        r["value"] = v
        erows.append(r)
    pd.concat([ev, pd.DataFrame(erows)], ignore_index=True).to_parquet(
        os.path.join(out_dir, "events.parquet"), index=False
    )
    # embeddings edge case: a zero-norm vector (cosine similarity hits
    # 0-division; both engines must agree on its treatment)
    import numpy as np

    emb = pd.read_parquet(os.path.join(out_dir, "embeddings.parquet"))
    vr = emb.iloc[0].to_dict()
    vr["vec_id"] = int(emb["vec_id"].max()) + 1
    vr["embedding"] = np.zeros(len(emb["embedding"].iloc[0]))
    pd.concat([emb, pd.DataFrame([vr])], ignore_index=True).to_parquet(
        os.path.join(out_dir, "embeddings.parquet"), index=False
    )
    return out_dir


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adversarial_" + os.path.basename(sf.rstrip("/"))
    print(make_adversarial(sf, out))
