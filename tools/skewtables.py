"""Create a HOT-KEY-skewed copy of an sf dir: one user owns half the
events, one text is duplicated across 10% of documents, one order key
dominates lineitem. Every oracled query must still match its SQL twin --
the correctness contract under power-law skew (the reference's qviews
salting motivation, qviews.go:109-121):

    python tools/skewtables.py [sf_dir] [out_dir]
    python tools/check_oracles.py <out_dir>
"""

import os
import shutil
import sys

import numpy as np
import pandas as pd


def make_skewed(sf_dir: str, out_dir: str) -> str:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(sf_dir, f), os.path.join(out_dir, f))

    # events: append a slab equal to the original size, ALL one user/type
    ev = pd.read_parquet(os.path.join(out_dir, "events.parquet"))
    hot = ev.copy()
    hot["event_id"] = hot["event_id"] + int(ev["event_id"].max()) + 1
    hot["user_id"] = 777_777
    hot["event_type"] = "click"
    pd.concat([ev, hot], ignore_index=True).to_parquet(
        os.path.join(out_dir, "events.parquet"), index=False
    )

    # documents: 10% of docs become byte-identical copies of doc 0's text
    docs = pd.read_parquet(os.path.join(out_dir, "documents.parquet"))
    n_dup = max(1, len(docs) // 10)
    base = int(docs["doc_id"].max()) + 1
    tmpl = docs.iloc[0].to_dict()
    rows = []
    for i in range(n_dup):
        r = dict(tmpl)
        r["doc_id"] = base + i
        rows.append(r)
    pd.concat([docs, pd.DataFrame(rows)], ignore_index=True).to_parquet(
        os.path.join(out_dir, "documents.parquet"), index=False
    )

    # lineitem: one hot order key with 500 lines
    li = pd.read_parquet(os.path.join(out_dir, "lineitem.parquet"))
    hot_li = li.head(500).copy()
    hot_li["l_orderkey"] = int(li["l_orderkey"].max()) + 1
    pd.concat([li, hot_li], ignore_index=True).to_parquet(
        os.path.join(out_dir, "lineitem.parquet"), index=False
    )
    return out_dir


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_skew"
    print(make_skewed(sf, out))
