"""Synthesize an sf1 corpus (~10x sf0.1, ~1.5 M orders / 6 M lineitem) for
superlinearity stress runs, by key-shifted replication of the driver's sf0.1
parquet — no new data distributions are invented, every FK (customer->nation,
orders->customer, lineitem->orders/part/supplier, events.user_id->customer)
stays valid because each replica shifts all key columns by the same dense
0-based stride observed in sf0.1.

Two tables are additionally PERTURBED per replica so self-join structure
grows ~linearly like a real bigger corpus would, instead of quadratically
like naive copies would (10 identical copies of every document = 45x the
near-dup pairs per group — a skew artifact, not scale):

- documents.text: replica i rotates the word sequence by 7*i words — token
  unigram/Zipf statistics are byte-identical, but cross-replica shingle
  overlap collapses, so MinHash/SimHash/ngram candidate counts scale with
  corpus size as they would on real data.
- embeddings.embedding: replica i>0 adds deterministic +-5e-3-scale noise
  (seeded per replica) — cluster/label geometry is preserved, exact-equality
  and ~1.0-cosine cross-replica pairs are not.

region/nation are fixed-size dimensions at every TPC-H scale factor and are
copied once, unreplicated.

Usage: python scripts/make_sf1.py [out_dir] [replicas]   (default .data/sf1, 10)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"

# table -> (key columns sharing that table's stride, stride source table)
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else ".data/sf1")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    strides = {
        t: con.sql(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        for t in ("customer", "supplier", "part", "orders", "events", "documents", "embeddings")
    }

    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    for t, keys in SHIFTS.items():
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        selects = []
        for i in range(replicas):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i * strides[keys[c]]} AS {c}")
                elif t == "documents" and c == "text":
                    # rotate the word list by 7*i — same tokens, different shingles
                    r = 7 * i
                    exprs.append(
                        f"CASE WHEN {r} = 0 THEN text ELSE "
                        f"array_to_string(list_concat("
                        f"  string_split(text, ' ')[1 + ({r} % len(string_split(text, ' '))):],"
                        f"  string_split(text, ' ')[:{r} % len(string_split(text, ' '))]"
                        f"), ' ') END AS text"
                    )
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'")
        sql = " UNION ALL ".join(selects)
        if t == "embeddings":
            # perturb in numpy (deterministic per replica), then write
            base = con.sql(f"SELECT * FROM '{SRC}/{t}.parquet' ORDER BY vec_id").df()
            mats = []
            for i in range(replicas):
                d = base.copy()
                d["vec_id"] = d["vec_id"] + i * strides["embeddings"]
                if i > 0:
                    rng = np.random.default_rng(1000 + i)
                    vecs = np.stack(d["embedding"].to_numpy())
                    vecs = (vecs + rng.normal(0, 5e-3, vecs.shape)).astype(np.float32)
                    d["embedding"] = list(vecs)
                mats.append(d)
            import pandas as pd

            allx = pd.concat(mats, ignore_index=True)
            con.register("emb_all", allx)
            con.sql(
                f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label FROM emb_all) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.sql(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
