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

- documents.text: replica i>0 maps every word through a seeded BIJECTION of
  the corpus vocabulary onto itself. This is the only perturbation that
  provably preserves the unigram AND n-gram document-frequency
  distributions as multisets (bigram (a,b) -> (pi(a),pi(b)) has the exact
  same df) — df distribution is what drives every inverted-index join's
  fan-out — while zeroing cross-replica shingle overlap. Two rejected
  attempts, kept for the record: ROTATING the word sequence preserves every
  n-gram except the seam, so every replica was a near-dup of every other
  (45x pair blowup, 432 s in ngram_jaccard at sf1); PERMUTING each doc's
  word sequence breaks overlap but draws n-grams from the word marginals,
  so Zipf-head words formed synthetic hot shingles ("the the" df ~35k of
  50k docs) and the lossless inverted index faced C(35k,2) candidates per
  hot key — hotter than natural text ever gets at this size.
- embeddings.embedding: replica i>0 applies a seeded ORTHOGONAL rotation
  Q_i to every vector — intra-replica geometry (norms, cosines, clusters)
  is exactly preserved, cross-replica cosines become ~N(0, 1/sqrt(d))
  noise, so exact/approx near-dup and ANN structure scales linearly.

region/nation are fixed-size dimensions at every TPC-H scale factor and are
copied once, unreplicated.

Usage: python scripts/make_sf1.py [out_dir] [replicas]   (default .data/sf1, 10)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"

# table -> {key column -> stride source table}
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


def _rg(n_rows: int) -> int:
    """Parquet row-group size giving ~32 splits: Spark's file-scan splits
    can't cut inside a row group, so a single-group file (DuckDB default is
    very large groups) serializes the whole table into ONE task no matter
    the cluster — at sf1 that turned every documents/embeddings query into
    a 1-thread run and made linear plans look 30x superlinear."""
    return max(1024, n_rows // 32)


def _replicate_documents(con, out: Path, replicas: int, stride: int) -> None:
    base = con.sql(f"SELECT * FROM '{SRC}/documents.parquet' ORDER BY doc_id").df()
    vocab = sorted({w for t in base["text"] for w in t.split(" ")})
    parts = []
    for i in range(replicas):
        d = base.copy()
        d["doc_id"] = d["doc_id"] + i * stride
        if i > 0:
            rng = np.random.default_rng(7000 + i)
            mapping = dict(zip(vocab, (vocab[j] for j in rng.permutation(len(vocab)))))
            d["text"] = [
                " ".join(mapping[w] for w in t.split(" ")) for t in d["text"]
            ]
        parts.append(d)
    allx = pd.concat(parts, ignore_index=True)
    con.register("docs_all", allx)
    con.sql(
        f"COPY (SELECT * FROM docs_all) TO '{out}/documents.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {_rg(len(allx))})"
    )


def _replicate_embeddings(con, out: Path, replicas: int, stride: int) -> None:
    base = con.sql(f"SELECT * FROM '{SRC}/embeddings.parquet' ORDER BY vec_id").df()
    vecs0 = np.stack(base["embedding"].to_numpy()).astype(np.float64)
    d = vecs0.shape[1]
    parts = []
    for i in range(replicas):
        b = base.copy()
        b["vec_id"] = b["vec_id"] + i * stride
        if i > 0:
            rng = np.random.default_rng(1000 + i)
            q, _ = np.linalg.qr(rng.normal(size=(d, d)))
            b["embedding"] = list((vecs0 @ q).astype(np.float32))
        parts.append(b)
    allx = pd.concat(parts, ignore_index=True)
    con.register("emb_all", allx)
    con.sql(
        f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label FROM emb_all) "
        f"TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {_rg(len(allx))})"
    )


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
        if t == "documents":
            _replicate_documents(con, out, replicas, strides["documents"])
        elif t == "embeddings":
            _replicate_embeddings(con, out, replicas, strides["embeddings"])
        else:
            cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
            selects = []
            for i in range(replicas):
                exprs = [
                    f"{c} + {i * strides[keys[c]]} AS {c}" if c in keys else c
                    for c in cols
                ]
                selects.append(f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'")
            sql = " UNION ALL ".join(selects)
            n_src = con.sql(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
            rg = min(262144, _rg(n_src * replicas))
            con.sql(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
