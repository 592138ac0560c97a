"""Skewed-replica rehearsal corpus (round-8 verdict task 7).

The sf1/sf3/sf10 ladder replicates sf0.1 with a uniform vocabulary
bijection — clean scaling, but real corpora are NOT uniform: web crawls
are Zipf-skewed across sources and share structural boilerplate. This
builder takes an existing rehearsal dir and perturbs ONLY documents.parquet
into the adversarial shape the mega-bucket guard and salted joins exist
for:

* boilerplate: one fixed 8-word sentence is APPENDED to a seeded 10% of
  docs — its shingles get df ~0.1, far above the 0.04 truth df-cap (so the
  exact-truth side stays linear) and hot enough that at r=2 banding the
  boilerplate trigrams argmin-capture entire band buckets that grow with
  the corpus (the quadratic pathology round 7 measured);
* source skew: 50% of docs (seeded) are reassigned to one hot source
  ("src_mega") — the groupBy/source-join skew shape.

doc_id, lang, and the underlying text are otherwise untouched; n_chars is
recomputed where boilerplate was added. All other tables are copied
verbatim (hard-link when possible), so every non-document query still runs.

Usage: python scripts/make_skew.py [src_dir] [out_dir]
       (defaults: .data/sf1 -> .data/sf1skew)
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np

BOILERPLATE = "subscribe to our newsletter for weekly data updates"
BOILER_FRAC = 0.10
HOT_SOURCE_FRAC = 0.50
SEED = 80_001

# round 9: hot-NAME shape for the linkage tier (customer.parquet's c_name).
# Real registries have both: a sparse tail (here md5 of the key — the
# fuzzy_entity_dup_pairs convention) and a few names shared verbatim by
# thousands of records (default values, "UNKNOWN", franchise branches) plus
# typo satellites at distance 1 — the variant-join hot-key worst case the
# fuzzy_dup_pairs docstring documents.
HOT_NAMES = ("acme corporation", "unknown customer", "global trading ltd", "main street store")
HOT_NAME_FRAC = 0.20  # share of customers assigned one of HOT_NAMES verbatim
TYPO_FRAC = 0.02  # share given a distance-1 typo of a hot name


def _rg(n_rows: int) -> int:
    # same rationale as make_sf1._rg: keep ~32 scan splits
    return max(1024, n_rows // 32)


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else ".data/sf1")
    out = Path(sys.argv[2] if len(sys.argv) > 2 else ".data/sf1skew")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    for p in src.glob("*.parquet"):
        if p.name in ("documents.parquet", "customer.parquet"):
            continue
        dst = out / p.name
        if dst.exists():
            dst.unlink()
        try:
            os.link(p, dst)
        except OSError:
            shutil.copy(p, dst)

    # customer: md5-sparse names + planted hot names + distance-1 typos
    c = con.sql(f"SELECT * FROM '{src}/customer.parquet' ORDER BY c_custkey").df()
    nc = len(c)
    crng = np.random.default_rng(SEED + 1)
    import hashlib

    names = np.array([hashlib.md5(str(k).encode()).hexdigest() for k in c["c_custkey"]], dtype=object)
    hot_mask = crng.random(nc) < HOT_NAME_FRAC
    names[hot_mask] = crng.choice(HOT_NAMES, size=int(hot_mask.sum()))
    typo_mask = (~hot_mask) & (crng.random(nc) < TYPO_FRAC)
    for i in np.flatnonzero(typo_mask):
        base_name = str(crng.choice(HOT_NAMES))
        pos = int(crng.integers(0, len(base_name)))
        names[i] = base_name[:pos] + base_name[pos + 1 :]  # deletion-1 typo
    c["c_name"] = names
    con.register("cust_skew", c)
    con.sql(
        f"COPY (SELECT * FROM cust_skew) TO '{out}/customer.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {_rg(nc)})"
    )
    cstats = con.sql(
        f"""SELECT count(*) AS n,
                   sum(CASE WHEN c_name IN {HOT_NAMES} THEN 1 ELSE 0 END) AS hot_names
            FROM '{out}/customer.parquet'"""
    ).fetchone()
    print(f"customer: {cstats[0]} rows, hot_names={cstats[1]}")

    d = con.sql(f"SELECT * FROM '{src}/documents.parquet' ORDER BY doc_id").df()
    n = len(d)
    rng = np.random.default_rng(SEED)
    boiler = rng.random(n) < BOILER_FRAC
    hot = rng.random(n) < HOT_SOURCE_FRAC
    d.loc[boiler, "text"] = d.loc[boiler, "text"] + " " + BOILERPLATE
    d.loc[hot, "source"] = "src_mega"
    d["n_chars"] = d["text"].str.len()
    con.register("docs_skew", d)
    con.sql(
        f"COPY (SELECT * FROM docs_skew) TO '{out}/documents.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {_rg(n)})"
    )
    stats = con.sql(
        f"""SELECT count(*) AS n,
                   sum(CASE WHEN text LIKE '%{BOILERPLATE}' THEN 1 ELSE 0 END) AS boiler,
                   sum(CASE WHEN source = 'src_mega' THEN 1 ELSE 0 END) AS hot
            FROM '{out}/documents.parquet'"""
    ).fetchone()
    print(f"documents: {stats[0]} rows, boilerplate={stats[1]}, hot_source={stats[2]}")


if __name__ == "__main__":
    main()
