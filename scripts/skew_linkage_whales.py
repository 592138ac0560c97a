"""Linkage/URL-tier skew rehearsal (round-9 verdict task 7).

The round-8 skew corpora only exercised the MinHash/CC whales; this script
runs the other two documented worst-case operators on the hot-shaped
corpora make_skew.py now produces:

* fuzzy_dup_pairs (SymSpell deletion-neighborhood join) on the hot-NAME
  customer table — a name shared verbatim by m records puts m copies in
  every variant bucket, so the uncollapsed join emits >= C(m,2) pairs
  (quadratic in the hottest name). Measured here both ways:
  collapse_exact=True (the round-9 production guard: one row per DISTINCT
  string in the join, exact groups re-expanded as star edges — linear) vs
  the certified lossless form (expected quadratic; run with a row-count
  only, never materialized wide).
* url_dup_groups on the hot-SOURCE documents table (50% of docs share one
  source, so one host dominates the synthesized URLs) — groupBy-shaped,
  expected linear with a hot key riding map-side combine.

Usage: python scripts/skew_linkage_whales.py [sf_dir ...]
       (default: .data/sf1skew .data/sf3skew)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def run_fuzzy(spark, sf_dir: str, collapse: bool) -> dict:
    from apollo_spark.ops.linkage import fuzzy_dup_pairs

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("s")
    )
    t0 = time.perf_counter()
    pairs = fuzzy_dup_pairs(c, "id", "s", collapse_exact=collapse)
    n = pairs.count()
    return {
        "op": "fuzzy_dup_pairs",
        "sf_dir": sf_dir,
        "mode": "collapse" if collapse else "lossless",
        "n_pairs": n,
        "t_sec": round(time.perf_counter() - t0, 1),
    }


def run_url(spark, sf_dir: str) -> dict:
    from apollo_spark.ops.web import url_dup_groups
    from apollo_spark.queries.mining import _URL_SYNTH_SPARK

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.expr(_URL_SYNTH_SPARK.strip()).alias("url")
    )
    t0 = time.perf_counter()
    g = url_dup_groups(d, url_col="url", id_col="doc_id")
    stats = g.agg(
        F.count(F.lit(1)).alias("n_groups"), F.max("n_docs").alias("max_group")
    ).collect()[0]
    return {
        "op": "url_dup_groups",
        "sf_dir": sf_dir,
        "n_groups": stats["n_groups"],
        "max_group": stats["max_group"],
        "t_sec": round(time.perf_counter() - t0, 1),
    }


def main() -> None:
    from apollo_spark.session import get_spark

    dirs = sys.argv[1:] or [".data/sf1skew", ".data/sf3skew"]
    lossless_too = "--lossless" in dirs
    dirs = [d for d in dirs if not d.startswith("--")]
    spark = get_spark("skew_linkage")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in dirs:
        print(json.dumps(run_url(spark, sf_dir)), flush=True)
        print(json.dumps(run_fuzzy(spark, sf_dir, collapse=True)), flush=True)
        if lossless_too:
            print(json.dumps(run_fuzzy(spark, sf_dir, collapse=False)), flush=True)


if __name__ == "__main__":
    main()
