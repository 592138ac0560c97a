"""DSL-level skew rehearsal (round 10): drive `dedup { autotune = true }` —
the USER-FACING path — end-to-end on the boilerplate-skew corpora.

The round-9 autotune+scrub skew numbers came from
scripts/skew_merge_completeness.py calling the ops tier directly; nothing
exercised the DSL pipeline (schema parse -> compile_query -> autotune
profile -> scrub auto -> minhash geometry -> survivor anti-join) on a skew
corpus. This script runs that exact path and checks the two claims a
production user relies on:

1. the profile FLAGS the skew (rec_scrub true; the boilerplate preference
   order's r=1/b=32/cap1024 geometry) with zero configuration beyond
   `autotune = true`;
2. the ORGANIC near-dup merges survive the scrub: every organic loser
   (a doc the same DSL pipeline drops on the PRE-SKEW corpus, same
   doc_ids) is also dropped on the skew corpus — scrub removes the
   boilerplate edge mass without losing the real duplicate structure.
   Reported as organic-loser coverage (round 9's ops-level number for the
   same claim: MC 0.9978 vs organic truth).

Usage: python scripts/skew_dsl_rehearsal.py [skew_dir ...]
       (default: .data/sf1skew; organic twin = dir name minus "skew")
Exits nonzero if the profile fails to flag or coverage < 0.95.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEDUP_SCHEMA = """
query skew_dsl {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "minhash"
    threshold = 0.2
    autotune = true
  }
  save { doc_id = doc_id }
}
"""


def survivors(spark, sf_dir: str) -> set[int]:
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    schema = parse_schema(DEDUP_SCHEMA)
    out = compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema)
    return {int(r["doc_id"]) for r in out.select("doc_id").collect()}


def main() -> None:
    from pyspark.sql import functions as F

    from apollo_spark.ops.dedup import blocking_autotune
    from apollo_spark.session import get_spark

    dirs = sys.argv[1:] or [".data/sf1skew"]
    spark = get_spark("skew_dsl")
    spark.sparkContext.setLogLevel("ERROR")
    failed = False
    for skew_dir in dirs:
        organic_dir = skew_dir.replace("skew", "")
        d = spark.read.parquet(f"{skew_dir}/documents.parquet")
        all_ids = {int(r["doc_id"]) for r in d.select("doc_id").collect()}
        t0 = time.time()
        cfg = blocking_autotune(d, threshold=0.2)
        t_profile = time.time() - t0

        t0 = time.time()
        skew_surv = survivors(spark, skew_dir)
        t_skew = time.time() - t0
        t0 = time.time()
        organic_surv = survivors(spark, organic_dir)
        t_org = time.time() - t0

        organic_all = {
            int(r["doc_id"])
            for r in spark.read.parquet(f"{organic_dir}/documents.parquet")
            .select("doc_id")
            .collect()
        }
        organic_losers = organic_all - organic_surv
        skew_losers = all_ids - skew_surv
        coverage = (
            len(organic_losers & skew_losers) / len(organic_losers)
            if organic_losers
            else 1.0
        )
        row = {
            "skew_dir": skew_dir,
            "n_docs": len(all_ids),
            "profile": {k: cfg[k] for k in ("num_hashes", "bands", "rows", "max_bucket", "scrub", "hot_shingle_share")},
            "skew_survivors": len(skew_surv),
            "organic_losers": len(organic_losers),
            "organic_loser_coverage": round(coverage, 4),
            "secs": {"profile": round(t_profile, 2), "dsl_skew": round(t_skew, 2), "dsl_organic": round(t_org, 2)},
        }
        print(json.dumps(row), flush=True)
        if not cfg["scrub"]:
            print(f"FAIL: profile did not flag skew on {skew_dir}", file=sys.stderr)
            failed = True
        if coverage < 0.95:
            print(f"FAIL: organic-loser coverage {coverage:.4f} < 0.95 on {skew_dir}", file=sys.stderr)
            failed = True
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
