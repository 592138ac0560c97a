"""Time a subset of registry queries at $SPARK_GRAFT_SF_DIR — the surgical
re-measure loop for queries flagged by a full bench run (same warmup and
count() action as bench.py, same one-line JSON output).

Usage: SPARK_GRAFT_SF_DIR=.data/sf1 python scripts/bench_subset.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: bench_subset.py <query> [<query> ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from apollo_spark.ops.cache import release_caches
    from apollo_spark.queries import QUERIES
    from apollo_spark.session import get_spark

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = get_spark("apollo_spark_bench_subset")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    # JIT the shuffle/join/window/explode machinery (same rationale and
    # shape as bench.py): the first shuffle-heavy query otherwise pays ~5s
    # of JVM warmup that belongs to the session, not the plan
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = spark.range(200_000).select(F.col("id"), (F.col("id") % 997).alias("k"))
    (
        w.alias("a").join(w.alias("b"), "k")
        .groupBy("k").count()
        .withColumn("r", F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("k")))
        .select(F.explode(F.array("k", "count")).alias("x")).count()
    )

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
        except Exception as exc:  # noqa: BLE001 — record and keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name].splitlines()[0]}", file=sys.stderr)
            continue
        dt = round(time.perf_counter() - t0, 3)
        # repeated names take the MIN — pass a query 2-3x to apply the
        # bench.py min-of-repeats discipline within one warmed session
        timings[name] = min(timings.get(name, dt), dt)
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        release_caches(df)
        del df
        spark.sparkContext._jvm.System.gc()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({"queries": timings, "errors": errors, "sf": float(sf) if sf.replace(".", "").isdigit() else sf}))
    spark.stop()


if __name__ == "__main__":
    main()
