"""Per-query phase profiler: separates driver-side plan construction
(QUERIES[name](spark, sf_dir) returning) from execution (count()), and
records a second warm execution. Writes JSON to the path in
$APOLLO_PROFILE_OUT (default /tmp/profile_queries.json).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_queries.py [q ...]

With no query names, profiles the whole registry in bench order. This is a
measurement tool (guide §1): it tells us whether a bench line is dominated
by Python/py4j plan construction, first-execution (codegen + jobs), or
steady-state compute.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.environ.get("APOLLO_PROFILE_OUT", "/tmp/profile_queries.json")
    from apollo_spark.ops.cache import release_caches
    from apollo_spark.queries import QUERIES
    from apollo_spark.session import get_spark

    names = sys.argv[1:] or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    if "APOLLO_SPARK_ARTIFACT_DIR" not in os.environ:
        import atexit
        import shutil
        import tempfile

        art_dir = tempfile.mkdtemp(prefix="apollo_prof_art_")
        os.environ["APOLLO_SPARK_ARTIFACT_DIR"] = art_dir
        atexit.register(shutil.rmtree, art_dir, ignore_errors=True)

    spark = get_spark("apollo_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = spark.range(200_000).select(F.col("id"), (F.col("id") % 997).alias("k"))
    (
        w.alias("a").join(w.alias("b"), "k")
        .groupBy("k").count()
        .withColumn("r", F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("k")))
        .select(F.explode(F.array("k", "count")).alias("x")).count()
    )

    prof: dict[str, dict[str, float]] = {}
    for name in names:
        rec: dict[str, float] = {}
        try:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            rec["build"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            df.count()
            rec["exec1"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            df.count()
            rec["exec2"] = round(time.perf_counter() - t0, 3)
            release_caches(df)
            del df
            # a fresh build after the session has seen the query once:
            # separates one-time codegen/analysis warmup from per-build cost
            t0 = time.perf_counter()
            df2 = QUERIES[name](spark, sf_dir)
            rec["build2"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            df2.count()
            rec["exec3"] = round(time.perf_counter() - t0, 3)
            release_caches(df2)
            del df2
        except Exception as exc:  # noqa: BLE001
            rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
        spark.sparkContext._jvm.System.gc()
        prof[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)

    Path(out_path).write_text(json.dumps(prof, indent=1))
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
