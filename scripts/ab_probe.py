"""Standalone probe: wall + job/stage counts for a named list of registry
queries on the current tree (argv = query names; min-of-2 each)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apollo_spark.queries import QUERIES
from apollo_spark.session import get_spark


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:]
    spark = get_spark("ab_probe")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    st = spark.sparkContext.statusTracker()
    from apollo_spark.ops.cache import release_caches

    for name in names:
        for rep in range(2):
            g = f"{name}-{rep}"
            spark.sparkContext.setJobGroup(g, name)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            jobs = st.getJobIdsForGroup(g)
            infos = [st.getJobInfo(j) for j in jobs]
            stages = sum(len(info.stageIds) for info in infos if info)
            release_caches(df)
            print(f"{name} rep{rep}: {dt:.2f}s jobs={len(jobs)} stages={stages} rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
