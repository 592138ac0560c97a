"""Interleaved A/B harness for the two-level fine-round fuse: wall + job/
stage counts for the twolevel-consuming bench queries on the CURRENT tree.
Run once per tree (old/new) and alternate; job counts are the structural
evidence (host noise cannot fake them)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apollo_spark.queries import QUERIES
from apollo_spark.session import get_spark

NAMES = ["kmeans_twolevel_summary", "semantic_dedup_twolevel"]


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("ab_twolevel")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("embeddings",):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    st = spark.sparkContext.statusTracker()
    from apollo_spark.ops.cache import release_caches

    for name in NAMES:
        for rep in range(2):
            spark.sparkContext.setJobGroup(f"{name}-{rep}", name)
            j0 = set(st.getJobIdsForGroup(f"{name}-{rep}"))
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            jobs = [j for j in st.getJobIdsForGroup(f"{name}-{rep}") if j not in j0]
            infos = [st.getJobInfo(j) for j in jobs]
            stages = sum(len(info.stageIds) for info in infos if info)
            release_caches(df)
            print(f"{name} rep{rep}: {dt:.2f}s jobs={len(jobs)} stages={stages} rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
