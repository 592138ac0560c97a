"""sf10 estimate-verify rehearsal (round 10): substantiate the
"disk-bound escape hatch" positioning with bytes at the exact scale that
died in round 9.

Runs minhash_autotuned_pairs at the uniform 256-hash r=2/b=128 geometry on
.data/sf10 with verify="estimate" (and optionally "full" for the paired
number), sampling the Spark local dirs for peak blockmgr/spill bytes —
the same accounting bench_sf3_whales.py uses, so the numbers line up with
the BASELINE round-10 full-verify row (539.1 s, +37.9 GB).

Usage: python scripts/sf10_estimate_rehearsal.py [estimate|full ...]
       (default: estimate; SPARK_GRAFT_SF_DIR overrides .data/sf10)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_sf3_whales import DiskSampler, _du, _local_dirs  # noqa: E402

if __name__ == "__main__":
    modes = sys.argv[1:] or ["estimate"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".data/sf10")
    from apollo_spark.ops.cache import release_caches
    from apollo_spark.ops.dedup import blocking_autotune, minhash_autotuned_pairs
    from apollo_spark.session import get_spark

    spark = get_spark("sf10_estimate")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = _local_dirs(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d.count()
    cfg = blocking_autotune(d, threshold=0.2)
    out: dict = {"sf_dir": sf_dir, "profile": (cfg["num_hashes"], cfg["bands"], cfg["rows"])}
    for mode in modes:
        base = _du(dirs)
        sampler = DiskSampler(dirs)
        sampler.start()
        t0 = time.perf_counter()
        pairs = minhash_autotuned_pairs(d, threshold=0.2, config=cfg, verify=mode)
        n = pairs.count()
        secs = time.perf_counter() - t0
        peak = sampler.stop()
        release_caches(pairs)
        spark.catalog.clearCache()
        out[mode] = {
            "secs": round(secs, 1),
            "pairs": n,
            "peak_local_mb": round((peak - base) / 1e6, 1),
        }
        print(json.dumps(out), flush=True)
