"""Run the dedup/CC/linkage/mining whales standalone at sf3 (30x sf0.1,
round-7 task 7: one more decade of scale evidence on top of the sf1 sweep)
WITH spill/disk accounting: a sampler thread watches the Spark local dirs
(blockmgr/shuffle spill) and the per-query peak is reported next to the
time, so "linear time but quadratic spill" cannot hide.

Usage: SPARK_GRAFT_SF_DIR=.data/sf3 python scripts/bench_sf3_whales.py [q ...]
(defaults to the whale list below; the two LOSSLESS certification twins
ngram_jaccard_dup_pairs / tfidf_dup_pairs are deliberately absent — they are
quadratic by construction, measured and fenced at sf1, and would add hours.)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WHALES = [
    "ngram_jaccard_capped_pairs",
    "tfidf_capped_pairs",
    "minhash_near_dup_pairs",
    "simhash_portable_near_dups",
    "near_dup_components",
    "dedup_keep_best",
    "dup_aware_sample_weights",
    "substring_span_dedup",
    "cdc_chunk_dedup",
    "corpus_duplicate_mass",
    "fuzzy_entity_dup_pairs",
    "entity_golden_records",
    "bitext_margin_mining",
    "matryoshka_recall",
    "lsh_blocking_quality",
    "knn_ivf_lattice_approx",
    "semantic_dedup_lattice",
]


def _local_dirs(spark) -> list[str]:
    d = spark.sparkContext.getConf().get("spark.local.dir", None)
    return d.split(",") if d else [os.environ.get("SPARK_LOCAL_DIRS", "/tmp")]


def _du(dirs: list[str]) -> int:
    total = 0
    for d in dirs:
        for root in glob.glob(os.path.join(d, "blockmgr-*")) + glob.glob(
            os.path.join(d, "spark-*")
        ):
            for p, _, files in os.walk(root):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(p, f))
                    except OSError:
                        pass
    return total


class DiskSampler(threading.Thread):
    def __init__(self, dirs: list[str], interval: float = 1.0):
        super().__init__(daemon=True)
        self.dirs, self.interval = dirs, interval
        self.peak = 0
        # NOT named _stop: Thread.join's internals call self._stop() on
        # timeout, so an Event stored there raises "'Event' is not callable"
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            self.peak = max(self.peak, _du(self.dirs))
            self._halt.wait(self.interval)

    def stop(self) -> int:
        self._halt.set()
        self.join(timeout=5)
        return max(self.peak, _du(self.dirs))


def main() -> None:
    names = sys.argv[1:] or WHALES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".data/sf3")
    from apollo_spark.ops.cache import release_caches
    from apollo_spark.queries import QUERIES
    from apollo_spark.session import get_spark

    spark = get_spark("apollo_spark_bench_sf3")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = _local_dirs(spark)
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    peaks: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name in names:
        base = _du(dirs)
        sampler = DiskSampler(dirs)
        sampler.start()
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            sampler.stop()
            print(f"# {name}: ERROR {errors[name].splitlines()[0]}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        peaks[name] = max(0, sampler.stop() - base)
        print(
            f"# {name}: {timings[name]:.3f}s ({n} rows, peak local-dir +{peaks[name] / 1e6:.0f} MB)",
            file=sys.stderr,
        )
        release_caches(df)
        del df
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
    print(
        json.dumps(
            {
                "queries": timings,
                "peak_local_mb": {k: round(v / 1e6, 1) for k, v in peaks.items()},
                "errors": errors,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
