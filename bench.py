"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON
line {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced end-to-end with a count-ish action (write-less
materialization via ``df.foreach(noop)`` would skip result assembly;
``collect`` on small results / count on large keeps it honest without
driver-memory blowups).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _host_probe() -> dict[str, float]:
    """Tag the measurement window (round-10 root cause: co-tenant MEMORY
    BANDWIDTH collapse that CPU/steal metrics never show). cpu_loop_s is a
    cache-resident interpreter loop (stable ~0.5 s on this host regardless
    of window); copy_gbps is a 200 MB numpy copy — >= 4 GB/s quiet,
    1-4 GB/s usable with min-of-N, < 1 GB/s walls are ambient-dominated.
    Same probe as scripts/host_window.py; emitted in the one-line JSON so
    every permanent bench record self-adjudicates its window."""
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    cpu_s = time.perf_counter() - t0
    try:
        import numpy as np

        a = np.zeros(200_000_000 // 8, dtype=np.int64)
        t0 = time.perf_counter()
        for _ in range(5):
            a.copy()
        bw = 5 * 2 * a.nbytes / (time.perf_counter() - t0) / 1e9
    except Exception:  # numpy must never abort a bench run
        bw = -1.0
    return {"cpu_loop_s": round(cpu_s, 2), "copy_gbps": round(bw, 2)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from apollo_spark.queries import QUERIES
    from apollo_spark.session import get_spark

    # "dedup once, consume everywhere": a per-RUN artifact dir lets the
    # three near-dup component queries share one TxTable component build
    # (queries._doc_components) the way a production pipeline would,
    # instead of re-paying the edge shuffle + CC rounds three times. Fresh
    # tmpdir per run — a stale artifact can never mask a code change.
    # Honor an explicit APOLLO_SPARK_ARTIFACT_DIR for debugging.
    art_base: str | None = None
    if "APOLLO_SPARK_ARTIFACT_DIR" not in os.environ:
        import atexit
        import shutil
        import tempfile

        art_base = tempfile.mkdtemp(prefix="apollo_bench_art_")
        os.environ["APOLLO_SPARK_ARTIFACT_DIR"] = art_base
        # per-doc prediction/component snapshots are not small; without
        # cleanup every bench run leaks a full artifact set into /tmp
        atexit.register(shutil.rmtree, art_base, ignore_errors=True)

    spark = get_spark("apollo_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session bring-up (the first heavy corpus scan otherwise
    # absorbs all first-touch JIT/footer cost — BASELINE.md's 2.8s-vs-8s
    # ngram spread was exactly this)
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    # JIT the shuffle/join/window/explode machinery: the first shuffle-heavy
    # query otherwise pays ~5s of JVM warmup that belongs to the session,
    # not the plan (measured: identical query 7.0s first run, 1.8s after)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = spark.range(200_000).select(F.col("id"), (F.col("id") % 997).alias("k"))
    (
        w.alias("a").join(w.alias("b"), "k")
        .groupBy("k").count()
        .withColumn("r", F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("k")))
        .select(F.explode(F.array("k", "count")).alias("x")).count()
    )

    # per-query isolation: one broken query must never abort the run and
    # lose every other number (that is exactly what round 2's ts bug did).
    # min-of-N repeats (default 2): this machine is co-tenant and identical
    # runs swing ~±30%; the per-query MINIMUM estimates the plan's true cost
    # far more stably than a single sample and is the standard benchmarking
    # statistic for noisy hosts. SPARK_GRAFT_BENCH_REPEATS=1 for a quick pass.
    try:
        repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2").strip()))
    except ValueError:
        repeats = 2  # a bad env var must not abort the run pre-first-query
    probe_pre = _host_probe()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        best, n = None, 0
        for rep in range(repeats):
            # Round-10 verdict: min-of-repeats over ONE shared artifact dir
            # timed the memoised READ for artifact-routed queries (repeat 1
            # builds the table, repeat 2 reads it, min() keeps the read) —
            # the training cost then appeared in NO query's number. One
            # artifact namespace PER REPEAT keeps the production
            # build-once/consume-everywhere sharing ACROSS queries (the
            # first consumer builds, later consumers read the snapshot)
            # while making every repeat of a given query do the same work,
            # so min-of-repeats is again a statistic of one computation.
            if art_base is not None:
                os.environ["APOLLO_SPARK_ARTIFACT_DIR"] = os.path.join(
                    art_base, f"rep{rep}"
                )
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                n = df.count()
            except Exception as exc:  # noqa: BLE001 — record and keep going
                # a transient failure on a LATER repeat must not discard an
                # earlier valid sample; only an all-repeats failure is an error
                if best is None:
                    errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                continue
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # release op-scoped persists: 165 queries x repeats would
            # otherwise accumulate every intermediate cache in executor
            # storage for the whole run (ops attach their persisted frames
            # to the returned DataFrame — see ops/cache.py)
            from apollo_spark.ops.cache import release_caches

            release_caches(df)
            del df
            # Belt-and-braces repeat isolation (round 11): a query wrapper
            # that post-processes an op's output without carry_caches
            # loses the scope attribute, release_caches() then frees
            # nothing, and — because Spark's CacheManager substitutes any
            # plan EQUAL to a cached one — repeat 2 of the same query
            # silently reused repeat 1's leaked caches, so min-of-repeats
            # timed a partially-memoised run (same distortion class as the
            # artifact-dir issue above). The wrappers are fixed, but the
            # harness must not depend on every future op getting this
            # right: clear the cache between repeats, off the timed path.
            spark.catalog.clearCache()
            for t in spark.catalog.listTables():
                if t.isTemporary and t.name.startswith("__apollo_w_"):
                    try:
                        spark.catalog.dropTempView(t.name)
                    except Exception:
                        pass  # concurrent drop — nothing to leak
        # shuffle files / localCheckpoint blocks of a finished query are only
        # reclaimed after a JVM GC proves the RDDs unreachable; on one shared
        # disk the whale queries' spill (tens of GB at sf1) must not coexist
        # with the next query's. ~100ms per query, off the timed path.
        spark.sparkContext._jvm.System.gc()
        # whale wake: a multi-minute query leaves tens of GB of shuffle spill
        # and a heap full of garbage; the next query's sample absorbs the
        # cleanup unless we settle first (measured: doc_keywords 44.7s right
        # after a 1203s whale, 13.7s warm standalone — BASELINE.md round-5
        # adjudication). One extra gc + short pause, off the timed path.
        if best is not None and best > 60:
            time.sleep(2)
            spark.sparkContext._jvm.System.gc()
        if best is None:
            print(f"# {name}: ERROR {errors[name].splitlines()[0]}", file=sys.stderr)
            continue
        errors.pop(name, None)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    probe_post = _host_probe()
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # cpus must record the parallelism the run ACTUALLY had: SPARK_GRAFT_CPUS
    # only when the env var really set the master, else the session's own
    # defaultParallelism (a hard-coded 32 fallback skewed cross-host
    # baseline adjudication — ADVICE round 5).
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    try:
        cpus = int(cpus_env) if cpus_env else spark.sparkContext.defaultParallelism
    except ValueError:
        cpus = spark.sparkContext.defaultParallelism

    # The driver's tail capture is ~2KB; a 175-query map overflows it and the
    # permanent BENCH_r{N}.json record ends up a truncated string
    # ("parsed": null in rounds 1-5). Emit a compact final line (top-10
    # slowest + error names only) and write the FULL per-query map to a repo
    # file the round commits (BENCH_local_r{NN}.json, NN = 1 + latest
    # driver-recorded round).
    repo = Path(__file__).resolve().parent
    rounds = [
        int(p.stem.split("_r")[-1])
        for p in repo.glob("BENCH_r*.json")
        if p.stem.split("_r")[-1].isdigit()
    ]
    full_name = f"BENCH_local_r{(max(rounds) + 1 if rounds else 0):02d}.json"
    full_record = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "repeats": repeats,
        "host_probe_pre": probe_pre,
        "host_probe_post": probe_post,
    }
    try:
        (repo / full_name).write_text(json.dumps(full_record, indent=1) + "\n")
    except OSError as exc:  # read-only checkout must not lose the stdout record
        print(f"# could not write {full_name}: {exc}", file=sys.stderr)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "error_names": sorted(errors)[:8],
        "sf": full_record["sf"],
        "cpus": cpus,
        # window tag: copy_gbps >= 4 quiet / < 1 ambient-dominated (the
        # round-10 adjudication key — see _host_probe)
        "probe_pre_gbps": probe_pre["copy_gbps"],
        "probe_post_gbps": probe_post["copy_gbps"],
        "full": full_name,
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # hard guarantee: never overflow the tail capture
        compact["queries"] = dict(list(slowest.items())[:5])
        compact["error_names"] = compact["error_names"][:3]
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
