"""SparkSession factory tuned for the test/bench environment.

Local mode is a single JVM; the same conf names govern cluster runs. At 100 TB
the intent is: AQE on (runtime coalesce + skew-join), shuffle partitions sized
by the cluster (set via --conf at submit, the default here fits local[32]),
and Arrow enabled for every pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """min(50% of MemTotal, 64g) when SPARK_DRIVER_MEMORY is unset.

    The old fixed 16g default OOM-crashed the driver JVM on the full sf1
    bench sweep (GCLocker allocation failures then a dead py4j gateway) on a
    128 GiB box — local mode puts every executor thread in the driver JVM,
    so the driver heap must be sized to the host, not a laptop constant.
    """
    explicit = os.environ.get("SPARK_DRIVER_MEMORY")
    if explicit:
        return explicit
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(4, min(total_gib // 2, 64))}g"
    except OSError:
        pass
    return "16g"


def get_spark(
    app_name: str = "apollo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # disk-stored RDD blocks (persist/localCheckpoint spill) are
        # UNCOMPRESSED by default; narrow long-pair frames (CC edge
        # checkpoints) shrink 3-5x under lz4 for negligible CPU — at sf1 the
        # uncompressed checkpoint of a quadratic near-dup edge set filled the
        # disk outright
        .config("spark.rdd.compress", "true")
        # ContextCleaner only reclaims dead shuffle files / checkpoint blocks
        # after a JVM GC notices the RDDs are unreachable; the default 30min
        # periodic GC lets tens of GB of shuffle data from finished queries
        # pile up across a long bench/gate run on one shared disk
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "false")
        # PySpark 4 wraps EVERY DataFrame/Column API call to capture the
        # Python call site for error messages; each wrapped call costs ~3
        # extra py4j roundtrips (a conf read + PySparkCurrentOrigin.set).
        # Wide generated plans (128 band keys, 320 slot mins) make tens of
        # thousands of such calls: measured 6.9 s -> 4.2 s on ONE
        # minhash_autotuned_dup_pairs plan build with this off. Pure
        # error-verbosity knob — execution plans and results are unchanged.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", _default_driver_memory())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
