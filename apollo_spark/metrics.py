"""Run-level RPC metrics: the Spark realization of apollo's exit-time
DumpMetrics report (/root/reference/chainservice/chainservice.go:293-307).

Apollo counts per-chain requests inside each CachedClient and logs them on
shutdown. Here the clients live in EXECUTOR tasks, so the counters are Spark
accumulators — executor-side ``add``s aggregate driver-side for one
run-wide report. Clients opt in by being constructed with
``metrics=RunMetrics(spark)`` (http_client_factory threads it through);
``dump()`` prints the apollo-shaped report plus wall processing time."""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

COUNTERS = ("contract_call_requests", "header_requests", "filter_requests", "cache_hits")


class RunMetrics:
    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.acc = {name: sc.accumulator(0) for name in COUNTERS}
        self._start = time.monotonic()

    def add(self, name: str, n: int = 1) -> None:
        """Executor-safe increment (PySpark accumulators support worker-side
        add; only the driver reads .value)."""
        self.acc[name].add(n)

    def report(self) -> dict[str, int | float]:
        out: dict[str, int | float] = {name: self.acc[name].value for name in COUNTERS}
        out["processing_time_s"] = round(time.monotonic() - self._start, 3)
        return out

    def dump(self, out=sys.stderr) -> None:
        """chainservice.go:293-307's shutdown report, one line per counter."""
        rep = self.report()
        for name in COUNTERS:
            print(f"apollo_spark metrics: {name}: {rep[name]} requests", file=out)
        print(f"apollo_spark metrics: processing_time: {rep['processing_time_s']}s", file=out)
