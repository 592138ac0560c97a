"""Continuous aggregate (hypertable-style rollup): a materialized
time-bucketed aggregate maintained incrementally, queried as
``materialized rollup UNION fresh tail``.

The TimescaleDB continuous-aggregate pattern re-expressed Spark-first:

* **refresh** recomputes only complete buckets past the last watermark and
  appends them to a partitioned parquet rollup table (idempotent: buckets
  are the partition key, a re-refresh overwrites the same partitions via
  dynamic partition overwrite);
* **read** unions the materialized buckets with an on-the-fly aggregation
  of the raw tail (rows newer than the materialized high-water mark) — the
  classic lambda read path, correct at any refresh lag;
* at 100 TB the win is the same as Timescale's: repeated dashboard-style
  queries aggregate only the tail (hours) instead of the full history
  (years), and the refresh itself scans only new buckets.

The streaming counterpart is ``sources/streaming.py::windowed_event_counts``
(same bucket shape over readStream); this module is the batch/landed side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousRollup:
    """Incrementally-maintained time-bucketed aggregate over an event table.

    Parameters
    ----------
    path: rollup table location (partitioned by ``bucket_start``).
    bucket_seconds: bucket width.
    keys: grouping columns beside the time bucket.
    ts_col: epoch-seconds event-time column of the raw table.
    aggs: dict output_name -> aggregation Column builder taking no args
        (built fresh per query; decimal-exact sums recommended).
    """

    def __init__(
        self,
        path: str,
        *,
        bucket_seconds: int = 3600,
        keys: list[str] | None = None,
        ts_col: str = "ts_s",
        aggs: dict[str, object] | None = None,
    ):
        self.path = path
        self.bucket_seconds = bucket_seconds
        self.keys = list(keys or [])
        self.ts_col = ts_col
        self.aggs = aggs or {"n_events": F.count(F.lit(1))}

    def _bucket(self) -> F.Column:
        b = self.bucket_seconds
        return (F.col(self.ts_col).cast("long") / b).cast("long") * b

    def _aggregate(self, df: DataFrame) -> DataFrame:
        return (
            df.withColumn("bucket_start", self._bucket())
            .groupBy("bucket_start", *self.keys)
            .agg(*[c.alias(name) for name, c in self.aggs.items()])
        )

    def high_water(self, spark: SparkSession) -> int | None:
        """Newest materialized bucket start, or None for an empty rollup."""
        try:
            row = spark.read.parquet(self.path).agg(F.max("bucket_start")).first()
        except Exception:
            return None
        return None if row is None or row[0] is None else int(row[0])

    def refresh(self, raw: DataFrame) -> int:
        """Materialize complete buckets newer than the high-water mark.
        A bucket is complete when the raw table holds events past its end
        (same completeness rule as a watermark). Returns # aggregated rows
        written (buckets x key combinations).
        Idempotent: partition-overwrite on bucket_start."""
        spark = raw.sparkSession
        hw = self.high_water(spark)
        max_ts = raw.agg(F.max(F.col(self.ts_col).cast("long"))).first()[0]
        if max_ts is None:
            return 0
        last_complete = (int(max_ts) // self.bucket_seconds) * self.bucket_seconds
        fresh = raw.filter(self._bucket() < last_complete)
        if hw is not None:
            fresh = fresh.filter(self._bucket() > hw)
        # persist: the emptiness check and the write must not each re-run
        # the full filter+aggregate over the raw table
        out = self._aggregate(fresh).persist()
        try:
            n = out.count()
            if n:
                prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
                try:
                    out.write.mode("overwrite").partitionBy("bucket_start").parquet(self.path)
                finally:
                    spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        finally:
            out.unpersist()
        return n

    def read(self, raw: DataFrame) -> DataFrame:
        """Materialized buckets + on-the-fly tail aggregation — correct at
        any refresh lag; the tail scan prunes on the raw time column."""
        spark = raw.sparkSession
        hw = self.high_water(spark)
        if hw is None:
            return self._aggregate(raw)
        mat = spark.read.parquet(self.path)
        tail = self._aggregate(raw.filter(self._bucket() > hw))
        return mat.select(tail.columns).unionByName(tail)
