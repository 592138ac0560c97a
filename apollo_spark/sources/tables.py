"""Catalog: named access to landed parquet tables.

One directory = one dataset; table name -> ``<dir>/<name>.parquet``. This is
the Spark replacement for apollo's live-RPC-everything model: scans become
columnar reads with predicate pushdown and partition pruning instead of
rate-limited ``eth_getLogs`` loops (chainservice/cached_client.go:131-185).
At 100 TB the layout is partitioned by (chain, block bucket); local fixtures
are single files — same reader code either way.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)

    def has(self, name: str) -> bool:
        return (self.root / f"{name}.parquet").exists()

    def table(self, name: str) -> DataFrame:
        path = self.root / f"{name}.parquet"
        if not path.exists():
            raise FileNotFoundError(f"catalog table {name!r} not found at {path}")
        return self.spark.read.parquet(str(path))
