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

    # formats a training-data lake actually lands in; parquet first so the
    # columnar path wins when multiple encodings of a table exist
    FORMATS = (".parquet", ".orc", ".jsonl", ".json", ".csv", ".csv.gz", ".tsv")

    def _find(self, name: str):
        for ext in self.FORMATS:
            p = self.root / f"{name}{ext}"
            if p.exists():
                return p, ext
        return None, None

    def _tx_table_dir(self, name: str):
        """A directory with a ``_commits`` manifest log is a TxTable — the
        repo's transactional format joins the catalog as a first-class
        source: DSL queries read the CURRENT committed snapshot (exact
        manifest file list, no directory LIST), never in-flight txn data."""
        p = self.root / name
        if p.is_dir() and (p / "_commits").is_dir():
            return p
        return None

    def has(self, name: str) -> bool:
        return self._find(name)[0] is not None or self._tx_table_dir(name) is not None

    def table(self, name: str) -> DataFrame:
        tx = self._tx_table_dir(name)
        if tx is not None:
            from apollo_spark.table_format import TxTable

            return TxTable(str(tx)).read(self.spark)
        path, ext = self._find(name)
        if path is None:
            raise FileNotFoundError(f"catalog table {name!r} not found under {self.root}")
        if ext == ".parquet":
            return self.spark.read.parquet(str(path))
        if ext == ".orc":
            return self.spark.read.orc(str(path))
        if ext in (".jsonl", ".json"):
            return self.spark.read.json(str(path))
        if ext in (".csv", ".csv.gz"):
            return self.spark.read.csv(str(path), header=True, inferSchema=True)
        if ext == ".tsv":
            return self.spark.read.csv(str(path), header=True, inferSchema=True, sep="\t")
        raise FileNotFoundError(f"unsupported format {ext}")

    def land_bucketed(
        self,
        name: str,
        df: DataFrame,
        bucket_cols: list[str],
        buckets: int = 8,
        sort_cols: list[str] | None = None,
        path: str | None = None,
    ) -> DataFrame:
        """Land a table bucketed (and optionally sorted) by join key.

        Two fact tables bucketed the same way join with ZERO exchanges —
        the shuffle is paid once at landing time and amortized over every
        subsequent join/aggregate on the key. This is the 100 TB answer to
        repeated lineitem⨝orders-shaped joins; bucket count should be sized
        so each bucket file is a few hundred MB at the target scale.
        """
        writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *bucket_cols)
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(name)
        return self.spark.table(name)

    def bucketed_table(self, name: str) -> DataFrame:
        """A table previously landed via land_bucketed (session catalog)."""
        return self.spark.table(name)

    def names(self) -> list[str]:
        """All table names available in this catalog root."""
        out = set()
        for p in self.root.iterdir() if self.root.exists() else []:
            for ext in self.FORMATS:
                if p.name.endswith(ext):
                    out.add(p.name[: -len(ext)])
                    break
            else:
                if self._tx_table_dir(p.name) is not None:
                    out.add(p.name)
        return sorted(out)

    def register_views(self) -> None:
        """Expose every catalog table as a temp view for read_sql queries."""
        for name in self.names():
            self.table(name).createOrReplaceTempView(name)
