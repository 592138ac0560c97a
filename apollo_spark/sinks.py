"""Sinks: console / CSV / parquet / JDBC with fan-out (SURVEY §2.6).

Apollo's output layer (/root/reference/output/output.go:82-173) writes one
CSV per query, logs rows to stdout, and on first row drops+creates a Postgres
table then INSERTs per row with string-quoted SQL (generate/sql.go:18-52 —
SQL-injectable; we use Spark's parameterized JDBC writer instead, a
documented improvement). Spark mapping:

* stdout  -> df.show() / streaming format("console")
* csv     -> df.write.csv(<dir>/<query>) with header (one directory of part
             files per query — the distributed replacement for one flushed
             file; see coalesce note below)
* db      -> df.write.jdbc(mode="overwrite" first, "append" after) matching
             apollo's DROP TABLE IF EXISTS + CREATE lifecycle (sql.go:24)
* fan-out -> any subset simultaneously (output.go:82-124); streaming via one
             foreachBatch that writes each sink per micro-batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame


@dataclass
class SinkConfig:
    stdout: bool = False
    csv_dir: str | None = None
    json_dir: str | None = None  # JSONL output (apollo ROADMAP.md:67-76, unshipped there)
    parquet_dir: str | None = None
    jdbc_url: str | None = None
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    # manifest-committed transactional parquet (table_format.TxTable):
    # batch writes commit an atomic overwrite snapshot; streaming batches
    # commit exactly-once (batch_id rides the manifest, replays are no-ops)
    tx_table_dir: str | None = None
    # single_file=True coalesces CSV to 1 partition for apollo-style one-file
    # output — fine for query results, wrong for bulk exports (bottleneck)
    single_file: bool = False
    # latency-path push fan-out (SSE/WebSocket): a sinks_push.TopicHub; each
    # batch/micro-batch is published under the query name, row-capped (the
    # push path is for small latency-sensitive feeds — apollo ROADMAP.md:71)
    push_hub: object | None = None
    push_max_rows: int = 10_000


class SinkWriter:
    def __init__(self, config: SinkConfig):
        self.config = config
        self._jdbc_initialized: set[str] = set()

    def write(self, df: DataFrame, query_name: str) -> None:
        cfg = self.config
        if cfg.stdout:
            df.show(truncate=False)
        if cfg.csv_dir:
            out = df.coalesce(1) if cfg.single_file else df
            out.write.mode("overwrite").option("header", "true").csv(str(Path(cfg.csv_dir) / query_name))
        if cfg.json_dir:
            out = df.coalesce(1) if cfg.single_file else df
            out.write.mode("overwrite").json(str(Path(cfg.json_dir) / query_name))
        if cfg.parquet_dir:
            df.write.mode("overwrite").parquet(str(Path(cfg.parquet_dir) / query_name))
        if cfg.tx_table_dir:
            from apollo_spark.table_format import TxTable

            TxTable(str(Path(cfg.tx_table_dir) / query_name)).write(df, mode="overwrite")
        if cfg.jdbc_url:
            # apollo lifecycle: drop+create on first batch, append after
            mode = "append" if query_name in self._jdbc_initialized else "overwrite"
            df.write.jdbc(cfg.jdbc_url, table=query_name, mode=mode, properties=cfg.jdbc_properties)
            self._jdbc_initialized.add(query_name)
        if cfg.push_hub is not None:
            from apollo_spark.sinks_push import publish_dataframe

            publish_dataframe(cfg.push_hub, df, query_name, max_rows=cfg.push_max_rows)

    def foreach_batch(self, query_name: str):
        """foreachBatch hook for streaming fan-out: every micro-batch goes to
        all configured sinks (exactly-once per sink relies on the stream's
        checkpoint + idempotent/transactional targets)."""

        def _write(batch_df: DataFrame, batch_id: int) -> None:
            cfg = self.config
            if cfg.stdout:
                batch_df.show(truncate=False)
            if cfg.csv_dir:
                batch_df.write.mode("append").option("header", "true").csv(
                    str(Path(cfg.csv_dir) / query_name)
                )
            if cfg.json_dir:
                batch_df.write.mode("append").json(str(Path(cfg.json_dir) / query_name))
            if cfg.parquet_dir:
                batch_df.write.mode("append").parquet(str(Path(cfg.parquet_dir) / query_name))
            if cfg.tx_table_dir:
                # exactly-once: (query_name, batch_id) rides the manifest, so
                # a post-restart replay of a committed batch is a no-op
                from apollo_spark.table_format import TxTable

                TxTable(str(Path(cfg.tx_table_dir) / query_name)).write(
                    batch_df, mode="append", txn_app=query_name, txn_batch=int(batch_id)
                )
            if cfg.jdbc_url:
                # Streaming NEVER overwrites — not even on batch_id == 0.
                # Several streams of one query (multi-event schemas) share a
                # table, each with its own batch-id sequence starting at 0;
                # an overwrite from whichever stream's batch 0 commits last
                # would drop rows the other streams already committed. Spark's
                # JDBC append creates the table when it doesn't exist, which
                # covers apollo's create-on-first-row lifecycle without the
                # destructive drop. Replay of an uncommitted batch after a
                # restart is at-least-once here; exactly-once needs an
                # idempotent/transactional target keyed on batch_id.
                batch_df.write.jdbc(cfg.jdbc_url, table=query_name, mode="append", properties=cfg.jdbc_properties)
            if cfg.push_hub is not None:
                from apollo_spark.sinks_push import push_foreach_batch

                push_foreach_batch(cfg.push_hub, query_name, cfg.push_max_rows)(
                    batch_df, batch_id
                )

        return _write
