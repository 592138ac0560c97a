"""Live-RPC log source: distributed ``eth_getLogs`` with per-partition
adaptive range bisection.

Spark-first realization of SmartFilterLogs
(/root/reference/chainservice/cached_client.go:131-185): apollo splits the
block range into ``--log-parts`` chunks, fetches them serially, and on any
node error ("response too large") DOUBLES the part count and restarts the
whole scan from scratch — its own comment flags the restart as known-bad
(cached_client.go:127-130). Here each partition owns a contiguous block
slice and bisects ONLY the failing subrange, so completed work is never
re-fetched and the fan-out is driven by actual log density, not a global
guess. Rate limiting is a per-partition budget of total/parts, matching the
method-call source.

Output rows have exactly the landed ``logs`` table shape (FIXTURES.md), so
``decoded_event_source`` composes unchanged on top — live scan and landed
scan share the decode/transform/filter/save tail.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Protocol

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_LOG_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType()),
        T.StructField("block_number", T.LongType()),
        T.StructField("block_hash", T.StringType()),
        T.StructField("tx_hash", T.StringType()),
        T.StructField("tx_index", T.IntegerType()),
        T.StructField("log_index", T.IntegerType()),
        T.StructField("address", T.StringType()),
        T.StructField("topics", T.ArrayType(T.StringType())),
        T.StructField("data", T.BinaryType()),
    ]
)


class RangeTooLargeError(Exception):
    """Raised by a client when the node rejects a getLogs range (the
    'response size exceeded' / 'more than 10000 results' family)."""


class RpcMetrics:
    """Accumulator-backed counters — the Spark equivalent of apollo's
    per-chain request/cache metrics dumped at exit
    (/root/reference/chainservice/chainservice.go:293-307). Accumulators
    aggregate across executors; read ``.value`` driver-side after an action."""

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.requests = sc.accumulator(0)
        self.range_splits = sc.accumulator(0)

    def report(self) -> dict[str, int]:
        return {"rpc_requests": self.requests.value, "range_splits": self.range_splits.value}


class EvmLogClient(Protocol):
    def get_logs(
        self, chain: str, address: str | None, topic0: str | None, from_block: int, to_block: int
    ) -> list[dict]: ...


LogClientFactory = Callable[[], EvmLogClient]


def rpc_log_source(
    spark: SparkSession,
    client_factory: LogClientFactory,
    *,
    chain: str,
    from_block: int,
    to_block: int,
    address: str | None = None,
    topic0: str | None = None,
    parts: int = 50,
    rate_limit: float | None = None,
    metrics: RpcMetrics | None = None,
) -> DataFrame:
    """Distributed log scan over [from_block, to_block] (inclusive).

    ``parts`` only sets the initial partition grid (apollo's --log-parts
    default, flags.go:43-48); density spikes are handled inside each task by
    bisection, never by restarting. The client is created once per partition
    (connection reuse per executor) and must be picklable-free (factory)."""
    if to_block < from_block:
        raise ValueError("to_block < from_block")
    parts = max(1, min(parts, to_block - from_block + 1))
    span = to_block - from_block + 1
    per_part_rate = (rate_limit / parts) if rate_limit else None

    grid = spark.range(parts).select(
        (F.lit(from_block) + (F.col("id") * span) / parts).cast("long").alias("lo"),
        (F.lit(from_block) + ((F.col("id") + 1) * span) / parts - 1).cast("long").alias("hi"),
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        min_interval = (1.0 / per_part_rate) if per_part_rate else 0.0
        last = 0.0
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                stack = [(int(lo), int(hi))]
                rows: list[dict] = []
                while stack:
                    a, b = stack.pop()
                    if min_interval:
                        wait = last + min_interval - time.monotonic()
                        if wait > 0:
                            time.sleep(wait)
                        last = time.monotonic()
                    if metrics is not None:
                        metrics.requests.add(1)
                    try:
                        rows.extend(client.get_logs(chain, address, topic0, a, b))
                    except RangeTooLargeError:
                        if metrics is not None:
                            metrics.range_splits.add(1)
                        if a == b:
                            raise  # single block too large: genuinely fatal
                        mid = (a + b) // 2
                        # only the failing subrange is split; completed
                        # ranges are never re-fetched (vs cached_client.go
                        # restart-from-scratch doubling)
                        stack.append((mid + 1, b))
                        stack.append((a, mid))
                if rows:
                    yield pd.DataFrame(rows, columns=[f.name for f in RAW_LOG_SCHEMA.fields])

    return grid.repartition(parts).mapInPandas(fetch, schema=RAW_LOG_SCHEMA)
