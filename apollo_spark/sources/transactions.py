"""Transaction monitoring source — apollo roadmap item never shipped
(/root/reference/ROADMAP.md:67-76: "transaction monitoring", "mempool
monitoring").

Batch: declarative filters over a landed ``transactions`` table — every
predicate is a Column, so address/value/block selection pushes into the
parquet scan (partition pruning on chain at lake layout). Realtime: the same
filter tail over a readStream of the bridge's pending-tx JSONL feed — the
mempool equivalent of the event bridge (Spark cannot hold the WS itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TX_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType()),
        T.StructField("block_number", T.LongType()),  # null for pending (mempool)
        T.StructField("tx_hash", T.StringType()),
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("value", T.StringType()),  # uint256-safe in transit
        T.StructField("gas_used", T.LongType()),
    ]
)


def _tx_filter(
    df: DataFrame,
    *,
    chain: str | None = None,
    from_address: str | None = None,
    to_address: str | None = None,
    min_value: float | int | None = None,
    from_block: int | None = None,
    to_block: int | None = None,
) -> DataFrame:
    if chain is not None:
        df = df.filter(F.col("chain") == chain)
    if from_address is not None:
        df = df.filter(F.col("from_address") == from_address.lower())
    if to_address is not None:
        df = df.filter(F.col("to_address") == to_address.lower())
    if min_value is not None:
        df = df.filter(F.col("value").cast("double") >= float(min_value))
    if from_block is not None:
        df = df.filter(F.col("block_number") >= from_block)
    if to_block is not None:
        df = df.filter(F.col("block_number") <= to_block)
    return df


def transaction_source(catalog, **filters) -> DataFrame:
    """Historical tx scan over the landed ``transactions`` table."""
    return _tx_filter(catalog.table("transactions"), **filters)


def transaction_stream(spark: SparkSession, bridge_dir: str, **filters) -> DataFrame:
    """Realtime/mempool tx stream over the bridge's JSONL feed; rows with a
    null block_number are pending (mempool) transactions."""
    raw = spark.readStream.schema(TX_STREAM_SCHEMA).json(bridge_dir)
    return _tx_filter(raw, **filters)
