"""EVM event source: raw ``logs`` table -> decoded, typed event DataFrame.

Spark-first realization of FilterEvents / FilterGlobalEvents / HandleLog
(/root/reference/chainservice/events.go:23-216,410-484):

* address + topic0 + block-range selection is a DataFrame filter — Catalyst
  pushes it into the parquet scan (the moral equivalent of apollo's
  server-side ``eth_getLogs`` filter, events.go:65,158).
* ABI decode runs in one Arrow-batched ``mapInPandas`` pass (the only Python
  in the plan; everything downstream is codegen'd Columns).
* block timestamps come from a broadcast join with the ``blocks`` table
  instead of apollo's per-log ``HeaderByNumber`` RPC (events.go:425) — one
  shuffle-free hash join vs N network calls.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apollo_spark.abi import AbiEvent, decode_log

# Fixed context columns every decoded event row carries
# (types.CallResult, /root/reference/types/types.go:39-58).
CONTEXT_FIELDS = [
    ("chain", T.StringType()),
    ("contract_address", T.StringType()),
    ("block_number", T.LongType()),
    ("block_hash", T.StringType()),
    ("tx_hash", T.StringType()),
    ("tx_index", T.IntegerType()),
    ("log_index", T.IntegerType()),
    ("event_name", T.StringType()),
]


def abi_type_to_spark(abi_type: str) -> T.DataType:
    """ABI -> Spark type policy (SURVEY §1.2): integers as Decimal(38,0)
    (uint256 escape hatch = string), addresses/hashes/bytes as string,
    tuples (structs) as JSON strings — the composite escape hatch."""
    if abi_type.startswith("("):  # tuple or array-of-tuple: JSON string
        return T.StringType()
    if abi_type.endswith("]"):  # T[] / T[k]
        return T.ArrayType(abi_type_to_spark(abi_type[: abi_type.rindex("[")]))
    if abi_type.startswith(("uint", "int")):
        return T.DecimalType(38, 0)
    if abi_type == "bool":
        return T.BooleanType()
    return T.StringType()  # address, bytesN, bytes, string


def event_output_schema(
    event: AbiEvent, outputs: list[str] | None = None, uint_as_string: bool = False
) -> T.StructType:
    fields = [T.StructField(n, t) for n, t in CONTEXT_FIELDS]
    wanted = set(outputs) if outputs else None
    for p in event.inputs:
        if wanted is None or p.name in wanted:
            t = abi_type_to_spark(p.type)
            if uint_as_string and isinstance(t, T.DecimalType):
                t = T.StringType()  # uint256 escape hatch (SURVEY §1.2)
            fields.append(T.StructField(p.name, t))
    return T.StructType(fields)


def _coerce(value, spark_type: T.DataType):
    if isinstance(spark_type, T.DecimalType) and value is not None:
        # Decimal(38,0) holds 38 digits; a full uint256 needs 78. Values
        # beyond the policy cap become NULL (documented degradation) — use
        # uint_as_string=True for lossless passage of such columns.
        if isinstance(value, int) and len(str(abs(value))) > 38:
            return None
        return Decimal(value)
    if isinstance(spark_type, T.StringType) and isinstance(value, int):
        return str(value)  # uint_as_string path
    if isinstance(spark_type, T.StringType) and isinstance(value, (tuple, list)):
        import json as _json

        # tuple/struct escape hatch: composite values land as JSON text
        return _json.dumps(value, default=str)
    if isinstance(spark_type, T.ArrayType) and isinstance(value, list):
        return [_coerce(v, spark_type.elementType) for v in value]
    return value


def decoded_event_source(
    logs: DataFrame,
    event: AbiEvent,
    *,
    chain: str | None = None,
    address: str | None = None,
    from_block: int | None = None,
    to_block: int | None = None,
    outputs: list[str] | None = None,
    blocks: DataFrame | None = None,
    uint_as_string: bool = False,
) -> DataFrame:
    """Select + decode logs for one event shape.

    ``address=None`` is the global-event path (events.go:121-216): any
    contract emitting the signature. Returns context columns + one typed
    column per requested output; malformed rows are dropped with HandleLog's
    exact rules (empty data, missing indexed topics, undecodable payload even
    after the 32-byte left-pad retry — events.go:410-484).
    """
    topic0 = event.topic0
    # F.get, not topics[0]: a LOG0 row (empty topics) in the landed table
    # must fall to the malformed-row drop (null != topic0), not blow up the
    # scan under ANSI's out-of-range GetArrayItem error
    df = logs.filter(F.get("topics", 0) == topic0)
    if chain is not None:
        df = df.filter(F.col("chain") == chain)
    if address is not None:
        df = df.filter(F.col("address") == address.lower())
    if from_block is not None:
        df = df.filter(F.col("block_number") >= from_block)
    if to_block is not None:
        df = df.filter(F.col("block_number") <= to_block)
    # malformed-row fast path (F3): empty data / missing topics dropped before
    # the Python stage so the UDF sees less data
    n_indexed = len(event.indexed_inputs)
    df = df.filter(F.length("data") > 0).filter(F.size("topics") > n_indexed)

    schema = event_output_schema(event, outputs, uint_as_string=uint_as_string)
    out_params = [f.name for f in schema.fields[len(CONTEXT_FIELDS) :]]
    out_types = {f.name: f.dataType for f in schema.fields}
    ev = event  # close over the plan-time constant; topic0 already applied

    in_cols = ["chain", "address", "block_number", "block_hash", "tx_hash", "tx_index", "log_index", "topics", "data"]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.data) if r.data is not None else b""
                decoded = decode_log(ev, list(r.topics), data)
                if decoded is None:
                    continue
                row = {
                    "chain": r.chain,
                    "contract_address": r.address,
                    "block_number": r.block_number,
                    "block_hash": r.block_hash,
                    "tx_hash": r.tx_hash,
                    "tx_index": r.tx_index,
                    "log_index": r.log_index,
                    "event_name": ev.name,
                }
                for name in out_params:
                    row[name] = _coerce(decoded.get(name), out_types[name])
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    decoded = df.select(*in_cols).mapInPandas(decode_batches, schema=schema)

    if blocks is not None:
        # timestamp via broadcast join to block headers (replaces per-row
        # HeaderByNumber, events.go:425; strictly better per SURVEY §4)
        hdr = blocks.select(
            F.col("chain").alias("__b_chain"),
            F.col("block_number").alias("__b_number"),
            F.col("timestamp").alias("timestamp"),
        )
        decoded = decoded.join(
            F.broadcast(hdr),
            (decoded["chain"] == hdr["__b_chain"]) & (decoded["block_number"] == hdr["__b_number"]),
            "left",
        ).drop("__b_chain", "__b_number")
    else:
        decoded = decoded.withColumn("timestamp", F.lit(None).cast("long"))
    return decoded


# --------------------------------------------------------------------------
# Unverified events — the decode-less raw surface (reference ROADMAP.md:78
# "Unverified methods and events", unshipped there; SURVEY §1.1 reserved a
# MapType(string,string) column for exactly this). When no ABI is known,
# the engine still serves (a) the raw per-log table and (b) the selector
# frequency profile that tells a user WHICH unverified signatures are worth
# hunting an ABI for.
# --------------------------------------------------------------------------


def raw_log_source(
    logs: DataFrame,
    *,
    chain: str | None = None,
    address: str | None = None,
    from_block: int | None = None,
    to_block: int | None = None,
) -> DataFrame:
    """Undecoded log scan: context columns + ``topic0`` + the full topics
    array + hex data + arity/size stats + the reserved ``raw`` map
    (topic0..topicN and data as strings — the MapType escape hatch for
    schema-less consumers). Same pushdown surface as the decoded path
    (chain/address/block range reach the parquet scan); no Python stage at
    all — this is a pure projection, the cheapest query in the engine."""
    df = logs
    if chain is not None:
        df = df.filter(F.col("chain") == chain)
    if address is not None:
        df = df.filter(F.col("address") == address.lower())
    if from_block is not None:
        df = df.filter(F.col("block_number") >= from_block)
    if to_block is not None:
        df = df.filter(F.col("block_number") <= to_block)
    data_hex = F.lower(F.hex(F.col("data")))
    # LOG0 guard: sequence(0, -1) DESCENDS on an empty topics array, which
    # would hand map_from_arrays two keys for zero values and crash — and
    # zero-topic logs are a real shape (LOG0) on exactly the ABI-less
    # surface this source exists for
    topic_keys = F.when(
        F.size("topics") > 0,
        F.transform(
            F.sequence(F.lit(0), F.size("topics") - 1),
            lambda i: F.concat(F.lit("topic"), i.cast("string")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    raw_map = F.map_concat(
        F.map_from_arrays(topic_keys, F.col("topics")),
        F.create_map(F.lit("data"), data_hex),
    )
    return df.select(
        "chain",
        "address",
        "block_number",
        "block_hash",
        "tx_hash",
        "tx_index",
        "log_index",
        # F.get, not topics[0]: ANSI mode (the session default) throws on
        # out-of-range GetArrayItem and LOG0 rows have an empty topics array
        F.get("topics", 0).alias("topic0"),
        "topics",
        data_hex.alias("data_hex"),
        F.size("topics").cast("int").alias("n_topics"),
        F.length("data").cast("long").alias("data_bytes"),
        raw_map.alias("raw"),
    )


def selector_profile(raw: DataFrame) -> DataFrame:
    """Reconnaissance aggregate over the undecoded surface: per
    (topic0, n_topics) signature shape — log count, distinct emitting
    contracts, block span, and data-payload size stats. This is the table
    a user reads to decide which unverified event signatures carry the
    volume to justify sourcing an ABI (and n_topics disambiguates same-
    topic0 events with different indexed-arg counts). One map-side-
    combinable groupBy over the projection — at 100 TB this runs at scan
    speed with the profile's cardinality bounded by distinct signatures,
    not rows."""
    return (
        raw.groupBy("topic0", "n_topics")
        .agg(
            F.count(F.lit(1)).alias("n_logs"),
            F.countDistinct("address").alias("n_contracts"),
            F.min("block_number").alias("first_block"),
            F.max("block_number").alias("last_block"),
            F.sum("data_bytes").alias("total_data_bytes"),
            F.max("data_bytes").alias("max_data_bytes"),
        )
        .orderBy(F.col("n_logs").desc(), F.col("topic0").asc(), F.col("n_topics").asc())
    )
