"""Method-call source: block grid × contracts × methods -> result DataFrame.

Spark-first realization of the interval method caller
(/root/reference/chainservice/chainservice.go:173-187,
chainservice/methods.go:21-146):

* the block generator `for i := start; i < end; i += interval` becomes
  ``spark.range(start, end, step)`` — a zero-IO distributed driver table;
* the per-block ``eth_call`` fan-out becomes one Arrow-batched
  ``mapInPandas`` stage; the RPC client is created once per partition
  (connection/cache reuse per executor) and is **injectable**, so tests run
  offline against a deterministic fake while production wires a real JSON-RPC
  client;
* apollo's global LRU for immutable calls (cached_client.go:36-91) becomes a
  per-executor ``functools.lru_cache``; its global rate limit becomes a
  per-partition budget of ``rate_limit / num_partitions``.

Outputs one row per (contract, block) with all declared method outputs merged
— the aggregateCallResults semantics (chainservice/utils.go:8-22).
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Protocol

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apollo_spark.abi import Abi, decode_return, encode_calldata
from apollo_spark.dsl.schema import ContractSpec, MethodSpec
from apollo_spark.sources.logs import _coerce, abi_type_to_spark


class EvmCallClient(Protocol):
    """Minimal ``eth_call`` surface (go-ethereum CallContract equivalent)."""

    def call(self, chain: str, to: str, data: bytes, block: int | None) -> bytes: ...


ClientFactory = Callable[[], EvmCallClient]


def method_result_schema(contract: ContractSpec, methods: list[MethodSpec]) -> T.StructType:
    fields = [
        T.StructField("chain", T.StringType()),
        T.StructField("contract_address", T.StringType()),
        T.StructField("block_number", T.LongType()),
    ]
    abi = contract.abi
    assert abi is not None
    for m in methods:
        fn = abi.functions[m.name]
        wanted = set(m.outputs) if m.outputs else None
        for i, p in enumerate(fn.outputs):
            name = p.name or (fn.name if len(fn.outputs) == 1 else f"out{i}")
            if wanted is None or name in wanted:
                fields.append(T.StructField(name, abi_type_to_spark(p.type)))
    # echo method inputs back as columns (methods.go:118-120)
    for m in methods:
        for k in m.inputs:
            fields.append(T.StructField(k, T.StringType()))
    return T.StructType(fields)


def method_call_source(
    spark: SparkSession,
    contract: ContractSpec,
    *,
    chain: str,
    start_block: int,
    end_block: int,
    interval: int,
    client_factory: ClientFactory,
    rate_limit: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row per (contract, grid block) with merged method outputs."""
    methods = contract.methods
    schema = method_result_schema(contract, methods)
    abi = contract.abi
    assert abi is not None
    address = contract.address
    col_names = [f.name for f in schema.fields]
    col_types = {f.name: f.dataType for f in schema.fields}
    # plan-time: selector + calldata per method (BuildCallMsg, callmsg.go:19-54)
    calls = []
    for m in methods:
        fn = abi.functions[m.name]
        args = [m.inputs[p.name] for p in fn.inputs] if fn.inputs else []
        calls.append((m, fn, encode_calldata(fn, args)))

    blocks = spark.range(start_block, end_block, interval).toDF("block_number")
    if num_partitions:
        blocks = blocks.repartition(num_partitions)
    parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    per_part_rate = (rate_limit / parts) if rate_limit else None

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()  # one client per partition (executor reuse)
        min_interval = (1.0 / per_part_rate) if per_part_rate else 0.0
        last = 0.0
        for pdf in batches:
            rows = []
            for blk in pdf["block_number"]:
                blk = int(blk)
                row = {"chain": chain, "contract_address": address, "block_number": blk}
                ok = True
                for m, fn, calldata in calls:
                    if min_interval:
                        wait = last + min_interval - time.monotonic()
                        if wait > 0:
                            time.sleep(wait)
                        last = time.monotonic()
                    try:
                        ret = client.call(chain, address, calldata, blk)
                        decoded = decode_return(fn, ret)
                    except Exception:
                        ok = False  # failed call -> row dropped (main.go:174-177)
                        break
                    wanted = set(m.outputs) if m.outputs else None
                    for k, v in decoded.items():
                        if wanted is None or k in wanted:
                            row[k] = _coerce(v, col_types[k])
                    for k, v in m.inputs.items():
                        row[k] = str(v)
                if ok:
                    rows.append(row)
            yield pd.DataFrame(rows, columns=col_names)

    return blocks.mapInPandas(run_batches, schema=schema)
