"""Structured Streaming sources: realtime event stream + interval method
caller (SURVEY §2.1 S3/S4/S6, §7 step 7).

Apollo's realtime mode is a WS subscription per query with per-log goroutines
and wall-clock timestamps (/root/reference/chainservice/events.go:221-407)
and a ticker-driven method caller (chainservice/chainservice.go:173-179).
Spark can't hold a websocket inside a task; the production topology is a tiny
bridge process (WS -> append-only files / Kafka) + ``readStream`` here. The
transform/filter/save tail is the SAME compiled plan as batch — Spark's
batch/streaming unification replaces apollo's shared EvalSave loop
(main.go:173-193).

Improvements over the reference, by design:
* checkpointed exactly-once sink delivery vs apollo's at-most-once with
  silent drops (main.go:174-177);
* watermarks for late data — apollo has none (SURVEY §2.7).
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apollo_spark.abi import AbiEvent
from apollo_spark.dsl.schema import ContractSpec
from apollo_spark.sources.calls import ClientFactory
from apollo_spark.sources.logs import decoded_event_source

# Schema the WS->files bridge writes (one JSON object per line), mirroring
# the raw log shape of the logs table (FIXTURES.md §2) minus block metadata
# that realtime mode doesn't wait for.
RAW_LOG_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType()),
        T.StructField("block_number", T.LongType()),
        T.StructField("block_hash", T.StringType()),
        T.StructField("tx_hash", T.StringType()),
        T.StructField("tx_index", T.IntegerType()),
        T.StructField("log_index", T.IntegerType()),
        T.StructField("address", T.StringType()),
        T.StructField("topics", T.ArrayType(T.StringType())),
        T.StructField("data_hex", T.StringType()),  # hex because JSON lines
    ]
)


def raw_log_stream(spark: SparkSession, bridge_dir: str) -> DataFrame:
    """readStream over the bridge's JSONL directory -> raw logs frame with
    binary ``data``, shaped exactly like the batch logs table."""
    return (
        spark.readStream.schema(RAW_LOG_STREAM_SCHEMA)
        .json(bridge_dir)
        .withColumn("data", F.unhex(F.regexp_replace(F.col("data_hex"), "^0x", "")))
        .drop("data_hex")
    )


def event_stream(
    spark: SparkSession,
    bridge_dir: str,
    event: AbiEvent,
    *,
    chain: str | None = None,
    address: str | None = None,
    outputs: list[str] | None = None,
) -> DataFrame:
    """Realtime contract/global event stream (S3/S4): same decode pipeline as
    batch, wall-clock ``timestamp`` stamped per row (events.go:310 semantics
    — realtime mode overwrites block time with receipt time)."""
    logs = raw_log_stream(spark, bridge_dir)
    decoded = decoded_event_source(
        logs, event, chain=chain, address=address, outputs=outputs, blocks=None
    )
    return decoded.withColumn("timestamp", F.unix_timestamp(F.current_timestamp()))


def method_call_stream(
    spark: SparkSession,
    contract: ContractSpec,
    *,
    chain: str,
    interval_seconds: int,
    client_factory: ClientFactory,
) -> DataFrame:
    """Realtime interval method caller (S6): rate source ticks once per
    interval (chainservice.go:173-179's ticker); each tick issues the
    contract's calls at the latest block (block=None -> 'latest')."""
    from apollo_spark.abi import decode_return, encode_calldata
    from apollo_spark.sources.calls import method_result_schema
    from apollo_spark.sources.logs import _coerce

    methods = contract.methods
    schema = method_result_schema(contract, methods)
    # realtime rows get a wall-clock timestamp column (events.go:310)
    schema = T.StructType(list(schema.fields) + [T.StructField("timestamp", T.LongType())])
    abi = contract.abi
    assert abi is not None
    address = contract.address
    col_types = {f.name: f.dataType for f in schema.fields}
    col_names = [f.name for f in schema.fields]
    calls = []
    for m in methods:
        fn = abi.functions[m.name]
        args = [m.inputs[p.name] for p in fn.inputs] if fn.inputs else []
        calls.append((m, fn, encode_calldata(fn, args)))

    # rate source only takes integer rates: tick at 1/s, keep every Nth
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .filter(F.col("value") % int(max(interval_seconds, 1)) == 0)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for _ in range(len(pdf)):
                row = {"chain": chain, "contract_address": address, "block_number": None}
                ok = True
                for m, fn, calldata in calls:
                    try:
                        ret = client.call(chain, address, calldata, None)  # latest
                        decoded = decode_return(fn, ret)
                    except Exception:
                        ok = False
                        break
                    wanted = set(m.outputs) if m.outputs else None
                    for k, v in decoded.items():
                        if wanted is None or k in wanted:
                            row[k] = _coerce(v, col_types[k])
                row["timestamp"] = int(time.time())
                if ok:
                    rows.append(row)
            yield pd.DataFrame(rows, columns=col_names)

    return ticks.mapInPandas(run, schema=schema)


def windowed_event_counts(
    decoded_stream: DataFrame,
    *,
    window_seconds: int = 60,
    watermark_seconds: int = 120,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Stateful tier apollo lacks entirely (SURVEY §2.7): watermarked tumbling
    window counts per (contract, event) with late-data tolerance."""
    with_ts = decoded_stream.withColumn("__event_time", F.col(ts_col).cast("timestamp"))
    return (
        with_ts.withWatermark("__event_time", f"{watermark_seconds} seconds")
        .groupBy(
            F.window("__event_time", f"{window_seconds} seconds").alias("w"),
            "contract_address",
            "event_name",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "contract_address",
            "event_name",
            "n_events",
        )
    )


def stateful_running_totals(
    stream: DataFrame,
    *,
    key_col: str = "contract_address",
    value_col: str = "value",
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, total) maintained across micro-batches, emitting the
    updated aggregate for every key touched in a batch.

    This is the arbitrary-keyed-state tier beyond watermarked windows —
    apollo's realtime mode is stateless per-row (SURVEY §2.7), so cumulative
    metrics there require the Postgres sink. State is partitioned by key
    (scales with distinct keys, not events); an optional processing-time TTL
    bounds the state store for unbounded key domains at 100 TB.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )
    timeout = GroupStateTimeout.ProcessingTimeTimeout if ttl_seconds else GroupStateTimeout.NoTimeout

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pd.to_numeric(pdf[value_col], errors="coerce").fillna(0.0)
            n += len(pdf)
            total += float(vals.sum())
        state.update((n, total))
        if ttl_seconds:
            state.setTimeoutDuration(ttl_seconds * 1000)
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    return (
        stream.select(F.col(key_col).cast("string").alias("key"), F.col(value_col))
        .groupBy("key")
        .applyInPandasWithState(update, out_schema, state_schema, "update", timeout)
    )


def dedup_event_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    *,
    watermark_seconds: int = 600,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Exactly-once log delivery over a re-emitting bridge: watermark-bounded
    streaming dedup on the log identity (tx_hash, log_index, block_hash by
    default).

    ``log_index`` — not ``tx_index`` — is the per-log identity: every log of
    one transaction shares (tx_hash, tx_index), so deduping on tx_index would
    silently drop legitimate repeated events (e.g. two ERC-20 Transfers in one
    swap tx). ``block_hash`` is in the key for reorg correctness: a log
    re-included in a new block after a reorg keeps its (tx_hash, log_index)
    but gets a new block_hash — without it in the key, the re-inclusion would
    be dropped as a 'replay' and the sink kept the orphaned block's metadata
    forever. Exact replays (bridge reconnect re-sending the same delivery)
    share all three. ``dropDuplicatesWithinWatermark`` keeps per-key state
    only for the watermark horizon — bounded state at 100 TB/day event rates,
    unlike an unbounded ``dropDuplicates``."""
    keys = list(keys) if keys else ["tx_hash", "log_index", "block_hash"]
    with_ts = stream.withColumn("__event_time", F.col(ts_col).cast("timestamp"))
    return (
        with_ts.withWatermark("__event_time", f"{watermark_seconds} seconds")
        .dropDuplicatesWithinWatermark(keys)
        .drop("__event_time")
    )


def streaming_hll_rollup(
    table_dir: str,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
    salt: str = "hll",
    app_id: str = "hll_rollup",
):
    """foreachBatch sink factory: a continuously-merged HyperLogLog register
    table — streaming COUNT(DISTINCT) whose state is O(groups * 2^p)
    forever, no matter how much stream flows through.

    Per micro-batch: sketch the batch (ops.sketch.hll_registers), max-merge
    with the current register snapshot, commit the merged state as an
    OVERWRITE version of a TxTable keyed by (app_id, batch_id). The commit
    is exactly-once across checkpoint replays (the pair rides the
    manifest), and even a double-applied merge would be a no-op because
    register max-merge is idempotent. Reading the current version while
    committing the next is safe: TxTable writes land in a fresh txn dir and
    reads pin exact manifest file lists.

    Usage::

        stream.writeStream.foreachBatch(
            streaming_hll_rollup(dir, "user_id", ["event_type"])
        ).option("checkpointLocation", ckpt).start()
    """
    groups = list(group_cols or [])

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from apollo_spark.ops.sketch import hll_merge, hll_registers
        from apollo_spark.table_format import TxTable

        spark = batch_df.sparkSession
        table = TxTable(table_dir)
        regs = hll_registers(batch_df, value_col, groups, p=p, salt=salt)
        if table.current_version() is not None:
            regs = hll_merge(table.read(spark), regs, groups)
        table.write(regs, mode="overwrite", txn_app=app_id, txn_batch=int(batch_id))

    return _sink


def streaming_cms_rollup(
    table_dir: str,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    app_id: str = "cms_rollup",
):
    """foreachBatch sink factory: a continuously-merged count–min sketch —
    streaming frequency estimation / heavy hitters whose state is
    O(depth x width) integers forever.

    The HLL sibling (:func:`streaming_hll_rollup`) max-merges, which is
    idempotent on its own; CMS merge is elementwise ADD, so a re-applied
    micro-batch would double-count — exactly-once rests entirely on the
    TxTable (app_id, batch_id) manifest dedup: a checkpoint-replayed batch's
    OVERWRITE commit is a no-op, and the state a replay would have rebuilt
    is already committed. Query the state any time with
    ops.sketch.cms_estimate / a candidate join."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from apollo_spark.ops.sketch import cms_counts
        from apollo_spark.table_format import TxTable

        spark = batch_df.sparkSession
        table = TxTable(table_dir)
        counts = cms_counts(batch_df, item_col, depth=depth, width=width, salt=salt)
        if table.current_version() is not None:
            counts = (
                table.read(spark)
                .unionByName(counts)
                .groupBy("r", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        table.write(counts, mode="overwrite", txn_app=app_id, txn_batch=int(batch_id))

    return _sink


def event_triggered_calls(
    decoded_stream: DataFrame,
    contract: ContractSpec,
    *,
    chain: str,
    client_factory: ClientFactory,
) -> DataFrame:
    """Realtime S7: event-attached method calls. Apollo's realtime mode
    issues the event block's ``eth_call``s the moment a subscribed log
    arrives (chainservice/events.go:280-307 CallMethods); batch mode's
    equi-join against landed method_results can't do that for live blocks.

    Same executor topology as the interval caller: one client per partition
    (connection + LRU reuse), Arrow-batched rows, calls pinned to each
    event's block_number so the answer is the state AT the event, not
    'latest'. Failed calls drop the row (main.go:174-177 semantics).
    Works identically on a batch frame (useful for tests/backfills)."""
    from apollo_spark.abi import decode_return, encode_calldata
    from apollo_spark.sources.logs import _coerce

    methods = contract.methods
    abi = contract.abi
    assert abi is not None
    address = contract.address
    calls = []
    out_fields: list[T.StructField] = []
    for m in methods:
        fn = abi.functions[m.name]
        args = [m.inputs[p.name] for p in fn.inputs] if fn.inputs else []
        calls.append((m, fn, encode_calldata(fn, args)))
        wanted = set(m.outputs) if m.outputs else None
        for i, p in enumerate(fn.outputs):
            name = p.name or (fn.name if len(fn.outputs) == 1 else f"out{i}")
            if wanted is None or name in wanted:
                from apollo_spark.sources.logs import abi_type_to_spark

                out_fields.append(T.StructField(name, abi_type_to_spark(p.type)))

    schema = T.StructType(list(decoded_stream.schema.fields) + out_fields)
    col_types = {f.name: f.dataType for f in schema.fields}
    col_names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                blk = rec.get("block_number")
                ok = True
                for m, fn, calldata in calls:
                    try:
                        ret = client.call(chain, address, calldata, None if blk is None else int(blk))
                        decoded = decode_return(fn, ret)
                    except Exception:
                        ok = False
                        break
                    wanted = set(m.outputs) if m.outputs else None
                    for k, v in decoded.items():
                        if wanted is None or k in wanted:
                            rec[k] = _coerce(v, col_types[k])
                if ok:
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=col_names)

    return decoded_stream.mapInPandas(run, schema=schema)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    lookback_seconds: int = 3600,
    watermark_seconds: int = 600,
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left event picks up
    every right event with the same key from the preceding
    ``lookback_seconds`` window (right.ts in (left.ts - lookback, left.ts]).

    The stateful tier apollo lacks entirely (SURVEY §2.7): correlating two
    live feeds (e.g. a swap stream against a transfer stream) requires
    buffering both sides; the watermark bounds that state — each side keeps
    only lookback+watermark seconds of rows, so state is O(rate x horizon)
    regardless of stream age. Both inputs need event-time columns in epoch
    seconds."""
    lw = left.withColumn("__lts", F.col(left_ts).cast("timestamp")).withWatermark(
        "__lts", f"{watermark_seconds} seconds"
    )
    rcols = [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    rw = (
        right.select(*rcols)
        .withColumn("__rts", F.col(f"{right_prefix}{right_ts}").cast("timestamp"))
        .withWatermark("__rts", f"{watermark_seconds} seconds")
    )
    cond = (
        (F.col(on) == F.col(f"{right_prefix}{on}"))
        & (F.col("__rts") > F.col("__lts") - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
        & (F.col("__rts") <= F.col("__lts"))
    )
    return lw.join(rw, cond, "inner").drop("__lts", "__rts")


def session_window_stats(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark_seconds: int = 600,
    ts_col: str = "timestamp",
    value_col: str | None = None,
) -> DataFrame:
    """Streaming sessionization via event-time session windows: a session
    closes after ``gap_seconds`` of per-key inactivity, emitting (key,
    session start/end, n_events[, sum_value]) — the streaming analog of the
    batch gaps-and-islands `user_sessions` query, but incremental: state per
    OPEN session only, closed sessions are emitted and dropped once the
    watermark passes (bounded state at any stream age)."""
    with_ts = stream.withColumn("__event_time", F.col(ts_col).cast("timestamp"))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double").alias("sum_value"))
    return (
        with_ts.withWatermark("__event_time", f"{watermark_seconds} seconds")
        .groupBy(F.session_window("__event_time", f"{gap_seconds} seconds").alias("w"), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *(["n_events"] + (["sum_value"] if value_col else [])),
        )
    )


def streaming_corpus_dedup(
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n: int = 3,
    app_id: str = "corpus_dedup",
):
    """foreachBatch sink factory: continuous-ingest NEAR-DUP FILTERING for a
    document stream — the streaming face of ops.dedup.incremental_minhash_dedup.

    Per micro-batch: (a) match the increment's MinHash band keys against the
    persistent LSH index at ``index_dir`` (shuffles the increment, never the
    history), (b) drop every batch row whose estimated jaccard against an
    already-ingested or smaller-id batchmate document clears ``threshold``,
    (c) append only the survivors to the TxTable at ``out_dir``, (d) commit
    the increment's index state. All four steps key on (app_id, batch_id),
    so a checkpoint-restart replay is a no-op end to end — the survivor
    table never double-ingests and never re-filters against itself.

    State grows O(bands + num_hashes) longs per ingested doc — the index,
    not the corpus, is the streaming state, which is what keeps this
    runnable forever at lake scale.

    Usage::

        stream.writeStream.foreachBatch(
            streaming_corpus_dedup(idx, out)
        ).option("checkpointLocation", ckpt).start()
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from apollo_spark.ops.dedup import incremental_minhash_dedup
        from apollo_spark.table_format import TxTable

        matches = incremental_minhash_dedup(
            index_dir,
            batch_df,
            id_col=id_col,
            text_col=text_col,
            n=n,
            threshold=threshold,
            txn_app=app_id,
            txn_batch=int(batch_id),
        )
        # min-id-survives, matching the batch dedup tier: a pair against
        # HISTORY drops the new doc (new_id); an intra-batch pair arrives
        # id-ordered (new_id < match_id) and drops the larger id (match_id)
        batch_ids = batch_df.select(F.col(id_col).alias("match_id")).distinct()
        intra = matches.join(batch_ids, "match_id", "left_semi").select(
            F.col("match_id").alias(id_col)
        )
        hist = matches.join(batch_ids, "match_id", "left_anti").select(
            F.col("new_id").alias(id_col)
        )
        losers = intra.unionByName(hist).distinct()
        survivors = batch_df.join(losers, id_col, "left_anti")
        TxTable(out_dir).write(survivors, mode="append", txn_app=app_id, txn_batch=int(batch_id))
        matches.unpersist()

    return _sink


def streaming_decontamination_gate(
    benchmark_df: DataFrame,
    out_dir: str,
    report_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_shared: int = 0,
    app_id: str = "decontam",
):
    """foreachBatch sink factory: eval-set decontamination at INGEST — the
    streaming twin of the DSL ``decontaminate`` block. Per micro-batch:
    score every incoming document's distinct-shared-``n``-gram count
    against the STATIC benchmark set (ops.corpus.decontaminate — benchmark
    grams broadcast once per batch, no state table needed: the benchmark
    is fixed, so unlike the dedup/CDC gates there is no growing index),
    append clean rows (n_shared <= ``max_shared``) to ``out_dir`` and, when
    ``report_dir`` is set, one quarantine row per CONTAMINATED document
    (id, n_shared, batch) — the audit trail a compliance review reads.
    Both writes ride the (app_id, batch_id) txn guard: a replayed batch is
    a no-op on either table, and the report append precedes the clean
    append so a crash between them replays identically (report-first, the
    streaming_cdc_retention ordering argument).

    100 TB posture: the benchmark side is small by definition; the corpus
    side is one narrow explode + broadcast join per batch — the gate's
    cost scales with the INCREMENT, never with history."""
    from apollo_spark.ops.corpus import decontaminate

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from apollo_spark.table_format import TxTable

        flagged = (
            decontaminate(batch_df, benchmark_df, id_col=id_col, text_col=text_col, n=n)
            .filter(F.col("n_shared") > int(max_shared))
            .persist()
        )
        flagged.count()
        if report_dir is not None:
            TxTable(report_dir).write(
                flagged.withColumn("batch", F.lit(int(batch_id))),
                mode="append",
                txn_app=app_id,
                txn_batch=int(batch_id),
            )
        clean = batch_df.join(flagged.select(id_col), id_col, "left_anti")
        TxTable(out_dir).write(
            clean, mode="append", txn_app=app_id, txn_batch=int(batch_id)
        )
        flagged.unpersist()

    return _sink


def streaming_frontier_dedup(
    index_dir: str,
    out_dir: str,
    key_col: str = "url",
    canonicalize: bool = True,
    app_id: str = "frontier",
):
    """foreachBatch sink factory: EXACT-KEY incremental dedup — the crawl
    frontier. Per micro-batch: (a) derive the dedup key (the canonical URL
    via ops.web.canonical_url when ``canonicalize``, else ``key_col``
    verbatim; unparseable URLs canonicalize to '' and are dropped as junk),
    (b) collapse the batch to one row per key — the MIN of the remaining
    column tuple, deterministic for any partitioning or arrival order —
    (c) drop keys already in the persistent index at ``index_dir``, (d) append
    survivors to ``out_dir`` and the new keys to the index, all under the
    (app_id, batch_id) txn guard — replay-safe at any crash point because
    the survivor append precedes the index append and both are idempotent
    per batch.

    This is incremental exact_dedup: the shuffle moves the increment, the
    index grows by one row per DISTINCT key ever seen, and re-submitting a
    crawled URL never grows state — what keeps a frontier runnable forever.
    The minhash (streaming_corpus_dedup) and CDC (streaming_cdc_retention)
    sinks catch near- and span-duplicates; this catches the exact re-submit
    before any content is fetched at all.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from apollo_spark.ops.web import canonical_url
        from apollo_spark.table_format import TxTable

        spark = batch_df.sparkSession
        keyed = batch_df.withColumn(
            "__k", canonical_url(key_col) if canonicalize else F.col(key_col)
        ).filter(F.col("__k") != "")
        # one row per key within the batch: min over the full row struct —
        # deterministic for any partitioning/arrival order
        others = [c for c in keyed.columns if c != "__k"]
        first = (
            keyed.groupBy("__k")
            .agg(F.min(F.struct(*others)).alias("__r"))
            .select("__k", *[F.col(f"__r.{c}").alias(c) for c in others])
        )
        idx_t = TxTable(index_dir)
        seen = (
            idx_t.read(spark).select("__k")
            if idx_t.current_version() is not None
            else None
        )
        novel = first if seen is None else first.join(seen, "__k", "left_anti")
        novel = novel.persist()
        novel.count()
        TxTable(out_dir).write(
            novel.drop("__k"), mode="append", txn_app=app_id, txn_batch=int(batch_id)
        )
        idx_t.write(
            novel.select("__k"), mode="append", txn_app=app_id, txn_batch=int(batch_id)
        )
        novel.unpersist()

    return _sink


def streaming_cdc_retention(
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_novel_frac: float = 0.5,
    window: int = 3,
    divisor: int = 16,
    app_id: str = "cdc_retention",
    report_dir: str | None = None,
):
    """foreachBatch sink factory: continuous-ingest SPAN-NOVELTY retention —
    the keep/drop gate over ``ops.dedup.incremental_cdc_novelty`` that makes
    the continuous-ingest story one call (round-5 verdict item 7). Where
    ``streaming_corpus_dedup`` drops documents that LOOK like an existing
    document (minhash near-dup), this drops documents whose CONTENT is
    already ingested span-by-span: a boilerplate re-crawl scores ~0 novelty
    and is dropped even when no single historical document resembles it.

    Per micro-batch: (a) CDC-chunk the increment and score each document's
    ``novel_frac`` against the persistent chunk-hash index at ``index_dir``;
    (b) append the documents clearing ``min_novel_frac`` to the TxTable at
    ``out_dir`` — and, if ``report_dir`` is given, the full novelty report
    beside it — BEFORE (c) the chunk index moves (the op's report-first
    commit order), all under the same (app_id, batch_id) txn guard, so a
    checkpoint-restart replay at ANY crash point recomputes the identical
    gate against the unmoved index and every write is a no-op.

    Documents with no spans (empty/whitespace text) produce no chunks and
    are dropped — a zero-length document carries no novel content by
    definition. State grows by the corpus's DISTINCT chunk hashes only:
    re-crawls never grow the index, which is what keeps this runnable
    forever at lake scale.

    Usage::

        stream.writeStream.foreachBatch(
            streaming_cdc_retention(idx, kept)
        ).option("checkpointLocation", ckpt).start()
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from apollo_spark.ops.cache import release_caches
        from apollo_spark.ops.dedup import incremental_cdc_novelty
        from apollo_spark.table_format import TxTable

        def _commit(report: DataFrame) -> None:
            keep = report.filter(F.col("novel_frac") >= min_novel_frac).select(
                F.col("id").alias(id_col)
            )
            survivors = batch_df.join(keep, id_col, "left_semi")
            TxTable(out_dir).write(
                survivors, mode="append", txn_app=app_id, txn_batch=int(batch_id)
            )
            if report_dir is not None:
                TxTable(report_dir).write(
                    report, mode="append", txn_app=app_id, txn_batch=int(batch_id)
                )

        out = incremental_cdc_novelty(
            index_dir,
            batch_df,
            id_col=id_col,
            text_col=text_col,
            window=window,
            divisor=divisor,
            txn_app=app_id,
            txn_batch=int(batch_id),
            commit_report=_commit,
        )
        release_caches(out)

    return _sink


def streaming_blocking_drift_monitor(
    stats_dir: str,
    report_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hot_frac: float = 0.04,
    scrub_share: float = 0.002,
    frac_floor: int = 1024,
    batch_frac_floor: int = 8,
    pinned_scrub: bool = False,
    app_id: str = "blocking_drift",
):
    """foreachBatch sink factory: blocking-GEOMETRY drift watchdog for
    streaming dedup (round 10). streaming_corpus_dedup and the incremental
    MinHash index pin their banding geometry at index creation; a crawl
    whose boilerplate share drifts afterwards (blocking_config_profile's
    hot_shingle_share separator — 0.0115 on the skew rehearsal corpus vs
    exactly 0.0 on every uniform corpus/SF) silently degrades into the
    round-8 mega-bucket pathology with no signal. Per micro-batch:

    (a) append the increment's shingle document-frequency counts to
        ``stats_dir``/vocab and its doc count to ``stats_dir``/docs — both
        under the (app, batch) txn guard, so a checkpoint-restart replay
        is a no-op and the cumulative stats never double-count;
    (b) recompute the hot-shingle-share separator (postings mass whose df
        exceeds ``greatest(floor(hot_frac * n_docs), frac_floor)`` — the
        exact blocking_config_profile arithmetic) over the CUMULATIVE
        stats and, with ``batch_frac_floor``, over the BATCH alone — the
        early-warning channel: one boilerplate-heavy crawl segment flags
        before it moves the corpus-level share;
    (c) append ONE report row to ``report_dir``: ``drift`` is true when
        either recommendation disagrees with ``pinned_scrub`` (the
        geometry decision the index was built under).

    The streaming-PSI pattern deliberately applies: REPORT ONLY, no
    automatic re-index — re-banding a live LSH index invalidates its
    committed band keys and is an operator decision; this row is the
    trigger for it.

    100 TB posture: state is vocabulary-sized, one (batch, shingle, df)
    row per distinct shingle per batch (compact periodically); the shuffle
    moves the increment's vocabulary, never the corpus; the two report
    aggregates are vocabulary scans, map-combinable."""
    from apollo_spark.ops.dedup import shingles

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from apollo_spark.table_format import TxTable

        spark = batch_df.sparkSession
        ex = (
            batch_df.select(
                F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
            )
            .filter(F.size("sh") > 0)
            .select("id", F.explode("sh").alias("s"))
        )
        inc_vocab = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .withColumn("batch", F.lit(int(batch_id)))
            .persist()
        )
        n_docs_batch = int(ex.select("id").distinct().count())
        try:
            # commit state FIRST, then report from committed state: a crash
            # between them replays into idempotent no-op appends and an
            # identical recomputed report (the corpus-dedup ordering rule)
            TxTable(f"{stats_dir}/vocab").write(
                inc_vocab, mode="append", txn_app=app_id, txn_batch=int(batch_id)
            )
            TxTable(f"{stats_dir}/docs").write(
                spark.createDataFrame(
                    [(int(batch_id), n_docs_batch)], "batch long, n_docs long"
                ),
                mode="append",
                txn_app=app_id,
                txn_batch=int(batch_id),
            )

            def _share(vocab: DataFrame, n_docs: int, floor: int) -> float:
                cut = max(int(float(hot_frac) * n_docs), int(floor))
                row = vocab.agg(
                    F.sum(F.when(F.col("df") > cut, F.col("df")).otherwise(F.lit(0))).alias("hot"),
                    F.sum("df").alias("total"),
                ).first()
                total = row["total"] or 0
                return (float(row["hot"] or 0) / float(total)) if total else 0.0

            cum_vocab = (
                TxTable(f"{stats_dir}/vocab")
                .read(spark)
                .groupBy("s")
                .agg(F.sum("df").alias("df"))
            )
            n_docs_total = int(
                TxTable(f"{stats_dir}/docs").read(spark).agg(F.sum("n_docs")).first()[0] or 0
            )
            share_total = _share(cum_vocab, n_docs_total, frac_floor)
            share_batch = _share(
                inc_vocab.select("s", "df"), n_docs_batch, batch_frac_floor
            )
            rec_total = share_total > float(scrub_share)
            rec_batch = share_batch > float(scrub_share)
            report = spark.createDataFrame(
                [
                    (
                        int(batch_id),
                        n_docs_batch,
                        n_docs_total,
                        share_batch,
                        share_total,
                        rec_batch,
                        rec_total,
                        bool(pinned_scrub),
                        (rec_total != bool(pinned_scrub)) or (rec_batch != bool(pinned_scrub)),
                    )
                ],
                "batch_id long, n_docs_batch long, n_docs_total long, "
                "hot_share_batch double, hot_share_total double, "
                "rec_scrub_batch boolean, rec_scrub_total boolean, "
                "pinned_scrub boolean, drift boolean",
            )
            TxTable(report_dir).write(
                report, mode="append", txn_app=app_id, txn_batch=int(batch_id)
            )
        finally:
            inc_vocab.unpersist()

    return _sink


def streaming_psi_monitor(
    ref_dir: str,
    report_dir: str,
    category_col: str = "event_type",
    app_id: str = "psi_monitor",
):
    """foreachBatch sink factory: per-micro-batch Population Stability Index
    against a persistent reference distribution — drift monitoring IN the
    stream (the streaming face of the gated events_psi_drift query; PSI
    < 0.1 stable, > 0.25 investigate).

    The first non-empty batch ESTABLISHES the reference: its per-category
    counts append to the TxTable at ``ref_dir`` under the (app, batch) txn
    guard. Every batch then appends ONE report row to ``report_dir`` under
    the same guard: (batch_id, n_rows, n_bins, n_bins_skipped, psi). Bins
    observed on only one side are excluded from the sum — same documented
    semantics as the batch query — but surface in ``n_bins_skipped`` so a
    category appearing or vanishing is visible even when the shared-bin PSI
    looks calm. The reference-establishing batch reports psi = 0.0 exactly
    (identical integer distributions -> every term ln(1) = 0), a built-in
    sanity row.

    Replay safety: the reference append commits BEFORE the report is
    computed (the report reads the committed reference), and both writes are
    idempotent per (app, batch) — a checkpoint-restart replay at any crash
    point recomputes the identical report and no-ops the appends. State is
    one row per reference category; the shuffle moves only the increment's
    category counts — nothing in this sink scales with history.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        cur = (
            batch_df.groupBy(F.col(category_col).alias("category"))
            .agg(F.count(F.lit(1)).alias("n_cur"))
            .persist()
        )
        try:
            _psi_body(cur, batch_id)
        finally:
            # release even when a TxTable write raises mid-body: a retried
            # batch would otherwise stack a leaked persisted frame per
            # attempt in executor storage (ADVICE round 6)
            cur.unpersist()

    def _psi_body(cur: DataFrame, batch_id: int) -> None:
        from apollo_spark.table_format import TxTable

        spark = cur.sparkSession
        n_rows = cur.agg(F.sum("n_cur")).first()[0] or 0
        ref_t = TxTable(ref_dir)
        if ref_t.current_version() is None and n_rows > 0:
            ref_t.write(
                cur.select("category", F.col("n_cur").alias("n_ref")),
                mode="append",
                txn_app=app_id,
                txn_batch=int(batch_id),
            )
        has_ref = ref_t.current_version() is not None
        if has_ref:
            ref = ref_t.read(spark).select("category", "n_ref")
            j = ref.join(cur, "category", "full_outer")
        else:  # nothing to compare against (empty stream so far)
            j = cur.select("category", F.lit(None).cast("long").alias("n_ref"), "n_cur")
        t = j.agg(F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
        p_ref = F.col("n_ref").cast("double") / F.col("t_ref").cast("double")
        p_cur = F.col("n_cur").cast("double") / F.col("t_cur").cast("double")
        shared = (
            F.col("n_ref").isNotNull()
            & F.col("n_cur").isNotNull()
            & (F.col("n_ref") > 0)
            & (F.col("n_cur") > 0)
        )
        term = F.when(shared, (p_cur - p_ref) * F.log(p_cur / p_ref))
        rep = (
            j.crossJoin(F.broadcast(t))
            .select(term.alias("__term"))
            .agg(
                F.sum(F.when(F.col("__term").isNotNull(), 1).otherwise(0)).alias("n_bins"),
                F.sum(F.when(F.col("__term").isNull(), 1).otherwise(0)).alias("n_bins_skipped"),
                F.sum("__term").alias("__psi"),
            )
            .select(
                F.lit(int(batch_id)).cast("long").alias("batch_id"),
                F.lit(int(n_rows)).cast("long").alias("n_rows"),
                # a zero-row batch aggregates over an empty frame: every SUM
                # is NULL, not just __psi — coalesce all three so the report
                # schema stays non-null longs/doubles
                F.coalesce(F.col("n_bins"), F.lit(0)).cast("long").alias("n_bins"),
                F.coalesce(F.col("n_bins_skipped"), F.lit(0)).cast("long").alias("n_bins_skipped"),
                F.coalesce(F.col("__psi"), F.lit(0.0)).alias("psi"),
            )
        )
        TxTable(report_dir).write(rep, mode="append", txn_app=app_id, txn_batch=int(batch_id))

    return _sink
