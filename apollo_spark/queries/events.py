"""Events tier: apollo-semantics DSL queries + time-series ops.

Mechanically split from the single-file registry (round 8); content unchanged.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apollo_spark.ops.cache import carry_caches, scoped_persist
from apollo_spark.ops.dedup import exact_dedup, minhash_lsh_pairs
from apollo_spark.ops.relational import asof_join
from apollo_spark.ops.similarity import cosine
from apollo_spark.ops.text import STOPWORDS, fingerprint, language_id, quality_score, token_count
from apollo_spark.queries._shared import _events, _t, _ts_micros, _ts_seconds, dsum


# --------------------------------------------------------------------------
# events tier (apollo-semantics DSL + time-series ops)
# --------------------------------------------------------------------------

EVENTS_DSL = """
query events_etl {
  chain = "ethereum"
  source_table = "events"
  transform {
    kind = upper(event_type)
    magnitude = abs(value)
    bucket = value < 0 ? "neg" : (value < 100 ? "small" : "large")
  }
  filter = [
    value != 0
  ]
  save {
    event_id = event_id
    user_id = user_id
    kind = kind
    magnitude = magnitude
    bucket = bucket
  }
}
"""


def events_etl_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's extract->transform->filter->save semantics executed by
    our HCL pipeline compiler over a landed table (SURVEY §2.2-2.3)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events.ts
    schema = parse_schema(EVENTS_DSL)
    catalog = Catalog(spark, sf_dir)
    df = compile_query(spark, catalog, schema.queries[0], schema)
    return df.withColumn("magnitude", F.round("magnitude", 6)).orderBy("event_id")


ORACLE_EVENTS_DSL = """
SELECT event_id, user_id, upper(event_type) AS kind,
       ROUND(abs(value), 6) AS magnitude,
       CASE WHEN value < 0 THEN 'neg' WHEN value < 100 THEN 'small' ELSE 'large' END AS bucket
FROM events
WHERE value <> 0
ORDER BY event_id
"""


EVENTS_DSL_WINDOW = """
query events_windowed {
  chain = "ethereum"
  source_table = "events"
  filter = [
    event_type == "purchase"
  ]
  window {
    partition_by = [user_id]
    order_by = [event_id]
    running_total = sum(value)
    seq = row_number()
    prev_value = lag(value)
  }
  save {
    event_id = event_id
    user_id = user_id
    value = value
    running_total = running_total
    seq = seq
    prev_value = prev_value
  }
  sort = [event_id]
}
"""


def events_dsl_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 `window` DSL block: per-user running total, sequence number and
    previous value as ONE declarative block — the analytic-function tier
    the reference delegates to Postgres (SURVEY §0), here compiled to a
    single shared Window spec (one shuffle on the partition keys for all
    three columns). Aggregates ride the running frame; ranking/offset
    functions get the bare ordered window."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = parse_schema(EVENTS_DSL_WINDOW)
    return compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema)


ORACLE_EVENTS_DSL_WINDOW = """
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS DECIMAL(38,6)))
              OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING)
            AS DOUBLE) AS running_total,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS INTEGER) AS seq,
       LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
FROM events
WHERE event_type = 'purchase'
ORDER BY event_id
"""


EVENTS_DSL_AGG = """
query events_agg {
  chain = "ethereum"
  source_table = "events"
  transform {
    v = abs(value)
  }
  filter = [
    value != 0
  ]
  aggregate {
    group_by = [event_type]
    n = count()
    total = sum(v)
    max_v = max(v)
    having = [n > 10]
  }
  sort = [event_type]
}
"""


def events_dsl_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 `aggregate` DSL block (group_by/having/sort) — the relational tier
    apollo left on its roadmap (ROADMAP.md:77), one declarative block here."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = parse_schema(EVENTS_DSL_AGG)
    return compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema)


ORACLE_EVENTS_DSL_AGG = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(abs(value) AS DECIMAL(38,6))) AS DOUBLE) AS total,
       MAX(abs(value)) AS max_v
FROM events WHERE value <> 0
GROUP BY event_type HAVING COUNT(*) > 10 ORDER BY event_type
"""


EVENTS_DSL_SAMPLE = """
query sampled_event_stats {
  chain = "ethereum"
  source_table = "events"
  sample {
    key = "event_id"
    denominator = 4
    salt = "s"
  }
  aggregate {
    group_by = [event_type]
    n = count()
    total = sum(value)
  }
  sort = [event_type]
}
"""


def events_dsl_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 `sample` DSL block: deterministic coordinated hash-rate sampling
    (ops/sketch.py::hash_sample) as a declarative pipeline stage — the 1/4
    survivor set is reproducible engine-to-engine, so the downstream
    aggregate hash-gates exactly against the SQL replay of the same
    predicate (TABLESAMPLE could never do that)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = parse_schema(EVENTS_DSL_SAMPLE)
    return compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema)


ORACLE_EVENTS_DSL_SAMPLE = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM events
WHERE ('0x' || substr(md5('s' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 4 = 0
GROUP BY event_type ORDER BY event_type
"""


EVENTS_DSL_JOIN = """
query events_by_segment {
  chain = "ethereum"
  source_table = "events"
  join customer {
    left_on = "user_id"
    right_on = "c_custkey"
    broadcast = true
    select = ["c_mktsegment"]
  }
  filter = [
    event_type == "purchase"
  ]
  aggregate {
    group_by = [c_mktsegment]
    n = count()
    revenue = sum(value)
  }
  sort = [desc(revenue), c_mktsegment]
}
"""


def events_dsl_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 `join` DSL block: broadcast dim join (customer) + aggregate —
    apollo has no joins at all (SURVEY §2.7)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = parse_schema(EVENTS_DSL_JOIN)
    return compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema)


ORACLE_EVENTS_DSL_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE event_type = 'purchase'
GROUP BY c_mktsegment ORDER BY revenue DESC, c_mktsegment
"""


EVENTS_DSL_SQL = """
function norm_value {
  params = ["x"]
  expr = abs(x) / 100
}
query events_sql {
  chain = "ethereum"
  source_sql = "SELECT event_id, event_type, value FROM events WHERE value <> 0"
  save {
    event_id = event_id
    event_type = event_type
    nv = norm_value(value)
  }
}
"""


def events_dsl_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_sql source + user-defined function (both apollo roadmap items)
    through the full DSL tail."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = parse_schema(EVENTS_DSL_SQL)
    return compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema).orderBy("event_id")


ORACLE_EVENTS_DSL_SQL = """
SELECT event_id, event_type, abs(value) / 100 AS nv
FROM events WHERE value <> 0 ORDER BY event_id
"""


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    hour = F.date_format(F.date_trunc("hour", F.timestamp_micros(_ts_micros())), "yyyy-MM-dd HH:mm:ss")
    return (
        e.groupBy(hour.alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
        .orderBy("hour", "event_type")
    )


ORACLE_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands): new session when a user is idle
    > 1800 s. Two stacked windows on one user_id shuffle; integer-second
    arithmetic keeps the gap compare exact."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts_s").asc(), F.col("event_id").asc())
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    base = e.select("event_id", "user_id", _ts_seconds().alias("ts_s"))
    prev = F.lag("ts_s").over(w)
    is_new = (prev.isNull() | ((F.col("ts_s") - prev) > 1800)).cast("int")
    return (
        base.withColumn("session_id", F.sum(is_new).over(wrun))
        .select("user_id", "event_id", "ts_s", "session_id")
        .orderBy("user_id", "ts_s", "event_id")
    )


ORACLE_SESSIONS = """
WITH base AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_s,
         CASE WHEN LAG(ts_s) OVER w IS NULL OR ts_s - LAG(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC)
)
SELECT user_id, event_id, ts_s,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM flagged ORDER BY user_id, ts_s, event_id
"""


EVENTS_DSL_LOOP = """
loop {
  items = ["click", "purchase"]
  query per_type_etl {
    chain = "ethereum"
    source_table = "events"
    transform {
      t = upper(item)
    }
    filter = [
      event_type == item
    ]
    save {
      event_id = event_id
      t = t
      value = value
    }
  }
}
"""


def events_dsl_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 `loop` semantics: macro-expansion binds `item` per element and the
    per-item pipelines union under one query name (test/schema.hcl:1-25,
    dsl/schema.go:427-442)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_schema
    from apollo_spark.sources.tables import Catalog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = parse_schema(EVENTS_DSL_LOOP)
    out = compile_schema(spark, Catalog(spark, sf_dir), schema)
    return out["per_type_etl"].orderBy("event_id")


ORACLE_EVENTS_DSL_LOOP = """
SELECT event_id, upper(event_type) AS t, value
FROM events WHERE event_type IN ('click', 'purchase')
ORDER BY event_id
"""


def term_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics: per-term document frequency + IDF, top 20.
    explode(distinct terms) -> one groupBy shuffle; at 100 TB add a
    map-side partial agg (free) and a hot-term cap."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    ex = (
        d.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.explode(F.array_distinct(toks)).alias("term"))
    )
    return (
        ex.groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .withColumn("idf", F.round(F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 6))
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(20)
    )


ORACLE_TERM_DF = r"""
WITH ex AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
  FROM documents WHERE length(trim(text)) > 0
)
SELECT term, COUNT(*) AS doc_freq,
       ROUND(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / COUNT(*)), 6) AS idf
FROM ex GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 20
"""


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row trailing moving average of event value per user (window frame
    ROWS 4 PRECEDING..CURRENT). Decimal-exact numerator so the average is
    summation-order-independent; one shuffle on user_id."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts_s").asc(), F.col("event_id").asc()).rowsBetween(-4, 0)
    base = e.select("event_id", "user_id", _ts_seconds().alias("ts_s"), "value")
    return (
        base.withColumn(
            "mavg",
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w),
                6,
            ),
        )
        .select("user_id", "event_id", "ts_s", "mavg")
        .orderBy("user_id", "ts_s", "event_id")
    )


ORACLE_MOVING_AVG = """
WITH base AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s, value FROM events
)
SELECT user_id, event_id, ts_s,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS mavg
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts_s, event_id
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per event_type: each event is
    scored against the exact-decimal sum/sumsq of the PREVIOUS 20 events
    (ROWS 20 PRECEDING..1 PRECEDING — the trailing baseline never includes
    the point under test), flagging |z| > 2.5 with >= 10 history rows.
    Mean/variance derive from order-independent DECIMAL(38,6) frame sums,
    so the float z-scores are engine-identical. One shuffle on event_type;
    at 100 TB the same plan partitions by (series, day-bucket) to bound
    the per-partition sort."""
    e = _events(spark, sf_dir)
    base = e.select("event_id", "event_type", _ts_micros().alias("ts_us"), "value")
    # Trailing-frame sums via PREFIX sums + two lags instead of a sliding
    # ROWS -20..-1 frame: Spark re-evaluates sliding-frame aggregates per
    # row (O(frame*N) decimal adds), while an UNBOUNDED PRECEDING frame is
    # incremental (O(N)) — measured 12.5s -> ~3s at sf0.1 on the ~5-way
    # event_type parallelism. DECIMAL prefix sums are exact, so the
    # subtraction cancels losslessly and the z-scores are bit-identical to
    # the sliding formulation — the oracle keeps the naive sliding frame,
    # so the gate also proves the two formulations equivalent.
    ord_w = Window.partitionBy("event_type").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    cum_w = ord_w.rowsBetween(Window.unboundedPreceding, 0)
    zero = F.lit(0).cast("decimal(38,6)")
    c1 = F.sum(F.col("value").cast("decimal(38,6)")).over(cum_w)
    c2 = F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)")).over(cum_w)
    rn = F.row_number().over(ord_w)
    pre = base.select(
        "event_id",
        "event_type",
        "value",
        (F.coalesce(F.lag(c1, 1).over(ord_w), zero) - F.coalesce(F.lag(c1, 21).over(ord_w), zero))
        .cast("double")
        .alias("__s1"),
        (F.coalesce(F.lag(c2, 1).over(ord_w), zero) - F.coalesce(F.lag(c2, 21).over(ord_w), zero))
        .cast("double")
        .alias("__s2"),
        F.least(rn - 1, F.lit(20)).cast("long").alias("__n"),
    )
    mean = F.col("__s1") / F.col("__n")
    var = F.col("__s2") / F.col("__n") - mean * mean
    # a zero-variance trailing window (a run of identical values — present in
    # the corpus from sf1 up) has no measurable anomaly: z undefined -> NULL
    # -> dropped by the |z| filter. Without the guard ANSI mode aborts the
    # whole query on the first flat window.
    z = F.when(var > 0, (F.col("value") - mean) / F.sqrt(var))
    return (
        pre.withColumn("__z", z)
        .filter((F.col("__n") >= 10) & (F.abs(F.col("__z")) > 2.5))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("__z", 4).alias("zscore"),
        )
        .orderBy("event_id")
    )


ORACLE_ANOMALY_Z = """
WITH base AS (
  SELECT event_id, event_type, epoch_us(ts) AS ts_us, value FROM events
),
st AS (
  SELECT event_id, event_type, value,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2,
         COUNT(*) OVER w AS n
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us ASC, event_id ASC
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_id, event_type, value,
         CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0
              THEN (value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)) END AS z, n
  FROM st
)
SELECT event_id, event_type, value, ROUND(z, 4) AS zscore
FROM z WHERE n >= 10 AND abs(z) > 2.5
ORDER BY event_id
"""


TS_PATTERN = [100.0, 80.0, 60.0, 40.0, 20.0, 40.0, 60.0, 80.0]  # V-shape motif


def ts_window_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (EDBT'19-style): euclidean distance of
    every 8-event sliding window per user against a broadcast query pattern,
    global top-20. All JVM-side: collect_list window frame + zip_with/
    aggregate fold — sequential adds, so distances match the SQL oracle
    bit-for-bit. One shuffle on user_id + one top-k reduction."""
    e = _events(spark, sf_dir)
    L = len(TS_PATTERN)
    w = Window.partitionBy("user_id").orderBy(F.col("ts_s").asc(), F.col("event_id").asc()).rowsBetween(0, L - 1)
    base = e.select("event_id", "user_id", _ts_seconds().alias("ts_s"), "value")
    pat = F.array(*[F.lit(v) for v in TS_PATTERN])
    win = base.withColumn("win", F.collect_list("value").over(w)).filter(F.size("win") == L)
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("win", pat, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        win.select("user_id", F.col("event_id").alias("start_event_id"), F.round(dist, 6).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col("user_id").asc(), F.col("start_event_id").asc())
        .limit(20)
    )


ORACLE_TS_MOTIFS = """
WITH base AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s, value FROM events
),
win AS (
  SELECT user_id, event_id AS start_event_id,
         list(value) OVER (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC
                           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
  FROM base
)
SELECT user_id, start_event_id,
       ROUND(sqrt(list_sum(list_transform(generate_series(1, 8),
             i -> (w[i] - ([100.0, 80.0, 60.0, 40.0, 20.0, 40.0, 60.0, 80.0])[i])
                * (w[i] - ([100.0, 80.0, 60.0, 40.0, 20.0, 40.0, 60.0, 80.0])[i])))), 6) AS dist
FROM win WHERE len(w) = 8
ORDER BY dist ASC, user_id ASC, start_event_id ASC LIMIT 20
"""


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass —
    Catalyst expands then aggregates once, vs 4 separate scans. Null group
    cells are coalesced to 'ALL' on both sides so the hash compare never
    depends on engine null-sort order."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


ORACLE_ORDERS_CUBE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def median_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90) of l_quantity per return
    flag. Quantities are integral doubles, so the linear interpolation lands
    on .0/.5 exactly — bit-identical across engines, unlike percentiles of
    arbitrary floats."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("p50_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_MEDIAN_QTY = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def clickers_not_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT): users who clicked but made no purchase on or
    after 2024-01-28 (the synthetic corpus is dense — every user does every
    event type, so the raw difference is empty; the cutoff makes the gate
    non-trivial). Compiles to a null-safe left-anti aggregate — one shuffle
    on user_id. Cutoff compared in integer epoch seconds (ts is nanos)."""
    e = _events(spark, sf_dir)
    cutoff_s = 1706400000  # 2024-01-28T00:00:00Z
    clickers = e.filter(F.col("event_type") == "click").select("user_id")
    buyers = e.filter((F.col("event_type") == "purchase") & (_ts_seconds() >= cutoff_s)).select("user_id")
    return clickers.subtract(buyers).orderBy("user_id")


ORACLE_EXCEPT = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND epoch_ns(ts) // 1000000000 >= 1706400000
ORDER BY user_id
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the events.props JSON column with a
    declared schema (from_json stays in codegen — no Python, no UDF) and
    aggregate the extracted field per event type. Integer sums are exact in
    both engines, so no decimal detour is needed."""
    e = _events(spark, sf_dir)
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


ORACLE_JSON_PROPS = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def docs_by_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus quality rollup — the provenance view a training-data
    pipeline filters on: doc counts, exact char totals, and language purity
    (share of docs whose tagged lang is the corpus-dominant 'en')."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("en_docs"),
        )
        .orderBy("source")
    )


ORACLE_SOURCE_QUALITY = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en_docs
FROM documents
GROUP BY source
ORDER BY source
"""


def purchases_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior-or-equal
    click (backward inclusive). Single shuffle on user_id (union+window)."""
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", _ts_seconds().alias("ts_s")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", _ts_seconds().alias("ts_s"))
        .agg(F.max("event_id").alias("click_id"), F.round(F.max("value"), 6).alias("click_value"))
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts_s",
        right_ts="ts_s",
        value_cols=["click_id", "click_value"],
    )
    return out.select("event_id", "user_id", "click_id", "click_value").orderBy("event_id")


ORACLE_ASOF = """
WITH clicks AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         MAX(event_id) AS click_id, ROUND(MAX(value), 6) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
)
SELECT p.event_id, p.user_id,
       (SELECT c.click_id FROM clicks c
        WHERE c.user_id = p.user_id AND c.ts_s <= CAST(floor(epoch(p.ts)) AS BIGINT)
        ORDER BY c.ts_s DESC LIMIT 1) AS click_id,
       (SELECT c.click_value FROM clicks c
        WHERE c.user_id = p.user_id AND c.ts_s <= CAST(floor(epoch(p.ts)) AS BIGINT)
        ORDER BY c.ts_s DESC LIMIT 1) AS click_value
FROM events p WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


