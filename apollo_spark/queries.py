"""Headline query suite over the driver's testdata tables.

Every entry here has BOTH a Spark implementation (`QUERIES[name]`, callable
(spark, sf_dir) -> DataFrame) and, where SQL can express the op, a DuckDB
oracle (`ORACLES[name]`) — the per-round correctness gate runs them
side-by-side and hash-compares values (BASELINE.md t2).

Hash-stability policy (floats are hashed bit-for-bit after rounding):
* sums/avgs go through DECIMAL(38,6) so addition is exact and
  order-independent, then cast to double — identical in both engines;
* per-row doubles are rounded to a fixed number of decimals in BOTH
  implementations;
* every output column is explicitly aliased identically on both sides;
* orderings that feed LIMIT/top-k carry a full deterministic tie-break.
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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_ts_nanos(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to epoch-nanosecond BIGINT no matter how
    the parquet writer encoded it (the driver has shipped both):

    * ``timestamp[us]`` read as TIMESTAMP_NTZ — measured against an NTZ epoch
      literal via ``timestampdiff``, so the result is independent of
      ``spark.sql.session.timeZone`` and matches DuckDB ``epoch_ns()`` on the
      same naive values bit-for-bit;
    * TIMESTAMP (tz-adjusted) — ``unix_micros`` (already tz-independent);
    * BIGINT — parquet TIMESTAMP(NANOS) read under
      ``spark.sql.legacy.parquet.nanosAsLong``; already epoch nanos.

    Downstream arithmetic stays integer (``div``): a double round-trip would
    lose precision above 2^53 ns.
    """
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    t = df.schema[col].dataType
    if isinstance(t, LongType):
        return df
    if isinstance(t, TimestampNTZType):
        micros = F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    elif isinstance(t, TimestampType):
        micros = F.unix_micros(F.col(col))
    else:
        raise TypeError(f"events.{col}: expected timestamp or long, got {t}")
    return df.withColumn(col, micros * F.lit(1000))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with ``ts`` normalized to epoch-nanos BIGINT (see
    normalize_ts_nanos). The legacy conf is set defensively so a
    TIMESTAMP(NANOS)-annotated file reads as long instead of erroring; it is
    a no-op for the current timestamp[us] encoding. Session tz is pinned UTC
    so tz-sensitive formatting (date_trunc/date_format) matches the DuckDB
    oracle's naive-timestamp semantics even when the driver built the session
    without our factory."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_ts_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _ts_seconds() -> F.Column:
    return F.expr("ts div 1000000000")


def _ts_micros() -> F.Column:
    return F.expr("ts div 1000")


def dsum(col) -> F.Column:
    """Order-independent exact sum: decimal(38,6) accumulate, double out."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def davg(col, cnt) -> F.Column:
    return dsum(col) / cnt


# --------------------------------------------------------------------------
# TPC-H-flavored relational tier
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-agg. Catalyst gives partial (map-side)
    aggregation; the shuffle carries only 4 group keys x partials."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / n).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
            (dsum(F.col("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10. customer is the small side
    -> broadcast; orders/lineitem shuffle on the join key once."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


ORACLE_Q3 = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; all dims broadcast, facts shuffle once."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), (l["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


ORACLE_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg — pushdown showcase (explain
    shows PushedFilters on l_shipdate/l_discount/l_quantity)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


ORACLE_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
"""


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k: rank customers by acctbal within nation (single shuffle
    on nationkey; row_number prunes map-side under AQE)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .select("n_name", "rank", "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("n_name", "rank")
    )


ORACLE_TOP_CUSTOMERS = """
SELECT n_name, rank, c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
  FROM customer
) ranked
JOIN nation ON c_nationkey = n_nationkey
WHERE rank <= 3
ORDER BY n_name, rank
"""


def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + agg incl. customers with no orders (coalesce to 0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("total_spend")
    )
    return (
        c.join(agg, c["c_custkey"] == agg["o_custkey"], "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("total_spend", F.lit(0.0)), 2).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


ORACLE_CUSTOMER_ORDER_STATS = """
SELECT c_custkey, c_mktsegment,
       COALESCE(n_orders, 0) AS n_orders,
       ROUND(COALESCE(total_spend, 0.0), 2) AS total_spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
) s ON c_custkey = o_custkey
ORDER BY c_custkey
"""


def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    cnt = F.count(F.lit(1))
    return (
        p.groupBy("p_brand")
        .agg(
            cnt.alias("n_parts"),
            (dsum(F.col("p_retailprice")) / cnt).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("p_brand")
    )


ORACLE_PART_BRAND = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       MAX(p_size) AS max_size
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def supplied_not_ordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op tier: parts present in the catalog but never shipped
    (left_anti == NOT EXISTS)."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    return p.join(l, p["p_partkey"] == l["l_partkey"], "left_anti").select("p_partkey", "p_brand").orderBy("p_partkey")


ORACLE_ANTI_PARTS = """
SELECT p_partkey, p_brand FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
ORDER BY p_partkey
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: conditional aggregation over a fact-dim join (part
    side broadcast by AQE/stats). Single-row global aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                (F.lit(100.0) * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast("decimal(38,6)"))).cast("double"))
                / F.sum(rev).cast("double"),
                6,
            ).alias("economy_share")
        )
    )


ORACLE_PROMO_SHARE = """
SELECT ROUND(
  100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                        ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS economy_share
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: IN-subquery with HAVING -> groupBy + filter + join
    back to orders (one shuffle on l_orderkey, order keys then broadcast)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy("o_orderkey")
    )


ORACLE_LARGE_ORDERS = """
SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_custkey, o_orderdate, o_totalprice
HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 200
ORDER BY o_orderkey
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: correlated scalar subquery (per-part avg quantity)
    as aggregate + self-join. Comparison uses the exact integer identity
    2*cnt*qty < sum_qty, avoiding FP-average boundary flips vs the oracle."""
    l = _t(spark, sf_dir, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        l.join(per_part, l["l_partkey"] == per_part["pk"])
        .filter(F.col("l_quantity") * 2 * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / 7.0, 2).alias("avg_yearly")
        )
    )


ORACLE_SMALL_QTY = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN (
  SELECT l_partkey AS pk, SUM(l_quantity) AS sq, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
) t ON l.l_partkey = t.pk
WHERE l.l_quantity * 2 * t.cnt < t.sq
"""


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape (no partsupp table in this corpus): correlated MIN —
    suppliers whose observed unit price equals the part's global minimum.
    MIN is order-independent and per-row division is deterministic IEEE, so
    the double equality against the oracle is exact."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    mins = l.groupBy(F.col("l_partkey").alias("pk")).agg(F.min("unit_price").alias("min_price"))
    return (
        l.join(mins, (l["l_partkey"] == mins["pk"]) & (l["unit_price"] == mins["min_price"]))
        .select("l_partkey", "l_suppkey", F.col("min_price").alias("min_unit_price"))
        .dropDuplicates(["l_partkey", "l_suppkey"])
        .orderBy("l_partkey", "l_suppkey")
    )


ORACLE_CHEAPEST_SUPP = """
WITH up AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price FROM lineitem
),
mins AS (SELECT l_partkey AS pk, MIN(unit_price) AS min_price FROM up GROUP BY 1)
SELECT DISTINCT l_partkey, l_suppkey, min_price AS min_unit_price
FROM up JOIN mins ON l_partkey = pk AND unit_price = min_price
ORDER BY l_partkey, l_suppkey
"""


def order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape (no l_commitdate in this corpus): EXISTS correlated
    subquery -> LEFT SEMI join with a non-equi residual (shipped >60 days
    after order date). The semi join shuffles on orderkey only once and
    never materializes the |O|x|L| match set; counts then group on the
    5-value priority column (map-side partials)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l["l_orderkey"] == o["o_orderkey"]) & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q4_SEMI = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: LEFT OUTER join with a join-level (not WHERE-level)
    predicate, then a two-level aggregation into an order-count histogram.
    COUNT(o_orderkey) counts only matched rows — null-preserving outer-join
    semantics the WHERE clause would destroy."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_Q13_DIST = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: OR-of-conjuncts over both join sides. Catalyst
    extracts the common subexpressions pushable to each scan (p_size >= 1,
    l_quantity bounds) and keeps the residual disjunction as a post-join
    filter; part is broadcast so the lineitem scan never shuffles."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    clause = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25)) & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35)) & (F.col("l_quantity").between(20, 30)))
    )
    return j.filter(clause).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("matched_lines"),
    )


ORACLE_Q19_DISJ = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS matched_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: uncorrelated scalar AVG subquery (decimal-exact, so
    the > comparison lands identically in both engines) + NOT EXISTS as a
    LEFT ANTI join against recent orders, grouped by nation. The 1-row
    average is broadcast via crossJoin — no driver collect."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("nationkey")
    )


ORACLE_Q22_IDLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY nationkey
"""


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: 5-way join threading lineitem->orders->customer and
    lineitem->supplier into TWO aliases of nation (supplier side / customer
    side), symmetric country-pair filter, revenue by (pair, ship year).
    Both nation copies broadcast; the only shuffles are the two fact joins."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_Q7_TRADE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: returned-revenue top-20 customers — 3 fact/dim joins
    + group-agg + deterministic top-k (revenue is decimal-derived, ties
    broken on c_custkey, so the LIMIT frontier matches the oracle exactly).
    Spark plans the final step as TakeOrderedAndProject — no full sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_Q10_RETURNS = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def embedding_label_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label z-score of vector norms. Variance via the decimal-exact
    identity E[x^2] - E[x]^2 (decimal(38,6) sums) instead of Welford
    stddev, whose result depends on accumulation order across partitions."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v * v,
            )
        ).alias("norm"),
    )
    stats = e.groupBy(F.col("label").alias("lb")).agg(
        (dsum(F.col("norm")) / F.count(F.lit(1))).alias("mean"),
        F.sqrt(
            dsum(F.col("norm") * F.col("norm")) / F.count(F.lit(1))
            - (dsum(F.col("norm")) / F.count(F.lit(1))) * (dsum(F.col("norm")) / F.count(F.lit(1)))
        ).alias("std"),
    )
    return (
        e.join(F.broadcast(stats), e["label"] == stats["lb"])
        .select(
            "vec_id",
            "label",
            F.when(F.col("std") > 0, (F.col("norm") - F.col("mean")) / F.col("std")).otherwise(F.lit(0.0)).alias("z"),
        )
        .orderBy("vec_id")
    )


ORACLE_EMB_ZSCORE = """
WITH e AS (
  SELECT vec_id, label, sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
),
stats AS (
  SELECT label AS lb,
         CAST(SUM(CAST(norm AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mean,
         sqrt(CAST(SUM(CAST(norm * norm AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
              - (CAST(SUM(CAST(norm AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
                * (CAST(SUM(CAST(norm AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))) AS std
  FROM e GROUP BY 1
)
SELECT vec_id, label, CASE WHEN std > 0 THEN (norm - mean) / std ELSE 0.0 END AS z
FROM e JOIN stats ON label = lb
ORDER BY vec_id
"""


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


# --------------------------------------------------------------------------
# LLM-data tier: dedup / text analysis / similarity
# --------------------------------------------------------------------------


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d).select("doc_id").orderBy("doc_id")


ORACLE_DEDUP_EXACT = r"""
SELECT doc_id FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           ORDER BY doc_id ASC
         ) AS rn
  FROM documents
) t WHERE rn = 1 ORDER BY doc_id
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


ORACLE_FINGERPRINTS = r"""
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
FROM documents ORDER BY doc_id
"""


def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("double")
    alpha = F.length(F.regexp_replace(F.lower("text"), r"[^a-z]", "")).cast("double")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(F.when(n_chars > 0, alpha / n_chars).otherwise(0.0), 6).alias("alpha_ratio"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    ).orderBy("doc_id")


def _sql_toks() -> str:
    return r"regexp_split_to_array(trim(lower(text)), '\s+')"


def _sql_hits(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_sql_toks()}, x -> list_contains([{arr}], x)))"


# The composite quality formula and its four stat inputs, factored ONCE so
# the three oracles that score quality (ORACLE_TEXT_STATS,
# ORACLE_QUALITY_FILTER, ORACLE_QUALITY_FILTER_TRAINED) can never drift
# apart — the same discipline as _LANGID_SCORER_SQL (round-6 ADVICE).
_SQL_QUALITY_EXPR = """ROUND(
         0.3 * (CASE WHEN n_tok >= 5 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END)
       + 0.2 * (CASE WHEN mwl >= 3 AND mwl <= 12 THEN 1.0 ELSE 0.0 END)
       + 0.3 * LEAST(ar * 1.25, 1.0)
       + 0.2 * LEAST(swr * 5.0, 1.0), 6)"""


def _sql_quality_stat_cols() -> str:
    """n_tok / mwl / ar / swr column definitions (documents-table scope)."""
    n_tok = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_sql_toks()}) END"
    return f"""{n_tok} AS n_tok,
           CASE WHEN ({n_tok}) > 0
                THEN CAST(length(text) AS DOUBLE) / ({n_tok})
                ELSE 0.0 END AS mwl,
           CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text)
                ELSE 0.0 END AS ar,
           CASE WHEN ({n_tok}) > 0
                THEN CAST({_sql_hits('en')} AS DOUBLE) / ({n_tok})
                ELSE 0.0 END AS swr"""


ORACLE_TEXT_STATS = rf"""
SELECT doc_id,
       n_tok AS n_tokens,
       length(text) AS n_chars,
       ROUND(ar, 6) AS alpha_ratio,
       {_SQL_QUALITY_EXPR} AS quality
FROM (
  SELECT doc_id, text,
         {_sql_quality_stat_cols()}
  FROM documents
) base
ORDER BY doc_id
"""


def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", language_id(F.col("text")).alias("pred_lang")).orderBy("doc_id")


# the heuristic scorer SELECT, factored once so ORACLE_LANG_ID and the
# heuristic confusion matrix compose from the SAME text and can never
# drift (no string surgery on a finished query)
_LANGID_SCORER_SQL = rf"""
SELECT doc_id, lang,
       CASE
         WHEN h_en = best AND best > 0 THEN 'en'
         WHEN h_de = best AND best > 0 THEN 'de'
         WHEN h_fr = best AND best > 0 THEN 'fr'
         WHEN h_es = best AND best > 0 THEN 'es'
         ELSE 'unknown'
       END AS pred_lang
FROM (
  SELECT doc_id, lang,
         {_sql_hits('en')} AS h_en, {_sql_hits('de')} AS h_de,
         {_sql_hits('fr')} AS h_fr, {_sql_hits('es')} AS h_es,
         GREATEST({_sql_hits('en')}, {_sql_hits('de')}, {_sql_hits('fr')}, {_sql_hits('es')}) AS best
  FROM documents
) h
"""

ORACLE_LANG_ID = _LANGID_SCORER_SQL + "ORDER BY doc_id\n"


def _confusion_from_preds(d: DataFrame, preds: DataFrame) -> DataFrame:
    """Shared confusion-matrix aggregation: per (gold, pred) cell count,
    the cell's share of its gold row, and the correctness flag — one
    groupBy over a per-doc prediction frame."""
    p = d.select("doc_id", F.col("lang").alias("gold")).join(preds, "doc_id")
    m = p.groupBy("gold", "pred").agg(F.count(F.lit(1)).alias("n"))
    t = m.groupBy("gold").agg(F.sum("n").alias("__n_gold"))
    return (
        m.join(t, "gold")
        .select(
            "gold",
            "pred",
            "n",
            (F.col("n").cast("double") / F.col("__n_gold").cast("double")).alias(
                "share_of_gold"
            ),
            (F.col("gold") == F.col("pred")).alias("correct"),
        )
        .orderBy("gold", "pred")
    )


_SQL_CONFUSION_TAIL = """
m AS (SELECT gold, pred, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
t AS (SELECT gold, SUM(n) AS n_gold FROM m GROUP BY gold)
SELECT m.gold, m.pred, m.n,
       CAST(m.n AS DOUBLE) / CAST(t.n_gold AS DOUBLE) AS share_of_gold,
       m.gold = m.pred AS correct
FROM m JOIN t USING (gold)
ORDER BY gold, pred"""


def langid_heuristic_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the STOPWORD-HEURISTIC language ID against the
    corpus's gold lang labels — the evaluate-your-own-classifier tier. On
    the driver's synthetic corpus the verdict is honest and unflattering:
    the word-soup text skews every gold label toward 'en' or 'unknown'
    (en recall ~0.73, everything else 0.0) — which is precisely the report
    that motivated replacing the heuristic with the TRAINED classifier
    (langid_confusion_matrix) as the pipeline default in round 7. The
    oracle composes the factored _LANGID_SCORER_SQL, so heuristic scorer
    and confusion can never drift apart."""
    d = _t(spark, sf_dir, "documents")
    preds = d.select("doc_id", language_id(F.col("text")).alias("pred"))
    return _confusion_from_preds(d, preds)


ORACLE_LANGID_HEURISTIC_CONFUSION = (
    "WITH p AS (SELECT lang AS gold, pred_lang AS pred FROM ("
    + _LANGID_SCORER_SQL
    + ")),"
    + _SQL_CONFUSION_TAIL
)


# ---------------------------------------------------------------------------
# Trained language ID (round 7): joint one-vs-rest batch perceptron over
# hashed token-trigram features, trained IN-ENGINE on the corpus's labeled
# slice (ops.text.language_id_model / trained_language_id). Replaces the
# stopword heuristic as the pipeline default — the heuristic's confusion
# matrix on this corpus is documented unusable (langid_heuristic_confusion).
# The oracle replays the full 7-round BIGINT training trajectory by
# unrolled SQL, same lattice discipline as the binary perceptron queries.
# ---------------------------------------------------------------------------

LANGID_BUCKETS = 4096
LANGID_ITERS = 7


def _trained_langid_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-doc (doc_id, pred_lang) from the trained classifier,
    consumed by doc_language_id_trained / langid_confusion_matrix /
    doc_quality_filter_trained. When APOLLO_SPARK_ARTIFACT_DIR is set
    (bench / production), the weight table is trained ONCE and persisted
    as a TxTable (ops.text.train_or_load_langid_model) AND the per-doc
    prediction table itself is committed once
    (table_format.train_or_load_table) — the second and third consumers
    read one row per document instead of re-paying feature extraction +
    scoring (measured ~10 s per consumer at sf0.1; predictions ARE a
    materialized column in a production pipeline). Unset (the driver's
    gate), each query trains and scores self-contained so its oracle
    replays the full trajectory."""
    import os as _os

    from apollo_spark.ops.text import train_or_load_langid_model, trained_language_id

    d = _t(spark, sf_dir, "documents")
    art = _os.environ.get("APOLLO_SPARK_ARTIFACT_DIR")
    if not art:
        return trained_language_id(d, weights=train_or_load_langid_model(d, path=None))
    from apollo_spark.table_format import train_or_load_table

    tag = sf_dir.strip("/").replace("/", "_")

    def build():
        w = train_or_load_langid_model(d, path=f"{art}/langid_model_{tag}")
        return trained_language_id(d, weights=w)

    return train_or_load_table(spark, f"{art}/langid_preds_{tag}", build)


def _langid_trained_sql(iters: int = LANGID_ITERS, buckets: int = LANGID_BUCKETS) -> str:
    """WITH-clause prefix (no leading WITH) ending at ltpr = per-doc
    (doc_id, pred_lang) from the trained multiclass perceptron — the exact
    SQL mirror of ops.ml.hashed_ngram_features + multiclass_perceptron_train
    + multiclass_predict with n=3, shared by every trained-langid oracle."""
    rounds = []
    prev = "ltw0"
    for t in range(1, iters + 1):
        rounds.append(
            f"""ltm{t} AS (SELECT doc_id, cls, y, SUM(n * weight) AS wx FROM ltfx JOIN {prev} USING (cls, b) GROUP BY 1, 2, 3),
ltwr{t} AS (SELECT doc_id, cls FROM ltm{t} WHERE y * wx <= 0),
ltd{t} AS (SELECT cls, b, SUM(y * n) AS dw FROM ltfx JOIN ltwr{t} USING (doc_id, cls) GROUP BY 1, 2),
ltw{t} AS (SELECT {prev}.cls, {prev}.b, {prev}.weight + COALESCE(ltd{t}.dw, 0) AS weight FROM {prev} LEFT JOIN ltd{t} USING (cls, b))"""
        )
        prev = f"ltw{t}"
    joined = ",\n".join(rounds)
    return rf"""ltdoc AS (SELECT doc_id, lang, lower(text) AS text FROM documents),
ltcl AS (SELECT DISTINCT lang AS cls FROM ltdoc),
ltlab AS (SELECT ltdoc.doc_id, ltcl.cls, CASE WHEN ltdoc.lang = ltcl.cls THEN 1 ELSE -1 END AS y FROM ltdoc CROSS JOIN ltcl),
lttk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM ltdoc WHERE length(trim(text)) > 0),
ltgr AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ts) - 2, 0)), i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS g FROM lttk),
ltcnt AS (SELECT doc_id, CAST(('0x' || substr(md5('lid' || g), 1, 15))::BIGINT % {buckets} AS INT) AS b, COUNT(*) AS n FROM ltgr GROUP BY 1, 2),
ltfeat AS (SELECT * FROM ltcnt UNION ALL SELECT doc_id, {buckets} AS b, CAST(1 AS BIGINT) AS n FROM ltdoc),
ltfx AS (SELECT f.doc_id, l.cls, f.b, f.n, l.y FROM ltfeat f JOIN ltlab l USING (doc_id)),
ltw0 AS (SELECT DISTINCT cls, b, CAST(0 AS BIGINT) AS weight FROM ltfx),
{joined},
ltsc AS (SELECT f.doc_id, w.cls, SUM(f.n * w.weight) AS score FROM ltfeat f JOIN {prev} w ON f.b = w.b GROUP BY 1, 2),
ltpr AS (SELECT doc_id, cls AS pred_lang FROM (SELECT doc_id, cls, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn FROM ltsc) WHERE rn = 1)"""


def doc_language_id_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc language prediction from the IN-ENGINE-TRAINED classifier
    (ops.text.trained_language_id): 7 joint one-vs-rest batch-perceptron
    rounds over 4096 hashed token-trigram buckets + bias, argmax inference
    with a deterministic tie-break. Every weight is an exact BIGINT, so
    the full training trajectory hash-gates against the unrolled-SQL
    oracle. Honesty note: this corpus's text is statistically independent
    of the gold label (measured round 7 — per-lang token distributions
    converge as N grows), so the model demonstrably MEMORIZES the labeled
    slice (~96% train accuracy at sf0.01) rather than generalizing; on
    real text the same pipeline generalizes because the signal exists."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang")
        .join(_trained_langid_preds(spark, sf_dir), "doc_id")
        .orderBy("doc_id")
    )


ORACLE_LANGID_TRAINED = (
    "WITH "
    + _langid_trained_sql()
    + """
SELECT d.doc_id, d.lang, p.pred_lang
FROM ltdoc d JOIN ltpr p USING (doc_id)
ORDER BY doc_id"""
)


def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the TRAINED language-ID classifier
    (doc_language_id_trained) against the gold labels — diagonal-dominant
    at sf0.01 (~96% train accuracy), versus the heuristic's en/unknown
    collapse (langid_heuristic_confusion). This is the aggregate quality
    view a filtering pipeline consults before trusting the classifier at
    100 TB; it shares the per-doc scorer with doc_language_id_trained, so
    the two can never drift."""
    d = _t(spark, sf_dir, "documents")
    preds = _trained_langid_preds(spark, sf_dir).select("doc_id", F.col("pred_lang").alias("pred"))
    return _confusion_from_preds(d, preds)


ORACLE_LANGID_CONFUSION = (
    "WITH "
    + _langid_trained_sql()
    + """,
p AS (SELECT d.lang AS gold, pr.pred_lang AS pred FROM ltdoc d JOIN ltpr pr USING (doc_id)),"""
    + _SQL_CONFUSION_TAIL
)


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 3 probe vectors drawn from the corpus.
    Rank-only output + rounded score keeps the hash FP-stable."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    scored = e.crossJoin(F.broadcast(q)).withColumn("score", cosine(F.col("v"), F.col("qv")))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "vec_id", "rank", F.round("score", 4).alias("score"))
        .orderBy("q_id", "rank")
    )


ORACLE_KNN = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
scored AS (
  SELECT q.q_id, e.vec_id,
         list_dot_product(e.v, q.qv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS score
  FROM e CROSS JOIN q
),
ranked AS (
  SELECT q_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, rank, ROUND(score, 4) AS score
FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
"""


def matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval (Kusupati et al. 2022): recall@10 of
    cosine top-10 under prefix-truncated embeddings (dims 8/16/32) against
    the full 64-dim ground truth, averaged over a fixed 20-query probe set —
    the measurement that decides how small an ANN index's vectors can be.
    The dim=64 row is a built-in control (recall exactly 1.0). Eval tier:
    scoring is the round-7 Arrow path (ops.similarity.
    matryoshka_prefix_scores): probes broadcast, ONE float64 cumsum per
    (row, probe) yields every prefix dot at once, bit-identical to both
    the JVM aggregate-fold it replaced and DuckDB's list_dot_product
    (np.cumsum is forced sequential left-to-right — see its docstring;
    profiled 16-19 s of interpreted HOF cosine at sf1, round-6 verdict
    task 3). The per-(query, dim) top-10 selection rides
    ops.rank.top_k_per_key — the salted two-phase selection — so no window
    partition is ever corpus-sized (a plain (q_id, dim) window would sort
    N rows in ONE task per probe; round-5 verdict item 3). Row-identical to
    the plain window the oracle replays; IVF ops remain the serving path."""
    from apollo_spark.ops.rank import top_k_per_key
    from apollo_spark.ops.similarity import matryoshka_prefix_scores

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 20).select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    scored = matryoshka_prefix_scores(e, q, dims=[8, 16, 32, 64], vec_col="v")
    # top feeds four downstream consumers (truth, both semi-join sides, nq);
    # without the persist Spark re-runs the corpus-scoring stage and
    # the salted selection once per consumer (measured 18 s at sf1).
    # The scorer emits only (vec_id, q_id, dim, score) — the 64-double
    # vectors never enter the selection shuffle.
    top = (
        top_k_per_key(
            scored.select("q_id", "dim", "vec_id", "score"),
            ["q_id", "dim"],
            [F.col("score").desc(), F.col("vec_id").asc()],
            k=10,
            salt_col=F.crc32(F.col("vec_id").cast("string")),
        )
        .select("q_id", "dim", "vec_id")
        .persist()
    )
    truth = top.filter(F.col("dim") == 64).select("q_id", "vec_id")
    matched = top.join(truth, ["q_id", "vec_id"], "left_semi")
    nq = truth.select(F.countDistinct("q_id").alias("n_q"))
    # a dim whose recall is exactly 0 must still report a 0.0 row (observed
    # at sf1: rotated-replica noise drives dim=8 recall to zero and the
    # group vanished) — left-join the dims universe (the same literals the
    # scoring exploded; top-10 always exists per dim, so this is total)
    dims = spark.createDataFrame([(d,) for d in (8, 16, 32, 64)], "dim int")
    from apollo_spark.ops.cache import scoped_persist

    return scoped_persist(
        dims.join(
            matched.groupBy("dim").agg(F.count(F.lit(1)).cast("double").alias("n_hits")),
            "dim",
            "left",
        )
        .crossJoin(F.broadcast(nq))
        .select(
            "dim",
            (F.coalesce(F.col("n_hits"), F.lit(0.0)) / (F.lit(10.0) * F.col("n_q"))).alias(
                "mean_recall"
            ),
            F.col("n_q").cast("long").alias("n_queries"),
        )
        .orderBy("dim"),
        top,
    )


ORACLE_MATRYOSHKA = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
scored AS (
  SELECT q.q_id, e.vec_id, d.dim,
         list_dot_product(list_slice(e.v, 1, d.dim), list_slice(q.qv, 1, d.dim))
         / (sqrt(list_dot_product(list_slice(e.v, 1, d.dim), list_slice(e.v, 1, d.dim)))
            * sqrt(list_dot_product(list_slice(q.qv, 1, d.dim), list_slice(q.qv, 1, d.dim)))) AS score
  FROM e CROSS JOIN q, UNNEST([8, 16, 32, 64]) AS d(dim)
  WHERE e.vec_id != q.q_id
),
top AS (
  SELECT q_id, dim, vec_id FROM (
    SELECT q_id, dim, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id, dim ORDER BY score DESC, vec_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 10
),
truth AS (SELECT q_id, vec_id FROM top WHERE dim = 64),
matched AS (SELECT t.dim FROM top t JOIN truth USING (q_id, vec_id)),
counts AS (SELECT dim, CAST(COUNT(*) AS DOUBLE) AS n_hits FROM matched GROUP BY dim),
dims AS (SELECT DISTINCT dim FROM top),
nq AS (SELECT COUNT(DISTINCT q_id) AS n_q FROM truth)
SELECT CAST(dims.dim AS INT) AS dim,
       COALESCE(counts.n_hits, 0.0) / (10.0 * n_q) AS mean_recall,
       CAST(n_q AS BIGINT) AS n_queries
FROM dims LEFT JOIN counts ON counts.dim = dims.dim CROSS JOIN nq
ORDER BY dim
"""


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives (ops.similarity.hard_negatives):
    for each of 3 query vectors, the 5 most-cosine-similar vectors carrying
    a DIFFERENT label — the near-boundary negatives a contrastive loss
    wants. Broadcast queries, label-pruned before the top-k window."""
    from apollo_spark.ops.similarity import hard_negatives

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"), "label"
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("label").alias("q_label")
    )
    out = hard_negatives(
        e, q, k=5, id_col="vec_id", vec_col="v", label_col="label",
        q_id_col="q_id", q_vec_col="qv", q_label_col="q_label",
    )
    return out.select(
        "q_id", "vec_id", "label", "rank", F.round("score", 4).alias("score")
    ).orderBy("q_id", "rank")


ORACLE_HARD_NEG = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM e WHERE vec_id < 3),
scored AS (
  SELECT q.q_id, e.vec_id, e.label,
         list_dot_product(e.v, q.qv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS score
  FROM e CROSS JOIN q
  WHERE e.label <> q.q_label
),
ranked AS (
  SELECT q_id, vec_id, label, score,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, label, rank, ROUND(score, 4) AS score
FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
"""


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std of the embedding corpus
    (ops.similarity.embedding_dim_stats): posexplode + one map-side-combined
    groupBy on position — the feature-scaling stats table, N*d rows through
    a d-group shuffle, decimal-exact sums."""
    from apollo_spark.ops.similarity import embedding_dim_stats as dim_stats

    e = _t(spark, sf_dir, "embeddings")
    out = dim_stats(e)
    return out.select(
        "dim", "n", F.round("mean", 6).alias("mean"), F.round("std", 6).alias("std")
    ).orderBy("dim")


ORACLE_DIM_STATS = """
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS arr FROM embeddings),
ex AS (
  SELECT i - 1 AS dim, arr[i] AS v
  FROM e, unnest(generate_series(1, len(arr))) AS t(i)
),
agg AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS s2
  FROM ex GROUP BY dim
)
SELECT dim, n, ROUND(s1 / n, 6) AS mean,
       ROUND(sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0)), 6) AS std
FROM agg ORDER BY dim
"""


def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection to 8 dims
    (ops.similarity.random_projection): the dimensionality-reduction front
    end for clustering/ANN at 100 TB — O(d*k) JVM-side work per row, no
    shuffle, no stored projection matrix (signs are a hash of (j, i)).
    Projected doubles are bit-identical in DuckDB (ordered fold == ordered
    list_dot_product against the same +-1 vector), so the gate hashes raw
    values, not rounded ones."""
    from apollo_spark.ops.similarity import random_projection

    e = _t(spark, sf_dir, "embeddings")
    out = random_projection(e, out_dims=8)
    return out.select("vec_id", *[f"proj_{j}" for j in range(8)]).orderBy("vec_id")


ORACLE_JL_PROJECTION = """
SELECT vec_id,
  list_dot_product(CAST(embedding AS DOUBLE[]), list_transform(range(0, len(embedding)), i -> CASE WHEN ('0x' || substr(md5('jl' || '0|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)) * 0.35355339059327373 AS proj_0,
  list_dot_product(CAST(embedding AS DOUBLE[]), list_transform(range(0, len(embedding)), i -> CASE WHEN ('0x' || substr(md5('jl' || '1|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)) * 0.35355339059327373 AS proj_1,
  list_dot_product(CAST(embedding AS DOUBLE[]), list_transform(range(0, len(embedding)), i -> CASE WHEN ('0x' || substr(md5('jl' || '2|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)) * 0.35355339059327373 AS proj_2,
  list_dot_product(CAST(embedding AS DOUBLE[]), list_transform(range(0, len(embedding)), i -> CASE WHEN ('0x' || substr(md5('jl' || '3|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)) * 0.35355339059327373 AS proj_3,
  list_dot_product(CAST(embedding AS DOUBLE[]), list_transform(range(0, len(embedding)), i -> CASE WHEN ('0x' || substr(md5('jl' || '4|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)) * 0.35355339059327373 AS proj_4,
  list_dot_product(CAST(embedding AS DOUBLE[]), list_transform(range(0, len(embedding)), i -> CASE WHEN ('0x' || substr(md5('jl' || '5|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)) * 0.35355339059327373 AS proj_5,
  list_dot_product(CAST(embedding AS DOUBLE[]), list_transform(range(0, len(embedding)), i -> CASE WHEN ('0x' || substr(md5('jl' || '6|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)) * 0.35355339059327373 AS proj_6,
  list_dot_product(CAST(embedding AS DOUBLE[]), list_transform(range(0, len(embedding)), i -> CASE WHEN ('0x' || substr(md5('jl' || '7|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)) * 0.35355339059327373 AS proj_7
FROM embeddings
ORDER BY vec_id
"""


def embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix of the embedding corpus
    (ops.similarity.embedding_covariance): the PCA/whitening front end.
    The d*(d+1)/2 cross products are generated inside each row by nested
    array transforms, then map-side combined to <= d^2 groups per
    partition — the only wide exchange is O(partitions * d^2) no matter
    the corpus size. DECIMAL(38,6) sums make every entry engine-exact."""
    from apollo_spark.ops.similarity import embedding_covariance

    e = _t(spark, sf_dir, "embeddings")
    return (
        embedding_covariance(e)
        # + 0.0 canonicalizes IEEE negative zero (micro-unit truncation can
        # yield -0.0 on one engine and 0.0 on the other)
        .select("i", "j", "n", (F.round("cov", 6) + F.lit(0.0)).alias("cov"))
        .orderBy("i", "j")
    )


ORACLE_EMB_COVARIANCE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) arr FROM embeddings),
ex AS (SELECT vec_id, i-1 AS i, arr[i] v FROM e, unnest(generate_series(1, len(arr))) t(i)),
p AS (SELECT a.i AS i, b.i AS j, a.v * b.v AS xy FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i),
m AS (SELECT i, CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mean FROM ex GROUP BY i),
g AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(trunc(xy * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxy
      FROM p GROUP BY i, j)
SELECT g.i, g.j, g.n, ROUND(sxy / n - mi.mean * mj.mean, 6) + 0.0 AS cov
FROM g JOIN m mi ON mi.i = g.i JOIN m mj ON mj.i = g.j
ORDER BY g.i, g.j
"""


def embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA: top-4 principal components from the distributed covariance
    matrix (d x d driver eigensolve — the one bounded collect, identical
    on a 1000-executor cluster), rows projected JVM-side against inlined
    component literals. Eigenvectors are not SQL-expressible, so this is
    a rows-only gate; numpy parity + explained-variance ordering are
    pinned in pytest, and partition-invariance (identical output under
    any repartitioning — the property a cross-engine hash would certify)
    is pinned by test_pca_zca_partition_invariant.

    Why no SQL-replayable iteration can close the gap: this corpus's
    covariance spectrum is near-degenerate at the top (measured
    lambda2/lambda1 ~= 0.99), so any fixed-iteration power/subspace
    scheme both engines could replay in lockstep would need thousands of
    rounds to pin the basis — the eigensolve must stay a driver-side
    LAPACK call. The covariance INPUT to it is hash-gated separately
    (embedding_covariance_matrix)."""
    from apollo_spark.ops.similarity import pca_components, pca_project

    e = _t(spark, sf_dir, "embeddings")
    comps, _ = pca_components(e, k=4)
    out = pca_project(e, comps)
    return out.select(
        "vec_id", *[F.round(f"pc_{j}", 6).alias(f"pc_{j}") for j in range(4)]
    ).orderBy("vec_id")


def weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis-Spirakis weighted sample (ops.corpus.
    weighted_sample): per source, 5 documents drawn without replacement with
    probability proportional to n_chars — the reproducible quality-weighted
    subset selection step. Hash-uniform u, log-space keys, id tie-break;
    identical IEEE arithmetic in the oracle."""
    from apollo_spark.ops.corpus import weighted_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = weighted_sample(d, k=5, weight_col="n_chars", by="source")
    return out.select(
        "source", "doc_id", "n_chars", F.round("sample_key", 6).alias("sample_key")
    ).orderBy("source", "doc_id")


ORACLE_WEIGHTED_SAMPLE = """
WITH s AS (
  SELECT source, doc_id, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1.0)
            / 4503599627370497.0) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0
),
r AS (
  SELECT source, doc_id, n_chars, key,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY key DESC, doc_id ASC) AS rn
  FROM s
)
SELECT source, doc_id, n_chars, ROUND(key, 6) AS sample_key
FROM r WHERE rn <= 5 ORDER BY source, doc_id
"""


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    from apollo_spark.ops.similarity import l2_norm

    return e.select("vec_id", F.round(l2_norm(F.col("v")), 4).alias("l2"), F.size("v").alias("dim")).orderBy("vec_id")


ORACLE_NORMS = """
SELECT vec_id,
       ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 4) AS l2,
       len(embedding) AS dim
FROM embeddings ORDER BY vec_id
"""


def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates (word 3-gram shingles, jaccard>=0.6).
    Probabilistic candidate generation -> no SQL oracle (rows-only check).

    Band geometry r=8,b=8: P(candidate | j=0.3) ~ 5e-4 so low-similarity
    pairs (which dominate O(n^2)) almost never reach the verify stage —
    that's the property that keeps this runnable at corpus scale."""
    d = _t(spark, sf_dir, "documents")
    return (
        minhash_lsh_pairs(d, n=3, num_hashes=64, bands=8, threshold=0.6)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("id_a", "id_b")
    )


def minhash_portable_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with the PORTABLE hash family (md5-prefix
    shingle hash + 2-universal modular slots + md5-prefix band keys): the
    whole pipeline — signatures, banding, candidate join, exact verify — is
    replayed by the SQL oracle, closing the round-2 gap where MinHash could
    only be rows-only-checked. Band geometry b=16 x r=2 at threshold 0.5."""
    from apollo_spark.ops.dedup import minhash_portable_pairs

    d = _t(spark, sf_dir, "documents")
    return (
        minhash_portable_pairs(d, n=3, num_hashes=32, bands=16, threshold=0.5)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("id_a", "id_b")
    )


def _minhash_portable_oracle(n: int = 3, num_hashes: int = 32, bands: int = 16, threshold: float = 0.5) -> str:
    from apollo_spark.ops.dedup import _mh_consts

    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(((h >> 30) * {a} + (h & 1073741823) * {b} + {c}) % 2305843009213693951) AS m{i}"
        for i, (a, b, c) in ((i, _mh_consts(i)) for i in range(num_hashes))
    )
    band_rows = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, ('0x' || substr(md5(concat_ws('|', {b}, {cols})), 1, 15))::BIGINT AS bkey FROM sig".format(
            b=b, cols=", ".join(f"m{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(w) - {n - 1}),
                                                i -> {" || ' ' || ".join(f"w[i+{j}]" for j in range(n))})) END AS sh
  FROM t
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM ex),
sig AS (
  SELECT doc_id,
         {mins}
  FROM h GROUP BY doc_id
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b
WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(list_distinct(list_concat(x.sh, y.sh))) >= {threshold}
ORDER BY id_a, id_b
"""


ORACLE_MINHASH_PORTABLE = _minhash_portable_oracle()


def simhash_portable_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL document pairs within hamming<=3 of the portable 60-bit SimHash.
    The Spark side buckets on 4x15-bit blocks (pigeonhole-lossless, scalar
    join keys); the oracle replays signature construction bit-for-bit and
    verifies with a naive join — valid because the banding is exact, so both
    compute the same total answer."""
    from apollo_spark.ops.dedup import simhash_portable_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_portable_pairs(d, n=2, max_hamming=3).orderBy("id_a", "id_b")


def _simhash_portable_oracle(n: int = 2, max_hamming: int = 3) -> str:
    bits = 60
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(bits)
    )
    sig = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(w) - {n - 1}),
                                                i -> {" || ' ' || ".join(f"w[i+{j}]" for j in range(n))})) END AS sh
  FROM t
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM ex),
v AS (
  SELECT doc_id,
         {votes}
  FROM h GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS sim FROM v)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
ORDER BY id_a, id_b
"""


ORACLE_SIMHASH_PORTABLE = _simhash_portable_oracle()


def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing sketch (k=4 word grams, window w=5): the
    guaranteed-coverage upgrade of doc_fingerprints — any shared run of
    >= w+k-1 words between two documents shares a selected fingerprint.
    One shuffle on doc_id + a co-partitioned argmin join; every hash is a
    60-bit md5 prefix so the oracle replays selection exactly."""
    from apollo_spark.ops.text import winnowing_fingerprints

    d = _t(spark, sf_dir, "documents")
    return winnowing_fingerprints(d, k=4, w=5).orderBy("doc_id", "pos")


ORACLE_WINNOWING = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w0
  FROM documents
),
g0 AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(w0) - 3, 1)),
                        i -> array_to_string(w0[i:i+3], ' ')) AS gr
  FROM t
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(gr)),
                               i -> {'p': i - 1, 'h': ('0x' || substr(md5(gr[i]), 1, 15))::BIGINT})) AS u
  FROM g0
),
gp AS (SELECT doc_id, u.p AS p, u.h AS h FROM grams),
wins AS (
  SELECT doc_id, p AS q, wmin FROM (
    SELECT doc_id, p,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin,
           COUNT(*) OVER (PARTITION BY doc_id) AS npos
    FROM gp)
  WHERE p <= greatest(npos - 5, 0)
),
sel AS (
  SELECT w.doc_id, w.q, w.wmin, MIN(g.p) AS pos
  FROM wins w
  JOIN gp g ON g.doc_id = w.doc_id AND g.h = w.wmin AND g.p >= w.q AND g.p <= w.q + 4
  GROUP BY w.doc_id, w.q, w.wmin
)
SELECT DISTINCT doc_id, pos, wmin AS fp FROM sel
ORDER BY doc_id, pos
"""


def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 96/2/2 train/val/test split (md5-bucket of doc_id — a
    pure function of the id, stable across reruns/engines/partitionings),
    reported as per-(source, split) doc and token counts. Narrow map + one
    groupBy shuffle of source x 3 rows."""
    from apollo_spark.ops.corpus import split_assignment, whitespace_tokens

    d = _t(spark, sf_dir, "documents")
    return (
        split_assignment(d, fractions=(96, 2))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(whitespace_tokens(F.col("text"))).cast("long")).alias("n_tokens"),
        )
        .orderBy("source", "split")
    )


ORACLE_SPLIT_ASSIGNMENT = r"""
WITH s AS (
  SELECT source,
         CASE WHEN ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 96 THEN 'train'
              WHEN ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 98 THEN 'val'
              ELSE 'test' END AS split,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM s GROUP BY source, split
ORDER BY source, split
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 3-gram Jaccard between SOURCES — the corpus-level
    contamination/overlap audit (which feeds deduped-mix design). Shape:
    distinct (source, shingle) -> self-join on shingle -> per-pair counts.
    Fan-out per shingle is bounded by sources^2 (not docs^2), and the
    output is one row per source pair, so this survives any corpus size;
    the shingle-distinct shuffle is the only corpus-sized exchange."""
    from apollo_spark.ops.dedup import shingles

    d = _t(spark, sf_dir, "documents")
    sh = d.select("source", F.explode(shingles(F.col("text"), 3)).alias("s")).distinct()
    cnt = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "s")
    b = sh.select(F.col("source").alias("source_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(F.broadcast(cnt.select(F.col("source").alias("source_a"), F.col("n").alias("na"))), "source_a")
        .join(F.broadcast(cnt.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


ORACLE_SOURCE_OVERLAP = r"""
WITH t AS (
  SELECT source, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT source, s FROM (
    SELECT source,
           unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                ELSE list_transform(generate_series(1, len(w) - 2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
    FROM t)
),
cnt AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, i.n_shared,
       ROUND(CAST(i.n_shared AS DOUBLE) / (ca.n + cb.n - i.n_shared), 6) AS jaccard
FROM inter i
JOIN cnt ca ON ca.source = i.source_a
JOIN cnt cb ON cb.source = i.source_b
ORDER BY source_a, source_b
"""


def corpus_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus report card — docs, sources, languages, exact token
    totals/averages, empty-doc and exact-dup-doc counts. Every figure is one
    scan + map-side-combined aggregates (the dup count rides a distinct on
    the content digest); sums go through DECIMAL so the report is
    engine-exact at any scale."""
    from apollo_spark.ops.corpus import whitespace_tokens
    from apollo_spark.ops.dedup import normalize_text

    d = _t(spark, sf_dir, "documents")
    toks = F.size(whitespace_tokens(F.col("text"))).cast("long")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(toks).alias("total_tokens"),
        (F.sum(toks.cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.sum(F.when(F.length(F.trim(F.col("text"))) == 0, 1).otherwise(0)).alias("n_empty"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(normalize_text(F.col("text"))))).alias("n_exact_dups"),
    )


DOCS_DSL_CURATION = """
query docs_curated {
  chain = "ethereum"
  source_table = "documents"
  sample {
    key = "doc_id"
    denominator = 2
    salt = "cur"
  }
  quality {
    ruleset = "basic"
    min_quality = 0.6
    min_tokens = 10
  }
  dedup {
    method = "exact"
  }
  aggregate {
    group_by = [source]
    n_docs = count()
  }
  sort = [source]
}
"""


def docs_dsl_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full declarative curation pipeline as ONE HCL query: deterministic
    1/2 hash-sample -> lang/quality `quality` block -> exact `dedup` block ->
    per-source counts. Every stage's survivor set is a pure function of row
    content, so the composition (not just each stage) hash-gates against the
    SQL replay. (The `gopher` ruleset is exercised separately by
    doc_gopher_quality — on this synthetic corpus it keeps nothing, which
    would make this gate vacuous.)"""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    schema = parse_schema(DOCS_DSL_CURATION)
    return compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema)





ORACLE_CORPUS_SUMMARY = r"""
WITH s AS (
  SELECT source, lang, text,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(n_tokens AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       COUNT(*) - COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_exact_dups
FROM s
"""


# --------------------------------------------------------------------------
# window / grouping-set / set-op tier
# --------------------------------------------------------------------------


def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer over order date (window frame, one shuffle
    on o_custkey)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double"), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORACLE_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
"""


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (status, priority) with ALL placeholders."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


ORACLE_ROLLUP = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot: one column per order status (conditional aggregation —
    identical shape in ANSI SQL, unlike PIVOT syntax)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_PIVOT = """
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_filled,
       COUNT(*) FILTER (o_orderstatus = 'P') AS n_pending
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def clickers_and_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op tier: users who both click AND purchase (INTERSECT)."""
    e = _events(spark, sf_dir)
    clickers = e.filter(F.col("event_type") == "click").select("user_id")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers).orderBy("user_id")


ORACLE_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# LLM tier (continued)
# --------------------------------------------------------------------------


def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher hard-filter rule set (Rae et al. 2021, table A1;
    ops.text.gopher_quality_rules) applied per document: every rule as its
    own boolean column plus the final AND — the transparency view a corpus
    curator audits before dropping terabytes (which rule fired, how often).
    Pure built-in expressions, SQL-mirrored rule for rule."""
    from apollo_spark.ops.text import gopher_quality_keep, gopher_quality_rules

    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    rules = gopher_quality_rules(F.col("text"), min_words=20)
    return d.select(
        "doc_id",
        *[col.alias(name) for name, col in rules.items()],
        gopher_quality_keep(F.col("text"), min_words=20).alias("keep"),
    ).orderBy("doc_id")


ORACLE_GOPHER_QUALITY = r"""
WITH d AS (SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
x AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) AS n_words,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS nonspace,
         CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS n_hash,
         (CAST(length(text) AS DOUBLE) - length(replace(text, '...', ''))) / 3 AS n_ellipsis,
         string_split(text, chr(10)) AS lines
  FROM d
),
r AS (
  SELECT doc_id,
         CAST(n_words AS BIGINT) AS n_words,
         (n_words >= 20 AND n_words <= 100000) AS rule_word_count,
         (CASE WHEN n_words > 0 THEN nonspace / n_words ELSE 0.0 END >= 3.0
          AND CASE WHEN n_words > 0 THEN nonspace / n_words ELSE 0.0 END <= 10.0) AS rule_mean_word_len,
         CASE WHEN n_words > 0 THEN n_hash / n_words < 0.1 ELSE FALSE END AS rule_hash_ratio,
         CASE WHEN n_words > 0 THEN n_ellipsis / n_words < 0.3 ELSE FALSE END AS rule_ellipsis_ratio,
         CASE WHEN n_words > 0
              THEN CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / n_words >= 0.8
              ELSE FALSE END AS rule_alpha_words,
         (CAST(list_contains(toks, 'the') AS INT) + CAST(list_contains(toks, 'be') AS INT)
        + CAST(list_contains(toks, 'to') AS INT) + CAST(list_contains(toks, 'of') AS INT)
        + CAST(list_contains(toks, 'and') AS INT) + CAST(list_contains(toks, 'that') AS INT)
        + CAST(list_contains(toks, 'have') AS INT) + CAST(list_contains(toks, 'with') AS INT)) >= 2 AS rule_stopwords,
         CASE WHEN len(lines) > 0
              THEN CAST(len(list_filter(lines, ln -> regexp_matches(trim(ln), '^[-*•]\s'))) AS DOUBLE) / len(lines) < 0.9
              ELSE TRUE END AS rule_bullet_lines,
         CASE WHEN len(lines) > 0
              THEN CAST(len(list_filter(lines, ln -> regexp_matches(trim(ln), '\.\.\.$'))) AS DOUBLE) / len(lines) < 0.3
              ELSE TRUE END AS rule_ellipsis_lines
  FROM x
)
SELECT doc_id, n_words, rule_word_count, rule_mean_word_len, rule_hash_ratio,
       rule_ellipsis_ratio, rule_alpha_words, rule_stopwords, rule_bullet_lines,
       rule_ellipsis_lines,
       (rule_word_count AND rule_mean_word_len AND rule_hash_ratio AND rule_ellipsis_ratio
        AND rule_alpha_words AND rule_stopwords AND rule_bullet_lines AND rule_ellipsis_lines) AS keep
FROM r
ORDER BY doc_id
"""


def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data selection pipeline: English, quality >= 0.6, in a token
    band — the composition a corpus-cleaning job runs. The predicate is the
    SHARED ops.text.quality_keep, the same one curation.curate applies, so
    this gate also pins the pipeline's survivor set."""
    from apollo_spark.ops.text import quality_keep

    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(quality_keep(F.col("text")))
        .select(
            "doc_id",
            language_id(F.col("text")).alias("pred_lang"),
            F.round(quality_score(F.col("text")), 6).alias("quality"),
            token_count(F.col("text")).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


ORACLE_QUALITY_FILTER = rf"""
WITH scored AS (
  SELECT doc_id,
       CASE
         WHEN h_en = best AND best > 0 THEN 'en'
         WHEN h_de = best AND best > 0 THEN 'de'
         WHEN h_fr = best AND best > 0 THEN 'fr'
         WHEN h_es = best AND best > 0 THEN 'es'
         ELSE 'unknown'
       END AS pred_lang,
       {_SQL_QUALITY_EXPR} AS quality,
       n_tok AS n_tokens
  FROM (
    SELECT doc_id,
           {_sql_hits('en')} AS h_en, {_sql_hits('de')} AS h_de,
           {_sql_hits('fr')} AS h_fr, {_sql_hits('es')} AS h_es,
           GREATEST({_sql_hits('en')}, {_sql_hits('de')}, {_sql_hits('fr')}, {_sql_hits('es')}) AS best,
           {_sql_quality_stat_cols()}
    FROM documents
  )
)
SELECT doc_id, pred_lang, quality, n_tokens FROM scored
WHERE pred_lang = 'en' AND quality >= 0.6 AND n_tokens >= 10
ORDER BY doc_id
"""


def doc_quality_filter_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data selection with the TRAINED language classifier routed
    into the shared keep predicate (quality_keep's lang_pred_col) —
    the round-7 replacement for the heuristic language gate: English per
    the in-engine perceptron, quality >= 0.6, token floor. Production
    shape: the (doc_id, pred_lang) table is computed once (train once,
    score once, persist) and joined into every downstream consumer; here
    the gate path recomputes it self-contained so the oracle replays the
    whole trajectory."""
    from apollo_spark.ops.text import quality_keep

    d = _t(spark, sf_dir, "documents")
    dj = d.join(_trained_langid_preds(spark, sf_dir), "doc_id")
    return (
        dj.filter(quality_keep(F.col("text"), lang_pred_col="pred_lang"))
        .select(
            "doc_id",
            "pred_lang",
            F.round(quality_score(F.col("text")), 6).alias("quality"),
            token_count(F.col("text")).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


ORACLE_QUALITY_FILTER_TRAINED = (
    "WITH "
    + _langid_trained_sql()
    + rf""",
q AS (
  SELECT doc_id,
       {_SQL_QUALITY_EXPR} AS quality,
       n_tok AS n_tokens
  FROM (
    SELECT doc_id,
           {_sql_quality_stat_cols()}
    FROM documents
  )
)
SELECT q.doc_id, p.pred_lang, q.quality, q.n_tokens
FROM q JOIN ltpr p USING (doc_id)
WHERE p.pred_lang = 'en' AND q.quality >= 0.6 AND q.n_tokens >= 10
ORDER BY doc_id"""
)


ORACLE_DOCS_DSL_CURATION = rf"""
WITH samp AS (
  SELECT * FROM documents
  WHERE ('0x' || substr(md5('cur' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
),
keep AS (
  SELECT doc_id FROM ({ORACLE_QUALITY_FILTER.strip().removesuffix("ORDER BY doc_id").strip()})
),
kept AS (SELECT s.* FROM samp s JOIN keep USING (doc_id)),
sur AS (
  SELECT source,
         ROW_NUMBER() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           ORDER BY doc_id) AS rn
  FROM kept
)
SELECT source, COUNT(*) AS n_docs FROM sur WHERE rn = 1
GROUP BY source ORDER BY source
"""


def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apollo_spark.ops.text import bpe_ish_token_count

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n_units")).orderBy("doc_id")


ORACLE_BPE = r"""
SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_units
FROM documents ORDER BY doc_id
"""


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style repetition heuristic: share of tokens taken by the most
    frequent token. explode -> two-level aggregate, one shuffle on doc_id
    after the (doc_id, term) combine; integer-ratio division is exact."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    ex = d.filter(F.length(F.trim("text")) > 0).select("doc_id", F.explode(toks).alias("term"))
    counts = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(F.max("c").alias("top_n"), F.sum("c").alias("n_tokens"))
        .withColumn("rep_ratio", F.col("top_n").cast("double") / F.col("n_tokens").cast("double"))
        .orderBy("doc_id")
    )


ORACLE_REPETITION = r"""
WITH ex AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
counts AS (SELECT doc_id, term, COUNT(*) AS c FROM ex GROUP BY 1, 2)
SELECT doc_id, MAX(c) AS top_n, CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS rep_ratio
FROM counts GROUP BY doc_id ORDER BY doc_id
"""


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (512 chars, 64 overlap) — narrow map, no
    shuffle (ops.text.chunk_documents)."""
    from apollo_spark.ops.text import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, size=512, overlap=64).orderBy("doc_id", "chunk_id")


ORACLE_DOC_CHUNKS = """
SELECT doc_id, CAST(i // 448 AS INT) AS chunk_id,
       substring(text, i + 1, 512) AS chunk,
       length(substring(text, i + 1, 512)) AS n_chars
FROM documents, unnest(generate_series(0, greatest(length(text) - 1, 0), 448)) AS t(i)
WHERE length(text) > 0
ORDER BY doc_id, chunk_id
"""


def doc_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level hot-segment scrub (the C4/RefinedWeb 'remove lines
    duplicated across documents' step) at token granularity with a
    fractional df cap: segments appearing in more than half the corpus are
    stripped and every document is reassembled from its survivors in
    original order. ops.dedup.strip_hot_lines; threshold is a declarative
    1-row crossJoin, not a driver count."""
    from apollo_spark.ops.dedup import strip_hot_lines

    d = _t(spark, sf_dir, "documents")
    return strip_hot_lines(d, max_df_frac=0.5, sep=" ").orderBy("doc_id")


ORACLE_BOILERPLATE_SCRUB = r"""
WITH parts AS (SELECT doc_id, string_split(text, ' ') AS ps FROM documents),
lines AS (
  SELECT doc_id, CAST(i AS INT) AS pos, ps[CAST(i AS INT)] AS line
  FROM parts, unnest(generate_series(1, len(ps))) AS t(i)
),
keyed AS (
  SELECT doc_id, pos, line,
         md5(trim(regexp_replace(lower(line), '\s+', ' ', 'g'))) AS lkey
  FROM lines
),
hot AS (
  SELECT lkey FROM keyed GROUP BY lkey
  HAVING CAST(COUNT(DISTINCT doc_id) AS DOUBLE) > 0.5 * (SELECT COUNT(DISTINCT doc_id) FROM keyed)
),
kept AS (SELECT k.doc_id, k.pos, k.line FROM keyed k ANTI JOIN hot h USING (lkey)),
rebuilt AS (
  SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS clean_text, COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM keyed GROUP BY doc_id)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
       CAST(t.n_lines AS BIGINT) AS n_lines,
       CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
ORDER BY doc_id
"""


def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a 3-term query (ops.text.bm25_scores): corpus
    relevance search as one token explode + scalar (N, avgdl) crossJoins.
    Per-term contributions sum through DECIMAL(38,6), so the score — and
    therefore the top-k ordering — is bit-identical across engines."""
    from apollo_spark.ops.text import bm25_scores

    d = _t(spark, sf_dir, "documents")
    return (
        bm25_scores(d, ["stream", "window", "hash"], k1=1.2, b=0.75)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


ORACLE_BM25 = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM doclen
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('hash', 'stream', 'window') GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
SELECT doc_id,
       CAST(SUM(CAST(
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
       AS DECIMAL(38,6))) AS DOUBLE) AS bm25
FROM tf JOIN dfreq USING (term) JOIN doclen USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (ops.retrieval.rrf_fuse,
    Cormack et al. SIGIR 2009): a lexical BM25 top-50 and a dense cosine
    top-50 (over the documents that have an embedding, vec_id == doc_id)
    fused as integer contributions ``1e9 // (60 + rank)`` — the fused score
    is an exact integer, so the whole two-retriever composition hash-gates.
    Each leg's top-50 is orderBy().limit(50) — TakeOrderedAndProject, a
    distributed per-partition top-k, never a corpus-sized single-task
    window; the rank assignment then runs over the 50-row result only.
    Fusion shuffles at most 100 rows regardless of corpus size; the dense
    leg broadcasts the single query vector; absent ranks surface as -1."""
    from apollo_spark.ops.retrieval import rrf_fuse
    from apollo_spark.ops.text import bm25_scores

    d = _t(spark, sf_dir, "documents")
    lex = (
        bm25_scores(d, ["stream", "window", "hash"], k1=1.2, b=0.75)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(50)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())),
        )
        .select("doc_id", "rank")
    )
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    with_vec = e.join(d.select("doc_id"), e["vec_id"] == F.col("doc_id"), "inner")
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dense = (
        with_vec.crossJoin(F.broadcast(q))
        .withColumn("score", cosine(F.col("v"), F.col("qv")))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(50)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())),
        )
        .select("doc_id", "rank")
    )
    fused = rrf_fuse([lex, dense], id_col="doc_id", rank_col="rank", k=60)
    return (
        fused.join(lex.withColumnRenamed("rank", "lex_rank"), "doc_id", "left")
        .join(dense.withColumnRenamed("rank", "dense_rank"), "doc_id", "left")
        .select(
            "doc_id",
            "rrf_score",
            "n_lists",
            F.coalesce("lex_rank", F.lit(-1)).cast("int").alias("lex_rank"),
            F.coalesce("dense_rank", F.lit(-1)).cast("int").alias("dense_rank"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(15)
    )


ORACLE_RRF = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM doclen
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('hash', 'stream', 'window') GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
bm AS (
  SELECT doc_id,
         CAST(SUM(CAST(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
         AS DECIMAL(38,6))) AS DOUBLE) AS bm25
  FROM tf JOIN dfreq USING (term) JOIN doclen USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
),
lex AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank FROM bm
  ) WHERE rank <= 50
),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id IN (SELECT doc_id FROM documents)
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT doc_id, rank FROM (
    SELECT e.vec_id AS doc_id,
           ROW_NUMBER() OVER (
             ORDER BY list_dot_product(e.v, q.qv)
                      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                      e.vec_id ASC
           ) AS rank
    FROM e CROSS JOIN qv q
  ) WHERE rank <= 50
),
u AS (
  SELECT doc_id, rank FROM lex UNION ALL SELECT doc_id, rank FROM dense
),
fused AS (
  SELECT doc_id,
         CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS rrf_score,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM u GROUP BY doc_id
)
SELECT f.doc_id, f.rrf_score, f.n_lists,
       CAST(COALESCE(l.rank, -1) AS INT) AS lex_rank,
       CAST(COALESCE(d.rank, -1) AS INT) AS dense_rank
FROM fused f LEFT JOIN lex l USING (doc_id) LEFT JOIN dense d USING (doc_id)
ORDER BY f.rrf_score DESC, f.doc_id
LIMIT 15
"""


def _perceptron_parts(spark: SparkSession, sf_dir: str):
    from apollo_spark.ops.ml import hashed_token_features, perceptron_train

    d = _t(spark, sf_dir, "documents")
    feats = hashed_token_features(d, buckets=32, salt="feat")
    labels = d.select(
        "doc_id", F.when(F.col("lang") == "en", 1).otherwise(-1).cast("int").alias("y")
    )
    w = perceptron_train(feats, labels, iters=3)
    return d, feats, labels, w


def perceptron_lang_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine classifier TRAINING (ops.ml.perceptron_train): 3 batch-
    perceptron rounds learning lang=='en' from 32 hashed bag-of-token
    buckets + bias. Every margin/update is exact BIGINT, so the entire
    training trajectory is engine-portable and the final weight table
    hash-gates against a DuckDB oracle replaying the unrolled rounds —
    the fastText-style quality/lang filter of a pretraining pipeline,
    trained without the corpus ever leaving the engine."""
    _, _, _, w = _perceptron_parts(spark, sf_dir)
    return w.select(F.col("b"), F.col("weight")).orderBy("b")


def perceptron_lang_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference sweep with the trained weights (ops.ml.classifier_margins):
    per-language doc counts and training-set errors (margin <= 0) — the
    broadcast-weights scoring path a 100 TB filter sweep runs."""
    from apollo_spark.ops.ml import classifier_margins

    d, feats, labels, w = _perceptron_parts(spark, sf_dir)
    scores = classifier_margins(feats, w)
    return (
        scores.join(labels, "doc_id")
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("y") * F.col("score") <= 0, 1).otherwise(0)).alias("n_wrong"),
        )
        .orderBy("lang")
    )


def _perceptron_oracle(final_select: str) -> str:
    rounds = []
    prev = "w0"
    for t in range(1, 4):
        rounds.append(
            f"""m{t} AS (SELECT doc_id, y, SUM(n * weight) AS wx FROM fx JOIN {prev} USING (b) GROUP BY 1, 2),
wr{t} AS (SELECT doc_id FROM m{t} WHERE y * wx <= 0),
d{t} AS (SELECT b, SUM(y * n) AS dw FROM fx JOIN wr{t} USING (doc_id) GROUP BY b),
w{t} AS (SELECT {prev}.b, {prev}.weight + COALESCE(d{t}.dw, 0) AS weight FROM {prev} LEFT JOIN d{t} USING (b))"""
        )
        prev = f"w{t}"
    joined_rounds = ",\n".join(rounds)
    return rf"""
WITH d AS (
  SELECT doc_id, lower(text) AS text, lang,
         CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
  FROM d WHERE length(trim(text)) > 0
),
cnt AS (
  SELECT doc_id, CAST(('0x' || substr(md5('feat' || t), 1, 15))::BIGINT % 32 AS INT) AS b,
         COUNT(*) AS n
  FROM toks GROUP BY 1, 2
),
feats AS (
  SELECT * FROM cnt
  UNION ALL SELECT doc_id, 32 AS b, CAST(1 AS BIGINT) AS n FROM d
),
fx AS (SELECT f.doc_id, f.b, f.n, d.y FROM feats f JOIN d USING (doc_id)),
w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS weight FROM fx),
{joined_rounds}
{final_select}
"""


ORACLE_PERCEPTRON_W = _perceptron_oracle(
    "SELECT b, CAST(weight AS BIGINT) AS weight FROM w3 ORDER BY b"
)

ORACLE_PERCEPTRON_ERR = _perceptron_oracle(
    """, sc AS (SELECT doc_id, y, SUM(n * weight) AS score FROM fx JOIN w3 USING (b) GROUP BY 1, 2)
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN sc.y * sc.score <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong
FROM sc JOIN d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang"""
)


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al., NeurIPS 2023) log importance weights of every
    document toward a target domain (source src0/src1) over 256 hashed
    uni+bigram buckets — ops.corpus.dsir_importance; the log-ratio table is
    a broadcast of at most `buckets` rows regardless of corpus size."""
    from apollo_spark.ops.corpus import dsir_importance

    d = _t(spark, sf_dir, "documents")
    target = d.filter(F.col("source").isin("src0", "src1"))
    return dsir_importance(d, target, buckets=256).orderBy("doc_id")


ORACLE_DSIR = r"""
WITH w AS (
  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents WHERE length(trim(text)) > 0
),
feats AS (
  SELECT doc_id, source, g FROM (
    SELECT doc_id, source, unnest(ws) AS g FROM w
    UNION ALL
    SELECT doc_id, source, array_to_string(ws[i:i+1], ' ') AS g
    FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) t(i)
    WHERE len(ws) >= 2
  )
),
bucketed AS (
  SELECT doc_id, source,
         CAST((('0x' || substring(md5(g), 1, 8))::BIGINT % 256) AS INT) AS b
  FROM feats
),
tgt AS (SELECT b, COUNT(*) AS ct FROM bucketed WHERE source IN ('src0', 'src1') GROUP BY b),
cor AS (SELECT b, COUNT(*) AS cc FROM bucketed GROUP BY b),
tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt FROM tgt),
ca AS (SELECT CAST(SUM(cc) AS BIGINT) AS ca FROM cor),
dom AS (SELECT CAST(unnest(range(0, 256)) AS INT) AS b),
ratios AS (
  SELECT d.b,
         ln(((coalesce(t.ct, 0) + 1.0) / (tt + 256.0))
            / ((coalesce(c.cc, 0) + 1.0) / (ca + 256.0))) AS lr
  FROM dom d LEFT JOIN tgt t USING (b) LEFT JOIN cor c USING (b) CROSS JOIN tt CROSS JOIN ca
),
doc_counts AS (SELECT doc_id, b, COUNT(*) AS n FROM bucketed GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, CAST(SUM(CAST(n * lr AS DECIMAL(38,6))) AS DOUBLE) AS logw
  FROM doc_counts JOIN ratios USING (b) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(p.logw, 0.0) AS logw
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def item_transition_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 5 synchronous iterations) over the item-to-item
    transition graph: consecutive events per user define weighted directed
    edges between their props.k items (the Markov-chain navigation graph).
    ops.graph.pagerank — the iterative tier done the Spark way: per-iteration
    eager checkpoints truncate lineage, sums are DECIMAL(38,6)-exact, state
    re-quantized per iteration so the whole trajectory is engine-identical
    (the oracle unrolls the same 5 iterations in SQL)."""
    from apollo_spark.ops.graph import pagerank

    e = _events(spark, sf_dir)
    item = F.get_json_object("props", "$.k").cast("int")
    seq = e.select("user_id", F.col("ts").alias("tsn"), "event_id", item.alias("item"))
    w = Window.partitionBy("user_id").orderBy(F.col("tsn").asc(), F.col("event_id").asc())
    trans = seq.withColumn("prev", F.lag("item").over(w)).filter(F.col("prev").isNotNull())
    edges = trans.groupBy(F.col("prev").alias("src"), F.col("item").alias("dst")).agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    return pagerank(edges, damping=0.85, iterations=5, weight="w").orderBy("node")


def item_transition_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk data prep over the item-transition graph: 2 deterministic
    random walks of 3 steps from every item with out-edges (the corpus a
    skip-gram embedding trains on). Walk choices are hash-derived — no RNG
    state — so the oracle unrolls the identical joins (ops.graph.random_walks)."""
    from apollo_spark.ops.graph import random_walks

    e = _events(spark, sf_dir)
    item = F.get_json_object("props", "$.k").cast("int")
    seq = e.select("user_id", F.col("ts").alias("tsn"), "event_id", item.alias("item"))
    w = Window.partitionBy("user_id").orderBy(F.col("tsn").asc(), F.col("event_id").asc())
    trans = seq.withColumn("prev", F.lag("item").over(w)).filter(F.col("prev").isNotNull())
    edges = trans.select(F.col("prev").alias("src"), F.col("item").alias("dst"))
    return random_walks(edges, walks_per_node=2, walk_len=3).orderBy("start", "rep", "step")


def _walks_oracle(walks_per_node: int = 2, walk_len: int = 3) -> str:
    reps = " UNION ALL ".join(f"SELECT {r} AS rep" for r in range(walks_per_node))
    steps, unions = [], ["SELECT start, rep, 0 AS step, node FROM f0"]
    for t in range(1, walk_len + 1):
        steps.append(
            f"""f{t} AS (
  SELECT f.start, f.rep, e.dst AS node
  FROM f{t - 1} f JOIN ranked e ON f.node = e.src
   AND e.r = ('0x' || substr(md5(concat_ws('|', 'walk', f.start, f.rep, {t})), 1, 15))::BIGINT % e.deg
)"""
        )
        unions.append(f"SELECT start, rep, {t} AS step, node FROM f{t}")
    return (
        r"""
WITH seq AS (
  SELECT user_id, epoch_ns(ts) AS tsn, event_id,
         CAST(props->>'$.k' AS INT) AS item
  FROM events
),
trans AS (
  SELECT LAG(item) OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS src,
         item AS dst
  FROM seq
),
edges AS (SELECT DISTINCT src, dst FROM trans WHERE src IS NOT NULL),
ranked AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS r,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM edges
),
starts AS (SELECT DISTINCT src AS start FROM ranked),
f0 AS (SELECT start, rep, start AS node FROM starts CROSS JOIN ("""
        + reps
        + """) reps),
"""
        + ",\n".join(steps)
        + "\n"
        + " UNION ALL ".join(unions)
        + "\nORDER BY start, rep, step"
    )


ORACLE_ITEM_WALKS = _walks_oracle()


def _pagerank_oracle(iterations: int = 5) -> str:
    """Unrolled-iteration DuckDB mirror of ops.graph.pagerank over the item
    transition graph — same integer micro-unit lattice: BIGINT ranks
    (rank*1e6), floor(x+0.5) portable rounding, exact integer sums. DuckDB
    `/` promotes to DOUBLE (the same IEEE division Spark performs)."""
    base_u, d = "150000.0", "0.85"
    prev = "r0"
    iters = []
    for i in range(1, iterations + 1):
        iters.append(
            f"""i{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(FLOOR(r.ru * e.w / o.wout + 0.5) AS BIGINT)) AS BIGINT) AS iu
  FROM edges e JOIN outw o USING (src) JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst
),
d{i} AS (
  SELECT CAST(coalesce(SUM(ru), 0) AS BIGINT) AS du
  FROM {prev} r ANTI JOIN outw o ON r.node = o.src
),
r{i} AS (
  SELECT nodes.node,
         CAST(FLOOR({base_u} / n + {d} * (CAST(coalesce(iu, 0) AS DOUBLE) + CAST(du AS DOUBLE) / n) + 0.5) AS BIGINT) AS ru
  FROM nodes CROSS JOIN nn CROSS JOIN d{i} LEFT JOIN i{i} USING (node)
)"""
        )
        prev = f"r{i}"
    return (
        """
WITH seq AS (
  SELECT user_id, epoch_ns(ts) AS tsn, event_id,
         CAST(props->>'$.k' AS INT) AS item
  FROM events
),
trans AS (
  SELECT LAG(item) OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS src,
         item AS dst
  FROM seq
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM trans WHERE src IS NOT NULL GROUP BY 1, 2
),
nodes AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(FLOOR(1000000.0 / n + 0.5) AS BIGINT) AS ru FROM nodes CROSS JOIN nn),
"""
        + ",\n".join(iters)
        + f"\nSELECT node, ru / 1000000.0 AS rank FROM {prev} ORDER BY node"
    )


ORACLE_PAGERANK = _pagerank_oracle(5)


def ngram_jaccard_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT bigram-Jaccard pairs >= 0.2 (lossless inverted-index candidates
    -> SQL-oracle-able, unlike MinHash)."""
    from apollo_spark.ops.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return (
        # max_df=None = the certified-lossless oracle config; production
        # default is a finite cap (ops/dedup.py ngram_jaccard_pairs docstring)
        ngram_jaccard_pairs(d, n=2, threshold=0.2, max_df=None)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("id_a", "id_b")
    )


ORACLE_NGRAM_JACCARD = r"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
  WHERE len(t) >= 1
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
ORDER BY id_a, id_b
"""


def ngram_jaccard_capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB configuration of ngram_jaccard_pairs, hash-gated: a
    scale-RELATIVE hot-shingle cap (df > floor(4% of corpus)) prunes the
    inverted index before candidate generation, so the per-key join fan-out
    is bounded by a corpus fraction instead of growing df^2 with corpus
    size (the lossless twin above measures ~quadratic on this tiny-vocab
    corpus: 2.8 s at sf0.1 -> 441 s at sf1; this one stays ~linear). The
    oracle replays the full capped semantics — relative cutoff, pruned
    candidate join with the length filter, exact full-set re-score of the
    survivors, and the all-hot-doc exact-set star recovery — so the
    count-bounds + ambiguous-sliver machinery in ops/dedup.py is
    value-certified cross-engine, not just unit-tested."""
    from apollo_spark.ops.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(d, n=2, threshold=0.2, max_df_frac=0.04)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("id_a", "id_b")
    )


ORACLE_NGRAM_JACCARD_CAPPED = r"""
WITH d0 AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
  WHERE len(t) >= 1
),
d AS (SELECT * FROM d0 WHERE len(sh) > 0),
k AS (SELECT CAST(floor(0.04 * COUNT(*)) AS BIGINT) AS cap FROM d),
ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
dfreq AS (SELECT s, COUNT(*) AS c FROM ex GROUP BY s),
kept AS (SELECT ex.doc_id, ex.n, ex.s FROM ex JOIN dfreq USING (s), k WHERE c <= k.cap),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b
    ON a.s = b.s AND a.doc_id < b.doc_id
   AND a.n >= 0.2 * b.n - 1e-9 AND b.n >= 0.2 * a.n - 1e-9
),
scored AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) AS jaccard
  FROM cand JOIN d da ON da.doc_id = cand.id_a JOIN d db ON db.doc_id = cand.id_b
),
allhot AS (
  SELECT doc_id, list_sort(sh) AS seth FROM d
  WHERE doc_id NOT IN (SELECT doc_id FROM kept)
),
star AS (
  SELECT MIN(doc_id) OVER (PARTITION BY seth) AS id_a, doc_id AS id_b, 1.0 AS jaccard
  FROM allhot QUALIFY doc_id != id_a
)
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
FROM (SELECT * FROM scored WHERE jaccard >= 0.2 UNION ALL SELECT * FROM star)
ORDER BY id_a, id_b
"""


def embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs (>= 0.4): blocked-matmul candidates +
    sequential-fold exact re-score (ops.similarity.all_pairs_cosine_exact).
    The 100 TB path is the LSH-bucketed embedding_near_dups op."""
    from apollo_spark.ops.similarity import all_pairs_cosine_exact

    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return (
        all_pairs_cosine_exact(e, threshold=0.4, id_col="vec_id", vec_col="v")
        .select("id_a", "id_b", F.round("score", 4).alias("score"))
        .orderBy("id_a", "id_b")
    )


ORACLE_EMB_NEAR_DUP = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS score
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
ORDER BY id_a, id_b
"""


def orders_by_year_rangejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: o_orderdate into broadcast year intervals
    (ops.relational.range_join -> BroadcastNestedLoopJoin on a 7-row dim),
    then aggregate per interval."""
    from datetime import date

    from apollo_spark.ops.relational import range_join

    o = _t(spark, sf_dir, "orders")
    intervals = spark.createDataFrame(
        [(y, date(y, 1, 1), date(y + 1, 1, 1)) for y in range(1992, 1999)],
        "order_year int, lo date, hi date",
    )
    return (
        range_join(o, F.broadcast(intervals), on=[], left_point="o_orderdate", right_lo="lo", right_hi="hi")
        .groupBy("order_year")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
        .orderBy("order_year")
    )


ORACLE_RANGEJOIN = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM orders WHERE year(o_orderdate) BETWEEN 1992 AND 1998
GROUP BY 1 ORDER BY 1
"""


def _doc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared near-dup component table (ops.dedup.doc_component_table:
    capped bigram-Jaccard >= 0.2 edges -> connected components) consumed by
    near_dup_components, dedup_keep_best, and dup_aware_sample_weights.

    When APOLLO_SPARK_ARTIFACT_DIR is set (bench.py sets a per-run tmpdir;
    a production job points it at the lake), the table is built ONCE and
    persisted as a TxTable artifact keyed by the corpus dir — the
    "dedup once, consume everywhere" shape: the first consumer pays the
    edge shuffle + CC rounds, every later consumer reads the committed
    snapshot. Unset (the driver's gate), each query builds self-contained
    so its oracle replays the full trajectory."""
    import os as _os

    from apollo_spark.ops.dedup import train_or_load_components

    d = _t(spark, sf_dir, "documents")
    art = _os.environ.get("APOLLO_SPARK_ARTIFACT_DIR")
    path = None
    if art:
        tag = sf_dir.strip("/").replace("/", "_")
        path = f"{art}/doc_components_{tag}"
    return train_or_load_components(
        d, path=path, n=2, threshold=0.2, max_df=None, max_df_frac=0.04, frac_floor=1024
    )


def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over exact bigram-Jaccard >= 0.2 edges:
    iterative min-label propagation (ops.dedup.connected_components), the
    grouping step of near-dedup. Oracle = recursive-CTE min reachability.

    Edge generation rides the CAPPED inverted index (scale-relative hot-
    shingle cap with frac_floor=1024): this query's certified surface is the
    GROUPING step — losslessness of the pair tier is certified separately by
    ngram_jaccard_dup_pairs, and reusing the lossless quadratic here cost
    1327 s at sf1 (~300x for 10x data, measured round 5) vs ~4 s at sf0.1.
    At the gate SFs (<=5000 docs < frac_floor) no shingle can exceed the
    cutoff, so capped == lossless and the exact oracle still hash-gates every
    run; above it, the cap is the documented 100 TB semantics. The table
    itself is the shared _doc_components artifact (round 7): built once per
    corpus, consumed by all three component queries."""
    return _doc_components(spark, sf_dir).orderBy("doc_id")


ORACLE_NEAR_DUP_CC = r"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
  WHERE len(t) >= 1
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id ORDER BY doc_id
"""


def knn_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 with n_probe = n_clusters: probing every inverted list makes
    IVF EXACT, so the brute-force oracle applies — this pins the correctness
    of the cluster/probe/rescore machinery itself."""
    from apollo_spark.ops.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    return (
        ivf_topk(e, q, k=5, n_clusters=8, n_probe=8, id_col="vec_id", vec_col="v", q_id_col="q_id", q_vec_col="qv")
        .select("q_id", "vec_id", "rank", F.round("score", 4).alias("score"))
        .orderBy("q_id", "rank")
    )


def knn_ivf_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 probing 4/16 lists — the 100 TB ANN path (approximate ->
    rows-only check; recall vs brute force is pinned in tests/test_ops.py)."""
    from apollo_spark.ops.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    return (
        ivf_topk(e, q, k=5, n_clusters=16, n_probe=4, id_col="vec_id", vec_col="v", q_id_col="q_id", q_vec_col="qv")
        .select("q_id", "vec_id", "rank", F.round("score", 4).alias("score"))
        .orderBy("q_id", "rank")
    )


def knn_ivf_lattice_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE IVF, hash-gated end-to-end: the float-kmeans IVF path
    (knn_ivf_approx) can't be oracle-gated because its centroid training
    isn't SQL-replayable, so this twin builds the inverted lists with the
    ENGINE-EXACT integer-lattice k-means (ops/clustering.py, 2 unrolled
    Lloyd rounds, k=8) — every training step is integer arithmetic DuckDB
    replays bit-for-bit. Corpus rows index to their nearest FINAL centroid
    (exact integer distances, ties to the smaller cluster id); each query
    probes its 2 nearest lists and candidates re-score with the same cosine
    the gated brute-force query mirrors. This pins the approximate probe
    path itself — recall loss vs brute force is a property of the index, not
    an excuse to leave the plumbing ungated."""
    from apollo_spark.ops.clustering import kmeans_lattice, lattice_final_assign

    e = _t(spark, sf_dir, "embeddings")
    _, cent = kmeans_lattice(e, k=8, iters=2)
    assign, dist = lattice_final_assign(e, cent)
    wq = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("cluster").asc())
    probed = (
        dist.filter(F.col("vec_id") < 3)
        .withColumnRenamed("vec_id", "q_id")
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select("q_id", "cluster")
    )
    ev = e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    qv = ev.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        assign.join(probed, "cluster")
        .join(ev, "vec_id")
        .join(F.broadcast(qv), "q_id")
        .withColumn("score", cosine(F.col("v"), F.col("qv")))
    )
    wk = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 5)
        .select("q_id", "vec_id", "rank", F.round("score", 4).alias("score"))
        .orderBy("q_id", "rank")
    )


def _lattice_common_ctes(k: int | str, iters: int) -> list[str]:
    """Shared unrolled lattice-k-means CTE prefix (training rounds, final
    assignment, double-cast vectors) for every oracle that replays the
    engine-exact integer k-means: knn_ivf_lattice_approx and
    semantic_dedup_lattice. ``k`` may be an int literal or a SQL scalar
    expression (a corpus-sized subquery — SemDeDup's k-grows-with-N
    blocking, so the oracle replays the SAME k the Spark query derives at
    any scale factor)."""
    ctes = [
        """long AS (
  SELECT vec_id, i AS d,
         CAST(FLOOR((CAST(embedding[i + 1] AS DOUBLE) + 8.0) * 1000000.0) AS BIGINT) AS xi
  FROM embeddings, LATERAL (SELECT unnest(range(0, len(embedding))) AS i) t(i)
)""",
        f"""c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, d, xi AS ci FROM long WHERE vec_id < {k})""",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""a{it} AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT l.vec_id, c.cluster, SUM((l.xi - c.ci) * (l.xi - c.ci)) AS dist,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
                              ORDER BY SUM((l.xi - c.ci) * (l.xi - c.ci)) ASC, c.cluster ASC) AS rn
    FROM long l JOIN {prev} c USING (d)
    GROUP BY l.vec_id, c.cluster)
  WHERE rn = 1
)"""
        )
        ctes.append(
            f"""c{it} AS (
  SELECT a.cluster, l.d, SUM(l.xi) // COUNT(*) AS ci
  FROM long l JOIN a{it} a USING (vec_id)
  GROUP BY a.cluster, l.d
)"""
        )
        prev = f"c{it}"
    ctes.append(
        f"""fdist AS (
  SELECT l.vec_id, c.cluster, SUM((l.xi - c.ci) * (l.xi - c.ci)) AS dist
  FROM long l JOIN {prev} c USING (d)
  GROUP BY l.vec_id, c.cluster
)""",
    )
    ctes.append(
        """fassign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM fdist) WHERE rn = 1
)"""
    )
    ctes.append(
        """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"""
    )
    return ctes


def _ivf_lattice_oracle(k: int = 8, iters: int = 2, probe: int = 2, topk: int = 5) -> str:
    """Mirror of knn_ivf_lattice_approx: the unrolled lattice k-means CTEs
    (same as _kmeans_oracle), nearest-final-centroid indexing, top-``probe``
    list selection per query, exact cosine rescore (knn_bruteforce's mirror)."""
    ctes = _lattice_common_ctes(k, iters)
    ctes.append(
        f"""probed AS (
  SELECT vec_id AS q_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM fdist WHERE vec_id < 3) WHERE rn <= {probe}
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
scored AS (
  SELECT p.q_id, a.vec_id,
         list_dot_product(e.v, q.v) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS score
  FROM fassign a JOIN probed p USING (cluster)
  JOIN e ON e.vec_id = a.vec_id
  JOIN e q ON q.vec_id = p.q_id
),
ranked AS (
  SELECT q_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, rank, ROUND(score, 4) AS score
FROM ranked WHERE rank <= {topk} ORDER BY q_id, rank"""
    )


ORACLE_IVF_LATTICE = _ivf_lattice_oracle(k=8, iters=2, probe=2, topk=5)


SEMDEDUP_TARGET_CLUSTER_ROWS = 250
# The oracle derives the SAME k from the SAME corpus count the Spark query
# reads, so the hash gate survives at any scale factor (k=8 at every gate SF
# <= sf0.1; grows past that).
SEMDEDUP_K_SQL = (
    "(SELECT GREATEST(8, CAST(CEIL(COUNT(*) / "
    f"{SEMDEDUP_TARGET_CLUSTER_ROWS}.0) AS BIGINT)) FROM embeddings)"
)


def semdedup_k(n_rows: int, target: int = SEMDEDUP_TARGET_CLUSTER_ROWS) -> int:
    """SemDeDup's blocking contract: cluster count GROWS with the corpus
    (k = max(8, ceil(N/target))) so the within-cluster pairwise prune stays
    O(N * target) — linear in N — instead of O(N^2 / k_fixed). Mirrors
    SEMDEDUP_K_SQL exactly (CEIL on a *.0 division == math.ceil on ints)."""
    import math

    return max(8, math.ceil(n_rows / target))


def semantic_dedup_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated twin of semantic_dedup_docs: SemDeDup's float k-means
    isn't SQL-replayable, so this variant clusters with the ENGINE-EXACT
    integer-lattice k-means (same replayable training as
    knn_ivf_lattice_approx) and prunes with the PAIRWISE first-occurrence
    rule — drop v iff ANY lower-id vector in its cluster has cosine >= 0.35
    (the driver corpus has NO planted embedding near-dups — max pairwise
    cosine is ~0.5 — so the dup-grade 0.93 threshold would never fire; 0.35
    sits in the redundancy tail and actually exercises the prune at every
    gate SF)
    (one self-join + anti-join; the greedy kept-set variant stays in
    ops.similarity.semantic_dedup). Work is bounded by the cluster blocking
    with k GROWING with the corpus (semdedup_k: k = max(8, ceil(N/250)) —
    the k-proportional-to-N half of SemDeDup's tradeoff, so the prune is
    O(N * 250), linear, not O(N^2/8); round-5 verdict's one scale-killer).
    The oracle derives the identical k from the identical COUNT(*)
    (SEMDEDUP_K_SQL), so both cluster assignment and every cosine comparison
    still replay bit-for-bit in DuckDB at ANY scale factor (sequential
    left-to-right double folds on both engines)."""
    from apollo_spark.ops.clustering import kmeans_lattice, lattice_final_assign

    e = _t(spark, sf_dir, "embeddings")
    k = semdedup_k(e.count())
    _, cent = kmeans_lattice(e, k=k, iters=2)
    assign, _ = lattice_final_assign(e, cent)
    ev = e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    a = assign.join(ev, "vec_id")
    # within-cluster x_id < y_id scoring via applyInPandas (chunked numpy
    # pair tensors, cumsum fold == the JVM/DuckDB sequential dot bit-for-bit;
    # see ops.similarity.cluster_pairwise_cosine) — the relational join
    # shipped both vectors per pair and interpreted the fold
    from apollo_spark.ops.similarity import cluster_pairwise_cosine

    dropped = (
        cluster_pairwise_cosine(a, mode="lt")
        .filter(F.col("score") >= F.lit(0.35))
        .select(F.col("y_id").alias("vec_id"))
        .distinct()
    )
    return (
        assign.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cluster")
        .orderBy("vec_id")
    )


def _semantic_lattice_oracle(
    k: int | str = SEMDEDUP_K_SQL, iters: int = 2, threshold: float = 0.93
) -> str:
    """Mirror of semantic_dedup_lattice: shared lattice-k-means CTEs +
    within-cluster pairwise cosine prune via NOT EXISTS. ``k`` defaults to
    the corpus-derived subquery so the oracle scales its blocking exactly
    as the engine does."""
    ctes = _lattice_common_ctes(k, iters)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
av AS (
  SELECT a.vec_id, a.cluster, e.v FROM fassign a JOIN e USING (vec_id)
)
SELECT y.vec_id, y.cluster
FROM av y
WHERE NOT EXISTS (
  SELECT 1 FROM av x
  WHERE x.cluster = y.cluster AND x.vec_id < y.vec_id
    AND list_dot_product(x.v, y.v)
        / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) >= {threshold}
)
ORDER BY vec_id"""
    )


ORACLE_SEMANTIC_LATTICE = _semantic_lattice_oracle(k=SEMDEDUP_K_SQL, iters=2, threshold=0.35)


def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end on driver data: documents' text bytes
    as opaque binary payloads -> Arrow-batched mapInPandas feature extraction
    (deterministic fake encoder; real codec slots into the same stage).
    Hash-seeded gaussians aren't SQL-expressible -> rows-only check."""
    from apollo_spark.ops.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("payload")
    )
    feats = extract_features(d, dim=16)
    return feats.select(
        "media_id",
        F.round(F.aggregate(F.transform("features", lambda x: x.cast("double")), F.lit(0.0), lambda a, v: a + v * v), 4).alias(
            "feat_sq_norm"
        ),
        F.size("features").alias("dim"),
    ).orderBy("media_id")


def media_real_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-gated end-to-end: a 4x4 P6 PPM is synthesized
    JVM-side per document (md5-derived raster bytes), decoded by the in-tree
    pure-numpy PPM codec inside Arrow-batched mapInPandas, reduced to the
    16-dim block-mean feature, and the float32 feature math is mirrored
    bit-for-bit in DuckDB (hex-pair bytes + CAST AS FLOAT truncation). This is
    the multimodal tier with no fake anywhere in the path."""
    from apollo_spark.ops.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.concat(
        F.md5(F.encode(F.col("text"), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("a")), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("b")), "utf-8")),
    )
    payload = F.concat(F.encode(F.lit("P6\n4 4\n255\n"), "utf-8"), F.unhex(hx))
    media = d.select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    feats = extract_features(media, dim=16, fake=False)
    sq = F.aggregate(
        F.transform("features", lambda x: x.cast("double")), F.lit(0.0), lambda a, v: a + v * v
    )
    return feats.select("media_id", F.round(sq, 6).alias("feat_sq_norm")).orderBy("media_id")


def _media_real_oracle() -> str:
    """Mirror of media_real_image_features: pixel p's gray block-mean is
    ((b(3p)+b(3p+1)+b(3p+2))/3)/255 truncated to float32; squares sum in the
    same left-assoc order as the Spark-side sequential fold."""
    terms = []
    for p in range(16):
        bs = [f"CAST('0x' || substr(hx, {2 * k + 1}, 2) AS INT)" for k in range(3 * p, 3 * p + 3)]
        gray = f"(({' + '.join(bs)}) / 3.0) / 255.0"
        terms.append(f"CAST(CAST({gray} AS FLOAT) AS DOUBLE)")
    acc = "0.0"
    for t in terms:
        acc = f"({acc} + __T__)".replace("__T__", f"{t} * {t}")
    return f"""
WITH h AS (
  SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS hx
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id AS media_id, ROUND({acc}, 6) AS feat_sq_norm
FROM h ORDER BY media_id
"""


ORACLE_MEDIA_REAL = _media_real_oracle()


def media_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode, oracle-gated end-to-end: the same md5-derived 4x4
    raster as media_real_image_features is ENCODED to an 8-bit truecolor PNG
    inside an Arrow-batched pandas stage (zlib deflate; scanline filters
    Sub/Up/Average/Paeth so every unfilter branch is in the gated path),
    then decoded by the pure-stdlib in-tree PNG codec
    (ops.multimodal.decode_png: chunk walk + CRC verify + inflate +
    per-scanline reconstruction) via the normal decode_features dispatch.
    Encode→decode is the identity on the raster, so the DuckDB oracle is the
    same bit-for-bit float32 feature mirror as the PPM query — any codec bug
    breaks the hash."""
    from apollo_spark.ops.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.concat(
        F.md5(F.encode(F.col("text"), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("a")), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("b")), "utf-8")),
    )
    raster = d.select(F.col("doc_id").alias("media_id"), F.unhex(hx).alias("raw"))

    def _encode(batches):
        import numpy as np
        import pandas as pd

        from apollo_spark.ops.multimodal import encode_png

        for pdf in batches:
            payloads = [
                encode_png(
                    np.frombuffer(raw, dtype=np.uint8).reshape(4, 4, 3),
                    filters=[1, 2, 3, 4],
                )
                for raw in pdf["raw"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    media = raster.mapInPandas(_encode, "media_id long, payload binary")
    feats = extract_features(media, dim=16, fake=False)
    sq = F.aggregate(
        F.transform("features", lambda x: x.cast("double")), F.lit(0.0), lambda a, v: a + v * v
    )
    return feats.select("media_id", F.round(sq, 6).alias("feat_sq_norm")).orderBy("media_id")


def media_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode, oracle-gated end-to-end: the same md5-derived 4x4
    raster as media_real_image_features is ENCODED to an exact-palette
    GIF89a inside an Arrow-batched pandas stage (interlaced for odd doc_ids
    so both row orders are in the gated path), then decoded by the
    pure-stdlib in-tree GIF codec (ops.gif.decode_gif: block walk + LZW
    with deferred width change + de-interlace) via the normal
    decode_features dispatch. Encode->decode is the identity on the raster
    (<= 16 colors always fit the exact palette), so the DuckDB oracle is
    the same bit-for-bit float32 feature mirror as the PPM/PNG queries —
    any codec bug breaks the hash."""
    from apollo_spark.ops.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.concat(
        F.md5(F.encode(F.col("text"), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("a")), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("b")), "utf-8")),
    )
    raster = d.select(F.col("doc_id").alias("media_id"), F.unhex(hx).alias("raw"))

    def _encode(batches):
        import numpy as np
        import pandas as pd

        from apollo_spark.ops.gif import encode_gif

        for pdf in batches:
            payloads = [
                encode_gif(
                    np.frombuffer(raw, dtype=np.uint8).reshape(4, 4, 3),
                    interlace=bool(mid % 2),
                )
                for mid, raw in zip(pdf["media_id"], pdf["raw"])
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    media = raster.mapInPandas(_encode, "media_id long, payload binary")
    feats = extract_features(media, dim=16, fake=False)
    sq = F.aggregate(
        F.transform("features", lambda x: x.cast("double")), F.lit(0.0), lambda a, v: a + v * v
    )
    return feats.select("media_id", F.round(sq, 6).alias("feat_sq_norm")).orderBy("media_id")


def image_ahash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup, end-to-end REAL and oracle-gated: 4x4 P6
    PPMs synthesized JVM-side per document -> in-tree pure-numpy PPM decode
    (ops.multimodal.image_luma, integer R+G+B luma — no float32 to
    reconcile) -> 16-bit average-hash in codegen'd SQL expressions
    (ahash64: bit p = n*luma_p > sum, integer cross-multiplication) ->
    LOSSLESS banded hamming join (ahash_pairs: pigeonhole over
    max_hamming+1 bit-bands, per-band equi-join — the image analog of
    MinHash-LSH banding, no crossJoin). The oracle replays decode, hash,
    and pairing byte-for-byte from the same md5-derived raster."""
    from apollo_spark.ops.multimodal import ahash64, ahash_pairs, image_luma

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.concat(
        F.md5(F.encode(F.col("text"), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("a")), "utf-8")),
        F.md5(F.encode(F.concat(F.col("text"), F.lit("b")), "utf-8")),
    )
    payload = F.concat(F.encode(F.lit("P6\n4 4\n255\n"), "utf-8"), F.unhex(hx))
    media = d.select(F.col("doc_id").alias("media_id"), payload.alias("payload"))
    pairs = ahash_pairs(ahash64(image_luma(media)), max_hamming=2, bits=16)
    return pairs.orderBy("id_a", "id_b")


def _ahash_oracle() -> str:
    """Mirror of image_ahash_near_dups: per-pixel luma from the hex raster,
    integer-threshold aHash, exact popcount pairing (the Spark side's
    banding is lossless, so the plain self-join here yields the same set)."""
    lus = []
    for p in range(16):
        bs = [f"CAST('0x' || substr(hx, {2 * k + 1}, 2) AS INT)" for k in range(3 * p, 3 * p + 3)]
        lus.append(f"({' + '.join(bs)})")
    total = " + ".join(lus)
    bits = [f"CASE WHEN 16 * {lus[p]} > total THEN {1 << p} ELSE 0 END" for p in range(16)]
    return f"""
WITH hx0 AS (
  SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS hx
  FROM documents WHERE text IS NOT NULL
),
t AS (SELECT doc_id, hx, {total} AS total FROM hx0),
ah AS (SELECT doc_id, CAST({" + ".join(bits)} AS BIGINT) AS ahash FROM t)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
FROM ah a JOIN ah b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
ORDER BY id_a, id_b
"""


ORACLE_AHASH_PAIRS = _ahash_oracle()


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram sketch + quantile estimates per
    event_type (ops.sketch.histogram_sketch): the 100 TB answer to exact
    percentiles — the shuffle carries <=32 integer bins per group instead of
    a per-group sort of every value. p50/p95 are deterministic interpolations
    of integer counts; the oracle mirrors bin assignment and interpolation."""
    from apollo_spark.ops.sketch import histogram_quantile, histogram_sketch

    e = _events(spark, sf_dir)
    h = histogram_sketch(e, "value", lo=0.0, hi=512.0, bins=32, group_cols=["event_type"]).persist()
    p50 = histogram_quantile(h, 0.5, lo=0.0, hi=512.0, bins=32, group_cols=["event_type"])
    p95 = histogram_quantile(h, 0.95, lo=0.0, hi=512.0, bins=32, group_cols=["event_type"])
    return scoped_persist(
        p50.select("event_type", F.round("quantile_est", 6).alias("p50"), "total")
        .join(
            p95.select("event_type", F.round("quantile_est", 6).alias("p95")),
            "event_type",
        )
        .select("event_type", "total", "p50", "p95")
        .orderBy("event_type"),
        h,
    )


ORACLE_VALUE_HISTOGRAM = """
WITH h AS (
  SELECT event_type,
         CAST(LEAST(31, GREATEST(0, FLOOR(CAST(value AS DOUBLE) / 16.0))) AS INT) AS bin,
         COUNT(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT event_type, bin, n,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM h
),
q AS (
  SELECT event_type, total,
         MAX(CASE WHEN cum >= CAST(CEIL(0.5 * total) AS BIGINT)
                   AND cum - n < CAST(CEIL(0.5 * total) AS BIGINT)
              THEN ROUND((CAST(bin AS DOUBLE)
                   + CAST(CAST(CEIL(0.5 * total) AS BIGINT) - (cum - n) AS DOUBLE)
                     / CAST(n AS DOUBLE)) * 16.0, 6) END) AS p50,
         MAX(CASE WHEN cum >= CAST(CEIL(0.95 * total) AS BIGINT)
                   AND cum - n < CAST(CEIL(0.95 * total) AS BIGINT)
              THEN ROUND((CAST(bin AS DOUBLE)
                   + CAST(CAST(CEIL(0.95 * total) AS BIGINT) - (cum - n) AS DOUBLE)
                     / CAST(n AS DOUBLE)) * 16.0, 6) END) AS p95
  FROM c GROUP BY event_type, total
)
SELECT event_type, total, p50, p95 FROM q ORDER BY event_type
"""


def bpe_merge_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (ops.text.bpe_learn_merges): 8
    merge rounds over the documents corpus, each round one word-table
    groupBy + a deterministic argmax + a greedy merge via the doubled-space
    replace invariant. The oracle unrolls the same 8 rounds in SQL — the
    whole trajectory (counts, tie-breaks, merge applications) is
    engine-exact integer/string arithmetic."""
    from apollo_spark.ops.text import bpe_learn_merges

    d = _t(spark, sf_dir, "documents")
    return bpe_learn_merges(d, n_merges=8).orderBy("merge_rank")


def _bpe_ctes(n_merges: int = 8, max_word_len: int = 24) -> str:
    """Shared unrolled-iteration CTE chain mirroring bpe_learn_merges: the
    word table w0..wk (word carried alongside its symbol string) and the
    per-round best pairs b1..bk."""
    parts = [
        f"""WITH w0 AS (
  SELECT w, ' ' || array_to_string(list_filter(string_split(w, ''), x -> x <> ''), '  ') || ' ' AS s, n
  FROM (
    SELECT w, COUNT(*) AS n FROM (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w FROM documents
    ) WHERE length(w) BETWEEN 1 AND {max_word_len} GROUP BY w
  )
)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(
            f"""p{i} AS (
  SELECT p[1] AS l, p[2] AS r, CAST(SUM(n) AS BIGINT) AS c
  FROM (
    SELECT n, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p
    FROM (SELECT string_split(trim(s), '  ') AS a, n FROM {prev})
  ) GROUP BY 1, 2
),
b{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l ASC, r ASC LIMIT 1),
w{i} AS (
  SELECT w, replace(s, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS s, n
  FROM {prev} CROSS JOIN b{i} b
)"""
        )
        # the merged-word table w{i} feeds the next round
    return ",\n".join(parts)


def _bpe_oracle(n_merges: int = 8, max_word_len: int = 24) -> str:
    """Unrolled-iteration DuckDB mirror of bpe_learn_merges."""
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, l AS left, r AS right, c AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return _bpe_ctes(n_merges, max_word_len) + f"\n{selects}\nORDER BY merge_rank"


ORACLE_BPE_MERGES = _bpe_oracle(8)


def bpe_encode_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE parity: learn 8 merges on the corpus, then apply them to
    the distinct-word table and report exact per-source token mass
    (ops.text.bpe_token_counts). Long words bypass BPE one-char-per-token;
    the oracle replays training AND encoding in one unrolled SQL chain."""
    from apollo_spark.ops.text import bpe_learn_merges, bpe_token_counts

    d = _t(spark, sf_dir, "documents")
    rules = [(r.left, r.right) for r in bpe_learn_merges(d, 8).orderBy("merge_rank").collect()]
    return bpe_token_counts(d, rules).orderBy("source")


def _bpe_encode_oracle(n_merges: int = 8, max_word_len: int = 24) -> str:
    return (
        _bpe_ctes(n_merges, max_word_len)
        + f""",
occ AS (
  SELECT source AS g, w, COUNT(*) AS n_occ FROM (
    SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w FROM documents
  ) WHERE length(w) > 0 GROUP BY 1, 2
),
enc AS (
  SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sym FROM w{n_merges}
)
SELECT g AS source,
       CAST(SUM(n_occ) AS BIGINT) AS n_words,
       CAST(SUM(n_occ * length(w)) AS BIGINT) AS n_chars,
       CAST(SUM(n_occ * COALESCE(n_sym, length(w))) AS BIGINT) AS n_bpe_tokens
FROM occ LEFT JOIN enc USING (w)
GROUP BY g ORDER BY source
"""
    )


ORACLE_BPE_ENCODE = _bpe_encode_oracle(8)


def simhash_doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (xxhash64-based -> not reproducible in
    ANSI SQL; rows-only check)."""
    from apollo_spark.ops.dedup import simhash64

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash64(F.col("text")).alias("simhash")).orderBy("doc_id")


# --------------------------------------------------------------------------
# corpus curation tier: sampling, ordering, decontamination, PII
# --------------------------------------------------------------------------


def corpus_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mix step: cap every source at 600 whitespace tokens in
    doc_id order (the crossing document is kept). One shuffle on source;
    per-source window — the 100 TB mix-building primitive."""
    from apollo_spark.ops.corpus import token_budget_sample

    d = _t(spark, sf_dir, "documents")
    return (
        token_budget_sample(d, budget_tokens=600, by="source", order_col="doc_id")
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    )


ORACLE_TOKEN_BUDGET = r"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM toks
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM cum WHERE cum_tokens - n_tokens < 600 ORDER BY doc_id
"""


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (ops.corpus.pack_sequences):
    deterministic md5-ordered token tape, chunked into 512-token training
    sequences. Bucketed running sums (256-way parallel) + broadcast bucket
    offsets — NOT a single global window; exact BIGINT layout is
    reproduced by the oracle's windowed cumulative sums."""
    from apollo_spark.ops.corpus import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(d, seq_len=512).orderBy("doc_id")


def _packing_sql(source_rel: str, seq_len: int) -> str:
    """The pack_sequences oracle (CTEs + final select, no leading WITH) over
    an arbitrary (doc_id, text) relation — ONE definition shared by the
    standalone gate and the curation-pipeline composition so the layout
    arithmetic can never silently diverge between them."""
    return rf"""pk_base AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM {source_rel}
),
pk_cum AS (
  SELECT doc_id, b, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY b ORDER BY h ASC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_in
  FROM pk_base
),
pk_boff AS (
  SELECT b, CAST(COALESCE(SUM(bt) OVER (ORDER BY b ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM (SELECT b, SUM(n_tokens) AS bt FROM pk_base GROUP BY b)
)
SELECT doc_id, n_tokens,
       off + cum_in - n_tokens AS start_pos,
       CAST(FLOOR((off + cum_in - n_tokens) / {seq_len}) AS BIGINT) AS seq_first,
       CAST(FLOOR((off + cum_in - 1) / {seq_len}) AS BIGINT) AS seq_last,
       (off + cum_in - n_tokens) % {seq_len} AS offset_in_seq
FROM pk_cum JOIN pk_boff USING (b)
WHERE n_tokens > 0
ORDER BY doc_id
"""


ORACLE_SEQ_PACKING = "WITH " + _packing_sql("documents", 512)


def source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mixture (alpha=0.5, XLM-R style) over
    per-source token mass (ops.corpus.mixture_weights_temperature). The pow
    is one IEEE op on an exact integer; the normalizing sum rides
    DECIMAL(38,6) so it is order-independent in both engines."""
    from apollo_spark.ops.corpus import mixture_weights_temperature, whitespace_tokens

    d = _t(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(whitespace_tokens(F.col("text"))).cast("long")).alias("group_tokens")
    )
    out = mixture_weights_temperature(per_src, alpha=0.5, by="source")
    return out.select(
        "source", "n_tokens", "smoothed_mass", F.round("weight", 6).alias("weight")
    ).orderBy("source")


ORACLE_TEMPERATURE_WEIGHTS = r"""
WITH t AS (
  SELECT source,
         CAST(SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
p AS (
  SELECT source, n_tokens,
         CAST(ROUND(pow(CAST(n_tokens AS DOUBLE), 0.5), 6) AS DECIMAL(38,6)) AS pm
  FROM t
)
SELECT source, n_tokens,
       CAST(pm AS DOUBLE) AS smoothed_mass,
       ROUND(CAST(pm AS DOUBLE) / CAST((SELECT SUM(pm) FROM p) AS DOUBLE), 6) AS weight
FROM p ORDER BY source
"""


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain in one plan (ops.curation.curate): exact
    dedup -> en/quality/length filter -> 512-token sequence packing. Every
    stage is individually gated elsewhere; this entry gates their
    COMPOSITION — the oracle chains the same dedup, quality, and packing
    SQL over the intersected survivor set."""
    from apollo_spark.ops.curation import curate

    d = _t(spark, sf_dir, "documents")
    return curate(d, seq_len=512).orderBy("doc_id")


def _curation_oracle(seq_len: int = 512) -> str:
    dedup_ids = ORACLE_DEDUP_EXACT.strip().removesuffix("ORDER BY doc_id").strip()
    quality_q = ORACLE_QUALITY_FILTER.strip().removesuffix("ORDER BY doc_id").strip()
    return rf"""
WITH sel AS (
  SELECT doc_id FROM ({dedup_ids})
  INTERSECT
  SELECT doc_id FROM ({quality_q})
),
src AS (SELECT d.doc_id, d.text FROM documents d JOIN sel USING (doc_id)),
{_packing_sql("src", seq_len)}"""


ORACLE_CURATION = _curation_oracle(512)


def doc_nfc_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC cleanup (ops.text.nfc_normalize, Arrow-batched pandas
    UDF): per document, the digest of the canonically-composed text and
    whether normalization changed it. Python unicodedata and DuckDB's
    nfc_normalize implement the same UAX#15 tables, so the digests are
    hash-gateable — a rare oracle-able Python-row-path op."""
    from apollo_spark.ops.text import nfc_normalize

    d = _t(spark, sf_dir, "documents")
    norm = nfc_normalize(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("nfc_md5"),
        (norm != F.col("text")).cast("int").alias("changed"),
        F.length(norm).alias("n_chars_nfc"),
    ).orderBy("doc_id")


ORACLE_NFC = """
SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
       CAST(nfc_normalize(text) <> text AS INT) AS changed,
       CAST(length(nfc_normalize(text)) AS INT) AS n_chars_nfc
FROM documents ORDER BY doc_id
"""


def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: global rank by md5(doc_id) —
    reproducible pseudo-random order, executed as a range-partitioned
    distributed sort (no single-node ordering)."""
    from apollo_spark.ops.corpus import training_order

    d = _t(spark, sf_dir, "documents")
    return training_order(d, id_col="doc_id").select("doc_id", "shuffle_key", "train_rank").orderBy("train_rank")


ORACLE_TRAIN_ORDER = """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS train_rank
FROM documents ORDER BY train_rank
"""


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: documents sharing any word 4-gram with the
    'benchmark' slice (doc_id % 29 == 0 stands in for a held-out eval set).
    Benchmark grams broadcast (eval sets are tiny); corpus side is a narrow
    explode + broadcast join + one count shuffle."""
    from apollo_spark.ops.corpus import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 29 == 0)
    corpus = d.filter(F.col("doc_id") % 29 != 0)
    return (
        decontaminate(corpus, bench, id_col="doc_id", text_col="text", n=4)
        .withColumn("n_shared", F.col("n_shared").cast("long"))
        .orderBy("doc_id")
    )


ORACLE_DECONTAM = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - 2)) AS i) t(i)
  WHERE len(w) >= 4
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0),
docg AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 29 <> 0)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM docg JOIN bench USING (g) GROUP BY doc_id ORDER BY doc_id
"""


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over a derived column that plants synthetic PII
    (the corpus itself is clean, so the plant makes the gate non-trivial):
    per-source totals of emails/IPs/phones found plus scrubbed length delta.
    All JVM regexp_count/regexp_replace — no Python in the row path."""
    from apollo_spark.ops.text import pii_counts, pii_scrub

    d = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel +1 555-01"),
        F.format_string("%02d", (F.col("doc_id") % 100).cast("int")),
    )
    counts = pii_counts(planted)
    return (
        d.withColumn("__p", planted)
        .select(
            "source",
            counts["email"].alias("__e"),
            counts["ipv4"].alias("__i"),
            counts["phone"].alias("__ph"),
            (F.length("__p") - F.length(pii_scrub(F.col("__p")))).alias("__delta"),
        )
        .groupBy("source")
        .agg(
            F.sum("__e").alias("n_emails"),
            F.sum("__i").alias("n_ips"),
            F.sum("__ph").alias("n_phones"),
            F.sum("__delta").alias("redacted_chars"),
        )
        .orderBy("source")
    )


ORACLE_PII = r"""
WITH planted AS (
  SELECT source,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.7 tel +1 555-01' || format('{:02d}', doc_id % 100) AS p
  FROM documents
),
scored AS (
  SELECT source,
         len(regexp_extract_all(p, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
         len(regexp_extract_all(p, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS i,
         len(regexp_extract_all(p, '\+?\d[\d\- ]{7,}\d')) AS ph,
         length(p) - length(
           regexp_replace(
             regexp_replace(
               regexp_replace(p, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
             '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g')
         ) AS delta
  FROM planted
)
SELECT source, CAST(SUM(e) AS BIGINT) AS n_emails, CAST(SUM(i) AS BIGINT) AS n_ips,
       CAST(SUM(ph) AS BIGINT) AS n_phones, CAST(SUM(delta) AS BIGINT) AS redacted_chars
FROM scored GROUP BY source ORDER BY source
"""


def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of every embedding: per-vector min/max +
    an md5 digest of the code array (digest instead of the raw array so the
    hash compare is engine-portable). Narrow map, no shuffle; floor(x+0.5)
    rounding because round() tie behavior differs across engines."""
    from apollo_spark.ops.similarity import quantize_int8

    e = _t(spark, sf_dir, "embeddings")
    q = quantize_int8(e, id_col="vec_id", vec_col="embedding")
    return q.select(
        "vec_id",
        "vmin",
        "vmax",
        F.md5(F.concat_ws(",", F.transform(F.col("codes"), lambda c: c.cast("string")))).alias(
            "code_digest"
        ),
    ).orderBy("vec_id")


ORACLE_QUANT = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv FROM embeddings
),
s AS (
  SELECT vec_id, vv, list_min(vv) AS vmin, list_max(vv) AS vmax FROM v
)
SELECT vec_id, vmin, vmax,
       md5(array_to_string(
         CASE WHEN vmax = vmin THEN list_transform(vv, x -> 0)
              ELSE list_transform(vv, x -> CAST(FLOOR((x - vmin) / ((vmax - vmin) / 255.0) + 0.5) AS INT))
         END, ',')) AS code_digest
FROM s ORDER BY vec_id
"""


def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-source sampling: keep a doc iff its Knuth hash
    bucket falls under the source's rate (src0 60%, src1 10%, default 30%).
    Membership is a pure function of doc_id — stable across reruns,
    partitionings, and engines; a narrow filter with no shuffle or RNG."""
    from apollo_spark.ops.corpus import stratified_hash_sample

    d = _t(spark, sf_dir, "documents")
    return (
        stratified_hash_sample(d, rates={"src0": 60, "src1": 10}, by="source", id_col="doc_id")
        .select("doc_id", "source", "bucket")
        .orderBy("doc_id")
    )


ORACLE_STRAT_SAMPLE = """
WITH b AS (
  SELECT doc_id, source, (doc_id * 2654435761) % 100 AS bucket FROM documents
)
SELECT doc_id, source, bucket FROM b
WHERE bucket < CASE source WHEN 'src0' THEN 60 WHEN 'src1' THEN 10 ELSE 30 END
ORDER BY doc_id
"""


def semantic_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: cluster, then greedily keep the
    lowest-id representative of every >=0.93-cosine group inside each
    cluster. k-means makes it non-SQL-expressible -> rows-only gate; the
    planted-duplicate behavior is pinned in tests/test_ops.py. n_clusters is
    auto-derived (k = max(16, ceil(N/250))) so the per-cluster prune stays
    linear in corpus size — SemDeDup's own k-grows-with-N blocking."""
    from apollo_spark.ops.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(e, threshold=0.93).orderBy("vec_id")


# --------------------------------------------------------------------------
# additional TPC-H-shaped relational queries
# --------------------------------------------------------------------------


def shipping_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12-shaped: bucket order->ship delay into 30-day bands, conditional
    counts of high- vs low-priority orders per band. One fact-fact join on
    orderkey + one agg shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .filter(delay >= 0)
        .withColumn("delay_band", F.floor(delay / 30).cast("long"))
        .groupBy("delay_band")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
        .orderBy("delay_band")
    )


ORACLE_SHIPMODE = """
SELECT CAST(FLOOR(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) / 30.0) AS BIGINT) AS delay_band,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) >= 0
GROUP BY 1 ORDER BY delay_band
"""


def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11-shaped: parts whose revenue exceeds 1/1400 of total revenue.
    Both the per-part and the global sum accumulate in decimal from base
    rows (order-independent), so the threshold compare is deterministic;
    the one-row global side is a broadcast cross join."""
    l = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = l.groupBy("l_partkey").agg(dsum(rev).alias("value"))
    total = l.agg(dsum(rev).alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 1400 > F.col("__total"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
    )


ORACLE_PART_CONC = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS value
  FROM lineitem GROUP BY l_partkey
),
total AS (
  SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS t
  FROM lineitem
)
SELECT l_partkey, value FROM per_part, total
WHERE value * 1400 > t ORDER BY value DESC, l_partkey ASC
"""


def late_delivery_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21-shaped semi+anti combo: suppliers that shipped > 60 days after
    the order date on a multi-supplier order where NO other supplier was
    late — the classic 'who alone held up the order' scan. Three passes over
    lineitem keyed on l_orderkey (co-partitioned shuffles) + broadcast
    supplier dim."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    late = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .filter(delay > 60)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    all_pairs = l.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")).distinct()
    other_exists = late.alias("x").join(
        all_pairs.alias("y"),
        (F.col("x.ok") == F.col("y.ok")) & (F.col("x.sk") != F.col("y.sk")),
        "left_semi",
    )
    no_other_late = other_exists.alias("x").join(
        late.alias("z"),
        (F.col("x.ok") == F.col("z.ok")) & (F.col("x.sk") != F.col("z.sk")),
        "left_anti",
    )
    return (
        no_other_late.groupBy("sk")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("sk") == s["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


ORACLE_LATE_SUPP = """
WITH late AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
),
all_pairs AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
sole AS (
  SELECT x.ok, x.sk FROM late x
  WHERE EXISTS (SELECT 1 FROM all_pairs y WHERE y.ok = x.ok AND y.sk <> x.sk)
    AND NOT EXISTS (SELECT 1 FROM late z WHERE z.ok = x.ok AND z.sk <> x.sk)
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM sole JOIN supplier ON sk = s_suppkey
GROUP BY s_name ORDER BY numwait DESC, s_name ASC LIMIT 20
"""


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8-shaped market share: per order-year, the fraction of ASIA-region
    revenue supplied by NATION_3's suppliers. 6-way join — every dim side
    broadcasts, lineitem-orders co-shuffle on orderkey; numerator/denominator
    both decimal-exact conditional sums so the ratio is deterministic."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cust_region = (
        c.join(F.broadcast(n.withColumnRenamed("n_nationkey", "__ck")), c["c_nationkey"] == F.col("__ck"))
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("c_custkey").alias("__cust"))
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation"))),
        s["s_nationkey"] == F.col("__sk"),
    ).select(F.col("s_suppkey").alias("__supp"), "supp_nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(cust_region, o["o_custkey"] == F.col("__cust"))  # ASIA customers only
        .join(F.broadcast(supp_nation), l["l_suppkey"] == F.col("__supp"))
        .withColumn("o_year", F.year(F.to_date("o_orderdate")).cast("long"))
    )
    target = F.when(F.col("supp_nation") == "NATION_3", rev.cast("decimal(38,6)")).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.sum(target).cast("double").alias("nation_revenue"),
            dsum(rev).alias("total_revenue"),
        )
        .withColumn("mkt_share", F.col("nation_revenue") / F.col("total_revenue"))
        .orderBy("o_year")
    )


ORACLE_MKT_SHARE = """
WITH base AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS rev, n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN CAST(rev AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS nation_revenue,
       CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN CAST(rev AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
FROM base GROUP BY o_year ORDER BY o_year
"""


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15-shaped: suppliers whose total revenue equals the global maximum.
    The max is a scalar aggregate broadcast back with a crossJoin (the same
    shape every other scalar in this file uses) — distributed partial max,
    no single-partition window over the per-supplier frame; equality is
    exact because both sides are the same decimal-derived doubles."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = l.groupBy("l_suppkey").agg(dsum(rev).alias("total_revenue"))
    mx = per_supp.agg(F.max("total_revenue").alias("__max"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_TOP_SUPP = """
WITH per_supp AS (
  SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
ORDER BY s_suppkey
"""


def substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-duplicate scan (Lee et al. 2022 ExactSubstr): per-doc
    count/fraction of 8-token windows that occur >= 2 times corpus-wide.
    Two bounded shuffles (global window counts + many-to-one positions join);
    dup_frac is a BIGINT/BIGINT IEEE division — engine-exact."""
    from apollo_spark.ops.dedup import duplicated_spans

    d = _t(spark, sf_dir, "documents")
    return (
        duplicated_spans(d, w=8, min_count=2)
        .filter(F.col("n_dup_windows") > 0)
        .orderBy("doc_id")
    )


ORACLE_SPAN_DEDUP = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
  FROM toks WHERE len(t) >= 8
),
wins AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS win FROM pos),
counts AS (SELECT win, COUNT(*) AS c FROM wins GROUP BY win)
SELECT doc_id,
       COUNT(*) AS n_windows,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       CAST(CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM wins JOIN counts USING (win)
GROUP BY doc_id
HAVING CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) > 0
ORDER BY doc_id
"""


def doc_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality score: add-one unigram LM trained on the
    doc_id % 7 == 0 slice (stand-in for the curated target domain), every
    document scored by per-token cross-entropy in nats. Reference LM
    broadcasts; corpus side is one explode + map-side join + one agg."""
    from apollo_spark.ops.text import lm_cross_entropy

    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 7 == 0)
    return lm_cross_entropy(d, ref).orderBy("doc_id")


ORACLE_LM_QUALITY = r"""
WITH ref AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE doc_id % 7 = 0 AND length(trim(text)) > 0
),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM ref GROUP BY term),
scal AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_ref, CAST(COUNT(*) AS BIGINT) AS v_ref
  FROM counts
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       -CAST(SUM(CAST(ln((COALESCE(c, 0) + 1) / (t_ref + v_ref + 1)) AS DECIMAL(38,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS ce
FROM toks LEFT JOIN counts USING (term) CROSS JOIN scal
GROUP BY doc_id
ORDER BY doc_id
"""


def doc_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-shaped CCNet filter: interpolated BIGRAM-LM cross-entropy
    (ops.text.bigram_cross_entropy, lam=0.7 Jelinek-Mercer over an add-one
    unigram floor), trained on the doc_id % 7 == 0 slice. Ref n-gram
    tables broadcast; corpus side is one bigram explode + map-side joins
    + one agg."""
    from apollo_spark.ops.text import bigram_cross_entropy

    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 7 == 0)
    out = bigram_cross_entropy(d, ref, lam=0.7)
    return out.select("doc_id", "n_bigrams", F.round("ce2", 6).alias("ce2")).orderBy("doc_id")


ORACLE_BIGRAM_LM = r"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
ref_uni AS (
  SELECT unnest(t) AS term FROM base WHERE doc_id % 7 = 0
),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM ref_uni GROUP BY term),
scal AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_ref, CAST(COUNT(*) AS BIGINT) AS v_ref FROM counts
),
ref_bi AS (
  SELECT t[i] AS w1, t[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS cb
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s(i)
  WHERE doc_id % 7 = 0 AND len(t) >= 2
  GROUP BY 1, 2
),
toks AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s(i)
  WHERE len(t) >= 2
),
terms AS (
  SELECT doc_id,
         ln(0.7 * (CASE WHEN cu.c > 0 THEN COALESCE(cb, 0) / cu.c ELSE 0.0 END)
            + (1.0 - 0.7) * ((COALESCE(c2.c, 0) + 1) / (t_ref + v_ref + 1))) AS lp
  FROM toks
  LEFT JOIN ref_bi USING (w1, w2)
  LEFT JOIN counts cu ON cu.term = toks.w1
  LEFT JOIN counts c2 ON c2.term = toks.w2
  CROSS JOIN scal
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(-CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ce2
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


def skipgram_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec skip-gram data prep (ops.corpus.skipgram_pairs): hash-
    deterministic frequent-word subsampling -> re-compacted stream ->
    (center, context) pairs within ±2 via offset-explode equi-join (no
    theta-join), top-30 pair counts. The whole pipeline — subsample
    randomness included — replays bit-for-bit in SQL."""
    from apollo_spark.ops.corpus import skipgram_pairs

    d = _t(spark, sf_dir, "documents")
    out = skipgram_pairs(d, window=2, subsample_t=1e-3)
    return out.orderBy(F.col("n").desc(), "center", "context").limit(30)


ORACLE_SKIPGRAM = r"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS w
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s(i)
),
freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_all FROM freq),
kept0 AS (
  SELECT doc_id, pos, w
  FROM toks JOIN freq USING (w) CROSS JOIN tot
  WHERE ('0x' || substr(md5('sg' || doc_id || ':' || pos || ':' || w), 1, 15))::BIGINT
          / 1152921504606846976.0
        < (sqrt((c / t_all) / 0.001) + 1.0) * (0.001 / (c / t_all))
),
kept AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos ASC) - 1 AS p, w
  FROM kept0
)
SELECT a.w AS center, b.w AS context, CAST(COUNT(*) AS BIGINT) AS n
FROM kept a JOIN kept b
  ON a.doc_id = b.doc_id AND abs(a.p - b.p) BETWEEN 1 AND 2
GROUP BY 1, 2
ORDER BY n DESC, center, context
LIMIT 30
"""


def doc_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-filter signals (Rae et al. 2021 Table A1): per-doc
    duplicate-segment fraction + top-bigram/trigram token shares. Integer-
    ratio divisions only — engine-exact."""
    from apollo_spark.ops.text import gopher_repetition

    d = _t(spark, sf_dir, "documents")
    return gopher_repetition(d).orderBy("doc_id")


ORACLE_GOPHER_REP = r"""
WITH base AS (SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
segs AS (SELECT doc_id, unnest(string_split(text, '. ')) AS seg FROM base),
seg_stats AS (
  SELECT doc_id, COUNT(*) AS n_segments, COUNT(DISTINCT seg) AS n_distinct
  FROM segs GROUP BY doc_id
),
toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM base
),
pos2 AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 2
),
c2 AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g, COUNT(*) AS c
  FROM pos2 GROUP BY 1, 2
),
t2 AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top2_frac
  FROM c2 GROUP BY doc_id
),
pos3 AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
),
c3 AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g, COUNT(*) AS c
  FROM pos3 GROUP BY 1, 2
),
t3 AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top3_frac
  FROM c3 GROUP BY doc_id
)
SELECT doc_id, n_segments,
       CAST(n_segments - n_distinct AS DOUBLE) / CAST(n_segments AS DOUBLE) AS dup_seg_frac,
       COALESCE(top2_frac, 0.0) AS top2_frac,
       COALESCE(top3_frac, 0.0) AS top3_frac
FROM seg_stats LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
ORDER BY doc_id
"""


def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet head/middle/tail partition: documents terciled by unigram-LM
    cross-entropy against the doc_id%7==0 reference slice. The tercile is a
    distributed two-phase rank (ops.rank.bucketed_ntile: range-bucket on ce,
    per-bucket window + broadcast offsets) — bit-identical to a global
    NTILE(3) window but never a corpus-sized single task. Fully
    deterministic order (ce, doc_id) keeps both engines' tile assignment
    identical."""
    from apollo_spark.ops.rank import bucketed_ntile
    from apollo_spark.ops.text import lm_cross_entropy

    d = _t(spark, sf_dir, "documents")
    scored = lm_cross_entropy(d, d.filter(F.col("doc_id") % 7 == 0))
    lab = (
        F.when(F.col("nt") == 1, "head").when(F.col("nt") == 2, "middle").otherwise("tail")
    )
    nt = bucketed_ntile(
        scored, F.col("ce"), 3, tiebreak=[F.col("doc_id").asc()], out_col="nt"
    )
    return carry_caches(
        nt.withColumn("bucket", lab)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("ce").alias("min_ce"),
            F.max("ce").alias("max_ce"),
        )
        .orderBy("bucket"),
        nt,
    )


ORACLE_CCNET_BUCKETS = r"""
WITH ref AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE doc_id % 7 = 0 AND length(trim(text)) > 0
),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM ref GROUP BY term),
scal AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_ref, CAST(COUNT(*) AS BIGINT) AS v_ref
  FROM counts
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
scored AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         -CAST(SUM(CAST(ln((COALESCE(c, 0) + 1) / (t_ref + v_ref + 1)) AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS ce
  FROM toks LEFT JOIN counts USING (term) CROSS JOIN scal
  GROUP BY doc_id
),
b AS (SELECT *, NTILE(3) OVER (ORDER BY ce, doc_id) AS nt FROM scored)
SELECT CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(ce) AS min_ce,
       MAX(ce) AS max_ce
FROM b GROUP BY bucket ORDER BY bucket
"""


# --------------------------------------------------------------------------
# sketch tier: HyperLogLog distinct counting + count-min heavy hitters
# --------------------------------------------------------------------------


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HyperLogLog user cardinality — the mergeable-sketch
    answer to COUNT(DISTINCT) at 100 TB (shuffle carries <= 2^p register rows
    per group instead of every distinct key). Gate view is the exact-integer
    register state (register digest + scaled harmonic sum); the float
    estimate is pinned by pytest against exact counts.

    Reference ships no sketches (analytics delegated to Postgres,
    /root/reference/ROADMAP.md:77); this is Druid/Trino-style OLAP surface."""
    from apollo_spark.ops.sketch import hll_registers, hll_summary

    e = _t(spark, sf_dir, "events")
    regs = hll_registers(e, F.col("user_id").cast("string"), ["event_type"], p=10)
    return hll_summary(regs, ["event_type"], p=10).orderBy("event_type")


ORACLE_HLL_USERS = r"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
),
rr AS (
  SELECT event_type, hv >> 50 AS reg_idx,
         CASE WHEN hv % 1125899906842624 = 0 THEN 51
              ELSE 51 - length(format('{:b}', hv % 1125899906842624)) END AS rho
  FROM h
),
regs AS (SELECT event_type, reg_idx, MAX(rho) AS reg FROM rr GROUP BY 1, 2)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_registers,
       CAST(1024 - COUNT(*) AS BIGINT) AS zero_registers,
       CAST((1024 - COUNT(*)) * 2251799813685248
            + SUM((CAST(1 AS BIGINT)) << (51 - reg)) AS BIGINT) AS harmonic_scaled,
       md5(string_agg(CAST(reg_idx AS VARCHAR) || ':' || CAST(reg AS VARCHAR), ','
                      ORDER BY CAST(reg_idx AS VARCHAR) || ':' || CAST(reg AS VARCHAR))) AS register_digest
FROM regs
GROUP BY event_type
ORDER BY event_type
"""


def theta_distinct_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user SET ALGEBRA via fixed-theta sketches (ops.sketch
    theta_*): |clickers|, |purchasers|, |union|, |INTERSECTION|, |click-only|
    — intersection being the operation HLL fundamentally cannot answer
    (Dasgupta et al. 2016). Each sketch is the distinct 1/K hash sample
    retained below 2^60/K; the ``h < T`` filter precedes the distinct
    shuffle, so at 100 TB the wide exchange moves ~1/K of distinct keys and
    zero payload columns. Estimates are |retained|*K — exact integers, so
    the whole composition hash-gates against a DuckDB replay.

    Reference ships no sketches (analytics delegated to Postgres,
    /root/reference/ROADMAP.md:77)."""
    from apollo_spark.ops.sketch import (
        theta_diff,
        theta_estimate,
        theta_intersect,
        theta_sketch,
        theta_union,
    )

    e = _t(spark, sf_dir, "events")
    a = theta_sketch(
        e.filter((F.col("event_type") == "click") & (F.col("value") > 150)), "user_id", log2_k=2
    ).persist()
    b = theta_sketch(
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 150)), "user_id", log2_k=2
    ).persist()
    out = (
        theta_estimate(a, log2_k=2, out_col="est_click_users")
        .crossJoin(theta_estimate(b, log2_k=2, out_col="est_purchase_users"))
        .crossJoin(theta_estimate(theta_union(a, b), log2_k=2, out_col="est_union_users"))
        .crossJoin(theta_estimate(theta_intersect(a, b), log2_k=2, out_col="est_both_users"))
        .crossJoin(theta_estimate(theta_diff(a, b), log2_k=2, out_col="est_click_only_users"))
    )
    return scoped_persist(out, a, b)


ORACLE_THETA_SETOPS = r"""
WITH a AS (
  SELECT DISTINCT ('0x' || substr(md5('theta' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
  WHERE event_type = 'click' AND value > 150 AND user_id IS NOT NULL
    AND ('0x' || substr(md5('theta' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT < 288230376151711744
),
b AS (
  SELECT DISTINCT ('0x' || substr(md5('theta' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
  WHERE event_type = 'purchase' AND value > 150 AND user_id IS NOT NULL
    AND ('0x' || substr(md5('theta' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT < 288230376151711744
)
SELECT
  (SELECT COUNT(*) FROM a) * 4 AS est_click_users,
  (SELECT COUNT(*) FROM b) * 4 AS est_purchase_users,
  (SELECT COUNT(*) FROM (SELECT h FROM a UNION SELECT h FROM b)) * 4 AS est_union_users,
  (SELECT COUNT(*) FROM (SELECT h FROM a INTERSECT SELECT h FROM b)) * 4 AS est_both_users,
  (SELECT COUNT(*) FROM (SELECT h FROM a EXCEPT SELECT h FROM b)) * 4 AS est_click_only_users
"""


def cms_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min-sketch heavy hitters over document tokens: tokens whose CMS
    estimate is >= 0.5% of the corpus (no false negatives; estimates are
    exact integers -> fully oracle-able). The sketch is depth x width = 4096
    cells no matter the corpus size; at 100 TB the candidate probe side
    would be per-partition local top-k instead of full distinct."""
    from apollo_spark.ops.sketch import cms_counts, cms_estimate

    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("token")
    )
    counts = cms_counts(toks, "token", depth=4, width=1024)
    est = cms_estimate(counts, toks.distinct(), "token", depth=4, width=1024)
    truth = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    total = toks.agg(F.count(F.lit(1)).alias("__n"))
    return (
        est.join(truth, "token")
        .crossJoin(total)
        .filter(F.col("cms_count") * 200 >= F.col("__n"))
        .select("token", "cms_count", "true_count")
        .orderBy("token")
    )


ORACLE_CMS_TOKENS = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE length(trim(text)) > 0
),
salts AS (SELECT unnest([0, 1, 2, 3]) AS r),
buckets AS (
  SELECT r,
         ('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || '|' || token), 1, 15))::BIGINT % 1024 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks, salts
  GROUP BY 1, 2
),
cand AS (SELECT DISTINCT token FROM toks),
est AS (
  SELECT c.token, MIN(COALESCE(b.cnt, 0)) AS cms_count
  FROM cand c
  CROSS JOIN salts s
  LEFT JOIN buckets b
    ON b.r = s.r
   AND b.bucket = ('0x' || substr(md5('cms' || CAST(s.r AS VARCHAR) || '|' || c.token), 1, 15))::BIGINT % 1024
  GROUP BY c.token
),
truth AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count FROM toks GROUP BY token),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT e.token, CAST(e.cms_count AS BIGINT) AS cms_count, t.true_count
FROM est e
JOIN truth t USING (token), tot
WHERE e.cms_count * 200 >= tot.n
ORDER BY e.token
"""


def bloom_order_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: build an engine-portable Bloom filter
    over the BUILDING-segment customer keys, probe every order against it,
    and report per-priority how many orders the filter passes vs the exact
    semi-join truth (bloom_pass - exact_pass = false positives; false
    negatives are impossible by construction).

    This is the 100 TB pre-shuffle pruning pattern: the filter is
    ~m_bits/63 BIGINT words riding a 1-row broadcast, so the fact table is
    filtered *before* any exchange — the same idea as Spark's runtime
    bloom-filter join (spark.sql.optimizer.runtime.bloomFilter.enabled),
    made explicit, mergeable, and bit-exactly reproducible in DuckDB.
    Reference has no joins at all (SURVEY.md §0); this is beyond-reference
    OLAP surface."""
    from apollo_spark.ops.sketch import bloom_build, bloom_might_contain

    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    bloom = bloom_build(c, "c_custkey", m_bits=8192, k=4)
    probed = bloom_might_contain(o, "o_custkey", bloom, m_bits=8192, k=4)
    dim = c.select("c_custkey").distinct()
    flagged = probed.join(
        F.broadcast(dim), probed["o_custkey"] == dim["c_custkey"], "left"
    ).withColumn("exact_member", F.col("c_custkey").isNotNull())
    return (
        flagged.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("might_member"), 1).otherwise(0)).cast("long").alias("bloom_pass"),
            F.sum(F.when(F.col("exact_member"), 1).otherwise(0)).cast("long").alias("exact_pass"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_BLOOM_PRUNE = r"""
WITH dim AS (SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
rs AS (SELECT range AS r FROM range(0, 4)),
bloom AS (
  SELECT p // 63 AS word_idx, bit_or(1::BIGINT << CAST(p % 63 AS INTEGER)) AS bits
  FROM (
    SELECT ('0x' || substr(md5('bloom' || CAST(r AS VARCHAR) || '|' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 8192 AS p
    FROM dim CROSS JOIN rs
  )
  GROUP BY 1
),
oprobe AS (
  SELECT o_orderkey, o_orderpriority, o_custkey,
         ('0x' || substr(md5('bloom' || CAST(r AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT % 8192 AS p
  FROM orders CROSS JOIN rs
),
pass AS (
  SELECT o_orderkey,
         any_value(o_orderpriority) AS o_orderpriority,
         any_value(o_custkey) AS o_custkey,
         bool_and(((COALESCE(b.bits, 0) >> CAST(p % 63 AS INTEGER)) & 1) = 1) AS might
  FROM oprobe LEFT JOIN bloom b ON b.word_idx = p // 63
  GROUP BY o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE might) AS BIGINT) AS bloom_pass,
       CAST(count(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM dim)) AS BIGINT) AS exact_pass
FROM pass
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# training-mixture tier: UniMax language allocation
# --------------------------------------------------------------------------


def unimax_language_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax mixture weights (Chung et al. 2023) over the documents corpus:
    waterfill half the corpus token budget across languages, capping each at
    4 epochs. Integer waterfill conditions + single-division floats keep
    both engines bit-identical (see ops/corpus.py::unimax_weights)."""
    from apollo_spark.ops.corpus import unimax_weights, whitespace_tokens

    d = _t(spark, sf_dir, "documents")
    lt = d.groupBy("lang").agg(
        F.sum(F.size(whitespace_tokens(F.col("text")))).cast("long").alias("lang_tokens")
    )
    lt = lt.crossJoin(lt.agg(F.expr("sum(lang_tokens) div 2").alias("__budget")))
    return unimax_weights(lt, F.col("__budget"), max_epochs=4).orderBy("lang")


ORACLE_UNIMAX = r"""
WITH lt AS (
  SELECT lang,
         CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE length(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS lang_tokens
  FROM documents
  GROUP BY lang
),
b AS (SELECT CAST(SUM(lang_tokens) // 2 AS BIGINT) AS budget FROM lt),
ranked AS (
  SELECT lang, lang_tokens, lang_tokens * 4 AS cap,
         ROW_NUMBER() OVER (ORDER BY lang_tokens * 4, lang) AS i,
         COUNT(*) OVER () AS n,
         SUM(lang_tokens * 4) OVER (ORDER BY lang_tokens * 4, lang
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
         budget
  FROM lt, b
),
flagged AS (
  SELECT *, (cap * (n - i + 1) + prefix - cap) <= budget AS capped FROM ranked
),
agg AS (
  SELECT *,
         SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k,
         COALESCE(MAX(CASE WHEN capped THEN prefix END) OVER (), 0) AS pk
  FROM flagged
),
lvl AS (
  SELECT *,
         CASE WHEN n > k THEN CAST(budget - pk AS DOUBLE) / CAST(n - k AS DOUBLE)
              ELSE 0.0 END AS tau
  FROM agg
)
SELECT lang,
       lang_tokens,
       cap AS cap_tokens,
       CAST(capped AS INT) AS is_capped,
       CASE WHEN capped THEN CAST(cap AS DOUBLE) ELSE tau END AS alloc_tokens,
       (CASE WHEN capped THEN CAST(cap AS DOUBLE) ELSE tau END)
         / (CAST(pk AS DOUBLE) + tau * CAST(n - k AS DOUBLE)) AS weight,
       (CASE WHEN capped THEN CAST(cap AS DOUBLE) ELSE tau END)
         / CAST(lang_tokens AS DOUBLE) AS epochs_used
FROM lvl
ORDER BY lang
"""


# --------------------------------------------------------------------------
# more TPC-H shapes: q9 (profit by nation/year), q16 (supplier counts)
# --------------------------------------------------------------------------


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table in the driver set -> supply cost
    modeled as 60% of p_retailprice): per-nation per-year profit on 'red'
    parts. Dims (part-filtered, supplier, nation) broadcast; the one wide
    exchange is lineitem x orders on l_orderkey, then a map-side-combined
    group-agg over (nation, year)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


ORACLE_PROFIT_NATION_YEAR = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity
                     AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


def supplier_count_by_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp emulated by observed lineitem supplier-part
    pairs): distinct supplier count per (brand, type, size-bucket) excluding
    one brand and negative-balance suppliers. distinct(suppkey) per group is
    the shuffle; the excluded-supplier side is a broadcast anti-join."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "BRAND#1")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", (F.col("p_size") % 5).alias("size_bucket"))
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "size_bucket")
    )


ORACLE_SUPPLIER_COUNT = """
SELECT p_brand, p_type, p_size % 5 AS size_bucket,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'BRAND#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size % 5
ORDER BY supplier_cnt DESC, p_brand, p_type, size_bucket
"""


# --------------------------------------------------------------------------
# product-analytics tier: funnel + retention cohorts; corpus collocations
# --------------------------------------------------------------------------


def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase with a 7-day step window:
    per-user first view, first click after it, first purchase after that.
    Each stage is one map-side-combined groupBy(user) min; stage tables
    shrink monotonically and broadcast into the next stage's filter — no
    wide join anywhere. Integer-second arithmetic end to end; the three
    conversion rates are single IEEE divisions (engine-deterministic)."""
    e = _events(spark, sf_dir).select("user_id", "event_type", _ts_seconds().alias("ts_s"))
    step = 7 * 86400
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts_s").alias("t1"))
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter((F.col("ts_s") > F.col("t1")) & (F.col("ts_s") <= F.col("t1") + step))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter((F.col("ts_s") > F.col("t2")) & (F.col("ts_s") <= F.col("t2") + step))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("view_users"))
    nc = c.agg(F.count(F.lit(1)).alias("click_users"))
    np_ = p.agg(F.count(F.lit(1)).alias("purchase_users"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "view_users",
            "click_users",
            "purchase_users",
            (F.col("click_users").cast("double") / F.col("view_users").cast("double")).alias(
                "view_to_click"
            ),
            (F.col("purchase_users").cast("double") / F.col("click_users").cast("double")).alias(
                "click_to_purchase"
            ),
            (F.col("purchase_users").cast("double") / F.col("view_users").cast("double")).alias(
                "overall_conversion"
            ),
        )
    )


ORACLE_FUNNEL = """
WITH e AS (
  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS ts_s FROM events
),
v AS (SELECT user_id, MIN(ts_s) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts_s) AS t2
  FROM e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts_s > v.t1 AND e.ts_s <= v.t1 + 604800
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts_s) AS t3
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts_s > c.t2 AND e.ts_s <= c.t2 + 604800
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS view_users,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS click_users,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS purchase_users,
       CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS view_to_click,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS click_to_purchase,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS overall_conversion
"""


def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users cohorted by first-active week (epoch
    week index — integer div, no calendar ambiguity), then distinct-active
    counts per (cohort, offset). Two shuffles: groupBy(user) for cohorts and
    groupBy(cohort, offset) over user-distinct activity; cohort sizes
    broadcast back for the rate."""
    e = _events(spark, sf_dir).select(
        "user_id", F.expr("ts div 1000000000 div 604800").alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sizes = first.groupBy("cohort_wk").agg(F.count(F.lit(1)).alias("cohort_users"))
    act = (
        e.distinct()
        .join(first, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
    return (
        act.join(F.broadcast(sizes), "cohort_wk")
        .select(
            "cohort_wk",
            "week_offset",
            "active_users",
            "cohort_users",
            (F.col("active_users").cast("double") / F.col("cohort_users").cast("double")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_wk", "week_offset")
    )


ORACLE_RETENTION = """
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000000000 // 604800 AS wk FROM events
),
first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id),
sizes AS (SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_users FROM first GROUP BY cohort_wk),
act AS (
  SELECT f.cohort_wk, d.wk - f.cohort_wk AS week_offset,
         CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS active_users
  FROM (SELECT DISTINCT user_id, wk FROM e) d
  JOIN first f ON d.user_id = f.user_id
  GROUP BY f.cohort_wk, d.wk - f.cohort_wk
)
SELECT a.cohort_wk, a.week_offset, a.active_users, s.cohort_users,
       CAST(a.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE) AS retention
FROM act a JOIN sizes s USING (cohort_wk)
ORDER BY cohort_wk, week_offset
"""


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by pointwise mutual information: PMI =
    ln(p(ab) / (p(a) p(b))) over adjacent-token bigrams, min count 5, top 20.
    Counts are exact integer groupBys (map-side combined); the PMI ratio is
    one fixed-order float expression + ln + round(6) — the same
    cross-engine-stable recipe the idf/BM25 queries pin. Unigram totals ride
    along as 1-row crossJoins (declarative scalars, no driver collect)."""
    from apollo_spark.ops.corpus import word_ngrams

    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("tok")
    )
    bi = d.select(F.explode(word_ngrams(F.col("text"), 2)).alias("bigram"))
    uni_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    bi_counts = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_ab")).filter(F.col("n_ab") >= 5)
    n_uni = toks.agg(F.count(F.lit(1)).alias("nu"))
    n_bi = bi.agg(F.count(F.lit(1)).alias("nb"))
    parts = F.split(F.col("bigram"), " ")
    a = bi_counts.withColumn("w1", parts.getItem(0)).withColumn("w2", parts.getItem(1))
    ua = uni_counts.select(F.col("tok").alias("w1"), F.col("n_tok").alias("n_a"))
    ub = uni_counts.select(F.col("tok").alias("w2"), F.col("n_tok").alias("n_b"))
    ratio = (
        F.col("n_ab").cast("double")
        * F.col("nu").cast("double")
        * F.col("nu").cast("double")
        / (F.col("nb").cast("double") * F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return (
        a.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(n_uni)
        .crossJoin(n_bi)
        .select(
            "bigram",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.log(ratio), 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(20)
    )


ORACLE_PMI = r"""
WITH d AS (
  SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
toks AS (SELECT unnest(regexp_split_to_array(t, ' ')) AS tok FROM d),
bi AS (
  SELECT w[i] || ' ' || w[i + 1] AS bigram
  FROM (SELECT regexp_split_to_array(t, ' ') AS w FROM d),
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
uni_counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY tok),
bi_counts AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_ab FROM bi GROUP BY bigram HAVING COUNT(*) >= 5
),
nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM toks),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bi)
SELECT b.bigram, b.n_ab, ua.n_tok AS n_a, ub.n_tok AS n_b,
       ROUND(LN(CAST(b.n_ab AS DOUBLE) * CAST(nu.nu AS DOUBLE) * CAST(nu.nu AS DOUBLE)
                / (CAST(nb.nb AS DOUBLE) * CAST(ua.n_tok AS DOUBLE) * CAST(ub.n_tok AS DOUBLE))), 6) AS pmi
FROM bi_counts b
JOIN uni_counts ua ON ua.tok = string_split(b.bigram, ' ')[1]
JOIN uni_counts ub ON ub.tok = string_split(b.bigram, ' ')[2]
CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi DESC, bigram ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# lakehouse clustering: Z-order keys (file-skipping on several dimensions)
# --------------------------------------------------------------------------


def orders_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering keys over (o_custkey, price-cents): the
    key both engines must agree on bit-for-bit for zorder_write's clustered
    TxTable layout to be trustworthy. All-integer rank normalization +
    fixed shift/mask interleave (ops/zorder.py); floats enter only via
    floor(price*100) fixed-pointing."""
    from apollo_spark.ops.zorder import with_zorder_key

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    return (
        with_zorder_key(o, ["o_custkey", "o_cents"], bits=12)
        .select("o_orderkey", "o_custkey", "o_cents", "zkey")
        .orderBy("zkey", "o_orderkey")
        .limit(20)
    )


_ZTERMS = " + ".join(
    f"(((r{i} >> {b}) & 1) << {b * 2 + i})" for b in range(12) for i in (0, 1)
)

ORACLE_ZORDER_KEYS = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS o_cents FROM orders
),
stats AS (
  SELECT MIN(o_custkey) AS lo0, MAX(o_custkey) AS hi0,
         MIN(o_cents) AS lo1, MAX(o_cents) AS hi1
  FROM base
),
ranked AS (
  SELECT o_orderkey, o_custkey, o_cents,
         CASE WHEN hi0 = lo0 THEN 0 ELSE (o_custkey - lo0) * 4095 // (hi0 - lo0) END AS r0,
         CASE WHEN hi1 = lo1 THEN 0 ELSE (o_cents - lo1) * 4095 // (hi1 - lo1) END AS r1
  FROM base, stats
)
SELECT o_orderkey, o_custkey, o_cents, CAST({_ZTERMS} AS BIGINT) AS zkey
FROM ranked
ORDER BY zkey, o_orderkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# distributed k-means on the engine-exact integer lattice
# --------------------------------------------------------------------------


def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Lloyd rounds, k=8, over the embeddings table on the integer lattice
    (ops/clustering.py): per-cluster member count, exact within-cluster sum
    of squares, and a centroid-lattice digest. The whole trajectory is
    integer arithmetic, so the unrolled DuckDB oracle reproduces it
    bit-for-bit — same engine-exactness posture as item_transition_pagerank."""
    from apollo_spark.ops.clustering import kmeans_lattice, kmeans_summary

    e = _t(spark, sf_dir, "embeddings")
    assign, cent = kmeans_lattice(e, k=8, iters=3)
    return kmeans_summary(assign, cent)


def _kmeans_oracle(k: int = 8, iters: int = 3) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs (mirrors kmeans_lattice)."""
    ctes = [
        """long AS (
  SELECT vec_id, i AS d,
         CAST(FLOOR((CAST(embedding[i + 1] AS DOUBLE) + 8.0) * 1000000.0) AS BIGINT) AS xi
  FROM embeddings, LATERAL (SELECT unnest(range(0, len(embedding))) AS i) t(i)
)""",
        f"""c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, d, xi AS ci FROM long WHERE vec_id < {k})""",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""a{it} AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT l.vec_id, c.cluster, SUM((l.xi - c.ci) * (l.xi - c.ci)) AS dist,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
                              ORDER BY SUM((l.xi - c.ci) * (l.xi - c.ci)) ASC, c.cluster ASC) AS rn
    FROM long l JOIN {prev} c USING (d)
    GROUP BY l.vec_id, c.cluster)
  WHERE rn = 1
)"""
        )
        ctes.append(
            f"""c{it} AS (
  SELECT a.cluster, l.d, SUM(l.xi) // COUNT(*) AS ci
  FROM long l JOIN a{it} a USING (vec_id)
  GROUP BY a.cluster, l.d
)"""
        )
        prev = f"c{it}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT s.cluster, s.n_members, s.wcss, g.centroid_digest
FROM (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(dist) AS BIGINT) AS wcss
      FROM a{iters} GROUP BY cluster) s
JOIN (SELECT cluster,
             md5(string_agg(CAST(d AS VARCHAR) || ':' || CAST(ci AS VARCHAR), ','
                            ORDER BY CAST(d AS VARCHAR) || ':' || CAST(ci AS VARCHAR))) AS centroid_digest
      FROM c{iters} GROUP BY cluster) g USING (cluster)
ORDER BY cluster"""
    )


ORACLE_KMEANS = _kmeans_oracle(k=8, iters=3)


def pq_embedding_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code table (ops.clustering.pq_codes): 4
    subspaces x 16 centroids x 2 Lloyd rounds on the integer lattice —
    each 64-dim float vector compressed to 4 codes (16 bits + exact
    residual distances). Every subspace trajectory is integer arithmetic,
    so the unrolled per-subspace DuckDB oracle reproduces the whole code
    table bit-for-bit."""
    from apollo_spark.ops.clustering import pq_codes

    e = _t(spark, sf_dir, "embeddings")
    return pq_codes(e, dim=64, m=4, k=16, iters=2).orderBy("vec_id", "subspace")


def _pq_subspace_ctes(s: int, sub_d: int, k: int, iters: int) -> list[str]:
    """CTE chain for one PQ subspace: lattice slice + unrolled Lloyd rounds
    (mirrors pq_codes -> kmeans_lattice over a slice)."""
    ctes = [
        f"""long{s} AS (
  SELECT vec_id, i AS d,
         CAST(FLOOR((CAST(embedding[i + 1 + {s * sub_d}] AS DOUBLE) + 8.0) * 1000000.0) AS BIGINT) AS xi
  FROM embeddings, LATERAL (SELECT unnest(range(0, {sub_d})) AS i) t(i)
)""",
        f"""s{s}c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, d, xi AS ci FROM long{s} WHERE vec_id < {k})""",
    ]
    prev = f"s{s}c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"""s{s}a{it} AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT l.vec_id, c.cluster, SUM((l.xi - c.ci) * (l.xi - c.ci)) AS dist,
           ROW_NUMBER() OVER (PARTITION BY l.vec_id
                              ORDER BY SUM((l.xi - c.ci) * (l.xi - c.ci)) ASC, c.cluster ASC) AS rn
    FROM long{s} l JOIN {prev} c USING (d)
    GROUP BY l.vec_id, c.cluster)
  WHERE rn = 1
)"""
        )
        ctes.append(
            f"""s{s}c{it} AS (
  SELECT a.cluster, l.d, SUM(l.xi) // COUNT(*) AS ci
  FROM long{s} l JOIN s{s}a{it} a USING (vec_id)
  GROUP BY a.cluster, l.d
)"""
        )
        prev = f"s{s}c{it}"
    return ctes


def _pq_oracle(dim: int = 64, m: int = 4, k: int = 16, iters: int = 2) -> str:
    """Per-subspace unrolled Lloyd chains, UNION ALL'd into one code table."""
    sub_d = dim // m
    ctes, selects = [], []
    for s in range(m):
        ctes.extend(_pq_subspace_ctes(s, sub_d, k, iters))
        selects.append(
            f"SELECT vec_id, {s} AS subspace, cluster AS code, CAST(dist AS BIGINT) AS dist FROM s{s}a{iters}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY vec_id, subspace"
    )


ORACLE_PQ_CODES = _pq_oracle(dim=64, m=4, k=16, iters=2)


def pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5 search over PQ codebooks (ops.clustering.pq_adc_topk):
    queries 0-2 scored against the whole corpus purely through m x k
    distance-table lookups at each vector's codes — the IVF-PQ query path
    that never touches raw corpus vectors at search time. Integer lattice
    end to end, so the full ranked result is replayed bit-exactly by the
    unrolled SQL oracle."""
    from apollo_spark.ops.clustering import pq_adc_topk

    e = _t(spark, sf_dir, "embeddings")
    return pq_adc_topk(e, [0, 1, 2], dim=64, m=4, k=16, iters=2, topk=5).orderBy(
        "q_id", "rank"
    )


def _adc_oracle(dim: int = 64, m: int = 4, k: int = 16, iters: int = 2, topk: int = 5) -> str:
    """PQ chains + final-codebook assignment + per-query distance tables +
    ADC scoring (mirrors pq_adc_topk)."""
    sub_d = dim // m
    ctes, selects = [], []
    for s in range(m):
        ctes.extend(_pq_subspace_ctes(s, sub_d, k, iters))
        ctes.append(
            f"""dist{s} AS (
  SELECT l.vec_id, c.cluster, SUM((l.xi - c.ci) * (l.xi - c.ci)) AS dist
  FROM long{s} l JOIN s{s}c{iters} c USING (d)
  GROUP BY l.vec_id, c.cluster
)"""
        )
        ctes.append(
            f"""codes{s} AS (
  SELECT vec_id, cluster AS code FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM dist{s})
  WHERE rn = 1
)"""
        )
        selects.append(
            f"""SELECT q.vec_id AS q_id, cd.vec_id AS vec_id, q.dist AS qd
FROM codes{s} cd JOIN dist{s} q ON cd.code = q.cluster AND q.vec_id IN (0, 1, 2)"""
        )
    nl = chr(10)
    union = (nl + "UNION ALL" + nl).join(selects)
    return (
        "WITH "
        + ("," + nl).join(ctes)
        + f""",
parts AS (
{union}
),
scored AS (
  SELECT q_id, vec_id, CAST(SUM(qd) AS BIGINT) AS adc_dist
  FROM parts GROUP BY q_id, vec_id
)
SELECT q_id, vec_id, adc_dist, rank FROM (
  SELECT q_id, vec_id, adc_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist ASC, vec_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= {topk}
ORDER BY q_id, rank
"""
    )


ORACLE_ADC_SEARCH = _adc_oracle(dim=64, m=4, k=16, iters=2, topk=5)


def mmr_diverse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified retrieval
    (ops.similarity.mmr_diverse_topk): top-50 relevance pool for query 0,
    then 5 greedy picks maximizing min-distance-to-selected minus
    relevance — the dedup-aware re-ranking a RAG/retrieval stack runs on
    its candidate pool. Integer lattice end to end; the unrolled SQL
    oracle replays every greedy step."""
    from apollo_spark.ops.similarity import mmr_diverse_topk

    e = _t(spark, sf_dir, "embeddings")
    return mmr_diverse_topk(e, query_id=0, pool=50, k=5).orderBy("rank")


def _mmr_oracle(query_id: int = 0, pool: int = 50, k: int = 5, dim: int = 64) -> str:
    nl = chr(10)
    ctes = [
        f"""long AS (
  SELECT vec_id, i AS d,
         CAST(FLOOR((CAST(embedding[i + 1] AS DOUBLE) + 8.0) * 1000000.0) AS BIGINT) AS xi
  FROM embeddings, LATERAL (SELECT unnest(range(0, {dim})) AS i) t(i)
)""",
        f"""q AS (SELECT d, xi AS qxi FROM long WHERE vec_id = {query_id})""",
        f"""relall AS (
  SELECT l.vec_id, SUM((l.xi - q.qxi) * (l.xi - q.qxi)) AS rel
  FROM long l JOIN q USING (d) WHERE l.vec_id != {query_id} GROUP BY l.vec_id
)""",
        f"""pool AS (SELECT vec_id, rel FROM relall ORDER BY rel ASC, vec_id ASC LIMIT {pool})""",
        """pairs AS (
  SELECT a.vec_id AS x, b.vec_id AS y, SUM((a.xi - b.xi) * (a.xi - b.xi)) AS dd
  FROM long a JOIN long b ON a.d = b.d AND a.vec_id < b.vec_id
  WHERE a.vec_id IN (SELECT vec_id FROM pool) AND b.vec_id IN (SELECT vec_id FROM pool)
  GROUP BY a.vec_id, b.vec_id
)""",
        """pd AS (SELECT x, y, dd FROM pairs UNION ALL SELECT y AS x, x AS y, dd FROM pairs)""",
        """s1 AS (SELECT vec_id, -rel AS score FROM pool ORDER BY rel ASC, vec_id ASC LIMIT 1)""",
        """sel1 AS (SELECT vec_id FROM s1)""",
    ]
    for t in range(2, k + 1):
        ctes.append(
            f"""s{t} AS (
  SELECT p.vec_id, MIN(pd.dd) - ANY_VALUE(p.rel) AS score
  FROM pool p JOIN pd ON pd.x = p.vec_id AND pd.y IN (SELECT vec_id FROM sel{t - 1})
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
  GROUP BY p.vec_id
  ORDER BY score DESC, p.vec_id ASC LIMIT 1
)"""
        )
        ctes.append(
            f"""sel{t} AS (SELECT vec_id FROM sel{t - 1} UNION ALL SELECT vec_id FROM s{t})"""
        )
    finals = [
        f"SELECT CAST({t} AS INT) AS rank, CAST(vec_id AS BIGINT) AS vec_id, CAST(score AS BIGINT) AS mmr_score FROM s{t}"
        for t in range(1, k + 1)
    ]
    return "WITH " + ("," + nl).join(ctes) + nl + (nl + "UNION ALL" + nl).join(finals) + nl + "ORDER BY rank"


ORACLE_MMR_SEARCH = _mmr_oracle(query_id=0, pool=50, k=5, dim=64)


# --------------------------------------------------------------------------
# graph structure: exact triangle counting (degree-ordered orientation)
# --------------------------------------------------------------------------


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the item co-purchase graph: items are connected
    when >= 3 distinct users purchased both. The Spark side counts with
    degree-ordered orientation (O(m^1.5) wedges — ops/graph.py); the oracle
    counts the canonical a<b<c three-way join. Same exact integers."""
    from apollo_spark.ops.graph import triangle_count

    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    ui = e.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).distinct()
    u2 = ui.select(F.col("user_id"), F.col("item").alias("item_b"))
    edges = (
        ui.join(u2, "user_id")
        .filter(F.col("item") < F.col("item_b"))
        .groupBy("item", "item_b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 3)
        .select(F.col("item").alias("src"), F.col("item_b").alias("dst"))
    )
    return triangle_count(edges)


def copurchase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients of the co-purchase graph
    (ops.graph.local_clustering): same oriented-wedge machinery as the
    triangle census but with per-node attribution; oracle recounts via the
    canonical a<b<c triple join exploded to member nodes."""
    from apollo_spark.ops.graph import local_clustering

    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    ui = e.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).distinct()
    u2 = ui.select(F.col("user_id"), F.col("item").alias("item_b"))
    edges = (
        ui.join(u2, "user_id")
        .filter(F.col("item") < F.col("item_b"))
        .groupBy("item", "item_b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 3)
        .select(F.col("item").alias("src"), F.col("item_b").alias("dst"))
    )
    return (
        local_clustering(edges)
        .select("node", "deg", "n_tri", F.round("coeff", 6).alias("coeff"))
        .orderBy("node")
    )


ORACLE_CLUSTERING = """
WITH ui AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item
  FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT u1.item AS a, u2.item AS b
  FROM ui u1 JOIN ui u2 ON u1.user_id = u2.user_id AND u1.item < u2.item
  GROUP BY u1.item, u2.item
  HAVING COUNT(*) >= 3
),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
  GROUP BY v
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
pt AS (
  SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (SELECT unnest([x, y, z]) AS v FROM tri)
  GROUP BY v
)
SELECT d.v AS node, d.deg, COALESCE(pt.n_tri, 0) AS n_tri,
       CASE WHEN d.deg >= 2
            THEN ROUND(2.0 * CAST(COALESCE(pt.n_tri, 0) AS DOUBLE)
                 / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6)
            ELSE 0.0 END AS coeff
FROM deg d LEFT JOIN pt ON pt.node = d.v
ORDER BY node
"""


def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph (ops.graph.k_core_peel, 4 synchronous
    peel rounds): the dense backbone after iteratively shedding weakly-
    connected items. Unrolled-round SQL oracle replays the identical peel."""
    from apollo_spark.ops.graph import k_core_peel

    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    ui = e.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).distinct()
    u2 = ui.select(F.col("user_id"), F.col("item").alias("item_b"))
    edges = (
        ui.join(u2, "user_id")
        .filter(F.col("item") < F.col("item_b"))
        .groupBy("item", "item_b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 3)
        .select(F.col("item").alias("src"), F.col("item_b").alias("dst"))
    )
    return k_core_peel(edges, k=3, rounds=4).orderBy("node")


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the co-purchase graph by deterministic
    synchronous label propagation (ops.graph.label_propagation, 3 rounds):
    each item adopts its neighbors' most frequent label, smallest-label
    tie-break — frequency voting splits sparse bridges that connected
    components would flood across. Unrolled-round SQL oracle replays the
    identical vote/tie-break/adopt sequence."""
    from apollo_spark.ops.graph import label_propagation

    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    ui = e.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).distinct()
    u2 = ui.select(F.col("user_id"), F.col("item").alias("item_b"))
    edges = (
        ui.join(u2, "user_id")
        .filter(F.col("item") < F.col("item_b"))
        .groupBy("item", "item_b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select(F.col("item").alias("src"), F.col("item_b").alias("dst"))
    )
    return label_propagation(edges, rounds=3).orderBy("node")


def _lpa_oracle(rounds: int = 3, min_w: int = 2) -> str:
    parts = [
        f"""WITH ui AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item
  FROM events WHERE event_type = 'purchase'
),
e0 AS (
  SELECT u1.item AS a, u2.item AS b
  FROM ui u1 JOIN ui u2 ON u1.user_id = u2.user_id AND u1.item < u2.item
  GROUP BY u1.item, u2.item
  HAVING COUNT(*) >= {min_w}
),
und AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM und)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"l{r - 1}"
        parts.append(
            f"""v{r} AS (
  SELECT e.u, l.label, COUNT(*) AS cnt
  FROM und e JOIN {prev} l ON e.v = l.node
  GROUP BY e.u, l.label
),
b{r} AS (
  SELECT u, label FROM (
    SELECT u, label, ROW_NUMBER() OVER (PARTITION BY u ORDER BY cnt DESC, label ASC) AS rn
    FROM v{r}
  ) WHERE rn = 1
),
l{r} AS (
  SELECT n.node, COALESCE(b.label, n.label) AS label
  FROM {prev} n LEFT JOIN b{r} b ON b.u = n.node
)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT node, label FROM l{rounds} ORDER BY node
"""
    )


ORACLE_LPA_COMMUNITIES = _lpa_oracle(3, 2)


def _kcore_oracle(k: int = 3, rounds: int = 4) -> str:
    parts = [
        """WITH ui AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item
  FROM events WHERE event_type = 'purchase'
),
e0 AS (
  SELECT u1.item AS a, u2.item AS b
  FROM ui u1 JOIN ui u2 ON u1.user_id = u2.user_id AND u1.item < u2.item
  GROUP BY u1.item, u2.item
  HAVING COUNT(*) >= 3
)"""
    ]
    for i in range(1, rounds + 1):
        prev = f"e{i - 1}"
        parts.append(
            f"""d{i} AS (
  SELECT v AS node, COUNT(*) AS deg
  FROM (SELECT a AS v FROM {prev} UNION ALL SELECT b AS v FROM {prev})
  GROUP BY v
),
k{i} AS (SELECT node FROM d{i} WHERE deg >= {k}),
e{i} AS (
  SELECT a, b FROM {prev}
  WHERE a IN (SELECT node FROM k{i}) AND b IN (SELECT node FROM k{i})
)"""
        )
    last = f"e{rounds}"
    return (
        ",\n".join(parts)
        + f"""
SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS deg
FROM (SELECT a AS v FROM {last} UNION ALL SELECT b AS v FROM {last})
GROUP BY v ORDER BY node
"""
    )


ORACLE_KCORE = _kcore_oracle(3, 4)


ORACLE_TRIANGLES = """
WITH ui AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item
  FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT u1.item AS a, u2.item AS b
  FROM ui u1 JOIN ui u2 ON u1.user_id = u2.user_id AND u1.item < u2.item
  GROUP BY u1.item, u2.item
  HAVING COUNT(*) >= 3
),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
  GROUP BY v
),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT MAX(deg) FROM deg) AS max_degree,
       n_triangles
FROM tri
"""


def sampled_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a deterministic coordinated hash-sample
    (ops.sketch.hash_sample): keep events whose md5-prefix hash of event_id
    is 0 mod 16 (a mergeable, engine-portable ~1/16 sample — union of
    per-increment samples IS the sample of the union, unlike TABLESAMPLE),
    then per event_type the exact discrete p25/50/75/90 of `value` over the
    sample via rank selection (rn == ceil(p*n/100), full event_id
    tie-break — no float interpolation, so values pass through untouched
    and hash-gate). The sample predicate is a narrow map at the scan; the
    only shuffle is the per-type window over the 1/16 survivors."""
    from apollo_spark.ops.sketch import hash_sample

    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    s = hash_sample(e, "event_id", 16, salt="q")
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    ranked = s.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    qcols = [
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.lit(1).cast("long"), F.expr(f"({p}*n + 99) div 100")),
                F.col("value"),
            )
        ).alias(f"p{p}")
        for p in (25, 50, 75, 90)
    ]
    return (
        ranked.groupBy("event_type")
        .agg(F.max("n").alias("sample_n"), (F.max("n") * 16).alias("est_total"), *qcols)
        .orderBy("event_type")
    )


ORACLE_SAMPLED_QUANTILES = """
WITH s AS (
  SELECT event_id, event_type, value FROM events
  WHERE ('0x' || substr(md5('q' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 16 = 0
),
r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM s
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS sample_n,
       CAST(MAX(n) * 16 AS BIGINT) AS est_total,
       MAX(CASE WHEN rn = GREATEST(1, (25*n + 99) // 100) THEN value END) AS p25,
       MAX(CASE WHEN rn = GREATEST(1, (50*n + 99) // 100) THEN value END) AS p50,
       MAX(CASE WHEN rn = GREATEST(1, (75*n + 99) // 100) THEN value END) AS p75,
       MAX(CASE WHEN rn = GREATEST(1, (90*n + 99) // 100) THEN value END) AS p90
FROM r GROUP BY event_type ORDER BY event_type
"""


def top_tokens_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group heavy hitters: top-5 tokens per document source by
    count (count desc, token asc tie-break). Two-level shape: the token
    count groupBy map-side combines (vocabulary-bounded output), then the
    row_number window shuffles only (source, token, n) triples — per-group
    state is the vocabulary, never the corpus. The CMS sketch
    (cms_heavy_tokens) is the global/approximate tier; this is the exact
    per-group tier a corpus-composition report runs."""
    from apollo_spark.ops.corpus import whitespace_tokens
    from apollo_spark.ops.relational import top_k

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("tok")
    )
    counts = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
    top = top_k(counts, ["source"], [F.col("n").desc(), F.col("tok").asc()], 5)
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("tok").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("source", "rank", "tok", "n")
        .orderBy("source", "rank")
    )


ORACLE_TOP_TOKENS = r"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
cnt AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
),
ranked AS (
  SELECT source, tok, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, tok ASC) AS INT) AS rank
  FROM cnt
)
SELECT source, rank, tok, n FROM ranked WHERE rank <= 5 ORDER BY source, rank
"""


def session_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (ops.relational.interval_join): sessionize each
    user's `view` and `purchase` activity separately (30-min idle gap),
    then find every (view-session, purchase-session) pair of the same user
    whose closed time intervals overlap, with the overlap length.

    Exercises the BUCKETED overlap join: both interval sets explode to the
    1-hour buckets they cover and join on (user, bucket), so per-task
    fan-out is bounded by intervals-per-bucket rather than
    intervals-per-user — the shape that survives one tenant with millions
    of sessions. Pairs emit exactly once (only from the bucket containing
    the overlap's start) without any distinct shuffle; the SQL oracle runs
    the naive predicate join, gating that trick end to end."""
    from apollo_spark.ops.relational import interval_join

    e = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("user_id", "event_type", _ts_seconds().alias("ts_s"), "event_id")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_s").asc(), F.col("event_id").asc()
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("ts_s").over(w)
    is_new = (prev.isNull() | ((F.col("ts_s") - prev) > 1800)).cast("int")
    sess = (
        e.withColumn("sid", F.sum(is_new).over(wrun))
        .groupBy("user_id", "event_type", "sid")
        .agg(F.min("ts_s").alias("s_start"), F.max("ts_s").alias("s_end"))
    )
    v = sess.filter(F.col("event_type") == "view").select(
        "user_id", F.col("s_start").alias("v_start"), F.col("s_end").alias("v_end")
    )
    p = sess.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("s_start").alias("p_start"), F.col("s_end").alias("p_end")
    )
    out = interval_join(
        v, p, ["user_id"], "v_start", "v_end", "p_start", "p_end", bucket_width=3600
    )
    return out.select(
        "user_id",
        "v_start",
        "v_end",
        "p_start",
        "p_end",
        (
            F.least(F.col("v_end"), F.col("p_end"))
            - F.greatest(F.col("v_start"), F.col("p_start"))
        ).alias("overlap_s"),
    ).orderBy("user_id", "v_start", "p_start")


ORACLE_SESSION_OVERLAP = """
WITH base AS (
  SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000000000 AS ts_s
  FROM events WHERE event_type IN ('view', 'purchase')
),
flagged AS (
  SELECT user_id, event_type, event_id, ts_s,
         CASE WHEN LAG(ts_s) OVER w IS NULL OR ts_s - LAG(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_s ASC, event_id ASC)
),
sess AS (
  SELECT user_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id, event_type ORDER BY ts_s ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
         ts_s
  FROM flagged
),
iv AS (
  SELECT user_id, event_type, sid, MIN(ts_s) AS s_start, MAX(ts_s) AS s_end
  FROM sess GROUP BY 1, 2, 3
),
v AS (SELECT user_id, s_start AS v_start, s_end AS v_end FROM iv WHERE event_type = 'view'),
p AS (SELECT user_id, s_start AS p_start, s_end AS p_end FROM iv WHERE event_type = 'purchase')
SELECT v.user_id, v.v_start, v.v_end, p.p_start, p.p_end,
       LEAST(v.v_end, p.p_end) - GREATEST(v.v_start, p.p_start) AS overlap_s
FROM v JOIN p ON v.user_id = p.user_id
WHERE v.v_start <= p.p_end AND p.p_start <= v.v_end
ORDER BY v.user_id, v.v_start, p.p_start
"""


def _logreg_parts(spark: SparkSession, sf_dir: str):
    from apollo_spark.ops.ml import hashed_token_features, logreg_train_hardsigmoid

    d = _t(spark, sf_dir, "documents")
    feats = hashed_token_features(d, buckets=32, salt="feat")
    labels = d.select(
        "doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).cast("int").alias("y01")
    )
    w = logreg_train_hardsigmoid(feats, labels, iters=3, lr_inv=16)
    return d, feats, labels, w


def logreg_quality_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine CALIBRATED classifier training
    (ops.ml.logreg_train_hardsigmoid): 3 rounds of batch gradient descent
    for hard-sigmoid logistic regression over 32 hashed bag-of-token
    buckets + bias, learning lang=='en'. Unlike the perceptron (updates on
    sign only), updates are proportional to the residual s(w.x) - y, so
    the model converges toward calibrated scores — yet every margin,
    clamp, residual and gradient is an exact BIGINT in micro-unit
    fixed-point (floor_div replayed bit-for-bit in SQL), so the final
    weight table hash-gates against a DuckDB oracle unrolling all 3
    rounds."""
    _, _, _, w = _logreg_parts(spark, sf_dir)
    return w.select(F.col("b"), F.col("weight")).orderBy("b")


def _logreg_oracle(final_select: str, s: int = 1_000_000, lr_inv: int = 16) -> str:
    g = 4 * lr_inv
    rounds = []
    prev = "w0"
    for t in range(1, 4):
        rounds.append(
            f"""m{t} AS (SELECT doc_id, y01, SUM(n * weight) AS z FROM fx JOIN {prev} USING (b) GROUP BY 1, 2),
e{t} AS (SELECT doc_id,
                LEAST(GREATEST(z + {2 * s}, 0), {4 * s}) - {4 * s} * y01 AS e
         FROM m{t}),
g{t} AS (SELECT b, SUM(e * n) AS gn FROM fx JOIN e{t} USING (doc_id) GROUP BY b),
w{t} AS (SELECT {prev}.b,
                {prev}.weight - CAST((COALESCE(g{t}.gn, 0) - ((COALESCE(g{t}.gn, 0) % {g} + {g}) % {g})) / {g} AS BIGINT) AS weight
         FROM {prev} LEFT JOIN g{t} USING (b))"""
        )
        prev = f"w{t}"
    joined_rounds = ",\n".join(rounds)
    return rf"""
WITH d AS (
  SELECT doc_id, lower(text) AS text,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y01
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
  FROM d WHERE length(trim(text)) > 0
),
cnt AS (
  SELECT doc_id, CAST(('0x' || substr(md5('feat' || t), 1, 15))::BIGINT % 32 AS INT) AS b,
         COUNT(*) AS n
  FROM toks GROUP BY 1, 2
),
feats AS (
  SELECT * FROM cnt
  UNION ALL SELECT doc_id, 32 AS b, CAST(1 AS BIGINT) AS n FROM d
),
fx AS (SELECT f.doc_id, f.b, f.n, d.y01 FROM feats f JOIN d USING (doc_id)),
w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS weight FROM fx),
{joined_rounds}
{final_select}
"""


ORACLE_LOGREG_W = _logreg_oracle(
    "SELECT b, CAST(weight AS BIGINT) AS weight FROM w3 ORDER BY b"
)


def zipf_token_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: least-squares slope of log(freq) vs
    log(rank) over the top-200 tokens — natural text tracks Zipf (slope
    ~ -1); a badly-filtered or template-heavy corpus bends away from it,
    so the slope is a one-number drift alarm for a 100 TB ingest.

    Shape: the token count groupBy map-side combines to vocabulary size;
    the global top-200 is orderBy().limit(200) — Spark plans
    TakeOrderedAndProject, a distributed per-partition top-k + driver-side
    k-way merge, never a vocabulary-sized single-task sort; the rank window
    then runs over the 200-row result only. Regression sums are
    per-term-DECIMAL(38,6) rounded ln() values (order-independent,
    engine-exact); the closed-form slope/intercept are single IEEE
    divisions."""
    from apollo_spark.ops.corpus import whitespace_tokens

    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    top200 = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(200)
    top = top200.withColumn("rank", F.row_number().over(w))  # 200-row frame
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("n").cast("double"))
    sums = top.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(dec(x)).cast("double").alias("sx"),
        F.sum(dec(y)).cast("double").alias("sy"),
        F.sum(dec(x * y)).cast("double").alias("sxy"),
        F.sum(dec(x * x)).cast("double").alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("k").cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 6).alias("zipf_intercept"),
    )


ORACLE_ZIPF_SLOPE = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
top AS (
  SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS rank
  FROM cnt QUALIFY rank <= 200
),
s AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ln(CAST(rank AS DOUBLE)) * ln(CAST(n AS DOUBLE)) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)) AS DECIMAL(38,6))) AS DOUBLE) AS sxx
  FROM top
)
SELECT CAST(k AS BIGINT) AS n_tokens,
       ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k, 6) AS zipf_intercept
FROM s
"""


def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing diagnostic: KL(P_source || P_corpus) of each source's
    token distribution against the whole-corpus distribution (add-one
    smoothed) — the per-source drift score a mixture-rebalancing pipeline
    (DoReMi-style) watches; a source whose KL jumps between snapshots
    changed its content mix.

    Shape: per-(source, token) counts map-side combine; the corpus
    distribution joins in on the token key (vocabulary-sized shuffle,
    corpus-size independent); scalar totals ride a broadcast crossJoin.
    Each KL term is DECIMAL(38,6)-rounded (order-independent sum,
    engine-exact); divisions/ln are fixed-order IEEE."""
    from apollo_spark.ops.corpus import whitespace_tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("tok"))
    st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n_st"))
    ts = st.groupBy("source").agg(F.sum("n_st").alias("t_s"))
    ct = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_t"))
    scal = ct.agg(
        F.sum("n_t").cast("double").alias("t_all"), F.count(F.lit(1)).cast("double").alias("v")
    )
    p = F.col("n_st").cast("double") / F.col("t_s").cast("double")
    q = (F.col("n_t").cast("double") + 1.0) / (F.col("t_all") + F.col("v"))
    term = (p * F.log(p / q)).cast("decimal(38,6)")
    return (
        st.join(F.broadcast(ts), "source")
        .join(ct, "tok")
        .crossJoin(F.broadcast(scal))
        .groupBy("source")
        .agg(
            F.max("t_s").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_used"),
            F.round(F.sum(term).cast("double"), 6).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


ORACLE_SOURCE_KL = r"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n_st FROM toks GROUP BY 1, 2),
ts AS (SELECT source, SUM(n_st) AS t_s FROM st GROUP BY source),
ct AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_t FROM toks GROUP BY tok),
scal AS (SELECT CAST(SUM(n_t) AS DOUBLE) AS t_all, CAST(COUNT(*) AS DOUBLE) AS v FROM ct)
SELECT st.source,
       CAST(MAX(ts.t_s) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_used,
       ROUND(CAST(SUM(CAST(
         (CAST(n_st AS DOUBLE) / CAST(t_s AS DOUBLE))
         * ln((CAST(n_st AS DOUBLE) / CAST(t_s AS DOUBLE))
              / ((CAST(n_t AS DOUBLE) + 1.0) / (t_all + v)))
       AS DECIMAL(38,6))) AS DOUBLE), 6) AS kl_vs_corpus
FROM st JOIN ts USING (source) JOIN ct USING (tok) CROSS JOIN scal
GROUP BY st.source ORDER BY st.source
"""


def events_hopping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window rollup (1 h windows every 30 min): each event lands in
    size/step = 2 overlapping windows, realized as a 2-way offset explode +
    one groupBy — the batch mirror of Structured Streaming's
    window(size, slide) TVF, with integer-second window starts so the
    window assignment is engine-exact. Sums ride DECIMAL(38,6). The explode
    doubles rows BEFORE the single shuffle; no self-join, no second pass."""
    e = _events(spark, sf_dir)
    size, step = 3600, 1800
    base = e.select("event_type", _ts_seconds().alias("ts_s"), "value")
    hopped = (
        base.select(
            "event_type",
            "value",
            "ts_s",
            F.explode(F.array(*[F.lit(j) for j in range(size // step)])).alias("__j"),
        )
        .select(
            "event_type",
            "value",
            "ts_s",
            ((F.expr("ts_s div 1800") - F.col("__j")) * step).alias("win_start"),
        )
        .filter(F.col("win_start") + size > F.col("ts_s"))
    )
    return (
        hopped.groupBy("event_type", "win_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type", "win_start")
    )


ORACLE_HOPPING = """
WITH base AS (
  SELECT event_type, epoch_ns(ts) // 1000000000 AS ts_s, value FROM events
),
hopped AS (
  SELECT event_type, value, ((ts_s // 1800) - j) * 1800 AS win_start, ts_s
  FROM base CROSS JOIN (SELECT unnest([0, 1]) AS j)
)
SELECT event_type, win_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM hopped WHERE win_start + 3600 > ts_s
GROUP BY event_type, win_start
ORDER BY event_type, win_start
"""


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form cube/rollup specialize:
    ((status), (priority), ()) computes two independent one-dimension
    rollups + grand total in ONE pass over orders (a UNION ALL of three
    aggregates would scan three times). Spark expands the sets into a
    single expand+aggregate; grouping_id disambiguates the null rows."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
        """
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY gid, o_orderstatus, o_orderpriority
"""


def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) decile report over customer account balances: per-decile
    count, min/max balance, and DECIMAL-exact mean — the classic
    distribution-profile query (risk banding, ltv tiers). The decile is the
    distributed two-phase rank (ops.rank.bucketed_ntile) — bit-identical to
    a global NTILE(10) window, 64-way parallel instead of one task;
    tie-break on custkey makes the assignment total and
    engine-deterministic."""
    from apollo_spark.ops.rank import bucketed_ntile

    c = _t(spark, sf_dir, "customer")
    dec10 = bucketed_ntile(
        c.select("c_custkey", "c_acctbal"),
        F.col("c_acctbal"),
        10,
        tiebreak=[F.col("c_custkey").asc()],
        out_col="decile",
    )
    return carry_caches(
        dec10.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_bal"),
        )
        .orderBy("decile"),
        dec10,
    )


ORACLE_BALANCE_DECILES = """
WITH d AS (
  SELECT c_custkey, c_acctbal,
         NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
  FROM customer
)
SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n,
       ROUND(MIN(c_acctbal), 2) AS min_bal,
       ROUND(MAX(c_acctbal), 2) AS max_bal,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_bal
FROM d GROUP BY decile ORDER BY decile
"""


def lineitem_unpivot_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): melt the per-lineitem money columns
    (extendedprice, discount, tax) into (measure, amount) rows and
    aggregate per measure — the reshaping step feeding generic
    metric-store sinks. Spark's unpivot is a zero-shuffle expand (3 rows
    out per row in, no join); the only exchange is the 3-group aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="amount",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("amount").cast("decimal(38,6)")).cast("double"), 4).alias(
                "total"
            ),
            F.round(F.max("amount"), 4).alias("max_amount"),
        )
        .orderBy("measure")
    )


ORACLE_UNPIVOT_CHARGES = """
WITH long AS (
  SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS amount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
)
SELECT measure, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE), 4) AS total,
       ROUND(MAX(amount), 4) AS max_amount
FROM long GROUP BY measure ORDER BY measure
"""


def doc_memorization_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document memorization-risk score: the fraction of a doc's
    distinct 5-gram shingles that also occur in at least one OTHER document
    — the overlap statistic behind dedup-for-memorization work (Lee et al.
    2022): docs whose shingles are mostly shared are the ones a model can
    regurgitate from elsewhere in the corpus. Shape: since a doc's shingles
    are DISTINCT, n_shared = n_shingles - n_unique, and a df==1 shingle has
    exactly one owner (min(doc_id) of its group) — so the corpus-sized
    ex-to-dfreq re-join the first version used collapses to ONE map-side-
    combined groupBy over the exploded shingles plus two doc-count-sized
    frames (per-doc totals come from F.size(), a narrow map with no explode).
    sf1 (10x data): 18.3 s -> linear."""
    from apollo_spark.ops.dedup import shingles

    d = _t(spark, sf_dir, "documents")
    totals = d.select("doc_id", F.size(shingles(F.col("text"), 5)).alias("n_shingles"))
    ex = d.select("doc_id", F.explode(shingles(F.col("text"), 5)).alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("owner"))
    uniq = (
        dfreq.filter(F.col("df") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    per_doc = (
        totals.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            (F.col("n_shingles") - F.coalesce(F.col("n_unique"), F.lit(0))).alias("n_shared"),
        )
        .withColumn(
            "shared_frac",
            F.round(F.col("n_shared").cast("double") / F.col("n_shingles").cast("double"), 6),
        )
    )
    return (
        per_doc.orderBy(F.col("shared_frac").desc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", "n_shingles", "n_shared", "shared_frac")
    )


ORACLE_MEMORIZATION = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
sh AS (
  -- mirrors ops.dedup.shingles: texts shorter than n words yield ONE
  -- whole-text shingle instead of being dropped
  SELECT doc_id,
         unnest(CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                ELSE list_distinct(list_transform(generate_series(1, len(t)-4),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
                END) AS s
  FROM toks
),
dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM sh JOIN dfreq USING (s) GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_shared,
       ROUND(CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS shared_frac
FROM per_doc
ORDER BY shared_frac DESC, doc_id ASC
LIMIT 20
"""


def embedding_zca_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening (ops.similarity.zca_whiten): decorrelate the embedding
    corpus so covariance ~= I before semantic-dedup/clustering. Covariance
    comes from the distributed DECIMAL-exact in-row accumulation; the d x d
    eigensolve is the one bounded driver action; the whitening matrix is
    inlined into the plan as literal rows (shuffle-free JVM folds, no UDF).
    Output: per-vector whitened L2 norm + first 4 whitened coordinates
    (rounded for display; numpy parity is pytest-pinned). Rows-only gate:
    the eigensolve is driver-side linear algebra SQL cannot replay."""
    from apollo_spark.ops.similarity import zca_whiten

    emb = _t(spark, sf_dir, "embeddings")
    wdf = zca_whiten(emb, "embedding", eps=1e-5, out_col="wvec")
    norm = F.sqrt(
        F.aggregate(F.col("wvec"), F.lit(0.0), lambda a, x: a + x * x)
    )
    return wdf.select(
        "vec_id",
        F.round(norm, 4).alias("w_norm"),
        *[F.round(F.col("wvec")[i], 4).alias(f"w{i}") for i in range(4)],
    ).orderBy("vec_id")


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy — the classic gibberish /
    base64-blob / mojibake filter of pretraining pipelines (low entropy =
    repeated filler, high entropy = encoded binary). Pure higher-order
    functions over the in-row char array: zero shuffle, zero UDF, stays
    inside whole-stage codegen, embarrassingly parallel at 100 TB. Entropy
    folds over the SORTED distinct-char list so the double accumulation
    order is deterministic and matches the DuckDB oracle bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    chars = F.expr("filter(split(text, ''), x -> x != '')")
    n = F.length("text").cast("double")
    dist = F.array_sort(F.array_distinct(chars))
    p = lambda c: F.size(F.filter(chars, lambda x: x == c)).cast("double") / n  # noqa: E731
    ent = -F.aggregate(dist, F.lit(0.0), lambda acc, c: acc + p(c) * F.log2(p(c)))
    return d.select(
        "doc_id",
        F.size(dist).alias("n_unique_chars"),
        F.when(F.length("text") > 0, F.round(ent, 6)).otherwise(0.0).alias("char_entropy"),
    ).orderBy("doc_id")


ORACLE_CHAR_ENTROPY = r"""
SELECT doc_id,
       len(list_distinct(string_split(text, ''))) AS n_unique_chars,
       CASE WHEN length(text) > 0 THEN ROUND(
         -list_sum(list_transform(list_sort(list_distinct(string_split(text, ''))),
            c -> (CAST(len(list_filter(string_split(text, ''), x -> x = c)) AS DOUBLE) / length(text))
                 * log2(CAST(len(list_filter(string_split(text, ''), x -> x = c)) AS DOUBLE) / length(text)))), 6)
       ELSE 0.0 END AS char_entropy
FROM documents
ORDER BY doc_id
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SELECTION step of near-dedup: after grouping near-duplicates into
    connected components (bigram-Jaccard >= 0.2 edges, as
    near_dup_components), keep ONE representative per component under the
    standard keep-longest policy (max n_chars, tie-break min doc_id) and
    report the group size. Composition of existing distributed pieces — the
    only new work is a per-component window over component-sized groups, so
    the extra shuffle is keyed by component (bounded by the dup-group count,
    not the corpus). Integer-exact output -> hash-stable oracle.

    Edges ride the capped inverted index (frac cap + frac_floor=1024), same
    rationale as near_dup_components: the selection step is what this query
    certifies; at gate SFs the floor exceeds the corpus so capped == lossless
    and the exact oracle still hash-gates."""
    d = _t(spark, sf_dir, "documents")
    comp = _doc_components(spark, sf_dir)
    sized = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        sized.withColumn("__rn", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("doc_id"))).alias("kept_doc_id"),
            F.max(F.when(F.col("__rn") == 1, F.col("n_chars"))).alias("kept_chars"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("component")
    )


ORACLE_DEDUP_KEEP_BEST = r"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
  WHERE len(t) >= 1
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id),
sized AS (
  SELECT c.component, c.doc_id, doc.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.component ORDER BY doc.n_chars DESC, c.doc_id ASC) AS rn
  FROM comp c JOIN documents doc ON doc.doc_id = c.doc_id
)
SELECT component,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id,
       MAX(CASE WHEN rn = 1 THEN n_chars END) AS kept_chars,
       COUNT(*) AS n_members
FROM sized
GROUP BY component
ORDER BY component
"""


def tfidf_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine near-dup pairs at t=0.6 over word-bigram terms
    (ops.dedup.tfidf_cosine_pairs, lossless max_df=None config) —
    idf-weighted lexical similarity that ignores shared boilerplate
    vocabulary. DECIMAL-accumulated dots/norms make the cosine hash-stable
    against the DuckDB replay."""
    from apollo_spark.ops.dedup import tfidf_cosine_pairs

    d = _t(spark, sf_dir, "documents")
    return (
        tfidf_cosine_pairs(d, n=2, threshold=0.6, max_df=None)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


ORACLE_TFIDF_PAIRS = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS term
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0)
  WHERE len(t) >= 2
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
stats AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
w AS (
  SELECT doc_id, term, tf * ln(CAST(n_docs AS DOUBLE) / df) AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
norms AS (
  SELECT doc_id, CAST(SUM(CAST(w*w AS DECIMAL(38,6))) AS DOUBLE) AS n2 FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(CAST(a.w*b.w AS DECIMAL(38,6))) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
FROM dots JOIN norms na ON na.doc_id = id_a JOIN norms nb ON nb.doc_id = id_b
WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.6
ORDER BY id_a, id_b
"""


def tfidf_capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB configuration of tfidf_dup_pairs, hash-gated: a
    scale-RELATIVE hot-term cap (df > floor(4% of corpus)) prunes the
    inverted index for CANDIDATE GENERATION, then every candidate pair is
    re-scored exactly over the full term vectors — so the cap costs recall
    (pairs sharing only hot terms are missed; 21 of the lossless 25 at the
    gate corpus) but every emitted cosine is bit-identical to the lossless
    twin's. The lossless twin measured ~quadratic on the sf1 stress corpus
    (2.85 s at sf0.1 -> 1203 s at sf1, BASELINE.md round-5 sweep); this
    config stays ~linear. The oracle replays the full capped semantics —
    relative cutoff on exact df, pruned candidate join, exact full-vector
    re-score — so the contract is value-certified cross-engine."""
    from apollo_spark.ops.dedup import tfidf_cosine_pairs

    d = _t(spark, sf_dir, "documents")
    return (
        tfidf_cosine_pairs(d, n=2, threshold=0.6, max_df=None, max_df_frac=0.04)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


ORACLE_TFIDF_CAPPED = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS term
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0)
  WHERE len(t) >= 2
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
stats AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
w AS (
  SELECT doc_id, term, tf * ln(CAST(n_docs AS DOUBLE) / df) AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
norms AS (
  SELECT doc_id, CAST(SUM(CAST(w*w AS DECIMAL(38,6))) AS DOUBLE) AS n2 FROM w GROUP BY doc_id
),
cutoff AS (SELECT CAST(floor(0.04 * n_docs) AS BIGINT) AS cap FROM stats),
kept AS (
  SELECT w.doc_id, w.term
  FROM w JOIN dfreq USING (term), cutoff
  WHERE dfreq.df <= cutoff.cap
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(CAST(a.w*b.w AS DECIMAL(38,6))) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  JOIN cand ON cand.id_a = a.doc_id AND cand.id_b = b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
FROM dots JOIN norms na ON na.doc_id = id_a JOIN norms nb ON nb.doc_id = id_b
WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.6
ORDER BY id_a, id_b
"""


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (ops.dedup.cdc_chunk_groups): a
    rolling md5 over the last 3 words cuts chunk boundaries where
    hash % 16 == 0 (LBFS/FastCDC lineage — expected ~16-word chunks), so an
    insertion only perturbs the chunks it touches and every other chunk
    still content-matches corpus-wide. Reports chunks recurring in >= 2
    distinct documents. The whole path — rolling hash, boundary rule,
    prefix-sum chunk ids, chunk hashing — replays verbatim in ANSI SQL, so
    the op is value-certified cross-engine, not just unit-tested."""
    from apollo_spark.ops.dedup import cdc_chunk_groups

    d = _t(spark, sf_dir, "documents")
    return (
        cdc_chunk_groups(d, window=3, divisor=16, min_docs=2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "chunk_hash")
    )


ORACLE_CDC_CHUNKS = r"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS word
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
       UNNEST(generate_series(1, len(t))) AS u(i)
),
rolled AS (
  SELECT doc_id, pos, word,
         string_agg(word, ' ') OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling
  FROM toks
),
flagged AS (
  SELECT doc_id, pos, word,
         CASE WHEN pos >= 2
                   AND ('0x' || substring(md5(rolling), 1, 15))::BIGINT % 16 = 0
              THEN 1 ELSE 0 END AS cut
  FROM rolled
),
numbered AS (
  SELECT doc_id, pos, word,
         COALESCE(SUM(cut) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
  FROM flagged
),
chunks AS (
  SELECT doc_id, chunk_id,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text,
         COUNT(*) AS n_words
  FROM numbered GROUP BY doc_id, chunk_id
)
SELECT md5(chunk_text) AS chunk_hash,
       CAST(MAX(n_words) AS BIGINT) AS n_words,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash
"""


def corpus_duplicate_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication rate of the corpus — the headline number a
    dedup run reports ("X% of tokens sat in duplicated spans"): total words,
    words inside CDC chunks recurring in >= 2 documents (counted at every
    occurrence), and their ratio. One aggregate over cdc_chunk_groups with
    the min_docs filter lifted; exact-integer counts make the ratio one
    deterministic IEEE division."""
    from apollo_spark.ops.dedup import cdc_chunk_groups

    d = _t(spark, sf_dir, "documents")
    g = cdc_chunk_groups(d, window=3, divisor=16, min_docs=1)
    mass = F.col("n_words") * F.col("n_occurrences")
    return g.agg(
        F.sum(mass).alias("total_words"),
        F.sum(F.when(F.col("n_docs") >= 2, mass).otherwise(F.lit(0))).alias("dup_words"),
    ).select(
        "total_words",
        "dup_words",
        (F.col("dup_words").cast("double") / F.col("total_words").cast("double")).alias("dup_frac"),
    )


ORACLE_DUP_MASS = r"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS word
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
       UNNEST(generate_series(1, len(t))) AS u(i)
),
rolled AS (
  SELECT doc_id, pos, word,
         string_agg(word, ' ') OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling
  FROM toks
),
flagged AS (
  SELECT doc_id, pos, word,
         CASE WHEN pos >= 2
                   AND ('0x' || substring(md5(rolling), 1, 15))::BIGINT % 16 = 0
              THEN 1 ELSE 0 END AS cut
  FROM rolled
),
numbered AS (
  SELECT doc_id, pos, word,
         COALESCE(SUM(cut) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
  FROM flagged
),
chunks AS (
  SELECT doc_id, chunk_id,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text,
         COUNT(*) AS n_words
  FROM numbered GROUP BY doc_id, chunk_id
),
groups AS (
  SELECT md5(chunk_text) AS chunk_hash,
         MAX(n_words) AS n_words,
         COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occurrences
  FROM chunks GROUP BY chunk_hash
)
SELECT CAST(SUM(n_words * n_occurrences) AS BIGINT) AS total_words,
       CAST(SUM(CASE WHEN n_docs >= 2 THEN n_words * n_occurrences ELSE 0 END) AS BIGINT) AS dup_words,
       CAST(SUM(CASE WHEN n_docs >= 2 THEN n_words * n_occurrences ELSE 0 END) AS DOUBLE)
         / CAST(SUM(n_words * n_occurrences) AS DOUBLE) AS dup_frac
FROM groups
"""


def doc_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG retrieval chunking (ops.corpus.sentence_chunks): sentence-split,
    then greedily pack consecutive sentences into ~24-word chunks — the
    boundary-respecting chunker an embedding pipeline runs before
    vectorizing. The synthetic corpus has no punctuation, so the query first
    synthesizes deterministic sentence boundaries (a period after every 8th
    word, one regexp_replace replayed verbatim by the oracle); chunk ids,
    word counts, and chunk hashes then certify the packer cross-engine."""
    from apollo_spark.ops.corpus import sentence_chunks

    d = _t(spark, sf_dir, "documents")
    punct = d.select(
        "doc_id",
        F.regexp_replace(
            F.col("text"),
            r"((?:[^ \t\n\f\r]+[ \t\n\f\r]+){7}[^ \t\n\f\r]+)[ \t\n\f\r]+",
            "$1. ",
        ).alias("text"),
    )
    return (
        sentence_chunks(punct, budget_words=24)
        .select("doc_id", "chunk_id", "n_sentences", "n_words", "chunk_hash")
        .orderBy("doc_id", "chunk_id")
    )


ORACLE_RAG_CHUNKS = r"""
WITH punct AS (
  SELECT doc_id,
         regexp_replace(text, '((?:[^ \t\n\f\r]+[ \t\n\f\r]+){7}[^ \t\n\f\r]+)[ \t\n\f\r]+', '\1. ', 'g') AS text
  FROM documents
),
base AS (
  SELECT doc_id,
         string_split(regexp_replace(replace(trim(text), chr(30), ' '),
                                     '([.!?])[ \t\n\f\r]+', '\1' || chr(30), 'g'), chr(30)) AS arr
  FROM punct WHERE length(trim(text)) > 0
),
sents AS (
  SELECT doc_id, i - 1 AS sidx, trim(arr[i]) AS sentence,
         len(string_split_regex(trim(arr[i]), '[ \t\n\f\r]+')) AS n_words
  FROM base, UNNEST(generate_series(1, len(arr))) AS u(i)
  WHERE length(trim(arr[i])) > 0
),
chunked AS (
  SELECT doc_id, sidx, sentence, n_words,
         CAST(floor(COALESCE(SUM(n_words) OVER (
           PARTITION BY doc_id ORDER BY sidx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 24.0) AS BIGINT) AS chunk_id
  FROM sents
)
SELECT doc_id, chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_sentences,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       md5(string_agg(sentence, ' ' ORDER BY sidx)) AS chunk_hash
FROM chunked
GROUP BY doc_id, chunk_id
ORDER BY doc_id, chunk_id
"""


def source_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency capping (RefinedWeb/FineWeb-style curation:
    no domain may dominate the corpus): keep the top 15 docs per source by
    (n_chars DESC, doc_id) via ops.rank.top_k_per_key — the two-phase
    salted selection whose every window partition is bounded even when one
    source owns half the corpus. Output is row-identical to the plain
    per-key ROW_NUMBER the oracle runs; the salt changes the plan, never
    the result."""
    from apollo_spark.ops.rank import top_k_per_key

    d = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return (
        top_k_per_key(
            d,
            ["source"],
            [F.col("n_chars").desc(), F.col("doc_id").asc()],
            k=15,
            salt_col=F.crc32(F.col("doc_id").cast("string")),
        )
        .select("source", "doc_id", "n_chars", "rank")
        .orderBy("source", "rank")
    )


ORACLE_SOURCE_FREQ_CAP = r"""
SELECT source, doc_id, n_chars, rank FROM (
  SELECT source, doc_id, n_chars,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id) AS INT) AS rank
  FROM documents
) WHERE rank <= 15
ORDER BY source, rank
"""


def user_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` (the same merging
    operator Structured Streaming uses for stateful session aggs — here in
    batch): one groupBy(user, session_window) shuffle, no stacked window
    functions. Semantics: an event merges into the open session while
    gap < 1800 s (window end = last_ts + gap, end-exclusive) — note the
    strict inequality, vs user_sessions' ``> 1800`` islands variant; the
    oracle replays ``>= 1800`` as the new-session flag accordingly. Sums ride
    DECIMAL(38,6) for order-independence."""
    e = _events(spark, sf_dir)
    ts = F.timestamp_micros(_ts_micros())
    return (
        e.select("user_id", ts.alias("ts"), "value")
        .groupBy("user_id", F.session_window("ts", "1800 seconds").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("start_us"),
            F.unix_micros(F.col("sw.end")).alias("end_us"),
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
        .orderBy("user_id", "start_us")
    )


ORACLE_SESSION_WINDOWS = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
),
flagged AS (
  SELECT user_id, ts_us, value,
         CASE WHEN LAG(ts_us) OVER w IS NULL OR ts_us - LAG(ts_us) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC)
),
sess AS (
  SELECT user_id, ts_us, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts_us) AS start_us,
       MAX(ts_us) + 1800000000 AS end_us,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, start_us
"""


def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + LOCF: hourly per-type counts, densified to the
    full hour grid (sequence+explode — the grid is generated distributed,
    min/max per type via one agg, never a driver loop), missing hours filled
    with count 0 and last-observation-carried-forward average
    (``F.last(ignorenulls=True)`` over an unbounded-preceding frame). The
    LOCF copies an already-ROUND()ed value, so floats stay hash-exact."""
    e = _events(spark, sf_dir)
    hourly = (
        e.select("event_type", F.expr("ts div 3600000000000").alias("h"), "value")
        .groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum(F.col("value")) / F.count(F.lit(1)), 6).alias("avg_value"),
        )
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select("event_type", F.explode(F.sequence("h0", "h1")).alias("h"))
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            (F.col("h") * F.lit(3600000000)).alias("hour_us"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_avg"),
        )
        .orderBy("event_type", "hour_us")
    )


ORACLE_HOURLY_GAPFILL = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         COUNT(*) AS n_events,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT event_type, unnest(generate_series(MIN(h), MAX(h))) AS h
  FROM hourly GROUP BY event_type
)
SELECT g.event_type, g.h * 3600000000 AS hour_us,
       COALESCE(n_events, 0) AS n_events,
       last_value(avg_value IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
FROM grid g LEFT JOIN hourly USING (event_type, h)
ORDER BY event_type, hour_us
"""


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days since last order, vs the
    fixed corpus horizon 1998-08-02), frequency (order count) and monetary
    (DECIMAL-exact total spend), each quartiled on a fully deterministic
    (metric, o_custkey) order, concatenated to the classic 3-digit segment
    code. Each quartile is a distributed two-phase rank
    (ops.rank.bucketed_ntile) — bit-identical to a global NTILE(4) window
    but never a customer-count-sized single task: one groupBy(custkey) +
    three 64-bucket passes."""
    from apollo_spark.ops.rank import bucketed_ntile_multi

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(F.lit("1998-08-02"), F.max(F.col("o_orderdate").cast("date"))).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(dsum(F.col("o_totalprice")), 2).alias("monetary"),
    )
    # quartile 1 = best in every dimension (most recent / most orders /
    # highest spend); custkey tie-break makes ntile assignment total. All
    # three quartiles ride ONE shuffle (explode to (metric, signed value),
    # window over (metric, bucket), pivot back) — ops.rank.bucketed_ntile_multi
    out = bucketed_ntile_multi(
        per_cust,
        {
            "r": (F.col("recency_days"), False),
            "f": (F.col("frequency"), True),
            "m": (F.col("monetary"), True),
        },
        4,
        id_col="o_custkey",
    )
    return carry_caches(
        out.select(
            "o_custkey",
            F.col("r_val").cast("int").alias("recency_days"),
            F.col("f_val").cast("long").alias("frequency"),
            F.col("m_val").alias("monetary"),
            F.concat_ws("", "r_q", "f_q", "m_q").alias("rfm"),
        )
        .orderBy("o_custkey"),
        out,
    )


ORACLE_RFM = """
WITH per_cust AS (
  SELECT o_custkey,
         datediff('day', MAX(CAST(o_orderdate AS DATE)), DATE '1998-08-02') AS recency_days,
         COUNT(*) AS frequency,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS VARCHAR)
       || CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS VARCHAR)
       || CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS VARCHAR) AS rfm
FROM per_cust
ORDER BY o_custkey
"""


def source_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary diversity: inverse-Simpson effective vocabulary
    size ``total^2 / sum(cnt^2)`` over whitespace-token counts — the corpus
    diagnostic that flags a source dominated by few repeated tokens.
    ``sum(cnt^2)`` stays exact BIGINT (no float accumulation anywhere); the
    single division at the end is the only double."""
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.length(F.trim("text")) > 0).select(
        "source", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.round((F.col("n_tokens") * F.col("n_tokens")).cast("double") / F.col("sum_c2"), 6).alias(
                "effective_vocab"
            ),
        )
        .orderBy("source")
    )


ORACLE_SOURCE_DIVERSITY = r"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
cnt AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
       ROUND(CAST(SUM(c) * SUM(c) AS DOUBLE) / SUM(c * c), 6) AS effective_vocab
FROM cnt GROUP BY source ORDER BY source
"""


def events_value_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical CDF of purchase values per event type at 20 fixed probe
    points: ecdf(v) = rank-of-last-tie / n via one cume_dist window —
    the distribution diagnostic behind value-based sampling cutoffs.
    Probing at vigintiles keeps the output bounded (type x 20 rows)."""
    e = _events(spark, sf_dir)
    vals = e.select("event_type", F.round(F.col("value"), 6).alias("v"))
    w = Window.partitionBy("event_type").orderBy("v")
    ec = vals.withColumn("ecdf", F.cume_dist().over(w))
    probes = vals.withColumn(
        "q", F.ntile(20).over(Window.partitionBy("event_type").orderBy(F.col("v").asc()))
    ).groupBy("event_type", "q").agg(F.max("v").alias("v"))
    return (
        probes.join(ec.groupBy("event_type", "v").agg(F.max("ecdf").alias("ecdf")), ["event_type", "v"])
        .select("event_type", "q", "v", F.round("ecdf", 6).alias("ecdf"))
        .orderBy("event_type", "q")
    )


ORACLE_VALUE_ECDF = """
WITH vals AS (
  SELECT event_type, ROUND(value, 6) AS v FROM events
),
ec AS (
  SELECT event_type, v,
         cume_dist() OVER (PARTITION BY event_type ORDER BY v) AS ecdf
  FROM vals
),
probes AS (
  SELECT event_type, q, MAX(v) AS v FROM (
    SELECT event_type, v,
           NTILE(20) OVER (PARTITION BY event_type ORDER BY v ASC) AS q
    FROM vals
  ) GROUP BY 1, 2
)
SELECT p.event_type, p.q, p.v, ROUND(e.ecdf, 6) AS ecdf
FROM probes p JOIN (SELECT event_type, v, MAX(ecdf) AS ecdf FROM ec GROUP BY 1, 2) e
  ON e.event_type = p.event_type AND e.v = p.v
ORDER BY p.event_type, p.q
"""


def _znorm_pattern() -> list[float]:
    """TS_PATTERN z-normalized driver-side — the same Python floats are
    inlined as literals in BOTH the Spark plan and the SQL oracle, so the
    normalization constants cannot diverge."""
    L = len(TS_PATTERN)
    mu = sum(TS_PATTERN) / L
    var = sum((v - mu) ** 2 for v in TS_PATTERN) / L
    sd = var**0.5
    return [(v - mu) / sd for v in TS_PATTERN]


def ts_znorm_pattern_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-NORMALIZED subsequence search (the UCR-suite normalization, Rakthanmanon
    et al. KDD 2012): each 8-event window is normalized to zero-mean/unit-std
    before the euclidean compare, making matches invariant to the user's value
    offset and scale — raw distance (ts_window_motifs) only finds matches at
    the pattern's absolute level. Window mean/std come from sequential folds
    over the SAME collect_list frame (order-deterministic, so the oracle
    replays bit-for-bit); constant windows (sd = 0) are skipped as undefined.
    One user_id shuffle + one top-k, identical shape to the raw variant."""
    e = _events(spark, sf_dir)
    L = len(TS_PATTERN)
    qhat = _znorm_pattern()
    w = Window.partitionBy("user_id").orderBy(F.col("ts_s").asc(), F.col("event_id").asc()).rowsBetween(0, L - 1)
    base = e.select("event_id", "user_id", _ts_seconds().alias("ts_s"), "value")
    win = base.withColumn("win", F.collect_list("value").over(w)).filter(F.size("win") == L)
    s = F.aggregate("win", F.lit(0.0), lambda a, v: a + v)
    win = win.withColumn("mu", s / F.lit(float(L)))
    ss = F.aggregate("win", F.lit(0.0), lambda a, v: a + (v - F.col("mu")) * (v - F.col("mu")))
    win = win.withColumn("sd", F.sqrt(ss / F.lit(float(L)))).filter(F.col("sd") > 0)
    pat = F.array(*[F.lit(v) for v in qhat])
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("win", pat, lambda a, b: ((a - F.col("mu")) / F.col("sd") - b) * ((a - F.col("mu")) / F.col("sd") - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        win.select("user_id", F.col("event_id").alias("start_event_id"), F.round(dist, 6).alias("zdist"))
        .orderBy(F.col("zdist").asc(), F.col("user_id").asc(), F.col("start_event_id").asc())
        .limit(20)
    )


def _oracle_znorm() -> str:
    qhat = "[" + ", ".join(repr(v) for v in _znorm_pattern()) + "]"
    return f"""
WITH base AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s, value FROM events
),
win AS (
  SELECT user_id, event_id AS start_event_id,
         list(value) OVER (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC
                           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
  FROM base
),
stats AS (
  SELECT user_id, start_event_id, w,
         list_sum(w) / 8.0 AS mu
  FROM win WHERE len(w) = 8
),
stats2 AS (
  SELECT user_id, start_event_id, w, mu,
         sqrt(list_sum(list_transform(w, v -> (v - mu) * (v - mu))) / 8.0) AS sd
  FROM stats
)
SELECT user_id, start_event_id,
       ROUND(sqrt(list_sum(list_transform(generate_series(1, 8),
             i -> ((w[i] - mu) / sd - ({qhat})[i]) * ((w[i] - mu) / sd - ({qhat})[i])))), 6) AS zdist
FROM stats2 WHERE sd > 0
ORDER BY zdist ASC, user_id ASC, start_event_id ASC LIMIT 20
"""


def benchmark_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-scored decontamination (Brown et al. 2020 appendix-C
    style): containment(B -> D) = |grams(B) ∩ grams(D)| / |grams(B)| — the
    statistic that catches a SHORT benchmark item embedded inside a LONG
    training document, which symmetric Jaccard dilutes toward 0 and the
    any-overlap scan (benchmark_decontamination) can't rank. Benchmark =
    the doc_id % 29 == 0 slice; word trigrams; pairs at containment >= 0.4.
    Benchmark grams broadcast (eval sets are tiny at any corpus scale);
    corpus side is one narrow explode; I/|B| is BIGINT/BIGINT -> exact."""
    from apollo_spark.ops.dedup import shingles

    d = _t(spark, sf_dir, "documents")
    bgrams = (
        d.filter(F.col("doc_id") % 29 == 0)
        .select(F.col("doc_id").alias("bench_id"), shingles(F.col("text"), 3).alias("sh"))
        .select("bench_id", F.size("sh").alias("n_b"), F.explode("sh").alias("g"))
    )
    cgrams = (
        d.filter(F.col("doc_id") % 29 != 0)
        .select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("g"))
    )
    inter = (
        cgrams.join(F.broadcast(bgrams), "g")
        .groupBy("doc_id", "bench_id", "n_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.withColumn("containment", F.round(F.col("n_shared").cast("double") / F.col("n_b"), 6))
        .filter(F.col("containment") >= 0.4)
        .select("doc_id", "bench_id", "n_shared", "containment")
        .orderBy("doc_id", "bench_id")
    )


ORACLE_CONTAINMENT = r"""
WITH g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
)
SELECT c.doc_id, b.doc_id AS bench_id,
       len(list_intersect(c.sh, b.sh)) AS n_shared,
       ROUND(CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE) / len(b.sh), 6) AS containment
FROM g c JOIN g b ON c.doc_id % 29 != 0 AND b.doc_id % 29 = 0
WHERE CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE) / len(b.sh) >= 0.4
ORDER BY c.doc_id, bench_id
"""


def aqp_orders_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing (BlinkDB-style, Agarwal et al.
    EuroSys'13): per-status avg(o_totalprice) from a DETERMINISTIC ~10%
    hash sample (portable md5 hash on the key — the same sample on every
    engine, so the 'approximate' answer is itself exactly replayable), with
    a 95% normal-approximation CI from the sample variance. The full-scan
    exact answer costs 10x the I/O; the CI quantifies what the 90% saved.
    Sums/sum-of-squares ride DECIMAL(38,6) -> hash-stable CI bounds."""
    o = _t(spark, sf_dir, "orders")
    h = F.conv(F.substring(F.md5(F.concat(F.lit("aqp"), F.col("o_orderkey").cast("string"))), 1, 15), 16, 10).cast("long")
    s = o.filter(h % 10 == 0)
    n = F.count(F.lit(1))
    mean = dsum(F.col("o_totalprice")) / n
    ex2 = dsum(F.col("o_totalprice") * F.col("o_totalprice")) / n
    agg = s.groupBy("o_orderstatus").agg(n.alias("n_sample"), mean.alias("m"), ex2.alias("m2"))
    se = F.sqrt((F.col("m2") - F.col("m") * F.col("m")) / F.col("n_sample"))
    return (
        agg.select(
            "o_orderstatus",
            "n_sample",
            F.round("m", 4).alias("avg_est"),
            F.round(F.col("m") - 1.96 * se, 4).alias("ci_low"),
            F.round(F.col("m") + 1.96 * se, 4).alias("ci_high"),
        )
        .orderBy("o_orderstatus")
    )


ORACLE_AQP = """
WITH s AS (
  SELECT o_orderstatus, o_totalprice FROM orders
  WHERE ('0x' || substring(md5('aqp' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
),
agg AS (
  SELECT o_orderstatus, COUNT(*) AS n_sample,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS m,
         CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS m2
  FROM s GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_sample, ROUND(m, 4) AS avg_est,
       ROUND(m - 1.96 * sqrt((m2 - m * m) / n_sample), 4) AS ci_low,
       ROUND(m + 1.96 * sqrt((m2 - m * m) / n_sample), 4) AS ci_high
FROM agg ORDER BY o_orderstatus
"""


def source_dup_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication diagnostic: fraction of documents whose
    normalized text also appears elsewhere in the corpus (any source), and
    the fraction that would be DROPPED by exact dedup under the min-id
    policy — the two numbers a curation report leads with. One content-hash
    window over the corpus + one source rollup."""
    from apollo_spark.ops.dedup import normalize_text

    d = _t(spark, sf_dir, "documents")
    keyed = d.select("doc_id", "source", F.md5(normalize_text(F.col("text"))).alias("__k"))
    w = Window.partitionBy("__k")
    marked = keyed.select(
        "source",
        (F.count(F.lit(1)).over(w) > 1).cast("int").alias("is_dup"),
        (F.min("doc_id").over(w) != F.col("doc_id")).cast("int").alias("is_dropped"),
    )
    n = F.count(F.lit(1))
    return (
        marked.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.sum("is_dup").alias("n_in_dup_group"),
            F.sum("is_dropped").alias("n_dropped"),
            F.round(F.sum("is_dup") / n, 6).alias("dup_frac"),
            F.round(F.sum("is_dropped") / n, 6).alias("drop_frac"),
        )
        .orderBy("source")
    )


ORACLE_SOURCE_DUP_RATES = r"""
WITH keyed AS (
  SELECT doc_id, source, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS k
  FROM documents
),
marked AS (
  SELECT source,
         CASE WHEN COUNT(*) OVER (PARTITION BY k) > 1 THEN 1 ELSE 0 END AS is_dup,
         CASE WHEN MIN(doc_id) OVER (PARTITION BY k) != doc_id THEN 1 ELSE 0 END AS is_dropped
  FROM keyed
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_in_dup_group,
       CAST(SUM(is_dropped) AS BIGINT) AS n_dropped,
       ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_frac,
       ROUND(CAST(SUM(is_dropped) AS DOUBLE) / COUNT(*), 6) AS drop_frac
FROM marked GROUP BY source ORDER BY source
"""


def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile per event type: event share and DECIMAL-
    exact average value by hour-of-week (0 = Monday 00:00 UTC) — the
    repeating-load fingerprint capacity planning and anomaly baselines read.
    One groupBy over derived integer keys; share denominators ride a window
    over the (type)-grouped result, never a second scan."""
    e = _events(spark, sf_dir)
    # epoch day 0 = 1970-01-01 = Thursday; shift +3 days so week starts Monday
    hour = F.expr("ts div 3600000000000")
    how = ((hour + 72) % 168).alias("hour_of_week")
    agg = (
        e.select("event_type", how, "value")
        .groupBy("event_type", "hour_of_week")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(davg(F.col("value"), F.count(F.lit(1))), 6).alias("avg_value"))
    )
    w = Window.partitionBy("event_type")
    return (
        agg.withColumn("share", F.round(F.col("n_events") / F.sum("n_events").over(w), 6))
        .select("event_type", "hour_of_week", "n_events", "avg_value", "share")
        .orderBy("event_type", "hour_of_week")
    )


ORACLE_WEEKLY_SEASONALITY = """
WITH base AS (
  SELECT event_type,
         ((epoch_us(ts) // 3600000000) + 72) % 168 AS hour_of_week,
         value
  FROM events
),
agg AS (
  SELECT event_type, hour_of_week, COUNT(*) AS n_events,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value
  FROM base GROUP BY 1, 2
)
SELECT event_type, hour_of_week, n_events, avg_value,
       ROUND(CAST(n_events AS DOUBLE) / SUM(n_events) OVER (PARTITION BY event_type), 6) AS share
FROM agg ORDER BY event_type, hour_of_week
"""


def customer_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: cumulative revenue share of customers ranked by
    spend — reports the share captured by the top 1/5/10/20/50% (the 80/20
    diagnostic). One customer rollup + the distributed two-phase rank
    (ops.rank.bucketed_rank: range-bucket on spend, per-bucket window +
    broadcast offsets) carrying the running spend sum in the same pass —
    bit-identical to the global ordered window, never a single task;
    DECIMAL sums end-to-end so the cumulative shares are order-exact."""
    from apollo_spark.ops.rank import bucketed_rank

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("spend")
    )
    ranked = bucketed_rank(
        per_cust,
        F.col("spend"),
        descending=True,
        tiebreak=[F.col("o_custkey").asc()],
        out_col="rn",
        cumsum={"cum": F.col("spend")},
    )
    ranked = carry_caches(ranked.select("o_custkey", "spend", "rn", "cum"), ranked)
    total_n = F.count(F.lit(1))
    stats = ranked.agg(total_n.alias("n"), F.sum("spend").alias("tot"))
    pct = F.ceil(F.col("rn") * F.lit(100.0) / F.col("n"))
    marked = ranked.crossJoin(F.broadcast(stats)).withColumn("pct", pct)
    return carry_caches(
        marked.filter(F.col("pct").isin(1, 5, 10, 20, 50, 100))
        .groupBy("pct")
        .agg(
            # divide as doubles (exactly-represented decimals at this scale):
            # decimal/decimal result precision rules differ across engines
            F.round(F.max("cum").cast("double") / F.max("tot").cast("double"), 6).alias("revenue_share")
        )
        .select(F.col("pct").cast("long").alias("top_pct"), "revenue_share")
        .orderBy("top_pct"),
        ranked,
    )


ORACLE_PARETO = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, spend,
         ROW_NUMBER() OVER (ORDER BY spend DESC, o_custkey ASC) AS rn,
         SUM(spend) OVER (ORDER BY spend DESC, o_custkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM per_cust
),
stats AS (SELECT COUNT(*) AS n, SUM(spend) AS tot FROM ranked)
SELECT CAST(pct AS BIGINT) AS top_pct,
       ROUND(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 6) AS revenue_share
FROM (SELECT rn, cum, CEIL(rn * 100.0 / n) AS pct, tot FROM ranked CROSS JOIN stats)
WHERE pct IN (1, 5, 10, 20, 50, 100)
GROUP BY pct ORDER BY top_pct
"""


def item_cf_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based collaborative filtering (Sarwar et al. WWW'01): item-item
    cosine over the binary user-item event matrix via a user-keyed self-join
    (co-occurrence counts / sqrt(pop_a * pop_b)), then top-3 neighbors per
    item. The self-join fans out per-user-degree^2 — bounded here by events
    per user; at 100 TB cap per-user items or sample heavy users (same df^2
    discipline as the dedup inverted indexes). Integer co-counts + one final
    sqrt keep the score hash-exact."""
    e = _events(spark, sf_dir)
    item = F.get_json_object("props", "$.k").cast("int")
    ui = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", item.alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    pop = ui.groupBy("item").agg(F.count(F.lit(1)).alias("pop"))
    co = (
        ui.alias("a")
        .join(ui.alias("b"), (F.col("a.user_id") == F.col("b.user_id")) & (F.col("a.item") != F.col("b.item")))
        .groupBy(F.col("a.item").alias("item"), F.col("b.item").alias("other"))
        .agg(F.count(F.lit(1)).alias("co"))
    )
    scored = (
        co.join(pop.select(F.col("item"), F.col("pop").alias("pop_a")), "item")
        .join(pop.select(F.col("item").alias("other"), F.col("pop").alias("pop_b")), "other")
        .withColumn("score", F.round(F.col("co") / F.sqrt(F.col("pop_a") * F.col("pop_b")), 6))
    )
    w = Window.partitionBy("item").orderBy(F.col("score").desc(), F.col("other").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("item", "rank", "other", "co", "score")
        .orderBy("item", "rank")
    )


ORACLE_ITEM_CF = """
WITH ui AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item
  FROM events WHERE event_type = 'purchase'
    AND json_extract_string(props, '$.k') IS NOT NULL
),
pop AS (SELECT item, COUNT(*) AS pop FROM ui GROUP BY item),
co AS (
  SELECT a.item AS item, b.item AS other, COUNT(*) AS co
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item != b.item
  GROUP BY 1, 2
),
scored AS (
  SELECT co.item, co.other, co.co,
         ROUND(co.co / sqrt(pa.pop * pb.pop), 6) AS score
  FROM co JOIN pop pa ON pa.item = co.item JOIN pop pb ON pb.item = co.other
)
SELECT item, rank, other, co, score FROM (
  SELECT item, other, co, score,
         ROW_NUMBER() OVER (PARTITION BY item ORDER BY score DESC, other ASC) AS rank
  FROM scored
) WHERE rank <= 3 ORDER BY item, rank
"""


def item_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted shortest paths (BFS) over the co-purchase item graph from
    seed item 0, depth <= 3: min-distance per reachable item. The frontier
    loop is UNROLLED into the DAG (3 equi-joins frontier->edges, dedup by
    min), the standard Spark BFS posture — per-hop shuffle carries the
    frontier, never the transitive closure. Oracle = recursive CTE with the
    same min-distance semantics."""
    e = _events(spark, sf_dir)
    item = F.get_json_object("props", "$.k").cast("int")
    ui = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", item.alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    edges = (
        ui.alias("a")
        .join(ui.alias("b"), (F.col("a.user_id") == F.col("b.user_id")) & (F.col("a.item") != F.col("b.item")))
        .select(F.col("a.item").alias("src"), F.col("b.item").alias("dst"))
        .distinct()
        .persist()
    )
    dist = spark.createDataFrame([(0, 0)], "item int, d int")
    frontier = dist
    for hop in (1, 2, 3):
        frontier = (
            frontier.join(edges, frontier["item"] == edges["src"])
            .select(F.col("dst").alias("item"), F.lit(hop).alias("d"))
            .distinct()
        )
        dist = dist.unionByName(frontier)
    return scoped_persist(
        dist.groupBy("item").agg(F.min("d").alias("distance")).orderBy("item"), edges
    )


ORACLE_ITEM_REACH = """
WITH RECURSIVE ui AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item
  FROM events WHERE event_type = 'purchase'
    AND json_extract_string(props, '$.k') IS NOT NULL
),
edges AS (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item != b.item
),
reach(item, d) AS (
  SELECT CAST(0 AS INT), 0
  UNION
  SELECT e.dst, r.d + 1 FROM reach r JOIN edges e ON e.src = r.item WHERE r.d < 3
)
SELECT item, MIN(d) AS distance FROM reach GROUP BY item ORDER BY item
"""


def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: users deterministically split A/B by a
    portable hash, conversion = heavy purchaser (>= 14 purchase events — the
    corpus median, so neither arm saturates at 0% or 100% and the pooled SE
    never degenerates to zero); reports per-arm rates and the two-proportion
    z-score (pooled SE) — the decision statistic an A/B dashboard prints.
    All counts exact BIGINT; the z-score is a few IEEE ops over exact
    integers, so it hash-gates."""
    e = _events(spark, sf_dir)
    users = e.select("user_id").distinct()
    arm = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("ab"), F.col("user_id").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 2 == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    buyers = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__np"))
        .filter(F.col("__np") >= 14)
        .select("user_id")
    )
    marked = users.withColumn("arm", arm).join(
        buyers.withColumn("converted", F.lit(1)), "user_id", "left"
    )
    per_arm = marked.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.coalesce("converted", F.lit(0))).alias("n_converted"),
    )
    a = per_arm.filter(F.col("arm") == "A").select(
        F.col("n_users").alias("na"), F.col("n_converted").alias("ca")
    )
    b = per_arm.filter(F.col("arm") == "B").select(
        F.col("n_users").alias("nb"), F.col("n_converted").alias("cb")
    )
    j = a.crossJoin(b)
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    pool = (F.col("ca") + F.col("cb")).cast("double") / (F.col("na") + F.col("nb"))
    se = F.sqrt(pool * (1 - pool) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    return j.select(
        "na",
        "ca",
        "nb",
        "cb",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round((pa - pb) / se, 6).alias("z_score"),
    )


ORACLE_AB_TEST = """
WITH users AS (SELECT DISTINCT user_id FROM events),
buyers AS (SELECT user_id FROM events WHERE event_type = 'purchase'
           GROUP BY user_id HAVING COUNT(*) >= 14),
marked AS (
  SELECT u.user_id,
         CASE WHEN ('0x' || substring(md5('ab' || CAST(u.user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS converted
  FROM users u LEFT JOIN buyers b ON b.user_id = u.user_id
),
per_arm AS (
  SELECT arm, COUNT(*) AS n_users, CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM marked GROUP BY arm
)
SELECT a.n_users AS na, a.n_converted AS ca, b.n_users AS nb, b.n_converted AS cb,
       ROUND(CAST(a.n_converted AS DOUBLE) / a.n_users, 6) AS rate_a,
       ROUND(CAST(b.n_converted AS DOUBLE) / b.n_users, 6) AS rate_b,
       ROUND((CAST(a.n_converted AS DOUBLE) / a.n_users - CAST(b.n_converted AS DOUBLE) / b.n_users)
             / sqrt((CAST(a.n_converted + b.n_converted AS DOUBLE) / (a.n_users + b.n_users))
                    * (1 - CAST(a.n_converted + b.n_converted AS DOUBLE) / (a.n_users + b.n_users))
                    * (1.0 / a.n_users + 1.0 / b.n_users)), 6) AS z_score
FROM (SELECT * FROM per_arm WHERE arm = 'A') a CROSS JOIN (SELECT * FROM per_arm WHERE arm = 'B') b
"""


def doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 word bigrams by tf * ln(N/df)
    (deterministic rank: weight desc, term asc) — the classic TF-IDF
    keyword list a search/index pipeline stores per doc. Same inverted
    stats as tfidf_dup_pairs, but the output is per-doc top-k, so the only
    wide exchange is the tf groupBy; the top-k is one doc-keyed window.
    Weight rounds at 6dp BEFORE ranking so ordering can't split on sub-grain
    fp noise across engines."""
    d = _t(spark, sf_dir, "documents")
    tok_arr = d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(F.col("t")) - 2),
        lambda i: F.concat_ws(" ", F.element_at(F.col("t"), i + 1), F.element_at(F.col("t"), i + 2)),
    )
    toks = tok_arr.select("doc_id", F.explode(grams).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = tf.select(F.countDistinct("doc_id").alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6).alias("weight"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("weight").desc(), F.col("term").asc())
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "weight")
        .orderBy("doc_id", "rank")
    )


ORACLE_DOC_KEYWORDS = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS term
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0)
  WHERE len(t) >= 2
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
stats AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
w AS (
  SELECT doc_id, term, ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS weight
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
)
SELECT doc_id, rank, term, weight FROM (
  SELECT doc_id, term, weight,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY weight DESC, term ASC) AS rank
  FROM w
) WHERE rank <= 3 ORDER BY doc_id, rank
"""


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/Great-Expectations-style data profile of the events table: per
    column completeness (null count), approx-free distinct count, numeric
    range — plus the uniqueness CONSTRAINT check on the key (event_id
    distinct == count). ONE aggregate pass (Catalyst expands the multi-
    distinct into an Expand + two-phase agg; no per-column scans), melted to
    (column, metric, value) long form for a monitoring sink."""
    e = _events(spark, sf_dir)
    agg = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(c).alias(f"nn_{c}") for c in ("event_id", "user_id", "event_type", "value", "props")],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in ("event_id", "user_id", "event_type")],
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    rows = []
    for c in ("event_id", "user_id", "event_type", "value", "props"):
        rows.append(f"'{c}', 'n_null', cast(n_rows - nn_{c} as double)")
    for c in ("event_id", "user_id", "event_type"):
        rows.append(f"'{c}', 'n_distinct', cast(nd_{c} as double)")
    rows.append("'value', 'min', min_value")
    rows.append("'value', 'max', max_value")
    rows.append("'event_id', 'unique_check', cast(case when nd_event_id = n_rows then 1 else 0 end as double)")
    rows.append("'_table', 'n_rows', cast(n_rows as double)")
    n = len(rows)
    stacked = agg.select(
        F.expr(f"stack({n}, {', '.join(rows)}) as (column, metric, value)")
    )
    return stacked.select("column", "metric", F.round("value", 6).alias("value")).orderBy("column", "metric")


ORACLE_EVENTS_PROFILE = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(event_id) AS nn_event_id, COUNT(user_id) AS nn_user_id,
         COUNT(event_type) AS nn_event_type, COUNT(value) AS nn_value, COUNT(props) AS nn_props,
         COUNT(DISTINCT event_id) AS nd_event_id, COUNT(DISTINCT user_id) AS nd_user_id,
         COUNT(DISTINCT event_type) AS nd_event_type,
         MIN(value) AS min_value, MAX(value) AS max_value
  FROM events
)
SELECT "column", metric, ROUND(value, 6) AS value FROM (
  SELECT '_table' AS "column", 'n_rows' AS metric, CAST(n_rows AS DOUBLE) AS value FROM agg
  UNION ALL SELECT 'event_id', 'n_null', CAST(n_rows - nn_event_id AS DOUBLE) FROM agg
  UNION ALL SELECT 'user_id', 'n_null', CAST(n_rows - nn_user_id AS DOUBLE) FROM agg
  UNION ALL SELECT 'event_type', 'n_null', CAST(n_rows - nn_event_type AS DOUBLE) FROM agg
  UNION ALL SELECT 'value', 'n_null', CAST(n_rows - nn_value AS DOUBLE) FROM agg
  UNION ALL SELECT 'props', 'n_null', CAST(n_rows - nn_props AS DOUBLE) FROM agg
  UNION ALL SELECT 'event_id', 'n_distinct', CAST(nd_event_id AS DOUBLE) FROM agg
  UNION ALL SELECT 'user_id', 'n_distinct', CAST(nd_user_id AS DOUBLE) FROM agg
  UNION ALL SELECT 'event_type', 'n_distinct', CAST(nd_event_type AS DOUBLE) FROM agg
  UNION ALL SELECT 'value', 'min', min_value FROM agg
  UNION ALL SELECT 'value', 'max', max_value FROM agg
  UNION ALL SELECT 'event_id', 'unique_check',
    CAST(CASE WHEN nd_event_id = n_rows THEN 1 ELSE 0 END AS DOUBLE) FROM agg
)
ORDER BY "column", metric
"""


def item_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted popularity: per item, sum of exp(-age_days / 30)
    over purchase events (30-day half-life-ish exponential decay vs the
    corpus max timestamp) — the freshness-aware ranking signal recsys and
    trending feeds use instead of raw counts. The reference time is an
    in-plan scalar (broadcast one-row agg, no driver action); each decay
    term is ROUND()ed before the DECIMAL accumulation so the sum is
    order-independent AND engine-exact despite exp()."""
    e = _events(spark, sf_dir)
    item = F.get_json_object("props", "$.k").cast("int")
    p = e.filter(F.col("event_type") == "purchase").select(
        item.alias("item"), F.expr("ts div 1000000000").alias("ts_s")
    ).filter(F.col("item").isNotNull())
    ref = p.agg(F.max("ts_s").alias("ref_s"))
    term = F.round(F.exp(-(F.col("ref_s") - F.col("ts_s")).cast("double") / F.lit(86400.0 * 30)), 9)
    return (
        p.crossJoin(F.broadcast(ref))
        .select("item", term.alias("w"))
        .groupBy("item")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("w").cast("decimal(38,9)")).cast("double").alias("decayed_score"),
        )
        .select("item", "n_purchases", F.round("decayed_score", 6).alias("decayed_score"))
        .orderBy(F.col("decayed_score").desc(), F.col("item").asc())
    )


ORACLE_DECAYED_POP = """
WITH p AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INT) AS item,
         epoch_ns(ts) // 1000000000 AS ts_s
  FROM events
  WHERE event_type = 'purchase' AND json_extract_string(props, '$.k') IS NOT NULL
),
ref AS (SELECT MAX(ts_s) AS ref_s FROM p)
SELECT item, COUNT(*) AS n_purchases,
       ROUND(CAST(SUM(CAST(ROUND(exp(-CAST(ref_s - ts_s AS DOUBLE) / 2592000.0), 9) AS DECIMAL(38,9))) AS DOUBLE), 6) AS decayed_score
FROM p CROSS JOIN ref
GROUP BY item
ORDER BY decayed_score DESC, item ASC
"""


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: the top-10 3-step event-type sequences
    across all user timelines (two LAG windows per user, one global count)
    — the "how do users actually move" query behind funnel design. Ordering
    ties break on (ts, event_id), so the sequences are deterministic."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("t2", F.lag("event_type", 1).over(w))
        .withColumn("t1", F.lag("event_type", 2).over(w))
        .filter(F.col("t1").isNotNull())
        .select(F.concat_ws(" > ", "t1", "t2", "event_type").alias("path"))
    )
    return (
        seq.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


ORACLE_PATH_TRIGRAMS = """
WITH seq AS (
  SELECT LAG(event_type, 2) OVER w AS t1,
         LAG(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT t1 || ' > ' || t2 || ' > ' || t3 AS path, COUNT(*) AS n
FROM seq WHERE t1 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10
"""


def discount_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation between discount and quantity per part
    brand — the does-discount-move-volume diagnostic. Every moment
    (sum x, y, xy, x^2, y^2) accumulates through DECIMAL(38,6), so r is a
    deterministic function of exact sums — no fp-order drift — and the
    whole statistic hash-gates. One co-shuffled join + one rollup."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l["l_partkey"] == p["p_partkey"]).select(
        "p_brand", F.col("l_discount").alias("x"), F.col("l_quantity").alias("y")
    )
    n = F.count(F.lit(1))
    agg = j.groupBy("p_brand").agg(
        n.alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        agg.select("p_brand", "n", F.round(num / den, 6).alias("pearson_r"))
        .orderBy("p_brand")
    )


ORACLE_DISCOUNT_CORR = """
WITH j AS (
  SELECT p.p_brand, l.l_discount AS x, l.l_quantity AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
agg AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
  FROM j GROUP BY p_brand
)
SELECT p_brand, n,
       ROUND((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS pearson_r
FROM agg ORDER BY p_brand
"""


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length distribution: log2-bucketed doc character counts per
    source (bucket = floor(log2(n_chars)), so 2^b..2^{b+1}-1 chars) — the
    length histogram that picks chunking and packing parameters. Integer
    bucket via BIGINT bit-length (no fp log at bucket edges: log2(1024)
    could land on either side of 10.0 in different libm's)."""
    d = _t(spark, sf_dir, "documents")
    # floor(log2(n)) for n >= 1 as binary-representation length - 1 —
    # integer-exact on both engines (conv/bin emit no leading zeros)
    bucket = (F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)) - 1).alias("bucket")
    return (
        d.filter(F.col("n_chars") >= 1)
        .select("source", bucket)
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "bucket")
    )


ORACLE_LENGTH_HISTOGRAM = """
SELECT source, CAST(length(bin(n_chars)) - 1 AS INT) AS bucket, COUNT(*) AS n_docs
FROM documents WHERE n_chars >= 1
GROUP BY 1, 2 ORDER BY source, bucket
"""


def nation_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: the LAG-over-aggregate
    shape (rollup to (nation, year), then one ordered window per nation) a
    finance dashboard runs. Revenue sums ride DECIMAL; growth is one
    double division of exact sums, NULL for each nation's first year."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.year(F.col("o_orderdate").cast("date")).alias("yr"))
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return (
        rev.withColumn("yoy_growth", F.round((F.col("revenue") - prev) / prev, 6))
        .select("n_name", "yr", F.round("revenue", 2).alias("revenue"), "yoy_growth")
        .orderBy("n_name", "yr")
    )


ORACLE_YOY_GROWTH = """
WITH rev AS (
  SELECT n.n_name, EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS yr,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, CAST(yr AS INT) AS yr, ROUND(revenue, 2) AS revenue,
       ROUND((revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w, 6) AS yoy_growth
FROM rev
WINDOW w AS (PARTITION BY n_name ORDER BY yr)
ORDER BY n_name, yr
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# Ordering contract: every oracle-backed query precedes every rows-only one.
# The round-1 gate evaluated only the first 50 entries, so the five
# previously-ungated oracle-backed queries lead the dict, and the four
# rows-only queries (no ORACLES entry) close it.
# --------------------------------------------------------------------------
# round 6: linkage + web-curation tier
# --------------------------------------------------------------------------


def _entity_pairs(spark: SparkSession, sf_dir: str):
    """Shared SymSpell candidate-pair table over the planted-twin customer
    entity strings, consumed by fuzzy_entity_dup_pairs AND
    entity_golden_records. Artifact-routed like _doc_components /
    _trained_langid_preds: with APOLLO_SPARK_ARTIFACT_DIR set the
    deletion-neighborhood join is paid once per corpus and committed as a
    TxTable; unset, each query builds self-contained for its oracle.
    Returns (base_entities, pairs)."""
    import os as _os

    from apollo_spark.ops.linkage import fuzzy_dup_pairs

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.md5(F.col("c_custkey").cast("string")).alias("s")
    )
    planted = c.filter(F.pmod("id", F.lit(3)) == 0).select(
        (F.col("id") + F.lit(10_000_000)).alias("id"),
        F.concat(
            F.expr("substr(s, 1, pmod(id, length(s)))"),
            F.expr("substr(s, pmod(id, length(s)) + 2, length(s) - pmod(id, length(s)) - 1)"),
        ).alias("s"),
    )
    base = c.unionByName(planted)

    def build() -> DataFrame:
        return fuzzy_dup_pairs(base, "id", "s").select(
            "id_a", "id_b", F.col("dist").cast("int").alias("dist")
        )

    art = _os.environ.get("APOLLO_SPARK_ARTIFACT_DIR")
    if art:
        from apollo_spark.table_format import train_or_load_table

        tag = sf_dir.strip("/").replace("/", "_")
        return base, train_or_load_table(spark, f"{art}/entity_pairs_{tag}", build)
    return base, build()


def fuzzy_entity_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution without a cross product (ops.linkage.fuzzy_dup_pairs):
    SymSpell deletion-neighborhood candidate generation — strings within
    Levenshtein distance 1 necessarily share a deletion-1 variant, so one
    keyed equality join on variants finds every candidate and only
    candidates pay the exact levenshtein() re-score. Entity strings are
    md5(c_custkey) hexes (one UNIQUE sparse string per customer) with a
    planted distance-1 twin for every 3rd row (one char deleted at an
    id-keyed position), so the matcher provably fires at every SF while
    candidate groups stay bounded (linear growth). The driver tables'
    natural string columns are both measured worst cases and deliberately
    avoided: consecutive customer names saturate the numeric keyspace
    (deletion-variant groups grow with density — 236 s at sf1, 82x at 10x
    data, round-6 adjudication) and part names have only 64 distinct values
    (every same-name pair is a distance-0 hit: output itself quadratic).
    Sparse near-unique strings are the workload a fuzzy joiner exists for;
    data this hot belongs to exact_dedup's hash-groupBy instead."""
    _, pairs = _entity_pairs(spark, sf_dir)
    return pairs.orderBy("id_a", "id_b")


ORACLE_FUZZY_NAME_PAIRS = r"""
WITH c AS (SELECT c_custkey AS id, md5(CAST(c_custkey AS VARCHAR)) AS s FROM customer),
planted AS (
  SELECT id + 10000000 AS id,
         concat(substr(s, 1, id % length(s)),
                substr(s, id % length(s) + 2, length(s) - id % length(s) - 1)) AS s
  FROM c WHERE id % 3 = 0
),
base AS (SELECT * FROM c UNION ALL SELECT * FROM planted),
v AS (
  SELECT id, s,
         unnest(list_distinct(list_prepend(s,
           list_transform(generate_series(1, length(s)),
             i -> concat(substr(s, 1, i-1), substr(s, i+1, length(s)-i)))))) AS v
  FROM base
),
cand AS (
  SELECT DISTINCT a.id AS id_a, a.s AS s_a, b.id AS id_b, b.s AS s_b
  FROM v a JOIN v b USING (v) WHERE a.id < b.id
)
SELECT id_a, id_b, CAST(levenshtein(s_a, s_b) AS INT) AS dist
FROM cand WHERE levenshtein(s_a, s_b) <= 1
ORDER BY id_a, id_b
"""


_URL_SYNTH_SPARK = """
CASE pmod(doc_id, 5)
  WHEN 0 THEN concat('http://www.', source, '.example.com/page/', cast(pmod(doc_id, 40) as string))
  WHEN 1 THEN concat('HTTP://WWW.', upper(source), '.EXAMPLE.COM/page/', cast(pmod(doc_id, 40) as string), '/')
  WHEN 2 THEN concat('http://www.', source, '.example.com:80/page/', cast(pmod(doc_id, 40) as string), '?utm_source=feed')
  WHEN 3 THEN concat('http://www.', source, '.example.com/page/', cast(pmod(doc_id, 40) as string), '?b=2&a=1#frag')
  ELSE concat('http://www.', source, '.example.com/page/', cast(pmod(doc_id, 40) as string), '?a=1&b=2&gclid=xyz')
END
"""


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup (ops.web.url_dup_groups): the same page
    arrives as http/HTTP, with :80, with utm_*/gclid tracking params, with
    param-order shuffles, fragments, and trailing slashes — canonicalization
    must collapse all of them WITHOUT merging genuinely different URLs
    (different ?a=1&b=2 payloads stay distinct). The corpus has no URL
    column, so one deterministic CASE synthesizes five raw variants per
    (source, page) — replayed verbatim by the oracle — and the group stats
    certify the whole expression chain cross-engine."""
    from apollo_spark.ops.web import url_dup_groups

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_URL_SYNTH_SPARK.strip()).alias("url")
    )
    return (
        url_dup_groups(d, url_col="url", id_col="doc_id")
        .select("canonical_url", "n_docs", "n_raw_forms", "keep_id")
        .orderBy("canonical_url")
    )


ORACLE_URL_CANONICAL_DEDUP = r"""
WITH d AS (
  SELECT doc_id, source,
    CASE doc_id % 5
      WHEN 0 THEN concat('http://www.', source, '.example.com/page/', CAST(doc_id % 40 AS VARCHAR))
      WHEN 1 THEN concat('HTTP://WWW.', upper(source), '.EXAMPLE.COM/page/', CAST(doc_id % 40 AS VARCHAR), '/')
      WHEN 2 THEN concat('http://www.', source, '.example.com:80/page/', CAST(doc_id % 40 AS VARCHAR), '?utm_source=feed')
      WHEN 3 THEN concat('http://www.', source, '.example.com/page/', CAST(doc_id % 40 AS VARCHAR), '?b=2&a=1#frag')
      ELSE concat('http://www.', source, '.example.com/page/', CAST(doc_id % 40 AS VARCHAR), '?a=1&b=2&gclid=xyz')
    END AS url
  FROM documents
),
p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), '^[^@]*@', ''), '^([^:]+)', 1)) AS host,
         regexp_extract(regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), '^[^@]*@', ''), ':([0-9]+)$', 1) AS port,
         regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '') AS path,
         list_sort(list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
                   x -> len(x) > 0 AND NOT regexp_matches(x, '^(utm_[A-Za-z0-9_]*|fbclid|gclid)='))) AS kept
  FROM d
),
c AS (
  SELECT doc_id, url,
         concat(scheme, '://', host,
                CASE WHEN port = '' OR (scheme = 'http' AND port = '80') OR (scheme = 'https' AND port = '443')
                     THEN '' ELSE concat(':', port) END,
                path,
                CASE WHEN len(kept) = 0 THEN '' ELSE concat('?', array_to_string(kept, '&')) END) AS canonical_url
  FROM p WHERE scheme != '' AND host != ''
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
       MIN(doc_id) AS keep_id
FROM c
GROUP BY canonical_url HAVING COUNT(*) >= 2
ORDER BY canonical_url
"""


_HOST_SYNTH_SPARK = """
CASE pmod(doc_id, 4)
  WHEN 0 THEN concat('www.', source, '.com')
  WHEN 1 THEN concat('cdn.', source, '.com')
  WHEN 2 THEN 'ads.tracker.net'
  ELSE concat(source, '.org')
END
"""

_BLOCKLIST = ["src1.com", "tracker.net"]


def blocked_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist curation by domain SUFFIX (ops.web.domain_suffix_filter):
    blocking src1.com must drop www.src1.com and cdn.src1.com but NOT
    src1.org; blocking tracker.net drops ads.tracker.net. The host explodes
    into its dot-suffixes and ONE keyed equality join against the blocklist
    decides every host — no per-row regex scan, so the blocklist can hold a
    million domains at the cost of a hash join. Hosts synthesized
    deterministically (no host column in the corpus); per-source keep/total
    counts certify the suffix semantics cross-engine."""
    from apollo_spark.ops.web import domain_suffix_filter

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_HOST_SYNTH_SPARK.strip()).alias("host")
    )
    blocked = spark.createDataFrame([(b,) for b in _BLOCKLIST], "domain string")
    kept = domain_suffix_filter(d, blocked, host_col="host")
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept_counts = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        totals.join(kept_counts, "source", "left")
        .select(
            "source",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


ORACLE_BLOCKED_DOMAIN_FILTER = r"""
WITH d AS (
  SELECT doc_id, source,
    CASE doc_id % 4
      WHEN 0 THEN concat('www.', source, '.com')
      WHEN 1 THEN concat('cdn.', source, '.com')
      WHEN 2 THEN 'ads.tracker.net'
      ELSE concat(source, '.org')
    END AS host
  FROM documents
),
hosts AS (SELECT DISTINCT host FROM d),
sfx AS (
  SELECT host,
         unnest(list_transform(generate_series(1, len(string_split(host, '.'))),
           i -> array_to_string(list_slice(string_split(host, '.'), i, len(string_split(host, '.'))), '.'))) AS s
  FROM hosts
),
bad AS (SELECT DISTINCT host FROM sfx WHERE s IN ('src1.com', 'tracker.net'))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN host IN (SELECT host FROM bad) THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
FROM d GROUP BY source ORDER BY source
"""


def corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-look corpus health report a curation run starts from: per
    source — document count, whitespace-token volume, distinct languages,
    exact-duplicate rate (1 - distinct text hashes / docs), and mean
    document length. Pure aggregate expressions (one groupBy shuffle), every
    component an exact integer or a single final division, so the report
    hash-gates cross-engine."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"[ \t\n\f\r]+")).cast("long")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct(F.md5("text")).alias("n_unique_texts"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_langs",
            (F.lit(1.0) - F.col("n_unique_texts").cast("double") / F.col("n_docs").cast("double")).alias("exact_dup_rate"),
            (F.col("total_chars").cast("double") / F.col("n_docs").cast("double")).alias("mean_chars"),
        )
        .orderBy("source")
    )


ORACLE_CORPUS_QUALITY_REPORT = r"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '[ \t\n\f\r]+'))) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS exact_dup_rate,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars
FROM documents GROUP BY source ORDER BY source
"""


def doc_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-corruption repair (ops.text.fix_mojibake): the scraper
    classic — UTF-8 bytes mis-decoded as cp1252 turn 'café' into 'cafÃ©'
    and RIGHT SINGLE QUOTE into 'â€™'; the repair chain must restore the
    original so a mojibake'd re-crawl hashes identically to its clean twin
    (run BEFORE dedup). The corpus is ASCII-clean, so the query plants
    deterministic corruptions (doc_id-keyed CASE, replayed by the oracle
    via chr() literals — no encoding ambiguity in the SQL text) and
    certifies repaired-doc counts, chars saved, and distinct fixed hashes
    per source."""
    from apollo_spark.ops.text import _sloppy_cp1252, fix_mojibake

    m = {c: _sloppy_cp1252(c.encode("utf-8")) for c in "é’°“”"}
    d = _t(spark, sf_dir, "documents")
    corrupted = (
        F.when(F.pmod("doc_id", F.lit(4)) == 0, F.concat(F.lit("caf" + m["é"] + " "), F.col("text")))
        .when(
            F.pmod("doc_id", F.lit(4)) == 1,
            F.concat(F.lit("it" + m["’"] + "s "), F.col("text"), F.lit(" 20" + m["°"] + "C")),
        )
        .when(
            F.pmod("doc_id", F.lit(4)) == 2,
            F.concat(F.lit(m["“"]), F.col("text"), F.lit(m["”"])),
        )
        .otherwise(F.col("text"))
    )
    base = d.select("doc_id", "source", corrupted.alias("raw"))
    fixed = base.withColumn("fixed", fix_mojibake(F.col("raw")))
    return (
        fixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("fixed") != F.col("raw")).cast("long")).alias("n_repaired_docs"),
            F.sum(F.length("raw") - F.length("fixed")).alias("chars_saved"),
            F.countDistinct(F.md5("fixed")).alias("n_distinct_fixed"),
        )
        .orderBy("source")
    )


def _mojibake_oracle() -> str:
    from apollo_spark.ops.text import _sloppy_cp1252, mojibake_oracle_expr

    def lit(s: str) -> str:
        return " || ".join(f"chr({ord(ch)})" for ch in s)

    m = {c: _sloppy_cp1252(c.encode("utf-8")) for c in "é’°“”"}
    fix = mojibake_oracle_expr("raw")
    return f"""
WITH base AS (
  SELECT doc_id, source,
    CASE doc_id % 4
      WHEN 0 THEN concat('caf' || {lit(m["é"])} || ' ', text)
      WHEN 1 THEN concat('it' || {lit(m["’"])} || 's ', text, ' 20' || {lit(m["°"])} || 'C')
      WHEN 2 THEN concat({lit(m["“"])}, text, {lit(m["”"])})
      ELSE text
    END AS raw
  FROM documents
),
f AS (SELECT doc_id, source, raw, {fix} AS fixed FROM base)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN fixed != raw THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired_docs,
       CAST(SUM(length(raw) - length(fixed)) AS BIGINT) AS chars_saved,
       CAST(COUNT(DISTINCT md5(fixed)) AS BIGINT) AS n_distinct_fixed
FROM f GROUP BY source ORDER BY source
"""


ORACLE_DOC_MOJIBAKE_REPAIR = _mojibake_oracle()

_BANNED_PHRASES = ["slow", "batch batch", "table scan", "no such phrase here"]


def banned_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banned-phrase curation (ops.corpus.phrase_blocklist_hits): multi-word
    blocklist matching by word-boundary-aligned n-gram equality joins — one
    keyed join per distinct phrase LENGTH, so a million-phrase list costs a
    few hash joins, never a contains() scan per (doc, phrase). Per-source
    flagged counts + total hit volume certify the n-gram/join machinery
    cross-engine (the unmatched 4-word phrase proves absent lengths cost
    nothing and match nothing)."""
    from apollo_spark.ops.corpus import phrase_blocklist_hits

    d = _t(spark, sf_dir, "documents")
    phrases = spark.createDataFrame([(p,) for p in _BANNED_PHRASES], "phrase string")
    hits = phrase_blocklist_hits(d, phrases).groupBy("id").agg(
        F.sum("n_hits").alias("h")
    )
    return (
        d.join(hits, d["doc_id"] == hits["id"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("id").alias("n_flagged"),
            F.coalesce(F.sum("h"), F.lit(0)).cast("long").alias("total_hits"),
        )
        .orderBy("source")
    )


ORACLE_BANNED_PHRASE_FILTER = r"""
WITH w AS (
  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
),
g1 AS (SELECT doc_id, unnest(w) AS g FROM w),
g2 AS (
  SELECT doc_id, concat(w[i], ' ', w[i + 1]) AS g
  FROM w, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
hits AS (
  SELECT doc_id, g FROM g1 WHERE g IN ('slow')
  UNION ALL
  SELECT doc_id, g FROM g2 WHERE g IN ('batch batch', 'table scan')
),
per_doc AS (SELECT doc_id, COUNT(*) AS h FROM hits GROUP BY doc_id)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(p.doc_id) AS BIGINT) AS n_flagged,
       CAST(COALESCE(SUM(p.h), 0) AS BIGINT) AS total_hits
FROM documents d LEFT JOIN per_doc p USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-efficiency report per language: chars per whitespace word
    and FERTILITY (BPE-ish subword tokens per word — the metric that decides
    how much context window a language burns; multilingual-tokenizer papers
    report exactly this). Uses ops.text.bpe_ish_token_count's GPT-2-ish
    pre-tokenizer shape; exact integer sums, one double division at the
    end — hash-gates cross-engine."""
    from apollo_spark.ops.text import bpe_ish_token_count

    d = _t(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    return (
        d.select("lang", F.length("text").alias("ch"), ws.alias("ws"), bpe_ish_token_count(F.col("text")).cast("long").alias("bpe"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("n_words"),
            F.sum("bpe").alias("n_bpe_tokens"),
            (F.sum("ch").cast("double") / F.sum("ws").cast("double")).alias("chars_per_word"),
            (F.sum("bpe").cast("double") / F.sum("ws").cast("double")).alias("fertility"),
        )
        .orderBy("lang")
    )


ORACLE_TOKENIZER_FERTILITY = r"""
WITH t AS (
  SELECT lang, length(text) AS ch,
         len(string_split_regex(trim(text), '\s+')) AS ws,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS n_words,
       CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(ch) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS chars_per_word,
       CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility
FROM t GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# round 6, second wave: mining / coreset / privacy / blocking-evaluation tier
# ---------------------------------------------------------------------------


def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    LASER/CCMatrix bitext criterion): even vec_ids play the source
    collection, odd ids the target; candidates are blocked by the
    engine-exact lattice k-means with SemDeDup-style corpus-proportional k
    (ops.similarity.margin_mined_pairs), each pair scored by the RATIO
    margin against its top-4 neighborhood means, and only mutual best
    matches above margin 1.02 are mined. Cosines are sequential double
    folds and neighborhood means ride DECIMAL(18,6) sums, so the DuckDB
    oracle replays every score, rank, and margin bit-for-bit."""
    from apollo_spark.ops.similarity import margin_mined_pairs

    e = _t(spark, sf_dir, "embeddings")
    k = semdedup_k(e.count())
    m = margin_mined_pairs(e, k=k, k_neighbors=4, threshold=1.02, iters=2)
    res = m.select(
        "x_id",
        "y_id",
        F.round("score", 4).alias("score"),
        F.round("margin", 4).alias("margin"),
    ).orderBy("x_id", "y_id")
    return carry_caches(res, m)


def _bitext_margin_oracle(kn: int = 4, threshold: float = 1.02) -> str:
    """Mirror of bitext_margin_mining: shared lattice-k-means CTEs (same
    corpus-derived k), within-cluster even x odd candidate join, decimal
    neighborhood means, mutual-rank-1 + margin filter."""
    ctes = _lattice_common_ctes(SEMDEDUP_K_SQL, 2)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
av AS (SELECT a.vec_id, a.cluster, e.v FROM fassign a JOIN e USING (vec_id)),
cand AS (
  SELECT x.vec_id AS x_id, y.vec_id AS y_id,
         list_dot_product(x.v, y.v)
         / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS score
  FROM av x JOIN av y ON x.cluster = y.cluster
  WHERE x.vec_id % 2 = 0 AND y.vec_id % 2 = 1
),
r AS (
  SELECT x_id, y_id, score,
         CAST(ROUND(score, 6) AS DECIMAL(18,6)) AS score_q,
         ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY score DESC, y_id ASC) AS rnx,
         ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY score DESC, x_id ASC) AS rny
  FROM cand
),
nx AS (SELECT x_id, CAST(SUM(score_q) AS DOUBLE) / COUNT(*) AS avg_x FROM r WHERE rnx <= {kn} GROUP BY x_id),
ny AS (SELECT y_id, CAST(SUM(score_q) AS DOUBLE) / COUNT(*) AS avg_y FROM r WHERE rny <= {kn} GROUP BY y_id)
SELECT r.x_id, r.y_id, ROUND(r.score, 4) AS score,
       ROUND(r.score / ((nx.avg_x + ny.avg_y) / 2.0), 4) AS margin
FROM r JOIN nx USING (x_id) JOIN ny USING (y_id)
WHERE rnx = 1 AND rny = 1
  AND (nx.avg_x + ny.avg_y) > 0
  AND r.score / ((nx.avg_x + ny.avg_y) / 2.0) >= {threshold}
ORDER BY x_id, y_id"""
    )


ORACLE_BITEXT_MARGIN = _bitext_margin_oracle()


def coreset_kcenter_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy farthest-point (k-center) coreset over the embeddings
    (ops.clustering.kcenter_select): seed at the smallest vec_id, then 7
    rounds of pick-the-point-farthest-from-the-selected-set — the classic
    2-approximation diverse-subset primitive behind coreset-based data
    pruning. Exactly k bounded driver rounds, each one distributed scan
    against a broadcast center set; the unrolled-iteration oracle replays
    every squared distance (pure dot-product arithmetic) and argmax
    tie-break."""
    from apollo_spark.ops.clustering import kcenter_select

    e = _t(spark, sf_dir, "embeddings")
    sel = kcenter_select(e, k=8)
    out = spark.createDataFrame(sel, "sel_order INT, vec_id BIGINT, r2 DOUBLE")
    return out.select("sel_order", "vec_id", F.round("r2", 4).alias("r2")).orderBy("sel_order")


def _kcenter_oracle(k: int = 8) -> str:
    """Mirror of coreset_kcenter_sample: unrolled greedy rounds; round i
    scans all not-yet-selected vectors against the i selected centers."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "s0 AS (SELECT 0 AS sel_order, vec_id, 0.0 AS r2 FROM e WHERE vec_id = (SELECT MIN(vec_id) FROM e))",
    ]
    prev = "s0"
    for i in range(1, k):
        ctes.append(
            f"""p{i} AS (
  SELECT {i} AS sel_order, vec_id, mind AS r2 FROM (
    SELECT y.vec_id,
           MIN(list_dot_product(y.v, y.v) - 2.0 * list_dot_product(y.v, c.v) + list_dot_product(c.v, c.v)) AS mind
    FROM e y CROSS JOIN (SELECT e2.v FROM {prev} s JOIN e e2 ON e2.vec_id = s.vec_id) c
    WHERE y.vec_id NOT IN (SELECT vec_id FROM {prev})
    GROUP BY y.vec_id)
  ORDER BY mind DESC, vec_id ASC LIMIT 1
)"""
        )
        ctes.append(f"s{i} AS (SELECT * FROM s{i - 1} UNION ALL SELECT * FROM p{i})")
        prev = f"s{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT sel_order, vec_id, ROUND(r2, 4) AS r2 FROM {prev} ORDER BY sel_order"
    )


ORACLE_KCENTER = _kcenter_oracle(k=8)


def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymous aggregate release (ops.privacy.k_anonymize, k=25) over
    the quasi-identifiers (mktsegment, acctbal-thousand bucket): classes
    with fewer than 25 customers collapse into one '*' catch-all row so no
    released group is re-identifiable, while the release still accounts for
    every customer. Balance sums ride DECIMAL, so the per-class average is
    engine-exact."""
    from apollo_spark.ops.privacy import k_anonymize

    c = _t(spark, sf_dir, "customer")
    out = k_anonymize(
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_bucket"),
            F.col("c_acctbal"),
        ),
        qi_cols=["segment", "bal_bucket"],
        k=25,
        value_col="c_acctbal",
        value_scale=2,
    )
    res = out.select(
        "segment",
        "bal_bucket",
        "n_classes",
        "n_rows",
        # deliberately UNROUNDED: the operands (exact decimal sum, integer
        # count) are bit-identical across engines, so the double quotient
        # is too — while ROUND would tie at the cut digit for divisors
        # like 32 (sum/3200 has exact 5-terminated expansions) and the two
        # engines break string-vs-binary ties differently.
        F.col("avg_value").alias("avg_bal"),
    ).orderBy("segment", "bal_bucket")
    # select/orderBy derived a new frame — move the persist scope onto the
    # one bench.py's release_caches actually sees
    return carry_caches(res, out)


ORACLE_K_ANONYMITY = """
WITH g AS (
  SELECT c_mktsegment AS segment,
         CAST(CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS VARCHAR) AS bal_bucket,
         COUNT(*) AS n_rows,
         SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(18,2))) AS s
  FROM customer GROUP BY 1, 2
),
kept AS (
  SELECT segment, bal_bucket, CAST(1 AS BIGINT) AS n_classes, n_rows,
         CAST(s AS DECIMAL(38,6)) AS s
  FROM g WHERE n_rows >= 25
),
supp AS (
  SELECT '*' AS segment, '*' AS bal_bucket, CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(n_rows) AS BIGINT) AS n_rows, CAST(SUM(s) AS DECIMAL(38,6)) AS s
  FROM g WHERE n_rows < 25 HAVING COUNT(*) > 0 AND SUM(n_rows) >= 25
)
SELECT segment, bal_bucket, n_classes, n_rows,
       CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE) AS avg_bal
FROM (SELECT * FROM kept UNION ALL SELECT * FROM supp)
ORDER BY segment, bal_bucket
"""


def lsh_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation of the MinHash-LSH candidate generator
    (ops.dedup.lsh_blocking_metrics): pair completeness against the
    df-capped exact bigram-Jaccard ground truth (the benchmarked
    ngram_jaccard_capped_pairs config) and reduction ratio against the
    quadratic all-pairs space — the two record-linkage numbers that say
    whether a blocker is safe to trust at scale. The blocker hashes TRIGRAM
    shingles while truth is defined on bigram Jaccard >= 0.2 — independent
    systems by design (non-circular evaluation) and each individually
    benchmarked linear; the docstring of lsh_blocking_metrics records the
    two rejected shared-n configurations (bigram banding: candidates ~4% of
    ALL pairs, quadratic; trigram truth: df cap dodged, index fan-out,
    39.7 s vs ~8 s at sf0.1). PC < 1 on the driver corpus — the blocker
    genuinely misses low-J true pairs, the honest S-curve number.

    ``max_bucket=64``: the sf10 rehearsal caught the r=2 banding going
    QUADRATIC under structural boilerplate shingles (one hot trigram's
    bucket grows with the corpus: candidates 1.46M/13.1M/145M at
    sf1/sf3/sf10, 11.4 GB spill, 337 s) — the exact mega-bucket pathology
    web boilerplate produces at 100 TB. The evaluated configuration is
    therefore the CAPPED blocker, the one a production pipeline would run;
    the PC this query reports prices the cap's recall cost honestly
    (mega-bucket pairs collide on one shared boilerplate shingle, not
    broad similarity)."""
    from apollo_spark.ops.dedup import lsh_blocking_metrics

    d = _t(spark, sf_dir, "documents")
    m = lsh_blocking_metrics(
        d, block_n=3, truth_n=2, num_hashes=32, bands=16,
        truth_threshold=0.2, max_df_frac=0.04, max_bucket=64,
    )
    res = m.select(
        "n_docs",
        "n_true",
        "n_cand",
        "n_caught",
        # unrounded: pure integer-ratio doubles are bit-identical across
        # engines, while ROUND can tie at the cut digit (see
        # customer_k_anonymity).
        "pair_completeness",
        "reduction_ratio",
    )
    return carry_caches(res, m)


def _blocking_quality_oracle(
    block_n: int = 3,
    truth_n: int = 2,
    num_hashes: int = 32,
    bands: int = 16,
    truth_threshold: float = 0.2,
    max_df_frac: float = 0.04,
    max_bucket: int | None = None,
) -> str:
    """Mirror of lsh_blocking_quality: the portable-MinHash banding CTEs
    (m-prefixed, same family as ORACLE_MINHASH_PORTABLE) + the df-capped
    exact-Jaccard truth CTEs (t-prefixed, same pipeline as
    ORACLE_NGRAM_JACCARD_CAPPED) + four scalar counts."""
    from apollo_spark.ops.dedup import _mh_consts

    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(((h >> 30) * {a} + (h & 1073741823) * {b} + {c}) % 2305843009213693951) AS m{i}"
        for i, (a, b, c) in ((i, _mh_consts(i)) for i in range(num_hashes))
    )
    band_rows = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, ('0x' || substr(md5(concat_ws('|', {b}, {cols})), 1, 15))::BIGINT AS bkey FROM msig".format(
            b=b, cols=", ".join(f"m{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    return rf"""
WITH mt AS (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
msh AS (
  SELECT doc_id,
         CASE WHEN len(w) < {block_n} THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(w) - {block_n - 1}),
                                                i -> {" || ' ' || ".join(f"w[i+{j}]" for j in range(block_n))})) END AS sh
  FROM mt
),
mex AS (SELECT doc_id, unnest(sh) AS s FROM msh),
mh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM mex),
msig AS (
  SELECT doc_id,
         {mins}
  FROM mh GROUP BY doc_id
),
mbands0 AS (
  {band_rows}
),
mbcnt AS (SELECT bkey, COUNT(*) AS c FROM mbands0 GROUP BY bkey),
mbands AS (
  SELECT mb.doc_id, mb.bkey FROM mbands0 mb JOIN mbcnt USING (bkey)
  WHERE {f"c <= {int(max_bucket)}" if max_bucket is not None else "TRUE"}
),
mcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mbands a JOIN mbands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
),
td0 AS (
  SELECT doc_id,
         CASE WHEN len(t) < {truth_n} THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(t) - {truth_n - 1}),
                                                i -> {" || ' ' || ".join(f"t[i+{j}]" for j in range(truth_n))})) END AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
  WHERE len(t) >= 1
),
td AS (SELECT * FROM td0 WHERE len(sh) > 0),
tkcap AS (SELECT CAST(floor({max_df_frac} * COUNT(*)) AS BIGINT) AS cap FROM td),
tex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM td),
tdfreq AS (SELECT s, COUNT(*) AS c FROM tex GROUP BY s),
tkept AS (SELECT tex.doc_id, tex.n, tex.s FROM tex JOIN tdfreq USING (s), tkcap WHERE c <= tkcap.cap),
tcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM tkept a JOIN tkept b
    ON a.s = b.s AND a.doc_id < b.doc_id
   AND a.n >= {truth_threshold} * b.n - 1e-9 AND b.n >= {truth_threshold} * a.n - 1e-9
),
tscored AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) AS jaccard
  FROM tcand JOIN td da ON da.doc_id = tcand.id_a JOIN td db ON db.doc_id = tcand.id_b
),
tallhot AS (
  SELECT doc_id, list_sort(sh) AS seth FROM td
  WHERE doc_id NOT IN (SELECT doc_id FROM tkept)
),
tstar AS (
  SELECT MIN(doc_id) OVER (PARTITION BY seth) AS id_a, doc_id AS id_b
  FROM tallhot QUALIFY doc_id != id_a
),
truth AS (
  SELECT id_a, id_b FROM tscored WHERE jaccard >= {truth_threshold}
  UNION ALL SELECT id_a, id_b FROM tstar
),
nd AS (SELECT COUNT(*) AS n_docs FROM msh WHERE len(sh) > 0),
nt AS (SELECT COUNT(*) AS n_true FROM truth),
nc AS (SELECT COUNT(*) AS n_cand FROM mcand),
ng AS (SELECT COUNT(*) AS n_caught FROM truth t JOIN mcand c ON t.id_a = c.id_a AND t.id_b = c.id_b)
SELECT n_docs, n_true, n_cand, n_caught,
       CASE WHEN n_true > 0 THEN CAST(n_caught AS DOUBLE) / CAST(n_true AS DOUBLE) END AS pair_completeness,
       CASE WHEN n_docs > 1 THEN 1.0 - CAST(n_cand AS DOUBLE) / (CAST(n_docs * (n_docs - 1) AS DOUBLE) / 2.0) END AS reduction_ratio
FROM nd, nt, nc, ng
"""


ORACLE_BLOCKING_QUALITY = _blocking_quality_oracle(
    block_n=3, truth_n=2, truth_threshold=0.2, max_bucket=64
)


def dup_aware_sample_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware sampling weights (the soft alternative to hard
    dedup, e.g. SlimPajama-style cluster reweighting): every document gets
    weight 1/|its near-dup component|, so a sampler drawing by weight sees
    each CONTENT once in expectation instead of once per copy — no document
    is discarded, survivorship stays debuggable. Components ride the same
    capped edge generation near_dup_components certifies (frac_floor=1024:
    capped == lossless at every gate SF); docs in no component are their own
    singleton (weight 1.0). Weight is a division of exact integers —
    engine-identical unrounded."""
    d = _t(spark, sf_dir, "documents")
    comp = _doc_components(spark, sf_dir)
    full = d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    sz = full.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return (
        full.join(sz, "component")
        .select(
            "doc_id",
            "component",
            "csize",
            (F.lit(1.0) / F.col("csize").cast("double")).alias("weight"),
        )
        .orderBy("doc_id")
    )


ORACLE_DUP_WEIGHTS = r"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
  WHERE len(t) >= 1
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id),
fullc AS (
  SELECT a.doc_id, COALESCE(c.component, a.doc_id) AS component
  FROM (SELECT doc_id FROM documents) a LEFT JOIN comp c USING (doc_id)
),
sz AS (SELECT component, COUNT(*) AS csize FROM fullc GROUP BY component)
SELECT f.doc_id, f.component, s.csize,
       CAST(1.0 AS DOUBLE) / CAST(s.csize AS DOUBLE) AS weight
FROM fullc f JOIN sz s USING (component)
ORDER BY doc_id
"""


def join_skew_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-skew profile (ops.relational.join_skew_profile) of
    the documents-by-language self-join — the 'accidental mega-key' shape:
    5 languages over the whole corpus, with 'en' holding ~44% of docs, so
    its key alone carries ~66% of the estimated join output (est_pairs
    218^2 vs 64^2 for the tail language at sf0.01 — an 11x per-task
    imbalance). The profile is two key-count aggregates joined (never the
    data-sized join itself); its est_pairs/share output is the number that
    says 'salt this or broadcast that' BEFORE the shuffle is paid."""
    from apollo_spark.ops.relational import join_skew_profile

    d = _t(spark, sf_dir, "documents")
    return join_skew_profile(d, d, "lang", top_n=10)


def entity_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: SymSpell fuzzy candidate pairs
    (ops.linkage.fuzzy_dup_pairs, Levenshtein <= 1, same planted-twin input
    as fuzzy_entity_dup_pairs) -> connected components (min-label
    propagation) -> one GOLDEN record per multi-member entity with a
    deterministic survivorship rule: keep the longest string (the planted
    twins are one char shorter than their originals, so longest = most
    complete), ties toward the smaller id. This is the linkage tier's
    missing last step — match, cluster, merge — and every stage is the
    already-certified building block, so the composition hash-gates."""
    from apollo_spark.ops.dedup import connected_components

    base, p = _entity_pairs(spark, sf_dir)
    pairs = p.select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("id").cast("long").alias("id"), F.col("comp").cast("long").alias("comp")
    )
    m = comp.join(base, "id")
    g = (
        m.groupBy("comp")
        .agg(
            F.min("id").alias("entity_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("s").alias("n_variants"),
            F.min(
                F.struct(
                    (-F.length("s")).alias("nl"), F.col("id").alias("i"), F.col("s").alias("sv")
                )
            ).alias("g"),
        )
        .filter(F.col("n_members") >= 2)
    )
    return g.select(
        "entity_id", "n_members", "n_variants", F.col("g.sv").alias("golden")
    ).orderBy("entity_id")


ORACLE_GOLDEN_RECORDS = r"""
WITH RECURSIVE c AS (SELECT c_custkey AS id, md5(CAST(c_custkey AS VARCHAR)) AS s FROM customer),
planted AS (
  SELECT id + 10000000 AS id,
         concat(substr(s, 1, id % length(s)),
                substr(s, id % length(s) + 2, length(s) - id % length(s) - 1)) AS s
  FROM c WHERE id % 3 = 0
),
base AS (SELECT * FROM c UNION ALL SELECT * FROM planted),
v AS (
  SELECT id, s,
         unnest(list_distinct(list_prepend(s,
           list_transform(generate_series(1, length(s)),
             i -> concat(substr(s, 1, i-1), substr(s, i+1, length(s)-i)))))) AS v
  FROM base
),
cand AS (
  SELECT DISTINCT a.id AS id_a, a.s AS s_a, b.id AS id_b, b.s AS s_b
  FROM v a JOIN v b USING (v) WHERE a.id < b.id
),
pairs AS (SELECT id_a, id_b FROM cand WHERE levenshtein(s_a, s_b) <= 1),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
m AS (SELECT comp.comp, base.id, base.s FROM comp JOIN base USING (id)),
r AS (
  SELECT comp, id, s,
         ROW_NUMBER() OVER (PARTITION BY comp ORDER BY length(s) DESC, id ASC) AS rn
  FROM m
),
g AS (
  SELECT comp, MIN(id) AS entity_id, COUNT(*) AS n_members, COUNT(DISTINCT s) AS n_variants
  FROM m GROUP BY comp HAVING COUNT(*) >= 2
)
SELECT g.entity_id, g.n_members, g.n_variants, r.s AS golden
FROM g JOIN r ON r.comp = g.comp AND r.rn = 1
ORDER BY entity_id
"""


def ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the lattice-IVF 2-probe search against the exact
    brute-force top-5, computed fully IN-ENGINE as a first-class gated
    metric (the pytest recall pin made this a unit property; this makes it
    a reportable number a pipeline can alert on). Composes the two already
    certified queries — knn_ivf_lattice_approx (approximate side) and
    knn_bruteforce's ranking (exact side) — so the whole comparison,
    including the recall ratio, replays bit-for-bit in the oracle."""
    approx = knn_ivf_lattice_approx(spark, sf_dir).select("q_id", "vec_id")
    exact = knn_bruteforce(spark, sf_dir).select("q_id", "vec_id")
    hits = (
        exact.join(approx, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        exact.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).cast("double") / F.lit(5.0)).alias(
                "recall_at_5"
            ),
        )
        .orderBy("q_id")
    )


def _ivf_recall_oracle(k: int = 8, iters: int = 2, probe: int = 2, topk: int = 5) -> str:
    """Mirror of ivf_recall_report: the lattice-IVF CTEs (same as
    ORACLE_IVF_LATTICE) + the brute-force ranking (same as ORACLE_KNN) +
    the per-query intersection count."""
    ctes = _lattice_common_ctes(k, iters)
    ctes.append(
        f"""probed AS (
  SELECT vec_id AS q_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM fdist WHERE vec_id < 3) WHERE rn <= {probe}
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
ascored AS (
  SELECT p.q_id, a.vec_id,
         list_dot_product(e.v, q.v) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS score
  FROM fassign a JOIN probed p USING (cluster)
  JOIN e ON e.vec_id = a.vec_id
  JOIN e q ON q.vec_id = p.q_id
),
approx AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM ascored) WHERE rank <= {topk}
),
qv AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
bscored AS (
  SELECT qv.q_id, e.vec_id,
         list_dot_product(e.v, qv.qv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qv.qv, qv.qv))) AS score
  FROM e CROSS JOIN qv
),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM bscored) WHERE rank <= {topk}
),
hits AS (
  SELECT exact.q_id, COUNT(*) AS n_hits
  FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id
)
SELECT x.q_id, COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
FROM (SELECT DISTINCT q_id FROM exact) x LEFT JOIN hits h USING (q_id)
ORDER BY q_id"""
    )


ORACLE_IVF_RECALL = _ivf_recall_oracle()


CUSTOMERS_DSL_KANON = """
query customers_kanon {
  chain = "ethereum"
  source_table = "customer"
  transform {
    segment = c_mktsegment
    bal_bucket = floor(c_acctbal / 1000.0)
  }
  privacy {
    qi = ["segment", "bal_bucket"]
    k = 25
    value = "c_acctbal"
  }
  save {
    segment = segment
    bal_bucket = bal_bucket
    n_classes = n_classes
    n_rows = n_rows
    avg_bal = avg_value
  }
  sort = [segment, bal_bucket]
}
"""


def customers_dsl_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-anonymity release as ONE declarative HCL query: transform
    derives the quasi-identifiers (the new `floor` v2 function buckets the
    balance), the `privacy` block is the terminal release aggregation, save
    renames against the released shape. Output is identical to the
    customer_k_anonymity op-level query, so the SAME oracle certifies the
    whole DSL path — parse, transform compile, privacy stage, post-release
    save — end to end."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    schema = parse_schema(CUSTOMERS_DSL_KANON)
    return compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema)


def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    event stream's date range (split at 2024-01-16, the corpus midpoint) per
    event_type — THE production drift-monitor number: PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate. Shape: one groupBy on
    (event_type) with map-side-combinable conditional sums; scalar totals
    ride a broadcast crossJoin; the 5-bin term sum is a frame-sized window.
    Each PSI term is DECIMAL(38,6)-quantized before summing (the
    source_kl_divergence posture: ln is fixed-order IEEE, the quantization
    absorbs any final-ulp libm difference and makes the sum
    order-independent); bins empty on either side contribute NULL (excluded
    from the total) rather than a fake epsilon."""
    e = _events(spark, sf_dir)
    cut = 1_705_363_200 * 1_000_000_000  # 2024-01-16 00:00:00 UTC in nanos
    b = e.select(
        "event_type", F.when(F.col("ts") < F.lit(cut), 1).otherwise(0).alias("is_ref")
    )
    g = b.groupBy("event_type").agg(
        F.sum("is_ref").alias("n_ref"),
        (F.count(F.lit(1)) - F.sum("is_ref")).alias("n_cur"),
    )
    t = g.agg(F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref").cast("double")
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur").cast("double")
    x = g.crossJoin(F.broadcast(t)).select(
        "event_type", "n_ref", "n_cur", p_ref.alias("p_ref"), p_cur.alias("p_cur")
    )
    term = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        ((F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref"))).cast(
            "decimal(38,6)"
        ),
    )
    w = Window.partitionBy(F.lit(1))
    return (
        x.withColumn("__term", term)
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            "p_ref",
            "p_cur",
            F.col("__term").cast("double").alias("psi_term"),
            F.sum("__term").over(w).cast("double").alias("total_psi"),
        )
        .orderBy("event_type")
    )


ORACLE_PSI_DRIFT = """
WITH b AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS is_ref
  FROM events
),
g AS (
  SELECT event_type,
         CAST(SUM(is_ref) AS BIGINT) AS n_ref,
         CAST(COUNT(*) - SUM(is_ref) AS BIGINT) AS n_cur
  FROM b GROUP BY event_type
),
t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM g),
x AS (
  SELECT event_type, n_ref, n_cur,
         CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE) AS p_ref,
         CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE) AS p_cur
  FROM g, t
),
y AS (
  SELECT event_type, n_ref, n_cur, p_ref, p_cur,
         CASE WHEN n_ref > 0 AND n_cur > 0
              THEN CAST((p_cur - p_ref) * ln(p_cur / p_ref) AS DECIMAL(38,6)) END AS term
  FROM x
)
SELECT event_type, n_ref, n_cur, p_ref, p_cur,
       CAST(term AS DOUBLE) AS psi_term,
       CAST(SUM(term) OVER () AS DOUBLE) AS total_psi
FROM y ORDER BY event_type
"""


def dedup_cost_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight cost profile of the bigram inverted-index dedup join: per
    shingle the candidate join emits C(df, 2) pairs, so the TOTAL lossless
    fan-out is sum(df*(df-1)/2) — the exact quantity behind the measured
    380-422x sf1 whales — and the capped fan-out re-sums over shingles with
    df <= floor(max_df_frac * n_docs). One exploded groupBy (map-side
    combinable) + one 1-row aggregate: the profile costs one shuffle over
    the shingle vocabulary and PREDICTS, before any pair is generated,
    whether the lossless form is affordable (the lossless-vs-capped
    decision the DSL dedup block's `lossless` flag controls). All counts
    are exact integers; the reduction ratio is a division of identical
    operands."""
    from apollo_spark.ops.dedup import shingles

    d = _t(spark, sf_dir, "documents")
    ex = (
        d.select("doc_id", F.explode(shingles(F.col("text"), 2)).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = F.col("df") * (F.col("df") - F.lit(1)) / F.lit(2)
    x = ex.crossJoin(F.broadcast(nd)).select(
        "df",
        "n_docs",
        pairs.cast("long").alias("pairs"),
        (F.col("df") <= F.floor(F.lit(0.04) * F.col("n_docs"))).alias("under_cap"),
    )
    return x.groupBy("n_docs").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(~F.col("under_cap"), 1).otherwise(0)).cast("long").alias("n_hot"),
        F.sum("pairs").alias("est_pairs_lossless"),
        F.sum(F.when(F.col("under_cap"), F.col("pairs")).otherwise(F.lit(0))).alias(
            "est_pairs_capped"
        ),
    ).select(
        "n_docs",
        "n_shingles",
        "n_hot",
        "est_pairs_lossless",
        "est_pairs_capped",
        (
            F.lit(1.0)
            - F.col("est_pairs_capped").cast("double")
            / F.col("est_pairs_lossless").cast("double")
        ).alias("fanout_reduction"),
    )


ORACLE_DEDUP_COST = r"""
WITH d0 AS (
  SELECT doc_id,
         CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) END AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
),
dfreq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM (SELECT doc_id, unnest(sh) AS s FROM d0) GROUP BY s),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
x AS (
  SELECT df, n_docs,
         CAST(df * (df - 1) / 2 AS BIGINT) AS pairs,
         df <= CAST(floor(0.04 * n_docs) AS BIGINT) AS under_cap
  FROM dfreq, nd
)
SELECT n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN under_cap THEN 0 ELSE 1 END) AS BIGINT) AS n_hot,
       CAST(SUM(pairs) AS BIGINT) AS est_pairs_lossless,
       CAST(SUM(CASE WHEN under_cap THEN pairs ELSE 0 END) AS BIGINT) AS est_pairs_capped,
       1.0 - CAST(SUM(CASE WHEN under_cap THEN pairs ELSE 0 END) AS DOUBLE)
           / CAST(SUM(pairs) AS DOUBLE) AS fanout_reduction
FROM x GROUP BY n_docs
"""


def lsh_scurve_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic S-curve of the repo's MinHash banding geometry (b=16,
    r=2): P(candidate | jaccard=j) = 1 - (1 - j^2)^16, tabulated on a
    0.05-step grid — the PREDICTED capture probability whose measured
    counterpart is lsh_blocking_quality's pair completeness. The 16th power
    is an explicit squaring chain (x2=x*x, x4=x2*x2, x8=x4*x4, x16=x8*x8):
    every step is one IEEE multiplication, identical on both engines, so
    the whole table is engine-exact with no pow() libm dependence. (sf_dir
    is unused — the curve is a property of the geometry, not the data; it
    stays a registry query so the driver certifies the arithmetic.)"""
    j = (F.col("i").cast("double") * F.lit(0.05)).alias("j")
    base = spark.range(1, 20).select(F.col("id").alias("i")).select("i", j)
    x = F.lit(1.0) - F.col("j") * F.col("j")
    x2 = (x * x).alias("__x2")
    t = base.select("i", "j", x2)
    x4 = (F.col("__x2") * F.col("__x2")).alias("__x4")
    t = t.select("i", "j", x4)
    x8 = (F.col("__x4") * F.col("__x4")).alias("__x8")
    t = t.select("i", "j", x8)
    return t.select(
        F.col("i").cast("int").alias("i"),
        "j",
        (F.col("j") * F.col("j")).alias("p_band"),
        (F.lit(1.0) - F.col("__x8") * F.col("__x8")).alias("p_candidate"),
    ).orderBy("i")


ORACLE_LSH_SCURVE = """
WITH g AS (SELECT CAST(i AS INT) AS i, CAST(i AS DOUBLE) * 0.05 AS j FROM generate_series(1, 19) t(i)),
s AS (SELECT i, j, (1.0 - j * j) * (1.0 - j * j) AS x2 FROM g),
s4 AS (SELECT i, j, x2 * x2 AS x4 FROM s),
s8 AS (SELECT i, j, x4 * x4 AS x8 FROM s4)
SELECT i, j, j * j AS p_band, 1.0 - x8 * x8 AS p_candidate
FROM s8 ORDER BY i
"""


ORACLE_JOIN_SKEW = """
WITH c AS (SELECT lang AS key, COUNT(*) AS cnt FROM documents GROUP BY lang),
j AS (SELECT key, cnt AS cnt_a, cnt AS cnt_b,
             CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE) AS est_pairs FROM c),
t AS (SELECT SUM(est_pairs) AS tot FROM j)
SELECT key, cnt_a, cnt_b, est_pairs,
       CAST(est_pairs AS DOUBLE) / CAST(tot AS DOUBLE) AS share
FROM j, t ORDER BY est_pairs DESC, key ASC LIMIT 10
"""


def events_raw_selector_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'unverified events' recon surface (reference ROADMAP.md:78,
    unshipped there; SURVEY §1.1's reserved raw table): a logs-shaped frame
    synthesized DETERMINISTICALLY from the events table (topic0 keyed by
    event_type, indexed-arg arity from event_id parity, payload size
    4..32 bytes from event_id) pushed through the REAL decode-less
    operators — sources.logs.raw_log_source (projection + reserved MapType
    raw column) then selector_profile (per-signature-shape frequency /
    contract-cardinality / block-span / payload stats). The profile is the
    table a user consults to decide which ABI-less signatures carry the
    volume to justify sourcing an ABI; real-EVM-logs coverage of the same
    operators lives in tests/test_raw_logs.py."""
    from apollo_spark.sources.logs import raw_log_source, selector_profile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events.ts
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id", "props")
    eid = F.col("event_id").cast("string")
    t0 = F.md5(F.concat(F.lit("t0"), F.col("event_type")))
    t1 = F.md5(F.concat(F.lit("u"), F.col("user_id").cast("string")))
    t2 = F.md5(F.concat(F.lit("x"), eid))
    hexlen = (F.lit(2) * (F.lit(4) + F.pmod("event_id", F.lit(29)))).cast("int")
    data = F.unhex(
        F.substring(
            F.concat(F.md5(F.concat(F.lit("d"), F.col("props"))), F.md5(F.concat(F.lit("e"), eid))),
            F.lit(1),
            hexlen,
        )
    )
    synth = e.select(
        F.lit("ethereum").alias("chain"),
        F.md5(F.concat(F.lit("a"), F.pmod("user_id", F.lit(50)).cast("string"))).alias("address"),
        F.pmod("event_id", F.lit(10000)).alias("block_number"),
        F.md5(F.concat(F.lit("bh"), eid)).alias("block_hash"),
        F.md5(F.concat(F.lit("tx"), eid)).alias("tx_hash"),
        F.pmod("event_id", F.lit(300)).cast("int").alias("tx_index"),
        F.pmod("event_id", F.lit(10)).cast("int").alias("log_index"),
        F.slice(
            F.array(t0, t1, t2), F.lit(1), (F.lit(2) + F.pmod("event_id", F.lit(2))).cast("int")
        ).alias("topics"),
        data.alias("data"),
    )
    return selector_profile(raw_log_source(synth))


ORACLE_RAW_SELECTOR_PROFILE = """
WITH synth AS (
  SELECT md5('t0' || event_type) AS topic0,
         CAST(2 + event_id % 2 AS INT) AS n_topics,
         md5('a' || CAST(user_id % 50 AS VARCHAR)) AS address,
         event_id % 10000 AS block_number,
         CAST(octet_length(unhex(substr(
           md5('d' || props) || md5('e' || CAST(event_id AS VARCHAR)),
           1, CAST(2 * (4 + event_id % 29) AS INT)))) AS BIGINT) AS data_bytes
  FROM events
)
SELECT topic0, n_topics, CAST(COUNT(*) AS BIGINT) AS n_logs,
       CAST(COUNT(DISTINCT address) AS BIGINT) AS n_contracts,
       MIN(block_number) AS first_block, MAX(block_number) AS last_block,
       CAST(SUM(data_bytes) AS BIGINT) AS total_data_bytes,
       MAX(data_bytes) AS max_data_bytes
FROM synth GROUP BY 1, 2
ORDER BY n_logs DESC, topic0 ASC, n_topics ASC
"""


LINEITEM_MONITOR_DSL = """
loop {
  items = [1, 2, 3]
  query xchain_monitor {
    chain = "ethereum"
    source_table = "lineitem"
    filter = [
      l_linenumber == item,
      l_suppkey == 10 || l_partkey == 10
    ]
    save {
      net = item
      block = l_orderkey
      sender = l_suppkey
      receiver = l_partkey
      amount = l_quantity
    }
  }
}
"""


def lineitem_dsl_crosschain_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated twin of dsl.templates.cross_chain_monitor_hcl's
    semantics (reference ROADMAP.md:79 'Cross-chain address monitoring'):
    loop-over-networks UNION under one query name + watched-party
    either-side `||` filter + per-network context save — the exact
    composition the template writes over global event scans (certified
    end-to-end on a real 2-chain EVM log fixture in
    tests/test_raw_logs.py::test_cross_chain_monitor_template_e2e). Here
    the same loop/compile machinery runs over lineitem (networks =
    l_linenumber 1..3, watched party 10 as supplier OR part) so the DuckDB
    oracle replays the published union bit-for-bit."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_schema
    from apollo_spark.sources.tables import Catalog

    schema = parse_schema(LINEITEM_MONITOR_DSL)
    out = compile_schema(spark, Catalog(spark, sf_dir), schema)
    return out["xchain_monitor"].orderBy("net", "block", "sender", "receiver")


ORACLE_XCHAIN_MONITOR = """
SELECT l_linenumber AS net, l_orderkey AS block, l_suppkey AS sender,
       l_partkey AS receiver, l_quantity AS amount
FROM lineitem
WHERE l_linenumber IN (1, 2, 3) AND (l_suppkey = 10 OR l_partkey = 10)
ORDER BY net, block, sender, receiver
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- oracle-backed, ungated in round 1: gate these first ---------------
    "ngram_jaccard_dup_pairs": ngram_jaccard_dup_pairs,
    "ngram_jaccard_capped_pairs": ngram_jaccard_capped_pairs,
    "embedding_near_dup_exact": embedding_near_dup_exact,
    "orders_by_year_rangejoin": orders_by_year_rangejoin,
    "near_dup_components": near_dup_components,
    "dedup_keep_best": dedup_keep_best,
    "doc_char_entropy": doc_char_entropy,
    "tfidf_dup_pairs": tfidf_dup_pairs,
    "tfidf_capped_pairs": tfidf_capped_pairs,
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "corpus_duplicate_mass": corpus_duplicate_mass,
    "doc_rag_chunks": doc_rag_chunks,
    "source_frequency_cap": source_frequency_cap,
    "matryoshka_recall": matryoshka_recall,
    "user_session_windows": user_session_windows,
    "events_hourly_gapfill": events_hourly_gapfill,
    "customer_rfm_segments": customer_rfm_segments,
    "source_token_diversity": source_token_diversity,
    "events_value_ecdf": events_value_ecdf,
    "ts_znorm_pattern_search": ts_znorm_pattern_search,
    "benchmark_containment": benchmark_containment,
    "aqp_orders_avg": aqp_orders_avg,
    "source_dup_rates": source_dup_rates,
    "events_weekly_seasonality": events_weekly_seasonality,
    "customer_pareto_share": customer_pareto_share,
    "item_cf_recommendations": item_cf_recommendations,
    "item_reachability": item_reachability,
    "ab_test_conversion": ab_test_conversion,
    "doc_keywords": doc_keywords,
    "events_profile": events_profile,
    "item_decayed_popularity": item_decayed_popularity,
    "event_path_trigrams": event_path_trigrams,
    "discount_quantity_correlation": discount_quantity_correlation,
    "doc_length_histogram": doc_length_histogram,
    "nation_yoy_growth": nation_yoy_growth,
    "knn_ivf_full_probe": knn_ivf_full_probe,
    "knn_ivf_lattice_approx": knn_ivf_lattice_approx,
    "semantic_dedup_lattice": semantic_dedup_lattice,
    "user_sessions": user_sessions,
    # -- round 6: linkage + web-curation tier -------------------------------
    "fuzzy_entity_dup_pairs": fuzzy_entity_dup_pairs,
    "url_canonical_dedup": url_canonical_dedup,
    "blocked_domain_filter": blocked_domain_filter,
    "corpus_quality_report": corpus_quality_report,
    "doc_mojibake_repair": doc_mojibake_repair,
    "banned_phrase_filter": banned_phrase_filter,
    "tokenizer_fertility": tokenizer_fertility,
    # -- round 6, second wave: mining / coreset / privacy / blocking-eval ---
    "bitext_margin_mining": bitext_margin_mining,
    "coreset_kcenter_sample": coreset_kcenter_sample,
    "customer_k_anonymity": customer_k_anonymity,
    "lsh_blocking_quality": lsh_blocking_quality,
    "dup_aware_sample_weights": dup_aware_sample_weights,
    "join_skew_profile_docs": join_skew_profile_docs,
    "entity_golden_records": entity_golden_records,
    "ivf_recall_report": ivf_recall_report,
    "events_psi_drift": events_psi_drift,
    "customers_dsl_kanon": customers_dsl_kanon,
    "dedup_cost_profile": dedup_cost_profile,
    "lsh_scurve_table": lsh_scurve_table,
    "langid_confusion_matrix": langid_confusion_matrix,
    "langid_heuristic_confusion": langid_heuristic_confusion,
    "doc_language_id_trained": doc_language_id_trained,
    "doc_quality_filter_trained": doc_quality_filter_trained,
    # -- oracle-backed, green in round 1 -----------------------------------
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_revenue_forecast": q6_revenue_forecast,
    "top_customers_per_nation": top_customers_per_nation,
    "customer_order_stats": customer_order_stats,
    "part_brand_stats": part_brand_stats,
    "supplied_not_ordered_parts": supplied_not_ordered_parts,
    "promo_revenue_share": promo_revenue_share,
    "large_quantity_orders": large_quantity_orders,
    "small_quantity_revenue": small_quantity_revenue,
    "cheapest_supplier_per_part": cheapest_supplier_per_part,
    "order_priority_semijoin": order_priority_semijoin,
    "customer_order_distribution": customer_order_distribution,
    "disjunctive_part_revenue": disjunctive_part_revenue,
    "idle_rich_customers": idle_rich_customers,
    "nation_trade_volume": nation_trade_volume,
    "returned_items_report": returned_items_report,
    "embedding_label_zscore": embedding_label_zscore,
    "events_etl_dsl": events_etl_dsl,
    "events_raw_selector_profile": events_raw_selector_profile,
    "lineitem_dsl_crosschain_monitor": lineitem_dsl_crosschain_monitor,
    "events_dsl_agg": events_dsl_agg,
    "events_dsl_window": events_dsl_window,
    "events_dsl_join_agg": events_dsl_join_agg,
    "events_dsl_sql": events_dsl_sql,
    "events_hourly_rollup": events_hourly_rollup,
    "events_dsl_loop": events_dsl_loop,
    "events_moving_avg": events_moving_avg,
    "ts_window_motifs": ts_window_motifs,
    "term_doc_frequency": term_doc_frequency,
    "events_json_props": events_json_props,
    "docs_by_source_quality": docs_by_source_quality,
    "orders_cube": orders_cube,
    "median_quantity_by_flag": median_quantity_by_flag,
    "clickers_not_buyers": clickers_not_buyers,
    "purchases_asof_click": purchases_asof_click,
    "dedup_exact_docs": dedup_exact_docs,
    "doc_fingerprints": doc_fingerprints,
    "doc_winnowing_fingerprints": doc_winnowing_fingerprints,
    "doc_text_stats": doc_text_stats,
    "doc_language_id": doc_language_id,
    "knn_bruteforce": knn_bruteforce,
    "embedding_norms": embedding_norms,
    "orders_running_total": orders_running_total,
    "orders_rollup": orders_rollup,
    "orders_status_pivot": orders_status_pivot,
    "clickers_and_buyers": clickers_and_buyers,
    "doc_quality_filter": doc_quality_filter,
    "doc_bpe_token_counts": doc_bpe_token_counts,
    "doc_repetition": doc_repetition,
    "doc_chunks": doc_chunks,
    # -- oracle-backed, new in round 2 -------------------------------------
    "corpus_token_budget_sample": corpus_token_budget_sample,
    "corpus_split_assignment": corpus_split_assignment,
    "corpus_summary_stats": corpus_summary_stats,
    "docs_dsl_curation": docs_dsl_curation,
    "source_overlap_matrix": source_overlap_matrix,
    "item_transition_walks": item_transition_walks,
    "training_order_shuffle": training_order_shuffle,
    "benchmark_decontamination": benchmark_decontamination,
    "pii_scrub_stats": pii_scrub_stats,
    "shipping_delay_by_priority": shipping_delay_by_priority,
    "part_value_concentration": part_value_concentration,
    "late_delivery_suppliers": late_delivery_suppliers,
    "embedding_quantization": embedding_quantization,
    "stratified_doc_sample": stratified_doc_sample,
    "nation_market_share": nation_market_share,
    "top_revenue_suppliers": top_revenue_suppliers,
    "doc_boilerplate_scrub": doc_boilerplate_scrub,
    "bm25_doc_search": bm25_doc_search,
    "dsir_importance_weights": dsir_importance_weights,
    "item_transition_pagerank": item_transition_pagerank,
    "substring_span_dedup": substring_span_dedup,
    "doc_lm_quality": doc_lm_quality,
    "doc_gopher_repetition": doc_gopher_repetition,
    "ccnet_quality_buckets": ccnet_quality_buckets,
    "hll_distinct_users": hll_distinct_users,
    "theta_distinct_setops": theta_distinct_setops,
    "image_ahash_near_dups": image_ahash_near_dups,
    "hybrid_rrf_search": hybrid_rrf_search,
    "perceptron_lang_weights": perceptron_lang_weights,
    "perceptron_lang_errors": perceptron_lang_errors,
    "events_anomaly_zscore": events_anomaly_zscore,
    "doc_bigram_lm_quality": doc_bigram_lm_quality,
    "skipgram_training_pairs": skipgram_training_pairs,
    "cms_heavy_tokens": cms_heavy_tokens,
    "unimax_language_weights": unimax_language_weights,
    "profit_by_nation_year": profit_by_nation_year,
    "supplier_count_by_part_type": supplier_count_by_part_type,
    "event_funnel_conversion": event_funnel_conversion,
    "weekly_retention_cohorts": weekly_retention_cohorts,
    "pmi_collocations": pmi_collocations,
    "orders_zorder_keys": orders_zorder_keys,
    "kmeans_embedding_clusters": kmeans_embedding_clusters,
    "copurchase_triangles": copurchase_triangles,
    "media_real_image_features": media_real_image_features,
    "media_png_features": media_png_features,
    "media_gif_features": media_gif_features,
    "sequence_packing": sequence_packing,
    "source_temperature_weights": source_temperature_weights,
    "events_value_histogram": events_value_histogram,
    "bpe_merge_rules": bpe_merge_rules,
    "bpe_encode_by_source": bpe_encode_by_source,
    "copurchase_clustering": copurchase_clustering,
    "hard_negative_mining": hard_negative_mining,
    "embedding_dim_stats": embedding_dim_stats,
    "copurchase_kcore": copurchase_kcore,
    "weighted_corpus_sample": weighted_corpus_sample,
    "corpus_curation_pipeline": corpus_curation_pipeline,
    "doc_nfc_normalization": doc_nfc_normalization,
    "bloom_order_pruning": bloom_order_pruning,
    "embedding_jl_projection": embedding_jl_projection,
    "embedding_covariance_matrix": embedding_covariance_matrix,
    "copurchase_communities": copurchase_communities,
    "pq_embedding_codes": pq_embedding_codes,
    "doc_gopher_quality": doc_gopher_quality,
    "pq_adc_search": pq_adc_search,
    "mmr_diverse_search": mmr_diverse_search,
    # -- oracle-backed, new in round 3 -------------------------------------
    "sampled_value_quantiles": sampled_value_quantiles,
    "top_tokens_per_source": top_tokens_per_source,
    "session_overlap_join": session_overlap_join,
    "logreg_quality_weights": logreg_quality_weights,
    "events_dsl_sample": events_dsl_sample,
    "zipf_token_slope": zipf_token_slope,
    "source_kl_divergence": source_kl_divergence,
    "events_hopping_rollup": events_hopping_rollup,
    "orders_grouping_sets": orders_grouping_sets,
    "customer_balance_deciles": customer_balance_deciles,
    "lineitem_unpivot_charges": lineitem_unpivot_charges,
    "doc_memorization_risk": doc_memorization_risk,
    "minhash_portable_dup_pairs": minhash_portable_dup_pairs,
    "simhash_portable_near_dups": simhash_portable_near_dups,
    # -- rows-only (no SQL-expressible oracle): keep last ------------------
    "embedding_zca_whitening": embedding_zca_whitening,
    "minhash_near_dup_pairs": minhash_near_dup_pairs,
    "simhash_doc_signatures": simhash_doc_signatures,
    "knn_ivf_approx": knn_ivf_approx,
    "semantic_dedup_docs": semantic_dedup_docs,
    "embedding_pca_projection": embedding_pca_projection,
}

# The two LOSSLESS certification twins run LAST: on the sf1 stress corpus
# each takes many minutes (by design — full inverted-index self-joins, the
# quadratic the capped configs exist to avoid) and their spill/GC wake was
# measured polluting the NEXT queries' bench samples (BASELINE.md round-5
# adjudication: doc_keywords 44.7 s mid-sweep vs 13.7 s standalone).
# Registry iteration order only affects bench sequencing, never results.
for _whale in ("ngram_jaccard_dup_pairs", "tfidf_dup_pairs"):
    QUERIES[_whale] = QUERIES.pop(_whale)

ORACLES: dict[str, str] = {
    "q1_pricing_summary": ORACLE_Q1,
    "q3_shipping_priority": ORACLE_Q3,
    "q5_local_supplier_volume": ORACLE_Q5,
    "q6_revenue_forecast": ORACLE_Q6,
    "top_customers_per_nation": ORACLE_TOP_CUSTOMERS,
    "customer_order_stats": ORACLE_CUSTOMER_ORDER_STATS,
    "part_brand_stats": ORACLE_PART_BRAND,
    "supplied_not_ordered_parts": ORACLE_ANTI_PARTS,
    "promo_revenue_share": ORACLE_PROMO_SHARE,
    "large_quantity_orders": ORACLE_LARGE_ORDERS,
    "small_quantity_revenue": ORACLE_SMALL_QTY,
    "cheapest_supplier_per_part": ORACLE_CHEAPEST_SUPP,
    "order_priority_semijoin": ORACLE_Q4_SEMI,
    "customer_order_distribution": ORACLE_Q13_DIST,
    "disjunctive_part_revenue": ORACLE_Q19_DISJ,
    "idle_rich_customers": ORACLE_Q22_IDLE,
    "nation_trade_volume": ORACLE_Q7_TRADE,
    "returned_items_report": ORACLE_Q10_RETURNS,
    "embedding_label_zscore": ORACLE_EMB_ZSCORE,
    "events_etl_dsl": ORACLE_EVENTS_DSL,
    "events_dsl_agg": ORACLE_EVENTS_DSL_AGG,
    "events_dsl_window": ORACLE_EVENTS_DSL_WINDOW,
    "events_dsl_join_agg": ORACLE_EVENTS_DSL_JOIN,
    "events_dsl_sql": ORACLE_EVENTS_DSL_SQL,
    "events_hourly_rollup": ORACLE_EVENTS_HOURLY,
    "events_dsl_loop": ORACLE_EVENTS_DSL_LOOP,
    "user_sessions": ORACLE_SESSIONS,
    "events_moving_avg": ORACLE_MOVING_AVG,
    "ts_window_motifs": ORACLE_TS_MOTIFS,
    "term_doc_frequency": ORACLE_TERM_DF,
    "events_json_props": ORACLE_JSON_PROPS,
    "docs_by_source_quality": ORACLE_SOURCE_QUALITY,
    "orders_cube": ORACLE_ORDERS_CUBE,
    "median_quantity_by_flag": ORACLE_MEDIAN_QTY,
    "clickers_not_buyers": ORACLE_EXCEPT,
    "purchases_asof_click": ORACLE_ASOF,
    "dedup_exact_docs": ORACLE_DEDUP_EXACT,
    "doc_fingerprints": ORACLE_FINGERPRINTS,
    "doc_winnowing_fingerprints": ORACLE_WINNOWING,
    "doc_text_stats": ORACLE_TEXT_STATS,
    "doc_language_id": ORACLE_LANG_ID,
    "knn_bruteforce": ORACLE_KNN,
    "embedding_norms": ORACLE_NORMS,
    # minhash_near_dup_pairs: probabilistic candidates -> rows-only check
    "orders_running_total": ORACLE_RUNNING_TOTAL,
    "orders_rollup": ORACLE_ROLLUP,
    "orders_status_pivot": ORACLE_PIVOT,
    "clickers_and_buyers": ORACLE_INTERSECT,
    "doc_quality_filter": ORACLE_QUALITY_FILTER,
    "doc_bpe_token_counts": ORACLE_BPE,
    "doc_repetition": ORACLE_REPETITION,
    "doc_chunks": ORACLE_DOC_CHUNKS,
    "ngram_jaccard_dup_pairs": ORACLE_NGRAM_JACCARD,
    "ngram_jaccard_capped_pairs": ORACLE_NGRAM_JACCARD_CAPPED,
    "minhash_portable_dup_pairs": ORACLE_MINHASH_PORTABLE,
    "simhash_portable_near_dups": ORACLE_SIMHASH_PORTABLE,
    "embedding_near_dup_exact": ORACLE_EMB_NEAR_DUP,
    "corpus_token_budget_sample": ORACLE_TOKEN_BUDGET,
    "corpus_split_assignment": ORACLE_SPLIT_ASSIGNMENT,
    "corpus_summary_stats": ORACLE_CORPUS_SUMMARY,
    "docs_dsl_curation": ORACLE_DOCS_DSL_CURATION,
    "source_overlap_matrix": ORACLE_SOURCE_OVERLAP,
    "item_transition_walks": ORACLE_ITEM_WALKS,
    "training_order_shuffle": ORACLE_TRAIN_ORDER,
    "benchmark_decontamination": ORACLE_DECONTAM,
    "pii_scrub_stats": ORACLE_PII,
    "shipping_delay_by_priority": ORACLE_SHIPMODE,
    "part_value_concentration": ORACLE_PART_CONC,
    "late_delivery_suppliers": ORACLE_LATE_SUPP,
    "embedding_quantization": ORACLE_QUANT,
    "stratified_doc_sample": ORACLE_STRAT_SAMPLE,
    "nation_market_share": ORACLE_MKT_SHARE,
    "top_revenue_suppliers": ORACLE_TOP_SUPP,
    "doc_boilerplate_scrub": ORACLE_BOILERPLATE_SCRUB,
    "bm25_doc_search": ORACLE_BM25,
    "dsir_importance_weights": ORACLE_DSIR,
    "item_transition_pagerank": ORACLE_PAGERANK,
    "substring_span_dedup": ORACLE_SPAN_DEDUP,
    "doc_lm_quality": ORACLE_LM_QUALITY,
    "doc_gopher_repetition": ORACLE_GOPHER_REP,
    "ccnet_quality_buckets": ORACLE_CCNET_BUCKETS,
    "hll_distinct_users": ORACLE_HLL_USERS,
    "cms_heavy_tokens": ORACLE_CMS_TOKENS,
    "bloom_order_pruning": ORACLE_BLOOM_PRUNE,
    "embedding_jl_projection": ORACLE_JL_PROJECTION,
    "embedding_covariance_matrix": ORACLE_EMB_COVARIANCE,
    "copurchase_communities": ORACLE_LPA_COMMUNITIES,
    "pq_embedding_codes": ORACLE_PQ_CODES,
    "doc_gopher_quality": ORACLE_GOPHER_QUALITY,
    "pq_adc_search": ORACLE_ADC_SEARCH,
    "mmr_diverse_search": ORACLE_MMR_SEARCH,
    "unimax_language_weights": ORACLE_UNIMAX,
    "profit_by_nation_year": ORACLE_PROFIT_NATION_YEAR,
    "supplier_count_by_part_type": ORACLE_SUPPLIER_COUNT,
    "event_funnel_conversion": ORACLE_FUNNEL,
    "weekly_retention_cohorts": ORACLE_RETENTION,
    "pmi_collocations": ORACLE_PMI,
    "orders_zorder_keys": ORACLE_ZORDER_KEYS,
    "kmeans_embedding_clusters": ORACLE_KMEANS,
    "knn_ivf_lattice_approx": ORACLE_IVF_LATTICE,
    "semantic_dedup_lattice": ORACLE_SEMANTIC_LATTICE,
    "fuzzy_entity_dup_pairs": ORACLE_FUZZY_NAME_PAIRS,
    "url_canonical_dedup": ORACLE_URL_CANONICAL_DEDUP,
    "blocked_domain_filter": ORACLE_BLOCKED_DOMAIN_FILTER,
    "corpus_quality_report": ORACLE_CORPUS_QUALITY_REPORT,
    "doc_mojibake_repair": ORACLE_DOC_MOJIBAKE_REPAIR,
    "banned_phrase_filter": ORACLE_BANNED_PHRASE_FILTER,
    "tokenizer_fertility": ORACLE_TOKENIZER_FERTILITY,
    "bitext_margin_mining": ORACLE_BITEXT_MARGIN,
    "coreset_kcenter_sample": ORACLE_KCENTER,
    "customer_k_anonymity": ORACLE_K_ANONYMITY,
    "lsh_blocking_quality": ORACLE_BLOCKING_QUALITY,
    "dup_aware_sample_weights": ORACLE_DUP_WEIGHTS,
    "join_skew_profile_docs": ORACLE_JOIN_SKEW,
    "entity_golden_records": ORACLE_GOLDEN_RECORDS,
    "ivf_recall_report": ORACLE_IVF_RECALL,
    "events_psi_drift": ORACLE_PSI_DRIFT,
    "customers_dsl_kanon": ORACLE_K_ANONYMITY,
    "dedup_cost_profile": ORACLE_DEDUP_COST,
    "lsh_scurve_table": ORACLE_LSH_SCURVE,
    "langid_confusion_matrix": ORACLE_LANGID_CONFUSION,
    "events_raw_selector_profile": ORACLE_RAW_SELECTOR_PROFILE,
    "lineitem_dsl_crosschain_monitor": ORACLE_XCHAIN_MONITOR,
    "langid_heuristic_confusion": ORACLE_LANGID_HEURISTIC_CONFUSION,
    "doc_language_id_trained": ORACLE_LANGID_TRAINED,
    "doc_quality_filter_trained": ORACLE_QUALITY_FILTER_TRAINED,
    "copurchase_triangles": ORACLE_TRIANGLES,
    "media_real_image_features": ORACLE_MEDIA_REAL,
    "media_png_features": ORACLE_MEDIA_REAL,
    "media_gif_features": ORACLE_MEDIA_REAL,
    "sequence_packing": ORACLE_SEQ_PACKING,
    "source_temperature_weights": ORACLE_TEMPERATURE_WEIGHTS,
    "events_value_histogram": ORACLE_VALUE_HISTOGRAM,
    "bpe_merge_rules": ORACLE_BPE_MERGES,
    "bpe_encode_by_source": ORACLE_BPE_ENCODE,
    "copurchase_clustering": ORACLE_CLUSTERING,
    "hard_negative_mining": ORACLE_HARD_NEG,
    "embedding_dim_stats": ORACLE_DIM_STATS,
    "copurchase_kcore": ORACLE_KCORE,
    "weighted_corpus_sample": ORACLE_WEIGHTED_SAMPLE,
    "corpus_curation_pipeline": ORACLE_CURATION,
    "doc_nfc_normalization": ORACLE_NFC,
    "theta_distinct_setops": ORACLE_THETA_SETOPS,
    "image_ahash_near_dups": ORACLE_AHASH_PAIRS,
    "hybrid_rrf_search": ORACLE_RRF,
    "perceptron_lang_weights": ORACLE_PERCEPTRON_W,
    "perceptron_lang_errors": ORACLE_PERCEPTRON_ERR,
    "events_anomaly_zscore": ORACLE_ANOMALY_Z,
    "doc_bigram_lm_quality": ORACLE_BIGRAM_LM,
    "skipgram_training_pairs": ORACLE_SKIPGRAM,
    # simhash_doc_signatures: xxhash64-based -> rows-only check
    "orders_by_year_rangejoin": ORACLE_RANGEJOIN,
    "near_dup_components": ORACLE_NEAR_DUP_CC,
    "dedup_keep_best": ORACLE_DEDUP_KEEP_BEST,
    "doc_char_entropy": ORACLE_CHAR_ENTROPY,
    "tfidf_dup_pairs": ORACLE_TFIDF_PAIRS,
    "tfidf_capped_pairs": ORACLE_TFIDF_CAPPED,
    "cdc_chunk_dedup": ORACLE_CDC_CHUNKS,
    "corpus_duplicate_mass": ORACLE_DUP_MASS,
    "doc_rag_chunks": ORACLE_RAG_CHUNKS,
    "source_frequency_cap": ORACLE_SOURCE_FREQ_CAP,
    "matryoshka_recall": ORACLE_MATRYOSHKA,
    "user_session_windows": ORACLE_SESSION_WINDOWS,
    "events_hourly_gapfill": ORACLE_HOURLY_GAPFILL,
    "customer_rfm_segments": ORACLE_RFM,
    "source_token_diversity": ORACLE_SOURCE_DIVERSITY,
    "events_value_ecdf": ORACLE_VALUE_ECDF,
    "ts_znorm_pattern_search": _oracle_znorm(),
    "benchmark_containment": ORACLE_CONTAINMENT,
    "aqp_orders_avg": ORACLE_AQP,
    "source_dup_rates": ORACLE_SOURCE_DUP_RATES,
    "events_weekly_seasonality": ORACLE_WEEKLY_SEASONALITY,
    "customer_pareto_share": ORACLE_PARETO,
    "item_cf_recommendations": ORACLE_ITEM_CF,
    "item_reachability": ORACLE_ITEM_REACH,
    "ab_test_conversion": ORACLE_AB_TEST,
    "doc_keywords": ORACLE_DOC_KEYWORDS,
    "events_profile": ORACLE_EVENTS_PROFILE,
    "item_decayed_popularity": ORACLE_DECAYED_POP,
    "event_path_trigrams": ORACLE_PATH_TRIGRAMS,
    "discount_quantity_correlation": ORACLE_DISCOUNT_CORR,
    "doc_length_histogram": ORACLE_LENGTH_HISTOGRAM,
    "nation_yoy_growth": ORACLE_YOY_GROWTH,
    "knn_ivf_full_probe": ORACLE_KNN,
    # knn_ivf_approx: approximate ANN -> rows-only; recall pinned in tests
    # media_feature_extract: hash-seeded fake encoder -> rows-only check
    "sampled_value_quantiles": ORACLE_SAMPLED_QUANTILES,
    "top_tokens_per_source": ORACLE_TOP_TOKENS,
    "session_overlap_join": ORACLE_SESSION_OVERLAP,
    "logreg_quality_weights": ORACLE_LOGREG_W,
    "events_dsl_sample": ORACLE_EVENTS_DSL_SAMPLE,
    "zipf_token_slope": ORACLE_ZIPF_SLOPE,
    "source_kl_divergence": ORACLE_SOURCE_KL,
    "events_hopping_rollup": ORACLE_HOPPING,
    "orders_grouping_sets": ORACLE_GROUPING_SETS,
    "customer_balance_deciles": ORACLE_BALANCE_DECILES,
    "lineitem_unpivot_charges": ORACLE_UNPIVOT_CHARGES,
    "doc_memorization_risk": ORACLE_MEMORIZATION,
    # embedding_zca_whitening: driver-side eigensolve -> rows-only; numpy parity in tests
}
