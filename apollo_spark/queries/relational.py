"""TPC-H-flavored relational tier.

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
from apollo_spark.queries._shared import _t, dsum


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


