"""Sketches (HLL/theta/CMS/bloom), training mixtures, product analytics, Z-order, k-means/PQ/MMR, graph structure.

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
from apollo_spark.queries._shared import _events, _t, _ts_seconds, dsum


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
    # four consumers read the tokenization (sketch build, candidate
    # distinct, exact truth, total count) — persist so the regex
    # normalize+split+explode pass over the corpus runs once, not four
    # times (guide §5: caching when reuse is real)
    toks = d.select(
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("token")
    ).persist()
    counts = cms_counts(toks, "token", depth=4, width=1024)
    est = cms_estimate(counts, toks.distinct(), "token", depth=4, width=1024)
    truth = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    total = toks.agg(F.count(F.lit(1)).alias("__n"))
    return scoped_persist(
        est.join(truth, "token")
        .crossJoin(total)
        .filter(F.col("cms_count") * 200 >= F.col("__n"))
        .select("token", "cms_count", "true_count")
        .orderBy("token"),
        toks,
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
    bi_all = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_ab"))
    bi_counts = bi_all.filter(F.col("n_ab") >= 5)
    # corpus totals as VOCABULARY-sized re-aggregations of the count tables
    # (sum of exact longs == the direct corpus count), so the tokenize +
    # explode passes over the corpus run once per granularity, not twice
    n_uni = uni_counts.agg(F.sum("n_tok").alias("nu"))
    n_bi = bi_all.agg(F.sum("n_ab").alias("nb"))
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
    res = local_clustering(edges)
    # carry_caches: the post-processing select/orderBy returns a NEW frame —
    # without re-attaching the op's persist scope, release_caches() frees
    # nothing and the leaked cache memoises the next identical run (round 11)
    return carry_caches(
        res.select("node", "deg", "n_tri", F.round("coeff", 6).alias("coeff")).orderBy("node"),
        res,
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

