"""Assorted tier: quantiles, sessionization, regression, time-series search, profiles, histograms.

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
from apollo_spark.queries._shared import _events, _t, _ts_micros, _ts_seconds, davg, dsum
from apollo_spark.queries.events import TS_PATTERN
from apollo_spark.queries.corpus import _doc_components



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
    # the per-doc totals and the df pass both need the shingle arrays:
    # persist them so the tokenize+distinct shingling runs once, not twice
    sh = d.select("doc_id", shingles(F.col("text"), 5).alias("arr")).persist()
    totals = sh.select("doc_id", F.size("arr").alias("n_shingles"))
    ex = sh.select("doc_id", F.explode("arr").alias("s"))
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
    return scoped_persist(
        per_doc.orderBy(F.col("shared_frac").desc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", "n_shingles", "n_shared", "shared_frac"),
        sh,
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
    # carry_caches: keep the op's persist scope releasable (round 11 — the
    # leaked `w` cache memoised the bench's second repeat)
    res = tfidf_cosine_pairs(d, n=2, threshold=0.6, max_df=None)
    return carry_caches(
        res.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b"),
        res,
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
    res = tfidf_cosine_pairs(d, n=2, threshold=0.6, max_df=None, max_df_frac=0.04)
    return carry_caches(
        res.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b"),
        res,
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
    # deliberately NOT persisted: all three consumers (both self-join sides
    # + popularity) hang off the identical distinct exchange, which the
    # planner already reuses at runtime — a round-10 interleaved A/B showed
    # the cache materialization barrier consistently slower (1.6 vs 2.1 s)
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
    # ui deliberately NOT persisted: both self-join sides reuse the distinct
    # exchange at runtime; the round-10 A/B showed the cache barrier slower
    # (2.3 vs 3.1 s) — only the edge list (3 frontier-hop consumers) caches
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
    # tf feeds three consumers (df counts, the n_docs scalar, the weight
    # join): persist so the tokenize + explode + groupBy chain runs once
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
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
    return scoped_persist(
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "weight")
        .orderBy("doc_id", "rank"),
        tf,
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


