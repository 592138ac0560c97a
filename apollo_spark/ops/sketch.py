"""Mergeable approximate sketches: HyperLogLog distinct counting and
count–min-sketch frequency estimation / heavy hitters.

The reference delegates all analytics to Postgres (SURVEY.md §0) and ships no
sketches; large-scale OLAP engines (Druid, Trino/Presto, BigQuery) treat
HLL/CMS as first-class because exact ``COUNT(DISTINCT ...)`` over 100 TB
forces a full shuffle of every key.  A sketch is a tiny, *mergeable* summary:
per-partition partial sketches combine associatively, so the only wide
exchange moves O(registers) bytes per group instead of O(distinct keys).

Engine-portable determinism: every hash here is the repo's standard
md5-prefix hash (first 15 hex chars -> 60-bit integer), which DuckDB can
reproduce exactly (``('0x' || substr(md5(x),1,15))::BIGINT``) — so the
*register states and scaled harmonic sums* are integers the correctness gate
can hash-match.  Only the final cardinality estimate involves floating point;
it is pinned by pytest against exact counts (error bound ~1.04/sqrt(m)), not
by the SQL oracle.

All column expressions are JVM-side built-ins — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 md5 hex chars; fits signed 64-bit in both engines


def portable_hash60(col: Column, salt: str = "") -> Column:
    """60-bit non-negative integer hash reproducible in DuckDB SQL."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10).cast("long")


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------


def hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    p: int = 10,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL register state: (group..., reg_idx, reg) with
    ``reg = max(rho)`` over values hashing into that register.

    The top ``p`` hash bits pick the register, the remaining ``60-p`` bits
    feed rho (1-based position of the first 1-bit; all-zeros -> 60-p+1).
    Registers are the *mergeable* representation: a max-combine of two
    register sets is the sketch of the union — at 100 TB each executor emits
    <= 2^p rows per group, and that is all the shuffle carries.
    """
    group_cols = list(group_cols or [])
    rbits = HASH_BITS - p
    h = portable_hash60(F.col(value_col) if isinstance(value_col, str) else value_col, salt)
    idx = F.shiftright(h, rbits)  # top p bits (integer shift — double division would lose precision past 2^53)
    w = h % F.lit(1 << rbits)
    # bit_length(w) via base-2 conv; conv("0") == "0" so guard w == 0
    rho = F.when(w == 0, F.lit(rbits + 1)).otherwise(
        F.lit(rbits + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        df.select(*group_cols, idx.alias("reg_idx"), rho.alias("rho"))
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(registers_a: DataFrame, registers_b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union two register sets (same p/salt): per-register max."""
    group_cols = list(group_cols or [])
    return (
        registers_a.unionByName(registers_b)
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("reg").alias("reg"))
    )


def hll_summary(registers: DataFrame, group_cols: list[str] | None = None, p: int = 10) -> DataFrame:
    """Exact-integer gate view of a register set, per group:

    * ``n_registers``  — registers with at least one hit,
    * ``zero_registers`` — m - n_registers,
    * ``harmonic_scaled`` — sum(2^-reg) over ALL m registers, scaled by
      2^(rbits+1) so it is an exact BIGINT (empty registers contribute 2^0);
      max value m * 2^(rbits+1) = 2^61 < 2^63,
    * ``register_digest`` — md5 over the sorted "idx:reg" pairs.

    Everything here is integer/string-exact -> hash-matchable by the DuckDB
    oracle; the float estimate lives in :func:`hll_estimate`.
    """
    group_cols = list(group_cols or [])
    m = 1 << p
    rbits = HASH_BITS - p
    k = rbits + 1  # scale exponent: reg in [1, rbits+1] -> 2^(k-reg) integer >= 1
    return registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_registers"),
        (F.lit(m) - F.count(F.lit(1))).alias("zero_registers"),
        (
            (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << k)
            # SQL-expr shift: the Python shiftleft() helper only takes a
            # literal int shift amount, not a per-row column
            + F.expr(f"sum(shiftleft(cast(1 as bigint), cast({k} as int) - cast(reg as int)))")
        ).alias("harmonic_scaled"),
        F.md5(
            F.concat_ws(
                ",",
                F.sort_array(F.collect_list(F.concat_ws(":", F.col("reg_idx"), F.col("reg")))),
            )
        ).alias("register_digest"),
    )


def hll_estimate(summary: DataFrame, p: int = 10) -> DataFrame:
    """Cardinality estimate from the exact summary (adds ``estimate`` DOUBLE).

    E = alpha_m * m^2 / Z with Z = harmonic_scaled / 2^(rbits+1); linear
    counting (m * ln(m/zeros)) below the 2.5m small-range threshold."""
    m = 1 << p
    k = HASH_BITS - p + 1
    raw = F.lit(hll_alpha(m) * m * m * float(1 << k)) / F.col("harmonic_scaled").cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_registers").cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("zero_registers") > 0), linear).otherwise(raw)
    return summary.withColumn("estimate", est)


def hll_count_distinct(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    p: int = 10,
    salt: str = "hll",
) -> DataFrame:
    """One-call convenience: registers -> summary -> estimate."""
    regs = hll_registers(df, value_col, group_cols, p=p, salt=salt)
    return hll_estimate(hll_summary(regs, group_cols, p=p), p=p)


# --------------------------------------------------------------------------
# Count–min sketch
# --------------------------------------------------------------------------


def cms_counts(
    df: DataFrame,
    item_col: str | Column,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    weight_col: str | Column | None = None,
) -> DataFrame:
    """Count–min sketch of item frequencies: rows (r, bucket, cnt) for
    ``depth`` independent hash rows of ``width`` buckets.

    The sketch is depth x width integers regardless of corpus size — the
    groupBy shuffles at most depth*width rows per partition (map-side partial
    aggregation), so the wide exchange is O(sketch), not O(items). Counts are
    exact integers -> fully oracle-able.
    """
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    wcol = (
        F.lit(1)
        if weight_col is None
        else (F.col(weight_col) if isinstance(weight_col, str) else weight_col)
    )
    rows = df.select(
        item.alias("__item"),
        wcol.cast("long").alias("__w"),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    )
    bucket = portable_hash60(
        F.concat(F.col("r").cast("string"), F.lit("|"), F.col("__item")), salt
    ) % F.lit(width)
    return (
        rows.withColumn("bucket", bucket)
        .groupBy("r", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    counts: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each candidate item: est = min over the
    depth rows of the bucket count (classic CMS upper bound: est >= truth,
    overestimate <= eps*N with prob 1-delta). The join is on (r, bucket) —
    at most depth rows per candidate against a depth*width table, so the
    sketch side always broadcasts."""
    cand = candidates.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    )
    bucket = portable_hash60(
        F.concat(F.col("r").cast("string"), F.lit("|"), F.col(item_col)), salt
    ) % F.lit(width)
    cand = cand.withColumn("bucket", bucket)
    joined = cand.join(F.broadcast(counts), ["r", "bucket"], "left").fillna({"cnt": 0})
    return joined.groupBy(item_col).agg(F.min("cnt").alias("cms_count"))


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Items whose CMS estimate >= min_count (superset of the true heavy
    hitters; no false negatives). Candidate set = distinct items — at 100 TB
    feed a pre-filtered candidate stream (e.g. per-partition local top-k)
    instead of the full distinct."""
    counts = cms_counts(df, item_col, depth=depth, width=width, salt=salt)
    cands = df.select(item_col).distinct()
    est = cms_estimate(counts, cands, item_col, depth=depth, width=width, salt=salt)
    return est.filter(F.col("cms_count") >= F.lit(min_count))


__all__ = [
    "portable_hash60",
    "hll_alpha",
    "hll_registers",
    "hll_merge",
    "hll_summary",
    "hll_estimate",
    "hll_count_distinct",
    "cms_counts",
    "cms_estimate",
    "cms_heavy_hitters",
]


# ---------------------------------------------------------------- histogram


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 32,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-range equi-width histogram sketch: per-(group, bin) counts.

    The mergeable alternative to exact percentiles at 100 TB: partial
    histograms combine by integer addition, so the wide exchange carries at
    most ``bins`` rows per group instead of every value (an exact
    percentile_disc is a per-group sort). Out-of-range values clamp into
    the edge bins — total count is preserved, the standard monitoring-
    histogram convention. All integer arithmetic; bin edges are exact IEEE
    doubles so assignment is engine-reproducible."""
    g = list(group_cols or [])
    width = (float(hi) - float(lo)) / bins
    raw = F.floor((F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(width))
    bin_ = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)).cast("int")
    return (
        # NULL values carry no position in the distribution: binning them
        # would emit a NULL bin that sorts differently per engine and skews
        # every cumulative count downstream
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*g, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_merge(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge two histogram sketches (same lo/hi/bins): add counts per bin."""
    g = list(group_cols or [])
    return a.unionByName(b).groupBy(*g, "bin").agg(F.sum("n").alias("n"))


def histogram_quantile(
    hist: DataFrame,
    q: float,
    lo: float,
    hi: float,
    bins: int = 32,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group quantile estimate from a histogram sketch: find the bin
    where the running count crosses q*total, linearly interpolate inside it.
    Deterministic: integer cumulative counts, then two IEEE ops. Windows
    partition by group (bin count per group <= ``bins`` — tiny frames)."""
    from pyspark.sql import Window

    g = list(group_cols or [])
    width = (float(hi) - float(lo)) / bins
    w_grp = Window.partitionBy(*[F.col(c) for c in g]) if g else Window.partitionBy(F.lit(1))
    w_cum = (
        w_grp.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    )
    h = (
        hist.withColumn("cum", F.sum("n").over(w_cum))
        .withColumn("total", F.sum("n").over(w_grp))
        .withColumn("target", F.ceil(F.lit(float(q)) * F.col("total")).cast("long"))
    )
    # first bin whose cumulative count reaches the target
    hit = h.filter(
        (F.col("cum") >= F.col("target")) & ((F.col("cum") - F.col("n")) < F.col("target"))
    )
    frac = (F.col("target") - (F.col("cum") - F.col("n"))).cast("double") / F.col("n").cast(
        "double"
    )
    est = F.lit(float(lo)) + (F.col("bin").cast("double") + frac) * F.lit(width)
    return hit.select(*g, est.alias("quantile_est"), F.col("total"))


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------

BLOOM_WORD_BITS = 63  # bits per BIGINT word; shifts 0..62 stay positive in both engines


def bloom_build(
    df: DataFrame,
    key_col: str | Column,
    m_bits: int = 8192,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter over ``key_col``: rows ``(word_idx, bits)``.

    The filter is the *broadcastable* pre-join pruning structure the
    reference's Postgres-delegated analytics never needed: at 100 TB a
    semi-join against a small-but-not-broadcastable key set would shuffle
    the fact table; a Bloom filter of those keys is O(m_bits/63) BIGINT
    words — kilobytes — that ride a broadcast and drop most non-matching
    rows *before* the exchange (the same trick as Spark's own runtime
    bloom-filter join, but explicit, mergeable, and engine-portable).

    Bit state is exact integers (md5-prefix hashes, ``bit_or`` over
    one-hot words), so the whole filter is hash-matchable by a DuckDB
    oracle. Map-side partial ``bit_or`` means the shuffle carries at most
    ``m_bits/63`` rows per partition.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    rows = df.select(
        key.cast("string").alias("__key"),
        F.explode(F.array(*[F.lit(r) for r in range(k)])).alias("r"),
    )
    pos = portable_hash60(
        F.concat(F.col("r").cast("string"), F.lit("|"), F.col("__key")), salt
    ) % F.lit(m_bits)
    return (
        rows.select(
            F.floor(pos / F.lit(BLOOM_WORD_BITS)).cast("long").alias("word_idx"),
            (pos % F.lit(BLOOM_WORD_BITS)).cast("int").alias("__bit"),
        )
        .select("word_idx", F.expr("shiftleft(cast(1 as bigint), __bit)").alias("__mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two filters built with identical (m_bits, k, salt): OR the words."""
    return a.unionByName(b).groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    df: DataFrame,
    key_col: str | Column,
    bloom: DataFrame,
    m_bits: int = 8192,
    k: int = 4,
    salt: str = "bloom",
    out_col: str = "might_member",
) -> DataFrame:
    """Add boolean ``out_col``: True iff every one of the ``k`` probe bits is
    set (no false negatives; false-positive rate ~ (1-e^{-kn/m})^k).

    The filter is packed into one map value carried by a 1-row broadcast
    crossJoin — never a shuffle of ``df``, never a driver ``collect``.
    Each probe is a map lookup + mask test, all JVM-side whole-stage
    codegen (probe positions land as real columns so the per-probe bit
    shift can be a SQL expression — the Python ``shiftleft`` helper only
    accepts a literal shift amount).
    """
    key = (F.col(key_col) if isinstance(key_col, str) else key_col).cast("string")
    packed = bloom.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "bits"))).alias("__bloom_words")
    )
    out = df.crossJoin(F.broadcast(packed))
    pos_cols = []
    for r in range(k):
        c = f"__bloom_pos_{r}"
        out = out.withColumn(
            c, portable_hash60(F.concat(F.lit(f"{r}|"), key), salt) % F.lit(m_bits)
        )
        pos_cols.append(c)
    w = BLOOM_WORD_BITS
    cond = " AND ".join(
        f"(coalesce(element_at(__bloom_words, cast({c} div {w} as bigint)), cast(0 as bigint))"
        f" & shiftleft(cast(1 as bigint), cast({c} % {w} as int))) != 0"
        for c in pos_cols
    )
    return out.withColumn(out_col, F.expr(cond)).drop("__bloom_words", *pos_cols)


# --------------------------------------------------------------------------
# Theta sketch (fixed-theta sampling mode): distinct counting WITH set algebra
# --------------------------------------------------------------------------

THETA_HASH_SPACE = 1 << HASH_BITS  # 2^60


def theta_threshold(log2_k: int) -> int:
    """Retention threshold for sampling rate 1/K, K = 2^log2_k (exact integer
    because the 60-bit hash space is a power of two)."""
    return THETA_HASH_SPACE >> log2_k


def theta_sketch(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    log2_k: int = 2,
    salt: str = "theta",
) -> DataFrame:
    """Fixed-theta distinct sketch: per group, the set of DISTINCT 60-bit
    hashes below ``2^60 / K`` — a uniform 1/K sample of the distinct keys.
    Rows ``(group..., h)``.

    Where HLL answers only ``|A|``, retained-set sketches support the full
    set algebra (Dasgupta et al., "Theta Sketch Framework", 2016): union =
    set union, intersection = set intersection, difference = set minus —
    all at the same theta, all exact on the sample, so
    ``estimate = |retained| * K`` for any composed expression.

    100 TB shape: the ``h < T`` filter runs BEFORE the distinct shuffle and
    is a plain codegen'd comparison on a hash of the key, so the wide
    exchange moves ~1/K of the distinct keys and 0 payload columns. All
    integer state (md5-prefix hashes), so sketches AND estimates are
    engine-portable and oracle-gateable bit-for-bit.
    """
    key = F.col(value_col) if isinstance(value_col, str) else value_col
    g = list(group_cols or [])
    h = portable_hash60(key.cast("string"), salt)
    return (
        df.filter(key.isNotNull())
        .select(*g, h.alias("h"))
        .filter(F.col("h") < F.lit(theta_threshold(log2_k)))
        .distinct()
    )


def theta_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two sketches built with identical (log2_k, salt)."""
    return a.unionByName(b).distinct()


def theta_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """Intersection — the operation HLL fundamentally cannot do losslessly."""
    return a.intersect(b)


def theta_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """A-minus-B on the retained sets (same theta on both sides)."""
    return a.subtract(b)


def theta_estimate(
    sk: DataFrame, log2_k: int = 2, group_cols: list[str] | None = None, out_col: str = "distinct_est"
) -> DataFrame:
    """Unbiased distinct estimate ``|retained| * K`` — pure integer, so the
    estimate itself hash-gates against a SQL replay. Relative std err is
    ~ sqrt((K-1)/|retained|)."""
    g = list(group_cols or [])
    agg = sk.groupBy(*g) if g else sk.groupBy()
    return agg.agg((F.count(F.lit(1)) * F.lit(1 << log2_k)).alias(out_col))


# --------------------------------------------------------------------------
# Deterministic hash-rate sampling (mergeable sample "sketch")
# --------------------------------------------------------------------------


def hash_sample(
    df: DataFrame, key_col: str | Column, rate_denom: int, salt: str = "samp"
) -> DataFrame:
    """Keep exactly the rows whose 60-bit portable hash of ``key_col`` is
    ``0 (mod rate_denom)`` — a deterministic ~1/rate_denom uniform sample.

    Why this beats ``df.sample()`` as a lake-scale primitive:

    * **mergeable**: the union of two hash-samples IS the hash-sample of the
      union (same salt/denominator), so per-partition / per-day samples
      combine associatively like any sketch — ``TABLESAMPLE`` resamples and
      cannot be combined across increments;
    * **coordinated**: the same key draws the same verdict in every table,
      so samples of two fact tables JOIN correctly (join of samples =
      sample of join on the hashed key) — the textbook coordinated/bottom-k
      sampling property RNG samples lack;
    * **reproducible across engines**: the predicate is the repo's md5-prefix
      hash, replayable in DuckDB SQL, so downstream exact aggregates over
      the sample hash-gate bit-for-bit.

    The filter is a narrow map evaluated at the scan (predicate on a
    deterministic expression — rows drop BEFORE any exchange). Scale-up
    estimators multiply by ``rate_denom``.
    """
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return df.filter(portable_hash60(c.cast("string"), salt) % F.lit(int(rate_denom)) == 0)
