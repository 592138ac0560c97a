"""Distributed exact global ranking: two-phase range-bucketed rank/ntile.

A ``Window.orderBy(...)`` with no partition spec serializes the whole input
through ONE task — fine at sf0.1, lethal at 100 TB. This module reproduces
the same results bit-exactly with bounded parallelism:

1. **Bucket**: bin every row by its (non-null, numeric) sort key with an
   ORDER-PRESERVING pure column expression — no data pass, no broadcast of
   cut points. The bin is the key's power-of-two binade split 16 ways:
   ``b = 16*floor(log2(|k|)) + floor(16*|k| / 2^floor(log2(|k|)))``,
   sign-mirrored for negatives, 0 for zero. At an exact binade boundary the
   two candidate exponents yield the SAME bucket id (``16e + 32 ==
   16(e+1) + 16``), so float error in log2 cannot reorder buckets — the
   correctness invariant ``a <= b  =>  bucket(a) <= bucket(b)`` holds for
   every double. Each bucket spans 1/16th of a binade, so any key
   distribution spreads over O(16 * log2(range)) buckets.
2. **Rank within bucket**: a ``Window.partitionBy(__b)`` ordered by the
   ORIGINAL key expression (exact type — ties the double cast would merge
   are still broken by the true key), bucket-parallel.
3. **Offset**: per-bucket row counts / weight masses cumulate over the
   buckets-row frame — the only unpartitioned window anywhere, bounded by
   the occupied-bucket count regardless of input size — and broadcast back.

``global rank = bucket offset + within-bucket rank`` is bit-identical to
the single-task window. NTILE derives from the rank and the total (also
read off the offsets frame — no extra count job) by closed-form arithmetic
(``ntile_from_rank``); running sums share the same pass via a weighted
offset.

Same scheme as ops.corpus's hash-prefix ``_bucket_offsets`` (which needs
the bucket to be a PREFIX of the order key); this generalizes it to
arbitrary numeric sort keys, ascending or descending. The input frame is
persisted inside the op (it feeds the window pass and the offsets pass) and
the cache handle rides the returned frame — callers release it after their
terminal action via ops.cache.release_caches.

Skew note: value-skewed keys concentrate rows in few sub-binade buckets
(e.g. a constant key collapses to one). That costs balance, not
correctness — identical keys would land in one task of ANY
order-partitioned scheme; the tiebreak-only reorder within them is cheap.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from apollo_spark.ops.cache import carry_caches, scoped_persist

# shift making every signed binade bucket id positive (min double exponent
# -1074 -> 16*(-1075)+16 > -17300), so the sign mirror can't collide
_BSHIFT = 17400


def _monotone_bucket(key: Column) -> Column:
    """Order-preserving long bucket id of a numeric key — a pure expression
    (no aggregate, no data pass). 16 buckets per power-of-two binade."""
    k = key.cast("double")
    m = F.abs(k)
    e = F.floor(F.log2(m))
    posb = (e * 16 + F.floor(m * F.lit(16.0) / F.pow(F.lit(2.0), e))).cast("long")
    return (
        F.when(k == 0.0, F.lit(0))
        .when(k > 0.0, posb + F.lit(_BSHIFT))
        .otherwise(-(posb + F.lit(_BSHIFT)))
        .cast("long")
    )


def _bucket_offsets(base: DataFrame, weights: dict[str, Column]) -> DataFrame:
    """(__b, <name>..., __total_<name>...) cumulative-mass frame: for each
    named weight, the total mass of all PRECEDING buckets plus the grand
    total. One aggregate to <= occupied-bucket rows; the running sum over
    those rows is the only unpartitioned window in the scheme — bounded by
    the bucket count, input-size independent."""
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    agg = base.groupBy("__b").agg(
        *[F.sum(c).alias(f"__m_{n}") for n, c in weights.items()]
    )
    out = agg
    cols = []
    for n in weights:
        zero = F.lit(0).cast(agg.schema[f"__m_{n}"].dataType)
        out = out.withColumn(n, F.coalesce(F.sum(f"__m_{n}").over(w), zero))
        out = out.withColumn(f"__total_{n}", F.sum(f"__m_{n}").over(w_all))
        cols += [n, f"__total_{n}"]
    return out.select("__b", *cols)


def bucketed_rank(
    df: DataFrame,
    key: Column,
    *,
    descending: bool = False,
    tiebreak: Sequence[Column] = (),
    out_col: str = "rank",
    cumsum: dict[str, Column] | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Exact global ROW_NUMBER over (key asc|desc, tiebreak...) with
    bucket-level parallelism — the distributed replacement for
    ``F.row_number().over(Window.orderBy(...))``. The key must be numeric
    and non-null.

    ``cumsum={"cum": col}`` additionally emits exact global running sums
    (``ROWS UNBOUNDED PRECEDING .. CURRENT ROW``) of each column over the
    same order, sharing the single bucket shuffle. ``total_col`` exposes the
    global row count as a column (free — read off the offsets frame)."""
    cumsum = cumsum or {}
    # the input feeds two passes (per-bucket window, bucket offsets) —
    # persist so an expensive upstream (a scored corpus, a rollup) computes
    # once; the cache rides the returned frame (ops.cache) and is released
    # by the caller after its terminal action
    df = df.persist()
    bucket = _monotone_bucket(key)
    if descending:
        bucket = -bucket
    base = df.withColumn("__b", bucket)
    order = [key.desc() if descending else key.asc(), *tiebreak]
    w_in = Window.partitionBy("__b").orderBy(*order)
    w_run = w_in.rowsBetween(Window.unboundedPreceding, 0)
    ranked = base.withColumn("__r", F.row_number().over(w_in))
    for name, col in cumsum.items():
        ranked = ranked.withColumn(f"__s_{name}", F.sum(col).over(w_run))
    offs = _bucket_offsets(
        base, {"__off": F.lit(1), **{f"__o_{n}": c for n, c in cumsum.items()}}
    )
    # plain (not eager-broadcast) join: the big side is already hash-
    # partitioned by __b from the window shuffle, so this adds no big-side
    # exchange; the buckets-row offsets side is tiny and AQE broadcast-
    # converts it at runtime without the separate driver broadcast job
    out = (
        ranked.join(offs, "__b")
        .withColumn(out_col, (F.col("__off") + F.col("__r")).cast("long"))
        .drop("__b", "__r", "__off")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__total___off").cast("long"))
    out = out.drop("__total___off")
    for name in cumsum:
        out = (
            out.withColumn(name, F.col(f"__o_{name}") + F.col(f"__s_{name}"))
            .drop(f"__o_{name}", f"__s_{name}", f"__total___o_{name}")
        )
    # scoped_persist: own the new cache; carry_caches: inherit scopes an
    # upstream bucketed pass already attached to the input (chained calls)
    return carry_caches(scoped_persist(out, df), df)


def top_k_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    salt_col: Column,
    salt: int = 32,
    out_col: str = "rank",
) -> DataFrame:
    """Exact per-key top-k that survives KEY SKEW — the distributed
    replacement for ``row_number().over(partitionBy(key))`` when one key can
    own a data-sized share of the corpus (at web scale one domain can hold
    millions of documents; a per-key window serializes all of them through
    one task). Two phases:

    1. rank within ``(keys..., salt-bucket)`` — every window partition holds
       ~1/salt of even the hottest key; keep each bucket's top-k.
    2. re-rank the <= salt*k survivors per key — a provably bounded frame.

    Output is ROW-IDENTICAL to the single-window form for ANY salt value:
    each true top-k row is necessarily within its own bucket's top-k, so
    phase 1 never discards a winner — the salt affects the plan, not the
    result (the oracle replays the plain ROW_NUMBER form). ``order`` must be
    a total order (include a tiebreak) for the rank to be deterministic.
    ``salt_col`` must be deterministic per row (hash an id column).
    """
    if k < 1 or salt < 1:
        raise ValueError("k >= 1 and salt >= 1 required")
    clashes = {c for c in ("__s", "__r1", out_col) if c in df.columns}
    if clashes:
        raise ValueError(
            f"top_k_per_key would overwrite existing column(s) {sorted(clashes)}; "
            "rename them or pass a different out_col"
        )
    tmp = df.withColumn("__s", F.pmod(salt_col.cast("long"), F.lit(int(salt))))
    w1 = Window.partitionBy(*keys, "__s").orderBy(*order)
    surv = tmp.withColumn("__r1", F.row_number().over(w1)).filter(F.col("__r1") <= k)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        surv.withColumn(out_col, F.row_number().over(w2))
        .filter(F.col(out_col) <= k)
        .drop("__s", "__r1")
    )


def approx_ntile(
    df: DataFrame,
    key: Column,
    n: int,
    *,
    out_col: str = "ntile",
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate NTILE(n) — the 100-TB lake form beside the exact
    ``bucketed_ntile``. One ``percentile_approx`` pass (Greenwald-Khanna
    sketch: mergeable map-side partials, a cutoff list on the driver) yields
    the n-1 quantile cutoffs as a 1-row frame; tile assignment is then a pure
    broadcast-crossJoin expression — ZERO ordered shuffles and no per-row
    rank materialization, at the cost of rank error ~``total/accuracy`` rows
    near each cutoff (tiles can be off by one there, never more unless a
    tie-run spans a cutoff — approx gives a tie-run ONE tile where exact
    NTILE splits it by position). Use the exact form when the gate demands
    bit-parity; use this when the corpus is too big to rank."""
    cuts = df.agg(
        F.percentile_approx(
            key, [i / n for i in range(1, n)], F.lit(accuracy)
        ).alias("__cuts")
    )
    tile = (
        F.aggregate(
            F.col("__cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(key > c, 1).otherwise(0),
        )
        + 1
    ).cast("int")
    return df.crossJoin(F.broadcast(cuts)).withColumn(out_col, tile).drop("__cuts")


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL NTILE(n) as closed-form arithmetic on (global rank, total rows):
    the first ``total % n`` tiles hold ``ceil(total/n)`` rows, the rest
    ``floor(total/n)`` — identical to the window function, no window needed."""
    base = F.floor(total / F.lit(n))
    rem = total % F.lit(n)
    big = base + F.lit(1)
    # greatest(base,1): the small-branch divisor is unused when base == 0
    # (every row then satisfies rank <= rem*big), but must stay non-zero
    small = F.greatest(base, F.lit(1))
    return (
        F.when(rank <= rem * big, F.floor((rank - 1) / big) + 1)
        .otherwise(rem + F.floor((rank - rem * big - 1) / small) + 1)
        .cast("int")
    )


def bucketed_ntile(
    df: DataFrame,
    key: Column,
    n: int,
    *,
    descending: bool = False,
    tiebreak: Sequence[Column] = (),
    out_col: str = "ntile",
) -> DataFrame:
    """NTILE(n) over a global (key, tiebreak) order without a global window:
    bucketed_rank (which also yields the total row count) + tile
    arithmetic. One bucket shuffle, one broadcast — no extra count job."""
    ranked = bucketed_rank(
        df, key, descending=descending, tiebreak=tiebreak,
        out_col="__grank", total_col="__n",
    )
    return carry_caches(
        ranked.withColumn(out_col, ntile_from_rank(F.col("__grank"), F.col("__n"), n))
        .drop("__grank", "__n"),
        ranked,
    )


def bucketed_ntile_multi(
    df: DataFrame,
    metrics: dict[str, tuple[Column, bool]],
    n: int,
    *,
    id_col: str,
    tiebreak: Sequence[Column] = (),
    suffix: str = "_q",
) -> DataFrame:
    """NTILE(n) over SEVERAL (key, descending) orders in ONE shuffle pass:
    each row explodes to (metric, signed value) pairs, one window runs over
    (metric, bucket), per-metric offsets cumulate on the tiny bucket frame,
    and the tiles pivot back onto the input by ``id_col``. 3 metrics cost
    one 3N-row exchange instead of three N-row exchanges — same bytes, a
    third of the stage barriers (RFM-style multi-quantile reports).

    Keys must be non-null numerics exactly representable as doubles
    (ints/longs below 2^53, floats/doubles) — descending order is encoded by
    negating the double, so decimal-beyond-double precision would tie-merge.
    Output: (id_col, ``<metric>_val`` signed-restored double values,
    ``<metric><suffix>`` tile ints) — the metric values ride the explode and
    pivot back, so there is NO join against the input frame (one fewer
    exchange; callers re-cast _val columns to their original types)."""
    df = df.persist()
    entries = [
        F.struct(
            F.lit(name).alias("__m"),
            ((-key.cast("double")) if desc else key.cast("double")).alias("__v"),
        )
        for name, (key, desc) in metrics.items()
    ]
    # only id_col survives the explode projection: tiebreak columns must be
    # expressions over id_col (default: id_col asc)
    ex = df.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("__e")
    ).select(
        id_col, F.col("__e.__m").alias("__m"), F.col("__e.__v").alias("__v")
    )
    base = ex.withColumn("__b", _monotone_bucket(F.col("__v")))
    w_in = Window.partitionBy("__m", "__b").orderBy(
        F.col("__v").asc(), *(tiebreak or [F.col(id_col).asc()])
    )
    ranked = base.withColumn("__r", F.row_number().over(w_in))
    w_off = (
        Window.partitionBy("__m").orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = (
        Window.partitionBy("__m")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offs = (
        base.groupBy("__m", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__off", F.coalesce(F.sum("__c").over(w_off), F.lit(0)))
        .withColumn("__n", F.sum("__c").over(w_tot))
        .select("__m", "__b", "__off", "__n")
    )
    sign = {name: (-1.0 if desc else 1.0) for name, (_k, desc) in metrics.items()}
    tiles = (
        ranked.join(offs, ["__m", "__b"])
        .withColumn("__t", ntile_from_rank(F.col("__off") + F.col("__r"), F.col("__n"), n))
        .groupBy(id_col)
        .agg(
            *[
                F.max(F.when(F.col("__m") == name, F.col("__t"))).alias(f"{name}{suffix}")
                for name in metrics
            ],
            *[
                (F.max(F.when(F.col("__m") == name, F.col("__v"))) * F.lit(sign[name])).alias(
                    f"{name}_val"
                )
                for name in metrics
            ],
        )
    )
    return scoped_persist(tiles, df)
