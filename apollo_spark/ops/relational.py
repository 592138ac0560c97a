"""Relational operators Spark lacks as single calls, built shuffle-consciously.

The reference has no joins at all (SURVEY §2.7); these exist for (a) the
pipeline's balance/token_balance enrichment (as-of lookup on a point-in-time
table, replacing per-row RPC at /root/reference/chainservice/chainservice.go:
244-291) and (b) the general analytics surface the north-star requires.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (backward; forward = earliest >=) matching the
    equi-keys.

    Scale design: implemented as union + window (one shuffle on ``on``,
    linear in |L|+|R|) instead of a non-equi join + aggregation (which
    explodes to |L|x|R| per key before reducing). This is the classic
    skew-safe formulation; at 1000 executors the only hotspot is a genuinely
    hot key, which AQE skew-split handles since the window partitions by key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    value_cols = list(value_cols) if value_cols is not None else [c for c in right.columns if c not in on and c != right_ts]
    on = list(on)

    payload = F.struct(*[F.col(c) for c in value_cols], F.col(right_ts).cast("long").alias("__asof_ts"))
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).cast("long").alias("__ts"),
        payload.alias("__payload"),
        F.lit(0).alias("__side"),
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType))
    unioned = l.select(*on, "__ts", "__payload", "__side", "__row").unionByName(
        r.select(*on, "__ts", "__payload", "__side", "__row")
    )
    if direction == "backward":
        # right rows sort before left rows at equal ts -> inclusive match
        w = Window.partitionBy(*on).orderBy(F.col("__ts").asc(), F.col("__side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
        filled = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    else:
        w = Window.partitionBy(*on).orderBy(F.col("__ts").desc(), F.col("__side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
        filled = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col("__row")[c].alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(c + suffix) for c in value_cols],
    )
    return out


# Safe widening casts (narrow build-side type -> probe-side type). Narrowing
# casts (e.g. timestamp bound -> date point) would truncate and change the
# interval semantics, so they are never pre-applied.
_RJ_WIDEN = {
    ("date", "timestamp"),
    ("date", "timestamp_ntz"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("int", "bigint"),
    ("int", "double"),
    ("bigint", "double"),
    ("float", "double"),
}


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_point: str | Column,
    right_lo: str | Column,
    right_hi: str | Column,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join with equi-key prefix so Catalyst gets a hash
    join + residual range predicate rather than a pure cartesian.

    When the bound columns are a narrower type than the point column (date
    bounds vs timestamp point, int vs bigint), the widening cast is applied
    ONCE on the build side instead of letting Catalyst coerce inside the join
    condition — a BroadcastNestedLoopJoin predicate is interpreted per pair,
    so the inline cast costs |L|x|R| evaluations (measured 3x on a 600k-row
    probe side)."""
    lp = F.col(left_point) if isinstance(left_point, str) else left_point
    lo = F.col(right_lo) if isinstance(right_lo, str) else right_lo
    hi = F.col(right_hi) if isinstance(right_hi, str) else right_hi
    helper: list[str] = []
    try:
        pt = left.select(lp).schema[0].dataType.simpleString()
        lot = right.select(lo).schema[0].dataType.simpleString()
        hit = right.select(hi).schema[0].dataType.simpleString()
    except Exception:  # expression not resolvable standalone; keep inline coercion
        pt = lot = hit = ""
    if pt and lot == hit and lot != pt and (lot, pt) in _RJ_WIDEN:
        right = right.select("*", lo.cast(pt).alias("__rj_lo"), hi.cast(pt).alias("__rj_hi"))
        lo, hi = F.col("__rj_lo"), F.col("__rj_hi")
        helper = ["__rj_lo", "__rj_hi"]
    cond = (lp >= lo) & (lp < hi)
    for k in on:
        cond = cond & (left[k] == right[k])
    out = left.join(right, cond, how)
    return out.drop(*helper) if helper else out


def top_k(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], k: int) -> DataFrame:
    """Per-group top-k via row_number window (map-side partial sort; one
    shuffle on the group key)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn("__rank", F.row_number().over(w)).filter(F.col("__rank") <= k).drop("__rank")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval-overlap join: all (L, R) pairs sharing the equi-keys whose
    closed intervals ``[left_lo, left_hi]`` / ``[right_lo, right_hi]``
    overlap. Bound columns must be integral (epoch seconds etc.).

    Scale design: a naive formulation joins on the equi-keys alone and
    filters the overlap predicate afterwards — per-key |L|x|R| fan-out,
    which dies when one key holds many intervals (the 100 TB telemetry
    case: one tenant, millions of sessions). With ``bucket_width`` set,
    both sides explode to the fixed-width time buckets their interval
    covers and the join key becomes (keys..., bucket): fan-out per task is
    bounded by intervals-per-bucket, not intervals-per-key. Each
    overlapping pair shares the bucket containing ``max(lo_L, lo_R)``
    (the overlap's start), so emitting a pair ONLY from that bucket makes
    results exactly-once without a distinct shuffle.

    Choose ``bucket_width`` ~ the typical interval length: much smaller
    replicates rows across many buckets, much larger re-creates the
    per-key fan-out. ``None`` keeps the plain equi-join + predicate
    (right when keys are fine-grained and interval counts per key are
    small).
    """
    on = list(on)
    lcols = [F.col(f"__L.{c}").alias(c) for c in left.columns]
    rcols = [F.col(f"__R.{c}").alias(c) for c in right.columns if c not in on]
    overlap = (F.col(f"__L.{left_lo}") <= F.col(f"__R.{right_hi}")) & (
        F.col(f"__R.{right_lo}") <= F.col(f"__L.{left_hi}")
    )
    if bucket_width is None:
        cond = overlap
        for k in on:
            cond = cond & (F.col(f"__L.{k}") == F.col(f"__R.{k}"))
        return left.alias("__L").join(right.alias("__R"), cond).select(*lcols, *rcols)

    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be a positive integer")

    def buckets(lo: str, hi: str) -> Column:
        return F.sequence(
            F.floor(F.col(lo).cast("long") / w).cast("long"),
            F.floor(F.col(hi).cast("long") / w).cast("long"),
        )

    l = left.withColumn("__b", F.explode(buckets(left_lo, left_hi))).alias("__L")
    r = right.withColumn("__b", F.explode(buckets(right_lo, right_hi))).alias("__R")
    first_shared = F.floor(
        F.greatest(F.col(f"__L.{left_lo}").cast("long"), F.col(f"__R.{right_lo}").cast("long")) / w
    ).cast("long")
    cond = (F.col("__L.__b") == F.col("__R.__b")) & overlap & (F.col("__L.__b") == first_shared)
    for k in on:
        cond = cond & (F.col(f"__L.{k}") == F.col(f"__R.{k}"))
    return l.join(r, cond).select(*lcols, *rcols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the (small-ish) right side `salt`
    ways and scatter the left side across the replicas, so one hot key's rows
    land on `salt` tasks instead of one.

    Complements AQE skew-split (which rebalances post-shuffle sizes but not a
    single giant hash-map build): use when one key dominates the LEFT side —
    the classic 100 TB null-key / power-law join. Cost: right side is
    replicated `salt`x, so keep `salt` ~ the observed skew factor.

    Exact same result set as a plain equi-join (the salt column is internal)
    for ``how`` in {'inner', 'left', 'left_semi', 'left_anti', 'cross'}.
    'right'/'full' are rejected: every unmatched right row exists once per
    replica, so those modes would emit it `salt` times — salt the other way
    around (swap the sides) instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): right-preserving joins would emit "
            f"unmatched right rows {salt}x (one per salt replica); swap the "
            "sides and use 'left', or use a plain join with AQE skew handling"
        )
    on = list(on)
    l = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a hash-bucketed (and per-bucket sorted) parquet table so
    every future equi-join/aggregation on ``keys`` between co-bucketed
    tables is EXCHANGE-FREE: Spark maps bucket i of each side to the same
    task, and with ``sort`` the sort-merge join skips its sort too.

    This is the pay-once-shuffle-forever primitive for 100 TB fact tables
    joined repeatedly on the same key (lineitem x orders every night): the
    bucketing shuffle happens at WRITE time, and N downstream joins each
    save a full-table exchange of both sides. Bucket count is a frozen
    layout property — pick ~ (table size / target partition size) at the
    LARGEST anticipated scale; co-joined tables must use identical counts.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *list(keys))
    if sort:
        w = w.sortBy(*list(keys))
    w.saveAsTable(table)


def join_skew_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    top_n: int = 10,
) -> DataFrame:
    """Pre-flight skew profile for an equi-join: per-key match counts on
    both sides and the key's estimated output fan-out (cnt_a * cnt_b) —
    the number that decides whether the join needs a broadcast, AQE skew
    splitting, or salting (ops.relational.salted_join) BEFORE the shuffle
    is paid. At 100 TB one mega-key is the difference between a join that
    finishes and one straggler task that never does; this op is two
    map-side-combinable groupBy counts + a join of the (small) key-count
    frames, never the data-sized join itself.

    Returns the ``top_n`` keys by estimated pairs with their share of the
    total estimated join output: (key, cnt_a, cnt_b, est_pairs, share).
    Deterministic: integer counts, ties toward the smaller key.
    ``est_pairs`` is exposed as a DOUBLE but computed and summed in
    DECIMAL(38,0): multi-billion-row mega-keys — exactly the rows this
    profiler exists to surface at 100 TB — would silently wrap a non-ANSI
    BIGINT product (~3e9 * 3e9 > 2^63) and corrupt the skew signal (ADVICE
    round 6), while a double running SUM is partition-order dependent past
    2^53 and would make ``share`` flake in the last ulps between runs. The
    decimal product and sum are exact and order-free; each value is cast to
    double ONCE (correctly rounded, deterministic) for the output.
    """
    rk = right_key or left_key
    ca = left.groupBy(F.col(left_key).alias("key")).agg(F.count(F.lit(1)).alias("cnt_a"))
    cb = right.groupBy(F.col(rk).alias("key")).agg(F.count(F.lit(1)).alias("cnt_b"))
    exact = (
        F.col("cnt_a").cast("decimal(19,0)") * F.col("cnt_b").cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    j = ca.join(cb, "key").withColumn("__ep", exact)
    total = j.agg(F.sum("__ep").cast("decimal(38,0)").alias("__total"))
    return (
        j.crossJoin(F.broadcast(total))
        .withColumn("est_pairs", F.col("__ep").cast("double"))
        .withColumn("share", F.col("__ep").cast("double") / F.col("__total").cast("double"))
        .orderBy(F.col("__ep").desc(), F.col("key").asc())
        .limit(top_n)
        .select("key", "cnt_a", "cnt_b", "est_pairs", "share")
    )
