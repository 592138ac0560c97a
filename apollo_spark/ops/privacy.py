"""Privacy-preserving release operators.

k-anonymity (Sweeney 2002): an aggregate view is k-anonymous over a set of
quasi-identifier (QI) columns when every released equivalence class contains
at least ``k`` underlying rows — small classes would let an attacker join the
release back to an individual. The distributed shape is one groupBy on the QI
columns (a single shuffle, map-side combinable) followed by a local
kept/suppressed split; suppressed classes collapse into ONE catch-all row
(QI values replaced by ``'*'``) so the release still accounts for every
input row without exposing any class smaller than k.

Determinism: value sums are quantized to DECIMAL before aggregation
(order-free exact sums, the repo-wide posture for cross-engine hash gates);
the only doubles are final divisions of already-identical operands.

Reference analog: apollo has no privacy tier (SURVEY §2.7 explicit absence);
this belongs to the training-data-pipeline extension the build mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymize(
    df: DataFrame,
    qi_cols: list[str | Column],
    k: int,
    value_col: str | Column,
    value_scale: int = 2,
) -> DataFrame:
    """k-anonymous aggregate release over ``qi_cols``.

    Returns one row per equivalence class with ``n_rows >= k`` plus a single
    suppressed catch-all row (every QI = ``'*'``) absorbing all smaller
    classes. The catch-all itself must honor k: if the suppressed classes
    total fewer than ``k`` rows, the catch-all is WITHHELD entirely — an
    attacker who knows the victim's QIs fall outside every released class
    would otherwise read a tiny group's (worst case one individual's) exact
    average off the '*' row. A withheld catch-all means the release does not
    account for every input row; that omission is the privacy guarantee
    working, not a bug. Columns: the QI columns (as strings, so ``'*'`` is
    typable), ``n_classes`` (1 for kept rows; how many raw classes the
    catch-all absorbed), ``n_rows``, and ``avg_value`` (double division of
    an exact DECIMAL sum — deterministic across engines and partitionings).

    ``value_col`` is quantized to ``DECIMAL(18, value_scale)`` BEFORE the
    sum, so the aggregate is summation-order-free. One shuffle total: the
    QI groupBy; the kept/suppressed split and the catch-all fold both
    reuse that aggregate (suppressed classes re-aggregate over at most
    #classes rows, not data rows).

    Input contract: the literal string ``'*'`` is RESERVED as the
    suppression marker — a legitimate >= k class whose QI value is '*'
    would be released indistinguishable from the catch-all, so any '*' in
    a QI column raises up front (one cheap aggregate over the grouped
    classes, not the raw rows). NULL QI values group as their own
    NULL-keyed equivalence class (standard SQL GROUP BY semantics): they
    are released only if that class reaches k, and are NOT folded into the
    catch-all.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    names = [c if isinstance(c, str) else df.select(c).columns[0] for c in qi_cols]
    qi = [
        (F.col(c) if isinstance(c, str) else c).cast("string").alias(n)
        for c, n in zip(qi_cols, names)
    ]
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    vdec = F.round(v.cast("double"), value_scale).cast(f"decimal(18,{value_scale})")
    g = (
        df.select(*qi, vdec.alias("__v"))
        .groupBy(*names)
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("__v").alias("__sum"))
        # persisted: the eager '*' guard below plus BOTH release branches
        # (kept + suppressed) read g — unpersisted, the guard's count would
        # re-pay the full raw-row scan+shuffle when the caller collects.
        # Released via release_caches on the returned frame (scoped_persist).
        .persist()
    )
    # '*' is the reserved suppression marker (see docstring) — reject
    # colliding input values before anything is released. Checked on the
    # grouped classes (bounded by class count, not data size).
    star_cond = None
    for n in names:
        hit = F.col(n) == "*"
        star_cond = hit if star_cond is None else (star_cond | hit)
    star_hit = g.filter(star_cond).limit(1).count()
    if star_hit:
        g.unpersist()  # error path: nothing will ever release the scope
        raise ValueError(
            "k_anonymize: a QI column contains the literal '*', which is "
            "reserved as the suppression marker; remap that value first"
        )
    kept = g.filter(F.col("n_rows") >= k).select(
        *names,
        F.lit(1).cast("long").alias("n_classes"),
        F.col("n_rows"),
        F.col("__sum").cast("decimal(38,6)").alias("__sum"),
    )
    suppressed = (
        g.filter(F.col("n_rows") < k)
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("__sum").alias("__sum"),
        )
        # vanish when nothing is suppressed AND when the catch-all itself
        # would be smaller than k (releasing it would expose a sub-k group)
        .filter(F.col("n_rows").isNotNull() & (F.col("n_rows") >= k))
        .select(
            *[F.lit("*").alias(n) for n in names],
            F.col("n_classes"),
            F.col("n_rows"),
            F.col("__sum").cast("decimal(38,6)").alias("__sum"),
        )
    )
    from apollo_spark.ops.cache import scoped_persist

    return scoped_persist(
        kept.unionByName(suppressed).select(
            *names,
            "n_classes",
            "n_rows",
            (F.col("__sum").cast("double") / F.col("n_rows").cast("double")).alias("avg_value"),
        ),
        g,
    )


__all__ = ["k_anonymize"]
