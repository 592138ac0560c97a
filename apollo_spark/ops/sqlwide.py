"""Single-roundtrip construction of WIDE generated plans.

Plan-construction cost is real driver wall-clock: every `F.col/F.min/...`
call is a py4j socket roundtrip, and generated-wide plans (128 band keys,
320 slot mins, 256 fingerprint-match terms) were measured spending more
bench time in py4j chatter than in execution (round-10 profile: 17,005
roundtrips / 5.5 s to BUILD one minhash_autotuned_dup_pairs plan whose
execution takes ~2 s). Building the same expressions as ONE generated SQL
string costs one roundtrip regardless of width and resolves to the same
analyzed plan — results are bit-identical because the expressions are
identical after parsing.

``sql_over(df, "SELECT ... FROM {v} ...")`` registers ``df`` under a unique
temp-view name, runs one ``spark.sql``, forces analysis, and unregisters
the view — UNLESS the view's plan is cached. ``dropTempView`` uncaches any
cached plan matching the view definition (the catalog contract — and
PySpark's own SQL-formatter argument binding has the identical behavior,
so ``spark.sql(..., v=df)`` is not an escape): the first implementation
dropped unconditionally, and every PERSISTED frame consumed through
sql_over silently lost its cache and was recomputed once per consumer —
the round-10 minhash signature table (4 consumers on the full verify
path, 8 on the estimate path) re-ran its corpus-sized Arrow signature
pass per consumer, per execution. Views over cached frames are therefore
left registered (uuid names — no collision; one catalog entry per
persisted-frame sql_over, a bounded handful per query build). Thread-safe
via the uuid view name (the DSL runs multi-query concurrency on driver
threads).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def sql_over(df: DataFrame, sql_fmt: str) -> DataFrame:
    """One spark.sql over ``df`` registered as temp view ``{v}``.

    ``sql_fmt`` must reference the input as ``{v}`` (str.format placeholder).
    Analysis is forced before the view is dropped; the view is kept when its
    plan is cached, because dropping would uncache the input (see module
    docstring).
    """
    v = f"__apollo_w_{uuid.uuid4().hex[:16]}"
    df.createOrReplaceTempView(v)
    try:
        out = df.sparkSession.sql(sql_fmt.format(v=v))
        out.schema  # force analysis: the plan must not depend on the view
    except Exception:
        df.sparkSession.catalog.dropTempView(v)
        raise
    # dropTempView uncaches the view's plan; dropping a view over a
    # persisted frame would silently unpersist it (measured: the minhash
    # signature cache vanished and its Arrow pass re-ran per consumer).
    # Kept views are recorded ON the input frame so release_caches can
    # drop them when the cache itself is released — without that a
    # long-lived session accumulates one uuid catalog entry per
    # persisted-frame sql_over forever (round-10 verdict, minor #6).
    if not df.sparkSession.catalog.isCached(v):
        df.sparkSession.catalog.dropTempView(v)
    else:
        kept = getattr(df, "_apollo_kept_views", None)
        if kept is None:
            kept = []
            df._apollo_kept_views = kept
        kept.append(v)
    return out
