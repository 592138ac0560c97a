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
temp-view name, runs one ``spark.sql``, forces analysis (so the view can be
dropped immediately — the returned frame keeps its own resolved plan), and
unregisters the view. Thread-safe via the uuid view name (the DSL runs
multi-query concurrency on driver threads).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def sql_over(df: DataFrame, sql_fmt: str) -> DataFrame:
    """One spark.sql over ``df`` registered as temp view ``{v}``.

    ``sql_fmt`` must reference the input as ``{v}`` (str.format placeholder).
    Analysis is forced before the view is dropped, so the result is safe to
    use (and the view name can never leak or collide: uuid per call).
    """
    v = f"__apollo_w_{uuid.uuid4().hex[:16]}"
    df.createOrReplaceTempView(v)
    try:
        out = df.sparkSession.sql(sql_fmt.format(v=v))
        out.schema  # force analysis: the plan must not depend on the view
    finally:
        df.sparkSession.catalog.dropTempView(v)
    return out
