"""Sort-merge-bucket layout: co-bucketed tables join with NO exchange (the
pay-the-shuffle-at-write-time primitive for repeatedly-joined 100 TB facts).
Plan-shape assertions are scale-invariant, so tiny inputs are fine."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark):
    from apollo_spark.ops.relational import write_bucketed

    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bk_a", ["k"], buckets=4)
    write_bucketed(b, "bk_b", ["k"], buckets=4)
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    with _no_broadcast(spark):
        j = spark.table(ta).join(spark.table(tb), "k")
        p = _plan(j)
        assert "Exchange" not in p, p
        assert j.count() == 1000
        # correctness unchanged vs plain join
        plain = spark.table(ta).join(spark.table(tb), "k").agg(F.sum("va"), F.sum("vb"))
        assert plain.collect()[0][0] == sum(2 * i for i in range(1000))


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    p = _plan(spark.table(ta).groupBy("k").agg(F.sum("va")))
    assert "Exchange" not in p, p


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    """Control: the same join without the bucketed layout shuffles."""
    ta, _ = bucketed_pair
    plain = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("vb"))
    with _no_broadcast(spark):
        p = _plan(spark.table(ta).join(plain, "k"))
        assert "Exchange" in p


import contextlib as _ctx


@_ctx.contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
