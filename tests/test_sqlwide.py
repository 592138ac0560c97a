"""sql_over cache-interaction contract (round 10).

dropTempView uncaches any cached plan matching the view definition, so
sql_over dropping its uuid view unconditionally silently UNPERSISTED every
cached frame it was called over — the minhash signature table lost its
cache and re-ran its corpus-sized Arrow pass once per consumer (measured:
minhash_estimate_dup_pairs 23 jobs -> 17 after the fix, portable 15 -> 12).
The contract pinned here: sql_over must never evict a persisted input, and
must not leak views for unpersisted inputs.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from apollo_spark.ops.sqlwide import sql_over


def _imr_count(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().count("InMemoryRelation")


def test_sql_over_preserves_persisted_input(spark):
    base = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("k"))
    sig = sql_over(base, "SELECT k, min(id) AS m0 FROM {v} GROUP BY k").persist()
    try:
        derived = sql_over(sig, "SELECT k, m0 + 1 AS b FROM {v}")
        # the persisted frame must still be registered with the cache
        # manager AND substitute into downstream plans
        assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
        assert _imr_count(derived) > 0, "persisted sql_over input was evicted"
        assert sorted(r.b for r in derived.collect()) == [1, 2, 3, 4, 5]
    finally:
        sig.unpersist()


def test_release_caches_drops_kept_views(spark):
    """Views kept over persisted frames must be dropped when the cache
    itself is released (round-10 verdict minor #6: release_caches left one
    uuid catalog entry per persisted-frame sql_over in a long session)."""
    from apollo_spark.ops.cache import release_caches, scoped_persist

    before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    base = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("k"))
    sig = sql_over(base, "SELECT k, min(id) AS m0 FROM {v} GROUP BY k").persist()
    derived = sql_over(sig, "SELECT k, m0 + 1 AS b FROM {v}")
    out = scoped_persist(derived, sig)
    assert out.count() == 5  # terminal action
    mid = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert {n for n in mid - before if n.startswith("__apollo_w_")}, (
        "expected the view over the persisted frame to be kept while cached"
    )
    release_caches(out)
    after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    leaked = {n for n in after - before if n.startswith("__apollo_w_")}
    assert leaked == set(), leaked


def test_sql_over_drops_view_for_unpersisted_input(spark):
    before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    out = sql_over(
        spark.range(10).select("id"), "SELECT id * 2 AS d FROM {v}"
    )
    assert out.count() == 10
    after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    leaked = {n for n in after - before if n.startswith("__apollo_w_")}
    assert leaked == set(), leaked
