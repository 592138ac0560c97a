"""Transactional parquet table format: atomicity, snapshot isolation, time
travel, commit CAS races, exactly-once streaming, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from apollo_spark.table_format import CommitConflict, TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_append_read_roundtrip_and_history(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    assert t.current_version() is None
    v1 = t.write(_df(spark, [(1, "a"), (2, "b")]))
    v2 = t.write(_df(spark, [(3, "c")]))
    assert (v1, v2) == (1, 2)
    out = t.read(spark).orderBy("id").collect()
    assert [(r.id, r.v) for r in out] == [(1, "a"), (2, "b"), (3, "c")]
    hist = t.history()
    assert [h["version"] for h in hist] == [2, 1]
    assert all(h["mode"] == "append" for h in hist)


def test_overwrite_replaces_but_time_travel_sees_old(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "old")]))
    t.write(_df(spark, [(2, "new")]), mode="overwrite")
    assert [(r.id, r.v) for r in t.read(spark).collect()] == [(2, "new")]
    # snapshot 1 still fully readable: overwrite never mutates old files
    assert [(r.id, r.v) for r in t.read(spark, version=1).collect()] == [(1, "old")]


def test_uncommitted_data_is_invisible(spark, tmp_path):
    """Torn-write atomicity: part files without a manifest don't exist for
    readers (the crash-between-data-and-commit case)."""
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    # simulate a writer that died after its data landed but before commit
    _df(spark, [(99, "ghost")]).write.parquet(str(t.data_dir / "txn-dead"))
    out = t.read(spark).collect()
    assert [(r.id, r.v) for r in out] == [(1, "a")]


def test_commit_cas_retries_on_conflict(spark, tmp_path):
    """If another writer claims version N+1 between head-read and link, the
    commit retries against the new head and both writes survive."""
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))

    real_link = os.link
    raced = {"done": False}

    def racing_link(src, dst, *a, **kw):
        # first link attempt: sneak a competing commit in underneath
        if not raced["done"]:
            raced["done"] = True
            t2 = TxTable(str(tmp_path / "t"))
            t2.write(_df(spark, [(50, "rival")]))
        return real_link(src, dst, *a, **kw)

    os.link = racing_link
    try:
        v = t.write(_df(spark, [(2, "b")]))
    finally:
        os.link = real_link
    assert v == 3  # rival took 2, our retry landed 3
    out = sorted((r.id, r.v) for r in t.read(spark).collect())
    assert out == [(1, "a"), (2, "b"), (50, "rival")]


def test_append_schema_mismatch_raises(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    other = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="schema mismatch"):
        t.write(other)
    # overwrite may change schema
    t.write(other, mode="overwrite")
    assert t.read(spark).columns == ["x"]


def test_exactly_once_batch_replay_skipped(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    sink = t.foreach_batch(app_id="job1")
    sink(_df(spark, [(1, "a")]), 0)
    sink(_df(spark, [(2, "b")]), 1)
    sink(_df(spark, [(1, "a")]), 0)  # checkpoint-restart replay
    assert t.current_version() == 2
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    # a different app's batch 0 is NOT a replay
    t.foreach_batch(app_id="job2")(_df(spark, [(3, "c")]), 0)
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]


def test_streaming_foreach_batch_end_to_end(spark, tmp_path):
    """Real writeStream -> TxTable.foreach_batch with availableNow; restart
    from the same checkpoint commits nothing new."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text("\n".join(json.dumps({"id": i, "v": f"r{i}"}) for i in range(5)))
    t = TxTable(str(tmp_path / "t"))
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("id long, v string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(t.foreach_batch(app_id="e2e"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run()
    assert t.read(spark).count() == 5
    v = t.current_version()
    run()  # no new source data: no new commit
    assert t.current_version() == v and t.read(spark).count() == 5


def test_vacuum_deletes_only_unreferenced(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]), mode="overwrite")  # v1 files now dead
    t.write(_df(spark, [(3, "c")]))  # v3 = v2 files + new
    deleted = t.vacuum(retain_last=2)
    assert len(deleted) >= 1  # v1's files gone
    # retained snapshots fully readable
    assert sorted(r.id for r in t.read(spark).collect()) == [2, 3]
    assert sorted(r.id for r in t.read(spark, version=2).collect()) == [2]
    # time travel past the horizon is gone
    with pytest.raises(FileNotFoundError):
        t._manifest(1)


def test_sinkwriter_tx_table_fanout(spark, tmp_path):
    """SinkConfig.tx_table_dir: batch write = atomic overwrite snapshot;
    streaming foreach_batch = exactly-once append keyed on batch_id."""
    from apollo_spark.sinks import SinkConfig, SinkWriter

    cfg = SinkConfig(tx_table_dir=str(tmp_path / "tables"))
    w = SinkWriter(cfg)
    w.write(_df(spark, [(1, "a")]), "q")
    w.write(_df(spark, [(2, "b")]), "q")  # re-run replaces, not appends
    t = TxTable(str(tmp_path / "tables" / "q"))
    assert [(r.id, r.v) for r in t.read(spark).collect()] == [(2, "b")]

    fb = w.foreach_batch("rt")
    fb(_df(spark, [(1, "a")]), 0)
    fb(_df(spark, [(1, "a")]), 0)  # replay dropped
    fb(_df(spark, [(2, "b")]), 1)
    rt = TxTable(str(tmp_path / "tables" / "rt"))
    assert sorted(r.id for r in rt.read(spark).collect()) == [1, 2]


def test_compact_merges_files_preserving_rows_and_history(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    for i in range(5):  # five tiny commits -> >= 5 files
        t.write(_df(spark, [(i, f"r{i}")]))
    pre_files = t.files_for()
    assert len(pre_files) >= 5
    v = t.compact(spark, num_files=1)
    assert v == 6 and len(t.files_for()) == 1
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 1, 2, 3, 4]
    # pre-compaction snapshot still time-travelable
    assert sorted(r.id for r in t.read(spark, version=5).collect()) == [0, 1, 2, 3, 4]
    # appends continue on top of the compacted snapshot
    t.write(_df(spark, [(99, "z")]))
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 1, 2, 3, 4, 99]


def test_compact_refuses_to_drop_concurrent_append(spark, tmp_path):
    """A commit landing between compact's snapshot read and its CAS must
    fail the compaction, not vanish."""
    from apollo_spark.table_format import CommitConflict as CC

    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))

    real_link = os.link
    state = {"raced": False}

    def racing_link(src, dst, *a, **kw):
        if not state["raced"]:
            state["raced"] = True
            TxTable(str(tmp_path / "t")).write(_df(spark, [(2, "late")]))
        return real_link(src, dst, *a, **kw)

    os.link = racing_link
    try:
        with pytest.raises(CC):
            t.compact(spark)
    finally:
        os.link = real_link
    # nothing lost: both writes visible, compact re-run succeeds
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    t.compact(spark)
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]


def test_manifest_stats_prune_files(spark, tmp_path):
    """Disjoint-range appends -> manifest min/max stats skip files that
    cannot match; pruned read + real filter == full read + real filter."""
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(i, f"a{i}") for i in range(0, 10)]).coalesce(1))
    t.write(_df(spark, [(i, f"b{i}") for i in range(100, 110)]).coalesce(1))
    t.write(_df(spark, [(i, f"c{i}") for i in range(200, 210)]).coalesce(1))
    assert len(t.files_for()) == 3
    pruned = t.files_for(prune={"id": (100, 150)})
    assert len(pruned) == 1  # only the middle file can match
    got = (
        t.read(spark, prune={"id": (100, 150)})
        .filter("id between 100 and 150")
        .count()
    )
    assert got == 10
    # unbounded side: id >= 200
    assert len(t.files_for(prune={"id": (200, None)})) == 1
    # string stats prune too
    assert len(t.files_for(prune={"v": ("b", "b~")})) == 1


def test_compact_sort_by_clusters_ranges(spark, tmp_path):
    """Range-clustered compaction yields files with disjoint key ranges, so
    a point-range prune opens a single file."""
    import random

    rows = [(i, f"r{i}") for i in range(400)]
    random.Random(7).shuffle(rows)
    t = TxTable(str(tmp_path / "t"))
    for k in range(4):  # interleaved unsorted commits
        t.write(_df(spark, rows[k * 100 : (k + 1) * 100]))
    # before clustering: every file overlaps the probe range
    assert len(t.files_for(prune={"id": (40, 60)})) > 1
    t.compact(spark, num_files=4, sort_by=["id"])
    assert len(t.files_for()) == 4
    assert len(t.files_for(prune={"id": (40, 60)})) <= 2  # disjoint ranges
    assert t.read(spark).count() == 400


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order clustering vs linear sort: the Morton-clustered table's
    manifest stats prune files for range predicates on EITHER column; the
    custkey-sorted table prunes only on custkey."""
    import pyspark.sql.functions as F

    from apollo_spark.ops.zorder import zorder_write

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    zt = TxTable(str(tmp_path / "zorder"))
    zorder_write(o, zt, ["o_custkey", "o_cents"], bits=12, n_files=16)
    lt = TxTable(str(tmp_path / "linear"))
    lt.write(
        o.repartitionByRange(16, "o_custkey").sortWithinPartitions("o_custkey"),
        mode="overwrite",
    )

    n_z, n_l = len(zt.files_for()), len(lt.files_for())
    assert n_z >= 8 and n_l >= 8  # enough files for skipping to mean anything

    stats = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_cents"), F.max("o_cents")
    ).first()
    ck_lo, ck_hi, c_lo, c_hi = stats
    ck_band = (ck_lo, ck_lo + (ck_hi - ck_lo) // 8)  # bottom 1/8 of custkey
    cents_band = (c_lo, c_lo + (c_hi - c_lo) // 8)  # bottom 1/8 of price

    z_ck = len(zt.files_for(prune={"o_custkey": ck_band}))
    z_cents = len(zt.files_for(prune={"o_cents": cents_band}))
    l_ck = len(lt.files_for(prune={"o_custkey": ck_band}))
    l_cents = len(lt.files_for(prune={"o_cents": cents_band}))

    # z-order skips meaningfully on BOTH dimensions
    assert z_ck <= n_z // 2, (z_ck, n_z)
    assert z_cents <= n_z // 2, (z_cents, n_z)
    # linear sort: great on its sort column, useless on the other
    assert l_ck <= n_l // 2, (l_ck, n_l)
    assert l_cents > n_l // 2, (l_cents, n_l)

    # pruning is sound: pruned read + real filter == full read + real filter
    pred = (F.col("o_cents") >= cents_band[0]) & (F.col("o_cents") <= cents_band[1])
    full = zt.read(spark).filter(pred).count()
    pruned = zt.read(spark, prune={"o_cents": cents_band}).filter(pred).count()
    assert full == pruned and full > 0


def test_read_changes_incremental_appends(spark, tmp_path):
    t = TxTable(str(tmp_path / "cdc"))
    v1 = t.write(_df(spark, [(1, "a"), (2, "b")]))
    v2 = t.write(_df(spark, [(3, "c")]))
    v3 = t.write(_df(spark, [(4, "d"), (5, "e")]))
    # increment since v1 = exactly the rows of v2+v3
    inc = t.read_changes(spark, since_version=v1).orderBy("id").collect()
    assert [(r.id, r.v) for r in inc] == [(3, "c"), (4, "d"), (5, "e")]
    # bounded range
    inc2 = t.read_changes(spark, since_version=v1, until_version=v2).collect()
    assert [(r.id, r.v) for r in inc2] == [(3, "c")]
    # since latest -> empty frame, schema preserved
    empty = t.read_changes(spark, since_version=v3)
    assert empty.count() == 0 and empty.columns == ["id", "v"]
    # since "before the table existed" (0) -> everything
    assert t.read_changes(spark, 0).count() == 5


def test_read_changes_refuses_rewrite_ranges(spark, tmp_path):
    t = TxTable(str(tmp_path / "cdc2"))
    v1 = t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]))
    t.compact(spark, num_files=1)
    t.write(_df(spark, [(3, "c")]))
    with pytest.raises(ValueError, match="compact|overwrite"):
        t.read_changes(spark, since_version=v1)
    t2 = TxTable(str(tmp_path / "cdc3"))
    v1 = t2.write(_df(spark, [(1, "a")]))
    t2.write(_df(spark, [(9, "z")]), mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        t2.read_changes(spark, since_version=v1)


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]))
    t.write(_df(spark, [(3, "c"), (4, "d")]))
    v = t.merge(spark, _df(spark, [(2, "B!"), (5, "e")]), ["id"])
    assert v == 3
    out = sorted((r.id, r.v) for r in t.read(spark).collect())
    assert out == [(1, "a"), (2, "B!"), (3, "c"), (4, "d"), (5, "e")]
    # time travel: pre-merge snapshot intact
    old = sorted((r.id, r.v) for r in t.read(spark, version=2).collect())
    assert old == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert t.history()[0]["mode"] == "merge"


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]).coalesce(1))
    t.write(_df(spark, [(2, "b")]).coalesce(1))
    before = set(t.files_for())
    t.merge(spark, _df(spark, [(2, "B!")]), ["id"])
    after = set(t.files_for())
    # the file holding id=1 is carried by reference; id=2's file is replaced
    kept = before & after
    assert len(kept) == 1
    rows = {r.id: r.v for r in t.read(spark).collect()}
    assert rows == {1: "a", 2: "B!"}


def test_merge_delete_with_keys_only_source(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    keys = spark.createDataFrame([(2,)], "id long")
    t.merge(spark, keys, ["id"], when_matched="delete", when_not_matched="ignore")
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 3]


def test_merge_insert_ignore_and_matched_delete_inserts_unmatched(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]))
    t.merge(spark, _df(spark, [(2, "gone"), (9, "new")]), ["id"],
            when_matched="delete", when_not_matched="insert")
    out = sorted((r.id, r.v) for r in t.read(spark).collect())
    assert out == [(1, "a"), (9, "new")]


def test_merge_duplicate_source_keys_rejected(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="duplicate source keys"):
        t.merge(spark, _df(spark, [(1, "x"), (1, "y")]), ["id"])


def test_merge_into_empty_table_inserts(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    v = t.merge(spark, _df(spark, [(1, "a")]), ["id"])
    assert v == 1
    assert [(r.id, r.v) for r in t.read(spark).collect()] == [(1, "a")]


def test_delete_where_predicate_and_null_semantics(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "a"), (2, None), (3, "c")], "id long, v string"))
    v = t.delete_where(spark, "v = 'a'")
    assert v == 2
    # DELETE WHERE semantics: null predicate does NOT delete (id=2 kept)
    assert sorted(r.id for r in t.read(spark).collect()) == [2, 3]
    assert t.history()[0]["mode"] == "delete"


def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    from pyspark.sql import functions as F

    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]).coalesce(1))
    t.write(_df(spark, [(2, "b")]).coalesce(1))
    before = set(t.files_for())
    t.delete_where(spark, F.col("id") == 2)
    after = set(t.files_for())
    assert len(before & after) == 1  # id=1's file carried by reference
    assert [r.id for r in t.read(spark).collect()] == [1]
    # time travel still sees the pre-delete snapshot
    assert sorted(r.id for r in t.read(spark, version=2).collect()) == [1, 2]


def test_delete_where_no_match_is_metadata_only(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]))
    before = set(t.files_for())
    v = t.delete_where(spark, "v = 'zzz'")
    assert v == 2
    assert set(t.files_for()) == before  # zero files rewritten
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]


def test_delete_where_conflict_detected(spark, tmp_path, monkeypatch):
    t = TxTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]))
    orig = TxTable._try_commit

    def race(self, manifest, target, txn):
        # another writer lands version `target` first
        if manifest.get("mode") == "delete" and not getattr(race, "done", False):
            race.done = True
            t2 = TxTable(str(tmp_path / "t"))
            t2.write(_df(spark, [(9, "z")]), mode="append")
        return orig(self, manifest, target, txn)

    monkeypatch.setattr(TxTable, "_try_commit", race)
    with pytest.raises(CommitConflict):
        t.delete_where(spark, "v = 'a'")


def test_schema_evolution_merge_schema(spark, tmp_path):
    from apollo_spark.table_format import TxTable

    t = TxTable(str(tmp_path / "tbl"))
    t.write(spark.createDataFrame([(1, "a")], "id long, name string"))
    # drift without the flag stays a hard error
    wide = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    with pytest.raises(ValueError, match="merge_schema"):
        t.write(wide)
    t.write(wide, merge_schema=True)
    out = t.read(spark)
    assert out.columns == ["id", "name", "score"]
    got = {r.id: (r.name, r.score) for r in out.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}  # old files read NULL
    # a narrower writer is legal under the evolved schema
    t.write(spark.createDataFrame([(3, "c")], "id long, name string"), merge_schema=True)
    got = {r.id: r.score for r in t.read(spark).collect()}
    assert got == {1: None, 2: 9.5, 3: None}
    # type change is never legal
    bad = spark.createDataFrame([(4, "d", "oops")], "id long, name string, score string")
    with pytest.raises(ValueError, match="cannot change column"):
        t.write(bad, merge_schema=True)
    # stats pruning on the appended column keeps statless (pre-evolution) files
    files = t.files_for(prune={"score": (9.0, 10.0)})
    assert len(files) >= 2  # the evolved file plus the sound statless keeps


def test_row_count_metadata_only(spark, tmp_path):
    from apollo_spark.table_format import TxTable

    t = TxTable(str(tmp_path / "cnt"))
    t.write(spark.range(100).selectExpr("id", "id % 7 AS k"))
    t.write(spark.range(100, 140).selectExpr("id", "id % 7 AS k"))
    assert t.row_count() == 140
    assert t.row_count(version=1) == 100
    assert t.row_count() == t.read(spark).count()
    # deletes/compaction keep the counts honest
    t.delete_where(spark, "k = 0")
    assert t.row_count() == t.read(spark).count()
    t.compact(spark, num_files=1)
    assert t.row_count() == t.read(spark).count()
    # a manifest missing a file's count (pre-feature table) returns None
    import json as _json

    m_path = sorted((tmp_path / "cnt" / "_commits").glob("*.json"))[-1]
    m = _json.loads(m_path.read_text())
    for f in m["stats"]:
        m["stats"][f].pop("#rows", None)
    m_path.write_text(_json.dumps(m))
    assert t.row_count() is None
