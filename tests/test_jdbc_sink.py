"""JDBC sink integration against a REAL database — embedded Apache Derby,
which ships in Spark's jars — covering the reference's table lifecycle
(drop+create on first write, append after; /root/reference/db/db.go:79-111,
generate/sql.go:18-52) and the streaming foreachBatch path.

Set APOLLO_SPARK_PG_URL (e.g. jdbc:postgresql://host/db?user=u&password=p)
to additionally run every test against a real PostgreSQL — the reference's
actual sink target — with the same opt-in pattern as the live-RPC smoke.
Derby always runs; Postgres rows appear only when the env var is set.
"""

from __future__ import annotations

import os
import uuid

import pytest

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
PG_DRIVER = "org.postgresql.Driver"

_BACKENDS = ["derby"] + (["postgres"] if os.environ.get("APOLLO_SPARK_PG_URL") else [])


@pytest.fixture(params=_BACKENDS)
def db(request, tmp_path):
    """(jdbc_url, jdbc_properties, table-name mangler). Postgres tables get a
    unique suffix so reruns against a shared server never collide."""
    if request.param == "derby":
        return (
            f"jdbc:derby:{tmp_path}/sinkdb;create=true",
            {"driver": DERBY_DRIVER},
            lambda t: t,
        )
    suffix = uuid.uuid4().hex[:8]
    return (
        os.environ["APOLLO_SPARK_PG_URL"],
        {"driver": PG_DRIVER},
        lambda t: f"{t}_{suffix}",
    )


def _read_back(spark, db, table):
    url, props, mangle = db
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", mangle(table))
        .option("driver", props["driver"])
    )
    return reader.load()


def _writer(db):
    from apollo_spark.sinks import SinkConfig, SinkWriter

    url, props, _ = db
    return SinkWriter(SinkConfig(jdbc_url=url, jdbc_properties=dict(props)))


def test_jdbc_overwrite_then_append_lifecycle(spark, db):
    """write(): first call drops+creates (overwrite), later calls append —
    verified against actual database state, not mocks."""
    _, _, mangle = db
    table = mangle("events_out")

    writer = _writer(db)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    writer.write(df1, table)
    assert {(r["id"], r["s"]) for r in _read_back(spark, db, "events_out").collect()} == {
        (1, "a"),
        (2, "b"),
    }
    # second write appends (db.go lifecycle: create once, then INSERT)
    df2 = spark.createDataFrame([(3, "c")], "id bigint, s string")
    writer.write(df2, table)
    assert _read_back(spark, db, "events_out").count() == 3
    # a FRESH writer overwrites again (new run = new lifecycle)
    _writer(db).write(df2, table)
    assert _read_back(spark, db, "events_out").count() == 1


def test_jdbc_foreach_batch_streaming_to_real_db(spark, tmp_path, db):
    """Streaming micro-batches land in the real database exactly once, and a
    restart from checkpoint does not wipe previously committed rows."""
    import json

    _, _, mangle = db
    table = mangle("rt_out")

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    writer = _writer(db)

    (src / "b1.json").write_text("\n".join(json.dumps({"id": i, "s": f"x{i}"}) for i in range(5)))
    stream = spark.readStream.schema("id bigint, s string").json(str(src))
    q = (
        stream.writeStream.foreachBatch(writer.foreach_batch(table))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _read_back(spark, db, "rt_out").count() == 5

    # restart with a FRESH writer (simulates process restart: in-memory
    # state gone, checkpoint preserved) — earlier rows must survive
    (src / "b2.json").write_text(json.dumps({"id": 99, "s": "late"}))
    writer2 = _writer(db)

    stream = spark.readStream.schema("id bigint, s string").json(str(src))
    q = (
        stream.writeStream.foreachBatch(writer2.foreach_batch(table))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = _read_back(spark, db, "rt_out")
    assert out.count() == 6  # 5 original + 1 new, nothing wiped
    assert out.filter("id = 99").count() == 1
