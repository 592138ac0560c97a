"""JDBC sink integration against a REAL database — embedded Apache Derby,
which ships in Spark's jars — covering the reference's table lifecycle
(drop+create on first write, append after; /root/reference/db/db.go:79-111,
generate/sql.go:18-52) and the streaming foreachBatch path."""

from __future__ import annotations

import pytest

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/sinkdb;create=true"


def _read_back(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_jdbc_overwrite_then_append_lifecycle(spark, derby_url):
    """write(): first call drops+creates (overwrite), later calls append —
    verified against actual database state, not mocks."""
    from apollo_spark.sinks import SinkConfig, SinkWriter

    writer = SinkWriter(
        SinkConfig(jdbc_url=derby_url, jdbc_properties={"driver": DERBY_DRIVER})
    )
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    writer.write(df1, "events_out")
    assert {(r["id"], r["s"]) for r in _read_back(spark, derby_url, "events_out").collect()} == {
        (1, "a"),
        (2, "b"),
    }
    # second write appends (db.go lifecycle: create once, then INSERT)
    df2 = spark.createDataFrame([(3, "c")], "id bigint, s string")
    writer.write(df2, "events_out")
    assert _read_back(spark, derby_url, "events_out").count() == 3
    # a FRESH writer overwrites again (new run = new lifecycle)
    SinkWriter(SinkConfig(jdbc_url=derby_url, jdbc_properties={"driver": DERBY_DRIVER})).write(
        df2, "events_out"
    )
    assert _read_back(spark, derby_url, "events_out").count() == 1


def test_jdbc_foreach_batch_streaming_to_real_db(spark, tmp_path, derby_url):
    """Streaming micro-batches land in the real database exactly once, and a
    restart from checkpoint does not wipe previously committed rows."""
    import json

    from apollo_spark.sinks import SinkConfig, SinkWriter

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    writer = SinkWriter(
        SinkConfig(jdbc_url=derby_url, jdbc_properties={"driver": DERBY_DRIVER})
    )

    def run_once():
        stream = spark.readStream.schema("id bigint, s string").json(str(src))
        q = (
            stream.writeStream.foreachBatch(writer.foreach_batch("rt_out"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "b1.json").write_text("\n".join(json.dumps({"id": i, "s": f"x{i}"}) for i in range(5)))
    run_once()
    assert _read_back(spark, derby_url, "rt_out").count() == 5

    # restart with a FRESH writer (simulates process restart: in-memory
    # state gone, checkpoint preserved) — earlier rows must survive
    (src / "b2.json").write_text(json.dumps({"id": 99, "s": "late"}))
    writer2 = SinkWriter(
        SinkConfig(jdbc_url=derby_url, jdbc_properties={"driver": DERBY_DRIVER})
    )

    stream = spark.readStream.schema("id bigint, s string").json(str(src))
    q = (
        stream.writeStream.foreachBatch(writer2.foreach_batch("rt_out"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = _read_back(spark, derby_url, "rt_out")
    assert out.count() == 6  # 5 original + 1 new, nothing wiped
    assert out.filter("id = 99").count() == 1
