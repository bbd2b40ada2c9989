"""applyInPandasWithState sessionization: state must survive micro-batch
boundaries (a session spanning two batches closes with the correct totals),
and the bounded-run contract (emit all sessions but each key's last) must
match a batch computation.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from lakehouse_plumber_spark.streaming import sessionize_stateful

GAP_US = 1_000_000  # 1s gap for compact fixtures


def _run_stream(spark, stage_dir, out_dir, ckpt, max_files=1):
    schema = "user_id long, eus long, event_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(stage_dir)
    )
    sessions = sessionize_stateful(stream, gap_us=GAP_US)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.schema(
        "user_id long, start_us long, end_us long, n_events long, total_value double"
    ).parquet(out_dir)


def test_session_spans_micro_batches(spark, tmp_path):
    """Events of one session split across two files/batches: the state store
    must carry the open session over the batch boundary."""
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    # batch 1: user 1 events at t=0s,0.5s  (one open session)
    # batch 2: t=0.9s (same session), then t=5s (closes it), t=10s (opens+stays)
    b1 = spark.createDataFrame(
        [(1, 0, 1, 1.0), (1, 500_000, 2, 2.0)],
        "user_id long, eus long, event_id long, value double",
    )
    b2 = spark.createDataFrame(
        [(1, 900_000, 3, 4.0), (1, 5_000_000, 4, 8.0), (1, 10_000_000, 5, 16.0)],
        "user_id long, eus long, event_id long, value double",
    )
    b1.coalesce(1).write.parquet(os.path.join(stage, "f1"))
    time.sleep(1.1)  # file-source ordering is by modification time
    b2.coalesce(1).write.parquet(os.path.join(stage, "f2"))

    out = _run_stream(
        spark,
        stage + "/*",
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files=1,
    )
    rows = sorted([tuple(r) for r in out.collect()])
    # session 1: events 1,2,3 (spans the batch boundary), closed by event 4
    # session 2: event 4 alone, closed by event 5; event 5's session stays open
    assert rows == [
        (1, 0, 900_000, 3, 7.0),
        (1, 5_000_000, 5_000_000, 1, 8.0),
    ]


def test_bounded_run_matches_batch_oracle(spark, testdata, tmp_path):
    """All-sessions-but-last contract vs a window-function batch computation
    on the events fixture."""
    ev = (
        spark.table("events")
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("eus"),
            "event_id",
            "value",
        )
    )
    stage = str(tmp_path / "stage")
    ev.coalesce(1).write.parquet(stage)
    gap = 1_800_000_000
    schema = "user_id long, eus long, event_id long, value double"
    stream = spark.readStream.schema(schema).parquet(stage)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        sessionize_stateful(stream, gap_us=gap)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.schema(
        "user_id long, start_us long, end_us long, n_events long, total_value double"
    ).parquet(out_dir)

    oracle = spark.sql(
        f"""
        WITH g AS (
          SELECT user_id, unix_micros(CAST(ts AS TIMESTAMP)) AS eus, value,
                 CASE WHEN unix_micros(CAST(ts AS TIMESTAMP))
                           - LAG(unix_micros(CAST(ts AS TIMESTAMP)))
                             OVER (PARTITION BY user_id ORDER BY ts, event_id) > {gap}
                           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS ns
          FROM events
        ),
        s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY eus
                                      ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        sess AS (
          SELECT user_id, sid, MIN(eus) AS start_us, MAX(eus) AS end_us,
                 CAST(COUNT(*) AS LONG) AS n_events, SUM(value) AS total_value
          FROM s GROUP BY user_id, sid
        )
        SELECT user_id, start_us, end_us, n_events, total_value FROM sess
        WHERE sid < (SELECT MAX(sid) FROM sess s2 WHERE s2.user_id = sess.user_id)
        """
    )
    a = sorted([(r[0], r[1], r[2], r[3], round(r[4], 6)) for r in got.collect()])
    b = sorted([(r[0], r[1], r[2], r[3], round(r[4], 6)) for r in oracle.collect()])
    assert a == b


def test_state_parallelism_scales_with_volume(spark):
    from lakehouse_plumber_spark.streaming import state_parallelism

    old = spark.conf.get("spark.sql.shuffle.partitions")
    with state_parallelism(spark, 100_000) as n:
        assert n == 8  # floor for tiny feeds
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    with state_parallelism(spark, 1_000_000_000) as n:
        assert n == int(old)  # capped at the session default
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
