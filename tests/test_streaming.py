"""Streaming parity: the streaming operators must produce the batch
results when run with availableNow over the same events data (batch
query = the oracle)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from eynollah_spark.streaming import (
    hourly_event_counts,
    read_events_stream,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir():
    # file streaming sources need a directory
    d = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{SF_DIR}/events.parquet", f"{d}/part-0.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name):
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete" if name == "hourly" else "update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_hourly_window_stream_matches_batch(spark, events_dir):
    events_path = events_dir
    stream = read_events_stream(spark, events_path, max_files=10)
    q = _run_stream(hourly_event_counts(stream), "hourly")
    got = spark.table("hourly")
    batch = hourly_event_counts(spark.read.parquet(events_path))
    diff = got.exceptAll(batch).count() + batch.exceptAll(got).count()
    q.stop()
    assert diff == 0


def test_sessionize_stream_matches_batch_window(spark, events_dir):
    events_path = events_dir
    stream = read_events_stream(spark, events_path, max_files=10)
    q = _run_stream(sessionize_stream(stream), "sessions")
    # update mode: take the last emitted row per user
    got = (spark.table("sessions")
           .groupBy("user_id")
           .agg(F.max("n_sessions").alias("n_sessions"),
                F.max("n_events").alias("n_events")))
    ev = spark.read.parquet(events_path)
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    batch = (ev.withColumn("new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
             .groupBy("user_id")
             .agg(F.sum("new_s").alias("n_sessions"), F.count("*").alias("n_events")))
    diff = got.exceptAll(batch).count() + batch.exceptAll(got).count()
    q.stop()
    assert diff == 0


def test_dedup_stream_exactly_one_per_fingerprint(spark):
    """Streaming exact dedup drains a directory of document files and
    emits exactly one row per content fingerprint; batch twin agrees on
    the surviving fingerprint set."""
    import shutil
    import tempfile

    from eynollah_spark.streaming.windowed import dedup_stream

    base = tempfile.mkdtemp(prefix="dstream_")
    rows = []
    for i in range(60):
        rows.append({"doc_id": f"d{i}", "text": f"content {i % 20}",
                     "ts": f"2026-01-01 00:{i:02d}:00"})
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(f"{base}/in")

    schema = spark.read.parquet(f"{base}/in").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(f"{base}/in"))
    q = (dedup_stream(stream).writeStream
         .option("checkpointLocation", f"{base}/ckpt")
         .trigger(availableNow=True)
         .format("parquet").option("path", f"{base}/out").start())
    q.awaitTermination(180)

    got = spark.read.parquet(f"{base}/out")
    assert got.count() == 20  # one survivor per distinct content
    assert got.select("fp").distinct().count() == 20
    batch_fps = {r["fp"] for r in dedup_stream(
        spark.read.parquet(f"{base}/in")).select("fp").collect()}
    stream_fps = {r["fp"] for r in got.select("fp").collect()}
    assert batch_fps == stream_fps
    shutil.rmtree(base, ignore_errors=True)
