"""Streaming operators over the events stream.

`hourly_event_counts` is the streaming twin of the batch
`events_hourly_window` query (same output schema, so batch output is the
oracle for the availableNow run). `sessionize_stream` is a custom
stateful operator via applyInPandasWithState — the engine's example of a
semantics Spark lacks built-in (gap-based session windows with per-user
state), kept Arrow-batched per the no-per-row-Python rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def read_events_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """Stream the events parquet directory (schema inferred from a batch
    peek — streaming sources need an explicit schema)."""
    schema = spark.read.parquet(path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files).parquet(path))


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window x event_type counts/sums with late-data
    watermark. Works on both batch and streaming DataFrames (same plan —
    that is the point of declaring it via window())."""
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # cast is value-preserving
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value"))


_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])
_SESSION_STATE = StructType([
    StructField("last_epoch", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])

SESSION_GAP_SEC = 1800


def _session_fn(key, pdf_iter, state: GroupState):
    import pandas as pd

    if state.exists:
        last_epoch, n_sessions, n_events = state.get
    else:
        last_epoch, n_sessions, n_events = None, 0, 0
    for pdf in pdf_iter:
        epochs = (pdf["ts"].astype("int64") // 1_000_000_000).sort_values().tolist()
        for e in epochs:
            if last_epoch is None or e - last_epoch > SESSION_GAP_SEC:
                n_sessions += 1
            last_epoch = e
            n_events += 1
    state.update((last_epoch, n_sessions, n_events))
    yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions],
                        "n_events": [n_events]})


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Gap-based session counting with explicit per-user state
    (applyInPandasWithState). Matches the batch `events_sessionize`
    query when the stream is processed in timestamp order."""
    return (events.select("user_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn,
                outputStructType=_SESSION_OUT,
                stateStructType=_SESSION_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def dedup_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the first-seen document per content
    fingerprint (md5 of normalized text). Works on both batch and
    streaming inputs (same plan); on a stream the watermark bounds the
    dedup state — duplicates arriving later than the watermark are the
    documented at-scale trade-off (exact global dedup needs the batch
    `dedup_exact` pass). Input needs (doc_id, text, ts)."""
    df = docs.withColumn("fp", F.md5(F.lower(F.trim(F.col("text")))))
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
        return df.dropDuplicatesWithinWatermark(["fp"])
    # batch fallback: deterministic keeper (earliest ts, doc_id tiebreak),
    # matching the stream's first-seen semantics — dropDuplicates keeps a
    # partition-order-dependent arbitrary row, which flakes batch/stream
    # survivor-set parity comparisons.
    from pyspark.sql import Window as W
    w = W.partitionBy("fp").orderBy(F.col("ts"), F.col("doc_id"))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
