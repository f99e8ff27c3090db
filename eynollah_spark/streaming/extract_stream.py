"""Incremental extraction over a growing documents directory.

The reference's incremental behavior is skip-if-output-exists per page
(eynollah.py:2074-2079); the streaming counterpart is a file-source
stream with exactly-once foreachBatch sinks: new document files landing
in the input directory are extracted exactly once, tracked by the
Structured Streaming checkpoint (complementing the batch manifest
resume in eynollah_spark.manifest).

Exactly-once is achieved by making the sink idempotent per micro-batch:
output is partitioned by `batch_id` and written with dynamic partition
overwrite, so a batch replayed after a crash (between sink write and
checkpoint commit — foreachBatch alone is only at-least-once) overwrites
its own partition instead of duplicating rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F


def extract_stream(spark: SparkSession, in_dir: str, out_dir: str,
                   checkpoint: str, partitions: int | None = None,
                   nested_input: bool = True, available_now: bool = True):
    """Start (and with available_now=True, drain) the incremental
    extraction stream. Returns the StreamingQuery."""
    from eynollah_spark.pipeline import extract, extract_flat_input

    schema = spark.read.parquet(in_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 8).parquet(in_dir))

    def process(batch_df, batch_id):
        if nested_input:
            out = extract(batch_df, partitions=partitions, nested=False,
                          fail_fast=False)
        else:
            out = extract_flat_input(batch_df, partitions=partitions,
                                     fail_fast=False)
        # idempotent per-batch sink: replayed batch_id overwrites itself
        (out.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir))

    w = (stream.writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
