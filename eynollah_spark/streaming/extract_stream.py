"""Incremental extraction over a growing documents directory.

The reference's incremental behavior is skip-if-output-exists per page
(eynollah.py:2074-2079); the streaming counterpart is a file-source
stream with exactly-once foreachBatch sinks: new document files landing
in the input directory are extracted exactly once, tracked by the
Structured Streaming checkpoint (complementing the batch manifest
resume in eynollah_spark.manifest).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


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
        out.write.mode("append").parquet(out_dir)

    w = (stream.writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
