"""Interchange sources/sinks beyond parquet: JSONL (the standard corpus
exchange format for training-data pipelines) and the PAGE-XML directory
protocol (see processor.py / pagexml.py).

Reference analogue: eynollah's dir_in scan accepts a directory of images
and a --dir_out (eynollah.py:1990-2075); here the corpus-scale input is
a table, so the source surface is a reader per format. All readers use
EXPLICIT schemas — schema inference is a full extra pass over 100 TB —
and quarantine corrupt records instead of aborting (the same
degrade-and-continue policy as the extraction kernel's fail_fast=False).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: nested documents shape (same as the parquet corpus: input_hint's
#: (doc_id, spans:array<struct<kind,text,media_ref,offset>>))
SPAN_STRUCT = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
    T.StructField("x0", T.IntegerType()),
    T.StructField("x1", T.IntegerType()),
    T.StructField("y0", T.IntegerType()),
    T.StructField("y1", T.IntegerType()),
])

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("rtl", T.BooleanType()),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    T.StructField("_corrupt_record", T.StringType()),
])


def documents_jsonl(spark: SparkSession, path: str,
                    quarantine: str | None = None) -> DataFrame:
    """Nested documents from JSONL. Explicit schema (no inference pass);
    malformed lines land in `_corrupt_record` and are dropped from the
    result — written to `quarantine` first when given, so a bad shard
    degrades instead of killing a 100 TB job."""
    df = (spark.read.schema(DOCS_SCHEMA)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path))
    bad = df.filter(F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull())
    if quarantine:
        bad.select("_corrupt_record").write.mode("overwrite").json(quarantine)
    return (df.filter(F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull())
            .drop("_corrupt_record"))


def flat_spans_jsonl(spark: SparkSession, path: str,
                     quarantine: str | None = None) -> DataFrame:
    """Flat span rows from nested JSONL documents: explode + struct
    expansion — the shape extract_flat_input consumes."""
    docs = documents_jsonl(spark, path, quarantine=quarantine)
    return (docs.select("doc_id", "width", "height", "rtl",
                        F.posexplode("spans").alias("_pos", "s"))
            .select("doc_id", "width", "height", "rtl",
                    "s.kind", "s.text", "s.media_ref", "s.offset",
                    "s.x0", "s.x1", "s.y0", "s.y1"))


def write_jsonl(out: DataFrame, path: str, partitions: int | None = None) -> None:
    """Ordered extraction output -> JSONL shards (one line per span row,
    stable within-file order via the canonical (doc_id, ord) sort)."""
    if partitions:
        out = out.repartition(partitions, "doc_id")
    out.sortWithinPartitions("doc_id", "ord").write.mode("overwrite").json(path)
