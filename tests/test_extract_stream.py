"""Incremental streaming extraction: files landing later are extracted
exactly once (checkpoint-tracked), and the cumulative output equals the
batch oracle."""

import shutil
import tempfile

from pyspark.sql import functions as F

from eynollah_spark.corpus import corpus_flat_spark, expected_spark, nest_corpus
from eynollah_spark.streaming.extract_stream import extract_stream


def test_incremental_extraction_exactly_once(spark):
    base = tempfile.mkdtemp(prefix="xstream_")
    in_dir, out_dir, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    flat = corpus_flat_spark(spark, 60, partitions=2).cache()
    docs = nest_corpus(flat).cache()
    half_a = docs.filter(F.xxhash64("doc_id") % 2 == 0)
    half_b = docs.exceptAll(half_a)

    # first file batch arrives
    half_a.write.mode("append").parquet(in_dir)
    q = extract_stream(spark, in_dir, out_dir, ckpt, partitions=4)
    q.awaitTermination(180)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # second batch lands later; only the new files are processed
    half_b.write.mode("append").parquet(in_dir)
    q = extract_stream(spark, in_dir, out_dir, ckpt, partitions=4)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    exp = expected_spark(flat)
    # exactly-once: no duplicates, full equality with the oracle
    j = got.alias("g").join(exp.alias("e"), ["doc_id", "ord"], "full_outer")
    bad = j.filter(
        F.col("g.offset").isNull() | F.col("e.offset").isNull()
        | (F.col("g.offset") != F.col("e.offset"))
        | (F.col("g.kind") != F.col("e.kind"))
    ).count()
    flat.unpersist()
    docs.unpersist()
    shutil.rmtree(base, ignore_errors=True)
    assert bad == 0
