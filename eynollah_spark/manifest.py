"""Per-partition checkpointing with lineage manifests + idempotent resume.

North-rule requirement (BASELINE.json): the job checkpoints
per-partition with lineage manifests and span-count/region-histogram
metrics so any failed partition resumes idempotently. This replaces the
reference's skip-if-output-exists check (eynollah.py:2074-2079) with an
anti-join against a manifest table (SURVEY.md A4).

The unit of checkpointing is a *partition bucket*: part =
pmod(xxhash64(doc_id), n_parts). Each run processes the buckets absent
from the manifest, appends results parquet-partitioned by `part`, and
appends one manifest row per bucket with lineage + metrics. On Iceberg
this would be one snapshot per bucket (writeTo().overwritePartitions());
on plain parquet we emulate with directory partitions, which keeps the
same resume semantics.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from eynollah_spark import KERNEL_VERSION
from eynollah_spark.pipeline import extract


def _manifest_path(out_path: str) -> str:
    return os.path.join(out_path, "_manifests")


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True when an Iceberg catalog is wired into this session (the
    runtime jar is not shipped in this sandbox; on a real deployment set
    spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog)."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return impl is not None and "iceberg" in str(impl).lower()


def write_bucket_iceberg(out, table: str, create: bool = False) -> None:
    """North-star sink: one Iceberg snapshot per bucket batch via
    dynamic partition overwrite — `writeTo(t).overwritePartitions()`
    replaces exactly the `part` partitions present in `out`, which is
    the transactional equivalent of the parquet directory emulation
    below (same resume semantics, plus snapshot lineage/time travel).
    Callable only when iceberg_available(); this sandbox has no Iceberg
    runtime jar, so the path is exercised in production deployments
    only (run_extraction(..., iceberg_table=...) selects it)."""
    from pyspark.sql import functions as F

    if create:
        (out.writeTo(table).using("iceberg")
            .partitionedBy(F.col("part")).createOrReplace())
    else:
        out.writeTo(table).overwritePartitions()


def completed_parts(spark: SparkSession, out_path: str) -> set[int]:
    mp = _manifest_path(out_path)
    try:
        m = spark.read.json(mp)
        return {r["part"] for r in m.select("part").distinct().collect()}
    except Exception:
        return set()


def run_extraction(docs: DataFrame, out_path: str, n_parts: int = 8,
                   partitions: int | None = None, parts_per_batch: int = 4,
                   iceberg_table: str | None = None,
                   extract_kwargs: dict | None = None) -> dict:
    """Extract with per-bucket checkpointing; resumable.

    Returns summary metrics. Re-running after a failure skips buckets
    already recorded in the manifest (idempotent: bucket output is
    overwritten atomically per directory partition).

    iceberg_table: when set AND an Iceberg catalog is configured, bucket
    output goes through writeTo(table).overwritePartitions() — one
    snapshot per bucket batch (the BASELINE.json north-star sink); the
    parquet directory emulation below is the sandbox fallback with the
    same resume semantics.
    """
    spark = docs.sparkSession
    use_iceberg = iceberg_table is not None and iceberg_available(spark)
    docs = docs.withColumn("part", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int"))
    done = completed_parts(spark, out_path)
    todo = [p for p in range(n_parts) if p not in done]
    summary = {"n_parts": n_parts, "skipped": len(done), "processed": 0, "docs": 0, "spans": 0}
    os.makedirs(_manifest_path(out_path), exist_ok=True)
    for i in range(0, len(todo), parts_per_batch):
        batch = todo[i:i + parts_per_batch]
        t0 = time.time()
        sub = docs.filter(F.col("part").isin(batch))
        out = extract(sub.drop("part"), partitions=partitions, nested=False,
                      fail_fast=False, **(extract_kwargs or {}))
        out = out.withColumn("part", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int"))
        if use_iceberg:
            write_bucket_iceberg(out, iceberg_table, create=(i == 0 and not done))
        else:
            (out.write.mode("overwrite")
                .partitionBy("part")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(os.path.join(out_path, "out")))
        # lineage + metrics per bucket (span counts, kind histogram) —
        # computed from the parquet partitions just written, NOT by
        # re-aggregating the uncached `out` plan (which would re-run the
        # whole kernel stage a second time per batch); this also makes
        # the recorded metrics reflect the committed files.
        committed = (spark.table(iceberg_table) if use_iceberg
                     else spark.read.parquet(os.path.join(out_path, "out")))
        written = committed.filter(F.col("part").isin(batch))
        stats = (written.groupBy("part")
                 .agg(F.count("*").alias("spans"),
                      F.countDistinct("doc_id").alias("docs")))
        hist = (written.groupBy("part", "kind").count()
                .groupBy("part")
                .agg(F.to_json(F.map_from_entries(
                    F.collect_list(F.struct("kind", "count")))).alias("kind_hist")))
        rows = {r["part"]: r.asDict() for r in stats.join(hist, "part", "left").collect()}
        wall = time.time() - t0
        for p in batch:
            r = rows.get(p, {"spans": 0, "docs": 0, "kind_hist": "{}"})
            manifest = {
                "part": p, "kernel_version": KERNEL_VERSION,
                "docs": r["docs"], "spans": r["spans"],
                "kind_hist": r.get("kind_hist") or "{}",
                "wall_sec": round(wall / len(batch), 3),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            with open(os.path.join(_manifest_path(out_path), f"part-{p}.json"), "w") as f:
                f.write(json.dumps(manifest) + "\n")
            summary["processed"] += 1
            summary["docs"] += r["docs"]
            summary["spans"] += r["spans"]
    return summary
