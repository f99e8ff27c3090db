"""Checkpoint/lineage integration (r2 VERDICT item 4, sandbox scope).

The Iceberg runtime jar is a public Maven artifact
(org.apache.iceberg:iceberg-spark-runtime) but CANNOT enter this sandbox:
the container has no network access and ships no Iceberg jar (verified:
no *iceberg* file on disk, repo1.maven.org unreachable). The
write_bucket_iceberg path therefore stays catalog-gated; what CAN be
integration-tested here is everything around it — the gate itself, the
snapshot-per-batch parquet emulation, manifest lineage read-back, and
idempotent resume."""

import json
import os

import pytest
from pyspark.sql import functions as F

from eynollah_spark.corpus import corpus_flat_spark, nest_corpus
from eynollah_spark.manifest import (
    completed_parts,
    iceberg_available,
    run_extraction,
)


def test_iceberg_gate_is_off_in_sandbox(spark):
    assert not iceberg_available(spark)


def test_iceberg_table_request_falls_back_gracefully(spark, tmp_path):
    """Asking for an Iceberg sink without a catalog must not crash —
    the run degrades to the parquet emulation with identical resume
    semantics (documented sandbox limitation)."""
    docs = nest_corpus(corpus_flat_spark(spark, 30, partitions=2))
    s = run_extraction(docs, str(tmp_path / "o"), n_parts=2,
                       partitions=2, iceberg_table="nosuch.catalog.table")
    assert s["processed"] == 2 and s["docs"] > 0


def test_manifest_lineage_and_resume(spark, tmp_path):
    """Snapshot-per-batch emulation: each bucket's manifest records
    lineage (kernel version, ts) + metrics (docs, spans, kind histogram)
    computed from the COMMITTED files; a re-run skips completed buckets;
    metrics reconcile with the written table exactly."""
    out = str(tmp_path / "out")
    docs = nest_corpus(corpus_flat_spark(spark, 60, partitions=2))
    s1 = run_extraction(docs, out, n_parts=4, partitions=2, parts_per_batch=2)
    assert s1["processed"] == 4 and s1["skipped"] == 0
    assert completed_parts(spark, out) == {0, 1, 2, 3}

    # lineage + metrics reconcile with committed data
    written = spark.read.parquet(os.path.join(out, "out"))
    per_part = {r["part"]: (r["docs"], r["spans"]) for r in
                written.groupBy("part")
                .agg(F.countDistinct("doc_id").alias("docs"),
                     F.count("*").alias("spans")).collect()}
    for p in range(4):
        with open(os.path.join(out, "_manifests", f"part-{p}.json")) as f:
            m = json.loads(f.read())
        assert m["kernel_version"]
        assert (m["docs"], m["spans"]) == per_part.get(p, (0, 0))
        hist = json.loads(m["kind_hist"])
        assert sum(hist.values()) == m["spans"]

    # idempotent resume: nothing left to do
    s2 = run_extraction(docs, out, n_parts=4, partitions=2)
    assert s2["processed"] == 0 and s2["skipped"] == 4

    # partial resume: drop one bucket's manifest -> exactly one reprocessed,
    # and the committed table is unchanged afterwards (overwrite idempotent)
    before = written.count()
    os.remove(os.path.join(out, "_manifests", "part-2.json"))
    s3 = run_extraction(docs, out, n_parts=4, partitions=2)
    assert s3["processed"] == 1 and s3["skipped"] == 3
    assert spark.read.parquet(os.path.join(out, "out")).count() == before
