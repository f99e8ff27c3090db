"""Failure quarantine: a pathological document degrades to offset order
instead of killing the job (fail_fast=False, the production mode used by
manifest.run_extraction — the scale replacement for the reference's
halt_fail global abort, eynollah.py:2023-2028)."""

import numpy as np
import pytest

import eynollah_spark.pipeline as pl
from eynollah_spark.kernels.layout import DocSpans


def _doc():
    return DocSpans(
        kind=np.array(["text", "text"], dtype=object),
        text=np.array(["a", "b"], dtype=object),
        media_ref=np.array([None, None], dtype=object),
        offset=np.array([1, 0], dtype=np.int64),
        x0=np.array([10.0, 10.0]), x1=np.array([500.0, 500.0]),
        y0=np.array([100.0, 10.0]), y1=np.array([130.0, 40.0]),
        width=600, height=400,
    )


def test_safe_permutation_falls_back(monkeypatch):
    def boom(d):
        raise ValueError("kernel bug")

    monkeypatch.setattr(pl, "layout_permutation", boom)
    perm, marg = pl._safe_permutation(_doc(), fail_fast=False)
    # degraded but total: input-offset order
    assert perm.tolist() == [1, 0] and not marg.any()
    with pytest.raises(ValueError):
        pl._safe_permutation(_doc(), fail_fast=True)


def test_quarantined_doc_does_not_poison_batch(monkeypatch, spark):
    from pyspark.sql import functions as F

    from eynollah_spark.corpus import corpus_flat_spark, expected_spark
    from eynollah_spark.pipeline import extract_flat_input

    flat = corpus_flat_spark(spark, 30, partitions=2).cache()
    # healthy pipeline in production mode must equal the oracle
    out = extract_flat_input(flat.drop("expected_kind", "expected_rank"),
                             partitions=2, fail_fast=False)
    exp = expected_spark(flat)
    j = out.alias("g").join(exp.alias("e"), ["doc_id", "ord"], "full_outer")
    bad = j.filter(F.col("g.offset") != F.col("e.offset")).count()
    flat.unpersist()
    assert bad == 0
