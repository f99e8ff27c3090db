"""The shipped B15/B16 char-LM artifact: loads from disk, broadcast rides
into CharLMTextScorer, and fills missing text with corpus-statistics
decodes (the model-backed stand-in for the reference's CNN-RNN/TrOCR
decoders, eynollah_ocr.py:269-640)."""

import os

import numpy as np
import pandas as pd
import pytest

from eynollah_spark.scorer import CharLMTextScorer, load_char_lm

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "eynollah_spark", "models", "char_bigram_lm.npz")


@pytest.fixture(scope="module")
def lm():
    if not os.path.exists(WEIGHTS):
        pytest.skip("char_bigram_lm.npz not trained yet")
    return load_char_lm()


def test_char_lm_artifact_shape(lm):
    v = len(lm["alphabet"])
    assert v >= 20
    assert lm["logp"].shape == (v, v)
    assert np.allclose(np.exp(lm["logp"]).sum(axis=1), 1.0)


def test_fill_deterministic_and_corpus_like(lm):
    sc = CharLMTextScorer(weights=lm)
    pdf = pd.DataFrame({
        "doc_id": [f"doc{i}" for i in range(200)],
        "offset": list(range(200)),
        "kind": ["text"] * 200,
        "text": [None] * 200,
    })
    a = sc.fill_batch(pdf)
    b = sc.fill_batch(pdf)
    assert list(a) == list(b)
    assert len(set(a)) > 190  # per-span seeds -> essentially all distinct
    joined = " ".join(a)
    assert "\n" not in joined and "[ocr:" not in joined
    # corpus statistics: every char in the learned alphabet, word-like
    assert set(joined) <= set(lm["alphabet"]) | {" "}
    words = joined.split()
    assert 2.0 <= np.mean([len(w) for w in words]) <= 12.0


def test_fill_distributed_with_broadcast(spark, lm):
    from pyspark.sql import functions as F

    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.scorer import fill_missing_text

    flat = (corpus_flat_spark(spark, 40, partitions=4)
            .drop("expected_kind", "expected_rank")
            .withColumn("text", F.when(F.col("offset") % 7 == 0, F.lit(None))
                        .otherwise(F.col("text"))))
    bc = spark.sparkContext.broadcast(lm)
    out = fill_missing_text(flat, scorer=CharLMTextScorer(weights_broadcast=bc))
    got = out.filter((F.col("kind") == "text")).select("text").collect()
    assert all(r["text"] is not None for r in got)
    holes = out.filter((F.col("kind") == "text") & (F.col("offset") % 7 == 0))
    sample = [r["text"] for r in holes.limit(5).collect()]
    assert sample and all("[ocr:" not in t for t in sample)
