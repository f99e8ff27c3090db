"""The shipped trained-weights artifact (r2 VERDICT item 3): weights load
from disk, ride a Spark broadcast into NumpyMLPScorer, and reproduce the
symbolic C12/C13 labels — the runnable stand-in for the reference's
pretrained region models (model_zoo/default_specs.py:10-252)."""

import numpy as np
import pandas as pd
import pytest

from eynollah_spark.corpus import gen_corpus_flat
from eynollah_spark.scorer import (
    HeuristicScorer,
    NumpyMLPScorer,
    _span_features,
    load_mlp_weights,
)


@pytest.fixture(scope="module")
def eval_pdf():
    flat, _ = gen_corpus_flat(400, start=9000)  # never seen in training
    pdf = pd.DataFrame({k: flat[k] for k in
                        ("doc_id", "kind", "x0", "x1", "y0", "y1",
                         "width", "height")})
    pdf = pdf[pdf["kind"] == "text"].reset_index(drop=True)
    med = (pdf.assign(h=np.maximum(pdf["y1"] - pdf["y0"], 1.0))
           .groupby("doc_id")["h"].median())
    pdf["ref_h"] = pdf["doc_id"].map(med).fillna(1.0)
    return pdf


def test_weights_load_from_disk():
    m = load_mlp_weights()
    assert m["W1"].shape[0] == 6 and m["W2"].shape[1] == 3
    assert np.isfinite(m["W1"]).all() and np.isfinite(m["W2"]).all()


def test_trained_model_matches_rule_labels(eval_pdf):
    """>= 99% agreement with the heuristic rules on held-out generated
    docs, and deterministic across calls."""
    rules = HeuristicScorer().score_batch(eval_pdf)
    want = np.zeros(len(eval_pdf), dtype=int)
    want[rules["p_heading"].to_numpy() >= 0.5] = 1
    want[rules["p_drop_capital"].to_numpy() >= 0.5] = 2

    model = NumpyMLPScorer(weights=load_mlp_weights())
    s1 = model.score_batch(eval_pdf)
    s2 = model.score_batch(eval_pdf)
    pd.testing.assert_frame_equal(s1, s2)
    got = np.column_stack([s1["p_text"], s1["p_heading"],
                           s1["p_drop_capital"]]).argmax(axis=1)
    agree = float((got == want).mean())
    assert agree >= 0.99, agree
    # headings specifically (the C12 surface the oracle checks)
    if (want == 1).any():
        assert float((got[want == 1] == 1).mean()) >= 0.99


def test_trained_model_detects_planted_drop_capitals(eval_pdf):
    """Planted C13-gate positives (tall-narrow, >=2.3x the doc's median
    line height) classify as drop-capital."""
    per_doc = eval_pdf.drop_duplicates("doc_id").head(50)
    rows = []
    for _, r in per_doc.iterrows():
        h = 3.0 * r["ref_h"]
        w = min(1.1 * h, 0.08 * r["width"])
        rows.append(("text", 0.1 * r["width"], 0.1 * r["width"] + w,
                     0.2 * r["height"], 0.2 * r["height"] + h,
                     r["width"], r["height"], r["ref_h"]))
    pdf = pd.DataFrame(rows, columns=["kind", "x0", "x1", "y0", "y1",
                                      "width", "height", "ref_h"])
    s = NumpyMLPScorer(weights=load_mlp_weights()).score_batch(pdf)
    got = np.column_stack([s["p_text"], s["p_heading"],
                           s["p_drop_capital"]]).argmax(axis=1)
    assert float((got == 2).mean()) >= 0.9, got


def test_weights_broadcast_through_refine_kinds(spark):
    """End-to-end: broadcast the disk artifact, run refine_kinds with the
    model-backed scorer distributed, compare against the heuristic path
    (>= 99% of rows identical kinds)."""
    from pyspark.sql import functions as F

    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.scorer import refine_kinds

    flat = (corpus_flat_spark(spark, 300, partitions=4)
            .drop("expected_kind", "expected_rank")
            .filter(F.col("offset") >= 0))
    bc = spark.sparkContext.broadcast(load_mlp_weights())
    model_out = refine_kinds(flat, scorer=NumpyMLPScorer(weights_broadcast=bc))
    heur_out = refine_kinds(flat)
    m = model_out.select("doc_id", "offset", F.col("kind").alias("mk"))
    h = heur_out.select("doc_id", "offset", F.col("kind").alias("hk"))
    j = m.join(h, ["doc_id", "offset"])
    total = j.count()
    same = j.filter(F.col("mk") == F.col("hk")).count()
    assert same / total >= 0.99, (same, total)
