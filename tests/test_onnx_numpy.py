"""VERDICT r3 item 5: the shipped MLP as a REAL .onnx file, executed by
the in-repo numpy graph walker behind OnnxScorer — the interchange-format
"drop in a real model" path, demonstrated end-to-end distributed."""

import os

import numpy as np
import pandas as pd
import pytest

from eynollah_spark.onnx_numpy import load_onnx, run_graph, save_mlp_onnx
from eynollah_spark.scorer import NumpyMLPScorer, OnnxScorer, load_mlp_weights

ONNX_PATH = os.path.join(os.path.dirname(__file__), "..",
                         "eynollah_spark", "models", "region_kind_mlp.onnx")


def test_onnx_artifact_on_disk_roundtrips():
    g = load_onnx(ONNX_PATH)
    assert [n["op"] for n in g["nodes"]] == ["Gemm", "Relu", "Gemm", "Softmax"]
    assert set(g["initializers"]) == {"W1", "b1", "W2", "b2"}
    w = load_mlp_weights()
    np.testing.assert_allclose(g["initializers"]["W1"],
                               w["W1"].astype(np.float32), rtol=1e-6)


def test_writer_reader_fuzz_roundtrip():
    rng = np.random.default_rng(3)
    for trial in range(5):
        w = {"W1": rng.normal(size=(6, 8 + trial)),
             "b1": rng.normal(size=8 + trial),
             "W2": rng.normal(size=(8 + trial, 3)),
             "b2": rng.normal(size=3)}
        path = f"/tmp/onnx_fuzz_{trial}.onnx"
        save_mlp_onnx(w, path)
        g = load_onnx(path)
        X = rng.normal(size=(64, 6)).astype(np.float32)
        hdn = np.maximum(X @ w["W1"].astype(np.float32) + w["b1"].astype(np.float32), 0.0)
        logits = hdn @ w["W2"].astype(np.float32) + w["b2"].astype(np.float32)
        z = logits - logits.max(axis=1, keepdims=True)
        ref = np.exp(z) / np.exp(z).sum(axis=1, keepdims=True)
        np.testing.assert_allclose(run_graph(g, X), ref, atol=1e-5)
        os.unlink(path)


def test_onnx_scorer_equals_npz_scorer_batch():
    from eynollah_spark.corpus import gen_corpus_flat

    flat, _ = gen_corpus_flat(200, start=5000)
    pdf = pd.DataFrame({k: flat[k] for k in
                        ("doc_id", "kind", "x0", "x1", "y0", "y1",
                         "width", "height")})
    with open(ONNX_PATH, "rb") as f:
        onnx_bytes = f.read()
    a = OnnxScorer(model_bytes=onnx_bytes).score_batch(pdf)
    b = NumpyMLPScorer(weights=load_mlp_weights()).score_batch(pdf)
    # float32 graph vs float64 npz math: near-tie logits can move a prob
    # visibly, so assert on the DECISIONS (what refine_kinds consumes)
    ka = a.to_numpy().argmax(axis=1)
    kb = b.to_numpy().argmax(axis=1)
    assert float((ka == kb).mean()) >= 0.995, float((ka == kb).mean())
    # and bulk probabilities still agree
    close = np.isclose(a.to_numpy(), b.to_numpy(), atol=1e-3).mean()
    assert close >= 0.98, close


def test_onnx_broadcast_through_refine_kinds(spark):
    """Load the .onnx from disk, broadcast the bytes, run refine_kinds
    distributed — output kinds equal the NumpyMLPScorer path row for row."""
    from pyspark.sql import functions as F

    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.scorer import refine_kinds

    flat = (corpus_flat_spark(spark, 200, partitions=4)
            .drop("expected_kind", "expected_rank")
            .filter(F.col("offset") >= 0))
    with open(ONNX_PATH, "rb") as f:
        bc = spark.sparkContext.broadcast(f.read())
    wbc = spark.sparkContext.broadcast(load_mlp_weights())
    onnx_out = refine_kinds(flat, scorer=OnnxScorer(model_bytes_broadcast=bc))
    npz_out = refine_kinds(flat, scorer=NumpyMLPScorer(weights_broadcast=wbc))
    o = onnx_out.select("doc_id", "offset", F.col("kind").alias("ok"))
    z = npz_out.select("doc_id", "offset", F.col("kind").alias("zk"))
    j = o.join(z, ["doc_id", "offset"])
    total = j.count()
    assert total > 0
    same = j.filter(F.col("ok") == F.col("zk")).count()
    # float32 onnx vs float64 npz: rows with p_heading at the 0.5
    # boundary may flip; bulk agreement must hold
    assert same / total >= 0.995, (same, total)
