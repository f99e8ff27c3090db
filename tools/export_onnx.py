"""Export the shipped region-kind MLP npz as a real .onnx artifact.

Run: python tools/export_onnx.py
Writes eynollah_spark/models/region_kind_mlp.onnx (Gemm->Relu->Gemm->
Softmax over the npz W1/b1/W2/b2), then round-trips it through the
numpy ONNX runtime and asserts equality with the npz inference path.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from eynollah_spark.onnx_numpy import load_onnx, run_graph, save_mlp_onnx
    from eynollah_spark.scorer import load_mlp_weights

    w = load_mlp_weights()
    out = os.path.join(REPO, "eynollah_spark", "models", "region_kind_mlp.onnx")
    save_mlp_onnx(w, out)

    # self-check: onnx graph == npz forward pass
    rng = np.random.default_rng(0)
    X = rng.normal(size=(256, w["W1"].shape[0])).astype(np.float32)
    hdn = np.maximum(X @ w["W1"] + w["b1"], 0.0)
    logits = hdn @ w["W2"] + w["b2"]
    z = logits - logits.max(axis=1, keepdims=True)
    ref = np.exp(z) / np.exp(z).sum(axis=1, keepdims=True)
    got = run_graph(load_onnx(out), X)
    err = float(np.abs(got - ref).max())
    assert err < 1e-5, err
    print(f"wrote {out} ({os.path.getsize(out)} bytes), max |err| {err:.2e}")


if __name__ == "__main__":
    main()
