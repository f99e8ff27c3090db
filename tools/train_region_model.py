"""Train the region-kind MLP offline and ship the artifact in-repo.

The reference ships pretrained CNN region models
(/root/reference/src/eynollah/model_zoo/default_specs.py:10-252) loaded
through a predictor (predictor.py:13-122). The symbolic analogue here: a
tiny MLP over the 6 span features (scorer._span_features) trained to
reproduce the C12 heading / C13 drop-capital labels that the symbolic
rules assign WITH full information (including the per-document median
line height, which the feature vector does not contain — so the model
has to learn a raster-free approximation, exactly like a CNN trained on
rendered pages approximates the rules' geometry).

Pure-numpy SGD (no TF/torch in this container); writes
eynollah_spark/models/region_kind_mlp.npz consumed by
scorer.load_mlp_weights -> NumpyMLPScorer. Deterministic (fixed seed).

Run: python tools/train_region_model.py [n_docs]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from eynollah_spark.corpus import gen_corpus_flat  # noqa: E402
from eynollah_spark.scorer import HeuristicScorer, _span_features  # noqa: E402

OUT = os.path.join(REPO, "eynollah_spark", "models", "region_kind_mlp.npz")


def labeled_spans(n_docs: int, start: int = 0, plant_drops: bool = True):
    """Text spans with rule labels (0=text, 1=heading, 2=drop-capital),
    labels computed with the relational per-doc median (full info).

    The corpus generator emits no drop capitals, so training plants them:
    per sampled doc, tall-narrow spans satisfying the C13 gates (h >=
    2.2*ref_h, w <= 1.6h, w <= 0.12W) plus near-miss negatives just under
    the gates — the decision boundary the model must learn."""
    flat, _ = gen_corpus_flat(n_docs, start=start)
    pdf = pd.DataFrame({k: flat[k] for k in
                        ("doc_id", "kind", "x0", "x1", "y0", "y1",
                         "width", "height")})
    pdf = pdf[pdf["kind"] == "text"].reset_index(drop=True)
    med = (pdf.assign(h=np.maximum(pdf["y1"] - pdf["y0"], 1.0))
           .groupby("doc_id")["h"].median())
    pdf["ref_h"] = pdf["doc_id"].map(med).fillna(1.0)
    if plant_drops:
        rng = np.random.default_rng(start + 1)
        per_doc = pdf.drop_duplicates("doc_id")[
            ["doc_id", "width", "height", "ref_h"]]
        rows = []
        for _, r in per_doc.iterrows():
            for _k in range(3):
                pos = rng.random() < 0.5  # half positives, half near-miss
                f = rng.uniform(2.3, 4.5) if pos else rng.uniform(1.2, 2.05)
                h = f * r["ref_h"]
                w = min(rng.uniform(0.5, 1.5) * h,
                        (0.9 if pos else 1.6) * 0.12 * r["width"])
                x0 = rng.uniform(0.05, 0.7) * r["width"]
                y0 = rng.uniform(0.05, 0.8) * r["height"]
                rows.append((r["doc_id"], "text", x0, x0 + w, y0, y0 + h,
                             r["width"], r["height"], r["ref_h"]))
        planted = pd.DataFrame(rows, columns=list(pdf.columns))
        pdf = pd.concat([pdf, planted], ignore_index=True)
    scores = HeuristicScorer().score_batch(pdf)
    y = np.zeros(len(pdf), dtype=np.int64)
    y[scores["p_heading"].to_numpy() >= 0.5] = 1
    y[scores["p_drop_capital"].to_numpy() >= 0.5] = 2
    return _span_features(pdf), y


def train(X, y, hidden=48, epochs=200, lr=0.2, seed=7):
    """Plain-numpy MLP with momentum + cosine lr decay. Feature
    standardization is FOLDED INTO W1/b1 after training so the shipped
    artifact drops into NumpyMLPScorer's raw-feature slots unchanged."""
    rng = np.random.default_rng(seed)
    mu = X.mean(axis=0)
    sd = np.maximum(X.std(axis=0), 1e-6)
    Xs = (X - mu) / sd
    n, d = Xs.shape
    k = 3
    cw = n / (3.0 * np.maximum(np.bincount(y, minlength=k), 1))
    cw = np.minimum(cw, 20.0)
    W1 = rng.standard_normal((d, hidden)) * np.sqrt(2.0 / d)
    b1 = np.zeros(hidden)
    W2 = rng.standard_normal((hidden, k)) * np.sqrt(2.0 / hidden)
    b2 = np.zeros(k)
    vW1 = np.zeros_like(W1); vb1 = np.zeros_like(b1)
    vW2 = np.zeros_like(W2); vb2 = np.zeros_like(b2)
    idx = np.arange(n)
    bs = 4096
    mom = 0.9
    steps = 0
    total = epochs * (n // bs + 1)
    for ep in range(epochs):
        rng.shuffle(idx)
        for s in range(0, n, bs):
            cur = lr * 0.5 * (1 + np.cos(np.pi * steps / total))
            steps += 1
            b = idx[s:s + bs]
            Xb, yb = Xs[b], y[b]
            H = np.maximum(Xb @ W1 + b1, 0.0)
            Z = H @ W2 + b2
            Z -= Z.max(axis=1, keepdims=True)
            P = np.exp(Z)
            P /= P.sum(axis=1, keepdims=True)
            G = P.copy()
            G[np.arange(len(yb)), yb] -= 1.0
            G *= cw[yb][:, None] / len(yb)
            gW2 = H.T @ G; gb2 = G.sum(0)
            GH = (G @ W2.T) * (H > 0)
            gW1 = Xb.T @ GH; gb1 = GH.sum(0)
            vW2 = mom * vW2 - cur * gW2; W2 += vW2
            vb2 = mom * vb2 - cur * gb2; b2 += vb2
            vW1 = mom * vW1 - cur * gW1; W1 += vW1
            vb1 = mom * vb1 - cur * gb1; b1 += vb1
    # fold standardization: H = (x - mu)/sd @ W1 + b1 = x @ (W1/sd) + (b1 - mu/sd @ W1)
    W1f = W1 / sd[:, None]
    b1f = b1 - (mu / sd) @ W1
    return {"W1": W1f, "b1": b1f, "W2": W2, "b2": b2}


def evaluate(m, X, y):
    H = np.maximum(X @ m["W1"] + m["b1"], 0.0)
    pred = (H @ m["W2"] + m["b2"]).argmax(axis=1)
    acc = float((pred == y).mean())
    per = {c: float((pred[y == c] == c).mean()) if (y == c).any() else 1.0
           for c in range(3)}
    return acc, per


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    X, y = labeled_spans(n_docs)
    Xe, ye = labeled_spans(500, start=n_docs)  # held-out docs
    print(f"train spans: {len(X)}, label counts {np.bincount(y, minlength=3)}")
    m = train(X, y)
    acc, per = evaluate(m, Xe, ye)
    print(f"held-out acc {acc:.4f}, per-class recall {per}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **m)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
