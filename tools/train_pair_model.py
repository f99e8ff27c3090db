"""Train the B14 pairwise reading-order model offline and ship it in-repo.

The reference's machine reading order scores P(region j reads after
region i) with a CNN over rendered region-pair masks
(/root/reference/src/eynollah/eynollah.py:1634-1818, model
model_zoo/default_specs.py). The symbolic analogue: a tiny MLP over the
6 geometric pair features (mb_reading_order.MLPPairScorer.pair_features)
trained to reproduce the full-information comparator's decisions on
(a) region geometries actually produced by clustering corpus lines and
(b) synthetic pairs dense around the decision boundary (|cy_d| ~ 0.5h,
where the column bonus flips the order).

Pure-numpy SGD, deterministic; writes
eynollah_spark/models/pair_order_mlp.npz consumed by
MLPPairScorer(weights=...) / (weights_broadcast=...).

Run: python tools/train_pair_model.py [n_docs]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from eynollah_spark.corpus import gen_corpus_flat  # noqa: E402
from eynollah_spark.kernels.layout import cluster_lines_into_regions  # noqa: E402
from eynollah_spark.mb_reading_order import (  # noqa: E402
    HeuristicPairScorer,
    MLPPairScorer,
    order_regions_pairwise,
)

OUT = os.path.join(REPO, "eynollah_spark", "models", "pair_order_mlp.npz")


def doc_region_geoms(n_docs: int, start: int = 0) -> list[np.ndarray]:
    """Region (cx, cy, w, h) geometry per document, from the same
    line-clustering step machine_reading_order runs."""
    flat, _ = gen_corpus_flat(n_docs, start=start)
    mask = flat["kind"] == "text"
    doc = flat["doc_id"][mask]
    x0 = flat["x0"][mask].astype(float)
    x1 = flat["x1"][mask].astype(float)
    y0 = flat["y0"][mask].astype(float)
    y1 = flat["y1"][mask].astype(float)
    geoms = []
    for d in np.unique(doc):
        m = np.flatnonzero(doc == d)
        labels = cluster_lines_into_regions(x0[m], x1[m], y0[m], y1[m])
        uniq = np.unique(labels)
        g = np.empty((len(uniq), 4))
        for k, u in enumerate(uniq):
            mm = m[np.flatnonzero(labels == u)]
            g[k] = ((x0[mm].min() + x1[mm].max()) / 2.0,
                    (y0[mm].min() + y1[mm].max()) / 2.0,
                    x1[mm].max() - x0[mm].min(),
                    y1[mm].max() - y0[mm].min())
        if len(g) >= 2:
            geoms.append(g)
    return geoms


def pair_dataset(geoms: list[np.ndarray], seed: int = 11,
                 boundary_per_geom: int = 40):
    """All ordered pairs from real region geometries, plus synthetic
    pairs sampled densely around |cy_d| = 0.5*h (the comparator's
    column-bonus boundary). Labels = full-information comparator."""
    rng = np.random.default_rng(seed)
    hsc = HeuristicPairScorer()
    X_l, y_l = [], []
    for g in geoms:
        n = len(g)
        i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        m = i != j
        i, j = i[m], j[m]
        X_l.append(MLPPairScorer.pair_features(g, i, j))
        y_l.append((hsc.score(g, i, j) >= 0.5).astype(np.int64))
        # boundary-dense synthetic pairs in the same coordinate scale
        w = rng.uniform(g[:, 2].min(), g[:, 2].max() + 1, boundary_per_geom)
        h = rng.uniform(max(g[:, 3].min(), 4), g[:, 3].max() + 1,
                        boundary_per_geom)
        cx_i = rng.uniform(0, 1200, boundary_per_geom)
        cy_i = rng.uniform(0, 1600, boundary_per_geom)
        cy_d = rng.uniform(-1.2, 1.2, boundary_per_geom) * h
        cx_d = rng.uniform(-600, 600, boundary_per_geom)
        gg = np.stack([np.concatenate([cx_i, cx_i + cx_d]),
                       np.concatenate([cy_i, cy_i + cy_d]),
                       np.concatenate([w, w * rng.uniform(0.5, 2.0, len(w))]),
                       np.concatenate([h, h * rng.uniform(0.5, 2.0, len(h))])],
                      axis=1)
        ii = np.arange(boundary_per_geom)
        jj = ii + boundary_per_geom
        X_l.append(MLPPairScorer.pair_features(gg, ii, jj))
        y_l.append((hsc.score(gg, ii, jj) >= 0.5).astype(np.int64))
    return np.concatenate(X_l), np.concatenate(y_l)


def train(X, y, hidden=32, epochs=120, lr=0.3, seed=5):
    """Numpy logistic-output MLP; standardization folded into W1/b1 so
    the artifact drops into MLPPairScorer's raw-feature slots."""
    rng = np.random.default_rng(seed)
    mu = X.mean(axis=0)
    sd = np.maximum(X.std(axis=0), 1e-6)
    Xs = (X - mu) / sd
    n, d = Xs.shape
    W1 = rng.standard_normal((d, hidden)) * np.sqrt(2.0 / d)
    b1 = np.zeros(hidden)
    W2 = rng.standard_normal((hidden, 1)) * np.sqrt(2.0 / hidden)
    b2 = np.zeros(1)
    vW1 = np.zeros_like(W1); vb1 = np.zeros_like(b1)
    vW2 = np.zeros_like(W2); vb2 = np.zeros_like(b2)
    idx = np.arange(n)
    bs, mom = 4096, 0.9
    steps, total = 0, epochs * (n // bs + 1)
    for _ep in range(epochs):
        rng.shuffle(idx)
        for s in range(0, n, bs):
            cur = lr * 0.5 * (1 + np.cos(np.pi * steps / total))
            steps += 1
            b = idx[s:s + bs]
            Xb, yb = Xs[b], y[b]
            H = np.maximum(Xb @ W1 + b1, 0.0)
            z = np.clip((H @ W2 + b2).ravel(), -30.0, 30.0)
            p = 1.0 / (1.0 + np.exp(-z))
            g = (p - yb)[:, None] / len(yb)
            gW2 = H.T @ g; gb2 = g.sum(0)
            GH = (g @ W2.T) * (H > 0)
            gW1 = Xb.T @ GH; gb1 = GH.sum(0)
            vW2 = mom * vW2 - cur * gW2; W2 += vW2
            vb2 = mom * vb2 - cur * gb2; b2 += vb2
            vW1 = mom * vW1 - cur * gW1; W1 += vW1
            vb1 = mom * vb1 - cur * gb1; b1 += vb1
    W1f = W1 / sd[:, None]
    b1f = b1 - (mu / sd) @ W1
    return {"W1": W1f, "b1": b1f, "W2": W2, "b2": b2}


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    geoms = doc_region_geoms(n_docs)
    X, y = pair_dataset(geoms)
    print(f"train pairs: {len(X)}, positives {int(y.sum())}")
    m = train(X, y)
    # held-out pair agreement
    ge = doc_region_geoms(300, start=n_docs)
    Xe, ye = pair_dataset(ge, seed=99)
    sc = MLPPairScorer(weights=m)
    Hm = np.maximum(Xe @ m["W1"] + m["b1"], 0.0)
    pe = ((Hm @ m["W2"] + m["b2"]).ravel() >= 0.0).astype(np.int64)
    print(f"held-out pair agreement {float((pe == ye).mean()):.4f}")
    # end-to-end: full-order equality vs the comparator on held-out docs
    hsc = HeuristicPairScorer()
    same = sum(order_regions_pairwise(g, sc) == order_regions_pairwise(g, hsc)
               for g in ge)
    print(f"held-out full-order equality {same}/{len(ge)}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **m)
    print("wrote", OUT)


if __name__ == "__main__":
    main()


