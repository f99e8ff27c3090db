"""Controlled-distance property tests for the near-dup family
(VERDICT r3 item 7): synthesize document/embedding pairs at KNOWN
Jaccard / Hamming / cosine distances and pin recall+precision bands per
operator, the way the layout kernel is property-tested. DuckDB executes
the registry oracle SQL (value-identical to the Spark plans — enforced
by the driver compare and tools/check_oracle.py), so these run in
milliseconds with no JVM.

Measured curves this pins (seeded, deterministic):
- MinHash(k=128, b=16, r=8) + exact-Jaccard filter: recall 1.0 at
  J>=0.81, ~0.45 at J~0.65 (theory 1-(1-J^8)^16), 0 below the J>=0.5
  output filter; zero false pairs.
- SimHash 60-bit, Hamming<=3: detects 1-token edits of 200-token docs
  at 1.0, degrades fast (by design — it is the near-EXACT tier next to
  MinHash), 0 at 20% rewrites; zero false pairs.
- Embedding LSH + exact-cosine>=0.9 filter: recall 1.0 at cos 0.95+,
  ~0.97 at 0.92, exact 0 below the 0.9 threshold; zero false pairs.
"""

import collections

import duckdb
import numpy as np
import pytest

from eynollah_spark.queries import registry


def _doc_pairs(rng, levels, n_pairs, n_tokens, scatter=True):
    """Pairs of docs where the second replaces a controlled fraction /
    count of tokens with fresh vocabulary — scattered positions
    (scatter=True: each edit kills ~3 shingles, the SimHash regime) or a
    contiguous suffix (scatter=False: true Jaccard ~ (n-m-2)/(n+m+2),
    the controlled-Jaccard regime). IDs dodge doc_id % 20 == 0 (the
    registry queries' own planted-copy harness)."""
    vocab = [f"w{i:06d}" for i in range(600000)]
    it = iter(rng.permutation(len(vocab)))
    rows, by_lv = [], collections.defaultdict(list)
    did = 1
    for lv in levels:
        m = int(round(lv * n_tokens)) if isinstance(lv, float) else lv
        for _ in range(n_pairs):
            toks = [vocab[next(it)] for _ in range(n_tokens)]
            toks2 = list(toks)
            pos = (rng.choice(n_tokens, size=m, replace=False) if scatter
                   else np.arange(n_tokens - m, n_tokens))
            for j in pos:
                toks2[j] = vocab[next(it)]
            a, b = did, did + 500000
            if a % 20 == 0:
                a += 1
            rows.append((a, " ".join(toks)))
            rows.append((b, " ".join(toks2)))
            sh = lambda t: {tuple(t[i:i + 3]) for i in range(len(t) - 2)}
            j_true = (len(sh(toks) & sh(toks2))
                      / max(len(sh(toks) | sh(toks2)), 1))
            by_lv[lv].append(((a, b), j_true))
            did += 2
    return rows, by_lv


def _docs_con(rows):
    c = duckdb.connect()
    c.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return c


@pytest.mark.parametrize("seed", [11, 202])
def test_minhash_jaccard_recall_precision_bands(seed):
    rng = np.random.default_rng(seed)
    # suffix-replacement fractions -> true 3-shingle Jaccard ~0.9/0.81/0.65/0.41
    levels = [0.05, 0.1, 0.2, 0.4]
    rows, by_lv = _doc_pairs(rng, levels, n_pairs=30, n_tokens=40,
                             scatter=False)
    con = _docs_con(rows)
    out = con.sql(registry()["dedup_ngram_jaccard"]["duck_sql"]).fetchall()
    got = {(a, b): j for a, b, _nb, j in out}
    planted = {p: j for lv in by_lv.values() for p, j in lv}

    def recall(pred):
        ps = [p for p, j in planted.items() if pred(j)]
        return np.mean([p in got for p in ps]), len(ps)

    r_high, n_high = recall(lambda j: j >= 0.8)
    assert n_high >= 50 and r_high >= 0.95, (r_high, n_high)
    r_low, n_low = recall(lambda j: j <= 0.45)
    assert n_low >= 25 and r_low == 0.0, (r_low, n_low)  # J>=0.5 filter exact
    # precision: reported Jaccard equals true Jaccard (to rounding) and
    # never dips below the filter; nothing non-planted appears
    for p, j_rep in got.items():
        assert p in planted, p
        assert j_rep >= 0.5
        assert abs(j_rep - planted[p]) < 5e-4, (p, j_rep, planted[p])


@pytest.mark.parametrize("seed", [5, 77])
def test_simhash_hamming_detection_bands(seed):
    rng = np.random.default_rng(seed)
    levels = [0, 1, 40]  # token edits of a 200-token doc
    rows, by_lv = _doc_pairs(rng, levels, n_pairs=30, n_tokens=200)
    con = _docs_con(rows)
    out = con.sql(registry()["dedup_simhash_neardup"]["duck_sql"]).fetchall()
    got = {(a, b): h for a, b, h in out}
    detect = {lv: np.mean([p in got for p, _ in by_lv[lv]]) for lv in levels}
    # near-exact tier: identical and 1-token-edited docs are caught...
    assert detect[0] == 1.0, detect
    assert detect[1] >= 0.8, detect  # measured 0.87-1.0 across seeds
    # ...and a 20% rewrite is OUT of its regime (MinHash's job instead)
    assert detect[40] <= 0.1, detect
    planted = {p for lv in by_lv.values() for p, _ in lv}
    assert set(got) <= planted  # zero false pairs
    assert all(h <= 3 for h in got.values())


@pytest.mark.parametrize("seed", [9, 31])
def test_embedding_neardup_cosine_bands(seed):
    rng = np.random.default_rng(seed)
    D, levels = 64, [0.98, 0.95, 0.85]
    rows, by_lv = [], collections.defaultdict(list)
    vid = 1

    def unit(v):
        return v / np.linalg.norm(v)

    for c_t in levels:
        for _ in range(40):
            v = unit(rng.normal(size=D))
            u = rng.normal(size=D)
            u = unit(u - (u @ v) * v)  # exact orthogonal complement
            w = c_t * v + np.sqrt(1 - c_t ** 2) * u  # cos(v, w) == c_t
            a, b = vid, vid + 500000
            if a % 10 == 0:
                a += 1  # dodge the query's own +0.002 planted copies
            rows.append((a, [float(x) for x in v]))
            rows.append((b, [float(x) for x in w]))
            by_lv[c_t].append((a, b))
            vid += 2
    con = duckdb.connect()
    con.sql("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    out = con.sql(registry()["dedup_embedding_neardup"]["duck_sql"]).fetchall()
    got = {(a, b): s for a, b, s in out}
    detect = {lv: np.mean([p in got for p in by_lv[lv]]) for lv in levels}
    # 6-table 4-bit LSH with Hamming-capped buckets: high-cosine planted
    # pairs survive bucketing, the exact >=0.9 filter zeroes the rest
    assert detect[0.98] >= 0.95, detect
    assert detect[0.95] >= 0.9, detect
    assert detect[0.85] == 0.0, detect
    base_pairs = {p for (p, s) in got.items()
                  if p[0] < 1000000 and p[1] < 1000000}
    planted = {p for lv in by_lv.values() for p in lv}
    assert base_pairs <= planted  # zero false base pairs
