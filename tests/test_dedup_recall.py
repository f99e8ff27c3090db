"""Statistical-strength guards for the dedup/ANN family (VERDICT r1:
the old 4-value MinHash had a high false-negative rate; these tests pin
planted-pair recall so a future regression of the signature scheme fails
loudly). DuckDB-side: the oracle SQL is value-identical to the Spark
plans (enforced separately by the driver/check_oracle), and DuckDB runs
in milliseconds — no JVM needed here."""

import duckdb
import pytest

from eynollah_spark.queries import registry

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _rows(con, name):
    return con.sql(registry()[name]["duck_sql"]).fetchall()


def test_minhash_sig_recall_on_planted_pairs(con):
    """Every 20th doc has a planted near-duplicate (first word dropped,
    Jaccard ~0.95+). k=128/b=16/r=8 banding must recover essentially all
    of them (expected per-band hit rate ~0.95^8≈0.66, miss-all-16-bands
    probability < 1e-7)."""
    pairs = {(a, b) for a, b, *_ in _rows(con, "dedup_ngram_jaccard")}
    n_docs = con.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    planted = {(d, d + 1000000) for d in range(0, n_docs, 20)}
    found = planted & pairs
    assert len(found) >= 0.95 * len(planted), (len(found), len(planted))


def test_ngram_jaccard_scores_planted_pairs(con):
    rows = _rows(con, "dedup_ngram_jaccard")
    planted = [row[-1] for row in rows if row[1] == row[0] + 1000000]
    assert len(planted) >= 20
    assert all(j >= 0.8 for j in planted)


def test_embedding_neardup_covers_planted_pairs(con):
    """VERDICT r1 item 3 'done' criterion: >= 20 matching pairs with
    nonzero rows (the old fixture passed on 0 == 0)."""
    rows = _rows(con, "dedup_embedding_neardup")
    planted = [(a, b) for a, b, s in rows if b == a + 1000000 and s >= 0.99]
    assert len(planted) >= 20
    # and no random pair sneaks past the 0.9 threshold on these tables
    assert all(b == a + 1000000 for a, b, _ in rows)


def test_simhash_neardup_finds_planted_pairs(con):
    rows = _rows(con, "dedup_simhash_neardup")
    assert len(rows) > 0
    planted = [(a, b) for a, b, h in rows if b == a + 1000000]
    assert len(planted) >= 10  # dropping one word flips few of 60 bits


def test_ann_recall_vs_exact_topk(con):
    """LSH-probed ANN top-5 vs brute-force top-5: the probed candidate
    set is deterministic; measure and pin a recall floor so a future
    hash-table change that collapses recall fails the suite."""
    exact = {(q, v) for q, _rk, v, _s in _rows(con, "sim_topk_cosine")}
    ann = {(q, v) for q, _rk, v, _s in _rows(con, "sim_ann_topk")}
    recall = len(exact & ann) / len(exact)
    # random unit vectors in 64-d are the WORST case for LSH (top-5
    # cosine only ~0.2-0.4, near-orthogonal); distance-1 multi-probe
    # over the 6x4-bit tables still recovers >=0.8 of the exact top-5
    # while probing a capped candidate slice (measured 0.96).
    assert recall >= 0.8, recall


def test_ann_recall_on_planted_clusters():
    """Realistic embedding geometry: each query vector gets 3 planted
    near-copies (cosine ~0.95+), mirroring how trained-encoder neighbors
    actually cluster. ANN must place the planted copies in the top-5 at
    near-perfect recall — this is the regime the operator ships for."""
    c = duckdb.connect()
    c.sql(f"CREATE VIEW base AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    c.sql("""
        CREATE VIEW embeddings AS
        SELECT vec_id, embedding FROM base
        UNION ALL
        SELECT b.vec_id + 10000 * k.k AS vec_id,
               list_transform(b.embedding, x -> CAST(x + 0.03 * k.k AS FLOAT)) AS embedding
        FROM base b CROSS JOIN (SELECT unnest(range(1, 4)) AS k) k
        WHERE b.vec_id < 5
    """)
    r = registry()
    exact = {(q, v) for q, _rk, v, _s in c.sql(r["sim_topk_cosine"]["duck_sql"]).fetchall()}
    ann = {(q, v) for q, _rk, v, _s in c.sql(r["sim_ann_topk"]["duck_sql"]).fetchall()}
    # sanity: the planted copies dominate the exact top-5
    planted_in_exact = {(q, v) for q, v in exact if v >= 10000}
    assert len(planted_in_exact) >= 12, planted_in_exact
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.95, recall


def test_ann_hot_bucket_saturation_degrades_gracefully():
    """VERDICT r4 item 8: plant a near-dup cluster LARGER than the
    probe-side cap and pin graceful degradation. 600 exact copies of
    query 0's vector land in its own bucket in every LSH table, pushing
    those buckets past _ANN_PROBE_CAP=512 — the capped probes are
    skipped (a hot bucket costs a skipped probe, never a linear scan),
    so: (a) no copy reaches query 0's top-5 through the saturated
    bucket, (b) query 0 still answers from its distance-1 probes,
    (c) the other queries' recall is untouched, and (d) the total
    candidate volume stays under the static probes×tables×cap bound."""
    from eynollah_spark.queries import (
        _ANN_PROBE_CAP,
        _LSH_BITS,
        _LSH_TABLES,
    )

    c = duckdb.connect()
    c.sql(f"CREATE VIEW base AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    c.sql("""
        CREATE VIEW embeddings AS
        SELECT vec_id, embedding FROM base
        UNION ALL
        SELECT 20000 + k.k AS vec_id, b.embedding
        FROM base b CROSS JOIN (SELECT unnest(range(0, 600)) AS k) k
        WHERE b.vec_id = 0
    """)
    r = registry()
    rows = c.sql(r["sim_ann_topk"]["duck_sql"]).fetchall()
    by_q = {}
    for q, _rk, v, _s in rows:
        by_q.setdefault(q, set()).add(v)
    # (a) the saturated bucket is skipped: none of the 600 sim=1.0
    # copies can reach query 0's list (they coexist with it ONLY in the
    # capped buckets), where an uncapped probe would fill all 5 slots
    assert all(v < 20000 for v in by_q.get(0, set())), by_q.get(0)
    # (b) query 0 still answers via distance-1 probes
    assert len(by_q.get(0, set())) > 0
    # (c) unaffected queries keep recall vs the exact top-5
    exact = {}
    for q, _rk, v, _s in c.sql(r["sim_topk_cosine"]["duck_sql"]).fetchall():
        exact.setdefault(q, set()).add(v)
    hits = sum(len(exact[q] & by_q.get(q, set())) for q in range(1, 5))
    total = sum(len(exact[q]) for q in range(1, 5))
    assert hits / total >= 0.8, (hits, total)
    # (d) candidate volume bounded by the static cap arithmetic
    head = r["sim_ann_topk"]["duck_sql"].split("scored AS")[0].rstrip().rstrip(",")
    n_cand = c.sql(head + "\nSELECT COUNT(*) AS n FROM cand").fetchone()[0]
    bound = 5 * (1 + _LSH_BITS) * _LSH_TABLES * _ANN_PROBE_CAP
    assert n_cand <= bound, (n_cand, bound)


def test_boilerplate_chunks_discriminate(con):
    """Sub-document boilerplate op must separate docs, not saturate: the
    corpus yields a spread of boilerplate fractions (mean ~0.5), with
    fractions strictly between 0 and 1 present."""
    rows = _rows(con, "dedup_boilerplate_chunks")
    fracs = [r[3] for r in rows]
    assert len(rows) >= 100
    assert 0.2 < sum(fracs) / len(fracs) < 0.8
    assert any(0.0 < f < 1.0 for f in fracs)


def test_events_funnel_monotone_and_discriminating(con):
    """Funnel counts must be monotone non-increasing and each step must
    actually filter (vacuous all-equal steps would mean the window rule
    never engaged)."""
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    rows = dict((s, n) for s, n in c.sql(
        registry()["events_funnel"]["duck_sql"]).fetchall())
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    assert rows["view"] > rows["view>click"] > rows["view>click>purchase"] >= 0
