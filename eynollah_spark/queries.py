"""Named query registry for the driver contract (__spark_entry__.py).

Each entry maps a SURVEY.md §2 operator (or a training-data-pipeline op
from the build brief) to (a) a PySpark implementation over the
driver-generated tables in sf_dir and (b) an equivalent ANSI-SQL oracle
for DuckDB. Column names and float rounding are aligned so the driver's
order-insensitive value-hash matches.

Relational-skeleton queries (ro_*) run over a *synthesized lines table*
derived from `documents` with pure integer arithmetic — identical in
both dialects — so the window/join/agg semantics of the layout operators
(D1 row clustering, C16 containment join, C17 anti-join, C5 histogram,
C6 top-1 ranking, C11 marginal split, D2 splitters, D8 id formatting,
A4 resume) are oracle-checked even though the full XY-cut kernel itself
is non-SQL-expressible (those run as rows-only extract_* checks).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


# --------------------------------------------------------------------------
# synthesized lines/regions CTEs (integer arithmetic only -> exact parity)
# --------------------------------------------------------------------------

def _lines_cte(dialect: str) -> str:
    if dialect == "spark":
        gen = ("SELECT doc_id, explode(sequence(0, CAST(5 + doc_id % 20 AS INT) - 1)) "
               "AS line_id FROM documents")
        idiv = "DIV"
    else:
        gen = ("SELECT doc_id, unnest(range(0, CAST(5 + doc_id % 20 AS BIGINT))) "
               "AS line_id FROM documents")
        idiv = "//"
    return f"""
lines AS (
  SELECT doc_id, line_id,
         CAST(1 + doc_id % 3 AS INT)                                   AS ncols,
         CAST(line_id % (1 + doc_id % 3) AS INT)                       AS col,
         CAST(line_id {idiv} (1 + doc_id % 3) AS INT)                  AS row,
         CAST(100 + (line_id % (1 + doc_id % 3)) * 400
              + (doc_id*13 + line_id*7) % 50 AS INT)                   AS cx,
         CAST(80 + (line_id {idiv} (1 + doc_id % 3)) * 30
              + (doc_id*7 + line_id*11) % 9 AS INT)                    AS cy,
         CAST(18 + (doc_id + line_id) % 5 AS INT)                      AS h,
         CAST((doc_id*31 + line_id*17) % 100 AS DOUBLE) / 100          AS conf
  FROM ({gen})
)"""


def _regions_cte(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
regions AS (
  SELECT doc_id, col, row {idiv} 4 AS rrow,
         CAST(col*1000 + row {idiv} 4 AS INT)   AS region_id,
         MIN(cx) - 60 AS rx0, MAX(cx) + 60 AS rx1,
         MIN(cy) - 15 AS ry0, MAX(cy) + 15 AS ry1
  FROM lines GROUP BY doc_id, col, row {idiv} 4
)"""


# --------------------------------------------------------------------------
# registry: name -> dict(spark_sql | spark_fn, duck_sql | None, tables)
# --------------------------------------------------------------------------

_Q: dict[str, dict] = {}


def _sql_pair(name, tables, spark_sql, duck_sql):
    _Q[name] = {"tables": tables, "spark_sql": spark_sql, "duck_sql": duck_sql}


def _fn(name, tables, spark_fn, duck_sql=None):
    _Q[name] = {"tables": tables, "spark_fn": spark_fn, "duck_sql": duck_sql}


def _both(name, tables, body_of):
    """Same query text in both dialects, parameterized by dialect."""
    _sql_pair(name, tables, body_of("spark"), body_of("duck"))


# --- A. relational skeleton of the layout operators -------------------------

_both("ro_line_sort", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
clustered AS (
  SELECT doc_id, line_id, cx, cy,
         SUM(CASE WHEN prev_cy IS NULL OR cy - prev_cy > 12 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY cy, cx, line_id) AS row_cluster
  FROM (
    SELECT doc_id, line_id, cx, cy,
           LAG(cy) OVER (PARTITION BY doc_id ORDER BY cy, cx, line_id) AS prev_cy
    FROM lines)
)
SELECT doc_id, line_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY row_cluster, cx, line_id)
            AS INT) AS ord
FROM clustered
""")
# D1 (eynollah.py:891-944): lag + running sum row clustering, then
# (row, x) rank — the window-function form of the in-kernel line sort.

_both("ro_kind_histogram", ("documents",), lambda d: f"""
WITH {_lines_cte(d)}
SELECT CASE WHEN col = 0 THEN 'text' WHEN col = 1 THEN 'image' ELSE 'separator' END AS kind,
       COUNT(*) AS n
FROM lines GROUP BY 1
""")

_both("ro_containment_join", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
{_regions_cte(d)}
SELECT r.doc_id, r.region_id, COUNT(*) AS n_lines
FROM lines l JOIN regions r
  ON l.doc_id = r.doc_id AND l.cx BETWEEN r.rx0 AND r.rx1 AND l.cy BETWEEN r.ry0 AND r.ry1
GROUP BY r.doc_id, r.region_id
""")
# C16 (eynollah.py:946-980): textline->region assignment as a containment
# theta-join.

_both("ro_containment_antijoin", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
small AS (SELECT doc_id, line_id, cx, cy FROM lines WHERE h <= 19),
big   AS (SELECT doc_id, cx, cy, h FROM lines WHERE h >= 22)
SELECT s.doc_id, COUNT(*) AS n_survivors
FROM small s
WHERE NOT EXISTS (
  SELECT 1 FROM big b
  WHERE b.doc_id = s.doc_id
    AND s.cx BETWEEN b.cx - 40 AND b.cx + 40
    AND s.cy BETWEEN b.cy - 25 AND b.cy + 25)
GROUP BY s.doc_id
""")
# C17 (eynollah.py:1820-1887): drop small regions inside bigger ones ->
# anti-join semantics.

_both("ro_empty_region_drop", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
{_regions_cte(d)}
SELECT r.doc_id, r.region_id
FROM regions r JOIN lines l
  ON l.doc_id = r.doc_id AND l.cx BETWEEN r.rx0 AND r.rx1 AND l.cy BETWEEN r.ry0 AND r.ry1
GROUP BY r.doc_id, r.region_id
HAVING COUNT(*) >= 3
""")

_both("ro_marginalia_split", ("documents",), lambda d: f"""
WITH {_lines_cte(d)}
SELECT doc_id, line_id,
       CASE WHEN cx < 650 THEN 'L' ELSE 'R' END AS side,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY doc_id, CASE WHEN cx < 650 THEN 'L' ELSE 'R' END
         ORDER BY cy, cx, line_id) AS INT) AS side_rank
FROM lines
""")
# C11 (eynollah.py:1923-1947): split at midline, top-down rank per side.

_both("ro_column_histogram", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
hist AS (
  SELECT doc_id, CAST(cx / 100 AS INT) AS bucket, COUNT(*) AS n
  FROM lines GROUP BY doc_id, CAST(cx / 100 AS INT)
)
SELECT doc_id, bucket, n,
       ROUND(AVG(n) OVER (PARTITION BY doc_id ORDER BY bucket
                          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 3) AS smooth_n
FROM hist
""")
# C5 (utils/__init__.py:245-489): projection histogram + moving-average
# smoothing as groupBy(width_bucket) + window frame.

_both("ro_deskew_argmax", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
angles AS (
  SELECT {'explode(sequence(-5, 5))' if d == 'spark' else 'unnest(range(-5, 6))'} AS angle
),
scores AS (
  SELECT l.doc_id, a.angle,
         STDDEV_POP(l.cy * 10 + a.angle * l.cx) AS score
  FROM lines l CROSS JOIN angles a
  GROUP BY l.doc_id, a.angle
)
SELECT doc_id, CAST(angle AS INT) AS best_angle
FROM (SELECT doc_id, angle,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score ASC, angle ASC) AS rk
      FROM scores)
WHERE rk = 1
""")
# C6 (utils/separate_lines.py:1423-1470): angle grid cross-join, variance
# score per (doc, angle), top-1 per doc.

_both("ro_region_confidence", ("documents",), lambda d: f"""
WITH {_lines_cte(d)}
SELECT doc_id, col, ROUND(AVG(conf), 4) AS avg_conf, COUNT(*) AS n
FROM lines GROUP BY doc_id, col
""")
# C4 (utils/contour.py:211-224): mean confidence per region.

_both("ro_line_kind_classify", ("documents",), lambda d: f"""
WITH {_lines_cte(d)}
SELECT doc_id, line_id,
       CASE WHEN (doc_id + line_id*3) % 10 < 6 THEN 'horizontal'
            WHEN (doc_id + line_id*3) % 10 < 9 THEN 'vertical'
            ELSE 'other' END AS sep_class
FROM lines WHERE col = 2
""")
# C3 (utils/__init__.py:187-219): slope-threshold case expression.

_both("ro_splitter_candidates", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
seps AS (
  SELECT doc_id, line_id, cy, (doc_id*7 + line_id*13) % 900 + 100 AS sep_w
  FROM lines WHERE col = 0 AND row % 4 = 0
)
SELECT doc_id, line_id, cy,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cy, line_id) AS INT) AS splitter_idx
FROM seps WHERE sep_w >= 680
""")
# D2 (utils/__init__.py:1444-1457): full-width separators -> ordered
# splitter list.

_both("ro_reading_order_ids", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
ordd AS (
  SELECT doc_id, line_id,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cy, cx, line_id) AS ord
  FROM lines
)
SELECT doc_id, line_id,
       {'format_string' if d == 'spark' else 'printf'}('region_%04d', ord) AS region_ref
FROM ordd
""")
# D8 (utils/counter.py:3-48): serial id formatting in write order.

_both("ro_table_extend", ("documents",), lambda d: f"""
WITH {_lines_cte(d)},
tabs AS (
  SELECT doc_id, line_id AS tab_id,
         cx - 150 AS tx0, cx + 150 AS tx1, cy - 40 AS ty0, cy + 40 AS ty1
  FROM lines WHERE col = 1 AND row % 5 = 0
),
hsep AS (
  SELECT doc_id, cx - 200 AS sx0, cx + 200 AS sx1, cy + 15 AS sy
  FROM lines WHERE col = 0 AND row % 3 = 1
)
SELECT t.doc_id, t.tab_id,
       LEAST(t.ty0, COALESCE(MIN(s.sy), t.ty0)) AS new_y0,
       GREATEST(t.ty1, COALESCE(MAX(s.sy), t.ty1)) AS new_y1
FROM tabs t LEFT JOIN hsep s
  ON s.doc_id = t.doc_id
  AND LEAST(t.tx1, s.sx1) - GREATEST(t.tx0, s.sx0) >= 100
  AND s.sy BETWEEN t.ty0 - 60 AND t.ty1 + 60
GROUP BY t.doc_id, t.tab_id, t.ty0, t.ty1
""")
# C15 (eynollah.py:1336-1458): extend table y-range across crossing
# horizontal separators -> min/max extent aggregation over an overlap join.

_both("ro_resume_antijoin", ("documents",), lambda d: f"""
WITH manifest AS (SELECT doc_id FROM documents WHERE doc_id % 7 < 2)
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM manifest m WHERE m.doc_id = d.doc_id)
""")
# A4 (eynollah.py:2074-2079): skip-if-done as an anti-join against the
# checkpoint manifest.

# --- B. training-data text ops ----------------------------------------------

_both("dedup_exact", ("documents",), lambda d: f"""
SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_dupes
FROM documents GROUP BY md5(lower(trim(text)))
""")

def _tokens_cte(d):
    if d == "spark":
        return ("tokens AS (SELECT doc_id, pos + 1 AS pos, tok FROM (SELECT doc_id, "
                "posexplode(split(text, ' ')) AS (pos, tok) FROM documents))")
    return ("tokens AS (SELECT doc_id, "
            "unnest(generate_series(1, len(string_split(text, ' ')))) AS pos, "
            "unnest(string_split(text, ' ')) AS tok FROM documents)")


def _hash32(d, expr):
    """First 32 bits of md5(expr) as BIGINT — identical values in both
    dialects (the portable stand-in for xxhash64, which DuckDB lacks)."""
    if d == "spark":
        return f"CAST(conv(substr(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
    return f"CAST(CONCAT('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"


def _shingles_cte(d):
    # 3-word shingles via self-joined token offsets (portable, no arrays)
    return f"""{_tokens_cte(d)},
shingles AS (
  SELECT a.doc_id,
         {_hash32(d, "CONCAT(a.tok, ' ', b.tok, ' ', c.tok)")} AS sh
  FROM tokens a JOIN tokens b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
               JOIN tokens c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
)"""


_both("dedup_minhash_bands", ("documents",), lambda d: f"""
WITH {_shingles_cte(d)},
sig AS (
  SELECT doc_id, CAST(sh % 4 AS INT) AS band, MIN(sh) AS minhash
  FROM shingles GROUP BY doc_id, CAST(sh % 4 AS INT)
)
SELECT band, minhash, COUNT(*) AS n_docs
FROM sig GROUP BY band, minhash HAVING COUNT(*) >= 1
""")
# MinHash+LSH banding: shingle -> 32-bit hash -> per-band min -> bucket.

_both("dedup_ngram_jaccard", ("documents",), lambda d: f"""
WITH {_shingles_cte(d)},
ds AS (SELECT DISTINCT doc_id, sh FROM shingles),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.common AS DOUBLE) / (sa.n + sb.n - i.common), 4) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.common AS DOUBLE) / (sa.n + sb.n - i.common) >= 0.08
""")
# n-gram Jaccard near-dup: shared-shingle candidate pairs -> exact
# Jaccard over distinct shingle sets.

_both("dedup_simhash", ("documents",), lambda d: f"""
WITH {_tokens_cte(d)},
th AS (SELECT doc_id, {_hash32(d, 'tok')} AS hv FROM tokens),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN {'(hv >> b)' if d == 'duck' else 'shiftright(hv, CAST(b AS INT))'} % 2 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (
    SELECT {'unnest(range(0, 16))' if d == 'duck' else 'explode(sequence(0, 15))'} AS b) bb
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
""")
# SimHash: per-bit majority vote over token hashes -> 16-bit signature.

_both("text_quality_score", ("documents",), lambda d: f"""
SELECT doc_id,
       length(text) AS n_chars_measured,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_tokens,
       ROUND(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)
             / (length(text) + 1), 4) AS token_density,
       ROUND(CAST(length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', ''))
             AS DOUBLE) / (length(text) + 1), 4) AS punct_ratio,
       CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1 ELSE 0 END AS len_ok
FROM documents
""")

_both("text_lang_id", ("documents",), lambda d: f"""
WITH {_tokens_cte(d)},
votes AS (
  SELECT doc_id,
         SUM(CASE WHEN tok IN ('the','and','of','to','is','in','that','for') THEN 1 ELSE 0 END) AS en,
         SUM(CASE WHEN tok IN ('der','die','das','und','ist','ein','mit','zu') THEN 1 ELSE 0 END) AS de
  FROM tokens GROUP BY doc_id
)
SELECT doc_id, CASE WHEN de > en THEN 'de' WHEN en > de THEN 'en' ELSE 'und' END AS lang_guess
FROM votes
""")

_both("text_token_count", ("documents",), lambda d: f"""
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS ws_tokens,
       CAST(CEIL(length(text) / 4.0) AS INT) AS bpe_est
FROM documents
""")

_both("text_fingerprint", ("documents",), lambda d: f"""
WITH {_shingles_cte(d)}
SELECT doc_id, MIN(sh) AS fingerprint
FROM shingles GROUP BY doc_id
""")
# rolling-hash document fingerprint (winnowing min over shingle hashes).

# --- C. similarity search over embeddings ------------------------------------

def _sim_topk_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))
    j = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    j = j.withColumn("sim", dot / (nrm(F.col("v")) * nrm(F.col("qv"))))
    from pyspark.sql import Window as W
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (j.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
             .select("query_id", F.col("rk").cast("int").alias("rk"), "vec_id",
                     F.round("sim", 3).alias("sim")))

_fn("sim_topk_cosine", ("embeddings",), _sim_topk_spark, duck_sql="""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
j AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id
)
SELECT query_id, CAST(rk AS INT) AS rk, vec_id, ROUND(sim, 3) AS sim
FROM (SELECT query_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rk
      FROM j)
WHERE rk <= 5
""")
# brute-force cosine top-k (the ANN baseline; the LSH bucket variant
# below is the scale path).

def _lsh_expr_spark():
    return ("CAST(" + " + ".join(
        f"(CASE WHEN element_at(embedding, {i + 1}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(8)) + " AS INT)")

def _lsh_expr_duck():
    return ("CAST(" + " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(8)) + " AS INT)")

_sql_pair("sim_lsh_buckets", ("embeddings",),
          f"SELECT {_lsh_expr_spark()} AS bucket, COUNT(*) AS n FROM embeddings GROUP BY 1",
          f"SELECT {_lsh_expr_duck()} AS bucket, COUNT(*) AS n FROM embeddings GROUP BY 1")
# axis-aligned random-hyperplane LSH: sign bits of the first 8 dims.

def _emb_neardup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        F.expr(_lsh_expr_spark()).alias("bucket"))
    a = emb.alias("a")
    b = emb.alias("b")
    j = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
    dot = F.aggregate(F.zip_with("a.v", "b.v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))
    j = j.withColumn("sim", dot / (nrm(F.col("a.v")) * nrm(F.col("b.v"))))
    return (j.filter(F.col("sim") >= 0.6)
             .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
                     F.round("sim", 3).alias("sim")))

_fn("dedup_embedding_neardup", ("embeddings",), _emb_neardup_spark, duck_sql=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_lsh_expr_duck()} AS bucket FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.v, b.v), 3) AS sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.6
""")
# embedding-cosine near-dup dedup via LSH bucket candidates.

# --- D. core relational / events ---------------------------------------------

_both("tpch_q1_pricing", ("lineitem",), lambda d: """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")

_both("tpch_q3_topk", ("customer", "orders", "lineitem"), lambda d: """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""")

_both("join_region_nation_rollup", ("region", "nation", "customer"), lambda d: """
SELECT r.r_name, n.n_name, COUNT(*) AS n_cust,
       ROUND(SUM(c.c_acctbal), 2) AS sum_bal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name, n.n_name
""")

_both("events_hourly_window", ("events",), lambda d: """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type
""")
# the batch shape of the streaming tumbling-window aggregation (the
# streaming module runs the same plan over readStream).

_both("events_sessionize", ("events",), lambda d: """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR {delta} > 1800 THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM gaps GROUP BY user_id
""".format(delta=(
    "unix_timestamp(ts) - unix_timestamp(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))"
    if d == "spark" else
    "epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))")))
# session windows via lag + running-flag cumsum (the batch equivalent of
# the streaming sessionizer).

_both("tpch_q6_revenue_delta", ("lineitem",), lambda d: """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""")

_both("tpch_q4_semijoin", ("orders", "lineitem"), lambda d: """
SELECT o.o_orderpriority, COUNT(*) AS n
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_quantity > 45)
GROUP BY o.o_orderpriority
""")
# EXISTS -> left-semi join (the C17 semi-join shape on TPC-H data).

_both("rollup_region_nation", ("region", "nation", "customer"), lambda d: """
SELECT COALESCE(r.r_name, 'ALL') AS region, COALESCE(n.n_name, 'ALL') AS nation,
       COUNT(*) AS n_cust
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
""")

_both("string_ops_part_brands", ("part",), lambda d: """
SELECT upper(p_brand) AS brand,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT) AS brass,
       MIN(substr(p_name, 1, 6)) AS first_prefix
FROM part WHERE length(p_name) > 10
GROUP BY upper(p_brand)
""")

_both("union_high_value_parties", ("customer", "supplier"), lambda d: """
SELECT party_id, kind FROM (
  SELECT c_custkey AS party_id, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT s_suppkey AS party_id, 'supplier' AS kind FROM supplier WHERE s_acctbal > 9000
) t
""")

_both("events_topk_users", ("events",), lambda d: """
SELECT user_id, n FROM (
  SELECT user_id, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id ASC) AS rk
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
) t WHERE rk <= 20
""")

# --- E. the extraction engine itself (non-SQL-expressible: rows-only) --------

def _extract_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.pipeline import extract_flat_input

    n = max(200, int(100_000 * sf_of(sf_dir)))
    flat = corpus_flat_spark(spark, n).drop("expected_kind", "expected_rank")
    return extract_flat_input(flat)

_fn("extract_reading_order", (), _extract_corpus)

def _extract_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from eynollah_spark.corpus import corpus_flat_spark, nest_corpus

    n = max(200, int(100_000 * sf_of(sf_dir)))
    docs = nest_corpus(corpus_flat_spark(spark, n))
    return docs.select(
        "doc_id",
        F.expr("filter(spans, s -> s.kind = 'image')").alias("images"),
    ).filter(F.size("images") > 0).select(
        "doc_id", F.size("images").alias("n_images"))

_fn("extract_images_only", (), _extract_images)
# B17 (extract_images.py:24-281): image-only extraction = projection+filter.

def _extract_basic_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 (--skip_layout_and_reading_order, eynollah.py:2102-2148): whole
    page = one region; pure window-function ordering, no kernel."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from eynollah_spark.corpus import corpus_flat_spark

    n = max(200, int(100_000 * sf_of(sf_dir)))
    flat = corpus_flat_spark(spark, n).filter(F.col("kind") == "text")
    cy = ((F.col("y0") + F.col("y1")) / 2)
    cx = ((F.col("x0") + F.col("x1")) / 2)
    flat = flat.select("doc_id", "offset", cy.alias("cy"), cx.alias("cx"))
    w = W.partitionBy("doc_id").orderBy("cy", "cx", "offset")
    prev = F.lag("cy").over(w)
    flat = flat.withColumn(
        "row_cluster",
        F.sum(F.when(prev.isNull() | ((F.col("cy") - prev) > 14), 1).otherwise(0)).over(w))
    w2 = W.partitionBy("doc_id").orderBy("row_cluster", "cx", "offset")
    return flat.select("doc_id", "offset",
                       F.row_number().over(w2).cast("int").alias("ord"))

_fn("extract_basic_mode", (), _extract_basic_mode)

def _extract_machine_ro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 pairwise-model reading order (optional ML path) over the corpus."""
    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.mb_reading_order import machine_reading_order

    n = max(100, int(20_000 * sf_of(sf_dir)))
    return machine_reading_order(
        corpus_flat_spark(spark, n).drop("expected_kind", "expected_rank"))

_fn("extract_machine_reading_order", (), _extract_machine_ro)

def _extract_refine_headings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12/B12 heading refinement via the pluggable scorer."""
    from pyspark.sql import functions as F

    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.scorer import refine_kinds

    n = max(200, int(50_000 * sf_of(sf_dir)))
    flat = corpus_flat_spark(spark, n).drop("expected_kind", "expected_rank")
    return refine_kinds(flat).groupBy("kind").agg(F.count("*").alias("n"))

_fn("extract_refine_headings", (), _extract_refine_headings)

def _multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/embed plumbing over the synthetic media table."""
    from eynollah_spark.multimodal import decode_and_embed, synth_media_table

    n = max(64, int(10_000 * sf_of(sf_dir)))
    return decode_and_embed(synth_media_table(spark, n)).drop("embedding")

_fn("multimodal_decode_embed", (), _multimodal_decode)


# --------------------------------------------------------------------------

def registry():
    return _Q
