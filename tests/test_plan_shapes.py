"""Plan-shape regression gates: the physical-plan properties the 100TB
design depends on (SURVEY.md §4 'what Catalyst gives us for free' must
actually be happening)."""

from pyspark.sql import functions as F

from eynollah_spark.queries import load_views

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    load_views(spark, SF_DIR, "lineitem")
    q = spark.sql("""
        SELECT l_orderkey, l_quantity FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 30
    """)
    p = _plan(q)
    # toString truncates long filter lists — presence of the pushed-filter
    # section with a concrete filter is the gate
    assert "PushedFilters: [IsNotNull" in p
    assert "l_extendedprice" not in p  # column pruning reached the scan


def test_small_dim_join_broadcasts(spark):
    load_views(spark, SF_DIR, "customer", "nation", "region")
    j = (spark.table("customer")
         .join(spark.table("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
         .join(spark.table("region"), F.col("n_regionkey") == F.col("r_regionkey"))
         .groupBy("r_name").count())
    assert "BroadcastHashJoin" in _plan(j)


def test_extraction_plan_has_single_shuffle(spark):
    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.pipeline import extract_flat_input

    flat = corpus_flat_spark(spark, 50)
    out = extract_flat_input(flat.drop("expected_kind", "expected_rank"), partitions=4)
    p = _plan(out)
    # corpus generation feeds one repartition exchange into the kernel;
    # any additional exchange would betray an accidental extra shuffle
    assert p.count("Exchange") <= 2
    assert "MapInArrow" in p or "ArrowEvalPython" in p or "MapInPandas" in p


def test_whole_stage_codegen_active(spark):
    load_views(spark, SF_DIR, "lineitem")
    # aggregations sit under AdaptiveSparkPlan pre-execution; the stable
    # codegen witness is the scan+filter stage
    q = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 30")
    assert "*(" in _plan(q)  # Spark marks codegen'd stages with *(n)
