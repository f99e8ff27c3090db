"""B14 machine-based reading order: the pairwise partition loop + the
heuristic pair scorer must reproduce reading order on simple layouts
(the reference's own machine-RO test asserts an exact sequence on the
single-column kant page, tests/cli_tests/test_mbreorder.py:29)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from eynollah_spark.mb_reading_order import (
    HeuristicPairScorer,
    machine_reading_order,
    order_regions_pairwise,
)


def test_partition_loop_orders_rows():
    # 5 regions stacked vertically, shuffled input -> top-down order
    cy = np.array([500.0, 100.0, 900.0, 300.0, 700.0])
    geom = np.stack([np.full(5, 400.0), cy, np.full(5, 600.0), np.full(5, 80.0)], axis=1)
    order = order_regions_pairwise(geom)
    assert cy[order].tolist() == sorted(cy.tolist())


def test_partition_loop_row_major_two_columns():
    # two side-by-side regions then one below: L, R, bottom
    geom = np.array([
        [800.0, 100.0, 300.0, 80.0],   # right, top row
        [200.0, 110.0, 300.0, 80.0],   # left, top row
        [500.0, 400.0, 900.0, 80.0],   # full-width below
    ])
    order = order_regions_pairwise(geom)
    assert order == [1, 0, 2]


def test_machine_ro_matches_oracle_on_single_column(spark):
    from eynollah_spark.corpus import corpus_flat_spark, expected_spark

    # single-column letters only (bucket < 40, unskewed): machine RO must
    # equal the XY-cut expected order on text spans
    flat = corpus_flat_spark(spark, 40, partitions=4).filter(
        (F.col("doc_id").substr(-2, 2).cast("int") % 100 < 40)
        & (F.col("doc_id").substr(-2, 2).cast("int") % 5 != 3)
    ).cache()
    got = machine_reading_order(flat)
    exp = (expected_spark(flat).filter(F.col("kind") == "text")
           .withColumn("ord2", F.row_number().over(
               __import__("pyspark.sql.window", fromlist=["Window"]).Window
               .partitionBy("doc_id").orderBy("ord")) - 1)
           .select("doc_id", F.col("ord2").alias("ord"), "offset"))
    diff = got.exceptAll(exp).count() + exp.exceptAll(got).count()
    flat.unpersist()
    assert diff == 0


def test_dilated_grouping_caps_pairwise_batches():
    """r2 VERDICT item 8: pages with many regions group into super-regions
    first (eynollah.py:1661-1722 dilation pre-step), so the pairwise loop
    runs over k supers, not n regions — bounded scorer batches on
    pathological pages. Expansion by cy must preserve the column order."""
    import numpy as np

    from eynollah_spark.mb_reading_order import (
        HeuristicPairScorer,
        order_regions_grouped,
        order_regions_pairwise,
    )

    class CountingScorer(HeuristicPairScorer):
        calls = 0

        def score(self, geom, i, j, rtl=False):
            CountingScorer.calls += 1
            return super().score(geom, i, j, rtl=rtl)

    # 2 columns x 20 stacked same-width regions
    g = []
    for cx in (250.0, 750.0):
        for r in range(20):
            g.append((cx, 100.0 + 70 * r, 300.0, 50.0))
    geom = np.array(g)
    sc = CountingScorer()
    out = order_regions_grouped(geom, sc)
    assert sorted(out) == list(range(40))
    # column-major: all of column 1 (top-down) before column 2
    assert out[:20] == list(range(20)) and out[20:] == list(range(20, 40))
    # the pairwise loop saw only the 2 super-regions -> 1 pivot batch;
    # ungrouped it would take ~n pivot batches
    assert CountingScorer.calls <= 3, CountingScorer.calls

    # small pages bypass grouping entirely (reference threshold 10)
    CountingScorer.calls = 0
    small = geom[:8]
    assert order_regions_grouped(small, sc) == order_regions_pairwise(small, sc)


def test_order_doc_spans_invariant_to_row_arrival_order():
    """ADVICE r3 (medium): Spark does not guarantee shuffle-fetch arrival
    order into applyInPandas, and union-find root indices + the pairwise
    insertion loop are input-order-sensitive. order_doc_spans must
    canonicalize each doc slice (offset sort) so its output is a pure
    function of the span SET."""
    import numpy as np

    from eynollah_spark.mb_reading_order import HeuristicPairScorer, order_doc_spans

    rng = np.random.default_rng(7)
    sc = HeuristicPairScorer()
    for trial in range(20):
        n = int(rng.integers(3, 40))
        x0 = rng.integers(0, 800, n).astype(float)
        x1 = x0 + rng.integers(50, 400, n)
        y0 = rng.integers(0, 1200, n).astype(float)
        y1 = y0 + rng.integers(10, 200, n)
        off = np.arange(n, dtype=np.int64) * 7
        base = order_doc_spans(x0, x1, y0, y1, off, False, sc)
        perm = rng.permutation(n)
        shuf = order_doc_spans(x0[perm], x1[perm], y0[perm], y1[perm],
                               off[perm], False, sc)
        # same offset sequence out, regardless of row arrival order
        assert off[base].tolist() == off[perm][shuf].tolist(), trial
