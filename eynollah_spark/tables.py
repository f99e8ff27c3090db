"""C15 table heuristics (eynollah.py:1246-1316, symbolic span domain).

The reference's check_iou_of_bounding_box_and_contour_for_tables: a
table whose contour fills < 80% of its bounding box is suspected to be
several tables merged; it is cut at sharp x-transitions of the column
sum, and each resulting piece is re-confirmed (in 1-column pages the
piece is always kept — the "1-col fill" branch).

Span-domain translation: a table span whose CONTAINED text content
covers < 80% of the table bbox AND shows a wide empty x-gap (>= 25% of
the table width between the content's x-sorted extents) is split into
left/right table spans at the gap midpoint. The reference re-confirms
pieces against its early table prediction on >=2-column pages and keeps
them unconditionally on 1-column pages; with no early mask in the span
domain, pieces are always kept (the 1-col branch).

Pure join + window + explode plan: no Python in the path, shuffles only
on doc_id-derived keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

COVERAGE_THR = 0.8
GAP_FRAC = 0.25
#: offset namespace for the synthesized right half of a split table
SPLIT_OFFSET_BASE = 100000


def split_wide_tables(flat: DataFrame, coverage_thr: float = COVERAGE_THR,
                      gap_frac: float = GAP_FRAC) -> DataFrame:
    """flat span rows -> same rows, with qualifying table spans split in
    two. The left half keeps the original offset; the right half gets
    offset + SPLIT_OFFSET_BASE (unique per doc by construction)."""
    tables = flat.filter(F.col("kind") == "table").select(
        "doc_id", F.col("offset").alias("t_off"),
        F.col("x0").alias("tx0"), F.col("x1").alias("tx1"),
        F.col("y0").alias("ty0"), F.col("y1").alias("ty1"))
    content = flat.filter(F.col("kind") == "text").select(
        F.col("doc_id").alias("c_doc"),
        "x0", "x1", "y0", "y1",
        ((F.col("x0") + F.col("x1")) / 2).alias("ccx"),
        ((F.col("y0") + F.col("y1")) / 2).alias("ccy"))

    j = tables.join(
        content,
        (F.col("doc_id") == F.col("c_doc"))
        & (F.col("ccx") >= F.col("tx0")) & (F.col("ccx") <= F.col("tx1"))
        & (F.col("ccy") >= F.col("ty0")) & (F.col("ccy") <= F.col("ty1")),
        "inner")
    # running max of content right edges in x-order -> empty-gap width
    w = (W.partitionBy("doc_id", "t_off").orderBy("x0", "x1", "y0")
         .rowsBetween(W.unboundedPreceding, -1))
    j = j.withColumn("prev_max_x1", F.max("x1").over(w))
    j = j.withColumn("gap", F.col("x0") - F.col("prev_max_x1"))
    j = j.withColumn("cut", (F.col("x0") + F.col("prev_max_x1")) / 2)
    stats = j.groupBy("doc_id", "t_off", "tx0", "tx1", "ty0", "ty1").agg(
        (F.sum((F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0")))
         / ((F.max("tx1") - F.max("tx0")) * (F.max("ty1") - F.max("ty0")))
         ).alias("coverage"),
        F.max("gap").alias("max_gap"),
        # deterministic argmax: widest gap wins, rightmost cut breaks ties
        F.max(F.struct(F.col("gap"), F.col("cut"))).getField("cut").alias("cut_x"),
    )
    # the reference re-confirms pieces against table_prediction_early for
    # >=2-column pages and keeps them unconditionally for 1 column; the
    # span domain has no early table mask, so pieces are always kept —
    # i.e. every page takes the reference's 1-col branch.
    split = stats.filter(
        (F.col("coverage") < coverage_thr)
        & (F.col("max_gap") >= gap_frac * (F.col("tx1") - F.col("tx0"))))

    halves = split.select(
        "doc_id", "t_off",
        F.explode(F.array(
            F.struct(F.col("tx0").alias("x0"), F.col("cut_x").alias("x1"),
                     F.col("ty0").alias("y0"), F.col("ty1").alias("y1"),
                     F.lit(0).alias("half")),
            F.struct(F.col("cut_x").alias("x0"), F.col("tx1").alias("x1"),
                     F.col("ty0").alias("y0"), F.col("ty1").alias("y1"),
                     F.lit(1).alias("half")),
        )).alias("h"))

    keep_cols = flat.columns
    untouched = flat.join(
        split.select("doc_id", F.col("t_off").alias("offset")),
        ["doc_id", "offset"], "left_anti")
    new_tables = (flat.join(
        halves.select("doc_id", F.col("t_off").alias("offset"), "h"),
        ["doc_id", "offset"], "inner")
        .withColumn("x0", F.col("h.x0")).withColumn("x1", F.col("h.x1"))
        .withColumn("y0", F.col("h.y0")).withColumn("y1", F.col("h.y1"))
        .withColumn("offset",
                    F.when(F.col("h.half") == 1,
                           F.col("offset") + F.lit(SPLIT_OFFSET_BASE))
                    .otherwise(F.col("offset")))
        .select(*keep_cols))
    return untouched.unionByName(new_tables)
