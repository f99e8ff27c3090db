"""C15 table split (eynollah.py:1246-1316 symbolically): a table bbox
whose contained content covers < 80% and shows a wide x-gap splits at
the gap midpoint; dense tables stay whole (VERDICT r1 item 10)."""

from pyspark.sql import functions as F

from eynollah_spark.tables import SPLIT_OFFSET_BASE, split_wide_tables

_DDL = ("doc_id string, width int, height int, rtl boolean, "
        "kind string, text string, media_ref string, offset int, "
        "x0 double, x1 double, y0 double, y1 double")


def _mk(spark, rows):
    return spark.createDataFrame(
        [{"doc_id": d, "width": 1200, "height": 800, "rtl": False,
          "kind": k, "text": t, "media_ref": None, "offset": o,
          "x0": float(a), "x1": float(b), "y0": float(c), "y1": float(e)}
         for (d, k, t, o, a, b, c, e) in rows], schema=_DDL)


def test_merged_tables_split_at_gap(spark):
    rows = [("m", "table", None, 0, 90, 880, 40, 110)]
    # two x-clusters of cells inside the bbox, wide empty middle
    for i in range(3):
        rows.append(("m", "text", f"c{i}", 10 + i, 100 + i * 60, 150 + i * 60, 50, 70))
        rows.append(("m", "text", f"d{i}", 20 + i, 700 + i * 60, 750 + i * 60, 50, 70))
    out = split_wide_tables(_mk(spark, rows))
    tabs = sorted((r["offset"], r["x0"], r["x1"])
                  for r in out.filter(F.col("kind") == "table").collect())
    assert len(tabs) == 2
    (o1, l0, l1), (o2, r0, r1) = tabs
    assert o1 == 0 and o2 == SPLIT_OFFSET_BASE
    assert l0 == 90 and r1 == 880
    assert l1 == r0  # halves meet at the cut
    assert 270 < l1 < 700  # cut inside the empty gap
    # non-table spans untouched
    assert out.filter(F.col("kind") == "text").count() == 6


def test_dense_table_stays_whole(spark):
    rows = [("k", "table", None, 0, 90, 460, 40, 110)]
    for i in range(6):
        rows.append(("k", "text", f"c{i}", 10 + i, 100 + i * 60, 150 + i * 60, 50, 70))
    out = split_wide_tables(_mk(spark, rows))
    tabs = out.filter(F.col("kind") == "table").collect()
    assert len(tabs) == 1
    assert (tabs[0]["x0"], tabs[0]["x1"]) == (90.0, 460.0)


def test_empty_table_untouched(spark):
    rows = [("e", "table", None, 0, 90, 880, 40, 110),
            ("e", "text", "outside", 1, 100, 150, 500, 520)]
    out = split_wide_tables(_mk(spark, rows))
    assert out.filter(F.col("kind") == "table").count() == 1
