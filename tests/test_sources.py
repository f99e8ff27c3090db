"""JSONL source/sink: explicit-schema read, corrupt-line quarantine, and
round-trip through the extraction pipeline."""

import json
import os


def _write_jsonl(path, docs, corrupt_lines=()):
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
        for line in corrupt_lines:
            f.write(line + "\n")


def _mk_docs(n=6):
    docs = []
    for i in range(n):
        spans = [{"kind": "text", "text": f"d{i}s{j}", "media_ref": None,
                  "offset": j, "x0": 100, "x1": 500,
                  "y0": 80 + j * 30, "y1": 100 + j * 30}
                 for j in range(4)]
        docs.append({"doc_id": f"doc{i}", "width": 800, "height": 1000,
                     "rtl": False, "spans": spans})
    return docs


def test_documents_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    from eynollah_spark.sources import documents_jsonl

    src = str(tmp_path / "docs.jsonl")
    _write_jsonl(src, _mk_docs(6),
                 corrupt_lines=["{not json at all", '{"width": 3}'])
    quarantine = str(tmp_path / "bad")
    docs = documents_jsonl(spark, src, quarantine=quarantine)
    assert docs.count() == 6
    assert "_corrupt_record" not in docs.columns
    bad = spark.read.json(quarantine)
    assert bad.count() >= 1  # the non-JSON line is quarantined, not fatal


def test_flat_spans_jsonl_through_extraction(spark, tmp_path):
    from pyspark.sql import functions as F

    from eynollah_spark.pipeline import extract_flat_input
    from eynollah_spark.sources import flat_spans_jsonl, write_jsonl

    src = str(tmp_path / "docs.jsonl")
    _write_jsonl(src, _mk_docs(5))
    flat = flat_spans_jsonl(spark, src)
    assert flat.count() == 20
    out = extract_flat_input(flat, partitions=2)
    # single-column pages: reading order == offset order
    rows = out.filter(F.col("doc_id") == "doc3").orderBy("ord").collect()
    assert [r["offset"] for r in rows] == [0, 1, 2, 3]

    sink = str(tmp_path / "out_jsonl")
    write_jsonl(out, sink, partitions=2)
    back = spark.read.json(sink)
    assert back.count() == 20
    assert set(back.columns) >= {"doc_id", "ord", "kind", "offset"}
