"""PAGE-XML output writer (A5/F1 product surface).

The reference's actual product is `<stem>.xml` per page
(/root/reference/src/eynollah/writer.py:66-290): a PAGE 2019-07-15
document with TextRegions (typed paragraph / marginalia / heading /
drop-capital), TextLines with Coords + TextEquiv, a ReadingOrder
OrderedGroup listing text regions in order (marginalia-left first, then
main text, then marginalia-right — utils/xml.py:49-66), and
Image/Separator/Table regions appended without RO entries. Ids follow
utils/counter.py: `region_%04d` / `region_%04d_line_%04d`, 1-based.

Here the writer is a vectorized post-pass over the engine's ordered
flat output (doc_id, ord, kind, text, media_ref, offset) joined with
span geometry: per document it re-groups consecutive ordered text spans
into regions (same geometric clustering the kernel used) and serializes
one XML string per document. At scale the XML strings land in a
(doc_id, xml) table — writing 10^12 individual files is an object-store
concern, not an engine concern — with a local-directory helper for the
reference's one-file-per-page layout.
"""

from __future__ import annotations

import hashlib
import os
import re
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

PAGE_NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
XSI_NS = "http://www.w3.org/2001/XMLSchema-instance"
#: the reference's fixed OrderedGroup id (utils/xml.py:51)
RO_GROUP_ID = "ro357564684568544579089"
CREATOR = "eynollah_spark"

_TEXT_KINDS = ("text", "marginalia", "heading", "drop-capital")
_REGION_TYPE = {"text": "paragraph", "marginalia": "marginalia",
                "heading": "heading", "drop-capital": "drop-capital"}
_MEDIA_TAG = {"image": "ImageRegion", "separator": "SeparatorRegion",
              "table": "TableRegion"}


def _rect_points(x0, y0, x1, y1) -> str:
    x0, y0, x1, y1 = (int(round(v)) for v in (x0, y0, x1, y1))
    return f"{x0},{y0} {x1},{y0} {x1},{y1} {x0},{y1}"


def _text_region_runs(kind, x0, x1, y0, y1):
    """Split the ordered text-like spans into consecutive region runs:
    geometric clustering (same rule as the kernel's C16 inverse) refined
    so every region is a *consecutive* run of the reading order with a
    single kind — region boundaries land where cluster label or kind
    changes between neighbours."""
    from eynollah_spark.kernels.layout import cluster_lines_into_regions

    n = len(kind)
    if n == 0:
        return []
    labels = cluster_lines_into_regions(
        np.asarray(x0, float), np.asarray(x1, float),
        np.asarray(y0, float), np.asarray(y1, float), rtl=False)
    runs = []
    start = 0
    for i in range(1, n):
        if labels[i] != labels[i - 1] or kind[i] != kind[i - 1]:
            runs.append((start, i))
            start = i
    runs.append((start, n))
    return runs


def doc_to_pagexml(doc_id, width, height, kind, text, media_ref, offset,
                   x0, x1, y0, y1, image_filename=None,
                   created="1970-01-01T00:00:00") -> str:
    """Serialize ONE document's ordered spans (arrays in reading order)
    to a PAGE-XML string following the reference writer's conventions."""
    kind = list(kind)
    n = len(kind)
    image_filename = image_filename or f"{doc_id}.tif"
    head = [i for i in range(n) if kind[i] in _TEXT_KINDS]
    tail = [i for i in range(n) if kind[i] not in _TEXT_KINDS]

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<PcGts xmlns="{PAGE_NS}" xmlns:xsi="{XSI_NS}" '
        f'xsi:schemaLocation="{PAGE_NS} {PAGE_NS}/pagecontent.xsd" '
        f'pcGtsId={quoteattr("pc-" + str(doc_id))}>',
        "  <Metadata>",
        f"    <Creator>{CREATOR}</Creator>",
        f"    <Created>{created}</Created>",
        f"    <LastChange>{created}</LastChange>",
        "  </Metadata>",
        f'  <Page imageFilename={quoteattr(str(image_filename))} '
        f'imageWidth="{int(width)}" imageHeight="{int(height)}" '
        'readingDirection="left-to-right" textLineOrder="top-to-bottom">',
    ]

    runs = _text_region_runs([kind[i] for i in head],
                             [x0[i] for i in head], [x1[i] for i in head],
                             [y0[i] for i in head], [y1[i] for i in head])
    region_idx = 0
    ro_entries = []
    region_xml = []
    for s, e in runs:
        region_idx += 1
        rid = f"region_{region_idx:04d}"
        members = head[s:e]
        rx0 = min(x0[i] for i in members)
        rx1 = max(x1[i] for i in members)
        ry0 = min(y0[i] for i in members)
        ry1 = max(y1[i] for i in members)
        rtype = _REGION_TYPE[kind[members[0]]]
        ro_entries.append(rid)
        region_xml.append(f'    <TextRegion id="{rid}" type="{rtype}">')
        region_xml.append(
            f'      <Coords points="{_rect_points(rx0, ry0, rx1, ry1)}"/>')
        for li, i in enumerate(members, start=1):
            lid = f"{rid}_line_{li:04d}"
            region_xml.append(f'      <TextLine id="{lid}">')
            region_xml.append(
                f'        <Coords points="{_rect_points(x0[i], y0[i], x1[i], y1[i])}"/>')
            if text[i] is not None and not (isinstance(text[i], float) and np.isnan(text[i])):
                region_xml.append("        <TextEquiv>")
                region_xml.append(f"          <Unicode>{escape(str(text[i]))}</Unicode>")
                region_xml.append("        </TextEquiv>")
            region_xml.append("      </TextLine>")
        region_xml.append("    </TextRegion>")

    # ReadingOrder BEFORE the regions (reference layout; fixtures parser
    # ignores non-region Page children either way)
    parts.append("    <ReadingOrder>")
    parts.append(f'      <OrderedGroup id="{RO_GROUP_ID}">')
    for idx, rid in enumerate(ro_entries):
        parts.append(
            f'        <RegionRefIndexed index="{idx}" regionRef="{rid}"/>')
    parts.append("      </OrderedGroup>")
    parts.append("    </ReadingOrder>")
    parts.extend(region_xml)

    for i in tail:
        region_idx += 1
        rid = f"region_{region_idx:04d}"
        tag = _MEDIA_TAG.get(kind[i])
        if tag is None:
            continue
        parts.append(f'    <{tag} id="{rid}">')
        parts.append(
            f'      <Coords points="{_rect_points(x0[i], y0[i], x1[i], y1[i])}"/>')
        parts.append(f"    </{tag}>")

    parts.append("  </Page>")
    parts.append("</PcGts>")
    return "\n".join(parts)


def attach_geometry(out: DataFrame, flat_input: DataFrame) -> DataFrame:
    """Join the engine's ordered output back to the input geometry on
    (doc_id, offset) — broadcast-free equi-join, both sides hash-
    partitionable on doc_id."""
    geom = flat_input.select("doc_id", "offset", "width", "height",
                             "x0", "x1", "y0", "y1")
    return out.join(geom, ["doc_id", "offset"], "left")


def page_deskew_angles(flat_input: DataFrame) -> DataFrame:
    """Per-document EFFECTIVE deskew angle (doc_id, angle_deg): the exact
    angle layout_permutation applied — estimate_skew over the text spans,
    gated the same way (>= 8 text lines, |angle| >= 0.75 deg, else 0).
    Bucketed applyInPandas with the doc_runs idiom; one numpy call per
    document slice."""
    from pyspark.sql import functions as F

    from eynollah_spark.packaging import ensure_distributed

    spark = flat_input.sparkSession
    ensure_distributed(spark)
    buckets = int(spark.conf.get("spark.sql.shuffle.partitions")) * 2
    txt = flat_input.filter(F.col("kind") == "text").select(
        "doc_id", "width", "height", "x0", "x1", "y0", "y1",
        F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).alias("_bucket"))

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        from eynollah_spark.kernels import doc_runs
        from eynollah_spark.kernels.deskew import estimate_skew

        if not len(b):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                                 "angle_deg": pd.Series([], dtype=float)})
        order, starts, ends = doc_runs(b["doc_id"])
        ids = b["doc_id"].to_numpy(dtype=object)[order]
        x0 = b["x0"].to_numpy(float)[order]
        x1 = b["x1"].to_numpy(float)[order]
        y0 = b["y0"].to_numpy(float)[order]
        y1 = b["y1"].to_numpy(float)[order]
        W = b["width"].to_numpy(float)[order]
        H = b["height"].to_numpy(float)[order]
        out_id, out_a = [], []
        for s, e in zip(starts, ends):
            ang = 0.0
            if e - s >= 8:  # the kernel's text-line gate
                cx = (x0[s:e] + x1[s:e]) / 2.0
                cy = (y0[s:e] + y1[s:e]) / 2.0
                ang = estimate_skew(cx, cy,
                                    np.maximum(x1[s:e] - x0[s:e], 1.0),
                                    np.maximum(y1[s:e] - y0[s:e], 1.0),
                                    W[s], H[s])
                if abs(ang) < 0.75:  # the kernel's apply threshold
                    ang = 0.0
            out_id.append(ids[s])
            out_a.append(float(ang))
        return pd.DataFrame({"doc_id": out_id, "angle_deg": out_a})

    return txt.groupBy("_bucket").applyInPandas(
        fn, schema="doc_id string, angle_deg double")


def rotate_geometry(rows: DataFrame, angles: DataFrame,
                    inverse: bool = False) -> DataFrame:
    """C9 closure (deskewed<->original coordinate mapping, the symbolic
    form of utils/contour.py:258-391's contour back-projection): rotate
    every box center around the page center by the doc's deskew angle
    (inverse=False -> original frame to deskewed frame; inverse=True ->
    back), extents preserved — identical math to kernels/deskew.py
    rotate_boxes, expressed as PURE COLUMN ARITHMETIC so it runs
    JVM-side in codegen: the only cost is the hash join on doc_id
    against the (small) per-doc angle table."""
    from pyspark.sql import functions as F

    r = rows.join(angles, "doc_id", "left").withColumn(
        "_a", F.radians(F.coalesce(
            -F.col("angle_deg") if inverse else F.col("angle_deg"),
            F.lit(0.0))))
    s, c = F.sin("_a"), F.cos("_a")
    cx = (F.col("x0") + F.col("x1")) / 2 - F.col("width") / 2
    cy = (F.col("y0") + F.col("y1")) / 2 - F.col("height") / 2
    ncx = c * cx + s * cy + F.col("width") / 2
    ncy = -s * cx + c * cy + F.col("height") / 2
    w2 = (F.col("x1") - F.col("x0")) / 2
    h2 = (F.col("y1") - F.col("y0")) / 2
    # one select, never chained withColumn: w2/h2 are unresolved
    # expressions over x0/x1, so replacing x0 first would silently feed
    # the NEW x0 into x1's computation
    keep = [c for c in r.columns
            if c not in ("x0", "x1", "y0", "y1", "_a", "angle_deg")]
    return r.select(
        *keep,
        (ncx - w2).alias("x0"), (ncx + w2).alias("x1"),
        (ncy - h2).alias("y0"), (ncy + h2).alias("y1"))


def to_pagexml_df(rows: DataFrame) -> DataFrame:
    """(doc_id, ord, kind, text, media_ref, offset, width, height,
    x0..y1) -> (doc_id, xml). One XML string per document; grouped
    per-doc (the writer is a low-volume post-pass, not the hot path)."""
    from eynollah_spark.packaging import ensure_distributed

    ensure_distributed(rows.sparkSession)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ord")
        xml = doc_to_pagexml(
            g["doc_id"].iloc[0], g["width"].iloc[0], g["height"].iloc[0],
            g["kind"].tolist(), g["text"].tolist(), g["media_ref"].tolist(),
            g["offset"].tolist(), g["x0"].tolist(), g["x1"].tolist(),
            g["y0"].tolist(), g["y1"].tolist())
        return pd.DataFrame({"doc_id": [g["doc_id"].iloc[0]], "xml": [xml]})

    return rows.groupBy("doc_id").applyInPandas(fn, schema="doc_id string, xml string")


def sanitize_stem(doc_id: str) -> str:
    """Filesystem-safe stem for one page file. A doc_id containing a
    path separator (or '..') must not escape out_dir; when sanitization
    rewrites the name, a short hash of the RAW doc_id is appended so two
    distinct doc_ids (e.g. 'a/b' and 'a_b') can never collapse to the
    same stem and silently overwrite each other (ADVICE r3)."""
    stem = re.sub(r"[/\\\x00]|\.\.", "_", str(doc_id))
    if stem != str(doc_id):
        digest = hashlib.md5(str(doc_id).encode("utf-8")).hexdigest()[:8]
        stem = f"{stem}-{digest}"
    return stem


def write_pagexml_dir(xml_df: DataFrame, out_dir: str) -> int:
    """Reference-style one-file-per-page sink: <out_dir>/<doc_id>.xml.
    Executor-side writes (foreachPartition) — works in local mode and on
    a shared filesystem; at object-store scale keep the (doc_id, xml)
    table instead. The returned count comes from an accumulator and is
    approximate under task retries/speculation (a retried partition
    counts twice); the file set itself is idempotent (fixed name per
    doc, whole-file rewrite)."""
    os.makedirs(out_dir, exist_ok=True)
    acc = xml_df.sparkSession.sparkContext.accumulator(0)

    def write_part(rows):
        n = 0
        for r in rows:
            stem = sanitize_stem(r["doc_id"])
            with open(os.path.join(out_dir, f"{stem}.xml"), "w") as f:
                f.write(r["xml"])
            n += 1
        acc.add(n)

    xml_df.foreachPartition(write_part)
    return acc.value
