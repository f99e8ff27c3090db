"""Reference-derived fixtures: parse eynollah's ground-truth PAGE-XML test
pages into symbolic span documents + expected ordered output sequences.

Sources (read-only, test resources of /root/reference):
  F1 tests/resources/2files/kant_aufklaerung_1784_0020.xml   (single column)
  F2 tests/resources/2files/euler_rechenkunst01_1738_0025.xml (2-col bands)
  F3 tests/resources/marginalia/estor_rechtsgelehrsamkeit02_1758_0880_800px.xml

The expected sequence is the reference's serialization order
(writer.py:184-290 + utils/xml.py:49-66): ReadingOrder-ordered text
regions with TextLines in document order (the ground-truth XML RO lists
marginalia regions first, matching the marg-L-first rule), then
images/separators/tables by (center-y, center-x).

This module is test-only plumbing — it never touches the engine's hot path.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

REFERENCE_RESOURCES = "/root/reference/tests/resources"

FIXTURE_FILES = {
    "kant_0020": f"{REFERENCE_RESOURCES}/2files/kant_aufklaerung_1784_0020.xml",
    "euler_0025": f"{REFERENCE_RESOURCES}/2files/euler_rechenkunst01_1738_0025.xml",
    "estor_0880": f"{REFERENCE_RESOURCES}/marginalia/estor_rechtsgelehrsamkeit02_1758_0880_800px.xml",
}


@dataclass
class FixtureDoc:
    doc_id: str
    width: int
    height: int
    # input spans in XML document order: (kind, text, media_ref, offset, x0, x1, y0, y1)
    spans: list = field(default_factory=list)
    # expected output: list of (kind, text, media_ref, offset) in reading order
    expected: list = field(default_factory=list)


def _bbox(points: str):
    pts = [tuple(map(int, p.split(","))) for p in points.split()]
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    return min(xs), max(xs), min(ys), max(ys)


def _line_text(line, ns):
    te = line.find("p:TextEquiv/p:Unicode", ns)
    if te is not None and te.text:
        return te.text
    words = [
        w.text or ""
        for w in line.findall("p:Word/p:TextEquiv/p:Unicode", ns)
    ]
    return " ".join(words)


def load_fixture(doc_id: str) -> FixtureDoc:
    extra = ()
    if doc_id == "euler_0025":
        # FIXTURES.md F2: one synthetic table span over the tabular area
        extra = (("table", None, None, 313, 974, 310, 1548),)
    return parse_pagexml(FIXTURE_FILES[doc_id], doc_id, extra_spans=extra)


def parse_pagexml(path: str, doc_id: str, extra_spans=()) -> FixtureDoc:
    """Parse any PAGE-XML file into a FixtureDoc (also used by the
    pagexml-writer round-trip test on files we emit ourselves)."""
    return _parse_pagexml_root(ET.parse(path).getroot(), doc_id, extra_spans)


def parse_pagexml_string(xml: str, doc_id: str, extra_spans=()) -> FixtureDoc:
    """Same as parse_pagexml for an in-memory XML string (used by the
    distributed round-trip self-check query)."""
    return _parse_pagexml_root(ET.fromstring(xml), doc_id, extra_spans)


def _parse_pagexml_root(root, doc_id: str, extra_spans=()) -> FixtureDoc:
    ns = {"p": re.match(r"\{(.*)\}", root.tag).group(1)}
    page = root.find("p:Page", ns)
    doc = FixtureDoc(
        doc_id=doc_id,
        width=int(page.get("imageWidth")),
        height=int(page.get("imageHeight")),
    )
    ro_group = page.find("p:ReadingOrder/p:OrderedGroup", ns)
    ro = [
        e.get("regionRef")
        for e in sorted(
            ro_group.findall("p:RegionRefIndexed", ns), key=lambda e: int(e.get("index"))
        )
    ]

    # input spans in XML document order; record per-region line span refs
    region_lines: dict[str, list[int]] = {}
    region_type: dict[str, str] = {}
    extras = []  # non-text span indices (separators etc.)
    off = 0
    for reg in page:
        tag = reg.tag.split("}")[1]
        if tag == "TextRegion":
            rid = reg.get("id")
            region_type[rid] = reg.get("type") or "paragraph"
            region_lines[rid] = []
            for line in reg.findall("p:TextLine", ns):
                x0, x1, y0, y1 = _bbox(line.find("p:Coords", ns).get("points"))
                doc.spans.append(("text", _line_text(line, ns), None, off, x0, x1, y0, y1))
                region_lines[rid].append(off)
                off += 1
        elif tag in ("SeparatorRegion", "ImageRegion", "TableRegion"):
            kind = {"SeparatorRegion": "separator", "ImageRegion": "image", "TableRegion": "table"}[tag]
            x0, x1, y0, y1 = _bbox(reg.find("p:Coords", ns).get("points"))
            media = f"media://{doc_id}/{off}" if kind == "image" else None
            doc.spans.append((kind, None, media, off, x0, x1, y0, y1))
            extras.append(off)
            off += 1

    for kind, text, media, ex0, ex1, ey0, ey1 in extra_spans:
        doc.spans.append((kind, text, media, off, ex0, ex1, ey0, ey1))
        extras.append(off)
        off += 1

    # expected sequence: RO walk (lines in document order), marginalia kind
    # refined per region type; then images/separators/tables by (cy, cx, offset)
    for rid in ro:
        kind = "marginalia" if region_type.get(rid) == "marginalia" else "text"
        for i in region_lines[rid]:
            s = doc.spans[i]
            doc.expected.append((kind, s[1], s[2], s[3]))
    by_kind = {"image": [], "separator": [], "table": []}
    for i in extras:
        s = doc.spans[i]
        cy, cx = (s[6] + s[7]) / 2.0, (s[4] + s[5]) / 2.0
        by_kind[s[0]].append((cy, cx, s[3], s))
    for k in ("image", "separator", "table"):
        for _, _, _, s in sorted(by_kind[k], key=lambda t: (t[0], t[1], t[2])):
            doc.expected.append((s[0], s[1], s[2], s[3]))
    return doc


def all_fixtures():
    return [load_fixture(k) for k in FIXTURE_FILES]
