"""The Spark extraction pipeline: documents -> ordered out_spans.

Stage plan (explicit shuffle boundaries, SURVEY.md §3.1 lifecycle):

  scan (nested documents table; column-pruned: media payloads never read)
    -> salted repartition on xxhash64(doc_id), heavy tail isolated
       (north rule: skew from media-heavy docs is defused *before* the
       kernel — AQE skew handling does not apply to UDF stages)
    -> flatten (posexplode, narrow — preserves partitioning)
    -> sortWithinPartitions(doc_id, offset)  (no shuffle)
    -> mapInPandas(layout kernel)            (Arrow batches; docs are
       contiguous runs within a partition; incomplete tail docs carry
       over between batches, so there is NO per-group pandas overhead
       the way applyInPandas would impose at 10^12 docs)
    -> sink (nested or flat rows)

The kernel itself is eynollah_spark.kernels.layout.layout_document —
see that module for reference-semantics citations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from eynollah_spark.kernels.layout import DocSpans, layout_document
from eynollah_spark.schemas import FLAT_OUT_SCHEMA, OUT_SCHEMA

HEAVY_QUANTILE = 0.99


def salted_repartition(df: DataFrame, partitions: int, heavy_quantile: float = HEAVY_QUANTILE,
                       heavy_threshold: int | None = None) -> DataFrame:
    """Repartition documents by xxhash64(doc_id), isolating the media-heavy
    tail (span count above the given quantile) into its own hash space so
    a few 10^4-span docs cannot pile onto one partition (SURVEY.md §4
    'salted repartition'; replaces the reference's fork-pool page
    scheduling, eynollah.py:1994-2032)."""
    df = df.withColumn("_n", F.size("spans"))
    if heavy_threshold is None:
        thr = df.selectExpr(f"approx_percentile(_n, {heavy_quantile}) AS t").first()["t"]
        heavy_threshold = int(thr if thr is not None else 1 << 30)
    light = df.filter(F.col("_n") <= heavy_threshold)
    heavy = df.filter(F.col("_n") > heavy_threshold)
    p_heavy = max(2, partitions // 4)
    out = light.repartition(partitions, F.xxhash64("doc_id")).unionByName(
        heavy.repartition(p_heavy, F.xxhash64("doc_id", F.lit(1)))
    )
    return out.drop("_n")


def flatten(df: DataFrame) -> DataFrame:
    """Nested documents -> one row per span (narrow op). Keeps doc meta on
    every row; empty documents keep a single null-span row
    (posexplode_outer) so they still emit an empty out_spans row."""
    return df.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.coalesce(F.col("meta.rtl"), F.lit(False)).alias("rtl"),
        F.posexplode_outer(F.arrays_zip("spans", "geom")).alias("_i", "z"),
    ).select(
        "doc_id", "width", "height", "rtl",
        F.col("z.spans.kind").alias("kind"),
        F.col("z.spans.text").alias("text"),
        F.col("z.spans.media_ref").alias("media_ref"),
        F.col("z.spans.offset").alias("offset"),
        F.col("z.geom.x0").alias("x0"),
        F.col("z.geom.x1").alias("x1"),
        F.col("z.geom.y0").alias("y0"),
        F.col("z.geom.y1").alias("y1"),
    )


def _doc_arrays(chunk: pd.DataFrame) -> DocSpans | None:
    """Build kernel input from one doc's flat rows (None for empty docs)."""
    valid = pd.notna(chunk["kind"]).to_numpy()
    if not valid.any():
        return None
    c = chunk.loc[valid]
    return DocSpans(
        kind=c["kind"].to_numpy(dtype=object),
        text=c["text"].to_numpy(dtype=object),
        media_ref=c["media_ref"].to_numpy(dtype=object),
        offset=c["offset"].to_numpy(dtype=np.int64),
        x0=c["x0"].to_numpy(dtype=np.float64),
        x1=c["x1"].to_numpy(dtype=np.float64),
        y0=c["y0"].to_numpy(dtype=np.float64),
        y1=c["y1"].to_numpy(dtype=np.float64),
        width=int(c["width"].iloc[0]),
        height=int(c["height"].iloc[0]),
        rtl=bool(c["rtl"].iloc[0]),
    )


def _emit_flat(doc_id: str, d: DocSpans | None):
    if d is None:
        return pd.DataFrame(columns=["doc_id", "ord", "kind", "text", "media_ref", "offset"])
    perm, out_kind = layout_document(d)
    return pd.DataFrame({
        "doc_id": doc_id,
        "ord": np.arange(len(perm), dtype=np.int32),
        "kind": out_kind,
        "text": d.text[perm],
        "media_ref": d.media_ref[perm],
        "offset": d.offset[perm].astype(np.int32),
    })


def _emit_nested(doc_id: str, d: DocSpans | None):
    if d is None:
        return pd.DataFrame({"doc_id": [doc_id], "out_spans": [[]]})
    perm, out_kind = layout_document(d)
    spans = [
        {"kind": out_kind[p], "text": d.text[i], "media_ref": d.media_ref[i],
         "offset": int(d.offset[i])}
        for p, i in enumerate(perm)
    ]
    return pd.DataFrame({"doc_id": [doc_id], "out_spans": [spans]})


def make_kernel(nested: bool):
    emit = _emit_nested if nested else _emit_flat

    def kernel(iterator):
        carry: pd.DataFrame | None = None
        for pdf in iterator:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            ids = pdf["doc_id"].to_numpy()
            change = np.flatnonzero(ids[1:] != ids[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(ids)]))
            # hold back the final run — it may continue in the next batch
            carry = pdf.iloc[starts[-1]:].copy()
            outs = []
            for s, e in zip(starts[:-1], ends[:-1]):
                chunk = pdf.iloc[s:e]
                outs.append(emit(ids[s], _doc_arrays(chunk)))
            if outs:
                yield pd.concat(outs, ignore_index=True)
        if carry is not None and len(carry):
            yield emit(carry["doc_id"].iloc[0], _doc_arrays(carry))

    return kernel


def extract(df: DataFrame, partitions: int | None = None, nested: bool = True,
            heavy_threshold: int | None = None) -> DataFrame:
    """documents (nested) -> ordered out_spans.

    ``nested=True`` returns FIXTURES.md §2 rows (doc_id, out_spans);
    ``nested=False`` returns the flat sink shape (doc_id, ord, kind,
    text, media_ref, offset) — preferable at scale.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = salted_repartition(df, partitions, heavy_threshold=heavy_threshold)
    flat = flatten(df).sortWithinPartitions("doc_id", "offset")
    schema = OUT_SCHEMA if nested else FLAT_OUT_SCHEMA
    return flat.mapInPandas(make_kernel(nested), schema=schema)


def extract_flat_input(flat: DataFrame, partitions: int | None = None,
                       nested: bool = False) -> DataFrame:
    """Same pipeline for already-flat span rows (doc_id, width, height,
    rtl, kind, text, media_ref, offset, x0..y1) — used when the corpus is
    generated distributed, skipping the nest/flatten round-trip."""
    spark = flat.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    flat = flat.repartition(partitions, F.xxhash64("doc_id"))
    flat = flat.sortWithinPartitions("doc_id", "offset")
    schema = OUT_SCHEMA if nested else FLAT_OUT_SCHEMA
    return flat.mapInPandas(make_kernel(nested), schema=schema)
