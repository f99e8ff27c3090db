"""Pluggable columnwise scorer surface (SURVEY.md §2 B-ops).

The reference routes every model inference through a singleton TF
subprocess (predictor.py:13-122, shm queues). Here the equivalent is a
`Scorer`: a vectorized function over Arrow record batches of span rows,
applied inside mapInPandas — executor-local, no cross-process hop, with
model weights broadcast when a real model is plugged in.

Two implementations:

* HeuristicScorer (default, deterministic, no ML deps): geometry-driven
  kind refinement — the symbolic counterpart of the full-layout model
  (B12, eynollah.py:866-877) + main-vs-heading split rule (C12,
  utils/__init__.py:916-920: wide/short aspect => heading) and the
  column-count classifier clamp (B5, eynollah.py:411-416).
* KerasScorer (optional): broadcasts weights, runs batch inference.
  TF is not in this container -> import-gated stub with the exact batch
  interface a real model would use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


class HeuristicScorer:
    """Deterministic kind-probability scorer over flat span batches."""

    #: C12 rule constants (utils/__init__.py:916-920): a text block is a
    #: heading when it is wide relative to the column and short
    ASPECT_MIN, ASPECT_MAX = 1.3, 30.0
    WIDTH_FRAC = 0.55

    def score_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """Input columns: kind, x0, x1, y0, y1, width, height.
        Returns p_heading / p_text / num_col_vote columns (vectorized)."""
        w = np.maximum(pdf["x1"].to_numpy(float) - pdf["x0"].to_numpy(float), 1.0)
        h = np.maximum(pdf["y1"].to_numpy(float) - pdf["y0"].to_numpy(float), 1.0)
        page_w = np.maximum(pdf["width"].to_numpy(float), 1.0)
        aspect = w / h
        is_text = (pdf["kind"] == "text").to_numpy()
        heading = (
            is_text
            & (w >= self.WIDTH_FRAC * page_w)
            & (aspect >= self.ASPECT_MIN)
            & (aspect <= self.ASPECT_MAX)
            & (h <= 0.04 * np.maximum(pdf["height"].to_numpy(float), 1.0))
        )
        # C13 drop-capital rule (utils/__init__.py:743-795 majority/area
        # rules, symbolically): a tall, narrow text box — letter-shaped,
        # much taller than the page's typical line. The reference height
        # is the per-DOCUMENT median of text-line heights (a batch mixes
        # many docs; using a batch-wide median would make the output
        # depend on batch composition).
        ref_h = np.ones(len(pdf))
        if is_text.any():
            if "doc_id" in pdf.columns:
                med = (
                    pd.Series(h[is_text], index=pdf.index[is_text])
                    .groupby(pdf.loc[is_text, "doc_id"]).median()
                )
                ref_h = pdf["doc_id"].map(med).fillna(1.0).to_numpy(float)
            else:
                ref_h = np.full(len(pdf), float(np.median(h[is_text])))
        drop = (
            is_text
            & (h >= 2.2 * np.maximum(ref_h, 1.0))
            & (w <= 1.6 * h)
            & (w <= 0.12 * page_w)
        )
        out = pd.DataFrame({
            "p_heading": np.where(heading & ~drop, 0.9, 0.05),
            "p_drop_capital": np.where(drop, 0.9, 0.05),
            "p_text": np.where(is_text, np.where(heading | drop, 0.1, 0.95), 0.0),
        })
        return out


class KerasScorer:
    """Broadcast-weights CNN scorer (stub: TF absent in this container).

    Real deployment: `weights = spark.sparkContext.broadcast(path_or_bytes)`
    at driver; executors lazily `tf.keras.models.load_model` once per
    python worker and run `model.predict(batch)` per Arrow batch —
    mirroring the reference's per-model rebatching table
    (predictor.py:104-122) via spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def __init__(self, weights_broadcast=None):
        self.weights = weights_broadcast

    def score_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            import tensorflow  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "KerasScorer requires tensorflow (not available in this "
                "container); use HeuristicScorer"
            ) from e
        raise NotImplementedError("wire model.predict here")


def refine_kinds(flat: DataFrame, scorer=None, threshold: float = 0.5) -> DataFrame:
    """Apply a scorer over flat span rows and refine text -> heading where
    p_heading >= threshold (C12/B12 reclassification as a relational
    post-pass; the ordering kernel is unaffected — headings order like
    text, only the emitted kind changes)."""
    from eynollah_spark.packaging import ensure_distributed

    ensure_distributed(flat.sparkSession)
    scorer = scorer or HeuristicScorer()

    def apply(iterator):
        for pdf in iterator:
            scores = scorer.score_batch(pdf)
            pdf = pdf.copy()
            is_text = pdf["kind"] == "text"
            mask_h = (scores["p_heading"].to_numpy() >= threshold) & is_text
            pdf.loc[mask_h, "kind"] = "heading"
            if "p_drop_capital" in scores:
                mask_d = (scores["p_drop_capital"].to_numpy() >= threshold) & is_text
                pdf.loc[mask_d & ~mask_h, "kind"] = "drop-capital"
            yield pdf

    return flat.mapInPandas(apply, schema=flat.schema)


class FillTextScorer:
    """B15/B16 OCR hook: fill missing `text` for text spans. The reference
    runs CNN-RNN/TrOCR over line crops (eynollah_ocr.py:269-640); here the
    pluggable scorer fills text per Arrow batch — the default is a
    deterministic placeholder (content-addressed by doc/offset), a real
    OCR model drops into the same batch interface."""

    def fill_batch(self, pdf: pd.DataFrame) -> pd.Series:
        missing = (pdf["kind"] == "text") & pdf["text"].isna()
        out = pdf["text"].copy()
        out[missing] = [
            f"[ocr:{d}#{o}]" for d, o in
            zip(pdf.loc[missing, "doc_id"], pdf.loc[missing, "offset"])
        ]
        return out


def fill_missing_text(flat: DataFrame, scorer=None) -> DataFrame:
    """Apply the OCR hook over flat span rows (text spans with NULL text
    get content from the scorer; everything else passes through)."""
    from eynollah_spark.packaging import ensure_distributed

    ensure_distributed(flat.sparkSession)
    scorer = scorer or FillTextScorer()

    def apply(iterator):
        for pdf in iterator:
            pdf = pdf.copy()
            pdf["text"] = scorer.fill_batch(pdf)
            yield pdf

    return flat.mapInPandas(apply, schema=flat.schema)


def clamp_num_col(df: DataFrame, lower: int | None = None, upper: int | None = None) -> DataFrame:
    """B5 clamp (eynollah.py:411-416): bound a num_col column by CLI-style
    lower/upper hints — pure column math."""
    c = F.col("num_col")
    if lower is not None:
        c = F.greatest(c, F.lit(lower))
    if upper is not None:
        c = F.least(c, F.lit(upper))
    return df.withColumn("num_col", c)
