"""Pure numpy per-document kernels (no Spark imports).

These are the non-relational cores of the pipeline — the symbolic
re-expression of eynollah's raster heuristics. Each kernel is a pure
function of small per-document arrays, unit-testable without a
SparkSession, and is invoked from Arrow-batched pandas UDFs in
``eynollah_spark.pipeline``.
"""

from eynollah_spark.kernels.layout import DocSpans, layout_document  # noqa: F401
