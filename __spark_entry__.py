"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline; ``queries()``
exposes every implemented operator from SURVEY.md §2 (plus the
training-data ops) as named DataFrame callables over the sf_dir tables;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query. Non-SQL-expressible ops (the XY-cut kernel,
image projection over the synthesized corpus) omit the oracle and get
the driver's rows-only check — their real correctness gate is the
pytest span-sequence suite (tests/test_layout_kernel.py,
tests/test_pipeline_spark.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full reading-order extraction over the interleaved
    corpus, sized from the sf0.001 documents table."""
    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.pipeline import extract_flat_input

    sf_dir = "/root/testdata/sf0.001"
    n_docs = max(
        200, spark.read.parquet(f"{sf_dir}/documents.parquet").count() * 4
    )
    flat = corpus_flat_spark(spark, n_docs).drop("expected_kind", "expected_rank")
    return extract_flat_input(flat)


def _make_sql_fn(sql: str, tables: tuple,
                 scan_floor: bool = False) -> Callable[[SparkSession, str], DataFrame]:
    def fn(spark: SparkSession, sf_dir: str, _sql=sql, _tables=tables,
           _floor=scan_floor) -> DataFrame:
        from eynollah_spark.queries import load_views

        load_views(spark, sf_dir, *_tables, scan_floor=_floor)
        return spark.sql(_sql)

    return fn


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from eynollah_spark.queries import registry

    out: dict[str, Callable] = {}
    for name, q in registry().items():
        if "spark_fn" in q:
            out[name] = q["spark_fn"]
        else:
            out[name] = _make_sql_fn(q["spark_sql"], q["tables"],
                                     q.get("scan_floor", False))
    return out


def oracle_sql() -> dict[str, str]:
    from eynollah_spark.queries import registry

    return {
        name: q["duck_sql"]
        for name, q in registry().items()
        if q.get("duck_sql")
    }
