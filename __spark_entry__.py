"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke check);
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 via :mod:`parquet_importer_spark.registry` — the driver runs
each pair at sf0.01 and hash-compares against DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from parquet_importer_spark.suite import QUERIES  # noqa: PLC0415

    return QUERIES["flagship_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from parquet_importer_spark.suite import QUERIES  # noqa: PLC0415

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from parquet_importer_spark.suite import ORACLES  # noqa: PLC0415

    return dict(ORACLES)
