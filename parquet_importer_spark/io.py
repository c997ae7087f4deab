"""Table IO: the engine's source layer.

The reference streams one parquet file in 50k-row Arrow batches
(reference app.py:88,94,111); Spark's vectorized parquet reader already
splits by row group / ``spark.sql.files.maxPartitionBytes`` and scans
partitions in parallel, so a "scan" here is just ``spark.read.parquet``
— schema from the footer, filters and column pruning pushed down by
Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: tables the driver generates at each scale factor (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: small dimension tables that should always broadcast in joins
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. Schema comes from the parquet footer
    (the distributed analog of the reference's 1-row probe, app.py:72)."""
    return spark.read.parquet(table_path(sf_dir, name))


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def footer_rowcount(path: str) -> int:
    """O(1) row count from parquet footer metadata — no data scan
    (reference app.py:91 does this via pyarrow; same trick here)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows
