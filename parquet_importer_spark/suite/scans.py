"""§2.A — scans / sources (REF rows of the inventory).

The reference's scan machinery (probe app.py:72-77, footer rowcount
app.py:91, 50k-row iter_batches app.py:94/111) all collapses into
``spark.read.parquet``: schema from the footer, row-group-aligned
parallel splits, count-star answered from footer statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table, table_path
from parquet_importer_spark.registry import query


@query("scan_parquet", oracle="SELECT * FROM lineitem")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, all columns (reference app.py:111 streams these same
    rows sequentially; here the vectorized reader splits by row group)."""
    return read_table(spark, sf_dir, "lineitem")


@query(
    "scan_schema_probe",
    oracle="SELECT * FROM orders ORDER BY o_orderkey LIMIT 1",
)
def scan_schema_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row probe (reference app.py:72 reads rows=1 to sniff schema).
    Deterministic: ordered by primary key before LIMIT (SURVEY §7.4.4)."""
    return read_table(spark, sf_dir, "orders").orderBy("o_orderkey").limit(1)


@query("scan_meta_rowcount", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def scan_meta_rowcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-star served from parquet footer stats — no data scan
    (reference app.py:91 reads metadata.num_rows the same way)."""
    return read_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@query("source_select")  # rows-only: path-mode source resolution, no SQL analog
def source_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-based source resolution (reference app.py:32-49 chooses
    upload vs local path; distributed engines only have paths)."""
    return spark.read.format("parquet").load(table_path(sf_dir, "region"))
