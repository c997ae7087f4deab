"""parquet_importer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``hdhooper/parquet-importer`` (a Parquet→Postgres batch-ETL tool, see
SURVEY.md), rebuilt Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes: pushdown, pruning,
  join selection, AQE),
- a full relational operator surface (filters, joins, windows, aggs,
  set ops, scalar functions) exercised over TPC-H-ish tables,
- LLM-data-pipeline operators (dedup exact/near, similarity search,
  text analysis, multimodal plumbing) designed for 100 TB scale,
- batch + Structured Streaming ingest paths mirroring the reference's
  chunked import loop (reference app.py:94-193).

Nothing in here copies reference code; the reference is a 584-LoC
pandas/Streamlit app with no query engine (SURVEY.md §1-§4).
"""

from parquet_importer_spark.session import get_spark
from parquet_importer_spark.io import read_table, TABLES

__all__ = ["get_spark", "read_table", "TABLES"]

__version__ = "0.1.0"
