"""§2.K — user-extensible function surface (all rows-only: the Python
boundary is exactly what a SQL oracle can't see).

The reference exposes no function surface at all (SURVEY §2.K); these
are the four extension points a Spark engine offers, fastest first:
pandas UDF (Arrow-vectorized) ≫ row UDF; applyInPandas for grouped
logic; mapInPandas for 1→N. Every closure is self-contained — executor
workers never import this package (see .claude/skills/verify gotchas).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_importer_spark.io import read_table
from parquet_importer_spark.registry import query


@query("udf_scalar")  # rows-only: Python boundary
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the slow path, kept off hot paths; here
    for surface completeness (arbitrary user logic)."""

    @F.udf(T.StringType())
    def priority_class(prio: str) -> str:
        level = int(prio.split("-")[0])
        return "expedite" if level <= 2 else "standard"

    o = read_table(spark, sf_dir, "orders")
    return (
        o.withColumn("prio_class", priority_class(F.col("o_orderpriority")))
        .groupBy("prio_class")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query("udf_pandas")  # rows-only: Python boundary
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (~10-100× the row UDF): z-score
    of order totals against broadcast-side constants."""

    @F.pandas_udf(T.DoubleType())
    def zscore(v: pd.Series) -> pd.Series:
        # constants baked at plan time would be better; shown as a pure
        # vectorized transform over each Arrow batch
        return ((v - 150000.0) / 50000.0).round(6)

    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", zscore(F.col("o_totalprice")).alias("price_z")
    ).orderBy("o_orderkey").limit(100)


@query("udaf_grouped")  # rows-only: Python boundary
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pandas aggregation (applyInPandas): per-event-type 10%
    trimmed mean — logic no builtin aggregate expresses."""

    def trimmed(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].sort_values()
        k = int(len(v) * 0.1)
        core = v.iloc[k : len(v) - k] if len(v) > 2 * k else v
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "trimmed_mean": [round(float(core.mean()), 6)],
                "n_used": [len(core)],
            }
        )

    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        trimmed, "event_type string, trimmed_mean double, n_used long"
    )


@query("udtf_flatmap")  # rows-only: Python boundary
def udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function (1→N rows) via mapInPandas: explode each document
    into (doc_id, token, position) rows in pure Python — the shape used
    when tokenization needs a real tokenizer library."""

    def tokenize(batches):
        for pdf in batches:
            out_doc, out_tok, out_pos = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for pos, tok in enumerate(str(text).lower().split()):
                    out_doc.append(doc_id)
                    out_tok.append(tok)
                    out_pos.append(pos)
            yield pd.DataFrame(
                {"doc_id": out_doc, "token": out_tok, "position": out_pos}
            )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    flat = docs.mapInPandas(tokenize, "doc_id long, token string, position long")
    return flat.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))


@query(
    "udf_arrow",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM((o_orderkey * 2 + 7) % 1000) AS BIGINT) AS checksum,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 `useArrow=True`) — the modern
    scalar-UDF path: batches cross the Python boundary as Arrow arrays
    without pandas conversion overhead. Integer arithmetic is exact in
    both engines, so unlike the float UDFs this one IS oracle-checkable
    — the strongest possible parity proof for the Python boundary."""

    @F.udf(T.LongType(), useArrow=True)
    def mix(k: int) -> int:
        return (k * 2 + 7) % 1000

    o = read_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority", mix(F.col("o_orderkey")).alias("m"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("m").cast("bigint").alias("checksum"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
