"""§2.K — user-extensible function surface, ALL oracle-checked: the
Python boundary is no excuse for unverifiable results. Each UDF keeps
its arithmetic on a contract a SQL oracle can reproduce bit-for-bit —
exact integers where possible (udf_arrow, udf_scalar, udtf_flatmap),
integer-cents quantization + identical IEEE division chains where
floats are intrinsic (udaf_grouped), or raw un-rounded IEEE ops both
engines execute identically (udf_pandas). Library rounding helpers
(np.round / Python round()) are BANNED inside oracle-checked UDFs:
they round half-to-even while Spark/DuckDB ROUND go half-away — use
floor(x + 0.5) style expressions mirrored verbatim in the oracle.

The reference exposes no function surface at all (SURVEY §2.K); these
are the four extension points a Spark engine offers, fastest first:
pandas UDF (Arrow-vectorized) ≫ row UDF; applyInPandas for grouped
logic; mapInPandas for 1→N. Every closure is self-contained — executor
workers never import this package, so UDF bodies must not reference
module-level helpers (pickling would drag the whole module graph in).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_importer_spark.io import read_table
from parquet_importer_spark.registry import query


@query(
    "udf_scalar",
    oracle="""
    SELECT CASE WHEN CAST(string_split(o_orderpriority, '-')[1] AS INT) <= 2
                THEN 'expedite' ELSE 'standard' END AS prio_class,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the slow path, kept off hot paths; here
    for surface completeness (arbitrary user logic). String parsing +
    integer compare is exact on both engines, so even this boundary is
    oracle-checked."""

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


@query(
    "udf_pandas",
    oracle="""
    SELECT o_orderkey, (o_totalprice - 150000.0) / 50000.0 AS price_z
    FROM orders ORDER BY o_orderkey LIMIT 100
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (~10-100× the row UDF): z-score
    of order totals against broadcast-side constants. The UDF emits the
    RAW IEEE quotient — numpy executes the identical double subtract +
    divide the oracle does, so repr-level hash equality holds with no
    rounding contract (a .round(6) here would be numpy HALF-EVEN vs SQL
    HALF-UP — the exact trap the module docstring bans)."""

    @F.pandas_udf(T.DoubleType())
    def zscore(v: pd.Series) -> pd.Series:
        # constants baked at plan time would be better; shown as a pure
        # vectorized transform over each Arrow batch
        return (v - 150000.0) / 50000.0

    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", zscore(F.col("o_totalprice")).alias("price_z")
    ).orderBy("o_orderkey").limit(100)


@query(
    "udaf_grouped",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    core AS (
      SELECT event_type, cents, n,
             CAST(floor(n * 0.1) AS BIGINT) AS k
      FROM c
      WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1)
    )
    SELECT event_type,
           (CAST(SUM(cents) AS DOUBLE) / COUNT(*)) / 100.0 AS trimmed_mean,
           COUNT(*) AS n_used
    FROM core GROUP BY event_type
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pandas aggregation (applyInPandas): per-event-type 10%
    trimmed mean — logic no builtin aggregate expresses. Float contract:
    values quantize to integer cents via floor(v*100 + 0.5) (HALF-UP,
    expressible identically in numpy and SQL — np.round would be
    half-even), the trimmed sum is exact int64, and the only floating
    ops are the (sum/n)/100 division chain both engines execute
    identically. Trimming drops the k smallest/largest VALUES, which is
    tie-order-independent, so the pandas sort and the SQL row_number
    agree on the surviving multiset."""

    def trimmed(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"].sort_values()
        k = int(len(v) * 0.1)
        core = v.iloc[k : len(v) - k] if len(v) > 2 * k else v
        cents = np.floor(core.to_numpy() * 100 + 0.5).astype("int64")
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "trimmed_mean": [(float(cents.sum()) / len(cents)) / 100.0],
                "n_used": [len(cents)],
            }
        )

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return ev.groupBy("event_type").applyInPandas(
        trimmed, "event_type string, trimmed_mean double, n_used long"
    )


@query(
    "udtf_flatmap",
    oracle=r"""
    SELECT tok AS token, COUNT(*) AS n_occurrences
    FROM (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    )
    GROUP BY tok
    """,
)
def udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function (1→N rows) via mapInPandas: explode each document
    into (doc_id, token, position) rows in pure Python — the shape used
    when tokenization needs a real tokenizer library. Python's
    str.split() (any-whitespace, no empties) matches the oracle's
    regex split of trimmed text; counts are exact integers."""

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


@query(
    "udtf_lateral",
    oracle=r"""
    SELECT CAST(len(tok) AS BIGINT) AS token_len,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
    FROM (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    )
    GROUP BY 1
    """,
)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Spark 4 Python UDTF surface (``@udtf`` class +
    ``spark.udtf.register`` + SQL ``LATERAL``) — udtf_flatmap above
    covers the 1→N *shape* via mapInPandas; this entry covers the
    *API*: a registered table function callable from SQL, the form a
    user migrating UDTF code actually writes. The class yields
    (token, length) rows per document; the query rolls them up to a
    token-length histogram with distinct counts — exact integers, so
    the Python-boundary crossing is fully hash-checkable (the
    udf_arrow principle applied to table functions).

    Scale shape: UDTFs execute per-partition like any Python worker
    stage (Arrow-batched rows in, generator rows out) — the corpus
    never collects; the rollup partial-aggregates. The pure-SQL
    equivalent (explode) beats a UDTF when expressible — this entry
    exists because real tokenizers aren't expressible, and the API is
    the contract being proven."""
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="token string, token_len int")
    class SplitWords:
        def eval(self, text: str):  # noqa: ANN001
            for tok in str(text).lower().split():
                yield tok, len(tok)

    spark.udtf.register("pis_split_words", SplitWords)
    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("pis_udtf_docs")
    return spark.sql(
        """
        SELECT CAST(t.token_len AS BIGINT) AS token_len,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT t.token) AS BIGINT) AS n_distinct
        FROM pis_udtf_docs d,
             LATERAL pis_split_words(d.text) t
        GROUP BY t.token_len
        """
    )
