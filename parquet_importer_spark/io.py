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
from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@_lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Footer-only probe for TIMESTAMP(NANOS) columns (O(1), no data scan
    — same trick as the reference's metadata reads, app.py:91)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


#: memoized source DataFrames, keyed by (session, resolved path). A
#: DataFrame is an immutable logical plan, so handing every caller the
#: same object is safe — and skips re-listing the file and re-reading
#: its footer on each of the suite's ~100 query constructions (the
#: engine analog of resolving a catalog table once).
_READ_CACHE: dict[tuple[int, str], DataFrame] = {}
# value keeps the DataFrame alive so its id() is never recycled
_PARTITIONS_CACHE: dict[tuple[int, int], tuple[DataFrame, int]] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. Schema comes from the parquet footer
    (the distributed analog of the reference's 1-row probe, app.py:72).

    Parquet TIMESTAMP(NANOS) (e.g. ``events.ts``) is illegal for Spark's
    vectorized reader; those columns are read as nano-epoch longs
    (``legacy.parquet.nanosAsLong``) and truncated to µs TimestampType —
    the same precision Spark would keep anyway.
    """
    path = os.path.normpath(table_path(sf_dir, name))
    key = (id(spark), path)
    cached = _READ_CACHE.get(key)
    if cached is not None:
        return cached
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    _READ_CACHE[key] = df
    return df


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def parallelize(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a CPU-bound pipeline gets full parallelism.

    A small parquet file (single row group) scans as ONE task, so
    per-row-heavy operators (md5 minhash passes, cosine folds) run
    single-threaded no matter how many cores exist. Repartition up to
    ``defaultParallelism`` — but ONLY when the scan is under-split:
    at production scale the input already has thousands of splits and
    this is a no-op (never shrink parallelism, never add a shuffle).

    KNOWN HAZARD (round 10, caught by the 1000× ladder): the
    under-split check counts BYTE-RANGE splits, but Spark's vectorized
    parquet reader assigns whole ROW GROUPS to splits — a file with
    few huge row groups (e.g. a 1.3 GB file pyarrow wrote as two
    1M-row groups) reports 32 partitions while 30 of them read zero
    rows, and the map stage silently runs at parallelism 2. The
    fixture writer now emits sane row groups
    (tools/make_scale_fixture.py); for wild inputs the detection
    would need footer row-group stats (rows per LOADED split, not
    split count) — recorded as round-11 work. Symptom to recognize:
    a CPU-bound stage with N tasks where task time concentrates in
    #row-groups of them."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    key = (id(spark), id(df._jdf))
    hit = _PARTITIONS_CACHE.get(key)
    if hit is not None and hit[0] is df:
        n = hit[1]
    else:
        # getNumPartitions plans a job driver-side (~100 ms) — memoize it
        # per plan object (read_table hands out stable objects, so repeat
        # constructions of the same query hit this cache)
        n = df.rdd.getNumPartitions()
        _PARTITIONS_CACHE[key] = (df, n)
    if n < target:
        return df.repartition(target)
    return df


def footer_rowcount(path: str) -> int:
    """O(1) row count from parquet footer metadata — no data scan
    (reference app.py:91 does this via pyarrow; same trick here)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows
