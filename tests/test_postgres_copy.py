"""Live Postgres COPY-sink integration (sources/postgres_copy).

Unlike test_postgis_live.py (which needs an externally provided
PostGIS server and skips here), these tests run LIVE in this image:
the harness initdb's a scratch Postgres 15 cluster (socket-only,
trust) once per session and tears it down at exit. Covered: the three
reference write modes, full-content round-trip fidelity, per-type CSV
↔ Postgres encoding (nulls, decimals, timestamps, dates, booleans,
bytea), and parallel multi-partition COPY streams.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from parquet_importer_spark.io import read_table
from parquet_importer_spark.sources.postgres_copy import (
    _run_psql,
    copy_into_postgres,
    read_back,
    scratch_server,
)


@pytest.fixture(scope="module")
def dsn():
    d = scratch_server()
    if d is None:
        pytest.skip("no startable Postgres in this environment")
    return d


def _count(dsn, table: str) -> int:
    return int(_run_psql(dsn, f"SELECT COUNT(*) FROM {table}").strip())


def test_modes_fail_replace_append(spark, dsn, sf_dir):
    n = read_table(spark, sf_dir, "nation")
    total = copy_into_postgres(n, dsn, "t_modes", mode="replace")
    assert total == n.count() == _count(dsn, "t_modes")
    copy_into_postgres(n, dsn, "t_modes", mode="append")
    assert _count(dsn, "t_modes") == 2 * total
    with pytest.raises(RuntimeError, match="already exists"):
        copy_into_postgres(n, dsn, "t_modes", mode="fail")
    copy_into_postgres(n, dsn, "t_modes", mode="replace")
    assert _count(dsn, "t_modes") == total
    _run_psql(dsn, "DROP TABLE t_modes")


def test_full_content_roundtrip(spark, dsn, sf_dir):
    n = read_table(spark, sf_dir, "nation")
    copy_into_postgres(n, dsn, "t_content", mode="replace", num_partitions=4)
    cols = ", ".join(f'"{c}"' for c in n.columns)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in n.schema.fields
    )
    back = read_back(
        spark, dsn, f"SELECT {cols} FROM t_content ORDER BY 1", schema
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, n.collect())
    )
    _run_psql(dsn, "DROP TABLE t_content")


def test_type_fidelity_with_nulls(spark, dsn):
    rows = [
        (
            1,
            "plain",
            Decimal("12.34"),
            datetime.datetime(2024, 2, 29, 23, 59, 59),
            datetime.date(1999, 12, 31),
            True,
            b"\x00\x01\xff",
            2.5,
        ),
        (
            2,
            'quote " comma , newline\nback \\ slash',
            None,
            None,
            None,
            False,
            None,
            None,
        ),
        (3, None, Decimal("-0.01"), None, None, None, b"", 1e-300),
    ]
    schema = (
        "id long, s string, d decimal(10,2), ts timestamp, dt date, "
        "b boolean, raw binary, f double"
    )
    df = spark.createDataFrame(rows, schema)
    copy_into_postgres(df, dsn, "t_types", mode="replace")
    back = read_back(
        spark,
        dsn,
        "SELECT id, s, d, ts, dt, b, encode(raw, 'hex'), f "
        "FROM t_types ORDER BY id",
        "id long, s string, d decimal(10,2), ts string, dt string, "
        "b boolean, raw_hex string, f double",
    ).collect()
    assert [r["s"] for r in back] == [
        "plain",
        'quote " comma , newline\nback \\ slash',
        None,
    ]
    assert [r["d"] for r in back] == [
        Decimal("12.34"),
        None,
        Decimal("-0.01"),
    ]
    assert back[0]["ts"] == "2024-02-29 23:59:59"
    assert back[0]["dt"] == "1999-12-31"
    assert [r["b"] for r in back] == [True, False, None]
    assert [r["raw_hex"] for r in back] == ["0001ff", None, ""]
    assert back[0]["f"] == 2.5 and back[2]["f"] == 1e-300
    _run_psql(dsn, "DROP TABLE t_types")


def test_parallel_partitions_load_once_each(spark, dsn, sf_dir):
    """8 concurrent COPY streams must neither lose nor duplicate rows."""
    o = read_table(spark, sf_dir, "orders")
    total = copy_into_postgres(o, dsn, "t_par", mode="replace", num_partitions=8)
    assert total == o.count()
    db = read_back(
        spark,
        dsn,
        "SELECT COUNT(*), COUNT(DISTINCT o_orderkey) FROM t_par",
        "n long, keys long",
    ).first()
    assert db["n"] == total
    assert db["keys"] == o.select("o_orderkey").distinct().count()
    _run_psql(dsn, "DROP TABLE t_par")
