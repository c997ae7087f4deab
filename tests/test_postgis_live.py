"""Live PostGIS integration — skipped unless a server is reachable.

The sandbox has no PostGIS (VERDICT r3: the DDL dry-run in
sink_postgis plus the live-Derby JDBC round-trip cover what is
coverable offline). The day an environment provides one, point
``PIS_POSTGIS_JDBC_URL`` at it (e.g.
``jdbc:postgresql://host:5432/db?user=u&password=p``) and this test
exercises the full staging adapter for real: bytea JDBC write →
postgis_promote_ddl → typed geometry read-back.
"""

from __future__ import annotations

import os

import pytest

from parquet_importer_spark.io import read_table
from parquet_importer_spark.sources.sinks import write_jdbc
from parquet_importer_spark.sources.spatial import (
    postgis_promote_ddl,
    wkb_point_encode,
)

SF = "/root/testdata/sf0.001"
URL_ENV = "PIS_POSTGIS_JDBC_URL"


def _connect(spark, url: str):
    """JVM-side JDBC connection (no Python pg client in this image);
    returns None when the server is unreachable or the driver absent."""
    try:
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
        return conn
    except Exception:  # noqa: BLE001 — any failure means "not reachable"
        return None


def test_postgis_staging_adapter_live(spark):
    url = os.environ.get(URL_ENV)
    if not url:
        pytest.skip(f"{URL_ENV} not set — no PostGIS server in this environment")
    conn = _connect(spark, url)
    if conn is None:
        pytest.skip(f"PostGIS at {URL_ENV} not reachable")
    try:
        from pyspark.sql import functions as F

        ev = read_table(spark, SF, "events").limit(100)
        pts = ev.select(
            "event_id",
            (F.col("value") % 360 - 180).alias("lon"),
            (F.col("value") % 180 - 90).alias("lat"),
        )
        staged = pts.withColumn(
            "geometry", wkb_point_encode(F.col("lon"), F.col("lat"))
        ).select("event_id", "geometry")
        write_jdbc(staged, url, "pis_spatial_it", mode="replace")

        st = conn.createStatement()
        for stmt in postgis_promote_ddl("pis_spatial_it", "geometry"):
            st.execute(stmt)
        rs = st.executeQuery(
            "SELECT COUNT(*) FROM pis_spatial_it "
            "WHERE ST_SRID(geometry) = 4326 AND ST_X(geometry) IS NOT NULL"
        )
        rs.next()
        assert rs.getLong(1) == 100
        st.execute("DROP TABLE pis_spatial_it")
    finally:
        conn.close()
