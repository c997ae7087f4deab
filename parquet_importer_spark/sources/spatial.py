"""Spatial ingest path: WKB geometry columns + the PostGIS sink adapter.

The reference's spatial machinery (SURVEY §1.2): GeoParquet metadata
probe (app.py:72-77), dtype-heuristic WKB detection (app.py:136-157),
name-heuristic fallback — any column literally named ``geometry`` is
treated as WKB (app.py:169-175), CRS defaulting to EPSG:4326
(app.py:164), and `to_postgis` writes (app.py:181).

Spark has no native geometry type (SURVEY §1.3); geometry stays a WKB
``BinaryType`` column + CRS convention, decoded only at the edges:

- the WKB point codec below is a self-contained vectorized pandas UDF
  (pure struct packing — no shapely/GDAL needed for points; swap in
  shapely inside the same UDF for full geometry support);
- the PostGIS write is a two-phase staging adapter: bytea staging table
  via JDBC, then driver-side DDL promoting bytea → geometry with
  ST_GeomFromWKB — no new engine dependency (SURVEY §4 decision (a)).
"""

from __future__ import annotations

import json

import pandas as pd  # module-level: pandas_udf resolves stringified type hints here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_CRS = "EPSG:4326"  # reference fallback, app.py:164


def detect_geometry_columns(path: str) -> tuple[list[str], str]:
    """GeoParquet probe: read the footer's ``geo`` key-value metadata
    (no data scan — the distributed analog of app.py:72-77). Falls back
    to the name heuristic (app.py:169-175): a column named ``geometry``
    with binary type is assumed WKB, CRS EPSG:4326.
    Returns (geometry_column_names, crs).
    """
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    meta = schema.metadata or {}
    geo = meta.get(b"geo")
    if geo:
        spec = json.loads(geo)
        cols = list(spec.get("columns", {}))
        primary = spec.get("primary_column")
        crs_obj = (
            spec.get("columns", {}).get(primary, {}).get("crs") if primary else None
        )
        crs = crs_obj if isinstance(crs_obj, str) else DEFAULT_CRS
        return cols, crs
    # name-heuristic fallback
    for field in schema:
        if field.name == "geometry" and field.type.id in (14, 15):  # binary/large
            return ["geometry"], DEFAULT_CRS
    return [], DEFAULT_CRS


_POINT_STRUCT = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)


def wkb_point_encode(lon: Column, lat: Column) -> Column:
    """lon/lat → WKB point bytes, vectorized (Arrow batches).

    Self-contained closure (executor workers don't import this package).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _enc(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        import struct

        return pd.Series(
            [
                # little-endian byte order marker, type 1 = Point, x, y
                struct.pack("<BIdd", 1, 1, x, y)
                for x, y in zip(lon_s, lat_s)
            ],
            dtype=object,
        )

    return _enc(lon, lat)


def wkb_point_decode(wkb: Column) -> Column:
    """WKB point bytes → struct<lon,lat>, vectorized. Handles both byte
    orders; returns NULL for non-point or malformed payloads (the
    tolerant posture of the reference's retry ladder, app.py:114-122)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_POINT_STRUCT)
    def _dec(wkb_s: pd.Series) -> pd.DataFrame:
        import struct

        lons, lats = [], []
        for raw in wkb_s:
            try:
                b = bytes(raw)
                endian = "<" if b[0] == 1 else ">"
                (gtype,) = struct.unpack_from(endian + "I", b, 1)
                if gtype & 0xFF != 1:
                    raise ValueError("not a point")
                x, y = struct.unpack_from(endian + "dd", b, 5)
                lons.append(x)
                lats.append(y)
            except Exception:
                lons.append(None)
                lats.append(None)
        return pd.DataFrame({"lon": lons, "lat": lats})

    return _dec(wkb)


def postgis_promote_ddl(
    table: str, geometry_col: str = "geometry", srid: int = 4326
) -> list[str]:
    """Driver-side DDL promoting the staged bytea column to a real
    PostGIS geometry (phase 2 of the staging adapter; replaces
    geopandas' to_postgis, app.py:181). Executed over any pg client
    after the JDBC write lands."""
    tmp = f"{geometry_col}__geom"
    return [
        "CREATE EXTENSION IF NOT EXISTS postgis",  # app.py:59-61
        f'ALTER TABLE {table} ADD COLUMN {tmp} geometry',
        f"UPDATE {table} SET {tmp} = ST_SetSRID(ST_GeomFromWKB({geometry_col}), {srid})",
        f"ALTER TABLE {table} DROP COLUMN {geometry_col}",
        f'ALTER TABLE {table} RENAME COLUMN {tmp} TO {geometry_col}',
    ]


def ingest_spatial_parquet(spark, path: str) -> DataFrame:
    """Spatial-aware scan: probe geometry metadata, read, and attach a
    decoded lon/lat struct per detected geometry column (kept alongside
    the raw WKB — the query layer never needs the decode, SURVEY §7.4.5).
    """
    cols, crs = detect_geometry_columns(path)
    df = spark.read.parquet(path)
    for c in cols:
        df = df.withColumn(f"{c}_point", wkb_point_decode(F.col(c)))
    return df.withColumn("crs", F.lit(crs))
