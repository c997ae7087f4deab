"""Spatial ingest path: WKB geometry columns + the PostGIS sink adapter.

The reference's spatial machinery (SURVEY §1.2): GeoParquet metadata
probe (app.py:72-77), dtype-heuristic WKB detection (app.py:136-157),
name-heuristic fallback — any column literally named ``geometry`` is
treated as WKB (app.py:169-175), CRS defaulting to EPSG:4326
(app.py:164), and `to_postgis` writes (app.py:181).

Spark has no native geometry type (SURVEY §1.3); geometry stays a WKB
``BinaryType`` column + CRS convention, decoded only at the edges:

- the WKB codecs below are self-contained vectorized pandas UDFs
  (pure struct packing — no shapely/GDAL): a lon/lat fast path for
  Point columns plus a general Point/LineString/Polygon pair
  (``wkb_geom_encode``/``wkb_geom_decode``) covering the geometry
  classes the reference ingests via ``gpd.GeoSeries.from_wkb``; swap
  shapely into the same UDF shape for the exotic types
  (Multi*/GeometryCollection);
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


_GEOM_STRUCT = T.StructType(
    [
        T.StructField("gtype", T.StringType()),
        T.StructField(
            "rings",
            T.ArrayType(T.ArrayType(_POINT_STRUCT)),
        ),
    ]
)

_WKB_TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon"}


def wkb_geom_encode(gtype: Column, rings: Column) -> Column:
    """(gtype, rings) → WKB bytes for Point / LineString / Polygon —
    pure struct packing, no shapely/GDAL, matching the generality of the
    reference's ``gpd.GeoSeries.from_wkb`` ingest (app.py:148,
    app.py:172) for the three core geometry classes.

    ``rings`` is array<array<struct<lon,lat>>>: Point = one ring of one
    vertex, LineString = one ring, Polygon = outer ring first then
    holes. Unknown gtype or empty rings → NULL (tolerant posture).

    The nested rings flatten Spark-side to (ring_sizes, lons, lats) —
    three flat arrays — before crossing the Arrow boundary: PySpark's
    pandas converter np.array()s nested arrays and rejects RAGGED ring
    lists (a polygon whose hole has a different vertex count), and flat
    double arrays are cheaper to transfer anyway. Self-contained
    closure (executor workers don't import this package).
    """
    from pyspark.sql.functions import pandas_udf

    ring_sizes = F.transform(rings, lambda ring: F.size(ring))
    lons = F.flatten(
        F.transform(rings, lambda ring: F.transform(ring, lambda p: p["lon"]))
    )
    lats = F.flatten(
        F.transform(rings, lambda ring: F.transform(ring, lambda p: p["lat"]))
    )

    @pandas_udf(T.BinaryType())
    def _enc(
        gtype_s: pd.Series,
        sizes_s: pd.Series,
        lons_s: pd.Series,
        lats_s: pd.Series,
    ) -> pd.Series:
        import struct

        codes = {"Point": 1, "LineString": 2, "Polygon": 3}
        out = []
        for gt, sizes, lons_v, lats_v in zip(gtype_s, sizes_s, lons_s, lats_s):
            try:
                code = codes[gt]
                pts = list(zip(map(float, lons_v), map(float, lats_v)))
                rr, off = [], 0
                for n in sizes:
                    rr.append(pts[off : off + n])
                    off += n
                if code == 1:
                    (x, y) = rr[0][0]
                    out.append(struct.pack("<BIdd", 1, 1, x, y))
                elif code == 2:
                    out.append(
                        struct.pack("<BII", 1, 2, len(rr[0]))
                        + b"".join(struct.pack("<dd", x, y) for x, y in rr[0])
                    )
                else:
                    body = b"".join(
                        struct.pack("<I", len(ring))
                        + b"".join(struct.pack("<dd", x, y) for x, y in ring)
                        for ring in rr
                    )
                    out.append(struct.pack("<BII", 1, 3, len(rr)) + body)
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    return _enc(gtype, ring_sizes, lons, lats)


def wkb_geom_decode(wkb: Column) -> Column:
    """WKB bytes → struct<gtype, rings> for Point / LineString /
    Polygon, either byte order; NULL for other types or malformed
    payloads (the tolerant posture of the reference's retry ladder,
    app.py:114-122). The 2.5D/SRID flag bits (0x80000000 / 0x20000000
    EWKB) are rejected rather than misread."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_GEOM_STRUCT)
    def _dec(wkb_s: pd.Series) -> pd.DataFrame:
        import struct

        names = {1: "Point", 2: "LineString", 3: "Polygon"}
        gtypes, all_rings = [], []
        for raw in wkb_s:
            try:
                b = bytes(raw)
                endian = "<" if b[0] == 1 else ">"
                (gcode,) = struct.unpack_from(endian + "I", b, 1)
                name = names[gcode]  # KeyError → malformed
                if gcode == 1:
                    x, y = struct.unpack_from(endian + "dd", b, 5)
                    rings = [[(x, y)]]
                    end = 5 + 16
                elif gcode == 2:
                    (n,) = struct.unpack_from(endian + "I", b, 5)
                    coords = struct.unpack_from(endian + "d" * (2 * n), b, 9)
                    rings = [list(zip(coords[0::2], coords[1::2]))]
                    end = 9 + 16 * n
                else:
                    (nr,) = struct.unpack_from(endian + "I", b, 5)
                    off = 9
                    rings = []
                    for _ in range(nr):
                        (n,) = struct.unpack_from(endian + "I", b, off)
                        coords = struct.unpack_from(
                            endian + "d" * (2 * n), b, off + 4
                        )
                        rings.append(list(zip(coords[0::2], coords[1::2])))
                        off += 4 + 16 * n
                    end = off
                if end != len(b):
                    raise ValueError("trailing bytes")
                gtypes.append(name)
                all_rings.append(
                    [
                        [{"lon": x, "lat": y} for x, y in ring]
                        for ring in rings
                    ]
                )
            except Exception:
                gtypes.append(None)
                all_rings.append(None)
        # explicit object dtype: ragged ring lists must never be
        # coerced through a numpy ndarray (inhomogeneous-shape error)
        return pd.DataFrame(
            {
                "gtype": pd.Series(gtypes, dtype=object),
                "rings": pd.Series(all_rings, dtype=object),
            }
        )

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
