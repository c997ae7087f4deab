"""Semantic invariants for the round-5 operators, beyond oracle parity:
the general WKB codec roundtrips every geometry class bit-exactly and
rejects malformed payloads instead of misreading them."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _decode_one(spark, payload: bytes):
    from parquet_importer_spark.sources.spatial import wkb_geom_decode

    df = spark.createDataFrame([(payload,)], "wkb binary")
    return df.select(wkb_geom_decode(F.col("wkb")).alias("g")).first().g


def test_wkb_geom_roundtrip_all_types(spark):
    """encode→decode is the identity for Point, LineString, and Polygon
    (including a polygon with a hole), with doubles preserved exactly."""
    from parquet_importer_spark.sources.spatial import (
        wkb_geom_decode,
        wkb_geom_encode,
    )

    cases = [
        ("Point", [[(1.5, -2.25)]]),
        ("LineString", [[(0.0, 0.0), (10.125, -5.5), (7.0, 3.75)]]),
        (
            "Polygon",
            [
                [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0)],
            ],
        ),
    ]
    rows = [
        (
            gt,
            [[{"lon": x, "lat": y} for x, y in ring] for ring in rings],
        )
        for gt, rings in cases
    ]
    df = spark.createDataFrame(
        rows,
        "gtype string, rings array<array<struct<lon:double,lat:double>>>",
    )
    back = df.select(
        "gtype",
        "rings",
        wkb_geom_decode(
            wkb_geom_encode(F.col("gtype"), F.col("rings"))
        ).alias("g"),
    ).collect()
    assert len(back) == 3
    for r in back:
        assert r.g.gtype == r.gtype
        got = [[(p.lon, p.lat) for p in ring] for ring in r.g.rings]
        want = [[(p.lon, p.lat) for p in ring] for ring in r.rings]
        assert got == want, f"{r.gtype} vertices drifted"


def test_wkb_geom_decode_big_endian(spark):
    """The decoder honors the byte-order marker: a big-endian LineString
    decodes identically to its little-endian twin."""
    pts = [(1.0, 2.0), (3.0, 4.0)]
    be = struct.pack(">BII", 0, 2, len(pts)) + b"".join(
        struct.pack(">dd", x, y) for x, y in pts
    )
    g = _decode_one(spark, be)
    assert g.gtype == "LineString"
    assert [(p.lon, p.lat) for p in g.rings[0]] == pts


def test_wkb_geom_decode_rejects_malformed(spark):
    """Unknown geometry codes, truncated buffers, trailing garbage, and
    EWKB flag bits all decode to NULL — never to a wrong geometry."""
    point = struct.pack("<BIdd", 1, 1, 1.0, 2.0)
    bad = [
        struct.pack("<BIdd", 1, 7, 1.0, 2.0),  # MultiPolygon unsupported
        point[:-4],  # truncated
        point + b"\x00",  # trailing byte
        struct.pack("<BIdd", 1, 0x80000001, 1.0, 2.0),  # 2.5D flag
        b"",
    ]
    for payload in bad:
        g = _decode_one(spark, payload)
        assert g is None or g.gtype is None, f"accepted malformed {payload!r}"


def test_spatial_roundtrip_query_exact(spark):
    """The registered spatial_wkb_roundtrip query reports one row per
    geometry class with zero decode failures and full exactness."""
    from parquet_importer_spark.suite import QUERIES

    rows = {
        r.gtype: r
        for r in QUERIES["spatial_wkb_roundtrip"](spark, SF).collect()
    }
    assert set(rows) == {"Point", "LineString", "Polygon"}
    for gt, r in rows.items():
        assert r.n_decode_failures == 0, gt
        assert r.n_exact_roundtrip == r.n_rows, gt
