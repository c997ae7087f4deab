"""Feature-flagged multimodal codec: whichever path this environment has
(Pillow or the deterministic stub) must produce the declared schema and
values; the stub fallback for non-image payloads is exercised always."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_importer_spark.operators.multimodal import (
    extract_features,
    pil_available,
    resize_media,
)


def _mm_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_stub_path_on_non_image_payloads(spark):
    """Text bytes never parse as an image, so with or without Pillow the
    deterministic stub formula must hold: width=(n%640)+1, height=(n%480)+1."""
    payload = b"not an image at all" * 3  # 57 bytes
    out = extract_features(_mm_frame(spark, [(1, payload)])).collect()
    assert len(out) == 1
    n = len(payload)
    assert (out[0].width, out[0].height) == ((n % 640) + 1, (n % 480) + 1)
    assert out[0].n_bytes == n


def test_real_codec_path_when_pil_present(spark):
    """With Pillow installed, a genuine PNG must decode to its true
    dimensions and resize under max_dim; without it, the same payload
    takes the stub path — either way the pipeline schema holds."""
    if pil_available():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (320, 200), (10, 20, 30)).save(buf, format="PNG")
        png = buf.getvalue()
        feats = extract_features(_mm_frame(spark, [(7, png)])).collect()[0]
        assert (feats.width, feats.height) == (320, 200)
        resized = resize_media(_mm_frame(spark, [(7, png)]), max_dim=64).collect()[0]
        assert max(resized.width, resized.height) <= 64
        assert Image.open(io.BytesIO(bytes(resized.resized))).size == (
            resized.width,
            resized.height,
        )
    else:
        png_like = b"\x89PNG\r\n\x1a\n" + b"\x00" * 100  # magic but truncated
        feats = extract_features(_mm_frame(spark, [(7, png_like)])).collect()[0]
        n = len(png_like)
        assert (feats.width, feats.height) == ((n % 640) + 1, (n % 480) + 1)


def test_resize_stub_deterministic(spark):
    payload = bytes(range(256)) * 4  # 1024 bytes
    r1 = resize_media(_mm_frame(spark, [(1, payload)]), max_dim=64).collect()[0]
    r2 = resize_media(_mm_frame(spark, [(1, payload)]), max_dim=64).collect()[0]
    assert r1.resized_sha == r2.resized_sha
    assert r1.width <= 640 and r1.height <= 480


def test_entropy_is_real_not_stubbed(spark):
    """byte_entropy is computed for real in both environments: uniform
    bytes → 8 bits, constant bytes → 0."""
    out = {
        r.doc_id: r.byte_entropy
        for r in extract_features(
            _mm_frame(spark, [(1, bytes(range(256)) * 16), (2, b"\x00" * 4096)])
        ).collect()
    }
    assert abs(out[1] - 8.0) < 1e-9
    assert out[2] == 0.0


def test_pil_available_reports_import_truth():
    try:
        import PIL  # noqa: F401

        expected = True
    except ImportError:
        expected = False
    assert pil_available() is expected
