"""Multimodal column plumbing (SURVEY §2.J llm_multimodal).

Media (image/audio/video) is carried as opaque ``binary`` payload
columns plus a typed metadata struct — the lakehouse-standard layout.
The Spark-side machinery here is real and tested: schemas, Arrow-batched
``mapInPandas`` decode/feature pipelines, partition sizing. The image
codec is FEATURE-FLAGGED: when Pillow imports on the executors the
decode/resize stages use it for payloads that actually parse as images,
and fall back to a deterministic, clearly-marked stub otherwise (this
container ships no image libs, so the stub path is what CI exercises —
``pil_available()`` reports which). Video frame extraction stays a
byte-slice stub (no ffmpeg anywhere); the 1→N plumbing is real.

Scale notes: payloads dominate partition bytes — size partitions by
``spark.sql.files.maxPartitionBytes`` (not row count), keep metadata in
separate small columns so pruned scans never touch payload pages
(parquet column chunks make that free), and never collect payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every media payload
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture: the
    text bytes stand in for an encoded media payload; metadata is real
    (computed from the payload with builtins, JVM-side)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("media_meta")
    )


def pil_available() -> bool:
    """True when Pillow imports in THIS interpreter (driver side; local
    mode shares the env with executors, a cluster should assert it on
    both)."""
    try:
        import PIL  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decode — deterministic fake dimensions derived from payload
    length. The executor closures embed the same formula as their
    fallback for non-image payloads / no-Pillow environments.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload batches.

    ``mapInPandas`` streams column batches through Python; each batch is
    a pandas DataFrame, so a real decoder would vectorize per batch.
    Entropy is computed for real; width/height use Pillow when it is
    importable on the executor AND the payload parses as an image,
    falling back to the deterministic stub otherwise.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NB: self-contained on purpose — executor Python workers may not
        # have this package on sys.path, so the closure must not reference
        # any module-level symbol from parquet_importer_spark
        import io
        from decimal import Decimal
        from math import log2

        import numpy as np

        try:
            from PIL import Image  # feature flag: real codec when present
        except ImportError:
            Image = None

        GRID8 = Decimal("0.00000001")

        def byte_entropy(b: bytes) -> float:
            """Shannon entropy of the byte histogram, in bits, under the
            suite's shared float contract (round-10 verdict item 8, the
            llm_char_entropy trick): each byte class contributes
            round(c * log2(c/n), 8) — ONE IEEE expression tree an SQL
            engine replicates verbatim — quantized onto the 8-decimal
            grid and accumulated EXACTLY as Decimal, so the sum is
            order-free (no numpy pairwise accumulation order to
            mismatch) and the final round(-sum/n, 6) is hashable."""
            n = len(b)
            if n == 0:
                return 0.0
            counts = np.bincount(np.frombuffer(b, dtype=np.uint8))
            acc = Decimal(0)
            for c in counts[counts > 0].tolist():
                acc += Decimal(round(c * log2(c / n), 8)).quantize(GRID8)
            return round(-float(acc) / n, 6)

        def decode_dims(payload: bytes) -> tuple[int, int]:
            if Image is not None:
                try:
                    with Image.open(io.BytesIO(payload)) as im:
                        return im.size
                except Exception:  # noqa: BLE001 — not an image: stub path
                    pass
            n = len(payload)
            return (n % 640) + 1, (n % 480) + 1

        for pdf in it:
            payloads = pdf["payload"]
            ent = []
            dims = []
            for raw in payloads:
                b = bytes(raw)
                ent.append(byte_entropy(b))
                dims.append(decode_dims(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "byte_entropy": ent,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return mm.mapInPandas(_batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)


def resize_media(mm: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize stage: payload in → downscaled payload out, 1:1 rows.

    Pillow-backed when importable on the executor and the payload parses
    as an image (thumbnail to ``max_dim``, re-encoded PNG out); the
    deterministic byte-stride stub handles everything else, so the
    mapInPandas plumbing, schema, and batch shape are exercised
    identically in both environments.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained: executor workers don't have this package
        import hashlib
        import io

        try:
            from PIL import Image  # feature flag: real codec when present
        except ImportError:
            Image = None

        def fake_resize(b: bytes, cap: int) -> tuple[int, int, bytes]:
            w, h = (len(b) % 640) + 1, (len(b) % 480) + 1
            scale = max(w, h) / cap if max(w, h) > cap else 1.0
            stride = max(int(scale), 1)
            return int(w / scale), int(h / scale), b[::stride]

        def do_resize(b: bytes, cap: int) -> tuple[int, int, bytes]:
            if Image is not None:
                try:
                    with Image.open(io.BytesIO(b)) as im:
                        im.thumbnail((cap, cap))
                        buf = io.BytesIO()
                        im.save(buf, format="PNG")
                        return im.size[0], im.size[1], buf.getvalue()
                except Exception:  # noqa: BLE001 — not an image: stub path
                    pass
            return fake_resize(b, cap)

        for pdf in it:
            rows = {"doc_id": [], "width": [], "height": [],
                    "resized": [], "resized_sha": []}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                w, h, out = do_resize(bytes(raw), max_dim)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["resized"].append(out)
                rows["resized_sha"].append(hashlib.sha256(out).hexdigest())
            yield pd.DataFrame(rows)

    return mm.mapInPandas(_batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
        T.StructField("n_frame_bytes", T.LongType()),
    ]
)


def sample_frames(mm: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage: video payload in → N frame rows out (1→N).

    STUB frame extraction (no ffmpeg here): the payload is cut into
    ``n_frames`` evenly spaced byte slices standing in for decoded
    frames — swap for an ffmpeg/pyav keyframe pull in production. The
    1→N mapInPandas fan-out (schema, batch shape, row explosion) is the
    production plumbing.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = {"doc_id": [], "frame_no": [], "frame_sha": [],
                    "n_frame_bytes": []}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(raw)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    frame = b[i * step : (i + 1) * step]
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame_sha"].append(hashlib.sha256(frame).hexdigest())
                    rows["n_frame_bytes"].append(len(frame))
            yield pd.DataFrame(rows)

    return mm.mapInPandas(_batches, FRAME_SCHEMA)
