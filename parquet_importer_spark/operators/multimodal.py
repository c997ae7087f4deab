"""Multimodal column plumbing (SURVEY §2.J llm_multimodal).

Media (image/audio/video) is carried as opaque ``binary`` payload
columns plus a typed metadata struct — the lakehouse-standard layout.
The Spark-side machinery here is real and tested: schemas, Arrow-batched
``mapInPandas`` decode/feature pipelines, partition sizing. The actual
codec calls are STUBBED (this container ships no image/audio libs) with
a deterministic fake, clearly marked — swap ``_fake_decode`` for a PIL/
ffmpeg call in production; nothing else changes.

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


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decode — deterministic fake dimensions derived from payload
    length. Replace with e.g. ``PIL.Image.open(io.BytesIO(payload)).size``
    in production; the surrounding pipeline is unchanged.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload batches.

    ``mapInPandas`` streams column batches through Python; each batch is
    a pandas DataFrame, so a real decoder would vectorize per batch.
    Entropy is computed for real; width/height come from the stub.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NB: self-contained on purpose — executor Python workers may not
        # have this package on sys.path, so the closure must not reference
        # any module-level symbol from parquet_importer_spark
        import numpy as np

        def fake_decode(payload: bytes) -> tuple[int, int]:
            n = len(payload)
            return (n % 640) + 1, (n % 480) + 1

        for pdf in it:
            payloads = pdf["payload"]
            ent = []
            dims = []
            for raw in payloads:
                b = bytes(raw)
                if b:
                    counts = np.bincount(
                        np.frombuffer(b, dtype=np.uint8), minlength=256
                    )
                    p = counts[counts > 0] / len(b)
                    ent.append(float(-(p * np.log2(p)).sum()))
                else:
                    ent.append(0.0)
                dims.append(fake_decode(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "byte_entropy": [round(e, 6) for e in ent],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return mm.mapInPandas(_batches, FEATURE_SCHEMA)
