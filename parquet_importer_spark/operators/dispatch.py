"""Plan-time type dispatch.

The reference inspects pandas dtypes per chunk at runtime to decide how
to treat each column (app.py:136-157: object/category/string → maybe WKB
bytes → decode; else cast). In Spark the schema is static, so the same
dispatch happens ONCE while building the logical plan — zero runtime cost
and it never breaks whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_by_type(df: DataFrame) -> DataFrame:
    """Schema-driven column normalization — the Spark analog of the
    reference's dtype-heuristic loop:

    - binary    → hex string (the WKB-ish opaque-bytes path, app.py:147)
    - string    → trimmed
    - timestamp → truncated to seconds (parity-stable precision)
    - numeric   → unchanged
    """
    cols: list[Column] = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.BinaryType):
            cols.append(F.hex(c).alias(field.name))
        elif isinstance(field.dataType, T.StringType):
            cols.append(F.trim(c).alias(field.name))
        elif isinstance(
            field.dataType, (T.TimestampType, T.TimestampNTZType)
        ):
            # NTZ included: parquet TIMESTAMP without zone reads back as
            # TIMESTAMP_NTZ under the UTC session and previously fell
            # through undispatched (caught by the round-5 oracle)
            cols.append(F.date_trunc("second", c).alias(field.name))
        else:
            cols.append(c)
    return df.select(*cols)
