"""Round-10 staged work.

1. llm_multimodal_frames oracle, STAGED (round-9 verdict item 6): the
   frame-sampling key is rows-only today, but its byte-slice formula is
   codec-INDEPENDENT by construction — sample_frames never consults
   Pillow (there is no ffmpeg path at all), so frame hashes, byte
   counts, and the 1→N fan-out are pure functions of the payload bytes
   and replicable in SQL. The corpus is ASCII-only (pinned below), so
   DuckDB's VARCHAR substring/sha256 equal byte-slice semantics exactly
   and the oracle needs no BLOB functions (this DuckDB has none).

   The oracle ships HERE (pytest-proven, drive_entry-identical compare)
   instead of in the @query decorator because flipping a rows-only key
   to oracle-backed re-enters it into the driver window at the
   oracle-upgrade tier — and round 10's window budget is exactly
   consumed by the 49 stale r3/r4 re-checks the round-9 verdict made
   its top item (60 stale keys, 49 non-sentinel slots, zero spare).
   Round 11 has ~38 free slots: move STAGED_FRAMES_ORACLE into
   llm_multimodal_frames' @query decorator there, delete this note,
   and keep the test as the local gate.

2. llm_multimodal_resize oracle, STAGED (round 10, same deferral
   logic): the resize key is ALSO codec-independent on this corpus —
   text payloads never parse as images, so even a Pillow-present
   executor takes the byte-stride stub (operators/multimodal.py
   fake_resize), and every stub step is a single IEEE op (one double
   divide for scale, one for width/height, floor-truncations, byte
   stride b[::stride]) with no accumulation — exactly replicable in
   SQL. ASCII pinning makes the strided VARCHAR's sha256 equal
   hashlib's over the strided bytes. Flip with frames in round 11.

   llm_multimodal (the feature-extract key) stays rows-only by
   necessity even at ASCII: its byte_entropy is a numpy pairwise sum
   over the byte-histogram probabilities, and numpy's pairwise
   accumulation order is not expressible as a SQL aggregate — the
   round(·, 6) would mask most ULP drift but cannot guarantee the
   hash, and a flaky oracle is worse than a rows-only row.
"""

from __future__ import annotations

import hashlib

import duckdb

from tests.conftest import SF_ORACLE

# Mirrors operators/multimodal.py sample_frames (n_frames=4):
# step = max(len(b) // 4, 1); frame i = b[i*step : (i+1)*step].
# Python slices clamp: past-the-end slices are empty — substring with a
# start beyond the string returns '' and sha256('') == sha256(b'').
STAGED_FRAMES_ORACLE = """
WITH d AS (
  SELECT doc_id, text,
         GREATEST(octet_length(encode(text)) // 4, 1) AS step
  FROM documents
),
fr AS (
  SELECT d.doc_id, i.frame_no,
         sha256(substring(d.text, i.frame_no * d.step + 1, d.step))
           AS frame_sha,
         CAST(length(substring(d.text, i.frame_no * d.step + 1, d.step))
              AS BIGINT) AS n_frame_bytes
  FROM d CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS frame_no) i
)
SELECT frame_no,
       COUNT(*) AS n_frames,
       COUNT(DISTINCT frame_sha) AS n_distinct_frames,
       CAST(SUM(n_frame_bytes) AS BIGINT) AS total_bytes
FROM fr GROUP BY frame_no ORDER BY frame_no
"""


# Mirrors operators/multimodal.py fake_resize (max_dim=64) on the stub
# path every corpus payload takes: w=(n%640)+1, h=(n%480)+1,
# scale = max(w,h)/64.0 when max(w,h)>64 else 1.0 (one IEEE divide),
# width/height = int(w/scale) (floor for positives), stride =
# max(int(scale),1), resized = b[::stride] → sha256. range(1, n+1,
# stride) enumerates the 1-based strided character positions.
STAGED_RESIZE_ORACLE = """
WITH d AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n
  FROM documents
),
dims AS (
  SELECT doc_id, text, n,
         (n % 640) + 1 AS w,
         (n % 480) + 1 AS h
  FROM d
),
scaled AS (
  SELECT doc_id, text, n, w, h,
         CASE WHEN GREATEST(w, h) > 64
              THEN GREATEST(w, h) / 64.0 ELSE 1.0 END AS scale
  FROM dims
),
resized AS (
  SELECT doc_id,
         CAST(FLOOR(w / scale) AS INT) AS width,
         CAST(FLOOR(h / scale) AS INT) AS height,
         sha256(array_to_string(
           list_transform(range(1, n + 1,
                                GREATEST(CAST(FLOOR(scale) AS BIGINT), 1)),
                          i -> text[i:i]), '')) AS resized_sha
  FROM scaled
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT resized_sha) AS BIGINT) AS n_distinct_payloads,
       MAX(width) AS max_width,
       MAX(height) AS max_height
FROM resized
"""


def _vhash(pdf):
    # byte-identical to tools/drive_entry.py vhash — the driver's compare
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(repr(v) if isinstance(v, float) else str(v) for v in r)
        for r in pdf[cols].itertuples(index=False)
    )
    return hashlib.sha256(str(rows).encode()).hexdigest()[:12]


def test_corpus_is_ascii_so_varchar_slices_equal_byte_slices():
    """The oracle's validity precondition: every document's UTF-8 byte
    length equals its character length, so substring-by-chars IS
    substring-by-bytes and sha256(VARCHAR) hashes the same bytes
    Python's hashlib sees."""
    con = duckdb.connect()
    n_bad = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{SF_ORACLE}/documents.parquet')
            WHERE octet_length(encode(text)) <> length(text)"""
    ).fetchone()[0]
    assert n_bad == 0


def test_multimodal_frames_staged_oracle_hash_matches(spark):
    """Full drive_entry-equivalent gate for the staged oracle: row
    count, column names, and value hash all match at the driver's SF."""
    from parquet_importer_spark.suite import QUERIES

    sdf = QUERIES["llm_multimodal_frames"](spark, SF_ORACLE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW documents AS
            SELECT * FROM read_parquet('{SF_ORACLE}/documents.parquet')"""
    )
    odf = con.execute(STAGED_FRAMES_ORACLE).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _vhash(sdf) == _vhash(odf)


def test_multimodal_resize_staged_oracle_hash_matches(spark):
    """Full drive_entry-equivalent gate for the staged resize oracle:
    row count, column names, and value hash all match at the driver's
    SF. Codec-independence precondition: text payloads are not images,
    so both Pillow-present and Pillow-absent executors take the
    deterministic byte-stride stub this SQL mirrors."""
    from parquet_importer_spark.suite import QUERIES

    sdf = QUERIES["llm_multimodal_resize"](spark, SF_ORACLE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW documents AS
            SELECT * FROM read_parquet('{SF_ORACLE}/documents.parquet')"""
    )
    odf = con.execute(STAGED_RESIZE_ORACLE).df()
    assert len(sdf) == len(odf) == 1
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _vhash(sdf) == _vhash(odf)
