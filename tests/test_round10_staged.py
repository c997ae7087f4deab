"""Multimodal oracle gates (staged round 10, LIVE since round 11).

Round 9/10 verdicts item 6/3: the resize and frames keys were rows-only
with their full-value DuckDB oracles staged HERE (pytest-proven with
the driver's own compare) while round 10's window budget went to the
stale burndown. Round 11 flipped them — plus llm_multimodal itself
(verdict item 8: the numpy pairwise byte-entropy sum was replaced by
the suite's shared decimal-grid float contract, see
operators/multimodal.py byte_entropy) — into the ``@query`` decorators
in suite/llm_multimodal.py. This module remains as the LOCAL gate: the
ASCII precondition that makes VARCHAR slicing equal byte slicing, and a
drive_entry-equivalent hash compare for each key so a regression is
caught before the driver window.

Oracle validity preconditions (both pinned below):
- the corpus is ASCII-only, so substring-by-chars IS substring-by-bytes
  and sha256(VARCHAR) hashes the same bytes Python's hashlib sees;
- text payloads never parse as images, so even a Pillow-present
  executor takes the deterministic byte-stride stubs the SQL mirrors.
"""

from __future__ import annotations

import hashlib

import duckdb

from tests.conftest import SF_ORACLE


def _vhash(pdf):
    # byte-identical to tools/drive_entry.py vhash — the driver's compare
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(repr(v) if isinstance(v, float) else str(v) for v in r)
        for r in pdf[cols].itertuples(index=False)
    )
    return hashlib.sha256(str(rows).encode()).hexdigest()[:12]


def _oracle_df(name: str):
    import parquet_importer_spark.suite  # noqa: F401 — populates registry
    from parquet_importer_spark.registry import ORACLES

    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW documents AS
            SELECT * FROM read_parquet('{SF_ORACLE}/documents.parquet')"""
    )
    return con.execute(ORACLES[name]).df()


def _drive_compare(spark, name: str, expect_rows: int | None = None):
    from parquet_importer_spark.suite import QUERIES

    sdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    odf = _oracle_df(name)
    assert len(sdf) == len(odf)
    if expect_rows is not None:
        assert len(sdf) == expect_rows
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _vhash(sdf) == _vhash(odf)


def test_corpus_is_ascii_so_varchar_slices_equal_byte_slices():
    """The oracles' validity precondition: every document's UTF-8 byte
    length equals its character length, so substring-by-chars IS
    substring-by-bytes and sha256(VARCHAR) hashes the same bytes
    Python's hashlib sees."""
    con = duckdb.connect()
    n_bad = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{SF_ORACLE}/documents.parquet')
            WHERE octet_length(encode(text)) <> length(text)"""
    ).fetchone()[0]
    assert n_bad == 0


def test_multimodal_oracles_are_registered():
    """The round-11 flip actually happened: all three keys carry live
    oracles in the registry (the driver reads the same dict)."""
    import parquet_importer_spark.suite  # noqa: F401 — populates registry
    from parquet_importer_spark.registry import ORACLES

    for name in (
        "llm_multimodal",
        "llm_multimodal_resize",
        "llm_multimodal_frames",
    ):
        assert name in ORACLES, f"{name} regressed to rows-only"


def test_multimodal_frames_oracle_hash_matches(spark):
    """Full drive_entry-equivalent gate: row count, column names, and
    value hash all match at the driver's SF."""
    _drive_compare(spark, "llm_multimodal_frames")


def test_multimodal_resize_oracle_hash_matches(spark):
    """Codec-independence precondition: text payloads are not images,
    so both Pillow-present and Pillow-absent executors take the
    deterministic byte-stride stub the live SQL mirrors."""
    _drive_compare(spark, "llm_multimodal_resize", expect_rows=1)


def test_multimodal_feature_oracle_hash_matches(spark):
    """Round-10 verdict item 8: byte_entropy under the decimal-grid
    contract hashes repr-exactly against the DuckDB replication —
    per-row doubles, not an aggregate, so this is the strictest float
    gate in the suite."""
    _drive_compare(spark, "llm_multimodal")


def test_byte_entropy_contract_edge_cases():
    """The Python-side term walk is exact on the grid: empty payload →
    0.0; single-class payload → entropy 0.0; two equal classes → 1 bit;
    and the Decimal accumulation is order-free by construction."""
    from parquet_importer_spark.operators import multimodal as mm  # noqa: F401
    # the closure is deliberately self-contained inside extract_features;
    # replicate the contract here to pin its arithmetic
    from decimal import Decimal
    from math import log2

    def ref_entropy(b: bytes) -> float:
        n = len(b)
        if n == 0:
            return 0.0
        counts: dict[int, int] = {}
        for x in b:
            counts[x] = counts.get(x, 0) + 1
        acc = Decimal(0)
        for c in sorted(counts.values()):
            acc += Decimal(round(c * log2(c / n), 8)).quantize(
                Decimal("0.00000001")
            )
        return round(-float(acc) / n, 6)

    assert ref_entropy(b"") == 0.0
    assert ref_entropy(b"aaaa") == 0.0
    assert ref_entropy(b"aabb") == 1.0
    assert ref_entropy(b"abcd") == 2.0
    # 3/4-1/4 split: -(0.75*log2(0.75) + 0.25*log2(0.25)) ≈ 0.811278
    assert ref_entropy(b"aaab") == 0.811278
