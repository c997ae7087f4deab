"""§2.J — corpus filtering stages of a training-data pipeline:
Gopher-style rule filters, repetition detection, PII redaction.

All pure-builtin column expressions (codegen, zero shuffle — the only
data movement at 100 TB is writing the filtered output), mirroring the
public Gopher (Rae et al. 2021) / C4 quality-filter recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.functions.text import (
    STOPWORDS,
    lexicon_hits,
    shingles_all,
    tokens,
)
from parquet_importer_spark.io import parallelize, read_table
from parquet_importer_spark.registry import query

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)

# Gopher-shaped rule thresholds, tuned so the synthetic corpus splits
# (word counts 10–99, median 56 at sf0.01):
_MIN_TOK, _MAX_TOK = 20, 80
_MIN_TOKLEN, _MAX_TOKLEN = 2.0, 10.0
_MIN_STOP_HITS = 2
_MIN_ALPHA = 0.6


@query(
    "llm_filter_gopher",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(list_filter({_TOKS}, t -> t IN ({_STOP_IN})))
                  AS BIGINT) AS stop_hits,
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                  AS DOUBLE) AS n_alpha
      FROM documents
    )
    SELECT doc_id, n_tok,
           ROUND((n_chars - (n_tok - 1)) / n_tok, 6) AS mean_tok_len,
           stop_hits,
           ROUND(n_alpha / n_chars, 6) AS alpha_ratio,
           (n_tok BETWEEN {_MIN_TOK} AND {_MAX_TOK}) AS len_ok,
           ((n_chars - (n_tok - 1)) / n_tok BETWEEN {_MIN_TOKLEN} AND {_MAX_TOKLEN})
             AS tok_len_ok,
           (stop_hits >= {_MIN_STOP_HITS}) AS stop_ok,
           (n_alpha / n_chars >= {_MIN_ALPHA}) AS alpha_ok,
           ((n_tok BETWEEN {_MIN_TOK} AND {_MAX_TOK})
            AND ((n_chars - (n_tok - 1)) / n_tok
                 BETWEEN {_MIN_TOKLEN} AND {_MAX_TOKLEN})
            AND stop_hits >= {_MIN_STOP_HITS}
            AND n_alpha / n_chars >= {_MIN_ALPHA}) AS keep
    FROM m
    """,
)
def llm_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter: per-doc quality flags (word-count
    bounds, mean-word-length sanity, stopword presence, alpha-character
    ratio) plus the conjunctive keep decision. Pure narrow projection —
    a filtered 100 TB pass is scan + write, no shuffle."""
    d = parallelize(read_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("bigint")
    n_chars = F.length("text").cast("double")
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok
    stop_hits = lexicon_hits(F.col("text"), STOPWORDS)
    n_alpha = F.length(F.regexp_replace(F.lower("text"), r"[^a-z]", "")).cast(
        "double"
    )
    alpha_ratio = n_alpha / n_chars
    len_ok = n_tok.between(_MIN_TOK, _MAX_TOK)
    tok_len_ok = mean_tok_len.between(_MIN_TOKLEN, _MAX_TOKLEN)
    stop_ok = stop_hits >= _MIN_STOP_HITS
    alpha_ok = alpha_ratio >= _MIN_ALPHA
    return d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        stop_hits.alias("stop_hits"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        len_ok.alias("len_ok"),
        tok_len_ok.alias("tok_len_ok"),
        stop_ok.alias("stop_ok"),
        alpha_ok.alias("alpha_ok"),
        (len_ok & tok_len_ok & stop_ok & alpha_ok).alias("keep"),
    )


@query(
    "llm_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 3 THEN
               list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             ELSE [array_to_string(toks, ' ')] END AS grams
      FROM t
    )
    SELECT doc_id,
           ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
             AS dup_token_frac,
           ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
             AS dup_3gram_frac,
           (1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.5)
             AS repetitive
    FROM g
    """,
)
def llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition detector: duplicate-token and
    duplicate-3-gram fractions per doc (1 − distinct/total), flagging
    docs past a duplicate-token threshold. One pass of array builtins;
    the shingle arrays never leave the projection."""
    d = parallelize(read_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    grams = shingles_all(F.col("text"), 3)
    dup_tok = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    dup_gram = 1.0 - F.size(F.array_distinct(grams)).cast("double") / F.size(grams)
    return d.select(
        "doc_id",
        F.round(dup_tok, 6).alias("dup_token_frac"),
        F.round(dup_gram, 6).alias("dup_3gram_frac"),
        (dup_tok > 0.5).alias("repetitive"),
    )


# The synthetic corpus contains no real PII, so both engines append the
# SAME deterministic synthetic contact block (derived from doc_id) and
# then redact it — exercising the full pattern surface with nonzero
# counts while staying byte-reproducible.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE = r"\b\d{3}-\d{4}\b"


@query(
    "llm_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com phone 555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.0.' ||
             (doc_id % 256) || '.' || (doc_id % 100) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IP}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(
                 t, '{_EMAIL}', '<EMAIL>', 'g'),
                 '{_IP}', '<IP>', 'g'),
                 '{_PHONE}', '<PHONE>', 'g')) AS redacted_md5
    FROM aug
    """,
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrubbing (emails → IPs → phones, in that order) with
    per-doc match counts and an md5 of the redacted text proving the
    rewrite is byte-identical across engines. Pure codegen'd regexes —
    no shuffle; at 100 TB this is scan → project → write."""
    d = parallelize(read_table(spark, sf_dir, "documents"))
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com phone 555-"),
        F.lpad(F.pmod(F.col("doc_id"), 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        F.pmod(F.col("doc_id"), 256).cast("string"),
        F.lit("."),
        F.pmod(F.col("doc_id"), 100).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL, "<EMAIL>"), _IP, "<IP>"
        ),
        _PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(aug, F.lit(_IP)).cast("bigint").alias("n_ips"),
        F.regexp_count(aug, F.lit(_PHONE)).cast("bigint").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "llm_k_anonymity",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, source,
             CAST(floor(n_chars / 100) AS BIGINT) AS chars_b
      FROM documents
    ),
    g0 AS (
      SELECT lang, source, chars_b, CAST(COUNT(*) AS BIGINT) AS n0
      FROM d GROUP BY 1, 2, 3
    ),
    g1 AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n1
      FROM d GROUP BY 1, 2
    ),
    g2 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n2 FROM d GROUP BY 1)
    SELECT d.doc_id,
           CAST(CASE WHEN g0.n0 >= 5 THEN 0
                     WHEN g1.n1 >= 5 THEN 1
                     WHEN g2.n2 >= 5 THEN 2
                     ELSE 3 END AS INT) AS level,
           CASE WHEN g0.n0 >= 5 THEN g0.n0
                WHEN g1.n1 >= 5 THEN g1.n1
                WHEN g2.n2 >= 5 THEN g2.n2
                ELSE CAST(0 AS BIGINT) END AS group_size,
           (g0.n0 >= 5 OR g1.n1 >= 5 OR g2.n2 >= 5) AS k_anonymous
    FROM d
    JOIN g0 USING (lang, source, chars_b)
    JOIN g1 USING (lang, source)
    JOIN g2 USING (lang)
    """,
)
def llm_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity (k = 5) generalization ladder over the documents'
    quasi-identifiers — the privacy-side curation gate next to
    llm_pii_redact: a record is releasable only inside a group of ≥ k
    records sharing its quasi-identifier tuple, and records failing at
    a level GENERALIZE upward instead of being dropped outright.
    Ladder: level 0 = (lang, source, ⌊n_chars/100⌋) → level 1 drops
    the length bucket → level 2 keeps only lang → level 3 = suppress
    (no group protects it). Output per document: the first level whose
    group reaches k, that group's size, and the anonymity flag — the
    exact per-record report a release-review pipeline consumes.

    All-integer semantics (group counts + a floor bucket), so parity
    needs no float contract at all.

    Scale shape: three partial-aggregatable groupBys over
    progressively coarser keys (each a strict prefix of the last — at
    100 TB the level-0 aggregate is the only one near corpus grain;
    the rollups could even reuse it) and three broadcast-or-hash
    join-backs on slim key columns; raw text never moves."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100).cast("bigint").alias("chars_b"),
    )
    g0 = d.groupBy("lang", "source", "chars_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n0")
    )
    g1 = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1")
    )
    g2 = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    k = 5
    level = (
        F.when(F.col("n0") >= k, F.lit(0))
        .when(F.col("n1") >= k, F.lit(1))
        .when(F.col("n2") >= k, F.lit(2))
        .otherwise(F.lit(3))
        .cast("int")
    )
    size = (
        F.when(F.col("n0") >= k, F.col("n0"))
        .when(F.col("n1") >= k, F.col("n1"))
        .when(F.col("n2") >= k, F.col("n2"))
        .otherwise(F.lit(0).cast("bigint"))
    )
    return (
        d.join(g0, ["lang", "source", "chars_b"])
        .join(g1, ["lang", "source"])
        .join(g2, ["lang"])
        .select(
            "doc_id",
            level.alias("level"),
            size.alias("group_size"),
            ((F.col("n0") >= k) | (F.col("n1") >= k) | (F.col("n2") >= k)).alias(
                "k_anonymous"
            ),
        )
    )
