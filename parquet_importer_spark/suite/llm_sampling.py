"""§2.J (build additions) — dataset splitting and sampling for training
pipelines. Everything is hash-deterministic (md5 buckets, never rand()):
the same row lands in the same split on every engine, every run, every
cluster size — which is what makes train/test assignment reproducible
at 100 TB AND lets a SQL oracle verify it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.functions.text import md5_bucket, tokens
from parquet_importer_spark.io import parallelize, read_table
from parquet_importer_spark.registry import query

#: hex-prefix threshold: buckets 00..cb → train (~80% of 256), cc..ff → test
_TRAIN_CUT = "cc"
_SAMPLE_CUT = "33"  # 00..32 → ~20% sample


@query(
    "llm_split_train_test",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN substr(md5('s9|' || CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_CUT}'
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)
def llm_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/test assignment by content-free id
    hash: membership is a pure function of doc_id, so re-runs,
    backfills, and incremental arrivals never flip a row's split —
    a narrow map over the scan, no shuffle at all."""
    d = read_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 9, 2)
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < _TRAIN_CUT, "train").otherwise("test").alias("split"),
    )


@query(
    "llm_sample_stratified",
    oracle=f"""
    WITH s AS (
      SELECT lang,
             substr(md5('s11|' || CAST(doc_id AS VARCHAR)), 1, 2) < '{_SAMPLE_CUT}'
               AS sampled
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE sampled) AS BIGINT) AS n_sampled
    FROM s GROUP BY lang
    """,
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% per-stratum sample (here: per language) by id
    hash — every stratum gets the same rate without a per-stratum pass,
    and the sample is stable under reprocessing. One aggregate shuffle;
    the sampling predicate itself is map-side and would push into a
    scan-side filter when only the sample is read downstream."""
    d = read_table(spark, sf_dir, "documents")
    sampled = md5_bucket(F.col("doc_id").cast("string"), 11, 2) < _SAMPLE_CUT
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(sampled, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
    )


@query(
    "llm_pack_sequences",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
               AS n_tok,
             substr(md5('s13|' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard
      FROM documents
    ),
    c AS (
      SELECT shard, n_tok,
             SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT shard,
           CAST(FLOOR((cum - n_tok) / 2048) AS BIGINT) AS seq_no,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY shard, seq_no
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: assign docs to fixed-budget (2048
    token) sequences by running token count. Packing is inherently
    sequential, so it runs per SHARD (16 md5 shards here — in
    production one shard per writer task): a window cumsum inside each
    shard, seq_no = which sequence the doc starts in. One shuffle on
    shard; shards are independent, so scale = add shards."""
    from pyspark.sql import Window

    from parquet_importer_spark.functions.text import token_count

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        md5_bucket(F.col("doc_id").cast("string"), 13, 1).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.withColumn(
            "seq_no", F.floor((F.col("cum") - F.col("n_tok")) / 2048).cast("bigint")
        )
        .groupBy("shard", "seq_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


#: target per-language keep rates for the training mix (hex threshold
#: over 256 md5 buckets: en keep-all, de ~50%, es ~25%, fr ~12.5%, zh ~6%)
_MIX_CUTS = {"en": "ff", "de": "80", "es": "40", "fr": "20", "zh": "10"}


@query(
    "llm_mix_weighted",
    oracle=f"""
    WITH d AS (
      SELECT lang,
             substr(md5('s17|' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE b < CASE lang
             {" ".join(f"WHEN '{lang}' THEN '{cut}'" for lang, cut in _MIX_CUTS.items())}
             ELSE '00' END) AS BIGINT) AS n_kept
    FROM d GROUP BY lang
    """,
)
def llm_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data mixing: each language is downsampled to its target
    rate in the training mix by a deterministic id-hash threshold —
    the distributed form of curriculum/mixture weighting. Membership is
    a pure map; this query reports per-language total vs kept."""
    d = read_table(spark, sf_dir, "documents")
    b = md5_bucket(F.col("doc_id").cast("string"), 17, 2)
    cut = F.lit("00")
    for lang, hexcut in _MIX_CUTS.items():
        cut = F.when(F.col("lang") == lang, F.lit(hexcut)).otherwise(cut)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(b < cut, 1).otherwise(0)).cast("bigint").alias("n_kept"),
    )


@query(
    "llm_mix_temperature",
    oracle="""
    WITH g AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    s AS (
      SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS raw_share,
             sqrt(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()) AS w
      FROM g
    )
    SELECT lang, n_docs,
           ROUND(raw_share, 6) AS raw_share,
           ROUND(w / SUM(w) OVER (), 6) AS temp_share,
           ROUND(LEAST(1.0,
                 (w / SUM(w) OVER ()) / raw_share * 0.2), 6) AS sample_rate
    FROM s
    ORDER BY lang
    """,
)
def llm_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based training-mix rebalancing (the multilingual-LM
    recipe, T=2 i.e. shares^(1/2)): raw corpus share → sqrt-flattened
    share → per-language sampling rate hitting a 20% global budget while
    up-weighting tail languages. The windows run over the per-language
    aggregate (≤ dozens of rows) — cost is one groupBy of the corpus,
    identical to llm_text_stats. sqrt (not pow) keeps the math
    bit-identical across engines."""
    from pyspark.sql import Window

    g = (
        parallelize(read_table(spark, sf_dir, "documents"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    everything = Window.partitionBy()
    raw_share = F.col("n_docs").cast("double") / F.sum("n_docs").over(everything)
    w = F.sqrt(raw_share)
    temp_share = w / F.sum(w).over(everything)
    return g.select(
        "lang",
        "n_docs",
        F.round(raw_share, 6).alias("raw_share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(F.least(F.lit(1.0), temp_share / raw_share * 0.2), 6).alias(
            "sample_rate"
        ),
    ).orderBy("lang")


# winnowing fingerprint, SQL side (same expression as llm_fingerprint)
_FP3 = (
    "list_min(list_transform("
    "list_distinct(CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(1, greatest(len(toks) - 2, 1) + 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
    "ELSE [array_to_string(toks, ' ')] END), g -> md5(g)))"
)
_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


@query(
    "llm_contamination",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    base AS (
      SELECT doc_id,
             CASE WHEN substr(md5('s9|' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < '{_TRAIN_CUT}'
                  THEN 'train' ELSE 'test' END AS split,
             {_FP3} AS fingerprint
      FROM t
    ),
    train AS (
      SELECT fingerprint, COUNT(*) AS n_train_matches
      FROM base WHERE split = 'train' GROUP BY fingerprint
    )
    SELECT b.doc_id, b.fingerprint,
           CAST(n_train_matches AS BIGINT) AS n_train_matches
    FROM base b JOIN train USING (fingerprint)
    WHERE b.split = 'test'
    """,
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check — the eval-integrity pass every
    training pipeline needs: test-split docs whose content fingerprint
    (winnowing min-hash over 3-gram shingles, same as llm_fingerprint)
    collides with any train-split doc. One fingerprint projection over
    the corpus, one groupBy of the train side, one equi-join on the
    fingerprint — at 100 TB both sides shuffle once on the fingerprint
    and AQE picks broadcast when the train digest table is small. Swap
    the fingerprint for an exploded 8-gram table to get span-level
    overlap: same plan shape, one more explode."""
    from parquet_importer_spark.functions.text import doc_fingerprint, md5_bucket

    d = parallelize(read_table(spark, sf_dir, "documents"))
    base = d.select(
        "doc_id",
        F.when(
            md5_bucket(F.col("doc_id").cast("string"), 9, 2) < _TRAIN_CUT,
            "train",
        )
        .otherwise("test")
        .alias("split"),
        doc_fingerprint(F.col("text"), 3).alias("fingerprint"),
    ).localCheckpoint(eager=False)
    # ^ base feeds the train digest aggregate AND the test probe side —
    # the winnowing-fingerprint projection re-executed per branch
    # without the checkpoint (r14, guide §2.4); slim 3-column rows
    train = (
        base.filter(F.col("split") == "train")
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_train_matches"))
    )
    return (
        base.filter(F.col("split") == "test")
        .join(train, "fingerprint")
        .select("doc_id", "fingerprint", "n_train_matches")
    )


@query(
    "llm_shuffle_shard",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             md5('s7|' || CAST(doc_id AS VARCHAR)) AS key
      FROM documents
    )
    SELECT doc_id,
           substr(key, 1, 1) AS shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY substr(key, 1, 1)
                                   ORDER BY key, doc_id) AS BIGINT) AS pos
    FROM k
    """,
)
def llm_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding — the final step before
    training: every doc gets a pseudorandom but reproducible position
    inside one of 16 shards (md5 of seeded doc_id; first hex char =
    shard). The sort is PER SHARD (window partitioned on shard_id),
    never global — at 100 TB each shard sorts independently after one
    hash exchange, and shard count is a parameter (hex-prefix length).
    Writing out becomes partitionBy(shard_id) with pos as the
    within-shard order."""
    from parquet_importer_spark.functions.text import seeded_md5
    from pyspark.sql import Window

    d = parallelize(read_table(spark, sf_dir, "documents")).select(
        "doc_id",
        seeded_md5(F.col("doc_id").cast("string"), 7).alias("key"),
    )
    w = Window.partitionBy(F.substring("key", 1, 1)).orderBy("key", "doc_id")
    return d.select(
        "doc_id",
        F.substring("key", 1, 1).alias("shard_id"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@query(
    "llm_mix_epochs",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 3 AS m,
             substr(md5('s23|' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents
    ),
    r AS (
      SELECT doc_id, source,
             (CASE WHEN m = 2 THEN 2 ELSE 1 END)
             + (CASE WHEN m = 1 AND b < '80' THEN 1 ELSE 0 END) AS n_rep
      FROM d
    )
    SELECT doc_id, source, CAST(u.copy AS BIGINT) AS copy
    FROM r, LATERAL (SELECT unnest(generate_series(1, n_rep)) AS copy) u
    """,
)
def llm_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch replication — the UPSAMPLING half of a training-data recipe
    (llm_mix_weighted downsamples): each source class gets a fractional
    epoch factor (here 1.0 / 1.5 / 2.0 by source index mod 3); full
    epochs replicate every doc, the fractional remainder keeps a
    deterministic md5-bucket slice. Replication is a per-row
    explode(sequence(1, n)) — no shuffle, no join, output size =
    sum of factors — and the (doc_id, copy) pair is the stable key
    downstream shuffling/packing needs."""
    d = parallelize(read_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        (F.regexp_extract("source", r"(\d+)", 1).cast("int") % 3).alias("m"),
        md5_bucket(F.col("doc_id").cast("string"), 23).alias("b"),
    )
    n_rep = F.when(F.col("m") == 2, 2).otherwise(1) + F.when(
        (F.col("m") == 1) & (F.col("b") < "80"), 1
    ).otherwise(0)
    return (
        d.withColumn("n_rep", n_rep)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_rep"))).alias("copy"),
        )
        .withColumn("copy", F.col("copy").cast("bigint"))
    )


# 2-gram shingles (distinct), DuckDB side — mirrors functions.text.shingles(k=2)
_SH2 = (
    "list_distinct(CASE WHEN len(toks) >= 2 THEN "
    "list_transform(range(1, greatest(len(toks) - 1, 1) + 1), "
    "i -> toks[i] || ' ' || toks[i+1]) "
    "ELSE [array_to_string(toks, ' ')] END)"
)
_SPLIT_CASE = (
    "CASE WHEN substr(md5('s9|' || CAST(doc_id AS VARCHAR)), 1, 2)"
    f" < '{_TRAIN_CUT}' THEN 'train' ELSE 'test' END"
)


@query(
    "llm_contamination_near",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SPLIT_CASE} AS split, {_TOKS} AS toks FROM documents
    ),
    sh AS (SELECT doc_id, split, {_SH2} AS grams FROM t),
    sig AS (
      SELECT doc_id, split, grams,
             list_transform(range(0, 8), s ->
               list_min(list_transform(grams,
                 g -> md5('s' || CAST(s AS VARCHAR) || '|' || g)))) AS sig
      FROM sh
    ),
    banded AS (
      SELECT doc_id, split, grams, b.band,
             sig[b.band * 2 + 1] || '|' || sig[b.band * 2 + 2] AS key
      FROM sig, (SELECT unnest(range(0, 4)) AS band) b
    ),
    ok AS (
      SELECT band, key FROM banded
      GROUP BY band, key
      HAVING COUNT(*) FILTER (WHERE split = 'test') BETWEEN 1 AND 10000
         AND COUNT(*) FILTER (WHERE split = 'train') BETWEEN 1 AND 10000
    ),
    cand AS (
      SELECT a.doc_id AS probe_id, b.doc_id AS corpus_id,
             COUNT(*) AS n_shared_bands,
             ANY_VALUE(a.grams) AS g1, ANY_VALUE(b.grams) AS g2
      FROM banded a
      JOIN ok o   ON a.band = o.band AND a.key = o.key
      JOIN banded b ON a.band = b.band AND a.key = b.key
      WHERE a.split = 'test' AND b.split = 'train'
      GROUP BY 1, 2
    )
    SELECT probe_id, corpus_id,
           CAST(n_shared_bands AS BIGINT) AS n_shared_bands,
           ROUND(CAST(len(list_intersect(g1, g2)) AS DOUBLE)
                 / (len(g1) + len(g2) - len(list_intersect(g1, g2))), 6)
             AS jaccard
    FROM cand
    WHERE ROUND(CAST(len(list_intersect(g1, g2)) AS DOUBLE)
                / (len(g1) + len(g2) - len(list_intersect(g1, g2))), 6) >= 0.1
    """,
)
def llm_contamination_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY train/test contamination — near-duplicate eval leakage that
    exact-fingerprint matching (llm_contamination) misses: MinHash-LSH
    candidates restricted to test×train pairs, exact-Jaccard verified.
    Within-side duplicates never expand (a boilerplate-heavy train
    bucket costs nothing here), and the per-side bucket cap bounds any
    adversarial bucket — see operators.dedup.minhash_lsh_cross_pairs.
    Same deterministic seeded-md5 hash family as llm_dedup_near, so the
    DuckDB oracle reproduces it bit-for-bit — INCLUDING the max_side
    bucket cap (the oracle's ok CTE), so Spark and DuckDB agree even on
    a pathological corpus where a bucket overflows the cap."""
    from parquet_importer_spark.operators.dedup import minhash_lsh_cross_pairs

    d = read_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 9, 2)
    d = d.withColumn(
        "split", F.when(bucket < _TRAIN_CUT, "train").otherwise("test")
    )
    return minhash_lsh_cross_pairs(
        d.filter(F.col("split") == "test"),
        d.filter(F.col("split") == "train"),
        "text",
        "doc_id",
        num_hashes=8,
        bands=4,
        jaccard_threshold=0.1,
        k=2,
    )


@query(
    "llm_contamination_bloom",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {_SPLIT_CASE} AS split,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS digest
      FROM documents
    ),
    bits AS (
      SELECT DISTINCT
             substr(md5('b' || CAST(j.j AS VARCHAR) || '|' || digest), 1, 4)
               AS pos
      FROM base, (SELECT unnest([0, 1, 2]) AS j) j
      WHERE split = 'train'
    ),
    train_digests AS (
      SELECT DISTINCT digest FROM base WHERE split = 'train'
    ),
    probe AS (
      SELECT b.doc_id, b.source, b.digest,
             SUM(CASE WHEN substr(md5('b' || CAST(j.j AS VARCHAR) || '|' ||
                                      b.digest), 1, 4)
                           IN (SELECT pos FROM bits)
                      THEN 1 ELSE 0 END) AS n_hit
      FROM base b, (SELECT unnest([0, 1, 2]) AS j) j
      WHERE b.split = 'test'
      GROUP BY b.doc_id, b.source, b.digest
    )
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(COUNT(*) FILTER (WHERE p.n_hit = 3) AS BIGINT)
             AS n_bloom_hits,
           CAST(COUNT(*) FILTER (WHERE p.digest IN
                 (SELECT digest FROM train_digests)) AS BIGINT)
             AS n_exact_hits,
           CAST(COUNT(*) FILTER (WHERE p.n_hit = 3 AND p.digest NOT IN
                 (SELECT digest FROM train_digests)) AS BIGINT)
             AS n_false_positives
    FROM probe p GROUP BY p.source ORDER BY p.source
    """,
)
def llm_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the broadcast-sized membership
    structure for probing test docs against a train corpus too large to
    shuffle-join per check: k=3 md5-derived positions in a 16-bit space
    (4 hex chars — string positions, engine-portable), train side
    reduced to the DISTINCT set-bit table (≤65536 rows regardless of
    corpus size) and broadcast; a probe is a bloom hit iff all 3 of its
    positions are set. The exact digest join runs alongside to account
    false positives per source — at production scale you size m at
    ~10 bits/element and only bloom-positive docs reach the (expensive)
    exact verify, which is the point of the filter."""
    d = parallelize(read_table(spark, sf_dir, "documents"))
    bucket = md5_bucket(F.col("doc_id").cast("string"), 9, 2)
    base = d.select(
        "doc_id",
        "source",
        F.when(bucket < _TRAIN_CUT, "train").otherwise("test").alias("split"),
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("digest"),
    )
    positions = F.transform(
        F.sequence(F.lit(0), F.lit(2)),
        lambda j: F.substring(
            F.md5(
                F.concat(F.lit("b"), j.cast("string"), F.lit("|"), F.col("digest"))
            ),
            1,
            4,
        ),
    )
    bits = (
        base.filter(F.col("split") == "train")
        .select(F.explode(positions).alias("pos"))
        .distinct()
        .withColumn("bit_set", F.lit(1))
    )
    train_digests = (
        base.filter(F.col("split") == "train")
        .select("digest")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    probe = (
        base.filter(F.col("split") == "test")
        .select("doc_id", "source", "digest", F.explode(positions).alias("pos"))
        .join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id", "source", "digest")
        .agg(F.count("bit_set").alias("n_hit"))
        .join(F.broadcast(train_digests), "digest", "left")
    )
    bloom_hit = F.col("n_hit") == 3
    exact_hit = F.col("in_train").isNotNull()
    return (
        probe.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.count_if(bloom_hit).alias("n_bloom_hits"),
            F.count_if(exact_hit).alias("n_exact_hits"),
            F.count_if(bloom_hit & ~exact_hit).alias("n_false_positives"),
        )
        .orderBy("source")
    )


# 5-gram shingles (distinct), DuckDB side — n-gram-level decontamination
_SH5 = (
    "list_distinct(CASE WHEN len(toks) >= 5 THEN "
    "list_transform(range(1, greatest(len(toks) - 4, 1) + 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' "
    "|| toks[i+3] || ' ' || toks[i+4]) "
    "ELSE [array_to_string(toks, ' ')] END)"
)


@query(
    "llm_contamination_ngram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SPLIT_CASE} AS split, {_TOKS} AS toks FROM documents
    ),
    g AS (SELECT doc_id, split, {_SH5} AS grams FROM t),
    tr AS (
      SELECT DISTINCT CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
                           AS BIGINT) AS gh
      FROM g WHERE split = 'train'
    ),
    te AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(unnest(grams)), 1, 15))
                          AS BIGINT) AS gh
      FROM g WHERE split = 'test'
    ),
    hits AS (
      SELECT te.doc_id, COUNT(*) AS n_grams, COUNT(tr.gh) AS n_hit
      FROM te LEFT JOIN tr ON te.gh = tr.gh
      GROUP BY te.doc_id
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_hit AS BIGINT) AS n_hit,
           ROUND(CAST(n_hit AS DOUBLE) / n_grams, 6) AS overlap_rate
    FROM hits
    """,
)
def llm_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-GRAM-level decontamination stats (the PaLM/GPT-4-style check):
    for every test document, the fraction of its distinct 5-gram
    shingles that occur anywhere in the train split. Catches partial
    overlap — a test doc quoting a train paragraph — that whole-doc
    exact (llm_contamination) and MinHash (llm_contamination_near)
    both miss or only score coarsely.

    Scale shape: the corpus is shingled ONCE into slim (doc, split,
    md5(gram)) rows — the 32-hex digest crosses the wire, never the
    gram text — and a single exchange on the digest serves both sides:
    a window max over the digest partitioning marks every gram with at
    least one train occurrence (a separate distinct-train + join would
    run the shingle pipeline twice, once per branch — measured 1.7×
    slower at sf0.1), then the per-doc rollup partial-aggregates. No
    driver collect."""
    from pyspark.sql import Window

    from parquet_importer_spark.functions.text import shingles

    d = read_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 9, 2)
    # NOTE: the zip_with shingle builder wins here (measured 1.46 s vs
    # 3.8 s for the slice-in-lambda variant at sf0.1) while the
    # opposite holds in llm_decontam_substring — whether Catalyst
    # collapses the tokens() projection into the lambda (re-tokenizing
    # per element) decides which formulation is O(n·k); always measure.
    g = d.select(
        "doc_id",
        F.when(bucket < _TRAIN_CUT, "train").otherwise("test").alias("split"),
        shingles(F.col("text"), 5).alias("grams"),
    )
    # 60-bit md5-prefix BIGINT digests (the r11 verify-array convention,
    # operators/dedup._verify_hash_arr): the gh exchange is this key's
    # dominant cost and 8-byte ints shuffle/sort ~4x lighter than
    # 32-hex strings (guide §2.3 "narrower types"). The oracle applies
    # the IDENTICAL transform, so both engines agree even on a
    # (birthday-odds ~1e-15) colliding pair.
    ex = g.select(
        "doc_id", "split", F.explode("grams").alias("gram")
    ).select(
        "doc_id",
        "split",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("gh"),
    )
    in_train = F.max(F.when(F.col("split") == "train", F.lit(1))).over(
        Window.partitionBy("gh")
    )
    return (
        ex.withColumn("hit", in_train)
        .filter(F.col("split") == "test")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.round(
                F.col("n_hit").cast("double") / F.col("n_grams"), 6
            ).alias("overlap_rate"),
        )
    )


@query(
    "llm_oov_rate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SPLIT_CASE} AS split, {_TOKS} AS toks FROM documents
    ),
    ex AS (SELECT doc_id, split, unnest(toks) AS tok FROM t),
    vocab AS (
      SELECT tok FROM ex WHERE split = 'train'
      GROUP BY tok HAVING COUNT(*) >= 3
    ),
    scored AS (
      SELECT ex.doc_id, COUNT(*) AS n_tok,
             COUNT(*) FILTER (WHERE v.tok IS NULL) AS n_oov
      FROM ex LEFT JOIN vocab v ON ex.tok = v.tok
      WHERE ex.split = 'test'
      GROUP BY ex.doc_id
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(n_oov AS BIGINT) AS n_oov,
           ROUND(CAST(n_oov AS DOUBLE) / n_tok, 6) AS oov_rate
    FROM scored
    """,
)
def llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage quality score: build a vocabulary from the
    train split (tokens with total frequency ≥ 3), then score every
    test document by its out-of-vocabulary token rate — the integer-
    arithmetic core of CCNet-style LM quality filtering (the full LM
    perplexity companion is llm_ngram_perplexity below, which makes
    log-prob sums bit-portable via the rounded-ln + decimal-sum
    contract; OOV rate is the cheaper pure-integer signal).

    Scale shape: vocabulary build is one map-combinable aggregation on
    the token; scoring is a token-level hash join against the vocab
    (broadcastable when the vocab fits, shuffle join otherwise — left
    to AQE), then a per-doc rollup with partial aggregation."""
    d = read_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 9, 2)
    ex = d.select(
        "doc_id",
        F.when(bucket < _TRAIN_CUT, "train").otherwise("test").alias("split"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    vocab = (
        ex.filter(F.col("split") == "train")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 3)
        .select("tok")
    )
    return (
        ex.filter(F.col("split") == "test")
        .join(vocab.withColumn("in_vocab", F.lit(1)), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            (F.count(F.lit(1)) - F.count("in_vocab"))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tok"), 6
            ).alias("oov_rate"),
        )
    )


@query(
    "llm_sample_capped",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('s13|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 20
    """,
)
def llm_sample_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — 'at most k docs per domain', the
    standard defense against a single crawled site dominating the mix.
    Ranking by a seeded hash of the id (not by id order) makes the kept
    subset a uniform sample of each source, deterministic under
    reprocessing; ROW_NUMBER over the source partitioning is one
    shuffle, and a skewed giant source costs only its own partition's
    sort. DuckDB reproduces the identical ranking from the identical
    md5 keys."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("s13|"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    return (
        d.select(
            "source", "doc_id", F.row_number().over(w).cast("bigint").alias("rk")
        )
        .filter(F.col("rk") <= 20)
    )


@query(
    "llm_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    n AS (
      SELECT doc_id, toks, len(toks) AS n_tok,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE 1 + CAST(ceil((len(toks) - 32) / 24.0) AS INT)
             END AS n_chunks
      FROM t
    ),
    ch AS (
      SELECT doc_id, i.i AS chunk_idx,
             list_slice(toks, i.i * 24 + 1, i.i * 24 + 32) AS chunk
      FROM n, LATERAL (
        SELECT unnest(generate_series(0, n_chunks - 1)) AS i
      ) i
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(chunk) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM ch
    """,
)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking — the sequence-prep step
    between cleaning and packing: each document's token stream splits
    into windows of 32 tokens with stride 24 (8-token overlap), so no
    span is lost at a chunk boundary. Emits (doc_id, chunk_idx,
    chunk_tokens, chunk_hash); the hash stands in for the chunk text
    (the driver compares compact digests, and at 100 TB the digest is
    what you'd shuffle to downstream dedup anyway).

    Plan shape: chunk starts are computed INSIDE array expressions
    (sequence → transform → posexplode) — pure codegen 1→N fan-out on
    the map side, no shuffle at all, and the fan-out factor is
    n_tokens/stride, bounded per row."""
    d = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    n_chunks = F.when(n <= 32, F.lit(1)).otherwise(
        (F.ceil((n - 32) / F.lit(24.0)) + 1).cast("int")
    )
    base = d.select("doc_id", toks.alias("toks"), n_chunks.alias("n_chunks"))
    return (
        base.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_chunks") - 1),
                    lambda i: F.slice(F.col("toks"), i * 24 + 1, 32),
                )
            ).alias("chunk_idx", "chunk"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.size("chunk").cast("bigint").alias("chunk_tokens"),
            F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"),
        )
    )


@query(
    "llm_ngram_perplexity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SPLIT_CASE} AS split, {_TOKS} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id, split,
             unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS gram
      FROM t WHERE len(toks) >= 2
    ),
    c2 AS (
      SELECT gram, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
      WHERE split = 'train' GROUP BY gram
    ),
    c1 AS (
      SELECT string_split(gram, ' ')[1] AS w1,
             CAST(COUNT(*) AS BIGINT) AS c1
      FROM bg WHERE split = 'train' GROUP BY 1
    ),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT unnest(toks) AS tok FROM t WHERE split = 'train')
    ),
    scored AS (
      SELECT b.doc_id,
             ROUND(LN((CAST(COALESCE(c2.c2, 0) AS DOUBLE) + 0.5)
                      / (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + 0.5 * v.v)),
                   8) AS lp
      FROM bg b
      LEFT JOIN c2 ON b.gram = c2.gram
      LEFT JOIN c1 ON string_split(b.gram, ' ')[1] = c1.w1
      CROSS JOIN vocab v
      WHERE b.split = 'test'
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(-(CAST(SUM(CAST(lp AS DECIMAL(30,8))) AS DOUBLE))
                 / COUNT(*), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def llm_ngram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style n-gram LM quality scoring — the CCNet/Gopher-era
    perplexity filter: train an add-k-smoothed bigram LM on the train
    split, score every test document by mean negative log-likelihood
    (log-perplexity; exp() of it is the perplexity, left in log space
    so the score stays bit-portable). P(w2|w1) = (c(w1 w2) + 0.5) /
    (c(w1·) + 0.5·V) with V the train unigram vocabulary.

    Float contract (same as llm_index_bm25): every count is exact
    BIGINT, each bigram's probability is one identical IEEE expression
    tree on both engines, the single LN rounds to 8 decimals, and the
    per-document sum accumulates in DECIMAL(30,8) — order-independent,
    so DuckDB hash-matches exactly.

    Scale shape: two map-combinable count aggregations build the LM
    (bigram + context tables — at 100 TB these ARE the model, stored
    as parquet and reused across scoring runs); scoring is two hash
    joins on the bigram/context keys (AQE broadcasts when the LM is
    small) + a 1-row vocabulary broadcast + a per-doc partial-agg
    rollup. No collect, no UDF, no iteration."""
    from parquet_importer_spark.functions.text import shingles_all

    d = read_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 9, 2)
    base = d.select(
        "doc_id",
        F.when(bucket < _TRAIN_CUT, "train").otherwise("test").alias("split"),
        tokens(F.col("text")).alias("toks"),
        shingles_all(F.col("text"), 2).alias("grams"),
    ).filter(F.size("toks") >= 2)
    # bg feeds THREE branches (bigram counts, context counts, test
    # scoring) — the tokenize+shingle+explode pipeline re-executed per
    # branch without a checkpoint (r14, guide §2.4). Slim rows.
    bg = base.select(
        "doc_id", "split", F.explode("grams").alias("gram")
    ).localCheckpoint(eager=False)
    train_bg = bg.filter(F.col("split") == "train")
    c2 = train_bg.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    c1 = (
        train_bg.select(F.split("gram", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    vocab = (
        base.filter(F.col("split") == "train")
        .select(F.explode("toks").alias("tok"))
        .agg(F.count_distinct("tok").cast("bigint").alias("v"))
    )
    lp = F.round(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + 0.5)
            / (
                F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                + 0.5 * F.col("v")
            )
        ),
        8,
    )
    scored = (
        bg.filter(F.col("split") == "test")
        .join(c2, "gram", "left")
        .join(
            c1,
            F.split(bg["gram"], " ").getItem(0) == F.col("w1"),
            "left",
        )
        .join(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(
            -F.sum(F.col("lp").cast("decimal(30,8)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_nll"),
    )


@query(
    "llm_decontam_substring",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_SPLIT_CASE} AS split, {_TOKS} AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, split,
             unnest(list_transform(range(1, len(toks) - 6),
               i -> CAST(concat('0x', substr(
                      md5(array_to_string(toks[i:i+7], ' ')), 1, 15))
                    AS BIGINT))) AS dig
      FROM t WHERE len(toks) >= 8
    ),
    train AS (SELECT DISTINCT dig FROM g WHERE split = 'train'),
    hits AS (
      SELECT DISTINCT g.doc_id FROM g JOIN train USING (dig)
      WHERE g.split = 'test'
    ),
    td AS (SELECT doc_id, source FROM t WHERE split = 'test')
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_test_docs,
           CAST(COUNT(h.doc_id) AS BIGINT) AS n_contaminated,
           ROUND(1.0 - CAST(COUNT(h.doc_id) AS DOUBLE) / COUNT(*), 6)
             AS retention_rate
    FROM td LEFT JOIN hits h USING (doc_id)
    GROUP BY source
    """,
)
def llm_decontam_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination at a LONG n-gram size (8 tokens —
    the GPT-3/PaLM-style exact-overlap rule, vs llm_contamination_ngram's
    5-gram sweep): a test document sharing ANY verbatim 8-token span
    with the train split is contaminated; report per-source retention —
    the suffix-array-free formulation (membership of fixed-length gram
    digests reproduces 'is any ≥n-token substring shared' exactly,
    because every longer shared substring contains a shared n-gram).

    Scale shape: both sides reduce to slim md5(gram) digests before any
    join (32-hex keys shuffle, never text); the train side dedups to
    DISTINCT digests (one partial-agg pass); the test-side membership
    join is digest-keyed and AQE-broadcastable; the verdict rollup is
    doc-level then source-level partial aggregation."""
    d = read_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 9, 2)
    t = d.select(
        "doc_id",
        "source",
        F.when(bucket < _TRAIN_CUT, "train").otherwise("test").alias("split"),
        tokens(F.col("text")).alias("toks"),
    )
    # gram digests via slice-in-lambda over the MATERIALIZED toks column
    # (one pass, O(n·k)); the chained zip_with shingle builder measured
    # 3× slower at k=8 — its k passes rebuild progressively longer
    # prefix strings
    g = (
        t.filter(F.size("toks") >= 8)
        .select(
            "doc_id",
            "split",
            # 60-bit md5-prefix BIGINT digests (same swap + rationale
            # as llm_contamination_ngram above; oracle mirrors it)
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 7), "
                    "i -> cast(conv(substring("
                    "md5(concat_ws(' ', slice(toks, i, 8))), 1, 15), "
                    "16, 10) as bigint))"
                )
            ).alias("dig"),
        )
    )
    # single exchange on the digest serves both sides (the
    # llm_contamination_ngram plan, measured 1.7× faster there): a
    # window max over the digest partitioning marks every gram with a
    # train occurrence — the distinct-train + membership-join
    # formulation ran the tokenize/md5-explode pipeline TWICE, once per
    # branch (r14 measured: 10 exchanges / two full gram builds at
    # sf0.1; guide §2.4). Semantics identical: a test doc is
    # contaminated iff ANY of its 8-gram digests has ≥1 train-side row.
    from pyspark.sql import Window

    in_train = F.max(F.when(F.col("split") == "train", F.lit(1))).over(
        Window.partitionBy("dig")
    )
    hits = (
        g.withColumn("hit_row", in_train)
        .filter((F.col("split") == "test") & F.col("hit_row").isNotNull())
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    td = t.filter(F.col("split") == "test").select("doc_id", "source")
    return (
        td.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test_docs"),
            F.count("hit").cast("bigint").alias("n_contaminated"),
            F.round(
                F.lit(1.0) - F.count("hit").cast("double") / F.count(F.lit(1)),
                6,
            ).alias("retention_rate"),
        )
    )


# 2-gram shingles WITH multiplicity — mirrors functions.text.shingles_all(k=2)
_SH2_ALL = (
    "CASE WHEN len(toks) >= 2 THEN "
    "list_transform(range(1, greatest(len(toks) - 1, 1) + 1), "
    "i -> toks[i] || ' ' || toks[i+1]) "
    "ELSE [array_to_string(toks, ' ')] END"
)


@query(
    "llm_dsir_weights",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
             substr(md5(g.gram), 1, 2) AS bucket
      FROM t, LATERAL (SELECT unnest({_SH2_ALL}) AS gram) g
    ),
    db AS (
      SELECT doc_id, lang, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g GROUP BY 1, 2, 3
    ),
    ct AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM g
      WHERE lang = 'en' GROUP BY 1
    ),
    cs AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cs FROM g GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS ns
      FROM g
    ),
    scored AS (
      SELECT db.doc_id, db.lang, db.cnt,
             db.cnt * ROUND(LN(
               ((CAST(COALESCE(ct.ct, 0) AS DOUBLE) + 1) / (tot.nt + 256))
               / ((CAST(COALESCE(cs.cs, 0) AS DOUBLE) + 1) / (tot.ns + 256))
             ), 8) AS contrib
      FROM db
      LEFT JOIN ct USING (bucket)
      LEFT JOIN cs USING (bucket)
      CROSS JOIN tot
    )
    SELECT doc_id, ANY_VALUE(lang) AS lang,
           CAST(SUM(cnt) AS BIGINT) AS n_grams,
           ROUND(CAST(SUM(CAST(contrib AS DECIMAL(30,8))) AS DOUBLE)
                 / SUM(cnt), 6) + 0.0 AS avg_llr
    FROM scored GROUP BY doc_id
    """,
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every document by how target-like its hashed-n-gram feature
    distribution is. Features are bigrams hashed into 256 md5 buckets;
    the target distribution is estimated from the English subset, the
    raw distribution from the whole corpus, both add-one smoothed. A
    document's score is the mean log-likelihood ratio of its features
    — the quantity DSIR exponentiates to resample a raw crawl toward
    a curated target domain.

    Float contract: counts are exact BIGINT, each bucket's log-ratio
    is one identical IEEE expression rounded to 8 decimals, per-bucket
    contributions (count x ratio) accumulate in DECIMAL(30,8).

    Scale shape: the two "models" are 256-row bucket tables — built by
    map-combinable counts, broadcast everywhere (at 100 TB the hashed
    feature space stays 256 rows no matter the corpus size; that
    dimensionality cap is DSIR's entire point). Per-doc work is one
    explode → (doc,bucket) partial agg → two broadcast joins → rollup.
    No collect, no UDF, no iteration."""
    from parquet_importer_spark.functions.text import shingles_all

    d = read_table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        "lang",
        F.explode(shingles_all(F.col("text"), 2)).alias("gram"),
    ).select(
        "doc_id", "lang", F.substring(F.md5("gram"), 1, 2).alias("bucket")
    )
    db = g.groupBy("doc_id", "lang", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ct = (
        g.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    )
    cs = g.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cs")
    )
    tot = g.agg(
        F.count_if(F.col("lang") == "en").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("ns"),
    )
    lr8 = F.round(
        F.log(
            (
                (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + 1)
                / (F.col("nt") + 256)
            )
            / (
                (F.coalesce(F.col("cs"), F.lit(0)).cast("double") + 1)
                / (F.col("ns") + 256)
            )
        ),
        8,
    )
    scored = (
        db.join(F.broadcast(ct), "bucket", "left")
        .join(F.broadcast(cs), "bucket", "left")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            "cnt",
            (F.col("cnt") * lr8).alias("contrib"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        F.sum("cnt").cast("bigint").alias("n_grams"),
        # + 0.0 after the round: a doc whose per-bucket log-ratios
        # cancel exactly rounds to a SIGNED zero whose sign is
        # accumulation noise (round-13 sf1 sweep: 3 docs read 0.0 here
        # vs -0.0 in DuckDB — SURVEY §7.4.10); IEEE −0.0 + 0.0 = +0.0
        # on both engines
        (
            F.round(
                F.sum(F.col("contrib").cast("decimal(30,8)")).cast(
                    "double"
                )
                / F.sum("cnt"),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_llr"),
    )


@query(
    "llm_sample_weighted",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             CAST(len({_TOKS}) AS BIGINT) AS n_tok,
             md5('s17|' || CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tok,
             COALESCE(SUM(n_tok) OVER (
               ORDER BY hkey, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM w
    )
    SELECT doc_id, source, n_tok,
           CAST(cum_before // 500 + 1 AS BIGINT) AS picked_stride
    FROM c
    WHERE cum_before // 500 < (cum_before + n_tok) // 500
    """,
)
def llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (importance) sampling — pick documents with probability
    proportional to their TOKEN COUNT, the sampling design behind
    token-budget subcorpora ("give me ~1M tokens, long docs
    proportionally more likely"). Systematic sampling over a
    hash-shuffled order: lay docs on a token number line (prefix sum of
    token counts over the seeded-md5 order), drop a tick every
    STRIDE = 500 tokens, keep each doc that spans a tick. Selection is
    exactly proportional to weight for docs shorter than the stride,
    the expected sample token mass is corpus_tokens/STRIDE ticks ×
    ~STRIDE tokens, and — unlike exponential-race (A-ES) sampling,
    whose ln() keys are not reproducible across libm implementations —
    every step here is EXACT BIGINT arithmetic, so the oracle checks
    the sampled set itself.

    Scale shape: the global prefix sum is one unpartitioned window —
    the known serial point, kept here because the oracle pins the
    exact corpus-wide systematic design. The production form is
    llm_sample_weighted_sharded (next key): the IDENTICAL construction
    with the window PARTITION BY a hash shard, fully parallel."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        F.md5(F.concat(F.lit("s17|"), F.col("doc_id").cast("string"))).alias(
            "hkey"
        ),
    )
    win = (
        Window.orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = w.select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(win), F.lit(0)).alias("cum_before"),
    )
    before = F.expr("cum_before DIV 500")
    after = F.expr("(cum_before + n_tok) DIV 500")
    return c.filter(before < after).select(
        "doc_id",
        "source",
        "n_tok",
        (before + 1).cast("bigint").alias("picked_stride"),
    )


@query(
    "llm_sample_weighted_sharded",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             CAST(len({_TOKS}) AS BIGINT) AS n_tok,
             md5('s17|' || CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tok,
             substr(hkey, 1, 1) AS shard,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY substr(hkey, 1, 1)
               ORDER BY hkey, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM w
    )
    SELECT shard, doc_id, source, n_tok,
           CAST(cum_before // 500 + 1 AS BIGINT) AS picked_stride
    FROM c
    WHERE cum_before // 500 < (cum_before + n_tok) // 500
    """,
)
def llm_sample_weighted_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB form of llm_sample_weighted (round-7 verdict item 3):
    the identical token-proportional systematic sampler, but the token
    number line is laid out PER HASH SHARD (first seeded-md5 hex digit,
    16 shards here — a width knob, not a semantic choice) so the prefix
    sum is a PARTITIONed window: 16-way parallel here, thousands-way
    with a wider prefix, never one task sorting the corpus. Within a
    shard the math is byte-for-byte the global construction — docs on
    a number line in hash order, a tick every STRIDE=500 tokens, keep
    tick-spanning docs — and because the hash order is uniform, each
    shard is itself an unbiased systematic sample; the union keeps
    selection probability proportional to token count for sub-stride
    docs EXACTLY, at the cost of up to one stride of rounding slack
    per shard boundary (vs the single global line).

    Scale shape: one map-side projection, ONE window whose partition
    key is the shard — no global sort anywhere; the plan pin asserts
    the window exchange is hashpartitioning, not SinglePartition."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        F.md5(F.concat(F.lit("s17|"), F.col("doc_id").cast("string"))).alias(
            "hkey"
        ),
    ).withColumn("shard", F.substring("hkey", 1, 1))
    win = (
        Window.partitionBy("shard")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = w.select(
        "shard",
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(win), F.lit(0)).alias("cum_before"),
    )
    before = F.expr("cum_before DIV 500")
    after = F.expr("(cum_before + n_tok) DIV 500")
    return c.filter(before < after).select(
        "shard",
        "doc_id",
        "source",
        "n_tok",
        (before + 1).cast("bigint").alias("picked_stride"),
    )


@query(
    "llm_split_kfold",
    oracle=r"""
    WITH a AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('s17|' || CAST(doc_id AS VARCHAR)), 1, 4)
                  AS INTEGER) % 5 AS fold,
             len(string_split_regex(lower(trim(text)), '\s+')) AS n_toks,
             sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
               AS content_hash
      FROM documents
    ),
    leaked AS (
      SELECT content_hash
      FROM a GROUP BY content_hash
      HAVING COUNT(DISTINCT fold) > 1
    )
    SELECT CAST(fold AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE l.content_hash IS NOT NULL) AS BIGINT)
             AS n_leaked_docs
    FROM a LEFT JOIN leaked l USING (content_hash)
    GROUP BY 1
    """,
)
def llm_split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment plus the
    leakage diagnostic every eval split needs: fold membership is a
    pure function of doc_id (first FOUR seeded-md5 hex chars -> int %
    5 — a single hex digit would give fold 0 a 4/16-vs-3/16 residue
    bias; 65536 % 5 = 1 makes the skew <=1 part in 13107), so folds are
    stable under re-runs and incremental arrivals, and per fold we
    report doc count, token mass (folds should be balanced in TOKENS,
    not just docs), and how many docs have an exact-duplicate twin in
    a DIFFERENT fold — train/eval contamination that id-hash splits
    cannot see because identical CONTENT gets unrelated ids.

    Scale shape: fold assignment is map-side (no shuffle); the leakage
    check is one groupBy on the normalized content digest (raw text
    never shuffles — the digest does) + a slim digest join back; the
    final rollup has 5 output rows. The same digest groupBy is shared
    work with llm_dedup_exact at pipeline level — a real curation DAG
    computes it once. The fix for flagged leakage is dedup-before-
    split or group-by-hash fold assignment (hash the CONTENT digest
    instead of the id), one column swap here."""
    from parquet_importer_spark.functions.text import seeded_md5
    from parquet_importer_spark.operators.dedup import normalized_text_hash

    d = parallelize(read_table(spark, sf_dir, "documents")).select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    seeded_md5(F.col("doc_id").cast("string"), 17), 1, 4
                ),
                16,
                10,
            ).cast("int")
            % 5
        ).alias("fold"),
        F.size(tokens(F.col("text"))).alias("n_toks"),
        normalized_text_hash(F.col("text")).alias("content_hash"),
    )
    leaked = (
        d.groupBy("content_hash")
        .agg(F.count_distinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .select("content_hash", F.lit(1).alias("is_leaked"))
    )
    return (
        d.join(F.broadcast(leaked), "content_hash", "left")
        .groupBy(F.col("fold").cast("int").alias("fold"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce(F.col("is_leaked"), F.lit(0)))
            .cast("bigint")
            .alias("n_leaked_docs"),
        )
    )
