"""Text analysis expression builders (SURVEY §2.J: llm_text_stats,
lang-ID, quality scoring, token counting, fingerprinting).

Design constraints:
- deterministic and engine-portable: hashing is md5 (identical hex in
  every engine) — never Spark's murmur3 ``hash()`` (engine-private);
- pure builtins → codegen; the only data movement any of these need at
  100 TB is the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/lexicon lang-ID
#: heuristic. Deliberately small + public-knowledge words.
LANG_LEXICON: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "que", "es", "y"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4"),  # pinyin-ish tokens
}

#: generic stopwords for quality scoring
STOPWORDS = ("the", "and", "of", "to", "in", "is", "a", "for", "on", "with")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text → array<string>."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword estimate: count alternating alnum runs and
    punctuation marks (the classic ~GPT-2 pre-tokenizer regex shape)."""
    return F.regexp_count(F.lower(text), F.lit(r"[a-z0-9]+|[^a-z0-9\s]")).cast(
        "bigint"
    )


def lexicon_hits(text: Column, words: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in ``words``."""
    toks = tokens(text)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")


def lang_id(text: Column) -> Column:
    """Lexicon-overlap language ID: argmax of per-language stopword hits,
    deterministic tie-break by fixed language order (en,de,es,fr,zh),
    'und' (undetermined) when no lexicon hits at all."""
    scores = {lang: lexicon_hits(text, words) for lang, words in LANG_LEXICON.items()}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_LEXICON)):  # earlier langs win ties
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Heuristic doc quality in [0,1]: blends length adequacy, stopword
    ratio, mean token length sanity, and alpha-character ratio."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n_tok
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus separators
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(text), r"[^a-z]", "")) / n_chars
    )
    len_term = F.least(n_tok / 20.0, F.lit(1.0))
    stop_term = F.least(stop_ratio * 5.0, F.lit(1.0))
    tok_len_term = F.when(
        (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), 1.0
    ).otherwise(0.5)
    return F.round(
        0.4 * len_term + 0.2 * stop_term + 0.2 * tok_len_term + 0.2 * alpha_ratio, 6
    )


def shingles_all(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles with multiplicity: array of 'w1 w2 w3'
    strings, one per sliding-window position (duplicates kept — the
    repetition detector needs the counts).

    Built by zip_with over shifted slices — NEVER element_at(expr, i)
    inside a transform lambda: a lambda body re-evaluates any outer
    expression subtree per element, turning tokenization O(n) into
    O(n·k·grams) per row (measured 4× the whole pipeline's cost).
    """
    toks = tokens(text)
    n = F.size(toks)
    grams = toks
    for j in range(1, k):
        # pair each gram prefix with the token j positions ahead;
        # concat_ws tolerates the null tail, sliced off below
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(n - j, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        n >= k, F.slice(grams, 1, F.greatest(n - (k - 1), F.lit(1)))
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (set semantics — MinHash/Jaccard)."""
    return F.array_distinct(shingles_all(text, k))


def seeded_md5(col: Column, seed: int) -> Column:
    """Deterministic, engine-portable hash family: md5(seed || value),
    lowercase hex in every engine. Replaces murmur3 ``hash()`` (engine-
    private) so a SQL oracle can reproduce hashing exactly."""
    return F.md5(F.concat(F.lit(f"s{seed}|"), col))


def md5_bucket(col: Column, seed: int, hex_chars: int = 2) -> Column:
    """Hash bucket as a hex prefix string — 16^hex_chars buckets.
    String buckets join/group identically across engines (md5 hex is
    lowercase everywhere), avoiding hex→int conversion portability."""
    return F.substring(seeded_md5(col, seed), 1, hex_chars)


def doc_fingerprint(text: Column, k: int = 3) -> Column:
    """Winnowing-style content fingerprint: the lexicographic min of the
    md5 hashes of the doc's k-gram shingles. Near-identical docs share
    the same minimizing shingle with high probability (rolling-hash
    fingerprinting, public winnowing scheme)."""
    return F.array_min(F.transform(shingles(text, k), lambda s: F.md5(s)))


def oracle_quality_select(extra_cols: str = "") -> str:
    """DuckDB SELECT mirroring :func:`quality_score` — the single source
    of truth for the oracle-side quality formula (interpolated into
    every oracle that scores quality, so a formula change cannot
    silently diverge between operators)."""
    toks = r"string_split_regex(lower(trim(text)), '\s+')"
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    cols = f"doc_id{', ' + extra_cols if extra_cols else ''}"
    return f"""
      SELECT {cols},
             ROUND(0.4 * LEAST(CAST(len({toks}) AS DOUBLE) / 20.0, 1.0)
                 + 0.2 * LEAST((CAST(len(list_filter({toks},
                       tk -> tk IN ({stop}))) AS DOUBLE)
                       / CAST(len({toks}) AS DOUBLE)) * 5.0, 1.0)
                 + 0.2 * (CASE WHEN (CAST(length(text) AS DOUBLE)
                                     - (CAST(len({toks}) AS DOUBLE) - 1))
                                    / CAST(len({toks}) AS DOUBLE) >= 2.0
                                AND (CAST(length(text) AS DOUBLE)
                                     - (CAST(len({toks}) AS DOUBLE) - 1))
                                    / CAST(len({toks}) AS DOUBLE) <= 12.0
                           THEN 1.0 ELSE 0.5 END)
                 + 0.2 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '',
                               'g')) AS DOUBLE)
                          / CAST(length(text) AS DOUBLE)), 6) AS quality
      FROM documents
"""
