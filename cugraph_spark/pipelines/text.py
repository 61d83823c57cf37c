"""Text-analysis operators for training-data pipelines.

Beyond-reference (SURVEY §7 Phase 4). Every expression sticks to
constructs with exact DuckDB equivalents (regexp_extract_all, ascii
classes, md5) so the driver's cross-engine oracle can hash-match them.
All computation is JVM-side column expressions — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Tiny built-in stopword lists (top function words; public knowledge).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "por"],
}

# BPE-ish token pattern: letter runs, digit runs, or single non-space symbol
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _words(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_words (whitespace tokens) and n_tokens (BPE-ish regex
    matches)."""
    return df.withColumn("n_words", F.size(_words(text_col))).withColumn(
        "n_tokens", F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0))
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds heuristic quality features: n_chars, punct_ratio, digit_ratio,
    mean_word_len, stopword_ratio (en), and a composite quality score in
    [0, 1] (simple interpretable formula, documented in code)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))
    words = _words(text_col)
    n_words = F.size(words)
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(words, lambda t: F.array_contains(sw, t)))
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("digit_ratio", F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn(
            "mean_word_len",
            F.round(
                F.aggregate(words, F.lit(0), lambda a, t: a + F.length(t))
                / F.greatest(n_words, F.lit(1)),
                6,
            ),
        )
        .withColumn("stopword_ratio", F.round(n_stop / F.greatest(n_words, F.lit(1)), 6))
    )
    # composite: long enough, not punct/digit soup, has some stopwords
    score = (
        F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.2
        + (1.0 - F.least(F.col("digit_ratio") * 4, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.2
    )
    return out.withColumn("quality_score", F.round(score, 6))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``lang_pred``: argmax stopword-hit-count over the built-in
    lists ('unknown' when no list scores > 0). N-gram-free heuristic —
    deterministic and SQL-replicable."""
    words = _words(text_col)
    scores = []
    for lang, sws in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in sws])
        scores.append(
            F.struct(
                F.size(F.filter(words, lambda t: F.array_contains(arr, t))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # max by (score, lang) — lang desc ties are impossible to hit both ways;
    # order by score then reverse-alpha for a fixed deterministic rule
    best = F.greatest(*scores)
    return df.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown")),
    )


def document_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5, keep: int = 4
) -> DataFrame:
    """(doc_id, fingerprint array<long>) — the ``keep`` smallest
    md5-derived word-k-gram hashes (winnowing-style min-sampling): equal
    fingerprints => near-identical prefix content."""
    from .dedup import shingles, _md5_long

    sh = shingles(df, id_col, text_col, k)
    hashed = sh.select(F.col(id_col), _md5_long(F.col("shingle")).alias("_h"))
    return (
        hashed.groupBy(id_col)
        .agg(F.slice(F.sort_array(F.collect_list("_h")), 1, keep).alias("fingerprint"))
    )
