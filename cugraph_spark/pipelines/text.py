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


def _occurrence_stats(arr, weighted: bool = False):
    """Struct(total, best, dup) over the multiset ``arr``:

    - total: number of elements (or total chars when ``weighted``)
    - best:  occurrence count of the most frequent element
    - dup:   elements (or chars) belonging to values occurring > 1 time

    Linear per row: sort the array, then a single ``F.aggregate`` pass
    accumulates run lengths — no explode/groupBy shuffle, so at 100 TB
    this is pure map-side work inside whole-stage codegen.
    """
    sorted_a = F.sort_array(arr)
    w = (lambda x: F.length(x)) if weighted else (lambda x: F.lit(1))
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dup"),
        F.lit(0).alias("total"),
    )

    def step(acc, x):
        is_rep = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(is_rep, acc["run"] + 1).otherwise(F.lit(1))
        # a run reaching 2 retroactively counts its first occurrence too
        dup = acc["dup"] + F.when(
            is_rep, F.when(acc["run"] == 1, w(x) + w(x)).otherwise(w(x))
        ).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            dup.alias("dup"),
            (acc["total"] + w(x)).alias("total"),
        )

    st = F.aggregate(sorted_a, zero, step)
    return F.struct(
        st["total"].alias("total"), st["best"].alias("best"), st["dup"].alias("dup")
    )


def _word_ngrams(text_col: str, n: int):
    """Non-distinct word n-gram list (same tokenization/slice semantics as
    dedup.shingles: docs shorter than n yield one partial gram)."""
    return F.expr(
        f"transform(sequence(0, greatest(size(split(lower(trim({text_col})),"
        f" '\\\\s+')) - {n}, 0)),"
        f" i -> array_join(slice(split(lower(trim({text_col})), '\\\\s+'), i + 1, {n}), ' '))"
    )


def repetition_scores(
    df: DataFrame, text_col: str = "text", top_n: int = 2, dup_n: int = 5
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training Gopher",
    Appendix A1.1 — public paper). Adds:

    - ``n_lines``: non-empty (post-trim) line count
    - ``dup_line_frac``: fraction of line occurrences whose line value
      occurs more than once in the document
    - ``dup_line_char_frac``: same, weighted by line length in chars
    - ``top_ngram_frac``: occurrences of the most frequent word
      ``top_n``-gram / total ``top_n``-gram occurrences
    - ``dup_ngram_frac``: fraction of word ``dup_n``-gram occurrences
      belonging to grams occurring more than once

    Documents exceeding thresholds (e.g. dup_line_frac > 0.30,
    top_ngram_frac > 0.20) are boilerplate/spam candidates. All columns
    are deterministic JVM expressions with exact DuckDB equivalents.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    lstats = _occurrence_stats(lines)
    lcstats = _occurrence_stats(lines, weighted=True)
    tstats = _occurrence_stats(_word_ngrams(text_col, top_n))
    dstats = _occurrence_stats(_word_ngrams(text_col, dup_n))

    def frac(num, den):
        return F.round(num / F.greatest(den, F.lit(1)), 6)

    return (
        df.withColumn("n_lines", lstats["total"])
        .withColumn("dup_line_frac", frac(lstats["dup"], lstats["total"]))
        .withColumn("dup_line_char_frac", frac(lcstats["dup"], lcstats["total"]))
        .withColumn("top_ngram_frac", frac(tstats["best"], tstats["total"]))
        .withColumn("dup_ngram_frac", frac(dstats["dup"], dstats["total"]))
    )


# PII patterns kept to constructs shared by Java regex and RE2 (DuckDB):
# no lookaround, no backreferences. Order matters: emails first (an email
# contains digit runs a later pattern could clip).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\+?\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replaces emails / IPv4s / phone-shaped digit runs with placeholder
    tokens and adds per-kind match counts (``n_email``, ``n_ip``,
    ``n_phone``). A standard pre-training scrub step; pure
    ``regexp_replace`` / ``regexp_extract_all`` column expressions —
    shuffle-free, whole-stage-codegen, exact DuckDB equivalents."""
    out = df
    redacted = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(redacted, F.lit(pat), 0)),
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn(f"{text_col}_redacted", redacted)


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


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Splits each document into whitespace-token chunks of at most
    ``max_tokens`` tokens, consecutive chunks sharing ``overlap`` tokens
    (sliding window, stride = max_tokens - overlap) — the standard
    context-window preparation step for pre-training/embedding corpora.

    Returns (id, chunk_id, chunk_text, n_chunk_tokens). Pure column
    expressions + one posexplode: linear, shuffle-free, codegen'd.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    # number of windows covering all n tokens: ceil((n - overlap)/stride)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, max_tokens),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_ctoks"),
    )
    return out.select(
        id_col,
        "chunk_id",
        F.array_join("_ctoks", " ").alias("chunk_text"),
        F.size("_ctoks").alias("n_chunk_tokens"),
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_floor: float = 1e-9,
) -> DataFrame:
    """Corpus-level language-model filter proxy (the CCNet recipe trains
    a KenLM; the distributed-friendly first cut is a corpus unigram
    model): score(d) = mean over d's tokens of log10 P(token), with
    P(token) = corpus_count(token) / corpus_total. Documents far below
    the corpus median read as gibberish / OOV-heavy; far above as
    repetitive boilerplate.

    Two linear shuffles: one groupBy for the corpus counts, one
    explode+join+groupBy for the per-doc means — no per-row vocabulary
    broadcast, so an unbounded vocabulary is fine at 100 TB.
    Deterministic; ``oov_floor`` only guards the (impossible for a
    corpus-internal token) zero-count case.
    """
    words = df.select(
        F.col(id_col), F.explode(_words(text_col)).alias("_w")
    ).filter(F.col("_w") != "")
    counts = words.groupBy("_w").agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c")).collect()[0][0] or 1
    logp = F.log10(
        F.greatest(F.col("_c") / F.lit(float(total)), F.lit(float(oov_floor)))
    )
    per_doc = (
        words.join(counts, "_w")
        .groupBy(id_col)
        .agg(
            F.round(F.avg(logp), 6).alias("unigram_logprob"),
            F.count("*").alias("n_scored_tokens"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("unigram_logprob", F.lit(0.0)).alias("unigram_logprob"),
            F.coalesce("n_scored_tokens", F.lit(0)).cast("int").alias("n_scored_tokens"),
        )
    )
