"""Benchmark decontamination: n-gram overlap between train and eval sets.

Beyond-reference (SURVEY §7 Phase 4): the standard public
decontamination rule for LLM training corpora — a training document is
contaminated when it shares at least ``min_hits`` distinct word n-grams
with any document of the evaluation/benchmark set (the n-gram-collision
rule described publicly in the GPT-3 appendix and The Pile paper).

Scale: both sides explode to (doc, ngram-hash) rows — linear in token
count; the join key is the md5-derived 60-bit hash of the n-gram, so the
one shuffle carries longs, not strings. The eval side is normally tiny
relative to the corpus (benchmarks vs 100 TB of training data) and is
aggregated per n-gram before the join so the join's build side is
benchmark-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _md5_long, shingles


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Returns (doc_id, contaminated, n_hits, first_eval_id) for every
    training document: ``n_hits`` = distinct shared n-grams,
    ``first_eval_id`` = smallest eval doc id sharing one (null when
    clean). Deterministic, exact (no sketching) — the n-gram hash join
    is the scale path, not an approximation."""
    tr = shingles(train_df, id_col, text_col, k=ngram).select(
        F.col(id_col), _md5_long(F.col("shingle")).alias("_g")
    )
    ev = (
        shingles(eval_df, id_col, text_col, k=ngram)
        .select(F.col(id_col).alias("_eval_id"), _md5_long(F.col("shingle")).alias("_g"))
        .groupBy("_g")
        .agg(F.min("_eval_id").alias("_eval_min"))
    )
    hits = (
        tr.join(ev, "_g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("_g").alias("n_hits"),
            F.min("_eval_min").alias("first_eval_id"),
        )
    )
    return (
        train_df.select(id_col)
        .distinct()
        .join(hits, id_col, "left")
        .select(
            id_col,
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            "first_eval_id",
        )
    )
