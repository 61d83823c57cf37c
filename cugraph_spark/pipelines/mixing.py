"""Dataset mixing for training-data pipelines: stratified sampling and
token-budget selection.

Beyond-reference (SURVEY §2.I family). Pre-training corpora are mixed
from sources with per-source sampling rates or token budgets; both
operators here are deterministic (seeded xxhash64 priority, never
``F.rand`` whose output depends on partition layout), so a mix is
exactly reproducible and SQL-oracle-checkable.

Scale notes: ``stratified_sample`` is a pure filter (no shuffle — at
100 TB it's a map-side scan). ``token_budget_sample`` needs a running
token total per stratum, i.e. one window-sort per stratum; strata are
few (sources), so the sort shards by stratum and Spark's external sort
spills cleanly — the standard plan for budgeted selection.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame, Window, functions as F


def _priority(id_col: str, seed: int):
    """Deterministic u in [0, 1) per row."""
    return (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 30)).cast("double")
        / float(1 << 30)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping,
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keeps each row of stratum s with probability ``fractions[s]``
    (deterministic: row kept iff hash-uniform(id) < fraction). Strata
    missing from ``fractions`` fall back to ``default_fraction``.

    Equivalent to ``df.sampleBy`` but reproducible across partitionings
    and engines — the property the correctness harness (and any rerun of
    a data pipeline) needs.
    """
    frac = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == F.lit(k)
        frac = F.when(cond, F.lit(float(v))) if frac is None else frac.when(cond, F.lit(float(v)))
    frac = F.lit(float(default_fraction)) if frac is None else frac.otherwise(
        F.lit(float(default_fraction))
    )
    return df.filter(_priority(id_col, seed) < frac)


_TB_BUCKETS = 256


def token_budget_sample(
    df: DataFrame,
    budgets: Mapping,
    strata_col: str = "source",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
    default_budget: Optional[int] = None,
) -> DataFrame:
    """Selects documents per stratum until the stratum's token budget is
    reached: rows are taken in seeded-hash priority order and a row is
    kept while the running token total (exclusive of the current row)
    is under the budget — so the first row crossing the budget is kept
    (a budget smaller than the first document still yields one document;
    overshoot is bounded by one document, the standard knapsack-free
    budgeting rule). Strata absent from ``budgets`` use
    ``default_budget`` (None = keep everything in that stratum).

    Scale path: NO per-stratum full sort. The hash-priority domain is
    split into buckets; one aggregation finds each over-budget stratum's
    boundary bucket (driver sees strata x buckets token sums — tiny),
    whole buckets before the boundary are kept with a filter, and only
    the boundary bucket's rows (~1/buckets of the stratum) go through
    the window sort. Exactly equivalent to the naive global-cumsum
    definition the oracle computes.
    """
    budget_by = dict(budgets)

    def budget_of(s):
        return budget_by.get(s, default_budget)

    pri_int = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 30))
    bucket_width = (1 << 30) // _TB_BUCKETS
    work = df.withColumn("_pri", pri_int).withColumn(
        "_bkt", F.floor(F.col("_pri") / F.lit(bucket_width)).cast("int")
    )

    # one aggregation: per-(stratum, bucket) token sums
    sums = (
        work.groupBy(strata_col, "_bkt")
        .agg(F.sum(F.col(token_col).cast("long")).alias("_t"))
        .collect()
    )
    per_stratum: dict = {}
    for r in sums:
        per_stratum.setdefault(r[strata_col], {})[r["_bkt"]] = r["_t"]

    keep_all, boundary, drop_all = [], {}, []
    for s, bmap in per_stratum.items():
        b = budget_of(s)
        if b is None or sum(bmap.values()) <= b:
            keep_all.append(s)
            continue
        cum = 0
        bstar, before = None, 0
        for bkt in range(_TB_BUCKETS):
            t = bmap.get(bkt, 0)
            if cum + t >= b and t > 0:
                bstar, before = bkt, cum
                break
            cum += t
        if bstar is None:  # all remaining buckets empty; everything fits
            keep_all.append(s)
        else:
            boundary[s] = (bstar, before, b)

    scol = F.col(strata_col)

    def match(s):
        return scol.isNull() if s is None else scol == F.lit(s)

    nonnull_keep = [s for s in keep_all if s is not None]
    keep_whole = scol.isin(nonnull_keep) if nonnull_keep else F.lit(False)
    if None in keep_all:
        keep_whole = keep_whole | scol.isNull()
    pieces = [work.filter(keep_whole).drop("_pri", "_bkt")]
    if boundary:
        bstar_expr = None
        before_expr = None
        budget_expr = None
        for s, (bstar, before, b) in boundary.items():
            cond = match(s)
            bstar_expr = (F.when(cond, bstar) if bstar_expr is None else bstar_expr.when(cond, bstar))
            before_expr = (F.when(cond, before) if before_expr is None else before_expr.when(cond, before))
            budget_expr = (F.when(cond, b) if budget_expr is None else budget_expr.when(cond, b))
        bcond = None
        for s in boundary:
            bcond = match(s) if bcond is None else bcond | match(s)
        bounded = work.filter(bcond)
        # whole buckets strictly before the boundary are kept outright
        pieces.append(
            bounded.filter(F.col("_bkt") < bstar_expr).drop("_pri", "_bkt")
        )
        # only the boundary bucket sorts; offset by the tokens before it
        edge = bounded.filter(F.col("_bkt") == bstar_expr)
        w = Window.partitionBy(strata_col).orderBy("_pri", id_col)
        cum = F.sum(F.col(token_col).cast("long")).over(w) + before_expr
        pieces.append(
            edge.withColumn("_cum", cum)
            .filter(F.col("_cum") - F.col(token_col).cast("long") < budget_expr)
            .drop("_pri", "_bkt", "_cum")
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """GPT-style sequence packing: documents are laid out on one global
    token stream in deterministic seeded-hash order and cut into
    ``seq_len``-token training sequences; a document crossing a cut
    simply continues into the next sequence. Returns the packing map
    (id, stream_start, bin_id = stream_start // seq_len, bin_offset =
    stream_start % seq_len, n_bins_spanned) — enough for a reader to
    assemble any training sequence by range-scanning the map.

    Global prefix sums don't need a single sorted partition: the
    classic two-phase scan — per-bucket token sums (one aggregation),
    driver-side prefix over the tiny bucket table, within-bucket window
    cumsum offset by the bucket prefix — gives the exact global cumsum
    with only bucket-local sorts (~1/buckets of the data each).
    """
    pri = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 30))
    bucket_width = (1 << 30) // _TB_BUCKETS
    work = df.withColumn("_pri", pri).withColumn(
        "_bkt", F.floor(F.col("_pri") / F.lit(bucket_width)).cast("int")
    )
    sums = (
        work.groupBy("_bkt").agg(F.sum(F.col(token_col).cast("long")).alias("_t")).collect()
    )
    by_bucket = {r["_bkt"]: r["_t"] for r in sums}
    prefix, run = {}, 0
    for b in range(_TB_BUCKETS):
        prefix[b] = run
        run += by_bucket.get(b, 0)
    pre = None
    for b, off in prefix.items():
        if b not in by_bucket:
            continue
        cond = F.col("_bkt") == F.lit(b)
        pre = F.when(cond, off) if pre is None else pre.when(cond, off)
    w = Window.partitionBy("_bkt").orderBy("_pri", id_col)
    local_cum = F.sum(F.col(token_col).cast("long")).over(w) - F.col(token_col).cast("long")
    start = (local_cum + pre).alias("stream_start")
    out = work.select(
        id_col,
        F.col(token_col).cast("long").alias(token_col),
        start,
    )
    return out.select(
        id_col,
        token_col,
        "stream_start",
        F.floor(F.col("stream_start") / seq_len).cast("long").alias("bin_id"),
        F.pmod(F.col("stream_start"), F.lit(seq_len)).alias("bin_offset"),
        F.floor(
            (F.col("stream_start") + F.col(token_col) - 1) / seq_len
        ).cast("long").alias("last_bin_id"),
    )
