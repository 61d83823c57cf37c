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
    kept while the running token total (inclusive) fits the budget, plus
    the first row that crosses it (so a budget smaller than the first
    document still yields one document; budget overshoot is bounded by
    one document — the standard knapsack-free budgeting rule).

    Strata absent from ``budgets`` use ``default_budget`` (None = keep
    everything in that stratum).
    """
    pri = _priority(id_col, seed)
    w = Window.partitionBy(strata_col).orderBy(pri, F.col(id_col))
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    budget = None
    for k, v in budgets.items():
        cond = F.col(strata_col) == F.lit(k)
        budget = F.when(cond, F.lit(int(v))) if budget is None else budget.when(cond, F.lit(int(v)))
    if budget is None:
        budget = F.lit(default_budget if default_budget is not None else None).cast("long")
    elif default_budget is not None:
        budget = budget.otherwise(F.lit(int(default_budget)))
    out = df.withColumn("_cum_tokens", cum)
    keep = (
        budget.isNull()
        | (F.col("_cum_tokens") - F.col(token_col).cast("long") < budget)
    )
    return out.filter(keep).drop("_cum_tokens")
