"""Top-k maximal-biclique mining over a bipartite edge list (experimental).

Reference: experimental/structure/bicliques.py:10
(``EXPERIMENTAL__find_bicliques(df, k, offset=0, max_iter=-1, support=1.0,
min_features=1, min_machines=10)`` → ``(B, S)`` where B = ``(id, vert,
type)`` with type 0 = machine (src side) / 1 = feature (dst side), and S =
``(id, total, machines, features, bad_ratio)`` using the input's ``flag``
column to mark bad machines).

The reference loops the features in descending-degree order on the driver,
re-querying the edge list per feature (bicliques.py:90-130). The Spark
re-expression batches that: the per-feature machine sets and the
co-feature occurrence counts for *every* seed feature come out of one
wedge self-join (``E ⋈ E on src``) + ``groupBy`` — the same plan shape as
all-pairs similarity (SURVEY §2.F) — after which per-seed support
filtering, the reference's consecutive-duplicate-machine-set skip
(approximated as an exact machine-set-hash dedup, which is strictly
stronger), and top-k selection are plain DataFrame ops. One shuffle
instead of ``2×iter_max`` driver round trips.

Scale: the wedge join is quadratic in per-machine feature counts; seeds
are pre-filtered to features with ``count >= min_machines`` before the
join, which prunes the candidate space the same way the reference's
``min_machines`` test does (just earlier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def find_bicliques(
    df: DataFrame,
    k: int,
    offset: int = 0,
    max_iter: int = -1,
    support: float = 1.0,
    min_features: int = 1,
    min_machines: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Find the top-k (greedy, feature-seeded) maximal bicliques.

    ``df`` columns: ``src`` (machine), ``dst`` (feature), ``flag``
    (non-zero = bad machine). Returns ``(B, S)`` DataFrames shaped like
    the reference's.
    """
    if support > 1.0 or support < 0.1:
        raise NameError("support must be between 0.1 and 1.0")
    for col in ("src", "dst", "flag"):
        if col not in df.columns:
            raise NameError(f"{col} column not found")

    e = df.select("src", (F.col("dst") - F.lit(offset)).alias("dst"), "flag")

    # feature degrees, descending (reference _count_features)
    fdeg = e.groupBy("dst").agg(F.count("*").alias("count"))
    seeds = fdeg.filter(F.col("count") >= F.lit(min_machines))
    if max_iter != -1:
        seeds = seeds.withColumn(
            "_rk",
            F.row_number().over(Window.orderBy(F.desc("count"), F.asc("dst"))),
        ).filter(F.col("_rk") <= max_iter).drop("_rk")

    # machine-set signature per seed feature: reference skips a feature
    # whose machine set equals the previous one; dedup on the exact set
    sig = (
        e.join(seeds.select("dst"), "dst")
        .groupBy("dst")
        .agg(F.xxhash64(F.concat_ws(",", F.sort_array(F.collect_list("src")))).alias("_sig"))
    )
    seed_w = Window.partitionBy("_sig").orderBy(F.desc("count"), F.asc("dst"))
    seeds = (
        seeds.join(sig, "dst")
        .withColumn("_dup", F.row_number().over(seed_w))
        .filter(F.col("_dup") == 1)
        .drop("_dup", "_sig")
    )

    # one wedge join: seed feature f -> its machines -> their co-features
    m_of_f = e.select(F.col("dst").alias("_f"), "src", "flag").join(
        seeds.select(F.col("dst").alias("_f"), F.col("count").alias("_fdeg")), "_f"
    )
    co = (
        m_of_f.join(e.withColumnRenamed("dst", "_g"), "src")
        .groupBy("_f", "_fdeg", "_g")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= F.ceil(F.col("_fdeg") * F.lit(support)))
    )
    nfeat = co.groupBy("_f", "_fdeg").agg(F.count("*").alias("_nf"))
    qualified = nfeat.filter(F.col("_nf") > F.lit(min_features))

    # top-k seeds by degree → dense cluster ids (reference answer_id order)
    id_w = Window.orderBy(F.desc("_fdeg"), F.asc("_f"))
    chosen = qualified.withColumn("id", F.row_number().over(id_w) - 1)
    if k > -1:
        chosen = chosen.filter(F.col("id") < k)

    machines = (
        m_of_f.join(chosen.select("_f", "id"), "_f")
        .select("id", F.col("src").alias("vert"), F.lit(0).alias("type"), "flag")
    )
    features = (
        co.join(chosen.select("_f", "id"), "_f")
        .select("id", (F.col("_g") + F.lit(offset)).alias("vert"), F.lit(1).alias("type"))
    )
    bicliques = machines.select("id", "vert", "type").unionAll(features)

    mstats = machines.groupBy("id").agg(
        F.count("*").alias("machines"),
        F.sum((F.col("flag") != 0).cast("long")).alias("_bad"),
    )
    fstats = features.groupBy("id").agg(F.count("*").alias("features"))
    stats = (
        mstats.join(fstats, "id")
        .select(
            "id",
            (F.col("machines") + F.col("features")).alias("total"),
            "machines",
            "features",
            (F.col("_bad") / F.col("machines")).alias("bad_ratio"),
        )
    )
    return bicliques, stats
