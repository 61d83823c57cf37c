"""Large-scale document deduplication operators.

Beyond-reference operators (SURVEY §7 Phase 4): the LLM-training-data
pipeline family, built on the same wedge-join machinery as the
link-prediction operators. All hashing is md5-derived (available in both
Spark and DuckDB) so every operator has an exact cross-engine oracle; the
minhash construction follows the standard Broder scheme
(shingle → k permutations → band → bucket join), public knowledge.

Scale notes:
- exact dedup: one shuffle on the content hash;
- minhash LSH: explode to (doc, shingle) rows — linear in corpus token
  count; per-doc signatures via groupBy; candidate generation is a
  self-join on (band_id, band_signature) buckets, i.e. only docs sharing
  a band collide (no quadratic blowup);
- simhash: 64 bit-sums per doc computed as one array aggregate;
  candidates via 16-bit chunk banding (hamming<=3 guaranteed recalled by
  4-chunk pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans import iterloop

# md5-derived 64-bit-ish hash (15 hex digits = 60 bits, positive): same
# expression is reproducible in DuckDB SQL.
def _md5_long(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# 28-bit base for the permutation family: with 30-bit coefficients the
# product stays < 2^58 — no int64 overflow under Spark's ANSI mode, and
# the identical arithmetic is reproducible in DuckDB.
def _md5_small(col):
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


PERM_P = (1 << 31) - 1  # Mersenne prime 2^31-1
PERM_COEF_MAX = 1 << 30


def _perm_hash(base, a: int, b: int):
    """(a*h + b) mod p — the classic universal-hash permutation family."""
    return (base * F.lit(a) + F.lit(b)) % F.lit(PERM_P)


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash. Returns (doc_id, group_id, group_size,
    is_canonical): group_id = min doc id with identical text."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    g = h.groupBy("_h").agg(
        F.min(id_col).alias("group_id"), F.count("*").alias("group_size")
    )
    return (
        h.join(g, "_h")
        .select(
            F.col(id_col),
            "group_id",
            "group_size",
            (F.col(id_col) == F.col("group_id")).alias("is_canonical"),
        )
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5) -> DataFrame:
    """Distinct word k-shingles per document: (doc_id, shingle)."""
    toks = df.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_t"),
    )
    sh = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, greatest(size(_t) - {k}, 0)),"
                f" i -> array_join(slice(_t, i + 1, {k}), ' '))"
            )
        ).alias("shingle"),
    )
    return sh.distinct()


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """(doc_id, sig array<long>) — minhash signature from shingle rows."""
    import random

    rng = random.Random(seed)
    base = _md5_small(F.col("shingle"))
    mins = [
        F.min(
            _perm_hash(base, rng.randrange(1, PERM_COEF_MAX), rng.randrange(PERM_COEF_MAX))
        ).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(id_col, F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    sig: DataFrame, bands: int = 8, id_col: str = "doc_id", num_hashes: int | None = None
) -> DataFrame:
    """Band the signatures; docs sharing any band bucket become candidate
    pairs (first < second). Pass ``num_hashes`` when known: the fallback
    introspection (``sig.first()``) is a full Spark job that executes the
    whole signature pipeline just to measure the array length."""
    if num_hashes is None:
        num_hashes = len(sig.select("sig").first()["sig"])
    rows_per_band = num_hashes // bands
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b as band, md5(array_join(slice(sig, b * {rows_per_band} + 1,"
                f" {rows_per_band}), '-')) as bsig))"
            )
        ).alias("_b"),
    ).select(id_col, F.col("_b.band").alias("band"), F.col("_b.bsig").alias("bsig"))
    a = banded.select(F.col(id_col).alias("first"), "band", "bsig")
    b = banded.select(F.col(id_col).alias("second"), "band", "bsig")
    return (
        a.join(b, ["band", "bsig"])
        .filter(F.col("first") < F.col("second"))
        .select("first", "second")
        .distinct()
    )


def verify_jaccard(sh: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set jaccard for candidate pairs: (first, second,
    jaccard)."""
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_n"))
    a = sh.select(F.col(id_col).alias("first"), "shingle")
    b = sh.select(F.col(id_col).alias("second"), "shingle")
    inter = (
        pairs.join(a, "first").join(b, ["second", "shingle"])
        .groupBy("first", "second")
        .agg(F.count("*").alias("_i"))
    )
    return (
        pairs.join(inter, ["first", "second"], "left")
        .join(sizes.withColumnRenamed(id_col, "first").withColumnRenamed("_n", "_na"), "first")
        .join(sizes.withColumnRenamed(id_col, "second").withColumnRenamed("_n", "_nb"), "second")
        .select(
            "first",
            "second",
            (
                F.coalesce("_i", F.lit(0))
                / (F.col("_na") + F.col("_nb") - F.coalesce("_i", F.lit(0)))
            ).alias("jaccard"),
        )
    )


def minhash_lsh_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """End-to-end near-dup detection: returns (first, second, jaccard)
    pairs with exact shingle jaccard >= threshold among LSH candidates."""
    sh = shingles(df, id_col, text_col, k).persist()
    sig = minhash_signatures(sh, num_hashes, id_col, seed)
    cand = minhash_lsh_candidates(sig, bands, id_col, num_hashes=num_hashes)
    out = verify_jaccard(sh, cand, id_col).filter(F.col("jaccard") >= threshold)
    # dup pairs ≪ corpus: materialize them and drop the doc×shingle cache
    # rather than leaving it squatting in the session's storage pool
    out = iterloop.materialize(out)
    sh.unpersist()
    return out


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(doc_id, simhash) — Charikar simhash over word tokens."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    h = toks.withColumn("_h", _md5_long(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(bits)
    ]
    agg = h.groupBy(id_col).agg(*bit_sums)
    # compose via shiftleft on a 0/1 column — JVM shift semantics handle
    # bit 63 (sign bit) without the int64-literal overflow of lit(1<<63)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.when(F.col(f"_b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        fp = fp + F.shiftleft(bit, i)
    return agg.select(id_col, fp.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Candidate pairs sharing any 16-bit simhash chunk, kept if hamming
    distance <= max_hamming. Returns (first, second, hamming)."""
    fp = simhash_fingerprints(df, id_col, text_col).persist()
    chunks = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> struct(c as chunk,"
                " pmod(shiftrightunsigned(simhash, c * 16), 65536) as csig))"
            )
        ).alias("_c"),
    ).select(id_col, "simhash", F.col("_c.chunk").alias("chunk"), F.col("_c.csig").alias("csig"))
    a = chunks.select(F.col(id_col).alias("first"), F.col("simhash").alias("_fa"), "chunk", "csig")
    b = chunks.select(F.col(id_col).alias("second"), F.col("simhash").alias("_fb"), "chunk", "csig")
    cand = (
        a.join(b, ["chunk", "csig"])
        .filter(F.col("first") < F.col("second"))
        .select("first", "second", "_fa", "_fb")
        .distinct()
    )
    hamming = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    out = iterloop.materialize(
        cand.select("first", "second", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    fp.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact character-n-gram jaccard for given (first, second) pairs."""
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
                f" i -> substring({text_col}, i, {n}))"
            )
        ).alias("shingle"),
    ).distinct()
    return verify_jaccard(grams, pairs, id_col)


def paragraph_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Paragraph-level corpus dedup (the CCNet recipe, Wenzek et al.
    2020 — public): every paragraph (``\\n\\n``-separated block) that
    already occurred earlier in the corpus is removed; the FIRST
    occurrence — ordered by (doc id, position) — survives. Boilerplate
    (headers, cookie banners, license blocks) repeated across pages
    collapses to a single copy.

    Returns (id, ``text_dedup``, n_paras, n_kept). One shuffle on the
    paragraph hash + one on doc id for reassembly — both linear in
    corpus paragraphs; no all-pairs anything, scales to 100 TB.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n\n")).alias("pos", "para"),
    )
    hashed = paras.withColumn("_h", F.md5("para"))
    first = hashed.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("_f")
    )
    kept = (
        hashed.join(first, "_h")
        .filter((F.col(id_col) == F.col("_f.i")) & (F.col("pos") == F.col("_f.p")))
        .select(id_col, "pos", "para")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            "\n\n",
        ).alias("text_dedup"),
        F.count("*").alias("n_kept"),
    )
    counts = paras.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    return (
        df.select(id_col)
        .join(counts, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_paras", F.lit(0)).cast("int").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        )
    )


def near_duplicate_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """The full production dedup flow: minhash-LSH near-dup pairs above
    ``threshold`` -> connected components over the pair graph (transitive
    closure: A~B, B~C puts A,C in one group even if A,C never collided)
    -> one cluster per group, canonical member = min id. Returns
    (id, cluster_id, is_canonical) for EVERY input document (singletons
    are their own canonical cluster); filtering ``is_canonical`` yields
    the deduplicated corpus.
    """
    from ..components.connectivity import weakly_connected_components
    from ..structure.graph import Graph

    pairs = minhash_lsh_duplicates(
        df, id_col, text_col, k, num_hashes, bands, threshold, seed
    )
    edges = pairs.select(F.col("first").alias("src"), F.col("second").alias("dst"))
    if edges.limit(1).count() == 0:  # no near-dups: all singletons
        return df.select(
            id_col, F.col(id_col).alias("cluster_id"), F.lit(True).alias("is_canonical")
        )
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst")
    wcc = weakly_connected_components(g)
    out = (
        df.select(id_col)
        .join(
            wcc.select(F.col("vertex").alias(id_col), F.col("labels").alias("_cl")),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("_cl", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )
    return out
