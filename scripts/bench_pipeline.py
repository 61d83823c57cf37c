"""LLM-pipeline ops at replicated scale: minhash-LSH dedup, transitive
near-dup clustering, and ANN (IVF vs brute force, with recall) on
corpora ~40-100x the sf fixture.

Feed shape:
- documents: 5,000 x DOC_REPLICAS. Each replica injects its index as a
  token at every whitespace gap, so every word 5-shingle differs across
  replicas (distinct corpus mass). 5% of each replica r >= 1 keeps
  replica-0's text VERBATIM under a fresh id — planted near-dup clusters
  of size DOC_REPLICAS the pipeline must find and close transitively.
- embeddings: 2,000 x VEC_REPLICAS, components hash-jittered +-1% (so
  vectors are distinct but the planted neighborhood structure holds);
  10 base vectors serve as queries. IVF recall is scored against the
  brute-force exact top-k on the identical corpus.

Usage: python scripts/bench_pipeline.py [sf_dir]  (default /root/testdata/sf0.1)
Env: SPARK_GRAFT_DOC_REPLICAS (40), SPARK_GRAFT_VEC_REPLICAS (100),
SPARK_GRAFT_CPUS (32).

Prints ONE JSON line.
"""

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
doc_rep = int(os.environ.get("SPARK_GRAFT_DOC_REPLICAS", "40"))
vec_rep = int(os.environ.get("SPARK_GRAFT_VEC_REPLICAS", "100"))
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("bench_pipeline")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cugraph_spark.pipelines.dedup import (  # noqa: E402
    minhash_lsh_duplicates,
    near_duplicate_clusters,
)
from cugraph_spark.pipelines.similarity_search import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
)

res = {"metric": "pipeline_scale_probe", "unit": "sec", "sf_dir": sf_dir,
       "doc_replicas": doc_rep, "vec_replicas": vec_rep}

# ---- corpus ---------------------------------------------------------------
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
    "doc_id", "text"
)
rep = docs.crossJoin(spark.range(doc_rep).select(F.col("id").alias("_r"))).select(
    (F.col("doc_id") + F.col("_r") * F.lit(1_000_000_000)).alias("doc_id"),
    F.when(
        F.col("doc_id") % 20 == 0, F.col("text")
    )  # planted verbatim dup clusters of size exactly doc_rep (replica 0 included)
    .otherwise(
        F.regexp_replace(
            F.col("text"),
            F.lit(r"\s+"),
            F.concat(F.lit(" r"), F.col("_r").cast("string"), F.lit(" ")),
        )
    )
    .alias("text"),
)
corpus = rep.persist()
n_docs = corpus.count()
res["docs"] = n_docs

# ---- minhash-LSH near-dup pairs -------------------------------------------
t0 = time.time()
pairs = minhash_lsh_duplicates(corpus, num_hashes=32, bands=8, threshold=0.8)
res["lsh_pairs"] = pairs.count()
res["lsh_dedup"] = round(time.time() - t0, 1)

# ---- transitive clustering (LSH -> WCC closure -> canonical pick) ---------
t0 = time.time()
clusters = near_duplicate_clusters(corpus, num_hashes=32, bands=8, threshold=0.8)
agg = clusters.groupBy("cluster_id").agg(F.count("*").alias("_n"))
stats = agg.agg(
    F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).alias("multi"),
    F.max("_n").alias("biggest"),
    F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)).alias("docs_in_dups"),
).collect()[0]
res["dup_clusters"] = stats["multi"]
res["biggest_cluster"] = stats["biggest"]
res["docs_in_dup_clusters"] = stats["docs_in_dups"]
res["near_dup_clusters"] = round(time.time() - t0, 1)
corpus.unpersist()

# ---- ANN: IVF vs brute force ----------------------------------------------
emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
    "vec_id", "embedding"
)
vecs = (
    emb.crossJoin(spark.range(vec_rep).select(F.col("id").alias("_r")))
    .select(
        (F.col("vec_id") + F.col("_r") * F.lit(1_000_000_000)).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) ->"
            " x * (1.0 + (pmod(xxhash64(vec_id, _r, i), 2000) - 1000) / 100000.0))"
        ).alias("embedding"),
    )
    .persist()
)
n_vecs = vecs.count()
res["vectors"] = n_vecs
queries = emb.filter(F.col("vec_id") < 10).select(
    F.col("vec_id").alias("query_id"), "embedding"
)

t0 = time.time()
exact = brute_force_topk(vecs, queries, k=10).persist()
n_exact = exact.count()
res["brute_force"] = round(time.time() - t0, 1)

t0 = time.time()
approx = ivf_topk(vecs, queries, k=10, n_lists=32, n_probe=8).persist()
n_approx = approx.count()
res["ivf"] = round(time.time() - t0, 1)

hits = exact.join(approx, ["query_id", "vec_id"]).count()
res["ivf_recall_at_10"] = round(hits / max(n_exact, 1), 3)

print(json.dumps(res))
