"""ANN-only scale probe: IVF vs brute force at replicated corpus scale
(same corpus construction as bench_pipeline.py, minus the dedup half),
for fast interleaved A/Bs of the similarity-search path.

Usage: python scripts/bench_ann.py [sf_dir]   (default /root/testdata/sf0.1)
Env: SPARK_GRAFT_VEC_REPLICAS (100), SPARK_GRAFT_CPUS (32),
     SPARK_GRAFT_ANN_REPS (2).
Prints ONE JSON line.
"""

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
vec_rep = int(os.environ.get("SPARK_GRAFT_VEC_REPLICAS", "100"))
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
reps = int(os.environ.get("SPARK_GRAFT_ANN_REPS", "2"))

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("bench_ann")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cugraph_spark.pipelines.similarity_search import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
)

res = {"metric": "ann_scale_probe", "unit": "sec", "sf_dir": sf_dir,
       "vec_replicas": vec_rep}

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
res["vectors"] = vecs.count()
queries = emb.filter(F.col("vec_id") < 10).select(
    F.col("vec_id").alias("query_id"), "embedding"
)


def timed(fn):
    samples = []
    for _ in range(reps):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 1))
    return samples


res["brute_samples"] = timed(lambda: brute_force_topk(vecs, queries, k=10))
res["ivf_samples"] = timed(
    lambda: ivf_topk(vecs, queries, k=10, n_lists=32, n_probe=8)
)
res["brute_force"] = min(res["brute_samples"])
res["ivf"] = min(res["ivf_samples"])

exact = brute_force_topk(vecs, queries, k=10).persist()
n_exact = exact.count()
approx = ivf_topk(vecs, queries, k=10, n_lists=32, n_probe=8)
hits = exact.join(approx, ["query_id", "vec_id"]).count()
res["ivf_recall_at_10"] = round(hits / max(n_exact, 1), 3)

print(json.dumps(res))
