"""Phase-level timing for leiden at sf0.01 (dev tool, not a test)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

t0 = time.time()
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("profile_leiden")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
print(f"session: {time.time()-t0:.1f}s")

import queries_registry as qr

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

t1 = time.time()
g = qr.copurchase_sparse_graph(spark, sf_dir)
n_e = g.number_of_edges(directed_edges=True)
n_v = g.number_of_vertices()
print(f"fixture build: {time.time()-t1:.1f}s  edges={n_e} verts={n_v}")

import cugraph_spark.community.leiden as L
import cugraph_spark.community.louvain as lv

_orig_one = lv._one_level
_orig_split = L._split_disconnected
_orig_tail = L.local_tail


def timed_one(*a, **k):
    t = time.time()
    r = _orig_one(*a, **k)
    print(f"  _one_level: {time.time()-t:.2f}s")
    return r


def timed_split(*a, **k):
    t = time.time()
    r = _orig_split(*a, **k)
    print(f"  _split_disconnected: {time.time()-t:.2f}s (n_level_edges={k.get('n_level_edges')})")
    return r


def timed_tail(*a, **k):
    t = time.time()
    r = _orig_tail(*a, **k)
    print(f"  local_tail: {time.time()-t:.2f}s")
    return r


L._one_level = timed_one
L._split_disconnected = timed_split
L.local_tail = timed_tail

t2 = time.time()
parts, q = L.leiden(g, max_level=2, max_iter=10)
n = parts.count()
print(f"leiden total: {time.time()-t2:.1f}s  rows={n} Q={q:.4f}")
print(f"grand total: {time.time()-t0:.1f}s")
