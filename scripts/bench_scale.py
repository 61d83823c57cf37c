import time, sys
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from cugraph_spark.session import get_spark
from cugraph_spark import Graph, pagerank, bfs, weakly_connected_components, sssp, rmat

spark = get_spark("scale_probe")
spark.sparkContext.setLogLevel("ERROR")

for scale in (18, 20):
    ne = (1 << scale) * 16
    t0 = time.time()
    edges = rmat(scale, ne, seed=42, include_edge_weights=True,
                 minimum_weight=0.1, maximum_weight=1.0, spark=spark)
    g = Graph(directed=False)
    g.from_edgelist(edges, "src", "dst", weight="weight")
    n_e = g.number_of_edges(directed_edges=True)
    n_v = g.number_of_vertices()
    t_build = time.time() - t0
    print(f"scale={scale}: |V|={n_v} |E|={n_e} build={t_build:.1f}s", flush=True)

    t0 = time.time()
    pagerank(g, max_iter=10, tol=0.0, fail_on_nonconvergence=False).agg(F.sum("pagerank")).collect()
    print(f"  pagerank(10 iters): {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    bfs(g, 0).agg(F.max("distance")).collect()
    print(f"  bfs: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    weakly_connected_components(g).agg(F.countDistinct("labels")).collect()
    print(f"  wcc: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    sssp(g, 0).agg(F.sum(F.when(F.col("distance") != float("inf"), F.col("distance")))).collect()
    print(f"  sssp: {time.time()-t0:.1f}s", flush=True)
    g.edgelist.unpersist()
spark.stop()
