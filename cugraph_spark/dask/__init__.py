"""Multi-node namespace parity (reference: cugraph/dask/__init__.py).

The reference splits single-GPU and multi-GPU into separate namespaces
(``cugraph.pagerank`` vs ``cugraph.dask.pagerank`` over a dask-cuDF
graph). On Spark every DataFrame is already distributed, so the MG
variants ARE the base implementations — this namespace re-exports them
so multi-GPU callsites port unchanged (``cugraph.dask.pagerank(G, ...)``
-> ``cugraph_spark.dask.pagerank(G, ...)``).

``get_n_workers``/``get_chunksize`` map to their Spark analogs:
scheduler parallelism and the files-source split size.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_n_workers(spark: SparkSession | None = None) -> int:
    """Reference: dask/common/read_utils.py get_n_workers — here the
    Spark default parallelism (task slots across executors)."""
    spark = spark or SparkSession.getActiveSession()
    return spark.sparkContext.defaultParallelism


_SIZE_SUFFIXES = {
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "b": 1, "": 1,
}


def _byte_string_as_bytes(value: str) -> int:
    """Parse a Spark byte-string conf value ('134217728b', '128MB',
    '128m', '1g', ...) case-insensitively, like JavaUtils
    .byteStringAsBytes does on the JVM side."""
    s = str(value).strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, suffix = s[:i], s[i:]
    if not num or suffix not in _SIZE_SUFFIXES:
        raise ValueError(f"cannot parse byte string {value!r}")
    return int(num) * _SIZE_SUFFIXES[suffix]


def get_chunksize(spark: SparkSession | None = None) -> int:
    """Reference: dask/common/read_utils.py get_chunksize — here the
    parquet/csv split size Spark uses to shard file scans (bytes)."""
    spark = spark or SparkSession.getActiveSession()
    return _byte_string_as_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes")
    )


config: dict = {}  # reference: cugraph.dask.config — no knobs needed here


def __getattr__(name):
    # every dask algorithm name resolves to the (already-distributed)
    # base implementation
    import cugraph_spark

    _DASK_NAMES = {
        "all_pairs_cosine", "all_pairs_jaccard", "all_pairs_overlap",
        "all_pairs_sorensen", "betweenness_centrality", "bfs",
        "biased_random_walks", "core_number", "cosine",
        "edge_betweenness_centrality", "ecg", "ego_graph",
        "eigenvector_centrality", "hits", "induced_subgraph", "jaccard",
        "k_core", "katz_centrality", "ktruss_subgraph", "leiden",
        "louvain", "node2vec_random_walks", "overlap", "pagerank",
        "random_walks", "sorensen", "sssp", "triangle_count",
        "uniform_random_walks", "weakly_connected_components",
    }
    if name in _DASK_NAMES:
        return getattr(cugraph_spark, name)
    raise AttributeError(f"module 'cugraph_spark.dask' has no attribute {name!r}")
