"""Cross-engine xxhash64 parity — the foundation of the exact oracles.

testing/xxh_sql.py generates DuckDB SQL computing Spark's XXH64 closed
form; if these ever diverge, every hash-seeded oracle (rmat, walks,
sampling, MIS, coloring) silently rots. Checked bit-for-bit over a value
range including negatives and both long and chained-int-literal folds.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from cugraph_spark.testing.xxh_sql import (
    fold_steps,
    pmod_sql,
    to_i64,
    xxhash64_steps,
)


def test_xxh64_sql_matches_spark(spark):
    sdf = spark.range(-50, 50).select(
        "id",
        F.xxhash64("id").alias("h_long"),
        F.xxhash64("id", F.lit(7)).alias("h_chain"),
        F.xxhash64("id", F.lit(7), F.lit(3), "id").alias("h_multi"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1 << 30)).alias("h_pmod"),
    )
    expected = {r["id"]: (r["h_long"], r["h_chain"], r["h_multi"], r["h_pmod"]) for r in sdf.collect()}

    s1, f1 = xxhash64_steps("a", [("id", "long")])
    s2, f2 = xxhash64_steps("b", [("id", "long"), ("7", "int")])
    s3, f3 = xxhash64_steps("c", [("id", "long"), ("7", "int"), ("3", "int"), ("id", "long")])
    q = fold_steps(
        "SELECT id FROM generate_series(-50, 49) t(id)",
        s1 + s2 + s3,
        final_select=(
            f"id, {to_i64(f1)} AS h_long, {to_i64(f2)} AS h_chain, "
            f"{to_i64(f3)} AS h_multi, {pmod_sql(to_i64(f2), 1 << 30)} AS h_pmod"
        ),
    )
    for id_, *vals in duckdb.connect().execute(q).fetchall():
        assert tuple(vals) == expected[id_], f"hash mismatch at id={id_}"


def test_top_level_exports():
    import cugraph_spark as cg

    for name in (
        "NumberMap", "concurrent_bfs", "select_random_vertices",
        "pagerank", "louvain", "rmat", "minimum_spanning_tree",
    ):
        assert getattr(cg, name) is not None
    with pytest.raises(AttributeError):
        cg.definitely_not_an_operator
