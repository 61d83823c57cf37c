"""Spark-side wall time per declared query (no oracle, no compare).

Runs each selected registry query with the driver's correctness setup
(local[8], sf0.01 by default), 1 warm-up + N timed reps, and prints the
min/median — the honest Spark-side figure the contract wall embeds.

Usage: python scripts/profile_queries.py [name_substr ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_PROFILE_REPS (default 2)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))


def main():
    filters = sys.argv[1:]
    import __spark_entry__ as mod
    from cugraph_spark.session import get_spark

    spark = get_spark("profile_queries", master="local[8]", shuffle_partitions=8)
    qs = mod.queries()
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        spark.sparkContext.setJobDescription(name)
        try:
            t0 = time.time()
            n = len(fn(spark, SF_DIR).toPandas())
            cold = time.time() - t0
            samples = []
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, SF_DIR).toPandas()
                samples.append(time.time() - t0)
            s = sorted(samples)
            print(
                f"{name}: cold {cold:.2f}s warm_min {s[0]:.2f}s "
                f"({n} rows)", flush=True
            )
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
