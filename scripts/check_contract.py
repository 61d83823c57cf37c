"""Mimic the driver's verify: run entry(), then every queries() entry at
sf0.01 side-by-side with its oracle_sql() in DuckDB; compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_contract.py [name_filter ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def duck_con(sf_dir: str):
    con = duckdb.connect()
    # Out-of-core settings for the sf0.1 contract (r6): the unrolled
    # iterative oracles hold every materialized CTE of a WITH alive at
    # once (30 pagerank iterations x edge-sized joins), which exceeds the
    # in-memory budget at 10x fixture scale — a temp_directory lets
    # DuckDB spill instead of raising OutOfMemoryException.
    con.execute("SET temp_directory='/tmp/duckdb_contract_spill'")
    con.execute(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '48GB')}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            ac, bc = a[c], b[c]
            if ac.dtype.kind == "f" or bc.dtype.kind == "f":
                import numpy as np

                bad = ~np.isclose(
                    ac.astype(float), bc.astype(float), rtol=0, atol=1.5e-6, equal_nan=True
                )
            else:
                bad = ac.astype(str).values != bc.astype(str).values
            n_bad = int(bad.sum())
            if n_bad:
                i = int(bad.argmax()) if hasattr(bad, "argmax") else list(bad).index(True)
                problems.append(
                    f"col {c}: {n_bad} mismatching values, first at row {i}: "
                    f"spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
                )
    return problems


def main():
    filters = sys.argv[1:]
    import __spark_entry__ as mod
    from cugraph_spark.session import get_spark

    spark = get_spark("contract_check", master="local[8]", shuffle_partitions=8)

    t0 = time.time()
    res = mod.entry(spark)
    n = res.count()
    print(f"entry(): {n} rows, schema={res.schema.simpleString()} [{time.time()-t0:.1f}s]")
    assert n >= 0

    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duck_con(SF_DIR)
    failed = []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark query raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: {len(spark_pdf)} rows (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
