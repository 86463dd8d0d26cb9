"""Spot-check a SUBSET of registry queries against their DuckDB oracles
at sf0.01 — the iteration loop for new/edited queries without paying the
full-registry sweep. Same vanilla session and compare logic as
``full_correctness.py`` (imported, not duplicated). Usage:

    python scripts/check_queries.py q1 q2 ...  [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)
sys.path.insert(0, os.path.join(REPO_DIR, "scripts"))

from full_correctness import _compare  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as em
    from inf_553_datamining_mapreduce_spark.schemas import TESTDATA_TABLES

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()
    oracles = em.oracle_sql()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name in args:
        t0 = time.perf_counter()
        spark_pdf = queries[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name}: NO ORACLE rows={len(spark_pdf)}")
            continue
        oracle_pdf = con.execute(oracles[name]).fetchdf()
        row = _compare(spark_pdf, oracle_pdf)
        dt = round(time.perf_counter() - t0, 2)
        ok = row["hash_match"] is True and row["err"] is None
        bad += 0 if ok else 1
        print(f"{name}: {'OK' if ok else 'FAIL'} {row} {dt}s")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
