"""sf10 HITS fresh-process cost decomposition (r9 verdict item 6).

Phase A (``cold``): in a fresh JVM, time the 7.6M-edge scan+distinct
build alone (the suspected dominator), then the full registered
``hits_supplier_parts`` in the same process (its internal distinct
re-runs over warm I/O, so the phase-A pair brackets the cold total and
attributes the cold share).

Phase B (``memo``): write the distinct supplier->part edges ONCE per SF
to ``.localdata/sf{N}/memo_supplier_edges.parquet`` sorted by src (the
persist-once-reuse-everywhere layout every graph query over this
relation can share), then in a fresh process time HITS reading the memo
instead of re-distincting lineitem.

Host canary legs (bench._host_canary) run around each phase so the
numbers are normalizable against the documented 4-7x box-throughput
swings. Run with ``SPARK_GRAFT_DRIVER_MEM=32g`` (the established sf10
sweep convention — the 59M-edge distinct's hash aggregate needs more
than the 8g default under 32 concurrent tasks) and an otherwise-idle
box (a concurrent Spark process inflated the distinct leg 30.9 ->
169.1 s in this round's first attempt). Usage:

    SPARK_GRAFT_DRIVER_MEM=32g python scripts/hits_sf10_cold.py \\
        cold|memo-write|memo-run [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    mode = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".localdata", "sf10"
    )
    from bench import _host_canary

    from pyspark.sql import functions as F

    from inf_553_datamining_mapreduce_spark.operators import graph as G
    from inf_553_datamining_mapreduce_spark.session import get_spark
    from inf_553_datamining_mapreduce_spark.sources.readers import (
        read_parquet_table,
    )

    spark = get_spark("hits-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"canary pre: {_host_canary()}", flush=True)

    memo_path = os.path.join(sf_dir, "memo_supplier_edges.parquet")
    if mode == "cold":
        li = read_parquet_table(spark, sf_dir, "lineitem")
        t0 = time.perf_counter()
        e = (
            li.select(
                F.col("l_suppkey").cast("long").alias("src"),
                F.col("l_partkey").cast("long").alias("dst"),
            )
            .distinct()
            .localCheckpoint()
        )
        n = e.count()
        t_distinct = time.perf_counter() - t0
        print(f"cold distinct build: {t_distinct:.1f}s ({n} edges)",
              flush=True)
        t0 = time.perf_counter()
        li2 = read_parquet_table(spark, sf_dir, "lineitem")
        e2 = li2.select(
            F.col("l_suppkey").cast("long").alias("src"),
            F.col("l_partkey").cast("long").alias("dst"),
        )
        G.hits_scores(e2, iters=5).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"hits after warm I/O: {time.perf_counter() - t0:.1f}s",
              flush=True)
    elif mode == "memo-write":
        li = read_parquet_table(spark, sf_dir, "lineitem")
        t0 = time.perf_counter()
        (
            li.select(
                F.col("l_suppkey").cast("long").alias("src"),
                F.col("l_partkey").cast("long").alias("dst"),
            )
            .distinct()
            .sortWithinPartitions("src")
            .write.mode("overwrite")
            .parquet(memo_path)
        )
        print(f"memo write: {time.perf_counter() - t0:.1f}s", flush=True)
    elif mode == "memo-run":
        t0 = time.perf_counter()
        e = spark.read.parquet(memo_path)
        G.hits_scores(e, iters=5).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"hits from memo (fresh process): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"canary post: {_host_canary()}", flush=True)


if __name__ == "__main__":
    main()
