"""CLI surface, betweenness sink contract, and partitioned/bucketed writers."""

from __future__ import annotations

import subprocess
import sys

from pyspark.sql import functions as F

from inf_553_datamining_mapreduce_spark.sources.readers import read_parquet_table
from inf_553_datamining_mapreduce_spark.sources.sinks import (
    write_betweenness,
    write_partitioned_parquet,
)


def test_cli_list_runs():
    out = subprocess.run(
        [sys.executable, "-m", "inf_553_datamining_mapreduce_spark", "list"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 0
    assert "pricing_summary  [oracle]" in out.stdout
    assert "edge_betweenness_customers  [rows-only]" in out.stdout


def test_betweenness_sink_contract(tmp_path):
    rows = [(3, 7, 1.5), (1, 2, 4.0), (1, 10, 2.25)]
    out = tmp_path / "betweenness.txt"
    write_betweenness(rows, str(out))
    # (u1,u2,value) lines sorted by (u1, u2) — Betweenness.scala:135-147
    assert out.read_text().splitlines() == [
        "(1,2,4.0)",
        "(1,10,2.25)",
        "(3,7,1.5)",
    ]


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    orders = read_parquet_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned_parquet(orders, path, ["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    pruned = back.filter(F.col("o_orderstatus") == "F")
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == expected
    # partition pruning shows up as PartitionFilters in the scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge join with ZERO Exchange nodes — the co-located-join
    guarantee that makes bucketing worth the write cost at scale."""
    from inf_553_datamining_mapreduce_spark.sources.readers import (
        read_parquet_table,
    )
    from inf_553_datamining_mapreduce_spark.sources.sinks import (
        write_bucketed_table,
    )

    orders = read_parquet_table(spark, sf_dir, "orders")
    customer = read_parquet_table(spark, sf_dir, "customer")
    write_bucketed_table(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_orders_b",
        "o_custkey",
        num_buckets=4,
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed_table(
        customer.select("c_custkey", "c_name"),
        "t_customer_b",
        "c_custkey",
        num_buckets=4,
        path=str(tmp_path / "customer_b"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(
            spark.table("t_customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    """jsonl write → read with explicit schema reproduces the table exactly
    (modulo row order) — the corpus-interchange contract."""
    from inf_553_datamining_mapreduce_spark.sources.readers import read_jsonl
    from inf_553_datamining_mapreduce_spark.sources.sinks import write_jsonl

    docs = read_parquet_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, docs.schema)
    assert back.schema == docs.schema
    a = sorted(docs.collect())
    b = sorted(back.collect())
    assert a == b


def test_orc_round_trip_pushes_filters(spark, sf_dir, tmp_path):
    """ORC write → read round-trips, and a filter on the read side reaches
    the ORC scan as a pushed filter (same pruning contract as parquet)."""
    from inf_553_datamining_mapreduce_spark.sources.readers import read_orc_table
    from inf_553_datamining_mapreduce_spark.sources.sinks import write_orc

    orders = read_parquet_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc_table(spark, path)
    assert back.count() == orders.count()
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan
