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
