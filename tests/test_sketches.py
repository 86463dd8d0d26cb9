"""Sketch accuracy: HLL++ approximate distinct counts must track the exact
values within the configured relative standard deviation."""

from __future__ import annotations

from inf_553_datamining_mapreduce_spark.operators.relational import (
    approx_distinct_parts,
)
from inf_553_datamining_mapreduce_spark.sources.readers import read_parquet_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = read_parquet_table(spark, sf_dir, "lineitem")
    rows = approx_distinct_parts(li, include_exact=True).collect()
    assert rows
    for r in rows:
        exact, approx = r["exact_parts"], r["approx_parts"]
        assert abs(approx - exact) <= max(2.0, 0.1 * exact), (
            f"supplier {r['l_suppkey']}: approx {approx} vs exact {exact}"
        )
