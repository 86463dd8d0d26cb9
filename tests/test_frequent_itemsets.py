"""SON / FPGrowth frequent-itemset tests: brute-force subset-count oracle,
cross-algorithm agreement, kernel unit tests, and the reference's SON output
rendering contract (SON.scala:232-278)."""

from __future__ import annotations

import itertools
from collections import Counter

import pytest

from inf_553_datamining_mapreduce_spark.operators.frequent_itemsets import (
    apriori_local,
    frequent_itemsets_fpgrowth,
    son_frequent_itemsets,
)
from inf_553_datamining_mapreduce_spark.operators.relational import order_baskets
from inf_553_datamining_mapreduce_spark.sources.readers import read_parquet_table
from inf_553_datamining_mapreduce_spark.sources.sinks import (
    render_itemset,
    son_sort_key,
    write_frequent_itemsets,
)

SUPPORT = 3


def _brute_force(baskets: list[frozenset[int]], support: int) -> dict[tuple, int]:
    cnt: Counter = Counter()
    for b in baskets:
        items = sorted(b)
        for k in range(1, len(items) + 1):
            for c in itertools.combinations(items, k):
                cnt[c] += 1
    return {c: v for c, v in cnt.items() if v >= support}


@pytest.fixture(scope="module")
def baskets_local(spark, sf_dir):
    li = read_parquet_table(spark, sf_dir, "lineitem")
    rows = order_baskets(li).collect()
    return [frozenset(int(x) for x in r["basket"]) for r in rows]


def test_apriori_local_matches_brute_force(baskets_local):
    expected = _brute_force(baskets_local, SUPPORT)
    got = set(apriori_local(baskets_local, SUPPORT))
    assert got == set(expected)


def test_son_matches_brute_force(spark, sf_dir, baskets_local):
    li = read_parquet_table(spark, sf_dir, "lineitem")
    result = son_frequent_itemsets(order_baskets(li), SUPPORT).collect()
    got = {tuple(r["itemset"]): r["support"] for r in result}
    assert got == _brute_force(baskets_local, SUPPORT)


def test_fpgrowth_agrees_with_son(spark, sf_dir, baskets_local):
    li = read_parquet_table(spark, sf_dir, "lineitem")
    fp = frequent_itemsets_fpgrowth(order_baskets(li), SUPPORT).collect()
    got = {tuple(r["itemset"]): r["support"] for r in fp}
    assert got == _brute_force(baskets_local, SUPPORT)


def test_son_custom_partitioning_is_exact(spark, sf_dir, baskets_local):
    """SON must return the same set under any partitioning (float-threshold
    completeness; module docstring)."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    result = son_frequent_itemsets(order_baskets(li), SUPPORT, num_partitions=7).collect()
    got = {tuple(r["itemset"]): r["support"] for r in result}
    assert got == _brute_force(baskets_local, SUPPORT)


def test_son_output_rendering_contract(tmp_path):
    """Reference contract: sizes ascending one line each; itemsets rendered
    '(a, b)' joined by ', '; within a line shorter-first then element-wise
    (SON.scala:232-278)."""
    itemsets = [(3,), (1,), (2, 5), (1, 2), (10,), (1, 2, 3)]
    assert render_itemset((1, 2, 3)) == "(1, 2, 3)"
    assert sorted([(2, 5), (1, 2)], key=son_sort_key) == [(1, 2), (2, 5)]
    out = tmp_path / "son.txt"
    write_frequent_itemsets(itemsets, str(out))
    lines = out.read_text().splitlines()
    assert lines == [
        "(1), (3), (10)",
        "(1, 2), (2, 5)",
        "(1, 2, 3)",
    ]


def test_son_sink_reproduces_reference_golden_bytes(tmp_path):
    """The reference's COMMITTED SON outputs (case 1 at support 1200,
    case 2 at 600 — real runs on the absent ratings.dat) parsed back to
    itemsets and re-rendered through our sink must reproduce the files
    byte-for-byte: proves the size-grouped line structure, the custom
    sortOutput order, and the "(a, b)" rendering on ~300 real itemsets,
    not just synthetic fixtures. (The VALUES can't be recomputed — the
    input is missing from the snapshot — but the S5/O4/O6/F10 contracts
    can be proven on all of them.)"""
    from inf_553_datamining_mapreduce_spark.sources.sinks import (
        write_frequent_itemsets,
    )

    ref = "/root/reference/2-Market Basket Analysis/OutputFiles"
    for fn in ("SON.case1_1200.txt", "SON.case2_600.txt"):
        golden = open(f"{ref}/{fn}").read()
        itemsets = []
        for line in golden.splitlines():
            line = line.strip()
            if not line:
                continue
            for part in line[1:-1].split("), ("):
                itemsets.append(tuple(int(x) for x in part.split(", ")))
        out = tmp_path / fn
        write_frequent_itemsets(itemsets, str(out))
        assert out.read_text().rstrip("\n") == golden.rstrip("\n"), fn
