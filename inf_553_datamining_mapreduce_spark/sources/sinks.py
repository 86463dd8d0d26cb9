"""Formatted sinks replicating the reference's string-level output contracts
(SURVEY.md §1.5). These contracts are part of the semantics: golden files in
the reference repo are compared byte-for-byte.

  task1/task2 — lines ``key1,key2,avg`` where avg is ``"%.11f"``-formatted
    then trailing-zero-stripped by a Double→String round-trip
    (``task1.scala:81``, ``task2.scala:43``).
  SON — one line per itemset size, itemsets rendered ``(a, b, c)`` joined by
    ``", "``, ordered shorter-first then element-wise ascending
    (``SON.scala:232-278``).
  betweenness — ``(u1,u2,value)`` lines sorted by (u1,u2) with u1<u2
    (``Betweenness.scala:135-147``).
  communities — ``[m1,m2,...]`` lines, members ascending, communities ordered
    by smallest member (``Community.scala:132-138``).

Large-data paths write distributed CSV/text via Spark; these helpers exist
for the (provably small) formatted outputs the reference defines, where a
single local file IS the contract.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame


def format_avg_11(value: float) -> str:
    """``"%.11f".format(v).toDouble`` → string, i.e. round-half-up to 11
    decimals then strip trailing zeros (``task1.scala:81``).

    Examples: 3.45000... → ``3.45``; 3.8 → ``3.8``; 4.0 → ``4.0``.
    """
    rounded = float(f"{value:.11f}")
    # repr() of a Python float matches Scala's Double.toString for the values
    # in range here (shortest round-trip representation).
    return repr(rounded)


def write_group_avg(df: DataFrame, path: str, key_cols: Sequence[str], avg_col: str) -> None:
    """task1/task2 sink: ``k1,k2,avg`` lines, pre-sorted input expected.

    Collects — valid because the reference contract is a single local file of
    grouped aggregates (thousands of rows), never raw data.
    """
    rows = df.collect()
    with open(path, "w") as fh:
        for row in rows:
            keys = ",".join(str(row[k]) for k in key_cols)
            fh.write(f"{keys},{format_avg_11(row[avg_col])}\n")


def render_itemset(itemset: Sequence[int]) -> str:
    """``(1, 2, 3)`` — reference renders via ``List.toString().replace``
    (``SON.scala:274``); note the space after each comma."""
    return "(" + ", ".join(str(x) for x in itemset) + ")"


def son_sort_key(itemset: Sequence[int]) -> tuple[int, tuple[int, ...]]:
    """The reference's ``sortOutput`` comparator (``SON.scala:232-258``):
    shorter list first, then element-wise ascending."""
    return (len(itemset), tuple(itemset))


def write_frequent_itemsets(
    itemsets: Iterable[Sequence[int]], path: str
) -> None:
    """SON sink: one line per size, sizes ascending; within a line itemsets
    sorted by ``son_sort_key`` and joined by ``", "`` (``SON.scala:264-278``).
    """
    by_size: dict[int, list[tuple[int, ...]]] = {}
    for s in itemsets:
        by_size.setdefault(len(s), []).append(tuple(s))
    with open(path, "w") as fh:
        for size in sorted(by_size):
            line = ", ".join(
                render_itemset(s) for s in sorted(by_size[size], key=son_sort_key)
            )
            fh.write(line + "\n")


def write_betweenness(rows: Iterable[tuple[int, int, float]], path: str) -> None:
    """``(u1,u2,value)`` lines sorted by (u1, u2). The reference writes
    ``collect().mkString("\\n")`` (``Betweenness.scala:147``) — newline
    BETWEEN lines, none trailing; replicated byte-for-byte."""
    lines = [
        f"({u1},{u2},{val})"
        for u1, u2, val in sorted(rows, key=lambda r: (r[0], r[1]))
    ]
    with open(path, "w") as fh:
        fh.write("\n".join(lines))


def write_communities(communities: Iterable[Sequence[int]], path: str) -> None:
    """``[m1,m2,...]`` lines — members ascending within a community,
    communities ordered by smallest member, joined with ``mkString("\\n")``
    (no trailing newline — ``Community.scala:132-138``)."""
    normalized = sorted((sorted(c) for c in communities), key=lambda c: c[0])
    with open(path, "w") as fh:
        fh.write("\n".join("[" + ",".join(str(m) for m in c) + "]" for c in normalized))


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Hive-style partitioned parquet layout — Catalyst prunes partitions
    when downstream filters hit ``partition_cols`` (SURVEY.md §4.2: the
    reference has no partitioned storage; this is the engine's primary sink
    for large outputs)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Bucketed (and per-bucket sorted) table: co-locates rows by hash of
    ``bucket_col`` so later equi-joins/aggregations on it skip the shuffle
    entirely — the pre-partitioning strategy for repeated joins at scale.
    Two tables bucketed on the join key with the same bucket count sort-merge
    join with ZERO Exchange nodes (asserted in test_cli_and_sinks).

    ``path`` makes it an external table at that location; otherwise managed
    in the session warehouse."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def write_single_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S4 analog: distributed write coalesced to one file
    (``task1.scala:83`` ``coalesce(1).saveAsTextFile``). Only for
    contract-bound small outputs; large sinks keep natural parallelism."""
    df.coalesce(1).write.mode("overwrite").csv(path, header=header)


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """Newline-delimited JSON sink — one shard per task (fully parallel,
    no coalesce), optionally compressed. The export format downstream
    tokenizer/training jobs consume; at 100 TB the per-file size is
    governed by the upstream partitioning, so repartition before writing
    if the target system wants bounded shards."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink with the same overwrite contract as the parquet writers."""
    df.write.mode("overwrite").orc(path)
