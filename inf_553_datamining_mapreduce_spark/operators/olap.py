"""Classic warehouse query shapes beyond the reference's surface: TPC-H-style
multi-join aggregates (Q4/Q5/Q7/Q12/Q16/Q18/Q19/Q22 analogues on the driver's
star schema), semi/anti-join membership queries, per-group argmin, sequence
analytics (lag gaps, lead transitions), distribution ranks (percent_rank /
cume_dist / ntile), and a table-fingerprint checksum.

No reference analog (SURVEY.md §2.9 extension surface) — these are the query
shapes a production deployment of the engine runs daily, expressed so
Catalyst keeps every dimension join broadcast and every aggregate partial.

Scale stance (100 TB):
  * Every dim join (part/supplier/nation/region/customer) carries an explicit
    ``F.broadcast`` hint — fact tables never shuffle for dimension lookups.
  * Fact-fact joins (lineitem⋈orders) are key-partitioned shuffles; AQE
    handles skew splitting.
  * Monetary aggregates use the decimal-exact accumulation idiom from
    ``relational._dsum`` so results are bit-identical across engines and
    row orders.
  * Window shapes partition by bounded keys (customer, status, user); global
    orderings (NTILE scores, percent_rank) go through ``_global_ranks`` —
    range-partitioned TeraSort-shape ranking — never a single-partition
    ``Window.orderBy``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from inf_553_datamining_mapreduce_spark.operators.relational import (
    _davg,
    _DEC,
    _dsum,
)


def _global_ranks(
    df: DataFrame,
    order_cols: list,
    rank_name: str = "_rank",
    total_name: str | None = None,
    num_parts: int | None = None,
) -> DataFrame:
    """Exact 1-based global row numbers over a total order WITHOUT a
    single-partition window — the TeraSort shape: range-repartition on the
    sort key (sampled, balanced boundaries), ``row_number`` within each
    range, then add each range's row-count offset via a broadcast join.

    ``localCheckpoint`` pins the sampled range boundaries: the offset branch
    and the rank branch must see the SAME partitioning, and a re-executed
    range sampling job could draw different splits. Everything downstream of
    the checkpoint is deterministic.

    The caller makes the order TOTAL (unique tie-break column) when exact
    per-row ranks matter; with ties, only tie-group {min,max} of the ranks
    are deterministic (the range partitioner never splits equal keys across
    partitions, so tie groups stay intact). The only single-task work is
    the cumulative offset over ``num_parts`` rows — provably tiny.
    ``total_name`` additionally attaches the total row count as a column
    (computed from the same per-range counts, no extra scan).
    """
    spark = df.sparkSession
    n_parts = num_parts or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
    ]
    if total_name is not None:
        w_all = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_cnt").over(w_all).alias(total_name))
    offsets = counts.select(*off_cols)
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(
            rank_name,
            (F.row_number().over(w_local) + F.col("_off")).cast("long"),
        )
        .drop("_pid", "_off")
    )


def _global_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_name: str = "_psum",
    num_parts: int | None = None,
) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` over a total order
    WITHOUT a single-partition window — ``_global_ranks``' weighted twin:
    range-repartition on the sort key, running sum within each range,
    then add each range's value-total offset via a broadcast join. Same
    ``localCheckpoint`` pin (the offset branch and the local-sum branch
    must see the SAME sampled range boundaries), same tiny single-task
    surface (the cumulative offset over ``num_parts`` rows). Values must
    be integral for engine-exact results — callers sum token counts,
    not floats."""
    spark = df.sparkSession
    n_parts = num_parts or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = parts.groupBy("_pid").agg(F.sum(value_col).alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_name,
            (F.sum(value_col).over(w_local) + F.col("_off")).cast("long"),
        )
        .drop("_pid", "_off")
    )


def _ntile_from_rank(rank: F.Column, n_total: F.Column, n: int) -> F.Column:
    """NTILE(n) bucket as a pure expression over an exact 1-based global
    rank: the first (N mod n) buckets take ceil(N/n) rows, the rest take
    floor(N/n) — the NTILE contract Spark and DuckDB share. Replaces the
    single-partition ``ntile().over(Window.orderBy(...))`` with arithmetic
    on ``_global_ranks`` output."""
    q = F.floor(n_total / n)
    rem = n_total % n
    big = q + F.lit(1)
    threshold = rem * big
    return (
        F.when(rank <= threshold, F.floor((rank - 1) / big))
        .otherwise(rem + F.floor((rank - 1 - threshold) / q))
        + F.lit(1)
    ).cast("int")


def _disc_price() -> F.Column:
    """Exact discounted price term: decimal(18,6) * decimal(13,6) = (32,12),
    sums within 38 digits — bit-identical cross-engine (relational.py:63)."""
    return F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1).cast("decimal(12,6)") - F.col("l_discount").cast("decimal(12,6)")
    )


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: revenue shipped between customers and suppliers of the
    SAME nation, rolled up to (region, nation). The customer⋈supplier
    co-nation constraint is the interesting part — it rides the lineitem row
    (l_suppkey) meeting the order's customer, an equality on two dim
    attributes, not a join explosion."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def volume_shipping_by_year(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume — revenue per (supplier
    nation, customer nation, ship year) for DIFFERENT nations. Two broadcast
    joins against the same nation dim under different aliases."""
    n_supp = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n_cust = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def returnflag_priority_counts(
    lineitem: DataFrame,
    orders: DataFrame,
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q12 shape (shipmode→returnflag, this schema has no shipmode):
    per return flag, how many shipped items belong to high-priority orders
    (1-URGENT / 2-HIGH) vs the rest, within a ship-date year. One fact-fact
    join, conditional counts — no second pass."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.coalesce(F.sum(F.when(high, 1)), F.lit(0)).cast("long").alias("high_line_count"),
            F.coalesce(F.sum(F.when(~high, 1)), F.lit(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def brand_supplier_counts(
    lineitem: DataFrame, part: DataFrame, exclude_brand: str = "Brand#45"
) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each (brand, size),
    excluding one brand. Broadcast part dim; the distinct count is the only
    shuffle (Expand over the group keys)."""
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_brand") != exclude_brand)),
            lineitem.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy("p_brand", "p_size")
    )


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: float = 250.0,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a threshold,
    with their customer. The HAVING aggregate runs FIRST (orderkey grain —
    one shuffle of lineitem's two columns), and only qualifying keys join
    back — at 100 TB the join input is the filtered key set, not lineitem."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(_dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy("c_custkey", "o_orderkey")
    )


def discounted_revenue_band(
    lineitem: DataFrame,
    qty_lo: float = 5.0,
    qty_hi: float = 15.0,
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
) -> DataFrame:
    """TPC-H Q19 shape (single band, no part join): revenue from small
    shipments in a discount corridor. Pure scan-filter-aggregate; both
    predicates push to the parquet scan."""
    return (
        lineitem.filter(
            F.col("l_quantity").between(qty_lo, qty_hi)
            & F.col("l_discount").between(disc_lo, disc_hi)
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, max_orders: int = 3
) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average account balance but
    fewer than ``max_orders`` orders — dormant high-value accounts. The
    global average is one scalar row cross-joined in (broadcast-trivial);
    order counts attach by key."""
    avg_bal = customer.agg(_davg("c_acctbal").alias("avg_bal"))
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .join(counts, F.col("c_custkey") == F.col("o_custkey"), "left")
        .filter(
            (F.col("c_acctbal") > F.col("avg_bal"))
            & (F.coalesce(F.col("n_orders"), F.lit(0)) < max_orders)
        )
        .select(
            "c_custkey",
            "c_acctbal",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


def late_shipment_priority_counts(
    lineitem: DataFrame, orders: DataFrame, grace_days: int = 90
) -> DataFrame:
    """TPC-H Q4 shape: orders with AT LEAST ONE line shipped more than
    ``grace_days`` after the order date, counted per priority. The EXISTS is
    a left-semi join on the order key with the lateness predicate as a
    residual — each order counts once no matter how many late lines."""
    late = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (orders.o_orderkey == late.l_orderkey)
            & (
                late.l_shipdate
                > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def cheapest_shipment_per_part(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q2 shape (argmin per group): for every part, the cheapest
    shipment line and which supplier sent it — total deterministic order via
    the full key tie-break. One window over the part key; at 100 TB the
    partition key count is the part cardinality, perfectly parallel."""
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("l_extendedprice").asc(),
        F.col("l_suppkey").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return (
        lineitem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .orderBy("l_partkey")
    )


def parts_not_recently_ordered(
    part: DataFrame, lineitem: DataFrame, since: str = "2001-01-01"
) -> DataFrame:
    """Anti-join membership: parts with NO shipment since a cutoff — the
    stale-inventory report. The recent-key set is filtered BEFORE the anti
    join (predicate pushes to the scan), so the anti probe side is small."""
    recent = lineitem.filter(
        F.col("l_shipdate") >= F.lit(since).cast("timestamp")
    ).select("l_partkey")
    return (
        part.join(recent, part.p_partkey == recent.l_partkey, "left_anti")
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )


def customers_with_urgent_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi-join membership: customers having >= 1 URGENT order. Left-semi
    keeps exactly one row per member with no aggregate state."""
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def customer_order_gaps(orders: DataFrame) -> DataFrame:
    """Inter-order gap statistics per customer: days between consecutive
    orders (lag over the customer partition), then min/max/sum/avg. The avg
    divides two exact longs — one IEEE op, bit-identical cross-engine."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("long").alias("gap_days"),
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("gap_days").alias("n_gaps"),
            F.min("gap_days").alias("min_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
            F.sum("gap_days").alias("sum_gap_days"),
            (F.sum("gap_days") / F.count("gap_days")).alias("avg_gap_days"),
        )
        .filter(F.col("n_gaps") > 0)
        .orderBy("o_custkey")
    )


def order_price_percent_rank(orders: DataFrame) -> DataFrame:
    """Distribution position of every order within its status:
    ``percent_rank`` and ``cume_dist``. Both are exact rationals evaluated
    in one IEEE division, so ties and values agree across engines
    regardless of physical row order.

    Scale shape: ``o_orderstatus`` has ~3 distinct values, so a window
    partitioned on it is three giant single-task sorts. Instead the rows get
    exact global ranks over (status, price) via ``_global_ranks`` (range
    partitioning never splits a tie group, so tie-group min/max ranks are
    deterministic even though per-row numbers within a tie are not), and
    percent_rank/cume_dist fall out as arithmetic:

        pct_rank  = (min_rank_in_tie - status_offset)     / (n_status - 1)
        cume_dist = (max_rank_in_tie - status_offset + 1) /  n_status

    — each the same single IEEE long/long division the window functions
    perform, so values stay bit-identical to the oracle."""
    ranked = _global_ranks(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        [F.col("o_orderstatus").asc(), F.col("o_totalprice").asc()],
        "_rank",
    )
    w_tie = Window.partitionBy("o_orderstatus", "o_totalprice")
    per_status = ranked.groupBy("o_orderstatus").agg(
        (F.min("_rank") - 1).alias("_s_off"),
        F.count(F.lit(1)).alias("_s_n"),
    )
    return (
        ranked.withColumn("_rmin", F.min("_rank").over(w_tie))
        .withColumn("_rmax", F.max("_rank").over(w_tie))
        .join(F.broadcast(per_status), "o_orderstatus")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.when(
                F.col("_s_n") > 1,
                (F.col("_rmin") - 1 - F.col("_s_off")) / (F.col("_s_n") - 1),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
            ((F.col("_rmax") - F.col("_s_off")) / F.col("_s_n")).alias("cume_dist"),
        )
        .orderBy("o_orderkey")
    )


def user_value_ntiles(events: DataFrame, n: int = 4) -> DataFrame:
    """Per-user lifetime value quartiles: decimal-exact value totals, then
    NTILE(n) semantics over (total, user_id) — the tie-break makes bucket
    assignment total-order deterministic. The classic LTV segmentation
    query. NTILE is computed from exact distributed global ranks
    (``_global_ranks`` + ``_ntile_from_rank``) instead of a
    single-partition ``Window.orderBy`` — same buckets, TeraSort scaling."""
    totals = events.groupBy("user_id").agg(_dsum("value").alias("total_value"))
    ranked = _global_ranks(
        totals,
        [F.col("total_value").asc(), F.col("user_id").asc()],
        "_rank",
        total_name="_n",
    )
    return (
        ranked.select(
            "user_id",
            "total_value",
            _ntile_from_rank(F.col("_rank"), F.col("_n"), n).alias(
                "value_quartile"
            ),
        )
        .orderBy("user_id")
    )


def customer_revenue_percent_rank(orders: DataFrame) -> DataFrame:
    """Global distribution position of every customer's lifetime revenue:
    decimal-exact per-customer totals, then ``percent_rank`` over the
    (revenue, custkey) total order — computed from ``_global_ranks``
    (TeraSort-shape exact ranking) instead of a single-partition window.
    The composite order is unique, so each row is its own peer group and
    pct_rank = (rank-1)/(N-1) — the same single IEEE division the window
    function performs."""
    rev = orders.groupBy("o_custkey").agg(_dsum("o_totalprice").alias("revenue"))
    ranked = _global_ranks(
        rev,
        [F.col("revenue").asc(), F.col("o_custkey").asc()],
        "_rank",
        total_name="_n",
    )
    return (
        ranked.select(
            "o_custkey",
            "revenue",
            F.when(
                F.col("_n") > 1, (F.col("_rank") - 1) / (F.col("_n") - 1)
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
        )
        .orderBy("o_custkey")
    )


def supplier_part_pareto(lineitem: DataFrame) -> DataFrame:
    """Pareto (ABC) analysis per supplier: parts ranked by revenue within
    their supplier, with each part's cumulative share of the supplier's
    total. The window partitions on ``l_suppkey`` (bounded: one supplier's
    part list) and the running decimal sum is made deterministic by the
    (revenue desc, partkey) total order inside the partition; the share is
    a single double division of two exactly-accumulated decimals.

    One shuffle total: the explicit repartition on ``l_suppkey`` satisfies
    BOTH the (suppkey, partkey) aggregate's clustering requirement (subset
    rule) and the window's, so the plan shows a single hashpartitioning
    exchange instead of aggregate-then-window re-shuffling the fact table
    twice (pinned by a plan test)."""
    rev = (
        lineitem.repartition("l_suppkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("rev_d"))
    )
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.col("rev_d").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_suppkey")
    return (
        rev.select(
            "l_suppkey",
            "l_partkey",
            F.col("rev_d").cast("double").alias("part_revenue"),
            (
                F.sum("rev_d").over(w_run).cast("double")
                / F.sum("rev_d").over(w_all).cast("double")
            ).alias("cum_share"),
        )
        .orderBy("l_suppkey", "l_partkey")
    )


def customer_running_spend(orders: DataFrame) -> DataFrame:
    """Cumulative spend per customer over their order history — the
    running-LTV view behind churn and cohort models. The running decimal
    sum is deterministic via the (orderdate, orderkey) total order inside
    each bounded customer partition; each emitted double is one exact
    decimal cast."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").alias("order_price"),
            F.sum(F.col("o_totalprice").cast(_DEC))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


def first_purchase_attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution: for each user's FIRST purchase, the event
    type that immediately preceded it and how many events came before —
    the conversion-path query every growth team runs. One window pass
    (user partition) produces both the lag attribution and the sequence
    number; timestamps emit as floored epoch seconds (the engine-agnostic
    session_stats convention)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(w).alias("seq_no"),
    )
    wp = Window.partitionBy("user_id").orderBy("seq_no")
    return (
        seq.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("first_purchase_epoch"),
            F.coalesce(F.col("prev_type"), F.lit("(none)")).alias(
                "prev_event_type"
            ),
            (F.col("seq_no") - 1).cast("long").alias("n_prior_events"),
        )
        .orderBy("user_id")
    )


def session_time_to_purchase(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Seconds from session start to the session's first purchase, for
    sessions that convert — the engagement-to-conversion latency metric.
    Sessions follow the ``session_stats`` floored-seconds gap contract;
    the per-session aggregate takes one conditional MIN, so converting
    and non-converting sessions separate without a second pass."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0).alias("new_s"),
    ).withColumn(
        "session_seq",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = marked.groupBy("user_id", "session_seq").agg(
        F.min(F.unix_timestamp("ts")).alias("start_epoch"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.unix_timestamp("ts")
            )
        ).alias("purchase_epoch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_session.filter(F.col("purchase_epoch").isNotNull())
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "start_epoch",
            "purchase_epoch",
            (F.col("purchase_epoch") - F.col("start_epoch")).alias(
                "secs_to_purchase"
            ),
            "n_events",
        )
        .orderBy("user_id", "session_seq")
    )


def open_order_backlog_by_month(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Monthly open-order backlog — the classic concurrent-intervals
    (stabbing) operator: an order is open from its order month until the
    month its LAST lineitem ships. Counting opens per month (+1) and
    closes per month (−1) and running-summing the net turns an interval
    overlap count into one aggregate plus a cumsum over the month spine —
    no order⋈month interval join ever materializes. The only global
    window runs over the distinct-months table (provably small: a
    century of data is 1,200 rows). Orders with no shipped lineitem stay
    open forever (no close event)."""
    close = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("close_date")
    )
    o = orders.join(
        close, orders.o_orderkey == close.l_orderkey, "left"
    )
    start_m = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
    close_m = F.date_format(F.date_trunc("month", F.col("close_date")), "yyyy-MM")
    opens = o.select(
        start_m.alias("month"),
        F.lit(1).alias("d_open"),
        F.lit(0).alias("d_close"),
    )
    closes = o.filter(F.col("close_date").isNotNull()).select(
        close_m.alias("month"),
        F.lit(0).alias("d_open"),
        F.lit(1).alias("d_close"),
    )
    deltas = (
        opens.unionAll(closes)
        .groupBy("month")
        .agg(
            F.sum("d_open").alias("n_opened"),
            F.sum("d_close").alias("n_closed"),
        )
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        deltas.select(
            "month",
            F.col("n_opened").cast("long").alias("n_opened"),
            F.col("n_closed").cast("long").alias("n_closed"),
            F.sum(F.col("n_opened") - F.col("n_closed"))
            .over(w)
            .cast("long")
            .alias("backlog"),
        )
        .orderBy("month")
    )


def events_hourly_heatmap(events: DataFrame) -> DataFrame:
    """Traffic heatmap: event volume and distinct users per (day-of-week,
    hour-of-day) cell — the capacity-planning rollup. One aggregate at
    168-cell grain; dow is 1=Sunday..7=Saturday in both engines (DuckDB's
    0-based ``dow`` is shifted in the oracle). Timestamps are evaluated
    under the UTC session pin so the bucketing is host-timezone-free."""
    return (
        events.groupBy(
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hour")
    )


def event_type_transitions(events: DataFrame) -> DataFrame:
    """First-order behavioral transitions: for each user's time-ordered
    event stream, count (event_type → next event_type) pairs plus how many
    distinct users made each transition — the Markov-matrix input for
    funnel/session modeling. One window (user partition), one aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("from_type", "to_type")
    )


def weekly_active_users(events: DataFrame) -> DataFrame:
    """WAU rollup: distinct users and event volume per ISO week (Monday
    start in both Spark and DuckDB). Time-bucketed distinct count — one
    shuffle at week grain."""
    wk = F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
    return (
        events.groupBy(wk.alias("week_start"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("week_start")
    )


def orders_checksum(orders: DataFrame) -> DataFrame:
    """Order-insensitive table fingerprint per status: row count plus the
    sum of a 60-bit md5-derived hash of the (orderkey, custkey) identity,
    folded mod 1e9+7 so ~9e9 rows sum without int64 overflow. Two replicas
    (or two engines) holding the same rows produce the same checksum — the
    cross-system reconciliation primitive that avoids shipping any data."""
    h = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", "o_orderkey", "o_custkey")), 1, 15),
            16,
            10,
        ).cast("long")
        % 1000000007
    )
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(h).alias("checksum"),
        )
        .orderBy("o_orderstatus")
    )


def top_brands_per_type_with_ties(lineitem: DataFrame, part: DataFrame, k: int = 3) -> DataFrame:
    """Top-k brands per part type by shipment count, INCLUDING ties:
    ``dense_rank`` ranks by the count value alone, so equally-popular brands
    share a rank and all of them survive the k cut — the semantics business
    reporting usually wants (vs ``row_number``'s arbitrary tie drop, O7).
    dense_rank depends only on the value being ranked, so it is
    deterministic without any tie-break column."""
    counts = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    w = Window.partitionBy("p_type").orderBy(F.col("n_items").desc())
    return (
        counts.withColumn("rank", F.dense_rank().over(w))
        .filter(F.col("rank") <= k)
        .select("p_type", "p_brand", "n_items", "rank")
        .orderBy("p_type", "rank", "p_brand")
    )


def most_common_event_per_user(events: DataFrame) -> DataFrame:
    """Per-user modal event type (the MODE aggregate) with a total
    deterministic tie-break (higher count, then lexicographic type): one
    count aggregate, one row_number window over the user key."""
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    # The mode argmax — (n_events DESC, event_type ASC) — as ONE
    # partial-aggregatable min(struct(-n_events, event_type)) instead
    # of a row_number window: identical winner under the same total
    # order, no per-user sort exchange (r13 optimization round).
    return (
        counts.groupBy("user_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_events")).alias("nn"), F.col("event_type")
                )
            ).alias("b")
        )
        .select(
            "user_id",
            F.col("b.event_type").alias("event_type"),
            (-F.col("b.nn")).alias("n_events"),
        )
        .orderBy("user_id")
    )


def orders_yoy_growth(orders: DataFrame) -> DataFrame:
    """Year-over-year monthly revenue growth: each month joins the month
    exactly 12 months earlier (join on a shifted month key, NOT lag(12) —
    a calendar gap would silently misalign a positional lag). The ratio
    divides two already-bit-identical doubles; months with no prior-year
    row are omitted."""
    monthly = orders.groupBy(
        F.trunc(F.col("o_orderdate"), "month").alias("month_start")
    ).agg(_dsum("o_totalprice").alias("revenue"))
    prev = monthly.select(
        F.col("month_start").alias("prev_start"),
        F.col("revenue").alias("prev_revenue"),
    )
    return (
        monthly.join(
            prev, monthly.month_start == F.add_months(prev.prev_start, 12)
        )
        .select(
            F.date_format("month_start", "yyyy-MM").alias("month"),
            "revenue",
            "prev_revenue",
            (F.col("revenue") / F.col("prev_revenue")).alias("yoy_ratio"),
        )
        .orderBy("month")
    )


def daily_revenue_drawdown(orders: DataFrame) -> DataFrame:
    """Daily order revenue vs its running historical peak, and the drawdown
    from that peak — the health-dashboard shape for any metric with a
    high-water mark. The running max is order-independent (max of exact
    doubles over an unbounded preceding frame), so the window is
    deterministic; daily sums are decimal-exact first."""
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(_dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("peak_revenue", F.max("revenue").over(w))
        .select(
            "day",
            "revenue",
            "peak_revenue",
            (F.col("peak_revenue") - F.col("revenue")).alias("drawdown"),
        )
        .orderBy("day")
    )


def qty_price_correlation(lineitem: DataFrame) -> DataFrame:
    """Pearson correlation and sample covariance of quantity vs extended
    price per return flag — computed from DECIMAL-EXACT co-moment sums
    (n, Σx, Σy, Σxy, Σx², Σy²), then one fixed double expression. Spark's
    built-in ``corr`` streams double co-moments whose value depends on
    accumulation order; this formulation is order-independent and
    bit-identical cross-engine, at the cost of wider aggregate state —
    the right trade when results must be reproducible run-to-run."""
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - F.lit(1.0))
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "l_returnflag",
        F.col("n").alias("n_items"),
        corr.alias("corr_qty_price"),
        cov.alias("cov_qty_price"),
    ).orderBy("l_returnflag")


def supplier_revenue_share(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Each supplier's share of its nation's revenue: per-supplier
    decimal-exact revenue, then a window total over the nation partition
    (summed IN DECIMAL so the windowed total is order-independent too) and
    one IEEE division. The share-of-parent shape every drill-down report
    uses, with no second aggregation pass."""
    rev = (
        lineitem.groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).alias("rev_dec"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("s_nationkey")
    return rev.select(
        "l_suppkey",
        "s_nationkey",
        F.col("rev_dec").cast("double").alias("revenue"),
        (
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double")
        ).alias("nation_share"),
    ).orderBy("l_suppkey")


def daily_priority_share(orders: DataFrame) -> DataFrame:
    """Daily order-priority mix: per (day, priority) counts plus each
    priority's share of the day — the window count stays in exact longs,
    the share is one IEEE division."""
    counts = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.partitionBy("day")
    return counts.select(
        "day",
        "o_orderpriority",
        "n_orders",
        (F.col("n_orders") / F.sum("n_orders").over(w)).alias("day_share"),
    ).orderBy("day", "o_orderpriority")


def user_first_last_events(events: DataFrame) -> DataFrame:
    """Per-user first and last event (argmin AND argmax by event time with
    an event_id tie-break) plus the total count, in one pass: two
    row_number windows share the user exchange (one shuffle, two sorts),
    then a conditional aggregate pivots the two marked rows into one."""
    w_asc = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_desc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.row_number().over(w_asc).alias("rn_first"),
        F.row_number().over(w_desc).alias("rn_last"),
    )
    return (
        marked.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rn_first") == 1, F.col("event_id"))).alias(
                "first_event_id"
            ),
            F.max(F.when(F.col("rn_first") == 1, F.col("event_type"))).alias(
                "first_event_type"
            ),
            F.max(F.when(F.col("rn_last") == 1, F.col("event_id"))).alias(
                "last_event_id"
            ),
            F.max(F.when(F.col("rn_last") == 1, F.col("event_type"))).alias(
                "last_event_type"
            ),
        )
        .orderBy("user_id")
    )


def orders_time_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP over the time hierarchy year → quarter → month: one Expand +
    hash aggregate produces all three grains plus the grand total, with
    grouping() flags disambiguating NULL-vs-ALL — the calendar twin of the
    status/priority rollup family."""
    # grouping() must name a real grouping COLUMN (not a rollup alias of an
    # expression), so the calendar parts are projected first.
    parts = orders.select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.month("o_orderdate").cast("int").alias("mon"),
        "o_totalprice",
    )
    return (
        parts.rollup("yr", "qtr", "mon")
        .agg(
            # grouping() is only resolvable INSIDE the rollup aggregate
            F.grouping("yr").cast("int").alias("g_yr"),
            F.grouping("qtr").cast("int").alias("g_qtr"),
            F.grouping("mon").cast("int").alias("g_mon"),
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("yr"), F.lit(-1)).alias("yr"),
            F.coalesce(F.col("qtr"), F.lit(-1)).alias("qtr"),
            F.coalesce(F.col("mon"), F.lit(-1)).alias("mon"),
            "g_yr",
            "g_qtr",
            "g_mon",
            "n_orders",
            "total_price",
        )
        .orderBy("yr", "qtr", "mon", "g_yr", "g_qtr", "g_mon")
    )


def funnel_conversion_rates(session_funnels: DataFrame) -> DataFrame:
    """Aggregate conversion funnel from per-session depth flags
    (``streaming.windows.session_funnel`` output): sessions reaching each
    stage and the step conversion rate vs the previous stage — exact long
    counts, one IEEE division per rate."""
    agg = session_funnels.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.coalesce(F.sum(F.when(F.col("reached_view"), 1)), F.lit(0))
        .cast("long")
        .alias("n_view"),
        F.coalesce(F.sum(F.when(F.col("reached_click"), 1)), F.lit(0))
        .cast("long")
        .alias("n_click"),
        F.coalesce(F.sum(F.when(F.col("reached_purchase"), 1)), F.lit(0))
        .cast("long")
        .alias("n_purchase"),
    )
    return agg.select(
        "n_sessions",
        "n_view",
        "n_click",
        "n_purchase",
        (F.col("n_view") / F.col("n_sessions")).alias("view_rate"),
        (F.col("n_click") / F.col("n_view")).alias("click_through_rate"),
        (F.col("n_purchase") / F.col("n_click")).alias("purchase_rate"),
    )


def source_language_mix(documents: DataFrame) -> DataFrame:
    """Per-source language composition: counts and each language's share of
    its source (windowed share-of-parent over exact longs) — the corpus
    governance report behind any mixture decision."""
    counts = documents.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("source")
    return counts.select(
        "source",
        "lang",
        "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("source_share"),
    ).orderBy("source", "lang")


def events_daily_zscores(events: DataFrame) -> DataFrame:
    """Daily volume anomaly scores per event type: each (day, type) count's
    z-score against that type's distribution over days. The co-moments
    (n, Σc, Σc²) are exact order-independent sums — Σc a long, Σc² a
    decimal so squaring a >3e9 daily count can never wrap int64 (Spark
    wraps silently where DuckDB raises; widening keeps the engines
    identical at any scale) — and the mean/std/z-score is one fixed double
    expression evaluated on double operands (``sc`` is squared AFTER the
    double cast for the same reason), so the result is bit-identical
    cross-engine (population σ; a zero-variance type emits z=0.0 —
    NULL/NaN doubles would poison cross-engine value hashing). The
    anomaly-baseline query every monitoring pipeline runs."""
    daily = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    sq = F.col("n_events").cast("decimal(18,0)")
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("sc"),
        F.sum(sq * sq).alias("scc"),
    )
    n = F.col("n_days").cast("double")
    sc_d = F.col("sc").cast("double")
    scc_d = F.col("scc").cast("double")
    mean = F.col("sc") / n
    var = (n * scc_d - sc_d * sc_d) / (n * n)
    return (
        daily.join(stats, "event_type")
        .select(
            "day",
            "event_type",
            "n_events",
            mean.alias("mean_daily"),
            F.when(var > 0, (F.col("n_events") - mean) / F.sqrt(var))
            .otherwise(F.lit(0.0))
            .alias("zscore"),
        )
        .orderBy("day", "event_type")
    )


def customer_rfm_segments(orders: DataFrame) -> DataFrame:
    """Classic RFM segmentation: per customer, recency (days from last
    order to the corpus max date), frequency (order count), monetary
    (decimal-exact total), each scored into quartiles with NTILE semantics
    and a customer-id tie-break (total order → deterministic buckets), and
    the three digits concatenated into the familiar segment code.

    Scale shape: the three quartile scores are NTILE over three different
    global orderings — as single-partition ``Window.orderBy`` NTILEs that
    is three sequential whole-table one-task sorts. Instead each ordering
    gets exact distributed global ranks (``_global_ranks``, chained so no
    join-back on customer is needed) and the bucket falls out of
    ``_ntile_from_rank`` — identical buckets, three parallel range sorts."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        _dsum("o_totalprice").alias("monetary"),
    )
    max_date = per_cust.agg(F.max("last_order").alias("max_date"))
    base = per_cust.crossJoin(F.broadcast(max_date)).select(
        "o_custkey",
        F.datediff("max_date", "last_order").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    cust = F.col("o_custkey").asc()
    ranked = _global_ranks(
        base, [F.col("recency_days").asc(), cust], "_rr", total_name="_n"
    )
    ranked = _global_ranks(ranked, [F.col("frequency").desc(), cust], "_fr")
    ranked = _global_ranks(ranked, [F.col("monetary").desc(), cust], "_mr")
    n = F.col("_n")
    return (
        ranked.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            _ntile_from_rank(F.col("_rr"), n, 4).alias("r_score"),
            _ntile_from_rank(F.col("_fr"), n, 4).alias("f_score"),
            _ntile_from_rank(F.col("_mr"), n, 4).alias("m_score"),
        )
        .withColumn(
            "rfm_code",
            F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")),
        )
        .orderBy("o_custkey")
    )


def session_paths(events: DataFrame, gap_sec: int = 1800, top_n: int = 50) -> DataFrame:
    """Most common session journeys: events grouped into gap-sessions (the
    ``session_stats`` floored-seconds contract), each session rendered as
    its time-ordered event-type path string, then the top-N paths by
    session count with full deterministic tie-breaks. The per-session path
    builds via sort_array over (ts, event_id) structs inside one aggregate
    — no second window pass."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lag("ts").over(w))
    )
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0).alias("new_s"),
    ).withColumn(
        "session_seq",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = marked.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.expr(
                "transform(sort_array(collect_list(struct(ts, event_id, event_type))),"
                " x -> x.event_type)"
            ),
        ).alias("path")
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), F.desc("n_users"), "path")
        .limit(top_n)
    )


def winsorized_price_stats(
    orders: DataFrame, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Robust (winsorized) order-price statistics: clip the price column at
    the exact ``lo``/``hi`` quantile DATA VALUES, then report the clipped
    mean and clip counts — the outlier-resistant summary every metrics
    pipeline wants when a few corrupt rows would otherwise drag the mean.

    Determinism: the boundaries are percentile-disc style — the value at
    global rank ceil(tau·N) under the total order (price, orderkey) — so
    they are actual column values, never interpolated doubles; clipping is
    pure least/greatest (no arithmetic), and the clipped mean uses the
    decimal-exact accumulation idiom. Every emitted number is bit-identical
    cross-engine.

    Shape at scale: ranks come from ``_global_ranks`` (TeraSort shape — no
    single-partition sort); the two boundary rows reduce to one broadcast
    1-row aggregate; the clip + final stats are one more pass over the
    ranked rows. At 100 TB swap the exact ranks for ``approx_percentile``
    boundaries — the clip pass is unchanged.
    """
    ranked = _global_ranks(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        "_rank",
        total_name="_n",
    )
    lo_rank = F.ceil(F.lit(lo) * F.col("_n"))
    hi_rank = F.ceil(F.lit(hi) * F.col("_n"))
    bounds = ranked.filter(
        (F.col("_rank") == lo_rank) | (F.col("_rank") == hi_rank)
    ).agg(
        F.min(
            F.when(F.col("_rank") == lo_rank, F.col("o_totalprice"))
        ).alias("lo_val"),
        F.min(
            F.when(F.col("_rank") == hi_rank, F.col("o_totalprice"))
        ).alias("hi_val"),
    )
    clipped = ranked.join(F.broadcast(bounds)).select(
        F.least(
            F.greatest(F.col("o_totalprice"), F.col("lo_val")), F.col("hi_val")
        ).alias("wprice"),
        (F.col("o_totalprice") < F.col("lo_val")).alias("below"),
        (F.col("o_totalprice") > F.col("hi_val")).alias("above"),
        "lo_val",
        "hi_val",
    )
    return clipped.groupBy("lo_val", "hi_val").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum(F.col("wprice").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("winsorized_mean"),
        F.sum(F.when(F.col("below"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("above"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_high"),
    )


def user_state_intervals(events: DataFrame) -> DataFrame:
    """SCD-Type-2 interval reconstruction: collapse each user's event
    stream into contiguous ``event_type`` state intervals —
    ``[valid_from_us, valid_to_us)`` rows where the state differs from the
    previous event's, the dimension-history build every warehouse runs to
    turn a change log into queryable validity ranges (open intervals — each
    user's current state — carry ``valid_to_us = -1``, keeping the output
    NULL-free so cross-engine value hashing never sees NaN).

    Shape at scale: two windows, both partitioned by ``user_id`` (bounded
    partitions) and sharing one exchange; change rows are filtered BEFORE
    the lead window, so the second window only sees state changes, not the
    raw stream. Timestamps emit as epoch microseconds (exact longs — the
    ``session_paths`` convention) so no float ever enters the row.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = marked.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros("ts").alias("valid_from_us"),
            F.coalesce(
                F.lead(F.unix_micros("ts")).over(w2), F.lit(-1).cast("long")
            ).alias("valid_to_us"),
        )
        .orderBy("user_id", "valid_from_us", "state")
    )


def _global_cumsum(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    cum_name: str = "_cum",
    total_name: str = "_total",
    num_parts: int | None = None,
) -> DataFrame:
    """Exact inclusive running total of ``val_col`` over a global order
    WITHOUT a single-partition window — ``_global_ranks``' sibling:
    range-repartition on the sort key, running sum within each range, then
    add each range's value-sum offset via a broadcast join (and attach the
    grand total from the same per-range sums — no extra scan).

    Same determinism contract as ``_global_ranks``: the caller supplies a
    TOTAL order when per-row cumulative values matter; the
    ``localCheckpoint`` pins the sampled range boundaries so the offset
    and running-sum branches see one partitioning.
    """
    spark = df.sparkSession
    n_parts = num_parts or spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = parts.groupBy("_pid").agg(F.sum(val_col).alias("_psum"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = sums.select(
        "_pid",
        F.coalesce(F.sum("_psum").over(w_off), F.lit(0)).cast("long").alias("_off"),
        F.sum("_psum").over(w_all).cast("long").alias(total_name),
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(
            cum_name,
            (F.sum(val_col).over(w_local) + F.col("_off")).cast("long"),
        )
        .drop("_pid", "_off")
    )


# ---------------------------------------------------------------------------
# Z-order layout (multi-dimensional data clustering for scan skipping)
# ---------------------------------------------------------------------------


def _morton_spread(v: F.Column) -> F.Column:
    """Spread the low 16 bits of ``v`` onto the even bit positions of a
    32-bit lane (0b...abcd -> 0b...0a0b0c0d), via the standard
    mask-and-shift doubling ladder — all literal shifts, pure codegen."""
    x = v.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    return x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))


def morton_z(x: F.Column, y: F.Column) -> F.Column:
    """Morton (Z-order) interleave of two 16-bit-truncated keys: a total
    order in which rows close in EITHER dimension stay close in the one
    sort key — the curve behind Delta/Iceberg ``OPTIMIZE ZORDER BY``."""
    return _morton_spread(x).bitwiseOR(F.shiftleft(_morton_spread(y), 1))


def zorder_layout_stats(lineitem: DataFrame, n_files: int = 64) -> DataFrame:
    """Zonemap comparison of two physical layouts of the same table — the
    WHY of Z-ordering, measured: split the table into ``n_files``
    equal-size files once in its natural (insertion-proxy) order and once
    sorted by the Morton interleave of (l_partkey, l_suppkey), and emit
    each file's (min, max) zonemap for BOTH predicate columns.

    A point/range scan can skip every file whose zonemap excludes it, so
    a layout's skipping power is how NARROW its per-file ranges are. In
    the natural layout every file spans nearly the whole partkey AND
    suppkey domain (zonemaps are useless); Z-ordered, both dimensions'
    ranges shrink by ~sqrt of the file count, simultaneously — the
    multi-dimensional clustering a single-column sort can't give
    (sorting by partkey alone makes SUPPKEY zonemaps useless). The test
    pins zorder total range width < natural for both columns at once.

    Shape at 100 TB: each layout is ONE range-exchange global sort (the
    ``_global_ranks`` TeraSort shape — sampled balanced boundaries, no
    single-partition window) + one file-keyed aggregate; the Morton key
    itself is a pure bit-ladder projection. This is exactly the job a
    table-maintenance OPTIMIZE pass runs, expressed as a query whose
    output is the zonemap it would ship to the catalog.
    """
    base = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_partkey").cast("long").alias("l_partkey"),
        F.col("l_suppkey").cast("long").alias("l_suppkey"),
    ).withColumn("z", morton_z(F.col("l_partkey"), F.col("l_suppkey")))

    def layout_stats(order_cols: list, label: str) -> DataFrame:
        ranked = _global_ranks(
            base, order_cols, rank_name="_rank", total_name="_n"
        )
        return (
            ranked.withColumn(
                "file_id",
                _ntile_from_rank(F.col("_rank"), F.col("_n"), n_files)
                .cast("long"),
            )
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("l_partkey").alias("min_partkey"),
                F.max("l_partkey").alias("max_partkey"),
                F.min("l_suppkey").alias("min_suppkey"),
                F.max("l_suppkey").alias("max_suppkey"),
            )
            .select(F.lit(label).alias("layout"), "*")
        )

    nat = layout_stats(["l_orderkey", "l_linenumber"], "natural")
    zo = layout_stats(["z", "l_orderkey", "l_linenumber"], "zorder")
    return nat.unionByName(zo).orderBy("layout", "file_id")
