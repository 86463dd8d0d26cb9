"""Relational core — every scan/filter/join/aggregate/sort operator family
from SURVEY.md §2.2-§2.6, re-expressed as declarative DataFrame plans so
Catalyst provides pushdown, pruning, partial aggregation, and join-strategy
selection (the reference hand-rolled all of these at the RDD level).

Scale notes (100 TB stance):
  * Dimension tables (region/nation/customer/supplier/part) are joined with
    an explicit ``F.broadcast`` hint where they are guaranteed small relative
    to the fact side — no shuffle of the fact table for those joins.
  * Fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE handles
    skew. No driver-side collection anywhere on a data-sized path.
  * Float aggregates accumulate in DECIMAL so results are exact and
    order-independent (double summation is order-sensitive, which would make
    results nondeterministic under different partitionings — unacceptable for
    a correctness-gated engine at any scale). Output is cast back to double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Exact accumulator type for monetary/double columns: wide enough for every
# value in the test tables; sums widen precision automatically
# (Spark: decimal(34,6); DuckDB: decimal(38,6)).
_DEC = "decimal(24,6)"


def _dsum(col: str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    return F.sum(F.col(col).cast(_DEC)).cast("double")


def _davg(col: str) -> Column:
    """Exact-numerator average: decimal sum divided by count, as double.

    Replicates the reference's hand-rolled (count, sum) partial-aggregate
    average (``task1.scala:69-76``, op A1) — Catalyst performs the
    partial/final split automatically; the decimal numerator makes the result
    independent of partition order.
    """
    return F.sum(F.col(col).cast(_DEC)).cast("double") / F.count(F.col(col))


# ---------------------------------------------------------------------------
# Flagship: pricing summary (scan → filter → agg → sort; A1/A2/P6/O1)
# ---------------------------------------------------------------------------

def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-12-01") -> DataFrame:
    """TPC-H-Q1-shaped rollup over lineitem: the engine's flagship query.

    Exercises the reference's scan→filter→partial-agg→sort lifecycle
    (``task1.scala`` per SURVEY.md §3.1) on the largest fact table. The
    filter and column projection push down to the parquet scan.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            # Narrow operand precisions so the product (scale 12) stays under
            # 38 total digits — exact in both Spark and DuckDB, no rounding.
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,6)")
                * (F.lit(1).cast("decimal(12,6)") - F.col("l_discount").cast("decimal(12,6)"))
            ).cast("double").alias("sum_disc_price"),
            _davg("l_quantity").alias("avg_qty"),
            _davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# task1 analog: grouped average over a join (J1 + A1 + O1)
# ---------------------------------------------------------------------------

def group_avg_brand_status(
    lineitem: DataFrame, orders: DataFrame, part: DataFrame
) -> DataFrame:
    """avg(l_extendedprice) by (p_brand, o_orderstatus).

    Reference: ``task1.scala:60-83`` — ratings⋈users → grouped average →
    sorted output. Here the fact⋈fact join (lineitem⋈orders) shuffles on the
    order key; the ``part`` dimension is broadcast so the fact side is
    shuffled exactly once.
    """
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "o_orderstatus")
        .agg(_davg("l_extendedprice").alias("avg_price"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_brand", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# task2 analog: three-way chained join (J2)
# ---------------------------------------------------------------------------

def group_avg_nation_region(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """avg(c_acctbal) by (r_name, n_name) via customer⋈nation⋈region.

    Reference: ``task2.scala:27-45`` — the 3-way join variant (ratings⋈users
    ⋈movies) with a composite string group key. nation and region are tiny →
    both broadcast; customer never shuffles.
    """
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_davg("c_acctbal").alias("avg_acctbal"),
             F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Filters / HAVING / distinct (P3, P6, A2, A6, A7)
# ---------------------------------------------------------------------------

def filter_having(orders: DataFrame, status: str = "F", min_orders: int = 3) -> DataFrame:
    """Equality filter + count-by-key + post-aggregation threshold.

    Reference: gender filter ``SON.scala:55,57`` (P3) + support filter
    ``SON.scala:263`` (P6). The status filter pushes down to the scan; the
    HAVING runs after partial+final count.
    """
    return (
        orders.filter(F.col("o_orderstatus") == status)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             _dsum("o_totalprice").alias("total_spent"))
        .filter(F.col("n_orders") >= min_orders)
        .orderBy("o_custkey")
    )


# Pivot columns are pinned (not discovered at plan time) so the output
# schema is static — the two-job "collect distinct values first" pivot form
# is a non-starter at scale, and a static schema is what sinks want anyway.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_type_pivot(events: DataFrame) -> DataFrame:
    """Per-user event counts pivoted to one column per event type — the
    wide-format feature table consumers join against. ``pivot`` with an
    explicit value list plans as ONE aggregation with conditional partials
    (no extra distinct-values job, no second shuffle)."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


def distinct_users_per_event_type(events: DataFrame) -> DataFrame:
    """count(distinct user_id) per event_type (A6 distinct + A7 count).

    Spark plans this as a two-phase expand/aggregate — no driver involvement;
    at scale, ``approx_count_distinct`` is the documented fallback (see
    ``sketches.py``).
    """
    return (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Baskets (A3/A4: group-to-collection)
# ---------------------------------------------------------------------------

def order_baskets(lineitem: DataFrame) -> DataFrame:
    """Market baskets: the distinct set of parts per order.

    Reference: ``SON.scala:60`` ``groupByKey().values`` basket build (A3).
    ``collect_set`` is a real aggregate (map-side partial, no groupByKey-style
    full-value shuffle); the basket is sorted so downstream consumers and
    oracles see a canonical order.
    """
    return (
        lineitem.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("basket"))
    )


def order_baskets_rendered(lineitem: DataFrame) -> DataFrame:
    """Baskets with a canonical string rendering — string-comparable against
    a DuckDB oracle (arrays hash differently across engines; strings don't).
    """
    return (
        order_baskets(lineitem)
        .select(
            F.col("l_orderkey"),
            F.size("basket").alias("basket_size"),
            F.array_join(F.col("basket"), ",").alias("basket_str"),
        )
        .orderBy("l_orderkey")
    )


# ---------------------------------------------------------------------------
# Degrees (A8) on the part-supplier bipartite graph
# ---------------------------------------------------------------------------

def supplier_degrees(lineitem: DataFrame) -> DataFrame:
    """Degree of each supplier node = number of distinct parts supplied.

    Reference: GraphX ``graph.degrees`` (``Community.scala:28``, A8) —
    expressed as distinct-edge projection + count, all JVM-side.
    """
    return (
        lineitem.select("l_suppkey", "l_partkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("l_suppkey")
    )


# ---------------------------------------------------------------------------
# Co-occurrence pairs (J3 + F1 + P5, idiomatic rewrite)
# ---------------------------------------------------------------------------

def cooccurrence_pairs(lineitem: DataFrame, min_count: int = 2) -> DataFrame:
    """Part pairs co-occurring in >= min_count orders.

    Reference: ``Betweenness.scala:27-31`` builds user pairs with a constant-
    key self-join (J3) then intersects full movie sets per pair (F1) — O(V²)
    work that collapses on one reducer. Idiomatic rewrite (SURVEY.md §7.2):
    distinct (order, part) edges self-equi-joined ON THE ORDER KEY, so only
    parts that actually share an order ever meet, then count per pair. The
    ``p1 < p2`` canonicalization (P5 theta predicate / F9) halves the pair
    space and removes self-pairs. Scales as Σ|order|², not |parts|².
    """
    edges = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = edges.alias("a")
    b = edges.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= min_count)
        .orderBy("p1", "p2")
    )


# ---------------------------------------------------------------------------
# Left-outer existence probe (J4)
# ---------------------------------------------------------------------------

def customer_order_activity(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Customers with order counts; 1.0/0.0 indicator for having any order.

    Reference: ``Community.scala:40-41`` left-outer join + Option→indicator
    (J4). The aggregate runs on orders first so the outer join is
    key-to-key (no row explosion), then the small aggregated side joins to
    customer.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("total_spent"),
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left_outer")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_spent"), F.lit(0.0)).alias("total_spent"),
            F.when(F.col("o_custkey").isNotNull(), 1.0).otherwise(0.0).alias("has_orders"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Top-k per group (window; SURVEY.md §2.9 extension over O3/O7)
# ---------------------------------------------------------------------------

def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Highest-value k orders per customer via a ranking window.

    The reference's only top-k is a driver-side sorted ``take``
    (``Community.scala:79-80``, O7); the engine provides the distributed
    form. o_orderkey breaks price ties so the result is deterministic.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
        .orderBy("o_custkey", "rank")
    )


# ---------------------------------------------------------------------------
# Set operators on relations (SURVEY.md §2.9 gap — engine extension)
# ---------------------------------------------------------------------------

def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join: customers that never placed an order. The reference has no
    semi/anti joins (SURVEY.md §2.3 'not present'); Spark's left_anti is the
    shuffle-free-on-broadcast form of the NOT EXISTS idiom."""
    return (
        customer.join(
            orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey",
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def orders_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP over (status, priority): per-group, per-status subtotal, and
    grand total in one pass (SURVEY.md §2.9 gap — grouping sets). Subtotal
    rows surface as 'ALL' so cross-engine comparison avoids NULL-grouping
    ambiguity (neither column is ever null in the data)."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


def orders_cube(orders: DataFrame) -> DataFrame:
    """CUBE over (status, priority): every grouping-set combination in one
    pass (completes the grouping-sets family next to ROLLUP)."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


def orders_by_month(orders: DataFrame) -> DataFrame:
    """Calendar bucketing (the reference parses timestamps then discards
    them — task1.scala:64; SURVEY.md §2.6 'no date/time functions')."""
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("month")
    )


def rolling_event_values(events: DataFrame, frame_rows: int = 5) -> DataFrame:
    """Moving aggregates over an explicit window FRAME: per user, ordered by
    (ts, event_id), the sum/avg of the last ``frame_rows`` values. The frame
    accumulates in DECIMAL so the rolling sums are exact and
    order-independent like every other aggregate in the engine."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(frame_rows - 1), Window.currentRow)
    )
    rolling_sum = F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
    rolling_n = F.count(F.lit(1)).over(w)
    return events.select(
        "event_id",
        "user_id",
        rolling_sum.alias("rolling_sum"),
        (rolling_sum / rolling_n).alias("rolling_avg"),
        rolling_n.alias("rolling_n"),
    ).orderBy("event_id")


def price_percentiles(orders: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per status (``percentile`` is the
    sort-based exact aggregate; ``approx_percentile`` is the sketch form for
    the 100-TB path — both one groupBy)."""
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


def approx_distinct_parts(lineitem: DataFrame, include_exact: bool = False) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per supplier — the approximate
    path for the cardinalities ``distinct_users_per_event_type`` computes
    exactly; at 100 TB the sketch is the only affordable form (one pass, no
    Expand). Deterministic for fixed input.

    ``include_exact`` adds the exact ``countDistinct`` column for the
    error-bound cross-check (tests only — bundling it in the registered
    query would force the second aggregation pass the sketch exists to
    avoid; see tests/test_sketches.py for the ``|approx-exact| <=
    3*rsd*exact`` assertion).
    """
    aggs = [F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")]
    if include_exact:
        aggs.append(F.countDistinct("l_partkey").alias("exact_parts"))
    return lineitem.groupBy("l_suppkey").agg(*aggs).orderBy("l_suppkey")


def approx_distinct_parts_bounds(
    lineitem: DataFrame, rsd: float = 0.02, tol_rsds: float = 3.0
) -> DataFrame:
    """Per-supplier assertion that the HLL++ sketch stays within
    ``tol_rsds`` relative standard deviations of the exact distinct count —
    the deterministic, oracle-able form of a sketch check (the sketch VALUE
    can't be mirrored by another engine; the bound HOLDING can).

    The two aggregations run SEPARATELY and join on the key: mixing a
    distinct and a non-distinct aggregate in one groupBy forces Catalyst's
    Expand (doubles the input rows); two plain aggregates + a join of two
    supplier-sized tables is far cheaper.
    """
    approx = lineitem.groupBy("l_suppkey").agg(
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts")
    )
    exact = lineitem.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return (
        approx.join(exact, "l_suppkey")
        .select(
            "l_suppkey",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.lit(tol_rsds * rsd) * F.col("exact_parts")
            ).alias("within_bounds"),
        )
        .orderBy("l_suppkey")
    )


def approx_distinct_parts_checked(
    lineitem: DataFrame, rsd: float = 0.02, tol_rsds: float = 3.0
) -> DataFrame:
    """The gateable form of ``approx_distinct_parts``: per supplier, the
    EXACT distinct part count alongside the assertion that the HLL++ sketch
    landed within ``tol_rsds`` relative standard deviations of it. The
    sketch VALUE has no cross-engine mirror; the exact count and the bound
    HOLDING do — so this variant is what the correctness driver gates (the
    oracle recomputes ``exact_parts`` and expects ``within_bounds`` TRUE on
    every row), while the raw single-pass sketch stays available as
    ``approx_distinct_parts`` for the 100-TB path where the exact
    ``countDistinct`` is unaffordable."""
    approx = lineitem.groupBy("l_suppkey").agg(
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts")
    )
    exact = lineitem.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return (
        approx.join(exact, "l_suppkey")
        .select(
            "l_suppkey",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.lit(tol_rsds * rsd) * F.col("exact_parts")
            ).alias("within_bounds"),
        )
        .orderBy("l_suppkey")
    )


def event_props_stats(events: DataFrame) -> DataFrame:
    """JSON extraction over the ``props`` column (reference has no JSON
    functions — SURVEY.md §2.6): parse ``props.k`` as an int and aggregate
    per event_type. ``get_json_object`` runs JVM-side."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def salted_heavy_hitter_counts(
    events: DataFrame, salt_buckets: int = 8
) -> DataFrame:
    """Two-stage salted aggregation for skewed keys: count per (key, salt)
    first — spreading any hot key over ``salt_buckets`` reducers — then sum
    the partials per key. For pure counts AQE's skew handling usually
    suffices; the pattern matters for position-sensitive aggs and as the
    documented skew remedy at 1000-executor scale. Results are identical to
    a direct groupBy-count by construction."""
    salted = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("partial_n")
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("partial_n").alias("n_events"))
        .orderBy("event_type")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = (),
    strict: bool = True,
) -> DataFrame:
    """As-of join: each left row picks the latest right row with
    ``right_ts < left_ts`` (or <= when ``strict=False``) within the same
    ``by`` key — an operator Spark has no builtin for.

    Implementation is the one-shuffle union trick: tag both sides, sort by
    (by, ts, side) inside a single window partition, and carry the most
    recent right-side values forward with ``last(ignorenulls=True)``. No
    range-join explosion, no per-key driver loops; cost is one shuffle on
    ``by`` plus a window sort — the same shape at any scale.
    """
    lcols = left.columns
    vcols = list(value_cols) or [
        c for c in right.columns if c not in (by, right_ts)
    ]
    tagged_left = left.select(
        F.col(by).alias("_by"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in vcols],
    )
    tagged_right = right.select(
        F.col(by).alias("_by"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            tagged_left.schema["_l"].dataType.simpleString()
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in vcols],
    )
    # Right rows sort before left rows at an equal timestamp iff non-strict
    # (<=); with strict (<) the left row must NOT see an equal-ts right row.
    order_side = F.col("_side").asc() if not strict else F.col("_side").desc()
    w = (
        Window.partitionBy("_by")
        .orderBy(F.col("_ts").asc(), order_side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "_side",
        "_l",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in vcols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_rv_{c}").alias(f"right_{c}") for c in vcols],
    )


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    by: str,
    max_gap_sec: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Range join: pairs of (left, right) rows with the same ``by`` key whose
    timestamps lie within ``max_gap_sec`` of each other.

    A naive theta-join on ``|l.ts - r.ts| <= gap`` degenerates to a per-key
    cross product. Scalable shape: bucketize both sides to gap-width epochs,
    equi-join on (key, bucket) with each left row probing its own and both
    neighbor buckets (explode of 3 bucket ids), then refine with the exact
    predicate. Join fan-out is bounded by per-bucket occupancy instead of
    per-key row counts.
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / max_gap_sec)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / max_gap_sec)
    l_tag = left.select(
        F.col(by).alias("_by"),
        F.col(left_ts).alias("_lts"),
        F.struct(*left.columns).alias("_l"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("_bucket"),
    )
    r_tag = right.select(
        F.col(by).alias("_by"),
        F.col(right_ts).alias("_rts"),
        F.struct(*right.columns).alias("_r"),
        rb.alias("_bucket"),
    )
    joined = l_tag.join(r_tag, ["_by", "_bucket"]).filter(
        F.abs(F.unix_timestamp("_lts") - F.unix_timestamp("_rts")) <= max_gap_sec
    )
    return joined.select(
        F.col("_by").alias(by),
        F.col("_l").alias("left"),
        F.col("_r").alias("right"),
    )


def nations_with_both(customer: DataFrame, supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Nations having BOTH customers and suppliers (INTERSECT), with an
    EXCEPT twin available by symmetry. Fills the reference's missing
    relational set-operator surface (§2.9)."""
    cust_nations = customer.select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    supp_nations = supplier.select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    return (
        cust_nations.intersect(supp_nations)
        .join(F.broadcast(nation), "n_nationkey")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


# Per-stratum keep percentages for the registered stratified-sampling query:
# downsample the high-volume interaction types hard, keep every purchase.
STRATIFIED_RATES: dict[str, int] = {
    "click": 10,
    "view": 5,
    "signup": 20,
    "error": 50,
    "purchase": 100,
}


def stratified_sample_events(
    events: DataFrame, rates: dict[str, int] | None = None
) -> DataFrame:
    """Deterministic stratified Bernoulli sampling: keep ``rates[stratum]``
    percent of each event type, selected by hashing the row key (first 60
    bits of md5) into a percentage bucket — the curriculum/rebalancing
    sampler for training pipelines. Content-keyed hashing (not seeded
    ``sample()``) makes the selection reproducible across engines, runs,
    and partitionings, exactly like ``text.corpus_splits``; rows not listed
    in ``rates`` are dropped.

    Pure narrow projection + filter — pushes to the scan, zero shuffles,
    no RNG state to coordinate across 1000 executors.
    """
    rates = rates if rates is not None else STRATIFIED_RATES
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    rate: Column = F.lit(0)
    for stratum, pct in rates.items():
        rate = F.when(F.col("event_type") == stratum, pct).otherwise(rate)
    return (
        events.filter(bucket < rate)
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    )


def exact_k_per_stratum(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """EXACTLY k rows per stratum (or all of a smaller stratum), selected
    by md5-rank of the row id — the fixed-budget companion to the
    Bernoulli ``stratified_sample_events`` (which keeps a PERCENT and so
    drifts with stratum size). Content-keyed hashing makes the k-subset
    reproducible across engines, runs, and partitionings; the id tie-break
    makes the rank total even under (astronomically unlikely) hash ties.

    Shape at scale: one shuffle on the stratum key; the per-stratum window
    is bounded by stratum size. For heavy-hitter strata at 100 TB, pre-cut
    with the Bernoulli sampler at a few×k expected survivors, then apply
    this for the exact budget — two narrow passes instead of one giant
    window partition.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(stratum_col, id_col, *keep_cols)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
        .orderBy(stratum_col, id_col)
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join/aggregation-key skew diagnostic: per-key row counts reduced to
    the numbers that decide a salting strategy — distinct keys, total
    rows, max/p99/p50 key weight, and the skew factor (max / p50). One
    aggregate to key grain, one tiny scalar reduce; run it on the join
    key BEFORE a 100-TB shuffle and feed the answer to the salted-join
    remedy (``salted_segment_revenue``) when skew_factor says so.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
        F.expr("CAST(percentile(cnt, 0.99) AS BIGINT)").alias("p99_key_rows"),
        F.expr("CAST(percentile(cnt, 0.5) AS BIGINT)").alias("p50_key_rows"),
    ).select(
        "n_keys",
        "n_rows",
        "max_key_rows",
        "p99_key_rows",
        "p50_key_rows",
        (
            F.col("max_key_rows")
            / F.greatest(F.col("p50_key_rows"), F.lit(1))
        ).alias("skew_factor"),
    )


def approx_price_percentile_bounds(
    orders: DataFrame, accuracy: int = 1000, ps: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Greenwald-Khanna quantile-sketch check: ``percentile_approx``
    guarantees the returned value's rank is within ``N/accuracy`` of
    ``p*N``. Like ``approx_distinct_parts_bounds``, the sketch VALUE has no
    cross-engine mirror but the BOUND does — emit one boolean per
    (group, p) asserting the true rank interval of the returned value
    intersects the guaranteed window (±1 slack for the rank-vs-count
    off-by-one conventions).

    At 100 TB the quantile sketch is the only affordable percentile path
    (``price_percentiles``' exact form sorts each group); the verification
    join here is part of the CHECK, not the production query shape.
    """
    approx = orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", list(ps), accuracy).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    exploded = approx.select(
        "o_orderstatus", "n", F.posexplode("ap").alias("i", "v")
    ).select(
        "o_orderstatus",
        "n",
        F.element_at(F.lit(list(ps)), F.col("i").cast("int") + 1).alias("p"),
        "v",
    )
    ranked = (
        orders.select("o_orderstatus", "o_totalprice")
        .join(F.broadcast(exploded), "o_orderstatus")
        .groupBy("o_orderstatus", "p", "v", "n")
        .agg(
            F.sum(F.when(F.col("o_totalprice") < F.col("v"), 1).otherwise(0)).alias("rank_lt"),
            F.sum(F.when(F.col("o_totalprice") <= F.col("v"), 1).otherwise(0)).alias("rank_le"),
        )
    )
    tol = F.col("n") / accuracy + 1
    return ranked.select(
        "o_orderstatus",
        "p",
        (
            (F.col("rank_lt") <= F.col("p") * F.col("n") + tol)
            & (F.col("rank_le") >= F.col("p") * F.col("n") - tol)
        ).alias("within_bounds"),
    ).orderBy("o_orderstatus", "p")


def profile_table(df: DataFrame) -> DataFrame:
    """Per-column data profile — ``(col_name, n_rows, n_nulls,
    n_distinct, is_numeric, min_num, max_num)`` — the quality report an ingest pipeline runs before
    trusting a new table drop. Numeric columns carry min/max as double;
    non-numeric columns carry ``is_numeric = false`` and 0.0 placeholders
    (string min/max rendering is engine-specific, and NULL float cells are
    NaN-poisoned in cross-engine value hashing, so both are deliberately
    excluded from the contract).

    One aggregation pass computes every statistic, then a driver-side
    ``stack`` unpivots the single result row to long format — schema
    introspection happens on metadata only; no data reaches the driver.
    Exact ``count(distinct)`` over k columns expands the scan k-fold
    (Spark's Expand); at 100 TB swap ``F.approx_count_distinct`` in — the
    exact form is kept here because it is what an oracle can check.
    """
    numeric = {"int", "bigint", "smallint", "tinyint", "float", "double"}
    # Generated aggregate aliases are INDEX-based (nn_0, nd_0, ...), never
    # interpolated column names — a column named `weird"col` or `a b` can
    # therefore never produce invalid stack() SQL. The only user data in the
    # expression is the display literal, with single quotes doubled.
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, f in enumerate(df.schema.fields):
        c = df[f.name]  # indexing resolves any name, no quoting needed
        aggs.append(F.count(c).alias(f"nn_{i}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{i}"))
        if f.dataType.simpleString() in numeric:
            aggs.append(F.min(c).cast("double").alias(f"mn_{i}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{i}"))
    row = df.agg(*aggs)
    parts = []
    for i, f in enumerate(df.schema.fields):
        name_literal = f.name.replace("'", "''")
        is_num = f.dataType.simpleString() in numeric
        parts.append(
            ", ".join(
                [
                    f"'{name_literal}'",
                    "__n",
                    f"__n - nn_{i}",
                    f"nd_{i}",
                    "true" if is_num else "false",
                    f"mn_{i}" if is_num else "CAST(0.0 AS DOUBLE)",
                    f"mx_{i}" if is_num else "CAST(0.0 AS DOUBLE)",
                ]
            )
        )
    stack = (
        f"stack({len(parts)}, {', '.join(parts)}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, is_numeric, min_num, max_num)"
    )
    return row.select(F.expr(stack)).orderBy("col_name")


def user_retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention matrix — ``(cohort_day, activity_day, n_users)``
    where a user's cohort is the calendar day of their first event and
    each row counts the cohort's distinct users active on a given later
    (or same) day. The standard product-analytics rollup, at daily grain
    (the test events span one month; swap the format string for monthly).

    Shape at scale: pass 1 is a user-keyed min aggregation (map-side
    partial, result is user-cardinality-sized); it re-joins the events
    on the user key — both sides hash-partition on user_id, so AQE can
    plan a co-partitioned join — then one distinct-user count per month
    pair. No window over the full event stream, no driver state.
    """
    day = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    firsts = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        events.select("user_id", day("ts").alias("activity_day"))
        .join(firsts.select("user_id", day("first_ts").alias("cohort_day")), "user_id")
        .groupBy("cohort_day", "activity_day")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "activity_day")
    )


# ---------------------------------------------------------------------------
# Classic OLAP shapes: shipping priority (Q3), promo share (Q14),
# custom grouping sets, and scale-honest decile assignment
# ---------------------------------------------------------------------------

def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H-Q3-shaped top-k: revenue of not-yet-shipped order lines for one
    market segment (orders placed before ``cutoff``, lines shipped after it).

    Extends the reference's join→agg→sort lifecycle (``task2.scala:27-45``)
    with date predicates and a bounded top-k. Shape at scale: both date
    filters push down to the parquet scans; customer (filtered to one
    segment) broadcasts, so only the lineitem⋈orders fact join shuffles;
    the final top-k is a TakeOrdered over k rows per partition — never a
    global sort materialization.
    """
    cutoff_ts = F.lit(cutoff).cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff_ts)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff_ts),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,6)")
                * (F.lit(1).cast("decimal(12,6)") - F.col("l_discount").cast("decimal(12,6)"))
            ).cast("double").alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "order_date", "l_orderkey")
        .limit(k)
    )


def promo_revenue(
    lineitem: DataFrame, part: DataFrame, start: str = "1997-09-01", end: str = "1997-10-01"
) -> DataFrame:
    """TPC-H-Q14-shaped promo share: fraction of one month's discounted
    revenue coming from promotional part types.

    The conditional numerator and the total accumulate in decimal (exact,
    order-independent); the final share divides the two resulting doubles —
    one correctly-rounded IEEE op, so the value is bit-identical across
    engines. One broadcast dim join + one scalar aggregate; the month
    predicate prunes the fact scan.
    """
    disc = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1).cast("decimal(12,6)") - F.col("l_discount").cast("decimal(12,6)"))
    )
    agg = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc)).cast("double").alias("promo_revenue"),
            F.sum(disc).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
    )


def orders_grouping_sets(orders: DataFrame) -> DataFrame:
    """Custom GROUPING SETS — the general form behind ROLLUP/CUBE: exactly
    the four sets (status, priority), (status), (priority), () in ONE pass
    (Catalyst expands them into a single Expand + hash aggregate, not four
    scans). ``grouping()`` flags disambiguate real NULLs from grouped-out
    columns; grouped-out keys render as 'ALL' like ``orders_cube``.
    """
    orders.createOrReplaceTempView("_ogs_orders")
    return orders.sparkSession.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(o_orderstatus) AS INT)   AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*)                         AS n_orders,
               CAST(sum(CAST(o_totalprice AS decimal(24,6))) AS double) AS total_price
        FROM _ogs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


def customer_revenue_deciles(orders: DataFrame) -> DataFrame:
    """Decile summary of per-customer revenue WITHOUT a global sort.

    A global ``ntile(10)`` is a single-partition window — the classic
    scale-killer for rank bucketing. Instead: (1) aggregate revenue per
    customer (one shuffle), (2) compute the nine decile boundaries with the
    exact ``percentile`` aggregate (single scalar reduce; swap in
    ``approx_percentile`` at 100 TB), (3) broadcast the boundary array and
    assign each customer's decile with a pure expression, (4) aggregate per
    decile. Deciles are upper-bounded by occupancy, not forced-equal like
    ntile — the honest distributed semantics.
    """
    taus = [i / 10 for i in range(1, 10)]
    rev = orders.groupBy("o_custkey").agg(_dsum("o_totalprice").alias("revenue"))
    bounds = rev.agg(
        F.expr(f"percentile(revenue, array({', '.join(map(str, taus))}))").alias("bounds")
    )
    return (
        rev.join(F.broadcast(bounds))
        .select(
            "revenue",
            (
                F.lit(1)
                + F.expr("aggregate(bounds, 0, (acc, b) -> acc + IF(revenue > b, 1, 0))")
            ).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("revenue").cast(_DEC)).cast("double").alias("decile_revenue"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Reconciliation, salted skew join, CDC compaction, inter-event gaps
# ---------------------------------------------------------------------------

def customer_reconciliation(orders: DataFrame, events: DataFrame) -> DataFrame:
    """Full-outer reconciliation of two independent per-key aggregates —
    order spend (orders) vs product activity (events) — with explicit
    presence flags. The audit query every pipeline needs when two systems
    disagree about "all customers".

    Shape at scale: each side aggregates to key cardinality BEFORE the
    full-outer join (map-side partial aggregation), so the join input is
    keys, not facts — never a fact⋈fact full outer.
    """
    o = orders.groupBy(F.col("o_custkey").alias("cust_id")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("order_value"),
    )
    e = events.groupBy(F.col("user_id").alias("cust_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum("value").alias("event_value"),
    )
    return (
        o.join(e, "cust_id", "full_outer")
        .select(
            "cust_id",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("order_value", F.lit(0.0)).alias("order_value"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("event_value", F.lit(0.0)).alias("event_value"),
            F.col("n_orders").isNotNull().alias("in_orders"),
            F.col("n_events").isNotNull().alias("in_events"),
        )
        .orderBy("cust_id")
    )


def salted_segment_revenue(
    events: DataFrame, customer: DataFrame, salt_buckets: int = 8
) -> DataFrame:
    """Explicitly salted fact⋈dim join for a skewed key: the fact side gets a
    deterministic salt from its row id; the dim side is replicated across all
    ``salt_buckets`` salts (explode over a literal range), so one hot user_id
    spreads over ``salt_buckets`` reducers instead of one. Equivalent to the
    plain join by construction — the oracle IS the plain join.

    At 100 TB prefer AQE skew-join first; explicit salting is the remedy when
    the skew is in the JOIN key itself and the dim is too big to broadcast
    (replication multiplies the dim by salt_buckets, still ≪ fact size).
    """
    salted_facts = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(salt_buckets))
    )
    replicated_dim = customer.select(
        F.col("c_custkey"), F.col("c_mktsegment")
    ).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return (
        salted_facts.join(
            replicated_dim,
            (salted_facts.user_id == replicated_dim.c_custkey)
            & (salted_facts.salt == replicated_dim.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("segment_value"),
        )
        .orderBy("c_mktsegment")
    )


def latest_events_snapshot(events: DataFrame) -> DataFrame:
    """CDC-style compaction: the latest event per user (ts, then event_id as
    the deterministic tie-break) — the "current state" materialization every
    changelog consumer runs. One hash shuffle on the key; ``row_number`` over
    a per-key window (max-by semantics), never a global sort. At scale this
    is the standard log-compaction query; with billions of keys the same plan
    holds because the window partitions by the shuffle key.
    """
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_epoch_us"),
            "event_type",
            "value",
        )
        .orderBy("user_id")
    )


def user_interevent_gaps(events: DataFrame) -> DataFrame:
    """Per-user inter-event gap statistics via ``lag`` — the arrival-cadence
    profile (bot detection, session tuning, rate modeling). Timestamps stay
    integral (epoch µs) so every gap is exact; the mean divides two exact
    integers (one IEEE op, bit-identical cross-engine).

    One shuffle: the lag window and the aggregation share the user_id
    partitioning, so Catalyst plans a single exchange.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = events.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            (F.count(F.lit(1))).alias("n_events"),
            F.count("gap_us").alias("n_gaps"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            (F.sum("gap_us") / F.count("gap_us")).alias("avg_gap_us"),
        )
        .orderBy("user_id")
    )


def fk_integrity_audit(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    child→parent key relation, the child row count and how many child rows
    dangle (no matching parent). The first query any warehouse runs after a
    load — silent FK drift is how joins start dropping rows.

    Each child table is scanned ONCE: lineitem's three parent checks ride a
    single pass — three left joins against distinct parent-key projections
    (dims broadcast; the fact-sized orders key set shuffles on the key),
    then one aggregate with three conditional null-marker counts. orders'
    own customer check is likewise one pass. A per-relation anti-join
    formulation would scan lineitem four times for the same answer; with a
    100-TB fact table the scan count IS the cost.
    """
    li = lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
    o_keys = orders.select(F.col("o_orderkey").alias("pk_o")).distinct()
    p_keys = F.broadcast(part.select(F.col("p_partkey").alias("pk_p")).distinct())
    s_keys = F.broadcast(
        supplier.select(F.col("s_suppkey").alias("pk_s")).distinct()
    )
    li_row = (
        li.join(o_keys, li.l_orderkey == o_keys.pk_o, "left")
        .join(p_keys, li.l_partkey == p_keys.pk_p, "left")
        .join(s_keys, li.l_suppkey == s_keys.pk_s, "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.when(F.col("pk_o").isNull(), 1)), F.lit(0))
            .cast("long")
            .alias("orph_o"),
            F.coalesce(F.sum(F.when(F.col("pk_p").isNull(), 1)), F.lit(0))
            .cast("long")
            .alias("orph_p"),
            F.coalesce(F.sum(F.when(F.col("pk_s").isNull(), 1)), F.lit(0))
            .cast("long")
            .alias("orph_s"),
        )
    )
    li_rows = li_row.select(
        F.expr(
            "stack(3, "
            "'lineitem.l_orderkey->orders', n, orph_o, "
            "'lineitem.l_partkey->part', n, orph_p, "
            "'lineitem.l_suppkey->supplier', n, orph_s"
            ") AS (relation, n_rows, n_orphans)"
        )
    )
    c_keys = F.broadcast(
        customer.select(F.col("c_custkey").alias("pk_c")).distinct()
    )
    o_row = (
        orders.select("o_custkey")
        .join(c_keys, F.col("o_custkey") == F.col("pk_c"), "left")
        .agg(
            F.lit("orders.o_custkey->customer").alias("relation"),
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col("pk_c").isNull(), 1)), F.lit(0))
            .cast("long")
            .alias("n_orphans"),
        )
    )
    return li_rows.unionAll(o_row).orderBy("relation")


def daily_event_spine(events: DataFrame) -> DataFrame:
    """Gap-filled daily time series per event type: every calendar day in
    the table's [min, max] range appears for every type, zero-filled where
    nothing happened. Dense spines are what dashboards, forecasting, and
    anomaly baselines expect — "no row" and "zero events" are different
    facts.

    Shape at scale: the fact table aggregates FIRST (one shuffle to
    days×types cardinality); the spine is a per-row ``sequence`` explode of
    one min/max scalar row cross-joined with the distinct types — both tiny
    — so the left join against the aggregate never touches raw facts.
    """
    day = F.to_date("ts")
    daily = events.groupBy(day.alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum("value").alias("sum_value"),
    )
    bounds = events.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    types = events.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )
