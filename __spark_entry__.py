"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine lives in ``inf_553_datamining_mapreduce_spark/``; this module only
adapts it to the driver's (spark, sf_dir) calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from inf_553_datamining_mapreduce_spark.operators import frequent_itemsets as FI
from inf_553_datamining_mapreduce_spark.operators import graph as G
from inf_553_datamining_mapreduce_spark.operators import relational as R
from inf_553_datamining_mapreduce_spark.sources.readers import read_parquet_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [read_parquet_table(spark, sf_dir, n) for n in names]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary) on /root/testdata/sf0.001."""
    (lineitem,) = _t(spark, "/root/testdata/sf0.001", "lineitem")
    return R.pricing_summary(lineitem)


# ---------------------------------------------------------------------------
# queries() — one entry per implemented operator family (SURVEY.md §2)
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    def _pricing_summary(spark, sf):
        (li,) = _t(spark, sf, "lineitem")
        return R.pricing_summary(li)

    def _group_avg_brand_status(spark, sf):
        li, o, p = _t(spark, sf, "lineitem", "orders", "part")
        return R.group_avg_brand_status(li, o, p)

    def _group_avg_nation_region(spark, sf):
        c, n, r = _t(spark, sf, "customer", "nation", "region")
        return R.group_avg_nation_region(c, n, r)

    def _filter_having(spark, sf):
        (o,) = _t(spark, sf, "orders")
        return R.filter_having(o)

    def _distinct_users(spark, sf):
        (e,) = _t(spark, sf, "events")
        return R.distinct_users_per_event_type(e)

    def _order_baskets(spark, sf):
        (li,) = _t(spark, sf, "lineitem")
        return R.order_baskets_rendered(li)

    def _supplier_degrees(spark, sf):
        (li,) = _t(spark, sf, "lineitem")
        return R.supplier_degrees(li)

    def _cooccurrence_pairs(spark, sf):
        (li,) = _t(spark, sf, "lineitem")
        return R.cooccurrence_pairs(li, min_count=2)

    def _customer_order_activity(spark, sf):
        c, o = _t(spark, sf, "customer", "orders")
        return R.customer_order_activity(c, o)

    def _top_orders_per_customer(spark, sf):
        (o,) = _t(spark, sf, "orders")
        return R.top_orders_per_customer(o, k=3)

    def _nations_with_both(spark, sf):
        c, s, n = _t(spark, sf, "customer", "supplier", "nation")
        return R.nations_with_both(c, s, n)

    def _frequent_itemsets_son(spark, sf):
        (li,) = _t(spark, sf, "lineitem")
        baskets = R.order_baskets(li)
        return FI.rendered(FI.son_frequent_itemsets(baskets, support=3))

    def _frequent_itemsets_fpgrowth(spark, sf):
        (li,) = _t(spark, sf, "lineitem")
        baskets = R.order_baskets(li)
        return FI.rendered(FI.frequent_itemsets_fpgrowth(baskets, support=3))

    def _customer_part_graph(spark, sf):
        li, o = _t(spark, sf, "lineitem", "orders")
        cp = li.join(o, li.l_orderkey == o.o_orderkey).select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        return cp

    def _customer_edges(spark, sf):
        cp = _customer_part_graph(spark, sf)
        return G.cooccurrence_edges(cp, "c", "p", min_shared=4).orderBy("src", "dst")

    def _components_customers(spark, sf):
        cp = _customer_part_graph(spark, sf)
        edges = G.cooccurrence_edges(cp, "c", "p", min_shared=4)
        verts = cp.select(F.col("c").cast("long")).distinct()
        return G.connected_components(edges, verts).orderBy("id")

    def _betweenness_customers(spark, sf):
        cp = _customer_part_graph(spark, sf)
        edges = G.cooccurrence_edges(cp, "c", "p", min_shared=4)
        return G.edge_betweenness(edges)

    def _communities_customers(spark, sf):
        cp = _customer_part_graph(spark, sf)
        edges = G.cooccurrence_edges(cp, "c", "p", min_shared=4)
        verts = cp.select(F.col("c").cast("long")).distinct()
        return G.girvan_newman_communities(edges, verts).select(
            F.array_join(F.col("members"), ",").alias("members_str"),
            F.size("members").alias("n_members"),
        )

    q["pricing_summary"] = _pricing_summary
    q["group_avg_brand_status"] = _group_avg_brand_status
    q["group_avg_nation_region"] = _group_avg_nation_region
    q["filter_having"] = _filter_having
    q["distinct_users_per_event_type"] = _distinct_users
    q["order_baskets"] = _order_baskets
    q["supplier_degrees"] = _supplier_degrees
    q["cooccurrence_pairs"] = _cooccurrence_pairs
    q["customer_order_activity"] = _customer_order_activity
    q["top_orders_per_customer"] = _top_orders_per_customer
    q["nations_with_both"] = _nations_with_both
    q["frequent_itemsets_son"] = _frequent_itemsets_son
    q["frequent_itemsets_fpgrowth"] = _frequent_itemsets_fpgrowth
    q["customer_cooccurrence_edges"] = _customer_edges
    q["connected_components_customers"] = _components_customers
    q["edge_betweenness_customers"] = _betweenness_customers
    q["communities_girvan_newman"] = _communities_customers
    return q


# ---------------------------------------------------------------------------
# oracle_sql() — DuckDB twins. Aliases match the Spark column names exactly.
# ---------------------------------------------------------------------------

# Exact decimal accumulation mirrors operators/relational.py::_DEC so double
# outputs are bit-identical regardless of row order in either engine.
_D = "DECIMAL(24,6)"


_FREQ_ITEMSETS_ORACLE = """
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    s1 AS (
        SELECT CAST(p AS VARCHAR) AS itemset_str, 1 AS size, COUNT(*) AS support
        FROM op GROUP BY p HAVING COUNT(*) >= 3
    ),
    s2 AS (
        SELECT CAST(a.p AS VARCHAR) || ',' || CAST(b.p AS VARCHAR) AS itemset_str,
               2 AS size, COUNT(*) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 3
    ),
    s3 AS (
        SELECT CAST(a.p AS VARCHAR) || ',' || CAST(b.p AS VARCHAR) || ',' || CAST(c.p AS VARCHAR) AS itemset_str,
               3 AS size, COUNT(*) AS support
        FROM op a
        JOIN op b ON a.o = b.o AND a.p < b.p
        JOIN op c ON a.o = c.o AND b.p < c.p
        GROUP BY a.p, b.p, c.p HAVING COUNT(*) >= 3
    )
    SELECT itemset_str, CAST(size AS INTEGER) AS size, support
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
    ORDER BY size, itemset_str
"""


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(CAST(SUM(CAST(l_quantity AS {_D})) AS VARCHAR) AS DOUBLE) AS sum_qty,
                   CAST(CAST(SUM(CAST(l_extendedprice AS {_D})) AS VARCHAR) AS DOUBLE) AS sum_base_price,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(12,6)) - CAST(l_discount AS DECIMAL(12,6)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
                   CAST(CAST(SUM(CAST(l_quantity AS {_D})) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
                   CAST(CAST(SUM(CAST(l_extendedprice AS {_D})) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "group_avg_brand_status": f"""
            SELECT p_brand, o_orderstatus,
                   CAST(CAST(SUM(CAST(l_extendedprice AS {_D})) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, o_orderstatus
            ORDER BY p_brand, o_orderstatus
        """,
        "group_avg_nation_region": f"""
            SELECT r_name, n_name,
                   CAST(CAST(SUM(CAST(c_acctbal AS {_D})) AS VARCHAR) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal,
                   COUNT(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
            ORDER BY r_name, n_name
        """,
        "filter_having": f"""
            SELECT o_custkey,
                   COUNT(*) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS {_D})) AS VARCHAR) AS DOUBLE) AS total_spent
            FROM orders
            WHERE o_orderstatus = 'F'
            GROUP BY o_custkey
            HAVING COUNT(*) >= 3
            ORDER BY o_custkey
        """,
        "distinct_users_per_event_type": """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS n_users,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "order_baskets": """
            SELECT l_orderkey,
                   CAST(COUNT(DISTINCT l_partkey) AS INTEGER) AS basket_size,
                   ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT l_partkey)), ',') AS basket_str
            FROM lineitem
            GROUP BY l_orderkey
            ORDER BY l_orderkey
        """,
        "supplier_degrees": """
            SELECT l_suppkey, COUNT(*) AS degree
            FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
            GROUP BY l_suppkey
            ORDER BY l_suppkey
        """,
        "cooccurrence_pairs": """
            WITH edges AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
            FROM edges a
            JOIN edges b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
            HAVING COUNT(*) >= 2
            ORDER BY p1, p2
        """,
        "customer_order_activity": f"""
            WITH per_cust AS (
                SELECT o_custkey,
                       COUNT(*) AS n_orders,
                       CAST(CAST(SUM(CAST(o_totalprice AS {_D})) AS VARCHAR) AS DOUBLE) AS total_spent
                FROM orders GROUP BY o_custkey
            )
            SELECT c_custkey, c_name,
                   COALESCE(n_orders, 0) AS n_orders,
                   COALESCE(total_spent, 0.0) AS total_spent,
                   CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END AS has_orders
            FROM customer LEFT OUTER JOIN per_cust ON c_custkey = o_custkey
            ORDER BY c_custkey
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank
                FROM orders
            ) WHERE rank <= 3
            ORDER BY o_custkey, rank
        """,
        "customer_cooccurrence_edges": """
            WITH cp AS (
                SELECT DISTINCT o_custkey AS c, l_partkey AS p
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            )
            SELECT a.c AS src, b.c AS dst, COUNT(*) AS shared
            FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
            GROUP BY a.c, b.c HAVING COUNT(*) >= 4
            ORDER BY src, dst
        """,
        # Connected components ARE SQL-expressible via a recursive transitive
        # closure; component label = min reachable id (GraphX labeling).
        "connected_components_customers": """
            WITH RECURSIVE
            cp AS (
                SELECT DISTINCT o_custkey AS c, l_partkey AS p
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ),
            e AS (
                SELECT a.c AS src, b.c AS dst
                FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
                GROUP BY a.c, b.c HAVING COUNT(*) >= 4
            ),
            sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
            verts AS (SELECT DISTINCT c AS id FROM cp),
            reach(id, r) AS (
                SELECT id, id FROM verts
                UNION
                SELECT sym.dst, reach.r FROM reach JOIN sym ON sym.src = reach.id
            )
            SELECT id, MIN(r) AS component FROM reach GROUP BY id ORDER BY id
        """,
        # Frequent-itemset oracle: enumerates sizes 1-3 relationally. Valid
        # while no size-4 itemset reaches the support threshold at the gate
        # scale (verified: max triple support at sf0.01 is 2 < 3, which by
        # monotonicity bounds all larger sizes).
        "frequent_itemsets_son": _FREQ_ITEMSETS_ORACLE,
        "frequent_itemsets_fpgrowth": _FREQ_ITEMSETS_ORACLE,
        "nations_with_both": """
            SELECT n_nationkey, n_name FROM nation
            WHERE n_nationkey IN (
                SELECT c_nationkey FROM customer
                INTERSECT
                SELECT s_nationkey FROM supplier
            )
            ORDER BY n_nationkey
        """,
    }
