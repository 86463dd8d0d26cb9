"""Sketch accuracy: HLL++ approximate distinct counts must track the exact
values within the configured relative standard deviation; the count-min
sketch must upper-bound exact counts within its collision bound; the bloom
runtime filter must be semantics-preserving and actually prune."""

from __future__ import annotations

from pyspark.sql import functions as F

from inf_553_datamining_mapreduce_spark.operators import sketches as SK
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


def test_cms_estimate_upper_bounds_exact_within_collision_bound(spark, sf_dir):
    """CMS estimates can only overestimate (collisions add), and with
    depth=4/width=512 over ~N events the expected excess per counter is
    N/512 — assert the one-sided bound plus a generous 5x collision slack."""
    ev = read_parquet_table(spark, sf_dir, "events")
    cand = (
        read_parquet_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"))
    )
    hh = SK.cms_heavy_hitters(ev, "user_id", cand, "user_id", k=50).collect()
    assert hh
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    slack = 5.0 * n_total / 512
    for r in hh:
        true = exact.get(r["user_id"], 0)
        assert r["est_count"] >= true, (r["user_id"], r["est_count"], true)
        assert r["est_count"] - true <= slack, (r["user_id"], r["est_count"], true)
    # top-of-list must actually be a heavy hitter: its true count within
    # slack of the global max.
    top = hh[0]
    assert exact[top["user_id"]] >= max(exact.values()) - slack


def test_bloom_filtered_revenue_equals_plain_join(spark, sf_dir):
    li = read_parquet_table(spark, sf_dir, "lineitem")
    part = read_parquet_table(spark, sf_dir, "part")
    got = SK.bloom_filtered_revenue(li, part, brand="Brand#23").collect()
    rev = (
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(12,6)") - F.col("l_discount").cast("decimal(12,6)"))
        ).cast("double").alias("revenue")
    )
    want = (
        li.join(part.filter(F.col("p_brand") == "Brand#23"), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(rev, F.count(F.lit(1)).alias("n_items"))
        .orderBy("l_suppkey")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_bloom_filter_prunes_probe_side(spark, sf_dir):
    """The bloom predicate must pass every true match (no false negatives)
    and prune the probe side to near the exact selectivity."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    part = read_parquet_table(spark, sf_dir, "part")
    build = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    words = SK.bloom_bits(build, "p_partkey")
    passed = li.filter(SK.bloom_might_contain(words, F.col("l_partkey"))).count()
    exact = li.join(F.broadcast(build), li.l_partkey == build.p_partkey).count()
    total = li.count()
    assert passed >= exact  # no false negatives, ever
    # false-positive head-room: 64Ki bits vs ~100 keys keeps FP rate ~0
    assert passed <= exact + 0.01 * total


def test_approx_percentile_within_rank_bounds(spark, sf_dir):
    from inf_553_datamining_mapreduce_spark.operators.relational import (
        approx_price_percentile_bounds,
    )

    o = read_parquet_table(spark, sf_dir, "orders")
    rows = approx_price_percentile_bounds(o).collect()
    assert len(rows) == 9  # 3 statuses x 3 percentiles
    assert all(r["within_bounds"] for r in rows)


# ---------------------------------------------------------------------------
# Deterministic HLL registers


def _py_hll_registers(keys):
    """Pure-Python reference: same md5-60bit hash, p=8, rho over the
    52-bit remainder."""
    import hashlib

    regs = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        bucket, w = h & 255, h >> 8
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_registers_match_python_reference(spark):
    from inf_553_datamining_mapreduce_spark.operators.sketches import (
        hll_registers,
    )

    keys = list(range(1, 500))
    df = spark.createDataFrame(
        [("g", k) for k in keys], "grp string, key long"
    )
    got = {
        r["bucket"]: r["reg"]
        for r in hll_registers(df, "key", ("grp",)).collect()
    }
    assert got == _py_hll_registers(keys)


def test_hll_merge_equals_union(spark):
    # max-merging per-group registers must equal registers of the union —
    # the mergeability contract, exact (not approximate).
    from inf_553_datamining_mapreduce_spark.operators.sketches import (
        hll_registers,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", k) for k in range(200)] + [("b", k) for k in range(100, 400)],
        "grp string, key long",
    )
    per_group = hll_registers(df, "key", ("grp",))
    merged = {
        r["bucket"]: r["reg"]
        for r in per_group.groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
        .collect()
    }
    direct = {
        r["bucket"]: r["reg"]
        for r in hll_registers(
            df.select(F.lit("all").alias("grp"), "key"), "key", ("grp",)
        ).collect()
    }
    assert merged == direct


def test_hll_estimate_accuracy(spark, sf_dir):
    # m=256 -> sigma ~ 1.04/sqrt(256) = 6.5%; assert 4 sigma on the ALL
    # row (1500 distinct orders at sf0.001 — inside the raw-estimator
    # regime). Per-flag rows at this SF sit near the 2.5m linear-counting
    # boundary, so they only get a loose sanity bound.
    from inf_553_datamining_mapreduce_spark.operators.sketches import (
        hll_distinct_orders,
    )
    from inf_553_datamining_mapreduce_spark.sources.readers import (
        read_parquet_table,
    )

    li = read_parquet_table(spark, sf_dir, "lineitem")
    rows = {r["l_returnflag"]: r for r in hll_distinct_orders(li).collect()}
    allr = rows["ALL"]
    rel = abs(allr["hll_estimate"] - allr["exact_orders"]) / allr["exact_orders"]
    assert rel < 0.26, (allr, rel)
    for flag, r in rows.items():
        assert 0 < r["hll_estimate"] < 10 * r["exact_orders"], r


# ---------------------------------------------------------------------------
# Deterministic quantile sketch (log2-histogram registers)


def test_qsketch_spark_exprs_match_python_mirror(spark):
    """The Spark key/bounds expressions must equal the pure-Python mirror
    (tests/test_properties.py property-tests the mirror exhaustively;
    this pins the two together) across octave boundaries, sub-bucket
    edges, and the 0/singleton cases."""
    import sys

    sys.path.insert(0, "tests")
    from test_properties import _qs_bounds_py, _qs_key_py

    vals = sorted(
        {0, 1, 2, 31, 32, 33, 63, 64, 65, 1023, 1024, 2**20 - 1, 2**20,
         2**40 + 12345, 2**62 - 1}
        | {(1 << e) + d for e in range(1, 40, 3) for d in (0, 1, (1 << e) - 1)}
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    lo, hi = SK._qs_bounds(SK._qs_key(F.col("v")))
    got = {
        r["v"]: (r["k"], r["lo"], r["hi"])
        for r in df.select(
            "v", SK._qs_key(F.col("v")).alias("k"), lo.alias("lo"), hi.alias("hi")
        ).collect()
    }
    for v in vals:
        k = _qs_key_py(v)
        assert got[v] == (k, *_qs_bounds_py(k)), (v, got[v])


def test_qsketch_key_is_monotone_and_bounds_enclose(spark):
    """Bucket keys must be monotone in the value (the cumulative readout
    depends on it) and every value must fall inside its own bucket's
    reconstructed [lo, hi]."""
    vals = [0, 1, 2, 3, 31, 32, 33, 63, 64, 100, 999, 12345, 10**9, 2**40 + 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    lo, hi = SK._qs_bounds(SK._qs_key(F.col("v")))
    rows = sorted(
        df.select(
            "v", SK._qs_key(F.col("v")).alias("k"), lo.alias("lo"), hi.alias("hi")
        ).collect(),
        key=lambda r: r["v"],
    )
    prev_k = -1
    for r in rows:
        assert r["lo"] <= r["v"] <= r["hi"], r
        assert r["k"] > prev_k, r
        prev_k = r["k"]
    # exact (singleton) buckets below 2^QS_BITS
    for r in rows:
        if r["v"] < 1 << SK.QS_BITS:
            assert r["lo"] == r["hi"] == r["v"]


def test_qsketch_quantiles_enclose_exact_order_statistics(spark, sf_dir):
    """The [lo, hi] bound pair must CONTAIN the exact ceil(q*n)-th order
    statistic for every group and every q — the sketch's hard guarantee,
    not a probabilistic one — with relative width <= 2^-QS_BITS."""
    import math

    o = read_parquet_table(spark, sf_dir, "orders")
    out = {r["o_orderstatus"]: r for r in SK.qsketch_price_quantiles(o).collect()}
    pdf = o.select("o_orderstatus", "o_totalprice").toPandas()
    pdf["cents"] = (pdf.o_totalprice * 100 + 0.5).apply(math.floor)
    groups = list(pdf.groupby("o_orderstatus")) + [("ALL", pdf)]
    assert set(out) == {g for g, _ in groups}
    for status, grp in groups:
        s = sorted(grp.cents)
        n = len(s)
        assert out[status]["n_rows"] == n
        for q in (50, 90, 99):
            exact = s[(n * q + 99) // 100 - 1]
            lo, hi = out[status][f"p{q}_lo"], out[status][f"p{q}_hi"]
            assert lo <= exact <= hi, (status, q, exact, lo, hi)
            assert hi - lo <= max(lo >> SK.QS_BITS, 0), (status, q, lo, hi)


def test_qsketch_registers_merge_by_sum(spark, sf_dir):
    """Register merge = plain per-key count sum: two disjoint halves'
    registers summed must equal the full table's registers EXACTLY —
    the property that makes the sketch unionable across partitions,
    sources, and micro-batches."""
    o = read_parquet_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")

    def regs(df):
        return {
            r["key"]: r["cnt"]
            for r in SK.qsketch_registers(df, cents, ()).collect()
        }

    full = regs(o)
    even = regs(o.filter(F.col("o_orderkey") % 2 == 0))
    odd = regs(o.filter(F.col("o_orderkey") % 2 == 1))
    merged: dict = {}
    for part in (even, odd):
        for k, c in part.items():
            merged[k] = merged.get(k, 0) + c
    assert merged == full
