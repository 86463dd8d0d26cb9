"""Fixed-size summary structures for unbounded key spaces — the sketch
family a 100 TB pipeline leans on when exact per-key state no longer fits:

  * Count-min sketch: heavy-hitter (frequent-key) estimation in O(d*w)
    memory regardless of input size, with one map-side-combinable shuffle.
  * Bloom runtime filter: build a bit set from a small (filtered) build
    side, prune the big probe side BEFORE its shuffle/join — the pattern
    Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` injects,
    expressed here explicitly so the plan is visible and testable.

Complements the HLL++ distinct sketch in ``relational.approx_distinct_parts``
(SURVEY.md §2.4's aggregation family taken to its at-scale form).

Cross-engine determinism: every hash is the first 60 bits of md5 (exact in
both Spark — ``conv(substring(md5(x),1,15),16,10)`` — and DuckDB —
``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``), so the full sketch
pipeline is oracle-able bit-for-bit, unlike seeded RNG or xxhash64 paths.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared 60-bit md5 hash (same construction as dedup.SIMHASH / text splits)
# ---------------------------------------------------------------------------


def _h60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative int64 — reproducible in any
    engine with an md5 function; 60 bits keeps the value inside the
    positive BIGINT range so `%` behaves identically everywhere."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _seeded(key: Column, seed: int) -> Column:
    return _h60(F.concat_ws(":", key.cast("string"), F.lit(str(seed))))


def _bit_mask(pos: Column) -> Column:
    """``1L << (pos % 64)`` — via call_function because F.shiftleft only
    accepts a literal shift amount."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

def cms_sketch(
    df: DataFrame, key: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build a count-min sketch over ``df[key]``: ``depth`` hash rows of
    ``width`` counters, as a (r, cell, cnt) table of at most depth*width
    rows — CONSTANT size no matter how many input rows or distinct keys.

    One generator projection (each input row contributes ``depth`` cells)
    and one groupBy whose partial aggregation collapses everything map-side
    to <= depth*width rows per task before the shuffle. At 100 TB this is
    the same single-pass shape as a global count — no per-key state.
    """
    cells = df.select(
        F.posexplode(
            F.array(*[_seeded(F.col(key), r) % width for r in range(depth)])
        ).alias("r", "cell")
    )
    return cells.groupBy("r", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_heavy_hitters(
    df: DataFrame,
    key: str,
    candidates: DataFrame,
    cand_key: str,
    depth: int = 4,
    width: int = 512,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` keys by count-min estimated frequency.

    The estimate for a key is the MIN over its ``depth`` counters — an
    upper bound on the true count (collisions only inflate), within
    ``e/width * N`` of it with probability ``1 - e^-depth``. Candidates
    come from a dimension table (broadcast), the sketch itself is broadcast
    (<= depth*width rows), so the probe runs without any shuffle of the
    fact table beyond the sketch build. Ties in the estimate are broken by
    key so the LIMIT is deterministic.

    The exact-count cross-check (est >= exact, est - exact <= bound) lives
    in tests/test_sketches.py — bundling exact counts here would force the
    per-key aggregation the sketch exists to avoid.
    """
    sketch = cms_sketch(df, key, depth=depth, width=width)
    probe = candidates.select(
        F.col(cand_key),
        F.posexplode(
            F.array(*[_seeded(F.col(cand_key), r) % width for r in range(depth)])
        ).alias("r", "cell"),
    )
    est = (
        probe.join(F.broadcast(sketch), ["r", "cell"], "left")
        .groupBy(cand_key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
    return est.orderBy(F.desc("est_count"), cand_key).limit(k)


# ---------------------------------------------------------------------------
# Bloom runtime filter
# ---------------------------------------------------------------------------

def bloom_bits(
    build: DataFrame, key: str, num_bits: int = 1 << 16, num_hashes: int = 3
) -> list[int]:
    """Aggregate the build side's keys into a ``num_bits`` bloom bit set,
    returned as ``num_bits/64`` int64 words.

    The per-word OR happens distributed (groupBy word index + bit_or —
    map-side combinable, at most ``num_bits/64`` rows shuffle); only the
    finished word table is collected, which is FIXED-size (8 KiB here) by
    construction — same contract as Spark's own runtime-filter collect.
    """
    positions = [_seeded(F.col(key), r) % num_bits for r in range(num_hashes)]
    words = (
        build.select(F.explode(F.array(*positions)).alias("pos"))
        .select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            _bit_mask(F.col("pos")).alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("word"))
        .collect()
    )
    arr = [0] * (num_bits // 64)
    for row in words:
        arr[row["w"]] = row["word"]
    return arr


def bloom_might_contain(
    words: list[int], key: Column, num_bits: int = 1 << 16, num_hashes: int = 3
) -> Column:
    """Membership predicate over a collected bloom word array, as a pure
    JVM-side expression (array literal + element_at + bit tests) — no UDF,
    no join, evaluated inside the probe side's scan stage so the filter
    sits BEFORE the shuffle."""
    arr = F.lit(words)
    tests = []
    for r in range(num_hashes):
        pos = _seeded(key, r) % num_bits
        word = F.element_at(arr, (F.shiftright(pos, 6) + 1).cast("int"))
        tests.append(word.bitwiseAND(_bit_mask(pos)) != 0)
    return reduce(lambda a, b: a & b, tests)


def bloom_filtered_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#23"
) -> DataFrame:
    """Per-supplier revenue over lineitems of one brand's parts, with the
    big side pre-pruned by a bloom filter built from the small side.

    Semantics are EXACTLY the plain join's (the broadcast equi-join after
    the bloom filter removes any false positives); the bloom's job is to
    drop ~selectivity of the fact table before the join/aggregate at the
    scan, which at 100 TB is the difference between shuffling 100 TB and
    shuffling the matching fraction. Mirrors Spark's injected runtime
    bloom filter, made explicit.
    """
    build = part.filter(F.col("p_brand") == brand).select("p_partkey")
    words = bloom_bits(build, "p_partkey")
    pruned = lineitem.filter(bloom_might_contain(words, F.col("l_partkey")))
    revenue = (
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(12,6)") - F.col("l_discount").cast("decimal(12,6)"))
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        pruned.join(F.broadcast(build), pruned.l_partkey == build.p_partkey)
        .groupBy("l_suppkey")
        .agg(revenue, F.count(F.lit(1)).alias("n_items"))
        .orderBy("l_suppkey")
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog registers — the MERGEABLE distinct sketch
# (Flajolet et al. 2007; the md5-hash construction makes every register
# value engine-exact, unlike the seeded-xxhash HLL++ inside Spark's
# ``approx_count_distinct``, whose oracle can only be a bounds check —
# see ``relational.approx_distinct_parts_bounds``).

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_W = 60 - HLL_P  # 52-bit remainder feeds the leading-zero count
# alpha_256 * 256^2, FROZEN as a literal shared verbatim with the DuckDB
# oracle (the pHash-DCT convention) so the one inexact IEEE division both
# engines perform starts from bit-identical operands.
HLL_ALPHA_M2 = 47072.71267120224
# 2^53 — the exact power-of-two scale that turns sum(2^-reg) into an
# exact BIGINT sum: term(reg) = 2^(53-reg), reg in [1, 53]; an untouched
# register contributes 2^53. Dividing by 2^53 at the end is EXACT (power
# of two), so the estimate involves exactly one inexact operation.
_HLL_SCALE = float(1 << 53)


def hll_registers(
    df: DataFrame, key: str, group_cols: tuple = ("event_type",)
) -> DataFrame:
    """Per-group HLL registers: bucket = low ``HLL_P`` hash bits, register
    = max over the group of rho(w) where rho is the position of the
    leading 1-bit of the remaining 52 bits (53 when w == 0). One hash
    aggregate with map-side partial max — CONSTANT ``HLL_M``-bounded state
    per group no matter how many rows, and registers MERGE by plain
    ``max``, which is what makes the sketch unionable across sources,
    partitions, or micro-batches."""
    h = _h60(F.col(key).cast("string"))
    bucket = h.bitwiseAND(F.lit(HLL_M - 1))
    w = F.shiftright(h, HLL_P)
    # bit_length via base-2 conv — stays integer (no libm log2); conv
    # emits '0' for w=0, hence the explicit branch.
    rho = F.when(w == F.lit(0), F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.conv(w, 10, 2))
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def _hll_estimate(registers: DataFrame, group_cols: tuple) -> DataFrame:
    """(group, n_zero_buckets, scaled_sum, hll_estimate) from a register
    table: scaled_sum = 2^53 * sum_j 2^-M_j as an EXACT BIGINT (missing
    buckets contribute 2^53), then the standard alpha*m^2/sum estimate
    with the division sequence pinned to one inexact IEEE op."""
    term = F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        (F.lit(HLL_W + 1) - F.col("reg")).cast("int"),
    )
    s = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    scaled_sum = (
        F.col("present_sum")
        + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << (HLL_W + 1))
    ).cast("long")
    return s.select(
        *group_cols,
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias(
            "n_zero_buckets"
        ),
        scaled_sum.alias("scaled_sum"),
        F.floor(
            F.lit(HLL_ALPHA_M2)
            / (scaled_sum.cast("double") / F.lit(_HLL_SCALE))
        )
        .cast("long")
        .alias("hll_estimate"),
    )


def hll_distinct_orders(lineitem: DataFrame) -> DataFrame:
    """Distinct orders per return flag AND the merged union ('ALL' row)
    from ONE register build: the union estimate is a plain ``max`` over
    the per-flag registers — the mergeability that lets 1000 executors
    (or 1000 micro-batches) each ship 256 small integers instead of
    their key sets. ``exact_orders`` rides along as the audit column
    (computed from the distinct-pair table, which the register state
    makes redundant at 100 TB — drop it there; the sketch columns are
    the product).

    The raw alpha*m^2/sum estimator is valid above ~2.5m (~640 at
    m=256) distinct keys; below that HLL's linear-counting branch
    (m*ln(m/V)) applies, which needs libm and so is left to consumers —
    ``n_zero_buckets`` (V) is emitted exactly for that purpose. The
    registry keys (l_orderkey per l_returnflag at sf>=0.01) sit above
    the boundary.

    Registers are localCheckpoint'd (constant-size: HLL_M x n_flags
    rows) so the per-flag and merged branches don't re-scan lineitem."""
    regs = hll_registers(
        lineitem, "l_orderkey", ("l_returnflag",)
    ).localCheckpoint()
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
        .select(F.lit("ALL").alias("l_returnflag"), "bucket", "reg")
    )
    est = _hll_estimate(regs.unionByName(merged), ("l_returnflag",))
    du = (
        lineitem.select("l_returnflag", "l_orderkey")
        .distinct()
        .localCheckpoint()
    )
    exact = du.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("exact_orders")
    )
    exact_all = du.agg(
        F.countDistinct("l_orderkey").alias("exact_orders")
    ).select(F.lit("ALL").alias("l_returnflag"), "exact_orders")
    return (
        est.join(exact.unionByName(exact_all), "l_returnflag")
        .select(
            "l_returnflag",
            "n_zero_buckets",
            "scaled_sum",
            "hll_estimate",
            "exact_orders",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Deterministic mergeable quantile sketch (log2 histogram registers)
# ---------------------------------------------------------------------------

# Sub-bucket resolution: 2^QS_BITS sub-buckets per octave, so a bucket's
# width is at most 2^-QS_BITS of its lower bound — every quantile readout
# is a [lo, hi] pair with hi/lo <= 1 + 2^-QS_BITS (~3.2% at 5 bits).
QS_BITS = 5
_QS_SUB = 1 << QS_BITS  # 32


def _qs_key(v: Column) -> Column:
    """Monotone log2-histogram bucket key for a non-negative BIGINT value:
    octave = floor(log2 v) via base-2 ``conv`` length (the HLL rho trick —
    stays integer, no libm), sub-bucket = the QS_BITS bits after the
    leading 1. key = octave * 2^QS_BITS + sub is strictly monotone in the
    bucket's value range, which is what lets a cumulative count walk read
    quantiles off the register table. Values below 2^QS_BITS get
    singleton (exact) buckets; 0 keys to 0."""
    e = (F.length(F.conv(v, 10, 2)) - 1).cast("long")
    sub = F.when(
        e < QS_BITS, v
    ).otherwise(
        F.call_function(
            "shiftright", v, (e - QS_BITS).cast("int")
        ).bitwiseAND(F.lit(_QS_SUB - 1))
    )
    return F.when(v <= 0, F.lit(0).cast("long")).otherwise(
        e * _QS_SUB + sub
    )


def _qs_bounds(key: Column) -> tuple[Column, Column]:
    """Inverse of ``_qs_key``: the [lo, hi] BIGINT value range of a bucket
    key. Exact (lo == hi) below 2^QS_BITS."""
    e = F.floor(key / _QS_SUB).cast("long")
    r = F.pmod(key, F.lit(_QS_SUB)).cast("long")
    lo = F.when(e < QS_BITS, r).otherwise(
        F.call_function(
            "shiftleft", (r + _QS_SUB), (e - QS_BITS).cast("int")
        )
    )
    hi = F.when(e < QS_BITS, r).otherwise(
        lo
        + F.call_function(
            "shiftleft", F.lit(1).cast("long"), (e - QS_BITS).cast("int")
        )
        - 1
    )
    return lo, hi


def qsketch_registers(
    df: DataFrame, value: Column, group_cols: tuple = ()
) -> DataFrame:
    """Per-group quantile-sketch registers ``(group, key, cnt)``: one
    narrow projection to bucket keys plus one map-side-combinable count
    aggregate. Register cardinality per group is bounded by the VALUE
    RANGE, not the row count (<= 64 octaves x 2^QS_BITS sub-buckets =
    2048 rows for any BIGINT input), and registers MERGE by plain
    ``sum`` — across partitions, sources, or micro-batches — which is
    what makes the sketch streamable and unionable exactly, unlike
    rank-based exact percentiles (a global sort) or percentile_approx
    (library-internal, not oracle-able). Deterministic: every step is
    integer arithmetic."""
    return (
        df.select(*group_cols, _qs_key(value).alias("key"))
        .groupBy(*group_cols, "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def qsketch_quantiles(
    registers: DataFrame,
    group_cols: tuple,
    q_pcts: tuple = (50, 90, 99),
) -> DataFrame:
    """Quantile readout from a register table: for each q, the bucket
    holding the ceil(q/100 * n)-th smallest value, reported as its exact
    integer [lo, hi] bounds — a GUARANTEED enclosure of the true order
    statistic (tested against the exact rank in tests/test_sketches.py),
    not a heuristic estimate. One tiny window cumsum per group (registers
    are bounded, so the single-partition-per-group window is constant
    work) and one aggregate."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = registers.select(
        *group_cols,
        "key",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("n_rows"),
    )
    picks = []
    for q in q_pcts:
        # target = ceil(n * q / 100) as pure integer arithmetic
        target = F.floor((F.col("n_rows") * q + 99) / 100).cast("long")
        picks.append(
            F.min(
                F.when(F.col("cum") >= target, F.col("key"))
            ).alias(f"_k{q}")
        )
    agg = cum.groupBy(*group_cols).agg(
        F.max("n_rows").alias("n_rows"), *picks
    )
    cols = [*group_cols, "n_rows"]
    for q in q_pcts:
        lo, hi = _qs_bounds(F.col(f"_k{q}"))
        cols.extend([lo.alias(f"p{q}_lo"), hi.alias(f"p{q}_hi")])
    return agg.select(*cols)


def qsketch_price_quantiles(orders: DataFrame) -> DataFrame:
    """p50/p90/p99 order-price bounds per order status PLUS the merged
    'ALL' row — from ONE register build, the merge being a plain re-keyed
    ``sum`` (the HLL pattern: per-group sketches union into the global
    sketch without touching the fact table again). Prices enter as exact
    cents (``floor(x*100 + 0.5)`` — the same fixed-point idiom as the
    zscore/rolling kernels, bit-identical in any IEEE engine), so the
    whole pipeline is integer and the DuckDB oracle reproduces every
    register and every bound exactly.

    At 100 TB: one scan, one bounded aggregate (<= 2048 registers per
    status), readout over a few thousand rows. The exact-percentile twin
    (``relational.price_percentiles``) needs a per-group sort of the full
    table; this is the form that replaces it when the table stops
    fitting."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    regs = qsketch_registers(
        orders, cents, ("o_orderstatus",)
    ).localCheckpoint()
    merged = (
        regs.groupBy("key")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit("ALL").alias("o_orderstatus"), "key", "cnt")
    )
    return qsketch_quantiles(
        regs.unionByName(merged), ("o_orderstatus",)
    ).orderBy("o_orderstatus")
