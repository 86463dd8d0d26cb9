"""Windowed and sessionized event analytics over the ``events`` table —
batch DataFrame forms plus Structured Streaming twins.

The reference has NO streaming surface (SURVEY.md §2.9: the ratings
timestamp is parsed and discarded); this module is the extension the
north-star calls for. Every batch query here is expressible in ANSI SQL
(DuckDB oracle); the streaming builders run the same logical plan over
``readStream`` with a watermark, so batch results double as goldens for the
streaming micro-batch tests.

Aggregate values accumulate in DECIMAL (see operators/relational.py) so the
batch results hash identically across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(24,6)"


def tumbling_window_stats(events: DataFrame, width_sec: int = 300) -> DataFrame:
    """Per (window, event_type) stats over fixed-width tumbling windows.

    The window start is materialized as an epoch-floored timestamp (not
    Spark's struct-typed ``window`` column) so results compare directly with
    the SQL oracle and with the streaming twin.
    """
    wstart = F.timestamp_seconds(
        (F.floor(F.unix_timestamp("ts") / width_sec) * width_sec).cast("long")
    )
    return (
        events.groupBy(wstart.alias("window_start"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


def sliding_window_stats(
    events: DataFrame, width_sec: int = 600, slide_sec: int = 300
) -> DataFrame:
    """Sliding windows via explicit window-start enumeration: each event
    belongs to width/slide windows; enumerate them with a sequence + explode
    (JVM-side), then aggregate. Identical semantics to ``F.window(width,
    slide)`` but with a flat epoch column for oracle comparison."""
    n_windows = width_sec // slide_sec
    first_start = (
        F.floor((F.unix_timestamp("ts") - width_sec + slide_sec) / slide_sec)
        * slide_sec
    )
    last_start = F.floor(F.unix_timestamp("ts") / slide_sec) * slide_sec
    starts = F.sequence(
        first_start.cast("long"), last_start.cast("long"), F.lit(slide_sec).cast("long")
    )
    return (
        events.select(
            F.explode(starts).alias("wstart_epoch"),
            "event_type",
            "value",
            "user_id",
        )
        .filter(F.col("wstart_epoch") >= 0)
        .groupBy(
            F.timestamp_seconds(F.col("wstart_epoch")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


def session_stats(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Sessionization: per-user sessions separated by > gap_sec of
    inactivity. Classic lag + cumulative-sum session ids — two analytic
    windows over the same (user, ts) partitioning, so one shuffle total."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lag("ts").over(w_user))
    )
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0),
    )
    with_id = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(w_user)
    )
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .withColumn(
            "duration_sec",
            F.unix_timestamp("session_end") - F.unix_timestamp("session_start"),
        )
        .orderBy("user_id", "session_seq")
    )


def session_funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    gap_sec: int = 1800,
) -> DataFrame:
    """Ordered conversion funnel per user session: a session reaches stage
    k iff each stage's first occurrence happens strictly after the previous
    stage's first occurrence (the standard funnel semantic — out-of-order
    events don't count). Emits one row per session with per-stage reach
    flags and the depth reached.

    Scale: reuses the sessionization shuffle (user, ts); the funnel itself
    is a conditional MIN aggregation per session — no joins, no extra
    shuffle beyond the session id assignment.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user))
    with_id = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0),
    ).withColumn("session_seq", F.sum("new_session").over(w_user))
    firsts = with_id.groupBy("user_id", "session_seq").agg(
        *[
            F.min(
                F.when(F.col("event_type") == s, F.unix_timestamp("ts"))
            ).alias(f"t_{s}")
            for s in stages
        ]
    )
    reached_prev = F.lit(True)
    prev_t = None
    depth = F.lit(0)
    out_cols = []
    for i, s in enumerate(stages):
        t = F.col(f"t_{s}")
        cond = t.isNotNull() if prev_t is None else (
            reached_prev & t.isNotNull() & (t > prev_t)
        )
        reached_prev = cond
        prev_t = t
        depth = F.when(cond, i + 1).otherwise(depth)
        out_cols.append(cond.alias(f"reached_{s}"))
    return firsts.select(
        "user_id", "session_seq", *out_cols, depth.alias("funnel_depth")
    ).orderBy("user_id", "session_seq")


# ---------------------------------------------------------------------------
# Structured Streaming twins
# ---------------------------------------------------------------------------

def read_events_stream(
    spark: SparkSession, events_dir: str, schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of events parquet files. The
    nanos→micros normalization matches sources/readers.py, as does the
    UTC session pin (the ntz→ltz cast and all event-time windowing must
    not depend on the host timezone). ``max_files_per_trigger`` bounds
    each micro-batch to that many source files — the knob the recovery
    tests use to force real multi-batch progression (and the production
    knob that bounds batch memory against a backlog of files)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(events_dir)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # Integral div (exact on long) — see sources/readers.py for why a
        # double divide+floor is wrong at epoch-nanos magnitude.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # MICROS-NTZ generation: watermarks require the LTZ type; under the
        # UTC session the cast reinterprets the same micros (readers.py).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def streaming_tumbling_window_stats(
    stream: DataFrame, width_sec: int = 300, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin of ``tumbling_window_stats``: event-time window with a
    watermark bounding late data and state size. Uses ``F.window`` (state-
    store-aware) and projects the flat window_start for golden comparison.

    Note: streaming disallows countDistinct; n_users is approximated with
    HLL in the stream and therefore omitted here to keep the twin exact."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_sec} seconds"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_sliding_window_stats(
    stream: DataFrame,
    width_sec: int = 600,
    slide_sec: int = 300,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of ``sliding_window_stats`` via the native sliding
    ``F.window(width, slide)`` with a watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{width_sec} seconds", f"{slide_sec} seconds"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_user_running_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count and value sum maintained in the state store and
    re-emitted every micro-batch — the arbitrary-state surface Structured
    Streaming exposes for operators its built-ins can't express
    (SURVEY.md §2.9: the reference has no stateful streaming at all)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update_totals(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_totals,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup_events(
    stream: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact deduplication by event_id: state-store-backed
    ``dropDuplicatesWithinWatermark`` keeps ids only as long as the
    watermark requires, so state is bounded — the streaming twin of the
    batch exact-dedup operator (operators/dedup.py) for at-least-once
    sources."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_errors_near_purchases(
    errors: DataFrame,
    purchases: DataFrame,
    window_sec: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: error events matched to purchase events
    by the same user within ±window_sec of event time. Watermarks on BOTH
    sides bound the join state (each side retains only watermark+window of
    history), which is what makes the join runnable indefinitely — the
    streaming twin of the batch ``errors_near_purchases`` interval join.

    Inputs are the two pre-filtered event streams (callers filter
    ``event_type``) so the same builder works for any pair of streams."""
    e = (
        errors.select(
            F.col("event_id").alias("error_event_id"),
            F.col("user_id"),
            F.col("ts").alias("err_ts"),
        ).withWatermark("err_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        ).withWatermark("p_ts", watermark)
    )
    return e.join(
        p,
        F.expr(
            f"user_id = p_user_id AND "
            f"p_ts BETWEEN err_ts - INTERVAL {window_sec} SECONDS "
            f"AND err_ts + INTERVAL {window_sec} SECONDS"
        ),
    ).select("error_event_id", "purchase_event_id", "user_id", "err_ts", "p_ts")


def streaming_session_stats(
    stream: DataFrame, gap_sec: int = 1800, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming sessionization via the native ``session_window`` (gap-based
    merging state windows) — the Structured Streaming analog of
    ``session_stats``."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_sec} seconds"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state processor API (typed state variables managed by
    a ``StatefulProcessor``, successor to ``applyInPandasWithState``'s
    tuple state). Semantically identical to
    ``streaming_user_running_totals``; kept as a separate operator so both
    stateful surfaces stay exercised.

    Environment note: the processor runner requires a working
    ``google.protobuf`` (Spark's state-server protocol); in sandboxes where
    that import is broken the query fails at initialization — the
    equivalence test importorskips on it. ``applyInPandasWithState``
    (above) has no such dependency and is the portable path.

    State per user is one (count, sum) value — O(users) store size, no
    growth with stream length; the decimal-free double sum is acceptable
    here because the state is per-key sequential (single writer per key),
    so accumulation order is deterministic given the source order.
    """
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = "user_id long, n_events long, sum_value double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, s double")

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            # Required StatefulProcessor lifecycle method; no resources
            # to release (state handles are runner-managed).
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def write_stream_idempotent_partitioned(
    aggregated_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_col: str = "window_start",
):
    """Exactly-once streaming sink: ``foreachBatch`` + dynamic-partition
    overwrite. Each micro-batch of a windowed aggregate (complete-mode
    rows for the windows it touched) OVERWRITES exactly the output
    partitions it carries, so replaying a batch after a failure rewrites
    the same partitions with the same rows — idempotent effect on top of
    the checkpoint's at-least-once delivery, the standard exactly-once
    recipe for object-store sinks without a transaction log.

    Contract: ``partition_col`` must partition the aggregate's output so
    every group lands in exactly one partition value (window_start does,
    for window grains); the batch must carry COMPLETE results for each
    partition it writes (update-mode windowed aggregates with watermark
    finalization do).

    Returns the started-ready ``DataStreamWriter`` (caller picks the
    trigger and calls ``start()``; tests use ``availableNow``).
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(out_dir)
        )

    return (
        aggregated_stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


def streaming_enriched_window_counts(
    stream: DataFrame,
    customer: DataFrame,
    width_sec: int = 300,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-static enrichment: join the event stream to the (batch)
    customer dimension BEFORE the event-time window aggregate — the
    standard streaming star-schema pattern. A stream-static equi-join
    carries NO state (the static side broadcasts per micro-batch; only
    the windowed aggregate holds state, bounded by the watermark), so
    this composes with any dimension size a broadcast can carry; beyond
    that, pre-bucket the dim and let the join shuffle the micro-batch
    only."""
    dim = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return (
        stream.withWatermark("ts", watermark)
        .join(dim, "user_id")
        .groupBy(F.window("ts", f"{width_sec} seconds"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )


def streaming_index_near_duplicates(
    docs_stream: DataFrame,
    index_band_tbl: DataFrame,
    index_payload: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.5,
    hash_fn: str = "per_seed",
) -> DataFrame:
    """Ingestion-time near-dup filter on a DOCUMENT stream: every stage
    of ``dedup.index_near_duplicates`` is stateless on the stream side —
    per-row MinHash signature, band explode, two stream-static joins
    against the prebuilt index, and the first-colliding-band rule
    replacing ``distinct()`` with a pure expression — so the BATCH
    function runs unchanged on the stream: no watermark, no state store,
    append mode. This is the production ingestion-dedup shape: the
    corpus index is a slowly-refreshed static artifact, the stream is
    the firehose, and each micro-batch's cost is its own size times the
    bucket fan-in.
    """
    from inf_553_datamining_mapreduce_spark.operators.dedup import (
        index_near_duplicates,
    )

    return index_near_duplicates(
        docs_stream,
        index_band_tbl,
        index_payload,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        min_jaccard=min_jaccard,
        hash_fn=hash_fn,
        # Always the stream shape (payload carried through the band
        # explode): for a streaming input this is what auto-selection
        # picks anyway; under BATCH execution it pins the stream's exact
        # composition, which is how the plan-gated registry entry puts
        # the stream plan under the driver's DuckDB oracle.
        carry_payload=True,
    )
