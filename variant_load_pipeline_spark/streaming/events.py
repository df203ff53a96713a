"""Structured Streaming operators over event streams (capability extension —
the reference is batch-only; SURVEY.md §1.4/§7.2 step 7).

Every transformation is defined once as a DataFrame->DataFrame function that
works identically on a batch frame and a streaming frame (the Structured
Streaming contract), so tests assert stream-vs-batch equivalence by running
the same function both ways.

* ``hourly_rollup`` — tumbling-window count/sum with a watermark for late
  data; at scale this is a streaming partial aggregation with state pruned
  by the watermark.
* ``sessionize`` — gap-based session assignment.  Batch: lag window +
  running sum of gap-breaks (W4's sorted-stream grouping, windowed).
  Streaming: ``session_window`` (Spark's native gap-session operator).
* ``zygosity_style_running_ratio`` — the reference's zygosity percent as a
  streaming-friendly aggregation: per (user, window) ratio of a value to a
  windowed total — demonstrating the variant-pipeline kernels re-expressed
  over unbounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def hourly_rollup(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window rollup; works on batch and streaming frames."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions in batch: a new session starts when the gap from
    the previous event of the same user exceeds ``gap_minutes``.

    Returns one row per session: (user_id, session_start, session_end,
    n_events, total_value).  This is the windowed restatement of the
    reference's position-change flush loop (W4) applied to time gaps.
    """
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    df = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return df.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessions via the native session_window (gap-close state is
    managed by the engine, pruned by the watermark)."""
    return (
        events.withWatermark("ts", f"{2 * gap_minutes} minutes")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
):
    """Start a memory-sink query and block until the source drains —
    the test harness for stream/batch equivalence."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, total_value), state carried across micro-batches.

    This is the escape hatch for operators Spark's built-in streaming
    aggregations can't express (reference-style accumulating QC counters,
    online dedup registries, ...): an Arrow-batched python kernel with an
    engine-managed per-key state store.  Built-ins stay the first choice —
    this exists to prove the custom-stateful path end-to-end.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def moving_avg_stateful(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming twin of the ``events_moving_avg`` query: per-user k-event
    moving average over the event stream via ``applyInPandasWithState``.

    Sliding ROW frames are not expressible as a streaming windowed
    aggregation (state would be unbounded per time window), but the frame
    only ever needs the last ``k-1`` values per key — exactly what a
    custom state store carries.  State: the tail of recent values;
    per batch, a key's rows are processed in (ts, event_id) order and each
    event emits the average of the trailing window ending at it.  Fed
    time-ordered micro-batches (the replay/backfill case), the output
    matches the batch window query row-for-row — asserted by test.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField(f"mavg{k}", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("tail", T.ArrayType(T.DoubleType()))]
    )

    def update(key, pdfs, state: GroupState):
        tail = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        uids, eids, avgs = [], [], []
        for r in pdf.itertuples(index=False):
            tail.append(float(r.value))
            window = tail[-k:]
            uids.append(key[0])
            eids.append(r.event_id)
            avgs.append(round(sum(window) / len(window), 6))
        state.update((tail[-(k - 1):],))
        yield pd.DataFrame(
            {"user_id": uids, "event_id": eids, f"mavg{k}": avgs}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def zygosity_style_running_ratio(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """The reference's zygosity percent re-expressed over unbounded input:
    per (user, window), each event type's share of the windowed value total —
    round(100 * sum(value of type) / sum(value), 0), the streaming analog of
    pct = round(100*alleleReads/totalReads) (VariantLoad3.java:317-342).

    Batch: the two windowed aggregations join directly.  Streaming: run the
    per-type windowed aggregation as the stateful stage and derive the
    shares in ``foreachBatch`` (joining two streaming aggregates is not
    allowed by the engine); the stateful part stays a plain windowed partial
    aggregation either way.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    agg = df.groupBy(
        F.window("ts", window).alias("win"), "user_id", "event_type"
    ).agg(F.sum("value").alias("type_value"))
    totals = df.groupBy(F.window("ts", window).alias("win"), "user_id").agg(
        F.sum("value").alias("total_value")
    )
    joined = agg.join(totals, ["win", "user_id"])
    return joined.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "user_id",
        "event_type",
        F.when(
            F.col("total_value") != 0,
            F.floor(
                F.col("type_value") * 100 / F.col("total_value") + F.lit(0.5)
            ).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("pct"),
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first event per key wins, duplicate arrivals
    within the watermark horizon are dropped, and key state is pruned once
    the watermark passes — the unbounded-input form of the J4/W5 dedup
    family (a training-data ingest pipeline's online dedup stage).

    Batch frames take the plain dropDuplicates path so the same call tests
    both ways.
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def asof_stateful(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "error",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Streaming twin of the batch as-of join (operators/asof_join,
    `events_asof_join` query): left-type events are matched to the most
    recent right-type event at-or-before them, per user.

    The batch operator is a union + running-window sweep; the streaming
    form is its incremental version, and the state it needs is O(1) per
    key — only the LATEST right-side row (ts, value, event_id), not a
    buffer.  Per micro-batch a key's rows are processed in (ts,
    side-right-first, event_id) order: right rows advance the state, left
    rows emit the current match (ties at equal ts: right before left, so
    equality matches — the batch sweep's exact ordering).  Fed
    time-ordered micro-batches, output matches `events_asof_join`
    row-for-row across batch boundaries — asserted by test.

    State timestamps are stored as integer microseconds (no timestamp
    round-tripping through the state store).
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("asof_ts_us", T.LongType()),
            T.StructField("asof_value", T.DoubleType()),
            T.StructField("asof_event_id", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("r_ts_us", T.LongType()),
            T.StructField("r_value", T.DoubleType()),
            T.StructField("r_event_id", T.LongType()),
        ]
    )
    tol_us = (
        None if tolerance_seconds is None else tolerance_seconds * 1_000_000
    )

    def update(key, pdfs, state: GroupState):
        last = state.get if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf[pdf["event_type"].isin([left_type, right_type])]
        # itertuples renames underscore-prefixed columns; use plain names
        pdf["ts_us_"] = pdf["ts"].astype("int64") // 1000
        pdf["right_first_"] = (pdf["event_type"] == left_type).astype(int)
        pdf = pdf.sort_values(["ts_us_", "right_first_", "event_id"])
        out = {k: [] for k in (
            "user_id", "event_id", "ts_us",
            "asof_ts_us", "asof_value", "asof_event_id",
        )}
        for r in pdf.itertuples(index=False):
            ts_us = int(r.ts_us_)
            if r.event_type == right_type:
                last = (ts_us, float(r.value), int(r.event_id))
                continue
            match = last
            if match is not None and tol_us is not None and (
                ts_us - match[0] > tol_us
            ):
                match = None
            out["user_id"].append(key[0])
            out["event_id"].append(int(r.event_id))
            out["ts_us"].append(ts_us)
            out["asof_ts_us"].append(match[0] if match else None)
            out["asof_value"].append(match[1] if match else None)
            out["asof_event_id"].append(match[2] if match else None)
        if last is not None:
            state.update(tuple(last))
        yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def interval_join_events(
    left: DataFrame,
    right: DataFrame,
    lag_seconds: int = 3600,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval join: every left event paired
    with the same user's right events from the trailing ``lag_seconds``
    window — right.ts in [left.ts - lag, left.ts].

    This is the OTHER temporal-join shape next to as-of: as-of keeps one
    best match via ordered state; the interval join keeps ALL matches in
    a bounded time range, and in streaming mode the range condition +
    watermarks are exactly what lets the engine BOUND the join state
    (each side's buffer is evicted once the watermark passes the
    interval edge — an unconstrained stream-stream join would buffer
    forever).  Batch frames take the same range-join condition; the
    equality on user_id keeps it a hash join with a range residual,
    never a pure theta join.
    """
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark("ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("ts", watermark)
    l = l.select(
        F.col("user_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    r = r.select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    cond = (
        (l.user_id == r.r_user_id)
        & (r.r_ts <= l.l_ts)
        & (r.r_ts >= l.l_ts - F.expr(f"INTERVAL {lag_seconds} SECONDS"))
    )
    return l.join(r, cond, how).select(
        "user_id", "l_ts", "l_event_id", "l_value",
        "r_ts", "r_event_id", "r_value",
    )


def idempotent_batch_sink(path: str):
    """foreachBatch sink with EXACTLY-ONCE effective semantics: each
    micro-batch overwrites its own deterministic ``batch=<id>`` parquet
    partition, so a redelivered batch (restart replay from the
    checkpoint, speculative re-execution) overwrites itself instead of
    appending duplicates — the standard idempotent-sink recipe when the
    target store has no transactional MERGE.

    Use: ``stream.writeStream.foreachBatch(idempotent_batch_sink(path))``.
    """

    def sink(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return sink


def read_sink_latest(
    spark, path: str, keys: list[str] | None = None
) -> DataFrame:
    """Read an idempotent_batch_sink store back as ONE logical table:
    per key, the row from the HIGHEST batch wins (late re-emissions of a
    key supersede older ones); within a batch ties break by event_id.
    The batch column comes free from partition discovery.
    """
    from pyspark.sql.window import Window as W

    keys = keys or ["event_id"]
    df = spark.read.parquet(path)
    w = W.partitionBy(*keys).orderBy(
        F.col("batch").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
