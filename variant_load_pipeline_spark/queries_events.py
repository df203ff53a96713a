"""Event-analytics query wave: as-of temporal join and funnel analysis
over the events table — the time-ordered operators a telemetry/feature
pipeline runs next to the corpus operators.

Registered into the shared queries registry (imported from .queries at
the bottom of that module, same pattern as queries_ext/queries_corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.asof_join import asof_join
from .queries import load_events, register

# ---------------------------------------------------------------------------
# As-of join: clicks matched to the most recent prior error per user
# ---------------------------------------------------------------------------
_ASOF_TOL = 7200  # seconds


@register(
    "events_asof_join",
    f"""
    WITH l AS (
        SELECT user_id, ts, event_id, value FROM events
        WHERE event_type = 'click'
    ),
    r AS (
        SELECT user_id, ts, event_id, value FROM events
        WHERE event_type = 'error'
    ),
    u AS (
        SELECT user_id, ts AS uts, 1 AS side_left, event_id AS seq,
               event_id AS l_event_id, value AS l_value,
               CAST(NULL AS TIMESTAMP) AS r_ts,
               CAST(NULL AS DOUBLE) AS r_value,
               CAST(NULL AS BIGINT) AS r_event_id
        FROM l
        UNION ALL
        SELECT user_id, ts, 0, event_id, NULL, NULL, ts, value, event_id
        FROM r
    ),
    s AS (
        SELECT user_id, uts, side_left, l_event_id, l_value,
               LAST_VALUE(r_ts IGNORE NULLS) OVER w AS m_ts,
               LAST_VALUE(r_value IGNORE NULLS) OVER w AS m_value,
               LAST_VALUE(r_event_id IGNORE NULLS) OVER w AS m_event_id
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY uts, side_left, seq
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(l_event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(epoch_us(uts) AS BIGINT) AS ts_us,
           CAST(ROUND(l_value, 6) AS DOUBLE) AS value,
           CAST(CASE WHEN epoch(uts) - epoch(m_ts) <= {_ASOF_TOL}
                     THEN epoch_us(m_ts) END AS BIGINT) AS asof_ts_us,
           CAST(CASE WHEN epoch(uts) - epoch(m_ts) <= {_ASOF_TOL}
                     THEN ROUND(m_value, 6) END AS DOUBLE) AS asof_value,
           CAST(CASE WHEN epoch(uts) - epoch(m_ts) <= {_ASOF_TOL}
                     THEN m_event_id END AS BIGINT) AS asof_event_id
    FROM s WHERE side_left = 1
    """,
    doc="As-of temporal join (operators/asof_join.asof_join): every click "
    "event matched to the user's most recent error at-or-before it, within "
    "a 2-hour tolerance.  Implemented as the union-tag + single-shuffle "
    "running-window sweep (no join node, no range-join blowup); the oracle "
    "replays the identical sweep with LAST_VALUE IGNORE NULLS.  Equal-ts "
    "ties: right-before-left (equality matches), right stream tie-broken "
    "by event_id — bit-deterministic in both engines",
)
def events_asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        clicks,
        errors,
        on="user_id",
        left_seq="event_id",
        right_seq="event_id",
        right_cols=["value", "event_id"],
        tolerance_seconds=_ASOF_TOL,
    )
    return joined.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round("value", 6).alias("value"),
        F.unix_micros(F.col("asof_ts")).alias("asof_ts_us"),
        F.round("asof_value", 6).alias("asof_value"),
        F.col("asof_event_id").cast("long").alias("asof_event_id"),
    )


# ---------------------------------------------------------------------------
# Funnel: signup -> first click after signup -> first purchase after click
# ---------------------------------------------------------------------------
@register(
    "events_funnel",
    """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    su AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    cl AS (
        SELECT e.user_id, MIN(e.ts) AS click_ts
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'click' AND e.ts >= su.signup_ts
        GROUP BY e.user_id
    ),
    pu AS (
        SELECT e.user_id, MIN(e.ts) AS purchase_ts
        FROM events e JOIN cl USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= cl.click_ts
        GROUP BY e.user_id
    )
    SELECT CAST(u.user_id AS BIGINT) AS user_id,
           CAST(epoch_us(su.signup_ts) AS BIGINT) AS signup_us,
           CAST(epoch_us(cl.click_ts) AS BIGINT) AS click_us,
           CAST(epoch_us(pu.purchase_ts) AS BIGINT) AS purchase_us,
           CAST(CASE WHEN pu.user_id IS NOT NULL THEN 3
                     WHEN cl.user_id IS NOT NULL THEN 2
                     WHEN su.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS stage
    FROM users u
    LEFT JOIN su USING (user_id)
    LEFT JOIN cl USING (user_id)
    LEFT JOIN pu USING (user_id)
    """,
    doc="Ordered-funnel analysis: per user, first signup, first click at-"
    "or-after the signup, first purchase at-or-after that click, and the "
    "deepest stage reached.  Three conditional-min aggregations chained by "
    "equi-joins on the SAME key (user_id) — co-partitioned end to end, no "
    "window over whole-user-history needed",
)
def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    users = ev.select("user_id").distinct()
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    cl = (
        ev.filter(F.col("event_type") == "click")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cl, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        users.join(su, "user_id", "left")
        .join(cl.select("user_id", "click_ts"), "user_id", "left")
        .join(pu.select("user_id", "purchase_ts"), "user_id", "left")
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_micros("signup_ts").alias("signup_us"),
            F.unix_micros("click_ts").alias("click_us"),
            F.unix_micros("purchase_ts").alias("purchase_us"),
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .when(F.col("signup_ts").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity week, counted per
# weeks-since-cohort offset
# ---------------------------------------------------------------------------
_WEEK = 604800  # seconds


@register(
    "events_retention_cohorts",
    f"""
    WITH w AS (
        SELECT user_id,
               CAST(FLOOR(epoch(ts) / {_WEEK}) AS BIGINT) AS wk
        FROM events
    ),
    c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id),
    a AS (
        SELECT DISTINCT w.user_id, c.cohort_wk, w.wk - c.cohort_wk AS wk_offset
        FROM w JOIN c USING (user_id)
    )
    SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
           CAST(wk_offset AS BIGINT) AS wk_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a GROUP BY cohort_wk, wk_offset
    """,
    doc="Cohort retention matrix: users bucketed by first-activity epoch "
    "week, distinct (user, week-offset) activity counted per cohort — "
    "the classic retention triangle.  Integer epoch-week arithmetic "
    "(no calendar/timezone rules to mirror); both aggregations and the "
    "join key on user_id, so the whole pipeline is co-partitioned on "
    "one shuffle key",
)
def events_retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / _WEEK).cast("long").alias("wk"),
    )
    c = w.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    a = (
        w.join(c, "user_id")
        .select(
            "user_id",
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("wk_offset"),
        )
        .distinct()
    )
    return a.groupBy(
        F.col("cohort_wk").cast("long").alias("cohort_wk"),
        F.col("wk_offset").cast("long").alias("wk_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Trailing-window interval join (batch twin of the stream-stream join)
# ---------------------------------------------------------------------------
_IVJ_LAG = 5400  # seconds


@register(
    "events_interval_join",
    f"""
    SELECT CAST(l.user_id AS BIGINT) AS user_id,
           CAST(epoch_us(l.ts) AS BIGINT) AS l_ts_us,
           CAST(l.event_id AS BIGINT) AS l_event_id,
           CAST(epoch_us(r.ts) AS BIGINT) AS r_ts_us,
           CAST(r.event_id AS BIGINT) AS r_event_id,
           CAST(ROUND(r.value, 6) AS DOUBLE) AS r_value
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'click' AND r.event_type = 'error'
     AND r.ts <= l.ts
     AND r.ts >= l.ts - INTERVAL {_IVJ_LAG} SECONDS
    """,
    doc="Trailing-window interval join (streaming/events."
    "interval_join_events): every click paired with ALL of the user's "
    "errors in the prior 90 minutes — the keep-all-matches temporal "
    "join next to as-of's keep-best.  Equality on user_id keeps it a "
    "hash join with a range residual; the SAME function runs as a "
    "watermark-bounded stream-stream join (state evicted past the "
    "interval edge), equivalence-tested across micro-batch boundaries",
)
def events_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.events import interval_join_events

    ev = load_events(spark, sf_dir)
    out = interval_join_events(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
        lag_seconds=_IVJ_LAG,
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros("l_ts").alias("l_ts_us"),
        F.col("l_event_id").cast("long").alias("l_event_id"),
        F.unix_micros("r_ts").alias("r_ts_us"),
        F.col("r_event_id").cast("long").alias("r_event_id"),
        F.round("r_value", 6).alias("r_value"),
    )


# ---------------------------------------------------------------------------
# Semi-structured JSON property column: schema'd parse + aggregate
# ---------------------------------------------------------------------------
@register(
    "events_props_parse",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k,
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured property column: the events table's JSON `props` "
    "string parsed with an EXPLICIT schema (from_json — no inference "
    "pass, malformed objects become NULL instead of errors) and "
    "aggregated per event type.  Integer sum, so no float-order leakage; "
    "the n_null column pins the malformed-input policy on both engines",
)
def events_props_parse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    ev = load_events(spark, sf_dir)
    parsed = ev.withColumn(
        "k",
        F.from_json(
            F.col("props"), T.StructType([T.StructField("k", T.IntegerType())])
        )["k"],
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_null"),
    )


# ---------------------------------------------------------------------------
# SQL front door: the same engine through spark.sql over registered views
# ---------------------------------------------------------------------------
@register(
    "sql_interface_rollup",
    """
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(value), 6) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
    doc="The SQL front door: the events table registered as a temp view "
    "and queried through spark.sql TEXT — same Catalyst plan as the "
    "DataFrame form, proving a reference user can bring plain SQL to "
    "this engine unchanged.  (All 10 tables register via "
    "session.register_views.)",
)
def sql_interface_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_events(spark, sf_dir).createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT event_type,
               date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')
                   AS hour,
               COUNT(*) AS n,
               ROUND(SUM(value), 6) AS total_value
        FROM events_v
        GROUP BY event_type, date_trunc('hour', ts)
        """
    )


# ---------------------------------------------------------------------------
# Time-series resample: hourly grid per user, forward-filled
# ---------------------------------------------------------------------------
_RS_SLOT = 3600  # seconds


@register(
    "events_resample_ffill",
    f"""
    WITH b AS (
        SELECT user_id, CAST(FLOOR(epoch(ts) / {_RS_SLOT}) AS BIGINT) AS slot,
               ts, event_id, value
        FROM events
    ),
    lastv AS (
        SELECT user_id, slot, value FROM (
            SELECT user_id, slot, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, slot
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM b
        ) WHERE rn = 1
    ),
    span AS (
        SELECT user_id, MIN(slot) AS s0, MAX(slot) AS s1 FROM b
        GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(range(s0, s1 + 1)) AS slot FROM span
    ),
    filled AS (
        SELECT g.user_id, g.slot, lv.value AS raw_value,
               LAST_VALUE(lv.value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.slot
                   ROWS UNBOUNDED PRECEDING) AS ffill
        FROM grid g LEFT JOIN lastv lv
          ON lv.user_id = g.user_id AND lv.slot = g.slot
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(slot AS BIGINT) AS slot,
           CAST(ROUND(ffill, 6) AS DOUBLE) AS value,
           CASE WHEN raw_value IS NULL THEN 'T' ELSE 'F' END AS gap_filled
    FROM filled
    """,
    doc="Time-series resampling: per user, an hourly slot grid spanning "
    "their activity (sequence + explode — no driver-side calendar), the "
    "slot's LAST event value (deterministic (ts, event_id) tie-break), "
    "gaps forward-filled with last-value-ignore-nulls.  The grid explode "
    "is the only row multiplication and is bounded by the time span; "
    "everything shuffles once on user_id",
)
def events_resample_ffill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_events(spark, sf_dir)
    b = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / _RS_SLOT).cast("long").alias("slot"),
        "ts",
        "event_id",
        "value",
    )
    lastv = (
        b.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "slot").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "slot", "value")
    )
    grid = (
        b.groupBy("user_id")
        .agg(F.min("slot").alias("s0"), F.max("slot").alias("s1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("s0"), F.col("s1"))).alias("slot"),
        )
    )
    filled = grid.join(lastv, ["user_id", "slot"], "left").withColumn(
        "ffill",
        F.last("value", ignorenulls=True).over(
            W.partitionBy("user_id")
            .orderBy("slot")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return filled.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("slot").cast("long").alias("slot"),
        F.round("ffill", 6).alias("value"),
        F.when(F.col("value").isNull(), F.lit("T"))
        .otherwise(F.lit("F"))
        .alias("gap_filled"),
    )


# ---------------------------------------------------------------------------
# Incremental materialized-rollup refresh: merge partial aggregates
# ---------------------------------------------------------------------------
@register(
    "rollup_incremental_refresh",
    """
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(value), 6) AS DOUBLE) AS total_value,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
    doc="Incremental materialized-view refresh: the hourly rollup is "
    "built from a BASE half (the stored materialization), then a DELTA "
    "half's partial aggregates are MERGED in (counts add, sums add, "
    "maxes max — the algebraic-aggregate property), and the result must "
    "equal the full recompute, which is exactly what the oracle "
    "computes.  At 100 TB this is the difference between re-scanning "
    "history every refresh and scanning only the new partition; the "
    "merge itself shuffles only rollup-sized data",
)
def rollup_incremental_refresh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    mid = ev.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    ).collect()[0]
    cut = (mid["lo"] + mid["hi"]) // 2

    def partial(df):
        return df.groupBy(
            "event_type",
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
            F.max(F.unix_micros("ts")).alias("mx"),
        )

    base = partial(ev.filter(F.col("event_id") <= cut))
    delta = partial(ev.filter(F.col("event_id") > cut))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "hour")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sv").alias("sv"),
            F.max("mx").alias("max_ts_us"),
        )
    )
    return merged.select(
        "event_type",
        "hour",
        F.col("n").cast("long").alias("n"),
        F.round("sv", 6).alias("total_value"),
        F.col("max_ts_us").cast("long").alias("max_ts_us"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 history: change events -> validity intervals per key
# ---------------------------------------------------------------------------
@register(
    "scd2_history",
    """
    WITH src AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(value) AS BIGINT) AS attr
        FROM events WHERE event_type = 'signup' OR event_type = 'purchase'
    ),
    ordered AS (
        SELECT user_id, ts, event_id, attr,
               LAG(attr) OVER w AS prev_attr
        FROM src
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, ts, event_id, attr FROM ordered
        WHERE prev_attr IS NULL OR attr <> prev_attr
    ),
    versions AS (
        SELECT user_id, attr,
               epoch_us(ts) AS valid_from_us,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS valid_to_us,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS version
        FROM changes
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(version AS INT) AS version,
           CAST(attr AS BIGINT) AS attr,
           CAST(valid_from_us AS BIGINT) AS valid_from_us,
           CAST(valid_to_us AS BIGINT) AS valid_to_us,
           CASE WHEN valid_to_us IS NULL THEN 'T' ELSE 'F' END AS is_current
    FROM versions
    """,
    doc="Slowly-Changing-Dimension Type 2 history build: a change stream "
    "collapses to one row per distinct consecutive attribute value, with "
    "[valid_from, valid_to) microsecond intervals chained by LEAD and an "
    "open-ended current row — the dimension-history table a warehouse "
    "maintains, built in two windows over one key-partitioned shuffle "
    "(no self-join, no per-key driver loop)",
)
def scd2_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_events(spark, sf_dir)
    src = ev.filter(
        (F.col("event_type") == "signup") | (F.col("event_type") == "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.floor("value").cast("long").alias("attr"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = src.withColumn("prev_attr", F.lag("attr").over(w))
    changes = ordered.filter(
        F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr"))
    )
    versions = changes.select(
        "user_id",
        "attr",
        F.unix_micros("ts").alias("valid_from_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("valid_to_us"),
        F.row_number().over(w).alias("version"),
    )
    return versions.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("version").cast("int").alias("version"),
        F.col("attr").cast("long").alias("attr"),
        F.col("valid_from_us").cast("long").alias("valid_from_us"),
        F.col("valid_to_us").cast("long").alias("valid_to_us"),
        F.when(F.col("valid_to_us").isNull(), F.lit("T"))
        .otherwise(F.lit("F"))
        .alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Sequential pattern mining: most frequent event-type trigrams
# ---------------------------------------------------------------------------
@register(
    "event_pattern_mining",
    """
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pat AS (
        SELECT event_type || '>' || t2 || '>' || t3 AS pattern,
               user_id
        FROM o WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    )
    SELECT pattern,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM pat GROUP BY pattern
    ORDER BY n_occurrences DESC, pattern LIMIT 15
    """,
    doc="Sequential pattern mining: the most frequent 3-step event-type "
    "sequences across user timelines (LEAD windows over one user_id-"
    "partitioned shuffle — the contiguous-subsequence form; gap-allowed "
    "PrefixSpan generalizes the same counting).  Occurrence and "
    "distinct-user support both reported; top-15 via per-partition "
    "heaps with deterministic pattern tie-break",
)
def event_pattern_mining_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    pat = o.select(
        F.concat_ws(">", "event_type", "t2", "t3").alias("pattern"),
        "user_id",
    )
    return (
        pat.groupBy("pattern")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "pattern")
        .limit(15)
    )
