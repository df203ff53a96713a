"""Streaming tests: batch/stream equivalence on the same transformations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from variant_load_pipeline_spark.streaming import events as ev

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _mk_events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for u in (1, 2):
        for minutes in (0, 5, 10, 90, 95, 200):
            rows.append(
                (eid, base + dt.timedelta(minutes=minutes + u), u,
                 "click" if minutes % 10 == 0 else "view", float(minutes))
            )
            eid += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_hourly_rollup_batch(spark):
    df = _mk_events(spark)
    out = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in ev.hourly_rollup(df).collect()
    }
    # hour 0 clicks: base minutes 0 and 10 for each of 2 users
    assert out[("2024-01-01 00:00:00", "click")] == 4
    # sanity: total events preserved
    assert sum(out.values()) == 12


def test_sessionize_batch_gaps(spark):
    df = _mk_events(spark)
    sessions = ev.sessionize_batch(df, gap_minutes=30).collect()
    per_user = {}
    for r in sessions:
        per_user.setdefault(r["user_id"], []).append(r)
    # events at 0,5,10 | 90,95 | 200 -> 3 sessions per user
    for u in (1, 2):
        assert len(per_user[u]) == 3
        sizes = sorted(s["n_events"] for s in per_user[u])
        assert sizes == [1, 2, 3]


def test_stream_matches_batch_rollup(spark, tmp_path):
    df = _mk_events(spark)
    src = str(tmp_path / "events_parquet")
    df.write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = ev.hourly_rollup(stream)
    q = ev.run_stream_to_memory(out, "rollup_test", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from rollup_test").collect()
    }
    exp = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in ev.hourly_rollup(df).collect()
    }
    assert got == exp
    q.stop()


def test_stream_sessionize_matches_batch(spark, tmp_path):
    df = _mk_events(spark)
    src = str(tmp_path / "events_parquet2")
    df.write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = ev.sessionize_stream(stream, gap_minutes=30)
    q = ev.run_stream_to_memory(out, "sess_test", output_mode="complete")
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("select * from sess_test").collect()
    }
    exp = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in ev.sessionize_batch(df, gap_minutes=30).collect()
    }
    assert got == exp
    q.stop()


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    df = _mk_events(spark)
    src = str(tmp_path / "events_parquet3")
    df.write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = ev.running_totals_stateful(stream)
    q = ev.run_stream_to_memory(out, "stateful_test", output_mode="update")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "select * from stateful_test"
        ).collect()  # availableNow => one update per user
    }
    exp = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == exp
    q.stop()


def test_zygosity_style_running_ratio_batch(spark):
    df = _mk_events(spark)
    out = ev.zygosity_style_running_ratio(df).collect()
    # shares within one (window, user) sum to ~100 (integer rounding)
    by_wu = {}
    for r in out:
        by_wu.setdefault((r["window_start"], r["user_id"]), []).append(r["pct"])
    for pcts in by_wu.values():
        assert 98 <= sum(pcts) <= 102


def test_dedup_stream_matches_batch(spark, tmp_path):
    df = _mk_events(spark)
    dup = df.unionByName(df.limit(4))  # re-deliver 4 events
    src = str(tmp_path / "events_dup")
    dup.write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = ev.dedup_stream(stream, keys=["event_id"])
    q = ev.run_stream_to_memory(out, "dedup_test", output_mode="append")
    got = sorted(
        r["event_id"] for r in spark.sql("select * from dedup_test").collect()
    )
    exp = sorted(r["event_id"] for r in df.collect())
    assert got == exp
    q.stop()
