"""Real-data smoke tests for every timestamp-consuming operator.

Round-3 regression class: the test parquet's ``events.ts`` type
drifted (TIMESTAMP(NANOS) -> timestamp[us] -> Spark TIMESTAMP_NTZ)
and six queries crashed in the driver while pytest stayed green,
because no test fed the REAL events parquet through sessionize /
range_join / streaming. These tests close that hole two ways:

1. run each ts-consuming operator on ``load_table`` output (whatever
   the current parquet generation is — the loader must normalize it);
2. run each operator on a RAW TIMESTAMP_NTZ frame built in-test, so
   the operators themselves stay NTZ-safe even when a user bypasses
   the loader.

Any future parquet-type drift fails here first, not in the driver.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from skrub_spark.operators.asof import asof_join
from skrub_spark.operators.gapfill import time_bucket_gapfill
from skrub_spark.operators.range_join import range_join
from skrub_spark.operators.session_encoder import (
    SessionEncoder,
    session_features,
    sessionize,
)
from skrub_spark.sources import load_table
from skrub_spark.streaming.ops import (
    session_window_features,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def events_ntz(spark, sf_dir):
    """The same events rows with ts forced to TIMESTAMP_NTZ — the
    type a no-timezone parquet read produces when the loader is
    bypassed."""
    df = load_table(spark, sf_dir, "events")
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_loader_normalizes_ts_to_timestamp(events):
    # whatever the parquet generation, load_table must emit TIMESTAMP
    assert dict(events.dtypes)["ts"] == "timestamp"
    assert events.count() > 0


@pytest.mark.parametrize("frame", ["events", "events_ntz"])
def test_sessionize_real_events(frame, request):
    df = request.getfixturevalue(frame)
    out = sessionize(df)
    assert out.filter(F.col("session_id").isNull()).count() == 0
    # session ids start at 1 and are monotone per user
    assert out.agg(F.min("session_id")).first()[0] == 1


@pytest.mark.parametrize("frame", ["events", "events_ntz"])
def test_session_features_real_events(frame, request):
    df = request.getfixturevalue(frame)
    row = (
        session_features(df)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("duration_s").alias("min_dur"),
        )
        .first()
    )
    assert row["n"] > 0
    assert row["min_dur"] >= 0.0


@pytest.mark.parametrize("frame", ["events", "events_ntz"])
def test_session_encoder_real_events(frame, request):
    df = request.getfixturevalue(frame)
    out = SessionEncoder().fit_transform(df)
    assert out.count() > 0
    assert "n_sessions" in out.columns


@pytest.mark.parametrize("frame", ["events", "events_ntz"])
def test_range_join_real_events(frame, request):
    df = request.getfixturevalue(frame)
    spans = df.groupBy("user_id").agg(
        F.min("ts").alias("start"), F.max("ts").alias("end")
    )
    out = range_join(
        spans,
        spans,
        left_start="start",
        left_end="end",
        right_start="start",
        right_end="end",
        by="user_id",
        bucket="1 day",
    )
    # every interval overlaps itself exactly once
    assert out.count() == spans.count()


@pytest.mark.parametrize("frame", ["events", "events_ntz"])
def test_session_window_features_real_events(frame, request):
    df = request.getfixturevalue(frame)
    row = (
        session_window_features(df)
        .agg(F.count(F.lit(1)).alias("n"), F.min("duration_us").alias("d"))
        .first()
    )
    assert row["n"] > 0
    assert row["d"] >= 0


@pytest.mark.parametrize("frame", ["events", "events_ntz"])
def test_windowed_counts_real_events(frame, request):
    df = request.getfixturevalue(frame)
    assert windowed_event_counts(df).count() > 0


@pytest.mark.parametrize("frame", ["events", "events_ntz"])
def test_gapfill_real_events(frame, request):
    df = request.getfixturevalue(frame)
    out = time_bucket_gapfill(
        df,
        "ts",
        {"n": F.count(F.lit(1))},
        bucket="1 day",
        by="event_type",
        fill="zero",
    )
    assert out.count() > 0
    assert out.filter(F.col("n").isNull()).count() == 0


@pytest.mark.parametrize("frame", ["events", "events_ntz"])
def test_asof_join_real_events(frame, request):
    df = request.getfixturevalue(frame)
    purchases = df.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    views = df.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    out = asof_join(
        purchases,
        views,
        by="user_id",
        left_ts="ts",
        right_ts="vts",
        tolerance_s=7 * 86400.0,
    )
    assert out.count() == purchases.count()


def test_streaming_enrich_real_events(spark, sf_dir):
    from skrub_spark.queries import q_streaming_enrich

    assert q_streaming_enrich(spark, sf_dir).count() > 0


def test_streaming_interval_join_real_events(spark, sf_dir):
    from skrub_spark.queries import q_streaming_interval_join

    assert q_streaming_interval_join(spark, sf_dir).count() > 0


def test_epoch_helpers_accept_all_types(spark):
    from skrub_spark.functions.timeutils import epoch_s, epoch_us

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 12, 0, 0),)], "t timestamp"
    )
    variants = {
        "timestamp": df,
        "timestamp_ntz": df.select(F.col("t").cast("timestamp_ntz").alias("t")),
        "date": df.select(F.col("t").cast("date").alias("t")),
    }
    expect_us = 1_704_110_400_000_000
    for name, v in variants.items():
        row = v.select(
            epoch_us("t").alias("us"), epoch_s("t").alias("s")
        ).first()
        if name == "date":
            assert row["us"] == 1_704_067_200_000_000
        else:
            assert row["us"] == expect_us
            assert row["s"] == expect_us / 1e6


def test_streaming_sessionize_continues_across_batches(spark, tmp_path):
    """The stateful property itself: an event in a LATER micro-batch
    within the gap of the previous batch's last event joins the SAME
    session (state-store carry); past the gap it opens a new one. A
    stateless per-batch sessionizer would restart ids at 1 and fail
    this."""
    import pandas as pd

    from skrub_spark.streaming import streaming_sessionize

    d = tmp_path / "sess_src"
    d.mkdir()
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def mk(name, rows):
        pd.DataFrame(
            {"user_id": [r[0] for r in rows],
             "ts": [base + datetime.timedelta(minutes=r[1]) for r in rows]}
        ).to_parquet(d / name, coerce_timestamps="us", allow_truncated_timestamps=True)

    # batch 1: two events 10 min apart (one session)
    mk("b1.parquet", [(1, 0.0), (1, 10.0)])
    # batch 2: +11 min (same session: gap 1 min) and +120 min (new)
    mk("b2.parquet", [(1, 11.0), (1, 120.0)])
    schema = "user_id bigint, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    name = "sess_cont_test"
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = sorted(
        spark.table(name).collect(), key=lambda r: r["ts"]
    )
    assert [r["session_id"] for r in rows] == [1, 1, 1, 2]
