"""Structured Streaming tests: drive each stream with
trigger(availableNow=True) into a memory sink and compare against the
batch equivalent on the same data."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kmeans_with_mapreduce_cuda_spark.plans import REGISTRY
from kmeans_with_mapreduce_cuda_spark.sources.readers import load_table
from kmeans_with_mapreduce_cuda_spark.streaming import (
    hourly_counts_stream,
    read_events_stream,
    sessionize_stream,
    stream_assign_kmeans,
)

from conftest import SF_DIR


def _run_to_memory(df, name: str, spark, output_mode: str = "append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_counts_stream_matches_batch(spark):
    ev = read_events_stream(spark, SF_DIR)
    got = _run_to_memory(
        hourly_counts_stream(ev), "t_hourly", spark, output_mode="append"
    ).toPandas()
    exp = REGISTRY["rel_date_funcs"].fn(spark, SF_DIR).toPandas()
    # append mode emits a window only once the watermark passes its END:
    # at stream end the watermark is max(ts) - 2h, so the batch expectation
    # must exclude windows still open at that point.
    max_ts = (
        load_table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    )
    cutoff = pd.Timestamp(max_ts) - pd.Timedelta(hours=2)
    exp = exp[
        pd.to_datetime(exp["hour_str"]) + pd.Timedelta(hours=1) <= cutoff
    ]
    g = got.sort_values(["hour_str", "event_type"]).reset_index(drop=True)
    e = exp.sort_values(["hour_str", "event_type"]).reset_index(drop=True)
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(
        g[["hour_str", "event_type", "n", "sum_value"]],
        e[["hour_str", "event_type", "n", "sum_value"]],
        check_dtype=False,
    )


def test_stream_kmeans_assignment_matches_batch(spark):
    from kmeans_with_mapreduce_cuda_spark.operators.kmeans import assign_2d

    cents = [(100.0, 100.0), (5000.0, 5000.0)]
    ev = read_events_stream(spark, SF_DIR).select(
        F.col("event_id"),
        F.col("user_id").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    got = _run_to_memory(
        stream_assign_kmeans(ev, cents), "t_assign", spark
    ).toPandas()

    batch = load_table(spark, SF_DIR, "events").select(
        F.col("event_id"),
        F.col("user_id").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    exp = assign_2d(batch, cents).toPandas()
    g = got.sort_values("event_id").reset_index(drop=True)
    e = exp.sort_values("event_id").reset_index(drop=True)
    assert (g["cluster_id"].to_numpy() == e["cluster_id"].to_numpy()).all()


def test_sessionize_stream_runs_and_is_sane(spark):
    ev = read_events_stream(spark, SF_DIR)
    got = _run_to_memory(
        sessionize_stream(ev), "t_sessions", spark, output_mode="append"
    ).toPandas()
    # closed sessions only; the open tail per user stays in state
    assert len(got) > 0
    assert (got["session_end"] >= got["session_start"]).all()
    assert (got["n_events"] >= 1).all()

    # cross-check session count against a batch window computation:
    # sessions = gaps > 30 min between consecutive events per user.
    from pyspark.sql.window import Window

    e = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = e.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 30 * 60 * 1_000_000
        ).cast("int").alias("new_session"),
    )
    # total sessions = users + gap-splits; closed sessions = total - open (1/user)
    n_users = e.select("user_id").distinct().count()
    splits = gaps.agg(F.sum("new_session")).collect()[0][0] or 0
    total_sessions = n_users + splits
    assert len(got) == total_sessions - n_users, (
        f"closed sessions {len(got)} != total {total_sessions} - open {n_users}"
    )
