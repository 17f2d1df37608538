"""ensure_parallelism: the small-scan fan-out guard (operators/util).

Previously exercised only through the operators that call it; these pin
its contract directly — including the r5 change from probing the
OPTIMIZED plan to the ANALYZED plan (analysis is the cheap, cached
phase; the optimizer never adds join/aggregate/window nodes, so the
conservative skip set is unchanged).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_pipeline_spark.operators.util import ensure_parallelism


def _small_parquet(spark, tdir: str):
    p = os.path.join(tdir, "small.parquet")
    spark.range(0, 1000, 1, 1).select(
        F.col("id"), F.format_string("d%04d", F.col("id")).alias("doc_id")
    ).coalesce(1).write.parquet(p)
    return spark.read.parquet(p)


def test_small_scan_fans_out(spark, tdir):
    df = _small_parquet(spark, tdir)
    out = ensure_parallelism(df, min_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 1000


def test_shuffle_shaped_frames_left_alone(spark, tdir):
    df = _small_parquet(spark, tdir)
    agg = df.groupBy("doc_id").count()
    assert ensure_parallelism(agg, min_partitions=16) is agg
    joined = df.join(df.select("id"), "id")
    assert ensure_parallelism(joined, min_partitions=16) is joined
    win = df.dropDuplicates(["doc_id"])
    assert ensure_parallelism(win, min_partitions=16) is win


def test_in_memory_frames_left_alone(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    assert ensure_parallelism(df, min_partitions=8) is df


def test_big_enough_scan_left_alone(spark, tdir):
    df = _small_parquet(spark, tdir)
    # target of 1: estimated splits (>=1) can never be below it
    assert ensure_parallelism(df, min_partitions=1) is df


def test_probe_runs_no_job(spark, tdir):
    """The guard must stay pure driver metadata: probing an AQE frame's
    plan with .rdd would EXECUTE upstream stages (the round-2 hazard);
    the analyzed-plan + file-size path runs zero Spark jobs."""
    df = _small_parquet(spark, tdir).filter(F.col("id") > 10)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None) or []
    ensure_parallelism(df, min_partitions=4)
    after = tracker.getJobIdsForGroup(None) or []
    assert len(after) == len(before)
