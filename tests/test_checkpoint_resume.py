"""Checkpoint-resume suite (SURVEY §5.2 suite 3): stream part of the log,
stop, resume from the checkpoint, verify no lost/duplicated events."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_pipeline_spark.cdc.stream import run_stream
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox import IceboxTable

from .oracle import assert_tables_equal, replay_oracle
from .test_cdc_apply import BASE_SCHEMA, PAYLOAD

EV_SCHEMA = StructType(
    [
        StructField("lsn", LongType()),
        StructField("batch_id", IntegerType()),
        StructField("op", StringType()),
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)


def test_stream_stop_resume_equals_clean_run(spark, tdir):
    events_dir = os.path.join(tdir, "events")
    log = gen_event_log(spark, n_events=3000, n_docs=300, batch_size=600, partitions=4)
    log.write.partitionBy("batch_id").parquet(events_dir)

    # clean single run
    clean_root = os.path.join(tdir, "clean")
    IceboxTable.create(spark, clean_root, BASE_SCHEMA, n_buckets=8)
    run_stream(spark, events_dir, EV_SCHEMA, clean_root, os.path.join(tdir, "ck1"),
               query_name="clean")
    clean = IceboxTable.load(spark, clean_root).read().toPandas()

    # interrupted run: small triggers, stop after the first epoch, resume
    root = os.path.join(tdir, "resumed")
    ckpt = os.path.join(tdir, "ck2")
    IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=8)
    q = run_stream(spark, events_dir, EV_SCHEMA, root, ckpt,
                   query_name="resumed", max_files_per_trigger=3, await_all=False)
    # stop mid-stream (after at least one epoch commits)
    while IceboxTable.load(spark, root).snapshot_id < 1 and q.isActive:
        time.sleep(0.05)  # don't starve the driver with manifest reads
    q.stop()
    q.awaitTermination()
    mid = IceboxTable.load(spark, root)
    assert mid.snapshot_id >= 1

    # resume from the same checkpoint → must reach the same final state
    run_stream(spark, events_dir, EV_SCHEMA, root, ckpt,
               query_name="resumed", max_files_per_trigger=3)
    final = IceboxTable.load(spark, root)
    got = final.read().toPandas()
    assert_tables_equal(got, clean)

    # and equals the sequential oracle
    expected = replay_oracle(log.toPandas(), PAYLOAD)
    cols = list(got.columns)
    assert_tables_equal(got, expected[cols])

    # lineage accounts every event exactly once
    lin = final.read_lineage().toPandas()
    assert lin["events_applied"].sum() == 3000


def test_stream_delta_mode_stop_resume_with_compaction(spark, tdir):
    """The production MoR shape: stream with merge_strategy='delta' and
    inline compaction, interrupt, resume — final state must equal the
    sequential oracle and compaction must have folded deltas."""
    events_dir = os.path.join(tdir, "events")
    log = gen_event_log(spark, n_events=2400, n_docs=250, batch_size=400, partitions=4)
    log.write.partitionBy("batch_id").parquet(events_dir)

    root = os.path.join(tdir, "mor")
    ckpt = os.path.join(tdir, "ck")
    IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=8)
    q = run_stream(spark, events_dir, EV_SCHEMA, root, ckpt, query_name="mor",
                   max_files_per_trigger=4, await_all=False,
                   merge_strategy="delta", compact_ratio=0.5)
    while IceboxTable.load(spark, root).snapshot_id < 1 and q.isActive:
        time.sleep(0.05)  # don't starve the driver with manifest reads
    q.stop()
    q.awaitTermination()

    run_stream(spark, events_dir, EV_SCHEMA, root, ckpt, query_name="mor",
               max_files_per_trigger=4,
               merge_strategy="delta", compact_ratio=0.5)
    final = IceboxTable.load(spark, root)
    got = final.read().toPandas()
    expected = replay_oracle(log.toPandas(), PAYLOAD)
    assert_tables_equal(got, expected[list(got.columns)])
    assert final.read_lineage().toPandas()["events_applied"].sum() == 2400
    # compaction ran: base files exist (not a pure delta chain)
    assert any(
        e.get("path") is not None for e in final.manifest["buckets"].values()
    )


def test_stream_auto_split_grows_buckets(spark, tdir):
    """split_rows policy: a stream whose table outgrows the per-bucket
    budget must double n_buckets mid-stream (post-commit, crash-safe)
    and still replay to exactly the oracle state."""
    events_dir = os.path.join(tdir, "events")
    log = gen_event_log(spark, n_events=2000, n_docs=400, batch_size=500, partitions=4)
    log.write.partitionBy("batch_id").parquet(events_dir)

    root = os.path.join(tdir, "spl")
    IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=2)
    # ~400 live docs over 2 buckets with a 50-row budget -> must split
    run_stream(spark, events_dir, EV_SCHEMA, root, os.path.join(tdir, "ck"),
               query_name="spl", max_files_per_trigger=4,
               merge_strategy="delta", split_rows=50)
    final = IceboxTable.load(spark, root)
    assert final.n_buckets > 2
    got = final.read().toPandas()
    expected = replay_oracle(log.toPandas(), PAYLOAD)
    assert_tables_equal(got, expected[list(got.columns)])
