"""Dead-letter queue (apply_batch quarantine_dir): malformed events
route to a per-batch parquet sink with reasons, valid rows apply, and
crash-replays stay idempotent on both the table and the DLQ."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.cdc.apply import apply_batch
from data_pipeline_spark.icebox.table import IceboxTable

from .test_cdc_apply import BASE_SCHEMA


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, batch_id int",
    )


MIXED = [
    (1, "insert", "a", [1], 1, "s", 0),
    (2, "insert", "b", [2], 2, "s", 0),
    (3, "frobnicate", "c", [3], 3, "s", 0),   # unknown op
    (None, "insert", "d", [4], 4, "s", 0),    # null lsn
    (5, "insert", None, [5], 5, "s", 0),      # null key
]


def test_default_still_rejects_whole_batch(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA,
                           n_buckets=2)
    with pytest.raises(ValueError, match="refusing to apply"):
        apply_batch(t, _events(spark, MIXED), 0, merge_strategy="delta")
    assert t.read().count() == 0


@pytest.mark.parametrize("strategy", ["delta", "join"])
def test_quarantine_applies_valid_and_records_reasons(spark, tdir, strategy):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA,
                           n_buckets=2)
    q = os.path.join(tdir, "dlq")
    t = apply_batch(t, _events(spark, MIXED), 0, merge_strategy=strategy,
                    quarantine_dir=q)
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["a", "b"]
    dlq = spark.read.parquet(os.path.join(q, "batch_id=0"))
    got = {(r["doc_id"], r["_quarantine_reason"]) for r in dlq.collect()}
    assert got == {("c", "unknown_op"), ("d", "null_lsn"),
                   (None, "null_doc_id")}


def test_quarantine_replay_is_idempotent(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA,
                           n_buckets=2)
    q = os.path.join(tdir, "dlq")
    ev = _events(spark, MIXED)
    t = apply_batch(t, ev, 0, merge_strategy="delta", quarantine_dir=q)
    sid = t.snapshot_id
    # replay (same tag): table no-op, DLQ still exactly one copy
    t = apply_batch(t, ev, 0, merge_strategy="delta", quarantine_dir=q)
    assert t.snapshot_id == sid
    assert spark.read.parquet(os.path.join(q, "batch_id=0")).count() == 3
    # crash-sim: quarantine written but the COMMIT lost — the DLQ dir for
    # batch 7 already exists when the SAME batch id is re-applied against
    # a handle that never committed it (tag absent). The re-apply must
    # OVERWRITE the subdir, not append to it: an append-mode DLQ would
    # show 6 rows here and double-count every crash-replayed batch.
    t2 = IceboxTable.create(spark, os.path.join(tdir, "t2"), BASE_SCHEMA,
                            n_buckets=2)
    (
        ev.limit(0)  # simulate the orphan write a crashed apply left
        .withColumn("_quarantine_reason", F.lit("stale"))
        .write.mode("overwrite")
        .parquet(os.path.join(q, "batch_id=7"))
    )
    # plus a stale extra row, to prove overwrite (not merge) semantics
    spark.createDataFrame(
        [(99, "frobnicate", "zz", None, None, None, 7, "stale")],
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, batch_id int, _quarantine_reason string",
    ).write.mode("append").parquet(os.path.join(q, "batch_id=7"))
    assert spark.read.parquet(os.path.join(q, "batch_id=7")).count() == 1
    apply_batch(t2, ev, 7, merge_strategy="delta", quarantine_dir=q)
    dlq7 = spark.read.parquet(os.path.join(q, "batch_id=7"))
    assert dlq7.count() == 3  # overwrite: stale orphan gone, one copy
    assert dlq7.filter(F.col("_quarantine_reason") == "stale").count() == 0


def test_clean_batch_writes_no_dlq(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA,
                           n_buckets=2)
    q = os.path.join(tdir, "dlq")
    t = apply_batch(t, _events(spark, MIXED[:2]), 0, merge_strategy="delta",
                    quarantine_dir=q)
    assert t.read().count() == 2
    assert not os.path.exists(q)
