"""Exactly-once / idempotency suite (SURVEY §5.2 suite 2) and
order-independence of batch application."""

from __future__ import annotations

import os
import random

import pyspark.sql.functions as F

from data_pipeline_spark.cdc import apply_batch
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox import IceboxTable

from .oracle import assert_tables_equal
from .test_cdc_apply import BASE_SCHEMA


def _mk(spark, tdir, name, n_buckets=8):
    return IceboxTable.create(
        spark, os.path.join(tdir, name), BASE_SCHEMA, n_buckets=n_buckets
    )


def _batches(log):
    ids = sorted(r["batch_id"] for r in log.select("batch_id").distinct().collect())
    return [(b, log.filter(F.col("batch_id") == b)) for b in ids]


def test_double_apply_is_noop(spark, tdir):
    log = gen_event_log(spark, n_events=600, n_docs=80, batch_size=200, partitions=4)
    t = _mk(spark, tdir, "a")
    for b, df in _batches(log):
        t = apply_batch(t, df, b)
        sid = t.snapshot_id
        t = apply_batch(t, df, b)  # replay immediately
        assert t.snapshot_id == sid


def test_replay_from_scratch_converges(spark, tdir):
    """Apply all batches, then replay the WHOLE log against the committed
    table (crash-and-restart-from-zero) — state must not change."""
    log = gen_event_log(spark, n_events=900, n_docs=100, batch_size=300, partitions=4)
    t = _mk(spark, tdir, "a")
    for b, df in _batches(log):
        t = apply_batch(t, df, b)
    before = t.read().toPandas()
    t2 = IceboxTable.load(spark, t.root)  # fresh handle, as a restart would
    for b, df in _batches(log):
        t2 = apply_batch(t2, df, b)
    assert_tables_equal(t2.read().toPandas(), before)


def test_out_of_order_batches_converge(spark, tdir):
    """Micro-batch delivery order must not matter (the streaming file
    source does not guarantee LSN-ordered files across epochs).
    Regression for the bug found in the first end-to-end drive."""
    log = gen_event_log(spark, n_events=1000, n_docs=120, batch_size=200, partitions=4)
    batches = _batches(log)

    t_ord = _mk(spark, tdir, "ordered")
    for b, df in batches:
        t_ord = apply_batch(t_ord, df, b)

    shuffled = list(batches)
    random.Random(7).shuffle(shuffled)
    assert [b for b, _ in shuffled] != [b for b, _ in batches]
    t_shuf = _mk(spark, tdir, "shuffled")
    for b, df in shuffled:
        t_shuf = apply_batch(t_shuf, df, b)

    assert_tables_equal(t_shuf.read().toPandas(), t_ord.read().toPandas())


def test_duplicate_lsn_redelivery(spark, tdir):
    """The same events redelivered inside a later batch (at-least-once
    upstream) must not change the final state."""
    log = gen_event_log(spark, n_events=400, n_docs=60, batch_size=200, partitions=4)
    b0 = log.filter(F.col("batch_id") == 0)
    b1 = log.filter(F.col("batch_id") == 1)
    t = _mk(spark, tdir, "a")
    t = apply_batch(t, b0, 0)
    t = apply_batch(t, b1, 1)
    clean = t.read().toPandas()

    t2 = _mk(spark, tdir, "b")
    t2 = apply_batch(t2, b0, 0)
    # batch 1 arrives with batch 0's events duplicated inside it
    t2 = apply_batch(t2, b1.unionByName(b0.withColumn("batch_id", F.lit(1))), 1)
    assert_tables_equal(t2.read().toPandas(), clean)


def test_out_of_order_batches_converge_delta(spark, tdir):
    """Same order-independence contract through merge-on-read: delta
    commit order (_seq) differs from LSN order, and the read-side
    max_by(_lsn, _seq) must still resolve to the LWW state."""
    log = gen_event_log(spark, n_events=1000, n_docs=120, batch_size=200, partitions=4)
    batches = _batches(log)

    t_ord = _mk(spark, tdir, "d_ordered")
    for b, df in batches:
        t_ord = apply_batch(t_ord, df, b, merge_strategy="delta")

    shuffled = list(batches)
    random.Random(11).shuffle(shuffled)
    assert [b for b, _ in shuffled] != [b for b, _ in batches]
    t_shuf = _mk(spark, tdir, "d_shuffled")
    for b, df in shuffled:
        t_shuf = apply_batch(t_shuf, df, b, merge_strategy="delta")

    assert_tables_equal(t_shuf.read().toPandas(), t_ord.read().toPandas())


def test_double_apply_is_noop_delta(spark, tdir):
    log = gen_event_log(spark, n_events=600, n_docs=80, batch_size=200, partitions=4)
    t = _mk(spark, tdir, "d_noop")
    for b, df in _batches(log):
        t = apply_batch(t, df, b, merge_strategy="delta")
        sid = t.snapshot_id
        t = apply_batch(t, df, b, merge_strategy="delta")  # replay
        assert t.snapshot_id == sid
        # a replayed delta batch must not append a second delta entry
        assert len(t.manifest["deltas"]) == b + 1


def test_mixed_strategies_across_batches_converge(spark, tdir):
    """Switching merge strategies BETWEEN batches of one replay (delta →
    join → shuffle → delta …) must produce the same final state as any
    single strategy — the three paths share one logical contract, and a
    CoW merge over a delta'd table folds the deltas correctly."""
    log = gen_event_log(spark, n_events=1200, n_docs=120, batch_size=200, partitions=4)
    batches = _batches(log)

    t_ref = _mk(spark, tdir, "ref")
    for b, df in batches:
        t_ref = apply_batch(t_ref, df, b)

    cycle = ["delta", "join", "shuffle", "delta", "delta", "join"]
    t_mix = _mk(spark, tdir, "mix")
    for (b, df), strat in zip(batches, cycle):
        t_mix = apply_batch(t_mix, df, b, merge_strategy=strat)

    assert_tables_equal(t_mix.read().toPandas(), t_ref.read().toPandas())
