"""Incremental materialized-view maintenance (MaterializedAggregate):
the view refreshed from the change feed after every batch must equal a
from-scratch group-by over the source's final state — including under
deletes (retraction), group-moving updates, groups dropping to zero,
and crash-redelivery at the apply/ack boundary."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_pipeline_spark.cdc import apply_batch
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox import IceboxTable
from data_pipeline_spark.materialize import MaterializedAggregate

from .oracle import replay_oracle
from .test_cdc_apply import BASE_SCHEMA, PAYLOAD


def _oracle_view(log_pdf, upto_batch):
    """From-scratch {source: (n_rows, sum_n_tok)} after batches <= b."""
    st = replay_oracle(log_pdf[log_pdf["batch_id"] <= upto_batch], PAYLOAD)
    if len(st) == 0:
        return {}
    g = st.groupby("source")["n_tok"].agg(["count", "sum"])
    return {k: (int(r["count"]), int(r["sum"])) for k, r in g.iterrows()}


def _got_view(mv):
    return {
        r["source"]: (r["n_rows"], r["sum_n_tok"]) for r in mv.read().collect()
    }


def _setup(spark, tdir, n_events=4000, n_docs=400, batch_size=1000):
    log = gen_event_log(
        spark, n_events, n_docs, batch_size=batch_size, hot_frac=0.2,
        delete_frac=0.15,
    )
    log_pdf = log.toPandas()
    t = IceboxTable.create(
        spark, os.path.join(tdir, "src"), BASE_SCHEMA, n_buckets=8
    )
    mv = MaterializedAggregate(
        spark, t, os.path.join(tdir, "mv"), group_col="source",
        sum_cols=["n_tok"], name="by_source",
    )
    return log, log_pdf, t, mv


def _batches(log):
    return sorted(r["batch_id"] for r in log.select("batch_id").distinct().collect())


def test_refresh_per_batch_equals_recompute(spark, tdir):
    log, log_pdf, t, mv = _setup(spark, tdir)
    for b in _batches(log):
        t = apply_batch(t, log.filter(F.col("batch_id") == b), b)
        mv.source = t
        mv.refresh()
        assert _got_view(mv) == _oracle_view(log_pdf, b)


def test_refresh_batched_intervals_equals_recompute(spark, tdir):
    """One refresh spanning several source commits (wide interval) must
    land on the same state as per-batch refreshes."""
    log, log_pdf, t, mv = _setup(spark, tdir)
    bs = _batches(log)
    for b in bs:
        t = apply_batch(t, log.filter(F.col("batch_id") == b), b)
    mv.source = t
    mv.refresh()
    assert _got_view(mv) == _oracle_view(log_pdf, bs[-1])


def test_group_drops_to_zero_is_deleted(spark, tdir):
    src_schema = BASE_SCHEMA
    t = IceboxTable.create(spark, os.path.join(tdir, "src"), src_schema, n_buckets=4)
    ev = spark.createDataFrame(
        [
            (1, "insert", "d1", [1, 2], 2, "only"),
            (2, "insert", "d2", [3], 1, "keep"),
        ],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t = apply_batch(t, ev, 0)
    mv = MaterializedAggregate(
        spark, t, os.path.join(tdir, "mv"), "source", ["n_tok"]
    )
    mv.refresh()
    assert _got_view(mv) == {"only": (1, 2), "keep": (1, 1)}
    ev2 = spark.createDataFrame(
        [(3, "delete", "d1", None, None, None)],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t = apply_batch(t, ev2, 1)
    mv.source = t
    mv.refresh()
    # 'only' lost its single member: the view row must be GONE, not zero
    assert _got_view(mv) == {"keep": (1, 1)}


def test_group_moving_update_retracts_and_adds(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "src"), BASE_SCHEMA, n_buckets=4)
    ev = spark.createDataFrame(
        [
            (1, "insert", "d1", [1], 1, "a"),
            (2, "insert", "d2", [1, 2, 3], 3, "a"),
        ],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t = apply_batch(t, ev, 0)
    mv = MaterializedAggregate(
        spark, t, os.path.join(tdir, "mv"), "source", ["n_tok"]
    )
    mv.refresh()
    assert _got_view(mv) == {"a": (2, 4)}
    # d2 moves from group a to group b and changes n_tok 3 -> 5
    ev2 = spark.createDataFrame(
        [(3, "update", "d2", [1] * 5, 5, "b")],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t = apply_batch(t, ev2, 1)
    mv.source = t
    mv.refresh()
    assert _got_view(mv) == {"a": (1, 1), "b": (1, 5)}


def test_crash_between_apply_and_ack_is_exactly_once(spark, tdir):
    """Simulate the crash window: the view's delta-apply committed but
    the cursor ack never happened, AND the source advanced before the
    consumer came back. A naive consumer would re-count the applied
    prefix inside the wider redelivered interval; recovery must not."""
    log, log_pdf, t, mv = _setup(spark, tdir)
    bs = _batches(log)
    t = apply_batch(t, log.filter(F.col("batch_id") == bs[0]), bs[0])
    mv.source = t

    # refresh with the ack suppressed = crash right after the commit
    real_ack = mv.cursor.ack
    mv.cursor.ack = lambda sid: None
    mv.refresh()
    mv.cursor.ack = real_ack
    assert mv.cursor.position == 0  # cursor never moved
    assert _got_view(mv) == _oracle_view(log_pdf, bs[0])  # but data landed

    # source advances while the consumer is down
    for b in bs[1:]:
        t = apply_batch(t, log.filter(F.col("batch_id") == b), b)

    # restart: fresh consumer objects over the same dirs
    mv2 = MaterializedAggregate(
        spark, t, os.path.join(tdir, "mv"), "source", ["n_tok"], name="by_source"
    )
    mv2.refresh()
    assert _got_view(mv2) == _oracle_view(log_pdf, bs[-1])


def test_redelivered_same_interval_is_noop_commit(spark, tdir):
    """Crash after apply, NO source advance: the redelivered interval's
    tag is already committed, so the view snapshot must not move."""
    log, log_pdf, t, mv = _setup(spark, tdir, n_events=1000, batch_size=1000)
    b0 = _batches(log)[0]
    t = apply_batch(t, log.filter(F.col("batch_id") == b0), b0)
    mv.source = t
    real_ack = mv.cursor.ack
    mv.cursor.ack = lambda sid: None
    mv.refresh()
    mv.cursor.ack = real_ack
    sid_after = mv.view.snapshot_id
    mv2 = MaterializedAggregate(
        spark, t, os.path.join(tdir, "mv"), "source", ["n_tok"], name="by_source"
    )
    mv2.refresh()
    assert mv2.view.snapshot_id == sid_after  # tag no-op, nothing recommitted
    assert _got_view(mv2) == _oracle_view(log_pdf, b0)


def test_refresh_does_not_reread_source_table(spark, tdir):
    """The refresh plan reads the source's change feed (interval delta
    files / touched buckets), never the source's full state: after a
    small second batch, the poll's input files must be a strict subset
    of the source's full file set."""
    log, log_pdf, t, mv = _setup(spark, tdir)
    bs = _batches(log)
    t = apply_batch(t, log.filter(F.col("batch_id") == bs[0]), bs[0])
    mv.source = t
    mv.refresh()
    # tiny delta batch (3 events) applied MoR so the interval is delta-backed
    ev2 = spark.createDataFrame(
        [
            (10_000_000, "update", "doc_%08d" % 1, [9], 1, "web"),
            (10_000_001, "update", "doc_%08d" % 2, [9, 9], 2, "web"),
            (10_000_002, "delete", "doc_%08d" % 3, None, None, None),
        ],
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t = apply_batch(t, ev2, 999, merge_strategy="delta")
    mv.source = t
    chg, _ = mv.cursor.poll()
    n_chg_files = len(chg.inputFiles())
    n_full_files = len(t.read().inputFiles())
    assert 0 < n_chg_files < n_full_files
    mv.refresh()
    assert _got_view(mv) == _patch(log_pdf, bs[0])


def _patch(log_pdf, b0):
    """Expected view rows for the groups the 3-event patch touches."""
    st = replay_oracle(log_pdf[log_pdf["batch_id"] <= b0], PAYLOAD)
    state = {r["doc_id"]: dict(r) for _, r in st.iterrows()}
    state["doc_%08d" % 1] = {"source": "web", "n_tok": 1}
    state["doc_%08d" % 2] = {"source": "web", "n_tok": 2}
    state.pop("doc_%08d" % 3, None)
    out: dict[str, tuple[int, int]] = {}
    for d in state.values():
        n, s = out.get(d["source"], (0, 0))
        out[d["source"]] = (n + 1, s + int(d["n_tok"]))
    return out


def test_float_sum_cols_rejected(spark, tdir):
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    sch = StructType(
        [StructField("doc_id", StringType()), StructField("v", DoubleType())]
    )
    t = IceboxTable.create(spark, os.path.join(tdir, "src"), sch, n_buckets=2)
    try:
        MaterializedAggregate(spark, t, os.path.join(tdir, "mv"), "doc_id", ["v"])
    except ValueError as e:
        assert "integral" in str(e)
    else:
        raise AssertionError("float sum col must be rejected")


def test_streaming_mv_refresh_per_epoch(spark, tdir):
    """run_stream(materialized_views=[mv]): the view folded forward per
    epoch equals a from-scratch group-by after the stream drains, and a
    checkpoint-replayed restart moves neither the table nor the view."""
    from data_pipeline_spark.cdc.stream import run_stream

    from .test_checkpoint_resume import EV_SCHEMA

    events_dir = os.path.join(tdir, "events")
    log = gen_event_log(
        spark, n_events=3000, n_docs=300, batch_size=600, partitions=4,
        hot_frac=0.1, delete_frac=0.15,
    )
    log_pdf = log.toPandas()
    log.write.partitionBy("batch_id").parquet(events_dir)

    root = os.path.join(tdir, "t")
    t = IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=8)
    mv = MaterializedAggregate(
        spark, t, os.path.join(tdir, "mv"), "source", ["n_tok"]
    )
    run_stream(
        spark, events_dir, EV_SCHEMA, root, os.path.join(tdir, "ck"),
        query_name="mvstream", max_files_per_trigger=3,
        materialized_views=[mv],
    )
    last_b = int(log_pdf["batch_id"].max())
    assert _got_view(mv) == _oracle_view(log_pdf, last_b)
    view_sid = mv.view.snapshot_id

    # replay from the same checkpoint: every epoch tag already committed
    run_stream(
        spark, events_dir, EV_SCHEMA, root, os.path.join(tdir, "ck"),
        query_name="mvstream", max_files_per_trigger=3,
        materialized_views=[mv],
    )
    assert mv.view.snapshot_id == view_sid
    assert _got_view(mv) == _oracle_view(log_pdf, last_b)


def test_null_group_rows_are_excluded_not_wedging(spark, tdir):
    """A NULL group value (e.g. schema evolution backfilling NULL for
    pre-evolution rows) must not wedge the refresh loop: the NULL-group
    delta would be a null-key event apply_batch refuses, poisoning the
    interval forever. NULL groups are excluded from the view instead."""
    t = IceboxTable.create(
        spark, os.path.join(tdir, "src"), BASE_SCHEMA, n_buckets=4
    )
    ev = spark.createDataFrame(
        [
            (1, 0, "insert", "a", [1, 2], 2, "s1"),
            (2, 0, "insert", "b", [3], 1, None),  # NULL group
            (3, 0, "insert", "c", [4], 1, "s2"),
        ],
        "lsn long, batch_id int, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string",
    )
    t = apply_batch(t, ev, batch_id=0)
    mv = MaterializedAggregate(
        spark, t, os.path.join(tdir, "mv"), group_col="source",
        sum_cols=["n_tok"], name="by_source",
    )
    mv.source = t
    mv.refresh()  # must not raise
    got = _got_view(mv)
    assert got == {"s1": (1, 2), "s2": (1, 1)}
    # the cursor advanced past the interval (not wedged): a second
    # refresh is a clean no-op
    sid = mv.view.snapshot_id
    mv.refresh()
    assert mv.view.snapshot_id == sid
    # and a later batch folds in normally
    ev2 = spark.createDataFrame(
        [(4, 1, "insert", "d", [5, 6], 2, "s1")],
        "lsn long, batch_id int, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string",
    )
    t2 = apply_batch(IceboxTable.load(spark, os.path.join(tdir, "src")), ev2,
                     batch_id=1)
    mv.source = t2
    mv.cursor.table = t2
    mv.refresh()
    assert _got_view(mv)["s1"] == (2, 4)
