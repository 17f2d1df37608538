"""Streaming surface beyond the CDC merge: watermarked event-time windows
(late-data drop, exactly-once finalized emission) and the
applyInPandasWithState custom stateful LWW change feed."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_pipeline_spark.streaming import stateful_lww_changes, windowed_counts

EV_DDL = "ts timestamp, event_type string, value double"


def _write_batch(spark, path, rows, name):
    spark.createDataFrame(rows, EV_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_to_memory(spark, src_dir, build, sink_name, files_per_trigger=1,
                   schema=None):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)


def test_windowed_counts_drop_late_rows(spark, tdir):
    """Three micro-batches: batch 1 raises the watermark past the first
    windows, batch 2 finalizes them (merge-then-evict), batch 3 delivers
    a row into an already-evicted window — it must be dropped with NO
    duplicate emission, and finalized windows emit exactly once."""
    import datetime as dt
    import time

    def t(minute, second=0):
        return dt.datetime(2024, 1, 1, 0, minute, second)

    src = os.path.join(tdir, "ev")
    # batch 1: windows [0,5) and [5,10); max ts 00:12 → watermark 00:10
    _write_batch(
        spark, src,
        [
            (t(1), "click", 1.0),
            (t(2), "click", 2.0),
            (t(6), "click", 3.0),
            (t(12), "view", 1.0),
        ],
        "b1",
    )
    time.sleep(1.1)  # distinct mtimes → deterministic file→trigger order
    # batch 2: innocuous fresh row; end of this batch evicts [0,5) & [5,10)
    _write_batch(spark, src, [(t(13), "view", 1.0)], "b2")
    time.sleep(1.1)
    # batch 3: a click into the EVICTED [0,5) window → dropped
    _write_batch(spark, src, [(t(3), "click", 100.0)], "b3")

    schema = spark.read.parquet(src).schema
    out = _run_to_memory(
        spark, src,
        lambda s: windowed_counts(s, window="5 minutes", watermark="2 minutes"),
        "win_sink", schema=schema,
    ).collect()
    rows = [
        ((r["win_start"].minute, r["event_type"]), (r["n_events"], r["sum_value"]))
        for r in out
    ]
    got = dict(rows)
    assert len(rows) == len(got), "duplicate window emission"
    # [0,5) finalized from batch 1 only — the late 100.0 never re-emitted
    assert got[(0, "click")] == (2, 3.0)
    assert got[(5, "click")] == (1, 3.0)
    # windows past the final watermark never finalized → absent
    assert (10, "view") not in got


def test_sliding_windows_overlap_and_late_drop(spark, tdir):
    """Sliding semantics (the third member of the triple): every event
    lands in window/slide = 2 overlapping windows; finalized windows emit
    exactly once in append mode; rows landing in evicted windows drop."""
    import datetime as dt
    import time

    from data_pipeline_spark.streaming import sliding_counts

    def t(minute, second=0):
        return dt.datetime(2024, 1, 1, 0, minute, second)

    src = os.path.join(tdir, "slide")
    # clicks at 00:06/00:07 belong to windows [00:00,00:10) AND
    # [00:05,00:15); the 00:31 view raises the max event time
    _write_batch(
        spark, src,
        [(t(6), "click", 1.0), (t(7), "click", 2.0), (t(31), "view", 9.0)],
        "b1",
    )
    time.sleep(1.1)
    # innocuous batch: watermark (00:29, from batch 1's max ts) now
    # applies — both click windows finalize and evict at this batch's end
    _write_batch(spark, src, [(t(32), "view", 1.0)], "b2")
    time.sleep(1.1)
    # late click into the EVICTED [00:05, 00:15) window → dropped
    _write_batch(spark, src, [(t(8), "click", 100.0)], "b3")

    schema = spark.read.parquet(src).schema
    out = _run_to_memory(
        spark, src,
        lambda s: sliding_counts(
            s, window="10 minutes", slide="5 minutes", watermark="2 minutes"
        ),
        "slide_sink", schema=schema,
    ).collect()
    got = {
        (r["win_start"].minute, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out
        if r["event_type"] == "click"
    }
    # each click counted in BOTH overlapping windows, late 100.0 in neither
    assert got == {(0, "click"): (2, 3.0), (5, "click"): (2, 3.0)}
    # exactly-once: no duplicate emission of a finalized window
    assert len([r for r in out if r["event_type"] == "click"]) == 2


def test_stateful_lww_change_feed(spark, tdir):
    """applyInPandasWithState: emits a key only when its winner changes;
    stale and redelivered events are absorbed by state."""
    src = os.path.join(tdir, "cdc")
    ddl = "doc_id string, lsn long, op string, n_tok int"

    def w(rows, name):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode("append").parquet(src)

    import time

    # epoch 1: a@1 insert, b@2 insert
    w([("a", 1, "insert", 10), ("b", 2, "insert", 20)], "e1")
    time.sleep(1.1)  # distinct mtimes → deterministic file→trigger order
    # epoch 2: stale a@0 (no emit), b@3 update (emit), c@4 delete (emit)
    w([("a", 0, "update", 99), ("b", 3, "update", 21), ("c", 4, "delete", None)], "e2")

    schema = spark.read.parquet(src).schema
    out = _run_to_memory(
        spark, src, lambda s: stateful_lww_changes(s), "lww_sink", schema=schema
    ).collect()
    rows = {(r["doc_id"], r["lsn"]): (r["op"], r["n_tok"]) for r in out}
    assert ("a", 1) in rows and rows[("a", 1)] == ("insert", 10)
    assert ("b", 3) in rows and rows[("b", 3)] == ("update", 21)
    assert ("c", 4) in rows and rows[("c", 4)][0] == "delete"
    # the stale a@0 must NOT have emitted
    assert not any(k[0] == "a" and k[1] == 0 for k in rows)
    # b emitted at most twice (once per epoch where it changed)
    assert sum(1 for k in rows if k[0] == "b") <= 2


def test_session_windows_merge_and_finalize(spark, tdir):
    """Session semantics: events within the gap chain into ONE session
    whose extent is data-driven; a separate burst becomes its own session;
    append mode emits each finalized session exactly once."""
    import datetime as dt
    import time

    from data_pipeline_spark.streaming import session_windows

    def t(minute, second=0):
        return dt.datetime(2024, 1, 1, 0, minute, second)

    src = os.path.join(tdir, "sess")
    # burst 1: clicks at 00:00, 00:02, 00:04 (gaps < 5m → one session
    # [00:00, 00:09)); burst 2: click at 00:20 (own session [00:20, 00:25))
    _write_batch(
        spark, src,
        [
            (t(0), "click", 1.0),
            (t(2), "click", 2.0),
            (t(4), "click", 3.0),
            (t(20), "click", 4.0),
        ],
        "b1",
    )
    time.sleep(1.1)
    # batch 2: a view far ahead pushes the watermark past both sessions
    _write_batch(spark, src, [(t(40), "view", 1.0)], "b2")

    schema = spark.read.parquet(src).schema
    out = _run_to_memory(
        spark, src,
        lambda s: session_windows(s, gap="5 minutes", watermark="2 minutes"),
        "sess_sink", schema=schema,
    ).collect()
    got = {
        (r["session_start"].minute, r["event_type"]): (
            r["session_end"].minute,
            r["n_events"],
            r["sum_value"],
        )
        for r in out
        if r["event_type"] == "click"
    }
    # exactly the two finalized click sessions, extents data-driven
    assert got == {(0, "click"): (9, 3, 6.0), (20, "click"): (25, 1, 4.0)}
    assert sum(1 for r in out if r["event_type"] == "click") == 2
