"""Watermarked stream-stream join: tolerance-window matching, multi-
version emission, left-outer null emission after watermark, and
bounded-state semantics (too-old dims never match)."""

from __future__ import annotations

import datetime as dt
import os
import time

from data_pipeline_spark.streaming import stream_stream_enrich

FACT_DDL = "ts timestamp, doc_id string, v double"
DIM_DDL = "dim_ts timestamp, doc_id string, attr string"


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _write(spark, path, rows, ddl):
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, fdir, ddir, sink, how="inner"):
    fs = (
        spark.readStream.schema(FACT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(fdir)
    )
    ds = (
        spark.readStream.schema(DIM_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(ddir)
    )
    q = (
        stream_stream_enrich(fs, ds, tolerance="10 minutes",
                             watermark="5 minutes", how=how)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).collect()


def test_inner_tolerance_window_and_multiversion(spark, tdir):
    fdir, ddir = os.path.join(tdir, "f"), os.path.join(tdir, "d")
    _write(spark, fdir, [
        (_t(20), "a", 1.0),   # dims at 12 and 15 both in [10, 20]
        (_t(20), "b", 2.0),   # dim at 5 is OLDER than tolerance -> none
        (_t(20), "c", 3.0),   # dim at 21 is in the FUTURE -> none
    ], FACT_DDL)
    _write(spark, ddir, [
        (_t(12), "a", "a-v1"),
        (_t(15), "a", "a-v2"),
        (_t(5), "b", "b-old"),
        (_t(21), "c", "c-future"),
    ], DIM_DDL)
    got = sorted(
        (r["doc_id"], r["attr"]) for r in _run(spark, fdir, ddir, "ssj1")
    )
    # every dim version inside the window emits (0..n contract)
    assert got == [("a", "a-v1"), ("a", "a-v2")]


def test_left_outer_emits_unmatched_after_watermark(spark, tdir):
    fdir, ddir = os.path.join(tdir, "f"), os.path.join(tdir, "d")
    _write(spark, fdir, [(_t(5), "a", 1.0), (_t(5), "x", 9.0)], FACT_DDL)
    _write(spark, ddir, [(_t(3), "a", "a-v1")], DIM_DDL)
    time.sleep(1.1)
    # raise both watermarks far past 00:05 + tolerance so the unmatched
    # fact 'x' is provably final and its null row can emit
    _write(spark, fdir, [(_t(40), "w", 0.0)], FACT_DDL)
    _write(spark, ddir, [(_t(40), "w", "warm")], DIM_DDL)
    time.sleep(1.1)
    _write(spark, fdir, [(_t(55), "w2", 0.0)], FACT_DDL)
    _write(spark, ddir, [(_t(55), "w2", "warm2")], DIM_DDL)
    rows = _run(spark, fdir, ddir, "ssj2", how="leftOuter")
    by_key = {}
    for r in rows:
        by_key.setdefault(r["doc_id"], []).append(r["attr"])
    assert by_key["a"] == ["a-v1"]
    assert by_key["x"] == [None]  # emitted exactly once, null dim side
