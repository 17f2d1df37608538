"""Watermarked event-time windowed aggregation (SURVEY §2.9).

The CDC path (cdc/stream.py) is LSN-ordered and needs no event-time
watermarks — its lateness story is the LWW merge itself. This module is
the general event-time surface for the analytics side of the pipeline:
tumbling-window counts over a keyed event stream with bounded-lateness
semantics (too-late rows are dropped once the watermark passes, finalized
windows emit exactly once in append mode).

The reference has no streaming at all (its closest analog is per-state
batch jobs with minute-granularity logging, grid-and-attrs/app.js:180);
this is the Spark-native upgrade path for those periodic counters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "2 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window per-key counts (and value sums) with a watermark.

    Append-mode contract: a (window, key) row is emitted exactly once, at
    the end of the micro-batch in which the watermark passes the window
    end (merge happens before eviction, so a late row landing in that
    same batch still counts); once a window's state is evicted, later
    rows for it are DROPPED — no duplicate emission, ever. State is
    bounded: Spark evicts finalized windows.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            *[F.col(c) for c in (["n_events", "sum_value"] if value_col else ["n_events"])],
        )
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "2 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """SLIDING-window per-key counts (and value sums) with a watermark —
    the overlapping-window member of the tumbling/sliding/session triple:
    each event lands in window/slide windows (2 for the defaults), so
    downstream consumers get a smoothed rolling aggregate instead of
    tumbling's hard bucket edges. Same append-mode exactly-once contract
    as windowed_counts: a (window, key) row emits once when the
    watermark passes the window end; later rows for evicted windows are
    dropped. State is bounded at (window/slide) × live keys."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            *[
                F.col(c)
                for c in (["n_events", "sum_value"] if value_col else ["n_events"])
            ],
        )
    )


def session_windows(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    gap: str = "5 minutes",
    watermark: str = "2 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-key SESSION windows: a session is a run of events for one key
    where consecutive gaps stay under `gap`; the window extent is data-
    driven ([first_ts, last_ts + gap)), unlike tumbling windows' fixed
    grid. Sessions merge when late rows bridge two open sessions — Spark's
    session_window state handles the merge; append mode emits each
    finalized session exactly once after the watermark passes its end.

    This is the natural upgrade of the reference's per-state periodic
    counters (grid-and-attrs/app.js:171-177) to activity-burst analytics
    (user sessions over a clickstream, doc-ingest bursts per source).
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            *[
                F.col(c)
                for c in (["n_events", "sum_value"] if value_col else ["n_events"])
            ],
        )
    )
