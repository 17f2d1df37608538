"""Streaming spine with the partial-update / aggregation merge engines:
LSN-ordered one-file-per-batch delivery (the real-binlog transport
contract those engines document), checkpoint-restart idempotence, and
final state vs the sequential Python oracles."""

from __future__ import annotations

import os
import shutil

from data_pipeline_spark.cdc.stream import run_stream
from data_pipeline_spark.icebox import IceboxTable

from .test_agg_merge import SPECS, agg_oracle
from .test_cdc_apply import BASE_SCHEMA
from .test_checkpoint_resume import EV_SCHEMA
from .test_partial_update import (
    EV_DDL,
    _engine_state,
    _mk_events,
    partial_oracle,
)


def _write_ordered_batches(spark, tdir, ev):
    """One flat parquet file per batch, mtimes strictly ascending in
    batch order, so the file source delivers epochs in LSN order (its
    documented pick order: file timestamp, then path)."""
    events_dir = os.path.join(tdir, "events")
    os.makedirs(events_dir)
    batches = sorted({e[1] for e in ev})
    for i, b in enumerate(batches):
        rows = [e for e in ev if e[1] == b]
        stage = os.path.join(tdir, f"stage_{b}")
        spark.createDataFrame(rows, EV_DDL).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(events_dir, f"b{b:04d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return events_dir


def _run(spark, tdir, events_dir, mode, name, **kw):
    root = os.path.join(tdir, f"tbl_{name}")
    ckpt = os.path.join(tdir, f"ck_{name}")
    IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=8)
    run_stream(
        spark, events_dir, EV_SCHEMA, root, ckpt,
        query_name=name, max_files_per_trigger=1, merge_strategy="delta",
        merge_mode=mode, **kw,
    )
    return root, ckpt


def test_stream_partial_mode_matches_oracle_and_restart(spark, tdir):
    ev = _mk_events(n_keys=30, n_batches=4, per_batch=50)
    events_dir = _write_ordered_batches(spark, tdir, ev)
    root, ckpt = _run(spark, tdir, events_dir, "partial", "p")
    t = IceboxTable.load(spark, root)
    assert _engine_state(t) == partial_oracle(ev)
    # restart with the same checkpoint: every epoch replays as a tag
    # no-op — snapshot id unchanged
    sid = t.snapshot_id
    run_stream(
        spark, events_dir, EV_SCHEMA, root, ckpt,
        query_name="p", max_files_per_trigger=1, merge_strategy="delta",
        merge_mode="partial",
    )
    assert IceboxTable.load(spark, root).snapshot_id == sid


def test_stream_aggregate_mode_matches_oracle(spark, tdir):
    ev = _mk_events(n_keys=30, n_batches=4, per_batch=50)
    events_dir = _write_ordered_batches(spark, tdir, ev)
    root, _ = _run(spark, tdir, events_dir, "aggregate", "a", agg_specs=SPECS)
    t = IceboxTable.load(spark, root)
    assert _engine_state(t) == agg_oracle(ev, SPECS)
    # a restarted FRESH checkpoint replays tags already committed → the
    # sums must not double-count (exactly-once across checkpoint loss is
    # the tag layer's job)
    run_stream(
        spark, events_dir, EV_SCHEMA, root, os.path.join(tdir, "ck_a2"),
        query_name="a", max_files_per_trigger=1, merge_strategy="delta",
        merge_mode="aggregate", agg_specs=SPECS,
    )
    assert _engine_state(IceboxTable.load(spark, root)) == agg_oracle(ev, SPECS)


def test_stream_mode_validation(spark, tdir):
    import pytest

    with pytest.raises(ValueError, match="unknown merge_mode"):
        run_stream(spark, tdir, EV_SCHEMA, tdir, tdir, merge_mode="nope")
    with pytest.raises(ValueError, match="requires agg_specs"):
        run_stream(spark, tdir, EV_SCHEMA, tdir, tdir, merge_mode="aggregate")
