"""Aggregation merge engine: engine replay vs an independent sequential
Python oracle — per-column fold specs (sum/count/max/min/last/first),
delete-resets-accumulators, exactly-once tags, stale-batch guard, and
composition with compaction and the change feed."""

from __future__ import annotations

import os

import pytest

from data_pipeline_spark.cdc import replay_log_partial
from data_pipeline_spark.cdc.aggregate import (
    apply_batch_agg,
    fold_agg_batch,
    replay_log_agg,
)
from data_pipeline_spark.icebox import IceboxTable

from .test_cdc_apply import BASE_SCHEMA
from .test_partial_update import EV_DDL, _engine_state, _mk_events

SPECS = {"tokens": "last", "n_tok": "sum", "source": "max"}


def agg_oracle(events: list[tuple], specs: dict[str, str]) -> dict[str, dict]:
    """Sequential per-event fold in plain Python — the semantics spec."""
    state: dict[str, dict] = {}
    for lsn, _b, op, k, tokens, n_tok, source in sorted(events):
        if op == "delete":
            state.pop(k, None)
            continue
        row = state.setdefault(k, {"tokens": None, "n_tok": None, "source": None})
        for col, val in (("tokens", tokens), ("n_tok", n_tok), ("source", source)):
            if val is None:
                continue
            val = list(val) if col == "tokens" else val
            old = row[col]
            s = specs.get(col, "last")
            if s == "last" or old is None:
                row[col] = 1 if s == "count" else val
            elif s == "sum":
                row[col] = old + val
            elif s == "count":
                row[col] = old + 1
            elif s == "max":
                row[col] = max(old, val)
            elif s == "min":
                row[col] = min(old, val)
            # first: keep old
    return state


@pytest.mark.parametrize("strategy", ["delta", "shuffle"])
def test_agg_replay_matches_oracle(spark, tdir, strategy):
    ev = _mk_events()
    log = spark.createDataFrame(ev, EV_DDL)
    t = IceboxTable.create(
        spark, os.path.join(tdir, strategy), BASE_SCHEMA, n_buckets=8
    )
    t = replay_log_agg(t, log, SPECS, merge_strategy=strategy)
    assert _engine_state(t) == agg_oracle(ev, SPECS)


def test_all_last_specs_equal_partial_engine(spark, tdir):
    """specs = all-"last" degrades the aggregation engine to exactly the
    partial-update engine."""
    ev = _mk_events(n_keys=25, n_batches=3, per_batch=50)
    log = spark.createDataFrame(ev, EV_DDL)
    last = {"tokens": "last", "n_tok": "last", "source": "last"}
    ta = replay_log_agg(
        IceboxTable.create(spark, os.path.join(tdir, "a"), BASE_SCHEMA, n_buckets=4),
        log, last,
    )
    tp = replay_log_partial(
        IceboxTable.create(spark, os.path.join(tdir, "p"), BASE_SCHEMA, n_buckets=4),
        log,
    )
    assert _engine_state(ta) == _engine_state(tp)


def test_sum_count_min_first_specs(spark, tdir):
    """Every spec exercised on one key: n_tok sums, source keeps the
    FIRST value, tokens keeps the last."""
    specs = {"tokens": "last", "n_tok": "sum", "source": "first"}
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    b0 = spark.createDataFrame(
        [(1, 0, "insert", "k", [1], 5, "alpha"),
         (2, 0, "upsert", "k", [2, 2], 10, "zeta")], EV_DDL
    )
    t = apply_batch_agg(t, b0, 0, specs)
    got = _engine_state(t)["k"]
    assert got == {"tokens": [2, 2], "n_tok": 15, "source": "alpha"}
    # cross-batch accumulation: sum keeps growing, first stays pinned
    b1 = spark.createDataFrame([(3, 1, "upsert", "k", None, 7, "beta")], EV_DDL)
    t = apply_batch_agg(t, b1, 1, specs)
    got = _engine_state(t)["k"]
    assert got == {"tokens": [2, 2], "n_tok": 22, "source": "alpha"}


def test_delete_resets_accumulators(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    t = apply_batch_agg(
        t,
        spark.createDataFrame([(1, 0, "insert", "k", [1], 100, "a")], EV_DDL),
        0, SPECS,
    )
    # cross-batch: delete then re-insert — the sum restarts from scratch
    b1 = spark.createDataFrame(
        [(2, 1, "delete", "k", None, None, None),
         (3, 1, "upsert", "k", None, 5, None)], EV_DDL
    )
    t = apply_batch_agg(t, b1, 1, SPECS)
    assert _engine_state(t)["k"] == {"tokens": None, "n_tok": 5, "source": None}
    # intra-batch: contributions before the delete never count
    b2 = spark.createDataFrame(
        [(4, 2, "upsert", "j", None, 50, None),
         (5, 2, "delete", "j", None, None, None),
         (6, 2, "upsert", "j", None, 3, "s")], EV_DDL
    )
    t = apply_batch_agg(t, b2, 2, SPECS)
    assert _engine_state(t)["j"] == {"tokens": None, "n_tok": 3, "source": "s"}


def test_agg_exactly_once_and_stale_guard(spark, tdir):
    """A replayed tag must not double-count a sum; a wholly-stale batch
    must not fold into a newer accumulator."""
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    b0 = spark.createDataFrame([(10, 0, "insert", "k", [1], 4, "a")], EV_DDL)
    b1 = spark.createDataFrame([(20, 1, "upsert", "k", None, 6, None)], EV_DDL)
    t = apply_batch_agg(t, b0, 0, SPECS)
    t = apply_batch_agg(t, b1, 1, SPECS)
    want = {"k": {"tokens": [1], "n_tok": 10, "source": "a"}}
    assert _engine_state(t) == want
    sid = t.snapshot_id
    t = apply_batch_agg(t, b1, 1, SPECS)  # tag replay: bit-level no-op
    assert t.snapshot_id == sid and _engine_state(t) == want
    stale = spark.createDataFrame([(5, 2, "upsert", "k", None, 99, None)], EV_DDL)
    t = apply_batch_agg(t, stale, 2, SPECS)
    assert _engine_state(t) == want


def test_agg_with_compaction_and_changes(spark, tdir):
    ev = _mk_events(n_keys=30, n_batches=3, per_batch=40)
    log = spark.createDataFrame(ev, EV_DDL)
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=8)
    t = replay_log_agg(t, log, SPECS)
    oracle = agg_oracle(ev, SPECS)
    t = t.compact_if_needed(ratio=0.0)
    assert _engine_state(t) == oracle
    # the change feed sees full accumulator states as post-images
    k = next(k for k, v in oracle.items() if v["n_tok"] is not None)
    s0 = t.snapshot_id
    t = apply_batch_agg(
        t,
        spark.createDataFrame([(10_000, 99, "upsert", k, None, 1, None)], EV_DDL),
        99, SPECS,
    )
    chg = {r["_change_type"]: r for r in t.changes(s0).collect()}
    assert chg["update_post"]["n_tok"] == oracle[k]["n_tok"] + 1


def test_unknown_spec_rejected(spark):
    ev = spark.createDataFrame([(1, 0, "insert", "k", [1], 1, "s")], EV_DDL)
    with pytest.raises(ValueError, match="unknown agg specs"):
        fold_agg_batch(ev, "doc_id", ["n_tok"], {"n_tok": "avg"})
