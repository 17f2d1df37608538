"""Partial-update (column-level LWW) merge: engine replay vs an
independent pandas oracle, per-row token-array equality — sparse events
must update only the columns they set, deletes must not leak prior
values into a resurrection, and the merge must compose with MoR deltas,
compaction, schema evolution, exactly-once tags, and OCC retry."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from data_pipeline_spark.cdc import apply_batch, replay_log
from data_pipeline_spark.cdc.partial import (
    apply_batch_partial,
    fold_partial_updates,
    replay_log_partial,
)
from data_pipeline_spark.icebox import IceboxTable

from .test_cdc_apply import BASE_SCHEMA, PAYLOAD

EV_DDL = (
    "lsn long, batch_id int, op string, doc_id string, "
    "tokens array<int>, n_tok int, source string"
)


def partial_oracle(events: list[tuple]) -> dict[str, dict]:
    """Sequential per-event fold in plain Python — the semantics spec.

    events: (lsn, batch_id, op, doc_id, tokens, n_tok, source), applied
    in lsn order. Null payload column = unchanged; delete kills the row
    and everything before it."""
    state: dict[str, dict] = {}
    for lsn, _b, op, k, tokens, n_tok, source in sorted(events):
        if op == "delete":
            state.pop(k, None)
            continue
        row = state.setdefault(k, {"tokens": None, "n_tok": None, "source": None})
        if tokens is not None:
            row["tokens"] = list(tokens)
        if n_tok is not None:
            row["n_tok"] = n_tok
        if source is not None:
            row["source"] = source
    return state


def _engine_state(t: IceboxTable) -> dict[str, dict]:
    return {
        r["doc_id"]: {
            "tokens": list(r["tokens"]) if r["tokens"] is not None else None,
            "n_tok": r["n_tok"],
            "source": r["source"],
        }
        for r in t.read().collect()
    }


def _mk_events(n_keys=40, n_batches=4, per_batch=60):
    """Deterministic sparse feed: every (lsn) unique, ~1/6 deletes,
    each update sets a pseudo-random SUBSET of columns."""
    ev = []
    lsn = 0
    for b in range(n_batches):
        for i in range(per_batch):
            lsn += 1
            k = f"d{(lsn * 7919) % n_keys}"
            r = (lsn * 2654435761) % 24
            if r == 0:
                ev.append((lsn, b, "delete", k, None, None, None))
                continue
            tokens = [lsn % 97, (lsn + 1) % 97] if r % 2 == 0 else None
            n_tok = lsn % 50 if r % 3 == 0 else None
            source = f"s{r % 4}" if r % 5 == 0 else None
            if tokens is None and n_tok is None and source is None:
                tokens = [r]
            op = "insert" if r % 7 == 0 else "upsert"
            ev.append((lsn, b, op, k, tokens, n_tok, source))
    return ev


@pytest.mark.parametrize("strategy", ["delta", "shuffle"])
def test_partial_replay_matches_oracle(spark, tdir, strategy):
    ev = _mk_events()
    log = spark.createDataFrame(ev, EV_DDL)
    t = IceboxTable.create(
        spark, os.path.join(tdir, strategy), BASE_SCHEMA, n_buckets=8
    )
    t = replay_log_partial(t, log, merge_strategy=strategy)
    assert _engine_state(t) == partial_oracle(ev)


def test_partial_equals_row_lww_on_full_rows(spark, tdir):
    """When every event carries a FULL row, column-level and row-level
    LWW agree — partial mode degrades to exactly apply_batch."""
    ev = [
        (lsn, lsn // 50, "upsert", f"d{(lsn * 13) % 20}",
         [lsn % 9, lsn % 7], lsn % 40, f"s{lsn % 3}")
        for lsn in range(1, 151)
    ]
    log = spark.createDataFrame(ev, EV_DDL)
    tp = replay_log_partial(
        IceboxTable.create(spark, os.path.join(tdir, "p"), BASE_SCHEMA, n_buckets=4),
        log,
    )
    tr = replay_log(
        IceboxTable.create(spark, os.path.join(tdir, "r"), BASE_SCHEMA, n_buckets=4),
        log,
        merge_strategy="delta",
    )
    left = tp.read().select(*PAYLOAD).orderBy("doc_id").toPandas()
    right = tr.read().select(*PAYLOAD).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(
        left.map(lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, str) else v),
        right.map(lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, str) else v),
    )


def test_delete_does_not_leak_into_resurrection(spark, tdir):
    """delete then a later sparse update — only the columns the update
    sets exist afterwards; pre-delete values are gone. Covers the
    intra-batch case (delete+set in ONE batch) and the cross-batch one."""
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    b0 = spark.createDataFrame(
        [(1, 0, "insert", "k", [1, 2], 2, "orig"),
         (2, 0, "insert", "j", [9], 1, "orig")], EV_DDL
    )
    t = apply_batch_partial(t, b0, 0)
    # cross-batch: delete k in batch 1, resurrect with only source set
    b1 = spark.createDataFrame(
        [(3, 1, "delete", "k", None, None, None),
         (4, 1, "upsert", "k", None, None, "resur"),
         # intra-batch on j: delete and resurrect inside the same batch
         (5, 1, "delete", "j", None, None, None),
         (6, 1, "upsert", "j", None, 7, None)], EV_DDL
    )
    t = apply_batch_partial(t, b1, 1)
    got = _engine_state(t)
    assert got["k"] == {"tokens": None, "n_tok": None, "source": "resur"}
    assert got["j"] == {"tokens": None, "n_tok": 7, "source": None}


def test_unset_columns_survive_many_sparse_updates(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    t = apply_batch_partial(
        t,
        spark.createDataFrame([(1, 0, "insert", "k", [5, 5], 2, "s0")], EV_DDL),
        0,
    )
    for i in range(1, 4):  # three sparse updates, each touching ONE column
        col_val = [(None, i * 10, None), ([i], None, None), (None, None, f"s{i}")][i - 1]
        t = apply_batch_partial(
            t,
            spark.createDataFrame([(10 + i, i, "upsert", "k", *col_val)], EV_DDL),
            i,
        )
    assert _engine_state(t)["k"] == {"tokens": [2], "n_tok": 10, "source": "s3"}


def test_partial_exactly_once_and_stale_guard(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    b0 = spark.createDataFrame([(10, 0, "insert", "k", [1], 1, "a")], EV_DDL)
    b1 = spark.createDataFrame([(20, 1, "upsert", "k", None, 9, None)], EV_DDL)
    t = apply_batch_partial(t, b0, 0)
    t = apply_batch_partial(t, b1, 1)
    want = {"k": {"tokens": [1], "n_tok": 9, "source": "a"}}
    assert _engine_state(t) == want
    # replay of an already-committed tag: bit-level no-op
    sid = t.snapshot_id
    t = apply_batch_partial(t, b1, 1)
    assert t.snapshot_id == sid
    # an entirely-stale batch (new tag, old lsn) must not clobber
    stale = spark.createDataFrame([(5, 2, "upsert", "k", [9, 9], None, None)], EV_DDL)
    t = apply_batch_partial(t, stale, 2)
    assert _engine_state(t) == want


def test_partial_with_compaction_and_point_lookup(spark, tdir):
    ev = _mk_events(n_keys=30, n_batches=3, per_batch=40)
    log = spark.createDataFrame(ev, EV_DDL)
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=8)
    t = replay_log_partial(t, log)
    oracle = partial_oracle(ev)
    t = t.compact_if_needed(ratio=0.0)
    assert _engine_state(t) == oracle
    some_key = next(iter(oracle))
    got = t.lookup([some_key]).collect()
    assert len(got) == 1 and got[0]["n_tok"] == oracle[some_key]["n_tok"]


def test_partial_schema_evolution_adds_column_as_unchanged(spark, tdir):
    """A later batch introduces a new column: older rows read null for
    it, and sparse updates that omit it leave existing values alone."""
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    t = apply_batch_partial(
        t, spark.createDataFrame([(1, 0, "insert", "a", [1], 1, "s")], EV_DDL), 0
    )
    evolved = spark.createDataFrame(
        [(2, 1, "upsert", "a", None, None, None, "en"),
         (3, 1, "insert", "b", [2], 1, "s", None)],
        EV_DDL + ", lang string",
    )
    t = apply_batch_partial(t, evolved, 1)
    rows = {r["doc_id"]: (r["tokens"], r["lang"]) for r in t.read().collect()}
    assert rows == {"a": ([1], "en"), "b": ([2], None)}


def test_partial_occ_retry(spark, tdir):
    """Partial applies inherit the OCC rebase: a stale handle's delta
    apply lands on top of a concurrent writer."""
    root = os.path.join(tdir, "t")
    a = IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=4)
    b = IceboxTable.load(spark, root)
    apply_batch_partial(
        a, spark.createDataFrame([(1, 0, "insert", "x", [1], 1, "s")], EV_DDL), 0
    )
    b2 = apply_batch_partial(
        b, spark.createDataFrame([(2, 1, "insert", "y", [2], 1, "s")], EV_DDL), 1,
        retry_on_conflict=1,
    )
    assert set(_engine_state(b2)) == {"x", "y"}


def test_partial_changes_feed_composes(spark, tdir):
    """The committed winners are COMPLETE rows, so the change feed and
    everything on it work unchanged on a partial-maintained table."""
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    t = apply_batch_partial(
        t, spark.createDataFrame([(1, 0, "insert", "k", [1], 1, "a")], EV_DDL), 0
    )
    s1 = t.snapshot_id
    t = apply_batch_partial(
        t, spark.createDataFrame([(2, 1, "upsert", "k", None, 5, None)], EV_DDL), 1
    )
    chg = {r["_change_type"]: r for r in t.changes(s1).collect()}
    assert set(chg) == {"update_pre", "update_post"}
    # the post image is the fully-resolved row, not the sparse event
    assert chg["update_post"]["n_tok"] == 5
    assert list(chg["update_post"]["tokens"]) == [1]
    assert chg["update_post"]["source"] == "a"


def test_out_of_order_batch_refused(spark, tdir):
    """The columnar engines require LSN-ordered batches; a late batch
    whose keys' newest lsns predate the previous merge's watermark must
    refuse loudly instead of folding stale columns silently."""
    t = IceboxTable.create(spark, os.path.join(tdir, "ooo"), BASE_SCHEMA,
                           n_buckets=2)

    def ev(rows):
        return spark.createDataFrame(rows, EV_DDL)

    t = apply_batch_partial(t, ev([
        (100, 0, "upsert", "a", [1], 1, "s"),
        (101, 0, "upsert", "b", [2], 2, "s"),
    ]), 0, enforce_order=True)
    assert t.manifest["summary"]["lsn_watermark"] == 101
    # a late batch (all lsns below the watermark) refuses
    with pytest.raises(ValueError, match="out-of-order"):
        apply_batch_partial(t, ev([(50, 1, "upsert", "a", [9], 1, "s")]), 1,
                            enforce_order=True)
    # in-order continuation still applies
    t = apply_batch_partial(t, ev([(200, 2, "upsert", "a", [3], 1, "s")]), 2,
                            enforce_order=True)
    assert t.manifest["summary"]["lsn_watermark"] == 200
    # replay of a committed tag returns BEFORE the check (no false alarm)
    assert apply_batch_partial(t, ev([
        (100, 0, "upsert", "a", [1], 1, "s"),
    ]), 0, enforce_order=True).snapshot_id == t.snapshot_id
    # default (enforce_order=False): the graceful row-guard contract —
    # an entirely-stale batch applies as a harmless no-op
    t2 = apply_batch_partial(t, ev([(60, 3, "upsert", "a", [7], 1, "s")]), 3)
    row = {r["doc_id"]: list(r["tokens"]) for r in t2.read().collect()}
    assert row["a"] == [3]


def test_out_of_order_refused_through_maintenance_commits(spark, tdir):
    """Interleaved maintenance (compaction, bucket split) must not reset
    the enforce_order watermark chain: run_stream interleaves compact/
    split/cluster commits between epochs, and the refusal has to look
    through them to the last columnar merge."""
    t = IceboxTable.create(spark, os.path.join(tdir, "ooo_maint"),
                           BASE_SCHEMA, n_buckets=2)

    def ev(rows):
        return spark.createDataFrame(rows, EV_DDL)

    t = apply_batch_partial(t, ev([
        (100, 0, "upsert", "a", [1], 1, "s"),
        (101, 0, "upsert", "b", [2], 2, "s"),
    ]), 0, enforce_order=True, merge_strategy="delta")
    t = apply_batch_partial(t, ev([
        (150, 1, "upsert", "a", [5], 1, "s"),
    ]), 1, enforce_order=True, merge_strategy="delta")
    # maintenance run between epochs: compaction then a bucket split
    t = t.compact_if_needed(ratio=0.0)
    assert t.manifest["summary"]["operation"] == "compact"
    t = t.split_buckets(factor=2)
    assert t.manifest["summary"]["operation"] == "split_buckets"
    # late batch behind the pre-maintenance watermark must still refuse
    with pytest.raises(ValueError, match="out-of-order"):
        apply_batch_partial(t, ev([(50, 2, "upsert", "a", [9], 1, "s")]), 2,
                            enforce_order=True, merge_strategy="delta")
    # in-order continuation applies through the maintenance commits
    t = apply_batch_partial(t, ev([(200, 3, "upsert", "b", [7], 2, "s")]), 3,
                            enforce_order=True, merge_strategy="delta")
    assert t.manifest["summary"]["lsn_watermark"] == 200
