"""Row-level expectations (apply_batch expectations=): declarative
validity gates over the normalized event columns — the engine's
generalization of the reference's skip-the-bad-polygon-and-count-it
guards (grid-and-attrs/app.js:136-141 BAD_POLYGONS/ALL_ERRORS). Strict
mode rejects a violating batch with schema rollback; quarantine mode
routes violations to the DLQ with `expect:<name>` reasons and applies
the valid remainder; deletes bypass expectations; NULL predicate
results count as violations; replay stays idempotent."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.cdc.apply import apply_batch
from data_pipeline_spark.cdc.stream import run_stream
from data_pipeline_spark.icebox.table import IceboxTable

from .test_cdc_apply import BASE_SCHEMA
from .test_checkpoint_resume import EV_SCHEMA

EXPECT = {
    "n_tok_matches": "n_tok = size(tokens)",
    "has_source": "source is not null",
}


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, batch_id int",
    )


ROWS = [
    (1, "insert", "a", [1, 2], 2, "s", 0),          # clean
    (2, "insert", "b", [1], 5, "s", 0),             # n_tok mismatch
    (3, "insert", "c", [1], 1, None, 0),            # null source
    (4, "insert", "d", None, 3, "s", 0),            # size(null) -> NULL pred
    (5, "delete", "b", None, None, None, 0),        # delete: bypasses gates
    (6, "insert", "e", [7, 8, 9], 3, "t", 0),       # clean
]


def test_strict_mode_rejects_with_counts_and_rollback(spark, tdir):
    t = IceboxTable.create(
        spark, os.path.join(tdir, "strict"), BASE_SCHEMA, n_buckets=2
    )
    n_schemas = len(t.manifest["schemas"])
    with pytest.raises(ValueError, match="expectation violations"):
        apply_batch(t, _events(spark, ROWS), 0, expectations=EXPECT)
    # nothing committed, schema evolution rolled back
    assert t.snapshot_id == 0
    assert len(t.manifest["schemas"]) == n_schemas
    # a clean batch under the same expectations applies normally
    clean = [r for r in ROWS if r[2] in ("a", "e") or r[1] == "delete"]
    t = apply_batch(t, _events(spark, clean), 1, expectations=EXPECT)
    assert {r["doc_id"] for r in t.read().collect()} == {"a", "e"}


def test_quarantine_mode_routes_violations_and_applies_rest(spark, tdir):
    t = IceboxTable.create(
        spark, os.path.join(tdir, "dlq"), BASE_SCHEMA, n_buckets=2
    )
    dlq = os.path.join(tdir, "dlq_dir")
    t = apply_batch(t, _events(spark, ROWS), 0, expectations=EXPECT,
                    quarantine_dir=dlq)
    # clean rows + the delete applied: a, e live ('b' was inserted only
    # by a violating row, so its delete tombstones nothing)
    assert {r["doc_id"] for r in t.read().collect()} == {"a", "e"}
    q = spark.read.parquet(os.path.join(dlq, "batch_id=0"))
    reasons = {r["doc_id"]: r["_quarantine_reason"] for r in q.collect()}
    assert reasons == {
        "b": "expect:n_tok_matches",
        "c": "expect:has_source",
        "d": "expect:n_tok_matches",  # NULL predicate = violation
    }
    # replay of the committed tag is a no-op on table AND DLQ
    sid = t.snapshot_id
    t2 = apply_batch(t, _events(spark, ROWS), 0, expectations=EXPECT,
                     quarantine_dir=dlq)
    assert t2.snapshot_id == sid
    assert spark.read.parquet(os.path.join(dlq, "batch_id=0")).count() == 3


def test_malformed_and_violating_share_one_dlq_write(spark, tdir):
    t = IceboxTable.create(
        spark, os.path.join(tdir, "both"), BASE_SCHEMA, n_buckets=2
    )
    dlq = os.path.join(tdir, "both_dlq")
    rows = [
        (1, "insert", "a", [1], 1, "s", 0),
        (None, "insert", "x", [1], 1, "s", 0),   # malformed: null lsn
        (3, "insert", "y", [1], 9, "s", 0),      # violates n_tok_matches
    ]
    t = apply_batch(t, _events(spark, rows), 0, expectations=EXPECT,
                    quarantine_dir=dlq)
    assert {r["doc_id"] for r in t.read().collect()} == {"a"}
    q = spark.read.parquet(os.path.join(dlq, "batch_id=0"))
    reasons = {r["doc_id"]: r["_quarantine_reason"] for r in q.collect()}
    # structural reason wins for the malformed row; expectation names
    # the semantic one
    assert reasons == {"x": "null_lsn", "y": "expect:n_tok_matches"}


def test_stream_keeps_flowing_past_violations(spark, tdir):
    events_dir = os.path.join(tdir, "events")
    rows = [
        (1, 0, "insert", "a", [1, 2], 2, "s"),
        (2, 0, "insert", "b", [9], 4, "s"),      # violation in epoch 0
        (3, 1, "insert", "c", [5], 1, "s"),
        (4, 1, "update", "a", [1, 2, 3], 3, "s"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    df.write.partitionBy("batch_id").parquet(events_dir)

    root = os.path.join(tdir, "table")
    dlq = os.path.join(tdir, "dlq")
    IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=2)
    run_stream(
        spark, events_dir, EV_SCHEMA, root, os.path.join(tdir, "ck"),
        max_files_per_trigger=1, quarantine_dir=dlq,
        expectations={"n_tok_matches": "n_tok = size(tokens)"},
    )
    t = IceboxTable.load(spark, root)
    got = {r["doc_id"]: list(r["tokens"]) for r in t.read().collect()}
    assert got == {"a": [1, 2, 3], "c": [5]}
    q = spark.read.parquet(dlq)
    assert [r["doc_id"] for r in q.collect()] == ["b"]
