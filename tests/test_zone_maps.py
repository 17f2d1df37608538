"""Column zone maps: manifest min/max statistics + where=-pruned reads
(icebox/table.py prune_plan / read(where=)).

The correctness contract: read(where=P) ≡ read().filter(P) ALWAYS —
pruning may only remove files that provably contribute no surviving
winner. The tests stress exactly the cases where naive file skipping
breaks LWW merge-on-read: mutable columns whose value changes across
versions, null-payload tombstones, and schema evolution.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_pipeline_spark.icebox.table import IceboxTable

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("grade", IntegerType()),
        StructField("source", StringType()),
    ]
)


def _rows(spark, t, items):
    """items: (doc_id, grade, source, lsn, tombstone)"""
    df = spark.createDataFrame(
        [(d, g, s, int(l), bool(tb)) for d, g, s, l, tb in items],
        "doc_id string, grade int, source string, _lsn long, _tombstone boolean",
    )
    return df.withColumn("_b", t.bucket_of())


def _commit_delta(t, df, collect_stats=True):
    br = {r["_b"]: r["n"] for r in
          df.groupBy("_b").agg(F.count("*").alias("n")).collect()}
    return t.commit_delta(df, br, collect_stats=collect_stats)


def _assert_where_equals_filter(t, where, expr):
    a = sorted(map(tuple, t.read(where=where).collect()))
    b = sorted(map(tuple, t.read().filter(expr).collect()))
    assert a == b, f"where= diverged from post-filter: {a[:3]} vs {b[:3]}"
    return a


def test_bucket_rule_prunes_correlated_column(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=8)
    # grade correlates with the bucket (grade = bucket*100 + i) so the
    # per-bucket zone maps are tight and a range predicate prunes
    keys = [f"d{i}" for i in range(400)]
    kdf = spark.createDataFrame([(k,) for k in keys], "doc_id string") \
        .withColumn("_b", t.bucket_of())
    bmap = {r["doc_id"]: r["_b"] for r in kdf.collect()}
    items = [(k, bmap[k] * 100 + (i % 50), f"s{i % 3}", i, False)
             for i, k in enumerate(keys)]
    t = t.commit_rewrite(_rows(spark, t, items), list(range(8)))

    zp = t.prune_plan([("grade", ">=", 300), ("grade", "<", 500)])
    # only buckets 3 and 4 can hold grades [300, 500)
    assert zp["skip_buckets"] == {str(b) for b in range(8)} - {"3", "4"}
    rows = _assert_where_equals_filter(
        t, [("grade", ">=", 300), ("grade", "<", 500)],
        (F.col("grade") >= 300) & (F.col("grade") < 500),
    )
    assert rows and all(300 <= r[1] < 500 for r in rows)
    # fully-excluding predicate: zero scans planned at all
    empty = t.read(where=[("grade", ">=", 10_000)])
    assert empty.count() == 0
    assert "Scan parquet" not in empty._jdf.queryExecution() \
        .executedPlan().toString()


def test_mutable_column_never_file_prunes_across_versions(spark, tdir):
    """A key's grade CHANGES across delta commits. Entry-level pruning on
    a mutable column would resurrect the old version; the bucket rule
    must keep every file of a surviving bucket."""
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2)
    t = _commit_delta(t, _rows(spark, t, [
        ("a", 10, "s0", 1, False), ("b", 900, "s0", 2, False)]))
    # batch 2 moves a's grade INTO the predicate range and b's OUT of it
    t = _commit_delta(t, _rows(spark, t, [
        ("a", 500, "s0", 3, False), ("b", 20, "s0", 4, False)]))
    rows = _assert_where_equals_filter(
        t, [("grade", ">", 400)], F.col("grade") > 400)
    assert [r[0] for r in rows] == ["a"]  # winner a=500; b=20 filtered
    # delta 1's bounds [10,900] overlap, delta 2's [20,500] overlap ->
    # nothing prunable, and nothing dead (grade is not immutable)
    zp = t.prune_plan([("grade", ">", 400)])
    assert not zp["dead_deltas"] and not zp["skip_buckets"]


def test_immutable_column_skips_whole_delta_commits(spark, tdir):
    t = IceboxTable.create(
        spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=4,
        immutable_cols=["source"],
    )
    # three source-disjoint ingest batches (batch-correlated immutable
    # column: the 100 TB delta-skipping shape)
    for si in range(3):
        items = [(f"{si}_{i}", i, f"src{si}", si * 1000 + i, False)
                 for i in range(100)]
        t = _commit_delta(t, _rows(spark, t, items))
    zp = t.prune_plan([("source", "=", "src1")])
    assert zp["dead_deltas"] == {0, 2}
    rows = _assert_where_equals_filter(
        t, [("source", "=", "src1")], F.col("source") == "src1")
    assert len(rows) == 100 and all(r[0].startswith("1_") for r in rows)
    # updates to src1 docs arriving in a LATER mixed batch still win
    t = _commit_delta(t, _rows(spark, t, [("1_7", 7777, "src1", 99999, False)]))
    rows = {r[0]: r[1] for r in t.read(
        where=[("source", "=", "src1")]).collect()}
    assert rows["1_7"] == 7777


def test_null_tombstone_blocks_unsafe_pruning(spark, tdir):
    """A delete tombstone carries NULL in the immutable column. The
    null-count guard must drop that delta's source bounds so the entry
    is never skipped — skipping it would resurrect the deleted doc."""
    t = IceboxTable.create(
        spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2,
        immutable_cols=["source"],
    )
    t = _commit_delta(t, _rows(spark, t, [
        ("x", 1, "srcA", 1, False), ("y", 2, "srcA", 2, False)]))
    # batch 2: only a tombstone for x, null payload, plus a srcB doc
    t = _commit_delta(t, _rows(spark, t, [
        ("x", None, None, 10, True), ("z", 3, "srcB", 11, False)]))
    zp = t.prune_plan([("source", "=", "srcA")])
    assert 1 not in zp["dead_deltas"], (
        "delta with a null-source tombstone must not be skipped"
    )
    rows = _assert_where_equals_filter(
        t, [("source", "=", "srcA")], F.col("source") == "srcA")
    assert [r[0] for r in rows] == ["y"], "deleted doc x must stay deleted"


def test_schema_evolution_missing_field_bucket_prunes(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2)
    t = _commit_delta(t, _rows(spark, t, [
        ("old1", 1, "s", 1, False), ("old2", 2, "s", 2, False)]))
    new_schema = StructType([*SCHEMA.fields, StructField("stars", LongType())])
    t.evolve_schema(new_schema)
    df = spark.createDataFrame(
        [("new1", 5, "s", 7, 3, False)],
        "doc_id string, grade int, source string, _lsn long, "
        "stars long, _tombstone boolean",
    ).withColumn("_b", t.bucket_of())
    t = _commit_delta(t, df)
    # old files lack `stars` entirely -> backfilled null -> can't match;
    # pruning via the missing-field rule must agree with the filter
    rows = _assert_where_equals_filter(
        t, [("stars", ">=", 1)], F.col("stars") >= 1)
    assert [r[0] for r in rows] == ["new1"]


def test_compaction_harvests_zone_maps(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2)
    t = _commit_delta(t, _rows(spark, t, [
        (f"k{i}", i, "s", i, False) for i in range(50)]), collect_stats=False)
    assert "col_bounds" not in (t.manifest["deltas"] or [{}])[0]
    t = t.compact_if_needed(min_deltas=1)
    assert not t.manifest["deltas"]
    got = [e.get("col_bounds") for e in t.manifest["buckets"].values()]
    assert all(b for b in got), "compaction must record per-bucket bounds"
    # and the rewritten bounds actually prune
    zp = t.prune_plan([("grade", ">", 100)])
    assert zp["skip_buckets"] == set(t.manifest["buckets"])


def test_analyze_backfills_stats_metadata_only(spark, tdir):
    t = IceboxTable.create(
        spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=4,
        immutable_cols=["source"],
    )
    # hot-path commits: no stats harvested
    for si in range(3):
        items = [(f"{si}_{i}", i, f"src{si}", si * 100 + i, False)
                 for i in range(50)]
        t = _commit_delta(t, _rows(spark, t, items), collect_stats=False)
    assert all(d.get("col_bounds") is None for d in t.manifest["deltas"])
    assert not t.prune_plan([("source", "=", "src1")])["dead_deltas"]
    sid = t.snapshot_id
    t = t.analyze()
    assert t.snapshot_id == sid + 1
    assert t.manifest["summary"]["operation"] == "analyze"
    # now the immutable file rule prunes the other commits
    assert t.prune_plan([("source", "=", "src1")])["dead_deltas"] == {0, 2}
    rows = _assert_where_equals_filter(
        t, [("source", "=", "src1")], F.col("source") == "src1")
    assert len(rows) == 50
    # idempotent: nothing left to backfill -> same handle, no commit
    assert t.analyze() is t
    # no data moved: delta paths identical to the pre-analyze manifest
    pre = IceboxTable.load(spark, t.root, snapshot_id=sid)
    assert [d["path"] for d in pre.manifest["deltas"]] == \
        [d["path"] for d in t.manifest["deltas"]]


def test_rename_keeps_pruning_by_field_id(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2)
    t = _commit_delta(t, _rows(spark, t, [
        ("a", 5, "s", 1, False), ("b", 500, "s", 2, False)]))
    t = t.compact_if_needed(min_deltas=1)
    t = t.rename_column("grade", "rank_score")
    rows = _assert_where_equals_filter(
        t, [("rank_score", ">", 100)], F.col("rank_score") > 100)
    assert [r[0] for r in rows] == ["b"]
