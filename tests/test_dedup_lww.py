"""Golden-value micro-fixtures for LWW dedup (FIXTURES.md §4 tiny_lww):
out-of-order LSNs, delete-then-insert, upsert-on-absent, equal-LSN tie.
Mirrors the reference's exact-golden unit-test style
(/root/reference/grid-and-attrs/footprint.test.js:22-29)."""

from __future__ import annotations

import os

from data_pipeline_spark.cdc import apply_batch, lww_dedup
from data_pipeline_spark.icebox import IceboxTable

from .test_cdc_apply import BASE_SCHEMA

EV_DDL = (
    "lsn long, batch_id int, op string, doc_id string, "
    "tokens array<int>, n_tok int, source string"
)

TINY_LOG = [
    # out-of-order arrivals for doc a: lsn 5 must win
    (3, 0, "insert", "a", [1], 1, "web"),
    (5, 0, "update", "a", [1, 2], 2, "web"),
    (4, 0, "update", "a", [9], 1, "web"),
    # delete-then-insert for doc b: the later insert resurrects it
    (10, 0, "insert", "b", [7], 1, "books"),
    (11, 0, "delete", "b", None, None, None),
    (12, 0, "insert", "b", [8, 8], 2, "books"),
    # upsert on absent doc c
    (20, 0, "upsert", "c", [4, 4, 4], 3, "code"),
    # equal-LSN tie on doc d: delete outranks update (op precedence)
    (30, 0, "update", "d", [5], 1, "wiki"),
    (31, 0, "update", "d", [6], 1, "wiki"),
    (31, 0, "delete", "d", None, None, None),
]

EXPECTED = {
    "a": ([1, 2], 2, "web"),
    "b": ([8, 8], 2, "books"),
    "c": ([4, 4, 4], 3, "code"),
    # d deleted
}


def test_tiny_lww_golden(spark, tdir):
    df = spark.createDataFrame(TINY_LOG, EV_DDL)
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=4)
    t = apply_batch(t, df, 0)
    rows = {r["doc_id"]: (r["tokens"], r["n_tok"], r["source"]) for r in t.read().collect()}
    assert rows == EXPECTED


def test_tiny_lww_golden_across_batches(spark, tdir):
    """Same log split at every boundary: final state identical."""
    df = spark.createDataFrame(TINY_LOG, EV_DDL)
    for split_lsn in (5, 11, 30):
        t = IceboxTable.create(
            spark, os.path.join(tdir, f"t{split_lsn}"), BASE_SCHEMA, n_buckets=4
        )
        t = apply_batch(t, df.filter(f"lsn <= {split_lsn}"), 0)
        t = apply_batch(t, df.filter(f"lsn > {split_lsn}"), 1)
        rows = {
            r["doc_id"]: (r["tokens"], r["n_tok"], r["source"]) for r in t.read().collect()
        }
        assert rows == EXPECTED, split_lsn


def test_lww_dedup_unit(spark):
    df = spark.createDataFrame(TINY_LOG, EV_DDL)
    for n_salts in (1, 4):
        win = {r["doc_id"]: (r["lsn"], r["op"]) for r in lww_dedup(df, n_salts=n_salts).collect()}
        assert win == {
            "a": (5, "update"),
            "b": (12, "insert"),
            "c": (20, "upsert"),
            "d": (31, "delete"),
        }


def test_dedup_strategies_equivalent(spark):
    """The "agg" (max_by hash aggregate) and "window" (salted two-phase
    ranking) strategies must pick the identical winner row for every key —
    including on a log with redelivered LSNs and a hot key."""
    import pyspark.sql.functions as F

    from data_pipeline_spark.gen import gen_event_log

    log = gen_event_log(
        spark, n_events=2000, n_docs=150, batch_size=2000, hot_frac=0.4, partitions=4
    )
    # inject redelivery: duplicate a slice with identical LSNs
    log = log.unionByName(log.filter(F.col("lsn") % 7 == 0))
    cols = ["doc_id", "lsn", "op", "tokens", "n_tok", "source"]
    a = lww_dedup(log, strategy="agg").select(*cols).orderBy("doc_id").collect()
    w = lww_dedup(log, strategy="window", n_salts=4).select(*cols).orderBy("doc_id").collect()
    assert a == w
