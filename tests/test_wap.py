"""Write-audit-publish on refs (icebox/table.py write_audit_publish):
consumers of the published ref never observe unaudited data."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from data_pipeline_spark.icebox.table import IceboxTable

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("grade", IntegerType()),
    ]
)


def _batch(spark, t, items):
    df = spark.createDataFrame(
        [(d, g, int(l), False) for d, g, l in items],
        "doc_id string, grade int, _lsn long, _tombstone boolean",
    ).withColumn("_b", t.bucket_of())
    br = {r["_b"]: r["n"] for r in
          df.groupBy("_b").agg(F.count("*").alias("n")).collect()}
    return df, br


def _setup(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2)
    df, br = _batch(spark, t, [("a", 1, 1), ("b", 2, 2)])
    t = t.commit_delta(df, br)
    t.set_ref("published")
    return t


def test_publish_advances_ref_only_after_audit(spark, tdir):
    t = _setup(spark, tdir)

    def write(tbl):
        df, br = _batch(spark, tbl, [("c", 3, 3)])
        return tbl.commit_delta(df, br)

    seen_during_audit = {}

    def audit(tbl):
        # mid-audit, a published-ref consumer still reads the old state
        pub = IceboxTable.load(spark, tbl.root, ref="published")
        seen_during_audit["rows"] = pub.read().count()
        return tbl.read().count() == 3

    t2 = t.write_audit_publish(write, audit)
    assert seen_during_audit["rows"] == 2
    assert t2.refs()["published"] == t2.snapshot_id
    pub = IceboxTable.load(spark, t2.root, ref="published")
    assert pub.read().count() == 3


def test_failed_audit_rolls_back_and_ref_stays(spark, tdir):
    t = _setup(spark, tdir)
    pub_sid = t.refs()["published"]

    def write(tbl):
        df, br = _batch(spark, tbl, [("bad", -1, 9)])
        return tbl.commit_delta(df, br)

    t2 = t.write_audit_publish(
        write, lambda tbl: tbl.read().filter(F.col("grade") < 0).count() == 0
    )
    assert t2.refs()["published"] == pub_sid
    # rollback commit restored the audited state; the chain stayed
    # append-only (bad snapshot retained for forensics)
    assert t2.read().count() == 2
    assert t2.manifest["summary"]["operation"] == "rollback"
    pub = IceboxTable.load(spark, t2.root, ref="published")
    assert sorted(r["doc_id"] for r in pub.read().collect()) == ["a", "b"]


def test_audit_exception_rolls_back_then_reraises(spark, tdir):
    t = _setup(spark, tdir)
    pub_sid = t.refs()["published"]

    def write(tbl):
        df, br = _batch(spark, tbl, [("c", 3, 3)])
        return tbl.commit_delta(df, br)

    with pytest.raises(RuntimeError, match="audit blew up"):
        t.write_audit_publish(
            write, lambda tbl: (_ for _ in ()).throw(RuntimeError("audit blew up"))
        )
    cur = IceboxTable.load(spark, t.root)
    assert cur.read().count() == 2
    assert cur.refs()["published"] == pub_sid  # never moved


def test_default_audit_is_deep_validate(spark, tdir):
    t = _setup(spark, tdir)

    def write(tbl):
        df, br = _batch(spark, tbl, [("c", 3, 3)])
        return tbl.commit_delta(df, br)

    t2 = t.write_audit_publish(write)
    assert t2.refs()["published"] == t2.snapshot_id


def test_stale_handle_refuses_when_ref_is_ahead(spark, tdir):
    t = _setup(spark, tdir)
    old_sid = t.snapshot_id
    df, br = _batch(spark, t, [("c", 3, 3)])
    t2 = t.commit_delta(df, br)
    t2.set_ref("published", overwrite=True)
    # a handle pinned at the old snapshot (e.g. another process's view)
    stale = IceboxTable.load(spark, t.root, snapshot_id=old_sid)
    with pytest.raises(ValueError, match="ahead"):
        stale.write_audit_publish(lambda tbl: tbl)
