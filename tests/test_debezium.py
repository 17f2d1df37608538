"""Debezium-envelope source adapter: golden parses, tolerance to
malformed/unknown envelopes, DLQ integration, and full replay
equivalence (envelope round trip == native events, per-row token
arrays)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from data_pipeline_spark.cdc.apply import apply_batch, replay_log
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox import IceboxTable
from data_pipeline_spark.sources.debezium import (
    parse_debezium,
    to_debezium,
)

ROW = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)


def _parse_one(spark, envelopes):
    raw = spark.createDataFrame([(e,) for e in envelopes], ["value"])
    return parse_debezium(raw, ROW).collect()


def test_golden_parses(spark):
    rows = _parse_one(
        spark,
        [
            # create
            '{"payload":{"before":null,"after":{"doc_id":"a","tokens":[1,2],'
            '"n_tok":2,"source":"web"},"op":"c","ts_ms":99,"source":{"lsn":7}}}',
            # delete: image comes from before
            '{"payload":{"before":{"doc_id":"b","tokens":[3],"n_tok":1,'
            '"source":"web"},"after":null,"op":"d","ts_ms":100,"source":{"lsn":8}}}',
            # snapshot read -> insert
            '{"payload":{"after":{"doc_id":"c","tokens":[],"n_tok":0,'
            '"source":"s"},"op":"r","ts_ms":5,"source":{"lsn":9}}}',
            # no source.lsn -> ts_ms fallback
            '{"payload":{"after":{"doc_id":"d","tokens":[4],"n_tok":1,'
            '"source":"s"},"op":"u","ts_ms":123}}',
        ],
    )
    assert [(r["lsn"], r["op"], r["doc_id"]) for r in rows] == [
        (7, "insert", "a"),
        (8, "delete", "b"),
        (9, "insert", "c"),
        (123, "update", "d"),
    ]
    assert rows[1]["tokens"] == [3]  # delete keeps the before image


def test_malformed_and_unknown_become_nulls(spark):
    rows = _parse_one(
        spark,
        [
            "{not json",
            '{"payload":{"after":{"doc_id":"x","tokens":[],"n_tok":0,'
            '"source":"s"},"op":"z","ts_ms":1,"source":{"lsn":2}}}',
            '{"payload":{"op":"c","ts_ms":3,"source":{"lsn":4}}}',
        ],
    )
    assert rows[0]["op"] is None and rows[0]["lsn"] is None
    assert rows[1]["op"] is None and rows[1]["lsn"] == 2  # unknown op
    assert rows[2]["op"] == "insert" and rows[2]["doc_id"] is None


def test_parse_is_pure_codegen(spark):
    raw = spark.createDataFrame([("{}",)], ["value"])
    plan = (
        parse_debezium(raw, ROW)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_malformed_envelopes_route_to_dlq(spark, tdir):
    good = (
        '{"payload":{"after":{"doc_id":"ok","tokens":[1],"n_tok":1,'
        '"source":"s"},"op":"c","ts_ms":1,"source":{"lsn":1}}}'
    )
    raw = spark.createDataFrame(
        [(good, 0), ("{broken", 0)], ["value", "batch_id"]
    )
    ev = parse_debezium(raw, ROW, keep_cols=["batch_id"])
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), ROW, n_buckets=4)
    q = os.path.join(tdir, "dlq")
    t = apply_batch(t, ev, 0, merge_strategy="delta", quarantine_dir=q)
    assert [r["doc_id"] for r in t.read().collect()] == ["ok"]
    bad = spark.read.parquet(q).collect()
    assert len(bad) == 1 and bad[0]["_quarantine_reason"] is not None


def test_envelope_replay_equals_native_replay(spark, tdir):
    log = gen_event_log(
        spark, n_events=3000, n_docs=400, batch_size=1000, partitions=4
    )
    rt = parse_debezium(
        to_debezium(log, ROW, keep_cols=["batch_id"]),
        ROW,
        keep_cols=["batch_id"],
    )
    # wire format is lossless up to upsert -> r -> insert (Debezium has
    # no upsert op; under LWW the two apply identically — the table
    # equality below is the semantic check)
    norm_op = F.when(F.col("op") == "upsert", "insert").otherwise(
        F.col("op")
    )
    native = sorted(
        map(tuple,
            log.withColumn("op", norm_op)
            .select("lsn", "op", *[f.name for f in ROW.fields])
            .collect())
    )
    wired = sorted(
        map(tuple, rt.select("lsn", "op", *[f.name for f in ROW.fields])
            .collect())
    )
    assert wired == native
    # and the APPLIED table state is identical, token arrays included
    ta = IceboxTable.create(spark, os.path.join(tdir, "a"), ROW, n_buckets=8)
    tb = IceboxTable.create(spark, os.path.join(tdir, "b"), ROW, n_buckets=8)
    ta = replay_log(ta, log, merge_strategy="delta")
    tb = replay_log(tb, rt, merge_strategy="delta")
    a = sorted(map(tuple, ta.read().collect()))
    b = sorted(map(tuple, tb.read().collect()))
    assert a == b and len(a) > 0


def test_stream_debezium_tail(spark, tdir):
    """The production wiring: a directory of raw Debezium envelopes
    tailed by run_stream with parse_debezium as the event_transform —
    final state equals the native replay, restart is a tag no-op."""
    from pyspark.sql.types import IntegerType

    from data_pipeline_spark.cdc.stream import run_stream

    log = gen_event_log(
        spark, n_events=1500, n_docs=200, batch_size=500, partitions=2
    )
    ev_dir = os.path.join(tdir, "envelopes")
    to_debezium(log, ROW, keep_cols=["batch_id"]).write.partitionBy(
        "batch_id"
    ).parquet(ev_dir)

    raw_schema = StructType(
        [
            StructField("value", StringType()),
            StructField("batch_id", IntegerType()),
        ]
    )
    root = os.path.join(tdir, "t")
    IceboxTable.create(spark, root, ROW, n_buckets=4)
    ckpt = os.path.join(tdir, "ckpt")
    run_stream(
        spark, ev_dir, raw_schema, root, ckpt,
        max_files_per_trigger=2, merge_strategy="delta",
        event_transform=lambda df: parse_debezium(df, ROW),
    )
    t = IceboxTable.load(spark, root)
    want = IceboxTable.create(
        spark, os.path.join(tdir, "native"), ROW, n_buckets=4
    )
    want = replay_log(want, log, merge_strategy="delta")
    assert sorted(map(tuple, t.read().collect())) == sorted(
        map(tuple, want.read().collect())
    )
    sid = t.snapshot_id
    run_stream(
        spark, ev_dir, raw_schema, root, ckpt,
        max_files_per_trigger=2, merge_strategy="delta",
        event_transform=lambda df: parse_debezium(df, ROW),
    )
    assert IceboxTable.load(spark, root).snapshot_id == sid
