"""Capstone integration: the full production shape in ONE stream —
Debezium wire envelopes tailed by run_stream with parse_debezium as the
event transform, row-level expectations routing violations to the DLQ,
a materialized aggregate maintained per epoch, and the final table
published through the JSON-lines sink. Each feature is covered in
isolation elsewhere; this pins that they compose (transform → gates →
merge → views → publish) without stepping on each other."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from data_pipeline_spark.cdc.apply import replay_log
from data_pipeline_spark.cdc.stream import run_stream
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox import IceboxTable
from data_pipeline_spark.materialize import MaterializedAggregate
from data_pipeline_spark.sinks import export_jsonl
from data_pipeline_spark.sources.debezium import parse_debezium, to_debezium

ROW = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)

RAW_SCHEMA = StructType(
    [StructField("value", StringType()), StructField("batch_id", IntegerType())]
)


def test_debezium_expectations_mv_publish_compose(spark, tdir):
    log = gen_event_log(
        spark, n_events=1200, n_docs=150, batch_size=400, partitions=2,
        hot_frac=0.1, delete_frac=0.1,
    )
    # poison two rows: one expectation violation (n_tok lies about the
    # token count) and one malformed envelope (unparseable JSON)
    bad_ntok = spark.createDataFrame(
        [(100000, 0, "insert", "doc_poison", [1, 2], 99, "web")],
        "lsn long, batch_id int, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string",
    )
    envelopes = to_debezium(log.unionByName(bad_ntok), ROW,
                            keep_cols=["batch_id"])
    garbage = spark.createDataFrame(
        [("{not json at all", 0)], "value string, batch_id int"
    )
    ev_dir = os.path.join(tdir, "envelopes")
    envelopes.unionByName(garbage).write.partitionBy("batch_id").parquet(ev_dir)

    root = os.path.join(tdir, "t")
    t = IceboxTable.create(spark, root, ROW, n_buckets=4)
    mv = MaterializedAggregate(
        spark, t, os.path.join(tdir, "mv"), "source", ["n_tok"],
        name="by_source",
    )
    dlq = os.path.join(tdir, "dlq")
    kwargs = dict(
        query_name="prod", max_files_per_trigger=2, merge_strategy="delta",
        event_transform=lambda df: parse_debezium(df, ROW),
        expectations={"n_tok_matches": "n_tok = size(tokens)"},
        quarantine_dir=dlq,
        materialized_views=[mv],
    )
    run_stream(spark, ev_dir, RAW_SCHEMA, root, os.path.join(tdir, "ck"),
               **kwargs)

    # 1. final state == native replay of the CLEAN log (poison rows out)
    t = IceboxTable.load(spark, root)
    want = replay_log(
        IceboxTable.create(spark, os.path.join(tdir, "native"), ROW,
                           n_buckets=4),
        log, merge_strategy="delta",
    )
    assert sorted(map(tuple, t.read().collect())) == sorted(
        map(tuple, want.read().collect())
    )

    # 2. both poison rows are in the DLQ with their distinct reasons
    q = spark.read.parquet(dlq)
    reasons = sorted(r["_quarantine_reason"] for r in q.collect())
    assert reasons == ["expect:n_tok_matches", "unknown_op"] or reasons == [
        "expect:n_tok_matches", "null_lsn"
    ], reasons
    assert q.filter(F.col("doc_id") == "doc_poison").count() == 1

    # 3. the materialized view equals a recompute over the final state
    got_mv = {
        r["source"]: (r["n_rows"], r["sum_n_tok"]) for r in mv.read().collect()
    }
    want_mv = {
        r["source"]: (r["n"], r["s"])
        for r in t.read()
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"))
        .collect()
    }
    assert got_mv == want_mv

    # 4. publish: partitioned gzip JSON-lines shards round-trip exactly
    pub = os.path.join(tdir, "pub")
    export_jsonl(t.read(), pub, partition_cols=["source"],
                 max_records_per_file=100)
    back = spark.read.schema(ROW).json(pub)
    assert sorted(map(tuple, back.select(*ROW.names).collect())) == sorted(
        map(tuple, t.read().select(*ROW.names).collect())
    )
    assert glob.glob(f"{pub}/source=*/*.json.gz")

    # 5. restart the whole composed stream: every surface is a no-op
    sid, vsid = t.snapshot_id, mv.view.snapshot_id
    n_dlq = q.count()
    run_stream(spark, ev_dir, RAW_SCHEMA, root, os.path.join(tdir, "ck"),
               **kwargs)
    assert IceboxTable.load(spark, root).snapshot_id == sid
    assert mv.view.snapshot_id == vsid
    assert spark.read.parquet(dlq).count() == n_dlq
