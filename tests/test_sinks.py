"""Publish sink (sinks.export_jsonl): the reference's line-delimited
JSON publish shape — partitioned dirs, per-file record caps, gzip
shards — must round-trip exactly, token arrays included."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pyspark.sql.functions as F

from data_pipeline_spark.sinks import export_jsonl


def _docs(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        F.sequence(F.lit(1), (F.col("id") % 5 + 1).cast("int")).alias("tokens"),
        (F.col("id") % 5 + 1).cast("int").alias("n_tok"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("source"),
    )


def test_roundtrip_exact_including_token_arrays(spark, tdir):
    df = _docs(spark)
    out = os.path.join(tdir, "pub")
    export_jsonl(df, out, max_records_per_file=0)
    back = spark.read.schema(df.schema).json(out)
    want = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
            for r in df.collect()}
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
           for r in back.collect()}
    assert got == want


def test_partition_layout_chunking_and_compression(spark, tdir):
    df = _docs(spark, n=600)
    out = os.path.join(tdir, "pub")
    export_jsonl(df, out, partition_cols=["source"], max_records_per_file=100)
    # Hive-style partition dirs (the reference's state=<state> layout)
    parts = sorted(os.path.basename(p) for p in glob.glob(f"{out}/source=*"))
    assert parts == ["source=books", "source=code", "source=web"]
    # every shard is gzip and respects the record cap (40k contract analog)
    shards = glob.glob(f"{out}/source=*/*.json.gz")
    assert shards, "no gzip shards written"
    per_part = {}
    for s in shards:
        with gzip.open(s, "rt") as f:
            lines = f.readlines()
        assert 0 < len(lines) <= 100
        # each line is one standalone JSON record (line-delimited wire
        # shape, README.md:18-20 parity)
        rec = json.loads(lines[0])
        assert set(rec) == {"doc_id", "tokens", "n_tok"}  # source in path
        part = os.path.basename(os.path.dirname(s))
        per_part[part] = per_part.get(part, 0) + len(lines)
    assert sum(per_part.values()) == 600
    # partitioned read-back restores the partition column from the path
    back = spark.read.schema(
        "doc_id string, tokens array<int>, n_tok int, source string"
    ).json(out)
    assert back.groupBy("source").count().count() == 3
    assert back.count() == 600
