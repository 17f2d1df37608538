"""End-to-end corpus → training-table pipeline (pipeline.py):
determinism, exactly-once landing, leakage-safe splits, CDC-spine
compatibility of the landed table."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_pipeline_spark.icebox.table import IceboxTable
from data_pipeline_spark.operators.bpe import bpe_decode_ids
from data_pipeline_spark.pipeline import tokenize_corpus
from tests.test_curation import _docs


def _content_hash(t):
    return t.read().selectExpr(
        "bit_xor(xxhash64(doc_id, cast(tokens as string), n_tok, source, "
        "split)) as h"
    ).first()["h"]


def test_tokenize_corpus_end_to_end(spark, tdir):
    docs = _docs(spark, n=80, n_dup_pairs=10).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    root = os.path.join(tdir, "train_t")
    t, model = tokenize_corpus(
        spark, docs, root, n_merges=30, fractions=(0.7, 0.15, 0.15),
        n_buckets=4,
    )
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert len(rows) == 90
    # tokens decode back to the document's concatenated words
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for d in ("0", "17", "85"):
        want = "".join(src[d].split())
        assert bpe_decode_ids(list(rows[d]["tokens"]), model["vocab"]) == want
        assert rows[d]["n_tok"] == len(rows[d]["tokens"])
    # near-dup pairs (ids j and 80+j) share a split — no eval leakage
    for j in range(10):
        assert rows[str(j)]["split"] == rows[str(80 + j)]["split"]
    # landed table is zone-map ready: source declared immutable
    assert t.manifest["immutable_fields"]
    assert t.manifest["deltas"][0].get("col_bounds")


def test_pipeline_is_deterministic_and_exactly_once(spark, tdir):
    docs = _docs(spark, n=40, n_dup_pairs=0).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    r1, r2 = os.path.join(tdir, "t1"), os.path.join(tdir, "t2")
    t1, m1 = tokenize_corpus(spark, docs, r1, n_merges=20, n_buckets=2)
    t2, m2 = tokenize_corpus(spark, docs, r2, n_merges=20, n_buckets=2)
    assert m1["merges"] == m2["merges"]
    assert _content_hash(t1) == _content_hash(t2)
    # replaying the landing against the existing table is a tag no-op
    sid = t1.snapshot_id
    h = _content_hash(t1)
    df = t1.read(internal=True).withColumn("_b", t1.bucket_of())
    t1b = t1.commit_delta(df, {0: 1}, tag="tokenize-corpus-v1")
    assert t1b.snapshot_id == sid and _content_hash(t1b) == h
    # re-running the WHOLE pipeline against the same root is the
    # documented no-op: same table state, same model, no corpus pass
    # (the model comes back from the sidecar) — and crucially no
    # FileExistsError from re-creating the table
    t1c, m1c = tokenize_corpus(spark, docs, r1, n_merges=20, n_buckets=2)
    assert t1c.snapshot_id == sid and _content_hash(t1c) == h
    assert m1c["merges"] == m1["merges"] and m1c["vocab"] == m1["vocab"]


def test_pipeline_resumes_after_crash_between_create_and_land(spark, tdir):
    """Crash window: the table was created but the landing commit never
    ran. The rerun must land into the existing (empty) table instead of
    raising FileExistsError."""
    from data_pipeline_spark.pipeline import TRAIN_SCHEMA

    docs = _docs(spark, n=20, n_dup_pairs=0).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    root = os.path.join(tdir, "crashed")
    IceboxTable.create(spark, root, TRAIN_SCHEMA, n_buckets=2,
                       key="doc_id", immutable_cols=["source"])
    t, model = tokenize_corpus(spark, docs, root, n_merges=10, n_buckets=2)
    assert t.read().count() == 20
    assert t.has_tag("tokenize-corpus-v1")
    assert model["merges"]


def test_stream_tokenize_on_ingest(spark, tdir):
    """binlog tail -> BPE tokenize in-stream (event_transform) -> lake:
    raw-text change events become token arrays in the merged table, and
    checkpoint replay stays a no-op (the tag guards the commit, the
    transform re-runs harmlessly)."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    from data_pipeline_spark.cdc.stream import run_stream
    from data_pipeline_spark.operators.bpe import bpe_encode, bpe_train

    corpus = _docs(spark, n=40, n_dup_pairs=0)
    model = bpe_train(corpus, n_merges=20)

    raw_schema = StructType([
        StructField("lsn", LongType()),
        StructField("op", StringType()),
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ])
    ev_dir = os.path.join(tdir, "events")
    events = corpus.select(
        F.col("doc_id").cast("long").alias("lsn"),
        F.lit("upsert").alias("op"),
        F.col("doc_id").cast("string").alias("doc_id"),
        "text", "source",
        (F.col("doc_id") % 2).alias("batch_id"),
    )
    events.write.partitionBy("batch_id").parquet(ev_dir)

    table_schema = StructType([
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ])
    root = os.path.join(tdir, "t")
    IceboxTable.create(spark, root, table_schema, n_buckets=2)

    def tokenize(df):
        enc = bpe_encode(df, model, text_col="text", out_col="tokens")
        return enc.withColumn(
            "n_tok", F.size("tokens").cast("int")
        ).drop("text")

    ckpt = os.path.join(tdir, "ckpt")
    run_stream(spark, ev_dir, raw_schema, root, ckpt,
               max_files_per_trigger=1, merge_strategy="delta",
               event_transform=tokenize)
    t = IceboxTable.load(spark, root)
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert len(rows) == 40
    src = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for d in ("0", "13"):
        got = bpe_decode_ids(list(rows[d]["tokens"]), model["vocab"])
        assert got == "".join(src[int(d)].split())
    # restart with the same checkpoint: byte-identical table state
    sid = t.snapshot_id
    run_stream(spark, ev_dir, raw_schema, root, ckpt,
               max_files_per_trigger=1, merge_strategy="delta",
               event_transform=tokenize)
    assert IceboxTable.load(spark, root).snapshot_id == sid


def test_quality_gate_reduces_and_cdc_merges_on_top(spark, tdir):
    docs = _docs(spark, n=60, n_dup_pairs=0).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    root = os.path.join(tdir, "t")
    t, model = tokenize_corpus(
        spark, docs, root, n_merges=10, quality_rate=0.6, n_buckets=2,
    )
    n = t.read().count()
    assert 0 < n < 60
    # the landed table ingests CDC updates like any spine table
    from data_pipeline_spark.cdc.apply import apply_batch

    some_doc = t.read().select("doc_id").first()["doc_id"]
    ev = spark.createDataFrame(
        [(1_000, "update", some_doc, [1, 2, 3], 3, "srcX", "train")],
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, split string",
    )
    t2 = apply_batch(t, ev, batch_id=1)
    row = t2.read(keys=[some_doc]).first()
    assert list(row["tokens"]) == [1, 2, 3] and row["source"] == "srcX"
