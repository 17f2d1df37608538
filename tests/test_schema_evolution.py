"""Schema-evolution suite (SURVEY §5.2 suite 4): mid-log column add
(`source`) and type widen (`n_tok` int32→int64); old snapshots stay
readable; final state matches the oracle.

Reference analog: the Try(properties.height) probe-and-backfill
(/root/reference/footprint-res/resolve-footprints.scala:84) and
lowercase key normalization
(/root/reference/grid-and-attrs/footprint.js:161-164)."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_pipeline_spark.cdc import apply_batch
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox import IceboxTable

from .oracle import assert_tables_equal, replay_oracle

NARROW_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
    ]
)


def test_column_add_and_widen_mid_log(spark, tdir):
    root = os.path.join(tdir, "t")
    t = IceboxTable.create(spark, root, NARROW_SCHEMA, n_buckets=8)

    # batch 0: no `source` column, n_tok int32
    b0 = gen_event_log(spark, n_events=400, n_docs=80, batch_size=400,
                       with_source=False, partitions=4)
    t = apply_batch(t, b0, 0)
    snap_narrow = t.snapshot_id
    assert "source" not in [f.name for f in t.schema.fields]

    # batch 1: adds `source`, widens n_tok to int64
    b1 = gen_event_log(spark, n_events=400, n_docs=80, batch_size=400,
                       with_source=True, partitions=4)
    b1 = b1.withColumn("lsn", F.col("lsn") + F.lit(400)).withColumn(
        "batch_id", F.lit(1)
    ).withColumn("n_tok", F.col("n_tok").cast("long"))
    t = apply_batch(t, b1, 1)

    fields = {f.name: f.dataType for f in t.schema.fields}
    assert isinstance(fields["n_tok"], LongType)
    assert "source" in fields

    # old snapshot still readable with ITS schema (time travel unaffected)
    old = IceboxTable.load(spark, root, snapshot_id=snap_narrow)
    assert "source" not in old.read().columns

    # final state == oracle over the concatenated log with source
    # backfilled as null for batch-0 events
    log_pd = pd.concat(
        [b0.toPandas().assign(source=None), b1.toPandas()], ignore_index=True
    )
    expected = replay_oracle(log_pd, ["doc_id", "tokens", "n_tok", "source"])
    expected["n_tok"] = expected["n_tok"].astype("int64")
    got = t.read().toPandas()
    assert_tables_equal(got[list(expected.columns)], expected)


def test_uppercase_event_columns_normalized(spark, tdir):
    """Events with shouting column names are lowered before apply."""
    root = os.path.join(tdir, "t")
    t = IceboxTable.create(spark, root, NARROW_SCHEMA, n_buckets=4)
    df = spark.createDataFrame(
        [(0, 0, "insert", "a", [1, 2], 2)],
        "LSN long, BATCH_ID int, OP string, DOC_ID string, TOKENS array<int>, N_TOK int",
    )
    t = apply_batch(t, df, 0)
    row = t.read().collect()[0]
    assert row["doc_id"] == "a" and row["tokens"] == [1, 2]


def test_illegal_narrowing_rejected(spark, tdir):
    from data_pipeline_spark.icebox import SchemaEvolutionError
    import pytest

    root = os.path.join(tdir, "t")
    t = IceboxTable.create(spark, root, NARROW_SCHEMA, n_buckets=4)
    bad = spark.createDataFrame(
        [(0, 0, "insert", "a", "oops", 1)],
        "lsn long, batch_id int, op string, doc_id string, tokens string, n_tok int",
    )
    with pytest.raises(SchemaEvolutionError):
        apply_batch(t, bad, 0)
