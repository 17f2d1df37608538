"""SQL surface: view registration (current + time travel) and the
MERGE INTO equivalent driven entirely through spark.sql."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_pipeline_spark.icebox import IceboxTable
from data_pipeline_spark.sql import merge_into, register

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
    ]
)

EV_SCHEMA = StructType(
    [
        StructField("lsn", LongType()),
        StructField("op", StringType()),
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
    ]
)


def test_sql_select_over_registered_view(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=4)
    t = t.overwrite_all(
        spark.createDataFrame([(f"d{i}", [i], 1) for i in range(30)], SCHEMA)
    )
    register(t, "sql_t")
    got = spark.sql(
        "SELECT count(*) AS n, sum(n_tok) AS s FROM sql_t WHERE doc_id >= 'd2'"
    ).collect()[0]
    assert (got["n"], got["s"]) == (18, 18)  # d2, d20..d29, d3..d9


def test_merge_into_sql_recipe(spark, tdir):
    """The documented MERGE INTO mapping: change events produced by a SQL
    query, applied through the engine's LWW path, visible to SQL."""
    t = IceboxTable.create(spark, os.path.join(tdir, "tm"), SCHEMA, n_buckets=4)
    t = t.overwrite_all(
        spark.createDataFrame([("a", [1], 1), ("b", [2], 1)], SCHEMA)
    )
    ev = spark.createDataFrame(
        [
            (10, "update", "a", [9, 9], 2),  # WHEN MATCHED UPDATE
            (11, "delete", "b", None, None),  # WHEN MATCHED DELETE
            (12, "insert", "c", [3], 1),  # WHEN NOT MATCHED INSERT
        ],
        EV_SCHEMA,
    )
    ev.createOrReplaceTempView("changes")
    t = merge_into(t, spark, "SELECT * FROM changes", batch_id=1)
    register(t, "sql_tm")
    got = {
        r["doc_id"]: r["tokens"]
        for r in spark.sql("SELECT doc_id, tokens FROM sql_tm").collect()
    }
    assert got == {"a": [9, 9], "c": [3]}
    # idempotent replay through the SQL recipe too
    sid = t.snapshot_id
    t = merge_into(t, spark, "SELECT * FROM changes", batch_id=1)
    assert t.snapshot_id == sid


def test_register_time_travel(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "tt"), SCHEMA, n_buckets=4)
    t = t.overwrite_all(spark.createDataFrame([("a", [1], 1)], SCHEMA))
    s1 = t.snapshot_id
    t = t.overwrite_all(
        spark.createDataFrame([("a", [2], 1), ("b", [3], 1)], SCHEMA)
    )
    register(t, "cur")
    register(t, "asof", snapshot_id=s1)
    assert spark.sql("SELECT count(*) n FROM cur").collect()[0]["n"] == 2
    assert spark.sql("SELECT count(*) n FROM asof").collect()[0]["n"] == 1
    assert spark.sql("SELECT tokens FROM asof").collect()[0]["tokens"] == [1]
