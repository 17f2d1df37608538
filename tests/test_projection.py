"""Column projection pushed through the MoR merge (read(columns=)):
the narrowed payload struct lets Catalyst prune the heavy columns out of
delta scans that the full-struct LWW aggregate would otherwise force."""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from data_pipeline_spark.icebox.table import IceboxTable

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)


def _mor_table(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2)
    for bi in range(2):  # two deltas -> every read goes through the agg
        df = spark.range(60).select(
            F.format_string("d%d", F.col("id")).alias("doc_id"),
            F.array(F.lit(bi), F.col("id").cast("int")).alias("tokens"),
            (F.col("id") + bi).cast("int").alias("n_tok"),
            F.lit(f"s{bi}").alias("source"),
            (F.lit(bi) * 1000 + F.col("id")).alias("_lsn"),
            F.lit(False).alias("_tombstone"),
        ).withColumn("_b", t.bucket_of())
        br = {r["_b"]: r["n"] for r in
              df.groupBy("_b").agg(F.count("*").alias("n")).collect()}
        t = t.commit_delta(df, br, collect_stats=True)
    return t


def _scan_cols(df) -> set[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    cols = set()
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", plan):
        cols |= {c.split("#")[0] for c in m.group(1).split(",")}
    return cols


def test_projection_prunes_mor_scans_and_matches_select(spark, tdir):
    t = _mor_table(spark, tdir)
    full = _scan_cols(t.read().select("doc_id", "n_tok"))
    assert "tokens" in full, "baseline: full-struct agg forces tokens read"
    proj = t.read(columns=["doc_id", "n_tok"])
    assert "tokens" not in _scan_cols(proj)
    got = sorted(map(tuple, proj.collect()))
    want = sorted(map(tuple, t.read().select("doc_id", "n_tok").collect()))
    assert got == want and len(got) == 60


def test_projection_composes_with_where_and_keys(spark, tdir):
    t = _mor_table(spark, tdir)
    # where-column rides along for the filter but is dropped from output
    df = t.read(columns=["doc_id"], where=[("n_tok", ">=", 58)])
    assert df.columns == ["doc_id"]
    assert "tokens" not in _scan_cols(df)
    want = [r["doc_id"] for r in
            t.read().filter(F.col("n_tok") >= 58).select("doc_id").collect()]
    assert sorted(r["doc_id"] for r in df.collect()) == sorted(want)
    # lookup narrows too; key always survives
    row = t.lookup(["d7"], columns=["n_tok"]).collect()
    assert len(row) == 1 and row[0]["n_tok"] == 8  # bi=1 wins: 7+1
    with pytest.raises(ValueError, match="unknown columns"):
        t.read(columns=["nope"])


def test_projection_with_schema_evolution(spark, tdir):
    t = _mor_table(spark, tdir)
    t = t.rename_column("n_tok", "len_tok")
    got = sorted(map(tuple, t.read(columns=["doc_id", "len_tok"]).collect()))
    want = sorted(map(tuple,
                      t.read().select("doc_id", "len_tok").collect()))
    assert got == want


def test_sql_view_with_where_and_columns(spark, tdir):
    from data_pipeline_spark.sql import register

    t = _mor_table(spark, tdir)
    register(t, "docs_narrow", where=[("n_tok", ">=", 58)],
             columns=["doc_id", "n_tok"])
    got = spark.sql(
        "SELECT doc_id, n_tok FROM docs_narrow ORDER BY doc_id"
    ).collect()
    want = (t.read().filter(F.col("n_tok") >= 58)
            .select("doc_id", "n_tok").orderBy("doc_id").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert "tokens" not in _scan_cols(spark.table("docs_narrow"))
