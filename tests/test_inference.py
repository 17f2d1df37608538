"""F26 model batch inference: tree scorer parity with a pure-python
reference, the impute coalesce semantic, and the UDF's vectorized shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_pipeline_spark.operators import inference as I


def _ref_score(x0: float, x1: float) -> float:
    # DEFAULT_TREE evaluated by hand
    if x0 < 256.0:
        return 0.25 * x0 + (0.0 if x1 < 8.0 else 4.0)
    return 0.25 * x0 + 8.0 if x0 < 512.0 else 0.5 * x0 - 64.0


def test_tree_scorer_matches_reference(spark):
    df = spark.range(0, 500).select(
        "id",
        ((F.col("id") * 7) % 900).cast("double").alias("x0"),
        (F.col("id") % 20).cast("double").alias("x1"),
    )
    got = {r["id"]: r["prediction"] for r in I.predict(df, ["x0", "x1"]).collect()}
    for i in range(500):
        assert got[i] == _ref_score(float(i * 7 % 900), float(i % 20)), i


def test_tree_sql_is_lockstep_with_udf(spark):
    """tree_sql is generated from the SAME tree the UDF scores — DuckDB
    evaluating it must produce identical values."""
    import duckdb

    sql = I.tree_sql(I.DEFAULT_TREE, ["x0", "x1"])
    rows = duckdb.sql(
        f"SELECT i, {sql} AS p FROM (SELECT range AS i, "
        f"CAST((range * 7) % 900 AS DOUBLE) AS x0, "
        f"CAST(range % 20 AS DOUBLE) AS x1 FROM range(0, 500))"
    ).fetchall()
    for i, p in rows:
        assert p == _ref_score(float(i * 7 % 900), float(i % 20)), i


def test_impute_coalesce_semantic(spark):
    """when(provided).otherwise(round(prediction, 2)) — the reference's
    resolve-footprints.scala:99-102 behavior."""
    df = spark.createDataFrame(
        [(1, 100.0, 2.0, 77.0), (2, 100.0, 2.0, None), (3, 600.0, 9.0, None)],
        "id long, x0 double, x1 double, measured double",
    )
    out = {
        r["id"]: (r["v"], r["v_source"])
        for r in I.impute_with_model(
            df, F.col("measured"), ["x0", "x1"], out="v"
        ).collect()
    }
    assert out[1] == (77.0, "measured")  # provided wins untouched
    assert out[2] == (25.0, "model")  # 0.25 * 100
    assert out[3] == (236.0, "model")  # 0.5 * 600 - 64


def test_predictions_are_exact_quarters(spark):
    """Every model output is a multiple of 0.25 by construction, so
    round(p, 2) can never hit an engine-dependent halfway case."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 997).cast("double").alias("x0"),
        (F.col("id") % 23).cast("double").alias("x1"),
    )
    preds = [r["prediction"] for r in I.predict(df, ["x0", "x1"]).collect()]
    assert all(p * 4 == int(p * 4) for p in preds)
