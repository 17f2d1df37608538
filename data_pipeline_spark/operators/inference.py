"""Model batch inference (SURVEY.md §2 F26): vectorized scoring of a
pre-trained model over a DataFrame, and the reference's
impute-missing-with-prediction semantic.

Reference parity: footprint-res loads a RandomForest PipelineModel and
runs .transform(df) to predict building heights
(/root/reference/footprint-res/resolve-footprints.scala:23-24,99), then
keeps the measured height when present and the rounded prediction
otherwise (`when(provided).otherwise(round(prediction, 2))`, :100-102).
The training-pipeline twin is model-based quality/length scoring with
the same coalesce.

Engine design:
  * the model is a fixed-parameter REGRESSION TREE — pure comparisons,
    linear leaves with dyadic (power-of-two-sum) coefficients. That makes
    scoring bit-exact in IEEE-754 and therefore replayable by any
    external oracle (no transcendentals, no rounding ambiguity);
  * scoring runs as an Arrow-batched pandas UDF over numpy arrays — the
    PipelineModel.transform twin: per-BATCH vectorized, never per-row
    Python. A real sklearn/xgboost model drops into the same udf shape
    (swap _eval_tree for model.predict);
  * tree_sql() emits the CASE-expression twin so the Spark path and any
    SQL engine score identically — the lockstep contract every portable
    function in this package follows (functions/portable.py).

Node grammar (plain tuples, JSON-serializable):
  ("split", feat_idx, threshold, left, right)   -- goes left iff x < thr
  ("linear", feat_idx, coef, intercept)         -- coef * x + intercept
  ("const", value)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf

# Default token-count estimator: predicts a document's token count from
# (n_chars, n_punct). Coefficients are multiples of 1/4 and features are
# integers, so every prediction is an exact multiple of 0.25 — round(p,2)
# is the identity and can never split engines on a halfway case.
DEFAULT_TREE = (
    "split", 0, 256.0,
    ("split", 1, 8.0,
        ("linear", 0, 0.25, 0.0),
        ("linear", 0, 0.25, 4.0)),
    ("split", 0, 512.0,
        ("linear", 0, 0.25, 8.0),
        ("linear", 0, 0.5, -64.0)),
)


def _eval_tree(node: tuple, X: list[np.ndarray]) -> np.ndarray:
    kind = node[0]
    if kind == "const":
        return np.full_like(X[0], float(node[1]))
    if kind == "linear":
        _, fi, coef, b = node
        return coef * X[fi] + b
    _, fi, thr, left, right = node
    return np.where(X[fi] < thr, _eval_tree(left, X), _eval_tree(right, X))


def tree_scorer(tree: tuple = DEFAULT_TREE):
    """Arrow-batched scoring UDF: score(*feature_cols) -> double column.

    The whole batch is evaluated as numpy array arithmetic (np.where over
    vectorized comparisons) — one Python invocation per Arrow batch, zero
    per-row work, the same execution shape a PipelineModel.transform or
    sklearn predict() would have."""

    @pandas_udf("double")
    def score(*cols: pd.Series) -> pd.Series:
        X = [c.to_numpy(dtype="float64") for c in cols]
        return pd.Series(_eval_tree(tree, X))

    return score


def tree_sql(tree: tuple, feature_exprs: list[str]) -> str:
    """The model as a SQL CASE expression over the given feature
    expressions — generated from the SAME tree object the UDF scores, so
    the two can never drift."""
    kind = tree[0]
    if kind == "const":
        return repr(float(tree[1]))
    if kind == "linear":
        _, fi, coef, b = tree
        return f"({coef!r} * {feature_exprs[fi]} + {b!r})"
    _, fi, thr, left, right = tree
    return (
        f"CASE WHEN {feature_exprs[fi]} < {thr!r} "
        f"THEN {tree_sql(left, feature_exprs)} "
        f"ELSE {tree_sql(right, feature_exprs)} END"
    )


def predict(df: DataFrame, features: list[str], tree: tuple = DEFAULT_TREE,
            out: str = "prediction") -> DataFrame:
    """Pure batch inference: append the model's prediction column."""
    score = tree_scorer(tree)
    return df.withColumn(out, score(*[F.col(f).cast("double") for f in features]))


def impute_with_model(
    df: DataFrame,
    provided: Column,
    features: list[str],
    tree: tuple = DEFAULT_TREE,
    out: str = "imputed",
) -> DataFrame:
    """The reference's resolve-footprints semantic (scala:99-102): keep
    the measured value where present, backfill the rounded model
    prediction elsewhere, and record which path produced each row."""
    score = tree_scorer(tree)
    pred = score(*[F.col(f).cast("double") for f in features])
    return df.withColumn(
        out,
        F.when(provided.isNotNull(), provided.cast("double")).otherwise(
            F.round(pred, 2)
        ),
    ).withColumn(
        f"{out}_source",
        F.when(provided.isNotNull(), F.lit("measured")).otherwise(F.lit("model")),
    )
