"""Corpus profile statistics — exact and sketch-based.

The dataset-card numbers every training-data pipeline publishes per
source/domain: document counts, volume, and the length distribution
(median / tail percentiles). The reference computes the same class of
per-group counters batch-by-batch in its summarize step
(/root/reference/summarize/app.js:60-78, per-state counts and totals);
here they are one declarative aggregate with a distribution profile.

Two paths, same output shape:

* ``corpus_stats`` — EXACT: ``percentile()`` (Spark's exact interpolated
  percentile, the semantics of DuckDB's quantile_cont) and
  count(DISTINCT …). Exact percentiles buffer each group's values on the
  reducer — fine for the oracle gate and for low-cardinality group keys,
  and it is the DuckDB-checkable correctness anchor.
* ``corpus_stats_approx`` — the 100 TB path: ``percentile_approx`` (a
  bounded-error mergeable quantile sketch) and ``approx_count_distinct``
  (HyperLogLog++). Both are map-side partial aggregates — every executor
  folds its partition into a constant-size sketch and only sketches cross
  the wire, so reducer memory is O(sketch), not O(group). pytest pins the
  approx path to the exact one within the sketches' error bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PCTS = (0.5, 0.95)


def corpus_stats(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    distinct_col: str = "lang",
) -> DataFrame:
    """Exact per-group profile: count, volume, mean, p50/p95, distinct."""
    v = F.col(value_col)
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(v).alias("total"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.round(F.avg(v), 4).alias("vmean"),
        F.round(F.percentile(v, F.lit(PCTS[0])), 4).alias("p50"),
        F.round(F.percentile(v, F.lit(PCTS[1])), 4).alias("p95"),
        F.count_distinct(F.col(distinct_col)).alias("n_distinct"),
    )


def corpus_stats_approx(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    distinct_col: str = "lang",
    accuracy: int = 10_000,
    rsd: float = 0.02,
) -> DataFrame:
    """Sketch twin of corpus_stats: same columns, mergeable partials.

    accuracy: percentile_approx guarantee — rank error ≤ n/accuracy.
    rsd: approx_count_distinct relative standard deviation (HLL++).
    """
    v = F.col(value_col)
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(v).alias("total"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.round(F.avg(v), 4).alias("vmean"),
        F.percentile_approx(v, F.lit(PCTS[0]), F.lit(accuracy)).cast("double").alias("p50"),
        F.percentile_approx(v, F.lit(PCTS[1]), F.lit(accuracy)).cast("double").alias("p95"),
        F.approx_count_distinct(F.col(distinct_col), rsd).alias("n_distinct"),
    )


def stats_sql(
    table: str = "documents",
    group_col: str = "source",
    value_col: str = "n_chars",
    distinct_col: str = "lang",
) -> str:
    """DuckDB twin of corpus_stats (quantile_cont == Spark percentile).

    ``sum(int32)`` is HUGEINT in DuckDB (stringifies ``73327.0`` through
    pandas float64) but BIGINT in Spark (``73327``); the driver hashes
    stringified values, so the twin casts to BIGINT to match Spark's
    result type exactly.
    """
    return f"""
SELECT {group_col},
       count(*) AS n_docs,
       CAST(sum({value_col}) AS BIGINT) AS total,
       min({value_col}) AS vmin,
       max({value_col}) AS vmax,
       round(avg({value_col}), 4) AS vmean,
       round(quantile_cont({value_col}, {PCTS[0]}), 4) AS p50,
       round(quantile_cont({value_col}, {PCTS[1]}), 4) AS p95,
       count(DISTINCT {distinct_col}) AS n_distinct
FROM {table} GROUP BY {group_col}
"""
