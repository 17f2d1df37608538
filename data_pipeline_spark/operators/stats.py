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


def corpus_stats_checked(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    distinct_col: str = "lang",
) -> DataFrame:
    """Driver-row composition covering BOTH stats paths (VERDICT r4 #7).

    Two families in one result: part='exact' is corpus_stats verbatim;
    part='sketch' runs corpus_stats_approx and emits, per sketched
    column, the EXACT value when the sketch lands within its error
    bound and the RAW SKETCH value when it does not. The DuckDB oracle
    produces the exact values for both families — so a sketch that
    violates its bound surfaces as a driver value mismatch instead of
    passing silently, without asking DuckDB to reproduce a
    Spark-internal sketch bit-for-bit.

    Bounds (same contract test_stats pins): p50/p95 within
    max(5% of the group's value span, 1.0) — generous for
    accuracy=10⁴ at oracle scale; n_distinct within max(1, 5%) for
    HLL++ at rsd=0.02. count/sum/min/max/mean are exact in both paths
    and are emitted from the sketch run directly (any drift there is a
    real bug and should mismatch).
    """
    exact = corpus_stats(df, group_col, value_col, distinct_col)
    approx = corpus_stats_approx(df, group_col, value_col, distinct_col)
    a, e = approx.alias("a"), exact.alias("e")
    span = F.col("e.vmax") - F.col("e.vmin")

    def _gated(col: str, bound):
        ok = F.abs(F.col(f"a.{col}") - F.col(f"e.{col}")) <= bound
        return F.when(ok, F.col(f"e.{col}")).otherwise(F.col(f"a.{col}")).alias(col)

    pct_bound = F.greatest(span.cast("double") * F.lit(0.05), F.lit(1.0))
    nd_bound = F.greatest(F.lit(1.0), F.col("e.n_distinct").cast("double") * F.lit(0.05))
    sketch = a.join(e, F.col(f"a.{group_col}") == F.col(f"e.{group_col}")).select(
        F.lit("sketch").alias("part"),
        F.col(f"a.{group_col}").alias(group_col),
        F.col("a.n_docs").alias("n_docs"),
        F.col("a.total").alias("total"),
        F.col("a.vmin").alias("vmin"),
        F.col("a.vmax").alias("vmax"),
        F.col("a.vmean").alias("vmean"),
        _gated("p50", pct_bound),
        _gated("p95", pct_bound),
        F.when(
            F.abs(F.col("a.n_distinct") - F.col("e.n_distinct")) <= nd_bound,
            F.col("e.n_distinct"),
        ).otherwise(F.col("a.n_distinct")).alias("n_distinct"),
    )
    return exact.select(F.lit("exact").alias("part"), "*").unionByName(sketch)


def stats_checked_sql(
    table: str = "documents",
    group_col: str = "source",
    value_col: str = "n_chars",
    distinct_col: str = "lang",
) -> str:
    """DuckDB twin of corpus_stats_checked: the exact profile under both
    part labels (an in-bounds sketch run collapses to exact values)."""
    base = stats_sql(table, group_col, value_col, distinct_col)
    return (
        f"WITH s AS ({base})\n"
        "SELECT 'exact' AS part, * FROM s\n"
        "UNION ALL\n"
        "SELECT 'sketch' AS part, * FROM s"
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
