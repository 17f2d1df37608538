"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition UP to the session's default parallelism when the input
    plan yields fewer partitions.

    Why: a small parquet file arrives as ONE split, which serializes
    expensive per-row work (md5 shingling, regex scoring) onto a single
    core — the sf0.1 documents table ran the whole MinHash pipeline
    1-task. At scale this is a no-op: 100 TB of input yields far more
    splits than cores, so no shuffle is ever added on the big path.

    CONSTRAINT: call this on scan-shaped inputs only (a plain file read,
    possibly filtered/projected). Under AQE, probing getNumPartitions on
    a plan containing exchanges/broadcasts EXECUTES those stages to
    finalize the adaptive plan — upstream joins would run twice. Every
    in-package call site passes the raw table scan.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
