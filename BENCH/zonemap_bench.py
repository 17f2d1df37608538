"""Zone-map pruning: selective-scan latency with manifest column bounds
ON (normal) vs OFF (col_bounds stripped from the in-memory manifest —
the pre-zone-map behavior).

Shape: one immutable `source` column correlated with the ingest batch
(each delta commit carries exactly one source — the natural 100 TB CDC
shape where a feed's batches are per-upstream or per-day). A read
filtered to ONE source must, with bounds, open only that batch's delta
files (prune_plan's immutable FILE rule skips the other commits
driver-side, zero file opens); without bounds every delta feeds the LWW
aggregate.

Usage: python BENCH/zonemap_bench.py [n_batches] [rows_per_batch] [reps]
       (defaults: 24 50000 5)
Prints one JSON line per level.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark(
        "zonemap_bench", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    from data_pipeline_spark.icebox import IceboxTable

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("grade", IntegerType()),
            StructField("source", StringType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="zonemap_bench_")
    t = IceboxTable.create(
        spark, os.path.join(work, "t"), schema, n_buckets=16,
        immutable_cols=["source"],
    )
    for bi in range(n_batches):
        df = (
            spark.range(rows)
            .select(
                F.format_string(f"doc_{bi}_%07d", F.col("id")).alias("doc_id"),
                F.col("id").cast("int").alias("grade"),
                F.lit(f"src{bi}").alias("source"),
                (F.lit(bi) * rows + F.col("id")).alias("_lsn"),
                F.lit(False).alias("_tombstone"),
            )
            .withColumn("_b", t.bucket_of())
        )
        br = {r["_b"]: r["n"] for r in
              df.groupBy("_b").agg(F.count("*").alias("n")).collect()}
        t = t.commit_delta(df, br, collect_stats=True)

    where = [("source", "=", "src0")]

    def timed(tbl) -> float:
        t0 = time.perf_counter()
        n = tbl.read(where=where).count()
        assert n == rows, n
        return time.perf_counter() - t0

    stripped_manifest = {
        **t.manifest,
        "deltas": [
            {k: v for k, v in d.items() if k != "col_bounds"}
            for d in t.manifest["deltas"]
        ],
    }
    t_off = IceboxTable(spark, t.root, stripped_manifest)

    for tbl, label in ((t, "bounds_on"), (t_off, "bounds_off")):
        timed(tbl)  # warmup
    on = [timed(t) for _ in range(reps)]
    off = [timed(t_off) for _ in range(reps)]
    zp = t.prune_plan(where)
    print(json.dumps({
        "n_batches": n_batches, "rows_per_batch": rows, "reps": reps,
        "deltas_skipped": len(zp["dead_deltas"]),
        "sec_bounds_on": round(statistics.median(on), 3),
        "sec_bounds_off": round(statistics.median(off), 3),
        "speedup": round(statistics.median(off) / statistics.median(on), 2),
    }))


if __name__ == "__main__":
    main()
