"""Z-order selective-read benchmark: wall-clock for a 10% band
predicate on the SECOND clustered column, linear-sorted table vs
z-ordered table (same rows, same file count).

The mechanism under test is parquet min/max skipping: the icebox read
pushes the band filter into the scans; a z-range file covers a small
box in both dims, so files/row groups outside the y band never
decompress their pages. A linear sort gives the second column
full-span stats in every file — nothing skips.

Usage: python BENCH/zorder_bench.py [n_rows] [n_buckets] [files_per_bucket]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from data_pipeline_spark.icebox import IceboxTable  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
FPB = int(sys.argv[3]) if len(sys.argv) > 3 else 8
TOK = 64  # payload width: makes page IO the cost being skipped


def build(spark, root, cluster_cols):
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("tokens", ArrayType(IntegerType())),
    ])
    df = (
        spark.range(N)
        .select(
            F.format_string("doc_%09d", "id").alias("doc_id"),
            (F.xxhash64("id", F.lit("x")) % 1000 + 1000) .cast("long")
            .alias("x"),
            (F.xxhash64("id", F.lit("y")) % 1000 + 1000).cast("long")
            .alias("y"),
            F.transform(
                F.sequence(F.lit(1), F.lit(TOK)),
                lambda i: (F.col("id") + i).cast("int"),
            ).alias("tokens"),
        )
    )
    t = IceboxTable.create(spark, root, schema, n_buckets=BUCKETS)
    t = t.overwrite_all(df)
    return t.rewrite_clustered(cluster_cols, files_per_bucket=FPB)


def timed(t, col, lo, hi, reps=3):
    best = []
    for _ in range(reps):
        s = time.time()
        n = t.read(where=[(col, ">=", lo), (col, "<=", hi)]).agg(
            F.count(F.lit(1))
        ).first()[0]
        best.append(time.time() - s)
    return n, sorted(best)[len(best) // 2]


def main():
    spark = get_spark(
        "zorder_bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    d = tempfile.mkdtemp(prefix="zb_")
    try:
        lin = build(spark, os.path.join(d, "lin"), ["x"])
        zt = build(spark, os.path.join(d, "z"), ["x", "y"])
        lo, hi = 1450, 1549  # ~10% of the 1000..1999 domain
        # warm page cache + JIT on an unrelated full count
        lin.read().agg(F.count(F.lit(1))).first()
        zt.read().agg(F.count(F.lit(1))).first()
        n1, lin_y = timed(lin, "y", lo, hi)
        n2, z_y = timed(zt, "y", lo, hi)
        n3, lin_x = timed(lin, "x", lo, hi)
        n4, z_x = timed(zt, "x", lo, hi)
        assert n1 == n2 and n3 == n4, (n1, n2, n3, n4)
        print(json.dumps({
            "n_rows": N, "n_buckets": BUCKETS, "files_per_bucket": FPB,
            "band_rows_y": n1, "band_rows_x": n3,
            "sec": {"linear_y": round(lin_y, 3), "zorder_y": round(z_y, 3),
                    "linear_x": round(lin_x, 3), "zorder_x": round(z_x, 3)},
            "speedup_second_col": round(lin_y / z_y, 2),
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
