"""Point-lookup latency vs accumulated delta commits.

Measures `IceboxTable.lookup()` on a merge-on-read table as delta
commits pile up, with the manifest per-(delta, bucket) key bounds ON
(normal) and OFF (bounds stripped from the in-memory manifest — the
pre-bounds behavior). Keys are drawn from ONE early batch, so with
bounds most later deltas are skipped driver-side; without bounds every
delta is scanned + fed through the LWW aggregate.

This is the read-side story for the documented MoR read-tax trade
(BENCH/BASELINE.md): compaction bounds the FULL-scan cost, key bounds
bound the POINT-lookup cost, so lookups stay fast even between
compactions.

Usage: python BENCH/lookup_bench.py [n_batches] [rows_per_batch] [reps]
       (defaults: 24 20000 5)
Prints one JSON line per delta-count level.
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
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark(
        "lookup_bench", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    from data_pipeline_spark.cdc import apply_batch
    from data_pipeline_spark.icebox import IceboxTable

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("tokens", ArrayType(IntegerType())),
            StructField("n_tok", IntegerType()),
        ]
    )

    def batch(bi: int):
        # each batch owns a disjoint key range -> realistic mostly-new-key
        # CDC tail; bounds make later deltas skippable for early keys
        lsn0 = bi * rows
        return spark.createDataFrame(
            [
                (lsn0 + i, "upsert", f"doc_{bi:04d}_{i:06d}", [i % 97], 1)
                for i in range(rows)
            ],
            "lsn long, op string, doc_id string, tokens array<int>, n_tok int",
        )

    work = tempfile.mkdtemp(prefix="lkb_")
    t = IceboxTable.create(spark, os.path.join(work, "t"), schema, n_buckets=16)
    probe = [f"doc_{0:04d}_{i:06d}" for i in (7, 4242, 19_999 % rows)]

    def timed_lookup(tbl) -> float:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n = tbl.lookup(probe).count()
            samples.append(time.perf_counter() - t0)
            assert n == len(probe), n
        return statistics.median(samples)

    for bi in range(n_batches):
        t = apply_batch(t, batch(bi), bi, merge_strategy="delta")
        if (bi + 1) in (1, 4, 8, 16, n_batches):
            with_bounds = timed_lookup(t)
            # strip bounds in-memory -> the pre-bounds read path
            stripped = IceboxTable.load(spark, t.root)
            for d in stripped.manifest.get("deltas") or []:
                d.pop("key_bounds", None)
            without_bounds = timed_lookup(stripped)
            print(
                json.dumps(
                    {
                        "deltas": bi + 1,
                        "lookup_sec_with_bounds": round(with_bounds, 4),
                        "lookup_sec_without_bounds": round(without_bounds, 4),
                        "speedup": round(without_bounds / with_bounds, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
