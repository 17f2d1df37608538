"""Inverted-index probe latency vs corpus growth.

Measures `InvertedIndex.docs_with()` as the indexed corpus grows
(batches of new docs folded in per refresh, index compacted — the
read-optimized steady state) against the naive alternative: a full
explode-and-filter over the source table
(`explode(tokens) == term`). The claim under test is the scale shape,
not a constant: the probe reads ONLY the probed terms' buckets (prefix
bucketing) plus pushed term predicates inside them, so probe latency
stays ~flat as the corpus multiplies, while the explode scan grows
linearly with corpus size.

Also reports refresh cost per batch — O(changed docs × terms/doc),
which should NOT grow with the standing corpus size.

Usage: python BENCH/index_bench.py [n_batches] [docs_per_batch] [reps]
       (defaults: 8 4000 5)
Prints one JSON line per corpus-size level.
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
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark(
        "index_bench", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    from data_pipeline_spark.cdc import apply_batch
    from data_pipeline_spark.icebox import IceboxTable
    from data_pipeline_spark.index import InvertedIndex

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("tokens", ArrayType(IntegerType())),
            StructField("n_tok", IntegerType()),
        ]
    )

    def batch(bi: int):
        # 48 deterministic pseudo-random tokens/doc from a 50k vocab —
        # the portable generator's shape at bench scale
        lsn0 = bi * docs
        return (
            spark.range(docs)
            .select(
                (F.lit(lsn0) + F.col("id")).alias("lsn"),
                F.lit("upsert").alias("op"),
                F.format_string(f"doc_{bi:04d}_%06d", "id").alias("doc_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(47)),
                    lambda j: F.pmod(
                        F.xxhash64(F.col("id"), j, F.lit(bi)), F.lit(50_257)
                    ).cast("int"),
                ).alias("tokens"),
                F.lit(48).alias("n_tok"),
            )
        )

    work = tempfile.mkdtemp(prefix="idxb_")
    t = IceboxTable.create(spark, os.path.join(work, "t"), schema, n_buckets=16)
    idx = InvertedIndex(spark, t, os.path.join(work, "idx"), n_buckets=32)

    def timed(fn) -> float:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return statistics.median(samples)

    probe = ["17", "4242", "31337"]
    for bi in range(n_batches):
        t = apply_batch(t, batch(bi), bi, merge_strategy="delta")
        idx.source = t
        r0 = time.perf_counter()
        idx.refresh()
        refresh_sec = time.perf_counter() - r0
        idx.maintain(compact_ratio=0.0)  # read-optimized steady state
        t = t.compact_if_needed(ratio=0.0)
        if (bi + 1) in (1, 2, 4, n_batches):
            n_docs = (bi + 1) * docs
            got = {"n": 0}

            def probe_idx():
                got["n"] = idx.docs_with(probe).count()

            def probe_scan():
                src = t.read(columns=["doc_id", "tokens"])
                n = (
                    src.select(
                        "doc_id",
                        F.explode(F.array_distinct("tokens")).alias("tm"),
                    )
                    .filter(F.col("tm").cast("string").isin(probe))
                    .count()
                )
                assert n == got["n"], (n, got["n"])

            idx_sec = timed(probe_idx)
            scan_sec = timed(probe_scan)
            print(
                json.dumps(
                    {
                        "corpus_docs": n_docs,
                        "postings": got["n"],
                        "probe_index_sec": round(idx_sec, 4),
                        "probe_scan_sec": round(scan_sec, 4),
                        "speedup": round(scan_sec / idx_sec, 2),
                        "refresh_sec_last_batch": round(refresh_sec, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
