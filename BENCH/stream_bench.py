"""Structured-Streaming path throughput: tail a binlog directory through
run_stream (foreachBatch → exactly-once icebox commits) and report
events/sec end-to-end, including epoch scheduling and checkpointing.

Usage: python BENCH/stream_bench.py [events] [files_per_trigger] [strategy]
(strategy: auto = copy-on-write; delta = merge-on-read with inline
compaction at ratio 0.5 — the steady-state production shape)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_pipeline_spark.cdc.stream import run_stream  # noqa: E402
from data_pipeline_spark.gen import gen_event_log  # noqa: E402
from data_pipeline_spark.icebox.table import IceboxTable  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as E  # noqa: E402


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    fpt = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    strategy = sys.argv[3] if len(sys.argv) > 3 else "auto"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "stream_bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        ev_dir = os.path.join(work, "events")
        gen_event_log(
            spark, n_events, max(n_events // 10, 1),
            batch_size=max(n_events // 8, 1), hot_frac=0.10,
        ).write.partitionBy("batch_id").parquet(ev_dir)
        schema = spark.read.parquet(ev_dir).schema
        IceboxTable.create(
            spark, os.path.join(work, "t"), E.BASE_SCHEMA, n_buckets=64
        )
        t0 = time.perf_counter()
        run_stream(
            spark, ev_dir, schema, os.path.join(work, "t"),
            os.path.join(work, "ckpt"), max_files_per_trigger=fpt,
            merge_strategy=strategy,
            compact_ratio=0.5 if strategy == "delta" else None,
        )
        el = time.perf_counter() - t0
        final = IceboxTable.load(spark, os.path.join(work, "t"))
        print(json.dumps({
            "metric": "stream_events_per_sec",
            "value": round(n_events / el, 1),
            "unit": "events/sec",
            "stream_sec": round(el, 2),
            "events": n_events,
            "epochs": final.snapshot_id,
            "files_per_trigger": fpt,
            "strategy": strategy,
            "cpus": cpus,
            "final_rows": final.read().count(),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
