"""Amortized-batch scaling pair: the production batch shape for the
north rule's N→4N criterion.

The 16M/4-batch protocol in scaling_bench.py deliberately exposes the
per-batch constant; a real 10^10-event deployment runs much larger
micro-batches, which amortize it. This script measures the same MoR
replay with production-size batches across local[k] levels, interleaved
reps, medians — the shape under which the ≥0.8 criterion is evaluated.

Usage: python BENCH/amortized_scaling.py [events] [reps] [levels] [n_batches] [mode]
       (defaults: 32000000 2 2,8 2 row; round-3 study: 64000000 2 2,8,32 4)

mode selects the merge engine under test (VERDICT r4 item 2 — the
columnar fold had never been in a scaling study):
  row       — replay_log row-LWW (the historical protocol)
  partial   — replay_log_partial column-level LWW over a sparsified log
  aggregate — replay_log_agg (tokens last / n_tok sum / source max)
For partial/aggregate the generated log has each payload column
independently withheld on ~1/3 of non-delete events (the sparse shape
those engines exist for); masking happens before the pre-timed parquet
write, so the timed region is the replay alone in every mode.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, tempfile, shutil
sys.path.insert(0, %(repo)r)
import pyspark.sql.functions as F
from data_pipeline_spark.session import get_spark

cpus = int(sys.argv[1]); n_events = int(sys.argv[2]); n_batches = int(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "row"
spark = get_spark(f"scale_big_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox.table import IceboxTable
from data_pipeline_spark.cdc.apply import replay_log
import __spark_entry__ as E
work = tempfile.mkdtemp(prefix=f"scaleb{cpus}_")
try:
    ev_dir = os.path.join(work, "ev")
    ev = gen_event_log(spark, n_events, n_events // 10,
                       batch_size=n_events // n_batches,
                       hot_frac=0.10)
    if mode != "row":
        # sparsify: withhold each payload column on ~1/3 of non-delete
        # events (keep tokens when all three would drop) — the input
        # shape the columnar engines exist for. Pre-timed: masking cost
        # lands in the parquet write below, not the measured replay.
        ls = F.col("lsn")
        kt = F.pmod(F.xxhash64(ls, F.lit("sp_tok")), F.lit(3)) != 0
        kn = F.pmod(F.xxhash64(ls, F.lit("sp_ntok")), F.lit(3)) != 0
        ks = F.pmod(F.xxhash64(ls, F.lit("sp_src")), F.lit(3)) != 0
        ev = ev.select(
            "lsn", "batch_id", "op", "doc_id",
            F.when(kt | (~kn & ~ks), F.col("tokens")).alias("tokens"),
            F.when(kn, F.col("n_tok")).alias("n_tok"),
            F.when(ks, F.col("source")).alias("source"),
        )
    ev.write.partitionBy("batch_id").parquet(ev_dir)
    table = IceboxTable.create(spark, os.path.join(work, "t"),
                               E.BASE_SCHEMA, n_buckets=64)
    log = spark.read.parquet(ev_dir)
    t0 = time.perf_counter()
    if mode == "partial":
        from data_pipeline_spark.cdc.partial import replay_log_partial
        table = replay_log_partial(table, log, merge_strategy="delta")
    elif mode == "aggregate":
        from data_pipeline_spark.cdc.aggregate import replay_log_agg
        table = replay_log_agg(
            table, log, {"tokens": "last", "n_tok": "sum", "source": "max"},
            merge_strategy="delta")
    else:
        table = replay_log(table, log, merge_strategy="delta")
    el = time.perf_counter() - t0
    assert table.read().count() > 0
    print("RESULT", el)
finally:
    shutil.rmtree(work, ignore_errors=True)
"""


def run_once(cpus: int, n: int, n_batches: int, mode: str = "row") -> float:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cpus), str(n),
         str(n_batches), mode],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    levels = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "2,8").split(",")]
    n_batches = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    mode = sys.argv[5] if len(sys.argv) > 5 else "row"
    res: dict[int, list[float]] = {k: [] for k in levels}
    for rep in range(reps):
        for k in levels:  # interleaved
            el = run_once(k, n, n_batches, mode)
            res[k].append(el)
            print(f"rep {rep} local[{k}] {mode}: {el:.1f}s ({n/el:,.0f} ev/s)",
                  file=sys.stderr)
    med = {k: statistics.median(v) for k, v in res.items()}
    out = {
        "n_events": n, "batches": n_batches, "mode": mode,
        "sec": {str(k): [round(x, 1) for x in v] for k, v in res.items()},
        "events_per_sec": {str(k): round(n / med[k], 1) for k in levels},
    }
    for lo, hi in zip(levels, levels[1:]):
        out[f"eff_{lo}_to_{hi}_raw"] = round(
            (n / med[hi]) / (n / med[lo]) / (hi / lo), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
