"""Publish sinks: the engine's analog of the reference's output stages.

The reference publishes line-delimited JSON — one GeoJSON Feature per
line (/root/reference/README.md:18-20) — re-partitioned into a
``state=<state>/<grid4>.txt`` directory layout
(/root/reference/grid-and-attrs/app.js:53-69), then packages per-county
outputs into compressed archives for download
(/root/reference/citygml/build-citygml.sh:37; ~40k buildings per file,
Main.java:27). ``export_jsonl`` is that publish step Spark-first:

* line-delimited JSON (``spark.write.json`` — one record per line, the
  reference's exact wire shape), gzip-compressed per file (the idiomatic
  Spark container for a compressed text shard; the reference's zip is a
  download container, not a data format — a zip member cannot be written
  or read split-parallel, gzip shards can be listed/globbed/streamed the
  same way its per-county zips are);
* ``partition_cols`` → Hive-style ``col=value/`` directories (the
  ``state=<state>`` layout, and what Athena-style DDL registers,
  /root/reference/athena-schema/buildings.sql:13-15);
* ``max_records_per_file`` caps records per shard (the reference's 40k
  chunk contract) WITHOUT a repartition: the per-write option rides the
  existing partitioning, so the export adds zero exchanges beyond the
  optional partition clustering.

100 TB shape: the export is one pass over the table — no shuffle unless
``partition_cols`` is set (then exactly one exchange to cluster writers
per partition dir, avoiding the tasks×partitions small-file explosion);
record caps split files locally. Reading back is ``spark.read.json``
with an explicit schema (schema-on-read, the reference's map<string,
string> posture, athena-schema/footprints.sql:3-4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def export_jsonl(
    df: DataFrame,
    out_dir: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 40_000,
    compression: str = "gzip",
    mode: str = "overwrite",
) -> None:
    """Publish `df` as partitioned, chunked, compressed JSON-lines shards.

    Array/struct columns serialize natively (token arrays stay JSON
    arrays); the output round-trips through ``spark.read.json`` with the
    source schema.
    """
    if partition_cols:
        # one exchange: cluster each partition dir's rows onto few
        # writers, so a p-partition export writes O(p) files per record
        # cap, not O(tasks × p)
        df = df.repartition(*[F.col(c) for c in partition_cols])
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(int(max_records_per_file)))
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.json(out_dir)
