"""data_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``opencitymodel/data-pipeline`` (reference at /root/reference, studied for
WHAT it computes only): keyed merge with dedup and conflict resolution,
schema normalization/evolution, partitioned lake layout, idempotent
versioned publishes, and per-run lineage counters — rebuilt as an
LSN-ordered change-event tail applied as MERGE upserts into a
snapshot-committed Parquet table ("icebox", Iceberg semantics without the
runtime jars), plus a Spark-first operator/query library.

Layout:
  icebox/     snapshot-committed table format (atomic manifests, schema
              evolution, time travel, bucket partition spec)
  cdc/        apply engine (LWW dedup, salted skew path, COW merge,
              exactly-once batch commits, streaming foreachBatch, lineage)
  operators/  relational + training-data operators (dedup, similarity,
              text analysis, multimodal plumbing)
  functions/  scalar expression library (built-in-first; pandas UDFs only
              where arrays demand it)
  sinks.py    publish sink (partitioned, record-capped, gzip JSON-lines)
"""

__version__ = "0.1.0"
