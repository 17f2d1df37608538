"""Apply a change-event batch to an icebox table (the MERGE heart).

Semantics (the engine's correctness contract, also implemented by the
pandas oracle in tests/oracle.py and by the DuckDB oracle SQL):

  * events carry (lsn:int64 unique monotone, op, doc_id, payload...);
  * within a batch, the winner per doc_id is the event with the highest
    (lsn, op_rank) — last-writer-wins; op_rank breaks redelivered-LSN ties
    deterministically (delete > upsert > update > insert);
  * a non-delete winner materializes its payload (Debezium-style log
    compaction: insert/update/upsert all set the row — valid binlogs never
    update a key that does not exist, and compaction of a valid log equals
    sequential replay);
  * a delete winner removes the key (a tombstone row with the delete's
    LSN is retained so late-arriving older events cannot resurrect it);
  * across batches, the merge is LWW on the row's stored _lsn vs the
    incoming winner's lsn — apply is therefore ORDER-INDEPENDENT over any
    partitioning of the log into micro-batches (the streaming file source
    does not guarantee LSN-ordered file delivery across epochs);
  * replaying a batch whose tag is already committed is a no-op
    (exactly-once).

This generalizes the reference's source-precedence fold — master rows win,
non-colliding newcomers union in
(/root/reference/footprint-res/resolve-footprints.scala:121-188) — with
LSN order replacing source order, and upgrades its arbitrary-winner
dropDuplicates (resolve-footprints.scala:96) to a deterministic window.

Scale design:
  * dedup is TWO-PHASE SALTED: phase 1 ranks within (doc_id, salt) so a
    hot key's events spread over `n_salts` tasks; phase 2 ranks the ≤
    n_salts per-key survivors. This is the reference's shifted-grid trick
    (resolve-footprints.scala:104-110,128-133) re-applied to hash salts.
  * the target scan is partition-pruned to the buckets the batch touches
    (the analog of the reference reading one cty= prefix,
    /root/reference/citygml/build-citygml.sh:37);
  * AQE picks broadcast for the winner side of the anti-join when the
    batch is small relative to the target;
  * driver work is O(#touched buckets) (one small collect of bucket ids).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import StructType

from ..icebox.table import LINEAGE_SCHEMA, IceboxTable

OP_RANK = {"insert": 0, "update": 1, "upsert": 2, "delete": 3}

_META_COLS = {"lsn", "batch_id", "op"}


def _op_rank_col():
    m = F.create_map(*[x for k, v in OP_RANK.items() for x in (F.lit(k), F.lit(v))])
    return m[F.col("op")]


def normalize_events(events: DataFrame, table: IceboxTable) -> DataFrame:
    """Schema normalization + evolution, reference-parity:

    * column names lowercased (footprint.js:161-164 lowercases property
      keys);
    * ops lowercased/validated;
    * payload columns unknown to the table are ADDED to the table schema
      (nullable), numeric widenings widen the table schema — the engine's
      version of the Try(properties.height) probe
      (resolve-footprints.scala:84);
    * payload columns the table has but the batch lacks are backfilled
      with typed nulls.
    Mutates `table`'s in-memory schema (persisted at next commit).
    """
    df = events.toDF(*[c.lower() for c in events.columns])
    payload_fields = [f for f in df.schema.fields if f.name not in _META_COLS]
    table.evolve_schema(StructType(payload_fields))
    schema = table.schema
    have = {f.name for f in df.schema.fields}
    cols = [F.col("lsn").cast("long").alias("lsn"), F.lower(F.col("op")).alias("op")]
    if "batch_id" in have:
        cols.append(F.col("batch_id").cast("int").alias("batch_id"))
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def lww_dedup(events: DataFrame, key: str = "doc_id", n_salts: int = 16) -> DataFrame:
    """Deterministic last-writer-wins: one row per key.

    Two-phase salted ranking (skew-proof):
      phase 1: row_number over (key, salt) — salt = pmod(xxhash64(lsn), S)
               spreads a hot key's events across S window partitions;
      phase 2: row_number over (key) on the ≤S survivors per key.
    Order: lsn DESC, op_rank DESC (redelivery-safe tie-break).
    """
    rank = _op_rank_col()
    if n_salts and n_salts > 1:
        salted = events.withColumn("_salt", F.pmod(F.xxhash64("lsn"), F.lit(n_salts)))
        w1 = Window.partitionBy(key, "_salt").orderBy(
            F.col("lsn").desc(), rank.desc()
        )
        survivors = (
            salted.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_salt")
        )
    else:
        survivors = events
    w2 = Window.partitionBy(key).orderBy(F.col("lsn").desc(), rank.desc())
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_batch(
    table: IceboxTable,
    events: DataFrame,
    batch_id: int | str,
    n_salts: int = 16,
    tag_prefix: str = "batch",
) -> IceboxTable:
    """Apply one change batch; returns the table at the new snapshot.

    Exactly-once: the commit is tagged `{tag_prefix}:{batch_id}`; if that
    tag is already committed the whole call is a no-op (idempotent replay
    from any checkpoint).
    """
    tag = f"{tag_prefix}:{batch_id}"
    if table.has_tag(tag):
        return table

    key = table.key
    ev = normalize_events(events, table).persist()
    winners = None
    try:
        winners = lww_dedup(ev, key=key, n_salts=n_salts).withColumn(
            "_b", table.bucket_of()
        ).persist()

        # partition pruning: only buckets the batch touches are read/rewritten
        touched = [r["_b"] for r in winners.select("_b").distinct().collect()]
        if not touched:
            return table.commit_rewrite(
                table.spark.createDataFrame([], _merged_schema(table)),
                [],
                tag=tag,
                summary={"operation": "merge", "events": 0},
            )

        cols = [f.name for f in table.schema.fields]
        # target rows (incl. tombstones) of touched buckets only — the
        # analog of the reference reading one cty= prefix
        target = (
            table.read(buckets=touched, internal=True)
            .withColumn("_b", table.bucket_of())
            .withColumn("_in", F.lit(0))
        )
        incoming = winners.select(
            *cols,
            "_b",
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "delete").alias("_tombstone"),
            F.lit(1).alias("_in"),
        )

        # MERGE as LWW across target ∪ batch, keyed on (_lsn, _in):
        # order-independent across micro-batches — a late-arriving older
        # event can never clobber newer state, and a retained tombstone
        # blocks resurrection. Single-shuffle plan: repartition by bucket,
        # then window over (_b, key) needs no further exchange (hash(_b)
        # clusters (_b, key)), and neither does the partitionBy(_b) write.
        merged_all = target.unionByName(incoming).repartition(
            max(len(touched), 1), "_b"
        )
        w = Window.partitionBy("_b", key).orderBy(
            F.col("_lsn").desc(), F.col("_in").desc()
        )
        merged = (
            merged_all.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_in")
        )

        lineage = _lineage(table, ev, winners, target, batch_id)
        return table.commit_rewrite(
            merged,
            touched,
            tag=tag,
            lineage=lineage,
            summary={"operation": "merge", "touched_buckets": len(touched)},
            repartition=False,
        )
    finally:
        ev.unpersist()
        if winners is not None:
            winners.unpersist()


def _merged_schema(table: IceboxTable) -> StructType:
    s = StructType([f for f in table.schema.fields])
    return StructType([*s.fields]).add("_b", "int")


def _lineage(
    table: IceboxTable,
    ev: DataFrame,
    winners: DataFrame,
    target: DataFrame,
    batch_id: int | str,
) -> DataFrame:
    """Per-bucket lineage metrics (events applied, upserts, deletes that
    actually removed a row, LSN watermark) — the engine's version of the
    reference's per-run counters
    (/root/reference/grid-and-attrs/app.js:136-141,171-177), computed
    distributed and committed atomically with the data."""
    key = table.key
    bid = int(batch_id) if str(batch_id).lstrip("-").isdigit() else -1

    raw = ev.withColumn("_b", table.bucket_of()).groupBy("_b").agg(
        F.count(F.lit(1)).alias("events_applied"),
        F.max("lsn").alias("lsn_watermark"),
    )
    ups = (
        winners.filter(F.col("op") != "delete")
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("rows_upserted"))
    )
    live_keys = target.filter(
        ~F.coalesce(F.col("_tombstone"), F.lit(False))
    ).select(key)
    dels = (
        winners.filter(F.col("op") == "delete")
        .join(live_keys, on=key, how="left_semi")
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("rows_deleted"))
    )
    out = (
        raw.join(ups, "_b", "left")
        .join(dels, "_b", "left")
        .select(
            F.lit(bid).cast("int").alias("batch_id"),
            F.col("_b").cast("int").alias("partition_id"),
            F.col("events_applied").cast("long"),
            F.coalesce("rows_upserted", F.lit(0)).cast("long").alias("rows_upserted"),
            F.coalesce("rows_deleted", F.lit(0)).cast("long").alias("rows_deleted"),
            F.col("lsn_watermark").cast("long"),
        )
    )
    return table.spark.createDataFrame(out.collect(), LINEAGE_SCHEMA)


def replay_log(
    table: IceboxTable,
    log: DataFrame,
    n_salts: int = 16,
) -> IceboxTable:
    """Batch-mode replay: apply the log's batches in batch_id order.

    Driver loop is O(#batches); each iteration is one distributed
    apply_batch. Used by tests and the bench; the streaming path in
    stream.py is the production shape.
    """
    batch_ids = sorted(
        r["batch_id"] for r in log.select("batch_id").distinct().collect()
    )
    for b in batch_ids:
        table = apply_batch(table, log.filter(F.col("batch_id") == b), b, n_salts=n_salts)
    return table
