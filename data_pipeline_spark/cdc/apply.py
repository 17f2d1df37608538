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

Scale design (what survives a 1000-executor / 100 TB target):

  * dedup strategies (identical results, tested against each other):
      - "agg" (apply default): one hash aggregate
        `max_by(payload, (lsn, op_rank))` per key. Tungsten's PARTIAL
        aggregation reduces every map partition to one candidate per key
        BEFORE the exchange — each map task acts as a salt bucket, so a
        hot key ships at most #map-tasks rows through the shuffle. This
        is the salted two-phase pattern executed by the engine itself,
        one exchange, no sort.
      - "window" (the explicit two-phase form): phase 1 ranks within
        (doc_id, salt), phase 2 ranks the ≤ n_salts survivors — the
        reference's shifted-grid trick
        (resolve-footprints.scala:104-110,128-133) re-applied to hash
        salts. Two exchanges + sorts; kept as the spec-literal path.
  * merge strategies:
      - "join" (chosen when the deduped batch is broadcastable — the
        steady-state CDC shape: small batch vs huge table): copy-on-write
        via `target LEFT JOIN broadcast(winners)` — the big side never
        shuffles and never sorts; additions come from a key-column-pruned
        anti probe. Zero exchanges over target data.
      - "shuffle" (batch ~ table size, e.g. initial backfill): union +
        one exchange on the bucket column + one per-bucket sort shared by
        the LWW window AND the partitioned, key-clustered write.
  * the target scan is partition-pruned to the buckets the batch touches
    (the analog of the reference reading one cty= prefix,
    /root/reference/citygml/build-citygml.sh:37);
  * driver work per batch is O(#touched buckets): two small collects
    (bucket stats, lineage) and an O(buckets) manifest write — never
    O(#events).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import StructType

from ..icebox.table import IceboxTable

OP_RANK = {"insert": 0, "update": 1, "upsert": 2, "delete": 3}

_META_COLS = {"lsn", "batch_id", "op"}

# above this many deduped rows the batch stops being broadcastable and the
# merge falls back to the shuffle plan (≈ ~100 MB of token rows); the
# broadcast build is serial driver work, so it must stay small
BROADCAST_ROW_LIMIT = 500_000
# the join plan only pays off when the batch is small relative to the
# table — otherwise shuffling both sides scales better with cores
JOIN_TABLE_RATIO = 4


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


def lww_dedup(
    events: DataFrame,
    key: str = "doc_id",
    n_salts: int = 16,
    strategy: str = "window",
) -> DataFrame:
    """Deterministic last-writer-wins: one row per key.

    strategy="window" — explicit two-phase salted ranking (skew-proof):
      phase 1: row_number over (key, salt) — salt = pmod(xxhash64(lsn), S)
               spreads a hot key's events across S window partitions;
      phase 2: row_number over (key) on the ≤S survivors per key.
    strategy="agg" — max_by hash aggregate; Tungsten partial aggregation
      performs phase 1 per map partition (no sort, one exchange). Same
      result (tests/test_dedup_lww.py asserts equivalence).
    Order: lsn DESC, op_rank DESC (redelivery-safe tie-break).
    """
    rank = _op_rank_col()
    if strategy == "agg":
        payload = F.struct(*[F.col(c) for c in events.columns])
        ordc = F.struct(F.col("lsn").alias("l"), rank.alias("r"))
        return (
            events.groupBy(key)
            .agg(F.max_by(payload, ordc).alias("_w"))
            .select("_w.*")
        )
    if n_salts and n_salts > 1:
        salted = events.withColumn("_salt", F.pmod(F.xxhash64("lsn"), F.lit(n_salts)))
        w1 = Window.partitionBy(key, "_salt").orderBy(F.col("lsn").desc(), rank.desc())
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
    dedup_strategy: str = "agg",
    merge_strategy: str = "auto",
) -> IceboxTable:
    """Apply one change batch; returns the table at the new snapshot.

    Exactly-once: the commit is tagged `{tag_prefix}:{batch_id}`; if that
    tag is already committed the whole call is a no-op (idempotent replay
    from any checkpoint).

    merge_strategy: "auto" broadcasts the deduped batch when it is small
    enough (steady-state CDC), else shuffles; "join"/"shuffle" force.
    """
    tag = f"{tag_prefix}:{batch_id}"
    if table.has_tag(tag):
        return table

    key = table.key
    ev = normalize_events(events, table).persist()
    winners = None
    ex = None
    try:
        winners = (
            lww_dedup(ev, key=key, n_salts=n_salts, strategy=dedup_strategy)
            .withColumn("_b", table.bucket_of())
            .persist()
        )

        # key-pruned existence probe: which winner keys already exist in
        # the target (parquet column pruning → reads only
        # key/_tombstone). Feeds the additions anti-join and the
        # rows_deleted counter. AQE broadcasts the small winner side.
        ex = (
            table.read(internal=True)
            .select(key, "_tombstone")
            .join(winners.select(key, "op", "_b"), key, "inner")
            .persist()
        )

        # ONE driver collect per batch: per-bucket event counts + LSN
        # watermarks (from raw events), winner/upsert counts (dedup
        # output — also the touched-bucket set for partition pruning and
        # the merge-strategy choice), and live-delete counts (probe).
        stats = (
            ev.withColumn("_b", table.bucket_of())
            .groupBy("_b")
            .agg(
                F.count(F.lit(1)).alias("events_applied"),
                F.max("lsn").alias("lsn_watermark"),
                F.sum(
                    (
                        ~F.coalesce(F.col("op").isin(list(OP_RANK)), F.lit(False))
                        | F.col("lsn").isNull()
                    ).cast("long")
                ).alias("bad_events"),
            )
            .join(
                winners.groupBy("_b").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum((F.col("op") != "delete").cast("long")).alias("n_ups"),
                ),
                "_b",
                "full",
            )
            .join(
                ex.filter(
                    (F.col("op") == "delete")
                    & ~F.coalesce("_tombstone", F.lit(False))
                )
                .groupBy("_b")
                .agg(F.count(F.lit(1)).alias("n_dels")),
                "_b",
                "left",
            )
            .collect()
        )
        bad = sum(r["bad_events"] or 0 for r in stats)
        if bad:
            raise ValueError(
                f"batch {batch_id}: {bad} events with unknown op or null lsn "
                f"(valid ops: {sorted(OP_RANK)}) — refusing to apply"
            )
        touched = [r["_b"] for r in stats if r["n"]]
        if not touched:
            return table.commit_rewrite(
                table.spark.createDataFrame([], _merged_schema(table)),
                [],
                tag=tag,
                summary={"operation": "merge", "events": 0},
            )
        n_winners = sum(r["n"] or 0 for r in stats)
        if merge_strategy == "auto":
            small_batch = n_winners <= BROADCAST_ROW_LIMIT
            vs_table = table.total_rows >= JOIN_TABLE_RATIO * n_winners
            merge_strategy = "join" if (small_batch and vs_table) else "shuffle"

        cols = [f.name for f in table.schema.fields]
        # target rows (incl. tombstones) of touched buckets only — the
        # analog of the reference reading one cty= prefix,
        # /root/reference/citygml/build-citygml.sh:37
        target = table.read(buckets=touched, internal=True)

        if merge_strategy == "join":
            merged = _merge_join(table, target, winners, ex, cols)
            repartition = False  # preserves the target scan's bucket layout
        else:
            merged = _merge_shuffle(table, target, winners, cols, len(touched))
            repartition = False  # _merge_shuffle repartitions itself

        bid = int(batch_id) if str(batch_id).lstrip("-").isdigit() else -1
        lineage = [
            (
                bid,
                int(r["_b"]),
                int(r["events_applied"]),
                int(r["n_ups"] or 0),
                int(r["n_dels"] or 0),
                int(r["lsn_watermark"]),
            )
            for r in stats
        ]
        return table.commit_rewrite(
            merged,
            touched,
            tag=tag,
            lineage=lineage,
            summary={
                "operation": "merge",
                "strategy": merge_strategy,
                "touched_buckets": len(touched),
                "winners": n_winners,
            },
            repartition=repartition,
        )
    finally:
        ev.unpersist()
        if winners is not None:
            winners.unpersist()
        if ex is not None:
            ex.unpersist()


def _merge_join(
    table: IceboxTable,
    target: DataFrame,
    winners: DataFrame,
    ex: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Broadcast copy-on-write merge: the target (big side) streams through
    a broadcast hash join with NO exchange and NO sort — rows stay in the
    bucket-dir layout they were scanned in, so the partitioned write needs
    no repartition either. The per-key LWW decision (take the incoming
    winner iff its lsn >= the stored row's _lsn; ties prefer incoming,
    matching the shuffle plan's `_in DESC` tie-break) happens row-side.
    """
    key = table.key
    wpref = F.broadcast(
        winners.select(
            F.col(key),
            F.col("lsn").alias("_w_lsn"),
            (F.col("op") == "delete").alias("_w_tomb"),
            *[F.col(c).alias(f"_w_{c}") for c in cols if c != key],
        )
    )
    joined = target.withColumn("_b", table.bucket_of()).join(wpref, key, "left")
    take_w = F.col("_w_lsn").isNotNull() & (F.col("_w_lsn") >= F.col("_lsn"))
    resolved = joined.select(
        "_b",
        F.col(key),
        *[
            F.when(take_w, F.col(f"_w_{c}")).otherwise(F.col(c)).alias(c)
            for c in cols
            if c != key
        ],
        F.when(take_w, F.col("_w_lsn")).otherwise(F.col("_lsn")).alias("_lsn"),
        F.when(take_w, F.col("_w_tomb")).otherwise(F.col("_tombstone")).alias(
            "_tombstone"
        ),
    )
    # winners whose key is absent from the target: brand-new rows (and
    # tombstones for never-seen keys, kept to block late older events).
    # Repartitioned by bucket — additions otherwise sit in the batch's
    # arbitrary partitioning and the dynamic-partition writer would emit
    # (#tasks × #buckets) tiny files; this shuffle moves only the small
    # additions set, never the target.
    additions = (
        winners.join(F.broadcast(ex.select(key)), key, "left_anti")
        .select(
            "_b",
            F.col(key),
            *[F.col(c) for c in cols if c != key],
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "delete").alias("_tombstone"),
        )
        .repartition(table.n_buckets, "_b")
    )
    return resolved.unionByName(additions)


def _merge_shuffle(
    table: IceboxTable,
    target: DataFrame,
    winners: DataFrame,
    cols: list[str],
    n_touched: int,
) -> DataFrame:
    """Shuffle merge for batches too big to broadcast: LWW across
    target ∪ batch keyed on (_lsn, _in). Single-exchange plan: repartition
    by bucket, then the window over (_b, key) needs no further exchange
    (hash(_b) clusters (_b, key)), and neither does the partitionBy(_b)
    write — the window's sort doubles as the write's clustering sort.
    """
    key = table.key
    t = (
        target.withColumn("_b", table.bucket_of())
        .withColumn("_in", F.lit(0))
    )
    incoming = winners.select(
        *cols,
        "_b",
        F.col("lsn").alias("_lsn"),
        (F.col("op") == "delete").alias("_tombstone"),
        F.lit(1).alias("_in"),
    )
    merged_all = t.unionByName(incoming).repartition(max(n_touched, 1), "_b")
    w = Window.partitionBy("_b", key).orderBy(F.col("_lsn").desc(), F.col("_in").desc())
    return (
        merged_all.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_in")
    )


def _merged_schema(table: IceboxTable) -> StructType:
    from pyspark.sql.types import IntegerType

    return StructType([*table.schema.fields]).add("_b", IntegerType())


def replay_log(
    table: IceboxTable,
    log: DataFrame,
    n_salts: int = 16,
    dedup_strategy: str = "agg",
    merge_strategy: str = "auto",
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
        table = apply_batch(
            table,
            log.filter(F.col("batch_id") == b),
            b,
            n_salts=n_salts,
            dedup_strategy=dedup_strategy,
            merge_strategy=merge_strategy,
        )
    return table
