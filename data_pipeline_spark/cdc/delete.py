"""Predicate / keyed deletes through the CDC spine.

A 100 TB training-data lake needs out-of-band row removal that is NOT
part of the binlog: GDPR / right-to-be-forgotten erasure, purging docs a
later audit flagged (contaminated benchmarks, license takedowns), or
retiring a whole source. `delete_where` and `purge_keys` compile such a
request into ordinary delete EVENTS and push them through `apply_batch`,
so every table mechanism works unchanged and for free:

  * merge-on-read delta commit — O(matched) write bytes, never a table
    rewrite (compaction reclaims the dead rows later);
  * exactly-once tag (`delete:{op_id}`) — replaying a crashed purge is a
    no-op;
  * the change feed (`changes()`) emits the deletes, so downstream
    consumers/materialized views roll forward correctly;
  * lineage rows record the deletes per bucket;
  * OCC retry — a purge racing a stream commit rebases like any delta.

LSN contract: each delete event carries `current _lsn + 1` for its row —
strictly above everything committed for that key, strictly below nothing.
A LATER binlog event with a higher LSN therefore resurrects the key;
that is deliberate (a delete is a point-in-time statement, not a
standing blocklist — keep suppressing future arrivals upstream, e.g.
with the anti-join gate in the corpus-prep pipeline).

The reference has no analog — its lake is append-only release
partitions (/root/reference/athena-schema/add-buildings-partitions.js:4-10);
the semantics here follow Delta's DELETE FROM / Iceberg row-level
deletes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from ..icebox.table import IceboxTable
from .apply import apply_batch


def _delete_events(live: DataFrame, key: str) -> DataFrame:
    """Rows → delete events: key + op + per-key LSN bump. `live` must be
    an internal read already filtered to live rows."""
    return live.select(
        F.col(key),
        F.lit("delete").alias("op"),
        (F.col("_lsn") + F.lit(1)).alias("lsn"),
    )


def _apply_deletes(
    table: IceboxTable,
    ev: DataFrame,
    op_id: int | str,
    merge_strategy: str,
    retry_on_conflict: int,
) -> IceboxTable:
    return apply_batch(
        table,
        ev,
        op_id,
        tag_prefix="delete",
        merge_strategy=merge_strategy,
        retry_on_conflict=retry_on_conflict,
    )


def delete_where(
    table: IceboxTable,
    predicate: "Column | str",
    op_id: int | str,
    merge_strategy: str = "delta",
    retry_on_conflict: int = 0,
) -> IceboxTable:
    """Delete every live row matching `predicate` (a Column or SQL
    string over the table's logical columns).

    Cost model: ONE pruned-as-possible scan of the table to find matches
    (an arbitrary predicate cannot be pruned beyond parquet row-group
    stats — the same contract as Delta/Iceberg DELETE FROM), then the
    standard one-exchange delta apply over O(matched) rows. For
    key-list deletes use `purge_keys`, which skips the scan via the
    manifest's bucket/bounds/bloom pruning.

    Exactly-once: tagged `delete:{op_id}`; replaying the same op_id is a
    no-op even after a crash between commit and the caller learning of
    it.
    """
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    live = table.read(internal=True).filter(
        ~F.coalesce(F.col("_tombstone"), F.lit(False))
    )
    return _apply_deletes(
        table,
        _delete_events(live.filter(pred), table.key),
        op_id,
        merge_strategy,
        retry_on_conflict,
    )


def purge_keys(
    table: IceboxTable,
    keys: list,
    op_id: int | str,
    merge_strategy: str = "delta",
    retry_on_conflict: int = 0,
) -> IceboxTable:
    """GDPR-style point delete: remove the given keys, touching only
    their buckets (driver-side bucket calc) and only the delta commits
    whose manifest key bounds/blooms can contain them — the erase cost
    is O(|keys| · matching files), independent of table size. Keys not
    present are silently absent from the delete batch (erasing a
    never-seen id is vacuously done). Tagged `delete:{op_id}`."""
    import pyspark.sql.functions as _F

    buckets = table.buckets_for_keys(keys)
    live = table.read(buckets=buckets, internal=True, keys=list(keys)).filter(
        ~_F.coalesce(_F.col("_tombstone"), _F.lit(False))
    )
    return _apply_deletes(
        table, _delete_events(live, table.key), op_id, merge_strategy,
        retry_on_conflict,
    )
