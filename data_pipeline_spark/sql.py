"""SQL surface over the icebox catalog.

The reference publishes its lake to SQL consumers via external-table DDL
(/root/reference/athena-schema/buildings.sql:1-25, partitions added in
add-buildings-partitions.js:4-10). The engine's equivalent surface:

    CREATE TABLE        -> IceboxTable.create(spark, root, schema)
    SELECT ... FROM t   -> register(table, "t"); spark.sql("SELECT ...")
    ... FOR VERSION AS OF s
                        -> register(table, "t", snapshot_id=s)
    MERGE INTO t USING (<query>) ON t.key = src.key
      WHEN MATCHED [AND src.op='delete'] THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
                        -> merge_into(table, spark, "<query>", batch_id)
                           (exactly the engine's LWW apply: the source
                           query must yield change events
                           (lsn, op, <key>, payload...); op 'delete'
                           maps to WHEN MATCHED DELETE, everything else
                           to UPDATE/INSERT, and lsn arbitration makes
                           the statement idempotent + order-independent,
                           which a bare SQL MERGE is not)

Views are registered from table.read() — bucket pruning, merge-on-read
delta folding, and schema backfill all apply before the SQL layer sees a
row, so spark.sql queries read the same committed snapshot state as the
DataFrame API. The view is a SNAPSHOT view (it pins the manifest the
handle holds, like Iceberg's time travel), not a live pointer: re-register
after commits to see new data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .cdc.apply import apply_batch
from .icebox.table import IceboxTable


def register(
    table: IceboxTable,
    name: str,
    snapshot_id: int | None = None,
    internal: bool = False,
    ref: str | None = None,
    where: list[tuple] | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Expose the table (at its snapshot, an older one, or a named ref —
    the `FOR VERSION AS OF 'tag-name'` form) as a temp view for
    spark.sql. Returns the registered DataFrame.

    where/columns push manifest-level zone-map pruning and through-merge
    projection into the VIEW itself (see IceboxTable.read): SQL
    predicates over the view are Catalyst-pushed into clean scans
    automatically, but only the manifest knows how to skip whole delta
    commits or narrow the MoR payload struct — registering a
    pre-filtered/projected view is how SQL consumers get that."""
    t = table
    if ref is not None or (
        snapshot_id is not None and snapshot_id != table.snapshot_id
    ):
        t = IceboxTable.load(
            table.spark, table.root, snapshot_id=snapshot_id, ref=ref
        )
    df = t.read(internal=internal, where=where, columns=columns)
    df.createOrReplaceTempView(name)
    return df


def register_changes(
    table: IceboxTable,
    name: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    include_pre: bool = True,
) -> DataFrame:
    """SQL surface for the incremental change feed — the engine's
    `table_changes('t', from, to)` TVF analog (Delta CDF / Iceberg
    changelog): registers IceboxTable.changes(from, to) as a temp view
    whose rows carry `_change_type` ∈ {insert, delete, update_pre,
    update_post}. Snapshot-pinned like register(): re-register after
    commits to see newer intervals."""
    df = table.changes(
        from_snapshot_id, to_snapshot_id, include_pre=include_pre
    )
    df.createOrReplaceTempView(name)
    return df


def register_metadata(table: IceboxTable, name: str) -> None:
    """Iceberg metadata-table surface: registers `{name}__snapshots`,
    `{name}__files`, and `{name}__partitions` temp views (the
    `t$snapshots` / `t$files` / `t$partitions` analog — `$` is not valid
    in Spark view names) for SQL over commit history, physical layout,
    and per-bucket skew/read-tax rollups. Snapshot-pinned like
    register()."""
    table.snapshots().createOrReplaceTempView(f"{name}__snapshots")
    rows = table._file_rows()  # ONE walk feeds both layout views
    table.files(_rows=rows).createOrReplaceTempView(f"{name}__files")
    table.partitions(_rows=rows).createOrReplaceTempView(
        f"{name}__partitions"
    )


def merge_into(
    table: IceboxTable,
    spark: SparkSession,
    source_query: str,
    batch_id: int | str,
    **apply_kwargs,
) -> IceboxTable:
    """MERGE INTO equivalent: run `source_query` (must produce change
    events: lsn, op, <key>, payload columns) through the engine's
    LWW/exactly-once apply path. Returns the table at the new snapshot."""
    return apply_batch(table, spark.sql(source_query), batch_id, **apply_kwargs)
