"""Incremental materialized-view maintenance over the change feed.

A ``MaterializedAggregate`` keeps a derived icebox table of per-group
aggregates (count + sums) continuously consistent with a source icebox
table WITHOUT ever recomputing from the full source: each ``refresh()``
polls the source's net change feed (``IceboxTable.changes`` via
``ChangeCursor``), turns it into per-group retract/add deltas
(insert/update_post weigh +1, delete/update_pre weigh -1), folds the
deltas into the old view state with a bucket-pruned read of the view
itself, and commits the changed groups as tagged CDC events into the
derived table. Count and sum are self-maintainable under deletion (the
classic incremental-view-maintenance result: retractions subtract
exactly what the original insertion added); avg derives as sum/count at
read time. Min/max are deliberately NOT offered — a retraction of the
current extremum needs the runner-up, which only a recompute knows.

Exactly-once end-to-end, with NO two-phase coordination:
  * the data and the consumption position commit ATOMICALLY — each
    refresh's delta-apply is tagged ``mv:{name}:{to_snapshot_id}`` in
    the derived table's own committed-tag list;
  * the cursor file is just a cache of that position. ``refresh()``
    first recovers the true position from the derived table's tags and
    fast-forwards a stale cursor, so a crash anywhere between apply and
    ack re-delivers an interval whose tag is already committed → the
    apply is a no-op and only the ack is replayed. The failure window
    that breaks naive poll/apply/ack consumers (crash after apply,
    source advances, next poll returns a WIDER interval that re-counts
    the applied prefix) is closed: recovery moves the poll start past
    the applied prefix before the wider poll happens.

Scale shape per refresh: one O(changes) shuffle to the group key for
the delta aggregate, one bucket-pruned view read (touched groups only,
bucket ids collected driver-side at O(#buckets)), and the derived
table's own O(delta) merge. Nothing rereads the source table; nothing
rereads the untouched part of the view. The reference's downstream
keeps whole-release copies and re-registers them per release
(/root/reference/athena-schema/add-buildings-partitions.js:4-10); this
is that derived copy kept fresh at O(changes).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

from .cdc.apply import apply_batch
from .icebox.cursor import ChangeCursor
from .icebox.table import IceboxTable


class MaterializedAggregate:
    """Derived table: ``group_col -> (n_rows, sum_<c> for c in sum_cols)``.

    ``sum_cols`` must be integral source columns (long sums — exactly
    reproducible under retraction; float sums would drift by fold order
    and are refused rather than silently approximated).

    Rows whose ``group_col`` is NULL are excluded from the view (the
    view is keyed on the group and icebox keys are non-null); coalesce
    to a sentinel group upstream if NULLs must be counted.
    """

    TAG_PREFIX = "mv"

    def __init__(
        self,
        spark: SparkSession,
        source: IceboxTable,
        root: str,
        group_col: str,
        sum_cols: list[str] | None = None,
        name: str = "mv",
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.source = source
        self.group_col = group_col
        self.sum_cols = list(sum_cols or [])
        self.name = name
        src_fields = {f.name: f for f in source.schema.fields}
        if group_col not in src_fields:
            raise ValueError(f"group_col {group_col!r} not in source schema")
        for c in self.sum_cols:
            if c not in src_fields:
                raise ValueError(f"sum_col {c!r} not in source schema")
            if src_fields[c].dataType.typeName() not in (
                "byte",
                "short",
                "integer",
                "long",
            ):
                raise ValueError(
                    f"sum_col {c!r} is {src_fields[c].dataType.simpleString()}; "
                    "only integral sums are exactly retractable"
                )
        schema = StructType(
            [
                src_fields[group_col],
                StructField("n_rows", LongType()),
                *[StructField(f"sum_{c}", LongType()) for c in self.sum_cols],
            ]
        )
        if os.path.exists(os.path.join(root, "metadata")):
            self.view = IceboxTable.load(spark, root)
        else:
            self.view = IceboxTable.create(
                spark, root, schema, n_buckets=n_buckets, key=group_col
            )
        self.cursor = ChangeCursor(
            source, os.path.join(root, "cursors"), name=name
        )

    # ---------- recovery ----------

    def _applied_position(self) -> int:
        """Highest source snapshot whose interval is COMMITTED in the
        view (from the view's own tag list — the durable position)."""
        pre = f"{self.TAG_PREFIX}:{self.name}:"
        best = 0
        for tag in self.view.manifest.get("committed_tags", []):
            if tag.startswith(pre):
                best = max(best, int(tag[len(pre):]))
        return best

    # ---------- maintenance ----------

    def refresh(self) -> IceboxTable:
        """Poll the source change feed and fold it in; returns the view
        at its new snapshot. Idempotent under crash-redelivery at every
        point (see module docstring)."""
        applied = self._applied_position()
        if applied > self.cursor.position:
            self.cursor.ack(applied)  # crashed between apply and ack

        chg, to_sid = self.cursor.poll(include_pre=True)
        if to_sid <= self.cursor.position:
            return self.view  # nothing new

        g = self.group_col
        w = (
            F.when(F.col("_change_type").isin("insert", "update_post"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("_w")
        )
        # NULL-group rows are EXCLUDED from the view (the view is keyed
        # on group_col and icebox keys are non-null — a NULL-key event
        # would be refused as malformed and wedge the cursor on this
        # interval forever). Schema evolution backfills NULLs for
        # pre-evolution rows, so this is a reachable case, not a
        # hypothetical; coalesce upstream to a sentinel group if NULLs
        # must be counted.
        deltas = chg.filter(F.col(g).isNotNull()).select(
            g, w, *self.sum_cols
        ).groupBy(g).agg(
            F.sum("_w").alias("_d_n"),
            *[
                F.sum(F.col("_w") * F.col(c).cast("long")).alias(f"_d_{c}")
                for c in self.sum_cols
            ],
        )
        # groups whose pre/post images cancel exactly produce all-zero
        # deltas (an update that moved neither the group nor any summed
        # column) — drop them so unchanged view rows don't churn commits
        nonzero = F.col("_d_n") != 0
        for c in self.sum_cols:
            nonzero = nonzero | (F.col(f"_d_{c}") != 0)
        deltas = deltas.filter(nonzero)

        # old view state, pruned to the buckets the deltas touch
        # (driver-side list is O(#buckets) — bucket ids, not group keys)
        # the view's OWN bucket transform (bucket_of honors bucket_sep
        # and any future layout fields; a hand-built bucket_expr here
        # would silently diverge from the table layout and mis-prune)
        bsel = [
            r["_b"]
            for r in deltas.select(self.view.bucket_of().alias("_b"))
            .distinct()
            .collect()
        ]
        if not bsel:
            # data-less interval (e.g. compaction only, or fully
            # cancelling churn): commit nothing, just move the position.
            # The tag list stays sparse — _applied_position() tracks the
            # max, so skipped ids are fine.
            self.cursor.ack(to_sid)
            return self.view
        old = self.view.read(buckets=bsel).select(
            g,
            F.col("n_rows").alias("_o_n"),
            *[F.col(f"sum_{c}").alias(f"_o_{c}") for c in self.sum_cols],
        )

        j = old.join(deltas, g, "full_outer")
        new_n = F.coalesce("_o_n", F.lit(0)) + F.coalesce("_d_n", F.lit(0))
        ev_cols = [
            F.col(g),
            F.when(new_n <= 0, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
            F.lit(int(to_sid)).cast("long").alias("lsn"),
            new_n.alias("n_rows"),
            *[
                (
                    F.coalesce(f"_o_{c}", F.lit(0))
                    + F.coalesce(f"_d_{c}", F.lit(0))
                ).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
        ]
        # view rows that share a pruned bucket but got no delta (NULL
        # _d_n) carry no change — keep only delta-bearing groups
        events = j.filter(F.col("_d_n").isNotNull()).select(*ev_cols)

        self.view = apply_batch(
            self.view,
            events,
            batch_id=int(to_sid),
            tag_prefix=f"{self.TAG_PREFIX}:{self.name}",
        )
        self.cursor.ack(to_sid)
        return self.view

    def maintain(self, compact_ratio: float = 0.5) -> IceboxTable:
        """Fold the view's accumulated refresh deltas when they outgrow
        the base (same knob as the spine's compact_ratio)."""
        self.view = self.view.compact_if_needed(ratio=compact_ratio)
        return self.view

    def read(self) -> DataFrame:
        """Current view contents (group, n_rows, sum_*)."""
        return self.view.read()
