"""Downstream change consumption: a durable cursor over a table's
snapshot chain, pairing IceboxTable.changes() with an acknowledge
protocol so a derived pipeline (index refresh, downstream table,
feature store) consumes each snapshot interval EXACTLY ONCE across
crashes.

Two-phase by design: poll() returns the net change feed from the last
acknowledged snapshot to the table's current snapshot WITHOUT moving
the cursor; the consumer applies the changes to its own sink and only
then ack()s the interval, which publishes the new position with the
same fsync'd atomic-rename discipline as the table's own commits. A
crash between poll and ack redelivers the SAME interval on restart —
and because changes() is a pure function of (from, to) snapshot states,
redelivery is bit-identical, so any idempotent downstream apply (e.g.
MERGE by key) lands exactly once.

This is the consumer half of the CDC contract: the reference's
downstream (Athena) re-registers whole new releases and re-reads them
(/root/reference/athena-schema/add-buildings-partitions.js:4-10); a
cursor over the change feed moves O(changes) per poll instead of
O(release).

Scale: the cursor file is O(1) metadata; each poll's cost is the
changes() fast path — interval delta files + touched buckets only.
Retention contract: expire_snapshots must keep every snapshot >= the
oldest unacknowledged cursor position (operators run one retention
policy per table; the cursor surfaces its position for that policy).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from .table import IceboxTable


class ChangeCursor:
    """Durable position of ONE named consumer over an icebox table."""

    def __init__(self, table: IceboxTable, cursor_dir: str, name: str = "default"):
        self.table = table
        self.path = os.path.join(cursor_dir, f"cursor-{name}.json")
        os.makedirs(cursor_dir, exist_ok=True)

    @property
    def position(self) -> int:
        """Last acknowledged snapshot id (0 = nothing consumed: the
        first poll delivers the whole table as inserts)."""
        try:
            with open(self.path) as f:
                return int(json.load(f)["snapshot_id"])
        except FileNotFoundError:
            return 0

    def poll(self, include_pre: bool = True) -> tuple[DataFrame, int]:
        """(changes, to_snapshot_id) from the acknowledged position to
        the table's CURRENT snapshot. Does not move the cursor; apply
        downstream, then ack(to_snapshot_id)."""
        # reload so long-lived consumers see commits made after their
        # handle was constructed
        t = IceboxTable.load(self.table.spark, self.table.root)
        self.table = t
        return t.changes(self.position, include_pre=include_pre), t.snapshot_id

    def ack(self, to_snapshot_id: int) -> None:
        """Publish the new position (atomic rename + fsync, same
        commit-record durability as the table's manifest swap).
        Regressions are rejected: acking an older snapshot than the
        stored position would silently re-deliver and double-apply on
        a non-idempotent sink."""
        cur = self.position
        if to_snapshot_id < cur:
            raise ValueError(
                f"cursor at {cur}, refusing to move backwards to "
                f"{to_snapshot_id}"
            )
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": int(to_snapshot_id)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)
        dfd = os.open(os.path.dirname(self.path), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
