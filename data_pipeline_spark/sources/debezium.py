"""Debezium-envelope CDC source adapter: the standard binlog/WAL wire
format (Kafka Connect JSON) parsed into the engine's normalized event
shape, pure built-in expressions end to end.

A Debezium change record is a JSON envelope

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "op": "c"|"u"|"d"|"r", "ts_ms": <epoch ms>,
                 "source": {"lsn": <int64>, ...}}}

(`op` "c"=create, "u"=update, "d"=delete, "r"=snapshot read; deletes
carry the row image in `before` with `after` null). The engine's spine
consumes (lsn, op in insert/update/delete/upsert, key, payload...) —
this module is the bridge: `parse_debezium` turns a DataFrame of raw
envelope strings into that shape with ONE `from_json` against a pinned
schema (the F17 pinned-path JSON policy — no schema inference, no
UDFs, whole-stage codegen).

Tolerance contract (F19): a malformed envelope, an unknown `op`, or a
missing LSN parses to NULL op / NULL lsn / NULL key — exactly what the
spine's validity guards quarantine (`apply_batch(quarantine_dir=)`
routes them to the DLQ with a reason; the strict default rejects the
batch). Nothing is silently dropped here: this adapter only maps
shapes, the spine owns policy.

Scale shape: one projection over the raw stream — no shuffle, no
Python. Wire it as ``run_stream(event_transform=...)`` (or pre-parse
the source) and the fused dedup+apply plan is unchanged: parsing rides
the same scan that reads the tail.

Reference parity: the reference's per-stage JS readers re-derive row
shape ad hoc from JSON lines (grid-and-attrs/app.js:131-160); here the
envelope contract is pinned once and every malformed row is accounted
for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Debezium op -> engine op. "r" (snapshot read) applies as an insert:
# bootstrap reads ARE initial upserts to an empty table.
OP_MAP = {"c": "insert", "u": "update", "d": "delete", "r": "insert"}


def envelope_schema(row_schema: StructType) -> StructType:
    """Pinned envelope schema for `from_json`: before/after carry the
    source table's row shape, source.lsn is the ordering token."""
    return StructType(
        [
            StructField(
                "payload",
                StructType(
                    [
                        StructField("before", row_schema),
                        StructField("after", row_schema),
                        StructField("op", StringType()),
                        StructField("ts_ms", LongType()),
                        StructField(
                            "source",
                            StructType(
                                [StructField("lsn", LongType())]
                            ),
                        ),
                    ]
                ),
            )
        ]
    )


def _engine_op(dbz_op: Column) -> Column:
    out = None
    for k, v in OP_MAP.items():
        out = (
            F.when(dbz_op == k, v)
            if out is None
            else out.when(dbz_op == k, v)
        )
    return out  # unknown/null op -> NULL (spine guards quarantine it)


def parse_debezium(
    raw: DataFrame,
    row_schema: StructType,
    value_col: str = "value",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Raw envelope strings -> normalized events.

    Output columns: ``lsn`` (source.lsn, falling back to ts_ms for
    connectors that omit it), ``op`` (insert/update/delete or NULL for
    unmapped), every field of `row_schema` (from `after`, falling back
    to `before` so deletes keep their key + last row image), plus any
    `keep_cols` carried through from `raw` (e.g. batch_id).
    """
    env = F.from_json(F.col(value_col), envelope_schema(row_schema))
    p = env["payload"]
    img = F.coalesce(p["after"], p["before"])
    return raw.select(
        F.coalesce(p["source"]["lsn"], p["ts_ms"]).alias("lsn"),
        _engine_op(p["op"]).alias("op"),
        *[img[f.name].alias(f.name) for f in row_schema.fields],
        *[F.col(c) for c in (keep_cols or [])],
    )


def to_debezium(
    events: DataFrame,
    row_schema: StructType,
    op_col: str = "op",
    lsn_col: str = "lsn",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Inverse bridge (tests / replay fixtures): normalized events ->
    envelope strings. insert->c, update->u, delete->d (before image,
    null after), upsert->r (the snapshot-read shape — round-trips back
    to insert, which is what an upsert against an empty key is)."""
    inv = {"insert": "c", "update": "u", "delete": "d", "upsert": "r"}
    dbz_op = None
    for k, v in inv.items():
        dbz_op = (
            F.when(F.col(op_col) == k, v)
            if dbz_op is None
            else dbz_op.when(F.col(op_col) == k, v)
        )
    row = F.struct(*[F.col(f.name) for f in row_schema.fields])
    is_del = F.col(op_col) == "delete"
    null_row = F.lit(None).cast(row_schema)
    payload = F.struct(
        F.when(is_del, row).otherwise(null_row).alias("before"),
        F.when(~is_del, row).otherwise(null_row).alias("after"),
        dbz_op.alias("op"),
        F.col(lsn_col).cast("long").alias("ts_ms"),
        F.struct(F.col(lsn_col).cast("long").alias("lsn")).alias(
            "source"
        ),
    )
    return events.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value"),
        *[F.col(c) for c in (keep_cols or [])],
    )
