"""Custom stateful streaming operator via applyInPandasWithState.

`stateful_lww_changes` is the continuous-emission twin of the batch LWW
dedup (cdc/apply.lww_dedup): per key it keeps the winning (lsn, op) in
GroupState across micro-batches and EMITS A ROW ONLY WHEN THE WINNER
CHANGES — a change-data-feed of the table the CDC merge would build,
without materializing the table. State is O(#live keys); each micro-batch
group arrives as Arrow-backed pandas frames (no per-row Python).

This is the engine's demonstration of the applyInPandasWithState surface
for operators the built-in aggregates can't express (SURVEY §2.9 /
§2.10); the icebox merge path remains the system of record.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# op precedence under equal LSNs — the SAME table the batch merge uses
from ..cdc.apply import OP_RANK as _OP_RANK

def _out_schema(key: str) -> StructType:
    """Output schema keyed by the CALLER's key column name — hardcoding
    'doc_id' here would silently mislabel the key for any other column."""
    return StructType(
        [
            StructField(key, StringType()),
            StructField("lsn", LongType()),
            StructField("op", StringType()),
            StructField("n_tok", IntegerType()),
        ]
    )


_STATE_SCHEMA = StructType(
    [
        StructField("lsn", LongType()),
        StructField("rank", IntegerType()),
        StructField("op", StringType()),
        StructField("n_tok", IntegerType()),
    ]
)


def _lww_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState,
    key_name: str = "doc_id",
) -> Iterable[pd.DataFrame]:
    if state.exists:
        cur_lsn, cur_rank, cur_op, cur_ntok = state.get
    else:
        cur_lsn, cur_rank, cur_op, cur_ntok = -1, -1, None, None
    changed = False
    for pdf in pdfs:
        # malformed events (null lsn / unknown op) are DROPPED so the
        # continuous feed keeps running — the batch path's reject-loudly
        # policy (cdc.apply._bad_event_pred) doesn't fit a long-lived
        # query; route rejects upstream if you need them quarantined
        pdf = pdf[pdf["lsn"].notna() & pdf["op"].isin(_OP_RANK)]
        if pdf.empty:
            continue
        ranks = pdf["op"].map(_OP_RANK).astype("int64")
        # vectorized lexicographic argmax over (lsn, rank) — no packed
        # arithmetic, so no overflow at any lsn magnitude
        lsn_s = pdf["lsn"].astype("int64")
        top = lsn_s == lsn_s.max()
        i = ranks[top].idxmax()
        lsn, rank = int(lsn_s[i]), int(ranks[i])
        if (lsn, rank) > (cur_lsn, cur_rank):
            cur_lsn, cur_rank = lsn, rank
            cur_op = str(pdf["op"][i])
            v = pdf["n_tok"][i]
            cur_ntok = None if pd.isna(v) else int(v)
            changed = True
    # update ONLY when something changed (or real state already exists):
    # an unconditional update would mint permanent (-1,-1,None,None)
    # state for keys seen only via malformed events — unbounded
    # state-store growth driven entirely by rejected input — and rewrite
    # identical state for every quiet key each micro-batch
    if changed or state.exists:
        state.update((cur_lsn, cur_rank, cur_op, cur_ntok))
    if changed:
        yield pd.DataFrame(
            {
                key_name: [key[0]],
                "lsn": [cur_lsn],
                "op": [cur_op],
                "n_tok": [cur_ntok],
            }
        )


def stateful_lww_changes(stream: DataFrame, key: str = "doc_id") -> DataFrame:
    """Change-data-feed of per-key LWW winners over a change-event stream.

    Emits (key, lsn, op, n_tok) whenever a micro-batch changes a key's
    winner — the output key column carries the CALLER's key name;
    redelivered or stale events emit nothing. Requires columns
    (key, lsn, op, n_tok) on the stream.
    """

    def _fn(k, pdfs, state):
        return _lww_update(k, pdfs, state, key_name=key)

    return (
        stream.select(key, "lsn", "op", "n_tok")
        .groupBy(key)
        .applyInPandasWithState(
            _fn,
            outputStructType=_out_schema(key),
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
