"""Watermarked stream-stream join (SURVEY §2.9): a fact stream
enriched by a concurrently-arriving dimension-update stream, with
bounded state.

The CDC spine joins a STREAM to a TABLE (asof enrichment via
event_transform — operators/asof.py); this is the remaining member of
the join surface: BOTH sides still in flight. The canonical pipeline
shape is "events reference a dimension row that is itself updated by
another binlog": neither side can be broadcast, and an unbounded join
would keep every row forever. Spark's stream-stream join solves it
with two watermarks plus a time-range condition — state for a key is
evicted as soon as no future row on the other side could still match,
so memory is O(tolerance × arrival rate), not O(stream length).

Semantics offered here (`stream_stream_enrich`): fact f matches every
dim version d of the same key with

    d.ts in [f.ts - tolerance, f.ts]

i.e. "the dimension as it stood within the last `tolerance` before the
fact" — 0..n matches per fact (the relational contract; collapsing to
the single latest version is the batch as-of join's job, or a
downstream LWW over the join output). `how="leftOuter"` additionally
emits facts that matched nothing, with null dim columns, exactly once
— AFTER the dim watermark proves no matching version can still arrive
(the streaming analog of a left join's preserved side).

At 100 TB: one shuffle per side on the join key (co-partitioned state
store), state bounded by the watermark ~ tolerance window, skew on hot
keys handled the same way the LWW spine handles it (salt upstream if a
single key's tolerance window exceeds an executor). No UDFs, no
Python: pure Catalyst stream-stream join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_stream_enrich(
    facts: DataFrame,
    dims: DataFrame,
    key: str = "doc_id",
    fact_ts: str = "ts",
    dim_ts: str = "dim_ts",
    tolerance: str = "10 minutes",
    watermark: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on `key` with the time-range condition above.

    `dims` must carry its event time in `dim_ts` (rename upstream if
    needed — keeping the two clocks visibly distinct in the output
    beats positional confusion). All fact columns survive; dim columns
    (minus its key copy) ride along, null for unmatched facts under
    leftOuter.
    """
    if fact_ts == dim_ts:
        raise ValueError("fact_ts and dim_ts must differ (both survive)")
    # every non-key dim column also survives — a shared name would emit
    # two output columns called the same thing (AMBIGUOUS_REFERENCE on
    # any later select); refuse loudly like the ts collision above
    clash = sorted(
        (set(facts.columns) & set(dims.columns)) - {key}
    )
    if clash:
        raise ValueError(
            f"facts and dims share non-key column names {clash} — rename "
            "the dim side upstream (both sides survive in the output)"
        )
    f = facts.withWatermark(fact_ts, watermark).alias("f")
    d = dims.withWatermark(dim_ts, watermark).alias("d")
    cond = (
        (F.col(f"f.{key}") == F.col(f"d.{key}"))
        & (F.col(f"d.{dim_ts}") <= F.col(f"f.{fact_ts}"))
        & (
            F.col(f"d.{dim_ts}")
            >= F.col(f"f.{fact_ts}") - F.expr(f"INTERVAL {tolerance}")
        )
    )
    out = f.join(d, cond, how)
    dim_cols = [c for c in dims.columns if c != key]
    return out.select(
        *[F.col(f"f.{c}") for c in facts.columns],
        *[F.col(f"d.{c}") for c in dim_cols],
    )
