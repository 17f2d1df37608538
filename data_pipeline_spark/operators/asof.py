"""As-of (temporal point-in-time) join — an operator Spark lacks natively.

Joins each probe row to the single most recent build row for the same key
whose timestamp is at-or-before (backward) / at-or-after (forward) the
probe timestamp. This is the classic CDC/feature-store lookup: "what was
the dimension's state when this change event happened" — the temporal
generalization of the reference's attribute-precedence pick of one best
source row per key (/root/reference/grid-and-attrs/find-best-attrs.js:56,
which keeps a single winning record per building; here the winner is
per-(key, point-in-time) instead of global).

Spark-first plan (no UDFs, ONE shuffle):
  union(probe, build) tagged by side
    -> Window.partitionBy(keys).orderBy(ts, side_tiebreak)
       last(build_payload_struct, ignorenulls=True)
       rowsBetween(unboundedPreceding, currentRow)
    -> filter side == probe
The window fill carries the latest build payload forward onto every later
probe row of the same key, which IS the as-of semantics. Catalyst plans
this as a single hashpartitioning(keys) Exchange + one Sort + one Window —
the same cost class as any windowed LWW dedup, with both inputs shuffled
once and never joined pairwise (an equi-join + filter + row_number
formulation would materialize |probe|x|build-per-key| intermediates; this
never exceeds |probe|+|build| rows).

Scale notes (100 TB): cost is one shuffle of probe+build on the key and a
per-key time sort — identical to the LWW merge the CDC spine already runs
at 10^10 events. A pathologically hot key serializes its sort into one
task; the mitigation is the standard time-chunked carry-in (split the
key's history into time ranges, compute each range's last build row,
broadcast those as seed rows into the next range) — not implemented until
a real workload needs it, documented so the knob is known.

Tie-breaking: at equal timestamps, allow_exact=True makes a build row
visible to a probe row at the same instant (DuckDB ASOF `>=` semantics);
multiple build rows sharing (key, ts) are ordered by `tiebreak` (the
largest wins) so results stay deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str] | str,
    probe_ts: str = "ts",
    build_ts: str | None = None,
    build_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact: bool = True,
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every probe row survives; build payload columns
    (renamed ``<col><suffix>``) carry the matching build row or null.

    direction='backward': latest build with build_ts <= probe_ts
    direction='forward' : earliest build with build_ts >= probe_ts
    allow_exact=False   : strict < / > (a build row at the exact probe
                          instant is NOT visible)
    tiebreak            : build column ordering equal-ts build rows
                          (largest wins); omit when (key, ts) is unique.
    """
    if isinstance(on, str):
        on = [on]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    build_ts = build_ts or probe_ts
    if build_cols is None:
        skip = set(on) | {build_ts}
        build_cols = [c for c in build.columns if c not in skip]

    out_ts = f"{build_ts}{suffix}"
    payload = [f"{c}{suffix}" for c in build_cols]

    # _side orders probe vs build rows at EQUAL timestamps: the window fill
    # must see the build row first iff exact-instant matches are allowed.
    # The build payload travels as ONE struct (non-null for every build
    # row, null for probe rows): filling per-column would let a build
    # row's legitimately-NULL value fall through to an OLDER row's value
    # for just that column — mixing columns across build rows. The struct
    # fill picks the whole winning row atomically.
    # NULL-key build rows are dropped and NULL-key probe rows stay
    # unmatched: Window.partitionBy would group all nulls into ONE
    # partition and "match" them to each other, diverging from every
    # join/ASOF convention (SQL joins, DuckDB ASOF, pandas merge_asof:
    # NULL keys match nothing) and from the spine's own null-key-is-
    # malformed rule (cdc.apply._bad_event_pred)
    null_key = None
    for k_ in on:
        c = F.col(k_).isNull()
        null_key = c if null_key is None else (null_key | c)
    b = build.filter(F.col(build_ts).isNotNull()).filter(~null_key).select(
        *[F.col(k) for k in on],
        F.col(build_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(build_ts).alias(out_ts),
            *[F.col(c).alias(o) for c, o in zip(build_cols, payload)],
        ).alias("_bpay"),
    )
    p = probe.select(
        "*",
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
    )
    u = p.unionByName(b, allowMissingColumns=True)

    asc = direction == "backward"
    ts_order = F.col("_ts").asc_nulls_first() if asc else F.col("_ts").desc_nulls_first()
    # backward+exact:  build(0) before probe(1) at equal ts  -> _side asc
    # backward+strict: probe first                           -> _side desc
    # forward flips the scan direction, so the same rule applies on the
    # reversed axis.
    side_order = F.col("_side").asc() if allow_exact else F.col("_side").desc()
    order = [ts_order, side_order]
    if tiebreak is not None:
        # among equal-ts build rows the LAST one the fill sees wins ->
        # ascending puts the largest tiebreak closest to the probe row.
        order.append(F.col(f"_bpay.{tiebreak}{suffix}").asc_nulls_first())

    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", F.last("_bpay", ignorenulls=True).over(w).alias("_f")
    )
    keep = [c for c in probe.columns]
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *keep,
            *[F.col(f"_f.{c}").alias(c) for c in [out_ts, *payload]],
        )
    )
