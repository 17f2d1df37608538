"""Deterministic synthetic data: base table + change-event log (binlog tail).

Everything is derived column-wise from the event's ordinal id with integer
hash mixing — no RNG state, no wall clock — so generation is:
  * reproducible (same args → bit-identical data),
  * order/partitioning independent (row i is a pure function of i),
  * distributed (spark.range scales to 10^10 ids with zero driver data).

Schemas follow BASELINE.json input_hint / FIXTURES.md:
  base:   doc_id:string, tokens:array<int32>, n_tok:int32, source:string
  events: lsn:int64, batch_id:int32, op:string, doc_id:string,
          tokens:array<int32>, n_tok:int32, source:string

The reference analog of the base table is the keyed buildings table
(hash-keyed rows, /root/reference/grid-and-attrs/footprint.js:121-124);
the event log replaces its stage-by-stage full-recompute releases
(/root/reference/athena-schema/add-buildings-partitions.js:4-10) with an
LSN-ordered change tail.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

VOCAB = 50257
SOURCES = ["web", "books", "code", "wiki"]

# deterministic 64-bit mixer as a Column expression: built-in xxhash64 —
# JVM-side, whole-stage-codegen friendly, ANSI-safe (no overflowing
# arithmetic; Spark 4 defaults to ANSI mode).
def _mix(col, salt: int):
    return F.xxhash64(col, F.lit(salt))


def _u01(col, salt: int):
    """Uniform [0,1) derived from the mixed id."""
    return (F.pmod(_mix(col, salt), F.lit(1 << 30)).cast("double")) / F.lit(float(1 << 30))


def _tokens_expr(seed_col, len_col):
    """tokens[j] = mix(seed, j) % VOCAB as array<int> — built-in HOFs, no UDF."""
    seq = F.sequence(F.lit(0), len_col - F.lit(1))
    return F.transform(
        seq,
        lambda j: F.pmod(F.xxhash64(seed_col, j, F.lit(7)), F.lit(VOCAB)).cast("int"),
    )


def gen_base_table(spark: SparkSession, n_docs: int, min_len: int = 8, max_len: int = 64,
                   partitions: int | None = None) -> DataFrame:
    """Base table of pre-tokenized sequences; row i is pure f(i)."""
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    len_col = (F.pmod(_mix(F.col("id"), 11), F.lit(max_len - min_len + 1)) + F.lit(min_len)).cast("int")
    return df.select(
        F.format_string("doc_%08d", F.col("id")).alias("doc_id"),
        _tokens_expr(F.col("id"), len_col).alias("tokens"),
    ).withColumn("n_tok", F.size("tokens").cast("int")).withColumn(
        "source", F.element_at(F.array(*[F.lit(s) for s in SOURCES]),
                               (F.pmod(_mix(F.xxhash64("doc_id"), 13), F.lit(len(SOURCES))) + F.lit(1)).cast("int")),
    )


def gen_event_log(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    batch_size: int = 100_000,
    hot_frac: float = 0.0,
    delete_frac: float = 0.05,
    insert_frac: float = 0.35,
    update_frac: float = 0.40,
    min_len: int = 8,
    max_len: int = 64,
    with_source: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Change-event tail. lsn = event ordinal (unique, monotone).

    hot_frac: fraction of events hitting doc_00000000 (skew knob — the
    analog of the reference manually sharding California,
    /root/reference/data-prep/msfp-2017/convert-and-prep-California.sh:9-37).
    Remaining op mass after insert/update/delete fracs is 'upsert'.
    """
    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    lsn = F.col("id")

    u_doc = _u01(lsn, 23)
    doc_ord = F.when(u_doc < F.lit(hot_frac), F.lit(0)).otherwise(
        F.pmod(_mix(lsn, 29), F.lit(n_docs))
    )
    u_op = _u01(lsn, 31)
    op = (
        F.when(u_op < F.lit(insert_frac), F.lit("insert"))
        .when(u_op < F.lit(insert_frac + update_frac), F.lit("update"))
        .when(u_op < F.lit(insert_frac + update_frac + delete_frac), F.lit("delete"))
        .otherwise(F.lit("upsert"))
    )
    len_col = (F.pmod(_mix(lsn, 37), F.lit(max_len - min_len + 1)) + F.lit(min_len)).cast("int")
    is_del = op == F.lit("delete")

    cols = [
        lsn.alias("lsn"),
        (lsn / F.lit(batch_size)).cast("int").alias("batch_id"),
        op.alias("op"),
        F.format_string("doc_%08d", doc_ord).alias("doc_id"),
        F.when(is_del, F.lit(None)).otherwise(_tokens_expr(lsn, len_col)).alias("tokens"),
    ]
    if with_source:
        cols.append(
            F.when(is_del, F.lit(None))
            .otherwise(
                F.element_at(
                    F.array(*[F.lit(s) for s in SOURCES]),
                    (F.pmod(_mix(lsn, 41), F.lit(len(SOURCES))) + F.lit(1)).cast("int"),
                )
            )
            .alias("source")
        )
    out = df.select(*cols).withColumn(
        "n_tok",
        F.when(F.col("tokens").isNull(), F.lit(None)).otherwise(F.size("tokens")).cast("int"),
    )
    # column order: lsn, batch_id, op, doc_id, tokens, n_tok[, source]
    order = ["lsn", "batch_id", "op", "doc_id", "tokens", "n_tok"] + (
        ["source"] if with_source else []
    )
    return out.select(*order)


# ---------------------------------------------------------------------------
# PORTABLE generator: identical event log computable by Spark AND DuckDB.
#
# Same design (row i = pure f(i)) but every derivation uses the md5-based
# h64 (functions/portable.py) instead of Spark-private xxhash64, so an
# external oracle can regenerate the exact log — tokens included — and
# independently compute the expected final table. This is the engine's
# replay-equivalence contract (SURVEY.md §5.2 suite 1) made
# engine-independent, in the spirit of the reference's exact-golden-value
# tests (/root/reference/grid-and-attrs/footprint.test.js:22-34).
#
# gen_event_log_portable (Spark) and portable_event_log_sql (DuckDB CTE)
# MUST stay in lockstep — tests/test_portable_parity.py compares them
# row-for-row including token arrays.
# ---------------------------------------------------------------------------

from .functions.portable import h64, h64_sql  # noqa: E402

P_MIN_LEN = 8
P_MAX_LEN = 24
# op mix: percent thresholds over h64(lsn)%100
P_INSERT, P_UPDATE, P_DELETE = 35, 40, 5  # remainder = upsert


def _lsn_str(extra=None):
    c = F.col("id").cast("string")
    if extra is not None:
        c = F.concat(c, F.lit(":"), extra.cast("string"))
    return c


def gen_event_log_portable(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    batch_size: int = 1000,
    hot_pct: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Portable change-event tail; see portable_event_log_sql for the twin."""
    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    lsn = F.col("id")
    u_op = h64(_lsn_str(), salt="op") % 100
    op = (
        F.when(u_op < P_INSERT, F.lit("insert"))
        .when(u_op < P_INSERT + P_UPDATE, F.lit("update"))
        .when(u_op < P_INSERT + P_UPDATE + P_DELETE, F.lit("delete"))
        .otherwise(F.lit("upsert"))
    )
    doc_ord = F.when(
        (h64(_lsn_str(), salt="hot") % 100) < hot_pct, F.lit(0).cast("bigint")
    ).otherwise(h64(_lsn_str(), salt="doc") % n_docs)
    length = (h64(_lsn_str(), salt="len") % (P_MAX_LEN - P_MIN_LEN + 1) + P_MIN_LEN).cast("int")
    is_del = op == F.lit("delete")
    tokens = F.transform(
        F.sequence(F.lit(0), length - F.lit(1)),
        lambda j: (h64(_lsn_str(j), salt="tok") % VOCAB).cast("int"),
    )
    source = F.element_at(
        F.array(*[F.lit(s) for s in SOURCES]),
        (h64(_lsn_str(), salt="src") % len(SOURCES) + 1).cast("int"),
    )
    return df.select(
        lsn.alias("lsn"),
        (lsn / batch_size).cast("int").alias("batch_id"),
        op.alias("op"),
        F.format_string("doc_%06d", doc_ord).alias("doc_id"),
        F.when(is_del, F.lit(None)).otherwise(tokens).alias("tokens"),
        F.when(is_del, F.lit(None)).otherwise(length).alias("n_tok"),
        F.when(is_del, F.lit(None)).otherwise(source).alias("source"),
    )


def gen_token_docs_portable(spark: SparkSession, n_docs: int) -> DataFrame:
    """Portable tokenized-doc table (doc_id, tokens, n_tok, source) —
    pure f(ordinal) via h64, regenerable bit-for-bit by DuckDB
    (token_docs_sql). Token stream deliberately contains consecutive
    duplicates (token j depends on j//2) so repair ops have work to do."""
    df = spark.range(0, n_docs, 1, spark.sparkContext.defaultParallelism)
    length = (h64(_lsn_str(), salt="len") % (P_MAX_LEN - P_MIN_LEN + 1) + P_MIN_LEN).cast(
        "int"
    )
    tokens = F.transform(
        F.sequence(F.lit(0), length - F.lit(1)),
        lambda j: (h64(_lsn_str(F.floor(j / 2)), salt="tok") % VOCAB).cast("int"),
    )
    source = F.element_at(
        F.array(*[F.lit(s) for s in SOURCES]),
        (h64(_lsn_str(), salt="src") % len(SOURCES) + 1).cast("int"),
    )
    return df.select(
        F.format_string("doc_%06d", F.col("id")).alias("doc_id"),
        tokens.alias("tokens"),
        length.alias("n_tok"),
        source.alias("source"),
    )


def token_docs_sql(n_docs: int) -> str:
    """DuckDB query body producing the IDENTICAL table (name it `td`)."""
    ls = "CAST(i AS VARCHAR)"
    length = f"({h64_sql(ls, salt='len')} % {P_MAX_LEN - P_MIN_LEN + 1} + {P_MIN_LEN})"
    tok_j = h64_sql(
        "CAST(i AS VARCHAR) || ':' || CAST((j // 2) AS VARCHAR)", salt="tok"
    )
    src = (f"[{','.join(chr(39) + s + chr(39) for s in SOURCES)}]"
           f"[CAST({h64_sql(ls, salt='src')} % {len(SOURCES)} + 1 AS INT)]")
    return f"""
    SELECT printf('doc_%06d', i) AS doc_id,
           [CAST({tok_j} % {VOCAB} AS INT) for j in range(0, {length})] AS tokens,
           CAST({length} AS INT) AS n_tok,
           {src} AS source
    FROM range(0, {n_docs}) t(i)
    """


def portable_event_log_sql(
    n_events: int, n_docs: int, batch_size: int = 1000, hot_pct: int = 0
) -> str:
    """DuckDB CTE body producing the IDENTICAL event log (name it `ev`)."""
    ls = "CAST(i AS VARCHAR)"
    u_op = h64_sql(ls, salt="op") + " % 100"
    doc_ord = (
        f"CASE WHEN ({h64_sql(ls, salt='hot')} % 100) < {hot_pct} THEN 0 "
        f"ELSE {h64_sql(ls, salt='doc')} % {n_docs} END"
    )
    length = f"({h64_sql(ls, salt='len')} % {P_MAX_LEN - P_MIN_LEN + 1} + {P_MIN_LEN})"
    tok_j = h64_sql("CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)", salt="tok")
    src = (f"[{','.join(chr(39) + s + chr(39) for s in SOURCES)}]"
           f"[CAST({h64_sql(ls, salt='src')} % {len(SOURCES)} + 1 AS INT)]")
    return f"""
    SELECT
      i AS lsn,
      CAST(i // {batch_size} AS INT) AS batch_id,
      CASE WHEN u_op < {P_INSERT} THEN 'insert'
           WHEN u_op < {P_INSERT + P_UPDATE} THEN 'update'
           WHEN u_op < {P_INSERT + P_UPDATE + P_DELETE} THEN 'delete'
           ELSE 'upsert' END AS op,
      printf('doc_%06d', {doc_ord}) AS doc_id,
      CASE WHEN u_op >= {P_INSERT + P_UPDATE} AND u_op < {P_INSERT + P_UPDATE + P_DELETE}
           THEN NULL
           ELSE [CAST({tok_j} % {VOCAB} AS INT) for j in range(0, {length})] END AS tokens,
      CASE WHEN u_op >= {P_INSERT + P_UPDATE} AND u_op < {P_INSERT + P_UPDATE + P_DELETE}
           THEN NULL ELSE CAST({length} AS INT) END AS n_tok,
      CASE WHEN u_op >= {P_INSERT + P_UPDATE} AND u_op < {P_INSERT + P_UPDATE + P_DELETE}
           THEN NULL ELSE {src} END AS source
    FROM (SELECT range AS i, {u_op} AS u_op FROM range(0, {n_events}))
    """


def gen_sparse_event_log_portable(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    batch_size: int = 1000,
    hot_pct: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Portable SPARSE change-event tail: the portable log with each
    payload column independently withheld on ~1/3 of non-delete events
    (null = "column unchanged" under the partial-update / aggregation
    merge engines, cdc/partial.py + cdc/aggregate.py). When all three
    columns would be withheld, tokens is kept so every event still says
    something. Pure f(lsn) via h64 — sparse_event_log_sql is the
    bit-identical DuckDB twin."""
    ev = gen_event_log_portable(
        spark, n_events, n_docs, batch_size, hot_pct, partitions
    )
    ls = F.col("lsn").cast("string")
    kt = h64(ls, salt="sp_tok") % 3 != 0
    kn = h64(ls, salt="sp_ntok") % 3 != 0
    ks = h64(ls, salt="sp_src") % 3 != 0
    return ev.select(
        "lsn",
        "batch_id",
        "op",
        "doc_id",
        F.when(kt | (~kn & ~ks), F.col("tokens")).alias("tokens"),
        F.when(kn, F.col("n_tok")).alias("n_tok"),
        F.when(ks, F.col("source")).alias("source"),
    )


def sparse_event_log_sql(
    n_events: int, n_docs: int, batch_size: int = 1000, hot_pct: int = 0
) -> str:
    """DuckDB CTE body producing the IDENTICAL sparse event log."""
    ls = "CAST(lsn AS VARCHAR)"
    kt = f"({h64_sql(ls, salt='sp_tok')} % 3 != 0)"
    kn = f"({h64_sql(ls, salt='sp_ntok')} % 3 != 0)"
    ks = f"({h64_sql(ls, salt='sp_src')} % 3 != 0)"
    return f"""
    SELECT lsn, batch_id, op, doc_id,
      CASE WHEN {kt} OR (NOT {kn} AND NOT {ks}) THEN tokens END AS tokens,
      CASE WHEN {kn} THEN n_tok END AS n_tok,
      CASE WHEN {ks} THEN source END AS source
    FROM ({portable_event_log_sql(n_events, n_docs, batch_size, hot_pct)})
    """
