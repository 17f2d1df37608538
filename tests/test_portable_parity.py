"""Spark ↔ DuckDB parity for the portable expression layer and the
portable event-log generator — the foundation the oracle gate rests on.

Engine-independence is the reference's golden-value contract
(/root/reference/grid-and-attrs/footprint.test.js:22-34) generalized:
instead of pinning literals, we pin agreement with an independent
engine over adversarial inputs (unicode, empty, short strings).
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.functions.portable import (
    h64,
    h64_sql,
    norm_text,
    norm_text_sql,
    shingles,
    shingles_sql,
    words,
    words_sql,
)
from data_pipeline_spark.gen import gen_event_log_portable, portable_event_log_sql

SAMPLES = [
    "hello world",
    "The quick brown fox! Jumps; over 12 lazy dogs...",
    "a",
    "",
    "  spaced   out  ",
    "ünïcødé tëxt mit Ümläuten",
    "的是了在和有我不人这",
    "tab\tand\nnewline",
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame([(s,) for s in SAMPLES], "s string")


def _spark_vals(df, expr):
    return [r[0] for r in df.select(expr.alias("v")).collect()]


def _duck_vals(duck, sql_expr):
    return [
        duck.execute(f"SELECT {sql_expr.replace('?', '?')}", [s]).fetchone()[0]
        for s in SAMPLES
    ]


def test_h64_parity(sample_df, duck):
    sp = _spark_vals(sample_df, h64("s", salt="x"))
    dk = [
        duck.execute(f"SELECT {h64_sql('?', salt='x')}", [s]).fetchone()[0]
        for s in SAMPLES
    ]
    assert sp == dk


def test_shingles_parity(sample_df, duck):
    sp = _spark_vals(sample_df, shingles("s", k=5))
    dk = [
        duck.execute(f"SELECT {shingles_sql('?', 5)}", [s, s, s]).fetchone()[0]
        for s in SAMPLES
    ]
    assert [list(x) for x in sp] == [list(x) for x in dk]


def test_words_parity(sample_df, duck):
    sp = _spark_vals(sample_df, words("s"))
    dk = [duck.execute(f"SELECT {words_sql('?')}", [s]).fetchone()[0] for s in SAMPLES]
    assert [list(x) for x in sp] == [list(x) for x in dk]


def test_norm_text_parity(sample_df, duck):
    sp = _spark_vals(sample_df, norm_text("s"))
    dk = [
        duck.execute(f"SELECT {norm_text_sql('?')}", [s]).fetchone()[0]
        for s in SAMPLES
    ]
    assert sp == dk


def test_portable_event_log_parity(spark, duck):
    """The Spark generator and the DuckDB CTE build the IDENTICAL log —
    lsn, batch, op, doc_id, token arrays, n_tok, source."""
    n, docs = 400, 37
    sp = (
        gen_event_log_portable(spark, n, docs, batch_size=100, hot_pct=15)
        .orderBy("lsn")
        .collect()
    )
    dk = duckdb.connect().execute(
        f"SELECT * FROM ({portable_event_log_sql(n, docs, 100, 15)}) ORDER BY lsn"
    ).fetchall()
    assert len(sp) == len(dk) == n
    for r_sp, r_dk in zip(sp, dk):
        assert r_sp["lsn"] == r_dk[0]
        assert r_sp["batch_id"] == r_dk[1]
        assert r_sp["op"] == r_dk[2]
        assert r_sp["doc_id"] == r_dk[3]
        sp_tok = list(r_sp["tokens"]) if r_sp["tokens"] is not None else None
        dk_tok = list(r_dk[4]) if r_dk[4] is not None else None
        assert sp_tok == dk_tok
        assert r_sp["n_tok"] == r_dk[5]
        assert r_sp["source"] == r_dk[6]
    # op mix sanity: all four ops present, deletes ≈ 5%
    ops = {r["op"] for r in sp}
    assert ops == {"insert", "update", "delete", "upsert"}
