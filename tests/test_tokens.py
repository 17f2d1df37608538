"""Vectorized token-array operators (operators/tokens.py): golden cases +
numpy-oracle equivalence. Generalizes the reference's repair tests
(/root/reference/grid-and-attrs/repair.js via footprint.test.js golden
style)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_pipeline_spark.gen import gen_token_docs_portable
from data_pipeline_spark.operators import tokens as TK


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_repair_golden(spark):
    rows = [
        ("a", [1, 1, 2, 2, 2, 3, 1]),
        ("b", [5]),
        ("c", []),
        ("d", None),
    ]
    out = {
        r["doc_id"]: r["tokens_repaired"]
        for r in TK.repair_tokens(_df(spark, rows)).collect()
    }
    assert out["a"] == [1, 2, 3, 1]
    assert out["b"] == [5]
    assert out["c"] == []
    assert out["d"] is None


def test_truncate_pad_edges(spark):
    rows = [("a", list(range(10))), ("b", [7, 7]), ("c", []), ("d", None)]
    out = {
        r["doc_id"]: r["tokens_fixed"]
        for r in TK.truncate_pad(_df(spark, rows), max_len=4).collect()
    }
    assert out["a"] == [0, 1, 2, 3]
    assert out["b"] == [7, 7, 0, 0]
    assert out["c"] == [0, 0, 0, 0]
    assert out["d"] is None


def test_histogram_conserves_mass(spark):
    d = gen_token_docs_portable(spark, 200)
    total_tokens = d.select(F.sum(F.size("tokens"))).collect()[0][0]
    h = TK.token_histogram(d)
    assert h.select(F.sum("n")).collect()[0][0] == total_tokens


def test_pack_sequences_matches_numpy_oracle(spark):
    d = gen_token_docs_portable(spark, 300)
    packed = TK.pack_sequences(d, seq_len=64).collect()
    pdf = d.toPandas().sort_values("doc_id")
    for src in pdf["source"].unique():
        flat = np.concatenate(
            [np.asarray(a) for a in pdf[pdf["source"] == src]["tokens"]]
        )
        chunks = [
            list(flat[i : i + 64]) for i in range(0, len(flat), 64)
        ]
        got = sorted(
            (r["chunk_id"], list(r["tokens"]))
            for r in packed
            if r["source"] == src
        )
        assert got == list(enumerate(chunks))
        # every chunk except possibly the last is full
        for cid, c in got[:-1]:
            assert len(c) == 64


def test_ngram_stream(spark):
    rows = [("a", [1, 2, 3, 4]), ("b", [9]), ("c", [])]
    out = {r["doc_id"]: r["ngrams"] for r in TK.ngram_stream(_df(spark, rows), n=2).collect()}
    assert out["a"] == [[1, 2], [2, 3], [3, 4]]
    assert out["b"] == []
    assert out["c"] == []


def test_mean_token(spark):
    rows = [("a", [1, 2, 3]), ("b", [])]
    out = {r["doc_id"]: r["mean_token"] for r in TK.mean_token(_df(spark, rows)).collect()}
    assert out["a"] == 2.0
    assert out["b"] is None
