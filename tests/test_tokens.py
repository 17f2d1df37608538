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


def test_pack_sequences_sep_token_and_spans_reconstruct(spark):
    """EOD separators land between documents, and doc_spans carry
    enough metadata to reconstruct every document from its packed
    slices — including documents straddling chunk boundaries."""
    rows = [
        ("s", "a", list(range(100, 105))),  # 5 tokens
        ("s", "b", list(range(200, 207))),  # 7 → straddles with seq_len 8
        ("s", "c", list(range(300, 310))),  # 10
    ]
    d = spark.createDataFrame(rows, "source string, doc_id string, tokens array<int>")
    out = sorted(
        TK.pack_sequences(
            d, seq_len=8, sep_token=-1, with_spans=True
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stream: a(5) SEP b(7) SEP c(10) = 24 tokens → 3 full chunks
    assert [r["n_tok"] for r in out] == [8, 8, 8]
    flat = [t for r in out for t in r["tokens"]]
    assert flat == [*range(100, 105), -1, *range(200, 207), -1, *range(300, 310)]
    # reconstruct each doc from its spans (sep billed to the doc it follows)
    rebuilt: dict[str, list[int]] = {}
    for r in out:
        for s in sorted(r["doc_spans"], key=lambda s: s["start"]):
            seg = list(r["tokens"][s["start"] : s["start"] + s["len"]])
            rebuilt.setdefault(s["doc_id"], []).extend(seg)
    assert rebuilt["a"] == [*range(100, 105), -1]
    assert rebuilt["b"] == [*range(200, 207), -1]
    assert rebuilt["c"] == list(range(300, 310))
    # spans tile each chunk exactly: no gaps, no overlaps
    for r in out:
        spans = sorted(r["doc_spans"], key=lambda s: s["start"])
        pos = 0
        for s in spans:
            assert s["start"] == pos and s["len"] > 0
            pos += s["len"]
        assert pos == r["n_tok"]


def test_pack_sequences_empty_docs_never_emit_zero_spans(spark):
    """Zero-token documents must not produce degenerate len-0 spans:
    without a separator they vanish; with one, their span is exactly
    the separator token."""
    rows = [("s", "a", [1, 2]), ("s", "b", []), ("s", "c", [3, 4])]
    d = spark.createDataFrame(rows, "source string, doc_id string, tokens array<int>")
    out = TK.pack_sequences(d, seq_len=4, with_spans=True).collect()
    spans = [s for r in out for s in r["doc_spans"]]
    assert all(s["len"] > 0 for s in spans)
    assert {s["doc_id"] for s in spans} == {"a", "c"}
    out = sorted(
        TK.pack_sequences(d, seq_len=4, sep_token=-1, with_spans=True).collect(),
        key=lambda r: r["chunk_id"],
    )
    flat = [t for r in out for t in r["tokens"]]
    assert flat == [1, 2, -1, -1, 3, 4]
    spans = [s for r in out for s in r["doc_spans"]]
    assert all(s["len"] > 0 for s in spans)
    b_spans = [s for s in spans if s["doc_id"] == "b"]
    assert len(b_spans) == 1 and b_spans[0]["len"] == 1  # just its sep


def test_pack_sequences_spans_without_separator(spark):
    rows = [("s", "x", [1, 2, 3]), ("s", "y", [4, 5, 6, 7])]
    d = spark.createDataFrame(rows, "source string, doc_id string, tokens array<int>")
    out = sorted(
        TK.pack_sequences(d, seq_len=5, with_spans=True).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [list(r["tokens"]) for r in out] == [[1, 2, 3, 4, 5], [6, 7]]
    assert [
        (s["doc_id"], s["start"], s["len"]) for s in out[0]["doc_spans"]
    ] == [("x", 0, 3), ("y", 3, 2)]
    assert [
        (s["doc_id"], s["start"], s["len"]) for s in out[1]["doc_spans"]
    ] == [("y", 0, 2)]


def test_pack_best_fit_never_splits_and_pads(spark):
    """First-fit-decreasing SFT packing: every doc lands whole in one
    bin, bins never exceed seq_len, padding is exact, and spans tile
    the real-token prefix."""
    rows = [
        ("s", "a", list(range(6))),
        ("s", "b", list(range(10, 14))),  # 4
        ("s", "c", list(range(20, 25))),  # 5
        ("s", "d", list(range(30, 33))),  # 3
        ("s", "e", []),
    ]
    d = spark.createDataFrame(rows, "source string, doc_id string, tokens array<int>")
    out = TK.pack_best_fit(d, seq_len=8, pad_token=-9).collect()
    placed: dict[str, list[int]] = {}
    for r in out:
        assert r["n_tok"] + r["n_pad"] == 8 == len(r["tokens"])
        assert list(r["tokens"][r["n_tok"] :]) == [-9] * r["n_pad"]
        pos = 0
        for s in sorted(r["doc_spans"], key=lambda s: s["start"]):
            assert s["start"] == pos and s["len"] > 0
            seg = list(r["tokens"][pos : pos + s["len"]])
            assert s["doc_id"] not in placed  # whole doc, exactly one bin
            placed[s["doc_id"]] = seg
            pos += s["len"]
        assert pos == r["n_tok"]
    assert placed == {
        "a": list(range(6)),
        "b": list(range(10, 14)),
        "c": list(range(20, 25)),
        "d": list(range(30, 33)),
    }
    # FFD on (6,5,4,3) into len-8 bins → 3 bins: [6],[5,3],[4]
    assert len(out) == 3
    total_pad = sum(r["n_pad"] for r in out)
    assert total_pad == 3 * 8 - 18


def test_pack_best_fit_null_doc_id_does_not_crash(spark):
    """A null doc_id tying another doc's length must not raise inside
    the sort (None vs str comparison) — the row packs like any other."""
    rows = [("s", None, [1, 2]), ("s", "x", [3, 4])]
    d = spark.createDataFrame(rows, "source string, doc_id string, tokens array<int>")
    out = TK.pack_best_fit(d, seq_len=4).collect()
    ids = sorted(
        (s["doc_id"] for r in out for s in r["doc_spans"]),
        key=lambda x: (x is not None, x),
    )
    assert ids == [None, "x"]


def test_pack_best_fit_overflow_modes(spark):
    rows = [("s", "big", list(range(12))), ("s", "ok", [1, 2])]
    d = spark.createDataFrame(rows, "source string, doc_id string, tokens array<int>")
    import pytest as _pytest

    with _pytest.raises(Exception, match="seq_len"):
        TK.pack_best_fit(d, seq_len=8).collect()
    dropped = TK.pack_best_fit(d, seq_len=8, overflow="drop").collect()
    assert {s["doc_id"] for r in dropped for s in r["doc_spans"]} == {"ok"}
    trunc = TK.pack_best_fit(d, seq_len=8, overflow="truncate").collect()
    by_doc = {
        s["doc_id"]: (r, s) for r in trunc for s in r["doc_spans"]
    }
    r, s = by_doc["big"]
    assert s["len"] == 8
    assert list(r["tokens"][s["start"] : s["start"] + 8]) == list(range(8))


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
