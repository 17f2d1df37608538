"""Duplicated-passage detection (operators/passages.py): hand-computed
span semantics, DuckDB lockstep parity (the same oracle-grade check the
driver runs for registry queries, run locally here), stride behavior,
and the staged-array plan contract."""

from __future__ import annotations

import duckdb
import pandas as pd

from data_pipeline_spark.operators.passages import (
    duplicate_passages,
    duplicate_passages_sql,
    window_fingerprints,
)

PASSAGE = "the quick brown fox jumps over the lazy dog again and again"  # 12 words


def _spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_id"], r["span_start"]): (
            r["span_end"],
            r["n_windows"],
            r["max_docs"],
        )
        for r in duplicate_passages(df, **kw).collect()
    }


def test_shared_passage_detected_with_exact_span(spark):
    rows = [
        (1, "alpha beta " + PASSAGE + " gamma delta epsilon"),
        (2, "zero one two three " + PASSAGE),
        (3, "unrelated words only here nothing shared with any other doc at all"),
    ]
    got = _spans(spark, rows, window=8)
    # doc 1: passage occupies words 2..13 → dup windows start 2..6 (5
    # windows of 8 words), span [2, 13]
    assert got[(1, 2)] == (13, 5, 2)
    # doc 2: passage occupies words 4..15 → starts 4..8, span [4, 15]
    assert got[(2, 4)] == (15, 5, 2)
    assert not any(d == 3 for d, _ in got)  # unique doc clean


def test_within_doc_repeat_needs_min_docs_relaxation(spark):
    text = PASSAGE + " filler " + PASSAGE  # same passage twice, ONE doc
    rows = [(1, text), (2, "entirely different content with no overlap here at all")]
    assert _spans(spark, rows, window=8) == {}  # 1 distinct doc < min_docs=2
    got = _spans(spark, rows, window=8, min_docs=1)  # every window is its own dup
    assert (1, 0) in got  # relaxed: the whole doc marks


def test_duckdb_lockstep_parity(spark):
    """Spark result == DuckDB twin row-for-row on docs with planted
    shared passages, different offsets, and a near-miss (one word
    changed mid-passage splits the span)."""
    near_miss = PASSAGE.replace("lazy", "sleepy")
    rows = [
        (1, "intro words " + PASSAGE + " outro"),
        (2, PASSAGE),
        (3, "padding one two three four five six seven " + PASSAGE + " tail"),
        (4, near_miss),
        (5, "x " + near_miss),
        (6, "totally disjoint text goes in this document nothing matches anything"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    got = (
        duplicate_passages(df, window=5)
        .toPandas()
        .astype("int64")
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(duplicate_passages_sql(window=5))
        .df()
        .astype("int64")
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert len(want) >= 4  # the planted passages actually matched


def test_stride_subsamples_windows(spark):
    rows = [(1, PASSAGE + " pad"), (2, "lead " + PASSAGE)]
    dense = _spans(spark, rows, window=6, stride=1)
    assert dense  # aligned windows exist at stride 1
    fps = window_fingerprints(
        spark.createDataFrame(rows, "doc_id long, text string"),
        window=6,
        stride=3,
    ).collect()
    assert all(r["start"] % 3 == 0 for r in fps)  # only stride-aligned starts
    n_words_doc1 = len(rows[0][1].split())
    assert (
        len([r for r in fps if r["doc_id"] == 1])
        == (n_words_doc1 - 6) // 3 + 1
    )


def test_plan_single_fingerprint_pass_and_staged_word_array(spark):
    """The word array must be a staged projection BELOW the generate
    (a lambda over an inlined split() re-evaluates it per window —
    the repetition_stats 36× bug class); the corpus is fingerprinted
    exactly ONCE (one Generate — the window-aggregate doc-frequency
    shape, not a groupBy+self-join that scans twice); and the whole
    operator is exactly two exchanges (fp, then doc id)."""
    df = spark.createDataFrame([(1, PASSAGE)], "doc_id long, text string")
    opt = (
        window_fingerprints(df, window=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    gen_line = next(ln for ln in opt.splitlines() if "posexplode" in ln)
    assert "split(" not in gen_line  # lambda slices the ATTRIBUTE, not split()
    assert any(
        "split(" in ln and "Project" in ln for ln in opt.splitlines()
    )  # the staged projection is where split lives

    import re

    qe = duplicate_passages(df, window=4)._jdf.queryExecution()
    phys = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
    n_gen = len(re.findall(r"^\(\d+\) Generate", phys, re.M))
    assert n_gen == 1, phys[:2000]
    n_ex = sum(
        1 for ln in phys.splitlines() if ln.lstrip().startswith("Arguments: hashpartitioning(")
    )
    assert n_ex == 2, f"expected 2 exchanges (fp + id), got {n_ex}:\n{phys[:2000]}"
