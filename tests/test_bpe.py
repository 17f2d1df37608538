"""Distributed BPE tokenizer (operators/bpe.py): histogram parity,
merge-loop correctness vs a naive reference, encode/decode, plan shape."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.bpe import (
    UNK_ID,
    bpe_decode_ids,
    bpe_encode,
    bpe_train,
    segment_word,
    train_from_histogram,
    word_histogram,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest new",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def _naive_merges(hist, n_merges):
    """Independent reference: recount every pair from scratch each round
    (the textbook O(merges x corpus) formulation)."""
    words = {tuple(w): n for w, n in hist}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, n in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        new_words = {}
        for syms, n in words.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def test_word_histogram_matches_local_count(spark):
    got = {r["word"]: r["n"] for r in word_histogram(_docs(spark)).collect()}
    want = Counter(w for t in CORPUS for w in t.split())
    assert got == dict(want)


def test_incremental_trainer_equals_naive_reference(spark):
    hist = sorted(
        Counter(w for t in CORPUS for w in t.split()).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert train_from_histogram(hist, 10) == _naive_merges(hist, 10)
    # and the overlap edge case (aaa / aaaa) stays consistent
    hist2 = [("aaaa", 3), ("aaa", 2), ("ab", 2)]
    assert train_from_histogram(hist2, 5) == _naive_merges(hist2, 5)


def test_train_is_deterministic_and_learns_frequent_units(spark):
    m1 = bpe_train(_docs(spark), n_merges=12)
    m2 = bpe_train(_docs(spark), n_merges=12)
    assert m1["merges"] == m2["merges"] and m1["vocab"] == m2["vocab"]
    # 'newest' dominates: its pieces must have merged into one symbol
    assert "newest" in m1["vocab"]
    assert "low" in m1["vocab"]


def test_encode_roundtrip_and_unk(spark):
    model = bpe_train(_docs(spark), n_merges=12)
    docs = spark.createDataFrame(
        [(0, "low newest widest"), (1, "lowest"), (2, "qqq zz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: list(r["bpe_ids"])
           for r in bpe_encode(docs, model).collect()}
    # lossless for in-vocab character streams (whitespace is the word
    # boundary and is not represented)
    assert bpe_decode_ids(out[0], model["vocab"]) == "lownewestwidest"
    assert bpe_decode_ids(out[1], model["vocab"]) == "lowest"
    # chars never seen in training -> UNK
    assert set(out[2]) == {UNK_ID}
    # frequent whole words encode as a single id
    enc_low = out[0][: 1]
    assert bpe_decode_ids(enc_low, model["vocab"]) == "low"


def test_segment_word_respects_rank_order():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("l", "o"): 2}
    assert segment_word("lowest", ranks) == ["lo", "w", "est"]
    assert segment_word("", ranks) == []
    assert segment_word("x", ranks) == ["x"]


def test_encode_plan_is_arrow_batched(spark):
    model = bpe_train(_docs(spark), n_merges=4)
    plan = bpe_encode(_docs(spark), model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_incremental_trainer_parity_randomized():
    """Property: the incremental pair-count trainer equals the recount-
    from-scratch reference on random histograms (overlaps, repeats,
    single-char words, ties). Pure Python — no Spark."""
    import random

    rng = random.Random(7)
    alphabet = "abc"
    for trial in range(200):
        n_words = rng.randint(1, 12)
        hist = []
        seen = set()
        for _ in range(n_words):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 8)))
            if w in seen:
                continue
            seen.add(w)
            hist.append((w, rng.randint(1, 9)))
        hist.sort(key=lambda kv: (-kv[1], kv[0]))
        n_merges = rng.randint(1, 10)
        got = train_from_histogram(list(hist), n_merges)
        want = _naive_merges(hist, n_merges)
        assert got == want, (trial, hist, n_merges, got, want)
