"""Distributed BPE tokenizer: corpus-scale training + Arrow-batched encode.

The industrial formulation (the one real tokenizer trainers use) splits
the work so that only ONE pass ever touches the corpus:

1. ``word_histogram`` — the single corpus-scale job: explode words,
   map-side-combined count per distinct word. At 100 TB the distinct-word
   histogram is MB-to-low-GB (Heaps' law), and the shuffle key (word) is
   high-cardinality and uniform.
2. ``bpe_train`` — the greedy merge loop runs DRIVER-SIDE over the
   collected histogram (top ``max_words`` by count — the cap is the
   explicit, disclosed memory bound; tail words barely influence pair
   counts). Incremental pair-count maintenance via a pair→words index
   makes the loop O(merges × touched-words), not O(merges × vocab).
3. ``bpe_encode`` — merge ranks BROADCAST to executors (a few hundred KB),
   applied per Arrow batch in a pandas UDF with a per-batch word→ids memo
   (words repeat heavily, so the amortized cost per row is a dict hit).
   No shuffle; the encode rides the scan.

This is the missing front half of the engine's token pipeline: documents
(text) → token ids feeding repair/truncate/pack (operators/tokens.py) and
the CDC spine's pre-tokenized sequences.

Determinism: ties in pair counts break on the lexicographically smallest
pair, so training is reproducible bit-for-bit across runs and cluster
sizes; encoding is a pure function of (text, merges).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, IntegerType

from .util import ensure_parallelism

UNK_ID = 0


def _words_expr(text_col: str):
    # same word definition as functions/portable.words: non-space runs
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the one corpus-scale pass of BPE
    training. Partial aggregation (map-side combine) means the shuffle
    carries distinct words per task, not corpus tokens."""
    return (
        ensure_parallelism(df)
        .select(F.explode(_words_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def train_from_histogram(
    hist: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE merge loop over a (word, count) histogram (Sennrich
    et al. 2016, alg. 1) with incremental pair-count maintenance.
    Returns the ordered merge list. Pure driver-side Python — its input
    is the bounded histogram, never the corpus."""
    words = [(list(w), int(n)) for w, n in hist if w]
    pair_counts: Counter = Counter()
    where: dict[tuple, set] = defaultdict(set)  # pair -> word indices
    for i, (syms, n) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += n
            where[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max count, ties -> lexicographically smallest pair (determinism)
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(where[best]):
            syms, n = words[i]
            j = 0
            while j < len(syms) - 1:
                if syms[j] == best[0] and syms[j + 1] == best[1]:
                    # retire the old neighbor pairs, splice, add new ones
                    if j > 0:
                        _dec(pair_counts, where, (syms[j - 1], syms[j]), n, i)
                    if j + 2 < len(syms):
                        _dec(pair_counts, where, (syms[j + 1], syms[j + 2]), n, i)
                    syms[j : j + 2] = [new_sym]
                    if j > 0:
                        _inc(pair_counts, where, (syms[j - 1], new_sym), n, i)
                    if j + 1 < len(syms):
                        _inc(pair_counts, where, (new_sym, syms[j + 1]), n, i)
                else:
                    j += 1
        # overlapping occurrences (e.g. "aaa") can already have _dec'd the
        # best pair to zero mid-splice — pop, don't del
        pair_counts.pop(best, None)
        where.pop(best, None)
    return merges


def _dec(counts, where, pair, n, i):
    counts[pair] -= n
    if counts[pair] <= 0:
        counts.pop(pair, None)
        where.pop(pair, None)


def _inc(counts, where, pair, n, i):
    counts[pair] += n
    where[pair].add(i)


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 200_000,
) -> dict:
    """Train BPE on a corpus DataFrame. Returns
    ``{"merges": [(a, b), ...], "vocab": {symbol: id}}``.

    Only the top ``max_words`` distinct words by (count desc, word) reach
    the driver — the disclosed memory bound; ordering ties on the word
    itself so the collected set is deterministic.
    """
    hist_rows = (
        word_histogram(df, text_col)
        .orderBy(F.desc("n"), "word")
        .limit(max_words)
        .collect()
    )
    hist = [(r["word"], r["n"]) for r in hist_rows]
    merges = train_from_histogram(hist, n_merges)
    chars = sorted({c for w, _ in hist for c in w})
    vocab = {"<unk>": UNK_ID}
    for c in chars:
        vocab[c] = len(vocab)
    for a, b in merges:
        vocab[a + b] = len(vocab)
    return {"merges": merges, "vocab": vocab}


def model_to_portable(model: dict) -> dict:
    """JSON-safe compact form: merges + the base character set (a single
    string, id order). Vocab ids reconstruct exactly — insertion order is
    <unk>, chars, then merge outputs — so the portable form stays
    O(n_merges + charset), small enough to ride in a commit summary."""
    n_chars = len(model["vocab"]) - 1 - len(model["merges"])
    chars = list(model["vocab"])[1 : 1 + n_chars]
    return {"merges": [list(p) for p in model["merges"]],
            "chars": "".join(chars)}


def model_from_portable(d: dict) -> dict:
    merges = [tuple(p) for p in d["merges"]]
    vocab = {"<unk>": UNK_ID}
    for c in d["chars"]:
        vocab[c] = len(vocab)
    for a, b in merges:
        vocab[a + b] = len(vocab)
    return {"merges": merges, "vocab": vocab}


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in rank order: repeatedly merge the lowest-rank
    adjacent pair (the standard BPE encode loop)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_j = None, None
        for j, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_j is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "bpe_ids",
) -> DataFrame:
    """Encode ``text_col`` to ``array<int>`` token ids with a trained
    model. Arrow-batched pandas UDF (never row-at-a-time Python), merge
    ranks broadcast via the UDF closure, per-batch word memo. Symbols
    outside the vocab map to UNK_ID. Word boundaries are whitespace (the
    histogram's word definition); ids concatenate in word order."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    vocab = dict(model["vocab"])

    @pandas_udf(ArrayType(IntegerType()))
    def _enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}

        def enc_word(w: str) -> list[int]:
            ids = memo.get(w)
            if ids is None:
                ids = [vocab.get(s, UNK_ID) for s in segment_word(w, ranks)]
                memo[w] = ids
            return ids

        def enc(t) -> list[int]:
            if t is None:
                return []
            out: list[int] = []
            for w in t.split():
                out.extend(enc_word(w))
            return out

        return texts.map(enc)

    return df.withColumn(out_col, _enc(F.col(text_col)))


def bpe_decode_ids(ids: list[int], vocab: dict[str, int]) -> str:
    """Driver-side helper: ids → concatenated symbols (word boundaries
    are not represented, see bpe_encode)."""
    rev = {i: s for s, i in vocab.items()}
    return "".join(rev.get(i, "�") for i in ids)
