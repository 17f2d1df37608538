"""Vectorized token-array operators (the engine's payload type:
tokens array<int32>).

The hot path stays JVM-side: higher-order functions (transform / filter /
slice / aggregate) over the array column — whole-stage codegen, zero
Python. The one op that genuinely needs imperative carry state across
rows — packing documents into fixed-length training sequences — uses
Arrow-batched applyInPandas (vectorized; never per-row Python), per the
BASELINE input_hint.

Reference parity:
  * repair_tokens ≙ duplicate-vertex repair (collapse consecutive equal
    points in a ring, /root/reference/grid-and-attrs/repair.js:11-30);
  * truncate_pad ≙ unit normalization (ft→m clamp,
    /root/reference/data-prep/LARIAC4-2014/transform.js:46-53);
  * token_histogram ≙ the per-category counters
    (/root/reference/grid-and-attrs/app.js:136-141);
  * pack_sequences ≙ the chunked sink (40k buildings per output file,
    /root/reference/citygml/src/main/java/org/opencitymodel/citygml/Main.java:84-86)
    — a row-order-dependent re-blocking of the stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PAD_ID = 0


def repair_tokens(
    df: DataFrame, tok_col: str = "tokens", out_col: str = "tokens_repaired"
) -> DataFrame:
    """Collapse consecutive duplicate tokens (keep the first of each run).

    Pure HOF: keep element i iff i == 0 or t[i] != t[i-1]. Implemented by
    filtering the index sequence then projecting — no UDF, no explode.
    """
    t = F.col(tok_col)
    idx = F.sequence(F.lit(1), F.size(t))
    keep = F.filter(
        idx, lambda i: (i == 1) | (F.element_at(t, i) != F.element_at(t, i - 1))
    )
    repaired = F.transform(keep, lambda i: F.element_at(t, i))
    # size==0 guard: sequence(1, 0) DESCENDS in Spark, which would probe
    # element_at out of bounds (an error under ANSI mode)
    return df.withColumn(
        out_col,
        F.when(t.isNull(), F.lit(None))
        .when(F.size(t) == 0, t)
        .otherwise(repaired),
    )


def truncate_pad(
    df: DataFrame,
    max_len: int,
    tok_col: str = "tokens",
    out_col: str = "tokens_fixed",
    pad_id: int = PAD_ID,
) -> DataFrame:
    """Truncate to max_len / right-pad with pad_id to exactly max_len."""
    t = F.col(tok_col)
    cut = F.slice(t, 1, max_len)
    pad = F.array_repeat(
        F.lit(pad_id).cast("int"), (F.lit(max_len) - F.size(cut)).cast("int")
    )
    return df.withColumn(
        out_col, F.when(t.isNull(), F.lit(None)).otherwise(F.concat(cut, pad))
    )


def token_histogram(df: DataFrame, tok_col: str = "tokens") -> DataFrame:
    """Global token frequency: (token, n). Explode + map-side-combined
    count — the canonical vocabulary-stats pass."""
    return (
        df.select(F.explode(tok_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    sep_token: int | None = None,
    with_spans: bool = False,
) -> DataFrame:
    """Concat-then-chunk sequence packing, per group: concatenate all
    token arrays in id order, split into fixed seq_len chunks (last
    partial chunk kept). Output: (group, chunk_id, tokens, n_tok
    [, doc_spans]).

    sep_token: when set, inserted between consecutive documents before
    chunking (the EOD separator convention — boundaries survive into
    the training stream even when a reader ignores doc_spans).

    with_spans: also emit `doc_spans: array<struct<doc_id, start,
    len>>` — which documents contribute to each chunk and where, the
    metadata an attention mask that stops cross-document attention
    needs. A straddling document appears in every chunk it touches
    with the local (start, len) of its resident slice; separator
    tokens belong to the document they follow. Spans are always
    positive-length: a zero-token document contributes a span only via
    its separator (when sep_token is set), otherwise it vanishes from
    the packed stream.

    Packing has carry state across rows (a doc may straddle a chunk
    boundary), so each group is processed as ONE Arrow batch via
    applyInPandas — vectorized numpy concat/reshape inside, no per-row
    Python. Groups shuffle-partition by group_col; a group's token total
    must fit an executor (callers choose group granularity — the same
    contract as any groupBy).
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{group_col} string, chunk_id long, tokens array<int>, n_tok int"
    )
    if with_spans:
        out_schema += (
            ", doc_spans array<struct<doc_id: string, start: int, len: int>>"
        )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        arrs, ids = [], []
        for i, a in zip(pdf[id_col], pdf[tok_col]):
            if a is not None:
                arrs.append(np.asarray(a, dtype=np.int64))
                ids.append(i)
        cols = {group_col: [], "chunk_id": [], "tokens": [], "n_tok": []}
        if with_spans:
            cols["doc_spans"] = []
        if not arrs:
            return pd.DataFrame(cols)
        if sep_token is not None:
            sep = np.array([sep_token], dtype=np.int64)
            arrs = [x for a in arrs for x in (a, sep)][:-1] or arrs
        flat = np.concatenate(arrs)
        chunks = [
            flat[i : i + seq_len].astype("int32")
            for i in range(0, len(flat), seq_len)
        ]
        g = pdf[group_col].iloc[0]
        cols[group_col] = [g] * len(chunks)
        cols["chunk_id"] = np.arange(len(chunks), dtype="int64")
        cols["tokens"] = chunks
        cols["n_tok"] = np.array([len(c) for c in chunks], dtype="int32")
        if with_spans:
            # absolute [start, end) of each doc in the packed stream;
            # the separator after a doc is billed to that doc
            step = 1 if sep_token is not None else 0
            lens = np.array([len(a) for a in arrs[:: 2 if step else 1]])
            if step:
                lens = lens + np.where(np.arange(len(lens)) < len(lens) - 1, 1, 0)
            ends = np.cumsum(lens)
            starts = ends - lens
            spans_per_chunk: list[list[dict]] = []
            d = 0
            for ci in range(len(chunks)):
                lo, hi = ci * seq_len, ci * seq_len + len(chunks[ci])
                while d < len(lens) and ends[d] <= lo:
                    d += 1
                spans, j = [], d
                while j < len(lens) and starts[j] < hi:
                    s = max(int(starts[j]), lo)
                    e = min(int(ends[j]), hi)
                    if e > s:  # zero-token docs (no sep) emit no span
                        spans.append(
                            {"doc_id": ids[j], "start": s - lo, "len": e - s}
                        )
                    j += 1
                spans_per_chunk.append(spans)
            cols["doc_spans"] = spans_per_chunk
        return pd.DataFrame(cols)

    return df.select(group_col, id_col, tok_col).groupBy(group_col).applyInPandas(
        _pack, schema=out_schema
    )


def pack_best_fit(
    df: DataFrame,
    seq_len: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    pad_token: int = PAD_ID,
    overflow: str = "error",
) -> DataFrame:
    """Bin packing that NEVER splits a document — the convention for
    instruction/SFT data, where a truncated example is a corrupted one
    (pack_sequences is the pretraining concat-then-chunk twin).

    Per group: best-fit-decreasing — docs sorted by length descending,
    each placed in the feasible bin with the LEAST remaining room
    (tightest fit), new bin when none fits; bins pad to seq_len with
    pad_token. Output: (group, bin_id, tokens, n_tok,
    n_pad, doc_spans) where n_tok counts real tokens, and doc_spans
    carries (doc_id, start, len) per resident doc for the attention
    mask. Deterministic: ties broken by doc id.

    overflow: what to do with a doc longer than seq_len — "error"
    (default, loud), "drop" (excluded, count them upstream), or
    "truncate" (keep the first seq_len tokens).

    Same distribution contract as pack_sequences: one group = one Arrow
    batch via applyInPandas, numpy inside, group token totals sized by
    the caller.
    """
    import numpy as np
    import pandas as pd

    if overflow not in ("error", "drop", "truncate"):
        raise ValueError(f"bad overflow mode {overflow!r}")

    out_schema = (
        f"{group_col} string, bin_id long, tokens array<int>, n_tok int, "
        "n_pad int, doc_spans array<struct<doc_id: string, start: int, len: int>>"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = []
        for i, a in zip(pdf[id_col], pdf[tok_col]):
            if a is None:
                continue
            arr = np.asarray(a, dtype=np.int64)
            if len(arr) > seq_len:
                if overflow == "error":
                    raise ValueError(
                        f"doc {i!r}: {len(arr)} tokens > seq_len {seq_len} "
                        "(overflow='drop'/'truncate' to opt out)"
                    )
                if overflow == "drop":
                    continue
                arr = arr[:seq_len]
            if len(arr):
                docs.append((i, arr))
        # best-fit-decreasing, ties by id for determinism (null ids
        # sort as empty — a data quirk must not crash the job)
        docs.sort(key=lambda d: (-len(d[1]), "" if d[0] is None else str(d[0])))
        bins: list[list[tuple]] = []
        room: list[int] = []
        for i, arr in docs:
            fits = [b for b, r in enumerate(room) if len(arr) <= r]
            if fits:
                b = min(fits, key=lambda b: room[b])  # tightest bin
                bins[b].append((i, arr))
                room[b] -= len(arr)
            else:
                bins.append([(i, arr)])
                room.append(seq_len - len(arr))
        cols = {
            group_col: [],
            "bin_id": [],
            "tokens": [],
            "n_tok": [],
            "n_pad": [],
            "doc_spans": [],
        }
        g = pdf[group_col].iloc[0] if len(pdf) else None
        for b, members in enumerate(bins):
            flat = np.concatenate([a for _, a in members])
            pad = seq_len - len(flat)
            spans, pos = [], 0
            for i, arr in members:
                spans.append({"doc_id": i, "start": pos, "len": len(arr)})
                pos += len(arr)
            cols[group_col].append(g)
            cols["bin_id"].append(b)
            cols["tokens"].append(
                np.concatenate(
                    [flat, np.full(pad, pad_token, np.int64)]
                ).astype("int32")
            )
            cols["n_tok"].append(len(flat))
            cols["n_pad"].append(pad)
            cols["doc_spans"].append(spans)
        return pd.DataFrame(cols)

    return df.select(group_col, id_col, tok_col).groupBy(group_col).applyInPandas(
        _pack, schema=out_schema
    )


def mean_token(df: DataFrame, tok_col: str = "tokens") -> DataFrame:
    """Per-row mean token id (A7 centroid analog) via aggregate HOF."""
    t = F.col(tok_col)
    s = F.aggregate(t, F.lit(0.0), lambda a, x: a + x)
    return df.withColumn(
        "mean_token",
        F.when(F.size(t) > 0, F.round(s / F.size(t), 6)),
    )


def ngram_stream(
    df: DataFrame, n: int = 2, id_col: str = "doc_id", tok_col: str = "tokens"
) -> DataFrame:
    """Token n-grams per doc as array<array<int>> (training-data n-gram
    features) — windowed slices via transform over an index sequence."""
    t = F.col(tok_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(0)))
    grams = F.when(F.size(t) >= n, F.transform(idx, lambda i: F.slice(t, i, n))).otherwise(
        F.array().cast("array<array<int>>")
    )
    return df.select(F.col(id_col), grams.alias("ngrams"))
