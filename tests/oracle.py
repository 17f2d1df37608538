"""Trivial in-memory replay oracle (pandas): the ground truth the engine
must match row-for-row (token-array equality, per BASELINE input_hint).

Applies events strictly in (lsn, op_rank) order, one at a time:
non-delete sets the row (log-compaction semantics), delete removes it.
Matching tests generalize the reference's golden-value style
(/root/reference/grid-and-attrs/footprint.test.js:22-29).
"""

from __future__ import annotations

import pandas as pd

OP_RANK = {"insert": 0, "update": 1, "upsert": 2, "delete": 3}


def replay_oracle(events: pd.DataFrame, payload_cols: list[str]) -> pd.DataFrame:
    """events: columns lsn, op, doc_id, *payload_cols. Returns the final
    table sorted by doc_id."""
    ev = events.copy()
    ev["_rank"] = ev["op"].map(OP_RANK)
    ev = ev.sort_values(["lsn", "_rank"], kind="stable")
    state: dict[str, dict] = {}
    for row in ev.itertuples(index=False):
        d = row._asdict()
        if d["op"] == "delete":
            state.pop(d["doc_id"], None)
        else:
            state[d["doc_id"]] = {c: d.get(c) for c in payload_cols}
    out = pd.DataFrame(
        [{"doc_id": k, **v} for k, v in state.items()],
        columns=["doc_id"] + [c for c in payload_cols if c != "doc_id"],
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def assert_tables_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Order-insensitive row equality with exact token-array comparison."""
    a = actual.sort_values("doc_id").reset_index(drop=True)
    e = expected.sort_values("doc_id").reset_index(drop=True)
    assert list(a.columns) == list(e.columns), (list(a.columns), list(e.columns))
    assert len(a) == len(e), (len(a), len(e))
    for col in a.columns:
        av, ev_ = a[col].tolist(), e[col].tolist()
        for i, (x, y) in enumerate(zip(av, ev_)):
            if isinstance(x, (list, tuple)) or hasattr(x, "tolist"):
                x = list(x) if not hasattr(x, "tolist") else x.tolist()
            if isinstance(y, (list, tuple)) or hasattr(y, "tolist"):
                y = list(y) if not hasattr(y, "tolist") else y.tolist()
            if x is None or (isinstance(x, float) and pd.isna(x)):
                assert y is None or (isinstance(y, float) and pd.isna(y)), (col, i, x, y)
            else:
                assert x == y, (col, i, x, y)
