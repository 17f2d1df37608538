"""cdc — the change-data-capture apply engine.

apply.py   normalize → salted LWW dedup → copy-on-write MERGE → tagged commit
stream.py  Structured Streaming foreachBatch driver + checkpoint resume
"""

from .apply import apply_batch, lww_dedup, normalize_events, replay_log

__all__ = ["apply_batch", "lww_dedup", "normalize_events", "replay_log"]
