"""Real-codec path for the multimodal operators: when PIL is installed
these tests decode and resize an actual PNG through the same Arrow-batched
mapInPandas plumbing the fake codec uses; without PIL they SKIP (never
fake) — the sandbox lacks PIL, a real cluster would run them."""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL.Image", reason="PIL not installed (sandbox)")

from data_pipeline_spark.operators import multimodal as M  # noqa: E402


def _png_bytes(w: int, h: int) -> bytes:
    im = PIL.new("RGB", (w, h), color=(7, 42, 99))
    out = io.BytesIO()
    im.save(out, format="PNG")
    return out.getvalue()


def test_decode_real_png_metadata(spark):
    rows = [(1, _png_bytes(320, 200), "image"), (2, _png_bytes(64, 48), "image")]
    df = spark.createDataFrame(rows, "id long, media binary, media_type string")
    got = {r["id"]: (r["width"], r["height"], r["n_frames"])
           for r in M.decode_metadata(df).collect()}
    assert got == {1: (320, 200, 1), 2: (64, 48, 1)}


def test_resize_real_png(spark):
    df = spark.createDataFrame(
        [(1, _png_bytes(320, 200), "image")],
        "id long, media binary, media_type string",
    )
    out = M.resize_media(df, 32, 32).collect()[0]
    assert (out["width"], out["height"]) == (32, 32)
    with PIL.open(io.BytesIO(bytes(out["media"]))) as im:
        assert im.size == (32, 32)  # payload really re-encoded
