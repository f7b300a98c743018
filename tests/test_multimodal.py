"""Multimodal binary-column tests: payload/metadata construction and the
Arrow-batched decode/resize/frame seams (goldens on tiny synthetic docs)."""

from __future__ import annotations

import hashlib

import numpy as np

from yamr_spark.operators.multimodal import (
    decode_image_stats,
    resize_thumbnail,
    sample_frames,
    with_binary_payload,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_payload_meta(spark):
    txt = "hello multimodal"
    row = with_binary_payload(_docs(spark, [txt])).collect()[0]
    raw = txt.encode()
    assert bytes(row["payload"]) == raw
    assert row["meta"]["n_bytes"] == len(raw)
    assert row["meta"]["sha256"] == hashlib.sha256(raw).hexdigest()
    assert row["meta"]["mime"] == "application/octet-stream"


def test_decode_stats_golden(spark):
    txt = "a" * 64 + "b" * 64 + "xyz"  # 2 full 64-wide rows + ragged tail
    row = decode_image_stats(with_binary_payload(_docs(spark, [txt]))).collect()[0]
    px = np.frombuffer(txt.encode()[:128], dtype=np.uint8)
    assert (row["width"], row["height"]) == (64, 2)
    assert row["mean_px"] == px.mean()
    assert row["std_px"] == px.std()


def test_decode_short_payload(spark):
    row = decode_image_stats(with_binary_payload(_docs(spark, ["hi"]))).collect()[0]
    assert (row["width"], row["height"]) == (2, 1)


def test_resize_shape_and_determinism(spark):
    docs = with_binary_payload(_docs(spark, ["z" * 1000, "q" * 300]))
    rows = {r["doc_id"]: r for r in resize_thumbnail(docs, 8, 8).collect()}
    assert all(len(bytes(r["thumb"])) == 64 for r in rows.values())
    # constant input → constant thumbnail
    assert bytes(rows[0]["thumb"]) == b"z" * 64
    again = {r["doc_id"]: r for r in resize_thumbnail(docs, 8, 8).collect()}
    assert bytes(again[1]["thumb"]) == bytes(rows[1]["thumb"])


def test_frame_sampling(spark):
    # 10 frames of 4 bytes; every 2nd → indices 0,2,4,6,8
    buf = "".join(chr(ord("a") + i) * 4 for i in range(10))
    rows = sorted(
        sample_frames(with_binary_payload(_docs(spark, [buf])), frame_bytes=4, every_k=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6, 8]
    assert bytes(rows[1]["frame"]) == b"cccc"
