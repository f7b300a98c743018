"""Multimodal binary-column tests: payload/metadata construction and the
Arrow-batched decode/resize/frame seams (goldens on tiny synthetic docs)."""

from __future__ import annotations

import hashlib
import math

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
    # integer-exact moments (one IEEE division + sqrt — the engine-
    # portable closed form; numpy's accumulated std can differ in ulps)
    n, s, s2 = px.size, int(px.sum()), int((px.astype(np.int64) ** 2).sum())
    assert row["mean_px"] == s / n
    assert row["std_px"] == math.sqrt((n * s2 - s * s) / (n * n))
    assert abs(row["std_px"] - px.std()) < 1e-9


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


def test_image_ahash_near_dup_goldens(spark):
    """aHash perceptual dedup on crafted 8-row images (512 ASCII bytes →
    H=8, W=64; sampled grid positions are r*64 + 9c): identical images
    pair at hamming 0; a single sampled-pixel edit (far from the mean on
    both sides) moves exactly one bit → hamming 1 — the pigeonhole
    banding must find both; an inverted pattern is far beyond
    max_hamming and must not pair; >max_bucket identical images make
    every band hot, so the cap drops all their candidates."""
    from yamr_spark.operators.multimodal import (
        image_ahash_bands,
        image_ahash_near_dup,
    )

    sampled = {r * 64 + 9 * c for r in range(8) for c in range(8)}

    def img(flip_origin=False, invert=False):
        chars = []
        for p in range(512):
            if p in sampled:
                r, c = p // 64, (p % 64) // 9
                hi = (r + c) % 2 == 0
                if invert:
                    hi = not hi
                if flip_origin and p == 0:
                    hi = False
                chars.append("z" if hi else "0")
            else:
                chars.append("0")
        return "".join(chars)

    rows = [
        (1, img()),
        (2, img()),               # identical → hamming 0 with 1
        (3, img(flip_origin=True)),  # one sampled bit off → hamming 1
        (4, img(invert=True)),    # complement pattern → far, no pair
        (5, "short"),             # L<64 path must not error
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_ahash_near_dup(docs).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 1 and pairs[(2, 3)] == 1
    assert not any(4 in p or 5 in p for p in pairs)

    # band packing sanity: 4 ints in [0, 65535]
    bands = image_ahash_bands(docs).collect()[0].bands
    assert len(bands) == 4 and all(0 <= b <= 0xFFFF for b in bands)

    # cap: 120 identical images → every band bucket hot → zero pairs
    many = spark.createDataFrame(
        [(100 + i, img()) for i in range(120)], "doc_id long, text string"
    )
    assert image_ahash_near_dup(many).count() == 0
    # raising the cap restores the full clique
    n = image_ahash_near_dup(many, max_bucket=200).count()
    assert n == 120 * 119 // 2


def test_audio_fingerprint_near_dup_goldens(spark):
    """Acoustic fingerprint on crafted 256-byte clips (8 frames × 32
    bytes): identical clips pair at 0 differing frames; a heavy edit
    confined to ONE frame moves exactly that frame's symbol → diff 1,
    found via the pigeonhole bands; edits in 3 frames exceed
    max_frame_diff=2 and must not pair; clips under 256 bytes are
    excluded; over-cap identical clips lose all candidates."""
    from yamr_spark.operators.multimodal import audio_fingerprint_near_dup

    def clip(edit_frames=()):
        chars = ["0"] * 256
        for f in edit_frames:
            for k in range(8):  # +100640 energy in frame f (~24 quanta)
                chars[f * 32 + k] = "z"
        return "".join(chars)

    rows = [
        (1, clip()),
        (2, clip()),            # identical → diff 0
        (3, clip((5,))),        # one edited frame → diff 1
        (4, clip((1, 4, 6))),   # three edited frames → beyond threshold
        (5, "too short"),       # < 256 bytes → excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.frames_diff
        for r in audio_fingerprint_near_dup(docs).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 1 and pairs[(2, 3)] == 1
    assert not any(4 in p or 5 in p for p in pairs)

    many = spark.createDataFrame(
        [(100 + i, clip()) for i in range(120)], "doc_id long, text string"
    )
    assert audio_fingerprint_near_dup(many).count() == 0
    assert (
        audio_fingerprint_near_dup(many, max_bucket=200).count() == 120 * 119 // 2
    )


def test_video_shift_dedup_goldens(spark):
    """Shift alignment on crafted clips with 8 DISTINCT frame symbols:
    identical clips → matches 8 at shift 0; a clip trimmed/offset by one
    frame (B[j] = A[j−1]) aligns 7 of 8 at shift +1 — and the positional
    audio fingerprint must MISS that same pair (every position differs),
    which is exactly the gap this operator exists to close; an unrelated
    clip must not pair."""
    from yamr_spark.operators.multimodal import (
        audio_fingerprint_near_dup,
        video_shift_dedup,
    )

    def frame(n_hi):
        return "z" * n_hi + "0" * (32 - n_hi)

    a = "".join(frame(3 * f) for f in range(8))          # symbols strictly rise
    b = frame(1) + a[: 7 * 32]                            # one-frame offset of A
    c = "".join(frame(3 * f + 2) for f in range(8))       # disjoint symbols
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, b), (4, c)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.matches, r.shift)
        for r in video_shift_dedup(docs).collect()
    }
    assert got[(1, 2)] == (8, 0)
    assert got[(1, 3)] == (7, 1) and got[(2, 3)] == (7, 1)
    assert not any(4 in p for p in got)
    # the positional fingerprint scores the offset pair 0-for-8: not found
    audio = {
        (r.doc_a, r.doc_b)
        for r in audio_fingerprint_near_dup(docs).collect()
    }
    assert (1, 3) not in audio and (1, 2) in audio


def test_audio_shift_near_dup_goldens(spark):
    """The shift-tolerant ACOUSTIC variant closes the positional
    fingerprint's one-frame-trim gap: the offset pair scores
    frames_diff 0 at shift +1; identical clips 0 at shift 0; the
    disjoint clip never pairs."""
    from yamr_spark.operators.multimodal import audio_shift_near_dup

    def frame(n_hi):
        return "z" * n_hi + "0" * (32 - n_hi)

    a = "".join(frame(3 * f) for f in range(8))
    b = frame(1) + a[: 7 * 32]
    c = "".join(frame(3 * f + 2) for f in range(8))
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, b), (4, c)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.frames_diff, r.shift)
        for r in audio_shift_near_dup(docs).collect()
    }
    assert got[(1, 2)] == (0, 0)
    assert got[(1, 3)] == (0, 1) and got[(2, 3)] == (0, 1)
    assert not any(4 in p for p in got)


def test_pigeonhole_parameter_guards(spark):
    """ADVICE r09: parameters that would silently degrade the 'finds
    EVERY qualifying pair' pigeonhole guarantee to a heuristic must
    raise instead."""
    import pytest

    from yamr_spark.operators.multimodal import (
        audio_fingerprint_near_dup,
        image_ahash_near_dup,
    )

    docs = _docs(spark, ["x" * 300])
    with pytest.raises(ValueError, match="pigeonhole"):
        image_ahash_near_dup(docs, max_hamming=4).collect()
    with pytest.raises(ValueError, match="pigeonhole"):
        audio_fingerprint_near_dup(docs, max_frame_diff=4).collect()
    with pytest.raises(ValueError, match="even"):
        audio_fingerprint_near_dup(docs, n_frames=7, max_frame_diff=2).collect()


def test_ascii_gate_excludes_non_ascii(spark):
    """ADVICE r09: the fake decoders index characters while gating on
    bytes, and band packing bounds symbols by byte < 128 — non-ASCII
    payloads are excluded at the seam rather than silently weakening
    the guarantees."""
    from yamr_spark.operators.multimodal import (
        audio_fingerprint_near_dup,
        audio_shift_near_dup,
        image_ahash_bands,
        video_shift_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 300), (2, "a" * 300), (3, "é" * 300)],
        "doc_id long, text string",
    )
    assert image_ahash_bands(docs).count() == 2
    for op in (audio_fingerprint_near_dup, audio_shift_near_dup, video_shift_dedup):
        pairs = {(r.doc_a, r.doc_b) for r in op(docs).collect()}
        assert pairs == {(1, 2)}, op.__name__


def test_shared_sigs_cache_matches_uncached(spark, sf_dir):
    """The session frame-signature cache feeds all three acoustic/video
    dedup queries; cached and uncached plans must return identical rows
    (same pin the shingle/IVF caches carry)."""
    from yamr_spark.operators.multimodal import (
        audio_fingerprint_near_dup,
        audio_shift_near_dup,
        video_shift_dedup,
    )
    from yamr_spark.queries_multimodal import _sigs_shared
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    sigs = _sigs_shared(spark, sf_dir)
    for op in (audio_fingerprint_near_dup, audio_shift_near_dup, video_shift_dedup):
        cached = sorted(map(tuple, op(docs, sigs=sigs).collect()))
        uncached = sorted(map(tuple, op(docs).collect()))
        assert cached == uncached, op.__name__
    # second call returns the same cached frame (no rebuild)
    assert _sigs_shared(spark, sf_dir) is sigs
