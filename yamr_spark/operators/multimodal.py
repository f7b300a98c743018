"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference has no binary/multimodal support (its only formats are raw
text and JSON arrays — SURVEY.md §1.2); this is a north-star extension for
training-data pipelines. Design:

- payload is an opaque ``binary`` column; metadata travels in a typed
  struct next to it (mime, n_bytes, content hash) so filters/joins on
  metadata prune without touching payload bytes. At 100 TB the payload
  column dominates storage — parquet column pruning means metadata-only
  queries never read it (check ReadSchema in .explain).
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` generators: one python worker per input partition, zero
  shuffle, payload bytes cross the JVM↔Python boundary once per batch.
- real codecs (PIL / libav) are NOT in this container: ``decode`` is a
  deterministic fake (numpy over the raw bytes) behind a clearly marked
  seam — the Spark-side plumbing (schemas, batching, partitioning) is
  real and tested, and swapping the fake for PIL is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _spread(df: DataFrame) -> DataFrame:
    """Identity since round 14: spreading the payload scan before the
    Arrow decode seams means SHUFFLING the binary payloads themselves
    (guide §8's anti-pattern — the exchange carries the heavy bytes),
    and the quiet A/B measured every decode-seam query slower with it
    (decode_stats +0.67 s, frame/audio signatures +0.6-1.0 s) at bench
    scale. A multi-file production payload table parallelizes at the
    scan, payload bytes never crossing an exchange."""
    return df


# --- payload construction ---------------------------------------------------


def with_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    The driver fixtures carry no real media, so the payload is the UTF-8
    encoding of ``text_col`` — an arbitrary deterministic byte string as
    far as every downstream operator is concerned. Metadata (n_bytes,
    sha256) is computed JVM-side so metadata-only scans stay codegen'd.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


# --- decode / feature extraction (Arrow-batched python path) ----------------

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
    ]
)


def _fake_decode(buf: bytes) -> np.ndarray:
    """DECODER SEAM — replace with PIL/imageio in a real deployment:
        img = np.asarray(PIL.Image.open(io.BytesIO(buf)))
    Deterministic fake: view the raw bytes as a row-major uint8 image with
    a fixed width of 64 (truncating the ragged tail)."""
    px = np.frombuffer(buf, dtype=np.uint8)
    w = 64
    h = max(len(px) // w, 1)
    return px[: h * w].reshape(h, w) if len(px) >= w else px.reshape(1, -1)


def decode_image_stats(df: DataFrame) -> DataFrame:
    """Decode each payload and emit per-image shape + pixel stats.

    mapInPandas: narrow (no shuffle), Arrow-batched; batch size is
    governed by spark.sql.execution.arrow.maxRecordsPerBatch so executor
    memory holds O(batch) decoded images, not O(partition).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                img = _fake_decode(bytes(buf))
                # integer-exact moments: pixels are uint8, so Σv and
                # Σv² are exact ints; mean/std become ONE correctly-
                # rounded IEEE division (+ sqrt) — bit-identical to any
                # engine using the same closed form, unlike
                # numpy.std()'s float accumulation which diverged from
                # stddev_pop in the last ulp (r10 strict-verify find)
                px = img.astype(np.int64)
                n = int(px.size)
                s = int(px.sum())
                s2 = int((px * px).sum())
                # numerator/denominator each round to double ONCE, then
                # one IEEE division — the same cast/cast/divide order
                # the oracle's CAST(<hugeint> AS DOUBLE)/CAST(...) does,
                # so the bit-identity bound is "doubles don't overflow",
                # not 2^53 (python int/int true-division would single-
                # round the exact rational and diverge past 2^53 —
                # ADVICE r10)
                rows.append(
                    (
                        doc_id,
                        int(img.shape[-1]),
                        int(img.shape[0]),
                        float(s) / float(n),
                        math.sqrt(float(n * s2 - s * s) / float(n * n)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_px", "std_px"]
            )

    return _spread(df.select("doc_id", "payload")).mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)


def _nn_indices(dim: int, out: int) -> list[int]:
    """Nearest-neighbor sample positions: exact integer arithmetic
    (j·(dim−1) // (out−1)) rather than float linspace, so the mapping is
    platform-independent and SQL-reproducible (the DuckDB oracle replays
    it bit-for-bit)."""
    if out <= 1:
        return [0] * max(out, 0)
    return [(j * (dim - 1)) // (out - 1) for j in range(out)]


def resize_thumbnail(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """'Resize' every image to out_w×out_h via nearest-neighbor sampling on
    the fake-decoded array; output is again an opaque binary column, so
    thumbnail pipelines compose with the same payload operators."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                img = _fake_decode(bytes(buf))
                ys = np.array(_nn_indices(img.shape[0], out_h))
                xs = np.array(_nn_indices(img.shape[1], out_w))
                thumb = img[np.ix_(ys, xs)]
                rows.append((doc_id, thumb.tobytes(), out_w, out_h))
            yield pd.DataFrame(rows, columns=["doc_id", "thumb", "thumb_w", "thumb_h"])

    return _spread(df.select("doc_id", "payload")).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 256, every_k: int = 4) -> DataFrame:
    """Treat each payload as a 'video': a sequence of fixed-size frames;
    emit every k-th frame as its own row (1→N, UDTF-shaped — the C8 hook
    generalized to binary media). Real impl would call libav's keyframe
    index here instead of fixed-size slicing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                n = len(buf) // frame_bytes
                for i in range(0, n, every_k):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(buf[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return _spread(df.select("doc_id", "payload")).mapInPandas(run, FRAME_SCHEMA)


def modality_interleave(
    docs: DataFrame,
    text_per_batch: int = 6,
    image_per_batch: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Modality-aware training-batch assembly: interleave text and image
    documents into fixed-ratio batches (``text_per_batch`` :
    ``image_per_batch`` slots). Modality is the deterministic
    hash-derived tag a real pipeline would carry in metadata; each
    modality stream is ordered by its shuffle key (hash60 of the id —
    the same reproducible permutation global_shuffle uses) and dealt
    round-robin into its slots, so batch composition is a pure function
    of the corpus.

    Returns (batch_id, n_text, n_image, complete) — ``complete`` marks
    batches with both quotas filled; the trailing partial batches are
    what a loader would either pad or drop.

    Scale: two windowed row_numbers (one per modality partition — the
    window key has 2 values, so at extreme scale this becomes the
    per-partition pre-rank + offset-merge rewrite, same as any global
    sequence assignment) and one tiny rollup."""
    from pyspark.sql import Window

    from yamr_spark.functions import hash60

    tagged = docs.select(
        F.col(id_col),
        hash60(F.concat(F.lit("mix|"), F.col(id_col).cast("string"))).alias("k"),
    ).withColumn(
        "modality",
        F.when(F.col("k") % 4 == 0, F.lit("image")).otherwise(F.lit("text")),
    )
    w = Window.partitionBy("modality").orderBy("k")
    per = F.when(
        F.col("modality") == "image", F.lit(image_per_batch)
    ).otherwise(F.lit(text_per_batch))
    assigned = tagged.withColumn("rn", F.row_number().over(w)).withColumn(
        "batch_id", ((F.col("rn") - 1) / per).cast("long")
    )
    return (
        assigned.groupBy("batch_id")
        .agg(
            F.sum(F.when(F.col("modality") == "text", 1).otherwise(0)).alias(
                "n_text"
            ),
            F.sum(F.when(F.col("modality") == "image", 1).otherwise(0)).alias(
                "n_image"
            ),
        )
        .select(
            "batch_id",
            "n_text",
            "n_image",
            (
                (F.col("n_text") == text_per_batch)
                & (F.col("n_image") == image_per_batch)
            ).alias("complete"),
        )
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_frame_energy(df: DataFrame, frame: int = 64) -> DataFrame:
    """Audio feature-extraction seam: payload → fixed-width sample
    frames → per-frame RMS energy (the VAD/silence-trim primitive).
    DECODER SEAM — a real deployment replaces the fake with
    soundfile/libav PCM decode; the fake reads the raw bytes as uint8
    PCM, so the Spark-side plumbing (Arrow batching, 1→N frame
    fan-out, schema) is real and the numbers are closed-form
    SQL-checkable (sums of ≤frame integer squares are exact in double,
    so numpy and SQL agree bit-for-bit before the final round).

    mapInPandas: narrow, zero shuffle; executor memory holds O(batch)
    decoded frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
                for i in range(len(x) // frame):
                    seg = x[i * frame : (i + 1) * frame]
                    rows.append(
                        (
                            doc_id,
                            i,
                            frame,
                            round(float(np.sqrt((seg * seg).sum() / frame)), 6),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_samples", "rms"]
            )

    return _spread(df.select("doc_id", "payload")).mapInPandas(run, AUDIO_SCHEMA)


def _ascii_only(df: DataFrame, text_col: str) -> DataFrame:
    """The closed-form fake decoders index CHARACTERS (substr/ascii)
    while size gates count BYTES (octet_length), and the injective band
    packings bound each symbol by byte < 128 — all three hold only for
    pure-ASCII payloads (ADVICE r09). Gate structurally instead of
    assuming: non-ASCII rows are excluded at the seam (the fixture
    corpora are 100% ASCII, so this excludes nothing there; a real
    deployment replaces the fake decode AND this gate together)."""
    return df.filter(~F.col(text_col).rlike("[^\\x00-\\x7F]"))


def banded_candidate_pairs(stream: DataFrame, cap: int) -> DataFrame:
    """The modality-dedup triad's SHARED candidate stage (VERDICT r09
    #5 — one implementation instead of three copies): ``stream`` is
    (doc_id, b, band_val) posting rows; buckets with more than ``cap``
    members are dropped (the skew lever — degenerate band values such
    as uniform-color images or silence would square the join), the
    rest self-join within (b, band_val) into DISTINCT ordered pairs.

    Position-banded callers (image aHash, audio fingerprint) pass real
    band indexes; set-blocked callers (shift-tolerant alignment) pass a
    constant b with the symbol as band_val and ``cap`` as the symbol
    df-cap — identical machinery, one code path. Scale: candidates are
    bounded by Σ_buckets C(|bucket|, 2) ≤ cap²·n_buckets/2; never
    all-pairs."""
    hot = (
        stream.groupBy("b", "band_val")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > cap)
        .select("b", "band_val")
    )
    cold = stream.join(hot, ["b", "band_val"], "left_anti")
    return (
        cold.alias("s1")
        .join(
            cold.alias("s2"),
            (F.col("s1.b") == F.col("s2.b"))
            & (F.col("s1.band_val") == F.col("s2.band_val"))
            & (F.col("s1.doc_id") < F.col("s2.doc_id")),
        )
        .select(
            F.col("s1.doc_id").alias("doc_a"), F.col("s2.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _frame_symbols_expr(frame: int, n_frames: int, qstep: int) -> str:
    """Pure-integer coarse frame-energy symbols over column ``__t``:
    symbol f = (Σ byte²) div qstep — shared by the audio and video
    signature builders so the quantization tuning lives in one place."""
    return (
        f"transform(sequence(0, {n_frames - 1}), f -> "
        f"aggregate(sequence(0, {frame - 1}), 0, (acc, k) -> "
        f"acc + ascii(substr(__t, f * {frame} + k + 1, 1)) "
        f"* ascii(substr(__t, f * {frame} + k + 1, 1))) div {qstep})"
    )


def frame_signatures(
    df: DataFrame,
    frame: int = 32,
    n_frames: int = 8,
    qstep: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, syms) — the pure-integer frame-energy signature table
    the acoustic/video dedup family shares (ASCII-gated, length-gated,
    one corpus scan). UNmaterialized: the caller materializes (and may
    session-cache) it; the three consumers
    (audio_fingerprint_near_dup, audio_shift_near_dup,
    video_shift_dedup) accept it via their ``sigs`` parameter so one
    signature build serves the whole family per session."""
    need = frame * n_frames
    L = F.octet_length(F.encode(F.col(text_col), "UTF-8"))
    return (
        _spread(
            _ascii_only(df, text_col).filter(L >= need).select(id_col, text_col)
        )
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        .withColumn("__syms", F.expr(_frame_symbols_expr(frame, n_frames, qstep)))
        .select("doc_id", F.col("__syms").alias("syms"))
    )


# 64-bit aHash split into 4 16-bit bands. image_ahash_near_dup's
# pigeonhole guard derives from THIS constant (ADVICE r10: a hardcoded
# copy could silently drift from image_ahash_bands's default).
AHASH_N_BANDS = 4


def image_ahash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = AHASH_N_BANDS,
) -> DataFrame:
    """(doc_id, bands) — a 64-bit average-hash (aHash) of every image,
    packed as ``n_bands`` 16-bit band integers for LSH blocking.

    The perceptual-dedup primitive: sample the fake-decoded image to the
    SAME 8×8 nearest-neighbor grid ``resize_thumbnail`` uses (exact
    integer arithmetic j·(dim−1)//7 — SQL-replayable), threshold each
    sampled pixel against the grid mean (strictly greater → 1), and pack
    bits 16b..16b+15 into band b. Two near-identical images (re-encode,
    small overlay, crop-free edit) differ in few bits; Hamming distance
    over the 64 bits is the dissimilarity measure.

    Everything is JVM-side codegen (ascii/substr/aggregate expressions)
    — a real deployment swaps the closed-form fake for a Pandas-UDF
    pHash over decoded pixels and keeps the identical banding/verify
    machinery downstream. One corpus scan, fixed-width output rows."""
    L = F.octet_length(F.encode(F.col(text_col), "UTF-8"))
    W = F.when(L >= 64, F.lit(64)).otherwise(L)
    H = F.when(L >= 64, (L / 64).cast("int")).otherwise(F.lit(1))
    base = _spread(_ascii_only(df, text_col).select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__t"),
        W.cast("int").alias("__w"),
        H.cast("int").alias("__h"),
    )
    # 8×8 NN grid sample g=0..63: pos = (g÷8·(H−1)÷7)·W + (g%8)·(W−1)÷7
    pxs = (
        "transform(sequence(0, 63), g -> ascii(substr(__t, "
        "((g div 8) * (__h - 1) div 7) * __w + (g % 8) * (__w - 1) div 7 + 1, "
        "1)))"
    )
    # strict > against the exact grid mean (integer sum / 64.0 is exact
    # in double, so both engines make identical bit decisions)
    bands = (
        f"transform(sequence(0, {n_bands - 1}), b -> "
        "aggregate(sequence(0, 15), 0, (acc, j) -> acc + "
        "CASE WHEN element_at(__px, b * 16 + j + 1) > __mean "
        "THEN shiftleft(1, j) ELSE 0 END))"
    )
    return (
        base.withColumn("__px", F.expr(pxs))
        .withColumn(
            "__mean",
            F.expr("aggregate(__px, 0, (a, x) -> a + x)") / F.lit(64.0),
        )
        .select("doc_id", F.expr(bands).alias("bands"))
    )


def image_ahash_near_dup(
    df: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perceptual image near-dup pairs: (doc_a, doc_b, hamming) for every
    pair whose 64-bit aHashes differ in ≤ ``max_hamming`` bits.

    LSH banding with a PIGEONHOLE GUARANTEE: the hash splits into 4
    16-bit bands, so any pair with Hamming ≤ 3 has at least one band
    byte-identical (3 differing bits touch ≤ 3 of 4 bands) — the
    band-equality join finds EVERY qualifying pair, it is not a recall
    heuristic — which is why ``max_hamming`` ≥ the band count raises
    instead of silently degrading to a heuristic (ADVICE r09).
    Verification computes the exact Hamming distance from the band
    integers (bit_count of xor), never re-touching pixels.

    Scale: one corpus scan builds docs×4 fixed-width (b, band, doc_id)
    rows; candidates come from an equality join on (b, band) — never
    all-pairs. ``max_bucket`` is the skew lever (same role as
    ngram_jaccard's df cap): a degenerate band value shared by thousands
    of images (e.g. uniform-color assets hash to all-zero bands) would
    square the join, so buckets over the cap are dropped from candidate
    generation — the documented recall trade: a pair is missed only if
    ALL its identical bands are hot. The verify join carries 4 ints per
    side; no pixel data ever shuffles."""
    from yamr_spark.materialize import materialize

    # guard and band build share AHASH_N_BANDS so they cannot drift
    n_bands = AHASH_N_BANDS
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole guarantee: "
            f"need max_hamming < n_bands={n_bands} so some band is identical"
        )
    hashes = materialize(
        image_ahash_bands(df, text_col=text_col, id_col=id_col, n_bands=n_bands)
    )
    stream = hashes.select(
        "doc_id", F.posexplode("bands").alias("b", "band_val")
    )
    cands = banded_candidate_pairs(stream, max_bucket)
    ham = "aggregate(zip_with(__ba, __bb, (x, y) -> bit_count(x ^ y)), 0, (a, p) -> a + p)"
    return (
        cands.join(
            hashes.select(F.col("doc_id").alias("doc_a"), F.col("bands").alias("__ba")),
            "doc_a",
        )
        .join(
            hashes.select(F.col("doc_id").alias("doc_b"), F.col("bands").alias("__bb")),
            "doc_b",
        )
        .select("doc_a", "doc_b", F.expr(ham).cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def audio_fingerprint_near_dup(
    df: DataFrame,
    frame: int = 32,
    n_frames: int = 8,
    qstep: int = 4096,
    max_frame_diff: int = 2,
    max_bucket: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Acoustic-fingerprint near-dup (the Shazam-lite shape over the
    audio seam): per-clip signature = ``n_frames`` coarse frame-energy
    symbols, pairs whose signatures differ in ≤ ``max_frame_diff``
    frames.

    Stays PURE INTEGER end-to-end so both engines agree bit-for-bit:
    frame f's symbol is (Σ byte²) div ``qstep`` — the un-rooted energy
    of ``audio_frame_energy``'s frames, coarsely quantized (a small
    in-frame edit usually moves only that frame's symbol; RMS's sqrt is
    skipped, so no float rounding anywhere). Clips shorter than
    frame·n_frames bytes are excluded (no ragged signatures).

    Banding mirrors image_ahash_near_dup with the same PIGEONHOLE
    guarantee: n_frames/2 bands of 2 symbols (packed as s0·base+s1 with
    base = max symbol + 1, computed from the byte-value bound), and
    ``max_frame_diff`` < band count ⇒ some band identical →
    band-equality finds every qualifying pair among un-capped buckets;
    ``max_bucket`` is the skew lever (silence hashes to all-zero
    bands). Verify counts differing symbols from the two signature
    arrays — audio bytes never shuffle. Quantization tuning, measured
    at sf0.01: qstep 8192 over-merges (361 coincidental 3-frame pairs —
    ASCII clips cluster in a narrow energy range), qstep ≤ 2048 finds
    only byte-exact clips; 4096 with ≤ 2 differing frames keeps the
    exact group plus genuine near-pairs."""
    from yamr_spark.materialize import materialize

    if n_frames % 2:
        raise ValueError(f"n_frames must be even for 2-symbol bands: {n_frames}")
    if max_frame_diff >= n_frames // 2:
        raise ValueError(
            f"max_frame_diff={max_frame_diff} breaks the pigeonhole "
            f"guarantee: need max_frame_diff < n_frames//2={n_frames // 2} "
            "so some 2-symbol band is identical"
        )
    if sigs is None:
        sigs = materialize(
            frame_signatures(df, frame, n_frames, qstep, text_col, id_col)
        )
    # injective 2-symbol packing: byte < 128 (the _ascii_only gate)
    # bounds Σ byte² per frame, hence the symbol, hence the base.
    # Banding is a PROJECTION of the shared signature table — a
    # caller-provided sigs (session cache) is never re-scanned from text
    pack_base = (frame * 127 * 127) // qstep + 1
    bands = (
        f"transform(sequence(0, {n_frames // 2 - 1}), b -> "
        f"element_at(syms, 2 * b + 1) * {pack_base} "
        "+ element_at(syms, 2 * b + 2))"
    )
    banded = sigs.select("doc_id", "syms", F.expr(bands).alias("bands"))
    stream = banded.select("doc_id", F.posexplode("bands").alias("b", "band_val"))
    cands = banded_candidate_pairs(stream, max_bucket)
    diff = "aggregate(zip_with(__sa, __sb, (x, y) -> CASE WHEN x = y THEN 0 ELSE 1 END), 0, (a, p) -> a + p)"
    return (
        cands.join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("syms").alias("__sa")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("syms").alias("__sb")),
            "doc_b",
        )
        .select("doc_a", "doc_b", F.expr(diff).cast("long").alias("frames_diff"))
        .filter(F.col("frames_diff") <= max_frame_diff)
    )


def video_shift_dedup(
    df: DataFrame,
    frame: int = 32,
    n_frames: int = 8,
    qstep: int = 4096,
    min_matches: int = 6,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Shift-tolerant video duplicate detection: two clips are
    duplicates if their frame-signature SEQUENCES align on
    ≥ ``min_matches`` positions at SOME temporal shift in {−1, 0, +1}
    — the trimmed-intro / offset-re-encode case that positional
    Hamming (``audio_fingerprint_near_dup``) structurally misses: a
    one-frame trim misaligns EVERY position, scoring 0 there while the
    clips are the same footage.

    Signature = the same pure-integer coarse frame-energy symbols as
    the audio path ((Σ byte²) div qstep per frame — a stand-in for a
    per-frame perceptual hash over real decoded frames; the alignment
    machinery downstream is the real contribution and carries over
    unchanged).

    Candidates are SET-blocked, not position-blocked (a shift preserves
    the symbol multiset, not positions): pairs sharing ≥ 1 *rare* frame
    symbol (document frequency ≤ ``max_df`` — ngram_jaccard's df-cap
    lever; a shifted duplicate shares ~all symbols as a set, so it is
    blocked unless every one of its symbols is corpus-hot, the same
    documented trade). Verify evaluates the three shifts with
    column-side array slices — score = max over shifts of positional
    matches — and keeps the best (score, shift) per pair. Scale: one
    scan builds docs×n_frames (symbol, doc) rows; the candidate join is
    bounded by C(max_df, 2) per symbol; verify joins carry two 8-int
    arrays per pair; clip bytes never shuffle."""
    from yamr_spark.materialize import materialize

    if sigs is None:
        sigs = materialize(
            frame_signatures(df, frame, n_frames, qstep, text_col, id_col)
        )
    # set-blocking through the SHARED candidate stage: DISTINCT
    # (doc, symbol) postings with a constant band index — the symbol
    # df-cap is exactly the bucket cap (a shift preserves the symbol
    # multiset, not positions, so position bands can't block here)
    stream = sigs.select(
        "doc_id",
        F.lit(0).alias("b"),
        F.explode(F.array_distinct("syms")).alias("band_val"),
    )
    cands = banded_candidate_pairs(stream, max_df)
    n = n_frames
    # positional matches at shift s: compare sa[i] to sb[i+s] over the
    # overlap; ties between shifts break toward the smaller |shift|
    # then the smaller shift (0, then -1, then +1)
    m0 = (
        "aggregate(zip_with(__sa, __sb, (x, y) -> "
        "CASE WHEN x = y THEN 1 ELSE 0 END), 0, (a, p) -> a + p)"
    )
    mneg = (
        f"aggregate(zip_with(slice(__sa, 2, {n - 1}), slice(__sb, 1, {n - 1}), "
        "(x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (a, p) -> a + p)"
    )
    mpos = (
        f"aggregate(zip_with(slice(__sa, 1, {n - 1}), slice(__sb, 2, {n - 1}), "
        "(x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (a, p) -> a + p)"
    )
    return (
        cands.join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("syms").alias("__sa")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("syms").alias("__sb")),
            "doc_b",
        )
        .withColumn("__m0", F.expr(m0).cast("long"))
        .withColumn("__mn", F.expr(mneg).cast("long"))
        .withColumn("__mp", F.expr(mpos).cast("long"))
        .select(
            "doc_a",
            "doc_b",
            F.greatest("__m0", "__mn", "__mp").alias("matches"),
            F.when(F.col("__m0") >= F.greatest("__mn", "__mp"), F.lit(0))
            .when(F.col("__mn") >= F.col("__mp"), F.lit(-1))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("shift"),
        )
        .filter(F.col("matches") >= min_matches)
    )


def audio_shift_near_dup(
    df: DataFrame,
    frame: int = 32,
    n_frames: int = 8,
    qstep: int = 4096,
    max_frame_diff: int = 2,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Shift-tolerant ACOUSTIC near-dup (VERDICT r09 #5): pairs whose
    frame-energy signatures differ in ≤ ``max_frame_diff`` positions at
    the BEST temporal shift in {−1, 0, +1} — the one-frame-trim case
    ``audio_fingerprint_near_dup`` structurally misses (its positional
    bands score a trimmed clip 0 everywhere; its own docstring names
    this gap).

    Same pure-integer signatures as the positional path (ONE symbol
    builder, ``_frame_symbols_expr``), same set-blocked candidates as
    the video aligner through the SHARED ``banded_candidate_pairs``
    stage (a shift preserves the symbol multiset, so candidates block
    on rare symbols with df ≤ ``max_df``, constant band index — the
    documented recall trade: a shifted pair is missed only if every
    shared symbol is corpus-hot). Verify takes the MINIMUM mismatch
    count over the three alignments on each alignment's overlap
    (n positions at shift 0, n−1 at ±1), tie toward shift 0 then −1 —
    so a one-frame trim with otherwise identical frames scores diff 0
    at shift ±1 instead of ~n at shift 0. Scale identical to
    video_shift_dedup: fixed-width signature rows, df-bounded candidate
    join, clip bytes never shuffle."""
    from yamr_spark.materialize import materialize

    if sigs is None:
        sigs = materialize(
            frame_signatures(df, frame, n_frames, qstep, text_col, id_col)
        )
    stream = sigs.select(
        "doc_id",
        F.lit(0).alias("b"),
        F.explode(F.array_distinct("syms")).alias("band_val"),
    )
    cands = banded_candidate_pairs(stream, max_df)
    n = n_frames
    d0 = (
        "aggregate(zip_with(__sa, __sb, (x, y) -> "
        "CASE WHEN x = y THEN 0 ELSE 1 END), 0, (a, p) -> a + p)"
    )
    dneg = (
        f"aggregate(zip_with(slice(__sa, 2, {n - 1}), slice(__sb, 1, {n - 1}), "
        "(x, y) -> CASE WHEN x = y THEN 0 ELSE 1 END), 0, (a, p) -> a + p)"
    )
    dpos = (
        f"aggregate(zip_with(slice(__sa, 1, {n - 1}), slice(__sb, 2, {n - 1}), "
        "(x, y) -> CASE WHEN x = y THEN 0 ELSE 1 END), 0, (a, p) -> a + p)"
    )
    return (
        cands.join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("syms").alias("__sa")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("syms").alias("__sb")),
            "doc_b",
        )
        .withColumn("__d0", F.expr(d0).cast("long"))
        .withColumn("__dn", F.expr(dneg).cast("long"))
        .withColumn("__dp", F.expr(dpos).cast("long"))
        .select(
            "doc_a",
            "doc_b",
            F.least("__d0", "__dn", "__dp").alias("frames_diff"),
            F.when(F.col("__d0") <= F.least("__dn", "__dp"), F.lit(0))
            .when(F.col("__dn") <= F.col("__dp"), F.lit(-1))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("shift"),
        )
        .filter(F.col("frames_diff") <= max_frame_diff)
    )
