"""Deduplication operators for large-scale training-data pipelines.

Four families, all engine-order-independent and fully deterministic
(hash functions are md5/sha2 so the DuckDB oracle can replicate them
bit-for-bit — no engine-private RNG anywhere):

- exact       — sha2(text) hash-groupBy; the 100 TB shape groups by the
                32-byte digest, never shuffling document bodies.
- MinHash+LSH — word-shingle → k min-hashes (ONE groupBy with k partial
                min-aggregates — the signature shuffle carries docs×k
                values, not shingles) → banded candidate pairs →
                Jaccard-verified duplicates.
- SimHash     — 64-bit term-frequency-weighted signature; near-dup pairs
                via pigeonhole block blocking + hamming distance.
- n-gram Jaccard — shared-shingle blocking with a document-frequency cap
                (drops stop-shingles so the candidate join cannot explode
                on common n-grams), then exact Jaccard. Shingles are
                hashed to 60-bit ints (md5-derived, oracle-reproducible)
                BEFORE any shuffle, so shuffle keys are 8 bytes, never
                n-gram text.

Scale notes: every pairwise step is preceded by a blocking join (band
hash / nibble / rare shingle) so candidate generation is
O(near-duplicates), not O(n²). The only all-pairs operator in the
engine is similarity.brute_force_topk, which is explicitly the
small-side baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yamr_spark.functions import WORD_BREAK_SQL, hash60_sql
from yamr_spark.materialize import materialize

# ---------------------------------------------------------------- exact


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one row per distinct text with the kept
    (minimum) id and the duplicate count. Groups on the sha2-256 digest:
    at scale the shuffle key is 64 hex chars regardless of document size.

    NULL-text documents form ONE group (sha2(NULL) is NULL and groupBy
    treats NULLs as equal) — deliberate: a crawl's millions of empty
    fetches collapse to a single kept row instead of surviving dedup
    individually. Filter NULLs upstream if they must be preserved.
    """
    return (
        docs.select(
            F.sha2(F.col(text_col).cast("binary"), 256).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_cnt"))
    )


# ------------------------------------------------------------- shingles


def _toks_expr(text_col: str):
    return F.expr(
        f"filter(split(lower({text_col}), '{WORD_BREAK_SQL}'), x -> length(x) > 0)"
    )


def _doc_toks(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, __toks) — the shared tokenize root of every shingle /
    signature builder. NOT scan-spread: the round-14 quiet A/B measured
    the shingle consumers net-slower with a root exchange (simhash
    +0.57 s, the estimate panels +0.3-1.5 s, minhash/jaccard flat) —
    tokenize→shingle feeds partial-aggregated groupBys that one task
    handles efficiently at single-row-group scale, while the spread
    multiplies shuffle blocks; multi-split production scans parallelize
    without help."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).select("doc_id", _toks_expr("__text").alias("__toks"))


def _shingle_array_sql(n: int) -> str:
    """SQL fragment: array of word n-grams over a bound ``__toks`` column."""
    return (
        f"transform(sequence(0, size(__toks) - {n}), i -> "
        f"concat_ws(' ', slice(__toks, i + 1, {n})))"
    )


def _hashed_shingle_array_sql(n: int) -> str:
    """SQL fragment: DISTINCT 60-bit-hashed word n-grams (md5-derived,
    oracle-reproducible — see functions.hash60). Hashing happens map-side
    inside the scan stage, so nothing downstream ever carries n-gram
    text."""
    return (
        f"array_distinct(transform({_shingle_array_sql(n)}, "
        f"s -> {hash60_sql('s')}))"
    )


def word_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    Tokenization matches the reference's word-count rules (lowercase,
    unicode \\w+). Documents with fewer than ``n`` tokens yield no rows.
    """
    shingles = F.expr(_shingle_array_sql(n))
    return (
        _doc_toks(docs, text_col, id_col)
        .filter(F.size("__toks") >= n)
        .select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def word_shingle_hashes(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct HASHED word n-gram shingles per document: (doc_id, sh)
    with ``sh`` a 60-bit md5-derived BIGINT.

    The scale-path twin of :func:`word_shingles`: shuffle keys are 8
    bytes regardless of n-gram length, so downstream groupBys/joins move
    ~16-byte rows instead of raw text. The hash is oracle-reproducible
    (functions.hash60) and collision-free in practice (~k²/2⁶¹)."""
    return (
        _doc_toks(docs, text_col, id_col)
        .filter(F.size("__toks") >= n)
        .select("doc_id", F.explode(F.expr(_hashed_shingle_array_sql(n))).alias("sh"))
    )


def word_shingle_sets(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document SORTED distinct-shingle array: (doc_id, ss).

    Same shingles as :func:`word_shingles` but kept as one array row per
    document — computed entirely map-side (tokenize → slice → distinct →
    sort inside the scan stage, zero shuffle), unlike collapsing the
    exploded stream back with a groupBy."""
    shingles = F.expr(_shingle_array_sql(n))
    return (
        _doc_toks(docs, text_col, id_col)
        .filter(F.size("__toks") >= n)
        .select(
            "doc_id", F.sort_array(F.array_distinct(shingles)).alias("ss")
        )
    )


def word_shingle_hash_sets(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document SORTED distinct HASHED-shingle array: (doc_id, ss)
    with ``ss`` an array<bigint> of 60-bit md5-derived hashes.

    The scale-path twin of :func:`word_shingle_sets`: a 100k-shingle
    document is ~800 KB as hashes vs tens of MB as strings, and the
    columnar ``array_intersect`` verify compares 8-byte longs instead of
    variable-length text. Entirely map-side, zero shuffle."""
    return (
        _doc_toks(docs, text_col, id_col)
        .filter(F.size("__toks") >= n)
        .select(
            "doc_id",
            F.sort_array(F.expr(_hashed_shingle_array_sql(n))).alias("ss"),
        )
    )


# ------------------------------------------------------------- MinHash


# Universal-hash MinHash permutations over the 31-bit Mersenne prime:
# perm_i(x) = (a_i·x + b_i) mod P with x = hash60(shingle) mod P. One md5
# per shingle (the hash60) + k integer mul/adds replaces k md5s of the
# raw shingle string — ~4× cheaper signature aggregation, measured — and
# stays bit-reproducible in DuckDB (plain BIGINT arithmetic: a_i, x < 2³¹
# so a_i·x < 2⁶² never overflows a signed 64-bit in either engine).
MINHASH_PRIME = 2147483647  # 2^31 − 1


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (aᵢ, bᵢ) permutation coefficients, shared verbatim
    with the DuckDB oracle (queries_dedup builds its SQL from these).
    aᵢ ≠ 0 mod P: P is prime and divides neither factor."""
    return [
        (
            ((2 * i + 1) * 2654435761) % MINHASH_PRIME,
            (i * 40503 * 65537 + 12345) % MINHASH_PRIME,
        )
        for i in range(k)
    ]


def minhash_signatures(
    docs: DataFrame,
    k: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """k-permutation MinHash signature per document.

    Permutation i is the universal hash ``(aᵢ·h + bᵢ) mod P`` of the
    60-bit shingle hash ``h`` (md5-derived — see ``minhash_coeffs``) —
    deterministic and engine-reproducible. The whole signature is ONE
    hash aggregate with k ``min`` columns: partial (map-side)
    aggregation reduces the shuffle to docs×k fixed-width values no
    matter how many shingles a document has. Compare with the naive
    explode→(doc, seed) groupBy which shuffles shingles×k rows.
    """
    from yamr_spark.functions import hash60

    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col).withColumn(
        "h", hash60(F.col("shingle")) % MINHASH_PRIME
    )
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    return sh.groupBy("doc_id").agg(*mins, F.count("*").alias("sz"))


def minhash_band_table(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """(doc_id, band_id, band_hash) — the banded form of a signature
    table. This IS the LSH index representation: fixed-width rows, one
    per (doc, band), equality-joinable; also what an incremental dedup
    service persists as its standing index (streaming/lsh.py)."""
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).cast("binary")
        ).alias(f"bh{b}")
        for b in range(bands)
    ]
    banded = sigs.select("doc_id", *band_cols)
    return banded.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"bh{b}") for b in range(bands)])).alias(
            "band_id", "band_hash"
        ),
    )


def minhash_band_pairs(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair (doc_a < doc_b). The band hash join is the blocking
    step — candidates are generated by equality join on
    (band_id, band_hash), never by pairwise comparison."""
    long = minhash_band_table(sigs, bands=bands, rows_per_band=rows_per_band)
    a = long.alias("a")
    b = long.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_for_pairs(
    pairs: DataFrame, shingles: DataFrame, sizes: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard similarity for candidate pairs, from distinct-shingle
    sets: |∩| via a pair⋈shingle join, |∪| = |A|+|B|−|∩|.

    ``sizes`` (doc_id, sz) can be supplied when the caller already has
    per-doc set sizes (minhash_near_dup gets them free out of the
    signature aggregation) — saves one full shingle scan + shuffle.

    Scale design: candidate pairs are FEW (near-duplicates), the shingle
    stream is EVERY document — so the shingle stream is first semi-joined
    down to the candidate docs and materialized ONCE. Both sides of the
    intersect join and the default size aggregate then read the small
    candidate-only set, so the corpus is scanned exactly once here
    instead of twice/three times. The semi-join carries no broadcast
    hint: AQE turns it into a broadcast (map-side filter, no shuffle of
    the stream) whenever the candidate-id set is small, and falls back to
    a shuffled semi-join at extreme candidate counts instead of blowing
    the driver's broadcast limit.
    """
    # pairs feeds three subplans (intersect join, final left join, and the
    # candidate-doc semi-join) — materialize once, it's tiny
    pairs = pairs.transform(materialize)
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = shingles.join(cand_docs, "doc_id", "left_semi").transform(materialize)
    if sizes is None:
        # full shingle-set sizes, but only candidate docs need them — the
        # semi-joined set still holds each candidate's COMPLETE shingle set
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter_sz"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"inter_sz": 0})
        .join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter_sz")
                / (F.col("za.sz") + F.col("zb.sz") - F.col("inter_sz")),
                6,
            ).alias("jaccard"),
        )
    )


def jaccard_for_pairs_dense(pairs: DataFrame, doc_sets: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs when candidates are DENSE —
    the complement of :func:`jaccard_for_pairs`.

    The join-based verifier wins when pairs are few: it touches only
    candidate docs' shingles. But when blocking is weak (small-vocab
    corpora, low-diversity crawls) candidates approach all-pairs and the
    pair⋈shingle intersect join materializes |pairs|×|shingles per doc|
    intermediate rows. Here instead: ``doc_sets`` (doc_id, ss) — built
    MAP-SIDE by :func:`word_shingle_sets`, no shuffle — feeds each pair
    its two arrays via joins AQE turns into broadcasts, and |∩| is
    columnar ``array_intersect`` — no row-explosion anywhere; per-pair
    work is O(|A|+|B|) JVM set ops.

    Element type is irrelevant to the plan: callers pass string sets
    (word_shingle_sets) when they need text back, or 60-bit hashed sets
    (word_shingle_hash_sets — what ngram_jaccard_pairs feeds) for the
    scale path where a 100k-shingle doc is ~800 KB instead of tens of
    MB. Hashed-set Jaccard equals string-set Jaccard absent collisions
    (~k²/2⁶¹ — the oracle computes the string form and the driver's
    value-hash agrees).
    """
    return (
        pairs.join(
            doc_sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("sa")),
            "doc_a",
        )
        .join(
            doc_sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("sb")),
            "doc_b",
        )
        .withColumn("inter_sz", F.size(F.array_intersect("sa", "sb")))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter_sz")
                / (F.size("sa") + F.size("sb") - F.col("inter_sz")),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_near_dup(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature → banded candidates
    → exact-Jaccard verification ≥ threshold."""
    # The signature table is consumed by FOUR subplans (both sides of the
    # band self-join, and both size lookups). Spark does not share common
    # subplans across a DAG, so without materialization the 16-hash
    # aggregate would run 4x. sigs is docs×17 fixed-width values — tiny
    # next to the shingle stream — so one eager materialization buys every
    # reuse (materialize(): local checkpoint on local[n]; DISK_ONLY
    # persist or parquet staging at cluster scale — see materialize.py).
    # The SHINGLE stream is scanned once more inside jaccard_for_pairs,
    # semi-joined down to candidate docs before any join — so the whole
    # pipeline reads the corpus exactly twice (signatures + verify). The
    # verify stream carries 60-bit HASHED shingles (8-byte intersect
    # keys, not text); hashed-set Jaccard equals string-set Jaccard
    # absent collisions, which the string-form oracle confirms.
    sigs = minhash_signatures(
        docs, k=k, n=n, text_col=text_col, id_col=id_col
    ).transform(materialize)
    cands = minhash_band_pairs(sigs, bands=bands, rows_per_band=rows_per_band).transform(
        materialize
    )
    # Tokenize/hash ONLY candidate docs: the semi-join cannot be pushed
    # below the shingle explode by Catalyst (a join does not move through
    # a Generate), so filtering the doc TABLE first is what keeps the
    # verify scan O(candidates), not O(corpus) — at near-dup rates of
    # ~1% this cuts the verify stage's tokenize+md5 work ~100×.
    cand_ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .union(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    docs_c = docs.join(cand_ids, id_col, "left_semi")
    # MATERIALIZED: the intersection join reads ``sh`` twice (sa / sb) —
    # left lazy, the candidate-doc shingle build executes twice.
    sh = materialize(
        word_shingle_hashes(
            docs_c, n=n, text_col=text_col, id_col=id_col
        ).withColumnRenamed("sh", "shingle")
    )
    sizes = sigs.select("doc_id", "sz")
    return jaccard_for_pairs(cands, sh, sizes=sizes).filter(
        F.col("jaccard") >= threshold
    )


# ------------------------------------------------------------- SimHash

# 60-bit signature: 15 leading md5 hex chars (functions.hash60 semantics)
# — oracle-reproducible in DuckDB and positive in a signed long in both
# engines. 60 bits keeps the signature space unsaturated at the 100 TB
# design point (~10¹⁰ docs ≪ 2⁶⁰), unlike a 16-bit signature where every
# pigeonhole bucket holds ~n/2¹⁶ docs and the candidate join degenerates
# toward all-pairs.
SIMHASH_BITS = 60
# SWAR lane width for the packed signature aggregation (see simhash):
# 12-bit lanes hold per-doc weighted bit-counts up to 4095.
SIMHASH_LANE_BITS = 12


def pigeonhole_blocks(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) for ``max_hamming + 1`` contiguous blocks covering
    ``bits`` signature bits. A pair within the hamming budget differs in
    ≤ max_hamming bits, so it cannot differ in all max_hamming + 1
    blocks — it must agree exactly on ≥1, which is what makes the
    blocked equality join recall-complete (standard pigeonhole)."""
    blocks = max_hamming + 1
    base, rem = divmod(bits, blocks)
    widths = [base + 1] * rem + [base] * (blocks - rem)
    offsets = [sum(widths[:i]) for i in range(blocks)]
    return list(zip(offsets, widths))


def _token_counts(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # spread root: see _doc_toks — the explode+count is map-heavy
    return (
        _doc_toks(docs, text_col, id_col)
        .select("doc_id", F.explode("__toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("w"))
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    on_overflow: str = "error",
) -> DataFrame:
    """60-bit SimHash per document, term-frequency weighted.

    Token hash = first 15 md5 hex chars as a BIGINT (functions.hash60 —
    DuckDB computes the identical value, so the signature is
    oracle-exact); bit j of the signature is the sign of
    Σ w·(2·bit_j(h)−1). One explode + two partial-aggregated hash
    aggregates with fixed-width (14-column SWAR-packed) buffers; no
    pairwise work. The DuckDB oracle keeps the UNPACKED 60-sum
    formulation — matching it end-to-end is the proof that the packed
    representation computes the identical signature.

    The SWAR lanes hold weighted bit-counts up to 2^12−1 = 4095, so a
    document whose TOTAL token weight exceeds 4095 would silently
    carry into adjacent lanes and corrupt its signature. wsum is
    already aggregated per doc, so the guard is free and LAZY (a
    branch inside the signature expression — no extra job):
    ``on_overflow='error'`` (default) raises at execution time naming
    the doc; ``'null'`` emits a NULL signature for over-capacity docs
    (caller filters or routes them to a wide-lane/unpacked pass)."""
    if on_overflow not in ("error", "null"):
        raise ValueError(f"on_overflow must be 'error' or 'null', got {on_overflow!r}")
    from yamr_spark.functions import hash60

    tc = _token_counts(docs, text_col, id_col).withColumn("h", hash60(F.col("token")))
    # SWAR-packed bit sums: 5 bit-counters per 64-bit accumulator in
    # 12-bit lanes (bit j -> accumulator j//5, lane j%5 at shift
    # 12*(j%5)), so the per-token aggregation runs 13 SUMs instead of
    # 60 — bench-measured ~2x on the signature stage. Lane capacity
    # 4095 bounds per-doc token weight (SIMHASH_LANE_BITS below; the
    # fixture max is ~100; corpora with >4095-token documents widen the
    # lanes — 20-bit lanes/3 per long — or pre-truncate). The unpacked
    # lane L_j = Sigma w*bit_j(h) relates to the old signed sum by
    # s_j = 2*L_j - W, so "s_j > 0" is exactly "2*L_j > W": the
    # signature value is bit-identical to the unpacked formulation.
    n_acc = (SIMHASH_BITS + 4) // 5
    # bit-spread by multiplication: for the 5-bit group g = (h>>5k)&31,
    # g * M with M = Σ 2^(11i) puts bit i at position i+11i' for every
    # (i, i'); masking to lane positions (multiples of 12) keeps only
    # the i == i' diagonal — i.e. bit i lands exactly in lane i. Four
    # integer ops replace fifteen shift-and-multiplies per accumulator.
    spread_mul = sum(1 << (11 * i) for i in range(5))
    lanes_mask = sum(1 << (SIMHASH_LANE_BITS * i) for i in range(5))
    packed = [
        F.sum(
            F.col("w")
            * (
                F.shiftright(F.col("h"), 5 * k).bitwiseAND(F.lit(31))
                * F.lit(spread_mul)
            ).bitwiseAND(F.lit(lanes_mask))
        ).alias(f"p{k}")
        for k in range(n_acc)
    ]
    sums = tc.groupBy("doc_id").agg(*packed, F.sum("w").alias("wsum"))
    lane_mask = (1 << SIMHASH_LANE_BITS) - 1
    sig = None
    for j in range(SIMHASH_BITS):
        lane = F.shiftright(
            F.col(f"p{j // 5}"), SIMHASH_LANE_BITS * (j % 5)
        ).bitwiseAND(F.lit(lane_mask))
        term = F.when(lane * 2 > F.col("wsum"), F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    lane_capacity = (1 << SIMHASH_LANE_BITS) - 1
    if on_overflow == "error":
        guarded = F.when(
            F.col("wsum") > lane_capacity,
            F.raise_error(
                F.concat(
                    F.lit(
                        "simhash SWAR lane overflow: doc_id="
                    ),
                    F.col("doc_id").cast("string"),
                    F.lit(
                        f" has token weight > {lane_capacity}; widen lanes"
                        " or pass on_overflow='null'"
                    ),
                )
            ).cast("long"),
        ).otherwise(sig.cast("long"))
    else:
        guarded = F.when(F.col("wsum") > lane_capacity, F.lit(None).cast("long")).otherwise(
            sig.cast("long")
        )
    return sums.select("doc_id", guarded.alias("simhash"))


def simhash_near_dup(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ ``max_hamming``.

    Pigeonhole blocking: the 60-bit signature is split into
    ``max_hamming + 1`` blocks (:func:`pigeonhole_blocks`) — a pair
    within the hamming budget must agree exactly on ≥1 block, making the
    candidate join an equality join on (block_id, block_value) — no
    all-pairs scan. Block count is DERIVED from max_hamming so recall is
    complete for any budget up to 59 (more blocks = more candidates =
    higher cost, the standard pigeonhole tradeoff). At the default
    budget the blocks are 15 bits wide, so bucket occupancy stays ~n/2¹⁵
    per block — the join never degenerates toward all-pairs the way a
    16-bit signature's 4-bit blocks do at scale.
    """
    if not 0 <= max_hamming < SIMHASH_BITS:
        raise ValueError(
            f"max_hamming must be in [0, {SIMHASH_BITS - 1}], got {max_hamming}"
        )
    blocks_spec = pigeonhole_blocks(SIMHASH_BITS, max_hamming)
    offsets = [o for o, _ in blocks_spec]
    widths = [w for _, w in blocks_spec]
    # barrier: both sides of the pigeonhole self-join consume the
    # signature frame — without it the full tokenize → token-count →
    # SWAR-sum pipeline runs twice, once per join side (guide §2.4;
    # A/B: 3.20 → 2.45 s at sf0.1). (doc_id, simhash) is 16 B/doc —
    # the scale-safe materialization unit.
    sig = materialize(simhash(docs, text_col=text_col, id_col=id_col))
    nibbles = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), off).bitwiseAND(
                        F.lit((1 << w) - 1)
                    )
                    for off, w in zip(offsets, widths)
                ]
            )
        ).alias("nib_id", "nib_val"),
    )
    a, b = nibbles.alias("a"), nibbles.alias("b")
    return (
        a.join(
            b,
            (F.col("a.nib_id") == F.col("b.nib_id"))
            & (F.col("a.nib_val") == F.col("b.nib_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_estimate_vs_exact(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """SimHash calibration: for every pigeonhole candidate pair within
    the hamming budget, compute the EXACT token-count cosine similarity
    and report it binned by hamming distance — (hamming, n_pairs,
    mean_cos, min_cos, max_cos).

    This is the SimHash analogue of minhash_estimate_quality /
    ann_recall_at_k: the signature's theoretical promise
    (E[hamming] = bits·θ/π, so hamming ≤ 3 of 60 ⇒ cos θ ≳ 0.988)
    becomes a measured, regression-guarded number. With the
    certified MinHash error panel and the CMS/KMV invariant queries,
    every approximate family in the engine now carries a measured
    calibration query.

    Scale: candidates come from the production pigeonhole join (never
    all-pairs); the exact-cosine verify semi-joins the token-count
    stream down to candidate docs first (the jaccard_for_pairs
    discipline), so the verify cost is O(candidates), not O(corpus).
    Float discipline: dot and the squared norms are exact integer
    aggregates; cosine = ROUND(dot / (sqrt(na2)·sqrt(nb2)), 6) — one
    IEEE rounding from exact integers; bin means are
    decimal-disciplined sums.

    ``pairs`` optionally supplies the (doc_a, doc_b, hamming) candidate
    table (e.g. a per-session shared materialization of
    simhash_near_dup) — it must be exactly what this function would
    build itself."""
    if pairs is None:
        pairs = simhash_near_dup(
            docs, max_hamming=max_hamming, text_col=text_col, id_col=id_col
        ).transform(materialize)
    cand_ids = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    tokc = _token_counts(
        docs.join(cand_ids, id_col, "left_semi"), text_col, id_col
    ).transform(materialize)
    norms = tokc.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    dots = (
        pairs.join(tokc.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            tokc.alias("tb"),
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("ta.token") == F.col("tb.token")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("ta.w") * F.col("tb.w")).alias("dot"))
    )
    per_pair = (
        pairs.join(dots, ["doc_a", "doc_b"], "left")
        .na.fill({"dot": 0})
        .join(norms.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(norms.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "hamming",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("na.n2")) * F.sqrt(F.col("nb.n2"))),
                6,
            ).alias("cos"),
        )
    )
    return per_pair.groupBy("hamming").agg(
        F.count("*").alias("n_pairs"),
        F.round(
            F.sum(F.round(F.col("cos"), 12).cast("decimal(28,14)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_cos"),
        F.min("cos").alias("min_cos"),
        F.max("cos").alias("max_cos"),
    )


# ------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    sh: DataFrame | None = None,
    rare: DataFrame | None = None,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard ≥ threshold, candidate-blocked
    by sharing ≥1 *rare* shingle (document frequency ≤ ``max_doc_freq``).

    ``sh`` / ``rare`` optionally supply the hashed shingle stream and
    its df ≤ ``max_doc_freq`` restriction (e.g. the per-session frames
    the containment family shares) — they must be exactly what this
    function would build itself, so results are identical by
    construction.

    The DF cap is the scale lever: stop-shingles shared by thousands of
    documents would otherwise square the join. Raising it tightens
    recall-vs-cost; Jaccard is always computed on the FULL shingle sets,
    so the cap affects candidate recall only.

    Scale design — every shuffle key is a 60-bit md5-derived shingle
    hash (functions.hash60), never n-gram text, so the corpus-sized
    streams move ~16-byte rows:

    1. df count: partial-aggregated (shingle_hash, count) — fixed-width.
    2. HOT-set anti-join: shingles with df > max_doc_freq are FEW
       (stop-shingles) — AQE broadcasts them, filtering the stream
       map-side. Crucially this happens BEFORE the posting-list
       aggregation, so no collect_list buffer ever materializes an
       unbounded hot posting list; every list entering the aggregation
       is ≤ max_doc_freq by construction.
    3. posting lists: group the surviving stream by shingle hash,
       collect the sorted doc-id list, explode all i<j pairs
       column-side (≤ C(cap, 2) per shingle).

    4. COUNTING verify: a candidate pair is emitted once per shared
       RARE shingle, so ``groupBy(doc_a, doc_b).count()`` — the very
       shuffle a ``.distinct()`` would pay anyway — IS |A∩B| restricted
       to rare shingles. |A∩B| = that count + the hot-shingle
       intersection, where per-doc hot arrays are tiny (only the few
       stop-shingles a doc contains) and only candidate pairs pay the
       correction. |A|,|B| come from a map-side per-doc distinct count.
       No per-pair full-set arrays are ever built or joined — the
       verify never touches the corpus again."""
    # The HASHED shingle stream (16-byte rows) is consumed by the df
    # pass, the posting aggregation, and the hot-set build — materialize
    # it once. (The r03 lesson "don't checkpoint the shingle stream"
    # predates hashing: it was measured on STRING shingles, where the
    # checkpoint wrote the n-gram text; the hashed stream is ~10×
    # narrower and re-deriving it costs a full tokenize+explode per
    # consumer. Measured: postings pass 2.3 → 1.8 s at sf0.1.)
    if sh is None:
        sh = materialize(
            word_shingle_hashes(docs, n=n, text_col=text_col, id_col=id_col)
        )
    hot = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("sh")
    )
    # df ≤ cap restriction: identical rows whether expressed as the
    # hot-set anti-join or the shared cache's df-filter semi-join
    rare_stream = rare.select("sh", "doc_id") if rare is not None else sh.join(
        hot, "sh", "left_anti"
    )
    postings = (
        rare_stream
        .groupBy("sh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    # all i<j pairs from the sorted posting list, entirely column-side
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> "
        "struct(x AS doc_a, y AS doc_b))))"
    )
    # one occurrence per shared rare shingle → count == |∩ ∖ hot|
    inter_rare = (
        postings.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter_rare"))
    )
    # per-doc FULL distinct-shingle count. The sh stream IS the distinct
    # (doc_id, hash) set (word_shingle_hashes explodes array_distinct:
    # same doc set — every doc with >= n tokens has >= 1 shingle — and
    # count-of-rows == size(hashed array)), so aggregate the already-
    # materialized stream instead of re-tokenizing the corpus for a
    # second full pass (guide §2.4; bench-neutral at sf0.1, one fewer
    # corpus pass at scale).
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # per-doc HOT-shingle arrays: the broadcast hot set filters the
    # stream map-side; rows exist only for docs that contain a
    # stop-shingle, and each array holds ≤ |hot| entries
    hotsets = (
        sh.join(F.broadcast(hot), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("sh")).alias("hs"))
    )
    inter = (
        inter_rare.join(
            hotsets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha")),
            "doc_a",
            "left",
        )
        .join(
            hotsets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb")),
            "doc_b",
            "left",
        )
        .withColumn(
            "inter_sz",
            F.col("inter_rare")
            + F.when(
                F.col("ha").isNotNull() & F.col("hb").isNotNull(),
                F.size(F.array_intersect("ha", "hb")),
            ).otherwise(F.lit(0)),
        )
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter_sz")
                / (F.col("sza") + F.col("szb") - F.col("inter_sz")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------- estimator-quality certification


def minhash_estimate_vs_exact(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Certified MinHash estimator calibration: for every LSH candidate
    pair, compare the signature-agreement Jaccard ESTIMATE (fraction of
    the k permutations that agree — the unbiased MinHash estimator)
    against the EXACT shingle-set Jaccard, and report the error binned
    by exact similarity.

    Output: (bucket, n_pairs, mean_est, mean_exact, mean_abs_err,
    max_abs_err) with bucket = min(floor(4·J), 3) — the measured
    counterpart of the k=16 estimator's theoretical std dev
    sqrt(J(1−J)/16) ≤ 0.125. This is the dedup family's analogue of
    ann_recall_at_k: it turns the docstring error bound into a
    registered, regression-guarded number (VERDICT r10 #3 applied the
    same discipline to the ANN family).

    Scale: everything is bounded by the LSH candidate set — signatures
    are one partial-aggregated shuffle (docs×k fixed-width values),
    candidates come from the banded equality join (O(near-dups)), and
    the exact-Jaccard verify tokenizes only candidate docs
    (:func:`jaccard_for_pairs` semi-join). The estimate side is a
    broadcast-or-shuffle join of the candidate pairs back to the tiny
    signature table. est = agree/k is exact in binary for k a power of
    two, so the estimate column is bit-reproducible cross-engine.
    """
    sigs = minhash_signatures(
        docs, k=k, n=n, text_col=text_col, id_col=id_col
    ).transform(materialize)
    cands = minhash_band_pairs(
        sigs, bands=bands, rows_per_band=rows_per_band
    ).transform(materialize)

    agree = sum(
        (F.col(f"a.mh{i}") == F.col(f"b.mh{i}")).cast("int") for i in range(k)
    )
    est = (
        cands.join(sigs.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(sigs.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .select("doc_a", "doc_b", (agree / F.lit(k)).alias("est"))
    )

    cand_ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .union(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    docs_c = docs.join(cand_ids, id_col, "left_semi")
    # MATERIALIZED: the intersection join reads ``sh`` twice (sa / sb) —
    # left lazy, the candidate-doc shingle build executes twice.
    sh = materialize(
        word_shingle_hashes(
            docs_c, n=n, text_col=text_col, id_col=id_col
        ).withColumnRenamed("sh", "shingle")
    )
    exact = jaccard_for_pairs(cands, sh, sizes=sigs.select("doc_id", "sz"))

    per_pair = est.join(exact, ["doc_a", "doc_b"]).withColumn(
        "abs_err", F.abs(F.col("est") - F.col("jaccard"))
    )

    def _dmean(col: str):
        # decimal-disciplined mean (the unigram_lm_score float rule):
        # round addends 12 dp, sum through DECIMAL (order-independent),
        # divide by the count, round 6 dp once
        return F.round(
            F.sum(F.round(F.col(col), 12).cast("decimal(28,14)")).cast("double")
            / F.count("*"),
            6,
        )

    return (
        per_pair.withColumn(
            "bucket",
            F.least(F.floor(F.col("jaccard") * 4), F.lit(3)).cast("int"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_pairs"),
            _dmean("est").alias("mean_est"),
            _dmean("jaccard").alias("mean_exact"),
            _dmean("abs_err").alias("mean_abs_err"),
            F.round(F.max("abs_err"), 6).alias("max_abs_err"),
        )
    )


# ------------------------------------------------- incremental (batch-vs-index)


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW batch against a historical digest index — the daily-
    ingest shape: yesterday's corpus is represented only by its sha2-256
    digests, and a new document survives iff (a) it is the minimum-id
    holder of its digest within the batch and (b) its digest is absent
    from the index. Returns (doc_id, text_hash) of survivors.

    Scale: the index side carries 32-byte digests, never bodies, so the
    anti-join shuffles digest+id only; the within-batch collapse is one
    partial-aggregated groupBy on the digest. With a broadcast-sized
    daily index the anti-join is map-side; at 100 TB both sides shuffle
    on the digest — the same key, so AQE lines the exchanges up."""
    batch = new_docs.select(
        F.sha2(F.col(text_col).cast("binary"), 256).alias("text_hash"),
        F.col(id_col),
    )
    batch_keep = batch.groupBy("text_hash").agg(F.min(id_col).alias(id_col))
    return batch_keep.join(
        index.select("text_hash"), "text_hash", "left_anti"
    ).select(id_col, "text_hash")


# ------------------------------------------------------ fuzzy matching


def fuzzy_match_pairs(
    rows: DataFrame,
    block_cols: list[str],
    name_col: str,
    id_col: str,
    max_edit: int = 3,
) -> DataFrame:
    """Entity-resolution candidate pairs: same-block rows whose
    ``name_col`` values are within Levenshtein distance ``max_edit``
    (and not identical — exact dups are the cheap hash path's job).

    Scale design: the edit-distance comparison is quadratic and must
    NEVER see the full corpus — blocking on ``block_cols`` (an equality
    self-join) bounds it to Σ|block|²; pick block keys so blocks stay
    ~√n (the same discipline as IVF cells / LSH buckets). A length
    pre-filter (abs(len_a − len_b) ≤ max_edit, a Levenshtein lower
    bound) discards most survivors before the distance evaluates.
    Levenshtein is a builtin Column function on both engines, so the
    oracle replays it exactly."""
    from yamr_spark.tables import spread_scan

    # scan-spread (guide §2.5): the banded-Levenshtein evaluation runs in
    # the self-join's output partitioning, which for a broadcast join is
    # the STREAM side's scan partitioning — one task on a single-row-group
    # input. No-op on multi-split scans. cost_factor 32768: Σ|block|²
    # Levenshtein evaluations per row make this the heaviest per-byte
    # kernel in the engine (~4 KB of input is one task's work).
    keyed = spread_scan(
        rows.select(
            F.col(id_col).alias("id"),
            F.col(name_col).alias("name"),
            *[F.col(c) for c in block_cols],
        ),
        cost_factor=32768,
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cond = (F.col("a.id") < F.col("b.id")) & (
        F.abs(F.length("a.name") - F.length("b.name")) <= max_edit
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # materialize the candidate set BEFORE scoring: without the
    # barrier Catalyst merges the edit-distance filter into the join
    # residual — AHEAD of the cheap id/length conjuncts — and the
    # distance evaluates 3x per raw block pair (bench-measured 20.6 s
    # vs 5.6 s at sf0.1). The banded threshold form of levenshtein
    # early-exits at > max_edit, cutting the DP from O(|a|*|b|) to
    # O(max_edit*min(|a|,|b|)); it returns -1 above the threshold,
    # which the >= 1 filter drops (also excluding exact dups).
    cands = materialize(
        a.join(b, cond).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
    )
    return (
        cands.withColumn(
            "edit_dist",
            F.levenshtein(F.col("name_a"), F.col("name_b"), max_edit),
        )
        .where(F.col("edit_dist") >= 1)
        .select("id_a", "id_b", F.col("edit_dist").cast("long").alias("edit_dist"))
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric near-CONTAINMENT detection: c(a→b) = |A∩B| / |A| —
    the measure that catches what Jaccard structurally misses: a short
    document fully quoted inside a long one has containment ~1.0 but
    Jaccard ~|A|/|B| (arbitrarily low). The boilerplate-wrapper and
    quote-extraction cases every near-dup pass leaks.

    Output is DIRECTED: (src, dst, containment) where src's shingle
    set is ≥ ``threshold`` contained in dst — each unordered candidate
    can emit 0, 1 (the subset direction), or 2 (near-identical) rows.

    Scale: candidates come from the same MinHash band join as
    ``minhash_near_dup`` (bucketed, never all-pairs), intersections
    from the hashed-shingle pair join restricted to candidate docs.
    Honest recall note: MinHash bands block on JACCARD, so a
    containment-high/Jaccard-low pair (tiny doc in huge doc) may not
    collide in any band — the production fix is size-stratified
    banding or a one-sided (src-set) signature; at this fixture's
    near-dup rates the band candidates carry the containment signal."""
    from yamr_spark.materialize import materialize

    sigs = minhash_signatures(docs, n=n, text_col=text_col, id_col=id_col).transform(
        materialize
    )
    cands = minhash_band_pairs(sigs).transform(materialize)
    cand_ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .union(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    docs_c = docs.join(cand_ids, id_col, "left_semi")
    # MATERIALIZED: the intersection join reads ``sh`` twice (sa / sb) —
    # left lazy, the candidate-doc shingle build executes twice.
    sh = materialize(
        word_shingle_hashes(
            docs_c, n=n, text_col=text_col, id_col=id_col
        ).withColumnRenamed("sh", "shingle")
    )
    inter = (
        cands.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    za = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    scored = inter.join(za, "doc_a").join(zb, "doc_b")
    ab = scored.select(
        F.col("doc_a").alias("src"),
        F.col("doc_b").alias("dst"),
        F.round(F.col("i") / F.col("sz_a"), 6).alias("containment"),
    )
    ba = scored.select(
        F.col("doc_b").alias("src"),
        F.col("doc_a").alias("dst"),
        F.round(F.col("i") / F.col("sz_b"), 6).alias("containment"),
    )
    return ab.unionByName(ba).where(F.col("containment") >= threshold)


def containment_pairs_stratified(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    probes_per_doc: int = 5,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    sh: DataFrame | None = None,
    rare: DataFrame | None = None,
    probe_hits: DataFrame | None = None,
) -> DataFrame:
    """ONE-SIDED containment candidates (VERDICT r06 #3): the variant of
    :func:`containment_pairs` whose candidate generation does not depend
    on Jaccard at all, so a tiny document fully quoted inside a huge one
    (containment ≈ 1, Jaccard ≈ |A|/|B| ≈ 0 — a pair MinHash bands
    provably may never collide on) still becomes a candidate.

    Candidates come from the SOURCE side's own shingles: each doc
    probes with its ``probes_per_doc`` smallest (by 60-bit hash —
    a uniform deterministic sample, i.e. a bottom-k sketch) RARE
    shingles against the inverted index of every doc's rare shingles.
    If src is ≥ threshold contained in dst, each probe independently
    hits dst's set with probability ≥ threshold, so ≥1-hit recall is
    ≥ 1 − (1−t)^k — and exactly 1 for full containment; no symmetric
    (both-sets) signature can give that one-sided guarantee.
    Verification then computes exact c(src→dst) = |S_src ∩ S_dst| /
    |S_src| over the FULL shingle sets. Output is DIRECTED src→dst
    (only the probing side's containment — run twice or union with
    the Jaccard-band variant for both directions).

    Scale: the probe join costs Σ_probes df(shingle) ≤ corpus_docs ×
    probes_per_doc × ``max_df`` — the ``max_df`` cap drops stop-shingle
    postings from BOTH sides (the same Σ|posting|² discipline as
    ngram_jaccard_pairs), bounding the hot-key blowup; the bottom-k
    probe pick is a per-doc window over the rare-shingle stream
    (bounded per-doc state, co-partitioned with the next join's build).
    Recall caveat inherited from the cap: a src doc whose every shingle
    exceeds ``max_df`` (pure boilerplate) emits no probes — exactly the
    docs the ngram-Jaccard DF-cap already declines to pair.

    ``sh``/``rare``: optionally pass the precomputed (materialized)
    hashed-shingle table and its max_df-filtered rare stream so the
    containment family shares ONE shingle build per (session, corpus)
    — the pair-table sharing discipline (queries_dedup.
    _containment_shingles_shared); semantics are identical either
    way. ``probe_hits``: optionally pass the precomputed raw directed
    probe hits (``_containment_probe_candidates(rare, probes_per_doc)``
    — the window + probe join this family's directed and bidirectional
    forms both build identically), the same sharing discipline one
    level up; callers must have built it with the SAME ``rare`` and
    ``probes_per_doc``."""
    sh, rare = _shingles_and_rare(
        docs, n, max_df, text_col, id_col, sh=sh, rare=rare
    )
    hits = (
        probe_hits
        if probe_hits is not None
        else _containment_probe_candidates(rare, probes_per_doc)
    )
    cand = (
        hits.select("src", "dst")
        .distinct()
        .transform(materialize)
    )
    inter, sizes = _containment_intersect(cand, sh, "src", "dst")
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("src"), "sz"), "src"
        )
        .select(
            "src",
            "dst",
            F.round(F.col("i") / F.col("sz"), 6).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def _containment_probe_candidates(
    rare: DataFrame, probes_per_doc: int
) -> DataFrame:
    """The family's shared candidate generator: each doc's bottom-k
    (by hash) rare shingles probe the rare-shingle inverted index.
    Returns raw directed (src, dst) hits — callers canonicalize."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("sh")
    probes = (
        rare.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= probes_per_doc)
        .select(F.col("doc_id").alias("src"), "sh")
    )
    return probes.join(
        rare.select(F.col("doc_id").alias("dst"), "sh"), "sh"
    ).where(F.col("src") != F.col("dst"))


def _containment_intersect(
    cand: DataFrame, sh: DataFrame, xcol: str, ycol: str
) -> tuple[DataFrame, DataFrame]:
    """The family's shared exact-verify core: prune the shingle stream
    to candidate docs (left-semi), count each pair's intersection, and
    aggregate sizes from the SAME pruned stream (never the corpus —
    review r07). Returns (inter(x, y, i), sizes(doc_id, sz))."""
    cand_ids = (
        cand.select(F.col(xcol).alias("doc_id"))
        .union(cand.select(F.col(ycol).alias("doc_id")))
        .distinct()
    )
    shc = sh.join(cand_ids, "doc_id", "left_semi")
    inter = (
        cand.join(shc.alias("sa"), F.col(xcol) == F.col("sa.doc_id"))
        .join(
            shc.alias("sb"),
            (F.col(ycol) == F.col("sb.doc_id"))
            & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy(xcol, ycol)
        .agg(F.count("*").alias("i"))
    )
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("sz"))
    return inter, sizes


def _shingles_and_rare(
    docs: DataFrame,
    n: int,
    max_df: int,
    text_col: str,
    id_col: str,
    sh: DataFrame | None = None,
    rare: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The containment family's shared head: the materialized hashed-
    shingle table and its max_df-filtered rare stream, either passed in
    precomputed (the per-session cache) or built here."""
    from yamr_spark.materialize import materialize

    if sh is None:
        sh = word_shingle_hashes(
            docs, n=n, text_col=text_col, id_col=id_col
        ).transform(materialize)
    if rare is None:
        dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
        rare = sh.join(dfreq.where(F.col("df") <= max_df).select("sh"), "sh")
    return sh, rare


def containment_pairs_bidir(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    probes_per_doc: int = 5,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    sh: DataFrame | None = None,
    rare: DataFrame | None = None,
    probe_hits: DataFrame | None = None,
) -> DataFrame:
    """BIDIRECTIONAL containment (VERDICT r07 #3): one row per
    UNORDERED candidate pair (doc_a < doc_b) carrying BOTH directed
    containments — c(a→b) = |S_a ∩ S_b| / |S_a| and c(b→a) — kept when
    EITHER direction clears ``threshold``. This is the one-call form of
    :func:`containment_pairs_stratified`'s docstring instruction ("run
    twice or union"): a user asking "is either of these a quote of the
    other?" gets both answers from one pass over the corpus.

    Candidates come from EITHER side's bottom-``probes_per_doc``
    rare-shingle probes against the shared rare-shingle inverted index,
    so the one-sided recall bound ≥ 1 − (1−t)^k (exactly 1 for full
    containment) holds for whichever direction is actually contained —
    a tiny document quoted inside a huge one surfaces through the tiny
    side's probes no matter which id sorts first.

    Scale: identical machinery and bounds as the directed form — probe
    join ≤ docs × probes × ``max_df`` postings, one exact intersection
    over the candidate-pruned shingle stream (shc), sizes from that
    same pruned stream — plus one `least/greatest` canonicalization;
    verifying both directions reuses the SAME intersection count, so
    bidir costs no second corpus pass. ``sh``/``rare``/``probe_hits``:
    see :func:`containment_pairs_stratified` — the family's shared
    shingle build and shared raw probe hits."""
    sh, rare = _shingles_and_rare(
        docs, n, max_df, text_col, id_col, sh=sh, rare=rare
    )
    hits = (
        probe_hits
        if probe_hits is not None
        else _containment_probe_candidates(rare, probes_per_doc)
    )
    cand = (
        hits.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .transform(materialize)
    )
    inter, sizes = _containment_intersect(cand, sh, "a", "b")
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb")), "b")
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            F.round(F.col("i") / F.col("sza"), 6).alias("containment_ab"),
            F.round(F.col("i") / F.col("szb"), 6).alias("containment_ba"),
        )
        .where(
            (F.col("containment_ab") >= threshold)
            | (F.col("containment_ba") >= threshold)
        )
    )
