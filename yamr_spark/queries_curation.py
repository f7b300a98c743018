"""Curation query registrations (decontamination, span dedup, hash
split, quota sampling, novelty) with exact DuckDB oracles.

Like the dedup family, every "random" choice is a content hash (md5),
so the oracles rebuild the identical pipelines in SQL and the driver's
value-hash compares real content.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.operators import curation as C
from yamr_spark.queries_dedup import _TOKS_CTE
from yamr_spark.registry import register
from yamr_spark.tables import table

# distinct word-5-shingles per document (decontamination granularity)
_SH5_CTE = (
    _TOKS_CTE
    + """,
pos AS (
  SELECT doc_id, t, unnest(range(len(t) - 4)) AS i
  FROM toks WHERE len(t) >= 5
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i+1:i+5], ' ') AS shingle FROM pos
)
"""
)

# distinct word-3-shingles per document (novelty granularity)
_SH3_CTE = (
    _TOKS_CTE
    + """,
pos AS (
  SELECT doc_id, t, unnest(range(len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i+1:i+3], ' ') AS shingle FROM pos
)
"""
)

# Shared decontamination flag-set for the pipeline family (same
# session-cache pattern as the shingle/IVF/frame-signature caches):
# llm_prep_pipeline v1/v2/v3 each anti-join the SAME 5-gram-overlap
# flag set; compute it once per (application, sf_dir, bench_mod).
# ``benchmark_decontaminate`` itself stays the UNCACHED representative
# so the stage's own cost remains measured.
from yamr_spark.materialize import pinned_blocks, register_shared_cache

_FLAGGED_CACHE: dict[tuple[str, str, int], object] = register_shared_cache({})


def _flagged_shared(spark, sf_dir, bench_mod=97):
    key = (spark.sparkContext.applicationId, sf_dir, bench_mod)
    flagged = _FLAGGED_CACHE.get(key)
    if flagged is None:
        from yamr_spark.materialize import materialize

        for stale in [k for k in _FLAGGED_CACHE if k[0] != key[0]]:
            del _FLAGGED_CACHE[stale]
        with pinned_blocks():
            flagged = materialize(
                C.benchmark_decontaminate(
                    table(spark, sf_dir, "documents"), bench_mod=bench_mod
                ).select("doc_id")
            )
        _FLAGGED_CACHE[key] = flagged
    return flagged


_HEX = "0123456789abcdef"
_BUCKET = (
    f"((strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + "
    f"(strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))"
)


@register(
    "benchmark_decontaminate",
    oracle=f"""
    WITH {_SH5_CTE},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM corpus JOIN bench USING (shingle)
    GROUP BY doc_id
    HAVING COUNT(*) >= 3
    """,
)
def q_benchmark_decontaminate(spark, sf_dir):
    """Train-test decontamination: training docs sharing ≥3 distinct
    5-grams with the (deterministically carved) benchmark set. The
    benchmark shingle set is broadcast; the corpus streams once."""
    return C.benchmark_decontaminate(table(spark, sf_dir, "documents"))


@register(
    "benchmark_decontaminate_n3",
    oracle=f"""
    WITH {_SH3_CTE},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM corpus JOIN bench USING (shingle)
    GROUP BY doc_id
    HAVING COUNT(*) >= 2
    """,
)
def q_benchmark_decontaminate_n3(spark, sf_dir):
    """Loose-parameter decontamination (3-grams, ≥2 overlaps): the
    default 5-gram/≥3 registration returns 0 rows at the sf fixtures, so
    its oracle parity is vacuous there — this variant returns ~40 rows
    at sf0.01 and actually exercises the overlap-count join + HAVING
    threshold semantics against the oracle."""
    return C.benchmark_decontaminate(
        table(spark, sf_dir, "documents"), n=3, min_overlap=2
    )


@register(
    "chunk_dup_stats",
    oracle=f"""
    WITH {_TOKS_CTE},
    idx AS (
      SELECT doc_id, t, unnest(range(len(t) // 8)) AS j
      FROM toks WHERE len(t) >= 8
    ),
    ch AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[j*8+1 : j*8+8], ' ') AS chunk
      FROM idx
    ),
    dfq AS (SELECT chunk, COUNT(*) AS df FROM ch GROUP BY chunk)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           ROUND(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS shared_frac
    FROM ch JOIN dfq USING (chunk)
    GROUP BY doc_id
    """,
)
def q_chunk_dup_stats(spark, sf_dir):
    """Duplicated-span statistics at 8-token chunk granularity — the
    scalable stand-in for suffix-array substring dedup."""
    return C.chunk_dup_stats(table(spark, sf_dir, "documents"))


@register(
    "span_dup_stats",
    oracle=f"""
    WITH {_TOKS_CTE},
    wins AS MATERIALIZED (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             unnest(range(len(t) - 8 + 1)) + 1 AS s, t
      FROM toks WHERE len(t) >= 8
    ),
    hashed AS MATERIALIZED (
      SELECT doc_id, n_tokens, s,
             ('0x' || substr(md5(array_to_string(t[s : s+7], ' ')), 1, 15))::BIGINT
               AS h
      FROM wins
    ),
    duph AS (
      SELECT h FROM (
        SELECT h, COUNT(*) AS nd
        FROM (SELECT DISTINCT h, doc_id FROM hashed) GROUP BY h
      ) WHERE nd >= 2
    ),
    dups AS (
      SELECT w.doc_id, w.n_tokens, w.s,
             LAG(w.s) OVER (PARTITION BY w.doc_id ORDER BY w.s) AS prev
      FROM hashed w JOIN duph USING (h)
    ),
    isl AS (
      SELECT doc_id, n_tokens, s,
             SUM(CASE WHEN prev IS NULL OR s > prev + 8 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM dups
    ),
    spans AS (
      SELECT doc_id, n_tokens, isl,
             CAST(MAX(s) - MIN(s) + 8 AS BIGINT) AS span_tokens
      FROM isl GROUP BY doc_id, n_tokens, isl
    )
    SELECT doc_id, n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
           CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens,
           ROUND(SUM(span_tokens) * 1.0 / n_tokens, 6) AS dup_frac
    FROM spans GROUP BY doc_id, n_tokens
    """,
)
def q_span_dup_stats(spark, sf_dir):
    """Cross-document duplicated SPANS at rolling 8-token-window
    granularity with overlap merging — the alignment-free exact
    substring dedup (any duplicate of >= 8 tokens is caught at any
    offset, unlike the fixed chunk grid). Window hashes shuffle as
    8-byte keys at corpus-token cardinality; the span merge is per-doc
    window-function work."""
    return C.span_dup_stats(table(spark, sf_dir, "documents"))


@register(
    "hash_split_counts",
    oracle=f"""
    SELECT lang,
           CASE WHEN {_BUCKET} < 205 THEN 'train'
                WHEN {_BUCKET} < 230 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_hash_split_counts(spark, sf_dir):
    """Deterministic md5-bucket train/val/test split (≈80/10/10),
    reported as per-(lang, split) counts. Content-addressed: stable
    under retries and re-partitioning, unlike rand()."""
    return C.hash_split(table(spark, sf_dir, "documents"))


@register(
    "quota_sample_lang",
    oracle="""
    SELECT doc_id, lang, n_chars, rnk FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    ) t WHERE rnk <= 20
    """,
)
def q_quota_sample_lang(spark, sf_dir):
    """Per-language quota sampling (mixture control): top-20 docs per
    lang by length, deterministic tie-break on doc_id."""
    return C.quota_sample(table(spark, sf_dir, "documents"))


@register(
    "ngram_novelty",
    oracle=f"""
    WITH {_SH3_CTE},
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
      FROM sh GROUP BY doc_id
    ),
    firsts AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle),
    novel AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
      FROM firsts GROUP BY first_doc
    )
    SELECT p.doc_id, p.n_shingles,
           CAST(COALESCE(v.n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(COALESCE(v.n_novel, 0) * 1.0 / p.n_shingles, 6) AS novelty
    FROM per_doc p LEFT JOIN novel v USING (doc_id)
    """,
)
def q_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty: share of the doc's shingles whose
    first corpus appearance is this doc — low novelty flags boilerplate."""
    return C.ngram_novelty(table(spark, sf_dir, "documents"))


_NWORDS = (
    "len(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'), "
    "x -> length(x) > 0))"
)

_PIPELINE_ORACLE = f"""
    WITH {_SH5_CTE},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    flagged AS (
      SELECT doc_id FROM corpus JOIN bench USING (shingle)
      GROUP BY doc_id HAVING COUNT(*) >= 3
    ),
    gated AS (
      SELECT doc_id, lang, text FROM documents
      WHERE {_NWORDS} >= 5 AND length(text) >= 30 AND doc_id % 97 <> 0
    ),
    surv AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM gated
      ) t WHERE rn = 1
    ),
    clean AS (
      SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
    )
    SELECT CASE WHEN {_BUCKET} < 205 THEN 'train'
                WHEN {_BUCKET} < 230 THEN 'val'
                ELSE 'test' END AS split,
           lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM clean GROUP BY 1, 2
"""


@register("llm_prep_pipeline", oracle=_PIPELINE_ORACLE)
def q_llm_prep_pipeline(spark, sf_dir):
    """Flagship end-to-end prep: quality gate → drop benchmark carve-out
    → exact dedup (arg-min per sha256) → decontamination anti-join →
    deterministic split → per-(split, lang) counts. One declarative DAG;
    see operators/curation.py:llm_prep_pipeline for the scale story."""
    return C.llm_prep_pipeline(
        table(spark, sf_dir, "documents"), flagged=_flagged_shared(spark, sf_dir)
    )


@register(
    "split_store_train_counts",
    oracle=f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    WHERE {_BUCKET} < 205
    GROUP BY lang
    """,
)
def q_split_store_train_counts(spark, sf_dir):
    """The pipeline's OUTPUT path end-to-end: write the corpus
    partitioned by (split, lang) — the layout a trainer consumes — then
    read back ONLY the train split (directory-pruned scan, pinned by
    tests/test_plans.py) and report per-lang counts. The oracle replays
    the split arithmetic on the original table, so a row landing in the
    wrong partition fails the hash."""
    import os

    from pyspark.sql import functions as F

    from yamr_spark.tmpdirs import session_dir, store_complete

    docs = table(spark, sf_dir, "documents")
    store = os.path.join(session_dir(f"splitstore:{sf_dir}", "yamr_split_"), "store")
    if not store_complete(store):
        C.write_split_corpus(docs, store)
    return (
        C.read_split(spark, store, "train")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


# per-doc token counts with lang — shared by the packing/mixture oracles
_NTOK_CTE = """
ntok AS (
  SELECT doc_id, lang,
         len(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'),
                         x -> length(x) > 0)) AS n_tok
  FROM documents
)
"""

_H60_DOC = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
_MIX_CASE = (
    "CASE lang WHEN 'de' THEN CAST(0.15 AS DOUBLE)"
    " WHEN 'en' THEN CAST(0.35 AS DOUBLE)"
    " WHEN 'es' THEN CAST(0.15 AS DOUBLE)"
    " WHEN 'fr' THEN CAST(0.15 AS DOUBLE)"
    " WHEN 'zh' THEN CAST(0.20 AS DOUBLE)"
    " ELSE CAST(0.0 AS DOUBLE) END"
)


@register(
    "pack_sequences",
    oracle=f"""
    WITH {_NTOK_CTE},
    h AS (
      SELECT doc_id, n_tok, {_H60_DOC} AS h60, {_H60_DOC} % 16 AS bucket
      FROM ntok
    ),
    cumulated AS (
      SELECT bucket, n_tok,
             SUM(n_tok) OVER (PARTITION BY bucket ORDER BY h60, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM h
    )
    SELECT bucket,
           CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM cumulated
    GROUP BY bucket, CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT)
    """,
)
def q_pack_sequences(spark, sf_dir):
    return C.pack_sequences(table(spark, sf_dir, "documents"))


@register(
    "domain_mix_sample",
    oracle=f"""
    WITH {_NTOK_CTE},
    totals AS (
      SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens,
             COUNT(*) AS lang_docs
      FROM ntok GROUP BY lang
    ),
    rates AS (
      SELECT lang, lang_docs, lang_tokens,
             CAST(FLOOR(least(CAST(1.0 AS DOUBLE),
                              {_MIX_CASE} * 25000.0 / greatest(lang_tokens, 1))
                        * 1000000.0) AS BIGINT) AS rate_ppm
      FROM totals
    ),
    samp AS (
      SELECT t.lang, COUNT(*) AS n_sampled,
             CAST(SUM(t.n_tok) AS BIGINT) AS sampled_tokens
      FROM ntok t JOIN rates r USING (lang)
      WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR) || ':mix'), 1, 15))::BIGINT
              % 1000000 < r.rate_ppm
      GROUP BY t.lang
    )
    SELECT lang, lang_docs, lang_tokens, rate_ppm,
           COALESCE(n_sampled, 0) AS n_sampled,
           COALESCE(sampled_tokens, 0) AS sampled_tokens
    FROM rates LEFT JOIN samp USING (lang)
    """,
)
def q_domain_mix_sample(spark, sf_dir):
    return C.domain_mix_sample(table(spark, sf_dir, "documents"))


@register(
    "domain_epoch_allocation",
    oracle="""
    WITH t AS (
      SELECT source AS domain,
             len(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'),
                             x -> length(x) > 0)) AS n_tok
      FROM documents
    ),
    per AS (
      SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM t GROUP BY domain
    ),
    w AS (
      SELECT *, CAST(ROUND(sqrt(n_tokens), 12) AS DECIMAL(38,12)) AS sq FROM per
    ),
    tot AS (
      SELECT SUM(sq) AS sqsum, CAST(SUM(n_tokens) AS BIGINT) AS tok_total FROM w
    )
    SELECT domain, n_docs, n_tokens,
           ROUND(CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE), 6) AS weight,
           ROUND(LEAST(4.0, 2.0 * CAST(tok_total AS DOUBLE)
                             * (CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE))
                             / n_tokens), 6) AS epochs,
           CAST(FLOOR(n_tokens * LEAST(4.0, 2.0 * CAST(tok_total AS DOUBLE)
                                            * (CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE))
                                            / n_tokens)) AS BIGINT) AS alloc_tokens
    FROM w CROSS JOIN tot
    """,
)
def q_domain_epoch_allocation(spark, sf_dir):
    """DoReMi-lite epoch/budget allocator over the source domains:
    sqrt-proportional weights, 2× corpus token budget, epochs capped at
    4 — the per-domain repeat plan a 100 TB pretraining mix starts
    from. All math on the |domains|-row aggregate; the corpus scan
    contributes only the map-side token count."""
    return C.domain_epoch_allocation(table(spark, sf_dir, "documents"))


@register(
    "global_shuffle_stats",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('epoch0|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS shuffle_key
      FROM documents
    )
    SELECT CAST(shuffle_key % 16 AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           MIN(shuffle_key) AS min_key,
           MAX(shuffle_key) AS max_key,
           COUNT(DISTINCT lang) AS n_langs
    FROM keyed
    GROUP BY 1
    """,
)
def q_global_shuffle_stats(spark, sf_dir):
    """Deterministic training-order shuffle balance report: 16 shards
    keyed by hash60('epoch0|doc_id'); per-shard population, key range,
    and language spread. The oracle replays the identical md5-derived
    key, so shard placement is bit-exact across engines."""
    return C.global_shuffle_stats(table(spark, sf_dir, "documents"))


@register(
    "chunk_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'),
                         x -> length(x) > 0) AS t
      FROM documents
    ),
    idx AS (
      SELECT doc_id, t,
             unnest(range(CAST(ceil(len(t) / 24.0) AS BIGINT))) AS j
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(j AS INTEGER) AS chunk_idx,
           CAST(len(t[j*24+1 : j*24+32]) AS INTEGER) AS n_tokens,
           ('0x' || substr(md5(array_to_string(t[j*24+1 : j*24+32], ' ')), 1, 15))::BIGINT
             AS chunk_hash
    FROM idx
    """,
)
def q_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (width 32, stride 24) — the
    RAG/context-window prep pass, pure map-side Column ops; chunk
    identity rides a 60-bit md5-derived hash so downstream never
    shuffles chunk text. The oracle replays the identical windowing
    arithmetic (ceil(len/stride) windows, inclusive-clamped slices)."""
    return C.chunk_documents(table(spark, sf_dir, "documents"))


@register(
    "compacted_store_counts",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_compacted_store_counts(spark, sf_dir):
    """Small-file compaction under the hash gate: a deliberately
    fragmented per-lang store (20 files per partition) is compacted to
    right-sized files (atomic per-directory swap, metadata-only
    planning), then read back and rolled up — any row lost, duplicated,
    or mis-partitioned by the rewrite fails the content hash against
    the uncompacted oracle."""
    import os

    from pyspark.sql import functions as F

    from yamr_spark.operators.maintenance import compact_store
    from yamr_spark.tmpdirs import session_dir, store_complete

    base = session_dir(f"compact_store:{sf_dir}", "yamr_compact_")
    store = os.path.join(base, "store")
    if not store_complete(store):
        docs = table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars", "lang"
        )
        docs.repartition(20).write.partitionBy("lang").mode("overwrite").parquet(
            store
        )
        compact_store(spark, store, target_bytes=64 * 1024 * 1024)
    return (
        spark.read.parquet(store)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def _pipeline_v2_oracle() -> str:
    """v1's oracle with the near-dup group-collapse stage spliced in:
    the minhash/band/jaccard fragments from queries_dedup are reused
    verbatim but renamed into an ``m_``-prefixed CTE namespace and
    re-rooted at the exact-dedup SURVIVOR set instead of raw
    documents — the recursive closure then yields the non-canonical
    ids the pipeline drops."""
    import re

    from yamr_spark.queries_dedup import _BANDS_CTE, _CAND_PAIRS, _JACCARD

    chain = f"{_BANDS_CTE}, {_CAND_PAIRS}, {_JACCARD}"
    for name in ("toks", "pos", "sh", "sig", "bands", "cand", "sizes", "inter"):
        chain = re.sub(rf"\b{name}\b", f"m_{name}", chain)
    chain = chain.replace(
        "FROM documents", "FROM documents JOIN surv USING (doc_id)"
    )
    return f"""
    WITH RECURSIVE {_SH5_CTE},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    flagged AS (
      SELECT doc_id FROM corpus JOIN bench USING (shingle)
      GROUP BY doc_id HAVING COUNT(*) >= 3
    ),
    gated AS (
      SELECT doc_id, lang, text FROM documents
      WHERE {_NWORDS} >= 5 AND length(text) >= 30 AND doc_id % 97 <> 0
    ),
    surv AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM gated
      ) t WHERE rn = 1
    ),
    {chain},
    dups AS (
      SELECT c.doc_a, c.doc_b
      FROM m_cand c
      JOIN m_inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN m_sizes za ON za.doc_id = c.doc_a
      JOIN m_sizes zb ON zb.doc_id = c.doc_b
      WHERE CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM dups
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM dups
    ),
    reach(node, label) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
    ),
    non_canon AS (
      SELECT node AS doc_id FROM reach GROUP BY node
      HAVING MIN(label) <> node
    ),
    clean AS (
      SELECT * FROM surv
      WHERE doc_id NOT IN (SELECT doc_id FROM non_canon)
        AND doc_id NOT IN (SELECT doc_id FROM flagged)
    )
    SELECT CASE WHEN {_BUCKET} < 205 THEN 'train'
                WHEN {_BUCKET} < 230 THEN 'val'
                ELSE 'test' END AS split,
           lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM clean GROUP BY 1, 2
    """


@register("llm_prep_pipeline_v2", oracle=_pipeline_v2_oracle())
def q_llm_prep_pipeline_v2(spark, sf_dir):
    """The COMPLETE flagship: v1 plus near-duplicate group collapse
    (MinHash-LSH pairs over exact-dedup survivors → connected
    components → keep each group's canonical member) between dedup and
    decontamination — the full modern prep ordering. The oracle replays
    everything, including the transitive closure, in one recursive-CTE
    statement."""
    return C.llm_prep_pipeline_v2(
        table(spark, sf_dir, "documents"), flagged=_flagged_shared(spark, sf_dir)
    )


@register(
    "corpus_version_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 3 <> 0
    ),
    new AS (
      SELECT doc_id,
             sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h
      FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT CASE WHEN o.h IS NULL THEN 'added'
                WHEN n.h IS NULL THEN 'removed'
                WHEN o.h = n.h THEN 'unchanged'
                ELSE 'changed' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM old o FULL OUTER JOIN new n USING (doc_id)
    GROUP BY 1
    """,
)
def q_corpus_version_diff(spark, sf_dir):
    """Release diff between two corpus versions (carved from the fixture:
    v_old = ids not div by 3, v_new = ids not div by 5 with every 7th
    doc edited): digest-level added/removed/changed/unchanged counts —
    bodies reduce to 32-byte digests before the single full-outer
    shuffle."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return C.corpus_diff(old, new)


_PII_ENRICH_SQL = """
    text || CASE CAST(doc_id % 3 AS INTEGER)
      WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      WHEN 1 THEN ' node 10.1.' || CAST(doc_id % 200 AS VARCHAR) || '.7 up'
      ELSE '' END
    || CASE WHEN doc_id % 5 = 0
       THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END
"""


@register(
    "pii_redaction_stats",
    oracle=f"""
    WITH enriched AS (
      SELECT lang, {_PII_ENRICH_SQL} AS text FROM documents
    ),
    r1 AS (
      -- counts mirror the engine: each pattern counted on the
      -- PROGRESSIVELY-redacted text, so counts == placeholders inserted
      SELECT lang,
        CAST(len(regexp_extract_all(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_emails,
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS t1
      FROM enriched
    ),
    r2 AS (
      SELECT lang, n_emails,
        CAST(len(regexp_extract_all(t1,
          '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ips,
        regexp_replace(t1,
          '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g') AS t2
      FROM r1
    ),
    red AS (
      SELECT lang, n_emails, n_ips,
        CAST(len(regexp_extract_all(t2, '\\+\\d{{1,2}}-\\d{{3}}-\\d{{4}}')) AS BIGINT)
          AS n_phones,
        regexp_replace(t2, '\\+\\d{{1,2}}-\\d{{3}}-\\d{{4}}', '<PHONE>', 'g') AS text
      FROM r2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_emails + n_ips + n_phones > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_with_pii,
           CAST(SUM(n_emails) AS BIGINT) AS emails,
           CAST(SUM(n_ips) AS BIGINT) AS ips,
           CAST(SUM(n_phones) AS BIGINT) AS phones,
           CAST(SUM(length(text)) AS BIGINT) AS redacted_chars
    FROM red GROUP BY lang
    """,
)
def q_pii_redaction_stats(spark, sf_dir):
    """PII scrubbing end-to-end: the fixture text carries no PII, so a
    deterministic enrichment (doc_id-derived emails / IPs / phone
    numbers) makes the parity NON-vacuous — counts and the redacted
    text's content (via summed length) are both hash-checked. Map-side
    Column ops only; one lang-keyed aggregate."""
    from yamr_spark.operators.curation import pii_redact

    docs = table(spark, sf_dir, "documents").selectExpr(
        "lang", _PII_ENRICH_SQL.replace("VARCHAR", "STRING") + " AS text"
    )
    red = pii_redact(docs)
    return red.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            ((F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) > 0).cast("long")
        ).alias("docs_with_pii"),
        F.sum("n_emails").alias("emails"),
        F.sum("n_ips").alias("ips"),
        F.sum("n_phones").alias("phones"),
        F.sum(F.length("text")).alias("redacted_chars"),
    )


@register(
    "temperature_mixture_sample",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    weights AS (
      SELECT lang, n_docs, CAST(round(sqrt(n_docs), 9) AS DECIMAL(18,9)) AS w9
      FROM counts
    ),
    z AS (SELECT SUM(w9) AS z FROM weights),
    quota AS (
      SELECT lang, n_docs,
             ROUND(CAST(w9 AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight,
             CAST(ROUND(200.0 * (CAST(w9 AS DOUBLE) / CAST(z AS DOUBLE)), 0) AS BIGINT)
               AS quota
      FROM weights CROSS JOIN z
    ),
    ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.weight, q.quota,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(r.doc_id) AS BIGINT) AS sampled_id_sum
    FROM ranked r JOIN quota q USING (lang)
    WHERE r.rn <= q.quota
    GROUP BY q.lang, q.n_docs, q.weight, q.quota
    """,
)
def q_temperature_mixture_sample(spark, sf_dir):
    """Temperature (alpha=0.5) mixture sampling over languages: sqrt
    weights upsample low-resource groups; quotas drawn by content hash.
    sampled_id_sum content-checks WHICH docs were drawn, not just how
    many."""
    return C.temperature_sample(table(spark, sf_dir, "documents"))


@register(
    "export_manifest",
    oracle="""
    WITH h AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h60,
             doc_id, n_chars
      FROM documents
    )
    SELECT CAST(h60 % 16 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(CAST(SUM(h60) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
    FROM h GROUP BY shard
    """,
)
def q_export_manifest(spark, sf_dir):
    """Corpus-export integrity manifest: per shard (content-hash
    assignment, so shard membership is retry/relocation stable), the
    doc count, byte total, and an order-independent checksum (exact
    integer sum of the docs' 60-bit ids). The consumer of a 100 TB
    transfer re-derives this manifest from what arrived and diffs —
    any lost/duplicated/corrupted shard surfaces as one row. Pure
    map-side hashing + one partial-aggregated shuffle."""
    from yamr_spark.functions import hash60

    docs = table(spark, sf_dir, "documents")
    h = docs.select(
        hash60(F.col("doc_id").cast("string")).alias("h60"), "n_chars"
    )
    return h.groupBy((F.col("h60") % 16).alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        # DECIMAL(38,0), rendered as string: the sum of 60-bit values
        # overflows int64 beyond ~250 docs (and would at any real
        # corpus size); decimal sums stay exact to 10^38
        F.sum(F.col("h60").cast("decimal(38,0)")).cast("string").alias("checksum"),
    )


def _pipeline_v3_oracle() -> str:
    from yamr_spark.operators.text import GOPHER_STOPWORDS, LANG_PROFILES

    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    qstops = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
    WITH dt AS (
      SELECT doc_id, lang, text,
             list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}_]+'),
                         x -> length(x) > 0) AS t
      FROM documents
    ),
    s2 AS (SELECT * FROM dt WHERE doc_id % 97 <> 0),
    s3 AS (
      SELECT * FROM s2
      WHERE len(t) BETWEEN 30 AND 50000
        AND (CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE)
             / greatest(len(t), 1)) BETWEEN 3.0 AND 10.0
        AND (CAST(len(list_filter(t, x -> x IN ({stops}))) AS DOUBLE)
             / greatest(len(t), 1)) >= 0.02
        AND (CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1)) >= 0.3
    ),
    rbig AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t)),
             i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
      FROM dt WHERE len(t) >= 2
    ),
    rbigc AS (SELECT doc_id, g, COUNT(*) AS cnt FROM rbig GROUP BY doc_id, g),
    rtop AS (
      SELECT doc_id, g AS top_g, cnt AS top_cnt FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, g) AS rn
        FROM rbigc) t WHERE rn = 1
    ),
    rm2 AS (SELECT doc_id, SUM(cnt * length(g)) AS m2 FROM rbigc GROUP BY doc_id),
    rfive AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
             i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS g
      FROM dt WHERE len(t) >= 5
    ),
    rfivec AS (SELECT doc_id, g, COUNT(*) AS cnt FROM rfive GROUP BY doc_id, g),
    rdup AS (
      SELECT doc_id,
             SUM(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) AS dupm,
             SUM(cnt * length(g)) AS mn
      FROM rfivec GROUP BY doc_id
    ),
    reppass AS (
      SELECT d.doc_id
      FROM dt d
      LEFT JOIN rtop USING (doc_id)
      LEFT JOIN rm2 USING (doc_id)
      LEFT JOIN rdup USING (doc_id)
      WHERE ROUND(COALESCE(top_cnt * length(top_g) * 1.0 / m2, 0.0), 6) <= 0.20
        AND ROUND(COALESCE(dupm * 1.0 / mn, 0.0), 6) <= 0.15
    ),
    s4 AS (SELECT s3.* FROM s3 JOIN reppass USING (doc_id)),
    canon AS (SELECT MIN(doc_id) AS doc_id FROM s4 GROUP BY sha256(text)),
    s5 AS (SELECT s4.* FROM s4 JOIN canon USING (doc_id)),
    dpos AS (
      SELECT doc_id, t, unnest(range(len(t) - 4)) AS i
      FROM dt WHERE len(t) >= 5
    ),
    dsh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i+1:i+5], ' ') AS shingle
      FROM dpos
    ),
    dbench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % 97 = 0),
    dflag AS (
      SELECT doc_id FROM (SELECT * FROM dsh WHERE doc_id % 97 <> 0) c
      JOIN dbench USING (shingle)
      GROUP BY doc_id HAVING COUNT(*) >= 3
    ),
    s6 AS (SELECT * FROM s5 WHERE doc_id NOT IN (SELECT doc_id FROM dflag)),
    qual AS (
      SELECT doc_id, lang,
             ROUND(
               (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END)
               + least(len(list_filter(t, x -> x IN ({qstops}))) * 2.0
                       / greatest(len(t), 1), 0.3)
               + (CASE WHEN (length(text) - length(regexp_replace(text,
                              '[.,;:!?]', '', 'g'))) * 1.0
                            / greatest(length(text), 1) <= 0.1
                       THEN 0.15 ELSE 0.0 END)
               + (CASE WHEN (length(text) - length(regexp_replace(text,
                              '[0-9]', '', 'g'))) * 1.0
                            / greatest(length(text), 1) <= 0.2
                       THEN 0.15 ELSE 0.0 END), 6) AS quality
      FROM s6
    ),
    thr AS (SELECT quantile_cont(quality, 0.75) AS thr FROM qual),
    s7 AS (SELECT q.doc_id, q.lang FROM qual q CROSS JOIN thr
           WHERE quality >= thr)
    SELECT stage, lang, CAST(n_docs AS BIGINT) AS n_docs FROM (
      SELECT '1_raw' AS stage, lang, COUNT(*) AS n_docs FROM dt GROUP BY lang
      UNION ALL
      SELECT '2_bench_carve', lang, COUNT(*) FROM s2 GROUP BY lang
      UNION ALL
      SELECT '3_gopher', lang, COUNT(*) FROM s3 GROUP BY lang
      UNION ALL
      SELECT '4_repetition', lang, COUNT(*) FROM s4 GROUP BY lang
      UNION ALL
      SELECT '5_exact_dedup', lang, COUNT(*) FROM s5 GROUP BY lang
      UNION ALL
      SELECT '6_decontam', lang, COUNT(*) FROM s6 GROUP BY lang
      UNION ALL
      SELECT '7_quality_p75', lang, COUNT(*) FROM s7 GROUP BY lang
    ) u
    """


@register("llm_prep_pipeline_v3", oracle=_pipeline_v3_oracle())
def q_llm_prep_pipeline_v3(spark, sf_dir):
    """The full curation FUNNEL (RefinedWeb/Dolma shape): bench
    carve-out → Gopher rules → n-gram repetition → exact dedup →
    decontamination → p75 quality gate, reported as per-(stage, lang)
    survivor counts in one DAG. The oracle replays all seven stages —
    including the percentile threshold over stage-6 survivors — in a
    single SQL statement."""
    return C.llm_prep_pipeline_v3(
        table(spark, sf_dir, "documents"), flagged=_flagged_shared(spark, sf_dir)
    )


@register(
    "quality_stratified_sample",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'),
                                x -> length(x) > 0)) AS token
      FROM documents
    ),
    uni AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    corpus AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM uni),
    scores AS (
      SELECT doc_id,
             ROUND(CAST(SUM(CAST(ROUND(ln((cnt + 1.0) / (total + 1.0 * vocab)), 12)
                                 AS DECIMAL(28,14))) AS DOUBLE)
                   / COUNT(*), 6) AS lm_score
      FROM toks JOIN uni USING (token) CROSS JOIN corpus
      GROUP BY doc_id
    ),
    ranked AS (
      SELECT doc_id, lm_score,
             ROW_NUMBER() OVER (ORDER BY lm_score, doc_id) AS rnk,
             COUNT(*) OVER () AS n_total
      FROM scores
    ),
    b AS (
      SELECT doc_id, lm_score,
             CAST(1 + (4 * (rnk - 1)) // n_total AS INT) AS bucket,
             CAST(ROUND(lm_score * -1000000, 0) AS BIGINT) AS neg_e6
      FROM ranked
    ),
    r AS (
      SELECT bucket, neg_e6,
             [5, 15, 40, 80][bucket] AS rate_pct,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100)
               < [5, 15, 40, 80][bucket] AS kept
      FROM b
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(rate_pct AS BIGINT) AS rate_pct,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(kept AS BIGINT)) AS BIGINT) AS n_sampled,
           -CAST((2 * SUM(neg_e6) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
             / 1000000.0 AS mean_lm
    FROM r GROUP BY bucket, rate_pct
    """,
)
def q_quality_stratified_sample(spark, sf_dir):
    """Quality-stratified sampling report: RANK-based LM-quality
    quartile buckets (bucket = 1 + (4·(rank−1)) div n — pure integer
    arithmetic, no interpolated edges; VERDICT r09 #1) with
    deterministic hash-sample rates 5/15/40/80% — the post-scoring
    mixing move of a training-data pipeline, fully replayed by the
    oracle (rank, buckets, integer-micros means, and every per-doc
    keep decision)."""
    return C.quality_stratified_sample(table(spark, sf_dir, "documents"))


@register(
    "quality_stratified_sample_approx",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'),
                                x -> length(x) > 0)) AS token
      FROM documents
    ),
    uni AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    corpus AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM uni),
    scores AS (
      SELECT doc_id,
             ROUND(CAST(SUM(CAST(ROUND(ln((cnt + 1.0) / (total + 1.0 * vocab)), 12)
                                 AS DECIMAL(28,14))) AS DOUBLE)
                   / COUNT(*), 6) AS lm_score
      FROM toks JOIN uni USING (token) CROSS JOIN corpus
      GROUP BY doc_id
    ),
    ranked AS (
      SELECT lm_score, ROW_NUMBER() OVER (ORDER BY lm_score) AS rnk,
             COUNT(*) OVER () AS n_total
      FROM scores
    ),
    -- percentile_approx's exact regime: order statistic at 1-based
    -- rank ceil(p*n), replayed in integer arithmetic
    edges AS (
      SELECT
        MAX(CASE WHEN rnk = (n_total + 3) // 4 THEN lm_score END) AS e1,
        MAX(CASE WHEN rnk = (n_total + 1) // 2 THEN lm_score END) AS e2,
        MAX(CASE WHEN rnk = (3 * n_total + 3) // 4 THEN lm_score END) AS e3
      FROM ranked
    ),
    b AS (
      SELECT s.doc_id, s.lm_score,
             1 + CAST(s.lm_score > e.e1 AS INT)
               + CAST(s.lm_score > e.e2 AS INT)
               + CAST(s.lm_score > e.e3 AS INT) AS bucket,
             CAST(ROUND(s.lm_score * -1000000, 0) AS BIGINT) AS neg_e6
      FROM scores s CROSS JOIN edges e
    ),
    r AS (
      SELECT bucket, neg_e6,
             [5, 15, 40, 80][bucket] AS rate_pct,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100)
               < [5, 15, 40, 80][bucket] AS kept
      FROM b
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(rate_pct AS BIGINT) AS rate_pct,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(kept AS BIGINT)) AS BIGINT) AS n_sampled,
           -CAST((2 * SUM(neg_e6) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
             / 1000000.0 AS mean_lm
    FROM r GROUP BY bucket, rate_pct
    """,
)
def q_quality_stratified_sample_approx(spark, sf_dir):
    """Production-scale stratified sampling: percentile_approx quartile
    edges (one pass, no rank shuffle — the 10¹²-row path), certified
    EXACTLY in the sketch's exact regime where percentile_approx is
    the order statistic at rank ceil(p·n), replayed by the oracle in
    integer arithmetic (VERDICT r09 #7)."""
    return C.quality_stratified_sample_approx(table(spark, sf_dir, "documents"))


@register(
    "weighted_sample_docs",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             n_chars AS weight,
             ROUND(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       + 1) / 1152921504606846976.0) / n_chars, 9) AS sample_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, weight, sample_key
    FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 50
    """,
)
def q_weighted_sample_docs(spark, sf_dir):
    """Length-weighted 50-doc sample without replacement (A-ES priority
    sampling, deterministic md5-derived priorities) — fixed-size
    importance-weighted subsetting in one TakeOrdered pass; the oracle
    replays every priority."""
    from yamr_spark.operators.curation import weighted_sample

    return weighted_sample(
        table(spark, sf_dir, "documents"), id_col="doc_id",
        weight_col="n_chars", k=50,
    )


@register(
    "token_budget_pack",
    oracle="""
    WITH base AS (
      SELECT lang, doc_id,
             GREATEST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> length(x) > 0)), 1) AS n_tok,
             ('0x' || substr(md5('tbp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS pri
      FROM documents
    ),
    sel AS (
      SELECT lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY pri, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM base
    ),
    tot AS (
      SELECT lang, COUNT(*) AS docs_total,
             CAST(SUM(n_tok) AS BIGINT) AS tokens_total
      FROM base GROUP BY lang
    ),
    kept AS (
      SELECT lang, COUNT(*) AS docs_selected,
             CAST(SUM(n_tok) AS BIGINT) AS tokens_selected
      FROM sel WHERE cum <= 2000 GROUP BY lang
    )
    SELECT t.lang, t.docs_total, t.tokens_total,
           COALESCE(k.docs_selected, 0) AS docs_selected,
           COALESCE(k.tokens_selected, 0) AS tokens_selected,
           CAST(2000 AS BIGINT) AS budget_tokens
    FROM tot t LEFT JOIN kept k USING (lang)
    """,
)
def q_token_budget_pack(spark, sf_dir):
    """Per-language TOKEN-budget packing report: walk each language in a
    deterministic hash-priority order and keep documents while the
    running whitespace-token total stays within a 2,000-token budget —
    data mixing in the unit LLM recipes actually budget (tokens, not
    docs). The oracle replays the selection with one flat window; the
    Spark plan is the two-phase bucket form that never sorts more than
    the single boundary stratum."""
    from yamr_spark.operators.curation import token_budget_pack

    return token_budget_pack(
        table(spark, sf_dir, "documents"), budget_tokens=2000
    )


@register(
    "weighted_sample_per_lang",
    oracle="""
    WITH keyed AS (
      SELECT lang, doc_id,
             n_chars AS weight,
             ROUND(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       + 1) / 1152921504606846976.0) / n_chars, 9) AS sample_key
      FROM documents WHERE n_chars > 0
    )
    SELECT lang, doc_id, weight, sample_key, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY sample_key DESC, doc_id) AS rnk
      FROM keyed
    ) t WHERE rnk <= 10
    """,
)
def q_weighted_sample_per_lang(spark, sf_dir):
    """Ten length-weighted docs PER LANGUAGE without replacement —
    per-group A-ES priorities ranked by a per-lang streaming
    row_number; the quota × importance composition. Oracle replays
    every md5-derived priority and the rank tie-break."""
    from yamr_spark.operators.curation import weighted_sample_per_group

    return weighted_sample_per_group(
        table(spark, sf_dir, "documents"),
        group_col="lang", id_col="doc_id", weight_col="n_chars", k=10,
    )


def _v4_oracle() -> str:
    from yamr_spark.queries_dedup import _BANDS_CTE, _CAND_PAIRS, _JACCARD

    return f"""
    WITH RECURSIVE {_BANDS_CTE}, {_CAND_PAIRS}, {_JACCARD},
    ndup AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN sizes za ON za.doc_id = c.doc_a
      JOIN sizes zb ON zb.doc_id = c.doc_b
      WHERE CAST(i.i AS DOUBLE) / (za.sz + zb.sz - i.i) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM ndup
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM ndup
    ),
    reach(node, label) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
    ),
    comp AS (SELECT node AS doc_id, MIN(label) AS rep FROM reach GROUP BY node),
    wins AS MATERIALIZED (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             unnest(range(len(t) - 8 + 1)) + 1 AS s, t
      FROM toks WHERE len(t) >= 8
    ),
    hashedw AS MATERIALIZED (
      SELECT doc_id, n_tokens, s,
             ('0x' || substr(md5(array_to_string(t[s : s+7], ' ')), 1, 15))::BIGINT
               AS h
      FROM wins
    ),
    duph AS (
      SELECT h FROM (
        SELECT h, COUNT(*) AS nd
        FROM (SELECT DISTINCT h, doc_id FROM hashedw) GROUP BY h
      ) WHERE nd >= 2
    ),
    spandup AS (
      SELECT w.doc_id, w.n_tokens, w.s,
             LAG(w.s) OVER (PARTITION BY w.doc_id ORDER BY w.s) AS prev
      FROM hashedw w JOIN duph USING (h)
    ),
    isl AS (
      SELECT doc_id, n_tokens, s,
             SUM(CASE WHEN prev IS NULL OR s > prev + 8 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM spandup
    ),
    spans AS (
      SELECT doc_id, n_tokens, isl,
             CAST(MAX(s) - MIN(s) + 8 AS BIGINT) AS span_tokens
      FROM isl GROUP BY doc_id, n_tokens, isl
    ),
    spanstats AS (
      SELECT doc_id,
             ROUND(SUM(span_tokens) * 1.0 / n_tokens, 6) AS dup_frac
      FROM spans GROUP BY doc_id, n_tokens
    ),
    keptdocs AS (
      SELECT d.doc_id, d.lang, d.text
      FROM documents d LEFT JOIN spanstats sp USING (doc_id)
      WHERE sp.dup_frac IS NULL OR sp.dup_frac < 0.8
    ),
    assigned AS (
      SELECT k.doc_id, COALESCE(c.rep, k.doc_id) AS rep
      FROM keptdocs k LEFT JOIN comp c USING (doc_id)
    ),
    train AS (
      SELECT k.* FROM keptdocs k JOIN assigned a USING (doc_id)
      WHERE (('0x' || substr(md5('split:' || CAST(a.rep AS VARCHAR)), 1, 15))::BIGINT
             % 10) < 8
    ),
    base AS (
      SELECT lang, doc_id,
             GREATEST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> length(x) > 0)), 1) AS n_tok,
             ('0x' || substr(md5('tbp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS pri
      FROM train
    ),
    sel AS (
      SELECT lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY pri, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM base
    ),
    tot AS (
      SELECT lang, COUNT(*) AS docs_total,
             CAST(SUM(n_tok) AS BIGINT) AS tokens_total
      FROM base GROUP BY lang
    ),
    keptb AS (
      SELECT lang, COUNT(*) AS docs_selected,
             CAST(SUM(n_tok) AS BIGINT) AS tokens_selected
      FROM sel WHERE cum <= 2000 GROUP BY lang
    )
    SELECT t.lang, t.docs_total, t.tokens_total,
           COALESCE(k.docs_selected, 0) AS docs_selected,
           COALESCE(k.tokens_selected, 0) AS tokens_selected,
           CAST(2000 AS BIGINT) AS budget_tokens
    FROM tot t LEFT JOIN keptb k USING (lang)
    """


@register("llm_prep_pipeline_v4", oracle=_v4_oracle())
def q_llm_prep_pipeline_v4(spark, sf_dir):
    """The round-9 curation composition, end-to-end: (1) drop documents
    that are >= 80% duplicated SPANS (alignment-free exact-substring
    dedup, span_dup_stats); (2) assign leakage-safe splits by near-dup
    COMPONENT over the shared banded pair table — near-twins can never
    straddle train/eval; (3) token-budget-pack the TRAIN split per
    language (two-phase boundary-stratum plan). Returns the per-lang
    packing report for the cleaned, leakage-safe train corpus — the
    pipeline a pretraining data team actually ships, composed from the
    engine's own certified primitives."""
    from yamr_spark.operators.curation import (
        leakage_safe_split_assign,
        span_dup_stats,
        token_budget_pack,
    )
    from yamr_spark.queries_dedup import _near_dup_pairs_shared

    from yamr_spark.materialize import materialize

    docs = table(spark, sf_dir, "documents")
    # MATERIALIZED: ``kept`` is referenced twice below (the split-assign
    # input and the train semi-join), so an un-materialized high_dup
    # re-runs the whole span_dup_stats funnel per reference (the r14
    # plan audit counted 106 Exchanges in this one query). The frame is
    # tiny (doc_ids of ≥80%-duplicated docs), the scale-safe unit.
    high_dup = materialize(
        span_dup_stats(docs)
        .where(F.col("dup_frac") >= 0.8)
        .select("doc_id")
    )
    kept = docs.join(high_dup, "doc_id", "left_anti")
    assign = leakage_safe_split_assign(
        kept, _near_dup_pairs_shared(spark, sf_dir)
    )
    train = kept.join(
        assign.where(F.col("split") == "train").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return token_budget_pack(train, budget_tokens=2000)


def _v5_oracle() -> str:
    """v5 replay: winnow near-dup drop (keep-lowest-id), CCNet tail
    gate with the LM model REBUILT over dedup survivors, sqrt-weight
    epoch allocation over gate survivors — each stage the verbatim
    arithmetic of its certified primitive."""
    from yamr_spark.queries_text import _WIN_FP_CTE

    return f"""
    WITH {_WIN_FP_CTE},
    wdfp AS (SELECT DISTINCT doc_id, fp FROM wfp),
    wrare AS (
      SELECT fp FROM (SELECT fp, COUNT(*) AS c FROM wdfp GROUP BY fp)
      WHERE c <= 50
    ),
    wrfp AS (SELECT wdfp.doc_id, wdfp.fp FROM wdfp JOIN wrare USING (fp)),
    wsizes AS (SELECT doc_id, COUNT(*) AS nf FROM wrfp GROUP BY doc_id),
    wpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fp
      FROM wrfp a JOIN wrfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    drops AS (
      SELECT DISTINCT p.doc_b AS doc_id
      FROM wpairs p
      JOIN wsizes za ON za.doc_id = p.doc_a
      JOIN wsizes zb ON zb.doc_id = p.doc_b
      WHERE p.shared_fp >= 4
        AND CAST(p.shared_fp AS DOUBLE) / least(za.nf, zb.nf) >= 0.25
    ),
    s1 AS MATERIALIZED (
      SELECT d.* FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
    ),
    toks5 AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}_]+'),
                                x -> length(x) > 0)) AS token
      FROM s1
    ),
    uni5 AS (SELECT token, COUNT(*) AS cnt FROM toks5 GROUP BY token),
    corpus5 AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM uni5),
    lm5 AS (
      SELECT doc_id,
           ROUND(CAST(SUM(CAST(ROUND(ln((cnt + 1.0) / (total + 1.0 * vocab)), 12)
                               AS DECIMAL(28,14))) AS DOUBLE)
                 / COUNT(*), 6) AS lm_score,
           COUNT(*) AS n_tokens
      FROM toks5 JOIN uni5 USING (token) CROSS JOIN corpus5
      GROUP BY doc_id
    ),
    rk5 AS (
      SELECT l.doc_id, l.n_tokens,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY l.lm_score NULLS FIRST,
                                         l.doc_id NULLS FIRST) AS r,
             COUNT(*) OVER (PARTITION BY d.lang) AS nl
      FROM lm5 l JOIN s1 d USING (doc_id)
    ),
    keep5 AS (SELECT doc_id, n_tokens FROM rk5 WHERE ((r - 1) * 3) // nl >= 1),
    s2 AS MATERIALIZED (
      SELECT d.doc_id, d.source, k.n_tokens
      FROM s1 d JOIN keep5 k USING (doc_id)
    ),
    per5 AS (
      SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS dom_tokens
      FROM s2 GROUP BY source
    ),
    w5 AS (
      SELECT *, CAST(ROUND(sqrt(dom_tokens), 12) AS DECIMAL(38,12)) AS sq
      FROM per5
    ),
    tot5 AS (
      SELECT SUM(sq) AS sqsum, CAST(SUM(dom_tokens) AS BIGINT) AS tok_total
      FROM w5
    ),
    alloc5 AS (
      SELECT domain,
             CAST(FLOOR(dom_tokens * LEAST(4.0, 2.0 * CAST(tok_total AS DOUBLE)
                                * (CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE))
                                / dom_tokens)) AS BIGINT) AS alloc_tokens
      FROM w5 CROSS JOIN tot5
    ),
    ntok_all AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}_]+'),
                             x -> length(x) > 0)) AS n_tok
      FROM documents
    ),
    ntok_s1 AS (SELECT n.doc_id, n.n_tok FROM ntok_all n JOIN s1 USING (doc_id))
    SELECT '00_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS n_tokens
    FROM ntok_all
    UNION ALL
    SELECT '01_winnow_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_tok), 0) AS BIGINT)
    FROM ntok_s1
    UNION ALL
    SELECT '02_lm_gate', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
    FROM s2
    UNION ALL
    SELECT '03_alloc', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2),
           CAST(COALESCE(SUM(alloc_tokens), 0) AS BIGINT)
    FROM alloc5
    """


@register("llm_prep_pipeline_v5", oracle=_v5_oracle())
def q_llm_prep_pipeline_v5(spark, sf_dir):
    """The r11-continuation composition, end-to-end: (1) winnowing
    near-dup dedup (drop the higher id of every verified pair —
    keep-lowest-id); (2) CCNet tail gate with the unigram LM model
    REBUILT over the dedup survivors (model order matters: scoring
    against a model contaminated by the duplicates it just removed
    would over-rank boilerplate); (3) DoReMi-lite epoch allocation
    over the gated corpus. Returns the funnel report (stage, n_docs,
    n_tokens) — 03_alloc's n_tokens is the post-epoch effective
    training budget. Every stage is the verbatim arithmetic of its
    certified primitive (winnow_near_dup / lm_quality_buckets /
    domain_epoch_allocation); zero-token documents carry no LM score
    and are dropped BY the gate, which the oracle replays."""
    from yamr_spark.materialize import materialize
    from yamr_spark.operators import text as T
    from yamr_spark.queries_text import _winnow_fps_shared

    docs = table(spark, sf_dir, "documents")
    fps = _winnow_fps_shared(spark, sf_dir).select("doc_id", "fp").distinct()
    pairs = T.winnow_near_dup(docs, fps=fps)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    s1 = materialize(docs.join(drops, "doc_id", "left_anti"))
    buckets = T.lm_quality_bucket_per_doc(s1)
    s2 = materialize(
        s1.join(
            buckets.where(F.col("bucket") != "tail").select(
                "doc_id", "n_tokens"
            ),
            "doc_id",
        )
    )
    alloc = C.domain_epoch_allocation(s2)

    def _stage(name, df, tok_col):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(tok_col), F.lit(0)).cast("long").alias("n_tokens"),
        )

    ntok = C._ntok_col()
    raw = _stage("00_raw", docs.select(ntok.alias("n_tok")), "n_tok")
    st1 = _stage("01_winnow_dedup", s1.select(ntok.alias("n_tok")), "n_tok")
    st2 = _stage("02_lm_gate", s2.select("n_tokens"), "n_tokens")
    n_s2 = s2.select(F.count("*").alias("c"))
    st3 = (
        alloc.agg(
            F.coalesce(F.sum("alloc_tokens"), F.lit(0))
            .cast("long")
            .alias("n_tokens")
        )
        .join(F.broadcast(n_s2))
        .select(
            F.lit("03_alloc").alias("stage"),
            F.col("c").cast("long").alias("n_docs"),
            "n_tokens",
        )
    )
    return raw.unionByName(st1).unionByName(st2).unionByName(st3)


# Exact substring dedup (Lee et al., arXiv:2107.06499 — the suffix-array
# class): rolling 8-token windows, duplication VERIFIED on the window
# text (not its hash), keep-lowest-doc ownership, maximal-span merge.
# The oracle groups by window text directly; the Spark plan reaches the
# same set through a hash prefilter (recall-complete: equal text =>
# equal hash) plus a text-grouped verify, so semantics are identical
# while only actually-duplicated text ever shuffles as strings.
_SUBSTR_SPANS_CTE = (
    _TOKS_CTE
    + """,
    spos AS (
      SELECT doc_id, t, unnest(range(len(t) - 8 + 1)) + 1 AS s
      FROM toks WHERE len(t) >= 8
    ),
    swt AS MATERIALIZED (
      SELECT doc_id, CAST(s AS BIGINT) AS s,
             array_to_string(t[s : s + 7], ' ') AS wt
      FROM spos
    ),
    sown AS (
      SELECT wt, MIN(doc_id) AS owner
      FROM (SELECT DISTINCT doc_id, wt FROM swt)
      GROUP BY wt HAVING COUNT(*) >= 2
    ),
    sdrp AS (
      SELECT DISTINCT w.doc_id, w.s
      FROM swt w JOIN sown o USING (wt)
      WHERE w.doc_id <> o.owner
    ),
    slag AS (
      SELECT doc_id, s,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
      FROM sdrp
    ),
    sisl AS (
      SELECT doc_id, s,
             SUM(CASE WHEN prev IS NULL OR s > prev + 8 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM slag
    ),
    sspans AS (
      SELECT doc_id,
             CAST(MIN(s) AS BIGINT) AS span_start,
             CAST(MAX(s) + 7 AS BIGINT) AS span_end,
             CAST(MAX(s) - MIN(s) + 8 AS BIGINT) AS span_tokens
      FROM sisl GROUP BY doc_id, isl
    )"""
)


@register(
    "substring_dedup_spans",
    oracle=f"""
    WITH {_SUBSTR_SPANS_CTE}
    SELECT doc_id, span_start, span_end, span_tokens FROM sspans
    """,
)
def q_substring_dedup_spans(spark, sf_dir):
    """Exact substring dedup, span report: the maximal token spans each
    document loses under the keep-lowest-doc rule, with duplication
    verified on window TEXT — completes the dedup family past the
    hash-trusting span_dup_stats stand-in (zero false positives at any
    corpus size)."""
    return C.substring_dedup_spans(table(spark, sf_dir, "documents"))


@register(
    "substring_dedup_docs",
    oracle=f"""
    WITH {_SUBSTR_SPANS_CTE},
    sper AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_dropped_spans,
             CAST(SUM(span_tokens) AS BIGINT) AS dropped_tokens
      FROM sspans GROUP BY doc_id
    ),
    scnt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
    SELECT c.doc_id, c.n_tokens,
           CAST(COALESCE(p.n_dropped_spans, 0) AS BIGINT) AS n_dropped_spans,
           CAST(COALESCE(p.dropped_tokens, 0) AS BIGINT) AS dropped_tokens,
           CAST(c.n_tokens - COALESCE(p.dropped_tokens, 0) AS BIGINT)
             AS kept_tokens,
           CASE WHEN c.n_tokens > 0
                THEN CAST(ROUND((c.n_tokens - COALESCE(p.dropped_tokens, 0))
                                * 1.0 / c.n_tokens, 6) AS DOUBLE)
                ELSE CAST(1.0 AS DOUBLE) END AS kept_frac
    FROM scnt c LEFT JOIN sper p USING (doc_id)
    """,
)
def q_substring_dedup_docs(spark, sf_dir):
    """Exact substring dedup, per-document ledger: token counts,
    dropped spans/tokens under the keep-lowest-doc rule, and the kept
    fraction — the corpus-shrinkage number a dedup pipeline reports."""
    return C.substring_dedup_docs(table(spark, sf_dir, "documents"))


@register(
    "dedup_ladder",
    oracle=f"""
    WITH {_TOKS_CTE},
    base AS MATERIALIZED (
      SELECT d.doc_id, d.text, CAST(len(k.t) AS BIGINT) AS n_tok
      FROM documents d JOIN toks k USING (doc_id)
    ),
    e1 AS (SELECT MIN(doc_id) AS doc_id FROM base GROUP BY sha256(text)),
    s1 AS MATERIALIZED (SELECT base.* FROM base JOIN e1 USING (doc_id)),
    n1 AS (
      SELECT MIN(doc_id) AS doc_id FROM (
        SELECT doc_id,
               sha256(lower(regexp_replace(trim(text),
                 '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS nh
        FROM s1
      ) GROUP BY nh
    ),
    s2 AS MATERIALIZED (SELECT s1.* FROM s1 JOIN n1 USING (doc_id)),
    stoks AS (SELECT t.doc_id, t.t FROM toks t JOIN s2 USING (doc_id)),
    lpos AS (
      SELECT doc_id, t, unnest(range(len(t) - 8 + 1)) + 1 AS s
      FROM stoks WHERE len(t) >= 8
    ),
    lwt AS MATERIALIZED (
      SELECT doc_id, CAST(s AS BIGINT) AS s,
             array_to_string(t[s : s + 7], ' ') AS wt
      FROM lpos
    ),
    lown AS (
      SELECT wt, MIN(doc_id) AS owner
      FROM (SELECT DISTINCT doc_id, wt FROM lwt)
      GROUP BY wt HAVING COUNT(*) >= 2
    ),
    ldrp AS (
      SELECT DISTINCT w.doc_id, w.s
      FROM lwt w JOIN lown o USING (wt)
      WHERE w.doc_id <> o.owner
    ),
    llag AS (
      SELECT doc_id, s,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
      FROM ldrp
    ),
    lisl AS (
      SELECT doc_id, s,
             SUM(CASE WHEN prev IS NULL OR s > prev + 8 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM llag
    ),
    lspans AS (
      SELECT doc_id, CAST(MAX(s) - MIN(s) + 8 AS BIGINT) AS span_tokens
      FROM lisl GROUP BY doc_id, isl
    ),
    ldrop AS (
      SELECT doc_id, SUM(span_tokens) AS dropped FROM lspans GROUP BY doc_id
    ),
    lkept AS (
      SELECT s2.doc_id, s2.n_tok - COALESCE(l.dropped, 0) AS kept
      FROM s2 LEFT JOIN ldrop l USING (doc_id)
    )
    SELECT stage, n_docs, n_tokens FROM (
      SELECT '00_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM base
      UNION ALL
      SELECT '01_exact', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(n_tok) AS BIGINT) FROM s1
      UNION ALL
      SELECT '02_normalized', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(n_tok) AS BIGINT) FROM s2
      UNION ALL
      SELECT '03_substring', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(kept) AS BIGINT) FROM lkept
    ) u
    """,
)
def q_dedup_ladder(spark, sf_dir):
    """The three-granularity dedup ladder as one certified funnel:
    byte-exact (keep lowest doc) → normalization-aware (case/
    whitespace variants) → span-level exact substring dedup (documents
    stay, duplicated spans' tokens leave). Each rung removes exactly
    what the previous cannot see; the report is (stage, n_docs,
    n_tokens) per rung — the corpus-shrinkage ledger a dedup pipeline
    publishes."""
    return C.dedup_ladder(table(spark, sf_dir, "documents"))


@register(
    "substring_dedup_incremental",
    oracle=f"""
    WITH {_TOKS_CTE},
    ntoks AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
    itoks AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
    npos AS (
      SELECT doc_id, t, unnest(range(len(t) - 8 + 1)) + 1 AS s
      FROM ntoks WHERE len(t) >= 8
    ),
    nwt AS MATERIALIZED (
      SELECT doc_id, CAST(s AS BIGINT) AS s,
             array_to_string(t[s : s + 7], ' ') AS wt
      FROM npos
    ),
    ipos AS (
      SELECT doc_id, t, unnest(range(len(t) - 8 + 1)) + 1 AS s
      FROM itoks WHERE len(t) >= 8
    ),
    iwt AS MATERIALIZED (
      SELECT DISTINCT array_to_string(t[s : s + 7], ' ') AS wt FROM ipos
    ),
    idrp AS (
      SELECT DISTINCT n.doc_id, n.s FROM nwt n JOIN iwt USING (wt)
    ),
    ilag AS (
      SELECT doc_id, s,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
      FROM idrp
    ),
    iisl AS (
      SELECT doc_id, s,
             SUM(CASE WHEN prev IS NULL OR s > prev + 8 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM ilag
    ),
    ispans AS (
      SELECT doc_id, CAST(MAX(s) - MIN(s) + 8 AS BIGINT) AS span_tokens
      FROM iisl GROUP BY doc_id, isl
    ),
    iper AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_dropped_spans,
             CAST(SUM(span_tokens) AS BIGINT) AS dropped_tokens
      FROM ispans GROUP BY doc_id
    ),
    icnt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM ntoks)
    SELECT c.doc_id, c.n_tokens,
           CAST(COALESCE(p.n_dropped_spans, 0) AS BIGINT) AS n_dropped_spans,
           CAST(COALESCE(p.dropped_tokens, 0) AS BIGINT) AS dropped_tokens,
           CAST(c.n_tokens - COALESCE(p.dropped_tokens, 0) AS BIGINT)
             AS kept_tokens,
           CASE WHEN c.n_tokens > 0
                THEN CAST(ROUND((c.n_tokens - COALESCE(p.dropped_tokens, 0))
                                * 1.0 / c.n_tokens, 6) AS DOUBLE)
                ELSE CAST(1.0 AS DOUBLE) END AS kept_frac
    FROM icnt c LEFT JOIN iper p USING (doc_id)
    """,
)
def q_substring_dedup_incremental(spark, sf_dir):
    """Incremental exact substring dedup, daily-ingest shape: even
    doc_ids play the standing corpus (it owns by definition), odd ids
    the new batch; per-new-doc span ledger. Completes the incremental
    trio next to incremental_dedup (byte-exact) and winnow_incremental
    (fingerprint) — now every dedup granularity has a standing-index
    form."""
    docs = table(spark, sf_dir, "documents")
    return C.substring_dedup_incremental(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
    )


@register(
    "substring_dedup_chars",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ),
    cpos AS (
      SELECT doc_id, text, unnest(range(length(text) - 40 + 1)) + 1 AS s
      FROM base WHERE n_chars >= 40
    ),
    cwt AS MATERIALIZED (
      SELECT doc_id, CAST(s AS BIGINT) AS s,
             substr(text, CAST(s AS INT), 40) AS wt
      FROM cpos
    ),
    cown AS (
      SELECT wt, MIN(doc_id) AS owner
      FROM (SELECT DISTINCT doc_id, wt FROM cwt)
      GROUP BY wt HAVING COUNT(*) >= 2
    ),
    cdrp AS (
      SELECT DISTINCT w.doc_id, w.s
      FROM cwt w JOIN cown o USING (wt)
      WHERE w.doc_id <> o.owner
    ),
    clag AS (
      SELECT doc_id, s,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
      FROM cdrp
    ),
    cisl AS (
      SELECT doc_id, s,
             SUM(CASE WHEN prev IS NULL OR s > prev + 40 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM clag
    ),
    cspans AS (
      SELECT doc_id, CAST(MAX(s) - MIN(s) + 40 AS BIGINT) AS span_chars
      FROM cisl GROUP BY doc_id, isl
    ),
    cper AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_dropped_spans,
             CAST(SUM(span_chars) AS BIGINT) AS dropped_chars
      FROM cspans GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_chars,
           CAST(COALESCE(p.n_dropped_spans, 0) AS BIGINT) AS n_dropped_spans,
           CAST(COALESCE(p.dropped_chars, 0) AS BIGINT) AS dropped_chars,
           CAST(b.n_chars - COALESCE(p.dropped_chars, 0) AS BIGINT)
             AS kept_chars,
           CASE WHEN b.n_chars > 0
                THEN CAST(ROUND((b.n_chars - COALESCE(p.dropped_chars, 0))
                                * 1.0 / b.n_chars, 6) AS DOUBLE)
                ELSE CAST(1.0 AS DOUBLE) END AS kept_frac
    FROM base b LEFT JOIN cper p USING (doc_id)
    """,
)
def q_substring_dedup_chars(spark, sf_dir):
    """Exact substring dedup at CHARACTER granularity (40-char windows,
    every offset) — the literal Lee et al. unit next to the word-window
    form: catches duplicates that straddle word boundaries differently
    or are shorter than width words. Same verified two-phase plan;
    per-doc character-shrinkage ledger over all documents."""
    return C.substring_dedup_chars(table(spark, sf_dir, "documents"))


# Oracle replay of the minimizer-anchored form, built from the
# operator's own constants so the SQL selection rule cannot drift from
# the Spark one (the winnow-oracle discipline: composite key
# md5hex || '#' || lpad(POS_MAX - pos), plain min() = rightmost-min).
_MIN_K = C.MINIMIZER_K
_MIN_W = C.MINIMIZER_W
_MIN_PM = C._MINIMIZER_POS_MAX


_MINIMIZED_ORACLE = f"""
    WITH mbase AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ),
    mpos AS (
      SELECT doc_id, text,
             CAST(greatest(length(text) - {_MIN_K - 1}, 1) AS BIGINT)
               AS n_grams,
             unnest(range(1, greatest(length(text) - {_MIN_K - 1}, 1) + 1))
               AS i
      FROM mbase WHERE n_chars >= {_MIN_K}
    ),
    mkeys AS (
      SELECT doc_id, n_grams, i AS pos,
             md5(substring(text, CAST(i AS INT), {_MIN_K})) || '#' ||
               lpad(CAST({_MIN_PM} - i AS VARCHAR), 12, '0') AS key
      FROM mpos
    ),
    msel AS (
      SELECT doc_id, n_grams, pos,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {_MIN_W - 1}
                            FOLLOWING) AS sk
      FROM mkeys
    ),
    manch AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             {_MIN_PM} - CAST(substring(sk, 34, 12) AS BIGINT) AS s
      FROM msel
      WHERE pos <= greatest(n_grams - {_MIN_W - 1}, 1)
    ),
    mtxt AS MATERIALIZED (
      SELECT a.doc_id, a.s,
             substring(b.text, CAST(a.s AS INT), {_MIN_K}) AS wt
      FROM manch a JOIN mbase b USING (doc_id)
    ),
    mown AS (
      SELECT wt, MIN(doc_id) AS owner
      FROM (SELECT DISTINCT doc_id, wt FROM mtxt)
      GROUP BY wt HAVING COUNT(*) >= 2
    ),
    mflag AS (
      SELECT DISTINCT t.doc_id, t.s
      FROM mtxt t JOIN mown o USING (wt)
      WHERE t.doc_id <> o.owner
    ),
    mlag AS (
      SELECT doc_id, s,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
      FROM mflag
    ),
    misl AS (
      SELECT doc_id, s,
             SUM(CASE WHEN prev IS NULL OR s > prev + {_MIN_K}
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM mlag
    ),
    mspans AS (
      SELECT doc_id,
             CAST(MAX(s) - MIN(s) + {_MIN_K} AS BIGINT) AS span_chars
      FROM misl GROUP BY doc_id, isl
    ),
    mper AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_flagged_spans,
             CAST(SUM(span_chars) AS BIGINT) AS flagged_chars
      FROM mspans GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_chars,
           CAST(COALESCE(p.n_flagged_spans, 0) AS BIGINT) AS n_flagged_spans,
           CAST(COALESCE(p.flagged_chars, 0) AS BIGINT) AS flagged_chars,
           CASE WHEN b.n_chars > 0
                THEN CAST(ROUND(COALESCE(p.flagged_chars, 0)
                                * 1.0 / b.n_chars, 6) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS flagged_frac
    FROM mbase b LEFT JOIN mper p USING (doc_id)
    """


@register("substring_dedup_minimized", oracle=_MINIMIZED_ORACLE)
def q_substring_dedup_minimized(spark, sf_dir):
    """Minimizer-anchored char substring dedup (VERDICT r12 #4): the
    scale path beside the dense 40-char form — winnowing selection
    (k=16, w=25) keeps the >= 40-char duplicate guarantee while only
    anchor k-grams (~2/(w+1) of offsets) reach the shuffle; selection
    itself is one map-side higher-order projection (zero shuffle).
    Anchors verify by exact text; keep-lowest-doc ownership; flagged
    anchors merge into maximal char spans; per-doc ledger over ALL
    documents."""
    return C.substring_dedup_minimized(table(spark, sf_dir, "documents"))


@register("substring_dedup_minimized_chunked", oracle=_MINIMIZED_ORACLE)
def q_substring_dedup_minimized_chunked(spark, sf_dir):
    """The minimized dedup's OUTLIER-DOCUMENT path under driver
    certification (VERDICT r13 #5 follow-through): chunk=600 drops the
    window-block threshold below most corpus documents, so the
    window-block selection (global positions baked into per-block keys,
    cross-block duplicate drop) runs against the SAME closed-form
    oracle as the dense projection — the selected anchor set is
    chunk-invariant by construction, and this query makes the driver
    prove it per round rather than trusting the unit test. Documents
    at or under the threshold still take the dense path, so one run
    certifies both paths and their union."""
    return C.substring_dedup_minimized(
        table(spark, sf_dir, "documents"), chunk=600
    )


def _min_sel_ctes(p: str, flt: str) -> str:
    """Winnowing-selection + anchor-text CTE block for the minimized
    oracle, prefixed with ``p`` over documents filtered by ``flt`` —
    the same composite-key min replay as the full-corpus form."""
    return f"""
    {p}pos AS (
      SELECT doc_id, text,
             CAST(greatest(length(text) - {_MIN_K - 1}, 1) AS BIGINT)
               AS n_grams,
             unnest(range(1, greatest(length(text) - {_MIN_K - 1}, 1) + 1))
               AS i
      FROM mibase WHERE n_chars >= {_MIN_K} AND ({flt})
    ),
    {p}keys AS (
      SELECT doc_id, n_grams, i AS pos,
             md5(substring(text, CAST(i AS INT), {_MIN_K})) || '#' ||
               lpad(CAST({_MIN_PM} - i AS VARCHAR), 12, '0') AS key
      FROM {p}pos
    ),
    {p}sel AS (
      SELECT doc_id, n_grams, pos,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {_MIN_W - 1}
                            FOLLOWING) AS sk
      FROM {p}keys
    ),
    {p}anch AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             {_MIN_PM} - CAST(substring(sk, 34, 12) AS BIGINT) AS s
      FROM {p}sel
      WHERE pos <= greatest(n_grams - {_MIN_W - 1}, 1)
    ),
    {p}txt AS MATERIALIZED (
      SELECT a.doc_id, a.s,
             substring(b.text, CAST(a.s AS INT), {_MIN_K}) AS wt
      FROM {p}anch a JOIN mibase b USING (doc_id)
    )"""


@register(
    "substring_dedup_minimized_incremental",
    oracle=f"""
    WITH mibase AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    ),
    {_min_sel_ctes("ix", "doc_id % 2 = 0")},
    {_min_sel_ctes("nw", "doc_id % 2 = 1")},
    iwts AS (SELECT DISTINCT wt FROM ixtxt),
    nflag AS (
      SELECT DISTINCT t.doc_id, t.s
      FROM nwtxt t JOIN iwts USING (wt)
    ),
    nlag AS (
      SELECT doc_id, s,
             LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
      FROM nflag
    ),
    nisl AS (
      SELECT doc_id, s,
             SUM(CASE WHEN prev IS NULL OR s > prev + {_MIN_K}
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM nlag
    ),
    nspans AS (
      SELECT doc_id,
             CAST(MAX(s) - MIN(s) + {_MIN_K} AS BIGINT) AS span_chars
      FROM nisl GROUP BY doc_id, isl
    ),
    nper AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_flagged_spans,
             CAST(SUM(span_chars) AS BIGINT) AS flagged_chars
      FROM nspans GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_chars,
           CAST(COALESCE(p.n_flagged_spans, 0) AS BIGINT) AS n_flagged_spans,
           CAST(COALESCE(p.flagged_chars, 0) AS BIGINT) AS flagged_chars,
           CASE WHEN b.n_chars > 0
                THEN CAST(ROUND(COALESCE(p.flagged_chars, 0)
                                * 1.0 / b.n_chars, 6) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS flagged_frac
    FROM mibase b LEFT JOIN nper p USING (doc_id)
    WHERE b.doc_id % 2 = 1
    """,
)
def q_substring_dedup_minimized_incremental(spark, sf_dir):
    """Incremental minimizer-anchored substring dedup: odd doc_ids
    arrive as the new batch against the even-doc standing corpus (the
    substring_dedup_incremental fixture). The standing side persists
    one (hash, text) row per distinct selected anchor — ~12x smaller
    than the dense window index; the batch's map-side-selected anchors
    semi-join it on 8-byte hashes, text verifies exactly. Per-new-doc
    flagged-span ledger."""
    docs = table(spark, sf_dir, "documents")
    return C.substring_dedup_minimized_incremental(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
    )
