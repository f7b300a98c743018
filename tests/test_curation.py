"""Unit tests for curation operators: decontamination, chunk-dup spans,
hash split, quota sampling, novelty. Edge semantics the sf oracles can't
isolate: threshold boundaries, short docs, determinism, identical docs.
"""

from __future__ import annotations

from yamr_spark.operators import curation as C
from yamr_spark.tables import table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_threshold_boundary(spark):
    # doc 0 is the benchmark (0 % 97 == 0). doc 1 shares exactly three
    # distinct 5-grams (>= min_overlap=3); doc 2 shares two (below); doc
    # 3 shares none.
    docs = _docs(
        spark,
        [
            (0, "a b c d e f g"),  # grams: abcde bcdef cdefg
            (1, "a b c d e f g h"),  # shares all 3 bench grams
            (2, "a b c d e f"),  # shares abcde bcdef only
            (3, "x y z w v u t s"),
        ],
    )
    out = {r["doc_id"]: r["n_overlap"] for r in C.benchmark_decontaminate(docs).collect()}
    assert out == {1: 3}


def test_chunk_dup_stats_short_docs_absent(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h i j k l m n o p"),  # 2 chunks
            (2, "a b c d e f g h"),  # 1 chunk, shared with doc 1's first
            (3, "too short"),  # < 8 tokens: absent
        ],
    )
    rows = {r["doc_id"]: r for r in C.chunk_dup_stats(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_shared"] == 1
    assert rows[2]["n_chunks"] == 1 and rows[2]["n_shared"] == 1
    assert abs(rows[1]["shared_frac"] - 0.5) < 1e-9


def test_hash_split_deterministic_and_complete(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = sorted(C.hash_split(docs).collect())
    b = sorted(C.hash_split(docs).collect())
    assert a == b  # content-addressed, not rand()
    assert {r["split"] for r in a} <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in a) == docs.count()


def test_quota_sample_caps_per_lang(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = C.quota_sample(docs, per_lang=5).collect()
    per_lang: dict[str, list] = {}
    for r in out:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in per_lang.items():
        assert len(rows) <= 5
        assert sorted(r["rnk"] for r in rows) == list(range(1, len(rows) + 1))
        # ranked by n_chars desc
        chars = [r["n_chars"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert chars == sorted(chars, reverse=True)


def test_ngram_novelty_identical_docs(spark):
    docs = _docs(spark, [(1, "a b c d e"), (2, "a b c d e"), (3, "q r s t u")])
    out = {r["doc_id"]: r for r in C.ngram_novelty(docs).collect()}
    assert out[1]["novelty"] == 1.0  # first appearance of every shingle
    assert out[2]["novelty"] == 0.0  # exact copy, zero novel shingles
    assert out[3]["novelty"] == 1.0
    assert out[2]["n_shingles"] == 3 and out[2]["n_novel"] == 0


def test_pack_sequences_conserves_tokens_and_bins_are_contiguous(spark):
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 7 + 1), "en") for i in range(200)],
        "doc_id long, text string, lang string",
    )
    packed = C.pack_sequences(docs, seq_len=20, n_buckets=4).collect()
    # token conservation: every token lands in exactly one bin
    total_tokens = sum(r.bin_tokens for r in packed)
    expect = sum(i % 7 + 1 for i in range(200))
    assert total_tokens == expect
    assert sum(r.n_docs for r in packed) == 200
    # bins within a bucket are contiguous from 0 (a doc STARTS in its
    # bin, so a long doc can spill past the boundary but the next bin
    # index is still reached by the running sum)
    by_bucket = {}
    for r in packed:
        by_bucket.setdefault(r.bucket, []).append(r.bin_id)
    for bucket, bins in by_bucket.items():
        bins = sorted(bins)
        assert bins[0] == 0, f"bucket {bucket} missing bin 0"
        assert bins == list(range(len(bins))), f"bucket {bucket}: {bins}"


def test_pack_sequences_single_bucket_boundary(spark):
    # 5 docs x 4 tokens, one bucket, seq_len=10: starts at 0,4,8,12,16
    # -> bins 0,0,0,1,1 regardless of the hash order (counts are equal).
    docs = spark.createDataFrame(
        [(i, "a b c d", "en") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    packed = {r.bin_id: r for r in C.pack_sequences(docs, seq_len=10, n_buckets=1).collect()}
    assert packed[0].n_docs == 3 and packed[0].bin_tokens == 12
    assert packed[1].n_docs == 2 and packed[1].bin_tokens == 8


def test_domain_mix_full_budget_keeps_everything(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 10, ["en", "de"][i % 2]) for i in range(100)],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in C.domain_mix_sample(
        docs, targets={"en": 0.5, "de": 0.5}, budget_tokens=10**9
    ).collect()}
    for lang in ("en", "de"):
        r = out[lang]
        assert r.rate_ppm == 1000000
        assert r.n_sampled == r.lang_docs == 50
        assert r.sampled_tokens == r.lang_tokens == 500


def test_domain_mix_zero_target_drops_lang(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 10, ["en", "xx"][i % 2]) for i in range(40)],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in C.domain_mix_sample(
        docs, targets={"en": 1.0}, budget_tokens=100
    ).collect()}
    assert out["xx"].rate_ppm == 0 and out["xx"].n_sampled == 0
    # en: rate = 100/200 tokens -> 500000 ppm; sampled subset is proper
    assert out["en"].rate_ppm == 500000
    assert 0 < out["en"].n_sampled < out["en"].lang_docs


def test_shuffled_corpus_is_reproducible_permutation(spark, sf_dir, tmp_path):
    """write_shuffled_corpus: every doc appears exactly once across
    shards, files within a shard are key-sorted, and a different salt
    yields a different permutation while the same salt is bit-stable."""
    from yamr_spark.operators.curation import global_shuffle, write_shuffled_corpus
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "shuffled")
    write_shuffled_corpus(docs, out, shards=4)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()

    import pandas as pd

    for shard in range(4):
        pdf = (
            spark.read.parquet(f"{out}/shard={shard}")
            .select("shuffle_key")
            .toPandas()
        )
        assert pdf.shuffle_key.is_monotonic_increasing or len(pdf) <= 1

    k0 = {r.doc_id: r.shuffle_key for r in global_shuffle(docs, salt="epoch0").collect()}
    k0b = {r.doc_id: r.shuffle_key for r in global_shuffle(docs, salt="epoch0").collect()}
    k1 = {r.doc_id: r.shuffle_key for r in global_shuffle(docs, salt="epoch1").collect()}
    assert k0 == k0b
    assert k0 != k1


def test_chunk_udtf_matches_column_path(spark, sf_dir):
    """The Python-UDTF chunker (the extension hook for model-backed
    tokenizers) must produce exactly the JVM Column path's chunks —
    same windows, same order, same token counts."""
    from pyspark.sql import functions as F

    from yamr_spark.functions import hash60
    from yamr_spark.operators.curation import ChunkDocUDTF, chunk_documents
    from yamr_spark.registry import _ship_package
    from yamr_spark.tables import table

    assert ChunkDocUDTF is not None
    _ship_package(spark)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("chunk_udtf_docs")
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
        FROM chunk_udtf_docs d, LATERAL chunk_doc(d.text, 32, 24) c
        """
    ).select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        hash60(F.col("chunk_text")).alias("chunk_hash"),
    )
    fast = chunk_documents(docs)
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in fast.collect()}
    assert a == b and len(a) > 0


def test_pii_redact_patterns_and_counts(spark):
    """All three PII patterns redact and count; clean text is untouched."""
    from yamr_spark.operators.curation import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org or 192.168.0.1 call +1-555-0199 ok"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert rows[1].n_emails == 1 and rows[1].n_ips == 1 and rows[1].n_phones == 1
    assert "<EMAIL>" in rows[1].text and "<IP>" in rows[1].text and "<PHONE>" in rows[1].text
    assert "@" not in rows[1].text and "192.168" not in rows[1].text
    assert rows[2].text == "nothing sensitive here"
    assert rows[2].n_emails == rows[2].n_ips == rows[2].n_phones == 0


def test_temperature_sample_quota_properties(spark, sf_dir):
    """Quotas sum to ~target, each group's draw is min(quota, group
    size), and the draw is deterministic across invocations."""
    from yamr_spark.operators.curation import temperature_sample
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    out = temperature_sample(docs, target_total=100).collect()
    assert abs(sum(r.quota for r in out) - 100) <= len(out)  # rounding slack
    for r in out:
        assert r.n_sampled == min(r.quota, r.n_docs)
    again = temperature_sample(docs, target_total=100).collect()
    assert {(r.lang, r.sampled_id_sum) for r in out} == {
        (r.lang, r.sampled_id_sum) for r in again
    }


def test_pipeline_v3_funnel_monotone(spark, sf_dir):
    """The v3 funnel is a funnel: per-lang survivor counts are
    non-increasing across the seven cumulative stages, and no stage
    annihilates the corpus (every stage keeps >0 docs overall)."""
    from yamr_spark.registry import all_queries

    rows = all_queries()["llm_prep_pipeline_v3"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.stage] = r.n_docs
    stages = sorted({r.stage for r in rows})
    assert stages[0] == "1_raw" and stages[-1] == "7_quality_p75"
    for lang, d in by_lang.items():
        seq = [d.get(s, 0) for s in stages]
        assert all(a >= b for a, b in zip(seq, seq[1:])), (lang, seq)
    totals = [sum(d.get(s, 0) for d in by_lang.values()) for s in stages]
    assert all(t > 0 for t in totals), totals


def test_quality_stratified_sample_report(spark, sf_dir):
    """Quartile buckets cover the corpus, rates are the configured
    ladder, and every bucket's sample is a subset at roughly its
    rate (deterministic hash membership)."""
    from yamr_spark.operators.curation import quality_stratified_sample
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    rows = {r.bucket: r for r in quality_stratified_sample(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert [rows[b].rate_pct for b in (1, 2, 3, 4)] == [5, 15, 40, 80]
    total = sum(r.n_docs for r in rows.values())
    assert total == docs.count()
    for b, r in rows.items():
        assert 0 <= r.n_sampled <= r.n_docs
        frac = r.n_sampled / r.n_docs
        assert abs(frac - r.rate_pct / 100) < 0.15, (b, frac)
    # monotone quality: bucket means increase with bucket index
    means = [rows[b].mean_lm for b in (1, 2, 3, 4)]
    assert means == sorted(means)


def test_weighted_sample_properties(spark, sf_dir):
    """A-ES weighted sampling: exactly k rows, no duplicates,
    deterministic across invocations, only positive-weight rows
    eligible, and heavier rows are sampled at a visibly higher rate
    than uniform on a skewed-weight fixture."""
    from yamr_spark.operators.curation import weighted_sample
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    s1 = weighted_sample(docs, "doc_id", "n_chars", k=50).collect()
    s2 = weighted_sample(docs, "doc_id", "n_chars", k=50).collect()
    assert len(s1) == 50 and len({r.doc_id for r in s1}) == 50
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    assert all(r.weight > 0 for r in s1)

    # skew check: ids 0..99 weight 1, ids 100..119 weight 1000 — the
    # heavy 1/6 of rows should dominate a k=20 sample
    rows = [(i, 1) for i in range(100)] + [(i, 1000) for i in range(100, 120)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, "doc_id", "w", k=20).collect()
    heavy = sum(1 for r in got if r.doc_id >= 100)
    assert heavy >= 15, heavy


def test_flagged_cache_matches_uncached(spark, sf_dir):
    """The shared decontamination flag-set feeds pipeline v1/v2/v3;
    cached and uncached plans must return identical rows (same pin the
    shingle/IVF/frame-signature caches carry)."""
    from yamr_spark.operators.curation import (
        llm_prep_pipeline,
        llm_prep_pipeline_v2,
        llm_prep_pipeline_v3,
    )
    from yamr_spark.queries_curation import _flagged_shared
    from yamr_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    flagged = _flagged_shared(spark, sf_dir)
    for op in (llm_prep_pipeline, llm_prep_pipeline_v2, llm_prep_pipeline_v3):
        cached = sorted(map(tuple, op(docs, flagged=flagged).collect()))
        uncached = sorted(map(tuple, op(docs).collect()))
        assert cached == uncached, op.__name__
    assert _flagged_shared(spark, sf_dir) is flagged
