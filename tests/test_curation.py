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
