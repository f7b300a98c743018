"""Unit pins for the round-7 late additions: token-budget packing,
Count-Min sketch point estimates, and MMR diversified top-k. Each
operator also has a registered driver query with an exact DuckDB
oracle; these tests pin the semantic invariants the oracle hash alone
doesn't explain (prefix equivalence, sketch linearity, diversity)."""

from __future__ import annotations

import hashlib

from yamr_spark.operators.curation import token_budget_pack
from yamr_spark.operators.similarity import mmr_topk
from yamr_spark.operators.text import cms_point_estimates
from yamr_spark.tables import table


def _pri(doc_id: int) -> int:
    return int(hashlib.md5(f"tbp:{doc_id}".encode()).hexdigest()[:15], 16)


def test_token_budget_pack_matches_global_prefix_rule(spark):
    """The two-phase (bucket cumsum + boundary window) plan selects
    exactly the documents the flat per-lang priority-order prefix rule
    selects — replicated here in plain Python over the same md5
    priorities. Includes an empty document (token floor of 1)."""
    rows = [
        (i, " ".join(["w"] * ((i % 7) + 1)), "a" if i % 2 == 0 else "b")
        for i in range(200)
    ] + [(1000, "", "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.lang: r for r in token_budget_pack(df, 50, n_buckets=8).collect()}

    by_lang: dict[str, list[tuple[int, int, int]]] = {}
    for doc_id, text, lang in rows:
        n_tok = max(len(text.split()), 1)
        by_lang.setdefault(lang, []).append((_pri(doc_id), doc_id, n_tok))
    for lang, docs in by_lang.items():
        cum = sel_d = sel_t = 0
        for _, _, t in sorted(docs):
            if cum + t > 50:
                break
            cum += t
            sel_d += 1
            sel_t += t
        r = got[lang]
        assert (r.docs_selected, r.tokens_selected) == (sel_d, sel_t), lang
        assert r.docs_total == len(docs)
        assert r.tokens_total == sum(t for _, _, t in docs)
        assert r.tokens_selected <= 50


def test_token_budget_pack_bucket_count_invariance(spark, sf_dir):
    """The stratification factor is a physical knob: 1 bucket (pure
    window) and 256 buckets (pure broadcast + sliver window) must
    select identically."""
    docs = table(spark, sf_dir, "documents")
    a = sorted(map(tuple, token_budget_pack(docs, 2000, n_buckets=1).collect()))
    b = sorted(map(tuple, token_budget_pack(docs, 2000, n_buckets=256).collect()))
    assert a == b and len(a) > 0


def test_token_budget_pack_budget_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "d e", "x")], "doc_id long, text string, lang string"
    )
    total = token_budget_pack(df, 1000).collect()[0]
    assert (total.docs_selected, total.tokens_selected) == (2, 5)
    # budget smaller than the first doc in priority order -> 0 selected
    none = token_budget_pack(df, 1).collect()[0]
    assert (none.docs_selected, none.tokens_selected) == (0, 0)
    assert none.docs_total == 2 and none.tokens_total == 5


def test_cms_overestimates_only_and_exact_when_wide(spark, sf_dir):
    """CMS structural guarantee: min-of-rows never underestimates; with
    width >> |distinct| (no collisions) the estimate IS the exact
    count."""
    ev = table(spark, sf_dir, "events")
    got = cms_point_estimates(ev, "user_id", n_probes=10).collect()
    assert len(got) == 10
    assert all(r.never_underestimates for r in got)
    assert all(r.cms_est >= r.exact_cnt for r in got)
    wide = cms_point_estimates(ev, "user_id", n_probes=10, width=1 << 17).collect()
    assert all(r.cms_est == r.exact_cnt for r in wide)


def test_cms_sketch_is_linear_in_the_data(spark, sf_dir):
    """Mergeability, observed from outside: the sketch of A union A is
    the cell-wise double of the sketch of A, so every estimate exactly
    doubles — the property that lets shards build sketches
    independently and merge by addition at 100 TB."""
    ev = table(spark, sf_dir, "events")
    base = {r.probe_val: r for r in cms_point_estimates(ev, "user_id").collect()}
    doubled = cms_point_estimates(ev.unionByName(ev), "user_id").collect()
    assert len(doubled) == len(base)
    for r in doubled:
        b = base[r.probe_val]
        assert r.exact_cnt == 2 * b.exact_cnt
        assert r.cms_est == 2 * b.cms_est


def test_mmr_skips_the_near_duplicate(spark):
    """Golden: with lambda=0.5 the exact scaled duplicate of pick #1
    (cosine 1.0 to it) loses to a less-relevant but diverse candidate —
    the defining MMR behavior — and the relevance tie at step 1 breaks
    by vec_id."""
    rows = [
        (0, [1.0, 0.0, 0.0]),  # query
        (1, [1.0, 0.1, 0.0]),  # top relevance
        (2, [2.0, 0.2, 0.0]),  # exact scaled duplicate of 1 (same rel)
        (3, [0.9, -0.436, 0.0]),  # diverse, decent relevance
        (4, [0.0, 0.0, 1.0]),  # orthogonal to everything
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = mmr_topk(df, query_id=0, top_n=4, k=3, lam=0.5).orderBy("rank").collect()
    assert [r.vec_id for r in got] == [1, 3, 4]
    assert [r.rank for r in got] == [1, 2, 3]
    # pure relevance would have ranked the duplicate second
    rels = {r.vec_id: r.relevance for r in got}
    assert rels[3] < rels[1]


def test_mmr_short_candidate_pool(spark):
    """k beyond the candidate pool returns the pool, ranked."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    got = mmr_topk(df, query_id=0, top_n=5, k=5).collect()
    assert len(got) == 2
    assert {r.vec_id for r in got} == {1, 2}


def test_streaming_cms_store_replay_idempotent_and_additive(spark, sf_dir, tmp_path):
    """Crash semantics of the delta store: re-merging the SAME batch_id
    (the at-least-once replay window) leaves the store unchanged, a new
    batch_id adds cell-wise, and the summed store over slices equals
    the one-shot batch sketch (additivity)."""
    from yamr_spark.operators.text import cms_sketch
    from yamr_spark.streaming.cms import merge_cms_batch, read_cms_store

    ev = table(spark, sf_dir, "events").where("user_id IS NOT NULL")
    store = str(tmp_path / "cms_store")

    merge_cms_batch(ev, 0, "user_id", store)
    first = sorted(map(tuple, read_cms_store(spark, store).collect()))
    merge_cms_batch(ev, 0, "user_id", store)  # replayed batch 0
    assert sorted(map(tuple, read_cms_store(spark, store).collect())) == first

    merge_cms_batch(ev, 1, "user_id", store)  # genuinely new batch
    doubled = {
        (r.i, r.bucket): r.cnt for r in read_cms_store(spark, store).collect()
    }
    assert doubled == {(i, b): 2 * c for i, b, c in first}

    # slice-merge == one-shot: three disjoint slices through the delta
    # store must sum to the whole-input sketch
    store2 = str(tmp_path / "cms_store2")
    for bid, pred in enumerate(
        ["user_id % 3 = 0", "user_id % 3 = 1", "user_id % 3 = 2"]
    ):
        merge_cms_batch(ev.where(pred), bid, "user_id", store2)
    summed = sorted(map(tuple, read_cms_store(spark, store2).collect()))
    oneshot = sorted(map(tuple, cms_sketch(ev, "user_id").collect()))
    assert summed == oneshot
