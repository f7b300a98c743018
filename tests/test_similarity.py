"""Behavioral tests for similarity search on constructed vectors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T


def _vec(*xs):
    return [float(x) for x in xs]


@pytest.fixture(scope="module")
def emb(spark):
    # 0, 1, 4 nearly parallel; 2 orthogonal; 3 antiparallel to 0
    rows = [
        (0, _vec(1, 0, 0, 0)),
        (1, _vec(0.99, 0.01, 0, 0)),
        (2, _vec(0, 0, 1, 0)),
        (3, _vec(-1, 0, 0, 0)),
        (4, _vec(0.98, 0.02, 0, 0)),
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_brute_force_topk(emb):
    from yamr_spark.operators.similarity import brute_force_topk

    got = brute_force_topk(emb, k=2, num_queries=1).collect()
    assert {r.query_id for r in got} == {0}
    by_rank = {r.rnk: r for r in got}
    assert by_rank[1].neighbor_id == 1  # closest direction
    assert by_rank[2].neighbor_id == 4
    assert by_rank[1].cosine > 0.999


def test_cosine_math(spark):
    from yamr_spark.operators.similarity import with_cosine

    df = spark.createDataFrame(
        [(_vec(1, 0), _vec(0, 1)), (_vec(1, 1), _vec(1, 1))], ["va", "vb"]
    )
    got = [r.cosine for r in with_cosine(df).collect()]
    assert got[0] == 0.0
    assert math.isclose(got[1], 1.0, abs_tol=1e-6)


def test_ivf_assign_covers_all(emb):
    from yamr_spark.operators.similarity import ivf_assign

    got = ivf_assign(emb, c=2).collect()
    assert {r.vec_id for r in got} == {0, 1, 2, 3, 4}
    by_id = {r.vec_id: r.centroid_id for r in got}
    assert by_id[4] in (0, 1)  # near-parallel vector lands with 0/1's cell
    assert all(r.centroid_cosine <= 1.0 for r in got)


def test_embedding_near_dup_single_cell(emb):
    from yamr_spark.operators.similarity import embedding_near_dup

    # c=1: every vector in one cell → candidate set is all pairs, so the
    # threshold alone decides
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in embedding_near_dup(emb, c=1).collect()}
    assert set(pairs) == {(0, 1), (0, 4), (1, 4)}
    assert all(v > 0.999 for v in pairs.values())


def test_embedding_near_dup_cell_blocking(emb):
    from yamr_spark.operators.similarity import embedding_near_dup

    # c=2: centroids are vectors 0 and 1 themselves, so the near-parallel
    # trio splits across two cells — documents the IVF recall/cost
    # trade-off: only same-cell pairs are compared
    pairs = set(
        (r.vec_a, r.vec_b) for r in embedding_near_dup(emb, c=2).collect()
    )
    assert pairs <= {(0, 1), (0, 4), (1, 4)}


def test_multi_probe_superset_and_boundary_recovery(emb):
    from yamr_spark.operators.similarity import (
        embedding_near_dup,
        embedding_near_dup_multi,
    )

    # c=2 splits the near-parallel trio across two cells; p=2 must recover
    # the cross-boundary pairs p=1 misses, and always contain the p=1 set.
    p1 = set((r.vec_a, r.vec_b) for r in embedding_near_dup(emb, c=2).collect())
    p2 = set(
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_multi(emb, c=2, p=2).collect()
    )
    assert p1 <= p2
    assert p2 == {(0, 1), (0, 4), (1, 4)}  # full recall of the trio


def test_multi_probe_superset_real_embeddings(spark, sf_dir):
    from yamr_spark.operators.similarity import (
        embedding_near_dup,
        embedding_near_dup_multi,
    )
    from yamr_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    p1 = set((r.vec_a, r.vec_b) for r in embedding_near_dup(emb).collect())
    p2 = set(
        (r.vec_a, r.vec_b) for r in embedding_near_dup_multi(emb, p=2).collect()
    )
    assert p1 <= p2


def test_real_embeddings_smoke(spark, sf_dir):
    from yamr_spark.operators.similarity import brute_force_topk
    from yamr_spark.tables import table

    got = brute_force_topk(table(spark, sf_dir, "embeddings"), k=3, num_queries=3)
    rows = got.collect()
    assert len(rows) == 9  # 3 queries × 3 neighbors
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_kmeans_ivf_recall_at_k(spark, sf_dir):
    """Refined centroids must not lose recall@k vs the lowest-id-seed
    IVF at the same (c, nprobe); both measured against exact brute
    force. (VERDICT r03 #5: train→search path wired into the query.)"""
    from yamr_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivf_topk_kmeans,
    )
    from yamr_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    kw = dict(k=5, num_queries=10, c=8, nprobe=2)
    truth = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, k=5, num_queries=10).collect()
    }
    seed_hits = {
        (r.query_id, r.neighbor_id) for r in ivf_topk(emb, **kw).collect()
    } & truth
    km_hits = {
        (r.query_id, r.neighbor_id) for r in ivf_topk_kmeans(emb, iters=1, **kw).collect()
    } & truth
    seed_recall = len(seed_hits) / len(truth)
    km_recall = len(km_hits) / len(truth)
    assert km_recall >= seed_recall, (km_recall, seed_recall)
    assert km_recall > 0


def test_srp_near_dup_real_embeddings(spark, sf_dir):
    """SRP-LSH blocking: every returned pair really has cosine >= tau,
    exact duplicates always collide (hamming 0 -> all blocks agree), and
    signatures are data-independent (two computations identical)."""
    from yamr_spark.operators.similarity import srp_near_dup, srp_signature
    from yamr_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    pairs = srp_near_dup(emb, threshold=0.4).collect()
    assert all(r.cosine >= 0.4 for r in pairs)
    assert all(r.vec_a < r.vec_b for r in pairs)
    s1 = {r.vec_id: r.srp for r in srp_signature(emb).collect()}
    s2 = {r.vec_id: r.srp for r in srp_signature(emb).collect()}
    assert s1 == s2 and all(0 <= v < 2**32 for v in s1.values())


def test_srp_exact_dup_always_found(spark):
    from yamr_spark.operators.similarity import srp_near_dup

    rows = [
        (0, [1.0, 2.0, -3.0] + [0.5] * 61),
        (1, [1.0, 2.0, -3.0] + [0.5] * 61),  # exact dup of 0
        (2, [-1.0, 5.0, 0.25] + [-0.5] * 61),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.vec_a, r.vec_b): r.cosine for r in srp_near_dup(emb, threshold=0.9).collect()}
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_semdedup_verdicts_consistent_with_near_dup_pairs(spark, sf_dir):
    """semdedup's dropped set must equal the distinct higher-id side of
    embedding_near_dup's pair list (same blocking, same eps): the two
    operators are views of one computation. Every vector appears exactly
    once, and at least one vector per non-empty cell is kept."""
    from yamr_spark.operators.similarity import embedding_near_dup, semdedup
    from yamr_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    verdicts = semdedup(emb, eps=0.4).collect()
    pairs = embedding_near_dup(emb, threshold=0.4).collect()

    dropped = {r.vec_id for r in verdicts if not r.kept}
    assert dropped == {r.vec_b for r in pairs}

    n_emb = emb.count()
    assert len(verdicts) == n_emb
    assert len({r.vec_id for r in verdicts}) == n_emb

    by_cell: dict[int, list] = {}
    for r in verdicts:
        by_cell.setdefault(r.centroid_id, []).append(r)
    for cell, rows in by_cell.items():
        assert any(r.kept for r in rows), f"cell {cell} lost every vector"
        # the lowest id in a cell can never be dropped (no lower-id peer)
        assert min(rows, key=lambda r: r.vec_id).kept


def test_semdedup_exact_dup_dropped(spark):
    from yamr_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 2.0, -3.0] + [0.5] * 61),
        (1, [1.0, 2.0, -3.0] + [0.5] * 61),  # exact dup of 0 -> dropped
        (2, [-1.0, 5.0, 0.25] + [-0.5] * 61),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.kept for r in semdedup(emb, eps=0.99, c=1).collect()}
    assert got[0] is True and got[1] is False and got[2] is True


def test_quantized_topk_recall(spark, sf_dir):
    """Int8-quantized brute-force top-k must preserve the exact top-k
    neighborhoods (high recall@5) and reconstruction must be tight —
    the acceptance bar for switching the rerank stage to 4x-smaller
    codes."""
    from yamr_spark.operators.similarity import (
        brute_force_topk,
        quantize_stats,
        quantized_topk,
    )
    from yamr_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, k=5).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id) for r in quantized_topk(emb, k=5).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, recall

    stats = quantize_stats(emb).collect()
    assert all(r.mean_cosine >= 0.999 for r in stats)
    assert all(r.mean_rmse <= 0.01 for r in stats)


def test_quantized_ivf_topk_recall_vs_quantized_brute(spark, sf_dir):
    """IVF-SQ8 recall gate: cell pruning over int8 codes must recover a
    solid fraction of the quantized brute-force top-k (nprobe=2 of 8)."""
    from yamr_spark.operators import similarity as S
    from yamr_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    brute = {
        (r.query_id, r.neighbor_id) for r in S.quantized_topk(emb).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in S.quantized_ivf_topk(emb).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.6, f"recall {recall:.2f}"


def test_zero_norm_vectors_never_crash_or_outrank(spark):
    """Any real embedding corpus contains dead (all-zero) vectors; a
    cosine against one is NULL (try_divide), never DIVIDE_BY_ZERO —
    under ANSI mode a bare division would kill the whole job. Zero
    vectors must not crash any scorer, must be absent from thresholded
    pairs, and must never outrank a real neighbor in top-k."""
    from yamr_spark.operators.similarity import (
        brute_force_topk,
        embedding_near_dup,
        ivf_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 0.0, 0.0], 1),
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.0, 0.9, 0.1], 1),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    brute = brute_force_topk(emb, k=2, num_queries=5).collect()
    real = [r for r in brute if r.cosine is not None]
    # every real query finds its true nearest real neighbor first
    top1 = {r.query_id: r.neighbor_id for r in real if r.rnk == 1}
    assert top1[0] == 1 and top1[1] == 0 and top1[3] == 4 and top1[4] == 3
    # the zero vector never appears as a ranked-above-real neighbor
    for r in brute:
        if r.neighbor_id == 2:
            assert r.cosine is None

    ivf = ivf_topk(emb, k=2, num_queries=5, c=2, nprobe=2).collect()
    assert all(r.cosine is None for r in ivf if r.neighbor_id == 2)

    pairs = embedding_near_dup(emb, threshold=0.5).collect()
    assert pairs and not any(2 in (r.vec_a, r.vec_b) for r in pairs)


def test_nan_embeddings_never_outrank_or_pair(spark):
    """Spark orders NaN as the GREATEST double, so an unguarded NaN
    cosine passes every threshold and takes rank 1 everywhere — one
    corrupt embedding poisons every ranking and dedup component it
    touches. Pinned contract: NaN collapses to NULL (nanvl), excluded
    exactly like zero-norm vectors."""
    import math

    from pyspark.sql import types as T

    from yamr_spark.operators.similarity import brute_force_topk, embedding_near_dup

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.9, 0.1, 0.0], 0),
            (2, [float("nan"), 1.0, 0.0], 1),
            (3, [0.0, 1.0, 0.0], 1),
        ],
        schema,
    )
    out = brute_force_topk(emb, k=2, num_queries=4).collect()
    for r in out:
        if 2 in (r.query_id, r.neighbor_id):
            assert r.cosine is None or math.isnan(r.cosine) is False
        if r.neighbor_id == 2:
            assert r.cosine is None
    # query 3's true top neighbor is NOT the NaN vector
    top1 = {r.query_id: r.neighbor_id for r in out if r.rnk == 1 and r.cosine is not None}
    assert top1[3] != 2
    pairs = embedding_near_dup(emb, threshold=0.5).collect()
    assert not any(2 in (r.vec_a, r.vec_b) for r in pairs)


def test_covariance_gemm_path_and_agreement(spark, sf_dir):
    """VERDICT r06 #6: the d>=64 covariance runs the Arrow-batched
    integer-gemm path (MapInPandas in-plan, no join generating outer
    products, partial agg under the d^2-key shuffle), agrees with the
    explode form at shared dims to quantization tolerance, and equals
    a local numpy replay of the identical scaled-int arithmetic."""
    import numpy as np

    from yamr_spark.operators.similarity import (
        embedding_covariance,
        embedding_covariance_gemm,
    )
    from yamr_spark.plans import has_partial_aggregate, plan_text
    from yamr_spark.registry import _ship_package
    from yamr_spark.tables import table

    _ship_package(spark)
    emb = table(spark, sf_dir, "embeddings")
    gemm = embedding_covariance_gemm(emb, max_dim=64)
    txt = plan_text(gemm)
    assert "MapInPandas" in txt, "gemm path must be the Arrow-batched plan"
    assert "SortMergeJoin" not in txt, "outer products must not come from a join"
    assert has_partial_aggregate(gemm)

    got = {(r.i, r.j): r.cov for r in gemm.collect()}
    assert len(got) == 64 * 65 // 2

    # cross-check vs the explode form on the shared 16 dims: different
    # quantization contracts (9dp products vs 6dp inputs), so compare
    # within the combined quantization tolerance, not exactly
    explode = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(emb, max_dim=16).collect()
    }
    for k, v in explode.items():
        assert abs(got[k] - v) < 1e-4, (k, got[k], v)

    # exact replay: same scaled-int arithmetic locally
    rows = emb.select("embedding").collect()
    m = np.array(
        [
            [float(np.float64(x)) for x in r.embedding[:64]]
            for r in rows
        ],
        dtype=np.float64,
    )
    q = np.round(m, 6)  # numpy half-even vs Spark half-up: ties are
    # measure-zero here; the driver oracle (DuckDB) is the binding check
    sx = np.rint(q * 1e6).astype(np.int64)
    n = sx.shape[0]
    g = sx.T @ sx
    s = sx.sum(axis=0)
    i, j = 0, 5
    want = round((float(g[i, j]) / 1e12) / n - ((float(s[i]) / 1e6) / n) * ((float(s[j]) / 1e6) / n), 6)
    assert abs(got[(i, j)] - want) < 2e-6, (got[(i, j)], want)


def test_pca_top_component_recovers_dominant_axis(spark):
    """Power iteration on a synthetic set whose variance is
    concentrated on axis 0 must return a unit-norm loading vector
    dominated by dim 0, with eigenvalue near the axis-0 variance."""
    import math

    from yamr_spark.operators.similarity import pca_top_component
    from yamr_spark.registry import _ship_package

    _ship_package(spark)
    rows = [
        (i, [float(s * m), 0.1 * (i % 3 - 1), 0.05 * (i % 2), 0.0])
        for i, (s, m) in enumerate((s, m) for s in (-1, 1) for m in (1, 2, 3, 4, 5))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.i: r for r in pca_top_component(emb, max_dim=4).collect()}
    assert set(got) == {0, 1, 2, 3}
    norm = math.sqrt(sum(r.loading**2 for r in got.values()))
    assert abs(norm - 1.0) < 1e-6
    assert abs(got[0].loading) > 0.99
    ev = got[0].eigenvalue
    # axis-0 variance of {±1..±5} = mean of squares = 11.0 (mean 0)
    assert abs(ev - 11.0) < 0.2, ev


def test_covariance_gemm_ragged_vectors_match_explode(spark):
    """Regression (r07 review): mixed-dimensionality embeddings must
    not crash the gemm batcher — zero-padding to the chunk max dim is
    semantically identical to the explode form's absent-dim handling,
    so both forms see the same sums (checked to quantization tol)."""
    from yamr_spark.operators.similarity import (
        embedding_covariance,
        embedding_covariance_gemm,
    )
    from yamr_spark.registry import _ship_package

    _ship_package(spark)
    rows = [
        (1, [1.0, 2.0]),
        (2, [0.5, -1.0, 3.0]),
        (3, [2.0]),
        (4, [1.5, 0.25, -0.75, 4.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = {(r.i, r.j): r.cov for r in embedding_covariance_gemm(emb, max_dim=4).collect()}
    e = {(r.i, r.j): r.cov for r in embedding_covariance(emb, max_dim=4).collect()}
    assert set(g) == set(e)
    for k in e:
        assert abs(g[k] - e[k]) < 1e-4, (k, g[k], e[k])


def test_covariance_gemm_poison_row_matches_explode(spark):
    """Review r07 (repro'd live): a NaN embedding element must
    contribute NOTHING — matching the explode form's NULL-skipping —
    not reach numpy as INT64_MIN and wrap the gemm."""
    import math

    from yamr_spark.operators.similarity import (
        embedding_covariance,
        embedding_covariance_gemm,
    )
    from yamr_spark.registry import _ship_package

    _ship_package(spark)
    emb = spark.createDataFrame(
        [(1, [1.0, 0.000001]), (2, [float("nan"), 0.000001]), (3, [2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    g = {(r.i, r.j): r.cov for r in embedding_covariance_gemm(emb, max_dim=2).collect()}
    e = {(r.i, r.j): r.cov for r in embedding_covariance(emb, max_dim=2).collect()}
    assert set(g) == set(e)
    for k in e:
        assert not math.isnan(g[k]) and abs(g[k] - e[k]) < 1e-4, (k, g[k], e[k])


def test_pca_degenerate_input_null_not_ansi_kill(spark):
    """Review r07 (repro'd live): identical embeddings → zero
    covariance → zero norm. The iteration must return NULL loadings,
    not die with an ANSI DIVIDE_BY_ZERO."""
    from yamr_spark.operators.similarity import pca_top_component
    from yamr_spark.registry import _ship_package

    _ship_package(spark)
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    rows = pca_top_component(emb, max_dim=2).collect()
    assert rows and all(r.loading is None for r in rows)


def test_covariance_gemm_finite_overflow_is_loud(spark):
    """Review r07 follow-up: a FINITE element too large for the scaled
    int64 representation must fail loudly (ANSI long-cast overflow),
    never silently quantize to 0 — only NaN/Inf take the
    zero-contribution path."""
    import pytest

    from yamr_spark.operators.similarity import embedding_covariance_gemm
    from yamr_spark.registry import _ship_package

    _ship_package(spark)
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1e13, 0.5])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="(?i)overflow|out of range|cast"):
        embedding_covariance_gemm(emb, max_dim=2).collect()


def test_rrf_fuse_golden(spark):
    """RRF math on crafted rankings: a doc ranked in BOTH lists beats a
    doc ranked first in only one; absent lists contribute nothing;
    ties break on id; top cut respected."""
    from yamr_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rnk long")
    b = spark.createDataFrame([(11, 1), (13, 2), (10, 3)], "doc_id long, rnk long")
    rows = {r.doc_id: r for r in rrf_fuse(a, b, k=60, top=3).collect()}
    # 11: 1/62 + 1/61 ; 10: 1/61 + 1/63 ; 13: 1/62 ; 12: 1/63 —
    # both-list docs lead, and 13 (1/62) edges out 12 (1/63)
    assert set(rows) == {10, 11, 13}
    assert rows[11].rrf_score > rows[10].rrf_score > rows[13].rrf_score
    assert rows[11].sparse_rank == 2 and rows[11].dense_rank == 1
    assert rows[13].sparse_rank is None and rows[13].dense_rank == 2
    assert abs(rows[11].rrf_score - round(1 / 62 + 1 / 61, 6)) < 1e-9


def test_ivf_shared_cache_matches_uncached(spark, sf_dir):
    """The shared IVF centroid/assignment cache (queries layer, VERDICT
    r07 #4) must feed consumers EXACTLY what they would build
    themselves: ivf_topk / hard_negative_mining_ivf / quantized_ivf_topk
    with the cached (cents, assign) equal their uncached forms row for
    row, and the kmeans-refined centroid cache reproduces
    ivf_topk_kmeans. Also pins that repeat calls hit the cache (same
    frame objects back)."""
    from yamr_spark import queries_similarity as QS
    from yamr_spark.operators import similarity as S
    from yamr_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    cents, assign = QS._ivf_shared(spark, sf_dir, c=8)
    c2, a2 = QS._ivf_shared(spark, sf_dir, c=8)
    assert c2 is cents and a2 is assign  # second call is a cache hit

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(S.ivf_topk(emb, cents=cents, assign=assign)) == rows(S.ivf_topk(emb))
    assert rows(
        S.hard_negative_mining_ivf(emb, cents=cents, assign=assign)
    ) == rows(S.hard_negative_mining_ivf(emb))
    assert rows(
        S.quantized_ivf_topk(emb, cents=cents, assign=assign)
    ) == rows(S.quantized_ivf_topk(emb))

    km = QS._kmeans_cents_shared(spark, sf_dir, c=8, iters=1)
    assert QS._kmeans_cents_shared(spark, sf_dir, c=8, iters=1) is km
    assert rows(S.ivf_topk_kmeans(emb, cents=km)) == rows(S.ivf_topk_kmeans(emb))


def test_pq_adc_topk_goldens_and_recall(spark, sf_dir):
    """PQ/ADC sanity: an exact duplicate of a query vector encodes to
    the identical codes, so it ranks first with adist 0; and at the
    fixture scale PQ's top-5 must overlap exact-L2 top-5 well above
    chance. The certified codebooks are deterministic lowest-id seeds
    (NOT trained k-means — the centroids() trade), so absolute recall
    is the coarse floor: measured 0.16-0.38 across (m, k) configs and
    fixture scales vs a ~0.01 chance rate; the gate pins >= 0.12."""
    from pyspark.sql import functions as F

    from yamr_spark.operators.similarity import pq_adc_topk
    from yamr_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    # plant an exact duplicate of query vec_id=3 at a fresh id
    dup = emb.where(F.col("vec_id") == 3).select(
        F.lit(900000).cast("long").alias("vec_id"),
        "embedding",
        "label",
    )
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in pq_adc_topk(emb.unionByName(dup)).collect()
    }
    assert got[(3, 1)] == (900000, 0.0)

    # recall@5 vs exact squared-L2 on the raw vectors
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: r.embedding for r in rows}

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    pq = {r.query_id: set() for r in pq_adc_topk(emb).collect()}
    for r in pq_adc_topk(emb).collect():
        pq[r.query_id].add(r.neighbor_id)
    hits = total = 0
    for q in pq:
        exact = sorted(
            ((l2(vecs[q], v), i) for i, v in vecs.items() if i != q)
        )[:5]
        exact_ids = {i for _, i in exact}
        hits += len(exact_ids & pq[q])
        total += 5
    assert hits / total >= 0.12, hits / total
