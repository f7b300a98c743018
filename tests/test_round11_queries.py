"""Unit pins for the round-11 additions (IVF×PQ composition, certified
ANN recall). Both have registered driver queries with exact DuckDB
oracles; these tests pin the semantic invariants the oracle hash alone
doesn't explain: IVF×PQ ⊆ flat-ADC-on-probed-cells equivalence, the
pq_encode(dists=) refactor identity, and the recall frame's laws.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.operators import similarity as S
from yamr_spark.tables import table


def test_ivf_pq_equals_flat_adc_restricted_to_probed_cells(spark, sf_dir):
    """IVF×PQ must return exactly the flat-ADC ranking recomputed over
    the probed-cell corpus: pruning changes WHICH codes are scanned,
    never how a scanned code scores. Re-derive the expected set from
    flat ADC with topk=corpus (no cut), filtered to each query's probed
    cells, re-ranked."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_topk(emb).collect()
    }
    probes = S._query_probes(emb, num_queries=10, c=8, nprobe=2).select(
        "query_id", "centroid_id"
    )
    assign = S.ivf_assign(emb, c=8).select(
        F.col("vec_id").alias("neighbor_id"), "centroid_id"
    )
    allowed = probes.join(assign, "centroid_id").select(
        "query_id", "neighbor_id"
    )
    from pyspark.sql import Window

    flat = S.pq_adc_topk(emb, topk=n).drop("rnk")
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    exp = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in flat.join(allowed, ["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .collect()
    }
    assert got == exp and len(got) > 0


def test_pq_encode_precomputed_dists_identity(spark, sf_dir):
    """pq_encode(dists=precomputed) must equal pq_encode(books=...) —
    the ADVICE r10 refactor moved the argmin/tie-break into one place;
    pin that both entry points produce identical codes."""
    emb = table(spark, sf_dir, "embeddings")
    books = S.pq_codebooks(emb)
    via_books = {
        (r.vec_id, r.sub): r.code_id
        for r in S.pq_encode(emb, books).collect()
    }
    dists = S._pq_subspace_dists(emb, books, 4, 64, "vec_id", "embedding")
    via_dists = {
        (r.vec_id, r.sub): r.code_id
        for r in S.pq_encode(emb, dists=dists).collect()
    }
    assert via_books == via_dists and len(via_books) > 0


def test_pq_encode_requires_books_or_dists(spark, sf_dir):
    import pytest

    emb = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="books or a precomputed dists"):
        S.pq_encode(emb)


def test_ann_recall_frame_laws(spark, sf_dir):
    """The recall frame's invariants: one row per method; retrieved =
    n_queries×k for every method (every path returns a full top-k at
    fixture density); 0 ≤ hits ≤ min(retrieved, truth_total); recall is
    exactly hits/truth_total. (No ordering law between ivf_pq and
    pq_adc: pruning a false positive out of flat ADC's top-k can let a
    true neighbor IN, so IVF×PQ may legitimately beat flat PQ.)"""
    from yamr_spark.queries_similarity import q_ann_recall_at_k

    rows = {r.method: r for r in q_ann_recall_at_k(spark, sf_dir).collect()}
    assert set(rows) == {
        "ivf",
        "ivf_pq",
        "ivf_pq_kmeans",
        "ivf_pq_frozen",  # frozen-param build, worst-case geometry (r13)
        "ivf_pq_frozen_m16",  # frozen build, production m=16/k=64 (r14)
        "pq_adc",
        "quantized",
        "ivfadc_residual",
    }
    for r in rows.values():
        assert r.retrieved == 50 and r.truth_total == 50
        assert 0 <= r.hits <= 50
        assert r.recall_at_k == r.hits / r.truth_total


def test_pq_codebooks_kmeans_are_member_means(spark, sf_dir):
    """Each refined codeword must be the 6dp-rounded mean of exactly
    the subvectors its seed codeword attracted — recompute the
    assignment + means driver-side and compare."""
    emb = table(spark, sf_dir, "embeddings")
    seeds = S.pq_codebooks(emb)
    refined = {
        (r.sub, r.code_id): list(r.cvec)
        for r in S.pq_codebooks_kmeans(emb, iters=1).collect()
    }
    codes = {
        (r.vec_id, r.sub): r.code_id for r in S.pq_encode(emb, seeds).collect()
    }
    from pyspark.sql import functions as F2

    vsubs = {
        (r.vec_id, r.sub): list(r.vsub)
        for r in emb.select(
            F2.col("vec_id"), F2.expr("CAST(embedding AS array<double>)").alias("v")
        )
        .select(
            "vec_id",
            F2.explode(
                F2.expr(
                    "transform(sequence(0, 3), s -> "
                    "struct(s AS sub, slice(v, s * 16 + 1, 16) AS vsub))"
                )
            ).alias("sv"),
        )
        .select("vec_id", "sv.sub", "sv.vsub")
        .collect()
    }
    groups: dict = {}
    for (vec_id, sub), code in codes.items():
        groups.setdefault((sub, code), []).append(vsubs[(vec_id, sub)])
    assert set(refined) == set(groups)
    for key, members in groups.items():
        mean = [
            round(sum(col) / len(col), 6) for col in zip(*members)
        ]
        assert all(
            abs(a - b) < 1e-9 for a, b in zip(mean, refined[key])
        ), key


def test_pq_kmeans_reduces_quantization_sse(spark, sf_dir):
    """Lloyd's actual guarantee (recall lift is statistical — measured
    0.10 → 0.26 at sf0.1 but NOT monotone per-fixture): one
    assign-then-mean step never increases total within-codeword squared
    error. Assert SSE(refined) <= SSE(seeds) + eps (eps absorbs the
    6dp mean rounding)."""
    from pyspark.sql import functions as F2

    emb = table(spark, sf_dir, "embeddings")

    def sse(books):
        dists = S._pq_subspace_dists(emb, books, 4, 64, "vec_id", "embedding")
        return (
            dists.groupBy("vec_id", "sub")
            .agg(F2.min("l2").alias("best"))
            .agg(F2.sum("best").alias("sse"))
            .collect()[0]["sse"]
        )

    seed_sse = sse(S.pq_codebooks(emb))
    refined_sse = sse(S.pq_codebooks_kmeans(emb, iters=1))
    assert refined_sse <= seed_sse + 1e-6 * max(1.0, seed_sse)


def test_ivf_pq_store_probe_matches_in_memory(spark, sf_dir, tmp_path):
    """The partitioned-code-store probe must reproduce ivf_pq_topk
    exactly (same centroids/assignment/codebooks/decimal ranking) —
    the store roundtrip changes WHERE codes are read, never a value."""
    import os

    emb = table(spark, sf_dir, "embeddings")
    store = os.path.join(str(tmp_path), "pqstore")
    S.write_ivf_pq_store(emb, store)
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_store_topk(spark, store, emb).collect()
    }
    exp = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_topk(emb).collect()
    }
    assert got == exp and len(got) > 0


def test_ivf_pq_store_m16_probe_matches_in_memory(spark, sf_dir, tmp_path):
    """The PRODUCTION-geometry (m=16/k=64) store probe must reproduce
    ivf_pq_topk at the same geometry exactly — the m16 roundtrip is
    value-identical to the in-memory plan, like the m=4 form (r14)."""
    import os

    emb = table(spark, sf_dir, "embeddings")
    books = S.pq_codebooks_kmeans(emb, m=16, k=64)
    store = os.path.join(str(tmp_path), "pqstore16")
    S.write_ivf_pq_store(emb, store, m=16, k=64, books=books)
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_store_topk(
            spark, store, emb, m=16, k=64, books=books
        ).collect()
    }
    exp = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_topk(emb, m=16, k=64, books=books).collect()
    }
    assert got == exp and len(got) > 0


def test_ivf_pq_store_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The serving-path scan must carry the probed cells as PARTITION
    filters (directory pruning) and read code rows, not vectors."""
    import os

    from yamr_spark.operators.similarity import probe_store_cells
    from yamr_spark.plans import plan_text

    emb = table(spark, sf_dir, "embeddings")
    store = os.path.join(str(tmp_path), "pqstore")
    S.write_ivf_pq_store(emb, store)
    scan = probe_store_cells(spark, store, [0, 3])
    txt = plan_text(scan, "formatted")
    assert "PartitionFilters" in txt and "centroid_id" in txt
    assert "embedding" not in txt  # codes only — vectors never stored


def test_ivfadc_residual_laws(spark, sf_dir):
    """Residual-form IVFADC structural laws: full top-5 per query,
    non-negative decimal distances, and bit-identical output across two
    invocations (residual subtraction + decimal ADC is deterministic)."""
    emb = table(spark, sf_dir, "embeddings")
    a = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_residual_topk(emb).collect()
    }
    b = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_residual_topk(emb).collect()
    }
    assert a == b and len(a) > 0
    per_query: dict = {}
    for (q, rnk), (n, adist) in a.items():
        per_query.setdefault(q, []).append(rnk)
        assert adist >= 0.0 and n != q
    for q, rnks in per_query.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) == 5


def test_ivf_pq_store_append_equals_batch_build(spark, sf_dir, tmp_path):
    """Incremental index law: build-from-half + append-second-half must
    be value-identical to the one-shot full-corpus store (frozen
    params => per-vector assignment/encoding can't see construction
    order)."""
    import os

    emb = table(spark, sf_dir, "embeddings")
    cents = S.centroids(emb, c=8)
    books = S.pq_codebooks(emb)
    assign = S.ivf_assign(emb, c=8, cents=cents).select("vec_id", "centroid_id")

    full_store = os.path.join(str(tmp_path), "full")
    S.write_ivf_pq_store(emb, full_store, assign=assign, books=books)
    inc_store = os.path.join(str(tmp_path), "inc")
    cut = 26
    S.write_ivf_pq_store(
        emb.where(F.col("vec_id") < cut), inc_store, assign=assign, books=books
    )
    S.ivf_pq_store_append(
        emb.where(F.col("vec_id") >= cut), inc_store,
        books=books, cents=cents, assign=assign,
    )
    read = lambda p: {
        (r.vec_id, r.centroid_id): list(r.codes)
        for r in spark.read.parquet(p).collect()
    }
    assert read(inc_store) == read(full_store) and len(read(full_store)) > 0
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_store_topk(
            spark, inc_store, emb, cents=cents, books=books
        ).collect()
    }
    exp = {
        (r.query_id, r.rnk): (r.neighbor_id, r.adist)
        for r in S.ivf_pq_topk(emb, cents=cents, assign=assign, books=books).collect()
    }
    assert got == exp
