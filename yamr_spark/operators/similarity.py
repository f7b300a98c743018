"""Similarity search over an embedding column (array<float>).

Three tiers, smallest to largest scale:

- ``brute_force_topk`` — exact cosine top-k via a broadcast of the query
  set. The baseline: O(|queries|·|corpus|) dot products, all JVM-side
  codegen (``aggregate``/``zip_with`` expressions — no Python).
- ``ivf_assign`` / ``ivf_topk`` — IVF-style coarse quantization: a small
  deterministic centroid set is broadcast; each vector joins only its
  nearest centroid's posting list, queries probe ``nprobe`` lists. The
  100 TB path: the corpus is partitioned by centroid id, so a query
  touches |corpus|·nprobe/C vectors.
- ``embedding_near_dup`` — cosine ≥ τ pairs, IVF-blocked (same-centroid
  pairs only) so it never goes all-pairs.

Determinism: centroids are the lowest-id vectors (no RNG "training" —
reproducible across engines for the oracle); all scores are computed in
double and rounded to 6 dp before any threshold/rank comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from yamr_spark.materialize import materialize


def _vec_double(col: str):
    return F.expr(f"transform({col}, x -> cast(x as double))")


def _spread(df: DataFrame) -> DataFrame:
    """Scan-spread (tables.spread_scan) for the PAIRWISE-distance roots
    only (semdedup, embedding_near_dup/_multi): there the per-row map
    cost is O(candidates × dim) interpreted arithmetic and the round-14
    quiet A/B measured a real win (semdedup −0.4 s at sf0.1). The other
    vector roots (top-k scoring, covariance, quantize, PQ) LOSE from a
    root exchange at bench scale — their per-row work is one dot/code
    per centroid feeding partial aggregates — so they project without
    spreading. No-op on multi-split scans (production layouts).
    cost_factor 8192: O(candidates × dim) interpreted vector arithmetic
    per row ⇒ 16 KB of input is one scan-task's worth of work."""
    from yamr_spark.tables import spread_scan

    return spread_scan(df, cost_factor=8192)


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(col: str):
    return F.sqrt(
        F.expr(
            f"aggregate(transform({col}, x -> x * x), cast(0.0 as double), (acc, v) -> acc + v)"
        )
    )


def with_cosine(df: DataFrame, a: str = "va", b: str = "vb") -> DataFrame:
    """Add ``cosine`` (rounded to 6 dp) between two double-array columns.

    Zero-norm vectors (dead/padded embeddings — present in any real
    corpus) have no direction: their cosine is NULL via ``try_divide``,
    so they drop out of thresholded pair filters and sort after every
    real neighbor in top-k windows (desc puts NULLs last). Under
    Spark's ANSI mode a bare ``/`` would instead raise DIVIDE_BY_ZERO
    and kill the whole job — one poison row failing a 100 TB pass.
    NaN COMPONENTS are worse than zero norms: Spark orders NaN as the
    GREATEST double, so a NaN cosine would pass every ``>= τ`` filter
    and take rank 1 in every top-k it touches — one corrupt embedding
    becomes a "near-duplicate" of everything it meets and its dedup
    component swallows unrelated documents. ``nanvl(…, NULL)``
    collapses NaN to the same excluded-NULL contract. Every cosine
    site in this module shares this contract."""
    return df.withColumn(
        "cosine", F.round(F.nanvl(F.try_divide(_dot(a, b), _norm(a) * _norm(b)), F.lit(None).cast("double")), 6)
    )


def _attach_and_score(
    cands: DataFrame, vecs: DataFrame, threshold: float
) -> DataFrame:
    """(vec_a, vec_b) id-pairs × (vec_id, v) vectors → thresholded
    cosine pairs. Norms precompute ONCE per vector — the identical
    left-fold the oracle's sqrt(list_dot_product(v,v)) evaluates, so
    rounding parity holds — and each candidate pair then costs a single
    interpreted dot product instead of three."""
    vn = vecs.withColumn("nv", _norm("v"))
    paired = (
        cands.join(
            vn.select(
                F.col("vec_id").alias("vec_a"),
                F.col("v").alias("va"),
                F.col("nv").alias("na"),
            ),
            "vec_a",
        )
        .join(
            vn.select(
                F.col("vec_id").alias("vec_b"),
                F.col("v").alias("vb"),
                F.col("nv").alias("nb"),
            ),
            "vec_b",
        )
        .withColumn(
            "cosine", F.round(F.nanvl(F.try_divide(_dot("va", "vb"), F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6)
        )
    )
    return paired.filter(F.col("cosine") >= threshold).select(
        "vec_a", "vec_b", "cosine"
    )


def brute_force_topk(
    emb: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the ``num_queries`` lowest-id
    vectors (a deterministic query set). The query side is broadcast, the
    corpus streams once; ranking is (cosine desc, neighbor id) so ties
    are deterministic. Norms are precomputed ONCE per side before the
    cross join (same trick as ``_scored_against_centroids``) so each of
    the queries x corpus pairs evaluates one interpreted dot product,
    not three — the norm is the identical left-fold the oracle's
    sqrt(list_dot_product(x,x)) computes, so rounding parity holds."""
    vecs = (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("qid"), _vec_double(vec_col).alias("va")
    )
    queries = (
        vecs.filter(F.col("qid") < num_queries)
        .withColumnRenamed("qid", "query_id")
        .withColumn("na", _norm("va"))
    )
    corpus = vecs.select(
        F.col("qid").alias("neighbor_id"), F.col("va").alias("vb")
    ).withColumn("nb", _norm("vb"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", F.round(F.nanvl(F.try_divide(_dot("va", "vb"), F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6)
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def adaptive_c(emb: DataFrame) -> int:
    """IVF cell count sized from the corpus: ``ceil(sqrt(n))``, so cells
    hold ~√n vectors and cell-blocked pairwise work is Σ|cell|² ≈ n^1.5
    — the classic IVF sizing. A FIXED c is quadratic at scale (n²/c);
    adaptive c is what survives a 100× corpus. The count is a
    parquet-metadata-only job (no data scan). Oracle note: both engines
    compute ceil(sqrt(n)) in double — exact perfect squares could round
    apart in theory, so fixtures avoid them; production would pass an
    explicit c trained offline anyway."""
    import math

    return max(1, math.ceil(math.sqrt(emb.count())))


def centroids(emb: DataFrame, c: int = 8, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse centroids: the ``c`` lowest-id vectors.

    (A production IVF trains k-means; the engine keeps selection
    deterministic so results are reproducible and oracle-checkable. The
    assignment/probe machinery is identical either way.)"""
    return (
        emb.orderBy(id_col)
        .limit(c)
        .select(F.col(id_col).alias("centroid_id"), _vec_double(vec_col).alias("cvec"))
    )


def _scored_against_centroids(
    emb: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, centroid_id, cosine): every vector scored against every
    (broadcast) centroid. Norms are precomputed ONCE per side before the
    cross join — the same sqrt(dot(x,x)) the oracle computes, just not
    re-evaluated c× per vector — so only the dot product runs per pair."""
    vecs = (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("va")
    ).withColumn("na", _norm("va"))
    cn = cents.withColumn("nb", _norm("cvec"))
    return (
        vecs.crossJoin(F.broadcast(cn))
        .withColumn(
            "cosine", F.round(F.nanvl(F.try_divide(_dot("va", "cvec"), F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6)
        )
        .select("vec_id", "centroid_id", "cosine")
    )


def ivf_assign(
    emb: DataFrame,
    c: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties → lower
    centroid id). Broadcast score + ``max_by`` argmax: the argmax is a
    PARTIAL-aggregated hash aggregate, so the map side reduces each
    vector's c scored rows to one before any exchange — the shuffle
    carries vecs×1 rows, vs vecs×c for a window argmin (and no sort).
    ``cents`` overrides the deterministic lowest-id centroid table (e.g.
    with kmeans-refined centroids — any (centroid_id, cvec) frame)."""
    if cents is None:
        cents = centroids(emb, c=c, id_col=id_col, vec_col=vec_col)
    scored = _scored_against_centroids(emb, cents, id_col, vec_col)
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("centroid_id", "cosine"),
            # ties on cosine → LOWER centroid id wins, so negate the id
            F.struct(F.col("cosine"), (-F.col("centroid_id")).alias("nid")),
        ).alias("best")
    )
    return best.select(
        "vec_id",
        F.col("best.centroid_id").alias("centroid_id"),
        F.col("best.cosine").alias("centroid_cosine"),
    )


def ivf_assign_multi(
    emb: DataFrame,
    c: int = 8,
    p: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe assignment: every vector lands in its ``p`` nearest
    cells (ties → lower centroid id). Same broadcast scoring as
    ``ivf_assign``; the per-vector top-p is a sorted-slice aggregation
    (collect the c scored structs, sort by (−cosine, centroid_id), keep
    p) — one hash aggregate, no window sort of the scored stream.
    Storage cost scales ×p; recall for cell-blocked operators rises
    because boundary vectors co-locate with BOTH nearby cells."""
    cents = centroids(emb, c=c, id_col=id_col, vec_col=vec_col)
    scored = _scored_against_centroids(emb, cents, id_col, vec_col)
    topp = scored.groupBy("vec_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("cosine")).alias("negcos"),
                        F.col("centroid_id"),
                    )
                )
            ),
            1,
            p,
        ).alias("probes")
    )
    return topp.select(
        "vec_id", F.posexplode("probes").alias("pr", "probe")
    ).select(
        "vec_id",
        F.col("probe.centroid_id").alias("centroid_id"),
        (F.col("pr") + 1).cast("long").alias("probe_rank"),
    )


def embedding_near_dup_multi(
    emb: DataFrame,
    threshold: float = 0.4,
    c: int | None = None,
    p: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``embedding_near_dup`` with multi-probe blocking: a pair is a
    candidate if the two vectors share ANY of their ``p`` assigned cells,
    so near-dups straddling a cell boundary are recovered (the p=1 recall
    gap VERDICT r01 flagged). Output is a SUPERSET of the p=1 pairs —
    every p=1 pair shares its argmin cell, which both probe sets contain.

    Scale: candidate generation is still an equality join on centroid_id
    (cost Σ|cell|²·p² worst case, never |corpus|²); duplicate candidates
    from sharing two cells are deduped BEFORE the cosine join so each
    pair's dot product is computed once. ``c=None`` sizes cells
    adaptively (``adaptive_c``: ceil(sqrt(n)) → Σ|cell|² ≈ n^1.5); the
    assignment is materialized once since both sides of the candidate
    self-join consume it."""
    if c is None:
        c = adaptive_c(emb)
    assign = (
        ivf_assign_multi(emb, c=c, p=p, id_col=id_col, vec_col=vec_col)
        .select("vec_id", "centroid_id")
        .transform(materialize)
    )
    a, b = assign.alias("a"), assign.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    vecs = _spread(emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v")
    )
    return _attach_and_score(cands, vecs, threshold)


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    c: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    assign: DataFrame | None = None,
) -> DataFrame:
    """IVF-accelerated top-k: each query probes its ``nprobe`` nearest
    centroids and scores ONLY vectors assigned there — |corpus|·nprobe/c
    dot products instead of brute force's |corpus|. Approximate: a true
    neighbor assigned to an unprobed cell is missed (recall ↑ with
    nprobe). At 100 TB the corpus is stored partitioned by centroid_id,
    so a probe is a partition-pruned scan, not a filter.

    ``assign`` optionally supplies a precomputed (vec_id, centroid_id)
    assignment table (e.g. a per-session materialized one shared across
    the IVF family) — it must be the table ``ivf_assign`` would build
    for the same ``cents``, so results are identical by construction."""
    from pyspark.sql import Window

    vecs = (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v")
    )
    # query → nprobe nearest centroids (broadcast queries × centroids; tiny)
    probes = _query_probes(
        emb, num_queries=num_queries, c=c, nprobe=nprobe, id_col=id_col,
        vec_col=vec_col, cents=cents,
    )

    # corpus restricted to probed cells
    if assign is None:
        assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col, cents=cents)
    assign = assign.select("vec_id", "centroid_id")
    corpus = vecs.join(assign, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), "centroid_id", F.col("v").alias("vb")
    )
    scored = with_cosine(
        F.broadcast(probes).withColumnRenamed("qv", "va")
        .join(corpus, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    # each vector is assigned to exactly ONE cell, so the probe join
    # yields every (query, neighbor) at most once — no dedup needed
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.select(
            "query_id", "neighbor_id", "cosine",
            F.row_number().over(wr).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def _query_probes(
    emb: DataFrame,
    num_queries: int,
    c: int,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """(query_id, qv, centroid_id) — each query's ``nprobe`` nearest cells.
    Both join inputs are broadcast-tiny (queries × centroids)."""
    from pyspark.sql import Window

    if cents is None:
        cents = centroids(emb, c=c, id_col=id_col, vec_col=vec_col)
    queries = (
        emb.select(F.col(id_col).alias("query_id"), _vec_double(vec_col).alias("qv"))
        .filter(F.col("query_id") < num_queries)
    )
    qs = with_cosine(
        F.broadcast(queries).crossJoin(
            F.broadcast(cents).select("centroid_id", F.col("cvec").alias("vb"))
        ).withColumnRenamed("qv", "va")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "centroid_id")
    return (
        qs.select(
            "query_id", F.col("va").alias("qv"), "centroid_id",
            F.row_number().over(wq).alias("rn"),
        )
        .filter(F.col("rn") <= nprobe)
        .drop("rn")
    )


def write_ivf_store(
    emb: DataFrame,
    out_dir: str,
    c: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: DataFrame | None = None,
) -> None:
    """Materialize the corpus PARTITIONED BY centroid_id — the 100 TB IVF
    layout. Each cell is its own parquet directory, so a probe touching
    ``nprobe`` of ``c`` cells is a directory-pruned scan that never opens
    the other cells' files (proven by tests/test_plans.py). ``assign``
    optionally reuses a precomputed (vec_id, centroid_id) table."""
    if assign is None:
        assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col)
    assign = assign.select("vec_id", "centroid_id")
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).join(assign, "vec_id")
    corpus.write.partitionBy("centroid_id").mode("overwrite").parquet(out_dir)


def ivf_store_topk(
    spark,
    store_dir: str,
    emb: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    c: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """``ivf_topk`` against the partitioned store: the probed cell ids are
    collected (≤ c integers — metadata, not data) and pushed as a LITERAL
    ``centroid_id IN (...)`` partition filter, so Spark prunes at the
    DIRECTORY level before listing a single unneeded file. Results are
    identical to ``ivf_topk`` on the in-memory corpus (same centroids,
    same single-cell assignment, same ranking)."""
    from pyspark.sql import Window

    probes = _query_probes(
        emb, num_queries=num_queries, c=c, nprobe=nprobe, id_col=id_col,
        vec_col=vec_col, cents=cents,
    ).transform(materialize)
    cells = sorted(
        r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()
    )
    corpus = probe_store_cells(spark, store_dir, cells).select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid_id",
        _vec_double("embedding").alias("vb"),
    )
    scored = with_cosine(
        F.broadcast(probes).withColumnRenamed("qv", "va")
        .join(corpus, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.select(
            "query_id", "neighbor_id", "cosine",
            F.row_number().over(wr).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def probe_store_cells(spark, store_dir: str, cells: list[int]) -> DataFrame:
    """Open the IVF store pruned to ``cells`` (literal partition filter →
    directory-level pruning; the scan's PartitionFilters carries the IN)."""
    return spark.read.parquet(store_dir).filter(
        F.col("centroid_id").isin([int(x) for x in cells])
    )


def kmeans_refine(
    emb: DataFrame,
    c: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement of the IVF centroids: assign → mean →
    repeat. Returns (centroid_id, dim, value) in long form, rounded to
    6 dp (long form keeps the oracle a plain unnest+avg, and the rounded
    means are engine-exact).

    Iterative like connected_components: each round is one broadcast
    cosine assignment + one (centroid, dim) average — shuffle carries
    c×dims partial sums thanks to map-side aggregation, not vectors.
    At 100 TB: sample-then-refine (train on a 0.1% sample, assign all) is
    the standard cheat; the operator is the same plan either way."""
    cents = centroids(emb, c=c, id_col=id_col, vec_col=vec_col)
    vecs = (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("va")
    )

    for _ in range(iters):
        # same partial-aggregated max_by argmax as ivf_assign: the map
        # side reduces each vector's c scored rows to one before the
        # exchange (ties → lower centroid id via the negated-id key)
        scored = _scored_against_centroids(emb, cents, id_col, vec_col)
        assign = (
            scored.groupBy("vec_id")
            .agg(
                F.max_by(
                    F.col("centroid_id"),
                    F.struct(F.col("cosine"), (-F.col("centroid_id")).alias("nid")),
                ).alias("centroid_id")
            )
            .join(vecs, "vec_id")
            .select("vec_id", "centroid_id", "va")
        )
        dims = assign.select(
            "centroid_id", F.posexplode("va").alias("dim", "x")
        )
        means = (
            dims.groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("value"))
        )
        cents = means.groupBy("centroid_id").agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "value"))
            ).alias("dv")
        ).select(
            "centroid_id",
            F.expr("transform(dv, s -> s.value)").alias("cvec"),
        )
    return (
        cents.select("centroid_id", F.posexplode("cvec").alias("dim", "value"))
        .select(
            "centroid_id",
            F.col("dim").cast("long").alias("dim"),
            F.round("value", 6).alias("value"),
        )
    )


def kmeans_centroid_vectors(
    emb: DataFrame,
    c: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(centroid_id, cvec) — kmeans-refined centroids in array form,
    rebuilt from :func:`kmeans_refine`'s ROUNDED long-form output so the
    values any consumer sees are exactly the ones the oracle computes."""
    long_form = kmeans_refine(emb, c=c, iters=iters, id_col=id_col, vec_col=vec_col)
    return (
        long_form.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "value"))).alias("dv"))
        .select("centroid_id", F.expr("transform(dv, s -> s.value)").alias("cvec"))
    )


def ivf_topk_kmeans(
    emb: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    c: int = 8,
    nprobe: int = 2,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k over kmeans-REFINED centroids — the production IVF
    'train then search' path (sample-train → assign-all at 100 TB; here
    the train set is the full corpus since fixtures are small).

    Refined centroids sit at cell centers-of-mass, so cells partition
    the corpus along its actual density and recall@k at fixed nprobe is
    ≥ the lowest-id-seed variant's (pinned by tests/test_similarity.py).
    The centroid table is c×dims — materialized once (it feeds both the
    probe and assign sides), then broadcast everywhere. ``cents``
    optionally supplies the refined centroid table directly (must be
    ``kmeans_centroid_vectors`` output for the same (c, iters))."""
    if cents is None:
        cents = kmeans_centroid_vectors(
            emb, c=c, iters=iters, id_col=id_col, vec_col=vec_col
        ).transform(materialize)
    return ivf_topk(
        emb, k=k, num_queries=num_queries, c=c, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, cents=cents,
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.4,
    c: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), blocked by IVF
    cell: only same-centroid pairs are compared, so cost is Σ|cell|², not
    |corpus|². Near-dups straddling a cell boundary need multi-assign
    (probe>1) — recall/cost knob, same as any IVF. ``c=None`` sizes
    cells adaptively (ceil(sqrt(n)) — see ``adaptive_c``); the assigned
    vector table is materialized once for the self-join."""
    if c is None:
        c = adaptive_c(emb)
    assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col).select(
        "vec_id", "centroid_id"
    )
    # norm computed BEFORE materialize: stored once in the checkpointed
    # table (the same left-fold the oracle's sqrt(dot(v,v)) evaluates),
    # so each candidate pair costs one interpreted dot, not three
    vecs = (
        _spread(emb.select(id_col, vec_col))
        .select(F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v"))
        .withColumn("nv", _norm("v"))
        .join(assign, "vec_id")
        .transform(materialize)
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    paired = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            F.col("a.nv").alias("na"),
            F.col("b.nv").alias("nb"),
        )
    )
    return (
        paired.withColumn(
            "cosine", F.round(F.nanvl(F.try_divide(_dot("va", "vb"), F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


# ----------------------------------------------------- SRP-LSH blocking

def srp_hyperplanes(bits: int, dims: int) -> list[list[float]]:
    """Deterministic signed-random-projection hyperplanes: component
    (i, d) is an md5-derived value in [-1, 1] with 3 decimal places —
    no RNG, so the oracle embeds the IDENTICAL literals and every
    signature bit is engine-reproducible."""
    import hashlib

    return [
        [
            ((int(hashlib.md5(f"{i}|{d}".encode()).hexdigest()[:15], 16) % 2001)
             - 1000)
            / 1000.0
            for d in range(dims)
        ]
        for i in range(bits)
    ]


def srp_signature(
    emb: DataFrame,
    bits: int = 32,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, srp) — the ``bits``-bit signed-random-projection
    signature: bit i = [v·rᵢ ≥ 0]. Entirely map-side (zero shuffle);
    the hyperplanes are plan literals, broadcast with the task binary.
    Random-hyperplane LSH (Charikar, STOC'02): P[bit differs] = θ/π,
    so near-parallel vectors collide on most bits."""
    planes = srp_hyperplanes(bits, dims)
    v = f"transform({vec_col}, x -> cast(x as double))"
    bit_terms = []
    for i, row in enumerate(planes):
        lit = "array(" + ", ".join(f"{x}D" for x in row) + ")"
        dot = (
            f"aggregate(zip_with({v}, {lit}, (x, y) -> x * y), "
            f"cast(0.0 as double), (acc, s) -> acc + s)"
        )
        bit_terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i}L ELSE 0L END)")
    sig = " + ".join(bit_terms)
    return (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), F.expr(sig).alias("srp")
    )


def srp_near_dup(
    emb: DataFrame,
    threshold: float = 0.4,
    bits: int = 32,
    dims: int = 64,
    max_hamming: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold) blocked by SRP-LSH —
    the hyperplane-bucket alternative to the IVF cell blocking of
    ``embedding_near_dup``: no centroid table at all, the signature is
    data-independent, and candidates are pairs agreeing exactly on ≥1
    pigeonhole block of the signature (same derived-block machinery as
    SimHash — recall-complete for signature hamming ≤ max_hamming).
    The candidate join is an equality join on (block_id, block_value);
    verification is the exact cosine. Like any LSH, a true near-dup
    pair CAN exceed the hamming budget (P ≈ (θ/π)·bits bits differ) —
    the bits/max_hamming pair is the recall knob.

    Scale shape (bench-measured, 10.9→~2 s at sf0.1): the block
    self-join emits IDS ONLY and candidate pairs are deduped as 16-byte
    id pairs BEFORE the vectors are attached — the 64-dim arrays never
    ride the explode or the dedup shuffle (the old plan's distinct over
    (ids, va, vb) rows shuffled ~1 KB/candidate). 32-bit default
    signature → 8-bit pigeonhole blocks, so bucket population (and the
    Σ|bucket|² candidate count) drops 16× vs the 16-bit/4-bit layout at
    equal hamming budget."""
    from yamr_spark.operators.dedup import pigeonhole_blocks

    sigs = srp_signature(
        emb, bits=bits, dims=dims, id_col=id_col, vec_col=vec_col
    ).transform(materialize)
    blocks = pigeonhole_blocks(bits, max_hamming)
    nib = sigs.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("srp"), off).bitwiseAND(F.lit((1 << w) - 1))
                    for off, w in blocks
                ]
            )
        ).alias("blk_id", "blk_val"),
    )
    a, b = nib.alias("a"), nib.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.blk_id") == F.col("b.blk_id"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    vecs = (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v")
    )
    return _attach_and_score(cands, vecs, threshold)


# ------------------------------------------------------------ SemDeDup


def srp_predicted_cosines(bits: int) -> list[float]:
    """The Charikar prediction per hamming distance: a pair whose
    signatures differ in h of ``bits`` hyperplane signs has estimated
    angle θ = π·h/bits, so predicted cosine = cos(π·h/bits). Rounded
    6 dp and baked as LITERALS into both the Spark plan and the DuckDB
    oracle, so libm cos() ulp differences can never split the engines."""
    import math

    return [round(math.cos(math.pi * h / bits), 6) for h in range(bits + 1)]


def srp_estimate_vs_exact(
    emb: DataFrame,
    bits: int = 32,
    dims: int = 64,
    max_hamming: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SRP calibration: for every pigeonhole candidate pair, the EXACT
    cosine next to the signature's Charikar prediction, binned by full-
    signature hamming distance — (hamming, n_pairs, pred_cos, mean_cos,
    min_cos, max_cos). The embedding-space entry in the estimator-
    certification panel (ANN recall / MinHash / SimHash / CMS / KMV):
    P[sign flip] = θ/π becomes a measured pred-vs-mean column pair.

    Scale: candidates from the production block join (ids only, never
    all-pairs); hamming from one signature self-attach; exact cosine
    via the shared norm-precomputing verifier. All corpus-scale work is
    the signature build — one map-side projection."""
    from yamr_spark.operators.dedup import pigeonhole_blocks

    sigs = srp_signature(
        emb, bits=bits, dims=dims, id_col=id_col, vec_col=vec_col
    ).transform(materialize)
    nib = sigs.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("srp"), off).bitwiseAND(F.lit((1 << w) - 1))
                    for off, w in pigeonhole_blocks(bits, max_hamming)
                ]
            )
        ).alias("blk_id", "blk_val"),
    )
    a, b = nib.alias("a"), nib.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.blk_id") == F.col("b.blk_id"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
        .transform(materialize)
    )
    hams = (
        cands.join(
            sigs.select(F.col("vec_id").alias("vec_a"), F.col("srp").alias("sa")),
            "vec_a",
        )
        .join(
            sigs.select(F.col("vec_id").alias("vec_b"), F.col("srp").alias("sb")),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int").alias(
                "hamming"
            ),
        )
    )
    vecs = (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v")
    )
    scored = _attach_and_score(cands, vecs, threshold=-1.0)
    preds = F.array(*[F.lit(p) for p in srp_predicted_cosines(bits)])
    per = hams.join(scored, ["vec_a", "vec_b"]).withColumn(
        "pred_cos", F.element_at(preds, F.col("hamming") + 1)
    )
    return per.groupBy("hamming").agg(
        F.count("*").alias("n_pairs"),
        F.min("pred_cos").alias("pred_cos"),
        F.round(
            F.sum(F.round(F.col("cosine"), 12).cast("decimal(28,14)")).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("mean_cos"),
        F.min("cosine").alias("min_cos"),
        F.max("cosine").alias("max_cos"),
    )


def semdedup(
    emb: DataFrame,
    eps: float = 0.4,
    c: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al.,
    arXiv:2303.09540): cluster the embedding space, compare only
    within-cluster pairs, and drop every vector whose cosine to a
    LOWER-ID vector in its cluster is >= ``eps`` — the paper's released
    greedy rule (a doc is dropped based on raw pairwise similarity to
    any earlier doc, whether or not that doc itself survived).

    Returns one row per vector: (vec_id, centroid_id, kept).

    Scale: identical blocking to ``embedding_near_dup`` — candidate
    generation is an equality self-join on centroid_id (Σ|cell|², never
    |corpus|²; adaptive c = ceil(sqrt(n)) keeps that ≈ n^1.5), the
    assigned-vector table is materialized once for both sides of the
    self-join, and the dropped-id set is a DISTINCT of 8-byte ids —
    the per-doc verdict join carries no vectors. At 10^10 docs the
    keep/drop decision is a broadcast-or-shuffle of ids only."""
    if c is None:
        c = adaptive_c(emb)
    assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col).select(
        "vec_id", "centroid_id"
    )
    vecs = (
        _spread(emb.select(id_col, vec_col))
        .select(F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v"))
        .withColumn("nv", _norm("v"))
        .join(assign, "vec_id")
        .transform(materialize)
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            F.col("a.nv").alias("na"),
            F.col("b.nv").alias("nb"),
        )
        .withColumn(
            "cosine", F.round(F.nanvl(F.try_divide(_dot("va", "vb"), F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6)
        )
        .filter(F.col("cosine") >= eps)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        vecs.select("vec_id", "centroid_id")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            (~F.coalesce(F.col("is_dup"), F.lit(False))).alias("kept"),
        )
    )


# ------------------------------------------------------- int8 quantization


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x|, q_i =
    round(x_i / scale * 127) — the standard 4× memory/bandwidth cut for
    embedding stores (the shuffle moves int8-representable values, the
    index holds a quarter of the bytes, and SIMD int dot products apply
    on real hardware).

    Determinism/oracle parity: round() is evaluated BEFORE the int
    cast in both engines (Spark CAST truncates, DuckDB CAST rounds —
    casting a round()ed integral double is identical in both), and
    reconstruction/score arithmetic runs in double over exact integer
    values, so there is no float-order ambiguity anywhere.

    Returns (id, qvec array<int>, scale double)."""
    v = _vec_double(vec_col)
    scale = F.expr(
        f"greatest(aggregate(transform({vec_col}, x -> abs(cast(x as double))), "
        "cast(0.0 as double), (a, x) -> greatest(a, x)), 1e-30d)"
    )
    return (
        emb.withColumn("__v", v)
        .withColumn("__scale", scale)
        .select(
            F.col(id_col),
            F.expr(
                "transform(__v, x -> cast(round(x / __scale * 127, 0) as int))"
            ).alias("qvec"),
            F.col("__scale").alias("scale"),
        )
    )


def quantize_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Quantization quality report per label: mean reconstruction RMSE
    and mean cosine(original, reconstruction). Per-vector doubles are
    rounded then summed through DECIMAL so the group aggregate is
    independent of aggregation order (hash-comparable across engines)."""
    q = quantize_int8(emb, id_col=id_col, vec_col=vec_col)
    j = (emb.select(id_col, vec_col, "label")).select(
        F.col(id_col), _vec_double(vec_col).alias("v"), "label"
    ).join(q, id_col)
    recon = "zip_with(qvec, v, (qi, x) -> cast(qi as double) * scale / 127.0)"
    rmse = F.sqrt(
        F.expr(
            f"aggregate(zip_with({recon}, v, (r, x) -> (r - x) * (r - x)), "
            "cast(0.0 as double), (a, e) -> a + e)"
        )
        / F.greatest(F.size("v"), F.lit(1))
    )
    scored = j.withColumn("r", F.expr(recon)).withColumn(
        "cos_vr", F.round(F.nanvl(F.try_divide(_dot("v", "r"), _norm("v") * _norm("r")), F.lit(None).cast("double")), 6)
    ).withColumn("rmse6", F.round(rmse, 6))
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(
                F.sum(F.col("rmse6").cast("decimal(18,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_rmse"),
            F.round(
                F.sum(F.col("cos_vr").cast("decimal(18,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_cosine"),
        )
    )


def quantized_topk(
    emb: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k in QUANTIZED space: scores are integer dot
    products of the int8 codes (exact — no float-order ambiguity until
    the final normalize), normalized by the code norms. The 100 TB
    shape of the memory/bandwidth-bound rerank stage: 4× fewer bytes
    through the shuffle and the broadcast than the fp32 baseline."""
    from pyspark.sql import Window

    q = quantize_int8(emb, id_col=id_col, vec_col=vec_col)
    qdot = F.expr(
        "aggregate(zip_with(qa, qb, (x, y) -> cast(x as bigint) * y), "
        "cast(0 as bigint), (a, p) -> a + p)"
    )
    qnorm = lambda c: F.sqrt(
        F.expr(
            f"aggregate(transform({c}, x -> cast(x as double) * x), "
            "cast(0.0 as double), (a, p) -> a + p)"
        )
    )
    queries = (
        q.filter(F.col(id_col) < num_queries)
        .select(F.col(id_col).alias("query_id"), F.col("qvec").alias("qa"))
        .withColumn("na", qnorm("qa"))
    )
    corpus = q.select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("qb")
    ).withColumn("nb", qnorm("qb"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_q", F.round(F.nanvl(F.try_divide(qdot, F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_q", "rnk")
    )


def hard_negative_mining(
    emb: DataFrame,
    k: int = 3,
    num_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the
    top-``k`` most-similar vectors with a DIFFERENT label — the
    standard negative-selection pass when building embedding training
    pairs (hardest negatives carry the gradient signal). Same
    broadcast-queries × streaming-corpus shape as ``brute_force_topk``
    with the label-inequality predicate fused into the join; at scale
    the corpus side would be IVF-pruned exactly like ann_ivf_topk."""
    from pyspark.sql import Window

    vecs = (emb).select(
        F.col(id_col).alias("qid"),
        _vec_double(vec_col).alias("va"),
        F.col(label_col).alias("lbl"),
    )
    queries = (
        vecs.filter(F.col("qid") < num_queries)
        .select(
            F.col("qid").alias("query_id"),
            F.col("va"),
            F.col("lbl").alias("query_label"),
        )
        .withColumn("na", _norm("va"))
    )
    corpus = vecs.select(
        F.col("qid").alias("negative_id"),
        F.col("va").alias("vb"),
        F.col("lbl").alias("negative_label"),
    ).withColumn("nb", _norm("vb"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_label") != F.col("negative_label"))
        .withColumn(
            "cosine", F.round(F.nanvl(F.try_divide(_dot("va", "vb"), F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "negative_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "query_label", "negative_id", "negative_label", "cosine", "rnk"
        )
    )


def hard_negative_mining_ivf(
    emb: DataFrame,
    k: int = 3,
    num_queries: int = 10,
    c: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    cents: DataFrame | None = None,
    assign: DataFrame | None = None,
) -> DataFrame:
    """IVF-pruned hard-negative mining — the at-scale variant of
    ``hard_negative_mining`` (VERDICT r05 #2): each anchor query mines
    negatives ONLY from its ``nprobe`` nearest IVF cells, with the
    label-inequality fused into the cell join, so the per-query cost is
    |corpus|·nprobe/c dot products instead of the full-corpus crossJoin.
    Approximate by construction (a hard negative assigned to an unprobed
    cell is missed; recall rises with nprobe) — the standard ANN-mining
    tradeoff.

    Scale: the probe table is broadcast-tiny (queries × nprobe rows);
    the corpus side joins on centroid_id EQUALITY (BroadcastHashJoin,
    never BroadcastNestedLoopJoin — plan-test-pinned). At 100 TB the
    corpus lives partitioned by centroid_id (``write_ivf_store``), so a
    mining pass with millions of anchors groups its probes by cell and
    streams each probed cell partition once.
    """
    from pyspark.sql import Window

    if cents is None:
        cents = centroids(emb, c=c, id_col=id_col, vec_col=vec_col)
    qlbl = emb.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("query_label")
    ).filter(F.col("query_id") < num_queries)
    probes = (
        _query_probes(
            emb, num_queries=num_queries, c=c, nprobe=nprobe,
            id_col=id_col, vec_col=vec_col, cents=cents,
        )
        .join(qlbl, "query_id")
        .withColumnRenamed("qv", "va")
        .withColumn("na", _norm("va"))
    )
    if assign is None:
        assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col, cents=cents)
    assign = assign.select(F.col("vec_id").alias("negative_id"), "centroid_id")
    corpus = (
        emb.select(
            F.col(id_col).alias("negative_id"),
            _vec_double(vec_col).alias("vb"),
            F.col(label_col).alias("negative_label"),
        )
        .transform(_spread)
        .join(assign, "negative_id")
        .withColumn("nb", _norm("vb"))
    )
    # single-cell corpus assignment ⇒ each (query, negative) pair joins at
    # most once across the nprobe probes — no dedup stage needed
    scored = (
        F.broadcast(probes)
        .join(corpus, "centroid_id")
        .filter(F.col("query_label") != F.col("negative_label"))
        .withColumn(
            "cosine", F.round(F.nanvl(F.try_divide(_dot("va", "vb"), F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "negative_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "query_label", "negative_id", "negative_label", "cosine", "rnk"
        )
    )


def embedding_covariance(
    emb: DataFrame,
    max_dim: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed covariance (upper-triangle) of the first ``max_dim``
    embedding dimensions — the X^T X building block of distributed PCA /
    whitening: cov_ij = S_ij/n − (S_i/n)(S_j/n) from per-row outer
    products. Eigen-decomposition of the resulting d×d matrix is a
    driver-side O(d³) afterthought at any corpus size; the DATA pass is
    this query.

    Determinism: each product is rounded to 9dp and summed through
    DECIMAL(28,9), so the sums are exact integers-scaled — independent
    of partitioning/aggregation order — and the final double math is
    the same two-operation formula on identical inputs in both engines
    (the PageRank float-discipline pattern).

    Scale: outer-product terms are generated MAP-SIDE from each row's
    array (no self-join), partially aggregated before the single d²-key
    shuffle — the shuffle carries ≤ partitions × d(d+1)/2 rows
    regardless of corpus size. For d in the hundreds (d² ~ 10⁵), the
    production variant replaces the explode with an Arrow-batched
    mapInPandas computing one numpy gemm per batch and emitting each
    batch's d×d partial — same associative merge, fewer rows; the
    explode form is kept registered because it is exactly
    SQL-replayable."""
    v = _vec_double(vec_col)
    base = (emb.select(vec_col)).select(v.alias("v"))
    n = base.agg(F.count("*").alias("n"))
    sums = (
        base.select(F.posexplode(F.slice("v", 1, max_dim)).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(F.expr("cast(round(x, 9) as decimal(28,9))")).alias("s"))
    )
    pairs = (
        base.select(
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(0, least(size(v), {max_dim}) - 1),"
                    f" i -> transform(sequence(i, least(size(v), {max_dim}) - 1),"
                    " j -> struct(i, j,"
                    " cast(round(v[i] * v[j], 9) as decimal(28,9)) AS p))))"
                )
            ).alias("t")
        )
        .select("t.i", "t.j", "t.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sp"))
    )
    si = sums.select(F.col("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("i").alias("j"), F.col("s").alias("sj"))
    return (
        pairs.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            # + 0.0 canonicalizes IEEE -0.0 → +0.0 (DuckDB's round can
            # emit -0.0; the driver hasher would see two distinct reprs)
            (
                F.round(
                    F.col("sp").cast("double") / F.col("n")
                    - (F.col("si").cast("double") / F.col("n"))
                    * (F.col("sj").cast("double") / F.col("n")),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def embedding_covariance_gemm(
    emb: DataFrame,
    max_dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """The BATCHED-GEMM form of :func:`embedding_covariance` (VERDICT
    r06 #6) — the production path for realistic dimensionality: the
    explode form emits d(d+1)/2 rows PER VECTOR before its partial
    aggregate (fine at d=16, a 295k-row-per-1k-vectors blow-up at
    d=768); here each Arrow batch computes ONE numpy gemm (Mᵀ·M) and
    emits d(d+1)/2 partial rows PER BATCH, so the shuffle carries
    ≤ batches × d² rows regardless of corpus size.

    Exactness contract (stronger than decimal-of-products): inputs are
    quantized JVM-SIDE to exact scaled int64s (round(x, 6) → decimal →
    ×10⁶), so the gemm is INTEGER arithmetic — associative, overflow-
    checked, independent of batch boundaries and aggregation order —
    and the DuckDB oracle replays the identical integers. The explode
    form instead rounds each PRODUCT to 9 dp; both are deterministic,
    but only input quantization survives arbitrary re-batching, which
    is exactly what mapInPandas does. Final covariance is the same
    two-operation double formula on both engines:
    cov_ij = (SP_ij/10¹²)/n − ((S_i/10⁶)/n)·((S_j/10⁶)/n).

    Scale: one corpus scan; per-batch python cost is one d×d int gemm
    (numpy, exact); S_i/n are JVM-side aggregates over the same
    quantized array. Batches are chunked to 64k rows so per-batch
    partial sums stay far from int64 range (|sx| ≤ 10⁷ for |x| ≤ 10 →
    per-element product ≤ 10¹⁴, per-chunk sum ≤ 6.5×10¹⁸ worst case —
    asserted, not assumed, via an int64 overflow check)."""
    import pandas as pd  # noqa: F401 (signature parity with siblings)

    # NaN/Inf elements (the poison-row class the r06 ANSI sweep hardened
    # cosine against) quantize to NULL via try_cast and coalesce to a
    # ZERO contribution — exactly the explode form's behavior, where the
    # NULL decimal product is skipped by SUM; without this the NULL
    # reaches numpy as NaN, int64-converts to INT64_MIN, and the gemm
    # silently wraps (review r07, repro'd live). FINITE magnitudes stay
    # loud: decimal(25,6) holds any |x| the scaled-long representation
    # can carry, so a finite |x| > ~9.2e12 fails the ANSI long cast with
    # an explicit overflow error rather than being silently zeroed
    # (review r07 follow-up — try_cast at decimal(18,6) swallowed it).
    quant = F.expr(
        f"transform(slice(transform({vec_col}, x -> cast(x as double)), 1, {max_dim}),"
        " x -> cast(coalesce(try_cast(round(x, 6) as decimal(25,6)),"
        " cast(0 as decimal(25,6))) * 1000000 as long))"
    )
    base = (emb.select(vec_col)).select(quant.alias("q")).where(
        F.size("q") > 0
    )
    n = base.agg(F.count("*").alias("n"))
    sums = (
        base.select(F.posexplode("q").alias("i", "sx"))
        .groupBy("i")
        .agg(F.sum(F.col("sx").cast("decimal(38,0)")).alias("sl"))
    )

    def _gemm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            arrs = pdf["q"].to_numpy()
            if len(arrs) == 0:
                continue
            for lo in range(0, len(arrs), 65536):
                chunk = arrs[lo : lo + 65536]
                rows = [np.asarray(a, dtype=np.int64) for a in chunk]
                # zero-pad ragged vectors to the chunk max dim: a
                # missing dim contributes nothing to sums/products in
                # the explode form, and a padded 0 contributes the
                # same nothing — identical semantics, no crash on
                # mixed-dimensionality corpora
                dmax = max(len(r) for r in rows)
                m = np.zeros((len(rows), dmax), dtype=np.int64)
                for ridx, r in enumerate(rows):
                    m[ridx, : len(r)] = r
                # int64 gemm is exact; verify no silent wraparound by
                # bounding |element| and row count against int64 range
                # (PYTHON ints throughout: np.int64 amax*amax — and
                # np.abs(INT64_MIN) itself — wrap in exactly the regime
                # this guard exists for)
                amax = max(int(m.max(initial=0)), -int(m.min(initial=0)))
                # explicit raise, not assert: the guard must survive
                # PYTHONOPTIMIZE/-O interpreters (ADVICE r07)
                if amax != 0 and len(rows) > (1 << 62) // (amax * amax):
                    raise ValueError(
                        "covariance gemm int64 overflow risk — shrink chunk"
                    )
                g = m.T @ m
                d = g.shape[0]
                iu, ju = np.triu_indices(d)
                yield pd.DataFrame(
                    {"i": iu.astype("int64"), "j": ju.astype("int64"), "sp": g[iu, ju]}
                )

    partials = base.mapInPandas(_gemm, "i long, j long, sp long")
    pairs = partials.groupBy("i", "j").agg(
        F.sum(F.col("sp").cast("decimal(38,0)")).alias("spl")
    )
    si = sums.select(F.col("i"), F.col("sl").alias("sil"))
    sj = sums.select(F.col("i").alias("j"), F.col("sl").alias("sjl"))
    nd = F.col("n").cast("double")
    return (
        pairs.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            (
                F.round(
                    (F.col("spl").cast("double") / F.lit(1e12)) / nd
                    - ((F.col("sil").cast("double") / F.lit(1e6)) / nd)
                    * ((F.col("sjl").cast("double") / F.lit(1e6)) / nd),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    k: int = 60,
    top: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09) —
    the standard way to combine rankings from heterogeneous retrievers
    (sparse lexical ⊕ dense embedding) WITHOUT score calibration:
    rrf(d) = Σ_lists 1/(k + rank_list(d)), absent-from-a-list
    contributing nothing. k=60 is the paper's constant; fusion depends
    only on RANKS, so a BM25 score and a cosine never need to share a
    scale.

    Determinism: input ranks are already deterministic (every retriever
    here tie-breaks on id); the fused score is a 6dp-rounded sum of
    exact reciprocals of small integers — identical in both engines —
    and the final top-``top`` tie-breaks on id.

    Scale: one full-outer join of two ranked lists (each already
    truncated to its retriever's top-N — candidate-sized, not
    corpus-sized) and a TakeOrdered cut. The per-query state is the
    union of the candidate lists."""
    a = ranks_a.select(
        F.col(id_col).alias("doc"), F.col(rank_col).alias("ra")
    )
    b = ranks_b.select(
        F.col(id_col).alias("doc"), F.col(rank_col).alias("rb")
    )
    score = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("ra")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(k) + F.col("rb")), F.lit(0.0)),
        6,
    )
    return (
        a.join(b, "doc", "full_outer")
        .select(
            F.col("doc").alias(id_col),
            score.alias("rrf_score"),
            F.col("ra").alias("sparse_rank"),
            F.col("rb").alias("dense_rank"),
        )
        .orderBy(F.col("rrf_score").desc(), id_col)
        .limit(top)
    )


def pca_top_component(
    emb: DataFrame,
    max_dim: int = 16,
    vec_col: str = "embedding",
    n_rounds: int = 3,
) -> DataFrame:
    """Top principal component of the embedding distribution by POWER
    ITERATION over the distributed covariance — the step after
    :func:`embedding_covariance` in any PCA/whitening pipeline, kept
    entirely in DataFrames: (i, loading, eigenvalue) for the dominant
    eigenvector estimate after ``n_rounds`` iterations from the uniform
    start v₀ = 1/√d.

    Determinism across engines (the pagerank float discipline applied
    to linear algebra): per-term products round to 12 dp and sum
    through DECIMAL(28,14) — matrix·vector rows and the norm are
    aggregation-order independent — and the iterate re-rounds to 10 dp
    after each normalization, so the unrolled DuckDB oracle replays
    every iteration bit-for-bit. The eigenvalue is the Rayleigh
    quotient vᵀCv of the final iterate (rounded 8 dp). Sign follows
    the iteration from the positive uniform start (deterministic; for
    a covariance matrix with positive dominant loadings this is the
    conventional orientation).

    Scale: the DATA pass is the covariance (gemm path — one corpus
    scan, d²-per-batch partials); everything here iterates d²-row /
    d-row tables, so per-round cost is O(d²) joins independent of
    corpus size — no driver-side matrix, no collect. The classical
    convergence caveat applies: power iteration needs |λ₁| > |λ₂|;
    ``n_rounds`` is fixed (not convergence-tested) so the result is a
    deterministic ESTIMATE, which is what makes it oracle-checkable."""
    from yamr_spark.materialize import materialize

    cov_ut = embedding_covariance_gemm(emb, max_dim=max_dim, vec_col=vec_col)
    full = materialize(
        cov_ut.unionByName(
            cov_ut.where(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), F.col("cov")
            )
        )
    )
    v, lam = _power_iteration(full, max_dim, n_rounds)
    return v.crossJoin(F.broadcast(lam)).select(
        "i", F.col("v").alias("loading"), "eigenvalue"
    )


def _power_iteration(full: DataFrame, max_dim: int, n_rounds: int):
    """Shared decimal-disciplined power-iteration loop over a full
    (i, j, cov) matrix table: returns (v, lam) — the d-row final
    iterate and the 1-row Rayleigh-quotient eigenvalue. Factored out of
    :func:`pca_top_component` so the deflation variant
    (:func:`pca_top_components`) replays the identical arithmetic."""
    from yamr_spark.materialize import materialize

    v = full.select("i").distinct().select(
        "i",
        F.round(F.lit(1.0) / F.sqrt(F.lit(float(max_dim))), 10).alias("v"),
    )
    # The iterate v is d rows (≤ max_dim) but each round's materialize
    # leaves it a stats-less LogicalRDD, so without a hint every
    # matrix·vector join planned as an exchange-backed join of two tiny
    # tables — 2 exchanges × n_rounds of pure fixed cost (guide §3.1:
    # "estimates are often badly wrong … use an explicit broadcast hint
    # when you know a side is small"). Broadcasting v is always right:
    # it is bounded by the embedding dimension, never the corpus.
    for _ in range(n_rounds):
        w = (
            full.join(
                F.broadcast(
                    v.select(F.col("i").alias("j"), F.col("v").alias("vj"))
                ),
                "j",
            )
            .select(
                "i",
                F.round(F.col("cov") * F.col("vj"), 12)
                .cast("decimal(28,14)")
                .alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").alias("w"))
        )
        nrm = w.agg(
            F.sqrt(
                F.sum(
                    F.expr(
                        "cast(round(cast(w as double) * cast(w as double), 12)"
                        " as decimal(28,14))"
                    )
                ).cast("double")
            ).alias("nrm")
        )
        v = materialize(
            w.crossJoin(F.broadcast(nrm)).select(
                "i",
                # nrm = 0 (constant/degenerate embeddings → zero
                # covariance) must yield NULL loadings, not an ANSI
                # DIVIDE_BY_ZERO job kill (the repo's pinned rule:
                # every data-derived denominator is guarded)
                F.when(
                    F.col("nrm") > 0,
                    F.round(F.col("w").cast("double") / F.col("nrm"), 10),
                ).alias("v"),
            )
        )
    lam = (
        full.join(
            F.broadcast(v.select(F.col("i").alias("i"), F.col("v").alias("va"))),
            "i",
        )
        .join(
            F.broadcast(v.select(F.col("i").alias("j"), F.col("v").alias("vb"))),
            "j",
        )
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("va") * F.col("cov") * F.col("vb"), 12).cast(
                        "decimal(28,14)"
                    )
                ).cast("double"),
                8,
            ).alias("eigenvalue")
        )
    )
    return v, lam


def pca_top_components(
    emb: DataFrame,
    max_dim: int = 16,
    vec_col: str = "embedding",
    n_components: int = 2,
    n_rounds: int = 3,
) -> DataFrame:
    """Top-``n_components`` principal components by power iteration
    WITH HOTELLING DEFLATION — the multi-component extension of
    :func:`pca_top_component`: after extracting (v₁, λ₁), the matrix
    deflates to C₂ = C − λ₁·v₁·v₁ᵀ (whose dominant eigenpair is the
    original second component, classical deflation), and the iteration
    repeats. Returns (component, i, loading, eigenvalue) — component
    is 1-based in decreasing-eigenvalue order.

    Determinism: each extraction replays :func:`_power_iteration`'s
    decimal discipline bit-for-bit; the deflated entry is
    round(cov − coalesce(round(λ·vᵢ·vⱼ, 12), 0), 8) — scalar per-entry
    arithmetic with no aggregation, so it is layout-independent by
    construction, and the DuckDB oracle unrolls the identical chain.
    The coalesce keeps a degenerate (all-zero covariance → NULL
    loadings) matrix unchanged rather than poisoning later components
    with NULLs. Outputs canonicalize −0.0 → +0.0 (the driver-hash
    rule for round()-produced zeros).

    Scale: ONE corpus scan total (the gemm covariance is computed once
    and reused across components — deflation operates on the d²-row
    matrix table); per-component cost is n_rounds d²-row joins plus one
    d²-row deflation map, all corpus-size independent. n_components
    sequential extractions are inherent to deflation (each needs the
    previous eigenpair); for k beyond a handful, block/subspace
    iteration would amortize rounds across components — out of scope
    while k is small."""
    from yamr_spark.materialize import materialize

    cov_ut = embedding_covariance_gemm(emb, max_dim=max_dim, vec_col=vec_col)
    cur = materialize(
        cov_ut.unionByName(
            cov_ut.where(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), F.col("cov")
            )
        )
    )
    out = None
    for comp in range(1, n_components + 1):
        v, lam = _power_iteration(cur, max_dim, n_rounds)
        rows = v.crossJoin(F.broadcast(lam)).select(
            F.lit(comp).cast("long").alias("component"),
            "i",
            (F.col("v") + F.lit(0.0)).alias("loading"),
            (F.col("eigenvalue") + F.lit(0.0)).alias("eigenvalue"),
        )
        out = rows if out is None else out.unionByName(rows)
        if comp < n_components:
            va = v.select(F.col("i"), F.col("v").alias("va"))
            vb = v.select(F.col("i").alias("j"), F.col("v").alias("vb"))
            cur = materialize(
                cur.join(F.broadcast(va), "i")
                .join(F.broadcast(vb), "j")
                .crossJoin(F.broadcast(lam))
                .select(
                    "i",
                    "j",
                    F.round(
                        F.col("cov")
                        - F.coalesce(
                            F.round(
                                F.col("eigenvalue") * F.col("va") * F.col("vb"),
                                12,
                            ),
                            F.lit(0.0),
                        ),
                        8,
                    ).alias("cov"),
                )
            )
    return out


def quantized_ivf_topk(
    emb: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    c: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    assign: DataFrame | None = None,
) -> DataFrame:
    """IVF × int8 — the composed production ANN shape (what FAISS calls
    IVF-SQ8): the coarse probe runs in fp32 over the TINY centroid
    table, candidate scoring runs on int8 codes inside the ``nprobe``
    probed cells only. Composes the two scale levers this module builds
    separately: |corpus|·nprobe/c candidates (``ivf_topk``) AND 4×
    fewer bytes per candidate through broadcast/shuffle
    (``quantized_topk``, whose r05 review called the un-pruned form a
    full-scan baseline). Ranking rule is identical to quantized_topk
    restricted to probed cells; integer dot products keep the score
    arithmetic float-order-unambiguous."""
    from pyspark.sql import Window

    qdot = F.expr(
        "aggregate(zip_with(qa, qb, (x, y) -> cast(x as bigint) * y), "
        "cast(0 as bigint), (a, p) -> a + p)"
    )

    def qnorm(col: str):
        return F.sqrt(
            F.expr(
                f"aggregate(transform({col}, x -> cast(x as double) * x), "
                "cast(0.0 as double), (a, p) -> a + p)"
            )
        )

    if cents is None:
        cents = centroids(emb, c=c, id_col=id_col, vec_col=vec_col)
    probes = _query_probes(
        emb, num_queries=num_queries, c=c, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, cents=cents,
    ).select("query_id", "centroid_id")
    q = quantize_int8(emb, id_col=id_col, vec_col=vec_col)
    qcodes = (
        q.filter(F.col(id_col) < num_queries)
        .select(F.col(id_col).alias("query_id"), F.col("qvec").alias("qa"))
        .withColumn("na", qnorm("qa"))
    )
    if assign is None:
        assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col, cents=cents)
    assign = assign.select(F.col("vec_id").alias("neighbor_id"), "centroid_id")
    corpus = (
        q.select(F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("qb"))
        .join(assign, "neighbor_id")
        .withColumn("nb", qnorm("qb"))
    )
    scored = (
        F.broadcast(probes.join(qcodes, "query_id"))
        .join(corpus, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_q", F.round(F.nanvl(F.try_divide(qdot, F.col("na") * F.col("nb")), F.lit(None).cast("double")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_q").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_q", "rnk")
    )


def mmr_topk(
    emb: DataFrame,
    query_id: int = 0,
    top_n: int = 20,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick ``k`` results that balance relevance to
    the query against redundancy with what is already picked —
    ``mmr(c) = lam * rel(c) - (1 - lam) * max_{s in S} cos(c, s)`` —
    the standard diversity-aware selection for retrieval results and
    for sampling training examples that are relevant but not
    near-duplicates of each other.

    Determinism: the query is the ``query_id`` vector, candidates are
    the ``top_n`` highest-relevance vectors (cosine rounded to 6 dp,
    ties by vec_id), and every per-step argmax breaks ties by vec_id —
    no RNG anywhere, so the DuckDB oracle replays the greedy unrolled.

    Scale plan: the only corpus-sized work is the relevance pass — a
    broadcast-query cosine scan + TakeOrdered top_n (per-partition
    heaps, no global sort; swap the IVF probe in for the scan at index
    scale). The greedy loop is inherently sequential BY DEFINITION
    (step i depends on picks 1..i-1) and runs over the top_n candidate
    rows only: k-1 joins of at most top_n x k rows, each iteration
    collecting exactly ONE winner row (bounded by k rows total,
    independent of corpus size — the stream-side/serve-side split, not
    a driver loop over data). All arithmetic stays in Spark
    expressions, sharing the NaN/zero-norm NULL-cosine contract."""
    if k < 1 or top_n < k:
        raise ValueError(f"need top_n >= k >= 1, got top_n={top_n}, k={k}")
    vecs = (emb.select("vec_id", "embedding")).select(
        "vec_id", _vec_double("embedding").alias("v")
    )
    q = vecs.where(F.col("vec_id") == query_id).select(F.col("v").alias("va"))
    cands = materialize(
        with_cosine(
            vecs.withColumnRenamed("v", "vb").crossJoin(F.broadcast(q)),
            "va",
            "vb",
        )
        .where(F.col("vec_id") != query_id)
        .where(F.col("cosine").isNotNull())
        .select("vec_id", F.col("vb").alias("v"), F.col("cosine").alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(top_n)
    )
    spark = emb.sparkSession
    lam_c = F.lit(float(lam))
    picked: list[tuple[int, int, float, float]] = []  # rank, id, rel, mmr
    sel_ids: list[int] = []
    for rank in range(1, k + 1):
        remaining = cands.where(~F.col("vec_id").isin(sel_ids) if sel_ids else F.lit(True))
        if sel_ids:
            sel = cands.where(F.col("vec_id").isin(sel_ids)).select(
                F.col("vec_id").alias("s_id"), F.col("v").alias("sv")
            )
            scored = (
                with_cosine(
                    remaining.crossJoin(F.broadcast(sel)), "v", "sv"
                )
                .groupBy("vec_id")
                .agg(
                    F.first("rel").alias("rel"),
                    F.max("cosine").alias("maxsim"),
                )
            )
        else:
            scored = remaining.select(
                "vec_id", "rel", F.lit(0.0).alias("maxsim")
            )
        winner = (
            scored.withColumn(
                "mmr",
                F.round(
                    lam_c * F.col("rel")
                    - (F.lit(1.0) - lam_c) * F.col("maxsim"),
                    6,
                ),
            )
            .orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1)
            .collect()
        )
        if not winner:
            break
        w = winner[0]
        picked.append((rank, w["vec_id"], float(w["rel"]), float(w["mmr"])))
        sel_ids.append(w["vec_id"])
    return spark.createDataFrame(
        picked, "rank bigint, vec_id bigint, relevance double, mmr_score double"
    )


# ── Product quantization (PQ) — the memory-bound ANN path ────────────


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, code_id, cvec) — deterministic per-subspace codebooks: the
    ``k`` lowest-id vectors' subvectors (the ``centroids()`` discipline:
    a production system trains per-subspace k-means, the engine keeps
    seeding deterministic so every code assignment is reproducible and
    oracle-checkable; the encode/ADC machinery downstream is identical
    either way). The ROW_NUMBER code ids run over a ``limit(k)``-bounded
    table — the benign constant-size global-window case."""
    from pyspark.sql import Window

    if d % m:
        raise ValueError(f"d={d} not divisible into m={m} subspaces")
    dsub = d // m
    seeds = (
        emb.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col), _vec_double(vec_col).alias("v"))
        .withColumn(
            "code_id", F.row_number().over(Window.orderBy(id_col)) - F.lit(1)
        )
    )
    subs = F.explode(
        F.expr(
            f"transform(sequence(0, {m - 1}), s -> "
            f"struct(s AS sub, slice(v, s * {dsub} + 1, {dsub}) AS cvec))"
        )
    ).alias("sc")
    return seeds.select("code_id", subs).select(
        F.col("sc.sub").alias("sub"), "code_id", F.col("sc.cvec").alias("cvec")
    )


def _pq_subspace_dists(
    emb: DataFrame,
    books: DataFrame,
    m: int,
    d: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vec_id, sub, code_id, l2) — every vector's subvector scored
    (squared L2) against every codebook entry of its subspace. The
    fold runs in array-index order on both engines, so the doubles are
    bit-identical cross-engine (the cosine discipline)."""
    dsub = d // m
    vsubs = (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v")
    ).select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> "
                f"struct(s AS sub, slice(v, s * {dsub} + 1, {dsub}) AS vsub))"
            )
        ).alias("sv"),
    ).select("vec_id", F.col("sv.sub").alias("sub"), F.col("sv.vsub").alias("vsub"))
    l2 = (
        "aggregate(zip_with(vsub, cvec, (x, y) -> (x - y) * (x - y)), "
        "0D, (a, p) -> a + p)"
    )
    return (
        vsubs.join(F.broadcast(books), "sub")
        .withColumn("l2", F.expr(l2))
        .select("vec_id", "sub", "code_id", "l2")
    )


def pq_encode(
    emb: DataFrame,
    books: DataFrame | None = None,
    m: int = 4,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dists: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, sub, code_id) — PQ codes: each subvector's nearest
    codebook entry by squared L2 (ties → lower code id). The argmin is
    a partial-aggregated ``min_by`` (map side reduces each vector's
    m×k scored rows before any exchange); at 10¹² rows the vectors
    never move — only codes (m small ints per vector) ship.

    ``dists`` optionally supplies a precomputed ``_pq_subspace_dists``
    frame (e.g. one materialized and shared with the ADC LUT build) so
    the argmin/tie-break lives in exactly one place for every caller."""
    if dists is None:
        if books is None:
            raise ValueError("pq_encode needs books or a precomputed dists")
        dists = _pq_subspace_dists(emb, books, m, d, id_col, vec_col)
    return (
        dists.groupBy("vec_id", "sub")
        .agg(
            F.min_by(
                "code_id", F.struct(F.col("l2"), F.col("code_id"))
            ).alias("code_id")
        )
    )


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    m: int = 4,
    k: int = 16,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the
    memory-bound production ANN path (Jégou et al., TPAMI 2011 shape):
    the corpus is m small integer codes per vector; a query builds an
    m×k lookup table of exact subspace distances ONCE, and every
    approximate distance is m table lookups + adds, never touching the
    original vectors.

    Determinism/oracle: per-subspace distances round to 9dp and sum as
    DECIMAL(28,9) — exact, aggregation-order-independent — so ranking
    (adist asc, neighbor_id) replays identically in DuckDB; adist is
    the decimal cast to double (one deterministic conversion).

    Scale: codes = vecs×m rows of 3 small ints (ONE broadcast-scored
    encode pass; the d-dim vectors never shuffle); the LUT is
    n_queries·m·k rows — parameter-bounded, broadcast; the
    ADC join partial-aggregates map-side so the exchange carries
    (query, neighbor) partials, and the top-k window partitions by
    query. For corpus-scale query sets, co-partition codes and LUT on
    sub — same plan shape, no broadcast."""
    from pyspark.sql import Window

    if books is None:
        books = pq_codebooks(emb, m=m, k=k, d=d, id_col=id_col, vec_col=vec_col)
    dists = materialize(
        _pq_subspace_dists(emb, books, m, d, id_col, vec_col)
    )
    codes = pq_encode(emb, dists=dists)
    lut = (
        dists.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            "sub",
            "code_id",
            F.round(F.col("l2"), 9).cast("decimal(28,9)").alias("l2r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adist_dec", "neighbor_id")
    return (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(lut), ["sub", "code_id"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("l2r").alias("adist_dec"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            F.col("adist_dec").cast("double").alias("adist"),
            "rnk",
        )
    )


def ivf_pq_topk(
    emb: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    c: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k: int = 16,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    assign: DataFrame | None = None,
    books: DataFrame | None = None,
) -> DataFrame:
    """IVF×PQ top-k — the IVFADC composition (Jégou et al., TPAMI 2011
    §V shape): the coarse IVF quantizer prunes the corpus to each
    query's ``nprobe`` nearest cells, and ONLY those cells' PQ codes
    are ADC-scanned. Flat ADC (``pq_adc_topk``) is memory-cheap but
    still touches every code per query; this composition touches
    ``nprobe/c`` of them — the actual production ANN memory/latency
    point at 100 TB, where codes are stored partitioned by
    ``centroid_id`` (the ``write_ivf_store`` layout) so a probe is a
    directory-pruned scan of integer codes.

    Engineering deltas vs textbook IVFADC, chosen for oracle-exact
    determinism (plan shape is unchanged by either):
    - codes encode the RAW vectors, not residuals (v − centroid):
      residual encoding is a codebook-TRAINING refinement; the probe /
      prune / LUT / ADC machinery is identical.
    - codebooks/centroids are the deterministic lowest-id seeds (the
      ``centroids()`` discipline) instead of k-means-trained.

    Determinism/oracle: identical to ``pq_adc_topk`` — per-subspace
    distances round to 9 dp and sum as DECIMAL(28,9) (exact,
    aggregation-order-independent), ranking is (adist asc,
    neighbor_id), adist is one decimal→double conversion.

    Scale: the subspace-distance table is built ONCE and shared by the
    encode argmin and the query LUT; codes (vecs×m rows of 3 small
    ints) join the (vec_id → centroid_id) assignment — at 10¹² rows
    both sides are pre-bucketed on vec_id in the stored layout. The
    probe×LUT table is n_queries·nprobe·m·k rows — parameter-bounded,
    broadcast. The ADC join partial-aggregates map-side; the top-k
    window partitions by query_id.

    ``cents``/``assign`` optionally reuse the session-shared IVF
    centroid/assignment frames (identical by construction to what this
    would build)."""
    from pyspark.sql import Window

    probes = _query_probes(
        emb, num_queries=n_queries, c=c, nprobe=nprobe, id_col=id_col,
        vec_col=vec_col, cents=cents,
    )
    if assign is None:
        assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col, cents=cents)
    assign = assign.select("vec_id", "centroid_id")

    if books is None:
        books = pq_codebooks(emb, m=m, k=k, d=d, id_col=id_col, vec_col=vec_col)
    dists = materialize(_pq_subspace_dists(emb, books, m, d, id_col, vec_col))
    codes = pq_encode(emb, dists=dists)
    lut = dists.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        "sub",
        "code_id",
        F.round(F.col("l2"), 9).cast("decimal(28,9)").alias("l2r"),
    )
    # each query's LUT replicated onto its probed cells: n_q·nprobe·m·k
    # rows — parameter-bounded, broadcast
    qlut = probes.select("query_id", "centroid_id").join(lut, "query_id")
    celled = codes.withColumnRenamed("vec_id", "neighbor_id").join(
        assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    )
    w = Window.partitionBy("query_id").orderBy("adist_dec", "neighbor_id")
    return (
        celled.join(F.broadcast(qlut), ["centroid_id", "sub", "code_id"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("l2r").alias("adist_dec"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            F.col("adist_dec").cast("double").alias("adist"),
            "rnk",
        )
    )


def pq_codebooks_kmeans(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    d: int = 64,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, code_id, cvec) — per-subspace Lloyd-refined PQ codebooks:
    seed with the deterministic lowest-id codebooks, then assign every
    subvector to its nearest codeword (squared L2, ties → lower code)
    and replace each codeword with the MEAN of its assigned subvectors
    — the actual PQ training step (Jégou et al. §II train per-subspace
    k-means). The measured point of this operator: untrained seed
    codebooks give recall@5 ≈ 0.10-0.34 on the fixtures; one Lloyd
    iteration more than doubles it (SCALE.md r11 recall table).

    Determinism/oracle: means round to 6 dp per (sub, code_id, dim) —
    the ``kmeans_refine`` discipline (layout-sweep-verified) — so the
    refined codebooks rebuild bit-identically in SQL. Codewords that
    attract no subvectors drop on both engines identically (GROUP BY).

    Scale: each iteration is one broadcast-codebook scoring pass (the
    shared ``_pq_subspace_dists`` shape) + one partial-aggregated mean
    whose shuffle carries k·d cells per map task, never vectors. At
    10¹² rows: train on a sample, assign all — same plan."""
    books = pq_codebooks(emb, m=m, k=k, d=d, id_col=id_col, vec_col=vec_col)
    dsub = d // m
    vsubs = (
        (emb.select(id_col, vec_col))
        .select(F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v"))
        .select(
            "vec_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {m - 1}), s -> "
                    f"struct(s AS sub, slice(v, s * {dsub} + 1, {dsub}) AS vsub))"
                )
            ).alias("sv"),
        )
        .select("vec_id", F.col("sv.sub").alias("sub"), F.col("sv.vsub").alias("vsub"))
    )
    for _ in range(iters):
        dists = _pq_subspace_dists(emb, books, m, d, id_col, vec_col)
        codes = pq_encode(emb, dists=dists)
        dims = codes.join(vsubs, ["vec_id", "sub"]).select(
            "sub", "code_id", F.posexplode("vsub").alias("dim", "x")
        )
        means = dims.groupBy("sub", "code_id", "dim").agg(
            F.round(F.avg("x"), 6).alias("value")
        )
        books = (
            means.groupBy("sub", "code_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "value"))).alias("dv")
            )
            .select(
                "sub", "code_id", F.expr("transform(dv, s -> s.value)").alias("cvec")
            )
        )
    return books


def write_ivf_pq_store(
    emb: DataFrame,
    out_dir: str,
    c: int = 8,
    m: int = 4,
    k: int = 16,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: DataFrame | None = None,
    books: DataFrame | None = None,
) -> None:
    """Materialize the PQ CODES partitioned by centroid_id — the full
    IVFADC serving layout (Jégou et al. §V: inverted lists of codes).
    Each cell directory holds m small ints per vector (here 4 codes vs
    64 floats: 64× smaller than the raw-vector IVF store), so a probe
    is a directory-pruned scan of compressed codes and the original
    vectors are never read on the serving path at all.

    Codes are stored WIDE (one row per vector, array indexed by
    subspace — collect_list sorted by sub) to keep rows fixed-width and
    files small; the probe explodes them back to (sub, code_id)."""
    if assign is None:
        assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col)
    assign = assign.select("vec_id", "centroid_id")
    if books is None:
        books = pq_codebooks(emb, m=m, k=k, d=d, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(emb, books, m=m, d=d, id_col=id_col, vec_col=vec_col)
    wide = (
        codes.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code_id"))).alias("sc"))
        .select("vec_id", F.expr("transform(sc, s -> s.code_id)").alias("codes"))
    )
    wide.join(assign, "vec_id").write.partitionBy("centroid_id").mode(
        "overwrite"
    ).parquet(out_dir)


def ivf_pq_store_topk(
    spark,
    store_dir: str,
    emb: DataFrame,
    topk: int = 5,
    n_queries: int = 10,
    c: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k: int = 16,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    books: DataFrame | None = None,
) -> DataFrame:
    """``ivf_pq_topk`` against the partitioned CODE store: probed cell
    ids are collected (≤ c ints — metadata) and pushed as a literal
    partition filter, so Spark directory-prunes before listing a single
    unprobed cell's files; the scan reads m-int code rows, never
    vectors. The query-side LUT is built from the QUERY vectors only
    (n_queries·m·k exact subspace distances — the same rows
    ``ivf_pq_topk`` takes from its full dists table). Results are
    identical to ``ivf_pq_topk`` by construction (same centroids,
    assignment, codebooks, decimal ADC ranking)."""
    from pyspark.sql import Window

    probes = _query_probes(
        emb, num_queries=n_queries, c=c, nprobe=nprobe, id_col=id_col,
        vec_col=vec_col, cents=cents,
    ).transform(materialize)
    cells = sorted(
        r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()
    )
    if books is None:
        books = pq_codebooks(emb, m=m, k=k, d=d, id_col=id_col, vec_col=vec_col)
    qdists = _pq_subspace_dists(
        emb.filter(F.col(id_col) < n_queries), books, m, d, id_col, vec_col
    )
    lut = qdists.select(
        F.col("vec_id").alias("query_id"),
        "sub",
        "code_id",
        F.round(F.col("l2"), 9).cast("decimal(28,9)").alias("l2r"),
    )
    qlut = probes.select("query_id", "centroid_id").join(lut, "query_id")
    celled = probe_store_cells(spark, store_dir, cells).select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid_id",
        F.posexplode("codes").alias("sub", "code_id"),
    )
    w = Window.partitionBy("query_id").orderBy("adist_dec", "neighbor_id")
    return (
        celled.join(F.broadcast(qlut), ["centroid_id", "sub", "code_id"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("l2r").alias("adist_dec"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            F.col("adist_dec").cast("double").alias("adist"),
            "rnk",
        )
    )


def ivf_pq_residual_topk(
    emb: DataFrame,
    n_queries: int = 10,
    topk: int = 5,
    c: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k: int = 16,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    assign: DataFrame | None = None,
) -> DataFrame:
    """TEXTBOOK IVFADC (Jégou et al., TPAMI 2011 §V, residual form):
    PQ encodes each vector's RESIDUAL from its coarse centroid
    (v − c(v)), not the raw vector — residuals concentrate near the
    origin, so a fixed code budget spends its resolution on the
    within-cell displacement instead of re-describing cell location.
    The query side mirrors it per probed cell: the LUT for (query q,
    cell c) scores q's residual q − cvec(c) against the codebooks, so
    ADC distances approximate ||q − c − code|| within each cell.

    This completes the PQ family's paper parity: raw-vector IVF×PQ
    (``ivf_pq_topk``) isolates the cell-pruning composition; this
    operator adds the residual trick. (Here the LUT cost is
    n_q·nprobe·m·k — nprobe× the raw variant's, the textbook trade.)

    Determinism/oracle: residual subtraction is exact IEEE double
    arithmetic on both engines; everything downstream reuses the
    decimal ADC discipline (9dp-rounded subspace distances summed as
    DECIMAL(28,9), rank by (adist asc, neighbor_id)).

    Scale: residuals are computed map-side under the broadcast centroid
    table and exist only inside the one materialized subspace-distance
    build; codes (m small ints) are what shuffles. The per-cell LUT is
    parameter-bounded and broadcast."""
    from pyspark.sql import Window

    if cents is None:
        cents = centroids(emb, c=c, id_col=id_col, vec_col=vec_col)
    if assign is None:
        assign = ivf_assign(emb, c=c, id_col=id_col, vec_col=vec_col, cents=cents)
    assign = assign.select("vec_id", "centroid_id")

    vecs = (emb.select(id_col, vec_col)).select(
        F.col(id_col).alias("vec_id"), _vec_double(vec_col).alias("v")
    )
    resid = (
        vecs.join(assign, "vec_id")
        .join(F.broadcast(cents), "centroid_id")
        .select(
            "vec_id",
            "centroid_id",
            F.expr("zip_with(v, cvec, (x, y) -> x - y)").alias("rv"),
        )
    )
    books = pq_codebooks(
        resid.select("vec_id", "rv"), m=m, k=k, d=d, id_col="vec_id", vec_col="rv"
    )
    dists = materialize(
        _pq_subspace_dists(
            resid.select("vec_id", "rv"), books, m, d, "vec_id", "rv"
        )
    )
    codes = pq_encode(emb, dists=dists)

    probes = _query_probes(
        emb, num_queries=n_queries, c=c, nprobe=nprobe, id_col=id_col,
        vec_col=vec_col, cents=cents,
    )
    dsub = d // m
    qsubs = (
        probes.join(F.broadcast(cents), "centroid_id")
        .select(
            "query_id",
            "centroid_id",
            F.expr("zip_with(qv, cvec, (x, y) -> x - y)").alias("qr"),
        )
        .select(
            "query_id",
            "centroid_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {m - 1}), s -> "
                    f"struct(s AS sub, slice(qr, s * {dsub} + 1, {dsub}) AS vsub))"
                )
            ).alias("sv"),
        )
        .select(
            "query_id", "centroid_id",
            F.col("sv.sub").alias("sub"), F.col("sv.vsub").alias("vsub"),
        )
    )
    l2 = (
        "aggregate(zip_with(vsub, cvec, (x, y) -> (x - y) * (x - y)), "
        "0D, (a, p) -> a + p)"
    )
    qlut = (
        qsubs.join(F.broadcast(books), "sub")
        .withColumn("l2", F.expr(l2))
        .select(
            "query_id",
            "centroid_id",
            "sub",
            "code_id",
            F.round(F.col("l2"), 9).cast("decimal(28,9)").alias("l2r"),
        )
    )
    celled = codes.withColumnRenamed("vec_id", "neighbor_id").join(
        assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    )
    w = Window.partitionBy("query_id").orderBy("adist_dec", "neighbor_id")
    return (
        celled.join(F.broadcast(qlut), ["centroid_id", "sub", "code_id"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("l2r").alias("adist_dec"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            F.col("adist_dec").cast("double").alias("adist"),
            "rnk",
        )
    )


def ivf_pq_store_append(
    new_emb: DataFrame,
    store_dir: str,
    books: DataFrame,
    cents: DataFrame,
    m: int = 4,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: DataFrame | None = None,
) -> None:
    """Append a NEW batch of vectors to an existing IVF×PQ code store —
    the living-index operation: the index's trained parameters
    (``cents`` coarse centroids, ``books`` codebooks) are FROZEN at
    creation, so appending is one broadcast-score assignment + one
    encode pass over the new batch only, writing m-int code rows into
    the existing centroid_id directories. Nothing already stored is
    read or rewritten, and probes see old + new uniformly because
    per-vector assignment/encoding depend only on (vector, params).

    Retry semantics: plain ``append`` here — a production pipeline
    lands each ingest batch under its own second-level partition (the
    sketch stores' ``batch_id=`` dynamic-overwrite discipline,
    streaming/cms.py) so a replayed batch overwrites itself instead of
    double-appending; the probe path is identical either way."""
    if assign is None:
        assign = ivf_assign(new_emb, id_col=id_col, vec_col=vec_col, cents=cents)
    assign = assign.select("vec_id", "centroid_id")
    codes = pq_encode(new_emb, books, m=m, d=d, id_col=id_col, vec_col=vec_col)
    wide = (
        codes.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code_id"))).alias("sc"))
        .select("vec_id", F.expr("transform(sc, s -> s.code_id)").alias("codes"))
    )
    wide.join(assign, "vec_id").write.partitionBy("centroid_id").mode(
        "append"
    ).parquet(store_dir)
