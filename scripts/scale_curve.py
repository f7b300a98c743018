"""Measured scaling curve for the dedup family.

"Would this survive 100×?" answered with data instead of assertion:
replicate the sf0.1 documents corpus k× (k = 1, 4, 16) and time the
four core dedup operators at each size on the same local[32] session.

Replication is VOCABULARY-SALTED: every word in replica r gets an
``_r`` suffix, so replicas share zero shingles and the scaled corpus
behaves like r independent corpora of identical density — the honest
linear-scaling setup. (Naive byte-identical replication is the
opposite: every doc gains r exact copies, LSH buckets hold r-sized
identical groups, and candidate pairs grow as r² by construction —
that measures the skew path, not throughput.)

Each (operator, k) cell is min-of-2 on a warmed session. Output: one
JSON line per cell plus a final summary table, pasteable into
SCALE.md.

Usage: python scripts/scale_curve.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FACTORS = [1, 4, 16]
REPS = 2


def build_scaled(spark, sf_dir: str, out_dir: str) -> dict[int, str]:
    """Write salted k-replica corpora to parquet so every run starts
    from a comparable columnar scan (not a cached in-memory union)."""
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = base.count()
    paths = {}
    for k in FACTORS:
        path = os.path.join(out_dir, f"documents_x{k}.parquet")
        if not os.path.exists(path):
            parts = []
            for r in range(k):
                rep = base.select(
                    (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                    (
                        F.col("text")
                        if r == 0
                        else F.regexp_replace("text", r"(\w+)", rf"$1_{r}")
                    ).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.repartition(max(4, 2 * k)).write.mode("overwrite").parquet(path)
        paths[k] = path
    return paths


def build_scaled_emb(spark, sf_dir: str, out_dir: str) -> dict[int, str]:
    """k-replica embeddings with a deterministic per-replica
    perturbation (hash-derived per-component offset), so replicas are
    distinct vectors with distinct neighborhoods — byte-identical
    copies would hand every query k tied exact twins and measure tie
    handling, not scan cost."""
    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = base.count()
    paths = {}
    for k in FACTORS:
        path = os.path.join(out_dir, f"embeddings_x{k}.parquet")
        if not os.path.exists(path):
            parts = []
            for r in range(k):
                jitter = (
                    f"transform(embedding, (x, i) -> "
                    f"CAST(x + (pmod(vec_id * 31 + i * 7 + {r}, 17) - 8) * "
                    f"{0.0 if r == 0 else 0.01} AS FLOAT))"
                )
                parts.append(
                    base.select(
                        (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                        F.expr(jitter).alias("embedding"),
                        "label",
                    )
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.repartition(max(4, 2 * k)).write.mode("overwrite").parquet(path)
        paths[k] = path
    return paths


def ann_operators(n_vecs: int):
    import math

    from yamr_spark.operators import similarity as S

    c = max(8, math.isqrt(n_vecs))
    return {
        "ann_brute_topk(q=50)": lambda df: S.brute_force_topk(
            df, k=5, num_queries=50
        ),
        f"ann_ivf_topk(q=50,c={c})": lambda df: S.ivf_topk(
            df, k=5, num_queries=50, c=c, nprobe=2
        ),
    }


def operators():
    from yamr_spark.operators import dedup as D

    return {
        "dedup_exact": lambda df: D.exact_dedup(df),
        "minhash_near_dup": lambda df: D.minhash_near_dup(df),
        "simhash_near_dup": lambda df: D.simhash_near_dup(df),
        "ngram_jaccard_pairs": lambda df: D.ngram_jaccard_pairs(df),
    }


def build_identical(spark, sf_dir: str, out_dir: str, k: int) -> str:
    """The ADVERSARIAL corpus: k byte-identical copies of every doc
    (ids distinct). Every LSH bucket holds a k-sized identical group,
    so candidate pairs grow as k² — the duplicate-heavy crawl shape."""
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = base.count()
    path = os.path.join(out_dir, f"documents_ident_x{k}.parquet")
    if not os.path.exists(path):
        parts = [
            base.select(
                (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(2 * k).write.mode("overwrite").parquet(path)
    return path


def skew_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Duplicate-heavy corpora break naive LSH (k² candidates); the
    production mitigation is ordering: exact dedup FIRST, LSH on the
    survivors. Measure both on the same 16x byte-identical corpus."""
    from yamr_spark.operators import dedup as D

    k = FACTORS[-1]
    docs = spark.read.parquet(build_identical(spark, sf_dir, out_dir, k))
    docs.count()

    def naive():
        return D.minhash_near_dup(docs)

    def dedup_first():
        keep = D.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
        survivors = docs.join(keep, "doc_id", "left_semi")
        return D.minhash_near_dup(survivors)

    for name, fn in [("lsh_on_identical_x16", naive),
                     ("exact_dedup_then_lsh_x16", dedup_first)]:
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))


def r7_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Scaling curve for the round-7 additions over the salted
    replicas. The linkage cap is passed as 0.3/k: vocabulary salting
    divides every token's GLOBAL df fraction by k (each word lives in
    one replica), so a fixed fraction would flip selectivity regimes
    between k's — 0.3/k tracks the replica-local stop-term band (hot
    tokens sit at 0.77/k, the rare one at 0.05/k) and measures the
    same per-replica workload at every k, which is the honest linear
    setup."""
    from yamr_spark.operators import dedup as D
    from yamr_spark.operators import text as T

    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()
        ops = {
            "containment_pairs_stratified": lambda df: D.containment_pairs_stratified(df),
            "sparse_cosine_linkage(cap=0.3/k)": lambda df, kk=k: T.sparse_cosine_pairs(
                df, num_queries=None, max_df_frac=0.3 / kk
            ),
        }
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name.split("(")[0], {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    print("\n| operator | " + " | ".join(f"{k}x" for k in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[k]:.2f}" for k in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")


def r7late_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Scaling curve for the late round-7 additions. token_budget_pack
    keeps the budget FIXED across k (the realistic setup — a token
    budget does not grow with the corpus), so selection work is
    constant and the measured growth is the scan + per-(lang, stratum)
    partial aggregate, which should track data size ~linearly with a
    fixed-cost head. cms_point_estimates carries a depth x width
    sketch whose shuffle is bounded by construction — growth is the
    map-side scan only."""
    from yamr_spark.operators import curation as C
    from yamr_spark.operators import text as T

    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    ops = {
        "token_budget_pack(budget=20k)": lambda df: C.token_budget_pack(
            df, budget_tokens=20_000
        ),
        "cms_point_estimates(doc_id)": lambda df: T.cms_point_estimates(
            df, "doc_id", n_probes=10
        ),
    }
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name.split("(")[0], {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    print("\n| operator | " + " | ".join(f"{k}x" for k in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[k]:.2f}" for k in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")


def r9_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Scaling curve for the round-9 additions over the salted
    replicas. span_dup_stats: replicas share no windows ACROSS
    replicas but each replays the base corpus's internal duplicates —
    per-replica workload constant, the honest linear setup; cost is
    the window build (corpus-token rows) + two hash-keyed shuffles +
    per-doc island merge. heavy_hitters_exact: k scales with the
    factor (200·f) so the per-replica frequency threshold is constant
    — a fixed k would let the salted replicas dilute every term below
    N/k and pass 2 would measure an empty recheck, not throughput."""
    from yamr_spark.operators import curation as C
    from yamr_spark.operators import text as T

    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()
        ops = {
            "span_dup_stats": lambda df: C.span_dup_stats(df),
            "heavy_hitters_exact(k=200f)": lambda df, kk=k: T.heavy_hitters_exact(
                df, k=200 * kk
            ),
        }
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name.split("(")[0], {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    print("\n| operator | " + " | ".join(f"{k}x" for k in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[k]:.2f}" for k in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")


def r10_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """VERDICT r09 #4: separate span_dup_stats' MATERIALIZE cost from
    its PLAN cost. The r9 curve's 16× cell (23.6 s, ~11×) was
    attributed to localCheckpoint block pressure (SCALE.md) — if that
    attribution is right, the same salted-replica curve under the
    parquet/disk materialize modes (whose barrier cost is a columnar
    write + scan instead of in-JVM block replication) should flatten
    toward the plan's own ~linear cost; if it stays superlinear under
    every mode, the window table's two consumers need a cheaper
    barrier."""
    from yamr_spark.materialize import set_mode
    from yamr_spark.operators import curation as C

    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for mode in ("local", "disk", "parquet"):
        for k in FACTORS:
            docs = spark.read.parquet(paths[k])
            docs.count()
            set_mode(mode)
            try:
                best = None
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    C.span_dup_stats(docs).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
            finally:
                set_mode(None)
            results.setdefault(f"span_dup_stats[{mode}]", {})[k] = round(best, 2)
            print(
                json.dumps(
                    {"op": f"span_dup_stats[{mode}]", "factor": k, "sec": round(best, 2)}
                )
            )
    print("\n| operator | " + " | ".join(f"{k}x" for k in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[k]:.2f}" for k in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")


def r10b_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Scaling curve for the round-10 stratified-sampling pair: the
    rank-based EXACT form (range shuffle + partition-parallel window +
    bounded offset collect) vs the percentile_approx twin (one pass,
    no rank shuffle). Expectation: both ~linear; the approx twin
    cheaper by the rank shuffle's cost — the measured basis for 'exact
    is certified, approx is the 10¹²-row path'."""
    from yamr_spark.operators import curation as C

    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    ops = {
        "quality_stratified_sample": C.quality_stratified_sample,
        "quality_stratified_sample_approx": C.quality_stratified_sample_approx,
    }
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    print("\n| operator | " + " | ".join(f"{k}x" for k in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[k]:.2f}" for k in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")




def build_scaled_parts(spark, sf_dir: str, out_dir: str) -> dict[int, str]:
    """k-replica PART tables for the entity-resolution curve. Brand is
    replica-salted so fuzzy-match BLOCKS stay replica-local (unsalted
    brands would merge blocks across replicas and grow the banded
    Levenshtein work as k² by construction — the skew path, not
    throughput); names get a constant per-replica suffix, which keeps
    within-replica edit distances comparable while making replicas
    distinct corpora."""
    base = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    n = base.count()
    paths = {}
    for k in FACTORS:
        path = os.path.join(out_dir, f"part_x{k}.parquet")
        if not os.path.exists(path):
            parts = []
            for r in range(k):
                rep = base.select(
                    (F.col("p_partkey") + F.lit(r * n)).alias("p_partkey"),
                    (
                        F.col("p_name")
                        if r == 0
                        else F.concat(F.col("p_name"), F.lit(f" rep{r}"))
                    ).alias("p_name"),
                    (
                        F.col("p_brand")
                        if r == 0
                        else F.concat(F.col("p_brand"), F.lit(f"_{r}"))
                    ).alias("p_brand"),
                    "p_size",
                    "p_retailprice",
                )
                parts.append(rep)
            out = parts[0]
            for p2 in parts[1:]:
                out = out.unionByName(p2)
            out.repartition(max(4, 2 * k)).write.mode("overwrite").parquet(path)
        paths[k] = path
    return paths


def r11_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """VERDICT r10 #2/#4: (a) the IVF×PQ composition vs flat ADC over
    the jittered embedding replicas — flat ADC touches every code per
    query (linear, cheap, corpus-wide); IVF×PQ touches nprobe/c of
    them, so its curve should grow SLOWER than flat ADC's as the
    corpus scales (c = √n keeps the probed fraction shrinking);
    (b) the two most expensive registered COMPOSITIONS, never curved
    as wholes: llm_prep_pipeline_v4 (span-dedup → leakage-safe split →
    token-budget pack; budget FIXED across k — a token budget does not
    grow with the corpus) and entity_resolution_parts (blocked fuzzy
    match → connected components → golden records) — composition is
    where barrier/cache interactions bite (the r7 ER double-execution
    class)."""
    import math

    from yamr_spark.materialize import materialize
    from yamr_spark.operators import curation as C
    from yamr_spark.operators import dedup as D
    from yamr_spark.operators import similarity as S
    from yamr_spark.operators.graph import connected_components

    results: dict[str, dict[int, float]] = {}

    def timed(name, k, fn):
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results.setdefault(name, {})[k] = round(best, 2)
        print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))

    epaths = build_scaled_emb(spark, sf_dir, out_dir)
    for k in FACTORS:
        emb = spark.read.parquet(epaths[k])
        n = emb.count()
        c = max(8, math.isqrt(n))
        timed("ann_pq_adc_topk(q=50)", k,
              lambda: S.pq_adc_topk(emb, n_queries=50))
        timed(f"ann_ivf_pq_topk(q=50,c=sqrt_n,np=2)", k,
              lambda: S.ivf_pq_topk(emb, n_queries=50, c=c, nprobe=2))

    dpaths = build_scaled(spark, sf_dir, out_dir)
    for k in FACTORS:
        docs = spark.read.parquet(dpaths[k])
        docs.count()

        def v4():
            high_dup = (
                C.span_dup_stats(docs)
                .where(F.col("dup_frac") >= 0.8)
                .select("doc_id")
            )
            kept = docs.join(high_dup, "doc_id", "left_anti")
            pairs = materialize(D.minhash_near_dup(docs))
            assign = C.leakage_safe_split_assign(kept, pairs)
            train = kept.join(
                assign.where(F.col("split") == "train").select("doc_id"),
                "doc_id",
                "left_semi",
            )
            return C.token_budget_pack(train, budget_tokens=20_000)

        timed("llm_prep_pipeline_v4(budget=20k)", k, v4)

    ppaths = build_scaled_parts(spark, sf_dir, out_dir)
    for k in FACTORS:
        parts = spark.read.parquet(ppaths[k]).withColumn(
            "size_band", (F.col("p_size") / 10).cast("int")
        )
        parts.count()

        def er():
            pairs = materialize(
                D.fuzzy_match_pairs(
                    parts,
                    block_cols=["p_brand", "size_band"],
                    name_col="p_name",
                    id_col="p_partkey",
                )
            )
            groups = connected_components(pairs, src="id_a", dst="id_b")
            return (
                groups.join(
                    parts.select(
                        F.col("p_partkey").alias("node"), "p_name"
                    ),
                    "node",
                )
                .groupBy(F.col("component").cast("long").alias("entity_id"))
                .agg(
                    F.count("*").alias("n_members"),
                    F.min_by("p_name", "node").alias("canonical_name"),
                )
            )

        timed("entity_resolution_parts", k, er)

    print("\n| operator | " + " | ".join(f"{k}x" for k in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[k]:.2f}" for k in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")


def recall_vs_params(spark, sf_dir: str) -> None:
    """VERDICT r10 #3 SCALE.md row: measured recall@5 of IVF×PQ vs
    brute-force truth at sf0.1, sweeping nprobe (cell coverage) and m
    (subspace count — finer-grained codes) around the registered
    (c=8, nprobe=2, m=4, k=16) point. Deterministic: fixed queries,
    exact hit counts."""
    from pyspark.sql import functions as F2

    from yamr_spark.operators import similarity as S

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    truth = S.brute_force_topk(emb).select("query_id", "neighbor_id")
    truth = truth.persist()
    total = truth.count()
    print("| variant | hits | recall@5 |")
    print("|---|---|---|")
    for nprobe in (1, 2, 4, 8):
        hits = (
            S.ivf_pq_topk(emb, nprobe=nprobe)
            .select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .count()
        )
        print(f"| ivf_pq nprobe={nprobe} m=4 | {hits} | {hits / total:.2f} |")
    for m in (8, 16):
        hits = (
            S.ivf_pq_topk(emb, m=m)
            .select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .count()
        )
        print(f"| ivf_pq nprobe=2 m={m} | {hits} | {hits / total:.2f} |")
    for m in (4, 8, 16):
        hits = (
            S.pq_adc_topk(emb, m=m)
            .select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .count()
        )
        print(f"| flat pq_adc m={m} | {hits} | {hits / total:.2f} |")
    for nprobe in (2, 4):
        hits = (
            S.ivf_pq_residual_topk(emb, nprobe=nprobe)
            .select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .count()
        )
        print(
            f"| ivf_pq RESIDUAL nprobe={nprobe} m=4 | {hits} | {hits / total:.2f} |"
        )
    for m, iters in ((4, 1), (4, 2), (8, 1)):
        books = S.pq_codebooks_kmeans(emb, m=m, iters=iters)
        hits = (
            S.ivf_pq_topk(emb, m=m, books=books)
            .select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .count()
        )
        print(
            f"| ivf_pq KMEANS(iters={iters}) nprobe=2 m={m} "
            f"| {hits} | {hits / total:.2f} |"
        )
    truth.unpersist()


def r11b_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """SERVING-path curve for the IVFADC code store: per k, build the
    partitioned code store UNTIMED (the write-once layout cost), then
    time ONLY the 50-query directory-pruned ADC probe. With c=√n and
    nprobe=2 the probed fraction is 2/√n, so per-query scanned codes
    grow ~√n — the measured counterpart to the end-to-end r11 curve
    whose assignment build term hid the serving asymmetry."""
    import math
    import os as _os

    from yamr_spark.materialize import materialize
    from yamr_spark.operators import similarity as S

    epaths = build_scaled_emb(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        emb = spark.read.parquet(epaths[k])
        n = emb.count()
        c = max(8, math.isqrt(n))
        cents = materialize(S.centroids(emb, c=c))
        assign = materialize(
            S.ivf_assign(emb, c=c, cents=cents).select("vec_id", "centroid_id")
        )
        books = materialize(S.pq_codebooks(emb))
        store = _os.path.join(out_dir, f"pqstore_x{k}")
        S.write_ivf_pq_store(emb, store, c=c, assign=assign, books=books)
        best = None
        for _ in range(REPS + 1):  # extra rep: first probe pays scan warmup
            t0 = time.perf_counter()
            S.ivf_pq_store_topk(
                spark, store, emb, n_queries=50, c=c, nprobe=2,
                cents=cents, books=books,
            ).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results.setdefault("ivf_pq_store_probe(q=50,c=sqrt_n,np=2)", {})[k] = round(best, 2)
        print(json.dumps({"op": "ivf_pq_store_probe", "factor": k, "sec": round(best, 2)}))
    print("\n| operator | " + " | ".join(f"{kk}x" for kk in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[kk]:.2f}" for kk in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")


def r11c_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Salted-replica curves for the r11-continuation operators:
    winnowing (build + near-dup join), MinHash estimator certification
    (LSH candidates + two bounded joins), CCNet tertile gating (LM
    score + distributed rank composition), and the epoch allocator
    (scan-bound token count). Vocabulary salting keeps replicas
    shingle-disjoint, so candidate structures stay density-constant —
    the honest linear-scaling setup."""
    from pyspark.sql import functions as FF

    from yamr_spark.operators import curation as C
    from yamr_spark.operators import dedup as D
    from yamr_spark.operators import text as T

    ops = {
        "winnow_fingerprint_stats": lambda df: (
            T.winnowing_fingerprints(df)
            .groupBy("doc_id")
            .agg(
                FF.min("n_grams").alias("n_grams"),
                FF.count("*").alias("n_fp"),
                FF.countDistinct("fp").alias("n_uniq_fp"),
                FF.min("fp").alias("fp_min"),
            )
        ),
        "winnow_near_dup": lambda df: T.winnow_near_dup(df),
        "minhash_estimate_quality": lambda df: D.minhash_estimate_vs_exact(df),
        "lm_quality_buckets": lambda df: T.lm_quality_buckets(df),
        "domain_epoch_allocation": lambda df: C.domain_epoch_allocation(df),
    }
    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    print("\n| operator | " + " | ".join(f"{kk}x" for kk in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[kk]:.2f}" for kk in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")


def r11d_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Composition curves for the r11-continuation tail: the v5
    pipeline END-TO-END (winnow build + dedup + LM gate + allocation —
    no session cache, so the curve prices the full plan) and the
    incremental winnow probe (parity split: half the corpus plays the
    standing index). Salted replicas as usual."""
    from pyspark.sql import functions as FF

    from yamr_spark.materialize import materialize
    from yamr_spark.operators import curation as C
    from yamr_spark.operators import text as T

    def v5(docs):
        pairs = T.winnow_near_dup(docs)
        drops = pairs.select(FF.col("doc_b").alias("doc_id")).distinct()
        s1 = materialize(docs.join(drops, "doc_id", "left_anti"))
        buckets = T.lm_quality_bucket_per_doc(s1)
        s2 = materialize(
            s1.join(
                buckets.where(FF.col("bucket") != "tail").select(
                    "doc_id", "n_tokens"
                ),
                "doc_id",
            )
        )
        return C.domain_epoch_allocation(s2)

    def incr(docs):
        fps = (
            T.winnowing_fingerprints(docs).select("doc_id", "fp").distinct()
        )
        return T.winnow_incremental(
            fps.where(FF.col("doc_id") % 2 == 1),
            fps.where(FF.col("doc_id") % 2 == 0),
        )

    ops = {"llm_prep_pipeline_v5[e2e]": v5, "winnow_incremental[e2e]": incr}
    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    print("\n| operator | " + " | ".join(f"{kk}x" for kk in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[kk]:.2f}" for kk in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")


def _print_table(results: dict[str, dict[int, float]], factors) -> None:
    print("\n| operator | " + " | ".join(f"{kk}x" for kk in factors) + " | last/first |")
    print("|---|" + "---|" * (len(factors) + 1))
    for name, row in results.items():
        ratio = round(row[factors[-1]] / row[factors[0]], 1)
        cells = " | ".join(f"{row[kk]:.2f}" for kk in factors)
        print(f"| {name} | {cells} | {ratio}x |")


def r12_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Winnow x64 point (VERDICT r11 #4): the r11c winnow curve ended at
    x16 with a 4.7-6.7x wall ratio, read as 'parallel slack absorption,
    not superlinear work'. This run adds x64 AND scales
    spark.sql.shuffle.partitions with the corpus (32 -> 128 at x64 —
    what a cluster deployment does by sizing partitions to data): if the
    slack reading is right, x64 wall stays ~linear-per-unit once the
    parallelism matches the data. Also times winnow_incremental in both
    layouts — re-shuffling vs fp-BUCKETED standing index (the staged
    form the registered query now uses)."""
    from pyspark.sql import functions as FF

    from yamr_spark.operators import text as T
    from yamr_spark.sources import write_bucketed

    factors = [1, 16, 64]
    global FACTORS
    saved = FACTORS
    FACTORS = factors  # build_scaled writes one parquet per factor
    try:
        paths = build_scaled(spark, sf_dir, out_dir)
    finally:
        FACTORS = saved

    def fstats(docs):
        return (
            T.winnowing_fingerprints(docs)
            .groupBy("doc_id")
            .agg(
                FF.min("n_grams").alias("n_grams"),
                FF.count("*").alias("n_fp"),
                FF.countDistinct("fp").alias("n_uniq_fp"),
                FF.min("fp").alias("fp_min"),
            )
        )

    def incr_shuffled(docs):
        fps = T.winnowing_fingerprints(docs).select("doc_id", "fp").distinct()
        return T.winnow_incremental(
            fps.where(FF.col("doc_id") % 2 == 1),
            fps.where(FF.col("doc_id") % 2 == 0),
        )

    results: dict[str, dict[int, float]] = {}
    for k in factors:
        parts = max(32, 2 * k)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        docs = spark.read.parquet(paths[k])
        docs.count()
        ops = {
            f"winnow_fingerprint_stats(p={parts})": fstats,
            f"winnow_near_dup(p={parts})": lambda d: T.winnow_near_dup(d),
            f"winnow_incremental[shuffle](p={parts})": incr_shuffled,
        }
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name.split("(p=")[0], {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
        # bucketed standing-index form: stage (untimed — the write-once
        # ingest cost), then time the probe over the bucketed layout
        fps = T.winnowing_fingerprints(docs).select("doc_id", "fp").distinct()
        tname = f"scale_winnow_fps_x{k}"
        write_bucketed(fps, tname, parts, ["fp"])
        bt = spark.table(tname)
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            T.winnow_incremental(
                bt.where(FF.col("doc_id") % 2 == 1),
                bt.where(FF.col("doc_id") % 2 == 0),
            ).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results.setdefault("winnow_incremental[bucketed]", {})[k] = round(best, 2)
        print(json.dumps({"op": f"winnow_incremental[bucketed](p={parts})", "factor": k, "sec": round(best, 2)}))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    _print_table(results, factors)


def r12b_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Frozen-c IVF x PQ BUILD curve (VERDICT r11 #6): time the full
    index BUILD — train + assign + encode + write the partitioned code
    store — under (a) the scale harness's per-run training with
    c=sqrt(n) (the n^1.5 term) and (b) the production freeze: centroids
    (1 Lloyd iter) + codebooks trained once on a FIXED 256-vector
    sample, c=8 constant, corpus only assigned/encoded. Linear build is
    the claim; last/first tells the story."""
    import math
    import os as _os
    import shutil

    from yamr_spark.materialize import materialize
    from yamr_spark.operators import similarity as S

    epaths = build_scaled_emb(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        emb = spark.read.parquet(epaths[k])
        n = emb.count()
        c = max(8, math.isqrt(n))

        def build_sqrt():
            cents = materialize(S.centroids(emb, c=c))
            assign = materialize(
                S.ivf_assign(emb, c=c, cents=cents).select("vec_id", "centroid_id")
            )
            books = materialize(S.pq_codebooks(emb))
            store = _os.path.join(out_dir, f"pqb_sqrt_x{k}")
            shutil.rmtree(store, ignore_errors=True)
            S.write_ivf_pq_store(emb, store, c=c, assign=assign, books=books)

        def build_frozen():
            sample = emb.filter(F.col("vec_id") < 256)
            cents = materialize(S.kmeans_centroid_vectors(sample, c=8, iters=1))
            books = materialize(S.pq_codebooks_kmeans(sample))
            assign = materialize(
                S.ivf_assign(emb, cents=cents).select("vec_id", "centroid_id")
            )
            store = _os.path.join(out_dir, f"pqb_frz_x{k}")
            shutil.rmtree(store, ignore_errors=True)
            S.write_ivf_pq_store(emb, store, assign=assign, books=books)

        for name, fn in (
            (f"ivfpq_build[c=sqrt_n]", build_sqrt),
            ("ivfpq_build[frozen c=8, sample=256]", build_frozen),
        ):
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "n": n, "sec": round(best, 2)}))
    _print_table(results, FACTORS)


def r12c_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Exact-substring-dedup curve (VERDICT r11 #5 'Done' clause): time
    substring_dedup_docs and the hash-trusting span_dup_stats stand-in
    it supersedes over the salted replicas. Salting keeps replicas
    token-disjoint, so the duplicated-window universe (and hence the
    phase-2 text-verify volume) is replica-local — the honest linear
    setup; the interesting number is how much the exact verify costs
    over the trust-the-hash baseline."""
    from yamr_spark.operators import curation as C

    ops = {
        "span_dup_stats[hash-trusting]": lambda df: C.span_dup_stats(df),
        "substring_dedup_docs[text-verified]": lambda df: C.substring_dedup_docs(df),
    }
    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    _print_table(results, FACTORS)


def r13_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Minimizer-anchored vs dense char substring dedup (VERDICT r12 #4
    'Done' clause): both forms over the salted replicas. The dense form
    shuffles a hash row per char OFFSET; the anchored form computes
    winnowing selection map-side and shuffles only anchors (~2/(w+1) of
    offsets = ~8% at w=25) — the curve shows whether that w/2-fold
    phase-1 cut survives end-to-end."""
    from yamr_spark.operators import curation as C

    ops = {
        "substring_dedup_chars[dense]": lambda df: C.substring_dedup_chars(df),
        "substring_dedup_minimized[anchored]": (
            lambda df: C.substring_dedup_minimized(df)
        ),
    }
    paths = build_scaled(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    _print_table(results, FACTORS)


COMPOSITE_QUERIES = [
    # the 10 most expensive headline queries per bench_full.json (r12)
    "substring_dedup_chars",
    "llm_prep_pipeline_v5",
    "ann_recall_at_k",
    "entity_resolution_parts",
    "llm_prep_pipeline_v4",
    "llm_prep_pipeline_v2",
    "simhash_estimate_quality",
    "llm_prep_pipeline_v3",
    "dedup_ladder",
    "containment_pairs_stratified",
]


def build_sf03(spark, sf_dir: str, out_dir: str) -> str:
    """A full sf-directory-shaped ×3 corpus (VERDICT r12 #8): documents
    vocabulary-salted ×3, embeddings perturbation-replicated ×3, part
    key-shifted + brand/name-salted ×3 (salting keeps replica blocks
    disjoint — the honest linear setup, same methodology as
    build_scaled); the remaining tables copy through unscaled (none is
    a top-10 query's dominant input). Queries run against it unchanged
    via their (spark, sf_dir) signature."""
    import shutil

    dst = os.path.join(out_dir, "sf03")
    marker = os.path.join(dst, "_BUILD_COMPLETE")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    k = 3
    # documents: salted replicas (disjoint vocabulary)
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = base.count()
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
            (
                F.col("text")
                if r == 0
                else F.regexp_replace("text", r"(\w+)", rf"$1_{r}")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for r in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )
    # embeddings: perturbed replicas (distinct neighborhoods)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ne = emb.count()
    eparts = []
    for r in range(k):
        jitter = (
            f"transform(embedding, (x, i) -> "
            f"CAST(x + (pmod(vec_id * 31 + i * 7 + {r}, 17) - 8) * "
            f"{0.0 if r == 0 else 0.01} AS FLOAT))"
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * ne)).alias("vec_id"),
                F.expr(jitter).alias("embedding"),
                "label",
            )
        )
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )
    # part: key-shifted, brand+name salted so replica blocks are disjoint
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    np_ = part.count()
    pparts = [
        part.select(
            (F.col("p_partkey") + F.lit(r * np_)).alias("p_partkey"),
            (
                F.col("p_name")
                if r == 0
                else F.concat(F.col("p_name"), F.lit(f" r{r}"))
            ).alias("p_name"),
            (
                F.col("p_brand")
                if r == 0
                else F.concat(F.col("p_brand"), F.lit(f"#{r}"))
            ).alias("p_brand"),
            "p_type",
            "p_size",
            "p_retailprice",
        )
        for r in range(k)
    ]
    pout = pparts[0]
    for p in pparts[1:]:
        pout = pout.unionByName(p)
    pout.repartition(4).write.mode("overwrite").parquet(
        os.path.join(dst, "part.parquet")
    )
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "orders",
        "lineitem",
        "events",
    ):
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(dst, f"{t}.parquet"))
        elif os.path.exists(src):
            shutil.copy2(src, os.path.join(dst, f"{t}.parquet"))
    with open(marker, "w"):
        pass
    return dst


def r13b_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """sf0.1 → ×3 composite point over the 10 most expensive headline
    queries (VERDICT r12 #8): per-operator salted curves cannot see
    composition superlinearity (a pipeline stage whose cost multiplies
    a prior stage's output); run the full registered queries at both
    scales and report ratios — expected ≈ the 3× data ratio."""
    from yamr_spark.registry import all_queries

    qs = all_queries()
    sf03 = build_sf03(spark, sf_dir, out_dir)
    results: dict[str, dict[int, float]] = {}
    for scale, d in ((1, sf_dir), (3, sf03)):
        for name in COMPOSITE_QUERIES:
            # one untimed warm-up rep per (scale, query): builds that
            # sf_dir's session caches and the codegen state, so both
            # scales time warm steady-state plans (otherwise the x1
            # pass eats all JVM warm-up and the ratios read < 1)
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[scale] = round(best, 2)
            print(json.dumps({"op": name, "factor": scale, "sec": round(best, 2)}))
    _print_table(results, [1, 3])


def _build_docs_scaled(spark, sf_dir: str, out_dir: str, k: int) -> str:
    """A documents-only vocabulary-salted ×k corpus dir (build_sf03's
    documents rule: replica r rewrites every word with an _r suffix, so
    replica blocks stay disjoint — the honest linear setup), for
    queries whose only input is the documents table."""
    import shutil

    dst = os.path.join(out_dir, f"docs_x{k}")
    marker = os.path.join(dst, "_BUILD_COMPLETE")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = base.count()
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
            (
                F.col("text")
                if r == 0
                else F.regexp_replace("text", r"(\w+)", rf"$1_{r}")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for r in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )
    with open(marker, "w"):
        pass
    return dst


def r14b_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """containment_pairs_stratified scaling exponent (VERDICT r13 #6):
    the r13 composite point had it at 2.7× for 3× data — the worst
    composite ratio, ambiguous between fixed-cost amortization on a
    small base and pair-count superlinearity. Extend the curve to ×9
    (registered query, warm min-of-REPS per scale) and report the
    3→9 segment exponent log3(t9/t3): candidates are bounded by
    docs × probes_per_doc × max_df — linear in corpus — so a healthy
    data term shows exponent ≤ 1 once fixed costs amortize."""
    import math

    from pyspark.sql import functions as FF  # noqa: F401 (parity w/ peers)

    from yamr_spark.registry import all_queries

    qs = all_queries()
    name = "containment_pairs_stratified"
    results: dict[str, dict[int, float]] = {}
    times: dict[int, float] = {}
    for k in (1, 3, 9):
        d = sf_dir if k == 1 else _build_docs_scaled(spark, sf_dir, out_dir, k)
        qs[name](spark, d).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[k] = best
        results.setdefault(name, {})[k] = round(best, 2)
        print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))
    expo = math.log(times[9] / times[3]) / math.log(3)
    print(json.dumps({
        "op": name, "segment": "3->9",
        "exponent_log3": round(expo, 3),
        "ratio_3_to_9": round(times[9] / times[3], 2),
    }))
    _print_table(results, [1, 3, 9])


def r13c_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """Per-batch cost of the streaming ANCHOR index as the standing
    corpus grows (the 'probe cost = batch volume, never corpus volume'
    claim): seed the anchor index from ×1/×4/×16 salted corpora, then
    ingest the SAME fixed batch (the ×1 replica's odd docs) through
    stream_minimized_into_index and time the drain. The batch side is
    constant; only the standing index scales — a linear-in-corpus probe
    would show ×16 wall growth, a batch-bound probe stays near-flat
    (the standing side is one broadcast-batch-side semi-join scan)."""
    import shutil

    from pyspark.sql import functions as FF

    from yamr_spark.streaming.lsh import stage_stream_files
    from yamr_spark.streaming.substring import (
        build_anchor_index,
        stream_minimized_into_index,
    )

    paths = build_scaled(spark, sf_dir, out_dir)
    batch_src = spark.read.parquet(paths[1]).where(FF.col("doc_id") % 2 == 1)
    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        seed = spark.read.parquet(paths[k]).where(FF.col("doc_id") % 2 == 0)
        base = os.path.join(out_dir, f"r13c_x{k}")
        best = None
        # every rep rebuilds an identical index (same seed), so the row
        # count is captured once, before the rep loop's timing (ADVICE
        # r13: reading it from the last rep quietly reports a stale
        # value if the loop ever varies the seed)
        idx_rows = None
        for rep in range(REPS):
            rd = os.path.join(base, f"rep{rep}")
            shutil.rmtree(rd, ignore_errors=True)
            index_dir = os.path.join(rd, "index")
            stream_dir = os.path.join(rd, "stream")
            build_anchor_index(seed, index_dir)
            stage_stream_files(batch_src, stream_dir, [FF.lit(True)])
            if idx_rows is None:
                idx_rows = spark.read.parquet(index_dir).count()
            t0 = time.perf_counter()
            stream_minimized_into_index(
                spark, stream_dir, batch_src.schema, index_dir,
                os.path.join(rd, "results"), os.path.join(rd, "ckpt"),
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results.setdefault("anchor_index_batch_ingest", {})[k] = round(best, 2)
        print(json.dumps({
            "op": "anchor_index_batch_ingest", "factor": k,
            "sec": round(best, 2), "index_rows": idx_rows,
        }))
    _print_table(results, FACTORS)


def r14c_experiment(spark, sf_dir: str, out_dir: str) -> None:
    """The anchor-index ingest point at a ×64 standing corpus: same
    harness as r13c (fixed batch = the ×1 replica's odd docs; only the
    standing seed scales), pushed to 64× to pin the 'per-batch cost
    tracks batch volume' claim an order of magnitude past the r13/r14
    ×16 cells — the winnow family's ×64 discipline applied to the
    streaming anchor store."""
    import shutil

    from pyspark.sql import functions as FF

    from yamr_spark.streaming.lsh import stage_stream_files
    from yamr_spark.streaming.substring import (
        build_anchor_index,
        stream_minimized_into_index,
    )

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = base.count()
    factors = [1, 16, 64]
    paths = {}
    for k in factors:
        path = os.path.join(out_dir, f"documents_x{k}.parquet")
        if not os.path.exists(path):
            parts = [
                base.select(
                    (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                    (
                        F.col("text")
                        if r == 0
                        else F.regexp_replace("text", r"(\w+)", rf"$1_{r}")
                    ).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
                for r in range(k)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.repartition(max(4, 2 * k)).write.mode("overwrite").parquet(path)
        paths[k] = path
    batch_src = spark.read.parquet(paths[1]).where(FF.col("doc_id") % 2 == 1)
    results: dict[str, dict[int, float]] = {}
    for k in factors:
        seed = spark.read.parquet(paths[k]).where(FF.col("doc_id") % 2 == 0)
        best = None
        idx_rows = None
        for rep in range(REPS):
            rd = os.path.join(out_dir, f"r14c_x{k}", f"rep{rep}")
            shutil.rmtree(rd, ignore_errors=True)
            index_dir = os.path.join(rd, "index")
            stream_dir = os.path.join(rd, "stream")
            build_anchor_index(seed, index_dir)
            stage_stream_files(batch_src, stream_dir, [FF.lit(True)])
            if idx_rows is None:
                idx_rows = spark.read.parquet(index_dir).count()
            t0 = time.perf_counter()
            stream_minimized_into_index(
                spark, stream_dir, batch_src.schema, index_dir,
                os.path.join(rd, "results"), os.path.join(rd, "ckpt"),
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results.setdefault("anchor_index_batch_ingest", {})[k] = round(best, 2)
        print(json.dumps({
            "op": "anchor_index_batch_ingest", "factor": k,
            "sec": round(best, 2), "index_rows": idx_rows,
        }))
    _print_table(results, factors)


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = pos[0] if pos else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = pos[1] if len(pos) > 1 else "/tmp/scale_curve"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("scale-curve")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--skew" in sys.argv:
        skew_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r7" in sys.argv:
        r7_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r7late" in sys.argv:
        r7late_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r9" in sys.argv:
        r9_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r10" in sys.argv:
        r10_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r10b" in sys.argv:
        r10b_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r11" in sys.argv:
        r11_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r11b" in sys.argv:
        r11b_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r11c" in sys.argv:
        r11c_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r11d" in sys.argv:
        r11d_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r12" in sys.argv:
        r12_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r12b" in sys.argv:
        r12b_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r12c" in sys.argv:
        r12c_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r13" in sys.argv:
        r13_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r13b" in sys.argv:
        r13b_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r13c" in sys.argv:
        r13c_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r14b" in sys.argv:
        r14b_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--r14c" in sys.argv:
        r14c_experiment(spark, sf_dir, out_dir)
        spark.stop()
        return
    if "--recall" in sys.argv:
        recall_vs_params(spark, sf_dir)
        spark.stop()
        return
    paths = build_scaled(spark, sf_dir, out_dir)
    ops = operators()
    results: dict[str, dict[int, float]] = {name: {} for name in ops}
    for k in FACTORS:
        docs = spark.read.parquet(paths[k])
        docs.count()  # warm the scan
        for name, fn in ops.items():
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name][k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": results[name][k]}))

    emb_paths = build_scaled_emb(spark, sf_dir, out_dir)
    for k in FACTORS:
        import math

        from yamr_spark.operators import similarity as S

        emb = spark.read.parquet(emb_paths[k])
        n_vecs = emb.count()  # warm the scan + size the cell count
        c = max(8, math.isqrt(n_vecs))
        # Amortized query path: the IVF store (assignment materialized,
        # partitioned by cell) is built OUTSIDE the timer — production
        # builds it once per corpus version, then serves every query
        # batch from it. The timed probe is the steady-state cost.
        store = os.path.join(out_dir, f"ivf_store_x{k}")
        if not os.path.exists(store):
            S.write_ivf_store(emb, store, c=c)
        ops_k = dict(ann_operators(n_vecs))
        ops_k[f"ann_ivf_store_topk(q=50,c={c})"] = (
            lambda df, s=store, cc=c: S.ivf_store_topk(
                spark, s, df, k=5, num_queries=50, c=cc, nprobe=2
            )
        )
        for name, fn in ops_k.items():
            base_name = name.split("(")[0]
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(emb).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(base_name, {})[k] = round(best, 2)
            print(json.dumps({"op": name, "factor": k, "sec": round(best, 2)}))

    print("\n| operator | " + " | ".join(f"{k}x" for k in FACTORS) + " | t(16x)/t(1x) |")
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name, row in results.items():
        ratio = round(row[FACTORS[-1]] / row[FACTORS[0]], 1)
        cells = " | ".join(f"{row[k]:.2f}" for k in FACTORS)
        print(f"| {name} | {cells} | {ratio}x |")
    spark.stop()


if __name__ == "__main__":
    main()
