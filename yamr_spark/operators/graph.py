"""Iterative graph operator: connected components (dedup-group closure).

Near-dup pairs (MinHash/SimHash output) are edges; the duplicate GROUPS
are the connected components — the canonical doc per group is the
minimum id. This is the one genuinely iterative algorithm in the engine:
a DataFrame min-label-propagation loop, converging in O(diameter)
rounds. Near-dup graphs have tiny diameters (clusters are cliques-ish),
so rounds ≈ 2-4 in practice.

Scale notes: each round is one edge join + one aggregate + one pointer-
jump self-join (all shuffle on the node id — a stable key, so AQE reuses
the layout). ``materialize`` (local checkpoint on local[n]; DISK_ONLY
persist / parquet staging at cluster scale — materialize.py) truncates
the lineage each round, keeping the plan O(1) instead of O(rounds). The pointer-jump step
(``component ← label(component)``, i.e. path doubling — Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds",
ICDE'13) halves the remaining chain depth every round, so adversarial
long chains converge in O(log diameter) rounds instead of O(diameter);
near-dup cliques still converge in 1-2 rounds. Convergence is checked
every SECOND round: the check is a driver-blocking count job, and with
log-round convergence the extra round it may cost is cheaper than a
per-round count (VERDICT r01 §next-round #7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from yamr_spark.materialize import materialize


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    minimum node id reachable through the undirected edge set.

    ``stats`` (optional dict) receives ``{"rounds": n}`` so tests can pin
    the logarithmic convergence guarantee."""
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    und = und.distinct().transform(materialize)

    # Round 1, folded into initialization: under identity labels the
    # first round's messages are just the neighbor ids, so
    # min(self, neighbors) comes straight off the edge stream — one
    # aggregate replaces the separate node-distinct, identity-label
    # join, and first min (two shuffles and a materialize saved per
    # query; the label table never exists in its identity form).
    labels = (
        und.select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("b")).alias("component"),
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
        .transform(materialize)
    )

    for it in range(1, max_iter):
        # each node adopts min(own label, neighbors' labels)
        msgs = und.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "component")
        mins = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .transform(materialize)
        )
        # pointer jump: component ← label(component). Every label is itself
        # a node id present in ``mins`` (labels start as node ids and only
        # ever take the min of other labels), so the lookup is total; the
        # left join + coalesce is belt-and-braces. This is the path-doubling
        # step that makes chains converge logarithmically.
        new_labels = (
            mins.alias("l")
            .join(
                mins.select(
                    F.col("node").alias("component"),
                    F.col("component").alias("jumped"),
                ),
                "component",
                "left",
            )
            .select(
                "node",
                F.coalesce("jumped", "component").alias("component"),
            )
            .transform(materialize)
        )
        # convergence check every 2nd round (each check is a driver action)
        if it % 2 == 1 or it == max_iter - 1:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            if changed == 0:
                if stats is not None:
                    stats["rounds"] = it + 1
                return new_labels
        labels = new_labels
    if stats is not None:
        stats["rounds"] = max_iter
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_rounds: int = 3,
    damping: float = 0.85,
    fixpoint_partitions: int | None = None,
) -> DataFrame:
    """PageRank, ``n_rounds`` power iterations of the simplified
    (no-dangling-redistribution) update
    ``r(v) ← (1−d)/N + d·Σ_{u→v} r(u)/deg(u)`` — the second iterative
    fixpoint operator next to ``connected_components``, and the
    template for any distributed numeric iteration.

    Determinism across engines (the hard part of iterative FLOAT
    algorithms): per-edge contributions are rounded to 12 dp and
    summed through DECIMAL(28,14), so the per-node sum is independent
    of aggregation order; ranks are re-rounded to 10 dp each round.
    The DuckDB oracle replays the identical rounded recurrence, so a
    3-round PageRank is content-hash checkable — without the decimal
    discipline, float sum order would diverge engines at ~1 ulp and
    amplify through rounds.

    Scale: per round = one edge⋈rank join + one partial-aggregated sum
    (shuffles keyed on node ids — stable keys, AQE reuses layout) and
    a lineage-truncating materialize; ranks table = nodes×16 bytes."""
    # Materialize the edge table FIRST: it is consumed by deg/nodes/nn
    # and by every iteration round — when it comes from an expensive
    # producer (the LSH near-dup pipeline), an un-truncated lineage
    # recomputes that producer once per consumer (measured: 6.9 s → the
    # producer's own 2.6 s + fixpoint work, after this barrier).
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if fixpoint_partitions:
        # The fixpoint tables are edge-sized (near-dup graphs: edges ≪
        # corpus). Iterating them across the session's full shuffle
        # width pays per-round scheduling for mostly-empty partitions —
        # size the loop's parallelism to the GRAPH, not the corpus
        # (measured at sf0.1: 6.4 s → ~4 s with 4 partitions on a
        # ~100-edge graph; at real scale pick ~edges/1e6).
        e = e.repartition(fixpoint_partitions)
    e = materialize(e)
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = materialize(e.join(deg, "src"))
    nodes = materialize(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count("*").alias("n"))
    d = float(damping)
    r = (
        nodes.crossJoin(F.broadcast(nn))
        .select("node", F.round(F.lit(1.0) / F.col("n"), 10).alias("r"))
        .transform(materialize)
    )
    for _ in range(n_rounds):
        contrib = ed.join(r.withColumnRenamed("node", "src"), "src").select(
            "dst",
            F.round(F.col("r") / F.col("deg"), 12)
            .cast("decimal(28,14)")
            .alias("c"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("acc"))
        r = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - F.lit(d)) / F.col("n")
                    + F.lit(d)
                    * F.coalesce(F.col("acc").cast("double"), F.lit(0.0)),
                    10,
                ).alias("r"),
            )
            .transform(materialize)
        )
    return r.select("node", F.col("r").alias("rank"))


def triangle_counts(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    orient_by_degree: bool = False,
) -> DataFrame:
    """Per-node triangle participation over an undirected graph given as
    canonical ``src < dst`` edges: (node, n_triangles) for every node in
    at least one triangle. Triangle density over a near-dup graph
    separates genuine duplicate CLUSTERS (cliquish: template families,
    mirror sites) from chains of borderline pairwise matches — the
    diagnostic read before choosing a collapse policy.

    Enumeration uses the ordered orientation: a<b<c paths from one
    self-join on the middle node, closed by a (a,c) edge semi-join, so
    each triangle is found exactly once — two equality-join shuffles on
    node keys, no DISTINCT over candidate sets.

    ``orient_by_degree`` (VERDICT r06 #8): re-orients every edge from
    the lower-(degree, id) endpoint to the higher — still a total
    order, so the orientation stays acyclic and each triangle is found
    exactly once from its minimum-(degree, id) corner; identical
    output (golden-tested). This is the standard power-law refinement:
    with raw-id orientation a degree-d hub can be the a-side of d
    edges and the middle-node self-join materializes O(d²) wedges at
    it, while degree orientation bounds every node's out-degree by
    O(√m), making enumeration O(m^1.5) worst case (Schank & Wagner
    2005 / Suri & Vassilvitskii 2011). Near-dup graphs (tiny, cliquish
    components) don't need the two extra degree joins, so the flag
    defaults off and small graphs keep the simpler plan."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if orient_by_degree:
        und = e.select("a", "b").union(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        deg = und.groupBy("a").agg(F.count("*").alias("deg")).withColumnRenamed(
            "a", "node"
        )
        da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
        db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
        keyed = e.join(da, "a").join(db, "b")
        a_first = (F.col("deg_a") < F.col("deg_b")) | (
            (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
        )
        e = keyed.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("a"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("b"),
        )
    paths = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
        )
    )
    tri = paths.alias("p").join(
        e.alias("e3"),
        (F.col("p.a") == F.col("e3.a")) & (F.col("p.c") == F.col("e3.b")),
        "leftsemi",
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
