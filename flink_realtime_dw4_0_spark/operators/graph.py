"""Graph analytics over edge DataFrames: PageRank power iteration.

Complements the dedup tier's connected-components operators (hash-min and
star contraction in operators/dedup.py) with a weighted-importance
ranking — the standard tool for link-graph corpus curation (e.g.
harmonic/PageRank centrality as a document-quality prior in CommonCrawl
pipelines).

Distributed shape per iteration: one join of the edge list against the
current rank vector on ``src`` (both hash-partitioned on the same key —
Catalyst reuses the partitioning across iterations), one map-combinable
``sum`` keyed by ``dst``, one left join back onto the node set.  Only
O(1) scalars (node count) ever reach the driver; lineage is truncated
every iteration with ``localCheckpoint`` exactly like the components
loop, so plans stay flat at any iteration count.

Semantics (documented so the DuckDB oracle can replay them): classic
simplified PageRank r' = (1-d)/N + d·Σ_in r/outdeg with NO dangling-mass
redistribution — sink nodes leak their damped mass, as in the original
formulation; ranks therefore sum to ≤ 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """PageRank over a (src, dst) edge list (duplicate edges count once —
    deduped up front).  Returns (node, pagerank) over every node that
    appears as a source or destination.

    With ``weight``, mass distributes ∝ edge weight instead of uniformly
    (duplicate (src, dst) rows sum their weights): the weighted-graph
    variant used when edges carry interaction counts.

    ``checkpoint_interval`` controls how often the rank vector's lineage
    is truncated: every iteration is safest for long runs, but each
    localCheckpoint is an eager materialization job — for short runs
    letting a few iterations chain in one plan is measurably faster
    (3.9 s -> ~2 s at sf0.1 for iters=3)."""
    if weight is None:
        e = edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        ).distinct()
        e = e.withColumn("w", F.lit(1.0))
    else:
        e = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    # one eager materialization; the dedup/agg already leaves e hash-
    # partitioned on (src, dst), and the per-iteration joins broadcast
    # the (small) rank vector, so no further repartition is needed
    e = e.localCheckpoint()
    nodes = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.sum("w").alias("wsum"))
    # fold the out-degree onto the edge list ONCE (r13): the former plan
    # recomputed deg and re-joined it against e in EVERY iteration — the
    # same groupBy+join three times for iters=3.  The per-row arithmetic
    # below is unchanged (rank * w / wsum over identical operand values),
    # so ranks are bit-identical to the unfolded plan.
    ew = e.join(deg, "src").localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for it in range(iters):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("wsum")).alias("mass"))
        )
        ranks = nodes.join(
            contrib.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + damping * F.coalesce("mass", F.lit(0.0))
            ).alias("rank"),
        )
        if (it + 1) % checkpoint_interval == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.col("rank").alias("pagerank"))


def triangle_count(edges: DataFrame, *, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count per node via degree-ordered edge orientation.

    The naive 3-way self-join fans out on hub nodes (a degree-d node
    contributes d² wedge rows).  Orienting every edge from its
    lower-(degree, id) endpoint to the higher one — the classic
    compact-forward trick — bounds each node's OUT-degree by O(√m), so
    the wedge join is Σ outdeg² = O(m^1.5) worst case instead of Σ deg².
    Three hash joins, all on node keys; no cartesian.

    Returns (node, n_triangles) for every node in ≥1 triangle; the
    total is Σ/3 per the usual convention (each triangle counted at its
    three corners)."""
    # Materialize the shared subtrees (r13).  Catalyst inlines every
    # DataFrame reference, so `oriented` (referenced 3x by the wedge
    # join) and `und`/`deg` (2x each) were re-planned and re-executed
    # per reference — the formatted plan held 216 copies of the upstream
    # edge scan and 632 Exchange nodes, and the dominant cost was
    # recomputing the (typically join-heavy) edge derivation.  A lazy
    # localCheckpoint computes each once and serves every consumer from
    # stored blocks (released by the ContextCleaner when the plan is
    # GC'd, unlike cache()).
    e = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # one pass instead of union-of-two-selects: explode emits (a,b) and
    # (b,a) per edge row — identical multiset, e evaluated once
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a"), F.col("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("s")
    ).select("s.a", "s.b")
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("a", "n")
    deg = deg.localCheckpoint(eager=False)
    # orient: keep (u, v) if (deg_u, u) < (deg_v, v)
    du = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    dv = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    oriented = (
        und.join(du, "a")
        .join(dv, "b")
        .filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    # wedges a->b, b->c ; close with oriented edge a->c
    w = oriented.select(F.col("a").alias("x"), F.col("b").alias("y")).join(
        oriented.select(F.col("a").alias("y"), F.col("b").alias("z")), "y"
    )
    tri = w.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("z")),
        ["x", "z"],
    )
    # explode instead of 3-way union: `tri` (the wedge-close join) is
    # evaluated once, not three times; corner multiset identical
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def deterministic_walks(
    edges: DataFrame,
    *,
    length: int = 3,
    seed: str = "walk",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic graph walks — DeepWalk/node2vec context generation
    with NO RNG state: the walker that started at ``s``, standing at
    ``u`` on step ``k``, moves to
    ``neighbors(u)[ md5(seed‖s‖':'‖k) mod deg(u) ]`` where neighbors is
    the sorted-distinct adjacency array.  Fully reproducible across
    runs, partitionings, and engines (the md5 arithmetic replays in the
    SQL twin), which is what makes walk-based context pairs usable as
    versioned training data.

    One walk per node; walks stop early at sinks.  Shape per step: one
    equi-join of the walker frontier against the adjacency table (the
    frontier only ever carries (start, cur) ids) — ``length`` keyed
    shuffles total, no driver traffic.

    Returns (start, step, node): step 0 is the start itself.
    """
    # Materialize the shared stages (r13): the walk output is a union of
    # ``length + 1`` frontier branches, and branch k's plan chained every
    # join back to the raw edge derivation — `nbrs` (a full groupBy over
    # the deduped edge list) was re-executed once PER JOIN, i.e.
    # O(length²) times across the union (the formatted plan held 112
    # copies of the upstream scans).  Lazy localCheckpoints compute the
    # edge list, the adjacency table, and each frontier once.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nbrs = (
        e.groupBy("u")
        .agg(F.sort_array(F.collect_set("v")).alias("ns"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.explode(F.array("u", "v")).alias("u")).distinct()
    )
    frontier = nodes.select(F.col("u").alias("start"), F.col("u").alias("cur"))
    out = frontier.select(
        "start", F.lit(0).alias("step"), F.col("cur").alias("node")
    )
    for k in range(1, length + 1):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed),
                        F.col("start").cast("string"),
                        F.lit(f":{k}"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        stepped = (
            frontier.join(nbrs, frontier["cur"] == nbrs["u"])
            .select(
                "start",
                F.element_at("ns", (h % F.size("ns") + 1).cast("int")).alias("cur"),
            )
            # each frontier feeds BOTH the output union and the next
            # step's join — checkpoint so step k runs its joins once
            # instead of being replayed by every later branch
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(
            stepped.select("start", F.lit(k).alias("step"), F.col("cur").alias("node"))
        )
        frontier = stepped
    return out
