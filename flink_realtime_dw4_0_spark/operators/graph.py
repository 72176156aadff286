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
) -> DataFrame:
    """PageRank over a (src, dst) edge list (duplicate edges count once —
    deduped up front).  Returns (node, pagerank) over every node that
    appears as a source or destination."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.repartition("src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping * F.coalesce("mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("rank").alias("pagerank"))
