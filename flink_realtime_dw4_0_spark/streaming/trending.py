"""Exponentially-decayed trending scores — the serving-side "what's hot
RIGHT NOW" rollup (trending searches/SKUs) that a plain windowed count
can't express: every occurrence contributes exp(-λ·age), so yesterday's
spike fades smoothly instead of falling off a window cliff.

The decayed sum is EXACTLY incrementally maintainable, which is the
whole point at scale:

    score(T2) = Σ exp(-λ(T2 - t_i))
              = exp(-λ(T2 - T1)) · score(T1) + Σ_{new} exp(-λ(T2 - t_i))

so the streaming state is one (item → score, asof_ts) row, each batch
decays it by the elapsed time and adds the batch's contribution — the
same one-row-per-key recurrence as `StreamingEwma`, state linear in the
distinct item count and merge cost O(batch + touched items).  The batch
twin recomputes the sum directly; the two agree to float product
associativity (golden asserts 1e-9 relative), and the batch twin itself
is DuckDB-oracle-exact (`trending_decayed_scores`).

``half_life`` sets λ = ln 2 / half_life: a score halves per half-life
of inactivity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.upsert import KeyedTable


def decayed_scores_batch(
    events: DataFrame,
    item_col: str,
    ts_col: str = "ts",
    half_life_s: float = 3600.0,
    asof_ms: int | None = None,
) -> DataFrame:
    """One-pass decayed score per item as of ``asof_ms`` (default: the
    corpus max ts): SUM(exp(-λ·age)) — map-combinable, one shuffle."""
    lam = math.log(2.0) / (float(half_life_s) * 1000.0)
    ts = F.col(ts_col).cast("long")
    if asof_ms is None:
        asof = events.agg(F.max(ts).alias("m"))
        base = events.crossJoin(F.broadcast(asof))
        age = F.col("m") - ts
    else:
        base = events.withColumn("m", F.lit(int(asof_ms)))
        age = F.lit(int(asof_ms)) - ts
    return (
        base.groupBy(F.col(item_col).alias("item"))
        .agg(
            F.round(F.sum(F.exp(-lam * age)), 6).alias("score"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("m").cast("long").alias("asof_ms"),
        )
    )


class DecayedTrending:
    """Streaming maintenance of per-item decayed scores in a KeyedTable;
    ``topk`` serves the current leaderboard."""

    def __init__(self, path: str, half_life_s: float = 3600.0):
        self.lam = math.log(2.0) / (float(half_life_s) * 1000.0)
        self.state = KeyedTable(path, keys=["item"])
        # cached copy of the stored as-of (every row carries the same
        # value — the merge writes one F.lit): the out-of-order clamp
        # reads it from here instead of scanning the whole state table
        # per batch; None = not yet known (first batch after a restart
        # reads it from the table once)
        self._asof: int | None = None

    def process_batch(self, batch: DataFrame, spark: SparkSession,
                      item_col: str = "item", ts_col: str = "ts") -> None:
        ts = F.col(ts_col).cast("long")
        asof_row = batch.agg(F.max(ts).alias("m")).collect()
        if not asof_row or asof_row[0]["m"] is None:
            return
        asof = int(asof_row[0]["m"])
        prev = self.state.read(spark)
        if prev is not None:
            # An out-of-order micro-batch (batch max ts < stored as-of)
            # must NOT rewind the table's as-of: a positive exponent would
            # multiply every carried score by >1 and a later in-order
            # batch would re-decay from the wrong baseline.  Clamp the
            # merge as-of to the newest time either side has seen and age
            # the batch's events relative to that clamped as-of instead.
            # (The stored as-of is a single scalar — cached after every
            # merge; only a restart pays the one-row table read.)
            if self._asof is None:
                stored_row = prev.agg(F.max("asof_ms").alias("m")).collect()
                if stored_row and stored_row[0]["m"] is not None:
                    self._asof = int(stored_row[0]["m"])
            if self._asof is not None:
                asof = max(asof, self._asof)
        contrib = (
            batch.withColumn("__age", F.lit(asof) - ts)
            .groupBy(F.col(item_col).alias("item"))
            .agg(F.sum(F.exp(-self.lam * F.col("__age"))).alias("add"))
        )
        if prev is not None:
            # decay carried scores by the time elapsed since their as-of
            carried = prev.select(
                "item",
                (F.col("score") * F.exp(-self.lam * (F.lit(asof) - F.col("asof_ms"))))
                .alias("carry"),
            )
            merged = (
                carried.join(contrib, "item", "full_outer")
                .select(
                    "item",
                    (F.coalesce("carry", F.lit(0.0)) + F.coalesce("add", F.lit(0.0)))
                    .alias("score"),
                    F.lit(asof).alias("asof_ms"),
                )
            )
        else:
            merged = contrib.select(
                "item", F.col("add").alias("score"), F.lit(asof).alias("asof_ms")
            )
        self.state.replace(merged.localCheckpoint())
        self._asof = asof

    def topk(self, spark: SparkSession, k: int = 10) -> DataFrame | None:
        cur = self.state.read(spark)
        if cur is None:
            return None
        return cur.orderBy(F.col("score").desc(), "item").limit(k)
