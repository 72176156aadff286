"""Incrementally-maintained aggregate views over a KeyedTable base —
the materialized-view layer (Delta Live Tables / Materialize semantics)
on this engine's snapshot tables.

A serving aggregate (SUM/COUNT per group) over a mutable base table
normally needs a full re-scan per refresh.  With the base's change data
feed (`KeyedTable.changes`: insert / delete / update pre+post images),
each refresh applies only the DELTAS: inserts and update-postimages add
(+value, +1), deletes and update-preimages subtract — SUM and COUNT are
abelian-group aggregates, so delta application is exact, order-free, and
O(|changes|), never O(|base|).

Contract: call ``refresh`` exactly once after each base commit (the feed
diffs consecutive snapshots; ``keep_versions >= 2`` on the base).
Groups whose row count reaches zero are deleted from the view, so the
view's key set always equals the live group set.

AVG/derived ratios come from (sum, count) at read time; MIN/MAX are NOT
maintainable this way (not invertible) — recompute those or use the
register sketches (`streaming/sketches.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import KeyedTable


class IncrementalAggView:
    def __init__(
        self,
        base: KeyedTable,
        path: str,
        *,
        group_cols: list[str],
        sum_cols: list[str],
    ):
        self.base = base
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.view = KeyedTable(path, keys=self.group_cols)

    def refresh(self, spark: SparkSession) -> None:
        ch = self.base.changes(spark, 1)
        if ch is None:
            # Bootstrap is legal ONLY while the view is empty.  With view
            # state present, a missing change feed (keep_versions=1 on
            # the base, or a re-run after the previous snapshot was GC'd)
            # must fail loudly — falling back to a full-snapshot insert
            # would silently double every sum/count.
            if self.view.read(spark) is not None:
                raise RuntimeError(
                    "change feed unavailable but the view has state; "
                    "cannot refresh incrementally (base needs "
                    "keep_versions >= 2 and one refresh per commit)"
                )
            base_df = self.base.read(spark)
            if base_df is None:
                return
            ch = base_df.withColumn("_change_type", F.lit("insert"))
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        deltas = ch.groupBy(*self.group_cols).agg(
            *[
                F.sum(sign * F.col(c)).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
            F.sum(sign).alias("n_rows"),
        )
        prev = self.view.read(spark)
        if prev is not None:
            merged = (
                deltas.unionByName(prev)
                .groupBy(*self.group_cols)
                .agg(
                    *[
                        F.sum(f"sum_{c}").alias(f"sum_{c}")
                        for c in self.sum_cols
                    ],
                    F.sum("n_rows").alias("n_rows"),
                )
            )
        else:
            merged = deltas
        # the live/dead split consumes `merged` twice; materialize the
        # change-feed diff + delta aggregation once instead of recomputing
        # the full-outer join per consumer
        merged = merged.localCheckpoint()
        live = merged.filter(F.col("n_rows") > 0)
        dead = merged.filter(F.col("n_rows") <= 0).select(*self.group_cols)
        self.view.merge(spark, live, deletes=dead)

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.view.read(spark)
