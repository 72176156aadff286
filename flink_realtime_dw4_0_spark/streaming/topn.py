"""Continuous (streaming) Top-N — Flink SQL's classic Top-N pattern
(`ROW_NUMBER() OVER (PARTITION BY key ORDER BY v DESC) <= N` over an
insert-only stream) maintained across micro-batches.

The reference's planned DWS serving tables (Constant.java:40-47) are
exactly the consumers of this shape ("top SKUs per province" style
leaderboards into Doris).  Flink maintains it with the AppendFast rank
strategy: state holds only the CURRENT top-N rows per key, because on an
insert-only stream only arrivals can change the ranking.  This is the
same design: keyed state is a `KeyedTable` bounded at N rows per key;
each batch unions arrivals with state, re-ranks, and emits an upsert
CHANGELOG — rows whose rank appeared/changed as upserts, evicted rows as
tombstones — which is precisely what the K3 upsert-kafka sink transports
downstream.

Scale shape: only keys with arrivals are re-ranked — the per-batch work
is one shuffle over (batch ∪ N·touched_keys) rows, independent of how
many keys the state holds, and state never exceeds N rows per key so
the sort input is bounded regardless of history length.  Replay of
a delivered batch is a no-op (dropDuplicates on (key, id) + unchanged
ranks emit nothing), keeping the changelog idempotent under
at-least-once delivery.

Contract: ids are unique per logical row and row values are immutable
once seen (Flink's AppendFast precondition); updates/retractions of
already-ranked rows need the retract-rank strategy, which the upstream
DWD layer here never produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sinks.upsert import KeyedTable


class StreamingTopN:
    def __init__(
        self,
        path: str,
        key_cols: list[str],
        id_col: str,
        order_col: str,
        n: int,
    ):
        self.key_cols = list(key_cols)
        self.id_col = id_col
        self.order_col = order_col
        self.n = n
        self.state = KeyedTable(path, keys=self.key_cols + [id_col])

    def process_batch(self, batch: DataFrame, spark: SparkSession) -> DataFrame:
        """Returns the changelog for this batch:
        (*key_cols, id, order, rnk, op) with op in ('upsert', 'delete').
        Upserts carry the NEW rank; deletes are evictions out of the
        top-N (rank is the row's last known rank)."""
        cols = self.key_cols + [self.id_col, self.order_col]
        prev = self.state.read(spark)
        arrivals = batch.select(*cols)
        # only keys with arrivals can change rank (AppendFast): restrict
        # the re-rank, eviction, and change detection to the TOUCHED keys
        # — per-batch cost is O(touched_keys * N + batch), not
        # O(total_keys * N); untouched keys ride through state.merge.
        if prev is not None:
            touched = arrivals.select(*self.key_cols).distinct()
            prev_touched = prev.join(touched, self.key_cols, "left_semi")
            cand = arrivals.unionByName(prev_touched.select(*cols))
        else:
            prev_touched = None
            cand = arrivals
        cand = cand.dropDuplicates(self.key_cols + [self.id_col])
        w = Window.partitionBy(*self.key_cols).orderBy(
            F.col(self.order_col).desc(), F.col(self.id_col)
        )
        ranked = cand.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
            F.col("rnk") <= self.n
        )
        on = self.key_cols + [self.id_col]
        if prev_touched is not None:
            evicted = prev_touched.join(ranked.select(*on), on, "left_anti")
            changed = (
                ranked.alias("new")
                .join(
                    prev_touched.select(*on, F.col("rnk").alias("__old_rnk")),
                    on,
                    "left",
                )
                .filter(
                    F.col("__old_rnk").isNull() | (F.col("__old_rnk") != F.col("rnk"))
                )
                .drop("__old_rnk")
            )
        else:
            evicted = spark.createDataFrame([], ranked.schema)
            changed = ranked
        changelog = (
            changed.withColumn("op", F.lit("upsert"))
            .unionByName(evicted.withColumn("op", F.lit("delete")))
            # pin results before merge() GCs the state version dirs this
            # plan's lineage reads (same hazard as streaming/neardup.py)
            .localCheckpoint()
        )
        ranked_pinned = ranked.localCheckpoint()
        self.state.merge(
            spark, ranked_pinned, deletes=changelog.filter(F.col("op") == "delete")
        )
        return changelog
