"""Streaming SCD type-2 history sink.

The cross-batch twin of the batch `dim_scd2_history` query: a CDC update
stream drives an append-mostly history table where each key's attribute
versions carry [valid_from, valid_to) validity intervals and exactly one
open (valid_to IS NULL) row per key.  The reference's dims are type-1
overwrites (DimSinkFunction.java upserts the latest row); this sink keeps
the full history so as-of joins can answer "what did the dim say at t".

Merge contract (replay-idempotent — foreachBatch may redeliver a batch):
  * rows are keyed by (key, valid_from_ms): re-processing the same batch
    re-derives byte-identical rows and the MERGE converges;
  * an open interval is closed by upserting the SAME (key, valid_from_ms)
    row with valid_to_ms set — never by delete+insert, so a crash between
    steps leaves a consistent (just older) table.

Scale shape: per batch, one window over the BATCH (partitioned by key —
batches are small relative to state), a keyed join against only the OPEN
rows of the history (a filter on the state table, at scale a partition of
it), and one MERGE.  History grows append-only; closed rows are never
rewritten again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .upsert import KeyedTable


class Scd2History:
    """SCD2 history over a KeyedTable keyed by (key, valid_from_ms)."""

    def __init__(self, path: str, key: str, ts_col: str = "ts"):
        self.key = key
        self.ts_col = ts_col
        self.table = KeyedTable(path, keys=[key, "valid_from_ms"])

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.table.read(spark)

    def process_batch(self, batch: DataFrame, spark: SparkSession) -> None:
        k, ts = self.key, self.ts_col
        w = Window.partitionBy(k).orderBy(ts)
        # chain intervals WITHIN the batch: each update's valid_to is the
        # next update's ts for the same key (null = still open)
        new_rows = batch.select(
            "*",
            F.unix_millis(F.col(ts)).alias("valid_from_ms"),
            F.unix_millis(F.lead(ts).over(w)).alias("valid_to_ms"),
        ).drop(ts)
        upserts = new_rows
        current = self.read(spark)
        if current is not None:
            # close each key's open interval at the key's FIRST batch ts
            firsts = batch.groupBy(k).agg(
                F.unix_millis(F.min(ts)).alias("__close_ms")
            )
            closed = (
                current.filter(F.col("valid_to_ms").isNull())
                .join(firsts, k)
                # strict >: never close before/at the open instant — an
                # equal-ts replay instead REPLACES the open row via the
                # (key, valid_from_ms) MERGE, avoiding a PK collision
                # between the closed copy and the re-derived new row
                .filter(F.col("__close_ms") > F.col("valid_from_ms"))
                .withColumn("valid_to_ms", F.col("__close_ms"))
                .drop("__close_ms")
            )
            upserts = closed.unionByName(new_rows, allowMissingColumns=True)
        self.table.merge(spark, upserts)

    def foreach_batch(self):
        def fn(batch: DataFrame, batch_id: int) -> None:
            self.process_batch(batch, batch.sparkSession)

        return fn
