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

Ordering contract:
  * equal-ts updates for a key (Maxwell ts is second-granularity) are
    collapsed to the LAST one per (key, ts) under a deterministic
    tiebreak — `seq_col` (a monotonic event/offset id) when provided,
    else a content hash — because the intermediate versions would carry
    empty [t, t) validity anyway and duplicate the (key, valid_from_ms)
    primary key;
  * per-key timestamps must be monotone ACROSS batches (true for binlog
    CDC, which is per-key ordered): a late update older than the key's
    open row would otherwise leave two open rows, so such rows are
    rejected (dropped) rather than spliced — replays of already-applied
    batches still converge because their rows are already in the table.

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

    def __init__(
        self, path: str, key: str, ts_col: str = "ts", seq_col: str | None = None
    ):
        self.key = key
        self.ts_col = ts_col
        self.seq_col = seq_col
        self.table = KeyedTable(path, keys=[key, "valid_from_ms"])

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.table.read(spark)

    def process_batch(self, batch: DataFrame, spark: SparkSession) -> None:
        k, ts = self.key, self.ts_col
        # Collapse equal-ts runs to the LAST update per (key, ts):
        # intermediate versions would carry empty [t, t) validity and
        # collide on the (key, valid_from_ms) PK.  Tiebreak is the
        # monotonic seq/offset column when the source provides one, else
        # a deterministic content hash (arbitrary but replay-stable).
        # The hash goes through to_json(struct(...)): unlike concat_ws it
        # keeps NULL columns distinct from empty/shifted values and
        # escapes separators, so distinct rows cannot hash-collide into a
        # partition-order-dependent row_number winner.
        tie = (
            F.col(self.seq_col)
            if self.seq_col
            else F.md5(F.to_json(F.struct(*[F.col(c) for c in batch.columns])))
        )
        wdup = Window.partitionBy(k, ts).orderBy(tie.desc())
        batch = (
            batch.withColumn("__rn", F.row_number().over(wdup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        w = Window.partitionBy(k).orderBy(ts)
        # chain intervals WITHIN the batch: each update's valid_to is the
        # next update's ts for the same key (null = still open); (key, ts)
        # is unique after the collapse, so the order is deterministic
        new_rows = batch.select(
            "*",
            F.unix_millis(F.col(ts)).alias("valid_from_ms"),
            F.unix_millis(F.lead(ts).over(w)).alias("valid_to_ms"),
        ).drop(ts)
        current = self.read(spark)
        if current is not None:
            opens = current.filter(F.col("valid_to_ms").isNull()).select(
                k, F.col("valid_from_ms").alias("__open_ms")
            )
            # Reject regressing (late) updates older than the key's open
            # row: splicing them in would rewrite closed history, and
            # keeping them would leave two open rows.  Rows >= the open
            # instant pass, so replays of an applied batch re-derive the
            # surviving rows byte-identically.  Rejected rows form a
            # PREFIX of each key's in-batch chain (valid_from increases
            # along it), so the surviving chain stays consistent.
            new_rows = (
                new_rows.join(opens, k, "left")
                .filter(
                    F.col("__open_ms").isNull()
                    | (F.col("valid_from_ms") >= F.col("__open_ms"))
                )
                .drop("__open_ms")
            )
            # close each key's open interval at the key's first SURVIVING
            # batch ts (not the raw batch min — a rejected late row must
            # not pick the close point)
            firsts = new_rows.groupBy(k).agg(
                F.min("valid_from_ms").alias("__close_ms")
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
        else:
            upserts = new_rows
        self.table.merge(spark, upserts)

    def foreach_batch(self):
        def fn(batch: DataFrame, batch_id: int) -> None:
            self.process_batch(batch, batch.sparkSession)

        return fn
