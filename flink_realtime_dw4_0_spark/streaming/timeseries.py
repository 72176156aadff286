"""Incremental EWMA maintenance — the streaming twin of
``operators.timeseries.ewma_level``.

The EWMA recurrence folds left-to-right, so a micro-batch continues
exactly where the stored level stopped: per key, fold the batch's
(ts, seq)-ordered values starting from the persisted level (or from the
batch's first value for unseen keys).  State is ONE row per key
(level, n_points, last ts/seq) — O(keys), never O(events).

Ordering contract (same as Flink keyed processing on an ordered source):
batches must arrive in event order per key; a batch whose rows precede a
key's stored (last_ts, last_seq) would fold out of order, so such rows
are REJECTED loudly (count returned) rather than silently blended —
late data belongs to the `streaming/sideoutput.py` router upstream.

Equality with the batch operator over the full series is golden-tested
(tests/test_streaming.py): incremental state after N batches ==
``ewma_level`` over the concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.upsert import KeyedTable


class StreamingEwma:
    def __init__(
        self,
        path: str,
        *,
        key: str = "user_id",
        ts: str = "ts",
        value: str = "value",
        seq: str = "event_id",
        alpha: float = 0.2,
    ):
        self.state = KeyedTable(path, keys=[key])
        self.key, self.ts, self.value, self.seq = key, ts, value, seq
        self.alpha = alpha

    def process_batch(self, batch: DataFrame, spark: SparkSession) -> int:
        """Fold the batch into the per-key levels; returns the number of
        REJECTED out-of-order rows (0 in an ordered pipeline)."""
        k, ts, v, seq, a = self.key, self.ts, self.value, self.seq, self.alpha
        prev = self.state.read(spark)
        if prev is None:
            # derive the empty state schema from the BATCH's own types
            # (a hardcoded `key long` would make string/int keys fail the
            # first-batch join under ANSI casting)
            prev = batch.select(
                F.col(k),
                F.lit(None).cast("double").alias("ewma"),
                F.lit(None).cast("long").alias("n_points"),
                F.col(ts).alias("last_ts"),
                F.col(seq).cast("long").alias("last_seq"),
            ).limit(0)
        joined = batch.select(
            F.col(k),
            F.col(ts).alias("__ts"),
            F.col(seq).cast("long").alias("__seq"),
            F.col(v).cast("double").alias("__v"),
        ).join(prev, k, "left")
        ordered_ok = (
            F.col("last_ts").isNull()
            | (F.struct("__ts", "__seq") > F.struct("last_ts", "last_seq"))
        )
        n_rejected = joined.filter(~ordered_ok).count()
        ok = joined.filter(ordered_ok)
        # per-key fold of the batch slice, seeded by the stored level
        arr = F.transform(
            F.sort_array(F.collect_list(F.struct("__ts", "__seq", "__v"))),
            lambda s: s["__v"],
        )
        g = ok.groupBy(k).agg(
            arr.alias("__xs"),
            F.first("ewma", ignorenulls=True).alias("__prev"),
            F.coalesce(F.first("n_points", ignorenulls=True), F.lit(0)).alias("__n"),
            F.max(F.struct("__ts", "__seq")).alias("__last"),
        )
        seeded = F.when(
            F.col("__prev").isNotNull(), F.col("__prev")
        ).otherwise(F.element_at("__xs", 1))
        rest = F.when(
            F.col("__prev").isNotNull(), F.col("__xs")
        ).otherwise(F.slice("__xs", 2, F.size("__xs") - 1))
        folded = F.aggregate(rest, seeded, lambda acc, x: (1 - a) * acc + a * x)
        new_rows = g.select(
            k,
            folded.alias("ewma"),
            (F.col("__n") + F.size("__xs")).cast("long").alias("n_points"),
            F.col("__last.__ts").alias("last_ts"),
            F.col("__last.__seq").alias("last_seq"),
        )
        self.state.merge(spark, new_rows)
        return n_rejected

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.state.read(spark)
