"""Late-data side output: Flink's ``allowedLateness`` +
``sideOutputLateData`` semantics on top of micro-batches.

Flink windows drop elements older than (watermark − allowed lateness)
from the main aggregation but let the pipeline CAPTURE them through a
side-output tag (the reference's DWS windows would use this for audit /
backfill feeds).  Spark Structured Streaming's built-in watermark drops
such rows silently — there is no dropped-rows channel — so the parity
design routes explicitly in ``foreachBatch``:

* per-PARTITION watermark state (one row per source partition in a
  KeyedTable, mirroring Flink's per-source-partition watermarks): the
  running max event time each partition has delivered;
* the operator watermark is the MIN across partitions minus the
  out-of-orderness bound, frozen at its PRE-batch value (Flink advances
  watermarks between elements, never retroactively) — so routing is a
  pure function of (pre-batch state, batch) and a replayed batch routes
  identically;
* rows below (watermark − allowed lateness) go to the late side output;
  everything else continues to the main flow.

Scale shape: routing is one broadcast of a scalar against the batch; the
state read/merge touches n_partitions rows.  Nothing event-sized crosses
the driver — only the per-partition max aggregation result (bounded by
the partition count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.upsert import KeyedTable


class LateRouter:
    """Split each micro-batch into (on_time, late) against a persistent
    per-partition watermark, then advance the watermark state."""

    def __init__(
        self,
        state_path: str,
        *,
        delay: str = "5 seconds",
        allowed_lateness: str = "0 seconds",
        partition_col: str = "part",
        ts_col: str = "ts",
    ):
        self.state = KeyedTable(state_path, keys=[partition_col])
        self.delay = delay
        self.allowed_lateness = allowed_lateness
        self.partition_col = partition_col
        self.ts_col = ts_col

    def _current_watermark(self, spark: SparkSession):
        """Operator watermark = min over per-partition max event times,
        minus the out-of-orderness delay.  None until every partition has
        reported at least once is WRONG for Flink (idle partitions hold
        the watermark back — same here: min does exactly that); None only
        before ANY data."""
        st = self.state.read(spark)
        if st is None:
            return None
        return st.agg(F.min("max_ts").alias("m")).collect()[0].m

    def process_batch(
        self, batch: DataFrame, spark: SparkSession
    ) -> tuple[DataFrame, DataFrame]:
        """Returns (on_time, late) for this batch and advances the
        per-partition watermark state afterwards.  Late means
        ts < pre-batch watermark − delay − allowed_lateness."""
        wm = self._current_watermark(spark)
        if wm is None:
            on_time, late = batch, batch.limit(0)
        else:
            threshold = (
                F.lit(wm).cast("timestamp")
                - F.expr(f"INTERVAL {self.delay}")
                - F.expr(f"INTERVAL {self.allowed_lateness}")
            )
            # NULL event times can never be late (coalesce, not a bare
            # <: a bare NULL comparison would fail BOTH filters and
            # silently lose the row — the exact contract this module
            # exists to prevent)
            is_late = F.coalesce(F.col(self.ts_col) < threshold, F.lit(False))
            late = batch.filter(is_late)
            on_time = batch.filter(~is_late)
        # advance per-partition watermark state (monotone max-merge)
        new_max = batch.groupBy(self.partition_col).agg(
            F.max(self.ts_col).alias("max_ts")
        )
        prev = self.state.read(spark)
        if prev is not None:
            merged = (
                new_max.unionByName(prev.select(self.partition_col, "max_ts"))
                .groupBy(self.partition_col)
                .agg(F.max("max_ts").alias("max_ts"))
            )
        else:
            merged = new_max
        # routing reads `batch` lazily AFTER the state flip below would
        # GC nothing (replace keeps crash-safe snapshots), but the split
        # DataFrames close over the PRE-batch threshold scalar, so state
        # advancement cannot leak into this batch's routing
        self.state.replace(merged)
        return on_time, late


def late_flags_batch(
    events: DataFrame,
    *,
    delay: str = "5 seconds",
    partition_col: str = "part",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Batch twin of the router for the correctness gate: replay the
    whole stream in arrival order (``order_col``) and flag each row
    against the watermark in force BEFORE it arrived.

    Per-partition running max event time over earlier arrivals is a
    keyed window (distributed — partitioned by the source partition);
    the operator watermark is the min across partitions, which for the
    batch replay is the min over each partition's running max at the
    row's arrival point — computed with one self-join on arrival rank
    buckets would be exact Flink alignment, but batch replay here uses
    the row's OWN partition watermark (per-partition lateness), the
    granularity at which the oracle can replay deterministically."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(ts_col).over(w)
    return events.withColumn(
        "is_late",
        F.when(
            F.col(ts_col)
            < prev_max - F.expr(f"INTERVAL {delay}"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
