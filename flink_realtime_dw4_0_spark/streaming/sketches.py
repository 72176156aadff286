"""Incremental sketch maintenance — the streaming half of the mergeable
register sketches (`operators.profiling`: HLL `max_rho`, count-min `cnt`,
histogram `cnt`).

Because every sketch's state is a register TABLE mergeable by a single
commutative aggregate (max for HLL, sum for count-min/histogram), keeping
a sketch current over a stream is just: per micro-batch, compute the
batch's registers, merge them into the keyed serving table with that
aggregate.  No history re-scan, state bounded by the register space
(m per group), batch replay idempotent for max-merge (HLL) and handled
for sum-merge by the upstream exactly-once/dedup layer like every
additive serving table (ROUND2 K1 notes).

This is the 100 TB cardinality/frequency/quantile serving design: daily
jobs append register deltas; the serving merge is O(registers), never
O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.upsert import KeyedTable


class StreamingSketchMerge:
    """Maintains a register table under `path` keyed by `key_cols`,
    merging each batch's registers with `how` ('max' for HLL rho,
    'sum' for count-min / histogram counters) over `value_col`."""

    def __init__(self, path: str, key_cols: list[str], value_col: str, how: str):
        if how not in ("max", "sum"):
            raise ValueError(f"how must be 'max' or 'sum', got {how!r}")
        self.key_cols = list(key_cols)
        self.value_col = value_col
        self.how = how
        self.state = KeyedTable(path, keys=self.key_cols)

    def process_batch(self, batch_registers: DataFrame, spark: SparkSession) -> None:
        cols = self.key_cols + [self.value_col]
        cand = batch_registers.select(*cols)
        prev = self.state.read(spark)
        if prev is not None:
            cand = cand.unionByName(prev.select(*cols))
        agg = F.max(self.value_col) if self.how == "max" else F.sum(self.value_col)
        merged = (
            cand.groupBy(*self.key_cols)
            .agg(agg.alias(self.value_col))
            .localCheckpoint()  # pin before the commit GCs prior state dirs
        )
        # merged IS the complete next state (it read + combined prev):
        # replace() commits it directly, skipping merge()'s second state
        # read and its guaranteed-empty anti-join
        self.state.replace(merged)

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.state.read(spark)
