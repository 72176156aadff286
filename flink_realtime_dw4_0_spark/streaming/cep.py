"""Streaming CEP: keyed sequence matching with an event-time timeout —
the Flink ``Pattern.begin(..).followedBy(..).within(T)`` surface
(including the timed-out-partial-match side output Flink exposes via
``PatternTimeoutFunction``), expressed Spark-first.

Design: the per-step predicates are evaluated DECLARATIVELY before the
stateful operator — each event carries a ``step_mask`` bit per satisfied
predicate, computed as JVM column expressions — so the
``applyInPandasWithState`` function is pure control flow over (ts, mask)
pairs: k longs of state per key, never a buffered event list.  The state
machine binds each step to the minimum event time strictly greater than
the previous bound (the same relaxed-contiguity semantics as
``operators.cep.match_sequence``, whose batch twin is oracle-exact), and
an ``EventTimeTimeout`` timer at ``anchor + within`` emits a
``status='timeout'`` row when the watermark passes an incomplete match —
so downstream sees every anchor resolve exactly once, as a match or a
timeout.

Ordering contract: within a micro-batch events are processed in event-
time order; across batches the machine only binds forward (an event
older than an already-bound step cannot rebind it).  With a watermark
that holds batches to near-ordered arrival this matches the batch
matcher; the goldens exercise both the cross-batch continuation and the
timeout path.  Parity: Flink CEP's NFA has the same within/timeout
semantics (reference plans funnels ad hoc; SURVEY §2 CEP tier).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _out_schema() -> StructType:
    return StructType(
        [
            StructField("key", StringType()),
            StructField("status", StringType()),  # 'match' | 'timeout'
            StructField("anchor_ts", LongType()),
            StructField("step_ts", ArrayType(LongType())),
        ]
    )


# state: progress index i (next step to bind) + bound ts per step so far,
# packed as one array<long>: [i, t0, t1, ... t_{i-1}]
_STATE = StructType([StructField("packed", ArrayType(LongType()))])


def sequence_matcher_fn(n_steps: int, within_ms: int):
    """Build the keyed state function: binds steps 0..n_steps-1 in order;
    emits one row per resolved anchor."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        if state.hasTimedOut:
            (packed,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [k],
                    "status": ["timeout"],
                    "anchor_ts": [packed[1]],
                    "step_ts": [list(packed[1:])],
                }
            )
            return

        if state.exists:
            (packed,) = state.get
            prog = int(packed[0])
            bound = list(packed[1:])
        else:
            prog, bound = 0, []

        out_key, out_status, out_anchor, out_steps = [], [], [], []
        rows = []
        for pdf in pdfs:
            rows.append(pdf[["ts", "step_mask"]])
        if rows:
            ev = pd.concat(rows, ignore_index=True).sort_values("ts")
            for ts, mask in zip(ev["ts"].astype("int64"), ev["step_mask"].astype("int64")):
                ts = int(ts)
                # expire the pending anchor inline if this event is past
                # its window (the timer also covers the quiet case)
                if bound and ts > bound[0] + within_ms and prog < n_steps:
                    out_key.append(k)
                    out_status.append("timeout")
                    out_anchor.append(bound[0])
                    out_steps.append(list(bound))
                    prog, bound = 0, []
                if prog == 0:
                    if mask & 1:
                        prog, bound = 1, [ts]
                elif prog < n_steps:
                    if (mask >> prog) & 1 and ts > bound[-1]:
                        bound.append(ts)
                        prog += 1
                if prog == n_steps:
                    if bound[-1] - bound[0] <= within_ms:
                        out_key.append(k)
                        out_status.append("match")
                        out_anchor.append(bound[0])
                        out_steps.append(list(bound))
                    prog, bound = 0, []

        if prog > 0:
            state.update(([prog] + bound,))
            # event-time timer: resolve the pending anchor as a timeout
            # when the watermark passes anchor + within
            state.setTimeoutTimestamp(bound[0] + within_ms + 1)
        elif state.exists:
            state.remove()
        if out_key:
            yield pd.DataFrame(
                {
                    "key": out_key,
                    "status": out_status,
                    "anchor_ts": out_anchor,
                    "step_ts": out_steps,
                }
            )

    return fn


def match_sequence_stream(
    events: DataFrame,
    steps: list,
    *,
    within: str = "15 minutes",
    key: str = "user_id",
    ts: str = "ts",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming sequence matcher over a watermarked event stream.

    ``events`` must carry an event-time TIMESTAMP column ``row_time``
    (or it is derived from a millisecond ``ts``); ``steps`` is the same
    ``[(name, predicate Column), ...]`` list the batch matcher takes.
    Returns a stream of (key, status, anchor_ts, step_ts).
    """
    import re

    m = re.match(r"(\d+)\s*(second|minute|hour|day)s?", within)
    if not m:
        raise ValueError(f"within must look like '15 minutes', got {within!r}")
    unit_ms = {"second": 1000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    within_ms = int(m.group(1)) * unit_ms[m.group(2)]

    mask = F.lit(0).cast("long")
    for i, (_, pred) in enumerate(steps):
        mask = mask + F.when(pred, F.lit(1 << i)).otherwise(0)
    src = events
    if "row_time" not in src.columns:
        src = src.withColumn("row_time", F.timestamp_millis(F.col(ts).cast("long")))
    src = (
        src.withWatermark("row_time", watermark)
        .select(
            F.col(key).cast("string").alias("key"),
            F.col(ts).cast("long").alias("ts"),
            mask.alias("step_mask"),
            "row_time",
        )
        .filter(F.col("step_mask") != 0)  # non-participating events drop early
    )
    return src.groupBy("key").applyInPandasWithState(
        sequence_matcher_fn(len(steps), within_ms),
        outputStructType=_out_schema(),
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
