"""Streaming CEP: keyed sequence matching with an event-time timeout —
the Flink ``Pattern.begin(..).followedBy(..).within(T)`` surface
(including the timed-out-partial-match side output Flink exposes via
``PatternTimeoutFunction``), expressed Spark-first.

Design: the per-step predicates are evaluated DECLARATIVELY before the
stateful operator — each event carries a ``step_mask`` bit per satisfied
predicate, computed as JVM column expressions — so the
``applyInPandasWithState`` function is pure control flow over
(ts, event_id, mask) triplets.  The state machine binds each step to the
minimum event time strictly greater than the previous bound (the same
relaxed-contiguity semantics as ``operators.cep.match_sequence``, whose
batch twin is oracle-exact), and an ``EventTimeTimeout`` timer emits a
``status='timeout'`` row when the watermark passes an incomplete match's
window — so downstream sees every anchor resolve exactly once, as a
match or a timeout.

Out-of-order correctness (Flink NFA parity): Flink's CEP effectively
orders events by event time before matching — a cross-batch event that
arrives late (but within the watermark) and belongs *between* already-
seen events must still bind in its event-time position.  The matcher
therefore never binds an event on arrival; it BUFFERS (ts, event_id,
mask) triplets in keyed state and only feeds an event to the state
machine once the watermark has passed its timestamp (the event is
"sealed": nothing earlier can still arrive).  Sealed events are bound in
(ts, event_id) order, so the sequence the machine consumes is globally
event-time ordered regardless of arrival order, and equal-timestamp
events tie-break on the stable ``event_id`` — deterministic across runs
and partitionings, like ``ratelimit`` and the batch twin.  Events older
than the watermark at arrival are dropped (standard late-data contract).
State is bounded: the buffer holds only events inside the watermark
delay (plus the current batch), and the machine itself is k longs.

The seal frontier is driven by the same ``EventTimeTimeout`` timer as
the timeout path: whenever the buffer is non-empty the timer is armed at
the earliest buffered timestamp (clamped above the current watermark),
so a quiet key still drains its buffer as the global watermark advances.
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


# state:
#   packed — machine progress: [i, t0, t1, ... t_{i-1}] (next step i)
#   buf    — unsealed events, interleaved [ts, event_id, mask, ...]
_STATE = StructType(
    [
        StructField("packed", ArrayType(LongType())),
        StructField("buf", ArrayType(LongType())),
    ]
)


# Per-processor timer-memo capacity: ~60 B per entry, so the cap holds
# worker memory under ~15 MB per partition even on extreme-cardinality
# key spaces; eviction only costs the evicted key a listTimers fallback
# on its next re-arm.
_TIMER_MEMO_MAX = 200_000


class _TwsState:
    """GroupState-shaped adapter over a transformWithStateInPandas
    ValueState + timer handle, so the CEP machine bodies (this module's
    ``sequence_matcher_fn`` and ``cep_pattern``'s two matchers) run
    VERBATIM on both state APIs — one transition implementation, zero
    drift.  Exposes exactly the operations the machines use:
    ``exists`` / ``get`` (properties, like GroupState),
    ``getCurrentWatermarkMs``, ``update`` + ``setTimeoutTimestamp``
    (register-after-clearing — TWS timers persist, GroupState's is
    re-armed per invocation), and ``remove``.

    ``timer_memo`` (r11, the cep_seq/nested-MR flip-gap work): the
    adapter keeps AT MOST ONE live timer per key, so an LRU memo of
    {key: registered_ts} per processor instance replaces the
    listTimers round trip on every re-arm — an unchanged deadline
    skips the state server entirely (0 RPCs instead of 3), a moved
    deadline is delete+register (2).  SAFE because every machine
    routed through ``run_matcher_tws`` clamps its re-arm to
    ``max(min_deadline, wm + 1)``: a deadline equal to a timer that
    already fired (ts <= wm) can never recur, so a memo hit always
    refers to a timer that is genuinely still registered.  The memo is
    a CACHE: a restarted worker starts empty and falls back to
    listTimers, restoring the one-timer invariant before trusting the
    memo again."""

    def __init__(self, vs, handle, timer_values, timed_out: bool,
                 key=None, timer_memo=None):
        self._vs = vs
        self._handle = handle
        self._tv = timer_values
        self.hasTimedOut = timed_out
        self._key = key
        self._memo = timer_memo

    @property
    def exists(self) -> bool:
        return self._vs.exists()

    @property
    def get(self):
        # array fields come back as sequences (normalize to list, like
        # GroupState); scalar fields (e.g. the reservoir's count) pass
        # through untouched
        return tuple(
            list(x) if isinstance(x, (list, tuple)) or hasattr(x, "__len__")
            and not isinstance(x, (str, bytes)) else x
            for x in self._vs.get()
        )

    def getCurrentWatermarkMs(self) -> int:
        return self._tv.getCurrentWatermarkInMs()

    def update(self, value) -> None:
        self._vs.update(tuple(value))

    def setTimeoutTimestamp(self, ts: int) -> None:
        ts = int(ts)
        if self._memo is None:
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(ts)
            return
        known = self._memo.get(self._key)
        if known == ts:  # already armed there — 0 round trips
            self._memo.move_to_end(self._key)
            return
        if known is not None:
            self._handle.deleteTimer(known)  # idempotent if it fired
        else:  # memo miss (fresh worker / evicted): restore invariant
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
        self._handle.registerTimer(ts)
        self._memo[self._key] = ts
        self._memo.move_to_end(self._key)
        if len(self._memo) > _TIMER_MEMO_MAX:
            self._memo.popitem(last=False)

    def remove(self) -> None:
        self._vs.clear()
        if self._memo is not None:
            known = self._memo.pop(self._key, None)
            if known is not None:
                self._handle.deleteTimer(known)
                return
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)


def run_matcher_tws(src, matcher, out_schema, state_schema, ctx: str):
    """Run a GroupState-style keyed matcher generator on Spark 4.x's
    ``transformWithStateInPandas`` through the ``_TwsState`` adapter:
    ``handleInputRows`` feeds it rows; an expired event-time timer
    re-enters it with empty input and ``hasTimedOut=True`` — exactly
    GroupState's EventTimeTimeout invocation contract."""
    from ..session import ensure_protobuf

    if not ensure_protobuf():
        raise RuntimeError(
            f"{ctx}(impl='tws') needs the public `protobuf` runtime "
            "(transformWithState's state-server protocol); install "
            "protobuf or use impl='apply'"
        )
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo, StatefulProcessor, StatefulProcessorHandle,
        TimerValues,
    )

    from collections import OrderedDict

    class Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._vs = handle.getValueState("machine", state_schema)
            # per-partition timer memo (see _TwsState): keys are sticky
            # to their state-store partition across micro-batches, so
            # the memo hit rate is ~1 after the first batch
            self._timer_memo = OrderedDict()

        def handleInputRows(
            self, key, rows, timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            shim = _TwsState(self._vs, self._handle, timerValues, False,
                             key=key, timer_memo=self._timer_memo)
            yield from matcher(key, rows, shim)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues,
            expiredTimerInfo: ExpiredTimerInfo,
        ) -> Iterator[pd.DataFrame]:
            # the runtime deletes the fired timer itself: drop the memo
            # entry so a later re-arm doesn't delete a fresh timer that
            # happens to land on the stale memo value
            self._timer_memo.pop(key, None)
            shim = _TwsState(self._vs, self._handle, timerValues, True,
                             key=key, timer_memo=self._timer_memo)
            yield from matcher(key, iter(()), shim)

        def close(self) -> None:
            pass

    return src.groupBy("key").transformWithStateInPandas(
        Proc(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="eventTime",
    )


def sequence_matcher_fn(n_steps: int, within_ms: int):
    """Build the keyed state function: buffers events until the watermark
    seals them, then binds steps 0..n_steps-1 in event-time order; emits
    one row per resolved anchor."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        wm = state.getCurrentWatermarkMs()

        if state.exists:
            packed, buf = state.get
            prog = int(packed[0])
            bound = [int(t) for t in packed[1:]]
            buffer = [
                (int(buf[i]), int(buf[i + 1]), int(buf[i + 2]))
                for i in range(0, len(buf), 3)
            ]
        else:
            prog, bound, buffer = 0, [], []

        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts, eid, mask in zip(
                    pdf["ts"].astype("int64"),
                    pdf["event_id"].astype("int64"),
                    pdf["step_mask"].astype("int64"),
                ):
                    if int(ts) > wm:  # on time — buffer until sealed
                        buffer.append((int(ts), int(eid), int(mask)))
                    # else: late beyond the watermark — dropped, like Flink

        buffer.sort()  # (ts, event_id, mask): deterministic event-time order
        sealed = [e for e in buffer if e[0] <= wm]
        buffer = [e for e in buffer if e[0] > wm]

        out_key, out_status, out_anchor, out_steps = [], [], [], []

        def resolve(status: str) -> None:
            out_key.append(k)
            out_status.append(status)
            out_anchor.append(bound[0])
            out_steps.append(list(bound))

        for ts, _eid, mask in sealed:
            # expire the pending anchor inline if this event is past its
            # window (the timer covers the quiet case)
            if bound and ts > bound[0] + within_ms and prog < n_steps:
                resolve("timeout")
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
                    resolve("match")
                prog, bound = 0, []

        # the watermark itself can expire a pending anchor with no sealed
        # event past the window (the timer-fire path)
        if prog > 0 and wm > bound[0] + within_ms:
            resolve("timeout")
            prog, bound = 0, []

        if prog > 0 or buffer:
            flat = [x for e in buffer for x in e]
            state.update(([prog] + bound, flat))
            deadlines = []
            if prog > 0:
                deadlines.append(bound[0] + within_ms + 1)
            if buffer:
                deadlines.append(buffer[0][0])  # earliest unsealed ts
            state.setTimeoutTimestamp(max(min(deadlines), wm + 1))
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
    event_id: str | None = None,
    impl: str = "auto",
) -> DataFrame:
    """Streaming sequence matcher over a watermarked event stream.

    ``events`` must carry an event-time TIMESTAMP column ``row_time``
    (or it is derived from a millisecond ``ts``); ``steps`` is the same
    ``[(name, predicate Column), ...]`` list the batch matcher takes.
    ``event_id`` names a stable long column used to tie-break equal
    timestamps deterministically; when absent a stable 64-bit hash of
    the row's (key, ts, mask) stands in.  Returns a stream of
    (key, status, anchor_ts, step_ts).

    ``impl='tws'`` runs the identical machine on Spark 4.x's
    ``transformWithStateInPandas`` via ``run_matcher_tws`` (equivalence
    + restart pinned by tests, like every other stateful family).

    The default is ``'auto'`` (r11 flip): the r10 gate read 0.916 —
    below the 0.95 parity threshold — but the gap was the adapter's
    ``listTimers`` round trip on every re-arm; with the r11 timer memo
    the same best-of-3 fresh-JVM canary-normalized A/B
    (BENCH_TWS_FLIP.json family ``cep_seq``) reads best tws 10,653 vs
    apply 10,350 rows/canary = 1.029.  ``'auto'`` resolves to tws when
    the public protobuf runtime is importable, apply otherwise.
    COLD-START TAX: tws launches a per-query state server once —
    short-lived ``availableNow`` replays should pass ``impl='apply'``.  The r11 ``probe_tws_coldstart.py`` measurement refines
    this: the tax is per-SESSION — tws queries after the first
    in one JVM ran at parity with apply, so only one-shot
    fresh-JVM replays need the pin.
    CHECKPOINT PINNING: ``'auto'`` resolves per environment, so
    checkpointed long-running queries must pin ``impl`` explicitly
    (see ``match_pattern_stream``).
    """
    from ..operators.cep import parse_within_ms

    if impl not in ("auto", "apply", "tws"):
        raise ValueError(f"impl must be auto|apply|tws, got {impl!r}")
    if impl == "auto":
        from ..session import ensure_protobuf, warn_default_flip

        impl = "tws" if ensure_protobuf() else "apply"
        warn_default_flip("match_sequence_stream (cep_seq)", impl)

    within_ms = parse_within_ms(within)  # shared with the batch matcher

    mask = F.lit(0).cast("long")
    for i, (_, pred) in enumerate(steps):
        mask = mask + F.when(pred, F.lit(1 << i)).otherwise(0)
    src = events
    if "row_time" not in src.columns:
        src = src.withColumn("row_time", F.timestamp_millis(F.col(ts).cast("long")))
    eid_col = (
        F.col(event_id).cast("long")
        if event_id is not None
        else F.xxhash64(F.col(key).cast("string"), F.col(ts).cast("long"), mask)
    )
    src = (
        src.withWatermark("row_time", watermark)
        .select(
            F.col(key).cast("string").alias("key"),
            F.col(ts).cast("long").alias("ts"),
            eid_col.alias("event_id"),
            mask.alias("step_mask"),
            "row_time",
        )
        .filter(F.col("step_mask") != 0)  # non-participating events drop early
    )
    if impl == "tws":
        return run_matcher_tws(
            src, sequence_matcher_fn(len(steps), within_ms),
            _out_schema(), _STATE, "match_sequence_stream",
        )
    if impl != "apply":
        raise ValueError(f"impl must be apply|tws, got {impl!r}")
    return src.groupBy("key").applyInPandasWithState(
        sequence_matcher_fn(len(steps), within_ms),
        outputStructType=_out_schema(),
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
