"""Streaming CEP for the FULL pattern surface — strict contiguity
(``next``), fixed quantifiers (``times(n)``), and negation
(``notFollowedBy``) — on top of the watermark-buffered event-time
machine `streaming/cep.py` introduced (events held in keyed state until
the watermark seals them, then consumed in (ts, event_id) order, so
arrival order never changes the result).

Design, Spark-first like the base matcher: every predicate — positive
steps AND negations — is evaluated declaratively into one ``step_mask``
long before the stateful operator.  The ``applyInPandasWithState``
function is pure control flow:

* positive step i → mask bit i (times(n) unrolls to n bits with the
  step's contiguity);
* negation j → mask bit (P + j);
* STRICT step i binds only if the very next sealed event carries bit i —
  otherwise the partial match dies (Flink ``next``).  Patterns with a
  strict step therefore keep ALL events of the key flowing through the
  operator (a non-participating event is exactly what breaks
  strictness); relaxed-only patterns drop mask==0 rows early as before;
* a negation BETWEEN steps kills the pending partial match silently when
  a matching sealed event arrives in the gap (Flink discards the partial
  match — no timeout row is emitted for a negation kill);
* a TERMINAL negation holds a completed match in state until
  ``anchor + within`` passes on the watermark: a matching sealed event
  inside the hold window discards it, the timer (or a later sealed
  event past the deadline) releases it as a match.  This is exactly
  Flink's ``notFollowedBy(...).within(...)`` deferred emission.

State per key: the (prog, bound) machine (k longs), the unsealed event
buffer (3 longs/event inside the watermark delay), and the hold list
(groups of n_steps+1 longs, bounded by the ``within`` horizon).

Parity: the batch twin is ``operators.cep.match_pattern`` (oracle-exact
vs DuckDB); the shuffled-arrival golden asserts the stream equals it.
Divergence contract (same as the base matcher, documented): the
streaming machine runs ONE pending anchor at a time, so scenarios where
a failed earlier anchor hides a later overlapping one need
``match_pattern``'s multi-anchor batch semantics.

availableNow caveat for goldens: Spark schedules the extra
timer-firing batch only when the stateful operator itself observed the
watermark move, and relaxed-only patterns drop mask-0 rows before the
operator — so a test's watermark-advancing sentinel event must carry a
pattern bit.  Continuous triggers get later batches regardless.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..operators.cep import parse_within_ms, unroll_pattern
from .cep import _out_schema

_STATE = StructType(
    [
        StructField("packed", ArrayType(LongType())),
        StructField("buf", ArrayType(LongType())),
        StructField("hold", ArrayType(LongType())),
    ]
)


def _unpack_common(state: GroupState, n_steps: int):
    """Shared state plumbing for both matcher machines: returns
    (packed, buffer, holds) with buffer as (ts, eid, mask) triplets and
    holds as [t0..t_{n_steps-1}, deadline] groups; packed stays raw for
    the machine-specific interpretation."""
    if not state.exists:
        return [], [], []
    packed, buf, hold_flat = state.get
    buffer = [
        (int(buf[i]), int(buf[i + 1]), int(buf[i + 2]))
        for i in range(0, len(buf), 3)
    ]
    g = n_steps + 1
    holds = [
        [int(x) for x in hold_flat[i : i + g]]
        for i in range(0, len(hold_flat), g)
    ]
    return [int(x) for x in packed], buffer, holds


def _ingest_and_seal(state: GroupState, pdfs, wm: int, buffer: list):
    """Append on-time events from this invocation (late-beyond-watermark
    rows drop, like Flink), then split the buffer into the sealed prefix
    (ts <= wm, consumed now in (ts, event_id) order) and the still-open
    remainder."""
    if not state.hasTimedOut:
        for pdf in pdfs:
            for ts_v, eid, mask in zip(
                pdf["ts"].astype("int64"),
                pdf["event_id"].astype("int64"),
                pdf["step_mask"].astype("int64"),
            ):
                if int(ts_v) > wm:
                    buffer.append((int(ts_v), int(eid), int(mask)))
    buffer.sort()
    sealed = [e for e in buffer if e[0] <= wm]
    return sealed, [e for e in buffer if e[0] > wm]


class _Out:
    """Emission accumulator shared by both machines: collects resolution
    rows and manages terminal-negation holds (release on deadline pass,
    discard on an in-window negation event)."""

    def __init__(self, key: str, holds: list):
        self.key = key
        self.holds = holds
        self.rows: list[tuple[str, int, list[int]]] = []

    def emit(self, status: str, steps: list) -> None:
        self.rows.append((status, int(steps[0]), [int(t) for t in steps]))

    def release_holds(self, now_ms: int) -> None:
        due = [h for h in self.holds if now_ms > h[-1]]
        self.holds = [h for h in self.holds if now_ms <= h[-1]]
        for h in due:
            self.emit("match", h[:-1])

    def kill_holds(self, ts_v: int, mask: int, terminal_bits: list) -> None:
        if self.holds and any((mask >> b) & 1 for b in terminal_bits):
            self.holds = [h for h in self.holds if ts_v > h[-1]]

    def to_pdf(self):
        if not self.rows:
            return None
        return pd.DataFrame(
            {
                "key": [self.key] * len(self.rows),
                "status": [r[0] for r in self.rows],
                "anchor_ts": [r[1] for r in self.rows],
                "step_ts": [r[2] for r in self.rows],
            }
        )


def _finalize(
    state: GroupState, wm: int, packed: list, buffer: list, holds: list,
    anchor_deadlines: list,
) -> None:
    """Shared save/timer/cleanup: persist (packed, buffer, holds) if any
    survive, arm the event-time timer at the earliest pending deadline
    (anchor windows, earliest unsealed event, hold releases), clamped
    above the watermark; remove state when nothing remains."""
    if packed or buffer or holds:
        state.update((
            packed,
            [x for e in buffer for x in e],
            [x for h in holds for x in h],
        ))
        deadlines = list(anchor_deadlines)
        if buffer:
            deadlines.append(buffer[0][0])
        deadlines.extend(h[-1] + 1 for h in holds)
        state.setTimeoutTimestamp(max(min(deadlines), wm + 1))
    elif state.exists:
        state.remove()


def pattern_matcher_fn(
    n_steps: int,
    strict: list[bool],
    neg_before: dict[int, list[int]],
    terminal_bits: list[int],
    within_ms: int,
):
    """Keyed state function for the full pattern machine.

    ``strict[i]``: step i must bind the immediately-next sealed event.
    ``neg_before[i]``: mask bit indices that kill a partial waiting for
    step i.  ``terminal_bits``: mask bits that discard a held match.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        packed, buffer, holds = _unpack_common(state, n_steps)
        prog = packed[0] if packed else 0
        bound = packed[1:] if packed else []
        sealed, buffer = _ingest_and_seal(state, pdfs, wm, buffer)
        out = _Out(key[0], holds)

        # Sealed events are consumed one at a time in (ts, event_id)
        # order, which IS the batch twin's per-key rn order: "positionally
        # after" needs no timestamp comparison (an event sealed in a later
        # invocation necessarily has ts > every previously-bound ts, and
        # within one invocation the sort settles ties) — so binds, strict
        # checks, and hold kills are all processing-order conditions,
        # matching rn-strictly-greater / rn == prev+1 / rn-in-gap exactly,
        # including equal-timestamp chains.
        for ts_v, _eid, mask in sealed:
            out.release_holds(ts_v - 1)  # windows closed before this event
            out.kill_holds(ts_v, mask, terminal_bits)
            if bound and ts_v > bound[0] + within_ms and prog < n_steps:
                out.emit("timeout", bound)
                prog, bound = 0, []
            if prog == 0:
                if mask & 1:
                    prog, bound = 1, [ts_v]
            elif prog < n_steps:
                if (mask >> prog) & 1:
                    # bind wins over negation: the batch twin's negation
                    # range is STRICTLY between bound positions, so an
                    # event that binds the awaited step is never a killer
                    bound.append(ts_v)
                    prog += 1
                elif any((mask >> b) & 1 for b in neg_before.get(prog, ())):
                    # negation event in the current gap: the partial dies
                    # silently (Flink discards it — no timeout row); the
                    # same event may re-anchor
                    prog, bound = (1, [ts_v]) if mask & 1 else (0, [])
                elif strict[prog]:
                    # strict step and the immediately-next sealed event
                    # did not bind it: the partial dies; the same event
                    # may re-anchor
                    prog, bound = (1, [ts_v]) if mask & 1 else (0, [])
            if prog == n_steps:
                if bound[-1] - bound[0] <= within_ms:
                    if terminal_bits:
                        out.holds.append(list(bound) + [bound[0] + within_ms])
                    else:
                        out.emit("match", bound)
                prog, bound = 0, []

        out.release_holds(wm)
        if prog > 0 and wm > bound[0] + within_ms:
            out.emit("timeout", bound)
            prog, bound = 0, []

        _finalize(
            state, wm,
            ([prog] + bound) if prog > 0 else [],
            buffer, out.holds,
            [bound[0] + within_ms + 1] if prog > 0 else [],
        )
        pdf_out = out.to_pdf()
        if pdf_out is not None:
            yield pdf_out

    return fn


def pattern_matcher_all_fn(
    n_steps: int,
    strict: list[bool],
    neg_before: dict[int, list[int]],
    terminal_bits: list[int],
    within_ms: int,
    max_active_anchors: int = 16,
):
    """Multi-anchor (Flink NO_SKIP) keyed state function: EVERY step-1
    event opens its own partial match and all partials advance
    independently over the sealed, event-time-ordered stream — so a
    failed earlier anchor can no longer hide a later overlapping one
    (the single-anchor machine's one documented divergence).  State is
    the partial list, flattened as [prog, t0..t_{prog-1}] groups, capped
    at ``max_active_anchors`` LIVE partials — anchors arriving while the
    key is at the cap are silently declined (state must stay bounded on
    hot keys; a resolved partial frees its slot).  This live-count cap
    is deliberately NOT the batch twin's first-N-ever
    ``max_anchors_per_key``; parity with ``emit='all'`` holds when the
    concurrent-live count stays under the cap (the goldens' regime).
    Plus the usual unsealed buffer and terminal-negation holds.  Every
    ACCEPTED anchor resolves as its own match/timeout row (or dies
    silently to a negation/strict break, as in Flink's discarded
    partials)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        packed, buffer, holds = _unpack_common(state, n_steps)
        partials: list[list[int]] = []  # each: [prog, t0..t_{prog-1}]
        i = 0
        while i < len(packed):
            prog = packed[i]
            partials.append(packed[i : i + 1 + prog])
            i += 1 + prog
        sealed, buffer = _ingest_and_seal(state, pdfs, wm, buffer)
        out = _Out(key[0], holds)

        for ts_v, _eid, mask in sealed:
            out.release_holds(ts_v - 1)
            out.kill_holds(ts_v, mask, terminal_bits)
            survivors: list[list[int]] = []
            for p in partials:
                prog, bound = p[0], p[1:]
                if ts_v > bound[0] + within_ms:
                    out.emit("timeout", bound)
                    continue
                if (mask >> prog) & 1:  # bind wins over negation
                    bound = bound + [ts_v]
                    prog += 1
                    if prog == n_steps:
                        if bound[-1] - bound[0] <= within_ms:
                            if terminal_bits:
                                out.holds.append(bound + [bound[0] + within_ms])
                            else:
                                out.emit("match", bound)
                        continue  # completed; NO_SKIP: others carry on
                    survivors.append([prog] + bound)
                elif any((mask >> b) & 1 for b in neg_before.get(prog, ())):
                    continue  # negation kill: silent, like Flink
                elif strict[prog]:
                    continue  # strict break: silent
                else:
                    survivors.append(p)
            partials = survivors
            # the SAME event may also open its own anchor (after it was
            # offered to every existing partial — batch parity: chains
            # bind strictly-later positions only)
            if mask & 1 and len(partials) < max_active_anchors:
                partials.append([1, ts_v])

        out.release_holds(wm)
        alive: list[list[int]] = []
        for p in partials:
            if wm > p[1] + within_ms:
                out.emit("timeout", p[1:])
            else:
                alive.append(p)
        partials = alive

        _finalize(
            state, wm,
            [x for p in partials for x in p],
            buffer, out.holds,
            [p[1] + within_ms + 1 for p in partials],
        )
        pdf_out = out.to_pdf()
        if pdf_out is not None:
            yield pdf_out

    return fn


def match_pattern_stream(
    events: DataFrame,
    pattern: list[dict],
    *,
    within: str = "15 minutes",
    key: str = "user_id",
    ts: str = "ts",
    watermark: str = "10 seconds",
    event_id: str | None = None,
    mode: str = "single",
    max_active_anchors: int = 16,
) -> DataFrame:
    """Streaming full-pattern matcher: the same ``pattern`` dicts as
    ``operators.cep.match_pattern`` over a watermarked stream.  Returns
    (key, status, anchor_ts, step_ts) where ``step_ts`` carries one
    bound event time per unrolled positive step; negation kills emit
    nothing and terminal negations defer the match to the watermark.

    ``mode="single"`` (default) runs one pending anchor at a time — the
    lean k-longs machine, with the documented overlapping-anchor
    divergence.  ``mode="all"`` runs the multi-anchor NO_SKIP machine:
    every step-1 event opens its own partial, matching Flink's NFA and
    the batch twin's ``emit="all"`` whenever the number of
    CONCURRENTLY-LIVE partials for a key stays under
    ``max_active_anchors``.  The cap bounds state on hot keys by
    silently declining NEW anchors while full (a resolved/dead partial
    frees its slot) — note this is a LIVE-count bound, not the batch
    twin's first-N-anchors-ever ``max_anchors_per_key``, so the two
    knobs are not interchangeable on keys that exceed either."""
    if within is None:
        raise ValueError(
            "match_pattern_stream requires `within`: the streaming machine "
            "needs a timeout horizon to bound state and resolve anchors "
            "(the batch twin allows within=None; a stream cannot)"
        )
    within_ms = parse_within_ms(within)  # shared with the batch matcher

    positives, negations = unroll_pattern(pattern)
    n_steps = len(positives)
    strict = [s for _, _, s in positives]
    neg_before: dict[int, list[int]] = {}
    terminal_bits: list[int] = []
    mask = F.lit(0).cast("long")
    for i, (_, pred, _s) in enumerate(positives):
        mask = mask + F.when(pred, F.lit(1 << i)).otherwise(0)
    for j, (pred, _li, ri) in enumerate(negations):
        bit = n_steps + j
        mask = mask + F.when(pred, F.lit(1 << bit)).otherwise(0)
        if ri is None:
            terminal_bits.append(bit)
        else:
            neg_before.setdefault(ri, []).append(bit)

    src = events
    if "row_time" not in src.columns:
        src = src.withColumn("row_time", F.timestamp_millis(F.col(ts).cast("long")))
    eid_col = (
        F.col(event_id).cast("long")
        if event_id is not None
        else F.xxhash64(F.col(key).cast("string"), F.col(ts).cast("long"), mask)
    )
    src = src.withWatermark("row_time", watermark).select(
        F.col(key).cast("string").alias("key"),
        F.col(ts).cast("long").alias("ts"),
        eid_col.alias("event_id"),
        mask.alias("step_mask"),
        "row_time",
    )
    if not any(strict):
        # relaxed-only: non-participating events can't affect the match
        src = src.filter(F.col("step_mask") != 0)
    if mode == "all":
        matcher = pattern_matcher_all_fn(
            n_steps, strict, neg_before, terminal_bits, within_ms,
            max_active_anchors=max_active_anchors,
        )
    elif mode == "single":
        matcher = pattern_matcher_fn(
            n_steps, strict, neg_before, terminal_bits, within_ms
        )
    else:
        raise ValueError(f"mode must be 'single' or 'all', got {mode!r}")
    return src.groupBy("key").applyInPandasWithState(
        matcher,
        outputStructType=_out_schema(),
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
