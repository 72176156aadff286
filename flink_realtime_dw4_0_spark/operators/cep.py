"""Complex-event-processing primitives: sequence pattern matching and
state-transition statistics over a keyed event stream.

Flink ships a dedicated CEP library (``Pattern.begin(...).followedBy(...)
.within(...)``) for exactly this: find, per key, an ordered chain of
events satisfying successive predicates inside a time bound.  The
reference pipeline's DWS layer serves the same questions ad hoc (e.g. the
view→click→purchase funnel).  Here the matcher is expressed Spark-first:
each pattern step is one equi-join on the key plus one map-combinable
``min`` aggregation — no per-key UDF loop, no window over the raw event
stream, no cartesian.  k pattern steps cost k keyed shuffles, each
shrinking the left side (only keys still alive carry forward).

Match semantics (documented precisely so the DuckDB oracle can replay
them bit-for-bit):

* relaxed contiguity ("followed by"): non-matching events between steps
  are skipped;
* each anchor (step-1 event time) chains greedily — every later step
  binds to the MINIMUM event time strictly greater than the previous
  step's bound time;
* a chain matches when its last bound time is within ``within`` of the
  anchor;
* per key, the earliest matching anchor wins (one row per key).

Greedy-per-anchor differs from Flink's NFA only in that the NFA can
back-track to a later step-i candidate when the greedy one dead-ends;
with monotone predicates (each step a pure event filter) a greedy chain
dead-ends only if NO chain from that anchor completes *at all* — but a
slower chain could still finish inside the window when the greedy one
overruns it.  Anchoring every step-1 event (not just the first) recovers
those matches, which is why anchors fan out per key; the
``max_anchors_per_key`` knob bounds that fan-out for hot keys the same
way ``max_bucket_size`` bounds LSH buckets.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_WITHIN_UNIT_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}
_WITHIN_TERM = re.compile(
    r"\s*(\d+)\s*(millisecond|second|minute|hour|day)s?", re.IGNORECASE
)


def parse_within_ms(within: str) -> int:
    """THE parser for the CEP ``within`` horizon — the batch matchers and
    both streaming machines all route through this one function, so the
    two engines can never interpret the same string differently (a
    compound interval like ``'7 days 6 hours'`` previously truncated to
    7 days in the stream while Spark's INTERVAL parser honored it in
    batch).  Anchored: any unrecognized remainder raises instead of
    silently truncating, and nothing user-supplied ever reaches
    ``F.expr`` raw."""
    if not isinstance(within, str):
        raise ValueError(
            f"within must be a string like '15 minutes', got {within!r}"
        )
    pos, total = 0, 0
    while pos < len(within):
        m = _WITHIN_TERM.match(within, pos)
        if m is None:
            if within[pos:].strip() == "":
                break
            raise ValueError(
                f"within: unrecognized interval text {within[pos:]!r} in "
                f"{within!r} (expected 'N second|minute|hour|day"
                " [N unit ...]')"
            )
        total += int(m.group(1)) * _WITHIN_UNIT_MS[m.group(2).lower()]
        pos = m.end()
    if total <= 0:
        raise ValueError(f"within must be a positive interval, got {within!r}")
    return total


def within_interval(within: str) -> Column:
    """Validated day-time interval Column for the batch matchers: built
    from the SAME millisecond normalization the streaming machines use
    (batch/stream parity by construction) and injection-proof — the raw
    string is parsed here, never interpolated into SQL."""
    return F.expr(f"INTERVAL {parse_within_ms(within)} MILLISECOND")


def match_sequence(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    *,
    within: str | None = None,
    key: str = "user_id",
    ts: str = "ts",
    max_anchors_per_key: int | None = None,
) -> DataFrame:
    """Earliest CEP match per key for an ordered predicate sequence.

    ``steps`` is ``[(name, predicate), ...]`` (>= 2 entries); the result
    has one row per key with a complete match and columns
    ``key, <name>_ts ...`` (one bound event time per step).

    Equal-timestamp events collapse per step (anchors are DISTINCT
    timestamps; later steps bind a min), and chaining compares strictly
    on the timestamp, so the output is a pure function of the (key, ts)
    value sets — deterministic under any partitioning.
    """
    if len(steps) < 2:
        raise ValueError("a pattern needs at least two steps")
    name0, pred0 = steps[0]
    anchor_col = f"{name0}_ts"
    anchors = (
        events.filter(pred0)
        .select(F.col(key).alias(key), F.col(ts).alias(anchor_col))
        .distinct()
    )
    if max_anchors_per_key is not None:
        w = Window.partitionBy(key).orderBy(anchor_col)
        anchors = (
            anchors.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_anchors_per_key)
            .drop("__rn")
        )
    chain = anchors
    bound_cols = [anchor_col]
    for name_i, pred_i in steps[1:]:
        ts_i = f"{name_i}_ts"
        cand = events.filter(pred_i).select(
            F.col(key).alias(key), F.col(ts).alias(ts_i)
        )
        chain = (
            chain.join(cand, key)
            .filter(F.col(ts_i) > F.col(bound_cols[-1]))
            .groupBy(key, *bound_cols)
            .agg(F.min(ts_i).alias(ts_i))
        )
        bound_cols.append(ts_i)
    if within is not None:
        chain = chain.filter(
            F.col(bound_cols[-1]) <= F.col(anchor_col) + within_interval(within)
        )
    w_first = Window.partitionBy(key).orderBy(anchor_col)
    return (
        chain.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def unroll_pattern(pattern: list[dict]):
    """Normalize + validate a pattern (shared by the batch matcher and
    ``streaming/cep_pattern.py`` so the two can never drift): returns
    (positives [(colname, pred, strict)], negations
    [(pred, left_idx, right_idx_or_None_for_terminal)]).  Raises on
    every invalid shape both engines must reject identically."""
    if not pattern or pattern[0].get("negated"):
        raise ValueError("pattern must start with a positive anchor step")
    if pattern[0].get("contiguity", "relaxed") == "strict":
        raise ValueError("the anchor step cannot be strict (nothing precedes it)")
    names = [p["name"] for p in pattern]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate step names: {names}")
    positives: list[tuple[str, object, bool]] = []
    negations: list[tuple[object, int, int | None]] = []
    for p in pattern:
        times = int(p.get("times", 1))
        strict = p.get("contiguity", "relaxed") == "strict"
        if p.get("negated"):
            if times != 1 or strict:
                raise ValueError("negated steps take no times/contiguity")
            negations.append(
                (p["where"], len(positives) - 1,
                 len(positives) if p is not pattern[-1] else None)
            )
            continue
        if times < 1:
            raise ValueError(f"times must be >= 1, got {times}")
        for j in range(times):
            cname = p["name"] if times == 1 else f"{p['name']}_{j + 1}"
            positives.append((cname, p["where"], strict))
    if len(positives) < 2:
        raise ValueError("a pattern needs at least two positive step binds")
    for _pred, _li, ri in negations:
        if ri is not None and ri >= len(positives):
            raise ValueError(
                "a non-terminal negation must be followed by a positive "
                "step (only the LAST pattern step may be a dangling "
                "notFollowedBy, and it requires `within`)"
            )
    return positives, negations


def match_pattern(
    events: DataFrame,
    pattern: list[dict],
    *,
    within: str | None = None,
    key: str = "user_id",
    ts: str = "ts",
    seq: str = "event_id",
    max_anchors_per_key: int | None = None,
    emit: str = "first",
) -> DataFrame:
    """The rest of the Flink CEP pattern surface, declaratively: strict
    contiguity (``next``), fixed quantifiers (``times(n)``), and negation
    (``notFollowedBy``) on top of ``match_sequence``'s relaxed chains.

    ``emit="first"`` (default) keeps one row per key — the earliest
    surviving anchor, like ``match_sequence``.  ``emit="all"`` keeps
    EVERY surviving anchor's chain (one row per completed anchor) —
    Flink's NO_SKIP after-match strategy, where overlapping matches all
    emit; this is the batch twin of the streaming matcher's
    multi-anchor mode.

    ``pattern`` is a list of step dicts::

        {"name": "click", "where": <Column>,          # required
         "times": 2,                                  # times(n), default 1
         "contiguity": "strict",                      # 'next'; default relaxed
         "negated": True}                             # notFollowedBy

    Semantics (documented precisely so the DuckDB oracle replays them):

    * every event gets a per-key sequence number ``rn`` ordered by
      (ts, seq) — strictness and betweenness are defined on ``rn``, so
      equal timestamps are deterministic;
    * the first step anchors (must be positive/relaxed); each later
      positive step binds the MINIMUM ``rn`` greater than the previous
      bound (strict: exactly previous+1, else the anchor dies) — the
      same greedy-per-anchor chaining as ``match_sequence``;
    * ``times(n)`` unrolls to n copies (``name_1..name_n`` columns),
      inheriting the step's contiguity;
    * a negated step between two positive steps kills chains with ANY
      matching event strictly between their bound ``rn``s; a TERMINAL
      negated step (Flink requires ``within`` for this, and so do we)
      kills chains with a match after the last bound event up to
      ``anchor + within``;
    * ``within`` bounds last-bound-ts − anchor-ts; earliest surviving
      anchor per key wins (one row per key).

    Scale shape: one window pass for ``rn`` (one keyed shuffle), then
    per positive step one keyed equi-join + min/min_by aggregation
    (shrinking left side), per negation one left-anti range join on the
    key.  Nothing fans out beyond the anchors; ``max_anchors_per_key``
    bounds hot keys exactly as in ``match_sequence``.
    """
    if pattern and pattern[-1].get("negated") and within is None:
        raise ValueError("a terminal notFollowedBy requires `within` "
                         "(Flink has the same restriction)")
    if emit not in ("first", "all"):
        raise ValueError(f"emit must be 'first' or 'all', got {emit!r}")
    positives, negations = unroll_pattern(pattern)

    w_rn = Window.partitionBy(key).orderBy(ts, seq)
    base = events.withColumn("__rn", F.row_number().over(w_rn)).withColumn(
        "__ts", F.col(ts)
    )

    n0, pred0, _ = positives[0]
    anchors = base.filter(pred0).select(
        F.col(key), F.col("__ts").alias(f"{n0}_ts"), F.col("__rn").alias(f"{n0}_rn")
    )
    if max_anchors_per_key is not None:
        w_cap = Window.partitionBy(key).orderBy(f"{n0}_rn")
        anchors = (
            anchors.withColumn("__cap", F.row_number().over(w_cap))
            .filter(F.col("__cap") <= max_anchors_per_key)
            .drop("__cap")
        )
    chain = anchors
    bound = [(f"{n0}_ts", f"{n0}_rn")]
    for cname, pred, strict in positives[1:]:
        cand = base.filter(pred).select(
            F.col(key), F.col("__ts").alias("__c_ts"), F.col("__rn").alias("__c_rn")
        )
        prev_rn = F.col(bound[-1][1])
        cond = (F.col("__c_rn") == prev_rn + 1) if strict else (F.col("__c_rn") > prev_rn)
        flat = [c for pair in bound for c in pair]
        chain = (
            chain.join(cand, key)
            .filter(cond)
            .groupBy(key, *flat)
            .agg(
                F.min_by("__c_ts", "__c_rn").alias(f"{cname}_ts"),
                F.min("__c_rn").alias(f"{cname}_rn"),
            )
        )
        bound.append((f"{cname}_ts", f"{cname}_rn"))
    anchor_ts, last_ts = bound[0][0], bound[-1][0]
    if within is not None:
        chain = chain.filter(
            F.col(last_ts) <= F.col(anchor_ts) + within_interval(within)
        )
    for pred, li, ri in negations:
        neg = base.filter(pred).select(F.col(key), F.col("__rn").alias("__n_rn"),
                                       F.col("__ts").alias("__n_ts"))
        left_rn = F.col(bound[li][1])
        if ri is not None:
            cond = (F.col("__n_rn") > left_rn) & (F.col("__n_rn") < F.col(bound[ri][1]))
        else:  # terminal notFollowedBy: up to anchor + within
            cond = (F.col("__n_rn") > left_rn) & (
                F.col("__n_ts") <= F.col(anchor_ts) + within_interval(within)
            )
        chain = chain.join(neg, on=(chain[key] == neg[key]) & cond, how="left_anti")
    if emit == "all":
        return chain.select(key, *[t for t, _ in bound])
    w_first = Window.partitionBy(key).orderBy(bound[0][1])
    return (
        chain.withColumn("__pick", F.row_number().over(w_first))
        .filter(F.col("__pick") == 1)
        .select(key, *[t for t, _ in bound])
    )


def transition_matrix(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    seq: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive per-key states.

    One window pass (lag over ``(ts, seq)`` — the seq tiebreak makes the
    ordering, hence the output, deterministic for equal timestamps) and
    one grouped count; the per-source normalization is a tiny window over
    the |states|² result, not the event stream.  Scale shape: the only
    event-sized exchange is the hash partition by key feeding the lag.
    """
    w = Window.partitionBy(key).orderBy(ts, seq)
    pairs = (
        events.select(key, ts, seq, F.col(state).alias("next_state"))
        .withColumn("prev_state", F.lag("next_state").over(w))
        .filter(F.col("prev_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_src = Window.partitionBy("prev_state")
    return counts.withColumn(
        "p_transition",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_src),
            6,
        ),
    )
