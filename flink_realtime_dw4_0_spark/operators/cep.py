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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
            F.col(bound_cols[-1]) <= F.col(anchor_col) + F.expr(f"INTERVAL {within}")
        )
    w_first = Window.partitionBy(key).orderBy(anchor_col)
    return (
        chain.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
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
