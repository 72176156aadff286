"""Windowed aggregation operators (SURVEY §2.5 A1-A8).

The reference's DWS layer is empty but names 8 tumbling-window summary
tables (Constant.java:40-47); all of them reduce to
``groupBy(window(event_time, size), *dims).agg(...)`` — built-in Structured
Streaming tumbling windows in stream mode, plain groupBy in batch.

Scale notes: windowed aggs shuffle once on (window, dims); partial
aggregation (map-side combine) happens automatically.  Distinct-user
counts use exact count_distinct in batch and first-seen keyed state in
streaming (operators/state.py); at 100 TB prefer approx_count_distinct
when the serving table tolerates ~2% error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def duration_seconds(s: str) -> int:
    """Parse a Spark-style duration string ('30 minutes', '1 day',
    compound '1 hour 30 minutes') to whole seconds — accepting the same
    shapes `F.window` accepts, so hop and cumulate stay consistent.
    Sub-second windows aren't part of this surface."""
    parts = s.strip().split()
    if not parts or len(parts) % 2:
        raise ValueError(
            f"duration {s!r}: expected '<n> <unit> [<n> <unit> ...]' "
            f"with units in {sorted(set(_UNIT_SECONDS))}"
        )
    total = 0
    for n, unit in zip(parts[::2], parts[1::2]):
        try:
            total += int(n) * _UNIT_SECONDS[unit.lower()]
        except (ValueError, KeyError):
            raise ValueError(
                f"duration {s!r}: bad component {n!r} {unit!r} "
                f"(units: {sorted(set(_UNIT_SECONDS))})"
            ) from None
    return total


def _finish(out: DataFrame, start_col: str, end_col: str) -> DataFrame:
    """Emit window bounds as formatted strings (`window_start`,
    `window_end`) so results hash identically across engines/timezones."""
    rest = [c for c in out.columns if c not in (start_col, end_col)]
    return out.select(
        F.date_format(start_col, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format(end_col, "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        *rest,
    )


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    dims: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Generic tumbling-window groupBy — the common shape of all 8 DWS
    tables (Constant.java:40-47)."""
    out = df.groupBy(F.window(ts_col, size).alias("__w"), *dims).agg(*aggs)
    return _finish(
        out.select(F.col("__w.start").alias("__ws"), F.col("__w.end").alias("__we"),
                   *[c for c in out.columns if c != "__w"]),
        "__ws", "__we",
    )


def windowed_agg_hop(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    dims: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Sliding (HOP) window aggregation — Flink SQL's ``HOP(..., slide,
    size)`` window TVF, the standard "last hour, refreshed every N
    minutes" serving shape the DWS tables upgrade to when dashboards need
    overlap.  Built-in in Spark: ``F.window(ts, size, slide)`` replicates
    each row into size/slide windows before the partial aggregation, so
    the shuffle still carries pre-combined partials — at 100 TB the cost
    is exactly (size/slide)x the tumbling agg, never a re-scan per slide.
    """
    out = df.groupBy(F.window(ts_col, size, slide).alias("__w"), *dims).agg(*aggs)
    return _finish(
        out.select(F.col("__w.start").alias("__ws"), F.col("__w.end").alias("__we"),
                   *[c for c in out.columns if c != "__w"]),
        "__ws", "__we",
    )


def windowed_agg_cumulate(
    df: DataFrame,
    ts_col: str,
    step: str,
    max_size: str,
    dims: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Cumulative (CUMULATE) window aggregation — Flink SQL's
    ``CUMULATE(..., step, max_size)`` TVF: expanding windows
    [base, base+step), [base, base+2*step), ... [base, base+max_size)
    that all share a day/period anchor — the "running total since
    midnight, emitted every step" DWS shape (e.g. GMV-today curves).

    Spark has no built-in cumulate window; the composition is an explode
    over the (max_size/step) window ends each row belongs to, then one
    grouped aggregation — same partial-agg/shuffle profile as HOP with
    factor max_size/step.  Rows land in every window whose end is
    strictly after the event time (Flink semantics: event belongs to all
    cumulating windows of its anchor period that have not yet closed).

    Streaming note: the exploded grouping keys here are derived columns,
    which drops Spark's event-time metadata, so this exact shape cannot
    run in append mode.  The streaming idiom for cumulate serving tables
    is: tumble at `step` granularity (watermark-finalized, append-safe),
    then roll the steps up cumulatively at read/serving time — an
    O(max/step)-row window per key on the SERVING table, not the fact
    stream.  Batch/backfill uses this function directly.
    """
    step_s, max_s = duration_seconds(step), duration_seconds(max_size)
    if max_s % step_s:
        raise ValueError(f"max_size {max_size!r} must be a multiple of step {step!r}")
    n = max_s // step_s
    exploded = (
        df.withColumn("__base", F.window(ts_col, max_size)["start"])
        .withColumn("__j", F.explode(F.sequence(F.lit(1), F.lit(n))))
        .withColumn("__end", F.expr(f"timestampadd(SECOND, __j * {step_s}, __base)"))
        .filter(F.col("__end") > F.col(ts_col))
    )
    out = exploded.groupBy("__base", "__end", *dims).agg(*aggs)
    return _finish(out, "__base", "__end")


def cumulate_rollup(
    steps: DataFrame,
    step: str,
    max_size: str,
    dims: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Serving-side half of the streaming CUMULATE idiom: given
    STEP-granularity tumbling aggregates (`windowed_agg(df, ts, step,
    ...)` output — append-safe, watermark-finalized in streams), produce
    the cumulative windows `windowed_agg_cumulate` would emit, without
    touching the fact stream.

    Shape: per (anchor period, dims), gap-fill the max/step step spine
    (explode of a constant-length sequence), then one running-sum window
    ordered by step end.  Input is the SERVING table (windows x dims
    rows), so the per-key window sort is over <= max/step rows — the
    O(steps) rollup the cumulate docstring promises.  Only additive
    aggregates roll up this way (sums/counts); distinct-style measures
    need the first-seen state path like every cumulative UV.

    Equality `cumulate_rollup(windowed_agg(step)) ==
    windowed_agg_cumulate(df)` modulo empty windows (a cumulative window
    whose prefix saw no events yet has no row in either) is tested.
    """
    step_s, max_s = duration_seconds(step), duration_seconds(max_size)
    if max_s % step_s:
        raise ValueError(f"max_size {max_size!r} must be a multiple of step {step!r}")
    n = max_s // step_s
    ws = F.to_timestamp("window_start", "yyyy-MM-dd HH:mm:ss")
    anchored = steps.withColumn("__anchor", F.window(ws, max_size)["start"]).withColumn(
        "__step_end", F.expr(f"timestampadd(SECOND, {step_s}, to_timestamp(window_start))")
    )
    # spine: every (anchor, dims) with at least one step gets all n ends
    spine = (
        anchored.select("__anchor", *dims)
        .distinct()
        .withColumn("__j", F.explode(F.sequence(F.lit(1), F.lit(n))))
        .withColumn("__end", F.expr(f"timestampadd(SECOND, __j * {step_s}, __anchor)"))
        .drop("__j")
    )
    # null-SAFE join on dims (NULL is a legitimate group key out of
    # windowed_agg); join-miss detection via an explicit presence marker,
    # not a measure column (a step whose first aggregate is NULL is still
    # a present step)
    right = anchored.withColumnRenamed("__step_end", "__end").withColumn(
        "__present", F.lit(1)
    )
    right = right.select(
        F.col("__anchor").alias("__r_anchor"),
        F.col("__end").alias("__r_end"),
        *[F.col(c).alias(f"__r_{c}") for c in dims],
        *[F.col(c).alias(f"__m_{c}") for c in sum_cols],
        "__present",
    )
    cond = (F.col("__anchor") == F.col("__r_anchor")) & (F.col("__end") == F.col("__r_end"))
    for c in dims:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__r_{c}"))
    filled = spine.join(right, cond, "left")
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("__anchor", *dims)
        .orderBy("__end")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    rolled = filled.select(
        "__anchor",
        "__end",
        *dims,
        # F.sum skips NULLs and yields NULL iff every input is NULL —
        # matching the direct cumulate for all-NULL measure prefixes
        *[F.sum(F.col(f"__m_{c}")).over(w).alias(c) for c in sum_cols],
        F.sum(F.coalesce(F.col("__present"), F.lit(0))).over(w).alias("__seen"),
    )
    # drop cumulative windows whose prefix has no data yet (they have no
    # twin in windowed_agg_cumulate either)
    return _finish(rolled.filter(F.col("__seen") > 0).drop("__seen"), "__anchor", "__end")
