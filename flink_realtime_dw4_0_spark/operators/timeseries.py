"""Time-series operators: exponential smoothing and touch attribution.

The serving-layer metric calculus a realtime DW exposes next to its
windowed aggregates: smoothed per-key levels (alerting baselines) and
marketing attribution over the event stream.

Scale shapes:
  * ``ewma_level`` folds each key's series with a JVM higher-order
    ``aggregate`` over a sorted collected array — one shuffle, no Python,
    per-key memory bounded by that key's series length (the same
    contract as every keyed-state operator here).  For single keys with
    unbounded series, the affine-scan decomposition applies (EWMA is a
    linear recurrence: each chunk reduces to s_out = A·s_in + B, chunks
    prefix-combine associatively) — not needed at this data's key
    cardinality, documented as the upgrade path.
  * ``last_touch_attribution`` is one keyed window pass (max / max_by
    over preceding rows) — no self-join, no per-anchor fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ewma_level(
    df: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    seq: str = "event_id",
    alpha: float = 0.2,
) -> DataFrame:
    """Final exponentially-weighted level per key:
    s₁ = x₁, sₜ = (1−α)·sₜ₋₁ + α·xₜ over the (ts, seq)-ordered series.

    The fold is `aggregate(rest, first, (acc, x) -> (1−α)·acc + α·x)` —
    the identical left-to-right double arithmetic DuckDB's list_reduce
    performs, so results are bit-reproducible across engines (rounded
    for display only)."""
    arr = F.transform(
        F.sort_array(F.collect_list(F.struct(ts, seq, value))),
        lambda s: s[value].cast("double"),
    )
    g = df.groupBy(key).agg(arr.alias("__xs"))
    folded = F.aggregate(
        F.slice("__xs", 2, F.size("__xs") - 1),
        F.element_at("__xs", 1),
        lambda acc, x: (1 - alpha) * acc + alpha * x,
    )
    return g.select(
        key,
        F.size("__xs").cast("long").alias("n_points"),
        F.round(folded, 6).alias("ewma"),
    )


def last_touch_attribution(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    conversion: str = "purchase",
    touches: tuple[str, ...] = ("view", "click"),
    within: str = "7 DAY",
    seq: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: every conversion event joined to the most
    recent PRIOR touch event of the same key within ``within``.

    One window pass per key ordered by event time: the running
    (max ts, max_by type) over preceding touch rows rides the same sort
    the conversion filter uses — no self-join.  Conversions with no
    in-window touch attribute to 'none'.  ``seq`` tiebreaks equal
    timestamps (frame membership AND the max_by winner), making the
    output a pure function of the data under any partitioning — the
    same determinism contract as transition_matrix / late_flags_batch."""
    w = (
        Window.partitionBy(key)
        .orderBy(ts, seq)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(*touches)
    touch_ts = F.max(F.when(is_touch, F.col(ts))).over(w)
    touch_type = F.max_by(
        F.when(is_touch, F.col(type_col)),
        F.when(is_touch, F.struct(ts, seq)),
    ).over(w)
    flagged = events.withColumn("__t_ts", touch_ts).withColumn(
        "__t_type", touch_type
    )
    in_window = F.col("__t_ts") >= F.col(ts) - F.expr(f"INTERVAL {within}")
    return (
        flagged.filter(F.col(type_col) == conversion)
        .select(
            key,
            F.col(ts).alias("conversion_ts"),
            F.when(in_window, F.col("__t_type"))
            .otherwise(F.lit("none"))
            .alias("touch_type"),
            F.when(in_window, F.col("__t_ts")).alias("touch_ts"),
        )
    )


def linear_attribution(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    conversion: str = "purchase",
    touches: tuple[str, ...] = ("view", "click"),
    within: str = "7 DAY",
    seq: str = "event_id",
) -> DataFrame:
    """Linear multi-touch attribution: every touch in the ``within``
    window before a conversion shares credit equally (weight 1/k).

    Shape: conversions equi-join touches on the key with a range
    predicate (the interval-join family — Catalyst keeps it a hash join
    on the key with a post-filter, no cartesian); the per-conversion
    touch count is a window over the joined result, not the raw
    stream.  The window partitions on the conversion's ``seq`` so two
    conversions sharing (key, ts) each keep full credit (weights per
    conversion always sum to 1) instead of splitting each other's."""
    conv = events.filter(F.col(type_col) == conversion).select(
        F.col(key), F.col(ts).alias("conversion_ts"), F.col(seq).alias("__cid")
    )
    tch = events.filter(F.col(type_col).isin(*touches)).select(
        F.col(key), F.col(ts).alias("touch_ts"), F.col(type_col).alias("touch_type")
    )
    joined = conv.join(tch, key).filter(
        (F.col("touch_ts") < F.col("conversion_ts"))
        & (F.col("touch_ts") >= F.col("conversion_ts") - F.expr(f"INTERVAL {within}"))
    )
    w = Window.partitionBy(key, "__cid")
    return joined.select(
        key,
        "conversion_ts",
        "touch_ts",
        "touch_type",
        F.round(1.0 / F.count(F.lit(1)).over(w), 6).alias("weight"),
    )


def ab_ztest(
    df: DataFrame,
    variant_col: str,
    converted_col,
    control_value,
    treatment_value,
) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: conversion rates per
    variant, pooled standard error, and the z statistic — the gate an
    experimentation pipeline runs before shipping a variant.  The
    z-score is pure closed-form double arithmetic (no erf), so it is
    engine-exact; translate to a p-value with any normal table
    downstream (|z| > 1.96 ≈ p < .05 two-sided).

    One map-combinable aggregation over the exposure log; nothing but
    the 2-row summary leaves the cluster."""
    conv = F.col(converted_col).cast("int") if isinstance(converted_col, str) else converted_col.cast("int")
    agg = (
        df.filter(F.col(variant_col).isin(control_value, treatment_value))
        .groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(conv).cast("long").alias("conversions"),
        )
    )
    c = agg.filter(F.col("variant") == control_value).select(
        F.col("n").alias("n_c"), F.col("conversions").alias("x_c")
    )
    t = agg.filter(F.col("variant") == treatment_value).select(
        F.col("n").alias("n_t"), F.col("conversions").alias("x_t")
    )
    j = c.crossJoin(F.broadcast(t))
    p_c = F.col("x_c") / F.col("n_c")
    p_t = F.col("x_t") / F.col("n_t")
    p_pool = (F.col("x_c") + F.col("x_t")) / (F.col("n_c") + F.col("n_t"))
    se = F.sqrt(
        p_pool * (1 - p_pool) * (1.0 / F.col("n_c") + 1.0 / F.col("n_t"))
    )
    return j.select(
        "n_c", "x_c", "n_t", "x_t",
        F.round(p_c, 6).alias("rate_control"),
        F.round(p_t, 6).alias("rate_treatment"),
        F.round(p_t - p_c, 6).alias("lift_abs"),
        F.round((p_t - p_c) / se, 4).alias("z_score"),
        (F.abs((p_t - p_c) / se) > 1.959963985).cast("int").alias("significant_95"),
    )
