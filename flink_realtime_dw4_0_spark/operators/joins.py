"""Join operators (SURVEY §2.4 J1-J6).

Batch and streaming share these builders: the same DataFrame expressions
run over bounded reads (tests/oracle) and over readStream inputs (the DWD
pipelines add watermarks before calling in).

Scale notes (100 TB):
  * Lookup joins broadcast the dim side explicitly — no shuffle of the
    100 TB fact side (reference does point-lookups into HBase per record,
    BaseSQLAPP.java:65-75; broadcast-hash is the Spark-native equivalent).
  * Big-big equi-joins shuffle on the join key; AQE splits skewed keys.
    For repeated joins on the same key, pre-bucket both sides.
  * Interval joins keep the equi-key as the shuffle key; the time-range
    predicate rides along as a post-join filter (and bounds state in
    streaming via watermarks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """J1/J2 — stream-stream style equi-join (DwdTradeOrderDetail.java:113-119).

    In batch this is a plain shuffle join; in streaming callers add
    ``withWatermark`` on both sides so state is evicted (the reference
    bounds the same state with idle-state TTL, DwdTradeOrderDetail.java:32).
    """
    return left.join(right, on=on, how=how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    time_cols: tuple[str, str],
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """J3 — event-time interval join (DwdTradeOrderPaySucDetail.java:119-144):
    ``l.key = r.key AND l.time BETWEEN r.time - lower AND r.time + upper``.

    lower/upper are INTERVAL strings, e.g. "INTERVAL 15 MINUTES".
    """
    lk, rk = key
    lt, rt = time_cols
    cond = (
        (left[lk] == right[rk])
        & (left[lt] >= right[rt] - F.expr(lower))
        & (left[lt] <= right[rt] + F.expr(upper))
    )
    return left.join(right, cond, how)


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    select: list[Column] | None = None,
) -> DataFrame:
    """J4/J5 — processing-time temporal lookup join
    (``FOR SYSTEM_TIME AS OF proc_time``, DwdInteractionCommentInfo.java:64-80).

    Spark-native: broadcast the dim side; in streaming the static side is
    re-resolved per micro-batch, giving "current version" semantics without
    per-record point lookups.
    """
    out = fact.join(F.broadcast(dim), on=on, how=how)
    return out.select(*select) if select else out


def config_dispatch_join(stream: DataFrame, config: DataFrame, key: tuple[str, str]) -> DataFrame:
    """J6 — broadcast-state config join (DimAPP.java:67-73,
    DimBroadcastFunction.java:26-97): each record is paired with its config
    row by table name; non-configured tables drop out (inner join).

    The reference needs a JDBC-preload race fix (DimBroadcastFunction.java:40-50);
    re-reading the config per micro-batch makes the race impossible by
    construction.
    """
    sk, ck = key
    return stream.join(F.broadcast(config), stream[sk] == config[ck], "inner")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the skewed (left) side is salted into `salt`
    sub-keys by hashing its remaining columns; the small/right side is
    replicated across all salt values.  One hot key then lands on `salt`
    reducers instead of one.

    AQE's skew-join split handles most cases automatically; explicit
    salting remains the tool for extreme single-key skew (one key >> one
    partition even after splitting) and for deterministic layouts.
    Result is identical to the unsalted join (verified in tests).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # right/full-outer would emit one row per salt copy for unmatched
        # replicated-side keys
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    other_cols = [c for c in left.columns if c != key]
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in other_cols] or [F.col(key)]), F.lit(salt))
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_l.join(salted_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 16,
) -> None:
    """Persist a table bucketed (and sorted) by its join key — repeated
    big-big joins on that key then skip the shuffle entirely (co-located
    sort-merge join).  At 100 TB this is the difference between re-shuffling
    the fact table per query and reading pre-clustered buckets."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale location (e.g. from another session's catalog) blocks CREATE
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), table
    )
    if os.path.exists(loc):
        shutil.rmtree(loc)
    (
        df.write.bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """As-of (temporal) join: enrich each left row with the LATEST right
    row for the same key whose ``right_ts <= left_ts`` — the attribution /
    point-in-time-lookup primitive (beyond the reference's surface; its
    closest relative is the interval join, DwdTradeOrderPaySucDetail.java:141).

    Executed as union + ONE windowed carry-forward pass: tag both sides,
    union, sort each key group by (time, side), and carry the last
    non-null right payload forward.  A single shuffle+sort on the key —
    the 100 TB plan: the naive equi-join + time filter materializes every
    co-keyed (left, right) pair before filtering, quadratic in per-key
    density, while this is linear.

    Contract: right's non-key columns must not collide with left's
    (pre-rename); right's time column is emitted as ``{right_ts}_asof``.
    Ties on right_ts resolve to the greatest payload struct —
    deterministic run-to-run.  ``how='left'`` keeps unmatched left rows.
    """
    from pyspark.sql.window import Window

    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    key = [on] if isinstance(on, str) else list(on)
    lpay_cols = [c for c in left.columns if c not in key]
    rpay_cols = [c for c in right.columns if c not in key]
    lstruct = F.struct(*[F.col(c) for c in lpay_cols])
    rstruct = F.struct(*[F.col(c) for c in rpay_cols])
    ltype = left.select(lstruct.alias("s")).schema["s"].dataType.simpleString()
    rtype = right.select(rstruct.alias("s")).schema["s"].dataType.simpleString()
    l2 = left.select(
        *key,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        lstruct.alias("__lpay"),
        F.lit(None).cast(rtype).alias("__rpay"),
    )
    r2 = right.select(
        *key,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(ltype).alias("__lpay"),
        rstruct.alias("__rpay"),
    )
    w = (
        Window.partitionBy(*key)
        .orderBy("__t", "__side", "__rpay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2).withColumn("__c", F.last("__rpay", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__c").isNotNull())
    return out.select(
        *key,
        *[F.col(f"__lpay.{c}").alias(c) for c in lpay_cols],
        *[
            F.col(f"__c.{c}").alias(c if c != right_ts else f"{right_ts}_asof")
            for c in rpay_cols
        ],
    )


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    lo: str,
    hi: str,
    band_seconds: int | None = None,
) -> DataFrame:
    """Big-big interval join WITHOUT an equi-key: all (l, r) with
    r.ts ∈ [l.ts + lo, l.ts + hi].

    A bare range predicate plans as a nested-loop/cartesian — the
    O(n·m) trap.  Banding makes it an equi-join: time is cut into
    ``band_seconds``-wide buckets (default = the window width), each
    left row explodes to the ≤2 (window ≤ band ⇒ at most ⌈w/band⌉+1)
    buckets its window can touch, the right side buckets once, the join
    runs on the bucket id, and the exact range predicate post-filters.
    Fan-out is bounded by the bucket count per window — this is the
    standard range-bucketing rewrite (cf. Spark's own
    spark.sql.rangeJoin discussions / Databricks range-join hints),
    expressed with plain operators so it works anywhere.

    ``lo``/``hi`` are INTERVAL strings (e.g. '0 seconds', '5 minutes');
    column names must be disjoint or pre-aliased by the caller.
    """
    # Interval width must be computed timezone-independently: a bare
    # TIMESTAMP '1970-01-01' literal parses in the SESSION timezone, so
    # unix_micros() of it alone is offset by the UTC offset in non-UTC
    # sessions (e.g. the documented Asia/Shanghai pipeline mode).
    # Day-time interval addition is instant-based, so subtracting the
    # same literal's unix_micros cancels the zone offset exactly and
    # leaves the pure interval width in microseconds.
    epoch_us = "unix_micros(TIMESTAMP '1970-01-01')"
    lo_us = F.expr(
        f"unix_micros(TIMESTAMP '1970-01-01' + INTERVAL {lo}) - {epoch_us}"
    )
    hi_us = F.expr(
        f"unix_micros(TIMESTAMP '1970-01-01' + INTERVAL {hi}) - {epoch_us}"
    )
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    if band_seconds is None:
        band = (hi_us - lo_us).cast("long") + F.lit(1)
    else:
        band = F.lit(int(band_seconds) * 1_000_000).cast("long")
    lb = left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor((l_us + lo_us) / band), F.floor((l_us + hi_us) / band)
            )
        ),
    )
    rb = right.withColumn("__bkt", F.floor(r_us / band))
    out = lb.join(rb, "__bkt").filter(
        (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lo}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {hi}"))
    )
    return out.drop("__bkt")
