"""Keyed-state streaming operators (SURVEY §2.6 T1 + first-seen dedup).

Parity: the new-visitor fix KeyedProcessFunction (DwdBaseLog.java:135-183)
and the per-day first-seen dedup that backs the DWS UU tables (A3/A4/A6).

Spark-native: ``applyInPandasWithState`` keyed by device id — Arrow-batched
per group, state in the RocksDB store (scales past heap, unlike the
reference's HashMap backend, BaseAPP.java:42).  Records are applied in
event-time order within each batch, reproducing the reference's per-record
sequencing.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

_VISITOR_OUT = StructType(
    [
        StructField("mid", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("is_new", StringType()),
        StructField("first_login_dt", StringType()),
    ]
)
_VISITOR_STATE = StructType([StructField("first_login_dt", StringType())])


def _dt_of_ms(ms: int) -> str:
    return datetime.utcfromtimestamp(ms / 1000).strftime("%Y-%m-%d")


def visitor_fix_fn(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """The exact decision table of DwdBaseLog.java:147-181:

    is_new='1':  state empty        → remember today (stays 1)
                 state = today      → stays 1 (same-day repeat)
                 state ≠ today      → rewrite to '0' (returning visitor)
    is_new='0':  state empty        → backfill yesterday (:171)
                 state set          → unchanged
    other:       dirty marker — passed through, state untouched (:176-178)
    """
    first_dt = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        fixed = []
        firsts = []
        for _, r in pdf.iterrows():
            cur_dt = _dt_of_ms(int(r["ts"]))
            is_new = r["is_new"]
            if is_new == "1":
                if first_dt is None:
                    first_dt = cur_dt
                elif first_dt != cur_dt:
                    is_new = "0"
            elif is_new == "0":
                if first_dt is None:
                    first_dt = (
                        datetime.strptime(cur_dt, "%Y-%m-%d") - timedelta(days=1)
                    ).strftime("%Y-%m-%d")
            fixed.append(is_new)
            firsts.append(first_dt)
        out.append(
            pd.DataFrame(
                {
                    "mid": pdf["mid"],
                    "event_id": pdf["event_id"],
                    "ts": pdf["ts"],
                    "is_new": fixed,
                    "first_login_dt": firsts,
                }
            )
        )
    state.update((first_dt,))
    yield from out


def visitor_fix(df: DataFrame) -> DataFrame:
    """T1 — apply the new-visitor fix to a stream with columns
    (mid, event_id, ts, is_new).  Keyed shuffle on mid, per-key ValueState —
    the same topology as keyBy + KeyedProcessFunction (DwdBaseLog.java:202-206).
    """
    return df.groupBy("mid").applyInPandasWithState(
        visitor_fix_fn,
        outputStructType=_VISITOR_OUT,
        stateStructType=_VISITOR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_FIRST_SEEN_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("dt", StringType()),
        StructField("ts", LongType()),
        StructField("is_first", IntegerType()),
    ]
)
_FIRST_SEEN_STATE = StructType([StructField("seen", IntegerType())])


FIRST_SEEN_TTL_HOURS = 36


def first_seen_fn(
    key: tuple[str, str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-(key, day) first-seen marker — the UU dedup primitive behind
    A3/A4/A6 (SURVEY §2.5): emits is_first=1 exactly once per (key, day).

    State is keyed by (key, day) rather than tracking only the latest day,
    so an earlier day's first event arriving out of order (late data inside
    the watermark) is still flagged.

    State TTL (the 100 TB concern): each (key, day) entry expires
    FIRST_SEEN_TTL_HOURS of processing time after its last event — without
    it the store grows by |keys| entries EVERY day, forever.  An event
    arriving after its day's state expired would be re-flagged, but such
    an event is far beyond any sane watermark and is dropped by the
    windowed aggregations downstream (SURVEY §2.6: late data dropped)."""
    if state.hasTimedOut:
        state.remove()
        return
    seen = state.exists
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        flags = []
        for _ in range(len(pdf)):
            flags.append(0 if seen else 1)
            seen = True
        yield pd.DataFrame(
            {
                "key": pdf["key"],
                "dt": pdf["dt"],
                "ts": pdf["ts"],
                "is_first": flags,
            }
        )
    state.update((1,))
    state.setTimeoutDuration(FIRST_SEEN_TTL_HOURS * 3600 * 1000)


def first_seen(df: DataFrame) -> DataFrame:
    """Dedup-state op over a stream with columns (key, ts)."""
    with_dt = df.withColumn(
        "dt", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    return with_dt.groupBy("key", "dt").applyInPandasWithState(
        first_seen_fn,
        outputStructType=_FIRST_SEEN_OUT,
        stateStructType=_FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def visitor_fix_batch(batch: DataFrame, state, spark) -> DataFrame:
    """T1 as a per-micro-batch set operation against a persistent state
    table (sinks/upsert.KeyedTable keyed by mid) — used inside
    ``foreachBatch`` when the full (nested) record must flow through.

    The sequential decision table collapses to a closed form per batch:
    the key's effective first_login_dt is the stored state, else derived
    from its earliest VALID record in the batch (is_new=1 → that day;
    is_new=0 → the day before, the backfill at DwdBaseLog.java:171; other
    markers are dirty data and never touch state, :176-178); then is_new=1
    records on a later day than effective are rewritten to 0.
    Set-based ⇒ one shuffle per batch, no per-record Python.
    """
    from pyspark.sql import functions as F

    b = batch.withColumn("dt", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd"))
    firsts = b.filter(F.col("is_new").isin("1", "0")).groupBy("mid").agg(
        F.min_by(F.struct("dt", "is_new"), F.struct("ts")).alias("fr")
    )
    candidate = F.when(
        F.col("fr.is_new") == "1", F.col("fr.dt")
    ).otherwise(F.date_format(F.date_sub(F.to_date("fr.dt"), 1), "yyyy-MM-dd"))
    firsts = firsts.select("mid", candidate.alias("candidate_dt"))
    stored = state.read(spark)
    if stored is None:
        eff = firsts.select("mid", F.col("candidate_dt").alias("first_login_dt"))
    else:
        eff = (
            firsts.join(stored.withColumnRenamed("first_login_dt", "stored_dt"), "mid", "left")
            .select(
                "mid", F.coalesce("stored_dt", "candidate_dt").alias("first_login_dt")
            )
        )
    # pin eff before the state MERGE rewrites the parquet it lazily reads
    eff = eff.cache()
    eff.count()
    fixed = (
        b.join(eff, "mid", "left")
        .withColumn(
            "is_new",
            F.when(
                (F.col("is_new") == "1") & (F.col("dt") != F.col("first_login_dt")), "0"
            ).otherwise(F.col("is_new")),
        )
        .drop("dt")
    )
    state.merge(spark, eff)
    # materialize fixed, then release eff — otherwise one cached plan
    # accumulates per micro-batch for the lifetime of the stream
    fixed = fixed.persist()
    fixed.count()
    eff.unpersist()
    return fixed
