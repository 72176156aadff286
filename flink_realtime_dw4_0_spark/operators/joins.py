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
