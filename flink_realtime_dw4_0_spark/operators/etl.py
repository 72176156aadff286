"""ETL validity filters + dynamic column pruning (SURVEY §2.3 P8-P10).

Parity: the log ETL (DwdBaseLog.java:212-233), the CDC ETL
(DimAPP.java:190-213), and the config-driven keep-list pruning
(DimAPP.java:82-95) — all as declarative filters/expressions so Catalyst
pushes them into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def etl_log_valid(df: DataFrame) -> DataFrame:
    """P8 — keep records that parsed (corrupt → null struct from
    ``from_json``) AND have (page or start) AND common.mid AND ts
    (DwdBaseLog.java:212-233)."""
    return df.filter(
        (F.col("page").isNotNull() | F.col("start").isNotNull())
        & F.col("common.mid").isNotNull()
        & F.col("ts").isNotNull()
    )


def etl_cdc_valid(df: DataFrame, database: str = "gmall") -> DataFrame:
    """P9 — keep `database='gmall'`, drop bootstrap-start/complete, require
    non-empty data payload (DimAPP.java:190-213)."""
    return df.filter(
        (F.col("database") == database)
        & ~F.col("type").isin("bootstrap-start", "bootstrap-complete")
        & F.col("data").isNotNull()
        & (F.size(F.col("data")) > 0)
    )


def prune_map_columns(map_col: Column, keep: Column) -> Column:
    """P10 — keep only the JSON keys listed in the config keep-list
    (DimAPP.java:82-95; the removeIf at :91).

    `keep` is an array<string> column (config ``sink_columns`` split on ',').
    Runs as a map_filter lambda — JVM-side, no UDF.
    """
    return F.map_filter(map_col, lambda k, _v: F.array_contains(keep, k))


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    time_col: str = "row_time",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-delivery emulation for at-least-once transports.

    The reference gets exactly-once into Kafka from transactional
    producers coordinated with checkpoints (FlinkSinkUtil.java:20-31);
    Spark's Kafka sink is at-least-once, so replays after a failure can
    re-deliver records.  Consumers restore effective exactly-once by
    dropping key duplicates inside the watermark horizon:
    dropDuplicatesWithinWatermark keeps per-key state only until the
    watermark passes `delay` beyond the key's event time — bounded state,
    unlike plain dropDuplicates whose state grows forever on a stream.

    `delay` must cover the transport's maximum redelivery window (for
    Kafka replays: the checkpoint interval plus recovery time).
    """
    return df.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(keys)


def _log_valid_cond() -> Column:
    # built lazily: constructing Columns needs an active SparkContext
    return (
        (F.col("page").isNotNull() | F.col("start").isNotNull())
        & F.col("common.mid").isNotNull()
        & F.col("ts").isNotNull()
    )


def observe_etl_drops(df: DataFrame, name="etl_log") -> DataFrame:
    """P8 observability — the reference LOGS each dirty record
    (DwdBaseLog.java:227-230); per-record logging at 100 TB is an
    anti-pattern, so the Spark-native equivalent is an ``observe()``
    metric: counters accumulate inside the same scan (zero extra pass,
    no action needed) and surface per micro-batch through
    ``StreamingQueryProgress.observedMetrics[name]`` (streaming) or an
    ``Observation`` (batch — pass the Observation object as ``name``).

    Attach BEFORE ``etl_log_valid``; the filter afterwards is unchanged.
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_input"),
        F.count_if(~F.coalesce(_log_valid_cond(), F.lit(False))).alias("n_dropped"),
    )
