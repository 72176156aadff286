"""Kafka sinks + multi-sink fan-out (SURVEY §2.2 K1/K2/K6).

Delivery semantics (documented delta vs the reference, SURVEY §7.3):
Flink's sink is transactional EXACTLY_ONCE (FlinkSinkUtil.java:20-31);
Spark's Kafka sink is at-least-once under checkpointing.  Effective
exactly-once is restored downstream by keyed idempotence: every DWD
record carries its primary key (upsert_kafka_records), so replayed
writes collapse in any keyed consumer/table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def kafka_records(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """The append-sink wire projection (SQLUtil.java:41-48): value = JSON
    of the whole row, key = the optional key column as a string.  Shared
    by `kafka_append` and the broker-less transport contract tests
    (tests/test_kafka_contract.py), so what the tests assert is exactly
    what production ships."""
    cols = [F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")]
    if key_col:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def kafka_append(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
) -> DataStreamWriter:
    """K1/K2 — JSON append sink (SQLUtil.java:41-48)."""
    return (
        kafka_records(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def fanout_foreach_batch(
    routes: dict[str, Callable[[DataFrame], DataFrame]],
    writers: dict[str, Callable[[DataFrame, int], None]],
) -> Callable[[DataFrame, int], None]:
    """K6 — one streaming query, N sinks (DwdBaseLog.java:69-73 writes 5
    topics).  The micro-batch is persisted once, then each route's filter +
    writer runs against the cached plan — Spark's idiom for side outputs
    (SURVEY §2.7 F1)."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for name, route in routes.items():
                writers[name](route(batch), batch_id)
        finally:
            batch.unpersist()

    return fn
