"""Kafka stream sources (SURVEY §2.1 S1, S3, S4, S6).

Parity: ``FlinkSourceUtil.getKafkaSource`` (FlinkSourceUtil.java:29-61) and
the SQL DDL sources (``SQLUtil.java:16-39``).  Spark-native shape:
``readStream.format("kafka")`` + ``from_json`` decode.

Design: every source is split into (a) a *transport* (kafka / files /
memory — anything yielding a `value STRING` column) and (b) a *decode*
(envelope parsing, event-time, watermark).  Decodes are pure DataFrame
transforms, so tests drive them through file streams with identical
semantics; production wires the kafka transport.

The reference's null-tolerant deserializer (FlinkSourceUtil.java:42-48 —
DWD emits tombstones) is free here: Kafka null values arrive as SQL NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .. import schemas
from ..functions.datetime import ts_millis_to_timestamp, ts_seconds_to_timestamp


def kafka_raw(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1 — raw Kafka value stream (FlinkSourceUtil.java:29-61: earliest
    offsets, consumer group, tombstone-tolerant)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.group.id", group_id)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def file_json_raw(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """Test transport: newline-JSON files as a `value STRING` stream —
    same downstream contract as kafka_raw."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files)
        .load(path)
        .select(F.col("value"))
    )


def decode_json(df: DataFrame, schema: StructType) -> DataFrame:
    """S3 — json decode with explicit schema; corrupt records → null row
    (dropped by the ETL filters, matching DwdBaseLog.java:227-230)."""
    return df.select(F.from_json("value", schema).alias("j")).select("j.*")


def topic_db(df: DataFrame, watermark: str | None = "5 seconds") -> DataFrame:
    """S4 — the `topic_db` Maxwell CDC table (SQLUtil.java:26-39):
    envelope decode + `row_time` = TO_TIMESTAMP_LTZ(ts,3) + 5 s watermark +
    `proc_time`.  NOTE: topic_db `ts` is epoch seconds (FIXTURES.md §1)."""
    out = (
        decode_json(df, schemas.MAXWELL_ENVELOPE)
        .withColumn("row_time", ts_seconds_to_timestamp("ts"))
        .withColumn("proc_time", F.current_timestamp())
    )
    if watermark:
        out = out.withWatermark("row_time", watermark)
    return out


def topic_log(df: DataFrame, watermark: str | None = "0 seconds") -> DataFrame:
    """Behavior-log stream (DwdBaseLog.java): millis `ts`, monotonous
    watermark (DwdBaseLog.java:198-208 → 0 s lag)."""
    out = decode_json(df, schemas.LOG_EVENT).withColumn(
        "row_time", ts_millis_to_timestamp("ts")
    )
    if watermark:
        out = out.withWatermark("row_time", watermark)
    return out


def dwd_resource(df: DataFrame, schema: StructType, watermark: str | None = "5 seconds") -> DataFrame:
    """S6 — re-read a DWD output topic as a table with event time
    (DwdTradeOrderPaySucDetail.java:151-172).  Preserves the documented
    `ts*1000` seconds→millis quirk (:169)."""
    out = decode_json(df, schema).withColumn("row_time", ts_seconds_to_timestamp("ts"))
    if watermark:
        out = out.withWatermark("row_time", watermark)
    return out
