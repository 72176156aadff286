"""Broker-less Kafka transport contract tests (S1/K1/K2/K3 wire legs).

A file-backed fake broker stands in for Kafka: produce appends
(key, value) wire records to a topic log, consume replays them as the
same `key`/`value STRING` columns `readStream.format("kafka")` yields
after the cast in `sources.kafka.kafka_raw`.  What is asserted is the
BYTE contract the reference's transport carries:

* K2/K1 append records — value = JSON of the row, key = key column
  (SQLUtil.java:41-48, FlinkSinkUtil.java:20-31)
* K3 upsert records — key = JSON of PK columns, value = JSON row or NULL
  tombstone (SQLUtil.java:55-63)
* S1 null-tolerant read — tombstones arrive as SQL NULL values and must
  not break decode (FlinkSourceUtil.java:42-48's null-guarded
  deserializer)
* K1 delivery — replayed (at-least-once) produces converge through the
  keyed consumer path to the exactly-once relation
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_realtime_dw4_0_spark import schemas
from flink_realtime_dw4_0_spark.sinks.kafka import kafka_records
from flink_realtime_dw4_0_spark.sinks.upsert import KeyedTable, upsert_kafka_records
from flink_realtime_dw4_0_spark.sources.kafka import decode_json


class FileBroker:
    """Append-only topic log: one JSON line per record {key, value},
    value null for tombstones — the durable byte contract of a Kafka
    topic without the broker."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _log(self, topic: str) -> str:
        return os.path.join(self.root, f"{topic}.log")

    def produce(self, topic: str, records) -> None:
        """records: DataFrame with (optional key string, value string)."""
        cols = records.columns
        with open(self._log(topic), "a", encoding="utf-8") as fh:
            for r in records.collect():
                rec = {
                    "key": r["key"] if "key" in cols else None,
                    "value": r["value"],
                }
                fh.write(json.dumps(rec) + "\n")

    def consume(self, spark, topic: str):
        """Replay the topic as (key string, value string) — value NULL
        preserved, append order preserved (per-key order within a
        partition is Kafka's guarantee; a single log is one partition)."""
        with open(self._log(topic), encoding="utf-8") as fh:
            rows = [json.loads(line) for line in fh]
        return spark.createDataFrame(
            [(r["key"], r["value"]) for r in rows], "key string, value string"
        )


def test_append_sink_wire_contract(spark, tmp_path):
    """K2: kafka_records (the exact projection kafka_append ships) round-
    trips through the broker log back to the original rows."""
    broker = FileBroker(str(tmp_path))
    df = spark.createDataFrame(
        [(1, "search", 1000), (2, "home", 2000)], "id long, page string, ts long"
    )
    broker.produce("dwd_page", kafka_records(df, key_col="id"))
    got = broker.consume(spark, "dwd_page")
    assert [r.key for r in got.collect()] == ["1", "2"]
    decoded = decode_json(got, df.schema)
    assert sorted(map(tuple, decoded.collect())) == sorted(map(tuple, df.collect()))


def test_upsert_sink_tombstone_contract(spark, tmp_path):
    """K3: upsert records carry JSON-of-PK keys; retractions are NULL
    tombstones; a keyed consumer replaying the topic materializes the
    upsert-kafka table state (insert, update, delete)."""
    broker = FileBroker(str(tmp_path))
    batch = spark.createDataFrame(
        [(1, "a", 10, False), (2, "b", 20, False), (1, "a2", 11, False), (2, None, 21, True)],
        "id long, sku string, ts long, retract boolean",
    )
    records = upsert_kafka_records(batch, keys=["id"], tombstone_when=F.col("retract"))
    broker.produce("dwd_od", records)
    raw = broker.consume(spark, "dwd_od")

    # byte contract: key is the JSON of the PK struct, tombstone value is NULL
    keys = [json.loads(r.key)["id"] for r in raw.collect()]
    assert keys == [1, 2, 1, 2]
    vals = [r.value for r in raw.collect()]
    assert vals[3] is None and all(v is not None for v in vals[:3])

    # keyed consumer materialization: last value per key wins, NULL deletes
    decoded = raw.withColumn("off", F.monotonically_increasing_id())
    last = (
        decoded.withColumn("k", F.get_json_object("key", "$.id").cast("long"))
        .groupBy("k")
        .agg(F.max_by("value", "off").alias("value"))
    )
    state = {r.k: r.value for r in last.collect()}
    assert json.loads(state[1])["sku"] == "a2"
    assert state[2] is None  # deleted by tombstone


def test_null_tolerant_decode(spark, tmp_path):
    """S1: a topic containing tombstones must decode without error —
    NULL values become all-null rows that the ETL validity filter drops
    (the reference's null-guarded DeserializationSchema,
    FlinkSourceUtil.java:42-48)."""
    broker = FileBroker(str(tmp_path))
    rows = spark.createDataFrame(
        [("k1", '{"common":{"mid":"m1"},"ts":1000}'), ("k1", None)],
        "key string, value string",
    )
    broker.produce("topic_log", rows)
    got = broker.consume(spark, "topic_log")
    decoded = decode_json(got, schemas.LOG_EVENT)
    out = decoded.collect()
    assert len(out) == 2  # tombstone did not kill the read
    assert out[1].ts is None  # it decodes to an all-null row
    assert decoded.filter(F.col("ts").isNotNull()).count() == 1


def test_replayed_produce_converges(spark, tmp_path):
    """K1: the documented Spark-native exactly-once story — at-least-once
    transport + keyed idempotent consumer.  Producing the same batch
    TWICE (a replay after failure) yields the same final table as one
    delivery."""
    broker = FileBroker(str(tmp_path / "broker"))
    batch = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, sku string, ts long"
    )
    records = upsert_kafka_records(batch, keys=["id"])
    broker.produce("dwd_od", records)
    broker.produce("dwd_od", records)  # replay

    raw = broker.consume(spark, "dwd_od")
    assert raw.count() == 4  # transport really is at-least-once
    decoded = decode_json(
        raw.select("value"), "id long, sku string, ts long"
    )
    table = KeyedTable(str(tmp_path / "table"), keys=["id"], version_col="ts")
    table.merge(spark, decoded)
    got = sorted(map(tuple, table.read(spark).select("id", "sku", "ts").collect()))
    assert got == [(1, "a", 10), (2, "b", 20)]
