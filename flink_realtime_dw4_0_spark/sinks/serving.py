"""Serving-table sink — the Doris-sink equivalent (SURVEY §2.2 K7).

The reference planned DWS aggregates → Doris via the flink-doris-connector
(pom.xml:190-195, FE/db constants at Constant.java:34-37).  Here a serving
table is a KeyedTable MERGEd per micro-batch: window rows keyed by
(window_start, dims) converge under replays exactly like a Doris
aggregate-model table.  On a real deployment the same foreachBatch body
writes JDBC to Doris/StarRocks or MERGEs into Delta/Iceberg.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .upsert import KeyedTable


def serving_foreach_batch(
    table: KeyedTable,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: MERGE the micro-batch's (re)computed summary
    rows into the serving table by window/dim key."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.limit(1).count():
            table.merge(batch.sparkSession, batch)

    return fn
