"""Explicit StructTypes for every stream the engine ingests.

Parity: the reference declares every source schema in DDL, never inferred
(``SQLUtil.java:27-38``, ``DwdTradeOrderPaySucDetail.java:152-171``).  We
do the same: ``from_json`` always gets one of these types; ``inferSchema``
is never used on a stream.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

S = StringType()
L = LongType()
MSS = MapType(StringType(), StringType())


def _struct(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --------------------------------------------------------------------------
# Maxwell CDC envelope — the `topic_db` stream every DWD SQL app reads
# (SQLUtil.java:26-39).  `ts` is epoch SECONDS (TO_TIMESTAMP_LTZ(ts,3) at
# SQLUtil.java:36 vs the *1000 quirk at DwdTradeOrderPaySucDetail.java:169).
# --------------------------------------------------------------------------
MAXWELL_ENVELOPE = _struct(
    ("database", S),
    ("table", S),
    ("type", S),
    ("data", MSS),
    ("old", MSS),
    ("ts", L),
)

# --------------------------------------------------------------------------
# Debezium envelope — Flink-CDC JSON for the DIM config stream
# (DimAPP.java:141-156, FlinkSourceUtil.java:77).
# --------------------------------------------------------------------------
DEBEZIUM_ENVELOPE = _struct(
    ("op", S),  # c / r / u / d
    ("before", MSS),
    ("after", MSS),
    ("ts_ms", L),
)

# --------------------------------------------------------------------------
# table_process_dim config row (TableProcessDim.java:19-38)
# --------------------------------------------------------------------------
TABLE_PROCESS_DIM = _struct(
    ("source_table", S),
    ("sink_table", S),
    ("sink_columns", S),  # comma-joined keep-list (DimAPP.java:88-91)
    ("sink_family", S),
    ("sink_row_key", S),
    ("op", S),  # carried alongside for DDL dispatch (DimAPP.java:137-162)
)

# --------------------------------------------------------------------------
# topic_log behavior event (DwdBaseLog.java:76-233); ts is epoch MILLIS.
# --------------------------------------------------------------------------
LOG_COMMON = _struct(
    ("ar", S), ("ba", S), ("ch", S), ("is_new", S), ("md", S),
    ("mid", S), ("os", S), ("uid", S), ("vc", S), ("sid", S),
)
LOG_PAGE = _struct(
    ("page_id", S), ("last_page_id", S), ("item", S), ("item_type", S),
    ("during_time", L), ("source_type", S),
)
LOG_START = _struct(
    ("entry", S), ("open_ad_id", S), ("loading_time", L),
    ("open_ad_ms", L), ("open_ad_skip_ms", L),
)
LOG_ERR = _struct(("error_code", S), ("msg", S))
LOG_DISPLAY = _struct(
    ("item", S), ("item_type", S), ("pos_id", S), ("pos_seq", S), ("order", S),
)
LOG_ACTION = _struct(
    ("action_id", S), ("item", S), ("item_type", S), ("ts", L),
)
LOG_EVENT = StructType(
    [
        StructField("common", LOG_COMMON, True),
        StructField("page", LOG_PAGE, True),
        StructField("start", LOG_START, True),
        StructField("err", LOG_ERR, True),
        StructField("displays", ArrayType(LOG_DISPLAY), True),
        StructField("actions", ArrayType(LOG_ACTION), True),
        StructField("ts", L, True),
    ]
)

# --------------------------------------------------------------------------
# base_dic dictionary dim (BaseSQLAPP.java:65-75): rowkey + info.dic_name
# --------------------------------------------------------------------------
BASE_DIC = _struct(("rowkey", S), ("dic_name", S))

# events.props payload in the driver testdata (a tiny JSON object)
EVENT_PROPS = _struct(("k", L))
