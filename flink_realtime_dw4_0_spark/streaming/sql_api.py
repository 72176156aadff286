"""SQL-text API surface — the BaseSQLAPP parity layer (SURVEY §3.3).

The reference's DWD apps are SQL strings handed to the Flink planner
(BaseSQLAPP.java:60-62, sqlQuery sites).  The same queries run on Catalyst
nearly verbatim: map access ``data['x']`` is identical; the dialect deltas
are exactly the ones SURVEY §3.3 lists —

  * ``FOR SYSTEM_TIME AS OF proc_time``  →  plain join against the
    per-batch dim snapshot (registered as a temp view each micro-batch)
  * ``PROCTIME()``                       →  ``current_timestamp()``
  * ``TO_TIMESTAMP_LTZ(ts, 3)``          →  ``timestamp_millis(ts)``

``register_topic_db`` + ``sql`` below run the reference's own query text
(dialect-adjusted) on any decoded topic_db frame, batch or streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# DwdTradeCartAdd.java:63-90, verbatim semantics (map access unchanged)
CART_ADD_SQL = """
SELECT
  `data`['id'] AS id,
  `data`['user_id'] AS user_id,
  `data`['sku_id'] AS sku_id,
  `data`['cart_price'] AS cart_price,
  IF(`type` = 'insert',
     `data`['sku_num'],
     CAST(CAST(`data`['sku_num'] AS BIGINT) - CAST(`old`['sku_num'] AS BIGINT) AS STRING)
  ) AS sku_num,
  `data`['sku_name'] AS sku_name,
  `data`['create_time'] AS create_time,
  ts
FROM topic_db
WHERE `database` = 'gmall'
  AND `table` = 'cart_info'
  AND (`type` = 'insert'
       OR (`type` = 'update'
           AND `old`['sku_num'] IS NOT NULL
           AND CAST(`data`['sku_num'] AS BIGINT) > CAST(`old`['sku_num'] AS BIGINT)))
"""

# DwdInteractionCommentInfo.java:64-100 — lookup join; FOR SYSTEM_TIME AS OF
# becomes a plain join against the per-batch base_dic snapshot view
COMMENT_INFO_SQL = """
SELECT
  c.`data`['id'] AS id,
  c.`data`['user_id'] AS user_id,
  c.`data`['sku_id'] AS sku_id,
  c.`data`['appraise'] AS appraise,
  b.dic_name AS appraise_name,
  c.`data`['comment_txt'] AS comment_txt,
  c.ts
FROM topic_db c
JOIN base_dic b ON c.`data`['appraise'] = b.rowkey
WHERE c.`database` = 'gmall' AND c.`table` = 'comment_info' AND c.`type` = 'insert'
"""


def register_topic_db(spark: SparkSession, decoded: DataFrame) -> None:
    """createTopicDb equivalent (BaseSQLAPP.java:60-62)."""
    decoded.createOrReplaceTempView("topic_db")


def register_dim(spark: SparkSession, name: str, dim: DataFrame) -> None:
    """Register a dim snapshot for lookup joins (re-run per micro-batch for
    'current version' semantics — createBaseDic, BaseSQLAPP.java:65-75)."""
    dim.createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
