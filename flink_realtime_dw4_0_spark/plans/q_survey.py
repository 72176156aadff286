"""SURVEY §2 parity tier: TPC-H headline bench set, P projections,
J joins, A windowed aggregations (DWS), F/T splits + stateful batch
analogs, X scalar surface (incl. CJK/FMM keyword segmentation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..operators import (  # noqa: F401
    dedup, etl, joins, multimodal, project, sampling, similarity, split, text,
)
from ..operators.windows import windowed_agg  # noqa: F401
from ..sources.files import load_table  # noqa: F401
from ._registry import CATALOG, QuerySpec, q, t, _DK_TOKS  # noqa: F401


# ===========================================================================
# TPC-H-style headline queries (bench set) — exercise scan/filter/agg/join
# ===========================================================================

@q(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan"),
    bench=True,
)
def tpch_q1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-12-01"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 4).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey AS l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o.o_orderpriority AS o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-06-01' AND l.l_shipdate > DATE '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    tags=("join", "agg"),
    bench=True,
)
def tpch_q3(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-06-01"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-06-01"))
    # r12: stream the filtered lineitem and build the dims — the
    # c⋈o-first order made the planner broadcast the filtered lineitem
    # scan itself (hashed relation of the fact table; plan 13 in
    # plans/r12/tpch_q3_shipping_priority_before.txt).  Same inner-join
    # result; measured 0.92x at sf0.1 (guide §3.1).
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
        )
    )


@q(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name AS n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= DATE '1996-01-01'
    GROUP BY n.n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def tpch_q5(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # r12: lineitem (the fact table) STREAMS and every other relation is
    # the build side — the syntactic c⋈o-first order made the planner
    # broadcast the 600k-row lineitem scan (driver collect + hashed
    # relation of the biggest table) while probing with the small c⋈o
    # stream.  Same inner-join result, same oracle; at cluster scale the
    # orderkey join becomes the one big shuffle either way, but the
    # build sides are now the dims (guide §3.1: broadcast the side that
    # fits, stream the fact).
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, c.c_custkey == F.col("o_custkey"))
        .join(s, (F.col("l_suppkey") == s.s_suppkey) & (F.col("c_nationkey") == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
        )
    )


# ===========================================================================
# P — projections / filters / scalar expressions (SURVEY §2.3)
# ===========================================================================

@q(
    "p1_map_value_projection",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_type
    FROM events
    """,
    tags=("projection",),
)
def p1_map_projection(spark, sf_dir):
    """P1 — `data['id'] AS id` map extraction (DwdTradeCartAdd.java:63-77):
    props JSON → MAP<STRING,STRING> → element_at + cast."""
    ev = t(spark, sf_dir, "events").withColumn(
        "props_map", F.from_json("props", "map<string,string>")
    )
    return ev.select(
        "event_id",
        F.element_at("props_map", "k").cast("long").alias("k"),
        "event_type",
    )


@q(
    "p3_p7_route_filter",
    """
    SELECT event_id, user_id, round(value, 4) AS value_r
    FROM events
    WHERE event_type = 'purchase' AND value > 50
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    tags=("filter",),
)
def p3_route_filter(spark, sf_dir):
    """P3/P4/P7 — equality routing + IS NOT NULL update detection
    (DwdTradeCartAdd.java:79-86, DwdTradeOrderPaySucDetail.java:190-194)."""
    ev = t(spark, sf_dir, "events").withColumn(
        "props_map", F.from_json("props", "map<string,string>")
    )
    routed = project.route_filter(ev, event_type="purchase").filter(
        (F.col("value") > 50) & project.updated_field(F.col("props_map"), "k")
    )
    return routed.select("event_id", "user_id", F.round("value", 4).alias("value_r"))


@q(
    "p5_p6_conditional_delta",
    """
    SELECT event_id,
           CASE WHEN event_type = 'purchase'
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) - 10 END AS delta
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    tags=("projection",),
)
def p5_conditional(spark, sf_dir):
    """P5/P6 — cast-arithmetic + conditional IF: the cart-add incremental
    quantity pattern (DwdTradeCartAdd.java:68)."""
    ev = t(spark, sf_dir, "events").withColumn(
        "props_map", F.from_json("props", "map<string,string>")
    )
    k = F.element_at("props_map", F.lit("k"))
    delta = project.cart_add_delta(k, F.lit("10"), F.when(F.col("event_type") == "purchase", "insert").otherwise("update"))
    return ev.filter(k.cast("long").isNotNull()).select("event_id", delta.alias("delta"))


@q(
    "p8_p9_etl_validity",
    """
    SELECT event_id, event_type
    FROM events
    WHERE props IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
      AND user_id IS NOT NULL AND ts IS NOT NULL
      AND event_type NOT IN ('error')
    """,
    tags=("filter", "etl"),
)
def p8_etl(spark, sf_dir):
    """P8/P9 — ETL validity filters (DwdBaseLog.java:212-233,
    DimAPP.java:190-213): parseable payload, required keys present,
    bootstrap/dirty types dropped."""
    ev = t(spark, sf_dir, "events").withColumn(
        "props_map", F.from_json("props", "map<string,string>")
    )
    return ev.filter(
        F.col("props").isNotNull()
        & F.col("props_map").getItem("k").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & ~F.col("event_type").isin("error")
    ).select("event_id", "event_type")


@q(
    "p10_dynamic_column_pruning",
    """
    SELECT event_id,
           CASE WHEN event_type = 'purchase'
                  AND json_extract_string(props, '$.k') IS NOT NULL
                THEN 1 ELSE 0 END AS kept_cols
    FROM events
    """,
    tags=("projection", "etl"),
)
def p10_pruning(spark, sf_dir):
    """P10 — config-driven keep-list pruning (DimAPP.java:82-95): the map
    payload is filtered to the sink_columns of the matching config row;
    non-configured tables keep nothing."""
    ev = t(spark, sf_dir, "events").withColumn(
        "props_map", F.from_json("props", "map<string,string>")
    )
    keep = F.when(F.col("event_type") == "purchase", F.array(F.lit("k"))).otherwise(
        F.array().cast("array<string>")
    )
    pruned = etl.prune_map_columns(F.col("props_map"), keep)
    return ev.select(
        "event_id", F.size(pruned).cast("int").alias("kept_cols")
    ).withColumn("kept_cols", F.greatest(F.col("kept_cols"), F.lit(0)))


# ===========================================================================
# J — joins (SURVEY §2.4)
# ===========================================================================

@q(
    "j1_inner_equijoin",
    """
    SELECT o.o_orderkey AS o_orderkey, o.o_orderstatus AS o_orderstatus,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
    tags=("join",),
    bench=True,
)
def j1_inner(spark, sf_dir):
    """J1 — streaming inner equi-join shape (DwdTradeOrderDetail.java:113-115),
    batch plan: shuffle hash/sort-merge on the key, AQE handles skew."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        joins.equi_join(o, li, on=o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
    )


@q(
    "j2_left_outer_join",
    """
    SELECT o.o_orderkey AS o_orderkey,
           count(l.l_orderkey) AS n_returned,
           round(coalesce(sum(l.l_extendedprice), 0), 2) AS returned_value
    FROM orders o LEFT JOIN (SELECT * FROM lineitem WHERE l_returnflag = 'R') l
      ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    """,
    tags=("join",),
)
def j2_left(spark, sf_dir):
    """J2 — left outer join with null-padded misses
    (DwdTradeOrderDetail.java:116-119); in streaming this is the retract
    path emulated by keyed MERGE (sinks/upsert.py)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        joins.equi_join(o, li, on=o.o_orderkey == li.l_orderkey, how="left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_returned"),
            F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)), 2).alias("returned_value"),
        )
    )


@q(
    "j3_interval_join",
    """
    SELECT p.event_id AS pay_event_id, c.event_id AS click_event_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.ts >= c.ts - INTERVAL 15 MINUTE
     AND p.ts <= c.ts + INTERVAL 5 SECOND
    """,
    tags=("join", "interval"),
    bench=True,
)
def j3_interval(spark, sf_dir):
    """J3 — event-time interval join, bounds [-15 min, +5 s] exactly as the
    payment×order_detail join (DwdTradeOrderPaySucDetail.java:119-144)."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pay_event_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"), F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    return joins.interval_join(
        p, c, key=("pu", "cu"), time_cols=("pts", "cts"),
        lower="INTERVAL 15 MINUTES", upper="INTERVAL 5 SECONDS",
    ).select("pay_event_id", "click_event_id")


@q(
    "j4_lookup_join_inner",
    """
    SELECT c.c_custkey AS c_custkey, n.n_name AS n_name, r.r_name AS r_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("join", "lookup"),
)
def j4_lookup(spark, sf_dir):
    """J4 — processing-time temporal lookup join (FOR SYSTEM_TIME AS OF,
    DwdInteractionCommentInfo.java:64-80) as broadcast stream-static join."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return joins.lookup_join(
        joins.lookup_join(c, n, on=c.c_nationkey == n.n_nationkey),
        r,
        on=F.col("n_regionkey") == r.r_regionkey,
        select=[F.col("c_custkey"), F.col("n_name"), F.col("r_name")],
    )


@q(
    "j5_lookup_join_left",
    """
    SELECT s.s_suppkey AS s_suppkey, n.n_name AS n_name
    FROM supplier s LEFT JOIN (SELECT * FROM nation WHERE n_regionkey < 2) n
      ON s.s_nationkey = n.n_nationkey
    """,
    tags=("join", "lookup"),
)
def j5_lookup_left(spark, sf_dir):
    """J5 — left temporal lookup join (DwdTradeOrderPaySucDetail.java:90-113):
    unmatched keys survive null-padded."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") < 2)
    return joins.lookup_join(
        s, n, on=s.s_nationkey == n.n_nationkey, how="left",
        select=[F.col("s_suppkey"), F.col("n_name")],
    )


@q(
    "j6_config_dispatch_join",
    """
    SELECT e.event_id AS event_id, 'dwd_' || e.event_type AS sink_table
    FROM events e
    WHERE e.event_type IN ('click', 'view', 'purchase')
    """,
    tags=("join", "config"),
)
def j6_config(spark, sf_dir):
    """J6 — broadcast config-dispatch join (DimAPP.java:67-73,
    DimBroadcastFunction.java:26-97): records paired with their config row
    by table name; non-configured tables drop out."""
    ev = t(spark, sf_dir, "events")
    config = spark.createDataFrame(
        [(et, f"dwd_{et}") for et in ("click", "view", "purchase")],
        "source_table string, sink_table string",
    )
    return joins.config_dispatch_join(ev, config, key=("event_type", "source_table")).select(
        "event_id", "sink_table"
    )


# ===========================================================================
# A — windowed aggregations (SURVEY §2.5, the 8 planned DWS tables)
# ===========================================================================

# DuckDB (RE2) mirror of text.tokenize_keywords: isolate Han runs, split on
# whitespace, segment Han runs of length>=2 into overlapping char bigrams.
# Plain-string (not f-string) because of the regex braces.
_DK_CJK_KW = r"""
  SELECT src_id, unnest(CASE WHEN regexp_matches(t, '^\p{Han}+$') AND length(t) >= 2
           THEN list_transform(generate_series(1, length(t) - 1), i -> substring(t, i, 2))
           ELSE [t] END) AS keyword
  FROM (SELECT src_id,
               unnest(list_filter(
                 string_split_regex(trim(regexp_replace(lower(trim(txt)), '(\p{Han}+)', ' \1 ', 'g')), '\s+'),
                 t -> length(t) > 0)) AS t
        FROM __KW_SRC__)
"""


@q(
    "a1_keyword_count",
    "WITH kw AS ("
    + _DK_CJK_KW.replace("__KW_SRC__", "(SELECT doc_id AS src_id, text AS txt FROM documents)")
    + """)
    SELECT keyword, count(*) AS kw_count FROM kw GROUP BY keyword
    """,
    tags=("window", "udtf"),
)
def a1_keyword(spark, sf_dir):
    """A1 — keyword tokenize + count (dws_traffic_source_keyword_page_view,
    Constant.java:40; tokenizer X13 — CJK-aware, equal to whitespace split
    on non-CJK text)."""
    docs = t(spark, sf_dir, "documents")
    return (
        split.explode_computed(docs, [], text.tokenize_keywords("text"), "keyword")
        .groupBy("keyword")
        .agg(F.count(F.lit(1)).alias("kw_count"))
    )


# gmall-style search strings: zh / mixed / latin — exercises every branch of
# the CJK tokenizer (bigrams, single-han passthrough, whitespace fallback).
_CJK_FIXTURE = [
    (1, "小米手机至尊版"),
    (2, "iphone 13 pro"),
    (3, "苹果手机 apple"),
    (4, "华为智能手机"),
    (5, "联想笔记本电脑"),
    (6, "图书"),
    (7, "口红"),
    (8, "电饭煲 小米"),
    (9, "茶"),
    (10, "PS5 游戏机"),
    # realistic multi-word queries that only segment correctly with a
    # real vocabulary (长词优先 over compounds, OOV single-char fallback)
    (11, "蓝牙耳机充电器"),
    (12, "华为智能手表正品包邮"),
    (13, "小米电视机优惠券"),
    (14, "苹果笔记本电脑旗舰店"),
    (15, "扫地机器人双十一秒杀"),
    (16, "羽绒服男冬季新款"),
    (17, "儿童玩具积木拼图"),
    (18, "保温杯不锈钢大容量"),
]


@q(
    "x13_cjk_keyword_count",
    "WITH kw AS ("
    + _DK_CJK_KW.replace(
        "__KW_SRC__",
        "(SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{s}')" for i, s in _CJK_FIXTURE)
        + ") AS v(src_id, txt))",
    )
    + """)
    SELECT keyword, count(*) AS kw_count FROM kw GROUP BY keyword
    """,
    tags=("udtf", "cjk"),
)
def x13_cjk_keywords(spark, sf_dir):
    """X13 — the reference's IK Chinese analyzer surface
    (pom.xml:203-207, KeywordUDTF): CJK bigram segmentation over
    realistic gmall search strings, exactly mirrored by the DuckDB
    oracle.  Independent of sf_dir (literal fixture) by design — the
    synthetic documents corpus is Latin-only, so this query is what
    actually proves the Han path."""
    rows = spark.createDataFrame(_CJK_FIXTURE, "src_id long, txt string")
    return (
        split.explode_computed(rows, [], text.tokenize_keywords("txt"), "keyword")
        .groupBy("keyword")
        .agg(F.count(F.lit(1)).alias("kw_count"))
    )


# Vendored ~900-entry general + e-commerce vocabulary for the FMM
# (forward-maximum-matching) segmentation surface — the word list a
# production deployment swaps for jieba/IK's ~350k-entry dictionary.
# Mirrored verbatim in the DuckDB oracle's dict VALUES table.
from ..data.zh_vocab import ZH_VOCAB as _FMM_DICT  # noqa: E402


def _fmm_oracle() -> str:
    """DuckDB twin of operators.text.tokenize_keywords_dict: whitespace
    split → Han/non-Han span split → recursive-CTE forward maximum
    matching against the dictionary (longest word >= 2 chars at each
    position, single-char fallback), then keyword counts."""
    dict_vals = ", ".join(f"('{w}')" for w in _FMM_DICT)
    src_vals = ", ".join(f"({i}, '{s}')" for i, s in _CJK_FIXTURE)
    return f"""
    WITH RECURSIVE
    dict(w) AS (VALUES {dict_vals}),
    src AS (SELECT src_id, lower(trim(txt)) AS txt
            FROM (VALUES {src_vals}) v(src_id, txt)),
    parts AS (
      SELECT src_id, unnest(string_split_regex(txt, '\\s+')) AS part FROM src),
    spans AS (
      SELECT src_id, unnest(regexp_extract_all(part, '[一-鿿]+|[^一-鿿]+')) AS span
      FROM parts WHERE len(part) > 0),
    fmm(src_id, span, pos, tok) AS (
      SELECT src_id, span, CAST(1 AS BIGINT), CAST(NULL AS VARCHAR)
      FROM spans WHERE regexp_matches(span, '^[一-鿿]+$')
      UNION ALL
      SELECT src_id, span, pos + len(tok), tok FROM (
        SELECT f.src_id, f.span, f.pos,
               coalesce(
                 (SELECT d.w FROM dict d
                  WHERE len(d.w) >= 2 AND substr(f.span, f.pos, len(d.w)) = d.w
                  ORDER BY len(d.w) DESC LIMIT 1),
                 substr(f.span, f.pos, 1)) AS tok
        FROM fmm f WHERE f.pos <= len(f.span))
    ),
    kw AS (
      SELECT tok AS keyword FROM fmm WHERE tok IS NOT NULL
      UNION ALL
      SELECT span FROM spans WHERE NOT regexp_matches(span, '^[一-鿿]+$'))
    SELECT keyword, count(*) AS kw_count FROM kw GROUP BY keyword
    """


@q(
    "x14_dict_keyword_count",
    _fmm_oracle(),
    tags=("udtf", "cjk", "dict"),
)
def x14_dict_keywords(spark, sf_dir):
    """X13 dictionary mode — forward-maximum-matching segmentation (the
    algorithm the reference's ik_smart analyzer and jieba's dictionary
    pass approximate) over the same gmall search strings as x13.  The
    Arrow-batched FMM UDF is value-checked against a recursive-CTE SQL
    twin, so real word boundaries (长词优先 / longest-match-first) are
    driver-verified, not just golden-tested.  Independent of sf_dir
    (literal fixture) like x13."""
    rows = spark.createDataFrame(_CJK_FIXTURE, "src_id long, txt string")
    return (
        split.explode_computed(
            rows, [], text.tokenize_keywords_dict("txt", _FMM_DICT), "keyword"
        )
        .groupBy("keyword")
        .agg(F.count(F.lit(1)).alias("kw_count"))
    )


@q(
    "a2_traffic_window_pv",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           count(*) AS pv, count(DISTINCT user_id) AS uv,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
    tags=("window",),
    bench=True,
)
def a2_traffic(spark, sf_dir):
    """A2 — per-dimension PV/UV/sum per tumbling window
    (dws_traffic_vc_ch_ar_is_new_page_view, Constant.java:41)."""
    ev = t(spark, sf_dir, "events")
    return windowed_agg(
        ev, "ts", "1 hour", ["event_type"],
        [
            F.count(F.lit(1)).alias("pv"),
            F.count_distinct(F.col("user_id")).alias("uv"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )


@q(
    "a9_hop_window_pv",
    """
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(wstart + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           count(*) AS pv, count(DISTINCT user_id) AS uv,
           round(sum(value), 2) AS sum_value
    FROM (SELECT e.*, time_bucket(INTERVAL '30 minutes', e.ts) - k * INTERVAL 30 MINUTE AS wstart
          FROM events e CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) g)
    GROUP BY 1, 2, 3
    """,
    tags=("window", "hop"),
)
def a9_hop(spark, sf_dir):
    """Sliding (HOP) window PV/UV — Flink's HOP window TVF surface the
    DWS tables use for overlapping dashboards (1 h window, 30 min slide:
    every event lands in exactly 2 windows).  Built-in
    `F.window(ts, size, slide)`; the oracle replays the replication with
    a generate_series cross join."""
    ev = t(spark, sf_dir, "events")
    from ..operators.windows import windowed_agg_hop

    return windowed_agg_hop(
        ev, "ts", "1 hour", "30 minutes", ["event_type"],
        [
            F.count(F.lit(1)).alias("pv"),
            F.count_distinct(F.col("user_id")).alias("uv"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )


@q(
    "a10_cumulate_window",
    """
    SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(wend, '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           count(*) AS pv, round(sum(value), 2) AS sum_value
    FROM (SELECT e.*, date_trunc('day', e.ts) AS b,
                 date_trunc('day', e.ts) + j * INTERVAL 6 HOUR AS wend
          FROM events e CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS j) g)
    WHERE wend > ts
    GROUP BY 1, 2, 3
    """,
    tags=("window", "cumulate"),
)
def a10_cumulate(spark, sf_dir):
    """Cumulative (CUMULATE) window — Flink's CUMULATE TVF: expanding
    windows anchored at midnight emitted every 6 h (the "GMV so far
    today" DWS curve).  Spark lacks the TVF; composed as
    sequence-explode + one grouped agg (operators.windows)."""
    ev = t(spark, sf_dir, "events")
    from ..operators.windows import windowed_agg_cumulate

    return windowed_agg_cumulate(
        ev, "ts", "6 hours", "1 day", ["event_type"],
        [
            F.count(F.lit(1)).alias("pv"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )


@q(
    "a3_unique_visitors_daily",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS dt, count(DISTINCT user_id) AS uv
    FROM events WHERE event_type = 'view' GROUP BY 1
    """,
    tags=("window", "dedup-state"),
)
def a3_uv(spark, sf_dir):
    """A3 — daily UV with first-visit-per-day dedup
    (dws_traffic_home_detail_page_view, Constant.java:42); batch equivalent
    of the keyed first-seen state (operators/state.py)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(F.count_distinct("user_id").alias("uv"))
    )


@q(
    "a4_user_login_window",
    """
    WITH firsts AS (SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS first_dt FROM events GROUP BY user_id)
    SELECT strftime(e.ts, '%Y-%m-%d') AS dt,
           count(DISTINCT e.user_id) AS uu,
           count(DISTINCT CASE WHEN f.first_dt < strftime(e.ts, '%Y-%m-%d') THEN e.user_id END) AS back_uu
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1
    """,
    tags=("window", "state"),
)
def a4_login(spark, sf_dir):
    """A4 — unique + returning users per window (dws_user_user_login,
    Constant.java:43): keyed last-login state in streaming, min-date join
    in batch."""
    ev = t(spark, sf_dir, "events").withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    firsts = ev.groupBy("user_id").agg(F.min("dt").alias("first_dt"))
    return (
        ev.join(firsts, "user_id")
        .groupBy("dt")
        .agg(
            F.count_distinct("user_id").alias("uu"),
            F.count_distinct(
                F.when(F.col("first_dt") < F.col("dt"), F.col("user_id"))
            ).alias("back_uu"),
        )
    )


@q(
    "a5_register_window",
    """
    SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(time_bucket(INTERVAL '6 hours', ts) + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           count(*) AS register_ct
    FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    """,
    tags=("window",),
)
def a5_register(spark, sf_dir):
    """A5 — register count per window (dws_user_user_register, Constant.java:44)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    return windowed_agg(ev, "ts", "6 hours", [], [F.count(F.lit(1)).alias("register_ct")])


@q(
    "a6_cart_add_uu_window",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS dt, count(DISTINCT user_id) AS cart_add_uu
    FROM events WHERE event_type = 'purchase' GROUP BY 1
    """,
    tags=("window", "dedup-state"),
)
def a6_cart(spark, sf_dir):
    """A6 — cart-add unique users per day (dws_trade_cart_add_uu,
    Constant.java:45)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt")).agg(
        F.count_distinct("user_id").alias("cart_add_uu")
    )


@q(
    "a7_sku_order_window",
    """
    SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month, p.p_brand AS p_brand,
           count(*) AS order_ct,
           round(sum(l.l_extendedprice), 2) AS orig_amount,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS final_amount
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
    """,
    tags=("window", "join"),
    bench=True,
)
def a7_sku(spark, sf_dir):
    """A7 — per-SKU order amounts per window + dim enrichment
    (dws_trade_sku_order, Constant.java:46)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        joins.lookup_join(li, p, on=li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"), F.col("p_brand"))
        .agg(
            F.count(F.lit(1)).alias("order_ct"),
            F.round(F.sum("l_extendedprice"), 2).alias("orig_amount"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("final_amount"),
        )
    )


@q(
    "a8_province_order_window",
    """
    SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month, n.n_name AS n_name,
           count(*) AS order_ct, round(sum(o.o_totalprice), 2) AS total_amount
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    tags=("window", "join"),
)
def a8_province(spark, sf_dir):
    """A8 — per-province order stats per window (dws_trade_province_order,
    Constant.java:47)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"), F.col("n_name"))
        .agg(
            F.count(F.lit(1)).alias("order_ct"),
            F.round(F.sum("o_totalprice"), 2).alias("total_amount"),
        )
    )


# ===========================================================================
# F/T — splits, explode, stateful batch analogs (SURVEY §2.6-2.7)
# ===========================================================================

@q(
    "f1_route_split",
    """
    SELECT CASE WHEN event_type = 'error' THEN 'err'
                WHEN event_type = 'signup' THEN 'start'
                ELSE 'page' END AS route,
           count(*) AS n
    FROM events GROUP BY 1
    """,
    tags=("split",),
)
def f1_route(spark, sf_dir):
    """F1 — 5-way side-output routing (DwdBaseLog.java:57-133) as a scalar
    route classifier + filtered fan-out."""
    ev = t(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type") == "error", "err")
        .when(F.col("event_type") == "signup", "start")
        .otherwise("page")
    )
    return ev.groupBy(route.alias("route")).agg(F.count(F.lit(1)).alias("n"))


@q(
    "f2_explode_enrich",
    f"""
    SELECT doc_id, lang, unnest({_DK_TOKS}) AS token FROM documents
    """,
    tags=("split", "explode"),
)
def f2_explode(spark, sf_dir):
    """F2 — array explode with parent enrichment (DwdBaseLog.java:98-121):
    each element emitted with its parent's metadata."""
    docs = t(spark, sf_dir, "documents")
    return split.explode_computed(docs, ["doc_id", "lang"], text.tokenize("text"), "token")


@q(
    "t1_is_new_fix",
    """
    SELECT event_id, user_id,
           CASE WHEN strftime(ts, '%Y-%m-%d') =
                     min(strftime(ts, '%Y-%m-%d')) OVER (PARTITION BY user_id)
                THEN 1 ELSE 0 END AS is_new_fixed
    FROM events
    """,
    tags=("state",),
)
def t1_is_new(spark, sf_dir):
    """T1 — the new-visitor fix decision table (DwdBaseLog.java:135-183):
    is_new is 1 only on the user's first-ever day.  Batch analog of the
    keyed ValueState op (operators/state.py holds the streaming version)."""
    ev = t(spark, sf_dir, "events").withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.col("dt") == F.min("dt").over(w), 1).otherwise(0).alias("is_new_fixed"),
    )


@q(
    "t2_first_seen_dedup",
    """
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt, min(event_id) AS first_event_id
    FROM events GROUP BY 1, 2
    """,
    tags=("state", "dedup-state"),
)
def t2_first_seen(spark, sf_dir):
    """First-seen-per-day dedup — the keyed-state primitive behind A3/A4/A6
    UU counts (SURVEY §2.6), batch analog (event_id is time-ordered in the
    generator, so min(event_id) = first arrival)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id", F.date_format("ts", "yyyy-MM-dd").alias("dt")).agg(
        F.min("event_id").alias("first_event_id")
    )


# ===========================================================================
# X — scalar datetime surface (SURVEY §2.8)
# ===========================================================================

@q(
    "x_datetime_surface",
    """
    SELECT event_id,
           epoch_ms(ts) AS ts_ms,
           strftime(ts, '%Y-%m-%d') AS dt,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS dts,
           strftime(ts, '%Y%m%d') AS dt_part,
           epoch_ms(ts) - 86400000 AS ts_yesterday,
           strftime(ts - INTERVAL 1 DAY, '%Y-%m-%d') AS dt_yesterday
    FROM events
    """,
    tags=("scalar",),
)
def x_datetime(spark, sf_dir):
    """X1-X6, X11-X12 — the DateFormatUtil surface (DateFormatUtil.java:28-68)
    as zone-aware built-ins (functions/datetime.py)."""
    from ..functions import datetime as dtf

    ev = t(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    return ev.select(
        "event_id",
        ms.alias("ts_ms"),
        dtf.ts_to_date(ms).alias("dt"),
        dtf.ts_to_datetime(ms).alias("dts"),
        dtf.ts_to_partition(ms).alias("dt_part"),
        dtf.yesterday_ts(ms).alias("ts_yesterday"),
        dtf.ts_to_date(dtf.yesterday_ts(ms)).alias("dt_yesterday"),
    )


