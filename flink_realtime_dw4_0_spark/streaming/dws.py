"""DWS windowed summary pipelines — the 8 planned tables
(Constant.java:40-47), as Structured Streaming window aggs.

Every table is `groupBy(window(row_time, size), dims).agg(...)` in append
mode behind a watermark; UU variants run the first-seen keyed-state op
first so each (key, day) contributes once.  All transforms also run on
bounded frames (tests / backfill) unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


WINDOW = "10 seconds"  # the classic gmall DWS tumbling size


def _win(df: DataFrame, size: str, *dims: Column | str):
    return df.groupBy(F.window("row_time", size).alias("w"), *dims)


def _flat(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("w.start").alias("stt"),
        F.col("w.end").alias("edt"),
        *[c for c in df.columns if c != "w"],
    ).drop("w")


def keyword_page_view(page_log: DataFrame, size: str = WINDOW, tokenizer=None) -> DataFrame:
    """A1 — dws_traffic_source_keyword_page_view_window: tokenize search
    keyword, count per keyword per window (Constant.java:40, X13 UDTF —
    the reference's IK Chinese analyzer; here the CJK-aware tokenizer,
    which equals whitespace split on non-CJK text).

    `tokenizer` swaps the segmentation strategy (a Column → array<string>
    fn): default CJK-bigram `tokenize_keywords`; dictionary-based
    `tokenize_keywords_dict` / `tokenize_keywords_jieba` plug in
    unchanged — the window/explode/count plumbing is segmenter-agnostic.
    """
    from ..operators.split import explode_computed
    from ..operators.text import tokenize_keywords

    if tokenizer is None:
        tokenizer = tokenize_keywords
    kw = explode_computed(
        page_log.filter(
            (F.col("page.last_page_id") == "search") & F.col("page.item").isNotNull()
        ),
        ["row_time"],
        tokenizer(F.col("page.item")),
        "keyword",
    )
    out = _win(kw, size, "keyword").agg(F.count(F.lit(1)).alias("keyword_count"))
    return _flat(out)


def traffic_vc_ch_ar_is_new(page_log: DataFrame, size: str = WINDOW) -> DataFrame:
    """A2 — per (vc, ch, ar, is_new): PV, session count, duration sum
    (Constant.java:41)."""
    p = page_log.select(
        "row_time",
        F.col("common.vc").alias("vc"),
        F.col("common.ch").alias("ch"),
        F.col("common.ar").alias("ar"),
        F.col("common.is_new").alias("is_new"),
        F.col("common.sid").alias("sid"),
        F.col("page.during_time").alias("during_time"),
        F.col("page.last_page_id").alias("last_page_id"),
    )
    out = _win(p, size, "vc", "ch", "ar", "is_new").agg(
        F.count(F.lit(1)).alias("pv_ct"),
        F.sum(F.when(F.col("last_page_id").isNull(), 1).otherwise(0)).alias("sv_ct"),
        F.sum("during_time").alias("dur_sum"),
    )
    return _flat(out)


def home_detail_uv(first_seen_flags: DataFrame, size: str = WINDOW) -> DataFrame:
    """A3 — UV of home/detail pages per window from first-seen flags
    (operators/state.first_seen output) (Constant.java:42).

    If the caller already attached a (watermarked) row_time it is kept —
    re-deriving it would strip the watermark tag and break append-mode
    chaining (first_seen → window agg runs as ONE streaming query)."""
    f = first_seen_flags.filter(F.col("is_first") == 1)
    if "row_time" not in f.columns:
        f = f.withColumn("row_time", F.timestamp_millis("ts"))
    out = _win(f, size).agg(F.count(F.lit(1)).alias("uv_ct"))
    return _flat(out)


def user_login(log: DataFrame, size: str = WINDOW) -> DataFrame:
    """A4 — unique users + 7-day-back users per window (Constant.java:43):
    uses the corrected is_new + first_login_dt emitted by the visitor fix."""
    u = log.filter(F.col("uid").isNotNull())
    # approx_count_distinct: exact DISTINCT aggregations are rejected in
    # streaming (same constraint as province_order below); the batch-exact
    # twin is the a4_user_login_window catalog query
    out = _win(u, size).agg(
        F.approx_count_distinct("uid").alias("uu_ct"),
        F.approx_count_distinct(
            F.when(
                F.datediff(F.to_date(F.timestamp_millis("ts")), F.to_date("first_login_dt")) >= 7,
                F.col("uid"),
            )
        ).alias("back_ct"),
    )
    return _flat(out)


def user_register(topic_db: DataFrame, size: str = WINDOW) -> DataFrame:
    """A5 — register count per window (Constant.java:44): user_info inserts."""
    reg = topic_db.filter(
        (F.col("table") == "user_info") & (F.col("type") == "insert")
    )
    out = _win(reg, size).agg(F.count(F.lit(1)).alias("register_ct"))
    return _flat(out)


def cart_add_uu(cart_first_seen: DataFrame, size: str = WINDOW) -> DataFrame:
    """A6 — cart-add unique users per window from first-seen flags
    (Constant.java:45)."""
    return home_detail_uv(cart_first_seen, size).withColumnRenamed("uv_ct", "cart_add_uu_ct")


def sku_order(order_detail: DataFrame, sku_dim: DataFrame | None, size: str = WINDOW) -> DataFrame:
    """A7 — per-SKU order amounts per window + dim enrichment
    (Constant.java:46)."""
    od = order_detail.select(
        "row_time",
        F.col("sku_id"),
        F.col("split_total_amount").cast("double").alias("total"),
        F.coalesce(F.col("split_activity_amount").cast("double"), F.lit(0.0)).alias("act"),
        F.coalesce(F.col("split_coupon_amount").cast("double"), F.lit(0.0)).alias("coup"),
    )
    out = _win(od, size, "sku_id").agg(
        F.round(F.sum("total"), 2).alias("order_amount"),
        F.round(F.sum("act"), 2).alias("activity_amount"),
        F.round(F.sum("coup"), 2).alias("coupon_amount"),
    )
    flat = _flat(out)
    if sku_dim is not None:
        flat = flat.join(F.broadcast(sku_dim), "sku_id", "left")
    return flat


def province_order(order_detail: DataFrame, size: str = WINDOW) -> DataFrame:
    """A8 — per-province order count + amount per window (Constant.java:47)."""
    od = order_detail.select(
        "row_time",
        F.col("province_id"),
        F.col("order_id"),
        F.col("split_total_amount").cast("double").alias("total"),
    )
    out = _win(od, size, "province_id").agg(
        F.approx_count_distinct("order_id").alias("order_ct"),
        F.round(F.sum("total"), 2).alias("order_amount"),
    )
    return _flat(out)
