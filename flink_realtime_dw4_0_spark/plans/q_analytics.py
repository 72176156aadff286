"""General-analytics tier: sorts/limits/set-ops/window functions,
parity + scale-knob shapes, and dedup clustering / curation pipeline
queries (connected components, keep-lists, streaming near-dup twins)."""

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
from .q_dedup import _DK_SHINGLES  # noqa: F401


# ===========================================================================
# Q — sorts / limits / set ops / analytic windows (SURVEY §2.10: absent in
# the reference, exposed by the engine via Catalyst)
# ===========================================================================

@q(
    "sort_topn",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def sort_topn(spark, sf_dir):
    """Top-N with a unique tiebreak (deterministic LIMIT boundary)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@q(
    "set_ops",
    """
    SELECT c_custkey, 'both' AS src FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000)
    UNION ALL
    SELECT c_custkey, 'only_seg' AS src FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000)
    """,
    tags=("setop",),
)
def set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION over key sets."""
    seg = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = seg.intersect(big).withColumn("src", F.lit("both"))
    only = seg.subtract(big).withColumn("src", F.lit("only_seg"))
    return both.unionByName(only)


@q(
    "w_rank_lag",
    """
    SELECT o_custkey, o_orderkey,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           round(o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
    FROM orders
    """,
    tags=("window-fn",),
)
def w_rank_lag(spark, sf_dir):
    """Analytic window functions (rank / lag) with deterministic ordering."""
    o = t(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w_rank).cast("long").alias("price_rank"),
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w_seq), 2).alias("delta_prev"),
    )


@q(
    "x_string_json_surface",
    """
    SELECT event_id,
           string_split(event_type || ',' || source, ',')[1] AS first_csv,
           len(string_split(event_type || ',' || source, ',')) AS n_csv,
           json_extract_string(props, '$.k') AS k_str,
           CAST(row_to_json(struct_pack(event_id := event_id, t := event_type)) AS VARCHAR) AS packed
    FROM (SELECT event_id, event_type, 'src' AS source, props FROM events)
    """,
    tags=("scalar", "string"),
)
def x_string_json(spark, sf_dir):
    """X8 (CSV split) + X10 (JSON parse/serialize) scalar surface."""
    ev = t(spark, sf_dir, "events").withColumn("source", F.lit("src"))
    csv = F.split(F.concat_ws(",", "event_type", "source"), ",")
    return ev.select(
        "event_id",
        csv.getItem(0).alias("first_csv"),
        F.size(csv).cast("long").alias("n_csv"),
        F.from_json("props", "map<string,string>").getItem("k").alias("k_str"),
        F.to_json(F.struct(F.col("event_id"), F.col("event_type").alias("t"))).alias("packed"),
    )


@q(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    tags=("scan", "pushdown"),
    bench=True,
)
def tpch_q6(spark, sf_dir):
    """Pure predicate+agg — the parquet-pushdown showcase (all four
    predicates reach the scan; see tests/test_plans.py)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))


# ===========================================================================
# Additional parity + scale-knob queries
# ===========================================================================

@q(
    "p2_struct_field_access",
    """
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS info_k
    FROM events
    """,
    tags=("projection",),
)
def p2_struct(spark, sf_dir):
    """P2 — nested struct field access (`info.dic_name`,
    DwdInteractionCommentInfo.java:73): JSON decoded to a typed struct,
    field read via dotted path."""
    ev = t(spark, sf_dir, "events").withColumn(
        "info", F.from_json("props", "struct<k:bigint>")
    )
    return ev.select("event_id", F.col("info.k").alias("info_k"))


@q(
    "dedup_ngram_capped",
    _DK_SHINGLES
    + """
    , freq AS (SELECT shingle FROM inv GROUP BY shingle HAVING count(*) <= 50),
    inv_c AS (SELECT inv.doc_id, inv.shingle FROM inv JOIN freq USING (shingle)),
    sizes_c AS (SELECT doc_id, count(*) AS n FROM inv_c GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM inv_c a JOIN inv_c b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT p.id_a AS id_a, p.id_b AS id_b, p.inter AS inter,
           sa.n AS n_a, sb.n AS n_b
    FROM pairs p JOIN sizes_c sa ON p.id_a = sa.doc_id
                 JOIN sizes_c sb ON p.id_b = sb.doc_id
    WHERE p.inter * 10 >= 3 * (sa.n + sb.n)
    """,
    tags=("dedup", "scale-knob"),
)
def dedup_capped(spark, sf_dir):
    """N-gram jaccard over FREQUENCY-CAPPED shingle sets (shingles in >50
    docs dropped first; jaccard over the survivors — the df-filter idea).
    Runs the prefix-filtered AllPairs plan on the capped universe, so a
    boilerplate cluster contributes no candidates at all (exact dedup's
    job), and replica cliques stay bounded by rare-shingle collisions —
    sub-quadratic on dup-heavy corpora (bench stress_dup section).  The
    oracle mirrors the same two-stage definition with the naive join
    (plan-independent answer, threshold 3/7)."""
    return dedup.ngram_jaccard_pairs_prefix_capped(
        t(spark, sf_dir, "documents"),
        threshold_num=3, threshold_den=7, max_shingle_freq=50,
    )


@q(
    "dedup_embedding_neardup",
    """
    SELECT DISTINCT b.vec_id AS drop_id
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    tags=("dedup", "similarity"),
)
def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup dedup: drop every vector that has a
    lower-id neighbor above threshold (keep-first policy).  Runs on the
    vectorized block-GEMM path."""
    emb = t(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_pairs(emb, threshold=0.3)
    return pairs.select(F.col("id_b").alias("drop_id")).distinct()


@q(
    "text_stats_by_source",
    f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len({_DK_TOKS})) AS BIGINT) AS total_tokens,
           round(avg(len({_DK_TOKS})), 4) AS avg_tokens,
           count(DISTINCT lang) AS n_langs
    FROM documents GROUP BY source
    """,
    tags=("text", "agg"),
)
def text_stats(spark, sf_dir):
    """Corpus statistics rollup per source — the bookkeeping aggregation a
    training-data pipeline runs after filtering."""
    docs = t(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(text.tokenize("text")).cast("long")
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.count_distinct("lang").alias("n_langs"),
    )


@q(
    "text_vocab_build",
    f"""
    WITH tok AS (SELECT unnest({_DK_TOKS}) AS token FROM documents),
    v AS (SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token)
    SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS token_id
    FROM v WHERE cnt >= 3
    """,
    tags=("text", "vocab"),
)
def text_vocab_build_q(spark, sf_dir):
    """Frequency-ranked vocabulary over the corpus (min_count=3):
    contiguous ids assigned by a distributed prefix sum
    (`sampling.global_rank`), never a single-partition window — the
    oracle's `row_number() OVER (ORDER BY ...)` is the semantic twin but
    NOT the plan."""
    return text.vocab_build(t(spark, sf_dir, "documents"), min_count=3)


@q(
    "text_top_tokens_by_lang",
    f"""
    WITH tok AS (SELECT lang, unnest({_DK_TOKS}) AS token FROM documents),
    counts AS (SELECT lang, token, count(*) AS cnt FROM tok
               WHERE token <> '' GROUP BY lang, token)
    SELECT lang AS grp, token, cnt, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT lang, token, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rnk
      FROM counts) x
    WHERE rnk <= 10
    """,
    tags=("text", "topk"),
)
def text_top_tokens_q(spark, sf_dir):
    """Exact top-10 tokens per language — two-phase salted top-k (local
    top-k per hash bucket, final rank over <= 64*k survivors per group),
    so no group's full distinct-token set ever meets one task."""
    return text.top_tokens_by_group(t(spark, sf_dir, "documents"), "lang", k=10)


@q(
    "text_tfidf_keywords",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_DK_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> ''
           GROUP BY doc_id, token),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT doc_id, token, tf, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT t.doc_id, t.token, t.tf,
             row_number() OVER (PARTITION BY t.doc_id
               ORDER BY (t.tf * n.n_docs * 1000000) // d.df DESC, t.token) AS rnk
      FROM tf t JOIN dfreq d ON t.token = d.token CROSS JOIN n) x
    WHERE rnk <= 3
    """,
    tags=("text", "tfidf"),
)
def text_tfidf_q(spark, sf_dir):
    """Top-3 tf-idf keywords per document — linear idf ranked via scaled
    INTEGER division (log-idf's last-ulp float differences can flip ranks
    across engines; `tf*N*1e6 div df` is order-equivalent and exact)."""
    return text.tfidf_keywords(t(spark, sf_dir, "documents"), k=3)


@q(
    "w_moving_avg_range",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS avg_1h,
           count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h
    FROM events
    """,
    tags=("window-fn", "range-frame"),
)
def w_moving_avg(spark, sf_dir):
    """Event-time moving average: RANGE frame over the trailing hour per
    user (epoch-microsecond order keys — integer-exact frame bounds in
    both engines; RANGE includes ts ties, so the frame is a set and
    ordering within ties can't change it)."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@q("sketch_hll_distinct", None, tags=("sketch", "approx"))
def sketch_hll(spark, sf_dir):
    """Approximate distinct-count sketch (HyperLogLog++) per event_type —
    the serving-layer cardinality path for A8-style tables at 100 TB
    (exact distinct needs a full shuffle of user ids; HLL is map-side
    mergeable).  Approximate → rows-only check; pytest bounds the error
    against exact counts."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("uu_approx"),
        F.count(F.lit(1)).alias("pv"),
    )


@q(
    "semi_join_exists",
    """
    SELECT o.o_orderkey
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    """,
    tags=("join", "semi"),
)
def semi_join(spark, sf_dir):
    """Left-semi join (EXISTS) — not in the reference (SURVEY §2.4), free
    via Catalyst; exposed as engine surface."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select("o_orderkey")


@q(
    "anti_join_not_exists",
    """
    SELECT c.c_custkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join", "anti"),
)
def anti_join(spark, sf_dir):
    """Left-anti join (NOT EXISTS) — customers with no urgent orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q("ann_ivf_topk", None, tags=("similarity", "ivf"))
def ann_ivf(spark, sf_dir):
    """IVF-bucketed ANN (coarse quantizer + nprobe cells) — the second
    scale path beside LSH.  Rows-only; pytest measures recall."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb.filter(F.col("vec_id") % 25 == 0), emb, k=5)


@q(
    "ts_gap_fill_hourly",
    """
    WITH c AS (SELECT event_type, date_trunc('hour', ts) AS b, count(*) AS n
               FROM events GROUP BY event_type, date_trunc('hour', ts)),
    s AS (SELECT event_type, min(b) AS mn, max(b) AS mx FROM c GROUP BY event_type),
    h AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS b FROM s)
    SELECT h.event_type AS event_type,
           strftime(h.b, '%Y-%m-%d %H:%M:%S') AS bucket_s,
           coalesce(c.n, 0) AS n
    FROM h LEFT JOIN c ON h.event_type = c.event_type AND h.b = c.b
    """,
    tags=("timeseries", "gap-fill"),
)
def ts_gap_fill_q(spark, sf_dir):
    """Time-series gap fill: hourly event counts per type with missing
    buckets zero-filled between each type's first and last hour.  The
    bucket spine is generated per key from a tiny per-key min/max
    aggregate (`sequence` + explode) — never a driver-side calendar —
    and the fill is one keyed left join."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("b")
    )
    c = ev.groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("n"))
    s = c.groupBy("event_type").agg(F.min("b").alias("mn"), F.max("b").alias("mx"))
    h = s.select(
        "event_type",
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("b"),
    )
    return (
        h.join(c, ["event_type", "b"], "left")
        .select(
            "event_type",
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@q(
    "grouping_sets_mixed",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           round(sum(l_quantity), 2) AS qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets"),
)
def grouping_sets_q(spark, sf_dir):
    """Explicit GROUPING SETS (neither a rollup nor a cube: per-flag,
    per-status, and grand-total rows in ONE pass over the fact table —
    three aggregations for one scan+shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "qty",
            "n",
        )
    )


@q(
    "rollup_revenue",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           round(sum(l_extendedprice), 2) AS base_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def rollup_q(spark, sf_dir):
    """ROLLUP grouping sets — hierarchical totals in one pass (engine
    surface beyond the reference; Catalyst expands to grouping sets)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("base_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "base_price",
            "n",
        )
    )


@q(
    "pivot_event_counts",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           count(*) FILTER (event_type = 'click')    AS click_ct,
           count(*) FILTER (event_type = 'view')     AS view_ct,
           count(*) FILTER (event_type = 'purchase') AS purchase_ct,
           count(*) FILTER (event_type = 'signup')   AS signup_ct,
           count(*) FILTER (event_type = 'error')    AS error_ct
    FROM events GROUP BY 1
    """,
    tags=("agg", "pivot"),
)
def pivot_q(spark, sf_dir):
    """Pivot (conditional aggregation): per-day event-type count matrix."""
    ev = t(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == et, 1)).alias(f"{et}_ct")
        for et in ("click", "view", "purchase", "signup", "error")
    ]
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt")).agg(*aggs)


@q(
    "percentiles_by_segment",
    """
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.5), 4)  AS p50,
           round(quantile_cont(c_acctbal, 0.9), 4)  AS p90,
           round(quantile_cont(c_acctbal, 0.99), 4) AS p99
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg", "percentile"),
)
def percentiles_q(spark, sf_dir):
    """Exact interpolated percentiles per segment (Spark `percentile` ==
    DuckDB `quantile_cont`, both exact linear interpolation)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(c_acctbal, 0.99)"), 4).alias("p99"),
    )


# --------------------------------------------------------------------------
# Corpus management — deterministic splits / stratified sampling / histograms
# (operators/sampling.py; every op is a narrow hash map or one agg shuffle)
# --------------------------------------------------------------------------

@q(
    "sample_split_assign",
    """
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN substr(md5('split:' || COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 4) < 'e666'
                  THEN 'train'
                  WHEN substr(md5('split:' || COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 4) < 'f333'
                  THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, count(*) AS n_docs, CAST(min(doc_id) AS BIGINT) AS min_id
    FROM assigned GROUP BY split
    """,
    tags=("sampling", "corpus"),
)
def sample_split_q(spark, sf_dir):
    """Deterministic hash train/val/test split (90/5/5): assignment is a
    pure narrow map on md5(key) — stable across runs/partitioning, unlike
    randomSplit — then one count shuffle for the audit rollup."""
    from ..operators import sampling

    docs = sampling.split_assign(t(spark, sf_dir, "documents"))
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_id")
    )


@q(
    "sample_stratified",
    """
    SELECT lang, count(*) AS n_kept
    FROM documents
    WHERE substr(md5('sample:' || COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 4) <
          CASE WHEN lang = 'en' THEN '4000'
               WHEN lang = 'de' THEN '8000'
               ELSE 'zzzz' END
    GROUP BY lang
    """,
    tags=("sampling", "corpus"),
)
def sample_stratified_q(spark, sf_dir):
    """Deterministic stratified downsample (cap en at 25%, de at 50%, keep
    the rest) — the rebalancing step between dedup and training; a pure
    narrow filter at any corpus size."""
    from ..operators import sampling

    kept = sampling.stratified_sample(
        t(spark, sf_dir, "documents"), "lang",
        {"en": 0.25, "de": 0.5}, default_frac=1.0,
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@q(
    "corpus_length_histogram",
    """
    SELECT CAST(floor(length(text) / 100) AS BIGINT) * 100 AS bin,
           count(*) AS doc_ct
    FROM documents GROUP BY bin
    """,
    tags=("sampling", "corpus"),
)
def length_hist_q(spark, sf_dir):
    """Character-length histogram (100-char bins) — the distribution check
    behind min/max-length quality filters; one partial-agg shuffle."""
    from ..operators import sampling

    return sampling.length_histogram(t(spark, sf_dir, "documents"))


@q(
    "asof_join_attribution",
    """
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    purch AS (
      SELECT user_id, ts, event_id, round(value, 4) AS value_r
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           epoch_ms(p.ts) AS p_ts_ms, p.value_r AS value_r,
           c.click_id AS click_id, epoch_ms(c.ts) AS click_ts_ms
    FROM purch p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def asof_join_q(spark, sf_dir):
    """As-of join (attribution): each purchase matched to the user's
    latest click at-or-before it — joins.asof_join's union+carry-forward
    plan vs DuckDB's native ASOF JOIN.  Right side pre-deduped per
    (user, ts) so tie-breaks are well-defined in both engines."""
    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.round("value", 4).alias("value_r"),
    )
    res = joins.asof_join(purch, clicks, on="user_id")
    return res.select(
        "purchase_id", "user_id",
        F.unix_millis("ts").alias("p_ts_ms"),
        "value_r", "click_id",
        F.unix_millis("ts_asof").alias("click_ts_ms"),
    )


@q(
    "correlated_subquery_above_avg",
    """
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                       WHERE c2.c_mktsegment = c.c_mktsegment)
    """,
    tags=("sql", "subquery"),
)
def correlated_subquery_q(spark, sf_dir):
    """Correlated scalar subquery — the IDENTICAL SQL text runs on both
    engines; Catalyst decorrelates it into an aggregate + join (no
    per-row re-execution), covering the SQL-surface area the reference
    leaves to flink-table-planner (SURVEY §4)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                           WHERE c2.c_mktsegment = c.c_mktsegment)
        """
    )


@q(
    "cube_order_counts",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS st,
           coalesce(o_orderpriority, 'ALL') AS pri,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def cube_q(spark, sf_dir):
    """CUBE grouping sets — every dimension combination in one pass
    (Catalyst expands to grouping sets; completes the ROLLUP/CUBE
    multidimensional surface)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
            "n", "total",
        )
    )


# ===========================================================================
# DC — dedup clustering + curation pipeline (the end of the dedup story:
# pairs are an intermediate; what a 100 TB curation run materializes is a
# per-document component + keep flag, then a cleaned corpus)
# ===========================================================================

_DK_NEARDUP_PAIRS = """
, jp AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2),
  np AS (
    SELECT p.id_a, p.id_b
    FROM jp p JOIN sizes sa ON p.id_a = sa.doc_id
              JOIN sizes sb ON p.id_b = sb.doc_id
    WHERE p.inter * 3 >= (sa.n + sb.n)),
  e AS (SELECT id_a AS u, id_b AS v FROM np
        UNION SELECT id_b, id_a FROM np),
  reach(u, r) AS (
    SELECT u, u FROM e
    UNION
    SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u),
  comp AS (SELECT u AS doc_id, min(r) AS component FROM reach GROUP BY u)
"""


@q(
    "dedup_components_keep",
    _DK_SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + _DK_NEARDUP_PAIRS
    + """
    SELECT d.doc_id AS doc_id,
           coalesce(c.component, d.doc_id) AS component,
           CAST(coalesce(c.component, d.doc_id) = d.doc_id AS INT) AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """,
    tags=("dedup", "graph"),
)
def dedup_components_q(spark, sf_dir):
    """Near-dup clustering: connected components over the jaccard pair
    graph (distributed hash-min label propagation, dedup.py) and the
    min-id keep flag per component — every document labeled, singletons
    their own component.  The oracle mirrors the closure with a recursive
    CTE (exact for the test graph; the Spark plan is the one that scales)."""
    docs = t(spark, sf_dir, "documents")
    return dedup.dedup_keep_list(docs, dedup.ngram_jaccard_pairs_prefix(docs))


@q(
    "dedup_keep_best_quality",
    _DK_SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + _DK_NEARDUP_PAIRS
    + """
    , q AS (SELECT doc_id,
                   len(string_split_regex(lower(trim(text)), '\\s+')) AS nt
            FROM documents),
    eff AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
                   q.nt
            FROM documents d JOIN q USING (doc_id)
            LEFT JOIN comp c ON d.doc_id = c.doc_id)
    SELECT doc_id, component,
           CAST(row_number() OVER (PARTITION BY component
                                   ORDER BY nt DESC, doc_id) = 1 AS INT)
             AS keep
    FROM eff
    """,
    tags=("dedup", "graph", "curation"),
    scale_contract=(
        "exact-reference: the pair stage is the uncapped AllPairs "
        "jaccard — at the r10 sf10 ladder probe (500k docs) its "
        "candidate shuffle spilled >50 GB and was aborted, the same "
        "measured failure mode as the uncapped pretrain pipeline; "
        "r9's 0.97 exponent held only to sf1 — plan of record at "
        "scale: dedup_keep_best_capped (sf10-measured in r11: "
        "exp_last10 0.941, BENCH_SCALE.json sf10 section)"
    ),
)
def dedup_keep_best_q(spark, sf_dir):
    """Quality-aware near-dup retention (dedup.keep_best_list): per
    component keep the member with the MOST tokens (ties to the smaller
    id) — the policy real pretraining dedup uses, where the longest
    copy survives and truncated variants drop — instead of the
    arbitrary min-id representative.  One components pass + one narrow
    token-count projection + one window ranked WITHIN components (never
    corpus-sized partitions).  Oracle: the recursive-CTE closure plus
    the same ranking window.  EXACTNESS REFERENCE: the pair stage here
    is the UNCAPPED AllPairs jaccard — see ``scale_contract`` and
    ``dedup_keep_best_capped`` (the plan of record at scale —
    sf10-measured in r11 at exp_last10 0.941, BENCH_SCALE.json)."""
    docs = t(spark, sf_dir, "documents")
    # r12: the pair stage runs the prefix-filtered AllPairs plan —
    # identical output to the naive inverted-index self-join (the oracle
    # mirrors the naive form; equality-tested), measured 0.52x here in
    # canary-gated paired runs, same swap dedup_ngram_jaccard made in r8
    return dedup.keep_best_list(docs, dedup.ngram_jaccard_pairs_prefix(docs))


@q(
    "dedup_keep_best_capped",
    _DK_SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , freq AS (SELECT shingle FROM inv GROUP BY shingle
               HAVING count(*) <= 50),
    inv_c AS (SELECT inv.doc_id, inv.shingle
              FROM inv JOIN freq USING (shingle)),
    sizes_c AS (SELECT doc_id, count(*) AS n FROM inv_c GROUP BY doc_id),
    jp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM inv_c a JOIN inv_c b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    np AS (
      SELECT p.id_a, p.id_b
      FROM jp p JOIN sizes_c sa ON p.id_a = sa.doc_id
                JOIN sizes_c sb ON p.id_b = sb.doc_id
      WHERE p.inter * 3 >= (sa.n + sb.n)),
    e AS (SELECT id_a AS u, id_b AS v FROM np
          UNION SELECT id_b, id_a FROM np),
    reach(u, r) AS (
      SELECT u, u FROM e
      UNION
      SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u),
    comp AS (SELECT u AS doc_id, min(r) AS component FROM reach GROUP BY u),
    q AS (SELECT doc_id,
                 len(string_split_regex(lower(trim(text)), '\\s+')) AS nt
          FROM documents),
    eff AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
                   q.nt
            FROM documents d JOIN q USING (doc_id)
            LEFT JOIN comp c ON d.doc_id = c.doc_id)
    SELECT doc_id, component,
           CAST(row_number() OVER (PARTITION BY component
                                   ORDER BY nt DESC, doc_id) = 1 AS INT)
             AS keep
    FROM eff
    """,
    tags=("dedup", "graph", "curation", "scale-knob"),
)
def dedup_keep_best_capped_q(spark, sf_dir):
    """``dedup_keep_best_quality`` with the df-CAPPED pair stage
    (shingles in >50 docs dropped, jaccard 1/2 over the survivors —
    ``dedup_ngram_capped``'s semantics feeding the same components pass
    and quality window): the 100 TB plan of record for quality-aware
    retention.  Added in r10 after the sf10 ladder probe showed the
    uncapped entry's AllPairs candidate stage spilling >50 GB at 500k
    docs (the same measured failure mode as the uncapped pretrain
    pipeline) — r9's linear 0.97 exponent held only to sf1, where fixed
    overhead still masked the candidate growth.  The oracle mirrors the
    capped two-stage definition with the naive join + recursive-CTE
    closure + the identical ranking window."""
    docs = t(spark, sf_dir, "documents")
    return dedup.keep_best_list(
        docs,
        dedup.ngram_jaccard_pairs_prefix_capped(
            docs, threshold_num=1, threshold_den=2, max_shingle_freq=50
        ),
    )


@q(
    "dedup_components_star",
    _DK_SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + _DK_NEARDUP_PAIRS
    + """
    SELECT doc_id, component FROM comp
    """,
    tags=("dedup", "graph"),
)
def dedup_components_star_q(spark, sf_dir):
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al.) — O(log n) rounds vs hash-min's
    diameter rounds, for adversarial chain-shaped near-dup graphs.
    Same answer as `dedup_components_keep`'s propagation (components are
    algorithm-independent), checked against the same recursive-CTE
    closure; a 120-node chain golden lives in tests/test_operators.py."""
    docs = t(spark, sf_dir, "documents")
    return dedup.connected_components_star(dedup.ngram_jaccard_pairs_prefix(docs))


@q(
    "pipeline_corpus_clean",
    _DK_SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + _DK_NEARDUP_PAIRS
    + f"""
    , q AS (
        SELECT doc_id, lang, source, {_DK_TOKS} AS tk, length(text) AS nc,
               md5(list_aggregate({_DK_TOKS}, 'string_agg', ' ')) AS fp
        FROM documents),
      quality AS (
        SELECT doc_id, lang, source, len(tk) AS n_tokens, fp FROM q
        WHERE len(tk) >= 10 AND (nc - (len(tk) - 1)) / len(tk) >= 3),
      exact_keep AS (
        SELECT min(doc_id) AS doc_id FROM quality GROUP BY fp),
      near_keep AS (
        SELECT d.doc_id FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        WHERE coalesce(c.component, d.doc_id) = d.doc_id)
    SELECT q.doc_id AS doc_id, q.lang AS lang, q.source AS source,
           q.n_tokens AS n_tokens
    FROM quality q
    JOIN exact_keep ek ON q.doc_id = ek.doc_id
    JOIN near_keep nk ON q.doc_id = nk.doc_id
    """,
    tags=("pipeline", "dedup", "text"),
)
def corpus_clean_q(spark, sf_dir):
    """The composed training-data curation pipeline over the corpus:
    quality gate → exact dedup (min-id per fingerprint) → near-dup drop
    (component keep-list) — one declarative plan; Catalyst shares the
    document scan and the dedup stages run exactly as their standalone
    queries do.  Output: the surviving documents with metadata."""
    docs = t(spark, sf_dir, "documents")
    quality = (
        text.quality_features(docs)
        .filter(F.col("is_quality") == 1)
        .select("doc_id", "lang", "source", F.col("n_tokens").cast("long").alias("n_tokens"), "text")
    )
    exact_keep = dedup.exact_dedup(quality).select(F.col("keep_id").alias("doc_id"))
    near_keep = dedup.dedup_keep_list(docs, dedup.ngram_jaccard_pairs_prefix(docs)).filter(
        F.col("keep") == 1
    ).select("doc_id")
    return (
        quality.join(exact_keep, "doc_id")
        .join(near_keep, "doc_id")
        .select("doc_id", "lang", "source", "n_tokens")
    )


@q(
    "w_session_window",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM g)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    tags=("window", "session"),
)
def session_window_q(spark, sf_dir):
    """Session windows (gap 30 min) per user — native F.session_window
    (merging event-time sessions; works identically over a stream with a
    watermark).  The oracle is the classic gaps-and-islands SQL; the gap
    boundary is exclusive on both sides (a gap of exactly 30 min starts a
    new session), matching Spark's [start, last+gap) window."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


@q("ann_ivf_index_topk", None, tags=("similarity", "ivf", "index"))
def ann_ivf_index_q(spark, sf_dir):
    """Materialized IVF index probe: cell-PARTITIONED parquet layout +
    sidecar centroids; probes read only their nprobe cells' partition
    directories (PartitionFilters — plan-tested).  The 100 TB ANN layout:
    the index is written once, probes touch nprobe/n_cells of storage."""
    import tempfile

    emb = t(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
    similarity.ivf_index_write(emb, idx, n_cells=16)
    probes = emb.filter(F.col("vec_id") % 25 == 0)
    return similarity.ivf_index_topk(spark, probes, idx, k=5, nprobe=4)


def _neardup_oracle(
    num_perm: int = 16, band_size: int = 4, cap: int = 50,
    threshold_num: int = 1, threshold_den: int = 2,
) -> str:
    """DuckDB twin of the TWO-BATCH stateful ingestion filter: batch-1
    in-batch dedup → accepted index → batch-2 history probe + in-batch
    dedup.  Every stage (md5 minhash, banded buckets, per-band salted
    cap, signature-match estimate) is deterministic, so even the keyed
    STATE transition is value-checked — rare for a stateful streaming
    operator."""
    sigs = ",\n           ".join(
        f"min(substr(md5('p{i // 4}:' || shingle), {1 + 8 * (i % 4)}, 8)) AS mh{i}"
        for i in range(num_perm)
    )
    n_bands = num_perm // band_size

    def band_selects(src: str) -> str:
        return "\n      UNION ALL ".join(
            "SELECT doc_id, {bi} AS band, md5({expr}) AS bucket FROM {src}".format(
                bi=bi,
                expr=" || '|' || ".join(
                    f"mh{bi * band_size + j}" for j in range(band_size)
                ),
                src=src,
            )
            for bi in range(n_bands)
        )

    def capped(src: str) -> str:
        return f"""SELECT doc_id, band,
            bucket || '#' || CAST((row_number() OVER (
                PARTITION BY band, bucket
                ORDER BY md5(CAST(band AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), doc_id
            ) - 1) // {cap} AS VARCHAR) AS bucket FROM {src}"""

    est = (
        "("
        + " + ".join(
            f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
            for i in range(num_perm)
        )
        + f") * {threshold_den} >= {threshold_num} * {num_perm}"
    )
    return (
        _DK_SHINGLES
        + f"""
    , sig AS (SELECT doc_id, {sigs} FROM inv GROUP BY doc_id),
    b1sig AS (SELECT * FROM sig WHERE doc_id % 2 = 0),
    b2sig AS (SELECT * FROM sig WHERE doc_id % 2 = 1),
    bands1_raw AS ({band_selects('b1sig')}),
    bands2_raw AS ({band_selects('b2sig')}),
    bands1 AS ({capped('bands1_raw')}),
    bands2 AS ({capped('bands2_raw')}),
    p1 AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM bands1 a JOIN bands1 b
             ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    m1 AS (SELECT p.id_b AS doc_id, min(p.id_a) AS m
           FROM p1 p JOIN sig sa ON p.id_a = sa.doc_id
                     JOIN sig sb ON p.id_b = sb.doc_id
           WHERE {est} GROUP BY p.id_b),
    dec1 AS (SELECT s.doc_id, m1.m AS matched_id
             FROM b1sig s LEFT JOIN m1 ON s.doc_id = m1.doc_id),
    acc1 AS (SELECT doc_id FROM dec1 WHERE matched_id IS NULL),
    idx AS (SELECT b.doc_id, b.band, b.bucket
            FROM bands1_raw b JOIN acc1 USING (doc_id)),
    cand2 AS (SELECT DISTINCT b2.doc_id, i.doc_id AS old_id
              FROM bands2_raw b2 JOIN idx i
                ON b2.band = i.band AND b2.bucket = i.bucket),
    h2 AS (SELECT c.doc_id, min(c.old_id) AS hm
           FROM cand2 c JOIN sig sa ON c.doc_id = sa.doc_id
                        JOIN sig sb ON c.old_id = sb.doc_id
           WHERE {est} GROUP BY c.doc_id),
    p2 AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM bands2 a JOIN bands2 b
             ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    m2 AS (SELECT p.id_b AS doc_id, min(p.id_a) AS m
           FROM p2 p JOIN sig sa ON p.id_a = sa.doc_id
                     JOIN sig sb ON p.id_b = sb.doc_id
           WHERE {est} GROUP BY p.id_b),
    dec2 AS (SELECT s.doc_id, coalesce(h2.hm, m2.m) AS matched_id
             FROM b2sig s LEFT JOIN h2 ON s.doc_id = h2.doc_id
                          LEFT JOIN m2 ON s.doc_id = m2.doc_id),
    alldec AS (SELECT * FROM dec1 UNION ALL SELECT * FROM dec2)
    SELECT doc_id, matched_id,
           CASE WHEN matched_id IS NULL THEN 1 ELSE 0 END AS accepted
    FROM alldec
    """
    )


@q(
    "streaming_neardup_decisions",
    _neardup_oracle(),
    tags=("streaming", "dedup", "stateful"),
)
def streaming_neardup_q(spark, sf_dir):
    """Ingestion-time near-dup filter (streaming/neardup.py): documents
    fed as two micro-batches (doc_id parity) through the stateful LSH
    index; returns the per-doc accept/reject decisions.  The md5-based
    pipeline is fully deterministic, so the DuckDB oracle replays BOTH
    batches including the state transition — the accept/reject decisions
    and witness ids are value-checked, not just row-counted.  Replay /
    hot-cluster / cross-batch goldens live in tests/test_streaming.py."""
    import tempfile

    from ..streaming.neardup import StreamingNearDup

    docs = t(spark, sf_dir, "documents")
    nd = StreamingNearDup(tempfile.mkdtemp(prefix="neardup_") + "/state")
    d1 = nd.process_batch(docs.filter(F.col("doc_id") % 2 == 0), spark)
    d2 = nd.process_batch(docs.filter(F.col("doc_id") % 2 == 1), spark)
    return d1.unionByName(d2)


