"""Association mining: item co-occurrence within baskets, with
support / lift statistics.

The market-basket tier of the serving layer (which parts sell together,
which pages co-occur in a session) — and, in a training-data pipeline,
the co-occurrence statistics behind PMI-style phrase/entity association.

Distributed shape: the pair generation is a self-equi-join on the basket
key, so its fan-out is Σ k_b² over basket sizes — bounded by
``max_items_per_basket`` (deterministic md5-ordered truncation, the same
hot-group pattern as the LSH ``max_bucket_size`` and CEP anchor caps) so
one pathological basket can't go quadratic.  All counts are exact
integers; ratios are rounded at the end only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _basket_items(
    df: DataFrame, basket: str, item: str, max_items_per_basket: int | None
) -> DataFrame:
    bi = df.select(F.col(basket).alias("b"), F.col(item).alias("i")).distinct()
    if max_items_per_basket is not None:
        w = Window.partitionBy("b").orderBy(F.md5(F.col("i").cast("string")), "i")
        bi = (
            bi.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_items_per_basket)
            .drop("__rn")
        )
    return bi


def _pairs_of(bi: DataFrame, min_pair_count: int) -> DataFrame:
    """Pair aggregation over a prebuilt (b, i) basket-item table."""
    a = bi.withColumnRenamed("i", "item_a")
    b = bi.withColumnRenamed("i", "item_b")
    return (
        a.join(b, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_pair_count)
    )


def cooccurrence_pairs(
    df: DataFrame,
    *,
    basket: str,
    item: str,
    min_pair_count: int = 2,
    max_items_per_basket: int | None = None,
) -> DataFrame:
    """(item_a, item_b, pair_cnt) for unordered item pairs co-occurring
    in a basket (item_a < item_b; items deduped per basket) — the pair
    core without the support/lift statistics, for consumers that only
    need the edge list (e.g. graph.triangle_count).

    The basket-item table is materialized once (lazy localCheckpoint,
    r13): the self-join otherwise re-executes the distinct (and the
    upstream scan) for BOTH sides."""
    bi = _basket_items(df, basket, item, max_items_per_basket).localCheckpoint(
        eager=False
    )
    return _pairs_of(bi, min_pair_count)


def basket_pairs(
    df: DataFrame,
    *,
    basket: str,
    item: str,
    min_pair_count: int = 2,
    max_items_per_basket: int | None = None,
) -> DataFrame:
    """(item_a, item_b, pair_cnt, support, lift) for unordered item pairs
    co-occurring in a basket (item_a < item_b; items deduped per basket).

    support = pair_cnt / n_baskets;
    lift    = P(a,b) / (P(a)·P(b)) = pair_cnt·n_baskets / (cnt_a·cnt_b),
    both over the (possibly truncated) basket-item universe, so the
    definition stays internally consistent under the cap.
    """
    # ONE basket-item table serves all four consumers (r13): the former
    # plan derived it independently for the basket count (an eager job),
    # the item counts, and both sides of the pair self-join — four
    # executions of the distinct + upstream scan.  The count() job below
    # materializes the lazy checkpoint as a side effect.
    bi = _basket_items(df, basket, item, max_items_per_basket).localCheckpoint(
        eager=False
    )
    n_baskets = bi.select("b").distinct().count()
    item_cnt = bi.groupBy("i").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = _pairs_of(bi, min_pair_count)
    return (
        pairs.join(item_cnt.withColumnRenamed("i", "item_a").withColumnRenamed("cnt", "cnt_a"), "item_a")
        .join(item_cnt.withColumnRenamed("i", "item_b").withColumnRenamed("cnt", "cnt_b"), "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            F.round(F.col("pair_cnt") / F.lit(n_baskets), 6).alias("support"),
            F.round(
                F.col("pair_cnt") * F.lit(n_baskets)
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )
