"""Additional TPC-H query shapes (the general analytics surface beyond
the headline bench set): q2/q4/q7..q22 with integer-exact money
arithmetic where float rounding would diverge between engines."""

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
# Q — additional TPC-H query shapes (general analytics surface beyond the
# reference's parity set: semi-join EXISTS, conditional aggregation,
# HAVING over grouped sums)
# ===========================================================================

@q(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "semijoin"),
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (the synthetic lineitem carries only l_shipdate, so
    'late' = shipped 60+ days after order): correlated EXISTS with a
    non-equi conjunct, decorrelated to a left-semi join; pure integer
    counts (no float rounding surface)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1995-01-01")
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@q(
    "tpch_q12_priority_lines",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
    GROUP BY l_returnflag
    """,
    tags=("tpch",),
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (per-flag high/low priority line counts): join +
    conditional integer aggregation; the lineitem date filters push to
    the parquet scan."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    o = t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@q(
    "tpch_q14_promo_revenue",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 4) AS promo_revenue,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
    """,
    tags=("tpch",),
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promo revenue): numerator and denominator emitted
    separately, each rounded at the disc-price quantization (4-dec) —
    a cross-engine float ratio has no stable rounding level."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0)), 4
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
        )
    )


@q(
    "tpch_q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 250
    """,
    tags=("tpch", "having"),
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): grouped HAVING over the
    3-way join; quantity sums rounded at the 2-dec money quantization."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.sum("l_quantity") > 250)
    )


@q(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INTEGER) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier s JOIN lineitem l ON s_suppkey = l_suppkey
            JOIN orders o ON o_orderkey = l_orderkey
            JOIN customer c ON c_custkey = o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31') v
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join"),
)
def tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping between two nations): the nation-name
    filter lands INSIDE the two broadcast dims, so supplier/customer
    shrink to 2/25 nations before touching the fact tables; only the
    cross-pair predicate is evaluated post-join."""
    pair = ("NATION_1", "NATION_2")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    o = t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@q(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END), 4) AS nation_volume,
           round(sum(volume), 4) AS total_volume
    FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation
          FROM part p JOIN lineitem l ON p_partkey = l_partkey
            JOIN supplier s ON s_suppkey = l_suppkey
            JOIN orders o ON l_orderkey = o_orderkey
            JOIN customer c ON o_custkey = c_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31') v
    GROUP BY o_year
    """,
    tags=("tpch", "join"),
)
def tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (market share of NATION_3 suppliers in ASIA's
    ECONOMY-part market): numerator/denominator emitted separately at the
    4-dec disc-price quantization (a float ratio has no stable
    cross-engine rounding).  All five dims broadcast; the only shuffles
    are lineitem⋈orders and the final tiny groupBy."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n1 = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    li = t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0)), 4).alias("nation_volume"),
            F.round(F.sum(vol), 4).alias("total_volume"),
        )
    )


@q(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    """,
    tags=("tpch", "join"),
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 (revenue lost to returned items, per customer): the
    quarter filter prunes orders at the scan, returnflag prunes lineitem;
    nation broadcasts.  Full grouped output (the spec's LIMIT 20 by
    revenue is tie-unstable across engines, so sorting is left to the
    consumer)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@q(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) co
    GROUP BY c_count
    """,
    tags=("tpch", "outerjoin"),
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with a predicate in the JOIN condition (not WHERE — zero-order
    customers must survive), double aggregation.  The synthetic orders
    carry no o_comment, so the not-like filter becomes a priority
    exclusion; same join-conditional shape."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@q(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("tpch", "subquery"),
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier by quarterly revenue): the revenue CTE is
    computed once; its global max is a 1-row aggregate joined back via
    broadcast — never a single-partition window.  Equality compares
    values rounded at the 4-dec quantization, stable in both engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@q(
    "tpch_q17_small_qty_revenue",
    """
    WITH pq AS (
      SELECT l_partkey AS pk, count(*) AS cnt,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qsum
      FROM lineitem GROUP BY l_partkey)
    SELECT round(sum(l_extendedprice), 2) AS small_qty_base
    FROM lineitem JOIN part ON p_partkey = l_partkey JOIN pq ON pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(round(l_quantity * 100) AS BIGINT) * 5 * cnt < qsum
    """,
    tags=("tpch", "subquery"),
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 shape (revenue from small-quantity lines vs the
    part's average): the correlated `l_quantity < 0.2 * avg(...)` is
    rewritten integer-exact — quantities are 2-dec quantized, so
    `100*qty * 5 * cnt < sum(100*qty)` ⟺ qty < avg/5 with zero float
    boundary risk in either engine.  A part belongs to exactly one
    brand, so lineitem is semi-filtered to the brand's parts FIRST and
    the per-part stats aggregate only those lines — the broadcast stats
    table is bounded by one brand's part count (dim-scale), never the
    full partkey domain."""
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(qc).alias("qsum")
    )
    return (
        li.join(F.broadcast(pq), F.col("l_partkey") == F.col("pk"))
        .filter(qc * 5 * F.col("cnt") < F.col("qsum"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("small_qty_base"))
    )


@q(
    "tpch_q19_discounted_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch",),
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape (disjunction of brand/size/quantity clauses; the
    synthetic part has no p_container, so size ranges stand in).  The
    OR-of-conjunctions stays one JVM predicate post-join; Catalyst
    extracts the common-brand IN-list as a pushable pre-filter on the
    broadcast build side."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    clause = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(clause)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@q(
    "tpch_q21_suppliers_waiting",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey FROM lineitem l JOIN orders o ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
    SELECT s_name, count(*) AS numwait
    FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_1'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
    tags=("tpch", "semijoin", "antijoin"),
)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who alone were late on multi-supplier
    orders; no l_receiptdate/l_commitdate in the synthetic schema, so
    'late' = shipped >90 days after order date).  EXISTS → left-semi,
    NOT EXISTS → left-anti, both with a non-equi suppkey≠ conjunct on the
    orderkey shuffle; the NATION_1 supplier dim broadcasts."""
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    late = (
        li.join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select(F.col("l_orderkey").alias("lk"), F.col("l_suppkey").alias("sk"))
    )
    l1 = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.filter(F.col("o_orderstatus") == "F"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            late,
            (F.col("l_orderkey") == F.col("lk")) & (F.col("l_suppkey") != F.col("sk")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@q(
    "tpch_q22_dormant_customers",
    """
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (SELECT c_nationkey AS cntrycode, c_acctbal, c_custkey
          FROM customer
          WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
            AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                             WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= DATE '2000-01-01')) cc
    GROUP BY cntrycode
    """,
    tags=("tpch", "antijoin", "subquery"),
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (rich-but-dormant customers): every synthetic
    customer has orders, so 'never ordered' becomes 'no order since
    2000'; phone country codes don't exist, so c_nationkey stands in.
    Scalar-avg subquery → 1-row aggregate broadcast; NOT EXISTS →
    left-anti against the date-pruned orders scan."""
    nations = (1, 2, 3, 4, 5, 6, 7)
    c = t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(*nations))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    recent = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the synthetic testdata ships no partsupp table, so the
# five partsupp-dependent TPC-H queries (Q2/Q9/Q11/Q16/Q20) run over a
# deterministic relation derived from part × supplier-count with dbgen-style
# stride arithmetic: 4 suppliers per part at stride max(S/4, 1) — distinct
# within a part for any S ≥ 4 — and formula-valued availqty / supplycost
# (integer cents, so every threshold below stays integer-exact).  The same
# arithmetic is expressed once here for Spark and once in _PS_CTES for the
# DuckDB oracle, keeping all five queries fully hash-checkable.
# ---------------------------------------------------------------------------

_PS_CTES = """
    ps_base AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + i.i * greatest(sc.s_total // 4, 1)) % sc.s_total + 1 AS ps_suppkey
      FROM part,
           (SELECT count(*) AS s_total FROM supplier) sc,
           range(4) i(i)),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey * 7 + ps_suppkey * 131) % 9999 + 1 AS ps_availqty,
             (ps_partkey * 31 + ps_suppkey * 17) % 100000 AS ps_supplycost_cents
      FROM ps_base)
"""


def _partsupp(spark, sf_dir, part: DataFrame | None = None) -> DataFrame:
    """Derived partsupp (see _PS_CTES).  `part` lets callers pass an
    already-filtered part projection so the derived relation is built only
    over the parts a query touches — at 100 TB that keeps partsupp on the
    broadcast side whenever the part filter is selective, instead of
    materializing 4×|part| rows to shuffle.  Supplier count is a 1-row
    aggregate cross-joined in (broadcast), never a collected literal."""
    p = (part if part is not None else t(spark, sf_dir, "part")).select("p_partkey")
    s_cnt = t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("s_total"))
    idx = spark.range(4).select(F.col("id").alias("i"))
    stride = F.greatest(F.expr("s_total DIV 4"), F.lit(1))
    base = (
        p.crossJoin(F.broadcast(s_cnt))
        .crossJoin(F.broadcast(idx))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("i") * stride) % F.col("s_total") + 1).alias("ps_suppkey"),
        )
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 131) % 9999 + 1).alias("ps_availqty"),
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 100000).alias(
            "ps_supplycost_cents"
        ),
    )


@q(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH {_PS_CTES},
    eur AS (
      SELECT ps_partkey, ps_supplycost_cents, s_name, s_acctbal, n_name
      FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    mn AS (SELECT ps_partkey AS mk, min(ps_supplycost_cents) AS min_cost
           FROM eur GROUP BY ps_partkey)
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_brand,
           ps_supplycost_cents
    FROM part JOIN eur ON p_partkey = ps_partkey
         JOIN mn ON mk = p_partkey AND ps_supplycost_cents = min_cost
    WHERE p_size = 15 AND p_type = 'STANDARD'
    """,
    tags=("tpch", "subquery", "partsupp"),
)
def tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier; no p_mfgr/s_address in the synthetic
    schema, so the projection carries brand + acctbal instead).  The
    correlated min-cost subquery is a per-part MIN over the region-filtered
    partsupp joined back on (partkey, cost=min) — two shuffles on
    ps_partkey, dims broadcast.  Cost is integer cents: the min-equality
    join has zero float risk."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    eur = _partsupp(spark, sf_dir).join(
        F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey")
    ).select("ps_partkey", "ps_supplycost_cents", "s_name", "s_acctbal", "n_name")
    mn = eur.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost_cents").alias("min_cost")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    return (
        eur.join(mn, (F.col("ps_partkey") == F.col("mk"))
                 & (F.col("ps_supplycost_cents") == F.col("min_cost")))
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost_cents",
        )
    )


@q(
    "tpch_q9_product_type_profit",
    f"""
    WITH {_PS_CTES}
    SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     - ps_supplycost_cents
                       * CAST(round(l_quantity * 100) AS BIGINT)) / 10000.0,
                 2) AS sum_profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    """,
    tags=("tpch", "join", "partsupp"),
    bench=True,
)
def tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit by nation and year).  partsupp is
    derived from the '%gear%'-FILTERED part set, so the (partkey, suppkey)
    build side stays dim-scale and broadcasts; the only big shuffle is
    lineitem→orders on orderkey.  supplier/nation broadcast.  Profit is
    summed in fixed-point 1e-4 dollars (prices/discounts/quantities are
    2-dec quantized), so the sum is a bigint — no float accumulation-order
    drift between engines; the single final /1e4 division takes identical
    exact integers on both sides."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select("p_partkey")
    ps = _partsupp(spark, sf_dir, part=p)
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(ps),
        (F.col("l_partkey") == F.col("ps_partkey")) & (F.col("l_suppkey") == F.col("ps_suppkey")),
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ext100 = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc100 = F.round(F.col("l_discount") * 100).cast("long")
    qty100 = F.round(F.col("l_quantity") * 100).cast("long")
    profit_1e4 = ext100 * (100 - disc100) - F.col("ps_supplycost_cents") * qty100
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit_1e4) / 10000.0, 2).alias("sum_profit"))
    )


@q(
    "tpch_q11_important_stock",
    f"""
    WITH {_PS_CTES},
    nps AS (
      SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
      FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'),
    byp AS (SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents FROM nps GROUP BY ps_partkey),
    tot AS (SELECT sum(value_cents) AS t, count(*) AS npart FROM byp)
    SELECT ps_partkey, value_cents
    FROM byp, tot
    WHERE value_cents * npart > t
    """,
    tags=("tpch", "subquery", "partsupp"),
)
def tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock): per-part inventory value for one
    nation's suppliers, kept where above the nation-wide average share —
    an SF-invariant, integer-exact rewrite of the spec's fixed
    0.0001/SF fraction (value·npart > total ⟺ value > total/npart).
    The global total is a 1-row aggregate broadcast back; one shuffle on
    ps_partkey."""
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    nps = _partsupp(spark, sf_dir).join(
        F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey")
    ).select("ps_partkey", (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"))
    byp = nps.groupBy("ps_partkey").agg(F.sum("v").alias("value_cents"))
    tot = byp.agg(F.sum("value_cents").alias("t"), F.count(F.lit(1)).alias("npart"))
    return (
        byp.join(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("npart") > F.col("t"))
        .select("ps_partkey", "value_cents")
    )


@q(
    "tpch_q16_parts_supplier_relationship",
    f"""
    WITH {_PS_CTES}
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "antijoin", "partsupp"),
)
def tpch_q16(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship; the synthetic supplier has
    no s_comment, so 'complaint' suppliers = negative account balance).
    partsupp derives from the brand/type/size-filtered part set; the
    excluded-supplier list is a broadcast anti-join; the count-distinct
    shuffles once on the (brand, type, size) grouping key."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = _partsupp(spark, sf_dir, part=p)
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@q(
    "tpch_q20_part_promotion",
    f"""
    WITH {_PS_CTES},
    qty AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty100
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_partkey, l_suppkey),
    cand AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
        JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') pp
          ON pp.p_partkey = ps_partkey
        JOIN qty ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_availqty * 200 > qty100)
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN cand ON ps_suppkey = s_suppkey
    WHERE n_name IN ('NATION_6', 'NATION_7', 'NATION_9',
                     'NATION_11', 'NATION_14', 'NATION_19')
    """,
    tags=("tpch", "semijoin", "partsupp"),
)
def tpch_q20(spark, sf_dir):
    """TPC-H Q20 (suppliers with excess stock of promoted parts): availqty
    > half the year's shipped quantity for that (part, supplier).  The
    spec's correlated scalar sum is a grouped lineitem aggregate inner-
    joined on the composite key (NULL sum ⟹ excluded, matching the
    spec's NULL comparison); quantities are 2-dec quantized so the half
    threshold is the integer-exact availqty·200 > Σ(qty·100).  partsupp
    derives from the 'small%' part subset → broadcast; one shuffle for
    the lineitem group-by."""
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    qty = (
        t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qc).alias("qty100"))
    )
    pp = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    ps = _partsupp(spark, sf_dir, part=pp)
    cand = (
        qty.join(
            F.broadcast(ps),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") * 200 > F.col("qty100"))
        .select("ps_suppkey")
        .distinct()
    )
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_6", "NATION_7", "NATION_9", "NATION_11", "NATION_14", "NATION_19"
        )
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cand), F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@q(
    "pack_concat_chunk",
    f"""
    WITH toks AS (
      SELECT doc_id, CAST(len({_DK_TOKS}) AS BIGINT) AS n_tokens FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS start_off
      FROM toks)
    SELECT doc_id, n_tokens, start_off,
           start_off // 2048 AS chunk_id,
           (start_off + n_tokens - 1) // 2048 AS end_chunk_id
    FROM c
    """,
    tags=("packing", "pretraining"),
)
def pack_concat_chunk_q(spark, sf_dir):
    """Concat-and-chunk packing (GPT-style pretraining): documents
    concatenated in id order, cut into 2048-token chunks; each doc gets
    its global offset and chunk span.  Spark side is a DISTRIBUTED
    prefix sum (range partitions -> per-partition Arrow cumsum ->
    broadcast prefix offsets) — the oracle's single window cumsum is the
    semantic spec, not the scale plan."""
    docs = t(spark, sf_dir, "documents")
    with_tokens = docs.select("doc_id", text.token_count_ws("text").alias("n_tokens"))
    return sampling.concat_chunk_assign(with_tokens, 2048)


@q(
    "pack_sequences_nosplit",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
             CAST(len({_DK_TOKS}) AS BIGINT) AS n_tokens
      FROM documents),
    o AS (
      SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM toks),
    rec AS (
      SELECT doc_id, shard, n_tokens, rn,
             CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_off,
             n_tokens AS running
      FROM o WHERE rn = 1
      UNION ALL
      SELECT s.doc_id, s.shard, s.n_tokens, s.rn,
             CASE WHEN r.running + s.n_tokens > 96
                  THEN r.seq_id + 1 ELSE r.seq_id END,
             CASE WHEN r.running + s.n_tokens > 96
                  THEN CAST(0 AS BIGINT) ELSE r.running END,
             CASE WHEN r.running + s.n_tokens > 96
                  THEN s.n_tokens ELSE r.running + s.n_tokens END
      FROM o s JOIN rec r ON s.shard = r.shard AND s.rn = r.rn + 1)
    SELECT doc_id, shard, n_tokens, seq_id, seq_off,
           CAST(CASE WHEN n_tokens > 96 THEN 1 ELSE 0 END AS INT) AS overflow
    FROM rec
    """,
    tags=("packing", "pretraining", "sft"),
)
def pack_sequences_nosplit_q(spark, sf_dir):
    """No-split sequence packing (SFT / boundary-preserving): within each
    of 8 id-arithmetic shards, docs pack greedily into 96-token
    sequences; a doc never crosses a boundary, an over-long doc opens
    its own flagged sequence.  Spark side is ONE shard repartition +
    in-partition sort + one mapInPandas pass carrying per-shard
    (running, seq) state across Arrow batches; the oracle replays the
    same greedy rule as a per-shard recursive CTE in lockstep rn order
    (operators/sampling.py:pack_sequences_nosplit)."""
    docs = t(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", text.token_count_ws("text").alias("n_tokens")
    )
    return sampling.pack_sequences_nosplit(with_tokens, 96, n_shards=8)


@q(
    "pack_sequences_ffd",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
             CAST(len({_DK_TOKS}) AS BIGINT) AS n_tokens
      FROM documents),
    o AS (
      SELECT *, row_number() OVER (
               PARTITION BY shard ORDER BY n_tokens DESC, doc_id) AS rn
      FROM toks),
    rec AS (
      SELECT doc_id, shard, n_tokens, rn,
             CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_off,
             [CAST(96 - n_tokens AS BIGINT)] AS resids
      FROM o WHERE rn = 1
      UNION ALL
      SELECT doc_id, shard, n_tokens, rn,
             CASE WHEN fit IS NULL THEN CAST(len(resids) AS BIGINT)
                  ELSE CAST(fit - 1 AS BIGINT) END AS seq_id,
             CASE WHEN fit IS NULL THEN CAST(0 AS BIGINT)
                  ELSE CAST(96 - resids[fit] AS BIGINT) END AS seq_off,
             CASE WHEN fit IS NULL
                  THEN list_append(resids, CAST(96 - n_tokens AS BIGINT))
                  ELSE list_transform(
                         generate_series(1, CAST(len(resids) AS BIGINT)),
                         i -> CASE WHEN i = fit THEN resids[i] - n_tokens
                                   ELSE resids[i] END) END AS resids
      FROM (
        SELECT s.doc_id, s.shard, s.n_tokens, s.rn, r.resids,
               list_filter(generate_series(1, CAST(len(r.resids) AS BIGINT)),
                           i -> r.resids[i] >= s.n_tokens)[1] AS fit
        FROM o s JOIN rec r ON s.shard = r.shard AND s.rn = r.rn + 1
      ) z)
    SELECT doc_id, shard, n_tokens, seq_id, seq_off,
           CAST(CASE WHEN n_tokens > 96 THEN 1 ELSE 0 END AS INT) AS overflow
    FROM rec
    """,
    tags=("packing", "pretraining", "sft", "ffd"),
)
def pack_sequences_ffd_q(spark, sf_dir):
    """First-fit-decreasing no-split packing: within each shard, docs in
    (n_tokens DESC, doc_id) order go into the FIRST open 96-token
    sequence that fits, opening one only when none does — the standard
    padding-utilization win over the in-id-order greedy fill.  Spark
    side is the same one-repartition + in-partition-sort + mapInPandas
    shape with per-shard residual lists carried across Arrow batches;
    the oracle replays first-fit exactly as a per-shard recursive CTE
    carrying the residual LIST (operators/sampling.py:
    pack_sequences_ffd)."""
    docs = t(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", text.token_count_ws("text").alias("n_tokens")
    )
    return sampling.pack_sequences_ffd(with_tokens, 96, n_shards=8)


@q(
    "pack_efficiency_ffd",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
             CAST(len({_DK_TOKS}) AS BIGINT) AS n_tokens
      FROM documents),
    o AS (
      SELECT *, row_number() OVER (
               PARTITION BY shard ORDER BY n_tokens DESC, doc_id) AS rn
      FROM toks),
    rec AS (
      SELECT doc_id, shard, n_tokens, rn,
             CAST(0 AS BIGINT) AS seq_id,
             [CAST(96 - n_tokens AS BIGINT)] AS resids
      FROM o WHERE rn = 1
      UNION ALL
      SELECT doc_id, shard, n_tokens, rn,
             CASE WHEN fit IS NULL THEN CAST(len(resids) AS BIGINT)
                  ELSE CAST(fit - 1 AS BIGINT) END AS seq_id,
             CASE WHEN fit IS NULL
                  THEN list_append(resids, CAST(96 - n_tokens AS BIGINT))
                  ELSE list_transform(
                         generate_series(1, CAST(len(resids) AS BIGINT)),
                         i -> CASE WHEN i = fit THEN resids[i] - n_tokens
                                   ELSE resids[i] END) END AS resids
      FROM (
        SELECT s.doc_id, s.shard, s.n_tokens, s.rn, r.resids,
               list_filter(generate_series(1, CAST(len(r.resids) AS BIGINT)),
                           i -> r.resids[i] >= s.n_tokens)[1] AS fit
        FROM o s JOIN rec r ON s.shard = r.shard AND s.rn = r.rn + 1
      ) z),
    per_seq AS (
      SELECT shard, seq_id, count(*) AS n_docs, sum(n_tokens) AS seq_tokens,
             max(CASE WHEN n_tokens > 96 THEN 1 ELSE 0 END) AS overflow
      FROM rec GROUP BY 1, 2),
    agg AS (
      SELECT shard,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_seqs,
             CAST(sum(overflow) AS BIGINT) AS n_overflow_seqs,
             CAST(sum(seq_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN overflow = 0 THEN 96 - seq_tokens
                           ELSE 0 END) AS BIGINT) AS total_padding,
             sum(CASE WHEN overflow = 0 THEN 1 ELSE 0 END) AS n_full
      FROM per_seq GROUP BY shard)
    SELECT shard, n_docs, n_seqs, n_overflow_seqs, total_tokens,
           total_padding,
           CASE WHEN n_full > 0
                THEN round(total_padding / (n_full * 96), 4)
                ELSE 0.0 END AS padding_frac
    FROM agg
    """,
    tags=("packing", "pretraining", "report", "ffd"),
)
def pack_efficiency_ffd_q(spark, sf_dir):
    """Padding/utilization report over the FIRST-FIT-DECREASING packing
    — the comparison row a capacity plan reads next to
    pack_efficiency_report's greedy numbers (on this corpus at L=96:
    greedy 381 seqs / 26.5% padding vs FFD 305 / 7.5%).  The oracle
    replays the residual-list first-fit CTE and the same rollup
    (operators/sampling.py:pack_sequences_ffd + pack_efficiency)."""
    docs = t(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", text.token_count_ws("text").alias("n_tokens")
    )
    packed = sampling.pack_sequences_ffd(with_tokens, 96, n_shards=8)
    return sampling.pack_efficiency(packed, 96)


@q(
    "pack_efficiency_report",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
             CAST(len({_DK_TOKS}) AS BIGINT) AS n_tokens
      FROM documents),
    o AS (
      SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM toks),
    rec AS (
      SELECT doc_id, shard, n_tokens, rn,
             CAST(0 AS BIGINT) AS seq_id, n_tokens AS running
      FROM o WHERE rn = 1
      UNION ALL
      SELECT s.doc_id, s.shard, s.n_tokens, s.rn,
             CASE WHEN r.running + s.n_tokens > 96
                  THEN r.seq_id + 1 ELSE r.seq_id END,
             CASE WHEN r.running + s.n_tokens > 96
                  THEN s.n_tokens ELSE r.running + s.n_tokens END
      FROM o s JOIN rec r ON s.shard = r.shard AND s.rn = r.rn + 1),
    per_seq AS (
      SELECT shard, seq_id, count(*) AS n_docs, sum(n_tokens) AS seq_tokens,
             max(CASE WHEN n_tokens > 96 THEN 1 ELSE 0 END) AS overflow
      FROM rec GROUP BY 1, 2),
    agg AS (
      SELECT shard,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_seqs,
             CAST(sum(overflow) AS BIGINT) AS n_overflow_seqs,
             CAST(sum(seq_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN overflow = 0 THEN 96 - seq_tokens
                           ELSE 0 END) AS BIGINT) AS total_padding,
             sum(CASE WHEN overflow = 0 THEN 1 ELSE 0 END) AS n_full
      FROM per_seq GROUP BY shard)
    SELECT shard, n_docs, n_seqs, n_overflow_seqs, total_tokens,
           total_padding,
           CASE WHEN n_full > 0
                THEN round(total_padding / (n_full * 96), 4)
                ELSE 0.0 END AS padding_frac
    FROM agg
    """,
    tags=("packing", "pretraining", "report"),
)
def pack_efficiency_report_q(spark, sf_dir):
    """Padding/utilization report over the no-split packing — per shard:
    sequences, over-long singletons, total tokens, and the padding
    fraction of non-overflow capacity.  Two narrow aggregations over the
    packing result; the oracle replays the same greedy packing and the
    same rollup (operators/sampling.py:pack_efficiency)."""
    docs = t(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", text.token_count_ws("text").alias("n_tokens")
    )
    packed = sampling.pack_sequences_nosplit(with_tokens, 96, n_shards=8)
    return sampling.pack_efficiency(packed, 96)


