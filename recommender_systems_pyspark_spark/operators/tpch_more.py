"""TPC-H-style breadth queries (round 2): the decision-support shapes the
round-1 set didn't cover — EXISTS semi-join with a non-equi residual (Q4),
returned-items customer ranking (Q10), conditional-ratio aggregate (Q14),
scalar-subquery max selection (Q15), HAVING-gated self-aggregation join
(Q18), disjunctive multi-column pushdown (Q19), and scalar-subquery +
anti-join (Q22). Adapted to the fixture schema (no partsupp/shipmode
columns — TESTDATA.md's TPC-H-ish subset); the operator shapes, join
strategies, and plan considerations are the standard ones.

Scale notes mirror the classics in operators/relational.py: dimension
sides broadcast, fact-side predicates pushed to the scan, every LIMIT
carries a unique tiebreaker, every float aggregate is exact_sum/exact_avg
so partial-aggregation order can't shift results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import (
    exact_avg,
    exact_sum,
    query,
    sql_exact_avg,
    sql_exact_sum,
    ts_ntz,
)
from ..sources import tables


@query(
    "tpch_q4_style",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking: EXISTS decorrelates to a LEFT SEMI join
    whose condition carries a non-equi residual (l_shipdate > o_orderdate).
    The semi join shuffles on the equi key only; the residual evaluates
    per matched pair — no fact-side fan-out, output ≤ |orders|."""
    t = tables(spark, sf_dir)
    orders = t["orders"].where(
        (F.col("o_orderdate") >= ts_ntz("1996-01-01"))
        & (F.col("o_orderdate") < ts_ntz("1997-01-01"))
    )
    late_lines = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late_lines,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q10_style",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: who returned the most revenue. Both
    fact filters (order window, returnflag) are pushed below the joins;
    nation broadcasts; top-20 by the deterministic exact revenue with
    custkey tiebreaker → TakeOrderedAndProject, no global sort."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= ts_ntz("1997-01-01"))
                & (F.col("o_orderdate") < ts_ntz("1997-07-01"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            t["lineitem"].where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14_style",
    oracle=f"""
    SELECT 100.0 * {sql_exact_sum(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
        'promo_part').replace(' AS promo_part', '')}
        / {sql_exact_sum('l_extendedprice * (1 - l_discount)', 'total').replace(' AS total', '')}
        AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: conditional-ratio aggregate over a
    broadcast-joined dimension attribute. One lineitem month-scan, part
    broadcasts, the ratio is a single-row output — both sums are exact
    decimals so the double division is bit-identical to the oracle."""
    t = tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= ts_ntz("1997-09-01"))
            & (F.col("l_shipdate") < ts_ntz("1997-10-01"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            exact_sum(promo, "promo_part"),
            exact_sum(disc_price, "total"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_part") / F.col("total")).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "tpch_q15_style",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {sql_exact_sum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: scalar-subquery max over a derived aggregate,
    expressed as a global max WINDOW over the aggregated relation so the
    expensive lineitem aggregation is computed ONCE (a separate
    ``rev.agg(max)`` branch made Spark scan lineitem twice — no
    plan-level reuse across the two DataFrame references). The window's
    single partition holds only per-supplier rows (a bounded dimension),
    so it is safe at any fact scale. Equality on the exact decimal-sum
    double is safe — both sides are the same deterministic value."""
    t = tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= ts_ntz("1997-01-01"))
            & (F.col("l_shipdate") < ts_ntz("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    from pyspark.sql import Window

    top = rev.withColumn(
        "max_revenue", F.max("total_revenue").over(Window.partitionBy())
    ).where(F.col("total_revenue") == F.col("max_revenue"))
    return (
        t["supplier"]
        .join(top, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q18_style",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {sql_exact_sum('l_quantity', 'sum_qty')}
      FROM lineitem GROUP BY l_orderkey
      HAVING {sql_exact_sum('l_quantity', 'x').replace(' AS x', '')} > 120
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: aggregate the fact FIRST (the HAVING
    gate shrinks lineitem to a handful of hot orders), then join orders
    and customer against the small survivor set — the
    aggregate-before-join ordering that makes this query cheap at scale
    (joining first would shuffle the full fact table twice)."""
    t = tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(exact_sum(F.col("l_quantity"), "sum_qty"))
        .where(F.col("sum_qty") > 120)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_style",
    oracle=f"""
    SELECT {sql_exact_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: disjunction of conjunctive brand/size/
    quantity bands across BOTH join sides. Catalyst splits the OR into
    the single-side implied predicates (l_quantity ∈ [1,30] pushes to the
    lineitem scan, brand/size union to the broadcast part scan) and
    evaluates the full disjunction as the join residual."""
    t = tables(spark, sf_dir)
    band = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .where(
            band("Brand#1", 15, 1, 11)
            | band("Brand#13", 20, 10, 20)
            | band("Brand#22", 25, 20, 30)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q22_style",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           {sql_exact_sum('c_acctbal', 'totacctbal')}
    FROM customer
    WHERE c_acctbal > (SELECT {sql_exact_avg('c_acctbal', 'x').replace(' AS x', '')}
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def tpch_q22_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global-sales-opportunity: rich-but-inactive customers. The
    scalar average is a 1-row broadcast (computed once, exact decimal
    semantics); the inactivity gate is a LEFT ANTI join against the
    recent-orders slice. Segment rollup output is ≤5 rows."""
    t = tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .where(F.col("c_acctbal") > 0.0)
        .agg(exact_avg(F.col("c_acctbal"), "avg_bal"))
    )
    recent = t["orders"].where(F.col("o_orderdate") >= ts_ntz("2000-01-01"))
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), exact_sum(F.col("c_acctbal"), "totacctbal"))
        .orderBy("c_mktsegment")
    )
