"""Set operations and multi-dimensional aggregation (SURVEY.md §2.6: never
used by the reference, free built-ins in Spark — in-scope for an engine).

union/intersect/except are shuffle-on-all-columns operators in their
DISTINCT forms; UNION ALL is shuffle-free (plan concatenation). rollup/cube
expand each input row into its grouping-set combinations before one hash
aggregate — output multiplies by the number of sets, input is read once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import exact_sum, query, sql_exact_sum
from ..sources import tables


@query(
    "u1_union_all",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_acctbal < 0.0
    """,
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName — bag semantics, no shuffle; a customer in
    both branches appears twice (duplicate-tolerant, like the reference's
    rating appends, utils/user.py:162-168)."""
    t = tables(spark, sf_dir)
    base = t["customer"].select("c_custkey", "c_name", "c_mktsegment")
    building = base.where(F.col("c_mktsegment") == "BUILDING")
    overdrawn = t["customer"].where(F.col("c_acctbal") < 0.0).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return building.unionByName(overdrawn)


@query(
    "u2_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT: union + distinct (one shuffle on the full row)."""
    t = tables(spark, sf_dir)
    f = t["orders"].where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = t["orders"].where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.union(o).distinct()


@query(
    "u3_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both finalized and open orders."""
    t = tables(spark, sf_dir)
    f = t["orders"].where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = t["orders"].where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@query(
    "u4_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with finalized but no open orders.
    subtract() is set difference; exceptAll would be bag difference (removes
    one occurrence per match) — a different answer on duplicate keys."""
    t = tables(spark, sf_dir)
    f = t["orders"].where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = t["orders"].where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(o)


@query(
    "g1_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_exact_sum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def g1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): hierarchical subtotals + grand total in
    one aggregate (SURVEY.md §2.4 'absent: grouping sets' extension)."""
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), exact_sum(F.col("o_totalprice"), "revenue"))
    )


@query(
    "g2_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def g2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus): all 2^2 grouping sets in one pass."""
    t = tables(spark, sf_dir)
    return t["lineitem"].cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "g3_pivot",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def g3_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per (segment × status). Explicit pivot values
    keep the plan one-pass — without them Spark runs an extra distinct job
    to discover the columns (driver round trip; avoid at scale)."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )


@query(
    "g5_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS value FROM lineitem
    UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           l_extendedprice FROM lineitem
    UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
           l_discount FROM lineitem
    UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
           l_tax FROM lineitem
    """,
)
def g5_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of g3's pivot: lineitem's four measure
    columns become (metric, value) rows keyed by (order, line). Spark's
    native ``unpivot`` is a map-only Expand (each input row emits 4
    output rows in place — no shuffle, no join); the oracle states the
    same relation as the textbook 4-way UNION ALL. At scale prefer this
    operator over the union form: one scan instead of four."""
    li = tables(spark, sf_dir)["lineitem"]
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )
