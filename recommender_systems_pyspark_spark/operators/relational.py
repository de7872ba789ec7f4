"""Relational operator surface (SURVEY.md §2.1-2.5): projections, filters,
joins, aggregations, top-k — each as a named query with a DuckDB oracle.

Every query here is pure DataFrame API (zero Python UDFs, zero RDDs, zero
driver-side loops), so Catalyst gets the whole plan: filters and projections
reach the parquet scan (PushedFilters/ReadSchema), small dimensions are
broadcast, and aggregations run as partial+final hash aggregates inside
whole-stage codegen. That is what makes these plans survive a 100 TB scan on
a 1000-executor cluster: the fact table is read once, pruned to the needed
columns, filtered at the scan, and only pre-aggregated or top-k-pruned rows
ever cross a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import exact_avg, exact_sum, query, sql_exact_avg, sql_exact_sum, ts_ntz
from ..sources import tables

# ---------------------------------------------------------------------------
# Flagship (Phase 0): the reference's most representative query —
# get_popular_movies (app.py:218-236): fact ⋈ dim ⋈ dim, 5-predicate filter
# (equality, range, date, regex), top-k. Star-schema analog.
# ---------------------------------------------------------------------------


@query(
    "flagship_top_orders",
    oracle="""
    SELECT o_orderkey, c_name, n_name, o_totalprice, o_orderdate
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND o_totalprice >= 150000.0
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND regexp_matches(o_orderpriority, '^[1-3]-')
      AND c_acctbal > 0.0
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def flagship_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popular-movies analog (app.py:218-236): inner joins + equality/range/
    date/regex predicates + top-k.

    Scale: `nation` is broadcast (bounded dim); `customer` ⋈ `orders` is a
    shuffle hash join on the key both sides already need; the ORDER BY+LIMIT
    compiles to TakeOrderedAndProject — each task keeps only its local
    top-100, so no global sort ever materializes.
    """
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") >= 150000.0)
            & (F.col("o_orderdate") >= ts_ntz("1996-01-01"))
            & F.col("o_orderpriority").rlike("^[1-3]-")
            & (F.col("c_acctbal") > 0.0)
        )
        .select("o_orderkey", "c_name", "n_name", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY.md §2.2, P1-P9)
# ---------------------------------------------------------------------------


@query(
    "p1_project_rename",
    oracle="""
    SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand,
           p_retailprice AS price
    FROM part
    """,
)
def p1_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: projection with rename (utils/imb_rating.py:49-54). Column pruning
    reaches the scan: ReadSchema carries only the four columns."""
    t = tables(spark, sf_dir)
    return t["part"].select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").alias("price"),
    )


@query(
    "p2_cast_projection",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS orderkey_str,
           CAST(trunc(o_totalprice) AS INTEGER) AS price_int,
           CAST(year(o_orderdate) AS INTEGER) AS order_year
    FROM orders
    """,
)
def p2_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: type casts in projection (utils/recommender.py:65-69; SQL CAST at
    app.py:223,231). Spark double→int truncates toward zero; the oracle uses
    trunc() because DuckDB's bare cast rounds."""
    t = tables(spark, sf_dir)
    return t["orders"].select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("orderkey_str"),
        F.col("o_totalprice").cast("int").alias("price_int"),
        F.year("o_orderdate").alias("order_year"),
    )


@query(
    "p3_eq_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def p3_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: equality filter (utils/imb_rating.py:145 titleType == 'movie').
    The predicate is pushed into the parquet scan (PushedFilters)."""
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@query(
    "p4_range_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_totalprice >= 400000.0
    """,
)
def p4_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: threshold filter (utils/imb_rating.py:48 numVotes >= minVotes).
    Range predicates hit parquet min/max row-group pruning."""
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .where(F.col("o_totalprice") >= 400000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "p6_regex_filter",
    oracle="""
    SELECT p_partkey, p_name
    FROM part WHERE regexp_matches(p_name, '^(red|blue) ')
    """,
)
def p6_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/F5: regex predicate (app.py:230 startYear ~ '^[0-9]+$';
    utils/user.py:141 username validation) via rlike."""
    t = tables(spark, sf_dir)
    return t["part"].where(F.col("p_name").rlike("^(red|blue) ")).select("p_partkey", "p_name")


@query(
    "p7_contains_ci",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part WHERE contains(lower(p_name), 'gear')
    """,
)
def p7_contains_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: case-insensitive substring match (app.py:364-366 genre contains,
    case=False) — lower() + contains, JVM-side, no Python."""
    t = tables(spark, sf_dir)
    return (
        t["part"]
        .where(F.lower(F.col("p_name")).contains("gear"))
        .select("p_partkey", "p_name", "p_type")
    )


@query(
    "p8_anti_membership",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def p8_anti_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/J4: anti-membership. The reference collects rated ids to a driver
    set and filters pandas-side (app.py:342-344) — that collapses at scale.
    Engine form: left_anti join, distributed, no driver state.

    The right side is predicate-filtered (customers with no 'F'-status
    order) so the expected result is NON-empty at fixture scale — every
    customer has *some* order, and an unfiltered anti-join would make the
    oracle check vacuous (ADVICE.md r1: an anti-join that always returns 0
    rows passes even when broken)."""
    t = tables(spark, sf_dir)
    f_orders = t["orders"].where(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "p9_null_handling",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') IS NOT NULL AS is_closed,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled
    FROM orders
    """,
)
def p9_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/F12: null-sentinel handling + coalesce fallback (loader nullValue
    '\\N' at utils/data_loader.py:127; row.get fallback app.py:465)."""
    t = tables(spark, sf_dir)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return t["orders"].select(
        "o_orderkey",
        status_or_null.isNotNull().alias("is_closed"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_filled"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.3, J1-J4 + free semi join)
# ---------------------------------------------------------------------------


@query(
    "j1_inner_join_agg",
    oracle=f"""
    SELECT p_brand,
           {sql_exact_sum('l_extendedprice', 'brand_revenue')},
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j1_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join fact ⋈ dim + grouped agg (utils/imb_rating.py:47).
    `part` is broadcast — the lineitem scan never shuffles for the join; the
    only shuffle is the final aggregation on p_brand (tiny after map-side
    partials)."""
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            exact_sum(F.col("l_extendedprice"), "brand_revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "j2_left_join_agg",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 0.0)
             AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def j2_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join preserving unmatched dimension rows
    (utils/recommender.py:216, app.py:186), with count-of-non-null semantics
    and a coalesced sum for order-less customers."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast("double"),
                F.lit(0.0),
            ).alias("total_spend"),
        )
    )


@query(
    "j3_alias_join",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, r.r_name AS region_name
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    JOIN region r ON a.n_regionkey = r.r_regionkey
    """,
)
def j3_alias_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: self-join with aliases to disambiguate duplicate key columns
    (utils/imb_rating.py:38,44,143-144): nation pairs within a region."""
    t = tables(spark, sf_dir)
    a, b = t["nation"].alias("a"), t["nation"].alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .join(F.broadcast(t["region"]), F.col("a.n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("r_name").alias("region_name"),
        )
    )


@query(
    "j4_anti_join",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: anti-join — parts never ordered (pandas ~isin at app.py:344,
    re-expressed distributed)."""
    t = tables(spark, sf_dir)
    return (
        t["part"]
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    )


@query(
    "j5_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def j5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (free built-in absent from the reference, SURVEY.md §2.3):
    customers with ≥1 finalized order. left_semi stops probing at first
    match and never duplicates the left side."""
    t = tables(spark, sf_dir)
    finalized = t["orders"].where(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(finalized, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.4, A1-A7)
# ---------------------------------------------------------------------------


@query(
    "a1_a4_global_aggs",
    oracle=f"""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           {sql_exact_avg('o_totalprice', 'avg_price')},
           {sql_exact_sum('o_totalprice', 'total_price')}
    FROM orders
    """,
)
def a1_a4_global_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4 in one pass: global count, distinct count, avg, sum
    (utils/recommender.py:90-101 runs these as four separate Spark jobs;
    the engine computes them in a single scan+aggregate).

    Scale: COUNT(DISTINCT) expands to a two-phase aggregate; for 100 TB
    interactive use, swap in approx_count_distinct (HLL, one pass)."""
    t = tables(spark, sf_dir)
    return t["orders"].agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        exact_avg(F.col("o_totalprice"), "avg_price"),
        exact_sum(F.col("o_totalprice"), "total_price"),
    )


@query(
    "a5_grouped_count",
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def a5_grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: grouped count (utils/recommender.py:96 groupBy(userId).count()).
    Hash aggregate with map-side partial combine — shuffle carries one row
    per (partition, group), not per input row."""
    t = tables(spark, sf_dir)
    return t["events"].groupBy("event_type").agg(F.count("*").alias("n"))


@query(
    "a6_top_groups",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    ORDER BY n_orders DESC, o_custkey
    LIMIT 10
    """,
)
def a6_top_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: grouped count → top-10 (utils/recommender.py:96-97), with a
    unique-key tiebreaker making the selected set deterministic."""
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "o_custkey")
        .limit(10)
    )


@query(
    "a7_conditional_counts",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_totalprice >= 300000.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_big,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_final,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_urgent,
           COUNT(*) AS n_total
    FROM orders
    """,
)
def a7_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: conditional counts in ONE pass. The reference runs three separate
    filtered count() jobs (utils/imb_rating.py:147-149) — three full scans;
    here sum(when(...)) folds them into one scan+aggregate."""
    t = tables(spark, sf_dir)
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return t["orders"].agg(
        one_if(F.col("o_totalprice") >= 300000.0).alias("n_big"),
        one_if(F.col("o_orderstatus") == "F").alias("n_final"),
        one_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.count("*").alias("n_total"),
    )


# ---------------------------------------------------------------------------
# Top-k (SURVEY.md §2.5, T1-T5)
# ---------------------------------------------------------------------------


@query(
    "t1_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 500
    """,
)
def t1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2/T3/T5: top-k by measure desc (utils/imb_rating.py:55-56 top-500
    candidate pool; app.py:234-235 SQL LIMIT). Compiles to
    TakeOrderedAndProject: per-partition heaps of size k, merged on the
    driver — no global sort, no full shuffle, scales to any input size."""
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# TPC-H classics — bench headliners exercising the same operator families
# at fact-table scale (J1/J2, A1-A7, P4/P5, T1).
# ---------------------------------------------------------------------------


@query(
    "tpch_q1",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS cq,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cx,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS cd,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS ct
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(cq AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(SUM(CAST(cx AS DECIMAL(18,0))) AS DOUBLE) / 100.0
             AS sum_base_price,
           CAST(SUM(CAST(cx * (100 - cd) AS DECIMAL(18,0))) AS DOUBLE)
             / 10000.0 AS sum_disc_price,
           CAST(SUM(CAST(cx * (100 - cd) * (100 + ct) AS DECIMAL(18,0)))
                AS DOUBLE) / 1000000.0 AS sum_charge,
           (CAST(SUM(CAST(cq AS DECIMAL(18,0))) AS DOUBLE) / 100.0)
             / COUNT(*) AS avg_qty,
           (CAST(SUM(CAST(cx AS DECIMAL(18,0))) AS DOUBLE) / 100.0)
             / COUNT(*) AS avg_price,
           (CAST(SUM(CAST(cd AS DECIMAL(18,0))) AS DOUBLE) / 100.0)
             / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM cents
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical scan-heavy aggregate. One
    lineitem pass, filter pushed to the scan, 6 groups out — the shuffle
    moves rows proportional to groups × partitions, never to input size.

    Sums use the integer-centi-unit scheme (a10_stat_moments): every
    monetary/quantity column carries exactly 2 decimals, so round(x·100)
    is an exact integer and products like cx·(100−cd)·(100+ct) are exact
    longs (≤ 1.2e11 per row). The aggregation is TWO-PHASE (r4): the
    per-row accumulation runs as plain BIGINT sums grouped by
    (group, partition id) — pure long adds inside whole-stage codegen,
    ~30% faster than per-row DECIMAL accumulation at sf0.1 — and only the
    per-partition partials are merged with DECIMAL(28,0), so the final
    total can never overflow. Per-partition safety margin: a bigint
    partial overflows only past 2⁶³/1.2e11 ≈ 7.7e7 rows per partition,
    ~40× above a 128 MB maxPartitionBytes split at ~120 B/row; the merge
    is exact integer addition, so the result is deterministic and equals
    the single-phase decimal sum bit-for-bit (oracle unchanged)."""
    t = tables(spark, sf_dir)
    cq = F.round(F.col("l_quantity") * 100).cast("bigint")
    cx = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    cd = F.round(F.col("l_discount") * 100).cast("bigint")
    ct = F.round(F.col("l_tax") * 100).cast("bigint")

    part = (
        t["lineitem"]
        .where(F.col("l_shipdate") <= ts_ntz("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum(cq).alias("pq"),
            F.sum(cx).alias("px"),
            F.sum(cx * (100 - cd)).alias("pdp"),
            F.sum(cx * (100 - cd) * (100 + ct)).alias("pch"),
            F.sum(cd).alias("pd"),
            F.count("*").alias("pn"),
        )
    )

    def dsum(col: str) -> Column:
        return F.sum(F.col(col).cast("decimal(28,0)")).cast("double")

    n = F.sum("pn")
    return (
        part.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (dsum("pq") / 100.0).alias("sum_qty"),
            (dsum("px") / 100.0).alias("sum_base_price"),
            (dsum("pdp") / 10000.0).alias("sum_disc_price"),
            (dsum("pch") / 1000000.0).alias("sum_charge"),
            ((dsum("pq") / 100.0) / n).alias("avg_qty"),
            ((dsum("px") / 100.0) / n).alias("avg_price"),
            ((dsum("pd") / 100.0) / n).alias("avg_disc"),
            n.cast("bigint").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: two joins + grouped agg + top-k.
    customer is filtered before the join (segment predicate pushed down);
    the revenue used for ordering is the deterministic exact_sum value, so
    the top-10 set matches the oracle bit-for-bit."""
    t = tables(spark, sf_dir)
    cutoff = ts_ntz("1998-06-01")
    return (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: 5-way join. supplier/nation/region
    are broadcast (bounded dims) so the only shuffles are the
    customer ⋈ orders ⋈ lineitem chain on its natural keys; group-by n_name
    output is ≤25 rows."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= ts_ntz("1996-01-01"))
                & (F.col("o_orderdate") < ts_ntz("1998-01-01"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT {sql_exact_sum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24.0
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue (and P5's 4-predicate conjunctive filter,
    app.py:228-233): every predicate is scan-pushable, output is one row —
    the ideal fully-pushed-down plan (no shuffle beyond the 1-row final
    aggregate)."""
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= ts_ntz("1997-01-01"))
            & (F.col("l_shipdate") < ts_ntz("1998-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "d1_month_rollup",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           {sql_exact_sum('o_totalprice', 'revenue')},
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY order_month
    ORDER BY order_month
    """,
)
def d1_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: date_trunc month + agg (date arithmetic absent from
    the reference, SURVEY.md §2.7 note — in-scope for an engine). At scale
    this is the query that motivates date-partitioned parquet layout:
    partition pruning turns month-bounded variants into partial scans."""
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(exact_sum(F.col("o_totalprice"), "revenue"), F.count("*").alias("n_orders"))
        .orderBy("order_month")
    )


@query(
    "j10_full_outer",
    oracle=f"""
    WITH o AS (
      SELECT date_trunc('day', o_orderdate) AS d, COUNT(*) AS n_orders,
             {sql_exact_sum('o_totalprice', 'order_revenue')}
      FROM orders GROUP BY d
    ), l AS (
      SELECT date_trunc('day', l_shipdate) AS d, COUNT(*) AS n_ships,
             {sql_exact_sum('l_quantity', 'ship_qty')}
      FROM lineitem GROUP BY d
    )
    SELECT d,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           order_revenue,
           CAST(COALESCE(n_ships, 0) AS BIGINT) AS n_ships,
           ship_qty,
           (n_orders IS NOT NULL AND n_ships IS NOT NULL) AS both_sides
    FROM o FULL JOIN l USING (d)
    """,
)
def j10_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family completion: FULL OUTER equi-join — daily order activity
    against daily shipping activity, keeping days present on either side
    (the fixture has order-only days at the front of the horizon and
    ship-only days trailing it, so both unmatched directions are
    exercised). Unmatched counts coalesce to 0; unmatched sums stay NULL
    so absence is distinguishable from zero.

    Scale: both inputs pre-aggregate to ~date-cardinality BEFORE the
    join (map-side-combinable hash aggs on the day key), so the full
    outer join itself moves only two tiny day-keyed relations — the
    aggregate-then-join shape that keeps outer joins cheap at 100 TB."""
    t = tables(spark, sf_dir)
    o = (
        t["orders"]
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum(F.col("o_totalprice"), "order_revenue"),
        )
    )
    lt = (
        t["lineitem"]
        .groupBy(F.date_trunc("day", F.col("l_shipdate")).alias("d"))
        .agg(
            F.count("*").alias("n_ships"),
            exact_sum(F.col("l_quantity"), "ship_qty"),
        )
    )
    return o.join(lt, ["d"], "full").select(
        "d",
        F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
        "order_revenue",
        F.coalesce("n_ships", F.lit(0).cast("long")).alias("n_ships"),
        "ship_qty",
        (F.col("n_orders").isNotNull() & F.col("n_ships").isNotNull()).alias(
            "both_sides"
        ),
    )
