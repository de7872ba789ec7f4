"""Multi-resolution rollup tree (continuous-aggregate / hypertable-rollup
shape) and calendar-feature derivation (SURVEY.md §2.13 round-3).

The rollup tree is the operator behind every time-series OLAP store's
"continuous aggregate": coarser resolutions are computed FROM the next
finer aggregate, not from raw — minute→hour touches |minutes| rows,
hour→day touches |hours|. At 100 TB the raw scan happens once; each
further level is O(output of the previous), thousands of times smaller.
Correctness requires MERGEABLE per-level state: counts add, and sums are
kept in exact decimal (associative) until final output, so rolling up
partials equals aggregating raw — which is exactly what the oracle checks
by computing every level directly from the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query, sql_exact_sum
from ..sources import tables


@query(
    "d2_rollup_tree",
    oracle=f"""
    SELECT 'minute' AS level, date_trunc('minute', ts) AS bucket_ts,
           COUNT(*) AS n_events, {sql_exact_sum('value', 'total_value')}
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'hour', date_trunc('hour', ts),
           COUNT(*), {sql_exact_sum('value', 'total_value')}
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', date_trunc('day', ts),
           COUNT(*), {sql_exact_sum('value', 'total_value')}
    FROM events GROUP BY 2
    ORDER BY level, bucket_ts
    """,
)
def d2_rollup_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute→hour→day rollup where each coarser level aggregates the
    PREVIOUS level's partial state (count: sum of counts; value: decimal
    partial sums re-summed — associative, so identical to aggregating raw,
    which is what the oracle does). The raw table is scanned exactly once;
    the day level aggregates |hours| rows, not |events|."""
    ev = tables(spark, sf_dir)["events"]
    minute = ev.groupBy(F.date_trunc("minute", "ts").alias("bucket_ts")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("dec_value"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket_ts").alias("bucket_ts")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("dec_value").alias("dec_value"),
    )
    day = hour.groupBy(F.date_trunc("day", "bucket_ts").alias("bucket_ts")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("dec_value").alias("dec_value"),
    )

    def finalize(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            "bucket_ts",
            "n_events",
            F.col("dec_value").cast("double").alias("total_value"),
        )

    return (
        finalize(minute, "minute")
        .unionAll(finalize(hour, "hour"))
        .unionAll(finalize(day, "day"))
        .orderBy("level", "bucket_ts")
    )


@query(
    "d3_calendar_features",
    oracle="""
    SELECT DISTINCT
           strftime(o_orderdate, '%Y-%m-%d') AS d,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           isodow(o_orderdate) AS dow_iso,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE),
                    '%Y-%m-%d') AS plus3m,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             AS day_index
    FROM orders
    ORDER BY d
    """,
)
def d3_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/date-dimension derivation over the distinct order dates:
    ISO day-of-week (Spark ``weekday``+1 == DuckDB ``isodow``; the
    engines' bare ``dayofweek`` disagree on week start), month-end,
    end-of-month-clamped +3 months (both engines clamp Jan 31 → Apr 30),
    and a day index against a fixed epoch. All date-valued outputs are
    ISO-formatted STRINGS: Spark dates land in pandas as ``object`` cells
    while DuckDB's land as datetime64, and the driver hash is
    dtype-sensitive. DISTINCT first — the derivations run on |dates|
    rows, not |orders|."""
    o = tables(spark, sf_dir)["orders"]
    d = F.to_date("o_orderdate")
    return (
        o.select(
            F.date_format(d, "yyyy-MM-dd").alias("d"),
            F.year(d).alias("y"),
            F.quarter(d).alias("q"),
            F.month(d).alias("m"),
            (F.weekday(d) + 1).alias("dow_iso"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
            F.datediff(d, F.lit("1995-01-01").cast("date")).alias("day_index"),
        )
        .distinct()
        .orderBy("d")
    )


@query(
    "x_incremental_rollup",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS month,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_exact_sum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY month, o_orderstatus
    ORDER BY month, o_orderstatus
    """,
)
def x_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the monthly revenue rollup computed
    as BASE (orders before 1998-01-01, pre-aggregated — yesterday's
    materialized view) MERGED with the DELTA (orders since — today's
    arrivals), never rescanning history. The merge is a re-aggregation
    of partials (counts add; DECIMAL partial sums add exactly before the
    single final cast to DOUBLE), so the oracle is simply the FULL
    recompute — incremental ≡ from-scratch is precisely the property a
    production refresh must hold. Mirrors d2's mergeable-partials design
    at the view-maintenance level; at 100 TB the base partials are read
    from the materialized store, only the delta scans raw."""
    orders = tables(spark, sf_dir)["orders"]
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    month = F.date_trunc("month", F.col("o_orderdate")).alias("month")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(month, "o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_partial"),
        )

    base = partials(orders.where(F.col("o_orderdate") < cutoff))
    delta = partials(orders.where(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("month", "o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_partial").cast("double").alias("revenue"),
        )
        .orderBy("month", "o_orderstatus")
    )


@query(
    "x_mom_growth",
    oracle=f"""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             {sql_exact_sum('o_totalprice', 'revenue')}
      FROM orders GROUP BY month
    )
    SELECT month, n_orders, revenue,
           lag(revenue) OVER (ORDER BY month) AS prev_revenue,
           CASE WHEN lag(revenue) OVER (ORDER BY month) IS NOT NULL
                THEN (revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month)
           END AS mom_growth
    FROM m
    ORDER BY month
    """,
)
def x_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the period-over-period BI shape:
    monthly exact-decimal revenue, previous month via lag, growth as one
    double division. The lag window runs over the ALREADY-AGGREGATED
    month frame (≤ a few hundred rows at any corpus size — the bounded
    global-window class VERDICT r3 explicitly cleared for q11/q15), so
    the single-partition sort is over months, never raw orders."""
    orders = tables(spark, sf_dir)["orders"]
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "n_orders",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(prev.isNotNull(), (F.col("revenue") - prev) / prev).alias("mom_growth"),
    ).orderBy("month")
