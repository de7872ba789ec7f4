"""Window-function surface (SURVEY.md §2.6 — absent from the reference; the
engine implements the general forms its single-user queries imply).

The reference's per-entity top-k exists only as single-user ``ORDER BY
ratedAt DESC LIMIT 5`` (app.py:126-128) and the ALS helper
``recommendForAllUsers`` (utils/recommender.py:145-150). The general,
all-entities-at-once forms below are one shuffle on the partition key —
at 100 TB that beats N driver-side per-entity queries by construction.

Determinism: every window ORDER BY ends in a unique key; windowed sums go
through per-row DECIMAL casts (see registry.exact_sum rationale) because
DuckDB evaluates moving aggregates with segment trees — a different
addition order than Spark's running accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables


@query(
    "t4_recent_per_user",
    oracle="""
    SELECT user_id, event_id, ts, value,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id) AS INTEGER) AS rn
    FROM events
    QUALIFY rn <= 5
    """,
)
def t4_recent_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 general form: recent-5 events for EVERY user in one pass
    (app.py:126-128 does it for one user with LIMIT 5). row_number over
    (user, ts desc) then filter — a single hash-partitioned shuffle on
    user_id; no driver loop over users."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id"))
    return (
        t["events"]
        .select("user_id", "event_id", "ts", "value", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 5)
    )


@query(
    "t7_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice,
           CAST(row_number() OVER (PARTITION BY p_brand
                                   ORDER BY p_retailprice DESC, p_partkey) AS INTEGER)
             AS rn
    FROM part
    QUALIFY rn <= 3
    """,
)
def t7_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 relational form: top-N per group (the rank-window equivalent of
    ALS recommendForAllUsers' top-10-per-user, utils/recommender.py:145-150):
    3 priciest parts per brand."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        t["part"]
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@query(
    "w1_rank_forms",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER w AS INTEGER) AS row_num,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS dense_rnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w1_rank_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over one partition spec (SURVEY.md
    §2.6 extension). One shuffle on o_custkey serves all three."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("row_num"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
    )


@query(
    "w2_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS spend_to_date
    FROM orders
    """,
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (rowsBetween unboundedPreceding→currentRow):
    customer spend-to-date. DECIMAL inside the frame sum keeps the result
    independent of how each engine associates the additions."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).over(w).cast("double").alias("spend_to_date"),
    )


@query(
    "w3_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           date_diff('microsecond', lag(ts) OVER w, ts) AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation: per-user event sequencing with inter-event gap
    (the building block of sessionization — see streaming.windows).
    Gap measured in exact integral microseconds; the NTZ→LTZ casts inside
    unix_micros use the same session offset on both operands, so it cancels."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    return t["events"].select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (micros - F.lag(micros).over(w)).alias("us_since_prev"),
    )


@query(
    "w4_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS avg_last3
    FROM orders
    """,
)
def w4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frame (rowsBetween -2..0): 3-order moving average of spend,
    decomposed as exact frame-sum / frame-count for determinism."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("avg_last3"),
    )


@query(
    "w5_rank_fractions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
           CAST(cume_dist() OVER w AS DOUBLE) AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w5_rank_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family completion: the fractional/bucketed rank forms —
    percent_rank, cume_dist, ntile(4) — over the same per-customer
    window as w1. Both fractions are exact integer-ratio doubles
    ((rank−1)/(n−1), rows≤/n), so they hash identically cross-engine;
    the total order (o_totalprice DESC, o_orderkey) makes ntile bucket
    boundaries deterministic. Partitioned by o_custkey — bounded
    per-customer partitions, one shuffle serves all three forms."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )
