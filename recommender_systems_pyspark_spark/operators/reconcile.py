"""Cross-table referential-integrity and reconciliation audit (round 11).

The reference app trusts its Postgres schema to enforce FK integrity and
never re-checks money columns against their line-level detail
(``utils/database.py`` delegates constraints to the DB; SURVEY.md §2.12
flags validation as an extension surface). A lakehouse has no FK
enforcement at all — every warehouse team runs exactly this audit as a
scheduled job: orphan detection in BOTH directions across the fact
chain, plus header-vs-detail money reconciliation.

One query, five checks, one row each:

- ``lineitem_orphan``        line items whose order header is missing
- ``order_childless``        orders with zero line items
- ``order_customer_orphan``  orders pointing at a missing customer
- ``customer_nation_orphan`` customers pointing at a missing nation
- ``totalprice_mismatch``    orders whose header total (cents) differs
                             from the line-level Σ extprice·(1+tax)·(1−disc)

Money math is INTEGER CENTS per row — ``floor(x·100 + 0.5)`` computed in
identical IEEE doubles on both engines (the one-rounding-rule idiom from
the streaming faces) — so the per-order sums are order-independent
bigints and the mismatch count/max-delta hash-certify exactly.

Scale: the orphan checks are left-anti joins (dimension side broadcast
for customer/nation; orders↔lineitem co-keyed on the order key — the
same shuffle a bucketed layout makes free). The reconciliation is one
orderkey-keyed partial-aggregated sum join. Every check reduces to a
single scalar row before the final 5-row union — constant output
regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables


def _cents(c: Column) -> Column:
    """floor(x*100 + 0.5) — the engine's one-rounding-rule cents cast."""
    return F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("long")


def orphan_check(
    fact: DataFrame,
    key: str,
    dim: DataFrame,
    dim_key: str,
    detail_key: str,
) -> DataFrame:
    """One orphan probe: fact rows whose ``key`` has no match in the
    dimension's ``dim_key``, reduced to (n, detail). ``detail`` is the
    smallest violating ENTITY key (the row you would triage), which is
    NOT always the join key — order→customer orphans report the orphaned
    o_orderkey, not the missing o_custkey. The oracle reports the same
    entity key; reporting min(join key) here instead would be latent
    divergence (green on an orphan-free fixture, mismatched the day one
    appears)."""
    return fact.join(dim, fact[key] == dim[dim_key], "left_anti").agg(
        F.count("*").alias("n"), F.min(detail_key).alias("detail")
    )


def _check(name: str, agg: DataFrame) -> DataFrame:
    """Normalize one single-row aggregate to (check, n_violations, detail)."""
    return agg.select(
        F.lit(name).alias("check_name"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_violations"),
        F.coalesce(F.col("detail"), F.lit(0)).cast("long").alias("detail"),
    )


@query(
    "x_ri_audit",
    oracle="""
    WITH li_orphan AS (
      SELECT COUNT(*) AS n, COALESCE(MIN(l.l_orderkey), 0) AS detail
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    ),
    o_childless AS (
      SELECT COUNT(*) AS n, COALESCE(MIN(o.o_orderkey), 0) AS detail
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey)
    ),
    o_cust AS (
      SELECT COUNT(*) AS n, COALESCE(MIN(o.o_orderkey), 0) AS detail
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    ),
    c_nation AS (
      SELECT COUNT(*) AS n, COALESCE(MIN(c.c_custkey), 0) AS detail
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM nation n
                        WHERE n.n_nationkey = c.c_nationkey)
    ),
    li_sum AS (
      SELECT l_orderkey,
             SUM(CAST(floor(l_extendedprice * (1 + l_tax) * (1 - l_discount)
                            * 100 + 0.5) AS BIGINT)) AS li_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    recon AS (
      SELECT COUNT(*) FILTER (WHERE delta <> 0) AS n,
             COALESCE(MAX(abs(delta)), 0) AS detail
      FROM (
        SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                 - s.li_cents AS delta
        FROM orders o JOIN li_sum s ON s.l_orderkey = o.o_orderkey
      )
    )
    SELECT * FROM (
      SELECT 'lineitem_orphan' AS check_name, CAST(n AS BIGINT) AS n_violations,
             CAST(detail AS BIGINT) AS detail FROM li_orphan
      UNION ALL
      SELECT 'order_childless', CAST(n AS BIGINT), CAST(detail AS BIGINT)
      FROM o_childless
      UNION ALL
      SELECT 'order_customer_orphan', CAST(n AS BIGINT), CAST(detail AS BIGINT)
      FROM o_cust
      UNION ALL
      SELECT 'customer_nation_orphan', CAST(n AS BIGINT), CAST(detail AS BIGINT)
      FROM c_nation
      UNION ALL
      SELECT 'totalprice_mismatch', CAST(n AS BIGINT), CAST(detail AS BIGINT)
      FROM recon
    )
    ORDER BY check_name
    """,
)
def x_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity + money-reconciliation audit over the
    orders fact chain; see the module docstring for the five checks.
    ``detail`` is the smallest violating key for orphan checks and the
    max absolute cents delta for the reconciliation."""
    t = tables(spark, sf_dir)
    lineitem, orders = t["lineitem"], t["orders"]
    customer, nation = t["customer"], t["nation"]

    li_sum = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            _cents(
                F.col("l_extendedprice")
                * (F.lit(1.0) + F.col("l_tax"))
                * (F.lit(1.0) - F.col("l_discount"))
            )
        ).alias("li_cents")
    )
    recon = (
        orders.select(
            "o_orderkey", _cents(F.col("o_totalprice")).alias("o_cents")
        )
        .join(li_sum, F.col("o_orderkey") == F.col("l_orderkey"))
        .select((F.col("o_cents") - F.col("li_cents")).alias("delta"))
        .agg(
            F.count_if(F.col("delta") != 0).alias("n"),
            F.max(F.abs(F.col("delta"))).alias("detail"),
        )
    )
    out = (
        _check(
            "lineitem_orphan",
            orphan_check(lineitem, "l_orderkey", orders, "o_orderkey", "l_orderkey"),
        )
        .unionAll(
            _check(
                "order_childless",
                orphan_check(orders, "o_orderkey", lineitem, "l_orderkey", "o_orderkey"),
            )
        )
        .unionAll(
            _check(
                "order_customer_orphan",
                orphan_check(
                    orders, "o_custkey", F.broadcast(customer), "c_custkey",
                    "o_orderkey",
                ),
            )
        )
        .unionAll(
            _check(
                "customer_nation_orphan",
                orphan_check(
                    customer, "c_nationkey", F.broadcast(nation), "n_nationkey",
                    "c_custkey",
                ),
            )
        )
        .unionAll(_check("totalprice_mismatch", recon))
    )
    return out.orderBy("check_name")
