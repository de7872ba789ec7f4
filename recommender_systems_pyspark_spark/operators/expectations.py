"""Declarative data-quality expectations (round 4): a Deequ-style
constraint suite evaluated in ONE pass over the table plus one
referential-integrity anti-join — the validation layer the reference
scatters across ad-hoc regex checks (``utils/user.py:141``) and
defensive try/except fallbacks (``app.py:134-155``), made systematic.

Scale notes: all row-local constraints fold into a single hash-free
global aggregate (count/min/max/conditional sums — map-side partials,
one scalar row out). The FK check is the only join: a left-anti against
the dimension's key column, broadcast when the dimension is small.
Output is one row per constraint — constant-size regardless of input."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables


@query(
    "x_expectations_orders",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(DISTINCT o_orderkey) AS n_keys,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS null_keys,
             SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price,
             SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS bad_status,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                       OR o_orderdate >= TIMESTAMP '2002-01-01'
                      THEN 1 ELSE 0 END) AS bad_date
      FROM orders
    ),
    fk AS (
      SELECT COUNT(*) AS orphans
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT * FROM (
      -- CAST: DuckDB SUM(int) widens to HUGEINT (→ float64 in pandas);
      -- Spark emits int64
      SELECT 'o_orderkey_unique' AS constraint_name,
             n_rows = n_keys AS passed,
             CAST(n_rows - n_keys AS BIGINT) AS violations FROM agg
      UNION ALL SELECT 'o_orderkey_complete', null_keys = 0,
             CAST(null_keys AS BIGINT) FROM agg
      UNION ALL SELECT 'o_totalprice_nonnegative', neg_price = 0,
             CAST(neg_price AS BIGINT) FROM agg
      UNION ALL SELECT 'o_orderstatus_domain', bad_status = 0,
             CAST(bad_status AS BIGINT) FROM agg
      UNION ALL SELECT 'o_orderdate_range', bad_date = 0,
             CAST(bad_date AS BIGINT) FROM agg
      UNION ALL SELECT 'o_custkey_ref_integrity', orphans = 0,
             CAST(orphans AS BIGINT) FROM fk
    ) ORDER BY constraint_name
    """,
)
def x_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over orders: key uniqueness and completeness,
    value range, categorical domain, date range, FK integrity against
    customer. One scalar aggregate + one anti-join count; every
    constraint reports (name, passed, violation count) so a pipeline
    gates on ``passed`` and debugs from ``violations``."""
    t = tables(spark, sf_dir)
    o = t["orders"]
    agg = o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("null_keys"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("neg_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
                | (F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp_ntz")),
                1,
            ).otherwise(0)
        ).alias("bad_date"),
    )
    orphans = (
        o.join(
            F.broadcast(t["customer"].select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").alias("orphans"))
    )

    def row(name: str, violations: F.Column) -> F.Column:
        return F.struct(
            F.lit(name).alias("constraint_name"),
            (violations == 0).alias("passed"),
            violations.cast("long").alias("violations"),
        )

    checks = agg.select(
        F.explode(
            F.array(
                row("o_orderkey_unique", F.col("n_rows") - F.col("n_keys")),
                row("o_orderkey_complete", F.col("null_keys")),
                row("o_totalprice_nonnegative", F.col("neg_price")),
                row("o_orderstatus_domain", F.col("bad_status")),
                row("o_orderdate_range", F.col("bad_date")),
            )
        ).alias("c")
    ).select("c.*")
    fk = orphans.select(
        F.lit("o_custkey_ref_integrity").alias("constraint_name"),
        (F.col("orphans") == 0).alias("passed"),
        F.col("orphans").cast("long").alias("violations"),
    )
    return checks.unionByName(fk).orderBy("constraint_name")
