"""plans.guardrails: the engine-wide scale invariants as a callable
pre-flight library (mirrors tests/test_scale_plans.py's assertions)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from recommender_systems_pyspark_spark.plans import (
    PlanScalabilityError,
    assert_scalable,
    plan_indicators,
    scalability_findings,
)


def test_clean_plan_passes(spark):
    df = (
        spark.range(1000)
        .groupBy((F.col("id") % 10).alias("g"))
        .agg(F.count("*").alias("n"))
    )
    assert scalability_findings(df) == []
    assert_scalable(df)  # must not raise


def test_cartesian_is_caught(spark):
    # small cross joins broadcast (BroadcastNestedLoopJoin — legitimate,
    # j7 uses it); the hazard is the SHUFFLED CartesianProduct Spark
    # picks when neither side is broadcastable
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "jd")
        df = a.crossJoin(b)
        with pytest.raises(PlanScalabilityError, match="CartesianProduct"):
            assert_scalable(df)
        assert_scalable(df, allow=frozenset({"CartesianProduct"}))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unpartitioned_window_is_caught(spark):
    df = spark.range(100).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    with pytest.raises(PlanScalabilityError, match="unpartitioned Window"):
        assert_scalable(df)
    # partitioned windows are fine
    ok = spark.range(100).select(
        "id",
        F.row_number()
        .over(Window.partitionBy(F.col("id") % 5).orderBy("id"))
        .alias("rn"),
    )
    assert_scalable(ok)


def test_plan_indicators_counts(spark):
    df = (
        spark.range(10_000)
        .groupBy((F.col("id") % 7).alias("g"))
        .agg(F.count("*").alias("n"))
    )
    ind = plan_indicators(df)
    assert ind["shuffles"] >= 1
    assert ind["cartesian"] == 0
