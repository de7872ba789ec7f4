"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``recommender_systems_pyspark_spark.registry``: every
operator registers its Spark implementation and DuckDB oracle together via
the ``@query`` decorator, and this module just exposes the registry in the
driver's required shape (``entry`` / ``queries`` / ``oracle_sql``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from recommender_systems_pyspark_spark.registry import all_queries
from recommender_systems_pyspark_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the popular-movies analog (SURVEY.md §7 Phase 0):
    orders ⋈ customer ⋈ broadcast(nation), 5-predicate filter
    (equality/range/date/regex), top-100 via TakeOrderedAndProject.
    """
    tune_session(spark)
    return all_queries()["flagship_top_orders"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted for non-SQL-expressible ops
    (ML / stateful streaming), where the driver records a rows-only check."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
