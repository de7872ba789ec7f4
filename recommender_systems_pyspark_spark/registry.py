"""Query registry: the single source of truth binding each named query to
(a) its Spark implementation and (b) its DuckDB oracle SQL.

Keeping both halves adjacent (one ``@query`` decorator per operator) is what
keeps the driver's correctness gate honest — column aliases cannot drift
between the Spark plan and the oracle because they are declared together.

Determinism rules every registered query obeys:
- Aggregated doubles go through :func:`exact_sum` / :func:`exact_avg`
  (per-row cast to DECIMAL → exact, order-independent sum → cast back to
  DOUBLE). Plain double sums vary with partial-aggregation order and would
  hash-mismatch the oracle.
- Every LIMIT carries a total order (unique-key tiebreaker in the ORDER BY),
  otherwise the selected SET of rows is nondeterministic.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}

#: Modules whose import populates the registry.
_QUERY_MODULES = (
    "recommender_systems_pyspark_spark.operators.relational",
    "recommender_systems_pyspark_spark.operators.windows",
    "recommender_systems_pyspark_spark.operators.setops",
    "recommender_systems_pyspark_spark.operators.asof",
    "recommender_systems_pyspark_spark.operators.aggregates_ext",
    "recommender_systems_pyspark_spark.functions.scalar",
    "recommender_systems_pyspark_spark.functions.text",
    "recommender_systems_pyspark_spark.functions.dedup",
    "recommender_systems_pyspark_spark.functions.similarity",
    "recommender_systems_pyspark_spark.ml.queries",
    "recommender_systems_pyspark_spark.streaming.windows",
    "recommender_systems_pyspark_spark.streaming.stateful",
    "recommender_systems_pyspark_spark.multimodal.media",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (queries grow monotonically per round)
    return dict(_REGISTRY)


# ---------------------------------------------------------------------------
# Deterministic-aggregation helpers (used by every query module)
# ---------------------------------------------------------------------------

def ts_ntz(value: str) -> Column:
    """Timestamp literal matching the fixtures' TIMESTAMP_NTZ columns (the
    parquet files carry TIMESTAMP(NANOS) → Spark reads TIMESTAMP_NTZ; a plain
    TIMESTAMP/LTZ literal would fail type coercion against them)."""
    return F.lit(value).cast("timestamp_ntz")


def exact_sum(expr: Column, alias: str, prec: int = 30, scale: int = 6) -> Column:
    """Order-independent SUM of a double expression.

    Per-row cast to DECIMAL(prec, scale) makes each addend exact, decimal
    addition is associative, and the final cast back to DOUBLE is a single
    deterministic rounding — so Spark's partial/final aggregation order
    cannot change the result, and DuckDB computes the identical value from
    ``SQL_EXACT_SUM``. At 100 TB this costs one widening per row inside
    whole-stage codegen; the aggregation itself stays a hash aggregate with
    map-side partials.
    """
    return F.sum(expr.cast(f"decimal({prec},{scale})")).cast("double").alias(alias)


def exact_avg(expr: Column, alias: str, prec: int = 30, scale: int = 6) -> Column:
    """Deterministic AVG: exact decimal sum → double, divided by exact count."""
    return (
        F.sum(expr.cast(f"decimal({prec},{scale})")).cast("double")
        / F.count(expr)
    ).alias(alias)


def sql_exact_sum(expr: str, alias: str, prec: int = 30, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`exact_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) AS {alias}"


def sql_exact_avg(expr: str, alias: str, prec: int = 30, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`exact_avg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
