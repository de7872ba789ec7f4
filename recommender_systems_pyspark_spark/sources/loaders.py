"""Parquet table sources (the engine's storage layer).

The reference stages everything in Postgres and reads it back over JDBC
(SURVEY.md §2.1 S2; ``utils/recommender.py:49-50``, ``utils/imb_rating.py:34-44``,
``app.py:163``). The engine's primary store is parquet: columnar, splittable,
with min/max pruning and predicate/column pushdown that Catalyst applies for
free. JDBC remains available as an optional connector (``sources.jdbc``).

Scale notes (100 TB):
- One ``spark.read.parquet`` per table — scans parallelize by row-group;
  ``spark.sql.files.maxPartitionBytes`` (session.py) sizes the splits.
- ``DIM_TABLES`` are the always-broadcast side: region/nation/supplier stay
  tiny at every scale factor (they scale with the key space, not the fact
  volume), so joins against them must never shuffle the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Every table the driver fixtures provide (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables that are always safe to broadcast (bounded cardinality).
DIM_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier"})

#: Columns stored as parquet TIMESTAMP(NANOS) — read as long nanos (see
#: load_table) and normalized to TIMESTAMP_NTZ at microsecond precision,
#: matching what DuckDB's reader exposes for the same files.
NANO_TS_COLUMNS: frozenset[str] = frozenset({"ts"})


#: Plan cache: per-SparkSession (weakly referenced — dies with the session)
#: → {(sf_dir, table): DataFrame}. DataFrames are immutable logical plans
#: BOUND TO THEIR SESSION, so reusing one across queries in that session is
#: free and saves a file-listing + footer-read + several py4j round trips
#: per construction — but a plan must never leak to a sibling
#: ``newSession()`` (different temp views/confs). Fixture files are
#: read-only (TESTDATA.md), so plans cannot go stale within a session.
import weakref

_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Lazy; filters/projections placed on the result are
    pushed into the parquet reader by Catalyst."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    session_cache = _PLAN_CACHE.setdefault(spark, {})
    cached = session_cache.get((sf_dir, name))
    if cached is not None:
        return cached
    try:
        # events.parquet carries TIMESTAMP(NANOS), which Spark's reader
        # rejects outright; with this conf it arrives as LongType nanos
        # (normalized below). This is the one conf load_table sets on a
        # caller's session — without it the scan errors, and it changes
        # nothing for tables that carry no nano timestamps. The session
        # TIMEZONE is deliberately NOT touched (ADVICE.md r1): the
        # conversion below is timezone-independent.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - static-conf deployments
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from pyspark.sql import functions as F  # local import keeps module load light
    from pyspark.sql.types import LongType

    for field in df.schema.fields:
        if field.name in NANO_TS_COLUMNS and isinstance(field.dataType, LongType):
            # integer `div` (not /) — double division would wobble at 2^53.
            # timestampadd on an NTZ epoch base is pure integer micro
            # arithmetic: exact, and independent of the session timezone
            # (the previous LTZ hop required pinning the session to UTC).
            df = df.withColumn(
                field.name,
                F.expr(
                    f"timestampadd(MICROSECOND, {field.name} div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    session_cache[(sf_dir, name)] = df
    return df


class _LazyTables(dict):
    """dict façade over load_table that constructs a table's DataFrame on
    first access — queries touch 1-3 tables, so eagerly building all 10
    plans per query call was pure overhead."""

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        df = load_table(self._spark, self._sf_dir, name)
        self[name] = df
        return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a (lazily-materialized) dict — the standard entry
    point for query functions."""
    return _LazyTables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
