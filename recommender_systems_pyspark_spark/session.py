"""One SparkSession factory for the whole engine.

The reference builds four near-duplicate sessions (SURVEY.md §2.11:
``utils/data_loader.py:29-37``, ``utils/recommender.py:21-29``,
``utils/user.py:17-25``, ``utils/imb_rating.py:12-19``). Here there is exactly
one factory; every config it sets is chosen for cluster scale, not just
local mode:

- AQE on (runtime re-planning: partition coalescing, skew-join splitting,
  broadcast-join conversion) — supersedes the reference's hand-rolled
  ``repartition(4/2)/coalesce(1)`` row-count heuristics.
- ``spark.sql.shuffle.partitions`` sized from the environment; on a real
  cluster this is a starting width that AQE coalesces down.
- Arrow enabled so any driver collection / pandas interchange is columnar.
- Session timezone pinned to UTC so timestamp semantics are stable across
  driver, executors, and the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs applied when WE build the session. When the driver hands us an
#: existing session (the `__spark_entry__` contract) we do not mutate it
#: beyond runtime-settable SQL confs.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Driver fixtures carry parquet TIMESTAMP(NANOS); with this conf Spark 4
    # reads them as TIMESTAMP_NTZ (micros precision) instead of erroring.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 128 MiB input splits: at 100 TB that is ~800k tasks for a full scan,
    # which a 1000-executor cluster drains in waves; larger values risk
    # executor OOM on wide rows, smaller ones drown the scheduler.
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def default_parallelism() -> int:
    """Shuffle width default: driver exports SPARK_GRAFT_CPUS on this rig."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_driver_memory() -> str:
    """Driver-heap default derived from the machine, not hardcoded.

    A flat 16g default OOM-kills the JVM inside cgroup-limited containers
    with less RAM (ADVICE r5). Take ~40% of physical memory, clamped to
    [2g, 16g]; SPARK_GRAFT_DRIVER_MEMORY stays the explicit knob for long
    verify sessions. Probe failures fall back to a conservative 4g.
    """
    try:
        total_bytes = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        gb = max(2, min(16, int(total_bytes * 0.4 / (1 << 30))))
    except (ValueError, OSError, AttributeError):
        gb = 4
    return f"{gb}g"


def get_spark(app_name: str = "spark-graft", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine session.

    Local test rig: ``local[$SPARK_GRAFT_CPUS]``. On a cluster the master
    comes from spark-submit; nothing here assumes local mode.
    """
    width = shuffle_partitions or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{default_parallelism()}]"))
        .config("spark.sql.shuffle.partitions", str(width))
        # In local mode the driver JVM IS every executor; Spark's 1g
        # default heap dies under a long sf0.1 verify session (observed:
        # py4j connection loss ~150 queries in). The default scales with
        # physical RAM (clamped 2–16g) so cgroup-limited hosts don't get
        # OOM-killed; a builder config is only a default — spark-submit /
        # an existing JVM always wins, so this does not constrain cluster
        # deployments.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", _default_driver_memory()),
        )
    )
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally provided session
    (e.g. the driver's). Static confs (master, memory) are left alone."""
    runtime = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    for k, v in runtime.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some deployments
            pass
    return spark
