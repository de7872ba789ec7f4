"""Chained stateful streaming aggregation (round 11): hourly window →
daily window re-aggregation inside ONE streaming query — the
multiple-stateful-operator pipeline (SPARK-40925, Spark ≥ 3.4) no other
face exercises. Every prior streaming query here carries exactly one
stateful operator; real metric pipelines chain them (raw → minutely →
hourly → daily) so each tier's state stays small and the sink receives
only finalized coarse rows.

Reference contrast: the app has no streaming (SURVEY.md §2.10) and
aggregates ratings per interaction from scratch; the cascade is the
standing-pipeline equivalent of its hourly/daily rollup needs.

Semantics certified by the oracle replay:

- Tier 1 holds (hour, event_type) state; a window finalizes (emits
  downstream, in append mode) when the eviction watermark passes its
  end.
- Tier 2 consumes the finalized hourly rows — its event-time column is
  ``window_time(w1)`` (the hourly window's end minus one tick) — and
  finalizes a (day, event_type) row when the watermark passes the DAY
  end. ``processAllAvailable`` runs the cascading no-data flush batches
  that let the final watermark advance drain BOTH tiers.
- Emitted set: exactly the days whose end ≤ final watermark
  (ms-floored global max ts − delay). The staged feed is ts-monotone
  across batches (asserted — same contract as s15), so no row is ever
  late and the admit/evict two-watermark split (SPARK-40925, modeled
  explicitly by s10's oracle) cannot drop anything here: the oracle is
  a pure one-shot GROUP BY over the closed days.

Values fold as integer cents (the engine's one-rounding-rule
``floor(x·100+0.5)``) so both tiers' sums are order- and
batch-boundary-independent bigints.

Scale: tier-1 state is (hours-in-horizon × event types) rows; tier-2
state is (days-in-horizon × event types) — each micro-batch shuffles
only its own rows into each tier's hash aggregate with map-side
partials. The chain moves the sink from ~24× smaller: this is the
pre-aggregation cascade a 100 TB metrics pipeline uses to keep its
serving store write rate sane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_DELAY = "53 minutes"  # off the hour/day grid, same device as s10's 97
_N_BATCHES = 4


def hour_day_rollup(events: DataFrame) -> DataFrame:
    """Attach the two-tier window cascade to an event stream. ``events``
    needs (ts TIMESTAMP, event_type, value_cents)."""
    hourly = (
        events.withWatermark("ts", _DELAY)
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(
            F.count("*").alias("n1"),
            F.sum("value_cents").alias("c1"),
        )
    )
    return (
        hourly.groupBy(
            F.window(F.window_time("w1"), "1 day").alias("w2"), "event_type"
        )
        .agg(F.sum("n1").alias("n_events"), F.sum("c1").alias("cents_total"))
        .select(
            F.col("w2.start").alias("window_start"),
            "event_type",
            "n_events",
            "cents_total",
        )
    )


@query(
    "s16_stream_hour_day_rollup",
    oracle=f"""
    WITH fw AS (
      SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL '{_DELAY}' AS wm
      FROM events
    )
    SELECT date_trunc('day', e.ts) AS window_start,
           e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents_total
    FROM events e, fw
    WHERE date_trunc('day', e.ts) + INTERVAL 1 DAY <= fw.wm
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def s16_stream_hour_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the hourly→daily cascade as a REAL 4-micro-batch stream over
    the events fixture and return every FINALIZED daily row. The oracle
    is the one-shot daily GROUP BY restricted to days closed by the
    final watermark — hash equality certifies both tiers' finalization
    boundaries and the exact-integer value fold through the chain (the
    fixture's last day stays open and must NOT appear)."""
    import os
    import shutil
    import tempfile

    from .staging import stage_ordered_files

    prior_tz = spark.conf.get("spark.sql.session.timeZone")
    d = tempfile.mkdtemp(prefix="s16_rollup_")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        feed = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type", "value"
        )
        stage_ordered_files(
            feed,
            "event_id",
            _N_BATCHES,
            os.path.join(d, "src"),
            assert_monotone_col="ts",
        )
        stream = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp_ntz, event_type string, "
                "value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "src"))
            .select(
                F.col("ts").cast("timestamp").alias("ts"),
                "event_type",
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                .cast("long")
                .alias("value_cents"),
            )
        )
        sink = "s16_stream_hour_day_rollup_sink"
        from .staging import state_sized_partitions

        with state_sized_partitions(spark):
            q = (
                hour_day_rollup(stream)
                .writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        return (
            spark.table(sink)
            .select(
                F.col("window_start").cast("timestamp_ntz").alias("window_start"),
                "event_type",
                "n_events",
                "cents_total",
            )
            .orderBy("window_start", "event_type")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior_tz)
        shutil.rmtree(d, ignore_errors=True)
