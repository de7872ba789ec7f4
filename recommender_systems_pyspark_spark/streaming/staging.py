"""Deterministic micro-batch staging for certified streaming queries.

The file source lists files oldest-mtime-first; with
``maxFilesPerTrigger=1`` each staged file becomes exactly one micro-batch.
Staging a feed as N range-partitioned files with strictly increasing
mtimes therefore replays it as N ordered micro-batches — the mechanism
behind every hash-certified streaming query here (s12 CDC, s13 SCD2
enrichment, s14 anomaly): a REAL multi-batch stream whose final answer
can be compared against a one-shot SQL oracle over the whole feed.
"""

from __future__ import annotations

import glob
import os
import shutil
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def state_sized_partitions(spark: SparkSession, n: int = 8):
    """Run a streaming query with shuffle partitions sized to its STATE
    volume instead of the session's core count. Structured Streaming
    opens one state-store instance per shuffle partition per stateful
    operator and re-opens each every micro-batch — at certification
    state volumes 32 partitions is pure store-churn overhead (bench.py
    measured the stream-stream join at 11.2 s → 3.8 s and the Arrow
    stateful op 5.3 s → 3.1 s going 32 → 8). The production rule is the
    same formula in reverse: partitions ∝ state rows, never core count.
    Restores the prior setting on exit."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def stage_ordered_files(
    feed: DataFrame,
    order_col: str,
    n_batches: int,
    src_dir: str,
    assert_monotone_col: str | None = None,
) -> None:
    """Write ``feed`` into ``src_dir`` as ``n_batches`` single-file
    parquet slices, range-partitioned on ``order_col`` (equal-width
    spans of [0, max]) with strictly increasing mtimes — so a file
    stream with ``maxFilesPerTrigger=1`` replays the feed in
    ``order_col`` order, one span per micro-batch. One scalar collect
    (the max) is the only driver-side data access.

    ``assert_monotone_col``: optionally assert (one grouped agg,
    ``n_batches`` collected rows) that this column is CROSS-BATCH
    monotone — ``max(col in batch i) <= min(col in batch i+1)``. Queries
    whose watermark-safety argument assumes the staged feed is globally
    time-ordered (s15's no-false-timeout / no-dropped-event proof —
    ADVICE r10) pass their event-time column here so a reordered fixture
    fails LOUDLY at staging instead of silently hash-mismatching."""
    os.makedirs(src_dir, exist_ok=True)
    min_v, max_v = feed.agg(F.min(order_col), F.max(order_col)).collect()[0]
    if min_v is not None and min_v < 0:
        # The staging loop's batch-0 predicate is ``>= 0`` — negative keys
        # would be SILENTLY excluded from the staged feed (and, before this
        # guard, from the monotonicity check's domain too — ADVICE r11).
        raise ValueError(
            f"stage_ordered_files requires non-negative {order_col!r}; "
            f"min observed {min_v} would be silently dropped by the "
            f"range predicates — shift the key before staging"
        )
    span = (max_v + n_batches) // n_batches
    if assert_monotone_col is not None:
        # Batch assignment must be the EXACT integer arithmetic of the
        # staging predicates below (``i*span <= col < (i+1)*span``), not a
        # double division: (col/span).cast('long') loses integers above
        # 2^53 and would validate a different partitioning than what is
        # staged (ADVICE r11). ``DIV`` is Spark's integral division.
        stats = (
            feed.groupBy(
                F.expr(f"`{order_col}` DIV {span}").alias("_b")
            )
            .agg(
                F.min(assert_monotone_col).alias("lo"),
                F.max(assert_monotone_col).alias("hi"),
            )
            .orderBy("_b")
            .collect()
        )
        for prev, cur in zip(stats, stats[1:]):
            if prev["hi"] > cur["lo"]:
                raise ValueError(
                    f"staged feed is not {assert_monotone_col}-monotone "
                    f"across batches: batch {prev['_b']} max "
                    f"{prev['hi']} > batch {cur['_b']} min {cur['lo']} — "
                    f"the watermark-safety argument does not hold for "
                    f"this fixture; stage on a {assert_monotone_col}-"
                    f"derived key instead"
                )
    t0 = 1_700_000_000
    for i in range(n_batches):
        stage = os.path.join(src_dir, f"_stage{i}")
        feed.where(
            (F.col(order_col) >= i * span) & (F.col(order_col) < (i + 1) * span)
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"batch{i}.parquet")
        os.rename(part, dst)
        shutil.rmtree(stage)
        os.utime(dst, (t0 + i, t0 + i))
