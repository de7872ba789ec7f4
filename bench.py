"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full computation on
executors, no driver collect — measures the engine, not py4j transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "flagship_top_orders",
    "d1_month_rollup",
    "j1_inner_join_agg",
    "j2_left_join_agg",
    "t1_topk_orders",
    "a1_a4_global_aggs",
    # Extension headliners (added r2 — these set their own baseline, same
    # rule as r1): one each from dedup, similarity, text, streaming-batch.
    "x_dedup_exact",
    "x_knn_cosine_topk",
    "x_text_quality",
    "s1_tumbling_window",
    # Round-3 headliners (set their own baseline on first recorded run):
    # the heaviest new aggregate shape and the token-shuffle text op.
    "a10_stat_moments",
    "x_line_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from recommender_systems_pyspark_spark.registry import all_queries
    from recommender_systems_pyspark_spark.session import get_spark

    spark = get_spark("spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warmup: JVM/codegen/parquet-footer caches on the smallest headliner.
    run("tpch_q6")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name in specs:
            timings[name] = round(run(name), 4)

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
