"""Focused query timing — the guide §1 isolation loop.

Usage:
    PYTHONPATH=. python tools/measure.py [sf_dir] q1 q2 ...

Runs each named registered query in ONE fresh engine session with the
bench's reclaim between passes: cold pass first (parquet footers, codegen,
shared-memo builds), then the steady-state pass. Prints one JSON line
{"query": {"cold": s, "warm": s}, ...} — directly comparable to bench.py's
queries_cold / queries maps. The noop sink forces full computation of
every column with no driver collect (guide §1.4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    from bench import reclaim
    from recommender_systems_pyspark_spark.registry import all_queries
    from recommender_systems_pyspark_spark.session import get_spark

    spark = get_spark("spark-graft-measure")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return round(dt, 3)

    # identical warmup to bench.py so cold rows mean the same thing
    run("tpch_q6")
    out: dict[str, dict[str, float]] = {}
    for name in args:
        reclaim(spark)
        cold = run(name)
        reclaim(spark)
        warm = run(name)
        out[name] = {"cold": cold, "warm": warm}
        print(f"# {name}: cold {cold} warm {warm}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
