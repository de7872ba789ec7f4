"""Dump .explain("formatted") for named queries to per-query text files.

Usage:
    PYTHONPATH=. python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] q1 q2 ...

Writes OUT_DIR/<query>_<SUFFIX>.txt. Iterative queries execute their
driver-state loops while the frame is built (same as any caller); the
dumped plan is the plan of the returned frame — for a query that ends in
a driver-assembled local frame the interesting "plan" is the loop itself,
which the OPTIMIZATION notes describe.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.01"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    os.makedirs(out_dir, exist_ok=True)
    from recommender_systems_pyspark_spark.registry import all_queries
    from recommender_systems_pyspark_spark.session import get_spark

    spark = get_spark("spark-graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in rest:
        try:
            df = specs[name].fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # pragma: no cover - evidence tool
            txt = f"PLAN CAPTURE FAILED: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({suffix}, {sf_dir}) ==\n{txt}")
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
