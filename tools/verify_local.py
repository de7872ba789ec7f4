"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet fixtures, then compares row count, column names, and values
(column-name-sorted, row-sorted, exact for non-floats, bit-exact-with-report
for floats). Exit code 1 on any mismatch.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

# Script-style invocation (python tools/verify_local.py) puts tools/ on
# sys.path, not the repo root — shim it in so the engine package imports
# without requiring PYTHONPATH=. (r5 verdict nit). `python -m
# tools.verify_local` from the repo root works either way.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from recommender_systems_pyspark_spark.registry import all_queries
from recommender_systems_pyspark_spark.session import get_spark
from recommender_systems_pyspark_spark.sources.loaders import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        errs.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return errs
    s, o = canon(sdf), canon(odf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        # The driver's hash is dtype-sensitive: DuckDB HUGEINT (e.g. an
        # uncast SUM over ints) lands in pandas as float64 while Spark
        # returns int64 — numerically equal, hash-mismatched (this is
        # exactly how tpch_q12_style failed r2 while passing here). Treat
        # any int-vs-float kind split as a failure.
        kinds = {sv.dtype.kind, ov.dtype.kind}
        if kinds == {"i", "f"} or kinds == {"u", "f"}:
            errs.append(
                f"col {col}: dtype kind differs (spark={sv.dtype}, "
                f"oracle={ov.dtype}) — driver hash would mismatch; "
                f"CAST the oracle aggregate (HUGEINT→BIGINT?)"
            )
            continue
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sa, oa = sv.astype(float).to_numpy(), ov.astype(float).to_numpy()
            import numpy as np

            both_nan = pd.isna(sa) & pd.isna(oa)
            neq = ~(both_nan | (sa == oa))
            if neq.any():
                diffs = [
                    (float(a), float(b))
                    for a, b in zip(sa[neq][:3], oa[neq][:3])
                ]
                maxd = float(np.nanmax(np.abs(sa - oa)))
                errs.append(
                    f"float col {col}: {int(neq.sum())} rows not bit-equal, "
                    f"max abs diff {maxd:.3e}, e.g. {diffs}"
                )
        else:
            try:
                both_null = pd.isna(sv).to_numpy() & pd.isna(ov).to_numpy()
                eq = (sv.astype(object) == ov.astype(object)).to_numpy() | both_null
            except Exception as e:  # incomparable dtypes
                errs.append(f"col {col}: compare failed ({e}); spark={sv.dtype} oracle={ov.dtype}")
                continue
            if not bool(eq.all()):
                bad = (~eq).nonzero()[0][:3]
                ex = [(sv.iloc[i], ov.iloc[i]) for i in bad]
                errs.append(f"col {col}: {int((~eq).sum())} rows differ, e.g. {ex}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = all_queries()
    spark = get_spark("verify-local")
    con = duck_con(sf_dir)
    failures = 0
    skipped = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        if spec.oracle is None:
            skipped.append(name)
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows):")
            for e in errs:
                print(f"    {e}")
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
    if skipped:
        print(f"rows-only (no oracle): {', '.join(skipped)}")
    print(f"{'FAILURES: ' + str(failures) if failures else 'ALL MATCH'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
