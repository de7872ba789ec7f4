"""Runtime plan guardrails: the engine-wide scale invariants
(tests/test_scale_plans.py) packaged as a library callable BEFORE a job
is submitted — a pre-flight check for ad-hoc pipelines, the same way
a15-a17 (operators/stats.py) are the pre-flight checks for data shape.

What counts as a scalability defect (each one turns a distributed job
into a single-machine job at 100 TB):

- **Cartesian product** — an equi-join whose condition quietly
  degenerated (alias typo, lost key column) shuffles |A|×|B| rows.
- **Unpartitioned window** — ``Window.orderBy(...)`` with no
  ``partitionBy`` compiles to ``Exchange SinglePartition`` + a ONE-TASK
  sort of the entire input (Spark itself warns "No Partition Defined for
  Window operation"). Global ranks/tiles belong in
  ``operators.ranking.with_global_row_number/with_global_ntile``.

Usage::

    from recommender_systems_pyspark_spark.plans import assert_scalable
    assert_scalable(df)                     # raises PlanScalabilityError
    findings = scalability_findings(df)     # or inspect non-fatally
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PlanScalabilityError(RuntimeError):
    """A physical plan contains a shape that cannot scale out."""


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _window_line_is_unpartitioned(stripped: str) -> bool:
    """``Window [exprs](, [partitionSpec])(, [orderSpec])`` with empty
    specs omitted. Order specs always carry a sort direction (ASC/DESC);
    partition specs never do — so a window line with no second bracket
    group, or whose only trailing group is a sort order, has no
    partitioning."""
    n_specs = stripped.count("], [")
    if n_specs >= 2:
        return False
    trailing = stripped.rsplit("], [", 1)[-1] if n_specs else ""
    return n_specs == 0 or " ASC" in trailing or " DESC" in trailing


def scalability_findings(df: DataFrame) -> list[str]:
    """Inspect ``df``'s physical plan; return human-readable findings
    (empty list = clean). Non-fatal twin of :func:`assert_scalable`."""
    plan = _physical_plan(df)
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append(
            "CartesianProduct: join condition carries no usable equi-key — "
            "the shuffle is |left|x|right|. Restore the key columns or "
            "broadcast an explicitly tiny side."
        )
    for line in plan.splitlines():
        stripped = line.lstrip(" +-:*")
        if stripped.startswith("Window ") and _window_line_is_unpartitioned(stripped):
            findings.append(
                "unpartitioned Window (Exchange SinglePartition + one-task "
                f"sort of the full input): {stripped[:120]} — use "
                "operators.ranking.with_global_row_number/with_global_ntile "
                "for global ranks, or add a partitionBy."
            )
    return findings


def assert_scalable(df: DataFrame, *, allow: frozenset[str] = frozenset()) -> None:
    """Raise :class:`PlanScalabilityError` if ``df``'s plan contains a
    known non-scalable shape. ``allow`` whitelists finding prefixes
    (``"CartesianProduct"``, ``"unpartitioned Window"``) for the rare
    bounded-by-construction case — the same escape hatch the engine's own
    test invariant documents per query."""
    findings = [
        f for f in scalability_findings(df)
        if not any(f.startswith(a) for a in allow)
    ]
    if findings:
        raise PlanScalabilityError(
            "plan will not scale out:\n- " + "\n- ".join(findings)
        )


def plan_indicators(df: DataFrame, *, executed: bool = False) -> dict[str, int]:
    """Coarse plan metrics (shuffles, broadcasts, scans, sorts, reuse) —
    the per-query numbers tools/plan_audit.py tabulates. With
    ``executed`` the caller has already run an action on ``df`` and the
    AQE final plan (including ReusedExchange collapses) is measured."""
    import re

    plan = _physical_plan(df).split("== Initial Plan ==")[0]
    return {
        "shuffles": len(
            re.findall(
                r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning)",
                plan,
            )
        ),
        "single_partition_exchanges": len(re.findall(r"Exchange SinglePartition", plan)),
        "broadcasts": len(re.findall(r"\bBroadcastExchange\b", plan)),
        "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
        "parquet_scans": len(re.findall(r"FileScan parquet", plan)),
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }
