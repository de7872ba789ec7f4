"""Session-scoped memoization for per-corpus-version artifacts.

Several query families share an expensive build (the SCC assignment, the
aHash decode pass, the eval-point frame, the BPE merge table) across
multiple registered consumers. Each memoizes per
``(applicationId, sf_dir, …)`` so the FIRST consumer in a sweep pays the
pass reproducibly and later consumers reuse the eagerly checkpointed
result — deliberately in-session, never a disk artifact (a disk cache
would survive across bench runs and turn the cost into a cold/warm
lottery, the VERDICT r12 #2 reproducibility disease).

ADVICE r13 #2: the module-global dicts were never evicted, so a
long-lived process that stops and recreates sessions (bench.py recycles
the session before its streaming block; test suites create many) would
accumulate entries keyed by dead applicationIds, each pinning a
JVM-backed DataFrame handle of a stopped context. :func:`session_memo`
centralizes the pattern and evicts every stale-session key on build, so
at most one session's artifacts are ever held.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")


def session_memo(
    memo: dict[tuple, T],
    spark: SparkSession,
    tail: tuple,
    build: Callable[[], T],
) -> T:
    """Return ``memo[(applicationId, *tail)]``, building (and caching) it
    with ``build()`` on first use. Entries keyed by any OTHER
    applicationId are dropped before inserting — they belong to stopped
    sessions whose JVM-side handles are dead weight."""
    app = spark.sparkContext.applicationId
    key = (app, *tail)
    got = memo.get(key)
    if got is None:
        for stale in [k for k in memo if k[0] != app]:
            del memo[stale]
        got = build()
        memo[key] = got
    return got
