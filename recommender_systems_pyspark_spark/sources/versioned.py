"""Versioned snapshot store: overwrite-with-history over plain parquet —
the minimal table-format core (snapshot isolation + time travel) the
reference's destructive ``mode="overwrite"`` reloads
(``utils/data_loader.py:144-146``) lack.

Layout::

    path/
      v=1/  v=2/  ...     # immutable snapshot directories
      _latest              # publish log: one version per line, last = current

Protocol (single-writer, many-reader):
- A writer lands the full snapshot under ``v=N`` FIRST, then publishes
  by atomically replacing ``_latest`` (write-temp + ``os.replace`` —
  atomic on POSIX). Readers resolve ``_latest`` once and then only ever
  touch the immutable ``v=N`` directory, so a concurrent publish can
  never tear a read.
- A crash between data-write and publish leaves an orphan ``v=N`` that
  no reader sees; the next write reuses the next free version and
  ``vacuum`` sweeps orphans.

This is deliberately the local-FS model of what Delta/Iceberg do with a
transaction log; on object stores the publish step becomes the table
format's atomic metadata swap. sinks._swap_dirs is the 1-version special
case of this module.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_latest"
_VDIR = re.compile(r"^v=(\d+)$")


def _versions_on_disk(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _VDIR.match(name)
        if m and os.path.isdir(os.path.join(path, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def _published_log(path: str) -> list[int]:
    mf = os.path.join(path, _MANIFEST)
    if not os.path.exists(mf):
        return []
    with open(mf) as f:
        return [int(line) for line in f.read().split() if line]


def published_version(path: str) -> int | None:
    """The version readers currently resolve, or None before first publish."""
    log = _published_log(path)
    return log[-1] if log else None


def list_versions(path: str) -> list[int]:
    """All PUBLISHED versions still on disk. Orphans — written but never
    published (crashed writer) — never enter the publish log, so ``v <=
    latest`` can never smuggle one in."""
    published = set(_published_log(path))
    return [v for v in _versions_on_disk(path) if v in published]


def write_snapshot(
    df: DataFrame, path: str, partition_by: tuple[str, ...] | None = None
) -> int:
    """Land ``df`` as the next snapshot and publish it. Returns the new
    version number. Data lands fully before the manifest flips, so
    readers see either the old or the new snapshot, never a mix.

    ``partition_by`` hive-partitions the snapshot directory (one subdir
    per key combination) — combined with a caller-side
    ``df.repartition(*partition_by)``, each key lands as EXACTLY one
    file (all rows of a key share one task; the writer splits a task's
    output per partition directory), which is what the compaction
    operator relies on."""
    os.makedirs(path, exist_ok=True)
    existing = _versions_on_disk(path)
    version = (existing[-1] + 1) if existing else 1
    writer = df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(path, f"v={version}"))
    log = _published_log(path) + [version]
    tmp = os.path.join(path, f"{_MANIFEST}.tmp.{version}")
    with open(tmp, "w") as f:
        f.write("\n".join(str(v) for v in log))
    os.replace(tmp, os.path.join(path, _MANIFEST))  # atomic publish
    return version


def read_snapshot(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Time travel: latest published snapshot, or an explicit version.
    Unpublished (orphan) versions are not readable — they were never
    committed."""
    pub = published_version(path)
    if pub is None:
        raise FileNotFoundError(f"no published snapshot at {path}")
    if version is None:
        version = pub
    if version not in list_versions(path):
        raise FileNotFoundError(f"version {version} not published at {path} (latest={pub})")
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the last ``keep_last`` published snapshots plus any
    orphans. Returns the removed version numbers. Time travel shrinks to
    the retained window — same contract as table-format VACUUM."""
    if published_version(path) is None:
        return []
    keep = set(list_versions(path)[-keep_last:])
    removed = []
    for v in _versions_on_disk(path):
        if v not in keep:  # published-but-old, or a never-published orphan
            shutil.rmtree(os.path.join(path, f"v={v}"))
            removed.append(v)
    return removed
