"""Skew-mitigation utilities: the manual salting fallback for joins AQE
can't fix (tests/test_scale_plans.py proves the AQE path; this module is
the deterministic fallback the same test file documents).

When one join key holds a disproportionate share of the fact rows (power-
law users, null-ish sentinel keys), the shuffle partition owning that key
becomes the straggler. Salting splits it S ways:

- fact side: append ``salt = monotonically_increasing_id() % S`` — each
  hot key's rows spread across S (key, salt) buckets;
- dim side: explode each row into all S salts (dim is the small side, so
  the ×S duplication is bounded);
- join on (key, salt), drop the salt. Same rows as the plain join, S-way
  parallelism on the hot key.

Cost model: dim side grows ×S and the fact shuffle key widens — worth it
only when a key exceeds ~1/parallelism of the data. Prefer AQE skew-join
(zero duplication, runtime-detected); salt when the skewed side feeds an
operator with a required distribution AQE won't break, or on engines
without AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON fact[on] == dim[on]`` with an S-way salted
    key. Supports inner and left joins (the fact side keeps exactly its
    plain-join multiplicity because each fact row carries ONE salt and the
    dim side provides every salt exactly once)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if _SALT in fact.columns or _SALT in dim.columns:
        raise ValueError(f"column {_SALT!r} already present")
    salted_fact = fact.withColumn(
        _SALT, (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    dim_cols = [c for c in dim.columns if c != on]
    return (
        salted_fact.join(salted_dim, [on, _SALT], how)
        .select(*fact.columns, *dim_cols)
    )
