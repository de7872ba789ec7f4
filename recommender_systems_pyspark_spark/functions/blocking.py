"""Blocked pair generation for string-similarity matching (entity
resolution, edit-distance dedup) — the shared candidate-pair primitive
behind ``x_entity_resolution_e2e`` and ``x_levenshtein_blocked``.

The defect this module exists to prevent (VERDICT r9 #2/#3): a self-join
whose only EQUI-key is a coarse block column (e.g. ``c_nationkey``, 25
distinct values) with the length bound left as a non-equi post-filter
*inside* the join. Catalyst can only hash-partition on the equi-keys, so
at scale each coarse block degenerates to within-block all-pairs —
O(Σ n_b²) over a handful of skew-concentrated blocks. The fix is to make
the length part of the shuffle key itself: for a ``|Δlen| ≤ d`` contract,
the pair set is EXACTLY the union over δ ∈ {0..d} of equi-joins on
``(block_cols…, len)`` × ``(block_cols…, len + δ)`` — lossless, and every
branch is a plain hash join whose key now includes the length, so block
sizes shrink from n_b to n_{b,ℓ} and the join never sees a pair outside
the bound (instead of generating and discarding it).

Unit-cost Levenshtein ≥ |length difference|, so for an edit-distance
threshold t the ``|Δlen| ≤ t`` blocking is sound (no false negatives);
callers may tighten d below t as part of their operator contract. For
long strings compose a content key in front instead (q-gram prefix or
MinHash band from :mod:`.dedup`) — length blocks alone don't bound
comparisons when most strings share a length.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    len_col: str,
    block_cols: tuple[str, ...],
    max_dlen: int,
) -> DataFrame:
    """All unordered pairs of ``df`` rows sharing ``block_cols`` values
    with ``|a.len - b.len| <= max_dlen``, emitted id-ordered as columns
    ``a_<c>`` / ``b_<c>`` for every column of ``df`` (``a_<id> <
    b_<id>``; ``id_col`` must be unique and orderable, ``len_col``
    integer, block columns null-free — SQL equi-join semantics drop
    null block keys).

    Implementation: one equi-join per δ ∈ {0..max_dlen}, each keyed on
    the FULL ``(block_cols…, len)`` tuple (the right side shifted by δ)
    so the length bound rides the shuffle key. δ = 0 dedupes by the id
    order predicate; δ ≥ 1 branches are disjoint by construction (each
    unordered pair with length gap δ appears exactly once, shorter row
    on the left) and are re-oriented to id order afterwards. Branch
    count is max_dlen + 1 — constant — and the union is a cheap
    UnionExec over identically-shaped hash joins.
    """
    cols = df.columns
    if id_col not in cols or len_col not in cols:
        raise KeyError(f"{id_col!r}/{len_col!r} must be columns of df")
    a = df.select([F.col(c).alias(f"a_{c}") for c in cols])
    b = df.select([F.col(c).alias(f"b_{c}") for c in cols])
    a_id, b_id = F.col(f"a_{id_col}"), F.col(f"b_{id_col}")

    def join_cond(delta: int) -> Column:
        conds = [F.col(f"a_{c}") == F.col(f"b_{c}") for c in block_cols]
        conds.append(F.col(f"a_{len_col}") + delta == F.col(f"b_{len_col}"))
        return reduce(lambda x, y: x & y, conds)

    swapped = [F.col(f"b_{c}").alias(f"a_{c}") for c in cols] + [
        F.col(f"a_{c}").alias(f"b_{c}") for c in cols
    ]
    parts = [a.join(b, join_cond(0)).where(a_id < b_id)]
    for delta in range(1, max_dlen + 1):
        j = a.join(b, join_cond(delta))
        parts.append(j.where(a_id < b_id))
        parts.append(j.where(a_id > b_id).select(*swapped))
    return reduce(DataFrame.unionByName, parts)
