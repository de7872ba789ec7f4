"""Blocked pair generation for string-similarity matching (entity
resolution, edit-distance dedup): :func:`blocked_pairs` — the shared
(block, length)-keyed primitive behind ``x_entity_resolution_e2e`` and
``x_levenshtein_blocked`` — and :func:`passjoin_pairs_ed1` — the
content-pigeonhole PassJoin behind ``x_passjoin_ed1``, the lossless
path when lengths cannot discriminate.

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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query


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


# ---------------------------------------------------------------------------
# PassJoin (τ = 1): content-pigeonhole blocking for edit-distance joins
# ---------------------------------------------------------------------------
#
# Length blocking (above) cannot discriminate when strings share a length
# (the fixture's fixed-width names are the extreme case). PassJoin
# (Li/Deng/Feng, VLDB 2011) blocks on CONTENT instead: partition every
# index string into τ+1 segments — an edit destroys at most one segment
# per unit of distance, so any string within distance τ must contain at
# least one segment VERBATIM as a substring, shifted by at most τ. The
# probe side therefore enumerates, for each candidate index length
# L ∈ [len−τ, len+τ], the substrings at each segment's ±τ position
# window, and candidates come from a plain equi-join on
# (segment_id, L, substring) — the segment CONTENT is the shuffle key,
# so block sizes follow substring selectivity, not length histograms.

#: Minimum participating string length (keeps every segment non-empty
#: and the position windows well-formed). Part of the operator contract.
PASSJOIN_MIN_LEN = 4


def passjoin_pairs_ed1(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """All unordered pairs of ``df`` rows whose ``str_col`` values are
    within unit-cost edit distance 1 (equal strings included), emitted
    id-ordered as (a_<id>, b_<id>, a_<str>, b_<str>, dist). Strings
    shorter than ``PASSJOIN_MIN_LEN`` do not participate (contract).

    Candidate generation is the τ=1 PassJoin: the index side emits its
    2 segments keyed by (segment_id, own length, segment text); the
    probe side emits, for each candidate index length L ∈ {m−1, m, m+1}
    and each segment window start δ ∈ {−1, 0, +1}, the equal-length
    substring at that position. One edit destroys at most one segment
    and shifts the other by at most 1, so every true pair collides on
    at least one key — lossless (pytest proves pair-set equality with
    the naive all-pairs form). The exact ``levenshtein`` then verifies
    candidates. Per row: 2 index rows + ≤18 probe rows, constant; the
    join key carries the segment CONTENT, so this scales where length
    blocking cannot (uniform-length corpora)."""
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).alias("m"),
    ).where(F.col("m") >= PASSJOIN_MIN_LEN)

    # Both sides are built as ONE map-only pass each (posexplode of
    # inline structs), never a union of re-scans: at 100 TB the probe
    # side would otherwise read the corpus 18 times.
    half = F.expr("m DIV 2")
    index = s.select(
        "id",
        "s",
        "m",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("seg"),
                    F.col("s").substr(F.lit(1), half).alias("piece"),
                ),
                F.struct(
                    F.lit(1).alias("seg"),
                    F.col("s").substr(half + 1, F.col("m") - half).alias("piece"),
                ),
            )
        ).alias("ix"),
    ).select("id", "s", "m", F.col("ix.seg").alias("seg"), F.col("ix.piece").alias("piece"))

    probe_structs = []
    for dl in (-1, 0, 1):
        # candidate INDEX length L = m + dl; its segments start at 0 and
        # L div 2 with lengths L div 2 and L - L div 2
        L = F.col("m") + dl
        l0 = F.expr(f"(m + {dl}) DIV 2")
        l1 = L - l0
        for seg, (pos, ln) in ((0, (F.lit(0), l0)), (1, (l0, l1))):
            for delta in (-1, 0, 1):
                start = pos + delta
                probe_structs.append(
                    F.struct(
                        L.alias("L"),
                        F.lit(seg).alias("seg"),
                        F.when(
                            (start >= 0) & (start + ln <= F.col("m")) & (ln >= 1),
                            F.col("s").substr(start + 1, ln),
                        ).alias("piece"),
                    )
                )
    probe = (
        s.select(
            F.col("id").alias("p_id"),
            F.col("s").alias("p_s"),
            F.col("m").alias("p_m"),
            F.explode(F.array(*probe_structs)).alias("pr"),
        )
        .select(
            "p_id",
            "p_s",
            "p_m",
            F.col("pr.L").alias("L"),
            F.col("pr.seg").alias("seg"),
            F.col("pr.piece").alias("piece"),
        )
        .where(F.col("piece").isNotNull() & (F.col("L") >= PASSJOIN_MIN_LEN))
    )

    cand = index.join(
        probe,
        (index["seg"] == probe["seg"])
        & (index["m"] == probe["L"])
        & (index["piece"] == probe["piece"]),
    ).where(F.col("id") != F.col("p_id"))
    pairs = (
        cand.select(
            F.least("id", "p_id").alias("a_id"),
            F.greatest("id", "p_id").alias("b_id"),
            F.when(F.col("id") < F.col("p_id"), F.col("s")).otherwise(F.col("p_s")).alias("a_s"),
            F.when(F.col("id") < F.col("p_id"), F.col("p_s")).otherwise(F.col("s")).alias("b_s"),
        )
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("dist", F.levenshtein("a_s", "b_s"))
        .where(F.col("dist") <= 1)
    )
    return pairs.select(
        F.col("a_id").alias(f"a_{id_col}"),
        F.col("b_id").alias(f"b_{id_col}"),
        F.col("a_s").alias(f"a_{str_col}"),
        F.col("b_s").alias(f"b_{str_col}"),
        "dist",
    )


@query(
    "x_passjoin_ed1",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, substr(text, 1, 40) AS title
      FROM documents
      WHERE length(substr(text, 1, 40)) >= {PASSJOIN_MIN_LEN}
        AND octet_length(encode(substr(text, 1, 40)))
              = length(substr(text, 1, 40))
    ),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             levenshtein(a.title, b.title) AS dist
      FROM t a JOIN t b
        ON a.doc_id < b.doc_id
       AND abs(length(a.title) - length(b.title)) <= 1
      WHERE levenshtein(a.title, b.title) <= 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COALESCE(SUM(CASE WHEN dist = 0 THEN 1 END), 0) AS BIGINT)
             AS n_exact,
           CAST(COALESCE(SUM(CASE WHEN dist = 1 THEN 1 END), 0) AS BIGINT)
             AS n_one_edit,
           (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM (
              SELECT a_id AS d FROM pairs
              UNION ALL SELECT b_id FROM pairs)) AS n_docs_involved
    FROM pairs
    """,
)
def x_passjoin_ed1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 title near-dup ledger via PassJoin CONTENT
    blocking (:func:`passjoin_pairs_ed1`) — the lossless scale path for
    exactly the case length blocking cannot discriminate
    (uniform-length strings): candidates come from an equi-join whose
    shuffle key is a half-string segment, so block sizes follow content
    selectivity. ASCII titles only (both engines' ``levenshtein`` then
    count identical units — same contract as the media oracles); titles
    are the first 40 characters, min length {minlen}. The oracle is the
    naive all-pairs ground truth (sf-gated quadratic, like every dedup
    verifier); the Spark side never leaves the pigeonhole join."""
    from ..sources import tables

    docs = tables(spark, sf_dir)["documents"]
    title = F.substring("text", 1, 40)
    t = docs.select("doc_id", title.alias("title")).where(
        F.octet_length("title") == F.length("title")
    )
    # the verified pair set feeds two aggregations (global stats + the
    # distinct-doc count) — materialize it once instead of replaying the
    # candidate join per consumer
    pairs = passjoin_pairs_ed1(t, "doc_id", "title").localCheckpoint(eager=True)
    stats = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(F.sum((F.col("dist") == 0).cast("long")), F.lit(0).cast("long")).alias("n_exact"),
        F.coalesce(F.sum((F.col("dist") == 1).cast("long")), F.lit(0).cast("long")).alias("n_one_edit"),
    )
    involved = pairs.select(
        F.explode(F.array("a_doc_id", "b_doc_id")).alias("d")
    ).agg(F.countDistinct("d").alias("n_docs_involved"))
    return stats.crossJoin(involved)


x_passjoin_ed1.__doc__ = x_passjoin_ed1.__doc__.format(minlen=PASSJOIN_MIN_LEN)
