"""Distributed Bloom-filter decontamination (round 7).

The 100 TB story: screening a pretraining corpus against a benchmark
blocklist with an exact join shuffles the full token stream against the
blocklist every run (`x_contamination_ngrams` is that exact tier). A
Bloom filter compresses the ENTIRE blocklist — any size — into ``m`` bits
that broadcast to every executor, so the corpus-side screen is map-only
membership tests plus one per-doc aggregation: no corpus shuffle against
the blocklist at all, at the price of a bounded, deterministic
false-positive rate (flagged docs then go to the exact verifier, the
classic two-tier screen — same shape as MinHash→verify in the dedup
family).

Everything is native DataFrame ops — no driver-side bitmap, no UDFs:

- BUILD: blocklist tokens × k seeded md5 hashes → bit positions → 32-bit
  words via ``groupBy(word).agg(bit_or(1<<bit))`` — the filter IS a tiny
  DataFrame (m/32 rows) built with one shuffle of the (small) blocklist.
- PROBE: corpus tokens × k hashes → broadcast-join the word table →
  token flagged iff ALL k probed bits are set. The broadcast is ≤ m/32
  rows regardless of blocklist size — that is the whole point.

Determinism: the md5 int idiom is portable (memory: cross-engine-
determinism-gotchas), bit positions/words/masks are exact integers, and
``bit_or`` exists as an aggregate in both engines — so even the FALSE
POSITIVES are bit-identical across Spark and DuckDB, and the oracle gate
hashes the complete screen including its FP behavior. The query also
emits the exact-membership count per doc (semi-join tier), so the
recorded result certifies "no false negatives, FPs bounded" row by row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables

#: Filter geometry: m = 2^15 bits in 32-bit words; k = 3 hash functions.
_M_BITS = 1 << 15
_WORD = 32
_K = 3

#: Blocklist slice: every 13th doc plays the held-out benchmark corpus.
_BENCH_MOD = 13


def _pos(term, seed: int):
    """Portable seeded hash position: md5 of the seeded term, first 8 hex
    chars as int, mod m."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"s{seed}:"), term)), 1, 8), 16, 10)
        .cast("bigint")
        % _M_BITS
    )


def _sql_pos(term: str, seed: int) -> str:
    return (
        f"(('0x' || substr(md5('s{seed}:' || {term}), 1, 8))::BIGINT % {_M_BITS})"
    )


def _seeds_sql(term: str) -> str:
    return ", ".join(_sql_pos(term, j) for j in range(_K))


@query(
    "x_bloom_decontaminate",
    oracle=f"""
    WITH bench_tok AS (
      SELECT DISTINCT t.term
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id % {_BENCH_MOD} = 0) t
    ),
    bits AS (
      SELECT DISTINCT p.pos FROM bench_tok,
           LATERAL (SELECT unnest([{_seeds_sql('term')}]) AS pos) p
    ),
    words AS (
      SELECT CAST(pos // {_WORD} AS BIGINT) AS word,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % {_WORD} AS INTEGER))
                  AS BIGINT) AS mask
      FROM bits GROUP BY 1
    ),
    corpus_tok AS (
      SELECT DISTINCT doc_id, t.term
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id % {_BENCH_MOD} <> 0) t
    ),
    probes AS (
      SELECT doc_id, term, p.pos,
             CAST(p.pos // {_WORD} AS BIGINT) AS word,
             CAST(p.pos % {_WORD} AS INTEGER) AS bit
      FROM corpus_tok,
           LATERAL (SELECT unnest([{_seeds_sql('term')}]) AS pos) p
    ),
    tok_hits AS (
      SELECT doc_id, term,
             SUM(CASE WHEN (COALESCE(w.mask, 0) & (CAST(1 AS BIGINT) << bit))
                           <> 0
                      THEN 1 ELSE 0 END) AS n_bits_set
      FROM probes LEFT JOIN words w USING (word)
      GROUP BY doc_id, term
    ),
    flagged AS (
      SELECT doc_id, term, n_bits_set = {_K} AS bloom_hit
      FROM tok_hits
    ),
    exact AS (
      SELECT doc_id, term, TRUE AS true_hit
      FROM corpus_tok WHERE term IN (SELECT term FROM bench_tok)
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN f.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN e.true_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true
    FROM flagged f
    LEFT JOIN exact e ON e.doc_id = f.doc_id AND e.term = f.term
    GROUP BY f.doc_id
    ORDER BY f.doc_id
    """,
)
def x_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-screen every non-benchmark document's distinct tokens against
    the benchmark (doc_id%{bm}==0) vocabulary: m={m} bits, k={k} seeded
    md5 hashes, 32-bit words built with bit_or and broadcast to the
    probe. Emits per doc: distinct tokens, Bloom-flagged tokens, and
    exact-membership tokens (certifying zero false negatives and the
    deterministic FP surplus)."""
    docs = tables(spark, sf_dir)["documents"]
    tok = lambda pred: (  # noqa: E731 - tiny local splitter
        docs.where(pred)
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    bench = tok(F.col("doc_id") % _BENCH_MOD == 0).select("term").distinct()
    bits = (
        bench.select(
            F.explode(F.array(*[_pos(F.col("term"), j) for j in range(_K)])).alias("pos")
        )
        .distinct()
    )
    words = bits.groupBy(
        F.expr(f"CAST(pos div {_WORD} AS BIGINT)").alias("word")
    ).agg(
        F.expr(f"CAST(bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))) AS BIGINT)").alias("mask")
    )
    corpus = tok(F.col("doc_id") % _BENCH_MOD != 0)
    probes = corpus.select(
        "doc_id",
        "term",
        F.explode(F.array(*[_pos(F.col("term"), j) for j in range(_K)])).alias("pos"),
    ).select(
        "doc_id",
        "term",
        F.expr(f"CAST(pos div {_WORD} AS BIGINT)").alias("word"),
        F.expr(f"CAST(pos % {_WORD} AS INT)").alias("bit"),
    )
    tok_hits = (
        probes.join(F.broadcast(words), "word", "left")
        .select(
            "doc_id",
            "term",
            # column-valued shift amount needs the SQL form (the Python
            # F.shiftleft only takes a literal numBits)
            F.expr(
                "CAST((coalesce(mask, CAST(0 AS BIGINT)) "
                "& shiftleft(CAST(1 AS BIGINT), bit)) != 0 AS INT)"
            ).alias("bit_set"),
        )
        .groupBy("doc_id", "term")
        .agg((F.sum("bit_set") == _K).alias("bloom_hit"))
    )
    exact = corpus.join(bench, "term", "left_semi").select(
        "doc_id", "term", F.lit(True).alias("true_hit")
    )
    return (
        tok_hits.join(exact, ["doc_id", "term"], "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.sum(F.when(F.col("true_hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_true"),
        )
        .orderBy("doc_id")
    )


x_bloom_decontaminate.__doc__ = x_bloom_decontaminate.__doc__.format(
    bm=_BENCH_MOD, m=_M_BITS, k=_K
)
