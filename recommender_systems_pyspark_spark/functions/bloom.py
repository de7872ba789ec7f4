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


# ---------------------------------------------------------------------------
# Two-tier decontamination funnel: Bloom screen → exact verify (round 8)
# ---------------------------------------------------------------------------

#: n-gram width for the funnel's contamination unit (GPT-3 appendix C
#: screens 13-grams; 3 keeps fixture overlap sparse but non-trivial).
_E2E_N = 3


def _sql_trigrams(pred: str) -> str:
    """DuckDB distinct (doc_id, tri) for documents matching ``pred``."""
    return f"""
      SELECT DISTINCT doc_id, t.tri
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, len(string_split(text, ' ')) - {_E2E_N} + 2),
                 i -> array_to_string(
                        string_split(text, ' ')[i : i + {_E2E_N - 1}], ' ')))
                 AS tri
        FROM documents
        WHERE len(string_split(text, ' ')) >= {_E2E_N} AND ({pred})
      ) t
    """


@query(
    "x_decontam_e2e",
    oracle=f"""
    WITH train_tri AS ({_sql_trigrams(f'doc_id % {_BENCH_MOD} <> 0')}),
    bench_tri AS (
      SELECT DISTINCT tri FROM ({_sql_trigrams(f'doc_id % {_BENCH_MOD} = 0')})
    ),
    bits AS (
      SELECT DISTINCT p.pos FROM bench_tri,
           LATERAL (SELECT unnest([{_seeds_sql('tri')}]) AS pos) p
    ),
    words AS (
      SELECT CAST(pos // {_WORD} AS BIGINT) AS word,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % {_WORD} AS INTEGER))
                  AS BIGINT) AS mask
      FROM bits GROUP BY 1
    ),
    probes AS (
      SELECT doc_id, tri, CAST(p.pos // {_WORD} AS BIGINT) AS word,
             CAST(p.pos % {_WORD} AS INTEGER) AS bit
      FROM train_tri,
           LATERAL (SELECT unnest([{_seeds_sql('tri')}]) AS pos) p
    ),
    flagged AS (
      SELECT doc_id, tri
      FROM probes LEFT JOIN words w USING (word)
      GROUP BY doc_id, tri
      HAVING SUM(CASE WHEN (COALESCE(w.mask, 0)
                            & (CAST(1 AS BIGINT) << bit)) <> 0
                      THEN 1 ELSE 0 END) = {_K}
    ),
    verified AS (
      SELECT doc_id, tri FROM flagged
      WHERE tri IN (SELECT tri FROM bench_tri)
    ),
    per_doc AS (
      SELECT d.doc_id,
             COALESCE(t.n, 0) AS n_tri,
             COALESCE(f.n, 0) AS n_flagged,
             COALESCE(v.n, 0) AS n_verified
      FROM (SELECT doc_id FROM documents WHERE doc_id % {_BENCH_MOD} <> 0) d
      LEFT JOIN (SELECT doc_id, COUNT(*) n FROM train_tri GROUP BY 1) t
        USING (doc_id)
      LEFT JOIN (SELECT doc_id, COUNT(*) n FROM flagged GROUP BY 1) f
        USING (doc_id)
      LEFT JOIN (SELECT doc_id, COUNT(*) n FROM verified GROUP BY 1) v
        USING (doc_id)
    )
    SELECT stage, n_docs, n_ngrams FROM (
      SELECT '00_train_corpus' AS stage,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tri) AS BIGINT) AS n_ngrams, 0 AS o FROM per_doc
      UNION ALL
      SELECT '10_bloom_suspects',
             CAST(SUM(CASE WHEN n_flagged > 0 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(n_flagged) AS BIGINT), 1 FROM per_doc
      UNION ALL
      SELECT '20_exact_contaminated',
             CAST(SUM(CASE WHEN n_verified > 0 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(n_verified) AS BIGINT), 2 FROM per_doc
      UNION ALL
      SELECT '21_bloom_fp_survivors',
             CAST(SUM(CASE WHEN n_flagged > 0 AND n_verified = 0
                           THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN n_verified = 0 THEN n_flagged ELSE 0 END)
                  AS BIGINT), 3 FROM per_doc
      UNION ALL
      SELECT '30_clean_output',
             CAST(SUM(CASE WHEN n_verified = 0 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN n_verified = 0 THEN n_tri ELSE 0 END)
                  AS BIGINT), 4 FROM per_doc
    ) ORDER BY o
    """,
)
def x_decontam_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-TIER decontamination funnel, composed end-to-end with per-stage
    drop accounting (the VERDICT r7 stretch goal): a Bloom filter over
    the benchmark's distinct {n}-grams screens every training document
    map-side (tier 1), and ONLY the flagged n-grams proceed to the exact
    semi-join verifier (tier 2) — false positives are caught there and
    their documents survive; true contamination is dropped. Emits the
    funnel manifest: corpus in → Bloom suspects → exact-contaminated →
    FP survivors → clean output, in both documents and n-grams, so
    ``suspects = contaminated + fp_survivors`` and ``clean = corpus −
    contaminated`` are certified row-by-row (and the FP row proves the
    "FPs go to the exact tier" story the module docstring tells).

    Scale shape at 100 TB: tier 1 broadcasts the m/32-row word table and
    never shuffles the corpus; tier 2's exact join input is the FLAGGED
    n-grams only — a benchmark-sized sliver of the token stream instead
    of all of it (that reduction is the whole reason two-tier screens
    exist; compare `x_contamination_ngrams`, the exact tier alone, which
    shuffles every training n-gram into its semi join). The per-doc
    verdicts aggregate on the uniform doc_id key; the 5-row manifest is
    the only global fold."""
    docs = tables(spark, sf_dir)["documents"]
    words = F.split("text", " ")
    ntok = F.size(words)
    tris = F.when(
        ntok >= _E2E_N,
        F.transform(
            F.sequence(F.lit(1), ntok - _E2E_N + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, _E2E_N)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = docs.select("doc_id", F.explode(F.array_distinct(tris)).alias("tri"))
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench_tri = tri.where(is_bench).select("tri").distinct()
    train_tri = tri.where(~is_bench)

    # tier-1 build: bench n-grams → k bit positions → m/32-row word table
    words_tbl = (
        bench_tri.select(
            F.explode(
                F.array(*[_pos(F.col("tri"), j) for j in range(_K)])
            ).alias("pos")
        )
        .distinct()
        .groupBy(F.expr(f"CAST(pos div {_WORD} AS BIGINT)").alias("word"))
        .agg(
            F.expr(
                f"CAST(bit_or(shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pos % {_WORD} AS INT))) AS BIGINT)"
            ).alias("mask")
        )
    )
    # tier-1 probe: map-only against the broadcast word table
    flagged = (
        train_tri.select(
            "doc_id",
            "tri",
            F.explode(
                F.array(*[_pos(F.col("tri"), j) for j in range(_K)])
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "tri",
            F.expr(f"CAST(pos div {_WORD} AS BIGINT)").alias("word"),
            F.expr(f"CAST(pos % {_WORD} AS INT)").alias("bit"),
        )
        .join(F.broadcast(words_tbl), "word", "left")
        .select(
            "doc_id",
            "tri",
            F.expr(
                "CAST((coalesce(mask, CAST(0 AS BIGINT)) "
                "& shiftleft(CAST(1 AS BIGINT), bit)) != 0 AS INT)"
            ).alias("bit_set"),
        )
        .groupBy("doc_id", "tri")
        .agg(F.sum("bit_set").alias("nbits"))
        .where(F.col("nbits") == _K)
        .select("doc_id", "tri")
    )
    # tier-2 exact verify — input is ONLY the flagged n-grams
    verified = flagged.join(F.broadcast(bench_tri), "tri", "left_semi")

    base = docs.where(~is_bench).select("doc_id")
    per_doc = (
        base.join(train_tri.groupBy("doc_id").agg(F.count("*").alias("n_tri")), "doc_id", "left")
        .join(flagged.groupBy("doc_id").agg(F.count("*").alias("n_flagged")), "doc_id", "left")
        .join(verified.groupBy("doc_id").agg(F.count("*").alias("n_verified")), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tri", F.lit(0).cast("long")).alias("n_tri"),
            F.coalesce("n_flagged", F.lit(0).cast("long")).alias("n_flagged"),
            F.coalesce("n_verified", F.lit(0).cast("long")).alias("n_verified"),
        )
    )

    def _stage(order, name, doc_pred, gram_col):
        return per_doc.agg(
            F.lit(name).alias("stage"),
            F.sum(F.when(doc_pred, 1).otherwise(0)).cast("bigint").alias("n_docs"),
            F.sum(gram_col).cast("bigint").alias("n_ngrams"),
            F.lit(order).alias("o"),
        )

    t, fl, v = F.col("n_tri"), F.col("n_flagged"), F.col("n_verified")
    manifest = (
        _stage(0, "00_train_corpus", F.lit(True), t)
        .unionByName(_stage(1, "10_bloom_suspects", fl > 0, fl))
        .unionByName(_stage(2, "20_exact_contaminated", v > 0, v))
        .unionByName(
            _stage(3, "21_bloom_fp_survivors", (fl > 0) & (v == 0),
                   F.when(v == 0, fl).otherwise(F.lit(0)))
        )
        .unionByName(
            _stage(4, "30_clean_output", v == 0,
                   F.when(v == 0, t).otherwise(F.lit(0)))
        )
    )
    return manifest.orderBy("o").drop("o")


x_decontam_e2e.__doc__ = x_decontam_e2e.__doc__.format(n=_E2E_N)
