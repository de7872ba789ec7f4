"""Training-data pipeline operators over the ``documents`` table: winnowing
fingerprints (rolling hash), sequence packing, benchmark-contamination
screening, deterministic shard assignment, and per-language quota sampling.

These are the corpus-curation stages BETWEEN the per-document text ops
(functions/text.py) and the dedup/similarity families (functions/dedup.py,
functions/similarity.py): the steps that turn a filtered document set into
training shards. The reference repo (a recommender app) has no counterpart —
this module is part of the engine's LLM-pipeline extension surface declared
in SURVEY.md §2.13.

Scale posture (the point of every design choice here):
- Fingerprinting, contamination n-gram extraction, and shard assignment are
  MAP-ONLY column expressions inside whole-stage codegen — a 100 TB corpus
  streams through them with zero shuffles.
- The only shuffles are the ones that ARE the semantics: one hash
  aggregation per contamination side, one (lang, shard)-keyed window for
  packing, one per-lang top-k for quota sampling.
- Cross-engine determinism: every hash is plain integer arithmetic
  (polynomial rolling hash mod a prime, md5-hex-prefix mod shard count)
  computed identically by Spark expressions and the DuckDB oracle — no
  engine-private hash functions (xxhash64, DuckDB ``hash``) anywhere on the
  oracle-checked surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables

#: Rolling-hash parameters: polynomial base/modulus (small prime modulus so
#: every intermediate fits a 64-bit signed int in BOTH engines: acc < 1e9+7,
#: acc*31 + 255 < 3.2e10 « 2^63).
_HASH_BASE = 31
_HASH_MOD = 1_000_000_007
#: Winnowing geometry (Schleimer/Wilkerson/Aiken, "Winnowing: Local
#: Algorithms for Document Fingerprinting", SIGMOD 2003): k-char grams,
#: window of w consecutive gram hashes, keep each window's minimum.
_GRAM_K = 8
_WINNOW_W = 16
#: Sequence packing: concat-and-chunk capacity in tokens (a stand-in for a
#: 4096-token training context; small so fixture bins are multi-doc).
_PACK_CAPACITY = 256
#: Contamination screening n-gram order. Real benchmark screens use 8-13;
#: the fixtures' ~30-word vocabulary makes 3 the order where overlap is
#: non-vacuous at test scale (the operator is order-agnostic).
_CONTAM_N = 3
#: Benchmark membership: doc_id % 97 == 0 marks the held-out benchmark rows.
_BENCH_MOD = 97
_N_SHARDS = 64
_QUOTA_PER_LANG = 50


def _rolling_hash(codes: Column) -> Column:
    """Left-fold polynomial hash of an array<long> of char codes.

    Bit-exact twin of the oracle's ``list_reduce(list_prepend(0, codes), …)``
    — both are strict left folds starting from 0, and every step stays in
    int64 range (see _HASH_MOD note above).
    """
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _HASH_BASE + c) % _HASH_MOD,
    )


def _char_codes() -> Column:
    """text → array<long> of per-character codepoints (ASCII fixtures; the
    oracle's ``ord`` twin is codepoint-based too, so parity holds for any
    BMP text both engines split identically)."""
    return F.transform(F.split("text", ""), lambda c: F.ascii(c).cast("long"))


def _md5_shard(key: Column, n_shards: int) -> Column:
    """Engine-portable uniform shard id: first 8 md5 hex digits → int → mod.

    md5 hex is identical everywhere, so the SAME row lands in the SAME shard
    in Spark, DuckDB, or any other system — the property a cross-engine
    pipeline needs for reproducible training shards. (Spark's xxhash64 /
    DuckDB's hash() are faster but engine-private; they'd make shards
    irreproducible across systems.)
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )


def _sql_md5_shard(key: str, n_shards: int) -> str:
    """DuckDB twin of :func:`_md5_shard`."""
    return (
        f"CAST(CONCAT('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" % {n_shards}"
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling hash)
# ---------------------------------------------------------------------------


@query(
    "x_fingerprint_winnow",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             list_transform(string_split(text, ''),
                            c -> CAST(ord(c) AS BIGINT)) AS codes
      FROM documents
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(codes) >= {_GRAM_K} THEN
               list_transform(range(1, len(codes) - {_GRAM_K} + 2),
                 i -> list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                                     codes[i : i + {_GRAM_K - 1}]),
                        (a, b) -> (a * {_HASH_BASE} + b) % {_HASH_MOD}))
             ELSE CAST([] AS BIGINT[]) END AS grams
      FROM base
    ), wins AS (
      SELECT doc_id,
             CASE WHEN len(grams) >= {_WINNOW_W} THEN
               list_transform(range(1, len(grams) - {_WINNOW_W} + 2),
                 j -> list_min(grams[j : j + {_WINNOW_W - 1}]))
             ELSE [list_min(grams)] END AS raw_fps
      FROM grams
    )
    SELECT doc_id,
           CAST(len(list_sort(list_distinct(raw_fps))) AS INTEGER) AS n_fps,
           array_to_string(list_sort(list_distinct(raw_fps)), ',') AS fps_csv
    FROM wins
    """,
)
def x_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: rolling polynomial hash over every
    {k}-char gram, then the minimum hash of each {w}-gram window, distinct.

    This is the MOSS fingerprinting scheme (Schleimer et al., SIGMOD 2003):
    any shared substring of length ≥ k + w − 1 between two documents is
    GUARANTEED to share a fingerprint, so matching fps_csv entries across
    docs localize near-duplicate passages — finer-grained than the
    whole-document md5 of x_fingerprint and cheaper than shingle Jaccard.

    Plan shape: map-only (scan → project), zero shuffles; at 100 TB the
    corpus streams through one codegen stage. The downstream use — explode
    fingerprints and self-join on the fp key — is the same bucketed-join
    scale path as MinHash-LSH (functions/dedup.py), never all-pairs.
    """
    t = tables(spark, sf_dir)
    # Each intermediate array gets its OWN projection so it is a plain input
    # attribute of the next stage — computed once per row. Folding all of it
    # into one select duplicates the `grams` subtree into every winnow-lambda
    # invocation (Catalyst inlines lambda-captured expressions), turning an
    # O(chars · w) row into O(chars² · k): ~1000× slower, measured.
    codes = _char_codes()
    n = F.size(F.col("codes"))
    grams = F.when(
        n >= _GRAM_K,
        F.transform(
            F.sequence(F.lit(1), n - _GRAM_K + 1),
            lambda i: _rolling_hash(F.slice(F.col("codes"), i, _GRAM_K)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    g = F.size(F.col("grams"))
    raw_fps = F.when(
        g >= _WINNOW_W,
        F.transform(
            F.sequence(F.lit(1), g - _WINNOW_W + 1),
            lambda j: F.array_min(F.slice(F.col("grams"), j, _WINNOW_W)),
        ),
    ).otherwise(F.array(F.array_min(F.col("grams"))))
    fps = F.array_sort(F.array_distinct(F.col("raw_fps")))
    return (
        t["documents"]
        .select("doc_id", codes.alias("codes"))
        .select("doc_id", grams.alias("grams"))
        .select("doc_id", raw_fps.alias("raw_fps"))
        .select("doc_id", fps.alias("fps"))
        .select(
            "doc_id",
            F.size("fps").alias("n_fps"),
            F.concat_ws(
                ",", F.transform("fps", lambda x: x.cast("string"))
            ).alias("fps_csv"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


@query(
    "x_seq_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             {_sql_md5_shard('doc_id', 16)} AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), pos AS (
      SELECT doc_id, lang, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id)
               - n_tokens AS start_off
      FROM toks
    )
    SELECT lang, CAST(shard AS INTEGER) AS shard,
           CAST(floor(start_off / {_PACK_CAPACITY}) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM pos
    GROUP BY lang, shard, bin_id
    """,
)
def x_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining, concat-and-chunk flavor: lay
    documents end-to-end in deterministic (lang, shard, doc_id) order and
    cut {cap}-token bins; a doc belongs to the bin its START offset falls
    in. Emits per-bin occupancy — the shard manifest a trainer reads.

    Why concat-and-chunk and not first-fit-decreasing: FFD is inherently
    sequential per bin-set, while concat-and-chunk is one window cumsum —
    fully parallel across (lang, shard) groups and what production LLM
    pipelines (GPT-style packing) actually do; boundary docs are split at
    train time by the loader, not the planner.

    Scale: the cumsum window partitions by (lang, shard), NOT lang alone —
    5 languages would give 5 window tasks at 100 TB (a straggler disaster);
    16 md5 shards per language bound each task's input regardless of corpus
    size (raise _N_SHARDS proportionally at real scale). One shuffle on the
    window key, one map-side-combinable aggregation on the same key.
    """
    t = tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        "lang",
        _md5_shard(F.col("doc_id"), 16).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    pos = toks.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        pos.groupBy(
            "lang",
            F.col("shard").cast("int").alias("shard"),
            F.floor(F.col("start_off") / _PACK_CAPACITY).alias("bin_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination screening
# ---------------------------------------------------------------------------


@query(
    "x_contamination_ngrams",
    oracle=f"""
    WITH tri AS (
      SELECT DISTINCT doc_id, t.tri
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, len(string_split(text, ' ')) - {_CONTAM_N} + 2),
                 i -> array_to_string(
                        string_split(text, ' ')[i : i + {_CONTAM_N - 1}],
                        ' '))) AS tri
        FROM documents
        WHERE len(string_split(text, ' ')) >= {_CONTAM_N}
      ) t
    ), bench AS (
      SELECT DISTINCT tri FROM tri WHERE doc_id % {_BENCH_MOD} = 0
    ), train AS (
      SELECT * FROM tri WHERE doc_id % {_BENCH_MOD} <> 0
    ), totals AS (
      SELECT doc_id, COUNT(*) AS n_ngrams FROM train GROUP BY doc_id
    ), matched AS (
      SELECT doc_id, COUNT(*) AS n_matched
      FROM train SEMI JOIN bench USING (tri)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(t.n_ngrams, 0) AS n_ngrams,
           COALESCE(m.n_matched, 0) AS n_matched,
           (CASE WHEN COALESCE(t.n_ngrams, 0) > 0
                 THEN CAST(COALESCE(m.n_matched, 0) AS DOUBLE) / t.n_ngrams
                 ELSE CAST(0.0 AS DOUBLE) END) AS contamination_rate
    FROM (SELECT doc_id FROM documents WHERE doc_id % {_BENCH_MOD} <> 0) d
    LEFT JOIN totals t USING (doc_id)
    LEFT JOIN matched m USING (doc_id)
    """,
)
def x_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: fraction of each training document's
    distinct word {n}-grams that also occur in the held-out benchmark split
    (doc_id % {mod} == 0 stands in for an eval-set manifest).

    The decontamination pass every serious pretraining corpus runs (GPT-3
    appendix C, The Pile, FineWeb): docs with high overlap get dropped or
    have spans excised before training.

    Plan shape: one map-only n-gram explode feeding BOTH sides; the
    benchmark n-gram set is distinct-ed small (eval suites are MBs, not
    TBs) and BROADCAST to the semi join, so the train side never shuffles
    its exploded n-grams — the only shuffles are the two per-doc hash
    aggregations on the uniform doc_id key. At 100 TB: map → broadcast-semi
    → agg, no all-pairs anywhere.
    """
    t = tables(spark, sf_dir)
    words = F.split("text", " ")
    n = F.size(words)
    tris = F.when(
        n >= _CONTAM_N,
        F.transform(
            F.sequence(F.lit(1), n - _CONTAM_N + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, _CONTAM_N)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = t["documents"].select(
        "doc_id", F.explode(F.array_distinct(tris)).alias("tri")
    )
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = tri.where(is_bench).select("tri").distinct()
    train = tri.where(~is_bench)
    totals = train.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    matched = (
        train.join(F.broadcast(bench), "tri", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    base = t["documents"].where(~is_bench).select("doc_id")
    n_ngrams = F.coalesce(F.col("n_ngrams"), F.lit(0).cast("long"))
    n_matched = F.coalesce(F.col("n_matched"), F.lit(0).cast("long"))
    return (
        base.join(totals, "doc_id", "left")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            n_ngrams.alias("n_ngrams"),
            n_matched.alias("n_matched"),
            F.when(
                n_ngrams > 0, n_matched.cast("double") / n_ngrams
            )
            .otherwise(F.lit(0.0))
            .alias("contamination_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic shard assignment
# ---------------------------------------------------------------------------


@query(
    "x_shard_assign",
    oracle=f"""
    SELECT {_sql_md5_shard('doc_id', _N_SHARDS)} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents
    GROUP BY shard_id
    """,
)
def x_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: md5-prefix hash of doc_id
    mod {n} shards, with per-shard occupancy stats (the shard manifest).

    This is the "global shuffle" step of a training pipeline made
    reproducible: the md5-based shard is a pure column expression, so the
    same doc lands in the same shard across engines and re-runs — unlike
    ``repartition(n)`` (round-robin, run-dependent) or xxhash64 (engine-
    private). The writer path is ``df.withColumn("shard", …).write
    .partitionBy("shard")`` — one uniform hash shuffle; the manifest query
    here is its map-side-combinable audit.
    """
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy(_md5_shard(F.col("doc_id"), _N_SHARDS).alias("shard_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Per-language quota sampling
# ---------------------------------------------------------------------------


@query(
    "x_quota_sample",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(row_number() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER)
             AS sample_rank
    FROM documents
    QUALIFY sample_rank <= {_QUOTA_PER_LANG}
    """,
)
def x_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota (stratified) sampling: at most {q} documents per language,
    chosen by md5-of-key order — a deterministic, engine-portable uniform
    draw (md5 hex order is a uniform permutation of the keys), so the
    sampled corpus is reproducible anywhere.

    This is how a curation pipeline balances language mix: cap the
    over-represented strata instead of down-weighting at train time.

    Scale: rank-within-group is a single hash shuffle on lang; with few,
    huge strata the right plan is a two-pass threshold (approximate the
    quota'th md5 quantile per lang from a sample, pre-filter, exact-rank
    the survivors) — same output, and the pre-filter discards ~all rows
    map-side. The fixture strata are small, so the direct window is the
    honest plan here.
    """
    t = tables(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        t["documents"]
        .select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .where(F.col("sample_rank") <= _QUOTA_PER_LANG)
    )


# ---------------------------------------------------------------------------
# Composed funnel: decontaminate -> quota-sample -> pack -> shard manifest
# ---------------------------------------------------------------------------

#: Contamination drop gate for the e2e funnel: rate >= 1/10, compared as
#: 10*matched >= n_ngrams — integers only, no float boundary.
_E2E_CONTAM_DEN = 10


def _sql_tokens_e2e() -> str:
    tri_unnest = f"""
        SELECT doc_id,
               unnest(list_transform(
                 range(1, len(string_split(text, ' ')) - {_CONTAM_N} + 2),
                 i -> array_to_string(
                        string_split(text, ' ')[i : i + {_CONTAM_N - 1}],
                        ' '))) AS tri
        FROM documents
        WHERE len(string_split(text, ' ')) >= {_CONTAM_N}
    """
    return f"""
    WITH train AS (
      SELECT doc_id, lang, {_sql_md5_shard('doc_id', 16)} AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    tri AS (
      SELECT DISTINCT doc_id, t.tri FROM ({tri_unnest}) t
      WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    bencht AS (
      SELECT DISTINCT t.tri FROM ({tri_unnest}) t
      WHERE doc_id % {_BENCH_MOD} = 0
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
    matched AS (
      SELECT doc_id, COUNT(*) AS m
      FROM tri SEMI JOIN bencht USING (tri) GROUP BY doc_id
    ),
    status0 AS (
      SELECT tr.doc_id, tr.lang, tr.shard, tr.n_tokens,
             (COALESCE(t.n, 0) > 0
              AND COALESCE(m.m, 0) * {_E2E_CONTAM_DEN} >= COALESCE(t.n, 0))
               AS contaminated
      FROM train tr
      LEFT JOIN totals t USING (doc_id)
      LEFT JOIN matched m USING (doc_id)
    ),
    q AS (
      SELECT doc_id, row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qrank
      FROM status0 WHERE NOT contaminated
    ),
    status AS (
      SELECT s.*,
             (NOT s.contaminated AND q.qrank > {_QUOTA_PER_LANG})
               AS quota_dropped,
             (NOT s.contaminated AND q.qrank <= {_QUOTA_PER_LANG}) AS packed
      FROM status0 s LEFT JOIN q USING (doc_id)
    ),
    pos AS (
      SELECT lang, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id)
               - n_tokens AS start_off
      FROM status WHERE packed
    ),
    bins AS (
      SELECT lang, shard,
             COUNT(DISTINCT floor(start_off / {_PACK_CAPACITY})) AS n_bins,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM pos GROUP BY lang, shard
    ),
    man AS (
      SELECT lang, shard, COUNT(*) AS n_in,
             CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
             CAST(SUM(CASE WHEN quota_dropped THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quota_dropped,
             CAST(SUM(CASE WHEN packed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_packed
      FROM status GROUP BY lang, shard
    )
    SELECT m.lang, CAST(m.shard AS INTEGER) AS shard, m.n_in,
           m.n_contaminated, m.n_quota_dropped, m.n_packed,
           COALESCE(b.n_bins, 0) AS n_bins,
           COALESCE(b.total_tokens, 0) AS total_tokens
    FROM man m LEFT JOIN bins b USING (lang, shard)
    """


@query("x_tokens_e2e", oracle=_sql_tokens_e2e())
def x_tokens_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed shard-publish funnel — the stages a pretraining pipeline
    runs between a curated corpus and training shards, fused end-to-end:

    1. benchmark DECONTAMINATION: drop training docs whose distinct
       3-gram overlap with the held-out benchmark split reaches 1/10
       (integer gate ``10*matched >= n_ngrams`` — no float boundary);
    2. per-language QUOTA sampling (at most 50 docs/lang, md5-order
       deterministic draw);
    3. concat-and-chunk PACKING of the survivors into 256-token bins
       per (lang, md5-shard-of-16);
    4. the per-(lang, shard) MANIFEST a trainer reads: docs in, dropped
       per stage, docs packed, bins, token totals.

    Every stage is individually certified (`x_contamination_ngrams`,
    `x_quota_sample`, `x_seq_packing`, `x_shard_assign`); this query
    certifies their COMPOSITION against one whole-funnel oracle — drop
    accounting included, so `n_in = n_contaminated + n_quota_dropped +
    n_packed` holds row-by-row.

    Scale shape: the benchmark n-gram set is distinct-ed small and
    BROADCAST to the semi join (eval suites are MBs); contamination
    totals are per-doc hash aggs on the uniform doc_id key; the quota
    window shuffles once on lang (two-pass threshold at mega-strata, see
    x_quota_sample); packing windows on (lang, shard) — 16 md5 shards
    bound every window task regardless of corpus size. No stage is
    quadratic; nothing collects to the driver."""
    t = tables(spark, sf_dir)
    docs = t["documents"]
    is_bench = F.col("doc_id") % _BENCH_MOD == 0

    words = F.split("text", " ")
    ntok = F.size(words)
    tris = F.when(
        ntok >= _CONTAM_N,
        F.transform(
            F.sequence(F.lit(1), ntok - _CONTAM_N + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, _CONTAM_N)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = docs.select(
        "doc_id", F.explode(F.array_distinct(tris)).alias("tri")
    )
    bencht = tri.where(is_bench).select("tri").distinct()
    train_tri = tri.where(~is_bench)
    totals = train_tri.groupBy("doc_id").agg(F.count("*").alias("n"))
    matched = (
        train_tri.join(F.broadcast(bencht), "tri", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("m"))
    )

    train = docs.where(~is_bench).select(
        "doc_id",
        "lang",
        _md5_shard(F.col("doc_id"), 16).alias("shard"),
        ntok.cast("long").alias("n_tokens"),
    )
    n = F.coalesce("n", F.lit(0).cast("long"))
    m = F.coalesce("m", F.lit(0).cast("long"))
    status0 = (
        train.join(totals, "doc_id", "left")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "shard",
            "n_tokens",
            ((n > 0) & (m * _E2E_CONTAM_DEN >= n)).alias("contaminated"),
        )
    )
    wq = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    q = (
        status0.where(~F.col("contaminated"))
        .select("doc_id", F.row_number().over(wq).alias("qrank"))
    )
    status = status0.join(q, "doc_id", "left").select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        "contaminated",
        (~F.col("contaminated") & (F.col("qrank") > _QUOTA_PER_LANG)).alias(
            "quota_dropped"
        ),
        (~F.col("contaminated") & (F.col("qrank") <= _QUOTA_PER_LANG)).alias(
            "packed"
        ),
    )

    wp = Window.partitionBy("lang", "shard").orderBy("doc_id")
    pos = (
        status.where("packed")
        .withColumn("start_off", F.sum("n_tokens").over(wp) - F.col("n_tokens"))
    )
    bins = pos.groupBy("lang", "shard").agg(
        F.countDistinct(F.floor(F.col("start_off") / _PACK_CAPACITY)).alias(
            "n_bins"
        ),
        F.sum("n_tokens").alias("total_tokens"),
    )
    man = status.groupBy("lang", "shard").agg(
        F.count("*").alias("n_in"),
        F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
        F.sum(F.col("quota_dropped").cast("long")).alias("n_quota_dropped"),
        F.sum(F.col("packed").cast("long")).alias("n_packed"),
    )
    return (
        man.join(bins, ["lang", "shard"], "left")
        .select(
            "lang",
            F.col("shard").cast("int").alias("shard"),
            "n_in",
            "n_contaminated",
            "n_quota_dropped",
            "n_packed",
            F.coalesce("n_bins", F.lit(0).cast("long")).alias("n_bins"),
            F.coalesce("total_tokens", F.lit(0).cast("long")).alias(
                "total_tokens"
            ),
        )
    )
