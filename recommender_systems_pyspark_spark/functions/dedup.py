"""Deduplication operators over ``documents`` (north-star extension):
exact hash dedup, shingle-Jaccard near-dup, MinHash+LSH, SimHash.

Scale architecture (100 TB):
- Exact dedup is a hash groupBy — one shuffle on the digest, perfectly
  parallel, no skew (hashes are uniform).
- The all-pairs shingle-Jaccard query is the *verifier*, quadratic by
  nature; it exists to define ground truth at oracle scale. The scale path
  is MinHash+LSH: signatures are map-only, banding shuffles once on
  (band, band_hash), and only same-bucket candidates are verified —
  linearithmic instead of quadratic.
- SimHash gives a 64-bit sketch per doc (map-only via higher-order
  aggregate, no explode) for hamming-distance blocking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables

#: SQL fragment: distinct 3-gram token shingles of ``text`` (1-indexed).
_SQL_SHINGLES = """
    CASE WHEN len(string_split(text, ' ')) >= 3
         THEN list_distinct(list_transform(
                generate_series(1, len(string_split(text, ' ')) - 2),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i+1] || ' ' ||
                     string_split(text, ' ')[i+2]))
         ELSE [text] END
"""


def _spread(docs: DataFrame) -> DataFrame:
    """Repartition the corpus to full parallelism before a CPU-dense
    sketch stage. Fixture corpora are one small parquet file → one scan
    task → the O(shingles × 64) signature folds run on a single core; at
    production scale the file layout provides the splits and this shuffle
    of raw text is noise next to the sketch compute it parallelizes."""
    return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")


def shingles() -> Column:
    """Distinct 3-gram token shingles of ``text`` (0-indexed transform) —
    the unit of near-duplicate comparison. Pure codegen; no explode.

    NOTE: the inline ``split(text, ' ')`` is evaluated once per shingle
    position times three (projection collapse re-inlines it into the
    lambda — the pathology :func:`containment_shingles` documents).
    Prefer :func:`shingled`, which materializes the token array once per
    document before a pipeline-breaking exchange; this expression form
    survives only for frames that cannot carry a ``toks`` column."""
    toks = "split(text, ' ')"
    return F.when(
        F.expr(f"size({toks}) >= 3"),
        F.expr(
            f"array_distinct(transform(sequence(0, size({toks}) - 3),"
            f" i -> concat_ws(' ', {toks}[i], {toks}[i+1], {toks}[i+2])))"
        ),
    ).otherwise(F.array(F.col("text")))


def shingled(docs: DataFrame, *extra: str) -> DataFrame:
    """``(doc_id, *extra, sh)`` — the 3-gram shingle arrays with the token
    array materialized ONCE per document before the spread exchange, so
    the transform downstream of the exchange reads the ``toks`` column
    instead of re-splitting the text 3× per shingle position (the
    containment_shingles fix, applied to the dedup family's shingler:
    measured 5.0 s → 0.6 s for the bare shingle pass at sf0.1, and the
    compute runs at full width instead of inside the single scan task).
    Bit-identical output: ``concat_ws(' ', toks[i], toks[i+1], toks[i+2])``
    over the materialized array is the same string the inline form built."""
    toked = _spread(
        docs.select("doc_id", *extra, "text", F.split("text", " ").alias("toks"))
    )
    sh = F.when(
        F.expr("size(toks) >= 3"),
        F.expr(
            "array_distinct(transform(sequence(0, size(toks) - 3),"
            " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
        ),
    ).otherwise(F.array(F.col("text")))
    return toked.select("doc_id", *extra, sh.alias("sh"))


def jaccard(a: Column, b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| on distinct-element arrays, in double."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


@query(
    "x_dedup_exact",
    oracle="""
    SELECT sha256(lower(trim(text))) AS content_hash,
           COUNT(*) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM documents
    GROUP BY content_hash
    """,
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonicalize → sha256 → groupBy digest; keep the lowest
    doc_id per group. One uniform-key shuffle; the dedup'd corpus is the
    semi-join of documents against keep_doc_id."""
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy(F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("content_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
    )


@query(
    "x_dedup_shingle_pairs",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard_sim
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    """,
)
def x_dedup_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs (ground truth): all pairs with 3-gram
    shingle Jaccard ≥ 0.8. Deliberately quadratic — the oracle-scale
    verifier that x_dedup_minhash_lsh approximates sub-quadratically."""
    t = tables(spark, sf_dir)
    s = shingled(t["documents"])
    a = s.alias("a")
    b = s.alias("b")
    sim = jaccard(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            sim.alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= 0.8)
    )


#: MinHash parameters: 16 permutations in 4 bands of 4 rows.
#: P(candidate | j) = 1 - (1 - j^4)^4 → ~1.0 at j=0.95, ~0.39 at j=0.5.
_NUM_HASHES = 16
_BAND_ROWS = 4


def minhash_signature() -> Column:
    """16-slot MinHash signature: per permutation i, min over shingles of
    md5(i ⧺ shingle) — the min is LEXICOGRAPHIC on the hex string, which
    equals numeric min of the big-endian digest, so any engine computes
    the identical signature (md5 hex is canonical everywhere; xxhash64,
    the previous choice, is Spark-private). Higher-order functions only —
    the signature is computed inside codegen with no shuffle and no
    explode."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(_NUM_HASHES - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)),
            )
        ),
    )


@query(
    "x_dedup_minhash_lsh",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents),
    sig AS (
      SELECT doc_id,
             list_transform(range(0, {_NUM_HASHES}), i ->
               list_min(list_transform(sh,
                 t -> md5(CAST(i AS VARCHAR) || ':' || t)))) AS sig
      FROM s
    ),
    bands AS (
      SELECT doc_id, b.i AS band,
             md5(array_to_string(
               sig[b.i * {_BAND_ROWS} + 1 : b.i * {_BAND_ROWS} + {_BAND_ROWS}],
               ',')) AS band_hash
      FROM sig,
           LATERAL (SELECT unnest(range(0, {_NUM_HASHES // _BAND_ROWS})) AS i) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard_sim
    FROM cand c
    JOIN s sa ON sa.doc_id = c.doc_a
    JOIN s sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.8
    """,
)
def x_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, the scale path: signature (map-only) →
    band buckets (one shuffle on band hash) → same-bucket candidate pairs →
    exact-Jaccard verification of candidates only. Output schema matches
    x_dedup_shingle_pairs; precision is exact (verified), recall is the LSH
    band probability. Full DuckDB oracle since round 3: md5-string
    minhashes are engine-portable (lexicographic min == numeric min of the
    digest), so the oracle replays signature → banding → candidate →
    verify exactly. The pytest suite additionally checks candidates ⊆
    ground truth and recall=1 for j ≥ 0.95 pairs.

    vs. reference: the reference has no dedup at all; this is the
    MinHashLSH pattern from pyspark.ml.feature re-expressed relationally so
    the planner sees every stage.
    """
    t = tables(spark, sf_dir)
    return lsh_pairs(t["documents"])


def lsh_bands(docs: DataFrame) -> DataFrame:
    """``(doc_id, sh, band, band_hash)`` LSH band buckets over any
    ``(doc_id, text)`` frame: shingle → 16-slot md5 MinHash signature →
    4-row band hashes. Map-only (signature and banding inside codegen);
    shared by the within-corpus pair join (:func:`lsh_pairs`) and the
    incremental new-vs-corpus probe (:func:`x_dedup_incremental`)."""
    s = shingled(docs)
    sig = s.select("doc_id", "sh", minhash_signature().alias("sig"))
    # band b → hash of signature slots [b*R, (b+1)*R)
    return sig.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_NUM_HASHES // _BAND_ROWS - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        F.slice(F.col("sig"), b * _BAND_ROWS + 1, _BAND_ROWS),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )


def lsh_pairs(docs: DataFrame) -> DataFrame:
    """MinHash-LSH verified near-dup pairs ``(doc_a, doc_b, jaccard_sim)``
    over any ``(doc_id, text)`` frame — the reusable scale path behind
    ``x_dedup_minhash_lsh`` (full corpus) and ``x_corpus_e2e`` (the
    quality-surviving subset). Signature → band buckets → same-bucket
    candidates → exact-Jaccard verify; sub-quadratic throughout."""
    bands = lsh_bands(docs)
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])  # a pair may collide in >1 band
    )
    sim = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        candidates.select("doc_a", "doc_b", sim.alias("jaccard_sim"))
        .where(F.col("jaccard_sim") >= 0.8)
    )


@query(
    "x_minhash_calibration",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents),
    sig AS (
      SELECT doc_id, sh,
             list_transform(range(0, {_NUM_HASHES}), i ->
               list_min(list_transform(sh,
                 t -> md5(CAST(i AS VARCHAR) || ':' || t)))) AS sig
      FROM s
    ),
    bands AS (
      SELECT doc_id, b.i AS band,
             md5(array_to_string(
               sig[b.i * {_BAND_ROWS} + 1 : b.i * {_BAND_ROWS} + {_BAND_ROWS}],
               ',')) AS band_hash
      FROM sig,
           LATERAL (SELECT unnest(range(0, {_NUM_HASHES // _BAND_ROWS})) AS i) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             len(list_filter(range(1, {_NUM_HASHES + 1}),
                             i -> sa.sig[i] = sb.sig[i])) AS n_agree,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
             CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT)
               AS uni
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
    ),
    ppm AS (
      SELECT n_agree,
             n_agree * 1000000 // {_NUM_HASHES} AS est_ppm,
             inter * 1000000 // uni AS exact_ppm
      FROM scored
    )
    SELECT CAST(n_agree AS BIGINT) AS n_agree,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST((SUM(exact_ppm) // COUNT(*)) AS BIGINT) AS avg_exact_ppm,
           CAST(MIN(exact_ppm) AS BIGINT) AS min_exact_ppm,
           CAST(MAX(exact_ppm) AS BIGINT) AS max_exact_ppm,
           CAST(MAX(abs(est_ppm - exact_ppm)) AS BIGINT) AS max_abs_err_ppm
    FROM ppm GROUP BY n_agree ORDER BY n_agree
    """,
)
def x_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION of the MinHash estimator against exact Jaccard, over
    the LSH candidate pairs: for every candidate, the estimated
    similarity is (agreeing signature slots)/{nh} and the truth is
    |A∩B|/|A∪B| on the shingle sets; grouping by agreement count yields
    the estimator's calibration curve — per slot-agreement level, the
    mean/min/max exact similarity and the worst absolute estimation
    error (all in integer parts-per-million, so the whole diagnostic is
    exact-arithmetic and hash-gated, false-positive behavior included).

    This is the tool that justifies LSH thresholds before a 100 TB
    dedup run: it answers "at this shingle width and signature size,
    what exact-Jaccard range does each signature agreement level
    actually correspond to, and how wrong can the estimate be?" —
    measured on the corpus itself, not assumed from theory.

    Scale shape: signatures and banding are map-only codegen (no
    explode), candidates come from the banded self-join exactly as in
    `x_dedup_minhash_lsh` (sub-quadratic, band-hash-keyed shuffle), the
    per-pair fold is O(shingles), and the final aggregate has at most
    {nh1} keys."""
    s = shingled(tables(spark, sf_dir)["documents"])
    sig = s.select("doc_id", "sh", minhash_signature().alias("sig"))
    bands = sig.select(
        "doc_id",
        "sh",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_NUM_HASHES // _BAND_ROWS - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        F.slice(F.col("sig"), b * _BAND_ROWS + 1, _BAND_ROWS),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .select(
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            ).alias("n_agree"),
            F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint").alias("inter"),
            F.size(F.array_union("sh_a", "sh_b")).cast("bigint").alias("uni"),
        )
    )
    est_ppm = F.expr(f"n_agree * 1000000 div {_NUM_HASHES}")
    exact_ppm = F.expr("inter * 1000000 div uni")
    ppm = scored.select(
        "n_agree", est_ppm.alias("est_ppm"), exact_ppm.alias("exact_ppm")
    )
    return (
        ppm.groupBy(F.col("n_agree").cast("bigint").alias("n_agree"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.expr("CAST(sum(exact_ppm) div count(*) AS BIGINT)").alias(
                "avg_exact_ppm"
            ),
            F.min("exact_ppm").cast("bigint").alias("min_exact_ppm"),
            F.max("exact_ppm").cast("bigint").alias("max_exact_ppm"),
            F.max(F.abs(F.col("est_ppm") - F.col("exact_ppm")))
            .cast("bigint")
            .alias("max_abs_err_ppm"),
        )
        .orderBy("n_agree")
    )


x_minhash_calibration.__doc__ = x_minhash_calibration.__doc__.format(
    nh=_NUM_HASHES, nh1=_NUM_HASHES + 1
)


def simhash64() -> Column:
    """64-bit SimHash over shingle md5 digests: bit b of a shingle's hash
    is bit (b mod 4) of hex nibble (b div 4) — engine-portable (md5 hex is
    canonical; the former xxhash64 was Spark-private, blocking the
    oracle). For each bit, sum ±1 across shingles, take the sign. Folded
    with aggregate/zip_with — a per-row O(shingles × 64) computation, no
    explode, no shuffle."""
    # SQL expr (not the Python wrappers): SQL shiftright/shiftleft accept a
    # column bit count, the pyspark functions only a literal int.
    return F.expr(
        """
        aggregate(
          zip_with(
            aggregate(
              transform(sh, s -> md5(s)),
              array_repeat(0L, 64),
              (acc, h) -> zip_with(acc, sequence(0, 63),
                (a, b) -> a + IF((shiftright(
                     cast(conv(substr(h, (b div 4) + 1, 1), 16, 10) as int),
                     b % 4) & 1) = 1, 1, -1))
            ),
            sequence(0, 63),
            (c, b) -> IF(c > 0, shiftleft(1L, b), 0L)
          ),
          0L,
          (acc, v) -> acc | v
        )
        """
    )


#: DuckDB twin of simhash64 as a SQL fragment over a shingle-exploded
#: relation: same nibble-bit convention, bit_or-merged powers (bit 63 is
#: the signed min-long literal — DuckDB refuses 1<<63).
_SQL_SIMHASH = """
    bits AS (
      SELECT doc_id, b.i AS bit,
             SUM(CASE WHEN ((strpos('0123456789abcdef',
                                    substr(md5(t), b.i // 4 + 1, 1)) - 1
                             >> (b.i % 4)) & 1) = 1
                      THEN 1 ELSE -1 END) AS c
      FROM (SELECT doc_id, unnest(sh) AS t FROM s) hx,
           LATERAL (SELECT unnest(range(0, 64)) AS i) b
      GROUP BY doc_id, b.i
    ),
    sig AS (
      SELECT doc_id,
             bit_or(CASE WHEN c <= 0 THEN 0
                         WHEN bit = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << bit) END) AS sig
      FROM bits GROUP BY doc_id
    )
"""


#: SimHash near-dup threshold and pigeonhole block count. With 8 blocks of
#: 8 bits, any pair at hamming distance ≤ 6 differs in at most 6 blocks, so
#: at least 2 blocks are bit-identical → an equi-join on (block_idx,
#: block_value) is a LOSSLESS candidate generator for the ≤ 6 threshold
#: (pigeonhole; only one shared block is needed to surface the pair).
_SIMHASH_MAX_HAMMING = 6
_SIMHASH_BLOCKS = 8


def simhash_blocks(sig: Column) -> Column:
    """The 8 one-byte blocks of a 64-bit SimHash as array<bigint> — the
    pigeonhole blocking keys. Pure codegen (shift + mask per block; the
    shift counts are Python ints because F.shiftright only takes literal
    bit counts — same constraint simhash64 notes)."""
    return F.array(
        *[
            F.shiftright(sig, j * 8).bitwiseAND(F.lit(255)).cast("bigint")
            for j in range(_SIMHASH_BLOCKS)
        ]
    )


def simhash_pairs_blocked(sig_df: DataFrame, max_hamming: int = _SIMHASH_MAX_HAMMING) -> DataFrame:
    """Pairs of (doc_a, doc_b, hamming ≤ max_hamming) via pigeonhole
    blocking: explode each signature into its 8 (block_idx, block_value)
    keys, equi-join on the block key, dedup pairs that collide in more
    than one block, verify the exact hamming distance on the carried sigs.

    Scale shape: the explode is map-only (8× row fan-out of a 3-column
    relation), the join is ONE shuffle on a near-uniform key (byte blocks
    of a hash sketch), and verification is codegen arithmetic on the two
    carried longs. No cartesian anywhere — same output as the quadratic
    verifier join, linearithmic cost (equal-block groups are the only
    candidates). Requires max_hamming ≤ 7: at 8+ the 8-block pigeonhole
    no longer guarantees a shared block."""
    if max_hamming >= _SIMHASH_BLOCKS:
        raise ValueError("8-block pigeonhole requires max_hamming <= 7")
    blocks = sig_df.select(
        "doc_id",
        "sig",
        F.posexplode(simhash_blocks(F.col("sig"))).alias("blk", "blk_val"),
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    dist = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])  # pairs may share >1 block
    )


def simhash_pairs_allpairs(sig_df: DataFrame, max_hamming: int = _SIMHASH_MAX_HAMMING) -> DataFrame:
    """Quadratic verifier twin of :func:`simhash_pairs_blocked` — test-only
    ground truth for the pair-set-equality property; never the scale path."""
    a = sig_df.alias("a")
    b = sig_df.alias("b")
    dist = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


@query(
    "x_dedup_simhash",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents),
    {_SQL_SIMHASH}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {_SIMHASH_MAX_HAMMING}
    """,
)
def x_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit sketch per doc (map-only codegen),
    pairs with hamming distance ≤ 6 found by the PIGEONHOLE blocked join
    (see simhash_pairs_blocked) — one uniform-key shuffle, no cartesian,
    provably the same pair set as the all-pairs verifier. Full DuckDB
    oracle since round 3 (md5-nibble bits are engine-portable; the oracle
    recomputes every sketch and checks the pair set via its own all-pairs
    join — quadratic is fine at oracle scale). Pytest adds pair-set
    equality vs the quadratic Spark twin, self-distance 0, and the
    no-cartesian plan assertion.
    """
    t = tables(spark, sf_dir)
    s = shingled(t["documents"])
    sig = s.select("doc_id", simhash64().alias("sig"))
    return simhash_pairs_blocked(sig)


#: Span length for exact substring-level dedup (tokens per duplicated span).
_SPAN = 5


@query(
    "x_dedup_substring",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
      SELECT doc_id, u.i - 1 AS pos,
             array_to_string(toks[u.i:u.i+4], ' ') AS gram
      FROM d, unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS u(i)
    ), fst AS (
      SELECT gram, doc_id, pos,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
      FROM g
    ), cov AS (
      SELECT DISTINCT doc_id, pos + u.k AS i
      FROM fst, unnest(generate_series(0, 4)) AS u(k)
      WHERE rn > 1
    ), posn AS (
      SELECT d.doc_id, u.i, toks[u.i + 1] AS tok
      FROM d, unnest(generate_series(0, len(toks) - 1)) AS u(i)
    ), kept AS (
      SELECT p.doc_id, p.i, p.tok
      FROM posn p
      WHERE NOT EXISTS (SELECT 1 FROM cov c
                        WHERE c.doc_id = p.doc_id AND c.i = p.i)
    ), rebuilt AS (
      SELECT doc_id, array_to_string(list(tok ORDER BY i), ' ') AS clean_text
      FROM kept GROUP BY doc_id
    ), nrem AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_removed FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           coalesce(n.n_removed, 0) AS n_removed
    FROM d
    LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
    LEFT JOIN nrem n ON n.doc_id = d.doc_id
    """,
)
def x_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup, corpus-wide keep-first (the
    train-data op from Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", §4.1 ExactSubstr): every 5-token span
    that occurs anywhere earlier in the corpus (by (doc_id, pos) order) is
    deleted from the document; the globally FIRST occurrence survives.
    Subsumes within-document repetition removal (a span repeated inside
    one doc keeps only its first copy) — distinct from x_dedup_exact
    (whole-doc) and x_text_repetition (detection only, no rewrite).

    Plan shape at 100 TB: the span inventory is a map-only posexplode
    (×~n_tokens fan-out of a 2-column relation); first-occurrence election
    is ONE shuffle keyed by the gram with a map-side-combinable min-struct
    partial (hot boilerplate grams are absorbed in the partials, residual
    skew is AQE's job); position-coverage explode is a bounded ×5 fan-out;
    the rebuild is a doc_id-keyed join (uniform key). No driver state, no
    all-pairs stage — linearithmic in corpus tokens, vs the suffix-array
    construction the paper uses single-node.
    """
    t = tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", F.split("text", " ").alias("toks"))
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("toks") >= _SPAN,
                F.expr(
                    f"transform(sequence(0, size(toks) - {_SPAN}),"
                    f" i -> concat_ws(' ', slice(toks, i + 1, {_SPAN})))"
                ),
            ).otherwise(F.expr("cast(array() as array<string>)"))
        ).alias("pos", "gram"),
    )
    first = grams.groupBy("gram").agg(F.min(F.struct("doc_id", "pos")).alias("keep"))
    removed = (
        grams.join(first, "gram")
        .where(
            (F.col("doc_id") != F.col("keep.doc_id"))
            | (F.col("pos") != F.col("keep.pos"))
        )
        .select("doc_id", "pos")
    )
    covered = removed.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (_SPAN - 1))).alias("i"),
    ).distinct()
    per_doc = covered.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("i")).alias("removed"),
        F.count("*").cast("int").alias("n_removed"),
    )
    no_removed = F.expr("cast(array() as array<int>)")
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.filter(
                "toks",
                lambda x, i: ~F.array_contains(
                    F.coalesce(F.col("removed"), no_removed), i
                ),
            ),
        ).alias("clean_text"),
        F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard join via prefix filtering (PPJoin-style)
# ---------------------------------------------------------------------------

#: Jaccard threshold τ = TAU_NUM/TAU_DEN (rational, so every gate below is
#: exact integer arithmetic — no float compares anywhere in the plan).
_TAU_NUM, _TAU_DEN = 4, 5


@query(
    "x_dedup_jaccard_join",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents
    ),
    n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    fr AS (SELECT shingle, COUNT(*) AS freq FROM sh GROUP BY 1),
    rk AS (
      -- global shingle order = (frequency asc, md5 asc): md5 keeps the
      -- tiebreak byte-identical across engines (string collation would
      -- not be for non-ASCII shingles)
      SELECT s.doc_id, s.shingle, n.n_sh,
             ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                ORDER BY f.freq, md5(s.shingle)) AS rn
      FROM sh s JOIN fr f USING (shingle) JOIN n USING (doc_id)
    ),
    pre AS (
      -- prefix length |S| - ceil(τ|S|) + 1, integer form
      SELECT doc_id, shingle, n_sh FROM rk
      WHERE rn <= n_sh - (({_TAU_NUM}*n_sh + {_TAU_DEN} - 1) // {_TAU_DEN}) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.n_sh AS na, b.n_sh AS nb
      FROM pre a JOIN pre b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      WHERE {_TAU_DEN} * least(a.n_sh, b.n_sh)
              >= {_TAU_NUM} * greatest(a.n_sh, b.n_sh)
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, c.na, c.nb, COUNT(*) AS n_common
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
           CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
    FROM inter
    WHERE {_TAU_DEN} * n_common >= {_TAU_NUM} * (na + nb - n_common)
    ORDER BY doc_a, doc_b
    """,
)
def x_dedup_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard similarity join at threshold τ=4/5 via prefix
    filtering (the PPJoin family; see Xiao et al., "Efficient Similarity
    Joins for Near Duplicate Detection", WWW'08 — public algorithm):
    order all shingles by one global (frequency asc, md5) total order,
    keep only each document's |S|−⌈τ|S|⌉+1 rarest shingles as its
    *prefix*, and generate candidates from prefix∩prefix equi-joins. The
    classic prefix-filtering theorem makes this LOSSLESS: any pair with
    Jaccard ≥ τ must share at least one prefix shingle — proven here by a
    pytest asserting pair-set equality with the quadratic ground truth
    (x_dedup_shingle_pairs) and certified value-exact by the oracle.

    Scale path vs the alternatives in this module: x_dedup_shingle_pairs
    is the deliberately-quadratic verifier; x_dedup_minhash_lsh is
    sub-quadratic but approximate. THIS operator is sub-quadratic AND
    exact — candidate volume is Σ_shingle (prefix-postings)², driven by
    rare shingles only (the size filter τ·|B| ≤ |A| prunes further before
    any intersection is counted). Every stage is an equi-join or a
    uniform-key aggregate; the per-doc rank window is bounded by document
    length; every compare is integer (τ as a rational 4/5), so the plan
    is engine-portable bit-for-bit."""
    return jaccard_join_pairs(tables(spark, sf_dir)["documents"])


def jaccard_join_pairs(docs: DataFrame) -> DataFrame:
    """Prefix-filtered exact Jaccard join over any ``(doc_id, text)``
    frame — the reusable core behind :func:`x_dedup_jaccard_join`; the
    hypothesis property test drives it with random synthetic corpora to
    probe the losslessness theorem beyond the fixture."""
    # Eager checkpoint: the shingle-array frame is consumed THREE times
    # (the explode below + the two verification fetch joins), and a
    # Generate over the in-lineage transform re-evaluates the shingle
    # lambda per consumer — measured 3.4 s for the bare explode vs 0.05 s
    # from the materialized blocks at sf0.1 (the x_source_overlap_kmv
    # "spread+checkpoint is the fast shape" finding, applied here). At
    # scale this is the classic recompute-vs-store call for a frame with
    # three consumers; eager because lazy checkpoints reused across AQE
    # stages re-materialize with stale accumulators (r12 failure mode).
    sh_arr = shingled(docs).localCheckpoint(eager=True)
    # |S| rides along from the array width — no per-doc count aggregate
    # (and no doc_id join) needed anywhere downstream.
    sh = sh_arr.select(
        "doc_id",
        F.size("sh").cast("long").alias("n_sh"),
        F.explode("sh").alias("shingle"),
    )
    # Global shingle frequency as COUNT() OVER (PARTITION BY shingle)
    # instead of groupBy + equi-join back: the posting-list partition the
    # join would shuffle on anyway now carries its own count, saving one
    # full exchange + the join (guide §2.4). Identical freq values; the
    # (freq, md5) prefix order is unchanged.
    rk = sh.withColumn(
        "freq", F.count("*").over(Window.partitionBy("shingle"))
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("freq", F.md5("shingle"))
        ),
    )
    prefix_len = (
        F.col("n_sh")
        - F.expr(f"({_TAU_NUM}*n_sh + {_TAU_DEN} - 1) div {_TAU_DEN}")
        + 1
    )
    pre = rk.where(F.col("rn") <= prefix_len).select("doc_id", "shingle", "n_sh")
    a = pre.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("n_sh").alias("na")
    )
    b = pre.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("n_sh").alias("nb")
    )
    cand = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(
            _TAU_DEN * F.least("na", "nb") >= _TAU_NUM * F.greatest("na", "nb")
        )
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
    )
    # Verification: |A ∩ B| via array_intersect on the per-doc shingle
    # ARRAYS (both sides are distinct-element arrays, so the size equals
    # the oracle's join-count) — two doc_id-keyed joins fetching only the
    # ~43k candidates' arrays, instead of re-exploding the full shingle
    # relation into a candidates×|doc| row blow-up and aggregating it.
    inter = (
        cand.join(
            sh_arr.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh_arr.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_common"),
        )
    )
    union_sz = F.col("na") + F.col("nb") - F.col("n_common")
    return (
        inter.where(_TAU_DEN * F.col("n_common") >= _TAU_NUM * union_sz)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (F.col("n_common").cast("double") / union_sz).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Asymmetric CONTAINMENT join: quote / subset detection (round 12)
# ---------------------------------------------------------------------------

#: Containment threshold τ = 9/10 (rational — every gate is exact
#: integer arithmetic, same doctrine as the Jaccard join's 4/5).
_CONT_NUM, _CONT_DEN = 9, 10
#: Shingle width for containment: 8-gram token windows, NOT the dedup
#: family's 3-grams. Measured at sf0.1: 3-gram prefixes collide on
#: template phrases and the candidate set blows up 300× at 10× data
#: (262 → 83 811 pairs for 50 → 505 matches); 8-gram shingles are rare
#: enough that candidates == matches EXACTLY at both fixtures
#: (49/49, 488/488) and grow linearly. This is also the semantics quote
#: detection wants — the 13-gram decontamination convention's shape.
_CONT_W = 8

_SQL_CONT_SHINGLES = f"""
    CASE WHEN len(string_split(text, ' ')) >= {_CONT_W}
         THEN list_distinct(list_transform(
                generate_series(1, len(string_split(text, ' ')) - {_CONT_W - 1}),
                i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + {_CONT_W - 1}),
                       ' ')))
         ELSE [text] END
"""


def containment_shingles(docs: DataFrame) -> DataFrame:
    """``(doc_id, sh)`` with distinct {w}-gram token shingles of ``text``
    — the containment join's comparison unit (see ``_CONT_W`` for why
    not 3-grams). The token array is materialized BEFORE the spread
    exchange: an inline ``split(text)`` inside the window transform gets
    re-inlined by projection collapse and re-splits the text once per
    window position (measured 18 s → ~4 s at sf0.1 for the full join);
    the exchange is a pipeline breaker, so downstream codegen reads the
    ``toks`` column instead."""
    toked = _spread(
        docs.select("doc_id", "text", F.split("text", " ").alias("toks"))
    )
    return toked.select(
        "doc_id",
        F.when(
            F.expr(f"size(toks) >= {_CONT_W}"),
            F.expr(
                f"array_distinct(transform(sequence(1, size(toks) - {_CONT_W - 1}),"
                f" i -> concat_ws(' ', slice(toks, i, {_CONT_W}))))"
            ),
        )
        .otherwise(F.array(F.col("text")))
        .alias("sh"),
    )


containment_shingles.__doc__ = containment_shingles.__doc__.format(w=_CONT_W)


@query(
    "x_containment_join",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SQL_CONT_SHINGLES}) AS shingle FROM documents
    ),
    n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    fr AS (SELECT shingle, COUNT(*) AS freq FROM sh GROUP BY 1),
    rk AS (
      SELECT s.doc_id, s.shingle, n.n_sh,
             ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                ORDER BY f.freq, md5(s.shingle)) AS rn
      FROM sh s JOIN fr f USING (shingle) JOIN n USING (doc_id)
    ),
    pre AS (
      -- contained-side prefix: |A| - ceil(τ|A|) + 1 rarest shingles
      SELECT doc_id, shingle, n_sh FROM rk
      WHERE rn <= n_sh
            - (({_CONT_NUM}*n_sh + {_CONT_DEN} - 1) // {_CONT_DEN}) + 1
    ),
    idx AS (SELECT s.doc_id, s.shingle, n.n_sh FROM sh s JOIN n USING (doc_id)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.n_sh AS na, b.n_sh AS nb
      FROM pre a JOIN idx b ON a.shingle = b.shingle
                            AND a.doc_id <> b.doc_id
      WHERE {_CONT_DEN} * b.n_sh >= {_CONT_NUM} * a.n_sh
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, c.na, COUNT(*) AS n_common
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2, 3
    )
    SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
           CAST(n_common AS DOUBLE) / na AS containment
    FROM inter
    WHERE {_CONT_DEN} * n_common >= {_CONT_NUM} * na
    ORDER BY doc_a, doc_b
    """,
)
def x_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT asymmetric containment join at τ={num}/{den}: directed
    pairs (A, B) with |S(A) ∩ S(B)| / |S(A)| ≥ τ — the QUOTE/SUBSET
    detector symmetric Jaccard misses by construction (a 50-shingle doc
    fully embedded in a 5 000-shingle doc has Jaccard ≈ 0.01 and
    containment 1.0; the jaccard/LSH family never surfaces it, yet it
    is exactly the memorization-risk pair an LLM corpus must catch).

    Plan — one-sided prefix filter × full inverted index: only the
    CONTAINED side is prefix-pruned to its |A|−⌈τ|A|⌉+1 rarest shingles
    (by the same global (freq, md5) order as the Jaccard join); the
    container side stays the full shingle index. Lossless: if
    C(A,B) ≥ τ, at most |A|−⌈τ|A|⌉ of A's shingles miss B, so at least
    one PREFIX shingle hits — pytest proves pair-set equality with the
    quadratic all-pairs ground truth. Sub-quadratic in practice because
    prefix shingles are the globally RAREST: candidate volume is
    Σ_shingle prefix-postings × full-postings, dominated by short
    posting lists; the size gate τ|A| ≤ |B| prunes before any
    intersection. Verification fetches the two shingle ARRAYS per
    candidate (array_intersect in codegen) — no candidates×|doc|
    re-explosion. Every compare is integer; τ is the rational
    {num}/{den}."""
    return containment_join_pairs(tables(spark, sf_dir)["documents"])


x_containment_join.__doc__ = x_containment_join.__doc__.format(
    num=_CONT_NUM, den=_CONT_DEN
)


def containment_join_pairs(docs: DataFrame) -> DataFrame:
    """Prefix-filtered exact containment join over any ``(doc_id, text)``
    frame — the reusable core behind :func:`x_containment_join`."""
    # Same eager checkpoint as jaccard_join_pairs: three consumers of the
    # shingle arrays; Generate re-evaluates the in-lineage transform.
    sh_arr = containment_shingles(docs).localCheckpoint(eager=True)
    sh = sh_arr.select(
        "doc_id",
        F.size("sh").cast("long").alias("n_sh"),
        F.explode("sh").alias("shingle"),
    )
    # freq via COUNT() OVER (PARTITION BY shingle) — one exchange instead
    # of groupBy + join back (the jaccard_join_pairs rewrite, same proof).
    rk = sh.withColumn(
        "freq", F.count("*").over(Window.partitionBy("shingle"))
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("freq", F.md5("shingle"))
        ),
    )
    prefix_len = (
        F.col("n_sh")
        - F.expr(f"({_CONT_NUM}*n_sh + {_CONT_DEN} - 1) div {_CONT_DEN}")
        + 1
    )
    pre = rk.where(F.col("rn") <= prefix_len).select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("n_sh").alias("na")
    )
    idx = sh.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("n_sh").alias("nb")
    )
    cand = (
        pre.join(idx, "shingle")
        .where(F.col("doc_a") != F.col("doc_b"))
        .where(_CONT_DEN * F.col("nb") >= _CONT_NUM * F.col("na"))
        .select("doc_a", "doc_b", "na")
        .distinct()
    )
    inter = (
        cand.join(
            sh_arr.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh_arr.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "na",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_common"),
        )
    )
    return (
        inter.where(_CONT_DEN * F.col("n_common") >= _CONT_NUM * F.col("na"))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (F.col("n_common").cast("double") / F.col("na")).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Incremental dedup: admit a NEW batch against an EXISTING corpus
# ---------------------------------------------------------------------------

def sql_incremental_text_parts(corpus_pred: str, batch_pred: str) -> str:
    """CTE parts (already comma-joined) for the incremental text-dedup
    oracle, parameterized on the corpus/batch split predicates. Ends in
    ``batch`` (doc_id, text), ``exact`` (doc_ids whose canonical sha256
    matches a corpus digest) and ``near`` (doc_ids with a
    Jaccard-verified MinHash-LSH band collision against the corpus).
    Shared by x_dedup_incremental and the cross-modal ingest gate."""
    bands_sql = """
      SELECT doc_id, b.i AS band,
             md5(array_to_string(
               sig[b.i * {R} + 1 : b.i * {R} + {R}], ',')) AS band_hash
      FROM {sig},
           LATERAL (SELECT unnest(range(0, {NB})) AS i) b
    """
    sig_sql = """
      SELECT doc_id, sh,
             list_transform(range(0, {H}), i ->
               list_min(list_transform(sh,
                 t -> md5(CAST(i AS VARCHAR) || ':' || t)))) AS sig
      FROM {src}
    """
    consts = dict(H=_NUM_HASHES, R=_BAND_ROWS, NB=_NUM_HASHES // _BAND_ROWS)
    return f"""corpus AS (SELECT doc_id, text FROM documents WHERE {corpus_pred}),
    batch AS (SELECT doc_id, text FROM documents WHERE {batch_pred}),
    ch AS (SELECT DISTINCT sha256(lower(trim(text))) AS h FROM corpus),
    bh AS (SELECT doc_id, sha256(lower(trim(text))) AS h FROM batch),
    exact AS (SELECT DISTINCT bh.doc_id FROM bh JOIN ch USING (h)),
    sc AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM corpus),
    sb AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM batch),
    sigc AS ({sig_sql.format(src='sc', **consts)}),
    sigb AS ({sig_sql.format(src='sb', **consts)}),
    bandsc AS ({bands_sql.format(sig='sigc', **consts)}),
    bandsb AS ({bands_sql.format(sig='sigb', **consts)}),
    cand AS (
      SELECT DISTINCT nb.doc_id AS new_id, nc.doc_id AS corpus_id
      FROM bandsb nb JOIN bandsc nc
        ON nb.band = nc.band AND nb.band_hash = nc.band_hash
    ),
    near AS (
      SELECT DISTINCT c.new_id AS doc_id
      FROM cand c
      JOIN sb ON sb.doc_id = c.new_id
      JOIN sc ON sc.doc_id = c.corpus_id
      WHERE CAST(len(list_intersect(sb.sh, sc.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(sb.sh, sc.sh))) >= 0.8
    )"""


def _sql_incremental() -> str:
    return f"""
    WITH {sql_incremental_text_parts("doc_id % 10 < 8", "doc_id % 10 >= 8")}
    SELECT b.doc_id,
           (e.doc_id IS NOT NULL) AS exact_dup,
           (n.doc_id IS NOT NULL) AS near_dup,
           (e.doc_id IS NULL AND n.doc_id IS NULL) AS admitted
    FROM batch b
    LEFT JOIN exact e ON e.doc_id = b.doc_id
    LEFT JOIN near n ON n.doc_id = b.doc_id
    ORDER BY b.doc_id
    """


@query("x_dedup_incremental", oracle=_sql_incremental())
def x_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus admission — the production "don't re-ingest
    what you already have" path, distinct from within-corpus dedup: a NEW
    batch (doc_id % 10 ≥ 8 here; in production, today's crawl) is checked
    against an EXISTING corpus (% 10 < 8) and each new document is
    flagged ``exact_dup`` (canonical sha256 matches a corpus digest),
    ``near_dup`` (MinHash-LSH band collision with a corpus doc, verified
    at Jaccard ≥ 0.8), and ``admitted`` (neither).

    Scale shape: both probes are NEW-side-driven joins against
    corpus-side state a warehouse would precompute and store — the digest
    set (uniform-key semi join) and the band table (equi-join on
    (band, band_hash), the same bucketed layout ``x_dedup_minhash_lsh``
    certifies). Incremental cost is O(|batch| × bands + collisions), never
    a rescan-shaped |corpus|² — and the corpus side never moves through a
    quadratic stage. Verification joins fetch only colliding docs'
    shingle sets."""
    docs = tables(spark, sf_dir)["documents"]
    verdicts = incremental_text_verdicts(
        docs.where(F.col("doc_id") % 10 < 8),
        docs.where(F.col("doc_id") % 10 >= 8),
    )
    return verdicts.select(
        "doc_id",
        "exact_dup",
        "near_dup",
        (~(F.col("exact_dup") | F.col("near_dup"))).alias("admitted"),
    ).orderBy("doc_id")


def incremental_text_verdicts(corpus: DataFrame, batch: DataFrame) -> DataFrame:
    """(doc_id, exact_dup, near_dup) for every batch document checked
    against the corpus — canonical-sha256 digest probe + Jaccard-verified
    MinHash-LSH band probe. The Spark twin of
    :func:`sql_incremental_text_parts`; shared by x_dedup_incremental and
    the cross-modal ingest gate."""
    canon = F.sha2(F.lower(F.trim(F.col("text"))), 256)

    corpus_digests = corpus.select(canon.alias("h")).distinct()
    exact = (
        batch.select("doc_id", canon.alias("h"))
        .join(corpus_digests, "h", "left_semi")
        .select("doc_id")
        .withColumn("exact_dup", F.lit(True))
    )

    nb = lsh_bands(batch.select("doc_id", "text"))
    nc = lsh_bands(corpus.select("doc_id", "text"))
    cand = (
        nb.alias("n")
        .join(
            nc.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.band_hash") == F.col("c.band_hash")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"),
            F.col("c.doc_id").alias("corpus_id"),
            F.col("n.sh").alias("sh_n"),
            F.col("c.sh").alias("sh_c"),
        )
        .dropDuplicates(["new_id", "corpus_id"])
    )
    near = (
        cand.where(jaccard(F.col("sh_n"), F.col("sh_c")) >= 0.8)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    # Assembly as UNION + one grouped max instead of two left joins: all
    # three frames are keyed on doc_id, so one exchange serves the whole
    # merge (guide-§2.4 shape — same-keyed operations share an exchange).
    # The join form planned 2 extra shuffles + sorts per consumer and was
    # the variance driver in the composed gate plans (6–17 s spread at
    # sf0.1). max() ignores NULLs and exact/near emit ≤1 row per doc_id,
    # so the merged flags are identical to the outer-join + coalesce form.
    flag = F.lit(True)
    merged = (
        batch.select("doc_id", F.lit(False).alias("e"), F.lit(False).alias("n"))
        .unionByName(exact.select("doc_id", flag.alias("e"), F.lit(False).alias("n")))
        .unionByName(near.select("doc_id", F.lit(False).alias("e"), flag.alias("n")))
        .groupBy("doc_id")
        .agg(F.max("e").alias("exact_dup"), F.max("n").alias("near_dup"))
    )
    return merged.select("doc_id", "exact_dup", "near_dup")


#: KMV sketch size: 256 minimum hash values per source. Relative error of
#: the Jaccard estimate ~ 1/sqrt(k·J) — at the fixture's J ≈ 0.02–0.08 the
#: estimate is coarse by construction; the query reports sketch and exact
#: side by side so the error IS the certified output, not a hidden gap.
_KMV_K = 256


def _kmv_exact_inter(hashed: DataFrame, sizes: DataFrame) -> DataFrame:
    """Exact per-source-pair intersection counts of a distinct
    (source, h) universe, in ONE h-keyed pass (VERDICT r14 next-round
    #2): assign each source a bit (broadcast, #sources rows), OR the
    bits per shingle hash into a LONG membership mask (primitive-typed
    hash aggregate — partial map-side, one exchange of (h, mask)),
    histogram the masks (metadata-sized second aggregate), then expand
    each mask pattern to its source pairs against the broadcast
    #sources² pair frame and sum the histogram counts. Identical counts
    to an a.h = b.h, a.source < b.source self-join — which cost two
    more full exchanges of the shingle universe plus a sort-merge, and
    was the one touched row the r14 driver recorded slower.

    Bit-packing bounds the EXACT AUDIT TIER at 63 sources (loud
    assert_true, never silent corruption); the sketch tier — the 100 TB
    path this tier audits — has no such bound. The bit-assignment
    window runs over the per-source aggregate frame (#sources rows,
    the same metadata scale the broadcast pair frame already assumes)."""
    w_src_order = Window.orderBy("source")
    src_bits = sizes.select(
        "source", (F.row_number().over(w_src_order) - 1).alias("b")
    ).select(
        "source",
        F.when(
            F.assert_true(
                F.col("b") < 63,
                "KMV exact-intersection audit tier supports at most 63 "
                "sources (bit-packed membership mask); rely on the sketch "
                "tier beyond that",
            ).isNull(),
            F.col("b"),
        ).alias("b"),
    )
    masks = (
        hashed.join(F.broadcast(src_bits), "source")
        .groupBy("h")
        # distinct (source, h) input → SUM of distinct per-source bits
        # equals the bitwise OR of the memberships
        .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), b)")).alias("m"))
        .groupBy("m")
        .agg(F.count("*").alias("cnt"))
    )
    pair_bits = (
        src_bits.alias("pa")
        .join(
            F.broadcast(src_bits.alias("pb")),
            F.col("pa.source") < F.col("pb.source"),
        )
        .select(
            F.col("pa.source").alias("source_a"),
            F.col("pb.source").alias("source_b"),
            F.col("pa.b").alias("ba"),
            F.col("pb.b").alias("bb"),
        )
    )
    return (
        masks.join(
            F.broadcast(pair_bits),
            F.expr(
                "(shiftright(m, ba) & 1) = 1 AND (shiftright(m, bb) & 1) = 1"
            ),
        )
        .groupBy("source_a", "source_b")
        .agg(F.sum("cnt").alias("exact_inter"))
    )


@query(
    "x_source_overlap_kmv",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT source, md5(sh) AS h
      FROM (SELECT source, unnest({_SQL_SHINGLES}) AS sh FROM documents)
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM h GROUP BY source),
    sk AS (
      SELECT source, h FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS r
        FROM h)
      WHERE r <= {_KMV_K}
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.n AS n_a, b.n AS n_b
      FROM sizes a JOIN sizes b ON a.source < b.source
    ),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS exact_inter
      FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    ),
    comb AS (
      SELECT p.source_a, p.source_b, s.h,
             MAX(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p
      JOIN sk s ON s.source IN (p.source_a, p.source_b)
      GROUP BY 1, 2, 3
    ),
    kmv AS (
      SELECT source_a, source_b,
             CAST(COUNT(*) FILTER (WHERE in_a = 1 AND in_b = 1) AS BIGINT)
               AS kmv_both,
             CAST(COUNT(*) AS BIGINT) AS k_used
      FROM (SELECT *,
                   row_number() OVER (PARTITION BY source_a, source_b
                                      ORDER BY h) AS r
            FROM comb)
      WHERE r <= {_KMV_K}
      GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b,
           k.k_used, k.kmv_both,
           CAST(k.kmv_both AS DOUBLE) / k.k_used AS jacc_kmv,
           CAST(p.n_a AS BIGINT) AS n_a,
           CAST(p.n_b AS BIGINT) AS n_b,
           CAST(COALESCE(i.exact_inter, 0) AS BIGINT) AS exact_inter,
           CAST(p.n_a + p.n_b - COALESCE(i.exact_inter, 0) AS BIGINT)
             AS exact_union,
           CAST(COALESCE(i.exact_inter, 0) AS DOUBLE)
             / (p.n_a + p.n_b - COALESCE(i.exact_inter, 0)) AS jacc_exact
    FROM pairs p
    JOIN kmv k USING (source_a, source_b)
    LEFT JOIN inter i USING (source_a, source_b)
    """,
)
def x_source_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap estimation via K-Minimum-Values sketches — the
    "how much does slice A share with slice B" question a dataset-mixing
    pipeline asks before weighting sources, answered WITHOUT an all-pairs
    set comparison.

    Element universe: distinct 3-gram token shingles per ``source``
    (md5 hex; lexicographic min == numeric min of the big-endian digest,
    so every engine ranks identically — same canonical-hash doctrine as
    x_dedup_minhash_lsh). Per source the sketch is the k=256
    lexicographically smallest hashes, built with a TWO-STAGE rank so no
    single task ever sorts a whole source: rank within (source,
    crc32-salt) keeps ≤ k per salt (partition-local sort after one
    uniform shuffle), then rank within source on the ≤ 32·k survivors.
    Pair estimate: merge the two sketches, re-take the k smallest of the
    union, count members present in BOTH sketches — kmv_both / k_used is
    the Jaccard estimate (Beyer et al., "On Synopses for Distinct-Value
    Estimation Under Multiset Operations", SIGMOD'07).

    The exact verifier rides along so the sketch error is certified
    output: ONE h-keyed pass folds each shingle's source memberships
    into a bit-packed LONG mask, masks are histogrammed, and per-pair
    intersection counts fall out of the metadata-sized mask × pair-bit
    expansion (:func:`_kmv_exact_inter`) — no self-join of the shingle
    universe (r15: the join form re-exchanged `hashed` twice and sorted
    it). Scale split: the sketch path is what runs at 100 TB — per-source
    state is O(k), pair merging is O(#pairs · k) on a broadcast pair
    frame; the exact path is the sf-gated audit tier (one uniform-key
    primitive aggregation, linear in corpus shingles and ≤63-source
    bounded by the bit packing — loud assert — but its output is the
    thing the sketch exists to approximate).

    Reference contrast: the reference app has no sketch surface at all
    (its only set question is exact membership via Postgres lookups,
    ``utils/database.py``); this face extends SURVEY §2.13's sketch
    family (HLL++, CountMin, Bloom, MinHash) with mergeable set-overlap.
    """
    t = tables(spark, sf_dir)
    k = F.lit(_KMV_K)

    # _spread: the shingle fold + md5 is the CPU-dense stage and the
    # fixture corpus is one parquet file = one scan task — fan out first.
    # The checkpoint pins the (source, h) universe: three consumers
    # (sizes, sketch, exact-intersection a/b) read the materialized
    # blocks instead of gambling on exchange reuse across AQE stages
    # (measured: no-spread 6.3 s warm, spread-no-checkpoint 24.8 s —
    # reuse broke and the fold ran per consumer — spread+checkpoint is
    # the fast shape).
    hashed = (
        # eager checkpoint BEFORE the explode: Generate over the
        # in-lineage shingle transform re-evaluates the array expression
        # pathologically even with a single consumer (the r14 §1.2
        # finding, measured HERE in r15: the hashed build read 6.5 s warm
        # inline vs 1.1 s exploding the materialized array — this one
        # node was the whole row's dominator, not the exact tier r14
        # suspected).
        shingled(t["documents"], "source")
        .localCheckpoint()
        .select("source", F.explode("sh").alias("sh"))
        .select("source", F.md5(F.col("sh")).alias("h"))
        .distinct()
        # eager: a LAZY checkpoint under AQE re-materializes with stale
        # accumulators on a second invocation in the same session
        # ("attempted to access non-existent accumulator") — measured here
        .localCheckpoint()
    )

    # eager checkpoint: FOUR consumers in the final plan (both pair-frame
    # sides, the exact tier's bit assignment, and the output columns) —
    # unpinned, each re-aggregated the full hashed universe; the frame is
    # #sources rows (multi-consumer rule, guide §5)
    sizes = (
        hashed.groupBy("source").agg(F.count("*").alias("n")).localCheckpoint()
    )

    # Two-stage k-min: salt bounds the per-task sort; stage 2 ranks the
    # <= 32k survivors per source. Output is the exact k-min either way.
    w_salt = Window.partitionBy("source", "salt").orderBy("h")
    w_src = Window.partitionBy("source").orderBy("h")
    sk = (
        hashed.withColumn("salt", F.pmod(F.crc32(F.col("h")), F.lit(32)))
        .withColumn("r1", F.row_number().over(w_salt))
        .where(F.col("r1") <= _KMV_K)
        .drop("salt", "r1")
        .withColumn("r", F.row_number().over(w_src))
        .where(F.col("r") <= _KMV_K)
        .drop("r")
    )

    pairs = (
        sizes.alias("a")
        .join(F.broadcast(sizes.alias("b")), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
    )

    inter = _kmv_exact_inter(hashed, sizes)

    # Merge the two sketches per pair (broadcast pair frame; sketch side is
    # O(#sources * k) rows), flag membership, re-rank the union, keep k.
    w_pair = Window.partitionBy("source_a", "source_b").orderBy("h")
    kmv = (
        sk.join(
            F.broadcast(pairs.select("source_a", "source_b")),
            (F.col("source") == F.col("source_a"))
            | (F.col("source") == F.col("source_b")),
        )
        .groupBy("source_a", "source_b", "h")
        .agg(
            F.max(
                F.when(F.col("source") == F.col("source_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("source") == F.col("source_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
        .withColumn("r", F.row_number().over(w_pair))
        .where(F.col("r") <= _KMV_K)
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("kmv_both"),
            F.count("*").alias("k_used"),
        )
    )

    ei = F.coalesce(F.col("exact_inter"), F.lit(0).cast("long"))
    return (
        pairs.join(kmv, ["source_a", "source_b"])
        .join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "k_used",
            "kmv_both",
            (F.col("kmv_both").cast("double") / F.col("k_used")).alias("jacc_kmv"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            ei.cast("long").alias("exact_inter"),
            (F.col("n_a") + F.col("n_b") - ei).cast("long").alias("exact_union"),
            (
                ei.cast("double")
                / (F.col("n_a") + F.col("n_b") - ei)
            ).alias("jacc_exact"),
        )
    )


@query(
    "x_dedup_source_priority",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(substr(source, 4) AS INTEGER) AS prio,
             sha256(lower(trim(text))) AS h
      FROM documents
    ),
    k AS (
      SELECT h, doc_id AS keep_id, source AS keep_src FROM (
        SELECT *, row_number() OVER (PARTITION BY h ORDER BY prio, doc_id)
                    AS rn
        FROM d)
      WHERE rn = 1
    ),
    j AS (SELECT d.*, k.keep_id, k.keep_src FROM d JOIN k USING (h))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN doc_id = keep_id THEN 1 END) AS BIGINT)
             AS n_kept,
           CAST(COUNT(CASE WHEN doc_id <> keep_id THEN 1 END) AS BIGINT)
             AS n_dropped,
           CAST(COUNT(CASE WHEN doc_id <> keep_id AND keep_src <> source
                           THEN 1 END) AS BIGINT) AS n_lost_cross_source,
           CAST(COALESCE(bit_xor(CASE WHEN doc_id = keep_id THEN doc_id END),
                         0) AS BIGINT) AS kept_xor
    FROM j GROUP BY source ORDER BY source
    """,
)
def x_dedup_source_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source PRIORITY dedup ledger: exact-content clusters (the
    x_dedup_exact canonicalize→sha256 key) elect their keeper by SOURCE
    PRIORITY first (numeric source rank, ascending — src0 outranks
    src19), doc_id as the tiebreaker — the Dolma/RedPajama-style policy
    "when the same document appears in a curated source and a crawl,
    keep the curated copy", which x_dedup_exact's min-doc_id election
    cannot express. Output is the per-source audit a mixture owner reads
    before re-weighting: docs, kept, dropped, how many copies were lost
    TO A DIFFERENT SOURCE (the cross-source cannibalization column —
    large values mean a source is mostly shadow-copies of higher-priority
    feeds), and an order-independent xor of the kept ids.

    Plan: one uniform sha256-key shuffle; the election is one min-struct
    aggregate ((prio, doc_id, source) — Spark struct ordering is
    field-lexicographic, the oracle's row_number ORDER BY twin); the
    per-source rollup joins cluster keepers back by the hash key, so the
    second shuffle reuses the first's partitioning. Same shape at 100 TB
    as the exact-dedup family: no skew beyond content popularity, which
    AQE skew-split covers.

    Reference contrast: no dedup surface in the reference; completes
    §2.13's exact-dedup family (exact r12, fingerprint r7, checksum r11)
    with the multi-source election policy face."""
    docs = tables(spark, sf_dir)["documents"].select(
        "doc_id",
        "source",
        F.substring("source", 4, 10).cast("int").alias("prio"),
        F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("h"),
    )
    keep = docs.groupBy("h").agg(
        F.min(F.struct("prio", "doc_id", "source")).alias("k")
    ).select(
        "h",
        F.col("k.doc_id").alias("keep_id"),
        F.col("k.source").alias("keep_src"),
    )
    j = docs.join(keep, "h")
    kept = F.col("doc_id") == F.col("keep_id")
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
            F.count(F.when(~kept, 1)).cast("long").alias("n_dropped"),
            F.count(
                F.when(~kept & (F.col("keep_src") != F.col("source")), 1)
            )
            .cast("long")
            .alias("n_lost_cross_source"),
            F.coalesce(
                F.expr("bit_xor(CASE WHEN doc_id = keep_id THEN doc_id END)"),
                F.lit(0).cast("long"),
            ).alias("kept_xor"),
        )
        .orderBy("source")
    )
