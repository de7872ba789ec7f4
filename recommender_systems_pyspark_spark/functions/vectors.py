"""Vector-compression and clustering operators over ``embeddings``
(LLM-pipeline extension surface, SURVEY.md §2.13 — no reference
counterpart).

- int8 scalar quantization + reconstruction error: the compression step
  ANN systems apply before indexing (4× smaller than float32, cache-
  resident codebooks); the error profile tells you whether recall will
  survive it.
- k-means (Lloyd's): the trained coarse quantizer for IVF — per-round one
  broadcast-assign pass over the corpus and one tiny aggregate back.

Scale notes: quantization is map-only codegen given a broadcast per-dim
min/max table (dims rows). k-means keeps ONLY k×d doubles of driver state
(the centroids — bounded by model size, not corpus size, the same contract
as pyspark.ml's KMeans); each iteration is one map-side assignment pass +
one (cell, dim)-keyed aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables
from .similarity import dot

#: Quantization levels for int8 scalar quantization.
_QLEVELS = 255


@query(
    "x_embed_quantize_error",
    oracle=f"""
    WITH x AS (
      SELECT unnest(generate_series(1, len(embedding))) AS i,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings
    ),
    stats AS (
      SELECT list(mn ORDER BY i) AS mnl, list(mx ORDER BY i) AS mxl
      FROM (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY i)
    ),
    err AS (
      SELECT e.vec_id,
             list_transform(generate_series(1, len(e.embedding)), i ->
               e.embedding[i]::DOUBLE -
               (s.mnl[i] + (LEAST({_QLEVELS}, GREATEST(0,
                  floor((e.embedding[i]::DOUBLE - s.mnl[i])
                        / (s.mxl[i] - s.mnl[i]) * {_QLEVELS}))) + 0.5)
                * ((s.mxl[i] - s.mnl[i]) / {_QLEVELS + 1}))
             ) AS d
      FROM embeddings e CROSS JOIN stats s
    )
    SELECT vec_id,
           list_dot_product(d, d) / len(d) AS mse,
           list_max(list_transform(d, x -> abs(x))) AS max_abs_err
    FROM err
    """,
)
def x_embed_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization fidelity: per-dimension global min/max →
    256-level uniform quantizer → per-vector reconstruction MSE and max
    absolute error. The stats aggregate outputs dims rows (broadcast); the
    quantize-and-measure pass is map-only fold arithmetic, bit-comparable
    to DuckDB (floor/least/greatest are exact; the error fold matches
    list_dot_product's accumulation order)."""
    t = tables(spark, sf_dir)
    e = t["embeddings"]
    stats = (
        e.select(F.posexplode("embedding").alias("i", "v"))
        .groupBy("i")
        .agg(F.min(F.col("v").cast("double")).alias("mn"),
             F.max(F.col("v").cast("double")).alias("mx"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("i", "mn", "mx"))).alias("s"))
        .select(
            F.transform("s", lambda r: r.getField("mn")).alias("mnl"),
            F.transform("s", lambda r: r.getField("mx")).alias("mxl"),
        )
    )

    def recon_err(i: Column) -> Column:
        v = F.col("embedding")[i].cast("double")
        mn = F.col("mnl")[i]
        mx = F.col("mxl")[i]
        q = F.least(
            F.lit(_QLEVELS).cast("double"),
            F.greatest(F.lit(0).cast("double"), F.floor((v - mn) / (mx - mn) * _QLEVELS).cast("double")),
        )
        return v - (mn + (q + 0.5) * ((mx - mn) / (_QLEVELS + 1)))

    d = F.transform(F.sequence(F.lit(0), F.size("embedding") - 1), recon_err)
    return (
        e.crossJoin(F.broadcast(stats))
        .select("vec_id", d.alias("d"))
        .select(
            "vec_id",
            (dot(F.col("d"), F.col("d")) / F.size("d")).alias("mse"),
            F.array_max(F.transform("d", F.abs)).alias("max_abs_err"),
        )
    )


def kmeans_assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell, dist): nearest centroid per vector.
    ``cent`` is the tiny (cell, cvec) table — broadcast, so this is one
    map pass over the corpus; the argmin is a ``min_by`` hash aggregate
    over the (dist, cell) struct — the same total order the old
    row_number window used, without sorting the |corpus|×k candidate
    frame every call (r10: this runs 6× per k-means train)."""
    diff = F.zip_with(F.col("embedding"), F.col("cvec"), lambda x, y: x.cast("double") - y)
    return (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", "cell", dot(diff, diff).alias("dist"))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("embedding", "cell", "dist"), F.struct("dist", "cell")
            ).alias("best")
        )
        .select("vec_id", "best.embedding", "best.cell", "best.dist")
    )


def kmeans(e: DataFrame, k: int = 8, n_iter: int = 5) -> tuple[DataFrame, list[float]]:
    """Lloyd's k-means over an (vec_id, embedding) frame; returns the final
    assignment frame and the per-iteration inertia trace.

    Deterministic throughout: seeds are the k lowest vec_ids, assignment
    ties break on cell id, and the centroid update uses the floor-quantized
    exact average (see corpus.py) so partial-aggregation order can't move
    results. Driver state per round is k×d doubles + one inertia double —
    model-sized, not data-sized (the same boundary pyspark.ml.KMeans
    crosses each iteration); everything data-sized stays in executors."""
    spark = e.sparkSession
    quantum = 1_000_000_000.0
    cent = (
        e.orderBy("vec_id")
        .limit(k)
        .select(
            # seed ordering on the ORIGINAL bigint vec_id — an int cast
            # here wraps for vec_id > 2^31 and diverges seed/cell
            # numbering from the oracle's ORDER BY vec_id (ADVICE r7)
            F.col("vec_id").alias("_seed_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
        )
        .withColumn("cell", F.row_number().over(Window.orderBy("_seed_id")) - 1)
        .select("cell", "cvec")
    )
    inertia: list[float] = []
    assigned = kmeans_assign(e, cent)
    for _ in range(n_iter):
        assigned = assigned.localCheckpoint()  # truncate per-round lineage
        inertia.append(assigned.agg(F.sum("dist")).collect()[0][0])
        new_cent = (
            assigned.select("cell", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(
                (
                    F.sum(F.floor(F.col("v").cast("double") * quantum)).cast("double")
                    / F.count("v")
                    / quantum
                ).alias("c")
            )
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
            .select("cell", F.transform("dc", lambda s: s.getField("c")).alias("cvec"))
        )
        # empty cells keep their previous centroid (anti-join back in)
        kept = cent.join(new_cent, "cell", "left_anti")
        cent = new_cent.unionByName(kept).localCheckpoint()
        assigned = kmeans_assign(e, cent)
    return assigned, inertia


def _sql_kmeans(k: int = 8, n_iter: int = 5) -> str:
    """DuckDB replica of :func:`kmeans`, the 5 Lloyd iterations UNROLLED
    as a CTE chain. Possible only because every step of the trainer is
    engine-portable by construction: deterministic seeds (k lowest
    vec_ids), the same left-fold squared-L2 as list_dot_product,
    (dist, cell)-ordered argmin ties, and the floor-quantized exact
    centroid average — so c0→a0→c1→…→a5 replays bit-for-bit."""
    q = "1000000000.0"
    sq_dist = (
        "list_dot_product("
        "list_transform(generate_series(1, len(e.v)), i -> e.v[i] - c.cvec[i]), "
        "list_transform(generate_series(1, len(e.v)), i -> e.v[i] - c.cvec[i]))"
    )
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""c0 AS MATERIALIZED (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
          FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
        )""",
    ]

    def assign(c: str, a: str) -> list[str]:
        return [
            f"""{a}_all AS (
              SELECT e.vec_id, e.v, c.cell, {sq_dist} AS dist
              FROM e CROSS JOIN {c} c
            )""",
            f"""{a} AS MATERIALIZED (
              SELECT vec_id, v, cell, dist FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY dist, cell) AS rn
                FROM {a}_all
              ) WHERE rn = 1
            )""",
        ]

    def update(a: str, cprev: str, c: str) -> list[str]:
        return [
            f"""{c}_new AS MATERIALIZED (
              SELECT cell, list(cd ORDER BY dim) AS cvec FROM (
                SELECT cell, dim,
                       CAST(SUM(CAST(floor(v_el * {q}) AS BIGINT)) AS DOUBLE)
                         / COUNT(v_el) / {q} AS cd
                FROM (SELECT cell,
                             unnest(generate_series(1, len(v))) AS dim,
                             unnest(v) AS v_el
                      FROM {a})
                GROUP BY cell, dim
              ) GROUP BY cell
            )""",
            f"""{c} AS MATERIALIZED (
              SELECT cell, cvec FROM {c}_new
              UNION ALL
              SELECT p.cell, p.cvec FROM {cprev} p
              WHERE p.cell NOT IN (SELECT cell FROM {c}_new)
            )""",
        ]

    parts += assign("c0", "a0")
    for i in range(1, n_iter + 1):
        parts += update(f"a{i-1}", f"c{i-1}", f"c{i}")
        parts += assign(f"c{i}", f"a{i}")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT vec_id, CAST(cell AS INT) AS cell, dist
    FROM a{n_iter}
    ORDER BY vec_id
    """
    )


@query("x_embed_kmeans", oracle=_sql_kmeans())
def x_embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means cell assignment (k=8, 5 Lloyd iterations, deterministic
    seeding): the trained coarse quantizer the IVF path (x_knn_ivf_topk)
    probes, replacing its label-as-cell stand-in with learned cells.

    Full oracle since r4: the Lloyd loop is deterministic AND
    engine-portable (quantized-exact centroid updates, portable distance
    fold, total-order ties), so the oracle simply unrolls all five
    iterations as SQL CTEs and the driver hash-gates the TRAINED MODEL'S
    assignment — not just row counts. pytest additionally pins inertia
    monotonicity, assignment uniqueness, and determinism across runs."""
    t = tables(spark, sf_dir)
    assigned, _ = kmeans(t["embeddings"].select("vec_id", "embedding"))
    return (
        assigned.select("vec_id", F.col("cell").cast("int").alias("cell"), "dist")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# sqrt(N)-scaled k-means — the SemDeDup coarse quantizer (VERDICT r6 #2)
# ---------------------------------------------------------------------------


def kmeans_assign_mapside(e: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, …, cell, dist): nearest centroid per vector with the whole
    argmin MAP-SIDE — the k×d centroid table collapses to ONE row (an
    array of (cell, cvec) structs, sorted by cell), broadcasts, and each
    vector picks ``array_min`` of the per-centroid (dist, cell) structs.
    Struct comparison is lexicographic, so the min is exactly the
    (dist ASC, cell ASC) argmin the window form computes — but NOTHING
    shuffles: :func:`kmeans_assign` moves N·k rows (each carrying the
    embedding) through a per-vec_id window, which at k≈√N is an
    N^1.5-row shuffle; here the corpus stays put and the model rides the
    broadcast. This is the assignment shape that survives 100 TB: k×d
    doubles per executor, one codegen pass over the data.

    Distance values are bit-identical to the window form (same zip_with
    diff, same left-fold ``dot``), so the DuckDB oracle's
    ROW_NUMBER-over-(dist, cell) replay matches."""
    carr = cent.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("cell", "cvec"))).alias("cents")
    )

    def _dist_cell(s: Column) -> Column:
        diff = F.zip_with(
            F.col("embedding"), s.getField("cvec"), lambda x, y: x.cast("double") - y
        )
        return F.struct(dot(diff, diff).alias("dist"), s.getField("cell").alias("cell"))

    best = F.array_min(F.transform(F.col("cents"), _dist_cell))
    return (
        e.crossJoin(F.broadcast(carr))
        .withColumn("best", best)
        .drop("cents")
        .withColumn("cell", F.col("best.cell"))
        .withColumn("dist", F.col("best.dist"))
        .drop("best")
    )


def kmeans_sqrtn(e: DataFrame, n_iter: int = 2) -> DataFrame:
    """Lloyd's k-means with k = ceil(sqrt(N)) — the quantizer sizing that
    keeps within-cell pair joins (N/k)²·k = N^1.5-bounded instead of
    N²/k at fixture-fixed k (the one super-linear operator VERDICT r6
    measured). Returns the final assignment frame (vec_id, …, cell).

    Same determinism contract as :func:`kmeans` (k-lowest-vec_id seeds,
    (dist, cell) ties, floor-quantized exact centroid averages, empty
    cells keep their previous centroid), so the whole chain unrolls into
    the DuckDB oracle (:func:`sql_kmeans_sqrtn_parts`). Driver state: ONE
    scalar (the corpus count that sizes k) plus the k×d centroid model —
    bounded by model size, never data size."""
    return kmeans_assign_mapside(e, kmeans_sqrtn_model(e, n_iter))


def kmeans_sqrtn_model(e: DataFrame, n_iter: int = 2) -> DataFrame:
    """The TRAINED √N-k-means centroid model (cell, cvec) alone — split
    out of :func:`kmeans_sqrtn` so callers can train once, persist the
    k×d frame (``sources/versioned.write_snapshot``), and amortize the
    Lloyd iterations across every later assignment pass (VERDICT r7 #6:
    x_semdedup was paying 2 training rounds per query). Training is
    fully deterministic, so a reloaded model is bit-identical to a fresh
    fit and the unrolled DuckDB oracle stays valid either way."""
    import math

    k = int(math.ceil(math.sqrt(e.count())))
    quantum = 1_000_000_000.0
    cent = (
        e.orderBy("vec_id")
        .limit(k)
        .select(
            # seed ordering on the ORIGINAL bigint vec_id — an int cast
            # here wraps for vec_id > 2^31 and diverges seed/cell
            # numbering from the oracle's ORDER BY vec_id (ADVICE r7)
            F.col("vec_id").alias("_seed_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
        )
        .withColumn("cell", F.row_number().over(Window.orderBy("_seed_id")) - 1)
        .select("cell", "cvec")
    )
    for _ in range(n_iter):
        assigned = kmeans_assign_mapside(e.select("vec_id", "embedding"), cent)
        new_cent = (
            assigned.select("cell", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(
                (
                    F.sum(F.floor(F.col("v").cast("double") * quantum)).cast("double")
                    / F.count("v")
                    / quantum
                ).alias("c")
            )
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
            .select("cell", F.transform("dc", lambda s: s.getField("c")).alias("cvec"))
        )
        kept = cent.join(new_cent, "cell", "left_anti")
        # lazy checkpoint: truncates the per-iteration lineage without a
        # dedicated materialization job (the k×d table materializes when
        # the next assignment pass broadcasts it)
        cent = new_cent.unionByName(kept).localCheckpoint(eager=False)
    return cent


def sql_kmeans_sqrtn_parts(n_iter: int = 2, where: str = "TRUE") -> list[str]:
    """CTE parts replaying :func:`kmeans_sqrtn` in DuckDB, k derived from
    the data (ceil(sqrt(COUNT(*)))) exactly as the Spark trainer derives
    it — the final assignment CTE is ``a{n_iter}`` (vec_id, v, cell,
    dist). ``where`` restricts the TRAINING corpus (the incremental
    semdedup path trains on the established corpus only). Same unroll
    discipline as :func:`_sql_kmeans`."""
    q = "1000000000.0"
    sq_dist = (
        "list_dot_product("
        "list_transform(generate_series(1, len(e.v)), i -> e.v[i] - c.cvec[i]), "
        "list_transform(generate_series(1, len(e.v)), i -> e.v[i] - c.cvec[i]))"
    )
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v "
        f"FROM embeddings WHERE {where})",
        "kn AS (SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) AS k FROM e)",
        """c0 AS MATERIALIZED (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
          FROM (SELECT vec_id, v,
                       ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM e)
          WHERE rn <= (SELECT k FROM kn)
        )""",
    ]

    def assign(c: str, a: str) -> list[str]:
        return [
            f"""{a}_all AS (
              SELECT e.vec_id, e.v, c.cell, {sq_dist} AS dist
              FROM e CROSS JOIN {c} c
            )""",
            f"""{a} AS MATERIALIZED (
              SELECT vec_id, v, cell, dist FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY dist, cell) AS rn
                FROM {a}_all
              ) WHERE rn = 1
            )""",
        ]

    def update(a: str, cprev: str, c: str) -> list[str]:
        return [
            f"""{c}_new AS MATERIALIZED (
              SELECT cell, list(cd ORDER BY dim) AS cvec FROM (
                SELECT cell, dim,
                       CAST(SUM(CAST(floor(v_el * {q}) AS BIGINT)) AS DOUBLE)
                         / COUNT(v_el) / {q} AS cd
                FROM (SELECT cell,
                             unnest(generate_series(1, len(v))) AS dim,
                             unnest(v) AS v_el
                      FROM {a})
                GROUP BY cell, dim
              ) GROUP BY cell
            )""",
            f"""{c} AS MATERIALIZED (
              SELECT cell, cvec FROM {c}_new
              UNION ALL
              SELECT p.cell, p.cvec FROM {cprev} p
              WHERE p.cell NOT IN (SELECT cell FROM {c}_new)
            )""",
        ]

    parts += assign("c0", "a0")
    for i in range(1, n_iter + 1):
        parts += update(f"a{i-1}", f"c{i-1}", f"c{i}")
        parts += assign(f"c{i}", f"a{i}")
    return parts


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third rung of the ANN ladder
# (x_knn_cosine_topk exact → x_knn_ivf_topk coarse cells → PQ codes)
# ---------------------------------------------------------------------------

#: PQ geometry: m subspaces × k centroids. 64-dim fixture vectors → eight
#: 8-dim slices, 16-entry codebooks → 8 half-byte-addressable codes/vector
#: (stored as ints here; 8 bytes vs 256 float bytes = 32× compression).
_PQ_M = 8
_PQ_K = 16
_PQ_ITERS = 3


def _subvectors(e: DataFrame, m: int) -> DataFrame:
    """(vec_id, sub, svec): the m contiguous subspace slices of every
    embedding — one map-only posexplode, ×m fan-out of a 2-column
    relation; slice width is derived from the embedding length so the
    same code serves any dim divisible by m."""
    return e.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> transform("
                f"slice(embedding, s * (size(embedding) div {m}) + 1,"
                f" size(embedding) div {m}), x -> cast(x as double)))"
            )
        ).alias("sub", "svec"),
    )


def pq_assign(sub: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, sub, svec, cell, dist): nearest codebook entry per
    (vector, subspace). ``cent`` is the (sub, cell, cvec) codebook —
    m×k rows, broadcast — so assignment for ALL m codebooks is a single
    map pass; the argmin is a ``min_by`` hash aggregate over the
    (dist, cell) struct — same total order as the old row_number
    window, no sort of the |corpus|×m×k candidate frame (r10; runs
    n_iter+1 times per PQ train)."""
    diff = F.zip_with(F.col("svec"), F.col("cvec"), lambda x, y: x - y)
    return (
        sub.join(F.broadcast(cent), "sub")
        .select("vec_id", "sub", "svec", "cell", dot(diff, diff).alias("dist"))
        .groupBy("vec_id", "sub")
        .agg(
            F.min_by(
                F.struct("svec", "cell", "dist"), F.struct("dist", "cell")
            ).alias("best")
        )
        .select("vec_id", "sub", "best.svec", "best.cell", "best.dist")
    )


#: Per-(session, sf_dir) memo of the trained PQ codebooks — the
#: cached_scc_assignment pattern: x_embed_pq_topk and x_knn_ivfpq_topk
#: train the identical m×k codebook from the identical full-corpus input,
#: and the 3-round Lloyd loop (2 checkpoint jobs + 1 aggregate per round)
#: was ~80% of each query's steady-state wall-clock (measured 6–7 s of a
#: 7.8 s row at sf0.1). In-session only, never disk: the first consumer
#: in any sweep pays the fit reproducibly (it lands in that query's COLD
#: row), later consumers reuse the checkpointed m×k frame. At 100 TB this
#: is the production shape — the ANN index's codebooks are trained once
#: per corpus version, not per query.
_PQ_CODEBOOK_MEMO: dict[tuple, DataFrame] = {}


def cached_pq_codebooks(spark, sf_dir: str) -> DataFrame:
    """Load-or-train the shared full-corpus PQ codebooks (see memo note)."""
    import os

    from ..memo import session_memo
    from ..sources import tables as _tables

    return session_memo(
        _PQ_CODEBOOK_MEMO,
        spark,
        (os.path.normpath(sf_dir), _PQ_M, _PQ_K, _PQ_ITERS),
        lambda: pq_train(
            _tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
        ),
    )


def pq_train(e: DataFrame, m: int = _PQ_M, k: int = _PQ_K, n_iter: int = _PQ_ITERS) -> DataFrame:
    """Train the m PQ codebooks JOINTLY: every Lloyd iteration is ONE
    assignment pass over the (vec_id, sub) relation for all m subspaces
    at once plus one (sub, cell, dim)-keyed aggregate — not m separate
    k-means runs, so the corpus is scanned n_iter times total regardless
    of m. Determinism mirrors :func:`kmeans`: seeds are the k lowest
    vec_ids' subvectors, assignment ties break on cell, centroid updates
    use the floor-quantized exact average. The codebook never leaves the
    cluster as anything bigger than an m×k-row DataFrame."""
    sub = _subvectors(e, m)
    quantum = 1_000_000_000.0
    wseed = Window.partitionBy("sub").orderBy("vec_id")
    cent = (
        sub.withColumn("rn", F.row_number().over(wseed))
        .where(F.col("rn") <= k)
        .select("sub", (F.col("rn") - 1).cast("int").alias("cell"), F.col("svec").alias("cvec"))
    )
    assigned = pq_assign(sub, cent)
    for _ in range(n_iter):
        assigned = assigned.localCheckpoint()  # truncate per-round lineage
        new_cent = (
            assigned.select("sub", "cell", F.posexplode("svec").alias("dim", "v"))
            .groupBy("sub", "cell", "dim")
            .agg(
                (
                    F.sum(F.floor(F.col("v") * quantum)).cast("double")
                    / F.count("v")
                    / quantum
                ).alias("c")
            )
            .groupBy("sub", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
            .select("sub", "cell", F.transform("dc", lambda s: s.getField("c")).alias("cvec"))
        )
        # empty cells keep their previous centroid
        kept = cent.join(new_cent, ["sub", "cell"], "left_anti")
        cent = new_cent.unionByName(kept).localCheckpoint()
        assigned = pq_assign(sub, cent)
    return cent


def pq_encode(e: DataFrame, cent: DataFrame, m: int = _PQ_M) -> DataFrame:
    """(vec_id, sub, cell) PQ codes — m small ints per vector instead of
    d floats; the only corpus-sized relation ADC search ever touches."""
    return pq_assign(_subvectors(e, m), cent).select("vec_id", "sub", "cell")


#: ADC shortlist size before exact re-ranking.
_PQ_SHORTLIST = 100


def _sql_pq_parts(m: int = _PQ_M, k: int = _PQ_K, n_iter: int = _PQ_ITERS) -> list[str]:
    """The shared CTE chain of the PQ-ANN oracles: joint codebook
    training (Lloyd iterations unrolled, same scheme as
    :func:`_sql_kmeans`), encoding (``codes``), and the query's ADC
    lookup table (``adc``). ``x_embed_pq_topk`` appends the whole-corpus
    shortlist; ``x_knn_ivfpq_topk`` appends a coarse-cell-restricted one.
    Portable for the same reasons as the k-means oracle; the subspace
    slice v[s·w+1 : s·w+w] matches Spark's 1-based ``slice`` exactly."""
    q = "1000000000.0"
    sq = (
        "list_dot_product("
        "list_transform(generate_series(1, len(s.svec)), i -> s.svec[i] - c.cvec[i]), "
        "list_transform(generate_series(1, len(s.svec)), i -> s.svec[i] - c.cvec[i]))"
    )
    parts = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""sub AS MATERIALIZED (
          SELECT vec_id, m.sub,
                 v[m.sub * (len(v) // {m}) + 1 : m.sub * (len(v) // {m}) + (len(v) // {m})] AS svec
          FROM e, LATERAL (SELECT unnest(range(0, {m})) AS sub) m
        )""",
        f"""c0 AS MATERIALIZED (
          SELECT sub, CAST(rn - 1 AS INT) AS cell, svec AS cvec FROM (
            SELECT sub, svec,
                   ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
            FROM sub
          ) WHERE rn <= {k}
        )""",
    ]

    def assign(c: str, a: str) -> list[str]:
        return [
            f"""{a}_all AS (
              SELECT s.vec_id, s.sub, s.svec, c.cell, {sq} AS dist
              FROM sub s JOIN {c} c ON c.sub = s.sub
            )""",
            f"""{a} AS MATERIALIZED (
              SELECT vec_id, sub, svec, cell, dist FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                             ORDER BY dist, cell) AS rn
                FROM {a}_all
              ) WHERE rn = 1
            )""",
        ]

    def update(a: str, cprev: str, c: str) -> list[str]:
        return [
            f"""{c}_new AS MATERIALIZED (
              SELECT sub, cell, list(cd ORDER BY dim) AS cvec FROM (
                SELECT sub, cell, dim,
                       CAST(SUM(CAST(floor(v_el * {q}) AS BIGINT)) AS DOUBLE)
                         / COUNT(v_el) / {q} AS cd
                FROM (SELECT sub, cell,
                             unnest(generate_series(1, len(svec))) AS dim,
                             unnest(svec) AS v_el
                      FROM {a})
                GROUP BY sub, cell, dim
              ) GROUP BY sub, cell
            )""",
            f"""{c} AS MATERIALIZED (
              SELECT sub, cell, cvec FROM {c}_new
              UNION ALL
              SELECT p.sub, p.cell, p.cvec
              FROM {cprev} p ANTI JOIN {c}_new n
                ON n.sub = p.sub AND n.cell = p.cell
            )""",
        ]

    parts += assign("c0", "a0")
    for i in range(1, n_iter + 1):
        parts += update(f"a{i-1}", f"c{i-1}", f"c{i}")
        parts += assign(f"c{i}", f"a{i}")
    cfin = f"c{n_iter}"
    parts += [
        f"codes AS MATERIALIZED (SELECT vec_id, sub, cell FROM a{n_iter})",
        f"""qsub AS (SELECT sub, svec AS qvec FROM sub WHERE vec_id = 0)""",
        f"""adc AS (
          SELECT c.sub, c.cell,
                 list_dot_product(
                   list_transform(generate_series(1, len(c.cvec)), i -> c.cvec[i] - t.qvec[i]),
                   list_transform(generate_series(1, len(c.cvec)), i -> c.cvec[i] - t.qvec[i])) AS adc
          FROM {cfin} c JOIN qsub t ON t.sub = c.sub
        )""",
        """qv AS (SELECT v FROM e WHERE vec_id = 0)""",
    ]
    return parts


#: The exact L2 re-rank expression both PQ oracles share.
_SQL_L2_RERANK = """
    SELECT e.vec_id,
           list_dot_product(
             list_transform(generate_series(1, len(e.v)), i -> e.v[i] - qv.v[i]),
             list_transform(generate_series(1, len(e.v)), i -> e.v[i] - qv.v[i])) AS dist
    FROM e SEMI JOIN shortlist ON shortlist.vec_id = e.vec_id, qv
    ORDER BY dist, vec_id
    LIMIT 10
    """


def _sql_pq_topk(m: int = _PQ_M, k: int = _PQ_K, n_iter: int = _PQ_ITERS) -> str:
    parts = _sql_pq_parts(m, k, n_iter)
    parts.append(
        f"""shortlist AS (
          SELECT codes.vec_id,
                 CAST(SUM(CAST(adc AS DECIMAL(28,12))) AS DOUBLE) AS approx_dist
          FROM codes JOIN adc ON adc.sub = codes.sub AND adc.cell = codes.cell
          WHERE codes.vec_id <> 0
          GROUP BY codes.vec_id
          ORDER BY approx_dist, vec_id
          LIMIT {_PQ_SHORTLIST}
        )"""
    )
    return "WITH " + ",\n".join(parts) + _SQL_L2_RERANK


@query("x_embed_pq_topk", oracle=_sql_pq_topk())
def x_embed_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ANN top-10 for the vec_id-0 query, the production two-stage
    shape: (1) ASYMMETRIC DISTANCE shortlist — the exact ‖q_sub − c_sub‖²
    for every (sub, cell) is an m×k lookup table built from the query and
    the codebooks (broadcast); a vector's approximate distance is the sum
    of its m table entries, so the corpus-sized pass reads ONLY the codes
    (32× smaller than the embeddings) and is a broadcast join + m-row sum
    → TakeOrdered top-100; (2) EXACT RE-RANK — only the 100 shortlisted
    embeddings are fetched (semi-join on vec_id) and scored with the true
    L2 distance → top-10. At 100 TB stage 1's code scan is the whole
    cost; IVF cells (x_embed_kmeans) compose in front for sub-linear
    probes, and stage 2 touches a constant 100 rows regardless of scale.
    Full oracle since r4: training, encoding, ADC and re-rank all replay
    in SQL (the PQ trainer is deterministic and engine-portable exactly
    like :func:`kmeans`); pytest additionally pins recall@10 vs the exact
    full scan, run-to-run determinism, and code-geometry invariants.
    """
    t = tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    cent = cached_pq_codebooks(spark, sf_dir)
    codes = pq_encode(e, cent)
    q = _subvectors(e.where(F.col("vec_id") == 0), _PQ_M).select(
        "sub", F.col("svec").alias("qvec")
    )
    qdiff = F.zip_with(F.col("cvec"), F.col("qvec"), lambda x, y: x - y)
    adc = cent.join(F.broadcast(q), "sub").select(
        "sub", "cell", dot(qdiff, qdiff).alias("adc")
    )
    shortlist = (
        codes.where(F.col("vec_id") != 0)
        .join(F.broadcast(adc), ["sub", "cell"])
        .groupBy("vec_id")
        # exact decimal sum: m addends per group, but partial-agg order must
        # not move the double total between runs (determinism pytest)
        .agg(F.sum(F.col("adc").cast("decimal(28,12)")).cast("double").alias("approx_dist"))
        .orderBy("approx_dist", "vec_id")
        .limit(_PQ_SHORTLIST)
    )
    qv = e.where(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    d = F.zip_with(F.col("embedding"), F.col("qv"), lambda x, y: x.cast("double") - y)
    return (
        e.join(shortlist.select("vec_id"), "vec_id", "left_semi")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", dot(d, d).alias("dist"))
        .orderBy("dist", "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composed production ANN index (round 10)
# ---------------------------------------------------------------------------

_IVFPQ_PROBES = 3      # coarse cells probed
_IVFPQ_SHORTLIST = 100  # ADC shortlist within the probed cells (PQ convention)


def _sql_ivfpq_topk() -> str:
    from .centroids import _SQL_CENTROIDS
    from .similarity import _SQL_COSINE

    coarse = [
        f"cd AS ({_SQL_CENTROIDS})",
        """cent AS (
          SELECT label, list(centroid ORDER BY dim) AS centroid
          FROM cd GROUP BY label
        )""",
        "qfull AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)",
        f"""probed AS (
          SELECT label FROM cent, qfull
          ORDER BY {_SQL_COSINE.format(a='centroid', b='qv')} DESC, label
          LIMIT {_IVFPQ_PROBES}
        )""",
        """cand AS (
          SELECT vec_id FROM embeddings
          WHERE vec_id <> 0 AND label IN (SELECT label FROM probed)
        )""",
    ]
    parts = coarse + _sql_pq_parts()
    parts.append(
        f"""shortlist AS (
          SELECT codes.vec_id,
                 CAST(SUM(CAST(adc AS DECIMAL(28,12))) AS DOUBLE) AS approx_dist
          FROM codes JOIN adc ON adc.sub = codes.sub AND adc.cell = codes.cell
          WHERE codes.vec_id IN (SELECT vec_id FROM cand)
          GROUP BY codes.vec_id
          ORDER BY approx_dist, vec_id
          LIMIT {_IVFPQ_SHORTLIST}
        )"""
    )
    return "WITH " + ",\n".join(parts) + _SQL_L2_RERANK


@query("x_knn_ivfpq_topk", oracle=_sql_ivfpq_topk())
def x_knn_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10 for the vec_id-0 query — the COMPOSED production ANN
    index (Jégou et al.'s IVFADC shape), stacking the engine's two
    certified rungs: (1) COARSE PROBE — rank cells by centroid cosine,
    keep the {probes} nearest (x_knn_ivf_topk's stage; with the corpus
    parquet partitioned by cell this is partition pruning, so the scan
    only ever reads probed cells); (2) ADC SHORTLIST — inside the probed
    cells, rank by PQ asymmetric distance: the m×k query-to-codeword
    table broadcasts, a vector costs one m-code lookup-sum, and the scan
    reads CODES (32× smaller than embeddings) → top {short};
    (3) EXACT RE-RANK — fetch only those {short} embeddings, true L2 →
    top-10. Codebooks train on the full corpus (production trains on a
    sample; deterministic here so the oracle replays training too).

    At 100 TB the cost is probes/N of the code scan — the only
    corpus-sized relation — plus constant re-rank I/O; every join is a
    broadcast. Full oracle: coarse probe, training, encoding, ADC and
    re-rank all replay in SQL (the shared :func:`_sql_pq_parts` chain +
    the x_knn_ivf_topk probe CTE). pytest pins recall@10 vs the exact
    scan and agreement with the unrestricted PQ path."""
    from .centroids import centroids_assembled
    from .similarity import cosine

    t = tables(spark, sf_dir)
    e = t["embeddings"]
    # (1) coarse probe — identical expressions to x_knn_ivf_topk
    q_emb = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    probed = (
        centroids_assembled(e)
        .crossJoin(F.broadcast(q_emb))
        .select("label", cosine(F.col("centroid"), F.col("qv")).alias("cell_sim"))
        .orderBy(F.col("cell_sim").desc(), "label")
        .limit(_IVFPQ_PROBES)
        .select("label")
    )
    cand = e.where(F.col("vec_id") != 0).join(F.broadcast(probed), "label", "left_semi")
    # (2) ADC shortlist over the probed cells' codes
    ev = e.select("vec_id", "embedding")
    cent = cached_pq_codebooks(spark, sf_dir)
    codes = pq_encode(cand.select("vec_id", "embedding"), cent)
    q = _subvectors(ev.where(F.col("vec_id") == 0), _PQ_M).select(
        "sub", F.col("svec").alias("qvec")
    )
    qdiff = F.zip_with(F.col("cvec"), F.col("qvec"), lambda x, y: x - y)
    adc = cent.join(F.broadcast(q), "sub").select(
        "sub", "cell", dot(qdiff, qdiff).alias("adc")
    )
    shortlist = (
        codes.join(F.broadcast(adc), ["sub", "cell"])
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("adc").cast("decimal(28,12)"))
            .cast("double")
            .alias("approx_dist")
        )
        .orderBy("approx_dist", "vec_id")
        .limit(_IVFPQ_SHORTLIST)
    )
    # (3) exact re-rank of the shortlist
    qv = ev.where(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    d = F.zip_with(F.col("embedding"), F.col("qv"), lambda x, y: x.cast("double") - y)
    return (
        ev.join(shortlist.select("vec_id"), "vec_id", "left_semi")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", dot(d, d).alias("dist"))
        .orderBy("dist", "vec_id")
        .limit(10)
    )


x_knn_ivfpq_topk.__doc__ = x_knn_ivfpq_topk.__doc__.format(
    probes=_IVFPQ_PROBES, short=_IVFPQ_SHORTLIST
)


# ---------------------------------------------------------------------------
# Random-projection dimensionality reduction
# ---------------------------------------------------------------------------

_RP_DIMS = 16


def _rp_sign(k: int, d) -> Column:
    """Deterministic ±1 sign for output dim k, input dim d: bit 16 of the
    Knuth multiplicative hash (d+1)·(k+1)·2654435761 — near-iid signs
    (measured pairwise-distance correlation ≈ true-random ±1 matrices on
    the fixture corpus; simple mod-97 parity mixes were visibly shifted
    copies across k). Exact integer arithmetic, < 2^63 — bit-identical
    in any engine."""
    return (
        F.when(
            F.shiftright((d + 1) * F.lit((k + 1) * 2654435761), 16) % 2 == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
    )


def _rp_fn(k: int):
    """Single-arg lambda factory (same trap as similarity._hp_fn: a
    two-arg lambda would receive the array index as the second arg)."""
    return lambda d: _rp_sign(k, d)


@query(
    "x_embed_rp_project",
    oracle="""
    SELECT vec_id, """
    + ",\n           ".join(
        "list_dot_product(embedding::DOUBLE[], "
        "list_transform(range(0, len(embedding)), d -> "
        f"CAST(CASE WHEN (d + 1) * {(k + 1) * 2654435761} // 65536 % 2 = 0 "
        f"THEN 1.0 ELSE -1.0 END AS DOUBLE))) AS proj_{k}"
        for k in range(_RP_DIMS)
    )
    + """
    FROM embeddings
    ORDER BY vec_id
    """,
)
def x_embed_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign random projection 64-d → 16-d (Achlioptas ±1 variant):
    proj_k = ⟨v, s_k⟩ with deterministic integer-hash signs, preserving
    pairwise distances in expectation (Johnson-Lindenstrauss) at a 4×
    storage cut — the cheap pre-filter in front of exact re-ranking, and
    the same construction the SRP cell quantizer uses for single bits
    (functions/similarity.py), here keeping the magnitudes. Map-only
    whole-stage codegen: one corpus pass, no shuffle, no trained state;
    the fold-ordered dot() keeps every projected double bit-equal to
    DuckDB's list_dot_product."""
    e = tables(spark, sf_dir)["embeddings"]
    cols = [
        dot(
            F.col("embedding"),
            F.transform(F.sequence(F.lit(0), F.size("embedding") - 1), _rp_fn(k)),
        ).alias(f"proj_{k}")
        for k in range(_RP_DIMS)
    ]
    return e.select("vec_id", *cols).orderBy("vec_id")
