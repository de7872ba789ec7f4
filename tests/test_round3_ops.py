"""Round-3 operator tests (stats / rollup tree / events analytics /
lines / RP projection): pure-Python replicas, algebraic invariants, plan
shape, and the driver-contract schema rule. Oracle parity is covered by
tools/verify_local.py; these pin what SQL parity can't.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from recommender_systems_pyspark_spark.registry import all_queries
from recommender_systems_pyspark_spark.sources import tables

SPECS = all_queries()


# ---------------------------------------------------------------------------
# Driver contract: the grader's pandas canonicalizer hashes every result —
# list/map/struct cells are unhashable there (x_media_resize failed r2
# exactly this way). Resolving the schema is lazy for all non-training
# queries; the eager ML/kmeans ones train small models at smoke scale.
# ---------------------------------------------------------------------------


def test_all_registered_queries_emit_atomic_columns_only(spark, sf_dir):
    bad = {}
    for name, spec in SPECS.items():
        schema = spec.fn(spark, sf_dir).schema
        nonatomic = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nonatomic:
            bad[name] = nonatomic
    assert not bad, f"non-scalar result columns would crash the grader: {bad}"


# ---------------------------------------------------------------------------
# Moments: numpy replica
# ---------------------------------------------------------------------------


def test_stat_moments_match_numpy(spark, sf_dir):
    rows = {r.l_returnflag: r for r in SPECS["a10_stat_moments"].fn(spark, sf_dir).collect()}
    li = tables(spark, sf_dir)["lineitem"].select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        r = rows[flag]
        q = grp["l_quantity"].to_numpy()
        p = grp["l_extendedprice"].to_numpy()
        assert r.n == len(q)
        assert r.mean_qty == pytest.approx(q.mean(), rel=1e-12)
        assert r.var_qty == pytest.approx(q.var(ddof=1), rel=1e-9)
        assert r.std_qty == pytest.approx(q.std(ddof=1), rel=1e-9)
        assert r.corr_qty_price == pytest.approx(
            float(np.corrcoef(q, p)[0, 1]), rel=1e-6, abs=1e-9
        )


# ---------------------------------------------------------------------------
# Rollup tree: coarser levels must equal aggregating raw directly
# (mergeable-partial associativity, checked inside one engine)
# ---------------------------------------------------------------------------


def test_rollup_tree_day_level_equals_direct_aggregation(spark, sf_dir):
    out = SPECS["d2_rollup_tree"].fn(spark, sf_dir)
    day_rows = {
        r.bucket_ts: (r.n_events, r.total_value)
        for r in out.where("level = 'day'").collect()
    }
    ev = tables(spark, sf_dir)["events"]
    direct = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
    )
    for r in direct.collect():
        n, v = day_rows[r.d]
        assert n == r.n
        assert v == r.v  # bit-equal: decimal partials merged associatively


# ---------------------------------------------------------------------------
# Attribution: per-user replay replica
# ---------------------------------------------------------------------------


def test_attribution_matches_replay(spark, sf_dir):
    ev = sorted(
        tables(spark, sf_dir)["events"]
        .select("event_id", "user_id", "ts", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    expect = {}
    state: dict = {}
    for r in ev:
        st = state.setdefault(r.user_id, {"first": None, "last": None, "n": 0})
        if r.event_type == "purchase":
            expect[r.event_id] = (st["first"], st["last"], st["n"])
        if r.event_type in ("view", "click"):
            if st["first"] is None:
                st["first"] = r.event_type
            st["last"] = r.event_type
            st["n"] += 1
    got = {
        r.event_id: (r.first_touch, r.last_touch, r.n_touches)
        for r in SPECS["x_attribution_touch"].fn(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# CDC chunking: chunk lengths must sum to token count, and boundaries are
# content-defined — identical tokens chunk identically everywhere
# ---------------------------------------------------------------------------


def _tok_hash(tok: str) -> int:
    return (ord(tok[0]) * 961 + ord(tok[-1]) * 31 + len(tok)) % 16


def test_cdc_chunking_matches_python(spark, sf_dir):
    docs = {
        r.doc_id: r.text
        for r in tables(spark, sf_dir)["documents"].collect()
        if r.text
    }
    got = {
        r.doc_id: (r.n_chunks, r.max_chunk_tokens)
        for r in SPECS["x_cdc_chunking"].fn(spark, sf_dir).collect()
    }
    for doc_id, text in docs.items():
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        lens, cur = [], 0
        for t in toks:
            cur += 1
            if _tok_hash(t) == 0:
                lens.append(cur)
                cur = 0
        if cur:
            lens.append(cur)
        assert got[doc_id] == (len(lens), max(lens)), doc_id


# ---------------------------------------------------------------------------
# Quality logit: python replica of the linear score
# ---------------------------------------------------------------------------


def test_quality_logit_matches_python(spark, sf_dir):
    got = {r.doc_id: r for r in SPECS["x_quality_logit"].fn(spark, sf_dir).collect()}
    for r in tables(spark, sf_dir)["documents"].collect():
        if not r.text:
            continue
        toks = r.text.split(" ")
        n = len(toks)
        stop = sum(1 for t in toks if t in ("the", "a")) / n
        uniq = len(set(toks)) / n
        mlen = len(r.text.replace(" ", "")) / n
        score = -1.5 + 2.0 * stop + 3.0 * uniq + 0.25 * mlen
        g = got[r.doc_id]
        assert g.score == pytest.approx(score, rel=1e-12)
        assert g.keep == (score > 1.8)


# ---------------------------------------------------------------------------
# Triangle count: brute-force replica at smoke scale
# ---------------------------------------------------------------------------


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    li = tables(spark, sf_dir)["lineitem"].select("l_orderkey", "l_partkey").collect()
    by_order: dict = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    tri = sum(
        1
        for (u, v) in edges
        for w in adj.get(v, ())
        if w in adj.get(u, ())
    )
    row = SPECS["x_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri


# ---------------------------------------------------------------------------
# RFM: ntile buckets are balanced and deterministic across runs
# ---------------------------------------------------------------------------


def test_rfm_quartiles_balanced_and_deterministic(spark, sf_dir):
    fn = SPECS["x_rfm_segments"].fn
    rows1 = fn(spark, sf_dir).collect()
    rows2 = fn(spark, sf_dir).collect()
    assert rows1 == rows2
    n = len(rows1)
    for col in ("r_score", "f_score", "m_score"):
        counts: dict = {}
        for r in rows1:
            counts[r[col]] = counts.get(r[col], 0) + 1
        assert set(counts) == {1, 2, 3, 4}
        assert max(counts.values()) - min(counts.values()) <= 1, (col, counts, n)


# ---------------------------------------------------------------------------
# Line dedup / stopword prune: reconstruction md5 is consistent with the
# counts (empty reconstruction iff zero kept)
# ---------------------------------------------------------------------------


def test_line_dedup_counts_consistent(spark, sf_dir):
    import hashlib

    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in SPECS["x_line_dedup"].fn(spark, sf_dir).collect():
        assert 0 <= r.n_kept <= r.n_segs
        assert (r.kept_md5 == empty_md5) == (r.n_kept == 0)


def test_stopword_prune_drops_something_everywhere(spark, sf_dir):
    rows = SPECS["x_stopword_prune"].fn(spark, sf_dir).collect()
    # corpus words are drawn from a tiny shared vocabulary: every doc with
    # tokens must lose at least one (the fixture's 'the'/'a' style fillers
    # clear the 50% DF bar)
    dropped = sum(1 for r in rows if r.n_kept < r.n_tokens)
    assert dropped > 0.9 * len(rows)


# ---------------------------------------------------------------------------
# RP projection: deterministic, and JL-style distance preservation holds in
# aggregate (rank correlation of pairwise distances positive on a sample)
# ---------------------------------------------------------------------------


def test_rp_projection_deterministic_and_distance_preserving(spark, sf_dir):
    fn = SPECS["x_embed_rp_project"].fn
    out1 = fn(spark, sf_dir).where("vec_id < 40").collect()
    out2 = fn(spark, sf_dir).where("vec_id < 40").collect()
    assert out1 == out2
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in tables(spark, sf_dir)["embeddings"].where("vec_id < 40").collect()
    }
    proj = {
        r.vec_id: np.array([r[f"proj_{k}"] for k in range(16)]) for r in out1
    }
    ids = sorted(set(emb) & set(proj))
    d_hi, d_lo = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d_hi.append(float(np.linalg.norm(emb[ids[i]] - emb[ids[j]])))
            d_lo.append(float(np.linalg.norm(proj[ids[i]] - proj[ids[j]])))
    # 16 sign dims on this clustered corpus: true-random ±1 matrices score
    # r≈0.38 on the same sample; the deterministic hash lands ≈0.36.
    r = float(np.corrcoef(d_hi, d_lo)[0, 1])
    assert r > 0.25, f"projected distances uncorrelated with originals: r={r}"
    assert not math.isnan(r)


def test_grade_first_names_all_resolve():
    # A typo'd name in the grading-order list would silently vanish from
    # the driver's window instead of being graded.
    from recommender_systems_pyspark_spark.registry import _GRADE_FIRST, _REGISTRY

    missing = [n for n in _GRADE_FIRST if n not in _REGISTRY]
    assert not missing, f"_GRADE_FIRST names not in registry: {missing}"
    assert len(set(_GRADE_FIRST)) == len(_GRADE_FIRST), "duplicates in _GRADE_FIRST"


def test_interval_overlap_matches_replay(spark, sf_dir):
    # Sessionize in Python (same strict >30min break), then brute-force
    # overlap pairs; compare the per-user concurrency summary.
    from collections import defaultdict
    from datetime import timedelta

    ev = sorted(
        tables(spark, sf_dir)["events"].select("user_id", "ts").collect(),
        key=lambda r: (r.user_id, r.ts),
    )
    sessions = []
    cur = None
    for r in ev:
        if cur and cur[0] == r.user_id and (r.ts - cur[2]) <= timedelta(minutes=30):
            cur = (cur[0], cur[1], r.ts)
        else:
            if cur:
                sessions.append(cur)
            cur = (r.user_id, r.ts, r.ts)
    if cur:
        sessions.append(cur)
    n_sessions: dict = defaultdict(int)
    overlapped: dict = defaultdict(set)
    partners: dict = defaultdict(set)
    for u, t0, t1 in sessions:
        n_sessions[u] += 1
    for i, (ua, a0, a1) in enumerate(sessions):
        for ub, b0, b1 in sessions[i + 1 :]:
            if ua != ub and a0 <= b1 and b0 <= a1:
                overlapped[ua].add((a0, a1))
                overlapped[ub].add((b0, b1))
                partners[ua].add(ub)
                partners[ub].add(ua)
    got = {
        r.user_id: (r.n_sessions, r.n_overlapped_sessions, r.n_partner_users)
        for r in SPECS["x_interval_overlap"].fn(spark, sf_dir).collect()
    }
    for u in n_sessions:
        assert got[u] == (
            n_sessions[u],
            len(overlapped.get(u, ())),
            len(partners.get(u, ())),
        ), u
