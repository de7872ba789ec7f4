"""Round-9 operator tests. Oracle equality is covered by
tools/verify_local.py + the driver gate; these pin the algorithmic
properties the hash compare can't see — score formulas recomputed
independently, leg/fusion consistency, and partition invariants."""

from __future__ import annotations

from decimal import ROUND_HALF_EVEN, Decimal

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# x_hybrid_rrf
# ---------------------------------------------------------------------------


def _q9(x: float) -> Decimal:
    return Decimal(x).quantize(Decimal("1.000000000"), rounding=ROUND_HALF_EVEN)


def test_hybrid_rrf_score_formula_and_order(spark, sf_dir):
    from recommender_systems_pyspark_spark.functions.search import (
        _FUSE_K,
        _RRF_C,
        _TOP_K,
        x_hybrid_rrf,
    )

    rows = x_hybrid_rrf(spark, sf_dir).collect()
    assert len(rows) == _TOP_K
    prev = None
    for r in rows:
        assert r.doc_id != 0  # the query document never retrieves itself
        assert r.lex_rank is not None or r.sem_rank is not None
        expect = Decimal(0)
        for rank in (r.lex_rank, r.sem_rank):
            if rank is not None:
                assert 1 <= rank <= _FUSE_K
                expect += _q9(1.0 / (_RRF_C + rank))
        # the returned double is exactly the decimal sum of the quantized
        # reciprocal contributions — recomputed here from the ranks alone
        assert float(expect) == r.rrf_score
        if prev is not None:
            assert r.rrf_score <= prev
        prev = r.rrf_score


def test_hybrid_rrf_legs_agree_with_certified_rankers(spark, sf_dir):
    """Each leg's rank order must agree with the standalone certified
    rankers (x_bm25_topk / x_knn_cosine_topk) on the shared candidates —
    fusion may not perturb within-leg order."""
    from recommender_systems_pyspark_spark.functions.search import (
        x_bm25_topk,
        x_hybrid_rrf,
    )
    from recommender_systems_pyspark_spark.functions.similarity import (
        x_knn_cosine_topk,
    )

    fused = x_hybrid_rrf(spark, sf_dir).collect()
    lex_order = [r.doc_id for r in x_bm25_topk(spark, sf_dir).collect() if r.doc_id != 0]
    sem_order = [r.vec_id for r in x_knn_cosine_topk(spark, sf_dir).collect()]
    got_lex = sorted(
        [r for r in fused if r.lex_rank is not None], key=lambda r: r.lex_rank
    )
    got_sem = sorted(
        [r for r in fused if r.sem_rank is not None], key=lambda r: r.sem_rank
    )
    # the fused frame's lex-ranked docs appear in the same relative order
    # as the standalone BM25 top-10 (restricted to shared docs)
    lex_shared = [r.doc_id for r in got_lex if r.doc_id in lex_order]
    assert lex_shared == [d for d in lex_order if d in lex_shared]
    sem_shared = [r.doc_id for r in got_sem if r.doc_id in sem_order]
    assert sem_shared == [d for d in sem_order if d in sem_shared]


# ---------------------------------------------------------------------------
# x_cluster_safe_split
# ---------------------------------------------------------------------------


def test_cluster_safe_split_partitions_and_no_leakage(spark, sf_dir):
    from recommender_systems_pyspark_spark.functions.graph import (
        x_cluster_safe_split,
        x_dedup_clusters,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    rows = x_cluster_safe_split(spark, sf_dir).collect()
    by_split = {r.split: r for r in rows}
    assert set(by_split) <= {"train", "val", "test"}
    # splits partition the corpus exactly
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    # zero near-dup pairs straddle any split — the whole point
    assert all(r.leaked_pairs == 0 for r in rows)
    # cluster-atomicity: no cluster_id appears under two splits
    comp = x_dedup_clusters(spark, sf_dir)
    from recommender_systems_pyspark_spark.functions.strata import split_bucket

    multi = (
        comp.select(
            "cluster_id",
            F.when(split_bucket(F.col("cluster_id")) < 80, "train")
            .when(split_bucket(F.col("cluster_id")) < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert multi == 0


# ---------------------------------------------------------------------------
# x_random_walks
# ---------------------------------------------------------------------------


def test_random_walks_python_replay(spark):
    """Independent python replay at sf0.001: rebuild the co-purchase
    adjacency, re-derive every walk with hashlib md5 — every hop of every
    walk must match the engine's walk exactly."""
    import hashlib
    from collections import defaultdict

    from recommender_systems_pyspark_spark.functions.pagerank import (
        _WALK_SEED_MOD,
        _WALK_STEPS,
        cached_copurchase_edges,
        x_random_walks,
    )

    sf = "/root/testdata/sf0.001"
    edges = cached_copurchase_edges(spark, sf).collect()
    adj = defaultdict(list)
    for e in edges:
        adj[e.src].append(e.dst)
    for n in adj:
        adj[n].sort()

    def pick(start: int, step: int, cur: int) -> int:
        h = hashlib.md5(f"{start}:{step}:{cur}".encode()).hexdigest()[:8]
        return int(h, 16) % len(adj[cur])

    got = {r.start_node: r for r in x_random_walks(spark, sf).collect()}
    seeds = sorted(n for n in adj if n % _WALK_SEED_MOD == 0)
    assert sorted(got) == seeds
    for start in seeds:
        cur = start
        for s in range(1, _WALK_STEPS + 1):
            cur = adj[cur][pick(start, s, cur)]
            assert got[start][f"hop{s}"] == cur, (start, s)


def test_random_walks_hops_are_edges(spark, sf_dir):
    from recommender_systems_pyspark_spark.functions.pagerank import (
        _WALK_STEPS,
        cached_copurchase_edges,
        x_random_walks,
    )

    edges = {(e.src, e.dst) for e in cached_copurchase_edges(spark, sf_dir).collect()}
    for r in x_random_walks(spark, sf_dir).collect():
        path = [r.start_node] + [r[f"hop{s}"] for s in range(1, _WALK_STEPS + 1)]
        for u, v in zip(path, path[1:]):
            assert (u, v) in edges


# ---------------------------------------------------------------------------
# x_compaction_plan
# ---------------------------------------------------------------------------


def test_compaction_plan_invariants(spark, sf_dir):
    """Groups partition the manifest, stay in file order, and obey the
    exact binning law: each group's id is the floor of the cumulative
    bytes preceding it over the target size."""
    from recommender_systems_pyspark_spark.functions.warehouse import (
        _COMPACT_TARGET,
        x_compaction_plan,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    rows = x_compaction_plan(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total_docs = docs.count()
    total_bytes = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r.n_docs for r in rows) == total_docs
    assert sum(r.group_bytes for r in rows) == total_bytes
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, grps in by_src.items():
        grps.sort(key=lambda r: r.group_id)
        # group ids are dense from 0 and file ranges never interleave
        assert grps[0].group_id == 0
        for a, b in zip(grps, grps[1:]):
            assert b.group_id >= a.group_id + 1
            assert b.first_file > a.last_file
        # exact binning law: each group's id is the floor of the cumulative
        # bytes that precede its first file (replayed from group totals)
        cum = 0
        for g in grps:
            assert g.group_id == cum // _COMPACT_TARGET
            cum += g.group_bytes


# ---------------------------------------------------------------------------
# x_vocab_coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_monotone_and_replayed(spark, sf_dir):
    """Coverage is monotone in vocab size, ppm is exact integer math, and
    a pandas replay from the raw token stream reproduces every row."""
    from collections import Counter

    from recommender_systems_pyspark_spark.functions.lines import (
        _VOCAB_SIZES,
        x_vocab_coverage,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    rows = {r.vocab_size: r for r in x_vocab_coverage(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(_VOCAB_SIZES)
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cnt = Counter()
    for d in docs:
        ts = [t for t in d.text.split(" ") if t != ""]
        for a, b in zip(ts, ts[1:]):
            cnt[f"{a} {b}"] += 1
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    prev_cov = -1
    for v in sorted(_VOCAB_SIZES):
        covered = sum(n for _, n in ordered[:v])
        r = rows[v]
        assert r.covered_tokens == covered
        assert r.total_tokens == total
        assert r.coverage_ppm == covered * 1_000_000 // total
        assert r.oov_types == max(0, len(ordered) - v)
        assert r.coverage_ppm >= prev_cov
        prev_cov = r.coverage_ppm


# ---------------------------------------------------------------------------
# x_media_ahash_pairs
# ---------------------------------------------------------------------------


def test_media_ahash_numpy_replay(spark, sf_dir):
    """Full-chain numpy replay from raw text: recompute every image's
    64-bit aHash, re-derive banded candidates and Hamming distances —
    the engine's pair ledger must match exactly (including the 4-band
    pigeonhole guarantee: any pair with hamming <= 3 must be present)."""
    import itertools

    import numpy as np

    from recommender_systems_pyspark_spark.multimodal.media import (
        _AHASH_BITS,
        _AHASH_WORDS,
        x_media_ahash_pairs,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id % 3 = 0 AND length(text) > 0")
        .select("doc_id", "text")
        .collect()
    )
    steps = np.arange(_AHASH_BITS, dtype=np.int64)
    bits_by_doc = {}
    for r in docs:
        raw = r.text.encode()
        if len(raw) != len(r.text):
            continue  # non-ASCII rows are gated out on both sides
        buf = np.frombuffer(raw, dtype=np.uint8)
        idx = steps * (len(buf) - 1) // (_AHASH_BITS - 1)
        s = buf[idx].astype(np.int64)
        bits_by_doc[r.doc_id] = (_AHASH_BITS * s >= s.sum()).astype(np.int64)

    def words(bits):
        return tuple(
            int((bits[w * 16 : (w + 1) * 16] << np.arange(16)).sum())
            for w in range(_AHASH_WORDS)
        )

    w_by_doc = {d: words(b) for d, b in bits_by_doc.items()}
    expect = {}
    for a, b in itertools.combinations(sorted(bits_by_doc), 2):
        shared = sum(x == y for x, y in zip(w_by_doc[a], w_by_doc[b]))
        if shared:
            expect[(a, b)] = (shared, int((bits_by_doc[a] != bits_by_doc[b]).sum()))
    got = {
        (r.doc_a, r.doc_b): (r.shared_bands, r.hamming)
        for r in x_media_ahash_pairs(spark, sf_dir).collect()
    }
    assert got == expect
    # pigeonhole: hamming <= 3 with 4 bands forces a shared band
    for a, b in itertools.combinations(sorted(bits_by_doc), 2):
        if int((bits_by_doc[a] != bits_by_doc[b]).sum()) <= 3:
            assert (a, b) in got


# ---------------------------------------------------------------------------
# s12_cdc_apply
# ---------------------------------------------------------------------------


def test_cdc_apply_batch_merge_is_order_free(spark, sf_dir):
    """Apply the same changefeed in version order and in REVERSED batch
    order through the batch-merge core — the final state must be
    identical (the commutative last-writer-wins + tombstone contract that
    makes the streaming query micro-batch-boundary-proof), and deleted
    keys must stay deleted when a lower-version upsert arrives later."""
    import os
    import shutil
    import tempfile

    from recommender_systems_pyspark_spark.streaming.cdc_apply import (
        apply_cdc_batch,
        changefeed,
    )

    feed = changefeed(spark, sf_dir)
    max_v = feed.agg(F.max("version")).collect()[0][0]
    span = (max_v + 4) // 4
    slices = [
        feed.where((F.col("version") >= i * span) & (F.col("version") < (i + 1) * span))
        for i in range(4)
    ]

    def run(order):
        d = tempfile.mkdtemp(prefix="cdc_order_")
        state = os.path.join(d, "state")
        try:
            for epoch, i in enumerate(order):
                apply_cdc_batch(slices[i], state, epoch)
            rows = spark.read.parquet(state).collect()
            return {r.user_id: (r.version, r.op, r.value, r.n_ops) for r in rows}
        finally:
            shutil.rmtree(d, ignore_errors=True)

    fwd = run([0, 1, 2, 3])
    rev = run([3, 2, 1, 0])
    assert fwd == rev
    # tombstones exist in stored state and win over earlier versions
    assert any(v[1] == "D" for v in fwd.values())
    for _uid, (version, op, _val, _n) in fwd.items():
        assert version is not None
        assert op in ("D", "U")


# ---------------------------------------------------------------------------
# x_tvd_drift
# ---------------------------------------------------------------------------


def test_tvd_drift_replay_and_bounds(spark, sf_dir):
    """Pandas replay of the histogram + ppm math; TVD (= Σ|diff|/2e6) is
    in [0,1]; shares each sum to ~1e6 (floor rounding loses < n_buckets)."""
    from recommender_systems_pyspark_spark.functions.events_analytics import (
        _DRIFT_BIN_W,
        _DRIFT_BINS,
        x_tvd_drift,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    rows = x_tvd_drift(spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    from collections import Counter

    ref, cur = Counter(), Counter()
    for r in ev:
        b = min(int(r.value // _DRIFT_BIN_W), _DRIFT_BINS - 1)
        (ref if r.event_type == "click" else cur)[b] += 1
    rt, ct = sum(ref.values()), sum(cur.values())
    for r in rows:
        assert r.ref_n == ref.get(r.bucket, 0)
        assert r.cur_n == cur.get(r.bucket, 0)
        assert r.ref_ppm == r.ref_n * 1_000_000 // rt
        assert r.cur_ppm == r.cur_n * 1_000_000 // ct
        assert r.abs_diff_ppm == abs(r.ref_ppm - r.cur_ppm)
    tvd = sum(r.abs_diff_ppm for r in rows) / 2_000_000
    assert 0.0 <= tvd <= 1.0
    assert sum(r.ref_ppm for r in rows) > 1_000_000 - _DRIFT_BINS
    assert sum(r.cur_ppm for r in rows) > 1_000_000 - _DRIFT_BINS


# ---------------------------------------------------------------------------
# x_audio_energy / x_video_shot_boundaries (registered r9, graded r10)
# ---------------------------------------------------------------------------


def test_audio_energy_numpy_replay(spark, sf_dir):
    import numpy as np

    from recommender_systems_pyspark_spark.multimodal.media import (
        _PCM_MID,
        x_audio_energy,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    got = {r.doc_id: r for r in x_audio_energy(spark, sf_dir).collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id % 3 = 1 AND length(text) > 0")
        .select("doc_id", "text")
        .collect()
    )
    n_checked = 0
    for d in docs:
        raw = d.text.encode()
        if len(raw) != len(d.text):
            continue
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        r = got[d.doc_id]
        assert r.n_samples == len(s)
        assert r.energy == int(((s - _PCM_MID) ** 2).sum())
        below = s < _PCM_MID
        assert r.zero_crossings == int(np.count_nonzero(below[:-1] != below[1:]))
        n_checked += 1
    assert n_checked == len(got) > 0


def test_video_shot_boundaries_numpy_replay(spark, sf_dir):
    import numpy as np

    from recommender_systems_pyspark_spark.multimodal.media import (
        FRAME_BYTES,
        _SHOT_TAU,
        x_video_shot_boundaries,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    got = {r.doc_id: r for r in x_video_shot_boundaries(spark, sf_dir).collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id % 3 = 2 AND length(text) > 0")
        .select("doc_id", "text")
        .collect()
    )
    n_checked = 0
    for d in docs:
        raw = d.text.encode()
        if len(raw) != len(d.text):
            continue
        b = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        frames = [b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                  for i in range((len(b) + FRAME_BYTES - 1) // FRAME_BYTES)]
        pairs = total = bounds = 0
        for a, c in zip(frames, frames[1:]):
            n = min(len(a), len(c))
            if n == 0:
                continue
            dsum = int(np.abs(a[:n] - c[:n]).sum())
            pairs += 1
            total += dsum
            if dsum > _SHOT_TAU * n:
                bounds += 1
        r = got[d.doc_id]
        assert (r.n_frames, r.n_pairs, r.total_abs_diff, r.n_boundaries) == (
            len(frames), pairs, total, bounds,
        )
        assert r.n_boundaries <= r.n_pairs <= max(0, r.n_frames - 1)
        n_checked += 1
    assert n_checked == len(got) > 0


# ---------------------------------------------------------------------------
# x_weighted_sample (registered r9, graded r10)
# ---------------------------------------------------------------------------


def test_weighted_sample_python_replay_and_weight_bias(spark, sf_dir):
    """Exact hashlib replay of the sequential-Poisson priorities and the
    per-stratum selection; the sample must also show the πps property on
    this fixture: mean sampled weight above the stratum mean weight."""
    import hashlib

    from recommender_systems_pyspark_spark.functions.strata import (
        _WSAMPLE_K,
        x_weighted_sample,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .where("n_chars > 0")
        .select("lang", "doc_id", "n_chars")
        .collect()
    )
    by_lang = {}
    for d in docs:
        u = int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:8], 16) / 4294967296.0
        by_lang.setdefault(d.lang, []).append((u / d.n_chars, d.doc_id, d.n_chars))
    expect = {}
    for lang, rows in by_lang.items():
        rows.sort()
        for rk, (_, doc_id, w) in enumerate(rows[:_WSAMPLE_K], start=1):
            expect[(lang, doc_id)] = (w, rk)
    got = {
        (r.lang, r.doc_id): (r.weight, r.rank)
        for r in x_weighted_sample(spark, sf_dir).collect()
    }
    assert got == expect
    # πps weight bias: sampled mean weight >= stratum mean weight overall
    sampled_mean = sum(w for w, _ in got.values()) / len(got)
    corpus_mean = sum(d.n_chars for d in docs) / len(docs)
    assert sampled_mean > corpus_mean


def test_cluster_safe_split_scale_path_identical(spark, sf_dir):
    """The 100 TB face: feeding cluster_safe_split_core the lossless
    PPJoin pair generator (sub-quadratic) must yield the IDENTICAL split
    ledger as the registered ground-truth-pair face — the certification
    that the scale path and the oracle-verified path are the same
    operator."""
    from recommender_systems_pyspark_spark.functions.dedup import jaccard_join_pairs
    from recommender_systems_pyspark_spark.functions.graph import (
        cluster_safe_split_core,
        x_cluster_safe_split,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    ppjoin_pairs = jaccard_join_pairs(docs.select("doc_id", "text")).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    via_ppjoin = {
        r.split: (r.n_docs, r.n_clusters, r.total_chars, r.leaked_pairs)
        for r in cluster_safe_split_core(docs, ppjoin_pairs).collect()
    }
    registered = {
        r.split: (r.n_docs, r.n_clusters, r.total_chars, r.leaked_pairs)
        for r in x_cluster_safe_split(spark, sf_dir).collect()
    }
    assert via_ppjoin == registered


# ---------------------------------------------------------------------------
# x_fd_profile (registered r9, graded r10)
# ---------------------------------------------------------------------------


def test_fd_profile_semantics(spark, sf_dir):
    """The nation key→name pair must be a perfect FD (strength exactly
    1e6); every strength is in (0, 1e6]; fd_holds ⇔ strength == 1e6;
    ndv_pair >= max(ndv_lhs within pair key space)."""
    from recommender_systems_pyspark_spark.operators.stats import x_fd_profile

    rows = {(r.tbl, r.lhs, r.rhs): r for r in x_fd_profile(spark, sf_dir).collect()}
    nation = rows[("nation", "n_nationkey", "n_name")]
    assert nation.fd_holds and nation.strength_ppm == 1_000_000
    for r in rows.values():
        assert 0 < r.strength_ppm <= 1_000_000
        assert r.fd_holds == (r.ndv_lhs == r.ndv_pair)
        assert r.ndv_pair >= r.ndv_lhs
        assert r.ndv_pair <= r.ndv_lhs * r.ndv_rhs


# ---------------------------------------------------------------------------
# s13_stream_scd2_enrich (registered r9, graded r10)
# ---------------------------------------------------------------------------


def test_stream_scd2_enrich_equals_batch_join(spark, sf_dir):
    """The streaming enrichment's accumulated rows must equal the batch
    bitemporal join row-for-row (micro-batch boundaries invisible), and
    every fact must carry exactly one dimension version."""
    from recommender_systems_pyspark_spark.functions.warehouse import (
        x_scd2_event_enrich,
    )
    from recommender_systems_pyspark_spark.streaming.scd2_enrich import (
        s13_stream_scd2_enrich,
    )

    streamed = {
        r.event_id: (r.user_id, r.ts, r.state_type, r.state_version)
        for r in s13_stream_scd2_enrich(spark, sf_dir).collect()
    }
    batch_rows = x_scd2_event_enrich(spark, sf_dir).collect()
    batch = {
        r.event_id: (r.user_id, r.ts, r.state_type, r.state_version)
        for r in batch_rows
    }
    assert streamed == batch
    assert len(batch_rows) == len(batch)  # exactly one version per fact


# ---------------------------------------------------------------------------
# x_entity_resolution_e2e (registered r9, graded r10)
# ---------------------------------------------------------------------------


def test_entity_resolution_union_find_replay(spark):
    """Union-find replay at sf0.001: rebuild blocking+match pairs in
    python (difflib-free exact Levenshtein), cluster, elect goldens —
    the engine's ledger must match exactly."""
    from recommender_systems_pyspark_spark.functions.graph import (
        x_entity_resolution_e2e,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    cust = load_table(spark, sf, "customer").collect()

    def lev(s, t):
        if abs(len(s) - len(t)) > 2:
            return 3
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    parent = {c.c_custkey: c.c_custkey for c in cust}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_nation = {}
    for c in cust:
        by_nation.setdefault(c.c_nationkey, []).append(c)
    for group in by_nation.values():
        for i, a in enumerate(group):
            for b in group[i + 1 :]:
                if abs(len(a.c_name) - len(b.c_name)) <= 1 and lev(a.c_name, b.c_name) <= 2:
                    ra, rb = find(a.c_custkey), find(b.c_custkey)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for c in cust:
        clusters.setdefault(find(c.c_custkey), []).append(c)
    expect = {}
    for members in clusters.values():
        if len(members) < 2:
            continue
        cid = min(m.c_custkey for m in members)
        g = sorted(members, key=lambda m: (-m.c_acctbal, m.c_custkey))[0]
        expect[cid] = (g.c_custkey, g.c_name, g.c_acctbal, len(members))
    got = {
        r.cluster_id: (r.golden_custkey, r.golden_name, r.golden_acctbal, r.cluster_size)
        for r in x_entity_resolution_e2e(spark, sf).collect()
    }
    assert got == expect and len(got) > 0


# ---------------------------------------------------------------------------
# x_feature_hashing (registered r9, graded r10)
# ---------------------------------------------------------------------------


def test_feature_hashing_hashlib_replay(spark, sf_dir):
    """Replay every document's signed hashed features with hashlib —
    buckets, signs, cancellation (zero features dropped) all exact."""
    import hashlib
    from collections import defaultdict

    from recommender_systems_pyspark_spark.functions.text import (
        _FH_DIM,
        x_feature_hashing,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = {}
    for d in docs:
        acc = defaultdict(lambda: [0, 0])
        for tok in d.text.split(" "):
            if tok == "":
                continue
            h = hashlib.md5(tok.encode()).hexdigest()
            bucket = int(h[:8], 16) % _FH_DIM
            sgn = 1 if int(h[8], 16) % 2 == 0 else -1
            acc[bucket][0] += sgn
            acc[bucket][1] += 1
        for bucket, (val, n) in acc.items():
            if val != 0:
                expect[(d.doc_id, bucket)] = (val, n)
    got = {
        (r.doc_id, r.bucket): (r.feature_val, r.n_tokens)
        for r in x_feature_hashing(spark, sf_dir).collect()
    }
    assert got == expect
