"""Round-8 operator tests: IVF recall calibration (x_ivf_recall),
label-propagation communities (x_label_propagation), and incremental
SemDeDup (x_semdedup_incremental). Oracle equality is covered by
tools/verify_local.py + the driver gate; these pin the algorithmic
properties the hash compare can't see — monotonicity, independent
python/numpy replays, and batch/corpus partition invariants."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

from recommender_systems_pyspark_spark.sources import load_table


# ---------------------------------------------------------------------------
# x_ivf_recall
# ---------------------------------------------------------------------------


def test_ivf_recall_curve_shape_and_monotonicity(spark, sf_dir):
    from recommender_systems_pyspark_spark.functions.similarity import (
        _RECALL_K,
        _RECALL_MAX_PROBE,
        _RECALL_Q,
        x_ivf_recall,
    )

    rows = {r.nprobe: r for r in x_ivf_recall(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, _RECALL_MAX_PROBE + 1))
    for r in rows.values():
        assert r.n_queries == _RECALL_Q
        assert 0 < r.retrieved <= r.n_queries * _RECALL_K
        assert 0 <= r.hits <= r.retrieved
        assert r.recall_ppm == r.hits * 1_000_000 // (r.n_queries * _RECALL_K)
    # widening the probe set can only add candidates: recall is monotone
    for p in range(2, _RECALL_MAX_PROBE + 1):
        assert rows[p].hits >= rows[p - 1].hits
        assert rows[p].retrieved >= rows[p - 1].retrieved
    # probing every cell whose centroid ranks top-3 of 10 must find a
    # nontrivial share of true neighbors (labels cluster the fixture)
    assert rows[_RECALL_MAX_PROBE].recall_ppm > 300_000


def test_ivf_recall_matches_numpy_replay(spark):
    """Full-chain numpy replay at sf0.001: exact top-k, floor-quantized
    per-label centroids, per-query cell ranking, per-probe candidate
    top-k, hit counts — every row of the curve reproduced independently."""
    from recommender_systems_pyspark_spark.functions.similarity import (
        _RECALL_K,
        _RECALL_MAX_PROBE,
        _RECALL_Q,
        x_ivf_recall,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.nprobe: r for r in x_ivf_recall(spark, sf).collect()}

    raw = sorted(
        load_table(spark, sf, "embeddings").collect(), key=lambda r: r.vec_id
    )
    ids = np.array([r.vec_id for r in raw])
    labels = np.array([r.label for r in raw])
    V = np.array([r.embedding for r in raw], dtype=np.float64)

    def cos(a, b):
        return (a @ b) / math.sqrt(a @ a) / math.sqrt(b @ b)

    # per-label floor-quantized centroids (the engine's exact average)
    cents = {}
    for lab in np.unique(labels):
        m = labels == lab
        cents[lab] = np.floor(V[m] * 1e9).astype(np.int64).sum(axis=0) / m.sum() / 1e9

    hits = Counter()
    retrieved = Counter()
    qids = [i for i, v in enumerate(ids) if v < _RECALL_Q]
    for qi in qids:
        sims = np.array([cos(V[qi], V[j]) if j != qi else -2.0 for j in range(len(ids))])
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))
        exact = {ids[j] for j in order[:_RECALL_K] if j != qi}
        cell_order = sorted(cents, key=lambda lab: (-cos(cents[lab], V[qi]), lab))
        for p in range(1, _RECALL_MAX_PROBE + 1):
            probed = set(cell_order[:p])
            cand = [j for j in order if j != qi and labels[j] in probed]
            top = {ids[j] for j in cand[:_RECALL_K]}
            retrieved[p] += len(top)
            hits[p] += len(top & exact)

    for p in range(1, _RECALL_MAX_PROBE + 1):
        assert got[p].retrieved == retrieved[p], f"nprobe={p}"
        assert got[p].hits == hits[p], f"nprobe={p}"
        assert got[p].recall_ppm == hits[p] * 1_000_000 // (len(qids) * _RECALL_K)


# ---------------------------------------------------------------------------
# x_label_propagation
# ---------------------------------------------------------------------------


def test_label_propagation_matches_python_replay(spark):
    """Synchronous LPA replayed driver-side at sf0.001: identical
    community sizes, degree mass, and first members."""
    from recommender_systems_pyspark_spark.functions.pagerank import (
        _LP_ITERS,
        copurchase_edges,
        x_label_propagation,
    )

    sf = "/root/testdata/sf0.001"
    edges = copurchase_edges(spark, sf).collect()
    adj = defaultdict(list)  # dst -> [src] (incoming = neighbors; symmetric)
    outdeg = Counter()
    for e in edges:
        adj[e.dst].append(e.src)
        outdeg[e.src] += 1
    nodes = sorted(outdeg)

    label = {n: n for n in nodes}
    for _ in range(_LP_ITERS):
        nxt = {}
        for n in nodes:
            freq = Counter(label[s] for s in adj[n])
            # mode, ties -> smallest label (the engine's total order)
            nxt[n] = min(freq, key=lambda lab: (-freq[lab], lab))
        label = nxt

    want = defaultdict(lambda: [0, 0, None])  # community -> [members, degree, first]
    for n in nodes:
        w = want[label[n]]
        w[0] += 1
        w[1] += outdeg[n]
        w[2] = n if w[2] is None else min(w[2], n)

    rows = x_label_propagation(spark, sf).collect()
    got = {r.community: (r.n_members, r.total_degree, r.first_member) for r in rows}
    assert got == {c: tuple(w) for c, w in want.items()}
    # result ordering: size desc, community asc
    keys = [(-r.n_members, r.community) for r in rows]
    assert keys == sorted(keys)
    # every node belongs to exactly one community
    assert sum(r.n_members for r in rows) == len(nodes)


# ---------------------------------------------------------------------------
# x_semdedup_incremental
# ---------------------------------------------------------------------------


def test_semdedup_incremental_batch_partition_invariants(spark, sf_dir):
    from recommender_systems_pyspark_spark.functions.similarity import (
        _INC_MOD,
        x_semdedup_incremental,
    )

    rows = x_semdedup_incremental(spark, sf_dir).collect()
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    # the output is exactly the arriving batch, one verdict per vector
    assert len(rows) == (n_vec + _INC_MOD - 1) // _INC_MOD
    assert all(r.vec_id % _INC_MOD == 0 for r in rows)
    for r in rows:
        assert r.pruned == (r.n_close > 0)
        assert (r.max_sim is None) == (r.n_close == 0)


# ---------------------------------------------------------------------------
# s10_late_data_audit
# ---------------------------------------------------------------------------


def test_late_data_audit_certifies_real_drops(spark, sf_dir):
    """The emitted ledger must show REAL late-data drops — strictly fewer
    events in the finalized windows than a batch run of the same
    aggregation sees there — and no window inside the watermark horizon."""
    from recommender_systems_pyspark_spark.streaming.late_audit import (
        s10_late_data_audit,
    )

    rows = s10_late_data_audit(spark, sf_dir).collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count("*").alias("n_all"))
    )
    full = {r.window_start: r.n_all for r in ev.collect()}
    emitted = {r.window_start: r.n_events for r in rows}
    # every emitted window exists in the batch view, never with more rows
    assert all(emitted[w] <= full[w] for w in emitted)
    # drops are real: strictly fewer events survived in total
    assert sum(emitted.values()) < sum(full[w] for w in emitted)
    # append mode: nothing inside the watermark horizon is finalized
    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    assert all(w < max_ts for w in emitted)


# ---------------------------------------------------------------------------
# x_ingest_gate_e2e
# ---------------------------------------------------------------------------


def test_ingest_gate_composes_tier_verdicts(spark, sf_dir):
    """The gate's text columns must equal x_dedup_incremental's verdicts
    row for row, its semantic columns must equal the standalone
    incremental-semdedup verdicts on the same split, and ``admitted``
    must be exactly the conjunction of the tiers."""
    from recommender_systems_pyspark_spark.functions.dedup import (
        x_dedup_incremental,
    )
    from recommender_systems_pyspark_spark.functions.ingest import (
        x_ingest_gate_e2e,
    )
    from recommender_systems_pyspark_spark.functions.similarity import (
        semdedup_inc_verdicts,
    )

    rows = x_ingest_gate_e2e(spark, sf_dir).collect()
    assert rows and all(r.doc_id % 10 >= 8 for r in rows)
    for r in rows:
        assert r.admitted == (
            not r.exact_dup and not r.near_dup and r.quality_ok and not r.sem_dup
        )
        if not r.has_embedding:
            assert not r.sem_dup and r.n_close == 0

    text = {r.doc_id: r for r in x_dedup_incremental(spark, sf_dir).collect()}
    assert set(text) == {r.doc_id for r in rows}
    for r in rows:
        assert (r.exact_dup, r.near_dup) == (
            text[r.doc_id].exact_dup,
            text[r.doc_id].near_dup,
        )

    sem = {
        r.vec_id: r
        for r in semdedup_inc_verdicts(
            spark, sf_dir, "est_mod10ge8", F.col("vec_id") % 10 >= 8
        ).collect()
    }
    for r in rows:
        if r.has_embedding:
            assert (r.sem_dup, r.n_close) == (sem[r.doc_id].pruned, sem[r.doc_id].n_close)
        else:
            assert r.doc_id not in sem


# ---------------------------------------------------------------------------
# x_kcore_layers
# ---------------------------------------------------------------------------


def test_kcore_layers_matches_python_replay(spark):
    """Synchronous k-core peeling replayed driver-side at sf0.001:
    identical per-node peel rounds and in-core set."""
    from recommender_systems_pyspark_spark.functions.pagerank import (
        _KCORE_K,
        _KCORE_MIN_CO,
        _KCORE_ROUNDS,
        x_kcore_layers,
    )

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    co = Counter()
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    co[(a, b)] += 1
    edges = {p for p, c in co.items() if c >= _KCORE_MIN_CO}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    degree0 = {n: len(vs) for n, vs in adj.items()}

    alive = set(adj)
    peeled = {}
    for rnd in range(1, _KCORE_ROUNDS + 1):
        nxt = {n for n in alive if len(adj[n] & alive) >= _KCORE_K}
        for n in alive - nxt:
            peeled[n] = rnd
        alive = nxt

    rows = x_kcore_layers(spark, sf).collect()
    assert {r.part_key for r in rows} == set(adj)
    for r in rows:
        assert r.degree0 == degree0[r.part_key]
        assert r.peeled_round == peeled.get(r.part_key, 0)
        assert r.in_core == (r.part_key in alive)


# ---------------------------------------------------------------------------
# s11_restart_recovery
# ---------------------------------------------------------------------------


def test_restart_recovery_phases_split_the_work(spark, sf_dir):
    """Between the two query lifetimes the state must hold ONLY the
    first-phase buckets; after resume it must hold everything exactly
    once (equal to the batch aggregate) — proving the checkpoint carried
    the offsets rather than lifetime 2 re-reading from scratch."""
    import os
    import tempfile

    from recommender_systems_pyspark_spark.streaming.foreach_upsert import (
        _run_upsert_stream,
        _stage_user_files,
    )

    d = tempfile.mkdtemp(prefix="t_s11_")
    src, state, ck = f"{d}/src", f"{d}/state", f"{d}/ck"
    try:
        _stage_user_files(spark, sf_dir, src, (0, 1))
        _run_upsert_stream(spark, src, state, ck)
        mid = {r.user_id: r.n_events for r in spark.read.parquet(state).collect()}
        assert mid and all(u % 4 in (0, 1) for u in mid)

        _stage_user_files(spark, sf_dir, src, (2, 3))
        _run_upsert_stream(spark, src, state, ck)
        final = {r.user_id: r.n_events for r in spark.read.parquet(state).collect()}

        batch = {
            r.user_id: r.n
            for r in load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert final == batch  # nothing lost, nothing double-ingested
        # phase-1 rows were not re-ingested by lifetime 2
        assert all(final[u] == mid[u] for u in mid)
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# x_length_bucketing
# ---------------------------------------------------------------------------


def test_length_bucketing_partitions_and_waste(spark, sf_dir):
    """Buckets must partition the corpus into near-equal populations with
    non-overlapping, ascending token ranges; waste accounting must be
    internally consistent and beat the one-bucket degenerate case."""
    from recommender_systems_pyspark_spark.functions.strata import (
        _LB_BUCKETS,
        x_length_bucketing,
    )

    rows = sorted(
        x_length_bucketing(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    assert [r.bucket for r in rows] == list(range(1, _LB_BUCKETS + 1))
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    for prev, cur in zip(rows, rows[1:]):
        assert prev.max_tok <= cur.min_tok  # ascending, non-overlapping ranges
    for r in rows:
        assert r.min_tok <= r.max_tok
        assert r.padded_tok == r.n_docs * r.max_tok
        assert r.sum_tok <= r.padded_tok
        assert r.waste_ppm == (r.padded_tok - r.sum_tok) * 1_000_000 // r.padded_tok
    # bucketed padding strictly beats padding everything to the global max
    global_padded = n_docs * rows[-1].max_tok
    assert sum(r.padded_tok for r in rows) < global_padded


# ---------------------------------------------------------------------------
# x_target_encoding
# ---------------------------------------------------------------------------


def test_target_encoding_is_leakage_free(spark, sf_dir):
    """Every (category, fold) encoding must equal the mean target over
    that category's rows in the OTHER folds (pandas replay) — never
    include the fold's own rows."""
    from recommender_systems_pyspark_spark.functions.strata import (
        _TE_FOLDS,
        x_target_encoding,
    )

    rows = x_target_encoding(spark, sf_dir).collect()
    assert rows and all(0 <= r.fold < _TE_FOLDS for r in rows)

    t_orders = load_table(spark, sf_dir, "orders")
    t_cust = load_table(spark, sf_dir, "customer")
    base = (
        t_orders.join(t_cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_nationkey").alias("category"),
            F.col("o_totalprice").alias("target"),
            (
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % _TE_FOLDS
            ).alias("fold"),
        )
        .toPandas()
    )
    n_pairs = base.groupby(["category", "fold"]).size()
    assert len(rows) == len(n_pairs)
    for r in rows:
        cat = base[base.category == r.category]
        oof = cat[cat.fold != r.fold]
        if len(oof):
            want = oof.target.sum() / len(oof)
        else:  # category entirely inside one fold -> global out-of-fold
            rest = base[(base.category != r.category) | (base.fold != r.fold)]
            want = rest.target.sum() / len(rest)
        assert r.n_rows == len(cat) - len(oof)
        assert abs(r.enc - want) < 1e-6 * max(1.0, abs(want))
