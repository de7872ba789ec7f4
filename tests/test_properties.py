"""Hypothesis property tests (SURVEY.md §5: property-based coverage for the
operators whose semantics a fixture oracle can't fully pin):

- asof_join (both directions) vs a brute-force Python reference on
  randomized keyed event sets — ties, missing matches, duplicate
  timestamps, single-sided keys all emerge from generation.
- exact_sum bit-stability under arbitrary repartitioning — the property the
  whole oracle-hashing contract rests on.
- The winnowing guarantee on random strings (pure Python replica of
  x_fingerprint_winnow's algorithm — any shared passage of length
  >= k + w - 1 shares a fingerprint).

Spark-backed properties keep max_examples small (each example is a Spark
job); the pure-Python property runs plenty.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# a keyed event: (key, ts) with small domains so collisions/ties are common
_EVENT = st.tuples(st.integers(0, 3), st.integers(0, 20))
_SPARK_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_asof(left, right, direction):
    out = {}
    for k, lts in left:
        if direction == "backward":
            cands = [rts for rk, rts in right if rk == k and rts <= lts]
            out.setdefault((k, lts), max(cands) if cands else None)
        else:
            cands = [rts for rk, rts in right if rk == k and rts >= lts]
            out.setdefault((k, lts), min(cands) if cands else None)
    return out


@given(
    left=st.lists(_EVENT, min_size=1, max_size=12, unique=True),
    right=st.lists(_EVENT, min_size=0, max_size=12),
    direction=st.sampled_from(["backward", "forward"]),
)
@_SPARK_SETTINGS
def test_asof_join_matches_bruteforce(spark, left, right, direction):
    from recommender_systems_pyspark_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(left, "k long, ts long")
    rdf = spark.createDataFrame(right, "k long, rts long") if right else (
        spark.createDataFrame([], "k long, rts long")
    )
    got = {
        (r.k, r.ts): r.asof_val
        for r in asof_join(
            ldf,
            rdf.withColumnRenamed("rts", "val"),
            on="k",
            left_ts="ts",
            right_ts="val",
            value_col="val",
            direction=direction,
        )
        .withColumnRenamed("asof_val", "asof_val")
        .collect()
    }
    assert got == _py_asof(left, right, direction)


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    ),
    parts=st.integers(1, 7),
)
@_SPARK_SETTINGS
def test_exact_sum_is_bit_stable_under_repartitioning(spark, values, parts):
    from recommender_systems_pyspark_spark.registry import exact_sum

    df = spark.createDataFrame([(v,) for v in values], "v double")
    base = df.coalesce(1).agg(exact_sum(F.col("v"), "s")).collect()[0].s
    redis = df.repartition(parts).agg(exact_sum(F.col("v"), "s")).collect()[0].s
    # bit-identical, not approximately equal — that's the whole point
    assert base == redis


@given(
    prefix=st.text(alphabet="abcdefgh ", max_size=40),
    passage=st.text(alphabet="abcdefgh ", min_size=23 + 8, max_size=80),
    suffix=st.text(alphabet="abcdefgh ", max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_winnow_guarantee_on_random_strings(prefix, passage, suffix):
    """Any two docs sharing a passage of length >= k + w - 1 (= 23) share a
    winnowing fingerprint (Schleimer et al. theorem 1); passage is drawn
    longer so it survives edge effects at the splice points."""
    from tests.test_pipeline_ops import _py_winnow

    a = _py_winnow(prefix + passage)
    b = _py_winnow(passage + suffix)
    assert set(a) & set(b)


# ---------------------------------------------------------------------------
# Distributed two-phase rank ≡ single-partition window rank (hypothesis)
# ---------------------------------------------------------------------------

@given(
    vals=st.lists(st.integers(0, 5), min_size=1, max_size=60),
    n_parts=st.integers(1, 7),
    n_tiles=st.integers(1, 6),
)
@_SPARK_SETTINGS
def test_global_rank_and_ntile_property(spark, vals, n_parts, n_tiles):
    """with_global_row_number / with_global_ntile must equal the
    single-partition window forms on arbitrary duplicate-heavy data and
    arbitrary partition counts — the equivalence that justifies banning
    unpartitioned windows engine-wide (plans.guardrails)."""
    from pyspark.sql import Window

    from recommender_systems_pyspark_spark.operators.ranking import (
        with_global_ntile,
        with_global_row_number,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(n_parts)
    order = [F.col("v").desc(), F.col("id")]
    got_rn, total = with_global_row_number(df, order, alias="rn", n_parts=n_parts)
    assert total == len(vals)
    want_rn = df.select("id", F.row_number().over(Window.orderBy(*order)).alias("rn"))
    assert {(r.id, r.rn) for r in got_rn.select("id", "rn").collect()} == {
        (r.id, r.rn) for r in want_rn.collect()
    }
    got_t = with_global_ntile(df, n_tiles, order, "t", n_parts=n_parts)
    want_t = df.select("id", F.ntile(n_tiles).over(Window.orderBy(*order)).alias("t"))
    assert {(r.id, r.t) for r in got_t.select("id", "t").collect()} == {
        (r.id, r.t) for r in want_t.collect()
    }


# ---------------------------------------------------------------------------
# Round-5 primitives: histogram-quantile bracketing and checksum
# sensitivity, as pure-Python properties of the algorithms the queries
# implement (the Spark forms are oracle-gated; these pin the math on
# adversarial inputs fixtures won't produce).
# ---------------------------------------------------------------------------


def _hist_quantile(values, qp, width):
    """Python replica of x_histogram_quantile's crossing-bin rule."""
    bins = {}
    for v in values:
        b = int(v // width)
        bins[b] = bins.get(b, 0) + 1
    n = len(values)
    a = 0
    for b in sorted(bins):
        c = bins[b]
        prev = a
        a += c
        if 100 * prev < qp * n <= 100 * a:
            return b * width + width * ((qp * n - 100 * prev) / (100 * c))
    raise AssertionError("no crossing bin")


@given(
    values=st.lists(
        st.integers(0, 10_000).map(lambda v: v / 10.0), min_size=1, max_size=300
    ),
    qp=st.sampled_from([1, 25, 50, 75, 90, 99, 100]),
)
@settings(max_examples=200, deadline=None)
def test_histogram_quantile_brackets_order_statistic(values, qp):
    """The interpolated estimate always lands inside [bin_lo, bin_hi] of
    the bin containing the ceil(q·n/100)-th order statistic — i.e. the
    histogram scheme's error is bounded by one bin width for EVERY input,
    including empty bins, ties, and q=100."""
    import math as m

    width = 100.0
    est = _hist_quantile(values, qp, width)
    exact = sorted(values)[m.ceil(qp * len(values) / 100) - 1]
    assert exact // width * width <= est <= exact // width * width + width


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 9999), st.text(max_size=6)),
        min_size=1,
        max_size=50,
        unique_by=lambda r: r[0],
    ),
    flip=st.integers(0, 49),
)
@settings(max_examples=200, deadline=None)
def test_xor_checksum_detects_any_single_row_change(rows, flip):
    """Flipping one row's payload changes the XOR-fold fingerprint, and
    permuting rows never does — the two properties x_table_checksum's
    replication check rests on."""
    import hashlib
    import random

    def fold(rs):
        acc = 0
        for k, payload in rs:
            acc ^= int(
                hashlib.md5(f"{k}|{payload}".encode()).hexdigest()[:15], 16
            )
        return acc

    base = fold(rows)
    shuffled = rows[:]
    random.Random(42).shuffle(shuffled)
    assert fold(shuffled) == base, "order independence"
    i = flip % len(rows)
    changed = rows[:]
    changed[i] = (changed[i][0], changed[i][1] + "~")
    assert fold(changed) != base, "single-row sensitivity"


# ---------------------------------------------------------------------------
# Synchronous LPA / k-core on random graphs (round 8)
# ---------------------------------------------------------------------------

#: directed arc on a tiny node domain; symmetrized before use so ties,
#: self-contained cliques, isolated pairs, and oscillators are common
_ARC = st.tuples(st.integers(0, 7), st.integers(0, 7))


def _sym_edges(arcs):
    es = {(a, b) for a, b in arcs if a != b}
    return sorted(es | {(b, a) for a, b in es})


@given(arcs=st.lists(_ARC, min_size=1, max_size=20), iters=st.integers(1, 3))
@_SPARK_SETTINGS
def test_lpa_labels_match_python_replay(spark, arcs, iters):
    from collections import Counter, defaultdict

    from recommender_systems_pyspark_spark.functions.pagerank import lpa_labels

    edges = _sym_edges(arcs)
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in lpa_labels(df, iters).collect()}

    adj = defaultdict(list)
    for a, b in edges:
        adj[b].append(a)  # incoming = neighbors (symmetric)
    label = {n: n for n in adj}
    for _ in range(iters):
        label = {
            n: min(
                Counter(label[s] for s in adj[n]).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for n in adj
        }
    assert got == label


@given(
    arcs=st.lists(_ARC, min_size=1, max_size=20),
    k=st.integers(1, 4),
    rounds=st.integers(1, 3),
)
@_SPARK_SETTINGS
def test_kcore_verdicts_match_python_replay(spark, arcs, k, rounds):
    from collections import defaultdict

    from recommender_systems_pyspark_spark.functions.pagerank import kcore_verdicts

    edges = _sym_edges(arcs)
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.degree0, r.peeled_round, r.in_core)
        for r in kcore_verdicts(df, k, rounds).collect()
    }

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    alive = set(adj)
    peeled = {}
    for rnd in range(1, rounds + 1):
        nxt = {n for n in alive if len(adj[n] & alive) >= k}
        for n in alive - nxt:
            peeled[n] = rnd
        alive = nxt
    want = {
        n: (len(adj[n]), peeled.get(n, 0), n in alive) for n in adj
    }
    assert got == want


# ---------------------------------------------------------------------------
# CDC tombstone merge law (s12_cdc_apply) under arbitrary batch partitions
# ---------------------------------------------------------------------------


def _cdc_merge(state: dict, batch) -> dict:
    """Pure-python mirror of streaming.cdc_apply.apply_cdc_batch's merge
    law: per key, max-version op wins (DELETE winners persist as
    tombstones), op counts are additive."""
    inc: dict = {}
    for key, version, value, op in batch:
        v, o, val, n = inc.get(key, (-1, None, None, 0))
        if version > v:
            v, o, val = version, op, value
        inc[key] = (v, o, val, n + 1)
    out = dict(state)
    for key, (v, o, val, n) in inc.items():
        pv, po, pval, pn = out.get(key, (-1, None, None, 0))
        if v > pv:
            out[key] = (v, o, val, pn + n)
        else:
            out[key] = (pv, po, pval, pn + n)
    return out


_OP = st.tuples(
    st.integers(0, 5),                      # key
    st.integers(0, 10_000),                 # version (deduped below)
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.sampled_from(["U", "D"]),
)


@given(
    ops=st.lists(_OP, min_size=1, max_size=40, unique_by=lambda t: t[1]),
    cuts=st.lists(st.integers(0, 39), max_size=4),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_cdc_merge_law_is_partition_invariant(ops, cuts, data):
    """For ANY changefeed (unique versions) split into ANY batch
    partition in ANY order, folding the merge law must equal the
    one-shot arg_max — and a delete with the max version must keep the
    key dead even when lower-version upserts arrive in later batches."""
    bounds = sorted({c for c in cuts if c < len(ops)} | {len(ops)})
    batches, prev = [], 0
    for b in bounds:
        if b > prev:
            batches.append(ops[prev:b])
            prev = b
    if prev < len(ops):
        batches.append(ops[prev:])
    order = data.draw(st.permutations(range(len(batches))))
    state: dict = {}
    for i in order:
        state = _cdc_merge(state, batches[i])
    # one-shot oracle: arg_max(version) per key + total count
    expect: dict = {}
    for key, version, value, op in ops:
        v, o, val, n = expect.get(key, (-1, None, None, 0))
        if version > v:
            v, o, val = version, op, value
        expect[key] = (v, o, val, n + 1)
    assert state == expect
    # serving view drops tombstones; a dead key stays dead
    for key, (v, o, _val, _n) in expect.items():
        if o == "D":
            assert state[key][1] == "D"


# ---------------------------------------------------------------------------
# Raking (IPF) fixed-point recurrence vs a pure-python replay (round 13)
# ---------------------------------------------------------------------------

_CELL = st.tuples(
    st.integers(0, 2),  # source index (small domain -> shared marginals)
    st.integers(0, 2),  # lang index
    st.integers(1, 50),  # cell count
)


@given(
    cells=st.lists(_CELL, min_size=1, max_size=9, unique_by=lambda c: (c[0], c[1])),
    rts=st.lists(st.integers(0, 40), min_size=3, max_size=3),
    cts=st.lists(st.integers(0, 40), min_size=3, max_size=3),
    rounds=st.integers(1, 3),
)
@_SPARK_SETTINGS
def test_raking_matches_python_fixed_point_replay(spark, cells, rts, cts, rounds):
    """The IPF weight recurrence is exact bigint fixed-point arithmetic —
    a pure-python replay with the same DIV/NULLIF law must agree BIT FOR
    BIT, including zero-target rows, zero-mass guards, and missing
    cells (hypothesis finds the branchy cases the fixture never hits)."""
    from recommender_systems_pyspark_spark.functions.strata import (
        _RAKE_SC,
        rake_cell_weights,
    )

    cdf = spark.createDataFrame(
        [(f"s{s}", f"l{l}", n) for s, l, n in cells], "source string, lang string, n long"
    )
    rdf = spark.createDataFrame(
        [(f"s{i}", t) for i, t in enumerate(rts)], "source string, rt long"
    )
    ldf = spark.createDataFrame(
        [(f"l{i}", t) for i, t in enumerate(cts)], "lang string, ct long"
    )
    got = {
        (r.source, r.lang): (r.weight_ppm, r.weighted_count)
        for r in rake_cell_weights(cdf, rdf, ldf, rounds).collect()
    }

    # pure-python replay of the identical fixed-point recurrence
    w = {
        (f"s{s}", f"l{l}"): [n, rts[s], cts[l], _RAKE_SC] for s, l, n in cells
    }

    def do_pass(key_idx, target_idx):
        mass = {}
        for k, (n, rt, ct, wv) in w.items():
            mass[k[key_idx]] = mass.get(k[key_idx], 0) + n * wv
        for k, rec in w.items():
            ms = mass[k[key_idx]]
            t = rec[1 + target_idx]
            if ms == 0:
                rec[3] = 0
            else:
                # python // floors; operands are nonnegative here, matching
                # Spark DIV (truncate-toward-zero) exactly
                rec[3] = (rec[3] * ((t * _RAKE_SC * _RAKE_SC) // ms)) // _RAKE_SC
        return

    for _ in range(rounds):
        do_pass(0, 0)  # row pass on source targets
        do_pass(1, 1)  # column pass on lang targets
    want = {
        k: (rec[3], (rec[0] * rec[3]) // _RAKE_SC) for k, rec in w.items()
    }
    assert got == want


# ---------------------------------------------------------------------------
# CDC net-effect law: applying net ops == applying the full feed (round 13)
# ---------------------------------------------------------------------------

_OP = st.tuples(
    st.integers(0, 4),  # key (small domain -> multi-op keys are common)
    st.integers(0, 1),  # 0 = upsert, 1 = delete
    st.integers(0, 99),  # value
)


@given(ops=st.lists(_OP, min_size=1, max_size=16), base_mod=st.integers(2, 3))
@_SPARK_SETTINGS
def test_cdc_net_effect_equals_full_feed_apply(spark, ops, base_mod):
    """For ANY feed, classifying per-key last-writer ops against base
    membership and applying only the net ops must produce the same final
    table as replaying the entire feed — the compaction-correctness law
    x_cdc_net_effect's summary face rests on."""
    feed = [
        (k, i, float(v), "D" if d else "U") for i, (k, d, v) in enumerate(ops)
    ]
    df = spark.createDataFrame(feed, "user_id long, version long, value double, op string")
    collapsed = df.groupBy("user_id").agg(
        F.max_by("op", "version").alias("last_op"),
        F.max_by("value", "version").alias("last_value"),
    )
    in_base = F.col("user_id") % base_mod == 0
    net = collapsed.withColumn(
        "net_op",
        F.when((F.col("last_op") == "U") & in_base, "UPDATE")
        .when(F.col("last_op") == "U", "INSERT")
        .when(in_base, "DELETE")
        .otherwise("NOOP"),
    ).collect()

    # python full-feed replay: last op per key wins, D kills the key
    last = {}
    for k, ver, v, op in feed:
        if k not in last or ver > last[k][0]:
            last[k] = (ver, v, op)
    base_keys = {k for k, *_ in feed if k % base_mod == 0}
    final_full = {
        k: v for k, (_, v, op) in last.items() if op == "U"
    }
    # net-op application to the base snapshot
    final_net = {}
    for r in net:
        if r.net_op in ("INSERT", "UPDATE"):
            final_net[r.user_id] = r.last_value
        elif r.net_op == "DELETE":
            assert r.user_id in base_keys
        else:  # NOOP must involve a key outside the base that ends deleted
            assert r.user_id not in base_keys
    assert final_net == final_full


# ---------------------------------------------------------------------------
# Dynamic-gap session windows vs a python cumulative-max replay (round 13)
# ---------------------------------------------------------------------------

_DYN_EVENT = st.tuples(
    st.integers(0, 2),               # user (small domain)
    st.integers(0, 120),             # minute offset (collisions common)
    st.sampled_from(["purchase", "click", "error", "view"]),
)


@given(events=st.lists(_DYN_EVENT, min_size=1, max_size=14))
@_SPARK_SETTINGS
def test_dynamic_session_gap_matches_cummax_replay(spark, events):
    """Spark's dynamic-gap session_window must equal the generalized
    gaps-and-islands replay: running session end = cumulative MAX of
    (ts + gap(event)), non-strict merge at the boundary. Random minute
    offsets generate ties, exact-boundary events, and long-gap events
    spanning short-gap successors."""
    from datetime import datetime, timedelta

    from recommender_systems_pyspark_spark.streaming.windows import (
        _DYN_DEFAULT_MIN,
        _DYN_GAPS,
        dynamic_session_gap,
    )

    gaps = dict(_DYN_GAPS)
    base = datetime(2024, 1, 1)
    rows = [
        (u, base + timedelta(minutes=m), t) for u, m, t in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    )
    got = {
        (r.user_id, str(r.s), str(r.e)): r.n
        for r in df.groupBy(
            F.session_window("ts", dynamic_session_gap()).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            "n",
        )
        .collect()
    }

    want = {}
    by_user = {}
    for u, ts, t in rows:
        by_user.setdefault(u, []).append(
            (ts, ts + timedelta(minutes=gaps.get(t, _DYN_DEFAULT_MIN)))
        )
    for u, evs in by_user.items():
        evs.sort(key=lambda p: p[0])
        sessions = []
        for ts, end in evs:
            if sessions and ts <= sessions[-1][1]:
                s0, e0, n0 = sessions[-1]
                sessions[-1] = (s0, max(e0, end), n0 + 1)
            else:
                sessions.append((ts, end, 1))
        for s0, e0, n0 in sessions:
            want[(u, str(s0), str(e0))] = n0
    assert got == want
