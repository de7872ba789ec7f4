"""Correctness tests for the relational surface: every registered query runs
against its DuckDB oracle at sf0.001 (the driver repeats this at sf0.01), plus
plan-shape assertions that the 100 TB design properties actually hold
(broadcast joins, pushed filters, TakeOrderedAndProject top-k)."""

from __future__ import annotations

import contextlib
import io

import pytest

from recommender_systems_pyspark_spark.registry import all_queries
from tests.conftest import SF_SMOKE
from tools.verify_local import compare, duck_con

SPECS = all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, con, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMOKE).toPandas()
    odf = con.execute(spec.oracle).fetchdf()
    errs = compare(name, sdf, odf)
    assert not errs, f"{name}: {errs}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["o_orderkey", "c_name", "n_name", "o_totalprice", "o_orderdate"]


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 24


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_plan_broadcasts_and_takeordered(spark):
    plan = _plan(SPECS["flagship_top_orders"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan  # nation (and small sides) broadcast
    assert "TakeOrderedAndProject" in plan  # top-k without global sort


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(SPECS["p3_eq_filter"].fn(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    plan = _plan(SPECS["p1_project_rename"].fn(spark, SF_SMOKE))
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "p_retailprice" in read_schema
    assert "p_size" not in read_schema  # unused column never read


def test_exact_sum_is_partition_invariant(spark, sf_dir):
    from pyspark.sql import functions as F

    from recommender_systems_pyspark_spark.registry import exact_sum
    from recommender_systems_pyspark_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    a = li.repartition(1).agg(exact_sum(expr, "s")).collect()[0]["s"]
    b = li.repartition(17).agg(exact_sum(expr, "s")).collect()[0]["s"]
    assert a == b  # bit-identical regardless of partial-agg order


def test_percentile_approx_tight_rank_bound(spark, sf_dir):
    """The sketch's contract at accuracy=1000 is ≤ 0.1% rank error; assert
    the approximate median lands within ±1% rank of exact (10× margin) —
    the tight twin of a9's generous oracle gate."""
    from pyspark.sql import functions as FF

    from recommender_systems_pyspark_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        FF.percentile_approx("l_quantity", 0.5, 1000).alias("ap"),
        FF.percentile("l_quantity", 0.49).alias("lo"),
        FF.percentile("l_quantity", 0.51).alias("hi"),
    ).collect()[0]
    assert row.lo <= row.ap <= row.hi, row
