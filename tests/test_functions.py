"""Shape tests for queries without a SQL oracle, plus semantics checks on
the scalar-function surface."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from recommender_systems_pyspark_spark.registry import all_queries

SPECS = all_queries()


def test_f7_f8_uuid_and_timestamp_shape(spark, sf_dir):
    rows = SPECS["f7_f8_row_metadata"].fn(spark, sf_dir).limit(20).collect()
    assert rows
    uuid_re = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
    seen = set()
    for r in rows:
        assert uuid_re.match(r.row_uuid), r.row_uuid
        assert r.stamped_at is not None
        seen.add(r.row_uuid)
    assert len(seen) == len(rows)  # uuids unique per row


def test_deterministic_sample_is_stable(spark, sf_dir):
    fn = SPECS["f10_deterministic_sample"].fn
    a = {r.o_orderkey for r in fn(spark, sf_dir).collect()}
    b = {r.o_orderkey for r in fn(spark, sf_dir).collect()}
    assert a == b and 0 < len(a)


def test_events_ts_normalized_to_timestamp(spark, sf_dir):
    from recommender_systems_pyspark_spark.sources import load_table

    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() in ("timestamp_ntz", "timestamp")
    lo, hi = df.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert lo.year == 2024 and hi.year == 2024  # wall clock preserved, no tz shift
