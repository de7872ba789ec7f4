"""Composed user-CRUD flow (reference utils/user.py:130-168): validation,
uniqueness probe, append-duplicates rating semantics, and the latest-rating
dedup view — asserted together, end-to-end over a scratch parquet store."""

from __future__ import annotations

from recommender_systems_pyspark_spark.ml.users import UserStore
from recommender_systems_pyspark_spark.registry import all_queries


def test_user_crud_end_to_end(spark, tmp_path):
    store = UserStore(spark, str(tmp_path / "store"))
    store.setup()
    # S7 DDL-typed creation: empty but schema'd
    assert store.users().count() == 0
    assert [f.name for f in store.users().schema.fields] == [
        "user_id", "username", "email", "created_at", "is_active",
    ]

    # validation gates (utils/user.py:130-148)
    assert store.create_user("") is None
    assert store.create_user("   ") is None
    assert store.create_user("bad name") is None  # space
    assert store.create_user("bad@name") is None  # @
    uid = store.create_user("demo_user", "demo@example.com")
    assert uid is not None
    assert store.create_user("demo_user") is None  # taken → rejected
    assert store.username_exists("demo_user")
    assert not store.username_exists("ghost")

    # read-back (utils/user.py:107-120)
    row = store.get_user_by_username("demo_user")
    assert row and row["user_id"] == uid and row["is_active"] is True

    # append-duplicates + latest dedup, asserted TOGETHER
    store.add_rating(uid, "tt0111161", 4.0)
    store.add_rating(uid, "tt0111161", 1.5)  # re-rating appends
    store.add_rating(uid, "tt0068646", 5.0)
    assert store.ratings().count() == 3  # duplicates kept (append semantics)
    latest = {(r.user_id, r.item_id): r.rating for r in store.latest_ratings().collect()}
    assert len(latest) == 2  # dedup view collapses the pair
    assert latest[(uid, "tt0111161")] == 1.5  # latest wins


def test_crud_flow_query_shape(spark, sf_dir):
    df = all_queries()["ml_user_crud_flow"].fn(spark, sf_dir)
    rows = {r.username: r for r in df.collect()}
    assert set(rows) == {"alice", "bob_2.test-x"}
    assert rows["alice"].n_appended == 3 and rows["alice"].n_latest == 2
    assert rows["bob_2.test-x"].n_appended == 1 and rows["bob_2.test-x"].n_latest == 1
    assert not rows["alice"].recs_unlocked
