"""The benchmark memory fence (plans/cache_release.py, VERDICT r10 #1a):
snapshot keeps the ingest-billed artifacts, release drops everything
newer and unpersists it."""

from event_store_spark.plans.cache_release import (
    memo_snapshot,
    release_query_caches,
)


def test_release_drops_only_post_snapshot_entries(spark):
    import event_store_spark.plans.pipeline6 as p6

    store = p6._PROFILE_MEMO.setdefault(spark, {})
    store.clear()
    keep_df = spark.range(3).cache()
    keep_df.count()
    store[("keep", "cols")] = keep_df

    snap = memo_snapshot(spark)

    drop_df = spark.range(5).cache()
    drop_df.count()
    store[("drop", "cols")] = drop_df

    n = release_query_caches(spark, keep=snap)
    assert n >= 1
    assert ("keep", "cols") in store and ("drop", "cols") not in store
    assert keep_df.storageLevel.useMemory  # keep-set cache survives
    assert not drop_df.storageLevel.useMemory  # released entry unpersisted
    release_query_caches(spark)  # full clear for test hygiene
    assert store == {}


def test_release_unpersists_dataframes_inside_tuples(spark):
    import event_store_spark.plans.pipeline6 as p6

    store = p6._PROFILE_MEMO.setdefault(spark, {})
    store.clear()
    df = spark.range(4).cache()
    df.count()
    store[("tuple", "entry")] = ([1, 2, 3], df)
    release_query_caches(spark)
    assert store == {}
    assert not df.storageLevel.useMemory
