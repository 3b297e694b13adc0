"""Scale-pattern checks the DuckDB gate cannot express: HLL error
bounds, and bucketed co-located joins eliminating their shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators.scale import agg_approx_distinct_raw


def test_approx_distinct_within_rsd(spark, sf_correct):
    approx = {
        r.event_type: r.approx_users for r in agg_approx_distinct_raw(spark, sf_correct).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_correct, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        # rsd=0.02 → allow a generous 5x margin so the test is stable
        assert abs(approx[et] - ex) <= max(0.10 * ex, 2), (et, approx[et], ex)


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path):
    """Bucketing both join sides on the key lets Spark run a sort-merge
    join with ZERO Exchange operators — the co-located join that turns
    a repeated 100 TB shuffle into a one-time layout cost."""
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "b_orders"
    )
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "b_lineitem"
    )
    # disable auto-broadcast so the join would otherwise shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        # and it still computes the right thing
        assert joined.count() == lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_partitions(spark, sf_smoke, tmp_path):
    """Filters on the partition column must prune directories at plan
    time (PartitionFilters), reading only the matching subtree."""
    from pyspark.sql import functions as F

    from ceneton_database_tools_spark.sinks import read_partitioned, write_partitioned

    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_smoke, "orders")
    write_partitioned(orders, out, ["o_orderstatus"])

    import os

    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    assert dirs == {"o_orderstatus=O", "o_orderstatus=F", "o_orderstatus=P"}

    back = read_partitioned(spark, out).filter(F.col("o_orderstatus") == "O")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    want = orders.filter(F.col("o_orderstatus") == "O").count()
    assert back.count() == want > 0


def test_count_with_observe_matches_and_warns(spark, sf_smoke, caplog):
    import logging

    from ceneton_database_tools_spark.operators.advanced import count_with_observe

    orders = load_table(spark, sf_smoke, "orders")
    n, metrics = count_with_observe(orders)
    assert n == metrics["n_rows"] == orders.count()
    with caplog.at_level(logging.WARNING):
        count_with_observe(orders, declared_count=n + 5)
    assert any("header declared" in r.message for r in caplog.records)


def test_release_persisted_scoped_to_application(spark):
    """release_persisted drops only the active application's entries;
    other live sessions' caches survive (ADVICE r3)."""
    from ceneton_database_tools_spark.operators import dedup as D

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3).toDF("doc_id")

    df = D._shared_persist(spark, "_test_scope", "sfX", build)
    assert D._shared_persist(spark, "_test_scope", "sfX", build) is df
    assert calls["n"] == 1

    class _Fake:
        unpersisted = False

        def unpersist(self):
            self.unpersisted = True

    foreign = _Fake()
    D._PERSISTED[("other-app", "k", "sfY")] = foreign
    # default scope = active session: the foreign entry survives
    D.release_persisted()
    app_id = spark.sparkContext.applicationId
    assert ("other-app", "k", "sfY") in D._PERSISTED
    assert not any(k[0] == app_id for k in D._PERSISTED)
    assert not foreign.unpersisted
    # explicit scope removes exactly that application's entries
    D.release_persisted("other-app")
    assert ("other-app", "k", "sfY") not in D._PERSISTED
    assert foreign.unpersisted
    # stale foreign entries are evicted lazily on the next _shared_persist
    D._PERSISTED[("dead-app", "k", "sfZ")] = _Fake()
    D._shared_persist(spark, "_test_scope", "sfX", build)
    assert ("dead-app", "k", "sfZ") not in D._PERSISTED
    D.release_persisted()


def test_stage_progress_does_not_claim_completion_on_failure(spark):
    """A raised action leaves the bar at its last observed count instead
    of rendering 100% (ADVICE r3)."""
    import pytest as _pytest

    from ceneton_database_tools_spark.progress import stage_progress

    with _pytest.raises(RuntimeError):
        with stage_progress(spark, total_records=1000) as bar:
            bar.n = 137
            raise RuntimeError("boom")
    assert bar.n == 137

    with stage_progress(spark, total_records=1000) as bar:
        bar.n = 137
    assert bar.n == 1000


# -- TWIN_OFFSET runtime guard ------------------------------------------------


def test_twin_headroom_guard_fires_on_oversized_ids(spark, tmp_path):
    """A corpus whose doc_ids reach TWIN_OFFSET must fail loudly in the
    twin-corpus builders instead of silently colliding twin ids with
    real ids (corrupting every recall metric)."""
    import pytest as _pytest

    from ceneton_database_tools_spark.operators import dedup

    big = spark.createDataFrame(
        [(1, "alpha beta"), (dedup.TWIN_OFFSET + 5, "gamma delta")],
        "doc_id long, text string",
    )
    sf_key = str(tmp_path / "oversized")
    with _pytest.raises(AssertionError, match="twin offset"):
        dedup.assert_twin_headroom(big, sf_key)
    # a caller-supplied offset (refine.py's intradoc constant) is used
    # as the threshold — the guard must not silently check the default
    with _pytest.raises(AssertionError, match="twin offset \\(100\\)"):
        dedup.assert_twin_headroom(big, str(tmp_path / "custom"), offset=100)
    # ... and the memoized pass path still works for a sane corpus
    ok = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    dedup.assert_twin_headroom(ok, str(tmp_path / "sane"))
    dedup.assert_twin_headroom(ok, str(tmp_path / "sane"))  # memo hit
