"""Column-mapping schema evolution (rename/drop as pure-manifest
commits) on the transactional table — Delta's column-mapping name mode
re-expressed at this layer's directory granularity: the manifest
records each column's NAME HISTORY, reads coalesce the history per
directory, and time travel keeps every version's own names.

Reference scope note: the reference (a 495-LoC single-threaded ETL
script) has no table format at all; this file covers the
driver-mandated warehouse-maintenance extension surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ceneton_database_tools_spark.sinks.txnlog import (
    SchemaMismatch,
    TxnTable,
)


def _kv(spark, lo: int, hi: int, val="bal"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias(val)
    )


def test_rename_is_metadata_only_and_reads_both_epochs(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 10), mode="overwrite")
    files_before = t.snapshot(0)["files"]
    v = t.rename_column("bal", "balance")
    assert v == 1
    # pure-manifest: same directories, zero data moved
    assert t.snapshot(1)["files"] == files_before
    assert t.history()[0]["op"] == "rename_column"
    # old directory serves under the new logical name
    got = {r["k"]: r["balance"] for r in t.read(spark).collect()}
    assert got == {i: 2 * i for i in range(10)}
    # post-rename append under the new name mixes with the old epoch
    t.write(_kv(spark, 10, 15, "balance"))
    got = {r["k"]: r["balance"] for r in t.read(spark).collect()}
    assert got == {i: 2 * i for i in range(15)}


def test_time_travel_keeps_each_versions_names(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")
    t.rename_column("bal", "balance")
    assert t.read(spark, 0).columns == ["k", "bal"]
    assert t.read(spark, 1).columns == ["k", "balance"]
    # values identical through the rename
    assert {r["bal"] for r in t.read(spark, 0).collect()} == {
        r["balance"] for r in t.read(spark, 1).collect()
    }


def test_chained_renames_coalesce_three_epochs(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")  # epoch name: bal
    t.rename_column("bal", "amount")
    t.write(_kv(spark, 5, 10, "amount"))  # epoch name: amount
    t.rename_column("amount", "total")
    t.write(_kv(spark, 10, 15, "total"))  # epoch name: total
    snap = t.snapshot()
    assert snap["column_names"] == {"total": ["total", "amount", "bal"]}
    got = {r["k"]: r["total"] for r in t.read(spark).collect()}
    assert got == {i: 2 * i for i in range(15)}


def test_rename_refusals(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")
    with pytest.raises(ValueError):
        t.rename_column("bal", "bal")
    with pytest.raises(SchemaMismatch, match="no such column"):
        t.rename_column("nope", "x")
    with pytest.raises(SchemaMismatch, match="already exists"):
        t.rename_column("bal", "k")
    # constraint-referenced column refuses (Delta refuses the same)
    t.add_constraint(spark, "pos", "bal >= 0")
    with pytest.raises(SchemaMismatch, match="CHECK constraint"):
        t.rename_column("bal", "balance")
    t.drop_constraint("pos")
    t.rename_column("bal", "balance")
    # a retired name cannot be the target of a later rename
    with pytest.raises(SchemaMismatch, match="retired"):
        t.rename_column("k", "bal")


def test_partition_column_rename_and_drop_refused(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    df = spark.range(6).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    t.write_partitioned(df, partition_by=("p",), mode="overwrite")
    with pytest.raises(SchemaMismatch, match="partition column"):
        t.rename_column("p", "bucket")
    with pytest.raises(SchemaMismatch, match="partition column"):
        t.drop_column("p")
    # non-partition columns still rename on a partitioned table
    t.rename_column("k", "key")
    assert sorted(t.read(spark).columns) == ["key", "p"]
    assert t.read(spark).count() == 6


def test_drop_column_and_retired_names_stay_dead(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")
    v = t.drop_column("bal")
    assert v == 1 and t.history()[0]["op"] == "drop_column"
    assert t.read(spark).columns == ["k"]
    # time travel still sees the column
    assert t.read(spark, 0).columns == ["k", "bal"]
    # re-adding the retired name is refused on every evolving path
    with pytest.raises(SchemaMismatch, match="retired"):
        t.write(_kv(spark, 5, 8), merge_schema=True)
    with pytest.raises(SchemaMismatch):
        t.drop_column("k")  # last column
    # a FRESH name evolves fine after the drop
    t.write(
        spark.range(5, 8).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("score")
        ),
        merge_schema=True,
    )
    got = t.read(spark)
    assert sorted(got.columns) == ["k", "score"]
    assert got.count() == 8


def test_rename_after_drop_history_merges_into_retired(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")
    t.rename_column("bal", "balance")
    t.drop_column("balance")
    snap = t.snapshot()
    assert snap.get("column_names", {}) == {}
    assert sorted(snap["retired_columns"]) == ["bal", "balance"]
    # neither historical name is re-addable
    for dead in ("bal", "balance"):
        with pytest.raises(SchemaMismatch, match="retired"):
            t.write(
                spark.range(3).select(
                    F.col("id").alias("k"), F.lit(1.0).alias(dead)
                ),
                merge_schema=True,
            )


def test_overwrite_reclaims_mapping_and_retired_names(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")
    t.rename_column("bal", "balance")
    t.drop_column("balance")
    t.write(_kv(spark, 0, 5), mode="overwrite")  # fresh data, old name
    snap = t.snapshot()
    assert "column_names" not in snap and "retired_columns" not in snap
    assert {r["bal"] for r in t.read(spark).collect()} == {0, 2, 4, 6, 8}


def test_stats_and_bloom_rekey_so_pruning_follows_the_rename(
    spark, tmp_path
):
    t = TxnTable(str(tmp_path), stats_cols=("v",), bloom_cols=("name",))
    df = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("v"), F.format_string("u%d", "id").alias("name")
    )
    t.write(df(0, 100), mode="overwrite")
    t.write(df(100, 200))
    t.rename_column("v", "val")
    t.rename_column("name", "uname")
    snap = t.snapshot()
    for d in snap["files"]:
        assert set(snap["stats"][d]) == {"val"}
        assert set(snap["blooms"][d]) == {"uname"}
    kept, skipped = t.prune([("val", ">=", 150)])
    assert len(kept) == 1 and len(skipped) == 1
    assert (
        t.read_pruned(spark, [("val", ">=", 150)]).where("val >= 150").count()
        == 50
    )
    # bloom equality probe under the new name skips the other commit
    kept_b, skipped_b = t.prune([("uname", "=", "u7")])
    assert len(kept_b) == 1 and len(skipped_b) == 1


def test_mapping_rides_policy_commits_and_restore(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")  # v0
    t.rename_column("bal", "balance")  # v1
    t.set_properties({"owner": "x"})  # v2
    t.add_constraint(spark, "pos", "balance >= 0")  # v3
    snap = t.snapshot()
    assert snap["column_names"] == {"balance": ["balance", "bal"]}
    # restore to v0 restores the PRE-rename schema and mapping state
    t.restore(0)  # v4
    assert t.read(spark).columns == ["k", "bal"]
    assert "column_names" not in t.snapshot()
    # restore forward again: mapping comes back with the target
    t.restore(1)  # v5
    assert t.read(spark).columns == ["k", "balance"]
    assert t.snapshot()["column_names"] == {"balance": ["balance", "bal"]}


def test_row_level_paths_operate_through_the_mapping(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 10), mode="overwrite")
    t.rename_column("bal", "balance")
    # merge-on-read point delete: row identity survives the coalesce
    t.delete_dv(spark, "balance >= 16")
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(8))
    # copy-on-write delete rewrites under the CURRENT name
    t.delete(spark, "balance >= 14")
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(7))
    # merge upsert matches/updates through the logical name
    src = spark.range(5, 9).select(
        F.col("id").alias("k"), F.lit(99).cast("long").alias("balance")
    )
    t.merge(spark, src, key="k")
    got = {r["k"]: r["balance"] for r in t.read(spark).collect()}
    assert got == {**{i: 2 * i for i in range(5)}, **{i: 99 for i in range(5, 9)}}


def test_optimize_consolidates_under_current_names(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")
    t.rename_column("bal", "balance")
    t.write(_kv(spark, 5, 10, "balance"))
    before = t.read(spark).orderBy("k").collect()
    assert t.optimize(spark) is not None
    after = t.read(spark).orderBy("k").collect()
    assert before == after
    # mapping still rides (harmlessly) and reads stay correct
    assert {r["k"]: r["balance"] for r in t.read(spark).collect()} == {
        i: 2 * i for i in range(10)
    }


def test_changes_feed_spans_a_rename(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")  # v0
    t.rename_column("bal", "balance")  # v1: emits nothing
    t.write(_kv(spark, 5, 8, "balance"))  # v2: 3 inserts
    t.delete(spark, "k = 0")  # v3: deletes a PRE-rename row
    ch = t.changes(spark, "k", 0).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["change_type"], []).append(r)
    assert sorted(r["k"] for r in by_type["insert"]) == [5, 6, 7]
    # the pre-rename victim reads its value through the mapping
    assert [(r["k"], r["balance"]) for r in by_type["delete"]] == [(0, 0)]
    assert set(by_type) == {"insert", "delete"}


def test_batch_face_reads_and_filters_through_the_mapping(spark, tmp_path):
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path), stats_cols=("bal",))
    t.write(_kv(spark, 0, 100), mode="overwrite")
    t.rename_column("bal", "balance")
    t.write(_kv(spark, 100, 200, "balance"))
    face = (
        spark.read.format("txntable")
        .option("path", str(tmp_path))
        .option("where", "balance >= 300")
        .load()
    )
    assert face.columns == ["k", "balance"]
    got = sorted(r["k"] for r in face.collect())
    assert got == list(range(150, 200))
    # time travel through the face keeps the old name
    v0 = (
        spark.read.format("txntable")
        .option("path", str(tmp_path))
        .option("version", "0")
        .load()
    )
    assert v0.columns == ["k", "bal"] and v0.count() == 100


def test_stream_face_snapshot_and_appends_span_a_rename(spark, tmp_path):
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path))
    t.write(_kv(spark, 0, 5), mode="overwrite")
    t.rename_column("bal", "balance")
    t.write(_kv(spark, 5, 10, "balance"))
    q = (
        spark.readStream.format("txntable")
        .option("path", str(tmp_path))
        .load()
        .writeStream.format("memory")
        .queryName("colmap_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT k, balance FROM colmap_stream ORDER BY k"
    ).collect()
    assert [(r["k"], r["balance"]) for r in rows] == [
        (i, 2 * i) for i in range(10)
    ]


def test_reorg_purge_composes_with_mapping_and_evolution(spark, tmp_path):
    """PURGE under column mapping + schema evolution: the rewrite of a
    tombstoned pre-rename/pre-evolution directory materializes the
    CURRENT logical names and NULL-fills the evolved column, while
    untouched pre-rename directories keep serving through the name
    history — and the purge stays metadata-only about which
    directories to touch."""
    t = TxnTable(str(tmp_path), checkpoint_at=2)
    t.write(_kv(spark, 0, 10), mode="overwrite")
    t.write(_kv(spark, 10, 20), mode="append")
    t.rename_column("bal", "balance")
    # evolve: post-rename append carries a NEW nullable column
    ev = spark.range(20, 25).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("balance"),
        F.lit("x").alias("tag"),
    )
    t.write(ev, mode="append", merge_schema=True)
    assert "files_checkpoint" in t._stub(t.latest_version())
    # tombstone rows in the FIRST (pre-rename, pre-evolution) dir only
    assert t.delete_dv(spark, "k IN (3, 7)") is not None
    dv_dirs = set(t._dv_rows_map(t._stub(t.latest_version())))
    assert len(dv_dirs) == 1
    files_before = set(t.snapshot()["files"])
    v = t.reorg_purge(spark)
    assert v is not None
    snap = t.snapshot()
    # only the tombstoned dir rewrote; both other epochs by reference
    assert files_before & set(snap["files"]) == files_before - dv_dirs
    assert "dvs" not in snap
    # reads coalesce all three epochs under the CURRENT names
    got = {r["k"]: (r["balance"], r["tag"]) for r in t.read(spark).collect()}
    assert set(got) == set(range(25)) - {3, 7}
    assert all(got[k] == (2 * k, None) for k in got if k < 20)
    assert all(got[k] == (2 * k, "x") for k in got if k >= 20)
    # (stats/bloom cell re-keying under renames is pinned by
    # test_stats_and_bloom_rekey_so_pruning_follows_the_rename)
