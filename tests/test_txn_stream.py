"""Streaming SOURCE over the transactional table (sources/txn_stream.py):
versions are offsets, manifests diff into per-file input partitions,
executors emit Arrow batches. These tests prove the streaming contract —
initial-snapshot consumption, incremental restart from a checkpoint,
insert-only enforcement, ignoreChanges re-emission, clustered commits,
and truncated-history failure — which the row-level oracle gate
(streaming_txn_source_rollup) cannot see."""

from __future__ import annotations

import os

import pytest

from ceneton_database_tools_spark.sinks.txnlog import TxnTable
from ceneton_database_tools_spark.sources.txn_stream import register_txn_source


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def _drain(sdf, ck, sink):
    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


@pytest.fixture()
def stream_table(spark, tmp_path):
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.write(_df(spark, [(3, "c")]), mode="append")
    sdf = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .load(t.path)
    )
    return t, sdf, str(tmp_path / "ck")


def test_initial_snapshot_then_incremental_restart(spark, stream_table):
    """Pass 1 consumes the CURRENT snapshot (not a commit-by-commit
    history replay); a restart from the same checkpoint reads ONLY the
    commits that landed in between — versions are real offsets."""
    t, sdf, ck = stream_table
    got: list = []
    _drain(sdf, ck, lambda b, _: got.extend((r.id, r.v) for r in b.collect()))
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]
    t.write(_df(spark, [(4, "d")]), mode="append")
    t.write(_df(spark, [(5, "e")]), mode="append")
    got2: list = []
    _drain(sdf, ck, lambda b, _: got2.extend((r.id, r.v) for r in b.collect()))
    assert sorted(got2) == [(4, "d"), (5, "e")], "replayed old rows or missed new"
    # nothing new: a third pass emits zero rows
    got3: list = []
    _drain(sdf, ck, lambda b, _: got3.extend((r.id, r.v) for r in b.collect()))
    assert got3 == []


def test_non_append_commit_raises_without_ignorechanges(spark, stream_table):
    """A delete/merge/optimize commit in the consumed range must fail
    the insert-only stream loudly, never skip or double-count."""
    t, sdf, ck = stream_table
    _drain(sdf, ck, lambda b, _: None)  # consume the snapshot
    t.delete(spark, "id = 1")
    with pytest.raises(Exception, match="insert-only stream"):
        _drain(sdf, ck, lambda b, _: None)


def test_ignorechanges_reemits_rewritten_directory(spark, stream_table):
    """Delta's documented ignoreChanges: the rewritten directory is
    re-emitted in full (survivors re-delivered), nothing is lost."""
    t, sdf, ck = stream_table
    _drain(sdf, ck, lambda b, _: None)
    t.delete(spark, "id = 1")  # rewrites the (1,2) directory to just (2)
    sdf_ic = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .option("ignorechanges", "true")
        .load(t.path)
    )
    got: list = []
    _drain(sdf_ic, ck, lambda b, _: got.extend((r.id, r.v) for r in b.collect()))
    assert sorted(got) == [(2, "b")]


def test_streams_clustered_commit_entries(spark, tmp_path):
    """A write_clustered commit's nested range directories stream like
    any other commit — the per-file partitions walk into them."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write(_df(spark, [(0, "seed")]), mode="overwrite")
    sdf = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .load(t.path)
    )
    ck = str(tmp_path / "ck")
    _drain(sdf, ck, lambda b, _: None)  # consume the seed snapshot
    t.write_clustered(
        _df(spark, [(i, f"r{i}") for i in range(1, 41)]), "id", buckets=4
    )
    got: list = []
    _drain(sdf, ck, lambda b, _: got.extend((r.id, r.v) for r in b.collect()))
    assert sorted(r[0] for r in got) == list(range(1, 41))


def test_truncated_history_fails_loudly(spark, tmp_path):
    """Resuming a checkpoint whose next version was truncate_log'd away
    must raise a clear error, not silently restart from now."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    sdf = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .load(t.path)
    )
    ck = str(tmp_path / "ck")
    _drain(sdf, ck, lambda b, _: None)  # checkpoint at v0
    for i in range(2, 6):
        t.write(_df(spark, [(i, "x")]), mode="append")
    t.truncate_log(retain_versions=1)  # v0..v3 manifests gone
    with pytest.raises(Exception, match="manifest is gone|truncate_log"):
        _drain(sdf, ck, lambda b, _: None)


def test_schema_is_required(spark, tmp_path):
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    with pytest.raises(Exception, match="explicit .schema"):
        spark.readStream.format("txntable").load(t.path).writeStream.format(
            "noop"
        ).start()


def test_projection_follows_declared_schema_order(spark, tmp_path):
    """Executors emit batches in DECLARED schema order even when it
    differs from the parquet layout order."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(7, "g")]), mode="overwrite")  # layout: id, v
    sdf = (
        spark.readStream.format("txntable")
        .schema("v string, id long")  # reversed
        .load(t.path)
    )
    got: list = []
    _drain(
        sdf,
        str(tmp_path / "ck"),
        lambda b, _: got.extend((r.v, r.id) for r in b.collect()),
    )
    assert got == [("g", 7)]


def test_streams_partitioned_appends_and_rejects_drops(spark, tmp_path):
    """Partitioned appends stream like any other commit (one input
    partition per leaf parquet file; partition columns come from the
    data, never path inference); a drop_partitions commit removes
    directories, so the insert-only stream fails loudly without
    ignoreChanges — a metadata delete is still a delete."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    rows = [(i, ["A", "B"][i % 2], f"r{i}") for i in range(10)]
    pdf = spark.createDataFrame(rows, "id long, seg string, v string")
    t.write_partitioned(pdf.where("id < 6"), ("seg",), mode="overwrite")
    sdf = (
        spark.readStream.format("txntable")
        .schema("id long, seg string, v string")
        .load(t.path)
    )
    ck = str(tmp_path / "ck")
    got: list = []
    _drain(sdf, ck, lambda b, _: got.extend((r.id, r.seg) for r in b.collect()))
    assert sorted(r[0] for r in got) == list(range(6))
    assert {r[1] for r in got} == {"A", "B"}
    # incremental partitioned append: only the new leaves stream
    t.write_partitioned(pdf.where("id >= 6"), ("seg",))
    got2: list = []
    _drain(sdf, ck, lambda b, _: got2.extend((r.id, r.seg) for r in b.collect()))
    assert sorted(r[0] for r in got2) == list(range(6, 10))
    # a partition drop breaks the insert-only contract, loudly
    t.drop_partitions([("seg", "=", "B")])
    with pytest.raises(Exception, match="insert-only stream"):
        _drain(sdf, ck, lambda b, _: None)
