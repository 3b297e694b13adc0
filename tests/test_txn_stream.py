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


def test_plain_stream_over_reorg_purge(spark, stream_table):
    """A ``reorg`` (PURGE) commit is a rewrite to the insert-only
    stream, exactly like optimize: it fails loudly without
    ignorechanges, and under ignorechanges the rewritten directory's
    survivors re-emit (Delta's documented semantics) — never silently
    skipped as if it were a policy commit."""
    t, sdf, ck = stream_table
    _drain(sdf, ck, lambda b, _: None)  # consume the snapshot
    t.delete_dv(spark, "id = 1")
    assert t.reorg_purge(spark) is not None
    # ignoredeletes skips the dv-only commit; the REORG itself raises
    sdf_id = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .option("ignoredeletes", "true")
        .load(t.path)
    )
    with pytest.raises(Exception, match="'reorg'"):
        _drain(sdf_id, ck, lambda b, _: None)
    sdf_ic = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .option("ignorechanges", "true")
        .load(t.path)
    )
    got: list = []
    _drain(sdf_ic, ck, lambda b, _: got.extend((r.id, r.v) for r in b.collect()))
    # the purged directory re-emits its SURVIVORS only (id=1 is gone)
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


def test_schema_derived_from_manifest(spark, tmp_path):
    """Neither face needs hand-written DDL: the manifest's recorded
    schema IS the contract. A pathless/uncommitted table still fails
    loudly."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    sdf = spark.readStream.format("txntable").load(t.path)  # no .schema
    assert [f.name for f in sdf.schema.fields] == ["id", "v"]
    got: list = []
    _drain(
        sdf, str(tmp_path / "ck"),
        lambda b, _: got.extend((r.id, r.v) for r in b.collect()),
    )
    assert got == [(1, "a")]
    empty = TxnTable(str(tmp_path / "empty"))
    with pytest.raises(Exception, match="no committed manifest"):
        spark.read.format("txntable").load(empty.path).count()


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


# -- round 9: evolution composition, admission control, batch face -------


def test_stream_reads_across_schema_evolution(spark, tmp_path):
    """A stream declared on the EVOLVED schema must read pre-evolution
    files with the evolved columns NULL-filled (typed Arrow nulls) —
    the same by-name rule as the batch reader — instead of crashing."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.write(
        spark.createDataFrame(
            [(3, "c", 30), (4, "d", 40)], "id long, v string, score long"
        ),
        mode="append",
        merge_schema=True,
    )
    sdf = spark.readStream.format("txntable").load(t.path)  # evolved schema
    assert [f.name for f in sdf.schema.fields] == ["id", "v", "score"]
    got: list = []
    _drain(
        sdf, str(tmp_path / "ck"),
        lambda b, _: got.extend((r.id, r.v, r.score) for r in b.collect()),
    )
    assert sorted(got) == [(1, "a", None), (2, "b", None), (3, "c", 30), (4, "d", 40)]
    # and INCREMENTALLY: a stream checkpointed BEFORE the evolution,
    # redeclared on the evolved schema, streams the old commit's files
    t2 = TxnTable(str(tmp_path / "t2"))
    t2.write(_df(spark, [(1, "a")]), mode="overwrite")
    sdf2 = spark.readStream.format("txntable").load(t2.path)
    ck2 = str(tmp_path / "ck2")
    _drain(sdf2, ck2, lambda b, _: None)  # checkpoint at v0
    t2.write(_df(spark, [(2, "b")]), mode="append")  # pre-evolution file
    t2.write(
        spark.createDataFrame([(3, "c", 3)], "id long, v string, n long"),
        mode="append",
        merge_schema=True,
    )
    sdf2e = spark.readStream.format("txntable").load(t2.path)
    got2: list = []
    _drain(
        sdf2e, ck2,
        lambda b, _: got2.extend((r.id, r.v, r.n) for r in b.collect()),
    )
    assert sorted(got2) == [(2, "b", None), (3, "c", 3)]


# r15 slow tier: catchup-throughput bounding variant; CDF stream
# correctness stays always-on across the cdf suite
@pytest.mark.slow
def test_max_versions_per_trigger_bounds_catchup(spark, tmp_path):
    """A RUNNING stream that falls 10 commits behind with
    maxversionspertrigger=3 must drain the backlog in multiple bounded
    micro-batches (1-row commits -> ≤3 rows per batch), never one
    unbounded catch-up. (The first batch after a restart is uncapped —
    Spark's Python protocol calls latestOffset before the reader can
    learn its position; documented in the module.)"""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(0, "r0")]), mode="overwrite")
    sdf = (
        spark.readStream.format("txntable")
        .option("maxversionspertrigger", "3")
        .load(t.path)
    )
    batches: list[list] = []
    q = (
        sdf.writeStream.foreachBatch(
            lambda b, _: batches.append([(r.id, r.v) for r in b.collect()])
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()  # consume the seed snapshot: floor known
        for i in range(1, 11):
            t.write(_df(spark, [(i, f"r{i}")]), mode="append")
        q.processAllAvailable()  # drain the 10-commit backlog, capped
    finally:
        q.stop()
    rows = sorted(r for b in batches for r in b)
    assert rows == [(i, f"r{i}") for i in range(11)]
    backlog = [b for b in batches[1:] if b]
    # ≤3 versions (=rows here) per batch: the backlog needs ≥4 batches
    assert len(backlog) >= 4, [len(b) for b in backlog]
    assert all(len(b) <= 3 for b in backlog), [len(b) for b in backlog]


def test_batch_face_reads_and_time_travels(spark, tmp_path):
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.write(_df(spark, [(3, "c")]), mode="append")
    df = spark.read.format("txntable").load(t.path)
    assert sorted((r.id, r.v) for r in df.collect()) == [(1, "a"), (2, "b"), (3, "c")]
    v0 = spark.read.format("txntable").option("version", "0").load(t.path)
    assert sorted(r.id for r in v0.collect()) == [1, 2]
    # evolution: batch face NULL-fills pre-evolution files too
    t.write(
        spark.createDataFrame([(4, "d", 4)], "id long, v string, n long"),
        mode="append",
        merge_schema=True,
    )
    evolved = spark.read.format("txntable").load(t.path)
    assert sorted(
        (r.id, r.n) for r in evolved.collect()
    ) == [(1, None), (2, None), (3, None), (4, 4)]


def test_batch_face_pushdown_prunes_directories(spark, tmp_path):
    """Catalyst's pushed filters must reach the manifest prune: a
    clustered table's non-matching range directories never produce
    input partitions, and the result still matches the full filter
    (pruning is a superset proof; Spark re-applies the predicate)."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write_clustered(
        _df(spark, [(i, f"r{i}") for i in range(400)]), "id", buckets=8,
        mode="overwrite",
    )
    n_dirs = len(t.snapshot()["files"])
    assert n_dirs == 8
    # the engine-level path: DataFrame filter -> pushFilters -> prune
    df = (
        spark.read.format("txntable")
        .option("pushdown", "true")  # single-use load: pruning active
        .load(t.path)
        .where("id >= 380")
    )
    assert sorted(r.id for r in df.collect()) == list(range(380, 400))
    # the planner-level proof: with the same predicate pushed, the
    # reader plans strictly fewer input partitions than the full scan
    reader = TxnTableBatchReader(df.schema, {"path": t.path, "pushdown": "true"})
    from pyspark.sql.datasource import GreaterThanOrEqual

    unhandled = reader.pushFilters([GreaterThanOrEqual(("id",), 380)])
    assert list(unhandled)  # every filter handed back for re-apply
    pruned = reader.partitions()
    full = TxnTableBatchReader(df.schema, {"path": t.path}).partitions()
    assert len(pruned) < len(full)
    kept, skipped = t.prune([("id", ">=", 380)])
    assert len(kept) == 1 and len(skipped) == 7
    assert len(pruned) == sum(
        1 for p in full if any(k in p.file_path for k in kept)
    )


def test_batch_face_in_filter_and_timestamp_travel(spark, tmp_path):
    """IN lists prune disjunctively (bloom-probed per value); an
    all-pruned scan plans zero partitions and returns empty;
    timestampasof resolves the version from commit wall clocks."""
    import time

    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
    )
    from pyspark.sql.datasource import In

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",), bloom_cols=("id",))
    t.write_clustered(
        _df(spark, [(i, f"r{i}") for i in range(400)]), "id", buckets=8,
        mode="overwrite",
    )
    ts_mid = time.time()
    t.write(_df(spark, [(1000, "late")]), mode="append")
    # IN over two values in the same range bucket: 1 of 9 dirs survives
    df = (
        spark.read.format("txntable")
        .option("pushdown", "true")
        .load(t.path)
        .where("id IN (390, 399)")
    )
    assert sorted(r.id for r in df.collect()) == [390, 399]
    push = {"path": t.path, "pushdown": "true"}
    reader = TxnTableBatchReader(df.schema, push)
    reader.pushFilters([In(("id",), (390, 399))])
    full = TxnTableBatchReader(df.schema, {"path": t.path}).partitions()
    assert 0 < len(reader.partitions()) < len(full)
    # an impossible IN prunes everything: zero partitions, empty scan
    nothing = TxnTableBatchReader(df.schema, push)
    nothing.pushFilters([In(("id",), (10**7, 10**7 + 1))])
    assert nothing.partitions() == []
    empty = (
        spark.read.format("txntable")
        .option("pushdown", "true")
        .load(t.path)
        .where("id = 10000000")
    )
    assert empty.count() == 0
    # timestamp travel: a read AS OF ts_mid predates the late append
    asof = (
        spark.read.format("txntable")
        .option("timestampasof", str(ts_mid))
        .load(t.path)
    )
    assert asof.where("id = 1000").count() == 0
    assert asof.count() == 400


def test_batch_face_default_is_reuse_safe(spark, tmp_path):
    """THE readInfo-cache hazard, pinned: Spark 4.1 keeps ONE cached
    (partitions, read_func) per relation, refreshed only by queries
    whose WHERE holds a translatable filter — so a filter-dependent
    partition plan leaks into a later filterLESS query on the same
    DataFrame. Default mode therefore never prunes by filter: the
    poison pattern (filtered action, then unfiltered action, same
    DataFrame) must return ALL rows, and pushFilters must hand every
    filter back without storing planner state."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
    )
    from pyspark.sql.datasource import EqualTo

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write_clustered(
        _df(spark, [(i, f"r{i}") for i in range(400)]), "id", buckets=8,
        mode="overwrite",
    )
    df = spark.read.format("txntable").load(t.path)
    # filtered FIRST: this is the action that would poison the cache
    assert df.where("id = 5").count() == 1
    # the same DataFrame, unfiltered: every row must survive the reuse
    assert df.count() == 400
    assert len(df.collect()) == 400
    # planner-level: default readers ignore pushed filters entirely
    reader = TxnTableBatchReader(df.schema, {"path": t.path})
    unhandled = reader.pushFilters([EqualTo(("id",), 5)])
    assert list(unhandled) and reader.predicates == []
    assert len(reader.partitions()) == len(
        TxnTableBatchReader(df.schema, {"path": t.path}).partitions()
    )


def test_batch_face_merges_deletion_vectors(spark, tmp_path):
    """delete_dv commits tombstone sidecars, not rewrites — the batch
    DataSource must anti-join them out executor-side: the live scan
    drops exactly the victims, a pre-delete version read still has
    them, and pruning composes (a kept directory's survivors still
    merge out its tombstones)."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write_clustered(
        _df(spark, [(i, f"r{i}") for i in range(100)]), "id", buckets=4,
        mode="overwrite",
    )
    assert t.delete_dv(spark, "id % 10 = 0") == 1
    live = spark.read.format("txntable").load(t.path)
    assert sorted(r.id for r in live.collect()) == [
        i for i in range(100) if i % 10 != 0
    ]
    # unfiltered-count path sees the merged view too (not file counts)
    assert live.count() == 90
    # time travel predates the tombstones
    v0 = spark.read.format("txntable").option("version", "0").load(t.path)
    assert v0.count() == 100
    # pushdown + dv: the kept range directory still merges out its
    # tombstones (50 is a victim inside the surviving bucket)
    hit = (
        spark.read.format("txntable")
        .option("pushdown", "true")
        .load(t.path)
        .where("id >= 48 and id <= 52")
    )
    assert sorted(r.id for r in hit.collect()) == [48, 49, 51, 52]


def test_stream_initial_snapshot_merges_deletion_vectors(spark, tmp_path):
    """A stream STARTED on a dv-carrying table consumes the LIVE
    snapshot (tombstones merged out, Delta's initial-snapshot rule);
    a delete_dv commit in the consumed range of a RUNNING stream
    raises like any other non-append op."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), mode="overwrite")
    t.delete_dv(spark, "id = 2")
    sdf = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .load(t.path)
    )
    got: list = []
    _drain(
        sdf, str(tmp_path / "ck"),
        lambda b, _: got.extend((r.id, r.v) for r in b.collect()),
    )
    assert sorted(got) == [(1, "a"), (3, "c")]
    # a later delete_dv is a non-append commit: insert-only stream fails
    t.write(_df(spark, [(4, "d")]), mode="append")
    t.delete_dv(spark, "id = 4")
    with pytest.raises(Exception, match="insert-only stream"):
        _drain(sdf, str(tmp_path / "ck"), lambda b, _: None)


def test_batch_face_where_option_exact_and_reusable(spark, tmp_path):
    """The `where` LOAD OPTION: exact, relation-keyed skipping — the
    safe spelling for reusable DataFrames and pure SQL. Prunes
    directories at plan time, filters rows executor-side, and because
    options are part of Spark's relation identity it never trips the
    readInfo-cache hazard: repeated and composed actions on the same
    DataFrame stay consistent."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    rows = [(i, ["A", "B"][i % 2], f"r{i}") for i in range(400)]
    t.write_clustered(
        spark.createDataFrame(rows, "id long, seg string, v string"),
        "id", buckets=8, mode="overwrite",
    )
    df = (
        spark.read.format("txntable")
        .option("where", "id >= 380 AND seg = 'A'")
        .load(t.path)
    )
    # exact rows, and REUSE stays consistent (count, recount, compose)
    assert sorted(r.id for r in df.collect()) == list(range(380, 400, 2))
    assert df.count() == 10 and df.count() == 10
    assert [r.id for r in df.where("id = 390").collect()] == [390]
    # plan-time pruning: one range bucket of eight survives
    opts = {"path": t.path, "where": "id >= 380 AND seg = 'A'"}
    assert len(TxnTableBatchReader(df.schema, opts).partitions()) == 1
    # IN lists and string equality parse; pure SQL reaches the option
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW txn_where_v USING txntable "
        f"OPTIONS (path '{t.path}', where 'id IN (4, 9, 398)')"
    )
    assert sorted(
        r.id for r in spark.sql("SELECT id FROM txn_where_v").collect()
    ) == [4, 9, 398]
    # loud failures: grammar beyond the option's subset; unknown column
    with pytest.raises(Exception, match="unsupported txntable where"):
        spark.read.format("txntable").option("where", "id >= 380 OR 1=1") \
            .load(t.path).count()
    with pytest.raises(Exception, match="unknown column"):
        spark.read.format("txntable").option("where", "nope = 3") \
            .load(t.path).count()


def _drain_cdf(spark, t, ck, sink):
    sdf = (
        spark.readStream.format("txntable")
        .option("readchangefeed", "true")
        .load(t.path)
    )
    _drain(sdf, ck, sink)


def test_cdf_stream_appends_and_dv_deletes(spark, tmp_path):
    """The CHANGE FEED stream: the initial snapshot arrives as
    'insert' rows at the snapshot version; an append commit streams
    its rows as 'insert'; a delete_dv commit streams EXACTLY its
    victims as 'delete' — and sidecar coalescing between commits must
    not re-emit older deletes (new-set minus old-set is position
    arithmetic, not sidecar identity)."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t._DV_COALESCE_AT = 1  # force coalescing on the 2nd delete_dv
    t.write(_df(spark, [(i, f"r{i}") for i in range(10)]), mode="overwrite")
    ck = str(tmp_path / "ck")
    got: list = []
    _drain_cdf(
        spark, t, ck,
        lambda b, _: got.extend(
            (r.id, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert sorted(got) == [(i, "insert", 0) for i in range(10)]
    t.write(_df(spark, [(20, "u")]), mode="append")
    t.delete_dv(spark, "id IN (1, 3)")
    got2: list = []
    _drain_cdf(
        spark, t, ck,
        lambda b, _: got2.extend(
            (r.id, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert sorted(got2) == [
        (1, "delete", 2), (3, "delete", 2), (20, "insert", 1)
    ]
    # coalesced second delete: only ITS victims stream, never 1 or 3
    t.delete_dv(spark, "id IN (5, 20)")
    got3: list = []
    _drain_cdf(
        spark, t, ck,
        lambda b, _: got3.extend(
            (r.id, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert sorted(got3) == [(5, "delete", 3), (20, "delete", 3)]


def test_cdf_stream_silent_over_reorg_purge(spark, tmp_path):
    """A ``reorg`` (PURGE) commit is row-identical on the live view,
    so the change-feed stream must skip it silently — same contract
    as ``optimize`` — and keep streaming subsequent commits. A
    non-whitelisted op would kill the running stream loudly."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(i, f"r{i}") for i in range(10)]), mode="overwrite")
    ck = str(tmp_path / "ck")
    got: list = []
    _drain_cdf(
        spark, t, ck,
        lambda b, _: got.extend(
            (r.id, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert len(got) == 10  # initial snapshot
    t.delete_dv(spark, "id IN (2, 8)")
    assert t.reorg_purge(spark) is not None
    t.write(_df(spark, [(30, "z")]), mode="append")
    got2: list = []
    _drain_cdf(
        spark, t, ck,
        lambda b, _: got2.extend(
            (r.id, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert sorted(got2) == [
        (2, "delete", 1), (8, "delete", 1), (30, "insert", 3)
    ]


def test_cdf_stream_drop_partitions_and_cow_raises(spark, tmp_path):
    """drop_partitions streams the dropped directories' live rows as
    'delete' (a metadata delete is still a delete); a copy-on-write
    rewrite raises toward the batch change feed; optimize and
    constraint commits stream nothing."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    rows = [(i, ["A", "B"][i % 2], f"r{i}") for i in range(8)]
    t.write_partitioned(
        spark.createDataFrame(rows, "id long, seg string, v string"),
        ("seg",), mode="overwrite",
    )
    ck = str(tmp_path / "ck")
    _drain_cdf(spark, t, ck, lambda b, _: None)  # snapshot consumed
    t.add_constraint(spark, "id_ok", "id >= 0")  # policy: no rows
    t.drop_partitions([("seg", "=", "B")])
    got: list = []
    _drain_cdf(
        spark, t, ck,
        lambda b, _: got.extend(
            (r.id, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert sorted(got) == [(i, "delete", 2) for i in range(8) if i % 2 == 1]
    # COW delete: row-level diff needs the batch feed's join — loud
    t2 = TxnTable(str(tmp_path / "t2"))
    t2.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    ck2 = str(tmp_path / "ck2")
    _drain_cdf(spark, t2, ck2, lambda b, _: None)
    t2.delete(spark, "id = 1")
    with pytest.raises(Exception, match="batch change feed"):
        _drain_cdf(spark, t2, ck2, lambda b, _: None)


def test_plain_stream_survives_constraint_commits(spark, tmp_path):
    """A CHECK-constraint commit is table policy, not data: the file
    set is unchanged, so the insert-only stream must move past it
    instead of dying (the r8 behavior raised on ANY non-append op)."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    sdf = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .load(t.path)
    )
    ck = str(tmp_path / "ck")
    _drain(sdf, ck, lambda b, _: None)
    t.add_constraint(spark, "id_ok", "id >= 0")
    t.write(_df(spark, [(2, "b")]), mode="append")
    got: list = []
    _drain(sdf, ck, lambda b, _: got.extend((r.id, r.v) for r in b.collect()))
    assert sorted(got) == [(2, "b")]


def test_write_face_roundtrip_stats_and_interop(spark, tmp_path):
    """df.write.format('txntable'): executor tasks stage Arrow batches
    as parquet, the commit worker publishes them through the SAME
    rebase/link(2) protocol as the Python API — so DataSource writes,
    API writes, and the read faces interoperate on one log. statscols
    records manifest ranges from task-observed min/max (no driver
    footer walks), and the pruned read face skips over a write-face
    commit like any other."""
    register_txn_source(spark)
    p = str(tmp_path / "t")
    df = _df(spark, [(i, f"r{i}") for i in range(100)])
    df.filter("id < 50").write.format("txntable").option(
        "statscols", "id"
    ).mode("append").save(p)
    t = TxnTable(p, stats_cols=("id",))
    # API append interleaves with DataSource appends on the same log
    t.write(_df(spark, [(200, "api")]), mode="append")
    df.filter("id >= 50").write.format("txntable").option(
        "statscols", "id"
    ).mode("append").save(p)
    assert t.latest_version() == 2 and t.count() == 101
    # task-observed stats are exact — and the manifest prune uses them
    snap = t.snapshot()
    staged_ranges = sorted(
        tuple(s["id"][:2]) for s in snap["stats"].values() if "id" in s
    )
    assert staged_ranges == [(0, 49), (50, 99), (200, 200)]
    # r10: every entry also records its null count (zero here)
    assert all(s["id"][2] == 0 for s in snap["stats"].values() if "id" in s)
    kept, skipped = t.prune([("id", ">=", 60)])
    assert len(kept) == 2 and len(skipped) == 1
    # read faces see one consistent table
    assert spark.read.format("txntable").load(p).count() == 101
    # overwrite resets; empty append still commits a readable version
    _df(spark, [(1, "z")]).write.format("txntable").mode("overwrite").save(p)
    assert [r.id for r in t.read(spark).collect()] == [1]
    _df(spark, []).write.format("txntable").mode("append").save(p)
    assert t.count() == 1 and t.latest_version() == 4


# r15 slow tier: executor-distribution variant of constraint enforcement;
# the gate-every-write-path behavior stays always-on
# (test_check_constraints_gate_every_write_path + txn_constraints_enforced parity)
@pytest.mark.slow
def test_write_face_validates_constraints_on_executors(spark, tmp_path):
    """CHECK constraints in the where-option grammar validate ON the
    face's executor tasks (SQL semantics: only FALSE violates, NULL
    passes): valid batches commit, violating batches raise
    ConstraintViolation with NOTHING staged or leaked, a constraint
    outside the grammar refuses at writer construction naming the
    Python API as the fallback, and an append that IGNORES a table's
    partition spec is equally loud."""
    from ceneton_database_tools_spark.sinks.txnlog import (
        ConstraintViolation,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t.add_constraint(spark, "id_ok", "id >= 0")
    # a grammar-expressible constraint is validated, not refused
    _df(spark, [(2, "b")]).write.format("txntable").mode("append").save(
        t.path
    )
    assert t.count() == 2
    # violating batch: loud, atomic, leak-free
    v_before = t.latest_version()
    with pytest.raises(Exception, match="id_ok"):
        _df(spark, [(-3, "bad"), (4, "ok")]).write.format("txntable").mode(
            "append"
        ).save(t.path)
    assert t.latest_version() == v_before and t.count() == 2
    live = set(t.snapshot()["files"])
    on_disk = {f"data/{d}" for d in os.listdir(os.path.join(t.path, "data"))}
    assert on_disk == live, "refused staged dir leaked"
    assert os.listdir(os.path.join(t.path, "tmpstream")) == []
    # NULL passes CHECK (SQL semantics), exactly like the Python API
    _df(spark, [(None, "n")]).write.format("txntable").mode("append").save(
        t.path
    )
    assert t.count() == 3
    # IS NOT NULL and IN constraints validate too
    t2 = TxnTable(str(tmp_path / "t2"))
    t2.write(_df(spark, [(1, "a")]), mode="overwrite")
    t2.add_constraint(spark, "v_set", "v IN ('a', 'b')")
    t2.add_constraint(spark, "id_nn", "id IS NOT NULL")
    with pytest.raises(Exception, match="v_set"):
        _df(spark, [(2, "z")]).write.format("txntable").mode("append").save(
            t2.path
        )
    with pytest.raises(Exception, match="id_nn"):
        _df(spark, [(None, "a")]).write.format("txntable").mode(
            "append"
        ).save(t2.path)
    assert isinstance(ConstraintViolation("x"), ValueError)
    # a disjunctive constraint validates too (the grammar has OR)
    t2.add_constraint(spark, "either", "id >= 100 OR v = 'a'")
    _df(spark, [(1000, "b")]).write.format("txntable").mode("append").save(
        t2.path
    )
    with pytest.raises(Exception, match="either"):
        _df(spark, [(5, "b")]).write.format("txntable").mode("append").save(
            t2.path
        )
    # FUNCTION-BEARING constraint (beyond the kleene grammar):
    # validates executor-side through the embedded ANSI evaluator —
    # valid batches commit, violations raise, NULL still passes
    t2.add_constraint(spark, "weird", "length(v) < 10")
    # (501, NULL): v_set IN-check is NULL for NULL input (passes),
    # weird is NULL (passes) — SQL CHECK three-valued semantics on
    # the face, matching TxnTable._validate_constraints
    _df(spark, [(500, "a"), (501, None)]).write.format("txntable").mode(
        "append"
    ).save(t2.path)
    v2_before = t2.latest_version()
    with pytest.raises(Exception, match="weird"):
        _df(spark, [(600, "a" * 99)]).write.format("txntable").mode(
            "append"
        ).save(t2.path)
    assert t2.latest_version() == v2_before
    assert os.listdir(os.path.join(t2.path, "tmpstream")) == []
    # beyond BOTH paths (function the embedded evaluator lacks):
    # refused at writer construction, Python API named
    t2.add_constraint(spark, "hashed", "crc32(v) >= 0 OR v IS NULL")
    with pytest.raises(Exception, match="TxnTable.write"):
        _df(spark, [(999, "a")]).write.format("txntable").mode(
            "append"
        ).save(t2.path)
    t2.drop_constraint("hashed")
    t3 = TxnTable(str(tmp_path / "t3"))
    rows = [(i, ["A", "B"][i % 2], f"r{i}") for i in range(4)]
    pdf = spark.createDataFrame(rows, "id long, seg string, v string")
    t3.write_partitioned(pdf, ("seg",), mode="overwrite")
    with pytest.raises(Exception, match="partitioned"):
        pdf.write.format("txntable").mode("append").save(t3.path)
    with pytest.raises(Exception, match="must match"):
        pdf.write.format("txntable").option("partitionby", "v").mode(
            "append"
        ).save(t3.path)


def test_write_face_partitioned_roundtrip(spark, tmp_path):
    """df.write.format('txntable').option('partitionby', ...): the full
    write_partitioned layout from the pure Spark API — exact partition
    values (incl. NULL) in the manifest, per-leaf rows/stats, exact
    pruning, drop_partitions' metadata-only delete, spec-checked
    appends, and two-way interop with the Python API."""
    register_txn_source(spark)
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, ["A", "B", None][i % 3], f"r{i}") for i in range(12)],
        "id long, seg string, v string",
    )
    df.write.format("txntable").option("partitionby", "seg").option(
        "statscols", "id"
    ).mode("overwrite").save(p)
    t = TxnTable(p)
    snap = t.snapshot()
    assert t.partition_spec() == ("seg",)
    assert {tuple(v.items()) for v in snap["parts"].values()} == {
        (("seg", None),),
        (("seg", "A"),),
        (("seg", "B"),),
    }
    # per-leaf rows + stats: partition values as exact [v, v] ranges
    assert all(n == 4 for n in snap["rows"].values())
    assert all(
        s["seg"][:2] == [s["seg"][0]] * 2 and "id" in s
        for s in snap["stats"].values()
    )
    assert t.count() == 12
    # exact partition pruning straight from the manifest
    kept, skipped = t.prune([("seg", "=", "A")])
    assert (len(kept), len(skipped)) == (1, 2)
    # metadata-only partition drop (the two-sided proof holds)
    files_before = set(snap["files"])
    assert t.drop_partitions([("seg", "=", "B")]) is not None
    assert set(t.snapshot()["files"]) < files_before
    assert t.count() == 8
    assert sorted(r.id for r in t.read(spark).collect()) == sorted(
        i for i in range(12) if i % 3 != 1
    )
    # spec-matched append through the face; API append interops
    spark.createDataFrame(
        [(100, "A", "x")], "id long, seg string, v string"
    ).write.format("txntable").option("partitionby", "seg").mode(
        "append"
    ).save(p)
    t.write_partitioned(
        spark.createDataFrame(
            [(101, "B", "y")], "id long, seg string, v string"
        ),
        ("seg",),
        mode="append",
    )
    assert t.count() == 10
    # NULL partition drops via the explicit is_null conjunct
    assert t.drop_partitions([("seg", "is_null", None)]) is not None
    assert t.read(spark).where("seg IS NULL").count() == 0
    # tmpstream left empty: every task file was renamed into its leaf
    assert os.listdir(os.path.join(p, "tmpstream")) == []
    # empty partitioned write still commits a readable version
    spark.createDataFrame([], "id long, seg string, v string").write.format(
        "txntable"
    ).option("partitionby", "seg").mode("append").save(p)
    assert t.read(spark).count() == 6
    # ... whose zero-row leaf never blocks a later partition drop
    assert t.drop_partitions([("seg", "=", "A")]) is not None


def test_write_face_blooms_bit_compatible(spark, tmp_path):
    """.option('bloomcols', ...): executor-folded bitmaps land in the
    manifest and probe bit-for-bit like Python-API-built blooms — a
    point lookup skips face-written and API-written directories with
    one hash family."""
    register_txn_source(spark)
    p = str(tmp_path / "t")
    _df(spark, [(i, f"r{i}") for i in range(50)]).write.format(
        "txntable"
    ).option("bloomcols", "id").option("bloombits", "4096").option(
        "bloomk", "5"
    ).mode("overwrite").save(p)
    # API write with ITS bloom builder appends a second directory
    t = TxnTable(p, bloom_cols=("id",), bloom_bits=4096, bloom_k=5)
    t.write(_df(spark, [(i, f"r{i}") for i in range(100, 150)]), mode="append")
    snap = t.snapshot()
    assert all("id" in b for b in snap["blooms"].values())
    assert len(snap["blooms"]) == 2
    # an absent key prunes EVERY directory, whatever builder wrote it
    kept, skipped = t.prune([("id", "=", 77)])
    assert (len(kept), len(skipped)) == (0, 2)
    # present keys keep exactly their directory
    for probe, n_kept in ((3, 1), (120, 1)):
        kept, _ = t.prune([("id", "=", probe)])
        assert len(kept) == n_kept
        assert t.read(spark).where(f"id = {probe}").count() == 1
    # partitioned + blooms compose: per-leaf bitmaps
    p2 = str(tmp_path / "t2")
    spark.createDataFrame(
        [(i, ["A", "B"][i % 2]) for i in range(40)], "id long, seg string"
    ).write.format("txntable").option("partitionby", "seg").option(
        "bloomcols", "id"
    ).mode("overwrite").save(p2)
    t2 = TxnTable(p2)
    kept, skipped = t2.prune([("id", "=", 6)])  # even -> seg=A leaf only
    assert (len(kept), len(skipped)) == (1, 1)
    # misuse stays loud
    with pytest.raises(Exception, match="bloomcols"):
        _df(spark, [(1, "a")]).write.format("txntable").option(
            "bloomcols", "nope"
        ).mode("overwrite").save(str(tmp_path / "t3"))


def test_write_face_abort_cleans_staged_dir(spark, tmp_path):
    """A failed write job must leave NOTHING: abort removes the shared
    staged directory, the log stays at its prior version, and reads
    are untouched (writes are invisible until the manifest commit)."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    from pyspark.sql import functions as F

    doomed = _df(spark, [(i, "x") for i in range(10)]).withColumn(
        "v",
        F.when(F.col("id") == 7, F.raise_error("boom")).otherwise(
            F.col("v")
        ),
    )
    with pytest.raises(Exception):
        doomed.write.format("txntable").mode("append").save(t.path)
    assert t.latest_version() == 0 and t.count() == 1
    on_disk = {f"data/{d}" for d in os.listdir(os.path.join(t.path, "data"))}
    assert on_disk == set(t.snapshot()["files"]), "aborted staging leaked"


def test_stream_sink_face_exactly_once_and_stats(spark, tmp_path):
    """df.writeStream.format('txntable'): per micro-batch, tasks write
    temp files, the driver renames exactly that batch's files into a
    fresh directory and commits it under the (txnappid, batchId)
    watermark — so a FULL REPLAY from a fresh checkpoint (the
    checkpoint-loss failure mode: every batch re-delivered with the
    same ids) lands zero duplicate rows. statscols records manifest
    ranges; tmpstream is left empty by committed batches."""
    register_txn_source(spark)
    src = TxnTable(str(tmp_path / "src"))
    src.write(_df(spark, [(i, f"r{i}") for i in range(60)]), mode="overwrite")
    sdf = spark.readStream.format("txntable").load(src.path)
    sink = str(tmp_path / "sink")

    def _run(ck: str) -> None:
        q = (
            sdf.writeStream.format("txntable")
            .option("path", sink)
            .option("txnappid", "app1")
            .option("statscols", "id")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    _run("ck1")
    t = TxnTable(sink, stats_cols=("id",))
    assert t.count() == 60 and t.snapshot()["op"] == "append"
    assert t.snapshot()["txns"] == {"app1": 0}
    # stats from task messages are exact and prune
    kept, skipped = t.prune([("id", ">", 100)])
    assert kept == [] and len(skipped) == 1
    # replay from a FRESH checkpoint: same appid + batch ids -> no-op
    _run("ck2")
    assert t.count() == 60 and t.latest_version() == 0
    assert os.listdir(os.path.join(sink, "tmpstream")) == []
    # a DIFFERENT app id is a different writer: its batches land
    sdf2 = spark.readStream.format("txntable").load(src.path)
    q = (
        sdf2.writeStream.format("txntable")
        .option("path", sink)
        .option("txnappid", "app2")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    assert t.count() == 120 and t.snapshot()["txns"] == {
        "app1": 0, "app2": 0
    }


def test_stream_sink_vacuum_reclaims_orphaned_tmpstream(spark, tmp_path):
    """Temp files orphaned by crashed tasks (never renamed into a
    commit) are reclaimed by vacuum under the retention window;
    fresh ones survive (possibly in-flight)."""
    import time

    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    tmp = os.path.join(t.path, "tmpstream")
    os.makedirs(tmp)
    old = os.path.join(tmp, "part-dead.parquet")
    open(old, "wb").close()
    os.utime(old, (time.time() - 9000, time.time() - 9000))
    fresh = os.path.join(tmp, "part-live.parquet")
    open(fresh, "wb").close()
    removed = t.vacuum(retain_hours=1.0)
    assert "tmpstream/part-dead.parquet" in removed
    assert os.path.exists(fresh) and not os.path.exists(old)


def test_startingversion_replays_history(spark, tmp_path):
    """.option('startingversion', N): the first batch replays commits
    from N incrementally (Delta's startingVersion) instead of taking
    the current snapshot — in CDF mode that is the FULL historical
    changelog (v0's overwrite as inserts, the dv delete as deletes);
    in plain mode, starting past the snapshot picks up only the later
    appends."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.write(_df(spark, [(3, "c")]), mode="append")
    t.delete_dv(spark, "id = 1")
    # CDF replay from the beginning: every commit's row-level changes
    sdf = (
        spark.readStream.format("txntable")
        .option("readchangefeed", "true")
        .option("startingversion", "0")
        .load(t.path)
    )
    got: list = []
    _drain(
        sdf, str(tmp_path / "ck"),
        lambda b, _: got.extend(
            (r.id, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert sorted(got) == [
        (1, "delete", 2), (1, "insert", 0), (2, "insert", 0),
        (3, "insert", 1),
    ]
    # plain (insert-only) mode: the replay range includes the
    # delete_dv commit, which an insert-only stream must refuse
    sdf2 = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .option("startingversion", "1")
        .load(t.path)
    )
    with pytest.raises(Exception, match="insert-only stream"):
        _drain(sdf2, str(tmp_path / "ck2"), lambda b, _: None)
    # plain replay over an append-only history: starting past the
    # initial overwrite picks up only the later append
    t2 = TxnTable(str(tmp_path / "t2"))
    t2.write(_df(spark, [(1, "a")]), mode="overwrite")
    t2.write(_df(spark, [(2, "b")]), mode="append")
    sdf3 = (
        spark.readStream.format("txntable")
        .schema("id long, v string")
        .option("startingversion", "1")
        .load(t2.path)
    )
    got3: list = []
    _drain(
        sdf3, str(tmp_path / "ck3"),
        lambda b, _: got3.extend((r.id, r.v) for r in b.collect()),
    )
    assert got3 == [(2, "b")]


def test_cdf_stream_reads_commit_time_change_files(spark, tmp_path):
    """COW rewrites committed with cdc=True stage their row-level
    changes as cdf/ sidecars (Delta's _change_data) — the CDF stream
    reads them per-file: delete victims as 'delete', merge as
    update_preimage/update_postimage/insert. Without the sidecar a
    rewrite still raises toward the batch feed; vacuum keeps sidecars
    referenced by retained manifests and reclaims them with their
    truncated history."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(i, f"r{i}") for i in range(10)]), mode="overwrite")
    ck = str(tmp_path / "ck")
    _drain_cdf(spark, t, ck, lambda b, _: None)  # consume snapshot
    t.delete(spark, "id >= 8", cdc=True)
    t.merge(
        spark, _df(spark, [(0, "UPDATED"), (100, "new")]), "id", cdc=True
    )
    got: list = []
    _drain_cdf(
        spark, t, ck,
        lambda b, _: got.extend(
            (r.id, r.v, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert sorted(got) == [
        (0, "UPDATED", "update_postimage", 2),
        (0, "r0", "update_preimage", 2),
        (8, "r8", "delete", 1),
        (9, "r9", "delete", 1),
        (100, "new", "insert", 2),
    ]
    # a rewrite WITHOUT cdc still refuses, pointing at the fix
    t.delete(spark, "id = 1")
    with pytest.raises(Exception, match="cdc=True"):
        _drain_cdf(spark, t, ck, lambda b, _: None)
    # vacuum: the latest manifest's sidecar is live; the ones whose
    # manifests fall outside the retained window go with their history
    removed = t.vacuum(retain_versions=1, retain_hours=0.0)
    live_cdc = t.snapshot().get("cdc")
    assert live_cdc is None  # latest commit (the plain delete) has none
    assert any(r.startswith("cdf/") for r in removed)
    assert not os.path.isdir(os.path.join(t.path, "cdf")) or all(
        f"cdf/{d}" == live_cdc
        for d in os.listdir(os.path.join(t.path, "cdf"))
    )


# -- round-10 hardening -------------------------------------------------


def test_where_option_lexes_quoted_commas_and_and():
    """String literals containing ',' or ' AND ' are ONE token — the
    lexer recognizes quotes before any splitting, so the predicate is
    never silently rewritten."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        _parse_where_option,
    )

    assert _parse_where_option("c IN (',', 'x')") == (
        "in", ("c", (",", "x"))
    )
    assert _parse_where_option("c = 'a AND b'") == (
        "pred", ("c", "=", "a AND b")
    )
    assert _parse_where_option("c IN ('p AND q', 'r,s') AND d >= 3") == (
        "and",
        [("in", ("c", ("p AND q", "r,s"))), ("pred", ("d", ">=", 3))],
    )
    # escapes still work; OR binds looser than AND; parens group
    assert _parse_where_option("n = 'it''s'") == ("pred", ("n", "=", "it's"))
    assert _parse_where_option("a = 1 AND b = 2 OR c = 3") == (
        "or",
        [
            ("and", [("pred", ("a", "=", 1)), ("pred", ("b", "=", 2))]),
            ("pred", ("c", "=", 3)),
        ],
    )
    assert _parse_where_option("a = 1 AND (b = 2 OR c = 3)")[0] == "and"
    # failures stay loud
    for bad in ("c IN ()", "c IN (1", "a = 1 OR", "c = 'open", "", "(a=1"):
        with pytest.raises(ValueError):
            _parse_where_option(bad)


def test_write_face_publishes_only_messaged_task_files(spark, tmp_path):
    """Task retries / speculative duplicates: a write attempt whose
    commit message Spark does NOT accept leaves a temp file that is
    never renamed into the committed directory — the table holds
    exactly the messaged rows and the manifest count agrees."""
    import pyarrow as pa

    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableArrowWriter,
    )

    path = str(tmp_path / "t")
    schema = _df(spark, [(1, "a")]).schema
    w = TxnTableArrowWriter(schema, {"path": path}, overwrite=True)
    batch = lambda rows: pa.record_batch(
        {"id": pa.array([r[0] for r in rows], pa.int64()),
         "v": pa.array([r[1] for r in rows], pa.string())}
    )
    # attempt 1 writes its file, then "fails" — Spark discards its
    # message and runs a retry, whose message is the accepted one
    _zombie = w.write(iter([batch([(7, "zombie")])]))
    kept = w.write(iter([batch([(1, "a"), (2, "b")])]))
    w.commit([kept])
    t = TxnTable(path)
    got = sorted((r.id, r.v) for r in t.read(spark).collect())
    assert got == [(1, "a"), (2, "b")], got
    assert t.count() == 2  # manifest row count agrees with the data
    # the zombie file was never published; vacuum reclaims it
    orphans = os.listdir(os.path.join(path, "tmpstream"))
    assert len(orphans) == 1
    removed = t.vacuum(retain_versions=1, retain_hours=0)
    assert any(r.startswith("tmpstream/") for r in removed)


def test_stream_sink_warns_without_txnappid(tmp_path):
    """Cross-restart exactly-once needs a stable txnappid; running
    without one degrades to within-run dedup and says so loudly."""
    from pyspark.sql.types import LongType, StructField, StructType

    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableStreamSink,
    )

    schema = StructType([StructField("id", LongType())])
    with pytest.warns(UserWarning, match="txnappid"):
        TxnTableStreamSink(schema, {"path": str(tmp_path / "t")})
    # with the option set: no warning
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        TxnTableStreamSink(
            schema, {"path": str(tmp_path / "t"), "txnappid": "q1"}
        )


def test_batch_face_columns_projection(spark, tmp_path):
    """.option('columns', ...) trims the declared schema: the scan
    returns only (and exactly) the projected columns in option order,
    executors emit projected Arrow batches, and misuse stays loud."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id long, v string, x double"
        ),
        mode="overwrite",
    )
    df = (
        spark.read.format("txntable").option("columns", "v,id").load(t.path)
    )
    assert df.columns == ["v", "id"]
    assert sorted((r.v, r.id) for r in df.collect()) == [("a", 1), ("b", 2)]
    # emitted Arrow batches carry ONLY the projected columns
    reader = TxnTableBatchReader(df.schema, {"path": t.path, "columns": "v,id"})
    for part in reader.partitions():
        for batch in reader.read(part):
            assert batch.schema.names == ["v", "id"]
    # unknown / duplicate projections raise at load, not at scan
    with pytest.raises(Exception, match="columns option"):
        spark.read.format("txntable").option("columns", "nope").load(t.path)
    with pytest.raises(Exception, match="columns option"):
        spark.read.format("txntable").option("columns", "id,id").load(t.path)
    # a where-filter on a NON-projected column composes: the filter
    # column is read transiently and dropped before emit
    got_np = (
        spark.read.format("txntable")
        .option("columns", "v")
        .option("where", "id = 1")
        .load(t.path)
    )
    assert got_np.columns == ["v"]
    assert [tuple(r) for r in got_np.collect()] == [("a",)]
    # a where column that exists NOWHERE still raises at load
    with pytest.raises(Exception, match="unknown column"):
        (
            spark.read.format("txntable")
            .option("columns", "v")
            .option("where", "ghost = 1")
            .load(t.path)
            .collect()
        )
    # composed: projection + where option together
    got = (
        spark.read.format("txntable")
        .option("columns", "id,v")
        .option("where", "id = 2")
        .load(t.path)
        .collect()
    )
    assert [(r.id, r.v) for r in got] == [(2, "b")]


def test_stream_face_columns_projection(spark, tmp_path):
    """The streaming source shares the declared-schema contract, so
    the columns option projects there too."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    sdf = (
        spark.readStream.format("txntable")
        .option("columns", "v")
        .load(t.path)
    )
    got: list = []
    _drain(
        sdf,
        str(tmp_path / "ck"),
        lambda b, _: got.extend(tuple(r) for r in b.collect()),
    )
    assert sorted(got) == [("a",), ("b",)]


# r15 slow tier: rewrite-composite variant; commit-time change files and
# rewrite handling stay always-on (test_cdf_stream_reads_commit_time_change_files
# + the plain-txntable reorg stream test)
@pytest.mark.slow
def test_face_enabled_cdf_streams_across_rewrites(spark, tmp_path):
    """The pure-Spark-API CDC loop: a write-face commit with
    .option('enablechangedatafeed', 'true') sets the table property,
    later Python-API rewrites stage _change_data sidecars BY DEFAULT,
    and the readchangefeed STREAM represents the rewrite instead of
    raising toward the batch feed; an insert-only stream moves past
    the policy commit untouched."""
    register_txn_source(spark)
    p = str(tmp_path / "t")
    _df(spark, [(i, f"r{i}") for i in range(8)]).write.format(
        "txntable"
    ).option("enablechangedatafeed", "true").mode("overwrite").save(p)
    t = TxnTable(p)
    assert t.properties() == {"enableChangeDataFeed": True}
    t.set_properties({"owner": "pipeline"})  # v1: pure policy commit
    t.delete(spark, "id = 5")  # v2: COW rewrite, cdc staged by default
    t.merge(spark, _df(spark, [(0, "upd")]), key="id")  # v3
    got: list = []
    sdf = (
        spark.readStream.format("txntable")
        .option("readchangefeed", "true")
        .option("startingversion", "1")
        .load(p)
    )
    _drain(
        sdf,
        str(tmp_path / "ck"),
        lambda b, _: got.extend(
            (r.id, r.change_type, r.commit_version) for r in b.collect()
        ),
    )
    assert sorted(got) == [
        (0, "update_postimage", 3),
        (0, "update_preimage", 3),
        (5, "delete", 2),
    ]
    # the plain insert-only stream also moves past the policy commit
    got2: list = []
    sdf2 = spark.readStream.format("txntable").load(p)
    _drain(
        sdf2,
        str(tmp_path / "ck2"),
        lambda b, _: got2.extend((r.id,) for r in b.collect()),
    )
    # current snapshot: 8 written minus the deleted id=5
    assert sorted(r[0] for r in got2) == [0, 1, 2, 3, 4, 6, 7]


# r15 slow tier: partitioned variant; exactly-once sink semantics stay
# always-on (test_stream_sink_face_exactly_once_and_stats)
@pytest.mark.slow
def test_stream_sink_partitioned_exactly_once(spark, tmp_path):
    """df.writeStream.format('txntable').option('partitionby', ...):
    each micro-batch appends one leaf per exact partition tuple under
    the (txnappid, batchId) watermark — a full checkpoint-loss replay
    lands ZERO duplicates, and the partitioned layout keeps
    drop_partitions' metadata-only delete working on a stream-fed
    table. bloomcols folds per-leaf bitmaps along the way."""
    register_txn_source(spark)
    src = TxnTable(str(tmp_path / "src"))
    rows = [(i, ["A", "B"][i % 2]) for i in range(20)]
    src.write(
        spark.createDataFrame(rows, "id long, seg string"), mode="overwrite"
    )
    sdf = spark.readStream.format("txntable").load(src.path)
    sink = str(tmp_path / "sink")

    def _run(ck: str) -> None:
        q = (
            sdf.writeStream.format("txntable")
            .option("path", sink)
            .option("partitionby", "seg")
            .option("bloomcols", "id")
            .option("txnappid", "part-sink-q")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()

    _run(str(tmp_path / "ck1"))
    t = TxnTable(sink)
    assert t.partition_spec() == ("seg",)
    snap = t.snapshot()
    assert {v["seg"] for v in snap["parts"].values()} == {"A", "B"}
    assert t.count() == 20
    # per-leaf blooms landed; a point lookup keeps one leaf
    kept, skipped = t.prune([("id", "=", 6)])
    assert (len(kept), len(skipped)) == (1, 1)
    # checkpoint-loss replay: same batchIds re-delivered -> no dupes
    _run(str(tmp_path / "ck2"))
    assert t.count() == 20, "replayed micro-batch double-landed"
    # stream-fed partitioned table supports the metadata-only drop
    assert t.drop_partitions([("seg", "=", "B")]) is not None
    assert sorted(r.id for r in t.read(spark).collect()) == list(
        range(0, 20, 2)
    )
    # spec-matched continued ingest: a new source commit appends leaves
    src.write(
        spark.createDataFrame([(100, "A"), (101, "B")], "id long, seg string"),
        mode="append",
    )
    _run(str(tmp_path / "ck1"))
    assert t.count() == 12


def test_catalog_registration_and_file_uri_paths(spark, tmp_path):
    """register_txn_table: the SQL-catalog spelling (temp view / global
    temp view, every load option passing through), and file: URI paths
    normalize everywhere (catalog machinery hands locations through as
    URIs)."""
    from ceneton_database_tools_spark.catalog import register_txn_table

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b"), (3, "it's")]), mode="overwrite")
    register_txn_table(spark, "cat_t", t.path)
    assert sorted(
        (r.id, r.v) for r in spark.sql("SELECT * FROM cat_t").collect()
    ) == [(1, "a"), (2, "b"), (3, "it's")]
    # options pass through — incl. a quoted literal needing escaping
    register_txn_table(spark, "cat_w", t.path, where="v = 'it''s'")
    assert [r.id for r in spark.sql("SELECT * FROM cat_w").collect()] == [3]
    # global temp view reachable under global_temp
    register_txn_table(spark, "cat_g", t.path, global_view=True, columns="v")
    assert spark.sql("SELECT * FROM global_temp.cat_g").columns == ["v"]
    # file: URI paths work on both faces
    uri = "file://" + t.path
    assert spark.read.format("txntable").load(uri).count() == 3
    _df(spark, [(4, "d")]).write.format("txntable").mode("append").save(uri)
    assert t.count() == 4
    for name in ("cat_t", "cat_w"):
        spark.catalog.dropTempView(name)
    spark.catalog.dropGlobalTempView("cat_g")


def test_where_option_null_checks_and_not_equal(spark, tmp_path):
    """The extended where grammar end-to-end: !=/<>, IS NULL,
    IS NOT NULL — row-exact against data with NULLs, and pruning stays
    one-sided (an all-NULL-stats directory survives IS NULL but is
    skipped by IS NOT NULL)."""
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable as TT

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("v",))
    t.write(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b")], "id long, v string"
        ),
        mode="overwrite",
    )
    t.write(
        spark.createDataFrame([(4, None), (5, None)], "id long, v string"),
        mode="append",
    )

    def q(cond):
        return sorted(
            r.id
            for r in spark.read.format("txntable")
            .option("where", cond)
            .load(t.path)
            .collect()
        )

    assert q("v IS NULL") == [2, 4, 5]
    assert q("v IS NOT NULL") == [1, 3]
    assert q("v != 'a'") == [3]  # NULLs drop under SQL WHERE
    assert q("v <> 'a' AND id >= 3") == [3]
    # pruning: the all-NULL directory is provably irrelevant ONLY for
    # IS NOT NULL; IS NULL must keep everything (stats carry ranges,
    # not null presence)
    kept, skipped = (
        [
            rel
            for rel in t.snapshot()["files"]
            if TT._dir_may_match(
                t.snapshot()["stats"].get(rel), [("v", "IS NOT NULL", None)]
            )
        ],
        None,
    )
    assert len(kept) == 1
    assert all(
        TT._dir_may_match(
            t.snapshot()["stats"].get(rel), [("v", "IS NULL", None)]
        )
        for rel in t.snapshot()["files"]
    )


def test_stream_sink_validates_constraints(spark, tmp_path):
    """The STREAMING SINK validates grammar-expressible CHECKs on its
    tasks too: a violating micro-batch fails the query loudly and
    commits nothing."""
    register_txn_source(spark)
    src = TxnTable(str(tmp_path / "src"))
    src.write(_df(spark, [(1, "a"), (-2, "bad")]), mode="overwrite")
    sink = TxnTable(str(tmp_path / "sink"))
    sink.write(_df(spark, [(10, "seed")]), mode="overwrite")
    sink.add_constraint(spark, "id_pos", "id >= 0")
    sdf = spark.readStream.format("txntable").load(src.path)
    q = (
        sdf.writeStream.format("txntable")
        .option("path", sink.path)
        .option("txnappid", "chk-q")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="id_pos"):
        q.awaitTermination()
    q.stop()
    assert sink.latest_version() == 1 and sink.count() == 1


def test_stream_sink_validates_function_constraints(spark, tmp_path):
    """FUNCTION-BEARING CHECKs (beyond the kleene grammar) validate on
    the streaming sink's tasks through the embedded ANSI evaluator: a
    conforming micro-batch commits, a violating one fails the query
    and commits nothing."""
    register_txn_source(spark)
    src = TxnTable(str(tmp_path / "src"))
    src.write(_df(spark, [(1, "ok"), (2, None)]), mode="overwrite")
    sink = TxnTable(str(tmp_path / "sink"))
    sink.write(_df(spark, [(10, "seed")]), mode="overwrite")
    sink.add_constraint(spark, "short_v", "length(v) <= 4")
    sdf = spark.readStream.format("txntable").load(src.path)
    q = (
        sdf.writeStream.format("txntable")
        .option("path", sink.path)
        .option("txnappid", "fnchk-q")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sink.count() == 3  # NULL passes CHECK
    src.write(_df(spark, [(3, "waytoolong")]), mode="append")
    q2 = (
        sdf.writeStream.format("txntable")
        .option("path", sink.path)
        .option("txnappid", "fnchk-q")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="short_v"):
        q2.awaitTermination()
    q2.stop()
    assert sink.count() == 3


def test_where_option_lexes_surrounding_whitespace(spark, tmp_path):
    """A where option (or stored CHECK expression reaching the face)
    with leading/trailing whitespace lexes cleanly — only a non-
    whitespace unlexable remainder is loud."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    got = (
        spark.read.format("txntable")
        .option("where", "  id = 1  ")
        .load(t.path)
    )
    assert got.count() == 1
    t.add_constraint(spark, "pos", " id >= 0 ")  # stored with padding
    _df(spark, [(3, "c")]).write.format("txntable").mode("append").save(
        t.path
    )
    assert t.count() == 3
    with pytest.raises(Exception, match="cannot lex"):
        spark.read.format("txntable").option("where", "id = 1 ~").load(
            t.path
        ).count()


def test_register_txn_table_escapes_backticks(spark, tmp_path):
    """A view name containing a backtick cannot break out of the
    quoted identifier in register_txn_table's CREATE VIEW."""
    from ceneton_database_tools_spark.catalog import register_txn_table

    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    name = "odd`name"
    register_txn_table(spark, name, t.path)
    assert spark.sql(f"SELECT * FROM `odd``name`").count() == 1
    spark.catalog.dropTempView(name)


def test_ignoredeletes_skips_delete_only_commits(spark, tmp_path):
    """Delta's ignoreDeletes: a drop_partitions or dv-only delete in
    the consumed range is skipped (nothing was added, nothing to
    emit), while a COW rewrite still raises — it ADDS a directory and
    needs ignorechanges."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    rows = [(i, ["A", "B"][i % 2], f"r{i}") for i in range(6)]
    t.write_partitioned(
        spark.createDataFrame(rows, "id long, seg string, v string"),
        ("seg",),
        mode="overwrite",
    )
    sdf = (
        spark.readStream.format("txntable")
        .option("ignoredeletes", "true")
        .load(t.path)
    )
    ck = str(tmp_path / "ck")
    _drain(sdf, ck, lambda b, _: None)  # consume the snapshot
    t.drop_partitions([("seg", "=", "A")])  # delete-only commit
    t.delete_dv(spark, "id = 1")  # dv-only commit
    t.write_partitioned(
        spark.createDataFrame(
            [(100, "B", "new")], "id long, seg string, v string"
        ),
        ("seg",),
        mode="append",
    )
    got: list = []
    _drain(sdf, ck, lambda b, _: got.extend((r.id,) for r in b.collect()))
    assert got == [(100,)], "delete-only commits leaked or blocked rows"
    # a COW rewrite is NOT covered by ignoredeletes
    t.delete(spark, "id = 3")
    with pytest.raises(Exception, match="insert-only stream"):
        _drain(sdf, ck, lambda b, _: None)


def test_where_option_or_and_parens_end_to_end(spark, tmp_path):
    """OR / parentheses in the where option: exact rows, and the
    may-match prune proof composes (OR keeps a directory if ANY arm
    may match; AND prunes when either arm is disproven)."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write(_df(spark, [(i, f"r{i}") for i in range(0, 10)]), mode="overwrite")
    t.write(_df(spark, [(i, f"r{i}") for i in range(100, 110)]), mode="append")

    def q(cond):
        return sorted(
            r.id
            for r in spark.read.format("txntable")
            .option("where", cond)
            .load(t.path)
            .collect()
        )

    assert q("id < 2 OR id >= 108") == [0, 1, 108, 109]
    assert q("(id < 2 OR id >= 108) AND v != 'r0'") == [1, 108, 109]
    assert q("id IN (1, 105) OR v = 'r3'") == [1, 3, 105]
    # prune proof: an OR spanning both dirs keeps both; an impossible
    # AND arm prunes everything
    df = spark.read.format("txntable").load(t.path)
    n_full = len(
        TxnTableBatchReader(df.schema, {"path": t.path}).partitions()
    )
    n_both = len(
        TxnTableBatchReader(
            df.schema, {"path": t.path, "where": "id < 2 OR id >= 108"}
        ).partitions()
    )
    n_low = len(
        TxnTableBatchReader(
            df.schema, {"path": t.path, "where": "id < 2 AND v = 'r0'"}
        ).partitions()
    )
    n_none = len(
        TxnTableBatchReader(
            df.schema, {"path": t.path, "where": "id < 2 AND id >= 108"}
        ).partitions()
    )
    assert n_both == n_full  # OR spanning both dirs keeps both
    assert 0 < n_low < n_full  # one arm disproven -> one dir pruned
    assert n_none == 0  # contradictory AND prunes everything


def test_cross_column_compare_in_where_and_checks(spark, tmp_path):
    """Column-vs-column comparisons: `lo <= hi`-shaped predicates work
    in the where option (exact rows, range-vs-range prune proof) and
    as face-validated CHECK constraints."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("a", "b"))
    t.write(
        spark.createDataFrame(
            [(1, 1, 10), (2, 5, 3), (3, 2, 2), (4, None, 7)],
            "id long, a long, b long",
        ),
        mode="overwrite",
    )
    got = sorted(
        r.id
        for r in spark.read.format("txntable")
        .option("where", "a < b")
        .load(t.path)
        .collect()
    )
    assert got == [1]  # NULL comparison drops row 4; 5<3 and 2<2 false
    assert sorted(
        r.id
        for r in spark.read.format("txntable")
        .option("where", "a <= b OR id = 2")
        .load(t.path)
        .collect()
    ) == [1, 2, 3]
    # prune proof: a commit whose a-range sits entirely above its
    # b-range is provably empty under a < b
    t2 = TxnTable(str(tmp_path / "t2"), stats_cols=("a", "b"))
    t2.write(
        spark.createDataFrame([(1, 100, 5), (2, 200, 9)], "id long, a long, b long"),
        mode="overwrite",
    )
    df2 = spark.read.format("txntable").load(t2.path)
    n = len(
        TxnTableBatchReader(
            df2.schema, {"path": t2.path, "where": "a < b"}
        ).partitions()
    )
    assert n == 0
    # cross-column CHECK validates on the write face
    t3 = TxnTable(str(tmp_path / "t3"))
    t3.write(
        spark.createDataFrame([(1, 2)], "lo long, hi long"), mode="overwrite"
    )
    t3.add_constraint(spark, "ordered", "lo <= hi")
    spark.createDataFrame([(3, 9)], "lo long, hi long").write.format(
        "txntable"
    ).mode("append").save(t3.path)
    assert t3.count() == 2
    with pytest.raises(Exception, match="ordered"):
        spark.createDataFrame([(9, 3)], "lo long, hi long").write.format(
            "txntable"
        ).mode("append").save(t3.path)
    assert t3.count() == 2


def test_stream_face_where_option_filters_and_prunes(spark, tmp_path):
    """The where option works on the STREAM face: rows filter exactly
    on executors, pure-append commits whose directory stats disprove
    the predicate plan ZERO tasks, and an unknown filter column raises
    at load."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableStreamReader,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write(_df(spark, [(i, f"r{i}") for i in range(10)]), mode="overwrite")
    sdf = (
        spark.readStream.format("txntable")
        .option("where", "id >= 100 OR v = 'r3'")
        .load(t.path)
    )
    ck = str(tmp_path / "ck")
    got: list = []
    _drain(sdf, ck, lambda b, _: got.extend((r.id,) for r in b.collect()))
    assert sorted(got) == [(3,)]
    # two more commits: one provably below the predicate, one matching
    t.write(_df(spark, [(50, "x"), (60, "y")]), mode="append")   # disproven
    t.write(_df(spark, [(100, "hit"), (101, "hit2")]), mode="append")
    got2: list = []
    _drain(sdf, ck, lambda b, _: got2.extend((r.id,) for r in b.collect()))
    assert sorted(got2) == [(100,), (101,)]
    # planner-level proof: the disproven commit plans zero partitions
    reader = TxnTableStreamReader(
        spark.read.format("txntable").load(t.path).schema,
        {"path": t.path, "where": "id >= 100"},
    )
    parts = reader.partitions({"version": 0}, {"version": 2})
    assert len(parts) > 0
    lows = reader.partitions({"version": 0}, {"version": 1})
    assert lows == []  # v1's stats range [50, 60] disproves id >= 100
    with pytest.raises(Exception, match="outside"):
        TxnTableStreamReader(
            spark.read.format("txntable").load(t.path).schema,
            {"path": t.path, "where": "ghost = 1"},
        )


def test_cdf_stream_composes_with_columns_projection(spark, tmp_path):
    """columns + readchangefeed: the projection applies to the DATA
    columns and the change-meta pair rides after it."""
    register_txn_source(spark)
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.delete_dv(spark, "id = 1")
    sdf = (
        spark.readStream.format("txntable")
        .option("readchangefeed", "true")
        .option("columns", "id")
        .option("startingversion", "0")
        .load(t.path)
    )
    assert sdf.columns == ["id", "change_type", "commit_version"]
    got: list = []
    _drain(
        sdf,
        str(tmp_path / "ck"),
        lambda b, _: got.extend(tuple(r) for r in b.collect()),
    )
    assert sorted(got) == [
        (1, "delete", 1),
        (1, "insert", 0),
        (2, "insert", 0),
    ]


def test_vacuum_and_optimize_on_face_partitioned_layout(spark, tmp_path):
    """Maintenance ops compose with FACE-written partitioned layouts:
    drop_partitions + vacuum reclaims the dead leaf while its live
    sibling (same staged root) survives; optimize preserves the spec
    and repairs per-tuple layout."""
    register_txn_source(spark)
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, ["A", "B"][i % 2]) for i in range(10)], "id long, seg string"
    ).write.format("txntable").option("partitionby", "seg").mode(
        "overwrite"
    ).save(p)
    t = TxnTable(p)
    dead = [d for d in t.snapshot()["files"] if "seg=B" in d]
    assert len(dead) == 1
    t.drop_partitions([("seg", "=", "B")])
    t.truncate_log(retain_versions=1)
    removed = t.vacuum(retain_versions=1, retain_hours=0)
    assert any(r.startswith(dead[0]) or r == dead[0] for r in removed), removed
    live = [d for d in t.snapshot()["files"] if "seg=A" in d]
    assert live and all(
        os.path.isdir(os.path.join(p, d)) for d in live
    ), "live sibling leaf was reclaimed"
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 2, 4, 6, 8]
    # a second face append fragments seg=A; optimize re-compacts per
    # tuple and keeps the spec + exact values
    spark.createDataFrame(
        [(100, "A")], "id long, seg string"
    ).write.format("txntable").option("partitionby", "seg").mode(
        "append"
    ).save(p)
    v = t.optimize(spark)
    assert v is not None
    assert t.partition_spec() == ("seg",)
    snap = t.snapshot()
    assert all(v2 == {"seg": "A"} for v2 in snap["parts"].values())
    assert t.count() == 6
    assert t.drop_partitions([("seg", "=", "A")]) is not None  # proof held


def test_write_faces_record_bytes_task_side(spark, tmp_path, monkeypatch):
    """VERDICT r13 #1, face half: executor tasks stat their own temp
    files (nbytes in the commit message), so a DataSource-face commit
    records exact per-directory byte sizes with ZERO driver-side
    filesystem sizing — pinned by making the driver's walk fallback
    raise for the whole test. Covers the batch face (unpartitioned +
    empty append + partitioned) and the streaming sink face."""
    import os as _os

    register_txn_source(spark)

    # the stream's source table is Python-API-written (that path sizes
    # its own staged dir, legitimately) — stage it before the tripwire
    src = TxnTable(str(tmp_path / "src"))
    src.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")

    def _boom(self, rel):
        raise AssertionError(f"driver sized {rel} on a face commit")

    monkeypatch.setattr(TxnTable, "_dir_bytes", _boom)

    def _walk_bytes(root):
        total = 0
        for r, _, names in _os.walk(root):
            total += sum(_os.path.getsize(_os.path.join(r, n)) for n in names)
        return total

    # batch face, unpartitioned + an empty append (driver-staged leaf)
    p = str(tmp_path / "t")
    _df(spark, [(i, f"r{i}") for i in range(100)]).write.format(
        "txntable"
    ).mode("append").save(p)
    _df(spark, []).write.format("txntable").mode("append").save(p)
    t = TxnTable(p)
    snap = t.snapshot()
    assert set(snap["bytes"]) == set(snap["files"]) and len(snap["files"]) == 2
    for rel in snap["files"]:
        assert snap["bytes"][rel] == _walk_bytes(_os.path.join(p, rel))

    # batch face, partitioned: one recorded size per leaf
    pp = str(tmp_path / "tp")
    _df(spark, [(i, f"s{i % 3}") for i in range(60)]).write.format(
        "txntable"
    ).option("partitionby", "v").mode("append").save(pp)
    tp = TxnTable(pp)
    snap_p = tp.snapshot()
    assert len(snap_p["files"]) == 3
    assert set(snap_p["bytes"]) == set(snap_p["files"])
    for rel in snap_p["files"]:
        assert snap_p["bytes"][rel] == _walk_bytes(_os.path.join(pp, rel))

    # streaming sink face: per-micro-batch commits record their sizes
    sink = str(tmp_path / "sink")
    q = (
        spark.readStream.format("txntable")
        .load(src.path)
        .writeStream.format("txntable")
        .option("path", sink)
        .option("txnappid", "bytes-face-test")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    ts = TxnTable(sink)
    snap_s = ts.snapshot()
    assert snap_s["files"], "sink face committed nothing"
    assert set(snap_s["bytes"]) == set(snap_s["files"])
    for rel in snap_s["files"]:
        assert snap_s["bytes"][rel] == _walk_bytes(_os.path.join(sink, rel))
