"""Transactional-table log (sinks/txnlog.py): the ACID properties the
manifest protocol claims, exercised directly.

The gated query surface (txn_merge_upsert_customers) proves the merge
RESULT against the DuckDB oracle; these tests prove the PROTOCOL —
atomic version claims under a race, rebase-on-conflict appends,
MVCC snapshot isolation, crash debris tolerance, and vacuum GC —
which no row-level oracle can see."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ceneton_database_tools_spark.sinks.txnlog import (
    CommitConflict,
    SchemaMismatch,
    TxnTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_versioning_append_overwrite_read(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    assert t.latest_version() is None
    v0 = t.write(_df(spark, [(1, "a")]), mode="overwrite")
    v1 = t.write(_df(spark, [(2, "b")]), mode="append")
    assert (v0, v1) == (0, 1)
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    # overwrite replaces the whole snapshot
    v2 = t.write(_df(spark, [(9, "z")]), mode="overwrite")
    assert v2 == 2
    assert [r.id for r in t.read(spark).collect()] == [9]
    # ... but every historical version still reads (time travel)
    assert [r.id for r in t.read(spark, 0).collect()] == [1]
    assert sorted(r.id for r in t.read(spark, 1).collect()) == [1, 2]


def test_mvcc_snapshot_isolation(spark, tmp_path):
    """A DataFrame resolved before a later commit keeps reading the old
    snapshot: manifests are resolved at read() time, files are
    immutable."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    reader = t.read(spark)  # resolves v0's file list NOW
    t.write(_df(spark, [(2, "b")]), mode="append")
    assert [r.id for r in reader.collect()] == [1]  # still v0
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]


def test_commit_race_rebases_append(spark, tmp_path):
    """Losing a version race must REBASE, not drop data: steal the next
    version out from under an append and check both writers' rows land."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")

    real_try_commit = t._try_commit
    stolen = {"done": False}

    def stealing_try_commit(version, manifest):
        if not stolen["done"]:
            stolen["done"] = True
            # a concurrent writer claims this version first
            other = TxnTable(t.path)
            staged = other.write(_df(spark, [(2, "race")]), mode="append")
            assert staged == version
        return real_try_commit(version, manifest)

    t._try_commit = stealing_try_commit
    t.write(_df(spark, [(3, "c")]), mode="append")
    ids = sorted(r.id for r in t.read(spark).collect())
    assert ids == [1, 2, 3], "rebased append must keep the racing writer's rows"
    assert t.latest_version() == 2


def test_commit_conflict_raises_after_retries(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t._try_commit = lambda version, manifest: False  # always loses
    with pytest.raises(CommitConflict):
        t.write(_df(spark, [(2, "b")]), mode="append", max_retries=3)


def test_crash_debris_is_invisible(spark, tmp_path):
    """Partial tmp manifests and orphaned data dirs (a writer died
    mid-stage) must not corrupt reads or version resolution."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    # torn tmp manifest in the log dir
    with open(os.path.join(t.log_dir, "_tmp_dead.json"), "w") as f:
        f.write('{"version": 99, "files": [')
    # orphaned (never-committed) staged data
    os.makedirs(os.path.join(t.data_dir, "deadbeef"))
    assert t.latest_version() == 0
    assert [r.id for r in t.read(spark).collect()] == [1]
    # vacuum clears the orphan too (it is referenced by no manifest) —
    # retain_hours=0 because the debris is brand-new in this test
    assert "data/deadbeef" in t.vacuum(retain_hours=0.0)


def test_merge_upserts_and_preserves(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "old"), (2, "keep")]), mode="overwrite")
    v = t.merge(spark, _df(spark, [(1, "new"), (3, "ins")]), key="id")
    assert v == 1
    got = {r.id: r.v for r in t.read(spark).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}
    # pre-merge snapshot intact
    assert {r.id: r.v for r in t.read(spark, 0).collect()} == {1: "old", 2: "keep"}


def test_vacuum_bounds_history(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    for i in range(4):
        t.write(_df(spark, [(i, "x")]), mode="overwrite")
    removed = t.vacuum(retain_versions=2, retain_hours=0.0)
    assert removed, "older overwrite snapshots should be GC'd"
    # retained versions still read; dropped manifest is gone
    assert [r.id for r in t.read(spark, 3).collect()] == [3]
    assert [r.id for r in t.read(spark, 2).collect()] == [2]
    with pytest.raises(FileNotFoundError):
        t.snapshot(0)
    # manifest files on disk match the retention contract
    kept = sorted(f for f in os.listdir(t.log_dir) if f.endswith(".json"))
    assert [int(f[:-5]) for f in kept] == [2, 3]


def test_manifest_content_shape(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    m = json.load(open(t._manifest_path(0)))
    assert m["version"] == 0 and m["op"] == "overwrite" and len(m["files"]) == 1
    assert m["files"][0].startswith("data/")


def test_write_idempotent_skips_replayed_batch(spark, tmp_path):
    """The exactly-once contract: a (app_id, txn_version) pair commits
    once; replays are no-ops, and the watermark survives unrelated
    commits in between."""
    t = TxnTable(str(tmp_path / "t"))
    assert t.write_idempotent(_df(spark, [(1, "a")]), "app", 0) == 0
    assert t.write_idempotent(_df(spark, [(2, "b")]), "app", 1) == 1
    # replayed batches (checkpoint loss re-delivers 0 and 1): no-ops
    assert t.write_idempotent(_df(spark, [(1, "dup")]), "app", 0) is None
    assert t.write_idempotent(_df(spark, [(2, "dup")]), "app", 1) is None
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    # an unrelated append must not erase the watermark
    t.write(_df(spark, [(9, "x")]), mode="append")
    assert t.write_idempotent(_df(spark, [(1, "dup")]), "app", 1) is None
    # ... while a SECOND writer's version counter is independent
    assert t.write_idempotent(_df(spark, [(3, "c")]), "other", 0) is not None
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3, 9]


def test_write_idempotent_race_detected_at_commit(spark, tmp_path):
    """Two writers replaying the SAME batch race the commit: the loser
    must detect the winner's watermark during rebase and back off."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    real_try_commit = t._try_commit
    stolen = {"done": False}

    def stealing(version, manifest):
        if not stolen["done"]:
            stolen["done"] = True
            other = TxnTable(t.path)
            assert other.write_idempotent(_df(spark, [(2, "b")]), "app", 0) == version
        return real_try_commit(version, manifest)

    t._try_commit = stealing
    assert t.write_idempotent(_df(spark, [(2, "b-dup")]), "app", 0) is None
    vals = sorted(r.v for r in t.read(spark).collect())
    assert vals == ["a", "b"], "the losing duplicate batch must not land"


def test_merge_on_empty_table_inserts(spark, tmp_path):
    """Round-7 review: merge() on a never-written table used to crash
    in snapshot(None) before its own current-is-None arms could run.
    MERGE on an empty target degenerates to insert-only."""
    t = TxnTable(str(tmp_path / "t"))
    assert t.merge(spark, _df(spark, [(1, "a"), (2, "b")]), key="id") == 0
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    # and a second merge updates in place as usual
    t.merge(spark, _df(spark, [(2, "B"), (3, "c")]), key="id")
    assert {(r.id, r.v) for r in t.read(spark).collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
    }


def _data_dirs(t: TxnTable) -> set:
    return {d for d in os.listdir(t.data_dir)}


def _referenced(t: TxnTable) -> set:
    refs = set()
    v = t.latest_version()
    for ver in range(v + 1):
        refs.update(f.split("/", 1)[1] for f in t.snapshot(ver)["files"])
    return refs


def test_losing_writers_leave_no_orphaned_staged_data(spark, tmp_path):
    """Round-7 review: a writer that loses (duplicate replay, lost
    merge race) used to orphan its staged parquet directory forever —
    unreferenced by any manifest, invisible to vacuum. Every losing
    exit now discards its staging."""
    t = TxnTable(str(tmp_path / "t"))
    t.write_idempotent(_df(spark, [(1, "a")]), "app", 0)
    # pre-check dup: staged nothing, nothing to leak
    assert t.write_idempotent(_df(spark, [(1, "dup")]), "app", 0) is None
    assert _data_dirs(t) == _referenced(t)
    # commit-race dup: the loser stages, then must clean up
    real_try_commit = t._try_commit
    stolen = {"done": False}

    def stealing(version, manifest):
        if not stolen["done"]:
            stolen["done"] = True
            TxnTable(t.path).write_idempotent(_df(spark, [(2, "b")]), "app", 1)
        return real_try_commit(version, manifest)

    t._try_commit = stealing
    assert t.write_idempotent(_df(spark, [(2, "b-dup")]), "app", 1) is None
    t._try_commit = real_try_commit
    assert _data_dirs(t) == _referenced(t)
    # lost merge race: the stale rewrite is discarded, the rebased one lands
    stolen["done"] = False

    def stealing_merge(version, manifest):
        if not stolen["done"]:
            stolen["done"] = True
            TxnTable(t.path).write(_df(spark, [(9, "x")]), mode="append")
        return real_try_commit(version, manifest)

    t._try_commit = stealing_merge
    t.merge(spark, _df(spark, [(1, "A")]), key="id")
    t._try_commit = real_try_commit
    assert _data_dirs(t) == _referenced(t)
    assert {(r.id, r.v) for r in t.read(spark).collect()} == {
        (1, "A"),
        (2, "b"),
        (9, "x"),
    }


def test_delete_copy_on_write_keeps_untouched_dirs(spark, tmp_path):
    """delete() rewrites ONLY directories containing victims; a dir
    with zero matches survives by reference, byte-untouched."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (3, "c")]), mode="overwrite")   # odd dir
    t.write(_df(spark, [(2, "b"), (4, "d")]), mode="append")      # even dir
    v = t.delete(spark, "id % 2 = 0 AND id >= 4")
    assert v == 2
    # the odd-key dir from v0 is still referenced verbatim
    assert set(t.snapshot(0)["files"]) <= set(t.snapshot(2)["files"])
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]
    # time travel: pre-delete snapshot intact
    assert sorted(r.id for r in t.read(spark, 1).collect()) == [1, 2, 3, 4]
    # no-match delete is a no-op with no commit
    assert t.delete(spark, "id > 100") is None
    assert t.latest_version() == 2
    # delete on an empty table is a no-op too
    t2 = TxnTable(str(tmp_path / "t2"))
    assert t2.delete(spark, "id = 1") is None
    # NULL-predicate rows are NOT deleted (SQL DELETE semantics)
    t3 = TxnTable(str(tmp_path / "t3"))
    t3.write(
        spark.createDataFrame([(1, None), (2, 5)], "id long, n long"),
        mode="overwrite",
    )
    t3.delete(spark, "n > 3")
    assert sorted(r.id for r in t3.read(spark).collect()) == [1]


def test_merge_copy_on_write_keeps_untouched_dirs(spark, tmp_path):
    """Round-8 (VERDICT r7 #1): merge() rewrites ONLY the directories
    that contain a matched key; unmatched directories survive into the
    new manifest by reference, and an insert-only merge rewrites
    nothing at all (pure append shape)."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (3, "c")]), mode="overwrite")   # odd dir
    t.write(_df(spark, [(2, "b"), (4, "d")]), mode="append")      # even dir
    # merge touching only even keys: the odd dir must survive verbatim
    v = t.merge(spark, _df(spark, [(2, "B"), (6, "f")]), key="id")
    assert v == 2
    assert set(t.snapshot(0)["files"]) <= set(t.snapshot(2)["files"])
    even_dir = set(t.snapshot(1)["files"]) - set(t.snapshot(0)["files"])
    assert even_dir and even_dir.isdisjoint(set(t.snapshot(2)["files"]))
    assert {(r.id, r.v) for r in t.read(spark).collect()} == {
        (1, "a"), (2, "B"), (3, "c"), (4, "d"), (6, "f"),
    }
    # insert-only merge: EVERY prior dir survives; exactly one dir added
    v = t.merge(spark, _df(spark, [(9, "z")]), key="id")
    assert set(t.snapshot(2)["files"]) <= set(t.snapshot(3)["files"])
    assert len(t.snapshot(3)["files"]) == len(t.snapshot(2)["files"]) + 1
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3, 4, 6, 9]


def test_vacuum_spares_inflight_staging(spark, tmp_path):
    """Round-8 (ADVICE): a writer stages parquet BEFORE winning its
    commit — vacuum's retention window must not GC the staged-but-
    uncommitted directory, or the just-published manifest references
    deleted files. Simulates the stage → vacuum → commit interleaving."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    # a concurrent writer has staged but not yet committed
    staged = "data/feedface"
    _df(spark, [(2, "b")]).write.parquet(os.path.join(t.path, staged))
    # maintenance vacuum runs in the stage→commit window (default window)
    removed = t.vacuum()
    assert staged not in removed, "in-flight staging must survive vacuum"
    # the writer now publishes its manifest referencing the staged dir
    assert t._try_commit(
        1, {"version": 1, "op": "append",
            "files": t.snapshot(0)["files"] + [staged], "txns": {}}
    )
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]


def test_vacuum_and_truncate_validate_retention(spark, tmp_path):
    """Round-8 (ADVICE): retain_versions < 1 used to silently delete
    the whole table; now it raises."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    with pytest.raises(ValueError):
        t.vacuum(retain_versions=0)
    with pytest.raises(ValueError):
        t.truncate_log(retain_versions=-1)
    assert t.latest_version() == 0  # nothing was deleted


def test_truncate_log_bounds_manifests_keeps_data(spark, tmp_path):
    """truncate_log is the streaming sink's checkpoint compaction:
    manifests below the keep range go, data directories stay, and the
    newest snapshots still read."""
    t = TxnTable(str(tmp_path / "t"))
    for i in range(5):
        t.write(_df(spark, [(i, "x")]), mode="append")
    n_dirs = len(os.listdir(t.data_dir))
    assert t.truncate_log(retain_versions=2) == [0, 1, 2]
    assert len(os.listdir(t.data_dir)) == n_dirs, "data is never touched"
    assert t.latest_version() == 4
    assert sorted(r.id for r in t.read(spark, 4).collect()) == [0, 1, 2, 3, 4]
    assert sorted(r.id for r in t.read(spark, 3).collect()) == [0, 1, 2, 3]
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)


def test_latest_version_hint_fast_path(spark, tmp_path):
    """latest_version resolves through _latest.hint + forward probing;
    a stale, corrupt, or missing hint falls back to the listdir scan."""
    t = TxnTable(str(tmp_path / "t"))
    for i in range(3):
        t.write(_df(spark, [(i, "x")]), mode="append")
    hint = os.path.join(t.log_dir, "_latest.hint")
    assert int(open(hint).read()) == 2
    # stale-low hint: forward probe still finds the true latest
    with open(hint, "w") as f:
        f.write("0")
    assert t.latest_version() == 2
    # corrupt hint: fallback
    with open(hint, "w") as f:
        f.write("garbage")
    assert t.latest_version() == 2
    # missing hint: fallback
    os.unlink(hint)
    assert t.latest_version() == 2
    # hint pointing at a truncated-away manifest: fallback
    t.truncate_log(retain_versions=1)
    with open(hint, "w") as f:
        f.write("0")
    assert t.latest_version() == 2


def test_manifest_stats_recorded_and_carried(spark, tmp_path):
    """stats_cols tables record per-directory [min, max] at every
    commit; surviving directories carry their stats forward verbatim
    and rewritten directories are re-measured."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id", "v"))
    t.write(_df(spark, [(1, "a"), (5, "e")]), mode="overwrite")
    t.write(_df(spark, [(10, "j"), (19, "s")]), mode="append")
    m = t.snapshot(1)
    d0, d1 = m["files"]
    assert m["stats"][d0]["id"] == [1, 5, 0] and m["stats"][d0]["v"] == ["a", "e", 0]
    assert m["stats"][d1]["id"] == [10, 19, 0]
    # delete rewrites only dir1; dir0's stats carry forward, the
    # survivor directory is measured fresh
    t.delete(spark, "id = 19")
    m2 = t.snapshot(2)
    assert m2["stats"][d0]["id"] == [1, 5, 0]
    new_dir = next(f for f in m2["files"] if f not in (d0, d1))
    assert m2["stats"][new_dir]["id"] == [10, 10, 0]
    # a stats-less table writes no stats key at all
    t2 = TxnTable(str(tmp_path / "t2"))
    t2.write(_df(spark, [(1, "a")]), mode="overwrite")
    assert "stats" not in t2.snapshot(0)


def test_read_pruned_skips_disjoint_dirs(spark, tmp_path):
    """Manifest-level data skipping: directories whose [min, max]
    cannot satisfy the predicate are dropped BEFORE the scan is
    planned; kept ⊇ matching always holds."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id", "v"))
    t.write(_df(spark, [(0, "a"), (9, "b")]), mode="overwrite")
    t.write(_df(spark, [(10, "c"), (19, "d")]), mode="append")
    t.write(_df(spark, [(20, "e"), (29, "f")]), mode="append")
    kept, skipped = t.prune([("id", ">=", 20)])
    assert len(kept) == 1 and len(skipped) == 2
    kept, skipped = t.prune([("id", "=", 12)])
    assert len(kept) == 1 and len(skipped) == 2
    kept, skipped = t.prune([("id", ">", 9), ("id", "<", 20)])
    assert len(kept) == 1 and len(skipped) == 2
    # pruned read + real filter == full read + real filter
    got = sorted(
        r.id for r in t.read_pruned(spark, [("id", ">=", 20)]).where("id >= 20").collect()
    )
    assert got == [20, 29]
    # every-directory-pruned: empty result, schema intact
    empty = t.read_pruned(spark, [("id", ">", 999)])
    assert empty.count() == 0 and empty.columns == ["id", "v"]
    # string stats prune lexicographically
    kept, skipped = t.prune([("v", ">=", "e")])
    assert len(skipped) == 2
    # a type-mismatched probe value proves nothing: keep everything
    kept, skipped = t.prune([("id", "=", "not-a-number")])
    assert skipped == []
    # r10: != is a supported one-sided proof (prunes only constant
    # dirs); a genuinely unsupported op still raises
    kept, _ = t.prune([("id", "!=", 3)])
    assert kept  # nothing provably all-equal to 3: everything survives
    with pytest.raises(ValueError):
        t.prune([("id", "LIKE", "3%")])
    # stats-less table never prunes
    t2 = TxnTable(str(tmp_path / "t2"))
    t2.write(_df(spark, [(1, "a")]), mode="overwrite")
    assert t2.prune([("id", "=", 999)])[1] == []
    # an all-null column dir is provably unmatchable by any comparison
    t3 = TxnTable(str(tmp_path / "t3"), stats_cols=("n",))
    t3.write(
        spark.createDataFrame([(1, None), (2, None)], "id long, n long"),
        mode="overwrite",
    )
    assert len(t3.prune([("n", ">=", 0)])[1]) == 1


def test_optimize_compacts_through_the_log(spark, tmp_path):
    """OPTIMIZE is a commit: small dirs collapse into one, big dirs
    survive by reference, content is row-identical (empty change
    feed), and the pre-optimize layout stays time-travelable."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write(_df(spark, [(i, "big") for i in range(100)]), mode="overwrite")
    for i in range(3):
        t.write(_df(spark, [(1000 + i, "s")]), mode="append")
    big_dir = t.snapshot(0)["files"][0]
    threshold = t.dir_sizes()[big_dir]
    v = t.optimize(spark, small_bytes=threshold)
    assert v == 4
    m = t.snapshot(4)
    assert big_dir in m["files"] and len(m["files"]) == 2
    # content identical: the optimize commit contributes zero changes
    assert t.changes(spark, "id", 3, 4).count() == 0
    assert t.read(spark).count() == 103
    # the compacted dir re-measured: stats cover the three small rows
    new_dir = next(f for f in m["files"] if f != big_dir)
    assert m["stats"][new_dir]["id"] == [1000, 1002, 0]
    # pre-optimize layout still readable
    assert t.read(spark, 3).count() == 103
    # nothing left to compact under the same threshold
    assert t.optimize(spark, small_bytes=threshold) is None
    # full optimize collapses everything into one directory
    assert t.optimize(spark) == 5
    assert len(t.snapshot(5)["files"]) == 1
    assert t.read(spark).count() == 103
    # empty table: no-op
    assert TxnTable(str(tmp_path / "t2")).optimize(spark) is None


def test_write_clustered_prunes_within_commit(spark, tmp_path):
    """One bulk load staged as range-disjoint directories in ONE
    commit: each range is its own manifest entry with its own stats,
    so pruning skips inside the commit; the layout column never leaks
    into the schema; COW delete/merge rewrite only the hit range; and
    vacuum keeps a clustered root alive while any range in it is."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    rows = [(i, f"r{i}") for i in range(100)]
    v = t.write_clustered(_df(spark, rows), "id", buckets=4, mode="overwrite")
    assert v == 0
    m = t.snapshot(0)
    assert len(m["files"]) == 4
    roots = {f.split("/_range_bucket=")[0] for f in m["files"]}
    assert len(roots) == 1, "one staged root, four range entries"
    # ranges are disjoint and every entry has stats
    spans = sorted(tuple(m["stats"][f]["id"]) for f in m["files"])
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # the layout column is not part of the table schema
    full = t.read(spark)
    assert full.columns == ["id", "v"] and full.count() == 100
    # pruning works within the single commit
    kept, skipped = t.prune([("id", ">=", 90)])
    assert len(skipped) >= 2 and len(kept) + len(skipped) == 4
    got = sorted(
        r.id for r in t.read_pruned(spark, [("id", ">=", 90)]).where("id >= 90").collect()
    )
    assert got == list(range(90, 100))
    # COW delete probes THROUGH the range layout: one range rewritten,
    # the other three survive by reference
    t.delete(spark, "id = 5")
    m1 = t.snapshot(1)
    assert len(set(m["files"]) & set(m1["files"])) == 3
    assert t.read(spark).count() == 99
    # directory-granular merge: update one low key + insert one high key
    t.merge(spark, _df(spark, [(6, "SIX"), (500, "new")]), key="id")
    m2 = t.snapshot(2)
    assert len(set(m1["files"]) & set(m2["files"])) == 3, "only the hit range rewritten"
    assert {r.v for r in t.read(spark).where("id IN (6, 500)").collect()} == {
        "SIX",
        "new",
    }
    # vacuum: the clustered root still holds live ranges and survives;
    # the table stays fully readable after GC
    t.vacuum(retain_versions=1, retain_hours=0.0)
    assert t.read(spark).count() == 100  # 99 survivors + 1 insert
    assert sorted(r.id for r in t.read_pruned(spark, [("id", "<", 10)]).where("id < 10").collect()) == [
        0, 1, 2, 3, 4, 6, 7, 8, 9,
    ]


def test_changes_classifies_full_history(spark, tmp_path):
    """The derived CDF: append→insert (no join), delete→delete,
    merge→pre/post images; rewritten-but-identical rows are silent."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.write(_df(spark, [(3, "c")]), mode="append")
    t.delete(spark, "id = 2")
    t.merge(spark, _df(spark, [(1, "A"), (9, "z")]), key="id")
    feed = t.changes(spark, "id", 0, 3)
    got = {(r.id, r.v, r.change_type, r.commit_version) for r in feed.collect()}
    assert got == {
        (3, "c", "insert", 1),
        (2, "b", "delete", 2),
        (1, "a", "update_preimage", 3),
        (1, "A", "update_postimage", 3),
        (9, "z", "insert", 3),
    }, got
    # sub-ranges slice the same feed
    sub = {(r.id, r.change_type) for r in t.changes(spark, "id", 2, 3).collect()}
    assert sub == {(1, "update_preimage"), (1, "update_postimage"), (9, "insert")}
    # the pure-append pair plans zero joins
    plan = (
        t.changes(spark, "id", 0, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    # invalid ranges raise
    with pytest.raises(ValueError):
        t.changes(spark, "id", 2, 2)
    with pytest.raises(ValueError):
        t.changes(spark, "id", 0, 99)


# -- schema evolution (round 8) ---------------------------------------------


def test_append_schema_mismatch_fails_loudly(spark, tmp_path):
    """An append whose schema differs from the committed one must raise
    SchemaMismatch BEFORE committing — never Spark's silent
    union-by-position read over mismatched parquet."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    with pytest.raises(SchemaMismatch, match="retyped"):
        t.write(
            spark.createDataFrame([(2, 2.5)], "id long, v double"),
            mode="append",
        )
    with pytest.raises(SchemaMismatch, match="merge_schema=True"):
        t.write(
            spark.createDataFrame([(2, "b", 7)], "id long, v string, w long"),
            mode="append",
        )
    # nothing committed, nothing leaked
    assert t.latest_version() == 0
    assert _data_dirs(t) == _referenced(t)
    # merge_schema can evolve (add), but never retype
    with pytest.raises(SchemaMismatch, match="retype"):
        t.write(
            spark.createDataFrame([(2, 2.5)], "id long, v double"),
            mode="append",
            merge_schema=True,
        )
    # idempotent appends share the same loud rule
    with pytest.raises(SchemaMismatch):
        t.write_idempotent(
            spark.createDataFrame([(2, 2.5)], "id long, v double"), "app", 0
        )
    assert _data_dirs(t) == _referenced(t)


def test_merge_schema_evolution_time_travels(spark, tmp_path):
    """merge_schema=True appends a new nullable column; old directories
    read it as NULL BY NAME; every historical version keeps ITS OWN
    schema; optimize materializes the evolved schema; the change feed
    across the evolution commit sees only the new rows."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    wide = spark.createDataFrame([(3, "c", 7)], "id long, v string, w long")
    v1 = t.write(wide, mode="append", merge_schema=True)
    assert v1 == 1
    cur = t.read(spark)
    assert cur.columns == ["id", "v", "w"]
    assert {(r.id, r.w) for r in cur.collect()} == {(1, None), (2, None), (3, 7)}
    # the pre-evolution snapshot still reads under its NARROW schema
    assert t.read(spark, 0).columns == ["id", "v"]
    # a post-evolution writer may OMIT existing columns (reads as NULL)
    t.write(_df(spark, [(4, "d")]), mode="append", merge_schema=True)
    assert {(r.id, r.w) for r in t.read(spark).collect()} == {
        (1, None), (2, None), (3, 7), (4, None),
    }
    # the evolution commit's change feed is pure inserts of the new rows
    feed = t.changes(spark, "id", 0, 1).collect()
    assert {(r.id, r.change_type) for r in feed} == {(3, "insert")}
    # a merge whose updates lack the evolved column fails loudly
    with pytest.raises(SchemaMismatch):
        t.merge(spark, _df(spark, [(1, "A")]), key="id")
    # ... and with the full schema it lands, preserving NULL w elsewhere
    t.merge(
        spark,
        spark.createDataFrame([(1, "A", 9)], "id long, v string, w long"),
        key="id",
    )
    assert {(r.id, r.v, r.w) for r in t.read(spark).collect()} == {
        (1, "A", 9), (2, "b", None), (3, "c", 7), (4, "d", None),
    }
    # optimize straddling the evolution materializes NULL-filled columns
    v_opt = t.optimize(spark)
    assert t.changes(spark, "id", v_opt - 1, v_opt).count() == 0
    assert {(r.id, r.w) for r in t.read(spark).collect()} == {
        (1, 9), (2, None), (3, 7), (4, None),
    }


def test_merge_guards_duplicate_keys_and_empty_updates(spark, tmp_path):
    """Round-8 hardening: duplicate update keys fail loudly (they would
    silently break the key-unique invariant changes() relies on); an
    empty update set is a no-op, not an empty commit."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    assert (
        t.merge(spark, spark.createDataFrame([], "id long, v string"), key="id")
        is None
    )
    assert t.latest_version() == 0
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(spark, _df(spark, [(1, "x"), (1, "y")]), key="id")
    assert t.latest_version() == 0
    assert _data_dirs(t) == _referenced(t)


# -- history / restore (round 8) --------------------------------------------


def test_history_and_restore(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.write(_df(spark, [(3, "c")]), mode="append")
    t.delete(spark, "id = 2")
    # restore v0 as a NEW commit: data rolls back, history rolls forward
    assert t.restore(0) == 3
    assert {(r.id, r.v) for r in t.read(spark).collect()} == {(1, "a"), (2, "b")}
    # the undone states stay time-travelable
    assert sorted(r.id for r in t.read(spark, 2).collect()) == [1, 3]
    # restoring the current state is a no-op
    assert t.restore(0) is None
    assert t.latest_version() == 3
    hist = t.history()
    assert [h["version"] for h in hist] == [3, 2, 1, 0]
    assert [h["op"] for h in hist] == ["restore", "delete", "append", "overwrite"]
    assert hist[1]["dirs_added"] == 1  # delete staged one rewrite dir
    # restore is O(manifest): v3 references v0's directory, no copy
    assert t.snapshot(3)["files"] == t.snapshot(0)["files"]


def test_restore_carries_watermarks_and_fails_after_vacuum(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write_idempotent(_df(spark, [(1, "a")]), "app", 1)
    t.write(_df(spark, [(9, "z")]), mode="overwrite")
    assert t.restore(0) == 2
    # the watermark carries from LATEST: a replayed batch stays a no-op
    # even though the data was rolled back
    assert t.write_idempotent(_df(spark, [(1, "dup")]), "app", 1) is None
    # vacuumed history cannot be restored — loudly
    t.write(_df(spark, [(7, "q")]), mode="overwrite")
    t.vacuum(retain_versions=1, retain_hours=0.0)
    with pytest.raises(FileNotFoundError):
        t.restore(0)


# -- partitioned tables (round 8) --------------------------------------------


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "id long, seg string, v string")


_PROWS = [(i, ["A", "B", None][i % 3], f"r{i}") for i in range(30)]


def test_partitioned_write_records_exact_values_and_prunes(spark, tmp_path):
    """One directory per partition tuple; the manifest carries EXACT
    values (parts) plus degenerate [v, v] stats, so equality pruning is
    a proof; data files keep the real partition column."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    snap = t.snapshot()
    assert snap["partition_by"] == ["seg"]
    assert len(snap["files"]) == 3
    assert sorted(snap["parts"].values(), key=str) == [
        {"seg": "A"}, {"seg": "B"}, {"seg": None},
    ]
    # partition value folded into stats as [v, v]; stats col measured
    for rel, vals in snap["parts"].items():
        s = snap["stats"][rel]
        assert s["seg"][:2] == [vals["seg"], vals["seg"]]
        # null count: 0 for a valued partition, the whole leaf for NULL
        assert s["seg"][2] == (0 if vals["seg"] is not None else snap["rows"][rel])
        assert "id" in s and s["id"][0] <= s["id"][1]
    # the partition column survives in the data (not path-inferred)
    cur = t.read(spark)
    assert cur.columns == ["id", "seg", "v"]
    assert {r.seg for r in cur.select("seg").distinct().collect()} == {
        "A", "B", None,
    }
    # exact pruning: = keeps one directory, reads only its rows
    kept, skipped = t.prune([("seg", "=", "A")])
    assert (len(kept), len(skipped)) == (1, 2)
    assert t.read_pruned(spark, [("seg", "=", "A")]).count() == 10
    # appends stack per-partition directories under the same spec
    t.write_partitioned(
        _pdf(spark, [(100, "A", "x"), (101, "B", "y")]), ("seg",)
    )
    assert len(t.snapshot()["files"]) == 5
    kept, _ = t.prune([("seg", "=", "A")])
    assert len(kept) == 2


def test_drop_partitions_is_metadata_only(spark, tmp_path):
    """Dropping a partition commits a new manifest and touches NO data:
    no new directory staged, the dropped bytes stay on disk for time
    travel, and the change feed classifies the commit as pure deletes."""
    t = TxnTable(str(tmp_path / "t"))
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    before = set(os.listdir(t.data_dir))
    v1 = t.drop_partitions([("seg", "=", "B")])
    assert v1 == 1
    assert set(os.listdir(t.data_dir)) == before  # zero bytes moved
    assert t.read(spark).where("seg = 'B'").count() == 0
    assert t.read(spark).count() == 20
    # time travel still reaches the dropped partition
    assert t.read(spark, 0).where("seg = 'B'").count() == 10
    # the feed across the drop is pure deletes of that partition
    feed = t.changes(spark, "id", 0, 1).collect()
    assert {r.change_type for r in feed} == {"delete"}
    assert len(feed) == 10 and all(r.seg == "B" for r in feed)
    # no match -> no empty commit
    assert t.drop_partitions([("seg", "=", "ZZZ")]) is None
    assert t.latest_version() == 1
    # NULL partitions never satisfy a comparison; is_null drops them
    assert t.drop_partitions([("seg", "<=", "zzz")]) == 2
    assert t.read(spark).count() == 10  # the null partition survived
    assert t.drop_partitions([("seg", "is_null", None)]) == 3
    assert t.read(spark).count() == 0
    # history reads back the ladder; restore revives the partitions
    assert [h["op"] for h in t.history()][:2] == [
        "drop_partitions", "drop_partitions",
    ]
    t.restore(0)
    assert t.read(spark).count() == 30
    assert t.partition_spec() == ("seg",)
    assert len(t.snapshot()["parts"]) == 3


def test_partitioned_guards(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    # plain / clustered / idempotent appends must not break the layout
    with pytest.raises(ValueError, match="write_partitioned"):
        t.write(_pdf(spark, _PROWS), mode="append")
    with pytest.raises(ValueError, match="write_partitioned"):
        t.write_clustered(_pdf(spark, _PROWS), "id", buckets=2)
    with pytest.raises(ValueError, match="unpartitioned"):
        t.write_idempotent(_pdf(spark, _PROWS), "app", 0)
    # appends must match the committed spec
    with pytest.raises(ValueError, match="must match"):
        t.write_partitioned(_pdf(spark, _PROWS), ("v",))
    # schema discipline is unchanged on the partitioned path
    with pytest.raises(SchemaMismatch):
        t.write_partitioned(
            spark.createDataFrame([(1, "A", 2.0)], "id long, seg string, v double"),
            ("seg",),
        )
    # float partition columns are rejected (inexact dir-name round-trip)
    with pytest.raises(ValueError, match="floating-point"):
        t.write_partitioned(
            spark.createDataFrame([(1.5, "x")], "f double, v string"),
            ("f",),
            mode="overwrite",
        )
    # predicates over non-partition columns / unknown ops are loud
    with pytest.raises(ValueError, match="not partition columns"):
        t.drop_partitions([("id", "=", 1)])
    with pytest.raises(ValueError, match="unsupported drop op"):
        t.drop_partitions([("seg", "!=", "A")])
    # an overwrite may re-layout
    t.write_partitioned(_pdf(spark, _PROWS), ("v",), mode="overwrite")
    assert t.partition_spec() == ("v",)
    # ... and an unpartitioned overwrite clears the spec
    t.write(_pdf(spark, _PROWS), mode="overwrite")
    assert t.partition_spec() == ()
    # losing/raising writers never leak staged directories
    assert _data_dirs(t) >= {f.split("/")[1] for f in t.snapshot()["files"]}


def test_drop_partitions_works_after_partition_preserving_merge(
    spark, tmp_path
):
    """Round 11: merge/delete/update stage their rewrites as
    per-partition leaves with exact manifest values (_stage_rewrite),
    so drop_partitions' two-sided proof holds IMMEDIATELY after a
    row-level rewrite — the pre-r11 behavior (unpartitioned rewrite
    dir → drop refuses until optimize repairs) is gone from the API
    paths."""
    t = TxnTable(str(tmp_path / "t"))
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    t.merge(spark, _pdf(spark, [(0, "A", "merged")]), key="id")
    snap = t.snapshot()
    assert snap["partition_by"] == ["seg"]  # spec survives the merge
    # every directory — including the rewrite leaves — carries values
    assert set(snap.get("parts", {})) == set(snap["files"])
    assert t.drop_partitions([("seg", "=", "A")]) is not None
    assert t.read(spark).where("seg = 'A'").count() == 0


def test_drop_partitions_uses_stats_proof_for_rewrites(spark, tmp_path):
    """With the partition column in stats_cols, a rewrite directory's
    measured [min, max] can PROVE it holds no victim rows, letting the
    metadata drop proceed around it."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("seg",))
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    # rewrite only partition A (merge touches key 0 in dir A)
    t.merge(spark, _pdf(spark, [(0, "A", "merged")]), key="id")
    v = t.drop_partitions([("seg", "=", "B")])
    assert v is not None
    assert t.read(spark).where("seg = 'B'").count() == 0
    assert t.read(spark).count() == 20


def test_partitioned_int_keys_and_empty_write(spark, tmp_path):
    """Integral partition values parse back as ints (numeric pruning);
    an empty write stages a readable empty directory."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(12)], "id long, bucket long, v string"
    )
    t.write_partitioned(df, ("bucket",), mode="overwrite")
    parts = t.snapshot()["parts"]
    assert sorted(v["bucket"] for v in parts.values()) == [0, 1, 2]
    kept, skipped = t.prune([("bucket", ">=", 2)])
    assert (len(kept), len(skipped)) == (1, 2)
    assert t.drop_partitions([("bucket", "<", 1)]) == 1
    assert sorted(
        r.bucket for r in t.read(spark).select("bucket").distinct().collect()
    ) == [1, 2]
    # numeric column vs string probe is a loud mismatch, not a guess
    with pytest.raises(ValueError, match="non-numeric probe"):
        t.drop_partitions([("bucket", "=", "1")])
    # empty append: no-op on the file list shape, still readable
    t.write_partitioned(df.where("id < 0"), ("bucket",))
    assert t.read(spark).count() == 8


def test_optimize_preserves_and_repairs_partition_layout(spark, tmp_path):
    """OPTIMIZE on a partitioned table compacts per partition tuple
    (exact values restaged into the manifest) and — because partition
    columns live in the data — re-derives values for a directory with
    MISSING partition metadata (a pre-r11 rewrite, or an external
    writer), repairing drop_partitions."""
    t = TxnTable(str(tmp_path / "t"))
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    t.write_partitioned(
        _pdf(spark, [(100, "A", "x"), (101, "B", "y")]), ("seg",)
    )
    t.merge(spark, _pdf(spark, [(0, "A", "merged")]), key="id")
    # simulate a legacy (pre-r11) rewrite: strip one directory's
    # partition values from the manifest, as an older writer left them
    snap = t.snapshot()
    doctored = {**snap, "version": snap["version"] + 1, "op": "merge"}
    doctored["parts"] = dict(list(snap["parts"].items())[1:])
    assert t._try_commit(snap["version"] + 1, doctored)
    with pytest.raises(ValueError, match="no partition metadata"):
        t.drop_partitions([("seg", "=", "B")])
    n_before = t.read(spark).count()
    v = t.optimize(spark)
    assert v is not None
    snap = t.snapshot()
    # one directory per partition tuple, every one carrying exact values
    assert snap["partition_by"] == ["seg"]
    assert len(snap["files"]) == 3
    assert set(snap["parts"]) == set(snap["files"])
    assert sorted(snap["parts"].values(), key=str) == [
        {"seg": "A"}, {"seg": "B"}, {"seg": None},
    ]
    # row-identical rewrite: empty change feed, counts preserved
    assert t.changes(spark, "id", v - 1, v).count() == 0
    assert t.read(spark).count() == n_before
    assert t.read(spark).where("v = 'merged'").count() == 1
    # the metadata fast path works again
    assert t.drop_partitions([("seg", "=", "B")]) == v + 1
    assert t.read(spark).where("seg = 'B'").count() == 0


# -- per-directory bloom filters (round 8) -----------------------------------


def test_bloom_skips_dirs_ranges_cannot(spark, tmp_path):
    """Interleaved appends make every directory span the whole key
    range — [min, max] proves nothing — yet the bloom skips all but
    the directory holding the probe, with zero false negatives."""
    from pyspark.sql import functions as F

    t = TxnTable(
        str(tmp_path / "t"),
        stats_cols=("k",),
        bloom_cols=("k",),
        bloom_bits=32768,
        bloom_k=5,
    )
    base = spark.range(400).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    for i in range(4):
        t.write(base.filter(F.col("k") % 4 == i), mode="append" if i else "overwrite")
    snap = t.snapshot()
    assert set(snap["blooms"]) == set(snap["files"])
    for e in (d["k"] for d in snap["blooms"].values()):
        assert (e["m"], e["k"]) == (32768, 5) and e["b"]
    # ranges overlap everywhere: stats-only pruning keeps all 4
    stats_only = [
        rel
        for rel in snap["files"]
        if TxnTable._dir_may_match(snap["stats"].get(rel), [("k", "=", 250)])
    ]
    assert len(stats_only) == 4
    # bloom pruning keeps 1 and the read still finds the row
    kept, skipped = t.prune([("k", "=", 250)])
    assert (len(kept), len(skipped)) == (1, 3)
    assert t.read_pruned(spark, [("k", "=", 250)]).where("k = 250").count() == 1
    # no false negatives: every existing key's directory survives
    for key in range(0, 400, 37):
        assert t.read_pruned(spark, [("k", "=", key)]).where(
            f"k = {key}"
        ).count() == 1, key
    # a missing key prunes everything (fpr ~5e-7 per dir at this sizing)
    kept, _ = t.prune([("k", "=", 10_000)])
    assert len(kept) <= 1
    assert t.read_pruned(spark, [("k", "=", 10_000)]).where("k = 10000").count() == 0


def test_bloom_lifecycle_and_guards(spark, tmp_path):
    """Blooms survive merge/delete (fresh bitmap for the rewrite),
    drop_partitions and restore (carried verbatim); probes use each
    entry's RECORDED sizing, not the reader handle's; float columns
    and string-typed probes of numeric columns stay loud/safe."""
    from pyspark.sql import functions as F

    t = TxnTable(str(tmp_path / "t"), bloom_cols=("k",), bloom_bits=2048, bloom_k=3)
    base = spark.range(200).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    t.write(base.filter("k < 100"), mode="overwrite")
    t.write(base.filter("k >= 100"))
    # a reader handle with DIFFERENT sizing still probes correctly
    r = TxnTable(str(tmp_path / "t"))  # default 8192/5
    kept, skipped = r.prune([("k", "=", 150)])
    assert (len(kept), len(skipped)) == (1, 1)
    # merge rewrite: fresh bloom for the staged dir, probe still exact
    t.merge(spark, spark.createDataFrame([(150, "upd")], "k long, v string"), key="k")
    kept, _ = t.prune([("k", "=", 150)])
    assert len(kept) == 1
    assert t.read_pruned(spark, [("k", "=", 150)]).where("k = 150").first().v == "upd"
    # delete rewrite keeps blooms consistent (victim gone, rest probed)
    t.delete(spark, "k = 42")
    assert t.read_pruned(spark, [("k", "=", 42)]).where("k = 42").count() == 0
    assert t.read_pruned(spark, [("k", "=", 43)]).where("k = 43").count() == 1
    # restore carries bitmaps verbatim
    v = t.latest_version()
    t.restore(0)
    assert "blooms" in t.snapshot()
    assert t.read_pruned(spark, [("k", "=", 42)]).where("k = 42").count() == 1
    # NULL-valued and non-(int|str) probes never consult the bloom
    assert TxnTable._dir_may_match(None, [("k", "=", None)], t.snapshot()["blooms"][t.snapshot()["files"][0]])
    # float bloom columns are rejected loudly at write time
    t3 = TxnTable(str(tmp_path / "t3"), bloom_cols=("f",))
    with pytest.raises(ValueError, match="non-integral"):
        t3.write(spark.createDataFrame([(1.5,)], "f double"), mode="overwrite")


def test_bloom_on_partitioned_table(spark, tmp_path):
    """Partitioned staging measures one bloom per leaf; drop_partitions
    carries the survivors' bitmaps."""
    t = TxnTable(str(tmp_path / "t"), bloom_cols=("id",), bloom_bits=2048, bloom_k=3)
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    snap = t.snapshot()
    assert set(snap["blooms"]) == set(snap["files"])
    probe = [("id", "=", 3)]  # id 3 -> seg None partition only
    kept, skipped = t.prune(probe)
    assert (len(kept), len(skipped)) == (1, 2)
    assert t.read_pruned(spark, probe).where("id = 3").count() == 1
    t.drop_partitions([("seg", "=", "B")])
    assert set(t.snapshot()["blooms"]) == set(t.snapshot()["files"])


def test_vacuum_reclaims_dead_leaves_in_live_roots(spark, tmp_path):
    """A drop_partitions'd leaf must not leak forever just because a
    sibling leaf keeps the staged root alive: vacuum reclaims dead
    subtrees leaf-granularly while live siblings stay readable."""
    t = TxnTable(str(tmp_path / "t"))
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    snap0 = t.snapshot()
    dropped_rel = next(
        rel for rel, v in snap0["parts"].items() if v["seg"] == "B"
    )
    t.drop_partitions([("seg", "=", "B")])
    assert os.path.isdir(os.path.join(t.path, dropped_rel))
    removed = t.vacuum(retain_versions=1, retain_hours=0.0)
    assert dropped_rel in removed
    assert not os.path.isdir(os.path.join(t.path, dropped_rel))
    # live sibling leaves survive and the table still reads
    for rel in t.snapshot()["files"]:
        assert os.path.isdir(os.path.join(t.path, rel)), rel
    assert t.read(spark).count() == 20
    assert {r.seg for r in t.read(spark).select("seg").distinct().collect()} == {
        "A", None,
    }
    # the retention window protects young leaves the same way
    t.drop_partitions([("seg", "is_null", None)])
    assert t.vacuum(retain_versions=1, retain_hours=168.0) == []
    assert t.read(spark).count() == 10


def test_vacuum_parallel_delete_matches_serial(spark, tmp_path):
    """``vacuum(spark=...)`` deletes the SAME doomed set as the serial
    driver loop, just as one Spark job (Delta's vacuum parallel
    delete) — the retention decisions are identical, only the
    deletion transport changes. Forced over the parallel path by
    dropping the batch-size floor."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS v")
    # 5 overwrites: 4 dead directories + 1 live
    for i in range(5):
        t.write(df.where(f"id >= {i * 20} AND id < {(i + 1) * 20}"),
                mode="overwrite")
    dead = [d for d in os.listdir(t.data_dir)
            if f"data/{d}" not in set(t.snapshot()["files"])]
    assert len(dead) == 4
    orig_floor = TxnTable._VACUUM_PARALLEL_AT
    TxnTable._VACUUM_PARALLEL_AT = 1  # force the Spark-job path
    try:
        removed = t.vacuum(retain_versions=1, retain_hours=0.0, spark=spark)
    finally:
        TxnTable._VACUUM_PARALLEL_AT = orig_floor
    assert sorted(removed) == sorted(f"data/{d}" for d in dead)
    for rel in removed:
        assert not os.path.exists(os.path.join(t.path, rel)), rel
    # the live directory is intact and the table still reads
    assert t.read(spark).count() == 20
    assert sorted(r.id for r in t.read(spark).collect()) == list(
        range(80, 100)
    )
    # idempotent: a second parallel vacuum finds nothing
    assert t.vacuum(retain_versions=1, retain_hours=0.0, spark=spark) == []
    # the mtime safety window holds on the parallel path too: a fresh
    # unreferenced directory (in-flight stager shape) survives, and is
    # NOT reported removed (the executor-side stat gates the delete)
    t.write(df.where("id < 10"), mode="overwrite")
    dead_young = [d for d in os.listdir(t.data_dir)
                  if f"data/{d}" not in set(t.snapshot()["files"])]
    assert dead_young
    TxnTable._VACUUM_PARALLEL_AT = 1
    try:
        assert t.vacuum(
            retain_versions=1, retain_hours=168.0, spark=spark
        ) == []
    finally:
        TxnTable._VACUUM_PARALLEL_AT = orig_floor
    for d in dead_young:
        assert os.path.isdir(os.path.join(t.data_dir, d))


def test_optimize_bins_stage_concurrently(spark, tmp_path, monkeypatch):
    """Compaction bins stage through a bounded thread pool (Delta's
    OPTIMIZE thread pool): one bin's rewrite job is far too small to
    saturate a big cluster alone, so bins submit concurrently —
    results collect in bin order, and the committed content is
    identical to the sequential path's."""
    import threading

    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 80).selectExpr("id", "CAST(id AS STRING) AS v")
    for i in range(8):
        t.write(
            df.where(f"id >= {i * 10} AND id < {(i + 1) * 10}"),
            mode="overwrite" if i == 0 else "append",
        )
    seen: set = set()
    real = TxnTable._stage_optimize_bin

    def spy(self, spark_, snap, spec, bin_dirs):
        seen.add(threading.current_thread().name)
        return real(self, spark_, snap, spec, bin_dirs)

    monkeypatch.setattr(TxnTable, "_stage_optimize_bin", spy)
    sizes = t.dir_sizes()
    target = int(2.5 * sorted(sizes.values())[len(sizes) // 2])
    v = t.optimize(spark, target_bytes=target)
    assert v is not None
    assert any(n.startswith("optimize-bin") for n in seen), seen
    assert 1 < len(t.snapshot()["files"]) < 8  # binned, not fused
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(80))


def test_reorg_purge_stages_dirs_concurrently(spark, tmp_path, monkeypatch):
    """PURGE's singleton bins ride the same pool: two tombstoned
    directories rewrite as two concurrent jobs on the streamed
    (checkpointed) path, with identical committed content."""
    import threading

    t = TxnTable(str(tmp_path / "t"), checkpoint_at=2)
    df = spark.range(0, 300).selectExpr("id", "CAST(id AS STRING) AS v")
    for i in range(3):
        t.write(
            df.where(f"id >= {i * 100} AND id < {(i + 1) * 100}"),
            mode="overwrite" if i == 0 else "append",
        )
    assert "files_checkpoint" in t._stub(t.latest_version())
    t.delete_dv(spark, "id IN (10, 210)")  # dirs 0 and 2
    seen: set = set()
    real = TxnTable._stage_rewrite

    def spy(self, snap, df_):
        seen.add(threading.current_thread().name)
        return real(self, snap, df_)

    monkeypatch.setattr(TxnTable, "_stage_rewrite", spy)
    v = t.reorg_purge(spark)
    assert v is not None
    pool_threads = {n for n in seen if n.startswith("optimize-bin")}
    assert len(pool_threads) >= 1, seen
    snap = t.snapshot()
    assert "dvs" not in snap
    assert t.count() == 298
    assert sorted(r.id for r in t.read(spark).collect()) == [
        i for i in range(300) if i not in (10, 210)
    ]


def test_reorg_purge_race_with_delete_dv_rebases(spark, tmp_path):
    """A delete_dv landing between the purge's pick and its commit
    steals the version: the purge must REBASE and re-pick from the
    new snapshot, so the late tombstones materialize too — never
    resurrected, never left behind as a stale dvs list."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 200).selectExpr("id", "CAST(id AS STRING) AS v")
    t.write(df.where("id < 100"), mode="overwrite")
    t.write(df.where("id >= 100"), mode="append")
    t.delete_dv(spark, "id = 5")  # dir 0 tombstoned
    real = t._try_commit
    stolen = {"done": False}

    def stealing(version, manifest):
        if not stolen["done"]:
            stolen["done"] = True
            other = TxnTable(t.path)
            got = other.delete_dv(spark, "id = 150")  # dir 1, steals it
            assert got == version
        return real(version, manifest)

    t._try_commit = stealing
    v = t.reorg_purge(spark)
    assert v is not None and stolen["done"]
    snap = t.snapshot()
    assert "dvs" not in snap and "dv_rows" not in snap
    assert t.count() == 198
    assert sorted(r.id for r in t.read(spark).collect()) == [
        i for i in range(200) if i not in (5, 150)
    ]


def test_restore_as_of_timestamp(spark, tmp_path):
    """RESTORE ... TIMESTAMP AS OF: rollback to the newest version
    committed at or before the wall-clock instant, as a commit."""
    import time

    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    time.sleep(0.05)
    mark = time.time()
    time.sleep(0.05)
    t.write(_df(spark, [(2, "b")]), mode="append")
    v = t.restore_as_of(mark)
    assert v == 2
    assert sorted(r.id for r in t.read(spark).collect()) == [1]
    # already at the as-of state: no empty commit
    assert t.restore_as_of(time.time()) is None


def test_describe_detail(spark, tmp_path):
    """``detail()`` — DESCRIBE DETAIL as one metadata dict: counts,
    sizes, layout and policy straight from the manifest, zero jobs,
    correct across checkpointed and inline manifests and across
    versions."""
    t = TxnTable(str(tmp_path / "t"), checkpoint_at=2)
    df = spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS v")
    t.write(df.where("id < 50"), mode="overwrite")
    t.write(df.where("id >= 50"), mode="append")
    t.add_constraint(spark, "id_nonneg", "id >= 0")
    t.delete_dv(spark, "id = 7")
    d = t.detail()
    assert d["version"] == 3 and d["op"] == "delete_dv"
    assert d["num_dirs"] == 2 and d["num_rows"] == 99
    assert d["size_bytes"] == t.size_bytes()
    assert d["columns"] == ["id", "v"]
    assert d["constraints"] == {"id_nonneg": "id >= 0"}
    assert d["num_tombstoned_dirs"] == 1
    assert d["checkpointed"] is True
    assert d["partition_by"] == []
    # version-addressed detail reflects that snapshot, not the tip
    d0 = t.detail(0)
    assert d0["num_dirs"] == 1 and d0["num_rows"] == 50
    assert d0["num_tombstoned_dirs"] == 0
    assert d0["checkpointed"] is False


def test_vacuum_live_ancestor_index(spark, tmp_path):
    """The ancestor index answers exactly the question the old
    per-candidate live-set scan did — every proper prefix of a live
    entry, nothing else — so partially-live roots descend and fully
    dead roots delete whole."""
    anc = TxnTable._live_ancestor_index(
        {"data/u1", "data/u2/seg=A/b=1", "data/u2/seg=B"}
    )
    assert anc == {"data/u2", "data/u2/seg=A"}
    assert "data/u1" not in anc  # depth-2 entries have no ancestors


def test_multi_column_partitioning(spark, tmp_path):
    """Two partition levels: exact values for both columns, conjunct
    drops, leaf-granular vacuum descending THROUGH a live ancestor
    level, and a racing partitioned append that rebases cleanly."""
    t = TxnTable(str(tmp_path / "t"))
    rows = [(i, ["A", "B"][i % 2], i % 3, f"r{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, seg string, bucket long, v string")
    t.write_partitioned(df, ("seg", "bucket"), mode="overwrite")
    snap = t.snapshot()
    assert snap["partition_by"] == ["seg", "bucket"]
    assert len(snap["files"]) == 6  # 2 segs x 3 buckets
    assert {(v["seg"], v["bucket"]) for v in snap["parts"].values()} == {
        (s, b) for s in ("A", "B") for b in (0, 1, 2)
    }
    # both columns prune independently and jointly
    kept, _ = t.prune([("seg", "=", "A")])
    assert len(kept) == 3
    kept, _ = t.prune([("seg", "=", "A"), ("bucket", "=", 1)])
    assert len(kept) == 1
    # conjunct drop removes exactly one leaf, metadata-only
    before = set(os.listdir(t.data_dir))
    v1 = t.drop_partitions([("seg", "=", "A"), ("bucket", "=", 1)])
    assert v1 == 1 and set(os.listdir(t.data_dir)) == before
    assert t.read(spark).where("seg = 'A' AND bucket = 1").count() == 0
    assert t.read(spark).count() == 50
    # range drop over the second level composes with equality on the first
    v2 = t.drop_partitions([("seg", "=", "B"), ("bucket", ">=", 1)])
    assert v2 == 2 and len(t.snapshot()["files"]) == 3
    # vacuum reclaims the nested dead leaves while their ANCESTOR
    # level stays alive for the surviving sibling buckets
    dead = set(t.snapshot(0)["files"]) - set(t.snapshot()["files"])
    removed = set(t.vacuum(retain_versions=1, retain_hours=0.0))
    assert dead <= removed
    for rel in t.snapshot()["files"]:
        assert os.path.isdir(os.path.join(t.path, rel)), rel
    assert t.read(spark).count() == 30
    # racing partitioned appends: the loser rebases, both land
    real_try_commit = t._try_commit
    stolen = {"done": False}

    def stealing(version, manifest):
        if not stolen["done"]:
            stolen["done"] = True
            other = TxnTable(t.path)
            extra = spark.createDataFrame(
                [(100, "A", 0, "race")], "id long, seg string, bucket long, v string"
            )
            assert other.write_partitioned(extra, ("seg", "bucket")) == version
        return real_try_commit(version, manifest)

    t._try_commit = stealing
    mine = spark.createDataFrame(
        [(101, "B", 0, "mine")], "id long, seg string, bucket long, v string"
    )
    t.write_partitioned(mine, ("seg", "bucket"))
    t._try_commit = real_try_commit
    got = {r.id for r in t.read(spark).where("id >= 100").collect()}
    assert got == {100, 101}
    # both racers' parts landed in the final manifest
    final = t.snapshot()
    assert set(final["parts"]) == set(final["files"])


def test_partition_values_roundtrip_hive_escaping(spark, tmp_path):
    """String partition values containing hive-escaped characters
    (space, '=', '/', '%', ':', tab, unicode) must round-trip from the
    dir name back to the exact value — Spark escapes them %XX-style
    (including '%' itself, so pre-escaped lookalikes cannot collide)
    and _parse_part_value unquotes."""
    vals = ["NORTH EAST", "a=b", "x/y", "50%", "a%3Db", "café", "q:r", "t\tb"]
    t = TxnTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, seg string"
    )
    t.write_partitioned(df, ("seg",), mode="overwrite")
    snap = t.snapshot()
    assert sorted(v["seg"] for v in snap["parts"].values()) == sorted(vals)
    for v in vals:
        kept, skipped = t.prune([("seg", "=", v)])
        assert (len(kept), len(skipped)) == (1, len(vals) - 1), v
    # the lookalike pair stays distinct through a drop
    assert t.drop_partitions([("seg", "=", "a=b")]) == 1
    remaining = {r.seg for r in t.read(spark).select("seg").distinct().collect()}
    assert "a=b" not in remaining and "a%3Db" in remaining


# -- commit timestamps + CHECK constraints (round 8) --------------------------


def test_timestamp_time_travel(spark, tmp_path):
    import time

    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    ts0 = t.snapshot(0)["ts"]
    time.sleep(0.05)
    t.write(_df(spark, [(2, "b")]), mode="append")
    ts1 = t.snapshot(1)["ts"]
    assert ts0 < ts1
    assert t.version_as_of(ts0) == 0
    assert t.version_as_of((ts0 + ts1) / 2) == 0
    assert t.version_as_of(time.time()) == 1
    assert sorted(r.id for r in t.read_as_of(spark, ts0).collect()) == [1]
    assert sorted(r.id for r in t.read_as_of(spark, ts1).collect()) == [1, 2]
    with pytest.raises(ValueError, match="no committed version"):
        t.version_as_of(ts0 - 10)
    # history surfaces the stamps, newest first
    hist = t.history()
    assert [h["ts"] for h in hist] == [ts1, ts0]


def test_check_constraints_gate_every_write_path(spark, tmp_path):
    from ceneton_database_tools_spark.sinks.txnlog import ConstraintViolation

    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    v = t.add_constraint(spark, "pos_id", "id > 0")
    assert v == 1 and t.constraints() == {"pos_id": "id > 0"}
    # re-adding identically is a no-op; a different expr is loud
    assert t.add_constraint(spark, "pos_id", "id > 0") is None
    with pytest.raises(ValueError, match="different"):
        t.add_constraint(spark, "pos_id", "id >= 0")
    # adding a constraint existing rows violate commits NOTHING
    with pytest.raises(ConstraintViolation, match="existing rows"):
        t.add_constraint(spark, "big", "id > 100")
    assert t.latest_version() == 1
    # every write path validates incoming rows in one agg job
    for attempt in (
        lambda: t.write(_df(spark, [(-1, "x")]), mode="append"),
        lambda: t.write(_df(spark, [(-1, "x")]), mode="overwrite"),
        lambda: t.write_clustered(_df(spark, [(-1, "x")]), "id", buckets=2),
        lambda: t.write_idempotent(_df(spark, [(-1, "x")]), "app", 0),
        lambda: t.merge(spark, _df(spark, [(-1, "x")]), key="id"),
    ):
        with pytest.raises(ConstraintViolation, match="pos_id"):
            attempt()
        assert t.latest_version() == 1
        assert _data_dirs(t) == _referenced(t)  # nothing staged leaked
    # NULL passes (SQL CHECK semantics); valid rows land
    t.write(
        spark.createDataFrame([(None, "n"), (5, "e")], "id long, v string"),
        mode="append",
    )
    assert t.read(spark).count() == 4
    # the constraint rides rewrites and partition commits
    t.delete(spark, "id = 2")
    assert t.constraints() == {"pos_id": "id > 0"}
    with pytest.raises(ConstraintViolation):
        t.merge(spark, _df(spark, [(-7, "x")]), key="id")
    # drop, then the same write succeeds
    assert t.drop_constraint("pos_id") is not None
    assert t.drop_constraint("pos_id") is None
    t.write(_df(spark, [(-1, "ok")]), mode="append")
    assert t.read(spark).where("id = -1").count() == 1


def test_constraints_on_partitioned_table(spark, tmp_path):
    from ceneton_database_tools_spark.sinks.txnlog import ConstraintViolation

    t = TxnTable(str(tmp_path / "t"))
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    t.add_constraint(spark, "vshape", "v LIKE 'r%'")
    with pytest.raises(ConstraintViolation, match="vshape"):
        t.write_partitioned(
            _pdf(spark, [(100, "A", "bad")]), ("seg",)
        )
    assert t.latest_version() == 1
    assert _data_dirs(t) == {f.split("/")[1] for f in t.snapshot()["files"]}
    t.write_partitioned(_pdf(spark, [(100, "A", "r100")]), ("seg",))
    # metadata ops carry the policy
    t.drop_partitions([("seg", "=", "B")])
    assert t.constraints() == {"vshape": "v LIKE 'r%'"}
    t.restore(1)
    assert t.constraints() == {"vshape": "v LIKE 'r%'"}


def test_constraint_referencing_missing_column_leaks_nothing(spark, tmp_path):
    """A policy whose expression a batch cannot analyze (evolved writer
    omitting the column) must fail the write loudly AND discard the
    staged copy — any exception on the validation path cleans up, not
    just ConstraintViolation."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t.add_constraint(spark, "vshape", "v IS NOT NULL")
    with pytest.raises(Exception):
        t.write(
            spark.createDataFrame([(2,)], "id long"),
            mode="append",
            merge_schema=True,
        )
    assert t.latest_version() == 1
    assert _data_dirs(t) == _referenced(t)


# -- manifest row counts + read_where + cross-process race (round 8) ----------


def test_manifest_row_counts_and_count(spark, tmp_path):
    """Every commit records per-directory row counts from the parquet
    footers — count() answers from the manifest with zero Spark jobs,
    through every op shape."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(i, "x") for i in range(7)]), mode="overwrite")
    assert t.count() == 7
    t.write(_df(spark, [(10, "y"), (11, "z")]), mode="append")
    assert t.count() == 9 and t.count(0) == 7
    t.delete(spark, "id >= 10")
    assert t.count() == 7
    t.merge(spark, _df(spark, [(0, "upd"), (100, "ins")]), key="id")
    assert t.count() == 8
    t.write_partitioned(_pdf(spark, _PROWS), ("seg",), mode="overwrite")
    assert t.count() == 30
    t.drop_partitions([("seg", "=", "B")])
    assert t.count() == 20
    t.optimize(spark)
    assert t.count() == 20
    t.restore(t.latest_version() - 2)
    assert t.count() == 30
    t.add_constraint(spark, "c", "id IS NOT NULL")
    assert t.count() == 30
    # reconciliation invariant: manifest count == actual scan count
    assert t.count() == t.read(spark).count()


def test_read_where_applies_residual_filter(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write_clustered(
        _df(spark, [(i, f"r{i}") for i in range(100)]), "id", buckets=4
    )
    preds = [("id", ">=", 80), ("id", "<", 85)]
    got = t.read_where(spark, preds)
    assert sorted(r.id for r in got.collect()) == list(range(80, 85))
    # strictly tighter than the pruned superset
    assert t.read_pruned(spark, preds).count() >= got.count()
    # r10: != and null checks are first-class (one-sided prune + filter)
    assert t.read_where(spark, [("id", "!=", 1)]).count() == 99
    assert t.read_where(spark, [("v", "IS NOT NULL", None)]).count() == 100
    with pytest.raises(ValueError, match="unsupported"):
        t.read_where(spark, [("id", "LIKE", "1%")])


def test_cross_process_commit_race(spark, tmp_path):
    """The atomic-claim protocol is link(2), so it must hold across OS
    PROCESSES, not just threads: N workers in separate interpreters
    race pre-staged appends at the same version; every version is
    claimed exactly once and every row lands exactly once."""
    import json as _json
    import os as _os
    import subprocess
    import sys

    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(0, "seed")]), mode="overwrite")
    # pre-stage one data directory per worker (Spark-free workers):
    # each worker races the pure COMMIT protocol, which is the part
    # that must be cross-process atomic
    import shutil

    src = os.path.join(t.path, t.snapshot(0)["files"][0])
    staged = []
    for i in range(6):
        rel = f"data/worker{i}"
        shutil.copytree(src, os.path.join(t.path, rel))
        staged.append(rel)
    worker = f"""
import json, os, sys, uuid
sys.path.insert(0, {_os.getcwd()!r})
from ceneton_database_tools_spark.sinks.txnlog import TxnTable
t = TxnTable({t.path!r})
rel = sys.argv[1]
for _ in range(50):
    cur = t.latest_version()
    snap = t.snapshot(cur)
    m = {{"version": cur + 1, "op": "append",
         "files": list(snap["files"]) + [rel],
         "txns": dict(snap.get("txns", {{}})), "schema": snap.get("schema")}}
    # external stagers supply their own counts (commit_staged's n_rows
    # contract) - no commit path walks parquet footers on the driver
    t._carry_props(snap, m, {{rel: 1}})
    if t._try_commit(cur + 1, m):
        print(cur + 1); break
else:
    sys.exit(3)
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, rel],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for rel in staged
    ]
    versions = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-500:]
        versions.append(int(out.strip()))
    # every worker won a DISTINCT version, contiguously after v0
    assert sorted(versions) == list(range(1, 7))
    # and the final snapshot carries every worker's directory once
    final = t.snapshot()["files"]
    assert len(final) == len(set(final)) == 7
    assert t.count() == 7  # seed + 6 copies of the 1-row dir


def test_history_reports_row_counts(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.delete(spark, "id = 1")
    hist = t.history()
    assert [h["num_rows"] for h in hist] == [1, 2]


# -- round 9: executor-side blooms, observed counts, edge hardening ------


def test_bloom_build_collects_only_bitmaps(spark, tmp_path, monkeypatch):
    """At the docstring's recommended sizing bloom_bits is O(rows), so
    the index build must never collect the (dir, col, bit) triples to
    the driver — only dirs x cols finished bitmaps. Intercept every
    DataFrame.collect during the commit and bound its row count."""
    df_cls = type(spark.range(1))  # the concrete (classic) DataFrame
    sizes = []
    real_collect = df_cls.collect

    def spy(self):
        out = real_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(df_cls, "collect", spy)
    t = TxnTable(str(tmp_path / "t"), bloom_cols=("id",), bloom_bits=1 << 20)
    df = spark.range(0, 5000).selectExpr("id", "CAST(id AS STRING) AS v")
    t.write(df, mode="overwrite")
    # 1 dir x 1 bloom col -> every driver-side collect in the commit
    # path is bounded by dirs x cols (the fold output), never O(bits)
    assert sizes, "expected at least the bloom-fold collect"
    assert max(sizes) <= 1
    # and the index actually skips: a present key keeps the dir, an
    # absent key prunes it
    kept, skipped = t.prune([("id", "=", 4999)])
    assert (len(kept), len(skipped)) == (1, 0)
    kept, skipped = t.prune([("id", "=", 10**9)])
    assert (len(kept), len(skipped)) == (0, 1)


def test_commit_row_counts_skip_driver_footer_walk(spark, tmp_path):
    """Every write path records row counts from its own staging job —
    the driver-side parquet-footer walk is GONE (deleted, not just
    avoided): a legacy uncounted directory makes count() answer None
    honestly instead of the commit path paying O(files) GETs."""
    assert not hasattr(TxnTable, "_dir_row_count"), (
        "the footer-walk fallback is back; no commit path may walk "
        "parquet footers on the driver"
    )
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS v")
    t.write(df, mode="overwrite")
    assert t.count() == 100
    t.write(df.where("id < 10"), mode="append")
    assert t.count() == 110
    t.delete(spark, "id = 5")  # COW rewrite of both touched dirs
    assert t.count() == 108
    t.merge(spark, df.where("id = 5"), key="id")  # re-insert the victim
    assert t.count() == 109
    t.optimize(spark)
    assert t.count() == 109

    t2 = TxnTable(str(tmp_path / "t2"), stats_cols=("id",))
    t2.write_clustered(df, cluster_by="id", buckets=4, mode="overwrite")
    assert t2.count() == 100

    t3 = TxnTable(str(tmp_path / "t3"))
    t3.write_partitioned(
        df.selectExpr("id", "CAST(id % 3 AS INT) AS p"), ("p",),
        mode="overwrite",
    )
    assert t3.count() == 100
    t3.drop_partitions([("p", "=", 0)])
    assert t3.count() == 66

    # legacy manifest with no recorded counts: appends still commit,
    # and the uncounted prior directory yields count() None — never a
    # footer walk inside the commit
    t4 = TxnTable(str(tmp_path / "t4"))
    t4.write(df.where("id < 5"), mode="overwrite")
    m_path = t4._manifest_path(0)
    import json as _json

    m = _json.load(open(m_path))
    del m["rows"]
    os.chmod(m_path, 0o644)
    with open(m_path, "w") as f:
        _json.dump(m, f)
    t4.write(df.where("id >= 95"), mode="append")
    assert t4.count() is None  # honest: one dir was never counted
    assert t4.read(spark).count() == 10  # data itself is intact


def test_boolean_partition_columns_rejected(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 4).selectExpr("id", "id % 2 = 0 AS flag")
    with pytest.raises(ValueError, match="boolean partition"):
        t.write_partitioned(df, ("flag",), mode="overwrite")


def test_merge_null_keys_raise_named_error(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    upd = spark.createDataFrame([(None, "x"), (2, "y")], "id long, v string")
    with pytest.raises(ValueError, match="NULL 'id'"):
        t.merge(spark, upd, key="id")
    # distinct-count check is over NON-NULL keys: otherwise this
    # unambiguous batch would be misreported as "duplicate keys"


def test_constraint_retry_revalidates_changed_expression(spark, tmp_path):
    """A commit retry must re-validate a constraint whose NAME survived
    but whose EXPRESSION changed under it (concurrent drop + re-add):
    the validated set is keyed by (name, expr), not name."""
    from ceneton_database_tools_spark.sinks.txnlog import ConstraintViolation

    path = str(tmp_path / "t")
    t = TxnTable(path)
    t.write(spark.createDataFrame([(500, "a")], "id long, v string"),
            mode="overwrite")
    t.add_constraint(spark, "c_pos", "id > 0")

    raced = {"done": False}
    real = TxnTable._try_commit

    def steal_once(self, version, manifest):
        if not raced["done"] and manifest.get("op") == "append":
            raced["done"] = True
            other = TxnTable(path)
            other.drop_constraint("c_pos")
            other.add_constraint(spark, "c_pos", "id > 100")
            return False  # this writer lost the race; it must rebase
        return real(self, version, manifest)

    TxnTable._try_commit = steal_once
    try:
        # batch passes "id > 0" (validated pre-race) but violates the
        # re-added "id > 100" — the rebase must catch it
        with pytest.raises(ConstraintViolation, match="id > 100"):
            t.write(
                spark.createDataFrame([(50, "b")], "id long, v string"),
                mode="append",
            )
    finally:
        TxnTable._try_commit = real


def test_escaped_partition_values_round_trip(spark, tmp_path):
    """Partition values hive-escapes in dir names ('a b' -> 'a%20b')
    must still: carry exact manifest values, prune, row-level delete
    (the input_file_name probe is URI-encoded and needs unquoting),
    and build non-orphaned bloom entries."""
    t = TxnTable(str(tmp_path / "t"), bloom_cols=("id",))
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c%d"), (4, "plain")],
        "id long, grp string",
    )
    t.write_partitioned(df, ("grp",), mode="overwrite")
    snap = t.snapshot()
    vals = sorted(v["grp"] for v in snap["parts"].values())
    assert vals == ["a b", "c%d", "plain"]
    # blooms are keyed by the manifest rel (no orphaned entries)
    assert set(snap.get("blooms", {})) <= set(snap["files"])
    kept, _ = t.prune([("id", "=", 3)])
    assert len(kept) == 1 and "c%25d" in kept[0]
    # row-level delete inside an escaped directory: the probe must map
    # the URI-encoded file name back to the on-disk manifest key
    t.delete(spark, "id = 1")
    assert sorted(r.id for r in t.read(spark).collect()) == [2, 3, 4]
    assert t.count() == 3


def test_schema_nullability_widens_on_append(spark, tmp_path):
    """An append of nullable data into a column recorded non-nullable
    widens the recorded schema — the manifest must never claim
    non-nullable over directories that may hold NULLs."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    strict = StructType([
        StructField("id", LongType(), nullable=False),
        StructField("v", StringType(), nullable=False),
    ])
    loose = StructType([
        StructField("id", LongType(), nullable=False),
        StructField("v", StringType(), nullable=True),
    ])
    t = TxnTable(str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "a")], strict), mode="overwrite")
    rec = {f["name"]: f["nullable"] for f in t.snapshot()["schema"]["fields"]}
    assert rec == {"id": False, "v": False}
    t.write(spark.createDataFrame([(2, None)], loose), mode="append")
    rec = {f["name"]: f["nullable"] for f in t.snapshot()["schema"]["fields"]}
    assert rec == {"id": False, "v": True}
    # and the widened snapshot reads the NULL back
    assert sorted(
        (r.id, r.v) for r in t.read(spark).collect()
    ) == [(1, "a"), (2, None)]


# -- round 9: deletion vectors (merge-on-read) ---------------------------


def _dv_sidecar_bytes(t):
    total = 0
    dv_root = os.path.join(t.path, "dv")
    for root, _, names in os.walk(dv_root):
        for n in names:
            total += os.path.getsize(os.path.join(root, n))
    return total


def test_delete_dv_point_delete_commits_no_rewrite(spark, tmp_path):
    """A 1-row merge-on-read delete must leave every data directory
    untouched (same manifest file list), commit only a tiny tombstone
    sidecar, and disappear from reads/count while staying
    time-travelable."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 1000).selectExpr("id", "CAST(id AS STRING) AS v")
    t.write(df, mode="overwrite")
    files_before = list(t.snapshot()["files"])
    v = t.delete_dv(spark, "id = 7")
    assert v == 1
    snap = t.snapshot()
    assert snap["files"] == files_before, "delete_dv rewrote data"
    assert len(snap["dvs"]) == 1
    assert sum(snap["dv_rows"].values()) == 1
    assert t.count() == 999
    assert t.read(spark).where("id = 7").count() == 0
    assert t.read(spark).count() == 999
    # time travel: the pre-delete snapshot still has the row
    assert t.read(spark, 0).where("id = 7").count() == 1
    assert t.count(0) == 1000
    # a no-match predicate is a no-op, not an empty commit
    assert t.delete_dv(spark, "id = 1000000000") is None
    assert t.latest_version() == 1
    # deleting an ALREADY-tombstoned row matches nothing (live probe)
    assert t.delete_dv(spark, "id = 7") is None


def test_delete_dv_accumulates_and_cow_materializes(spark, tmp_path):
    """Successive DV deletes accumulate disjointly; a copy-on-write
    rewrite (delete/merge/optimize) of a touched directory MATERIALIZES
    its tombstones — rewritten dirs never resurrect deleted rows."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS v")
    t.write(df.where("id < 50"), mode="overwrite")
    t.write(df.where("id >= 50"), mode="append")
    t.delete_dv(spark, "id IN (1, 60)")
    t.delete_dv(spark, "id IN (2, 61)")
    assert t.count() == 96
    assert len(t.snapshot()["dvs"]) == 2
    # merge upserting a tombstoned key RE-INSERTS it (it is dead)
    t.merge(spark, spark.createDataFrame([(1, "back")], "id long, v string"), "id")
    assert t.read(spark).where("id = 1").count() == 1
    assert t.count() == 97
    # the merge rewrote the dir holding id=1: its tombstones are
    # materialized, the OTHER dir's tombstones still apply
    assert sorted(
        r.id for r in t.read(spark).where("id IN (1,2,60,61)").collect()
    ) == [1]
    # COW delete on the other directory materializes its tombstones too
    t.delete(spark, "id = 99")
    assert t.count() == 96
    assert t.read(spark).where("id IN (60, 61)").count() == 0
    # full OPTIMIZE clears every tombstone from the manifest
    t.optimize(spark)
    snap = t.snapshot()
    assert "dvs" not in snap and "dv_rows" not in snap
    assert t.count() == 96
    assert t.read(spark).where("id IN (2, 60, 61, 99)").count() == 0


def test_delete_dv_changes_feed_and_restore(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), mode="overwrite")
    t.delete_dv(spark, "id = 2")
    feed = t.changes(spark, "id", 0, 1).collect()
    assert [(r.id, r.change_type, r.commit_version) for r in feed] == [
        (2, "delete", 1)
    ]
    # restore to v0 clears the tombstones: data state rolls back
    t.restore(0)
    assert t.count() == 3
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]
    snap = t.snapshot()
    assert "dvs" not in snap and "dv_rows" not in snap


def test_delete_dv_constraints_validate_live_rows_only(spark, tmp_path):
    from ceneton_database_tools_spark.sinks.txnlog import ConstraintViolation

    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (-5, "bad")]), mode="overwrite")
    with pytest.raises(ConstraintViolation):
        t.add_constraint(spark, "pos_id", "id > 0")
    t.delete_dv(spark, "id < 0")  # tombstone the violator
    assert t.add_constraint(spark, "pos_id", "id > 0") is not None


def test_delete_dv_vacuum_gc(spark, tmp_path):
    """A sidecar referenced by a retained manifest survives vacuum;
    once OPTIMIZE materializes the tombstones and history is trimmed,
    the sidecar is reclaimed."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.delete_dv(spark, "id = 1")
    assert _dv_sidecar_bytes(t) > 0
    removed = t.vacuum(retain_versions=1, retain_hours=0)
    assert all(not r.startswith("dv/") for r in removed), removed
    assert t.read(spark).count() == 1  # still merge-on-read
    t.optimize(spark) if len(t.snapshot()["files"]) > 1 else t.write(
        _df(spark, [(9, "z")]), mode="append"
    )
    t.optimize(spark)
    removed = t.vacuum(retain_versions=1, retain_hours=0)
    assert any(r.startswith("dv/") for r in removed), removed
    assert t.read(spark).count() in (1, 2)


def test_delete_dv_partitioned_table(spark, tmp_path):
    """DVs compose with partitioned layout: tombstones land per leaf,
    drop_partitions still proves from exact values, counts stay
    O(manifest)."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, ["A", "B"][i % 2], f"r{i}") for i in range(10)],
        "id long, seg string, v string",
    )
    t.write_partitioned(df, ("seg",), mode="overwrite")
    t.delete_dv(spark, "id = 4")  # lives in seg=A
    assert t.count() == 9
    assert sorted(r.id for r in t.read(spark).where("seg = 'A'").collect()) == [
        0, 2, 6, 8,
    ]
    t.drop_partitions([("seg", "=", "A")])
    assert t.count() == 5  # only seg=B remains; its rows untombstoned
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 3, 5, 7, 9]
    snap = t.snapshot()
    # the dropped partition took its tombstone accounting with it
    assert "dv_rows" not in snap or all(
        "seg=A" not in d for d in snap["dv_rows"]
    )


def test_delete_dv_sidecars_coalesce(spark, tmp_path):
    """Past the coalesce threshold the sidecar list collapses to ONE
    file — reads never union O(point-deletes-ever) sidecars."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 200).selectExpr("id", "CAST(id AS STRING) AS v")
    t.write(df, mode="overwrite")
    for i in range(TxnTable._DV_COALESCE_AT + 2):
        t.delete_dv(spark, f"id = {i}")
    snap = t.snapshot()
    assert len(snap["dvs"]) < TxnTable._DV_COALESCE_AT
    n_del = TxnTable._DV_COALESCE_AT + 2
    assert t.count() == 200 - n_del
    assert t.read(spark).where(f"id < {n_del}").count() == 0
    assert t.read(spark).count() == 200 - n_del
    # historical versions still read their own (pre-coalesce) dv sets
    assert t.count(3) == 197


def test_reorg_purge_rewrites_only_tombstoned_dirs(spark, tmp_path):
    """REORG/PURGE (Delta's ``REORG TABLE ... APPLY (PURGE)``): the
    pick is tombstone-carrying directories, whatever their size —
    untouched directories survive BY REFERENCE — and once nothing
    carries tombstones the dvs sidecar list drops, after which vacuum
    reclaims the sidecar files with their history."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 400).selectExpr("id", "CAST(id AS STRING) AS v")
    for i in range(4):
        t.write(
            df.where(f"id >= {i * 100} AND id < {(i + 1) * 100}"),
            mode="overwrite" if i == 0 else "append",
        )
    # nothing tombstoned: nothing to purge, no empty commit
    assert t.reorg_purge(spark) is None
    t.delete_dv(spark, "id IN (5, 105)")  # tombstones in dirs 0 and 1
    files_before = list(t.snapshot()["files"])
    assert len(t.snapshot()["dv_rows"]) == 2
    v = t.reorg_purge(spark)
    assert v is not None
    assert t.history()[0]["op"] == "reorg"
    snap = t.snapshot()
    # the two untombstoned dirs carried by reference; the two
    # tombstoned ones rewrote (one output each: singleton bins)
    assert len(set(files_before) & set(snap["files"])) == 2
    assert len(snap["files"]) == 4
    assert "dvs" not in snap and "dv_rows" not in snap
    assert t.count() == 398
    assert t.read(spark).where("id IN (5, 105)").count() == 0
    assert t.read(spark).count() == 398
    # time travel still reaches the merge-on-read layout
    assert t.count(v - 1) == 398
    assert len(t.snapshot(v - 1)["dvs"]) == 1
    # purge is idempotent: a clean table has nothing to rewrite
    assert t.reorg_purge(spark) is None


def test_reorg_purge_drops_fully_tombstoned_dir(spark, tmp_path):
    """A directory whose every row is tombstoned purges to NOTHING —
    dropped from the manifest with no replacement directory (Delta
    drops a fully-deleted file the same way)."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 200).selectExpr("id", "CAST(id AS STRING) AS v")
    t.write(df.where("id < 100"), mode="overwrite")
    t.write(df.where("id >= 100"), mode="append")
    dir0 = t.snapshot()["files"][0]
    t.delete_dv(spark, "id >= 100")
    assert t.count() == 100
    v = t.reorg_purge(spark)
    assert v is not None
    snap = t.snapshot()
    assert snap["files"] == [dir0], "dead directory must drop, not rewrite"
    assert "dvs" not in snap and "dv_rows" not in snap
    assert t.count() == 100
    assert t.read(spark).count() == 100


def test_reorg_purge_bounded_pass_keeps_remaining_dvs(spark, tmp_path):
    """``max_picked`` bounds one purge pass in commit order; a pass
    that leaves a tombstoned directory alive must keep the sidecar
    list (its tombstones still apply). Loop-until-None completes the
    purge, exactly like bounded optimize sweeps."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.range(0, 300).selectExpr("id", "CAST(id AS STRING) AS v")
    for i in range(3):
        t.write(
            df.where(f"id >= {i * 100} AND id < {(i + 1) * 100}"),
            mode="overwrite" if i == 0 else "append",
        )
    t.delete_dv(spark, "id IN (10, 210)")  # dirs 0 and 2
    v1 = t.reorg_purge(spark, max_picked=1)
    assert v1 is not None
    snap1 = t.snapshot()
    assert len(snap1["dv_rows"]) == 1, "one tombstoned dir must remain"
    assert snap1.get("dvs"), "a live tombstone's sidecar list was dropped"
    assert t.count() == 298
    while t.reorg_purge(spark, max_picked=1) is not None:
        pass
    snap2 = t.snapshot()
    assert "dvs" not in snap2 and "dv_rows" not in snap2
    assert t.count() == 298
    assert t.read(spark).where("id IN (10, 210)").count() == 0


def test_reorg_purge_partitioned_table(spark, tmp_path):
    """Purge is partition-preserving: the rewritten leaf keeps exact
    partition values in the manifest, so drop_partitions' metadata
    proof still works afterwards."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, ["A", "B"][i % 2], f"r{i}") for i in range(10)],
        "id long, seg string, v string",
    )
    t.write_partitioned(df, ("seg",), mode="overwrite")
    t.delete_dv(spark, "id = 4")  # lives in seg=A
    v = t.reorg_purge(spark)
    assert v is not None
    snap = t.snapshot()
    assert "dvs" not in snap
    assert set(snap["parts"]) == set(snap["files"]), (
        "rewritten leaf lost its partition values"
    )
    assert t.count() == 9
    t.drop_partitions([("seg", "=", "A")])
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 3, 5, 7, 9]


def test_changes_pre_image_is_live_after_dv_tombstones(spark, tmp_path):
    """A row tombstoned by delete_dv is reported as 'delete' exactly
    ONCE. When a later COW rewrite (delete / optimize) removes the
    directory that physically still holds the tombstoned bytes, the
    feed's pre-image must be the LIVE view at the prior version — a
    raw read of the removed directory would resurrect the tombstoned
    row and emit a spurious duplicate 'delete'."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), mode="overwrite")
    v_dv = t.delete_dv(spark, "id = 2")
    # COW delete of id=3 rewrites the directory (still carrying row 2's
    # bytes) — its change set is ONLY its own victim
    v_del = t.delete(spark, "id = 3")
    got = {
        (r.id, r.change_type)
        for r in t.changes(spark, "id", v_del - 1, v_del).collect()
    }
    assert got == {(3, "delete")}, got
    # the whole-range feed reports id=2 deleted exactly once, at v_dv
    feed = [
        (r.id, r.change_type, r.commit_version)
        for r in t.changes(spark, "id", 0, v_del).collect()
        if r.id == 2
    ]
    assert feed == [(2, "delete", v_dv)], feed
    # and OPTIMIZE — the documented compaction for tombstone-heavy
    # tables — contributes nothing even when it drops dv'd directories
    t2 = TxnTable(str(tmp_path / "t2"))
    t2.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t2.write(_df(spark, [(3, "c")]), mode="append")
    t2.delete_dv(spark, "id = 1")
    v_opt = t2.optimize(spark)
    assert t2.changes(spark, "id", v_opt - 1, v_opt).count() == 0


def test_commit_store_seam_drives_every_claim(spark, tmp_path):
    """The commit protocol runs entirely through the CommitStore seam
    (PosixCommitStore.put_if_absent): a store that loses the first N
    claims makes every write path rebase and retry — the behavior an
    object-store backend's conditional put would exercise — and a
    recording store proves no commit bypasses the seam."""
    from ceneton_database_tools_spark.sinks.txnlog import PosixCommitStore

    class FlakyStore(PosixCommitStore):
        def __init__(self, lose_first: int):
            self.remaining = lose_first
            self.claims: list[str] = []

        def put_if_absent(self, path: str, data: bytes) -> bool:
            self.claims.append(os.path.basename(path))
            if self.remaining > 0:
                self.remaining -= 1
                return False  # simulated lost race / failed cond-put
            return super().put_if_absent(path, data)

    store = FlakyStore(lose_first=2)
    t = TxnTable(str(tmp_path / "t"), store=store)
    v = t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    assert v == 0 and t.count() == 2
    # two lost claims -> three attempts for v0; the winning claim and
    # every later commit all went through the seam
    assert store.claims[:3] == ["00000000000.json"] * 3
    t.delete(spark, "id = 1")
    t.restore(0)
    t.write(_df(spark, [(3, "c")]), mode="append")
    assert [c for c in store.claims if c.endswith(".json")] == [
        "00000000000.json"
    ] * 3 + ["00000000001.json", "00000000002.json", "00000000003.json"]
    assert t.count() == 3 and t.latest_version() == 3


def test_table_properties_drive_commit_time_cdc(spark, tmp_path):
    """enableChangeDataFeed as a TABLE PROPERTY: set_properties commits
    policy as a pure-manifest op, every later delete()/merge() defaults
    to staging _change_data sidecars, an explicit cdc=False opts one
    commit out, and properties ride every commit (incl. restore)."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(_df(spark, [(i, f"r{i}") for i in range(6)]), mode="overwrite")
    with pytest.raises(FileNotFoundError):
        TxnTable(str(tmp_path / "none")).set_properties({"x": 1})
    v = t.set_properties({"enableChangeDataFeed": True})
    assert v == 1 and t.snapshot()["op"] == "set_properties"
    assert t.properties() == {"enableChangeDataFeed": True}
    # policy commit carries the file set untouched
    assert t.snapshot()["files"] == t.snapshot(0)["files"]
    # delete/merge now stage cdc WITHOUT the explicit argument
    t.delete(spark, "id = 1")
    assert t.snapshot().get("cdc"), "property did not default cdc on"
    t.merge(spark, _df(spark, [(2, "upd"), (100, "new")]), key="id")
    assert t.snapshot().get("cdc")
    feed = {
        (r.id, r.change_type)
        for r in t.changes(spark, "id", 1, 3).collect()
    }
    assert feed == {
        (1, "delete"),
        (2, "update_preimage"),
        (2, "update_postimage"),
        (100, "insert"),
    }
    # explicit opt-out wins for one commit
    t.delete(spark, "id = 0", cdc=False)
    assert t.snapshot().get("cdc") is None
    # properties survive rewrites and restore; unset removes
    t.restore(2)
    assert t.properties() == {"enableChangeDataFeed": True}
    assert t.set_properties({"enableChangeDataFeed": True}) is None  # no-op
    t.set_properties({"enableChangeDataFeed": None})
    assert t.properties() == {}


def test_stats_null_counts_prune_is_null(spark, tmp_path):
    """Stats entries record a NULL COUNT third element (Delta's
    nullCount) from every producer — API write, partitioned write —
    so IS NULL prunes directories provably free of nulls, IS NOT NULL
    still prunes all-null directories, and legacy 2-element entries
    never prove a null predicate."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("v",))
    t.write(_df(spark, [(1, "a"), (2, None)]), mode="overwrite")
    t.write(_df(spark, [(3, "b"), (4, "c")]), mode="append")
    snap = t.snapshot()
    assert sorted(s["v"][2] for s in snap["stats"].values()) == [0, 1]
    kept, skipped = t.prune([("v", "IS NULL", None)])
    assert (len(kept), len(skipped)) == (1, 1)
    # legacy 2-element entry: no proof either way
    assert TxnTable._dir_may_match({"v": ["a", "c"]}, [("v", "IS NULL", None)])
    assert not TxnTable._dir_may_match(
        {"v": ["a", "c", 0]}, [("v", "IS NULL", None)]
    )
    # partitioned: the NULL partition's leaf records all-null counts
    t2 = TxnTable(str(tmp_path / "t2"), stats_cols=("x",))
    t2.write_partitioned(
        spark.createDataFrame(
            [(1, "A", 5), (2, None, None), (3, "A", None)],
            "id long, seg string, x long",
        ),
        ("seg",),
        mode="overwrite",
    )
    stats = t2.snapshot()["stats"]
    by_seg = {s["seg"][0]: s for s in stats.values()}
    assert by_seg["A"]["seg"][2] == 0 and by_seg["A"]["x"][2] == 1
    assert by_seg[None]["seg"] == [None, None, 1]
    k, s = t2.prune([("seg", "IS NULL", None)])
    assert (len(k), len(s)) == (1, 1)


# -- MERGE schema evolution + OPTIMIZE ZORDER (round 11) -------------------


def test_merge_schema_evolution_rules(spark, tmp_path):
    """merge(merge_schema=True) follows the append-path evolution rules
    exactly: new columns append nullable, omitted columns read NULL,
    retypes refuse, and a name retired by drop_column cannot revive."""
    t = TxnTable(str(tmp_path))
    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.write(base, mode="overwrite")
    wide = spark.range(5, 15).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.format_string("x%d", "id").alias("tag"),
    )
    # refuses without the flag, nothing committed
    with pytest.raises(SchemaMismatch):
        t.merge(spark, wide, key="k")
    assert t.latest_version() == 0
    v1 = t.merge(spark, wide, key="k", merge_schema=True)
    assert v1 == 1
    got = {r["k"]: (r["v"], r["tag"]) for r in t.read(spark).collect()}
    assert got[0] == (0, None)  # survivor: NULL-filled new column
    assert got[7] == (21, "x7")  # matched: updated + tagged
    assert got[14] == (42, "x14")  # inserted
    assert len(got) == 15
    # retype refuses even with the flag
    with pytest.raises(SchemaMismatch, match="retype"):
        t.merge(
            spark,
            wide.withColumn("v", F.lit("s")),
            key="k",
            merge_schema=True,
        )
    # a retired name cannot revive through MERGE either
    t.drop_column("tag")
    with pytest.raises(SchemaMismatch, match="retired"):
        t.merge(spark, wide, key="k", merge_schema=True)


def test_merge_schema_evolution_cdc_unified(spark, tmp_path):
    """A cdc=True evolving merge stages its change rows under the
    UNIFIED schema (pre-images NULL-fill the new column), so the
    streaming change feed crossing the commit stays well-typed."""
    t = TxnTable(str(tmp_path))
    t.write(
        spark.range(4).select(F.col("id").alias("k"), F.lit(1).alias("v")),
        mode="overwrite",
    )
    upd = spark.range(2, 6).select(
        F.col("id").alias("k"),
        F.lit(9).alias("v"),
        F.lit("n").alias("note"),
    )
    t.merge(spark, upd, key="k", merge_schema=True, cdc=True)
    cdc_rel = t.snapshot().get("cdc")
    assert cdc_rel
    import os as _os

    cdf = spark.read.parquet(_os.path.join(str(tmp_path), cdc_rel))
    assert set(cdf.columns) == {"k", "v", "note", "_change_type"}
    by_type = {
        r["_change_type"]: r["cnt"]
        for r in cdf.groupBy("_change_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_type == {
        "update_preimage": 2,
        "update_postimage": 2,
        "insert": 2,
    }
    # pre-images carry NULL for the evolved column
    pres = cdf.where("_change_type = 'update_preimage'").collect()
    assert all(r["note"] is None for r in pres)


def test_optimize_zorder_refusals_and_identity(spark, tmp_path):
    t = TxnTable(str(tmp_path))
    df = spark.range(1000).select(
        F.col("id").alias("a"),
        ((F.col("id") * 37) % 1000).alias("b"),
    )
    t.write(df, mode="overwrite")
    with pytest.raises(ValueError, match="exactly 2"):
        t.optimize_zorder(spark, ("a",))
    with pytest.raises(ValueError, match="buckets"):
        t.optimize_zorder(spark, ("a", "b"), buckets=1)
    before = sorted(t.read(spark).collect())
    v = t.optimize_zorder(spark, ("a", "b"), buckets=8)
    assert v == 1 and t.snapshot()["op"] == "optimize"
    assert sorted(t.read(spark).collect()) == before
    assert len(t.snapshot()["files"]) == 8
    # zorder stats recorded on BOTH dims even without stats_cols
    st = t.snapshot()["stats"]
    assert all({"a", "b"} <= set(cols) for cols in st.values())
    # partitioned tables refuse
    tp = TxnTable(str(tmp_path / "p"))
    tp.write_partitioned(
        spark.range(10).select(
            F.col("id").alias("a"), (F.col("id") % 2).alias("p")
        ),
        partition_by=("p",),
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="partitioned"):
        tp.optimize_zorder(spark, ("a", "p"))


def test_optimize_zorder_materializes_tombstones(spark, tmp_path):
    """ZORDER over a table with deletion vectors materializes the
    tombstones (live rows only land) and drops the sidecar list."""
    t = TxnTable(str(tmp_path))
    t.write(
        spark.range(100).select(
            F.col("id").alias("a"), (F.col("id") % 10).alias("b")
        ),
        mode="overwrite",
    )
    t.delete_dv(spark, "a < 10")
    assert t.count() == 90
    t.optimize_zorder(spark, ("a", "b"), buckets=4)
    snap = t.snapshot()
    assert not snap.get("dvs") and t.count() == 90
    assert t.read(spark).where("a < 10").count() == 0


def test_update_where_constraints_and_mapping(spark, tmp_path):
    """UPDATE validates the post-image against CHECK constraints (a
    violating SET commits nothing), and composes with column mapping
    (rename first, update under the new name, pre-rename rows rewrite
    correctly)."""
    t = TxnTable(str(tmp_path))
    t.write(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("bal")
        ),
        mode="overwrite",
    )
    from ceneton_database_tools_spark.sinks.txnlog import ConstraintViolation

    t.add_constraint(spark, "nonneg", "bal >= 0")
    before = t.latest_version()
    with pytest.raises(ConstraintViolation):
        t.update(spark, set={"bal": "CAST(-1 AS BIGINT)"}, where="k < 5")
    assert t.latest_version() == before  # nothing committed
    # non-violating update passes the constraint
    t.update(spark, set={"bal": "bal + CAST(100 AS BIGINT)"}, where="k < 5")
    got = {r["k"]: r["bal"] for r in t.read(spark).collect()}
    assert got[0] == 100 and got[4] == 108 and got[5] == 10
    # through a rename: predicate and SET use the NEW logical name,
    # the touched directory physically carries the old one
    t.drop_constraint("nonneg")
    t.rename_column("bal", "balance")
    t.update(
        spark, set={"balance": "CAST(0 AS BIGINT)"}, where="balance > 100"
    )
    got = {r["k"]: r["balance"] for r in t.read(spark).collect()}
    assert got[0] == 100 and got[4] == 0 and got[19] == 38


def test_update_cdc_streams_through_change_feed(spark, tmp_path):
    """A cdc=True UPDATE's sidecar streams through readchangefeed as
    pre/post-image rows, like merge."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )

    register_txn_source(spark)
    t = TxnTable(str(tmp_path))
    t.write(
        spark.range(6).select(
            F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
        ),
        mode="overwrite",
    )
    t.update(spark, set={"v": "CAST(9 AS BIGINT)"}, where="k >= 4", cdc=True)
    q = (
        spark.readStream.format("txntable")
        .option("path", str(tmp_path))
        .option("readchangefeed", "true")
        .option("startingversion", "0")
        .load()
        .writeStream.format("memory")
        .queryName("upd_cdf")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT k, v, change_type FROM upd_cdf WHERE change_type LIKE 'update%'"
        " ORDER BY change_type, k"
    ).collect()
    # lexicographic: 'update_postimage' sorts before 'update_preimage'
    assert [(r["k"], r["v"], r["change_type"]) for r in rows] == [
        (4, 9, "update_postimage"),
        (5, 9, "update_postimage"),
        (4, 1, "update_preimage"),
        (5, 1, "update_preimage"),
    ]


def test_row_level_rewrites_preserve_partition_metadata(spark, tmp_path):
    """delete/update/merge on a partitioned table stage their rewrite
    as per-partition leaves with exact manifest values, so
    drop_partitions' two-sided proof keeps working WITHOUT an optimize
    repair (round-11: previously the rewrite directory carried no
    partition values and drop_partitions raised)."""
    t = TxnTable(str(tmp_path))
    df = spark.range(40).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    t.write_partitioned(df, partition_by=("p",), mode="overwrite")
    # COW delete: only partitions containing victims rewrite
    t.delete(spark, "k < 4")  # victims live in every partition (k%4)
    snap = t.snapshot()
    assert all("p" in vals for vals in snap["parts"].values())
    assert t.read(spark).count() == 36
    # update: rewrite leaves carry exact values too
    t.update(spark, set={"v": "CAST(0 AS BIGINT)"}, where="k >= 36")
    snap = t.snapshot()
    assert set(snap["files"]) == set(snap["parts"])
    # merge: upsert + inserts through the partitioned layout
    src = spark.range(38, 44).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        F.lit(99).cast("long").alias("v"),
    )
    t.merge(spark, src, key="k")
    snap = t.snapshot()
    assert set(snap["files"]) == set(snap["parts"])
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got[39] == 99 and got[43] == 99 and got[10] == 20
    # the proof: a metadata-only partition drop works right after
    # row-level rewrites, with no optimize in between
    v = t.drop_partitions([("p", "=", 1)])
    assert v is not None
    assert t.read(spark).where("p = 1").count() == 0
    assert t.read(spark).where("p = 0").count() > 0


def test_partitioned_update_stats_prune_after_rewrite(spark, tmp_path):
    """Rewrite leaves re-measure their stats columns, so manifest
    pruning stays exact after a partitioned UPDATE."""
    t = TxnTable(str(tmp_path), stats_cols=("v",))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).alias("p"),
        F.col("id").alias("v"),
    )
    t.write_partitioned(df, partition_by=("p",), mode="overwrite")
    t.update(
        spark,
        set={"v": "v + CAST(1000 AS BIGINT)"},
        where="v >= 90 AND p = 0",
    )
    kept, skipped = t.prune([("v", ">=", 1000)])
    # the untouched p=1 leaf (v <= 99) is provably irrelevant; the
    # rewritten p=0 leaf spans [0, 1098] and must survive
    assert skipped, "stats should prune the untouched leaf"
    assert (
        t.read_pruned(spark, [("v", ">=", 1000)]).where("v >= 1000").count()
        == 5
    )


def test_row_level_probe_preprunes_with_manifest_stats(spark, tmp_path):
    """delete/update/delete_dv pre-prune their PROBE scan with the
    manifest's stats proof: a provably-no-match predicate commits
    nothing and runs NO Spark job; a localized predicate probes only
    the candidate directories (round 11 — previously every row-level
    op probe-scanned the whole table)."""
    t = TxnTable(str(tmp_path), stats_cols=("k",))
    for i in range(4):
        t.write(
            spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ),
            mode="overwrite" if i == 0 else "append",
        )
    # (a) provably-empty predicates: None, zero jobs
    real = TxnTable._live_keyed

    def _boom(self, *a, **kw):
        raise AssertionError("probe ran a scan despite a stats proof")

    TxnTable._live_keyed = _boom
    try:
        assert t.delete(spark, "k >= 10000") is None
        assert t.update(spark, set={"v": "v"}, where="k < 0") is None
        assert t.delete_dv(spark, "k >= 10000") is None
    finally:
        TxnTable._live_keyed = real
    assert t.latest_version() == 3  # nothing committed
    # (b) a localized predicate probes ONLY the candidate directories
    seen: list[list[str]] = []

    def _spy(self, spark_, snap_, rels=None):
        seen.append(sorted(rels or []))
        return real(self, spark_, snap_, rels)

    TxnTable._live_keyed = _spy
    try:
        v = t.delete(spark, "k >= 350")
    finally:
        TxnTable._live_keyed = real
    assert v == 4
    # probe saw exactly one candidate dir (the [300, 400) commit);
    # later calls (rewrite read) may differ, so check the FIRST
    assert len(seen[0]) == 1
    assert t.read(spark).count() == 350


def test_merge_probe_preprunes_with_key_proof(spark, tmp_path):
    """A bounded-key MERGE pre-prunes its probe: directories whose
    stats range admits no update key drop out of the scan, and a key
    set provably absent everywhere skips the probe job entirely
    (insert-only merge with zero table scans)."""
    t = TxnTable(str(tmp_path), stats_cols=("k",))
    for i in range(4):
        t.write(
            spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ),
            mode="overwrite" if i == 0 else "append",
        )
    real = TxnTable._live_keyed
    seen: list[list[str]] = []

    def _spy(self, spark_, snap_, rels=None):
        seen.append(sorted(rels or []))
        return real(self, spark_, snap_, rels)

    # keys confined to the [200, 300) commit: probe sees ONE candidate
    src = spark.range(250, 260).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    TxnTable._live_keyed = _spy
    try:
        t.merge(spark, src, key="k")
    finally:
        TxnTable._live_keyed = real
    assert len(seen[0]) == 1
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got[250] == 0 and got[199] == 398 and len(got) == 400
    # keys provably absent everywhere: probe job skipped, pure insert
    far = spark.range(9000, 9005).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
    )
    def _boom(self, *a, **kw):
        raise AssertionError("probe ran despite an absent-key proof")

    TxnTable._live_keyed = _boom
    try:
        t.merge(spark, far, key="k")
    finally:
        TxnTable._live_keyed = real
    assert t.read(spark).count() == 405
    assert t.snapshot()["op"] == "merge"


# -- round 12: typed probe proof (ADVICE r11 high) ------------------------


def test_probe_typed_timestamp_literal_no_false_skip(spark, tmp_path):
    """ADVICE r11 (high): timestamp stats are recorded as
    str(datetime) ('2020-06-01 12:00:00'); a retention predicate
    spelled with the ISO 'T' separator lexicographically sorts ABOVE
    every same-day stat ('T' > ' '), so the untyped proof skipped the
    directory while Spark's cast-based residual matched its rows —
    delete/update silently left victims behind. The typed proof
    re-encodes the literal to the stats' own encoding: no false skip,
    and the out-of-range directory still prunes."""
    import datetime as dt

    t = TxnTable(str(tmp_path / "t"), stats_cols=("ts",))
    may = spark.createDataFrame(
        [(10 + i, dt.datetime(2020, 5, 1, 0, 0, 0)) for i in range(3)],
        "id long, ts timestamp",
    )
    jun = spark.createDataFrame(
        [
            (i, dt.datetime(2020, 6, 1, 12, 0, 0) + dt.timedelta(minutes=i))
            for i in range(3)
        ],
        "id long, ts timestamp",
    )
    t.write(may, mode="overwrite")
    t.write(jun, mode="append")
    may_dir = t.snapshot(0)["files"][0]
    jun_dir = (set(t.snapshot(1)["files"]) - {may_dir}).pop()
    cand = t._probe_candidates(t.snapshot(), "ts >= '2020-06-01T00:00:00'")
    assert jun_dir in cand          # the bug: untyped proof skipped this
    assert may_dir not in cand      # typed normalization keeps proof power
    # end-to-end: the delete actually removes the June rows
    t.delete(spark, "ts >= '2020-06-01T00:00:00'")
    assert sorted(r.id for r in t.read(spark).collect()) == [10, 11, 12]


def test_probe_string_column_int_literal_no_false_skip(spark, tmp_path):
    """ADVICE r11 (high): Spark coerces '05' = 5 to TRUE on a string
    column, but the untyped proof compared '5' against lexicographic
    string bounds (and hashed the int into a bloom built from string
    values) and could skip the directory. Literal-kind ≠ declared
    type now means NO PROOF: the directory is kept and the delete
    lands."""
    t = TxnTable(
        str(tmp_path / "t"), stats_cols=("code",), bloom_cols=("code",)
    )
    t.write(
        spark.createDataFrame(
            [(1, "05"), (2, "07")], "id long, code string"
        ),
        mode="overwrite",
    )
    snap = t.snapshot()
    assert t._probe_candidates(snap, "code = 5") == list(snap["files"])
    t.delete(spark, "code = 5")
    assert [r.id for r in t.read(spark).collect()] == [2]
    # a string literal on the string column still proves (and prunes)
    assert t._probe_candidates(t.snapshot(), "code = 'zz'") == []


def test_probe_prunes_on_parsable_conjuncts(spark, tmp_path):
    """VERDICT r11 #3: a function-bearing WHERE (outside the option
    grammar) used to keep every directory; the lenient parse now
    prunes on its grammar-parsable conjuncts while the function
    factor stays an always-may-match unknown."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    t.write(_df(spark, [(i, "a") for i in range(10)]), mode="overwrite")
    t.write(
        _df(spark, [(100 + i, "b") for i in range(10)]), mode="append"
    )
    lo_dir = t.snapshot(0)["files"][0]
    snap = t.snapshot()
    cand = t._probe_candidates(snap, "id >= 100 AND pmod(id, 2) = 0")
    assert lo_dir not in cand and len(cand) == 1
    # a BETWEEN fragment must NOT be trusted as a conjunct
    assert t._probe_candidates(snap, "id BETWEEN 200 AND 300") == list(
        snap["files"]
    )
    # end-to-end: function-bearing delete removes exactly the evens >= 100
    t.delete(spark, "id >= 100 AND pmod(id, 2) = 0")
    assert sorted(r.id for r in t.read(spark).collect()) == list(
        range(10)
    ) + [101, 103, 105, 107, 109]


def test_optimize_zorder_refuses_non_integral_columns(spark, tmp_path):
    """ADVICE r11: non-integral z-order columns either TypeError
    mid-operation (timestamp/string) or silently degrade the Morton
    layout (double). Refused loudly before any job runs."""
    t = TxnTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, 2, "x", 2.5)], "a long, b int, s string, d double"
        ),
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="integral"):
        t.optimize_zorder(spark, ("a", "s"))
    with pytest.raises(ValueError, match="integral"):
        t.optimize_zorder(spark, ("d", "a"))
    with pytest.raises(ValueError, match="integral"):
        t.optimize_zorder(spark, ("a", "missing"))
    assert t.latest_version() == 0  # nothing committed by the refusals


def test_streamed_delta_append_never_materializes_manifest(
    spark, tmp_path, monkeypatch
):
    """VERDICT r11 #2: committing an append onto a CHECKPOINTED
    manifest must stream the prior sidecar batch-by-batch — never
    rebuild the per-directory dicts on the driver. Traced via
    load_manifest: the whole append plans from the O(1) stub."""
    from ceneton_database_tools_spark.sinks import txnlog as mod

    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",), checkpoint_at=4)
    for i in range(5):
        t.write(_df(spark, [(i, "x")]), mode="append")
    with open(t._manifest_path(t.latest_version())) as f:
        assert "files_checkpoint" in json.load(f)
    calls: list[int] = []
    real = mod.load_manifest

    def traced(log_dir, version):
        calls.append(version)
        return real(log_dir, version)

    from ceneton_database_tools_spark.sinks.txnlog import ConstraintViolation

    monkeypatch.setattr(mod, "load_manifest", traced)
    v = t.write(_df(spark, [(99, "z")]), mode="append")
    assert calls == [], "append materialized a manifest on the commit path"
    monkeypatch.undo()
    # the streamed carry committed an EXACT snapshot: every prior dir
    # survives, row counts and stats carried, the new dir measured
    snap = t.snapshot(v)
    assert len(snap["files"]) == 6
    assert t.count() == 6
    kept, _ = t.prune([("id", "=", 99)])
    assert len(kept) == 1
    assert sorted(r.id for r in t.read(spark).collect()) == [
        0, 1, 2, 3, 4, 99,
    ]
    # constraints/props still ride the streamed commit verbatim
    t.add_constraint(spark, "id_nonneg", "id >= 0")
    t.write(_df(spark, [(7, "y")]), mode="append")
    with pytest.raises(ConstraintViolation):
        t.write(_df(spark, [(-1, "bad")]), mode="append")
    assert t.snapshot()["constraints"] == {"id_nonneg": "id >= 0"}


def test_commit_race_on_checkpointed_manifest_rebases(spark, tmp_path):
    """VERDICT r11 #5: the raced-protocol tests predate checkpointed
    manifests — two writers racing the same version on a CHECKPOINTED
    table must leave exactly one winner, the loser rebases by
    STREAMING the winner's checkpoint, and no manifest/sidecar is
    corrupted (the loser's pre-written orphan stays unreferenced)."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",), checkpoint_at=3)
    for i in range(4):
        t.write(_df(spark, [(i, "x")]), mode="append")
    with open(t._manifest_path(3)) as f:
        assert "files_checkpoint" in json.load(f)
    real = t._try_commit_streamed
    stolen = {"done": False}

    def steal(version, stub_m, prior_cp, adds, drop=frozenset()):
        if not stolen["done"]:
            stolen["done"] = True
            other = TxnTable(t.path, stats_cols=("id",), checkpoint_at=3)
            got = other.write(_df(spark, [(100, "race")]), mode="append")
            assert got == version
        return real(version, stub_m, prior_cp, adds, drop)

    t._try_commit_streamed = steal
    v = t.write(_df(spark, [(200, "mine")]), mode="append")
    assert v == 5  # v4 stolen, rebased onto it
    assert sorted(r.id for r in t.read(spark).collect()) == [
        0, 1, 2, 3, 100, 200,
    ]
    snap = t.snapshot()
    assert len(snap["files"]) == 6
    # exactly one checkpoint is referenced per version; the loser's
    # first attempt pre-wrote a sidecar for the CONTESTED version (4)
    # and UNLINKED it on the lost coin flip (ADVICE r12) — contended
    # writers must not accumulate full-size orphans until truncate_log
    with open(t._manifest_path(4)) as f:
        cp4 = json.load(f)["files_checkpoint"]
    orphans = [
        f
        for f in os.listdir(t.log_dir)
        if f.startswith(f"{4:011d}.") and f.endswith(".checkpoint.parquet")
        and f != cp4
    ]
    assert orphans == [], "loser must unlink its own unreferenced sidecar"
    # pruning proves from the winner chain's streamed checkpoint
    kept, _ = t.prune([("id", "=", 200)])
    assert len(kept) == 1


def test_rename_column_races_append_on_checkpointed_table(spark, tmp_path):
    """VERDICT r11 #5: a column-mapping rename lands between an
    append's snapshot read and its commit. The append must lose the
    version race, rebase onto the renamed table, and the committed
    manifest must carry the rename history — old directories keep
    serving rows under the new logical name, streamed carry included."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",), checkpoint_at=3)
    for i in range(4):
        t.write(_df(spark, [(i, "x")]), mode="append")
    real = t._try_commit_streamed
    raced = {"done": False}

    def steal(version, stub_m, prior_cp, adds, drop=frozenset()):
        if not raced["done"]:
            raced["done"] = True
            other = TxnTable(t.path, stats_cols=("id",), checkpoint_at=3)
            assert other.rename_column("v", "label") == version
        return real(version, stub_m, prior_cp, adds, drop)

    t._try_commit_streamed = steal
    # the append stages under the OLD schema (id, v): after the rename
    # wins the race, the rebase re-checks the schema and must refuse —
    # silently landing a 'v' directory in a 'label' table would fork
    # the mapping
    with pytest.raises(SchemaMismatch):
        t.write(_df(spark, [(50, "stale")]), mode="append")
    # a writer reading the CURRENT schema appends cleanly
    ok = spark.createDataFrame([(50, "fresh")], "id long, label string")
    v = t.write(ok, mode="append")
    snap = t.snapshot(v)
    assert "column_names" in snap and "label" in snap["column_names"]
    got = {(r.id, r.label) for r in t.read(spark).collect()}
    assert (0, "x") in got and (50, "fresh") in got and len(got) == 5


def test_rename_partition_column_refused_by_design(spark, tmp_path):
    """VERDICT r11 #4, decided: renaming a PARTITION column stays a
    loud refusal (Delta refuses the same without a full rewrite). A
    metadata-only rename would need directory-name indirection — the
    hive-escaped directory names and the manifest's ``parts`` entries
    embed the physical name, and both the exact-equality partition
    proof and drop_partitions' two-sided proof read them — so the
    supported path is an overwrite under the new layout. This test
    PINS the refusal and that nothing commits."""
    t = TxnTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, seg string, v long"
    )
    t.write_partitioned(df, ("seg",), mode="overwrite")
    v_before = t.latest_version()
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("seg", "segment")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("seg")
    assert t.latest_version() == v_before  # refusals commit nothing
    # the supported path: overwrite re-layouts under the new name
    t.write_partitioned(
        df.withColumnRenamed("seg", "segment"), ("segment",),
        mode="overwrite",
    )
    assert t.snapshot().get("partition_by") == ["segment"]
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]


def test_streamed_delete_update_on_checkpointed_manifest(
    spark, tmp_path, monkeypatch
):
    """Round 12 follow-through on VERDICT r11 #2: row-level delete()
    and update() on a CHECKPOINTED manifest run stub-planned
    end-to-end — the probe proof iterates the sidecar per record
    batch, the live scan takes the candidate list explicitly, and the
    commit streams the prior checkpoint minus the touched set. Traced:
    load_manifest is never called."""
    from ceneton_database_tools_spark.sinks import txnlog as mod

    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",), checkpoint_at=4)
    for i in range(6):
        t.write(
            _df(spark, [(i * 10 + j, "x") for j in range(10)]),
            mode="append",
        )
    with open(t._manifest_path(5)) as f:
        assert "files_checkpoint" in json.load(f)
    calls: list[int] = []
    real = mod.load_manifest

    def traced(log_dir, version):
        calls.append(version)
        return real(log_dir, version)

    monkeypatch.setattr(mod, "load_manifest", traced)
    # function-bearing predicate: prunes on the id >= 40 conjunct via
    # the lenient parse, streamed over the checkpoint
    v_del = t.delete(spark, "id >= 40 AND pmod(id, 2) = 0")
    v_upd = t.update(spark, set={"v": "'upd'"}, where="id = 7")
    assert calls == [], "row-level op materialized a manifest"
    monkeypatch.undo()
    assert (v_del, v_upd) == (6, 7)
    got = {(r.id, r.v) for r in t.read(spark).collect()}
    assert (7, "upd") in got and (7, "x") not in got
    ids = sorted(i for i, _ in got)
    assert ids == list(range(40)) + [41, 43, 45, 47, 49, 51, 53, 55, 57, 59]
    assert t.count() == len(ids)
    # the streamed commits stayed checkpointed and exact
    snap = t.snapshot()
    assert snap["op"] == "update"
    # delete dropped dirs 4+5 into one rewrite (6 -> 5); update swapped
    # dir 0 for its rewrite (still 5)
    assert len(snap["files"]) == 5
    # pruning still proves over the streamed checkpoints
    kept, _ = t.prune([("id", ">=", 55)])
    assert len(kept) == 1
    # time travel: the pre-delete snapshot is intact
    assert len(t.read(spark, 5).collect()) == 60
    # provably-empty predicates commit nothing, zero jobs (streamed
    # proof path)
    assert t.delete(spark, "id >= 1000") is None
    assert t.update(spark, set={"v": "'n'"}, where="id >= 1000") is None
    assert t.latest_version() == 7


def test_streamed_merge_delete_dv_on_checkpointed_manifest(
    spark, tmp_path, monkeypatch
):
    """merge() and delete_dv() on a CHECKPOINTED manifest also run
    stub-planned end-to-end: the key pre-prune and predicate probe
    iterate the sidecar per record batch, the merge commit streams
    the carry minus the touched set, and delete_dv patches the bounded
    touched dirs' tombstone counts IN the checkpoint stream. Traced:
    load_manifest is never called."""
    from ceneton_database_tools_spark.sinks import txnlog as mod

    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",), checkpoint_at=4)
    for i in range(6):
        t.write(
            _df(spark, [(i * 10 + j, "x") for j in range(10)]),
            mode="append",
        )
    calls: list[int] = []
    real = mod.load_manifest

    def traced(log_dir, version):
        calls.append(version)
        return real(log_dir, version)

    monkeypatch.setattr(mod, "load_manifest", traced)
    # bounded key set: the streamed probe prunes to the one directory
    # whose range admits id=5; id=100 matches nothing (pure insert)
    v_m = t.merge(spark, _df(spark, [(5, "M"), (100, "NEW")]), key="id")
    v_dv = t.delete_dv(spark, "id = 23")
    assert calls == [], "merge/delete_dv materialized a manifest"
    monkeypatch.undo()
    assert (v_m, v_dv) == (6, 7)
    got = {(r.id, r.v) for r in t.read(spark).collect()}
    assert (5, "M") in got and (100, "NEW") in got
    assert not any(i == 23 for i, _ in got)
    assert len(got) == 60  # 60 - 1 tombstoned + 1 insert
    assert t.count() == 60
    snap = t.snapshot()
    assert snap["op"] == "delete_dv" and snap["dvs"]
    assert sum(snap["dv_rows"].values()) == 1
    # merge swapped exactly the one touched dir (6 dirs before, the
    # rewrite replaces dir0 and adds nothing else: 5 kept + 1 staged)
    assert len(snap["files"]) == 6
    # insert-only merge on the checkpointed table: zero dirs rewritten
    before = set(t.snapshot()["files"])
    monkeypatch.setattr(mod, "load_manifest", traced)
    t.merge(spark, _df(spark, [(200, "I")]), key="id")
    assert calls == []
    monkeypatch.undo()
    after = t.snapshot()
    assert before <= set(after["files"]) and len(after["files"]) == 7
    # time travel: pre-merge snapshot intact
    assert len(t.read(spark, 5).collect()) == 60
    # a COW rewrite on the checkpointed table still materializes the
    # carried tombstone (delete touches the dv'd directory)
    t.delete(spark, "id >= 20 AND id < 30")
    assert sorted(i for i, _ in {(r.id, r.v) for r in t.read(spark).collect()}
                  if 20 <= i < 30) == []
    assert t.count() == 52  # 61 live - 9 more deleted (23 already gone)


def test_streamed_row_ops_respect_column_mapping(spark, tmp_path, monkeypatch):
    """Composition: a column-mapping rename on a CHECKPOINTED table,
    then streamed row-level ops under the NEW logical name. The rename
    itself is an admin op (it re-keys per-dir stats, so it
    materializes — acceptable); the subsequent update/delete must stay
    stub-planned, read pre-rename directories through the name
    history, and carry the mapping verbatim through the streamed
    commits."""
    from ceneton_database_tools_spark.sinks import txnlog as mod

    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",), checkpoint_at=4)
    for i in range(5):
        t.write(
            _df(spark, [(i * 10 + j, "x") for j in range(10)]),
            mode="append",
        )
    t.rename_column("v", "label")
    calls: list[int] = []
    real = mod.load_manifest

    def traced(log_dir, version):
        calls.append(version)
        return real(log_dir, version)

    monkeypatch.setattr(mod, "load_manifest", traced)
    t.update(spark, set={"label": "'u'"}, where="id = 12")
    t.delete(spark, "id = 44")
    assert calls == [], "mapped row-level op materialized a manifest"
    monkeypatch.undo()
    got = {(r.id, r.label) for r in t.read(spark).collect()}
    assert (12, "u") in got and (12, "x") not in got
    assert not any(i == 44 for i, _ in got)
    assert len(got) == 49
    snap = t.snapshot()
    assert "label" in snap.get("column_names", {})
    # pre-rename directories (ids 0-9 never rewritten) still serve
    # under the new logical name through the carried history
    assert (0, "x") in got


def test_write_clustered_observed_stats_exact(spark, tmp_path):
    """r14 internals change: per-bucket row counts and [min, max]
    stats ride the staging job as Observation metrics instead of a
    second full scan of the staged output. The observed values must be
    EXACTLY what a read-back of each staged directory computes — rows,
    min and max per stats column, for every bucket, including buckets
    that received an uneven share of a skewed key range."""
    t = TxnTable(str(tmp_path / "t"), stats_cols=("id",))
    # skewed: half the keys cluster at the bottom of the range so the
    # range partitioner produces unevenly sized buckets
    rows = [(i, f"r{i}") for i in range(50)] + [
        (1000 + 7 * i, f"s{i}") for i in range(50)
    ]
    t.write_clustered(_df(spark, rows), "id", buckets=4, mode="overwrite")
    m = t.snapshot(0)
    assert len(m["files"]) >= 2
    total = 0
    for rel in m["files"]:
        back = spark.read.parquet(os.path.join(str(tmp_path / "t"), rel))
        n = back.count()
        lo, hi = back.agg(F.min("id"), F.max("id")).first()
        assert m["rows"][rel] == n, rel
        assert m["stats"][rel]["id"] == [lo, hi], rel
        total += n
    assert total == len(rows)
