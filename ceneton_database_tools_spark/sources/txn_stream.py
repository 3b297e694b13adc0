"""Streaming AND batch faces over the transactional table — Delta's
table-streaming contract plus a pushdown-wired batch scan, re-expressed
with the Python DataSource API.

The :class:`~ceneton_database_tools_spark.sinks.txnlog.TxnTable` log
already gives a stream everything it needs, for free:

* OFFSETS. A committed version number is a perfect streaming offset:
  monotonic, dense (every commit claims current+1), and durable. The
  checkpoint stores ``{"version": N}``; a restart resumes at N+1.
* DETERMINISTIC REPLAY. Manifests and data directories are immutable,
  so re-reading the version range of a committed micro-batch after a
  crash yields byte-identical rows — the property the FMP file-stream
  source has to enforce with (size, mtime_ns) identity checks is
  structural here.
* INCREMENTAL READS. A manifest diff names exactly the directories a
  commit ADDED; a pure-append commit's added directories ARE its
  rows. The source never rescans the table — each micro-batch reads
  only the new commits' files, O(new data) at any table size.

This is the *distributed* stream-reader API (``DataSourceStreamReader``,
not ``Simple``): ``partitions(start, end)`` plans one input partition
per new parquet file driver-side, and ``read(partition)`` runs ON
EXECUTORS, yielding Arrow record batches straight out of pyarrow —
vectorized end-to-end, no per-row Python, no driver data channel. With
a ``write_clustered`` producer the per-file partitions inherit the
range clustering, so downstream keyed stages start pre-clustered.

SCHEMA EVOLUTION composes: a file written before a ``merge_schema``
commit lacks the evolved columns, and executors NULL-FILL them as
typed Arrow null arrays in declared order — the same by-name rule the
batch reader (``txnlog._read_dirs``) applies, so the stream and the
table never disagree about an evolved table's shape.

ADMISSION CONTROL: ``.option("maxversionspertrigger", N)`` bounds a
micro-batch at N commits (Delta's ``maxFilesPerTrigger`` shape at this
log's commit granularity). A running stream that falls behind — the
realistic backlog case — drains it as a sequence of bounded batches
instead of planning one micro-batch containing every missed commit.
Honest limitation: the FIRST batch planned after a (re)start is
uncapped, because Spark's Python streaming protocol calls
``latestOffset()`` before the reader learns its position (verified
call order: latestOffset → initialOffset → partitions; the protocol
exposes no ``latestOffset(start, limit)`` admission handshake) — the
floor is learned from ``initialOffset``/``partitions``/``commit`` and
every subsequent batch is bounded. Unset = unbounded.

Change-handling semantics follow Delta's streaming source:

* pure ``append`` commits stream their added directories;
* a non-append commit (``delete`` / ``merge`` / ``optimize`` /
  ``overwrite``) in the consumed range RAISES by default — an
  insert-only reader silently skipping a rewrite would miss or
  double-count rows;
* ``.option("ignoredeletes", "true")`` skips DELETE-ONLY commits
  (drop_partitions, dv-only deletes — nothing added, nothing to
  emit): Delta's documented ``ignoreDeletes``, the right opt-in for
  retention-deleted sources;
* ``.option("ignorechanges", "true")`` opts into Delta's documented
  ``ignoreChanges`` behavior instead: rewritten directories are
  re-emitted in full (downstream must tolerate re-delivered
  survivors, e.g. by keying on a primary key).

History bounds: streaming from versions dropped by ``truncate_log`` /
``vacuum`` fails loudly (the manifest is gone), exactly like streaming
a Delta table past its retention.

The BATCH face (``spark.read.format("txntable")``) makes the manifest's
data skipping reachable from the ordinary query surface: the declared
schema comes straight from the manifest (no hand-written DDL), and
``pushFilters`` receives Catalyst's pushed predicates, prunes whole
directories through ``TxnTable.prune`` (stats ranges + partition
values + bloom bitmaps) BEFORE planning, and hands every filter back
for Spark to re-apply — pruning is one-sided (kept ⊇ matching), so
correctness never depends on it. Pruning requires
``.option("pushdown", "true")``: Spark 4.1 caches one readInfo per
relation unkeyed by filters, so a filter-dependent partition plan from
one query can be silently reused by a later filterless query on the
same DataFrame — the option declares the load single-use; the default
plans every live directory and is reuse-proof (details on
:class:`TxnTableBatchReader`).

The reference has no streaming and no table format (its one sink is a
single JDBC load, ``sql.py:17-37``); this closes the loop the
exactly-once SINK (txnlog.write_idempotent) opened — the table now
streams in both directions and scans with skipping in batch.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as SqlT
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)


def _path_option(options: dict) -> str:
    """The ``path`` option as a local filesystem path. Catalog
    spellings hand the location through as a ``file:`` URI; the log
    code wants the plain path."""
    from urllib.parse import unquote, urlparse

    path = options.get("path", "")
    u = urlparse(path)
    if u.scheme == "file":
        return unquote(u.path)
    return path


class TxnFilePartition(InputPartition):
    """One parquet file of one committed directory. Carries the
    absolute path, the projected column order, each declared column's
    Arrow type (executors emit batches in declared-schema order,
    NULL-filling columns an old pre-evolution file lacks), and — when
    the snapshot's directory carries deletion vectors — the tombstone
    sidecar paths, so executors merge deleted rows out where the data
    is read instead of shipping tombstones through the driver."""

    def __init__(
        self,
        file_path: str,
        columns: tuple[str, ...],
        arrow_types: dict,
        rel_file: str = "",
        sidecars: tuple[str, ...] = (),
        dv_mode: str = "drop",
        dv_base: tuple[str, ...] = (),
        change_type: str = "",
        commit_version: int = -1,
        name_history: dict | None = None,
    ):
        self.file_path = file_path
        self.columns = columns
        self.arrow_types = arrow_types
        self.rel_file = rel_file
        self.sidecars = sidecars
        # change-feed fields: dv_mode "keep" emits ONLY the rows the
        # sidecars tombstone beyond dv_base (one commit's victims);
        # change_type/commit_version become constant output columns
        self.dv_mode = dv_mode
        self.dv_base = dv_base
        self.change_type = change_type
        self.commit_version = commit_version
        # column-mapping rename history of the governing snapshot —
        # executors resolve each logical column to the one historical
        # name this file physically carries (see _emit_file_batches)
        self.name_history = name_history


def _arrow_types_of(schema: SqlT.StructType) -> dict:
    """Declared Spark schema → {column: pyarrow.DataType}, resolved
    ONCE driver-side and shipped inside each input partition."""
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow = to_arrow_schema(schema)
    return {f.name: f.type for f in arrow}


def _dead_positions(sidecars: tuple[str, ...], rel_file: str):
    """This file's tombstoned row positions, read executor-side from
    the snapshot's deletion-vector sidecars. Tombstones key rows by
    ``(__file, __pos)`` where ``__file`` is the URI-encoded
    ``data/...`` file suffix Spark's ``_metadata.file_path`` emits;
    unquoting recovers the on-disk relative path, which is what the
    planner handed us — no encode-direction guessing. Sidecar bytes
    are O(deleted rows) and the list is coalesce-bounded, so this is
    a small local read per task, not a join."""
    from urllib.parse import unquote

    import pyarrow.parquet as pq

    dead: set[int] = set()
    for sc in sidecars:
        t = pq.read_table(sc, columns=["__file", "__pos"])
        for f, p in zip(
            t.column("__file").to_pylist(), t.column("__pos").to_pylist()
        ):
            if unquote(f) == rel_file:
                dead.add(int(p))
    return dead


def _emit_file_batches(
    file_path: str,
    columns: tuple[str, ...],
    arrow_types: dict,
    rel_file: str = "",
    sidecars: tuple[str, ...] = (),
    dv_mode: str = "drop",
    dv_base: tuple[str, ...] = (),
    name_history: dict | None = None,
) -> Iterator:
    """Yield one parquet file's record batches projected to declared
    order. Columns the file predates (schema evolution) are NULL-filled
    as typed Arrow null arrays — mirroring ``txnlog._read_dirs``'s
    by-name resolution, so old files stream instead of crashing.

    ``name_history`` is the snapshot's column-mapping rename history
    (``{logical: [current, ...older physical names]}``, see
    ``TxnTable.rename_column``): each file physically carries AT MOST
    one name from any history (renames are metadata-only and retired
    names are never re-added), so per file the logical column resolves
    to whichever historical name the footer actually holds — the Arrow
    analogue of ``_read_dirs``'s coalesce projection.

    Deletion vectors address rows by file position
    (``_metadata.row_index`` is the row's physical position, and
    ``iter_batches`` replays the file in the same physical order, so a
    running offset + one vectorized numpy membership test addresses
    every batch — no per-row Python). Two modes:

    * ``drop`` (snapshot reads): rows tombstoned by ``sidecars`` are
      removed — the live view.
    * ``keep`` (change-feed deletes): ONLY rows tombstoned by
      ``sidecars`` but NOT by ``dv_base`` are emitted — exactly one
      commit's victims, correct even after sidecar coalescing rewrote
      the list (new-set minus old-set is position arithmetic, not
      sidecar identity)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dead = _dead_positions(sidecars, rel_file) if sidecars else set()
    if dv_mode == "keep":
        dead = dead - _dead_positions(dv_base, rel_file)
    dead_arr = (
        np.fromiter(dead, dtype=np.int64, count=len(dead)) if dead else None
    )

    def _dv_select(batch, off: int):
        if dv_mode == "keep":
            if dead_arr is None:
                return batch.slice(0, 0)
            mask = np.isin(
                np.arange(off, off + batch.num_rows, dtype=np.int64), dead_arr
            )
            return batch.filter(pa.array(mask))
        if dead_arr is None:
            return batch
        mask = ~np.isin(
            np.arange(off, off + batch.num_rows, dtype=np.int64), dead_arr
        )
        return batch.filter(pa.array(mask))

    pf = pq.ParquetFile(file_path)
    have = set(pf.schema_arrow.names)
    hist = name_history or {}

    def _phys(c: str) -> str | None:
        # the physical name THIS file carries for logical column c:
        # exactly one of the name history is present (or none — the
        # file predates the column entirely and NULL-fills)
        for h in hist.get(c, (c,)):
            if h in have:
                return h
        return None

    phys_of = {c: _phys(c) for c in columns}
    want = [phys_of[c] for c in columns if phys_of[c] is not None]
    missing = [c for c in columns if phys_of[c] is None]
    if not want:
        # a file with NONE of the declared columns: emit its rows as
        # all-NULL tuples (count still matters), one batch
        n = pf.metadata.num_rows
        yield _dv_select(
            pa.RecordBatch.from_arrays(
                [pa.nulls(n, type=arrow_types[c]) for c in columns],
                names=list(columns),
            ),
            0,
        )
        return
    renamed = any(phys_of[c] not in (c, None) for c in columns)
    offset = 0
    for batch in pf.iter_batches(columns=want):
        if missing or renamed:
            by_name = dict(zip(batch.schema.names, batch.columns))
            out = pa.RecordBatch.from_arrays(
                [
                    by_name[phys_of[c]]
                    if phys_of[c] in by_name
                    else pa.nulls(batch.num_rows, type=arrow_types[c])
                    for c in columns
                ],
                names=list(columns),
            )
        else:
            # project to declared order; schema mismatches surface as
            # loud Arrow conversion errors, never silent column swaps
            out = batch.select(list(columns))
        yield _dv_select(out, offset)
        offset += batch.num_rows


def _manifest(table_path: str, version: int) -> dict:
    from ceneton_database_tools_spark.sinks.txnlog import load_manifest

    try:
        # load_manifest, not raw JSON: a checkpointed manifest keeps
        # its per-directory state in a parquet sidecar
        return load_manifest(os.path.join(table_path, "_txnlog"), version)
    except FileNotFoundError:
        raise RuntimeError(
            f"cannot stream version {version} of {table_path}: its manifest "
            "is gone (truncate_log/vacuum dropped it) — restart the query "
            "from a fresh checkpoint to begin at the current snapshot"
        ) from None


def _stub_of(table_path: str, version: int) -> dict:
    """One manifest's TABLE-LEVEL keys (the O(1) stub), with the same
    truncation error contract as :func:`_manifest`."""
    import json

    try:
        with open(
            os.path.join(table_path, "_txnlog", f"{version:011d}.json")
        ) as f:
            return json.load(f)
    except FileNotFoundError:
        raise RuntimeError(
            f"cannot stream version {version} of {table_path}: its manifest "
            "is gone (truncate_log/vacuum dropped it) — restart the query "
            "from a fresh checkpoint to begin at the current snapshot"
        ) from None


def _manifest_light(table_path: str, version: int) -> dict:
    """The streaming planner's view of one manifest WITHOUT the full
    per-directory decode: table-level keys verbatim, ``files`` from a
    dirs-only sidecar walk, ``dv_rows`` nonnull-only (O(tombstoned
    dirs)). stats/bloom cells are NOT materialized — the planner
    fetches the bounded per-commit delta's cells with
    :func:`_stats_blooms_for`. Inline manifests (below
    ``checkpoint_at``) are returned whole — already small."""
    stub = _stub_of(table_path, version)
    cp = stub.get("files_checkpoint")
    if cp is None:
        return _manifest(table_path, version)
    import pyarrow.parquet as pq

    m = dict(stub)
    m["_cp"] = os.path.join(table_path, "_txnlog", cp)
    files: list[str] = []
    dvr: dict[str, int] = {}
    for batch in pq.ParquetFile(m["_cp"]).iter_batches(
        columns=["dir", "dv_rows"]
    ):
        dirs = batch.column("dir").to_pylist()
        files.extend(dirs)
        for rel, v in zip(dirs, batch.column("dv_rows").to_pylist()):
            if v:
                dvr[rel] = int(v)
    m["files"] = files
    if dvr:
        m["dv_rows"] = dvr
    return m


def _stats_blooms_for(m: dict, rels) -> tuple[dict, dict]:
    """stats/bloom cells for JUST ``rels`` (a commit's bounded delta,
    or one snapshot pass): light manifests stream the sidecar and
    decode only matching rows; inline manifests return their dicts."""
    if "_cp" not in m:
        return m.get("stats", {}), m.get("blooms", {})
    import json

    import pyarrow.parquet as pq

    want = set(rels)
    stats: dict = {}
    blooms: dict = {}
    for batch in pq.ParquetFile(m["_cp"]).iter_batches(
        columns=["dir", "stats", "blooms"]
    ):
        for rel, st, bl in zip(
            batch.column("dir").to_pylist(),
            batch.column("stats").to_pylist(),
            batch.column("blooms").to_pylist(),
        ):
            if rel in want:
                if st is not None:
                    stats[rel] = json.loads(st)
                if bl is not None:
                    blooms[rel] = json.loads(bl)
    return stats, blooms


def _latest_version(table_path: str) -> int | None:
    log_dir = os.path.join(table_path, "_txnlog")
    try:
        names = os.listdir(log_dir)
    except FileNotFoundError:
        return None
    versions = [int(f[:-5]) for f in names if f.endswith(".json") and f[:-5].isdigit()]
    return max(versions) if versions else None


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if n.endswith(".parquet"):
                out.append(os.path.join(dirpath, n))
    return sorted(out)


_CDF_META = ("change_type", "commit_version")


class TxnTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: SqlT.StructType, options: dict):
        self.path = _path_option(options)
        if not self.path:
            raise ValueError("txntable stream requires a path option")
        self.cdf = str(
            options.get("readchangefeed", "false")
        ).strip().lower() in ("true", "1", "yes")
        cols = tuple(schema.fieldNames())
        if self.cdf:
            missing = [c for c in _CDF_META if c not in cols]
            if missing:
                raise ValueError(
                    f"readchangefeed schema must include {_CDF_META}; "
                    f"missing {missing} (omit .schema(...) to derive it)"
                )
            # data columns only: the meta pair is appended per batch
            self.columns = tuple(c for c in cols if c not in _CDF_META)
        else:
            self.columns = cols
        self.arrow_types = _arrow_types_of(schema)
        self.ignore_changes = str(
            options.get("ignorechanges", "false")
        ).strip().lower() in ("true", "1", "yes")
        # Delta's ignoreDeletes: skip commits that ONLY remove data
        # (drop_partitions, dv-only deletes) — nothing was added, so
        # nothing needs re-emitting; rewrites (which ADD a directory)
        # still raise without ignorechanges
        self.ignore_deletes = str(
            options.get("ignoredeletes", "false")
        ).strip().lower() in ("true", "1", "yes")
        # the `where` load option works on the STREAM face too: rows
        # filter executor-side over the same AST, and pure-append
        # commits whose directory stats disprove the predicate are
        # skipped at planning (the per-commit twin of the batch face's
        # manifest prune). Filter columns must be in the stream's
        # declared columns.
        self.where_ast = None
        w = options.get("where")
        if w:
            self.where_ast = _parse_where_option(w)
            bad = sorted(_where_columns(self.where_ast) - set(self.columns))
            if bad:
                raise ValueError(
                    f"where option references column(s) {bad} outside "
                    f"the stream's columns {list(self.columns)}"
                )
        self.max_versions = int(options.get("maxversionspertrigger", 0) or 0)
        if self.max_versions < 0:
            raise ValueError(
                f"maxversionspertrigger must be >= 1, got {self.max_versions}"
            )
        # Delta's startingVersion: replay history commit-by-commit from
        # version N instead of consuming the current snapshot. None =
        # snapshot-first (the default initial batch).
        sv = options.get("startingversion")
        self.starting = int(sv) if sv is not None else None
        if self.starting is not None and self.starting < 0:
            raise ValueError(
                f"startingversion must be >= 0, got {self.starting}"
            )
        # admission-control floor: the newest version this reader has
        # already planned/offered, learned from initialOffset /
        # partitions / commit. Spark calls latestOffset BEFORE
        # initialOffset (verified), so the first latestOffset of a run
        # sees None and is uncapped; every later batch is bounded.
        self._floor: int | None = None

    # -- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:
        if self.starting is not None:
            # history replay: the first batch starts AT startingversion
            # and walks commits incrementally — "replay" marks the
            # checkpointed offset so partitions() knows -1 here means
            # "before v0", not "take the current snapshot"
            self._floor = self.starting - 1
            return {"version": self.starting - 1, "replay": True}
        # -1 = "before version 0": the first batch consumes the whole
        # current snapshot (v0's full file set plus later diffs)
        self._floor = -1
        return {"version": -1}

    def latestOffset(self) -> dict:
        latest = _latest_version(self.path)
        latest = -1 if latest is None else latest
        if (
            self.max_versions > 0
            and self._floor is not None
            and latest > self._floor + self.max_versions
        ):
            # bounded catch-up: offer at most max_versions commits per
            # micro-batch; the backlog drains as a sequence of bounded
            # batches instead of one unbounded one
            latest = self._floor + self.max_versions
        if self._floor is None or latest > self._floor:
            self._floor = latest
        return {"version": latest}

    # -- planning (driver-side) --------------------------------------------

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        if self._floor is None or hi > self._floor:
            self._floor = hi  # restart replay: resume capping from here
        parts: list[InputPartition] = []
        # the END-version manifest's column-mapping rename history
        # governs every file in range: history only accumulates, so it
        # resolves each logical column against whatever physical name
        # any file ≤ hi carries (a rename AFTER the stream's declared
        # schema is a restart situation, as in Delta)
        range_hist = (
            _stub_of(self.path, hi).get("column_names") if hi >= 0 else None
        )

        def add_dirs(
            rels,
            snap: dict | None = None,
            change_type: str = "insert",
            commit_version: int = -1,
            dv_mode: str = "drop",
            dv_base: tuple[str, ...] = (),
            manifest: dict | None = None,
        ) -> None:
            if self.where_ast is not None and manifest is not None:
                # one-sided commit-level skipping: a directory whose
                # recorded stats/blooms disprove the predicate never
                # plans a task (the row filter re-applies it exactly);
                # light manifests fetch only these rels' cells
                stats, blooms = _stats_blooms_for(manifest, rels)
                rels = [
                    r
                    for r in rels
                    if _ast_may_match(
                        stats.get(r), blooms.get(r), self.where_ast
                    )
                ]
            # deletion vectors (snapshot reads only): a directory with
            # tombstones ships the sidecar paths to its tasks, which
            # merge the dead rows out where the file is read
            dvr = (snap or {}).get("dv_rows", {})
            sidecars = tuple(
                os.path.join(self.path, s) for s in (snap or {}).get("dvs", [])
            )
            for rel in rels:
                dv = sidecars if dvr.get(rel) else ()
                for f in _parquet_files(os.path.join(self.path, rel)):
                    parts.append(
                        TxnFilePartition(
                            f,
                            self.columns,
                            self.arrow_types,
                            os.path.relpath(f, self.path),
                            dv,
                            dv_mode,
                            dv_base,
                            change_type,
                            commit_version,
                            name_history=range_hist,
                        )
                    )

        def add_cdc(rel: str, v: int) -> None:
            # commit-time change-data sidecar (Delta's _change_data):
            # rows carry their own _change_type column; executors read
            # it like any data file with one extra declared column
            import pyarrow as pa

            cols = self.columns + ("_change_type",)
            types = dict(self.arrow_types)
            types["_change_type"] = pa.string()
            for f in _parquet_files(os.path.join(self.path, rel)):
                parts.append(
                    TxnFilePartition(
                        f,
                        cols,
                        types,
                        os.path.relpath(f, self.path),
                        (),
                        "drop",
                        (),
                        "@file",
                        v,
                        name_history=range_hist,
                    )
                )

        if lo == -1 and not start.get("replay"):
            # INITIAL SNAPSHOT (Delta's semantics): the first batch is
            # the full snapshot at `hi` — live rows only, tombstones
            # merged out — not a replay of every historical commit, so
            # mid-history deletes/merges never block a stream that
            # starts on today's table. In CDF mode those rows carry
            # change_type 'insert' at the snapshot version.
            if hi >= 0:
                m = _manifest_light(self.path, hi)
                add_dirs(sorted(m["files"]), m, "insert", hi, manifest=m)
            return parts
        if lo == -1:
            # startingversion=0 replay: walk from before the first
            # commit — version 0 diffs against the empty table
            prev: dict = {"files": []}
        else:
            prev = _manifest_light(self.path, lo)
        prev_files = set(prev["files"])
        for v in range(lo + 1, hi + 1):
            m = _manifest_light(self.path, v)
            cur = set(m["files"])
            op = m.get("op")
            if self.cdf:
                self._plan_cdf_commit(add_dirs, add_cdc, v, prev, m, prev_files, cur)
            elif op in (
                "append",
                "add_constraint",
                "drop_constraint",
                "set_properties",
                "backfill_bytes",
                "rename_column",
                "drop_column",
            ) or (
                # an overwrite that REMOVES nothing is a pure add — the
                # shape of v0 under a startingversion=0 history replay
                op == "overwrite"
                and not prev_files - cur
            ):
                # constraint commits are table POLICY, not data: the
                # file set is unchanged and the stream just moves past
                add_dirs(sorted(cur - prev_files), None, "insert", v, manifest=m)
            elif self.ignore_deletes and not (cur - prev_files):
                # delete-only commit (drop_partitions / delete_dv /
                # full-directory delete): nothing added, nothing to
                # emit — Delta's documented ignoreDeletes
                pass
            elif not self.ignore_changes:
                raise RuntimeError(
                    f"version {v} of {self.path} is a {op!r} "
                    "commit; an insert-only stream cannot represent it. "
                    "Set .option('ignorechanges', 'true') to re-emit "
                    "rewritten directories (Delta ignoreChanges "
                    "semantics), or stream the change feed instead "
                    "(.option('readchangefeed', 'true'))."
                )
            else:
                add_dirs(sorted(cur - prev_files), None, "insert", v, manifest=m)
            prev, prev_files = m, cur
        return parts

    def _plan_cdf_commit(
        self, add_dirs, add_cdc, v: int, prev: dict, m: dict, prev_files, cur
    ) -> None:
        """One commit's rows for the CHANGE FEED stream — only ops whose
        row-level changes are derivable per-file (no joins) stream:

        * ``append`` → added directories as 'insert'
        * ``delete_dv`` → ONLY the newly tombstoned positions as
          'delete' (new-sidecar-set minus old — exact even after
          sidecar coalescing)
        * ``drop_partitions`` → the dropped directories' live rows as
          'delete' (a metadata delete is still a delete)
        * ``optimize`` / ``reorg`` → nothing (row-identical by
          contract)
        * constraint commits → nothing (policy, not data)
        * ``delete``/``merge`` committed with ``cdc=True`` → the
          commit's ``cdf/`` sidecar IS the change set (Delta's
          ``_change_data``): rows stream with their recorded
          ``_change_type`` (delete / update_preimage /
          update_postimage / insert)
        * COW rewrites WITHOUT a sidecar
          (``delete``/``merge``/``overwrite``/``restore``) → RAISE:
          their row-level diff needs the anti-join the batch feed
          (``TxnTable.changes``) performs; a streaming source can't
          run joins inside partition planning. Delta draws the same
          line — streaming CDC beyond appends+DVs requires commit-time
          change files, which ``cdc=True`` writes."""
        op = m.get("op")
        if op in (
            "optimize",
            "reorg",  # purge: row-identical on the live view, like optimize
            "add_constraint",
            "drop_constraint",
            "set_properties",
            "backfill_bytes",
            "rename_column",
            "drop_column",
        ):
            return
        if op in ("append", "overwrite") and not prev_files - cur:
            add_dirs(sorted(cur - prev_files), None, "insert", v)
            return
        if op == "delete_dv":
            dirs = [
                d
                for d in sorted(m.get("dv_rows", {}))
                if m["dv_rows"][d] > prev.get("dv_rows", {}).get(d, 0)
            ]
            add_dirs(
                dirs,
                m,
                "delete",
                v,
                dv_mode="keep",
                dv_base=tuple(
                    os.path.join(self.path, s) for s in prev.get("dvs", [])
                ),
            )
            return
        if op in ("delete", "merge", "update") and m.get("cdc"):
            add_cdc(m["cdc"], v)
            return
        if op == "drop_partitions":
            # dropped dirs leave the manifest untouched on disk: their
            # live rows AT v-1 (prev's tombstones merged out) are the
            # delete set, readable per file
            add_dirs(sorted(prev_files - cur), prev, "delete", v)
            return
        raise RuntimeError(
            f"version {v} of {self.path} is a {op!r} commit without "
            "change-data files; its row-level changes need the batch "
            "change feed (TxnTable.changes, which joins rewritten "
            "directories against the ones they replaced). Commit "
            "rewrites with cdc=True to stage Delta-style _change_data "
            "sidecars the stream can read."
        )

    # -- execution (executor-side) -----------------------------------------

    def read(self, partition: TxnFilePartition) -> Iterator:
        import pyarrow as pa

        for batch in _emit_file_batches(
            partition.file_path,
            partition.columns,
            partition.arrow_types,
            partition.rel_file,
            partition.sidecars,
            partition.dv_mode,
            partition.dv_base,
            name_history=partition.name_history,
        ):
            if self.where_ast is not None:
                # the `where` option is EXACT on the stream too:
                # planning skipped provably-irrelevant directories,
                # the row-level residue applies here (on the data
                # columns, before any change-feed meta is appended)
                batch = _where_mask(batch, self.where_ast)
            if self.cdf:
                n = batch.num_rows
                if partition.change_type == "@file":
                    # change-data sidecar: _change_type is the batch's
                    # LAST column (declared order); surface it as the
                    # change_type output instead of a constant
                    arrays = list(batch.columns)
                    ct = arrays.pop()
                    names = list(partition.columns[:-1])
                else:
                    arrays = list(batch.columns)
                    ct = pa.array([partition.change_type] * n, pa.string())
                    names = list(partition.columns)
                batch = pa.RecordBatch.from_arrays(
                    arrays
                    + [
                        ct,
                        pa.array([partition.commit_version] * n, pa.int64()),
                    ],
                    names=names + list(_CDF_META),
                )
            yield batch

    def commit(self, end: dict) -> None:
        # offsets are derived from the immutable log — nothing to ack;
        # but a completed batch is a position fix for the catch-up cap
        hi = int(end["version"])
        if self._floor is None or hi > self._floor:
            self._floor = hi


_WHERE_LEXEME = (
    r"\s*(?:(?P<str>'(?:[^']|'')*')|(?P<int>-?\d+)"
    r"|(?P<word>\w+)|(?P<op><=|>=|<>|!=|=|<|>)|(?P<punct>[(),]))"
)


def _parse_where_lenient(text: str):
    """Best-effort parse of an ARBITRARY SQL boolean for PRE-PRUNING
    only: factors the shared option grammar cannot express (function
    calls, arithmetic, BETWEEN, NOT ...) become ``("unknown",)``
    leaves, which the may-match proof treats as always-may-match — so
    a retention predicate like ``ts >= '2020-06-01' AND
    date_trunc('day', ts) = date '2020-06-01'`` still prunes on its
    grammar-parsable conjuncts instead of keeping every directory.
    Raises :class:`ValueError` when the text cannot even be lexed or
    structured (no proof at all — the caller keeps everything).

    The returned AST is ONE-SIDED-PROOF-ONLY: it must never reach the
    row filter or CHECK validator (:func:`_where_kleene_mask` refuses
    ``unknown`` nodes loudly), because an ``unknown`` leaf stands for
    "some predicate was here" — dropping it from a row filter would
    widen the result set."""
    return _parse_where_option(text, _lenient=True)


def _parse_where_option(text: str, _lenient: bool = False):
    """Parse the ``where`` load option — a boolean expression over
    simple typed comparisons — into a small AST. Grammar::

        expr      := term ( OR term )*
        term      := factor ( AND factor )*
        factor    := predicate | '(' expr ')'
        predicate := column (= | < | <= | > | >= | != | <>) rhs
                   | column IN ( literal, literal, ... )
                   | column IS [NOT] NULL
        rhs       := literal | column
        literal   := integer | 'single-quoted string' ('' escapes ')

    AST nodes: ``("and", [..])``, ``("or", [..])``,
    ``("pred", (col, op, value))`` (``!=``/``<>`` normalize to one op,
    null checks carry value ``None``), ``("in", (col, (values,)))``,
    ``("cmp2", (col, op, col2))`` for column-vs-column comparisons
    (the shape cross-column CHECK constraints like ``lo <= hi`` take).

    Lexed as real tokens — quoted literals are recognized FIRST, so a
    string containing ``,``, ``AND`` or ``OR`` is one literal, never a
    split point.

    The option is applied EXACTLY (directories pruned at plan time
    through a one-sided may-match proof over the same AST, rows
    filtered executor-side), and because load options are part of
    Spark's relation identity it is immune to the per-relation
    readInfo-cache hazard that makes ``pushdown`` single-use — the
    right spelling for a DataFrame that will be reused, or for pure
    SQL (``CREATE TEMPORARY VIEW ... USING txntable OPTIONS (...)``).
    The same parser admits CHECK constraints to the write faces'
    executor-side validator."""
    import re

    grammar_err = (
        "the option grammar is `col (=|<|<=|>|>=|!=|<>) literal`, "
        "`col IN (lit, ...)`, or `col IS [NOT] NULL`, combined with "
        "AND / OR / parentheses, with integer or single-quoted string "
        "literals — put anything more general in .where() on the "
        "DataFrame"
    )

    # lex the whole option up front; any unlexable character is loud
    toks: list[tuple[str, str]] = []  # (kind, lexeme)
    pos = 0
    for m in re.finditer(_WHERE_LEXEME, text):
        if m.start() != pos:
            break
        kind = m.lastgroup
        lex = m.group(kind)
        if kind == "word" and lex.upper() in (
            "AND", "OR", "IN", "IS", "NOT", "NULL",
        ):
            kind = lex.upper()
        toks.append((kind, lex))
        pos = m.end()
    if text[pos:].strip():
        raise ValueError(
            f"cannot lex txntable where option at {text[pos:]!r}: "
            + grammar_err
        )

    def _lit(tok: str):
        if tok.startswith("'"):
            return tok[1:-1].replace("''", "'")
        return int(tok)

    i = 0

    def _peek(ahead: int = 0) -> str:
        return toks[i + ahead][0] if i + ahead < len(toks) else "end"

    def _take(*kinds: str) -> str:
        nonlocal i
        if _peek() not in kinds:
            got = toks[i][1] if i < len(toks) else "end of option"
            raise ValueError(
                f"unsupported txntable where option near {got!r}: "
                + grammar_err
            )
        i += 1
        return toks[i - 1][1]

    def _expr():
        terms = [_term()]
        while _peek() == "OR":
            _take("OR")
            terms.append(_term())
        return terms[0] if len(terms) == 1 else ("or", terms)

    def _term():
        factors = [_factor()]
        while _peek() == "AND":
            _take("AND")
            factors.append(_factor())
        if _lenient:
            # a recovery that swallowed a BETWEEN/CASE keyword may
            # have eaten that construct's internal AND — everything
            # after it in this conjunction could be a fragment, so it
            # proves nothing (one-sided soundness over pruning power)
            for j, f in enumerate(factors):
                if f == ("unknown!",):
                    factors = factors[:j] + [("unknown",)]
                    break
        return factors[0] if len(factors) == 1 else ("and", factors)

    def _factor():
        if not _lenient:
            return _factor_strict()
        nonlocal i
        start = i
        try:
            return _factor_strict()
        except ValueError:
            # lenient recovery: this factor is outside the grammar
            # (function call, arithmetic, NOT, ...) — consume its
            # tokens, balancing parentheses, up to the next AND / OR /
            # enclosing ')' / end, and stand in an ("unknown",) leaf
            # the may-match proof treats as always-may-match
            i = start
            depth = 0
            while i < len(toks):
                kind, lex = toks[i]
                if depth == 0 and (
                    kind in ("AND", "OR")
                    or (kind == "punct" and lex == ")")
                ):
                    break
                if kind == "punct" and lex == "(":
                    depth += 1
                elif kind == "punct" and lex == ")":
                    depth -= 1  # only reached when depth > 0
                i += 1
            # BETWEEN and CASE WHEN are the only lexable Spark SQL
            # constructs carrying a bare depth-0 AND of their own —
            # recovery may have stopped AT that internal AND, so a
            # "parsable" factor after it could be a FRAGMENT of this
            # construct (``b BETWEEN 2 AND c = 1`` must not prune on
            # ``c = 1``). Mark the leaf so _term poisons the rest of
            # its conjunction. (Internal OR only occurs inside CASE,
            # whose mandatory trailing THEN/END always derails the
            # parse into keep-everything — no OR-level poisoning
            # needed.)
            swallows_and = False
            d = 0
            for k, x in toks[start:i]:
                if k == "punct" and x == "(":
                    d += 1
                elif k == "punct" and x == ")":
                    d -= 1
                elif (
                    d == 0
                    and k == "word"
                    and x.upper() in ("BETWEEN", "CASE", "WHEN")
                ):
                    # at depth > 0 the construct is confined by its
                    # balanced parens — its internal AND cannot be the
                    # one recovery stopped at
                    swallows_and = True
            return ("unknown!",) if swallows_and else ("unknown",)

    def _factor_strict():
        if _peek() == "punct" and toks[i][1] == "(":
            _take("punct")
            node = _expr()
            if _take("punct") != ")":
                raise ValueError(f"unclosed parenthesis: {text!r}")
            return node
        col = _take("word")
        if _peek() == "IN":
            _take("IN")
            if _take("punct") != "(":
                raise ValueError(f"IN needs a parenthesized list: {text!r}")
            values = [_lit(_take("str", "int"))]
            while _peek() == "punct" and toks[i][1] == ",":
                i_advance()
                values.append(_lit(_take("str", "int")))
            if _take("punct") != ")":
                raise ValueError(f"IN list not closed: {text!r}")
            return ("in", (col, tuple(values)))
        if _peek() == "IS":
            _take("IS")
            if _peek() == "NOT":
                _take("NOT")
                _take("NULL")
                return ("pred", (col, "IS NOT NULL", None))
            _take("NULL")
            return ("pred", (col, "IS NULL", None))
        op = _take("op")
        if op == "<>":
            op = "!="
        if _peek() == "word":
            return ("cmp2", (col, op, _take("word")))
        return ("pred", (col, op, _lit(_take("str", "int"))))

    def i_advance():
        nonlocal i
        i += 1

    node = _expr()
    if _peek() != "end":
        _take("end")  # raises with the grammar error
    return node


def _where_columns(node) -> set:
    """Every column name the AST references."""
    kind = node[0]
    if kind == "unknown":
        return set()  # proof-only placeholder: references nothing
    if kind in ("and", "or"):
        out: set = set()
        for child in node[1]:
            out |= _where_columns(child)
        return out
    if kind == "cmp2":
        return {node[1][0], node[1][2]}
    return {node[1][0]}


def _where_kleene_mask(batch, node):
    """The parsed expression as one kleene boolean array over
    ``batch`` — TRUE / FALSE / NULL exactly as SQL three-valued logic
    evaluates it. Shared by the WHERE row filter (NULL drops the row)
    and the CHECK-constraint validator (only FALSE violates)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    kind = node[0]
    if kind == "unknown":
        # a lenient-parse placeholder stands for "some predicate was
        # here": evaluating it as TRUE would WIDEN a row filter —
        # lenient ASTs are one-sided-proof-only, never row filters
        raise ValueError(
            "('unknown',) nodes (from _parse_where_lenient) cannot be "
            "evaluated as a row filter — proof-only AST"
        )
    if kind in ("and", "or"):
        combine = pc.and_kleene if kind == "and" else pc.or_kleene
        mask = None
        for child in node[1]:
            piece = _where_kleene_mask(batch, child)
            mask = piece if mask is None else combine(mask, piece)
        return mask
    if kind == "in":
        col, values = node[1]
        # pc.is_in yields non-null FALSE for null inputs; SQL IN yields
        # NULL. Restore null-ness so CHECK validation (only FALSE
        # violates) matches TxnTable._validate_constraints; the WHERE
        # row filter is unaffected (NULL and FALSE both drop the row).
        arr = batch.column(col)
        return pc.if_else(
            pc.is_valid(arr),
            pc.is_in(arr, value_set=pa.array(list(values))),
            pa.scalar(None, pa.bool_()),
        )
    ops2 = {
        "=": pc.equal,
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
        "!=": pc.not_equal,
    }
    if kind == "cmp2":
        a, op, b = node[1]
        return ops2[op](batch.column(a), batch.column(b))
    col, op, val = node[1]
    if op == "IS NULL":
        return pc.is_null(batch.column(col))
    if op == "IS NOT NULL":
        return pc.is_valid(batch.column(col))
    ops = {
        "=": pc.equal,
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
        "!=": pc.not_equal,
    }
    return ops[op](batch.column(col), pa.scalar(val))


def _ast_may_match(dir_stats, dir_blooms, node) -> bool:
    """One-sided may-match proof for a whole AST over one directory's
    recorded stats/blooms: AND may match iff every child may, OR iff
    any child may, leaves defer to the conjunct-level proof (stats
    ranges + bloom probes). kept ⊇ matching always — the row filter
    re-applies the exact expression."""
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    kind = node[0]
    if kind == "unknown":
        return True  # lenient placeholder: no proof, keep
    if kind == "and":
        return all(
            _ast_may_match(dir_stats, dir_blooms, c) for c in node[1]
        )
    if kind == "or":
        return any(
            _ast_may_match(dir_stats, dir_blooms, c) for c in node[1]
        )
    if kind == "in":
        col, values = node[1]
        return any(
            TxnTable._dir_may_match(dir_stats, [(col, "=", v)], dir_blooms)
            for v in values
        )
    if kind == "cmp2":
        return _cmp2_may_match(dir_stats, *node[1])
    return TxnTable._dir_may_match(dir_stats, [node[1]], dir_blooms)


def _cmp2_may_match(dir_stats, a: str, op: str, b: str) -> bool:
    """One-sided proof for a column-vs-column comparison from the two
    recorded [min, max] ranges: e.g. ``a < b`` is impossible iff
    min(a) >= max(b). Missing or mixed-type bounds keep the directory
    (no proof, no skip); all-NULL bounds on either side skip it (a
    comparison is never true on NULL)."""
    if not dir_stats:
        return True
    ba, bb = dir_stats.get(a), dir_stats.get(b)
    if ba is None or bb is None:
        return True
    lo_a, hi_a = ba[0], ba[1]
    lo_b, hi_b = bb[0], bb[1]
    if (lo_a is None and hi_a is None) or (lo_b is None and hi_b is None):
        return False
    num_a = isinstance(lo_a, (int, float)) and not isinstance(lo_a, bool)
    num_b = isinstance(lo_b, (int, float)) and not isinstance(lo_b, bool)
    if num_a != num_b:
        return True  # mixed representations: no proof
    if not num_a:
        lo_a, hi_a, lo_b, hi_b = str(lo_a), str(hi_a), str(lo_b), str(hi_b)
    if op == "=":
        return lo_a <= hi_b and lo_b <= hi_a
    if op == "!=":
        return not (lo_a == hi_a == lo_b == hi_b)
    if op == "<":
        return lo_a < hi_b
    if op == "<=":
        return lo_a <= hi_b
    if op == ">":
        return hi_a > lo_b
    if op == ">=":
        return hi_a >= lo_b
    return True


def _where_mask(batch, node):
    """Filter ``batch`` to the rows the expression keeps. NULL
    results drop the row — SQL WHERE semantics (kleene logic +
    filter's default null_selection_behavior='drop')."""
    return batch.filter(_where_kleene_mask(batch, node))


def _sql_check_count(batch, expr: str) -> int:
    """Rows of ``batch`` that VIOLATE an arbitrary ANSI-SQL CHECK
    expression, evaluated by the embedded DuckDB engine (a hard
    container dependency, and the same engine the repo's oracle gate
    trusts) — the executor-side fallback for function-bearing
    constraints (``length(c_name) <= 25``) the Arrow kleene grammar
    can't express. Same CHECK rule: only exactly-FALSE violates."""
    import duckdb
    import pyarrow as pa

    _check_input = pa.Table.from_batches([batch])  # noqa: F841
    return int(
        duckdb.sql(
            "SELECT count(*) FROM _check_input "
            f"WHERE NOT coalesce(({expr}), TRUE)"
        ).fetchone()[0]
    )


def _count_check_violations(batch, node) -> int:
    """Rows of ``batch`` that VIOLATE the constraint under SQL CHECK
    semantics: only an exactly-FALSE result violates (TRUE and NULL
    both pass) — the same rule TxnTable._validate_constraints applies
    JVM-side. Grammar-parsed constraints evaluate as Arrow kleene
    masks; ``("sql", expr)`` nodes (function-bearing constraints)
    evaluate through :func:`_sql_check_count`."""
    import pyarrow.compute as pc

    if node[0] == "sql":
        return _sql_check_count(batch, node[1])
    mask = _where_kleene_mask(batch, node)
    is_false = pc.and_kleene(pc.is_valid(mask), pc.invert(mask))
    n = pc.sum(is_false).as_py()
    return int(n or 0)


class TxnTableBatchReader(DataSourceReader):
    """Batch scan with MANIFEST-LEVEL DATA SKIPPING wired to Catalyst's
    filter pushdown: ``pushFilters`` translates the supported pushed
    predicates into ``(col, op, value)`` conjuncts, planning prunes
    whole directories through ``TxnTable.prune`` (stats [min,max]
    ranges, exact partition values, bloom bitmaps), and EVERY filter is
    handed back to Spark — pruning is a one-sided proof (kept ⊇
    matching), the scan must still re-apply the predicate. At 100 TB a
    point lookup on a bloom-indexed key plans the one commit that can
    hold it, straight from ``spark.read.format("txntable")``.

    COLUMN PROJECTION: ``.option("columns", "a,b")`` trims the declared
    schema (resolved in :meth:`TxnTableDataSource.schema`), and because
    the declared schema is the Arrow emit contract, executors read ONLY
    those columns from parquet — the column-dimension twin of the
    ``where`` option, equally relation-keyed and reuse-safe. The Python
    DataSource API has no Catalyst column-pruning hook (Spark projects
    AFTER the worker paid the I/O), so on a wide table at 100 TB the
    option is the difference between 2-column I/O and full-row I/O for
    a 2-column query. A ``where`` filter on a NON-projected column
    composes: executors read the filter column transiently for the
    mask and drop it before emit — filter on anything, pay I/O only
    for what the filter and the projection actually touch.

    PRUNING IS OPT-IN: ``.option("pushdown", "true")``. Spark 4.1's
    Python DataSource caches ONE ``readInfo`` (partition list + read
    function) per relation — ``PythonDataSourceV2.getOrCreateReadInfo``
    returns the cached slot unconditionally, and only a query whose
    WHERE clause contains a translatable filter re-runs the pushdown
    worker and overwrites it (``pushdownFiltersInPython`` short-circuits
    to None otherwise; both verified against the shipped bytecode). So
    filter-DEPENDENT planning poisons the cache for a later filterLESS
    query on the SAME DataFrame: ``df.where(...).count()`` would leave
    pruned partitions behind for ``df.count()`` to silently reuse.
    Correctness can't hinge on usage patterns, so by default the scan
    plans every live directory (always right, never skips), and the
    option is the caller's declaration that this load() is single-use
    (one query per DataFrame — the idiomatic `spark.read...load().
    where(...)` shape), which makes the cached pruned plan unreachable
    from any other query."""

    def __init__(self, schema: SqlT.StructType, options: dict):
        self.path = _path_option(options)
        if not self.path:
            raise ValueError("txntable batch read requires a path option")
        v = options.get("version")
        ts = options.get("timestampasof")
        if v is not None and ts is not None:
            raise ValueError("pass either version or timestampasof, not both")
        self.version = int(v) if v is not None else None
        self.ts = float(ts) if ts is not None else None
        self.pushdown = str(options.get("pushdown", "")).lower() == "true"
        self.columns = tuple(schema.fieldNames())
        self.arrow_types = _arrow_types_of(schema)
        self.predicates: list[tuple[str, str, object]] = []
        self.in_predicates: list[tuple[str, tuple]] = []
        # the `where` load option: exact, relation-keyed skipping —
        # parsed once here into an AST, pruned at plan time through
        # the one-sided may-match proof, applied row-level on
        # executors. Safe under ANY reuse pattern (options are part of
        # the relation identity, so the cached plan is keyed by it).
        self.where_ast = None
        # columns executors READ: the declared projection plus any
        # where-option columns outside it, which are read transiently
        # (the filter needs their values) and dropped before emit —
        # so `columns` + `where` compose like Delta's projection +
        # partition filter: filter on anything, pay I/O only for it
        self.read_columns = self.columns
        w = options.get("where")
        if w:
            self.where_ast = _parse_where_option(w)
            extra = sorted(
                _where_columns(self.where_ast) - set(self.columns)
            )
            if extra:
                full = self._table_schema(options)
                by_name = {f.name: f for f in full.fields}
                bad = [c for c in extra if c not in by_name]
                if bad:
                    raise ValueError(
                        f"where option references unknown column(s) {bad}; "
                        f"table columns are {[f.name for f in full.fields]}"
                    )
                self.read_columns = self.columns + tuple(extra)
                self.arrow_types = {
                    **self.arrow_types,
                    **_arrow_types_of(
                        SqlT.StructType([by_name[c] for c in extra])
                    ),
                }

    def _table_schema(self, options: dict) -> SqlT.StructType:
        """The FULL recorded schema of the scanned version — resolved
        exactly like :meth:`TxnTableDataSource.schema`, used to type
        transient where-filter columns outside the projection."""
        from ceneton_database_tools_spark.sinks.txnlog import TxnTable

        if self.ts is not None:
            pick = TxnTable(self.path).version_as_of(self.ts)
        elif self.version is not None:
            pick = self.version
        else:
            pick = _latest_version(self.path)
        if pick is None:
            raise ValueError(f"no committed version under {self.path!r}")
        m = _stub_of(self.path, pick)  # schema is table-level
        if m.get("schema") is None:
            raise ValueError(
                f"version {pick} of {self.path} has no recorded schema; "
                "the where option cannot type columns outside the "
                "declared projection on a legacy manifest"
            )
        return SqlT.StructType.fromJson(m["schema"])

    def pushFilters(self, filters):
        from pyspark.sql import datasource as dsf

        if not self.pushdown:
            # default mode: planning must not depend on this query's
            # filters (the readInfo this call produces is a relation-
            # wide cache any later query may reuse — class docstring)
            return filters

        ops = {
            dsf.EqualTo: "=",
            dsf.GreaterThan: ">",
            dsf.GreaterThanOrEqual: ">=",
            dsf.LessThan: "<",
            dsf.LessThanOrEqual: "<=",
        }
        def _ok(v):
            return isinstance(v, (int, str)) and not isinstance(v, bool)

        for f in filters:
            op = ops.get(type(f))
            if op is not None and len(f.attribute) == 1 and _ok(f.value):
                self.predicates.append((f.attribute[0], op, f.value))
            elif (
                isinstance(f, (dsf.IsNull, dsf.IsNotNull))
                and len(f.attribute) == 1
            ):
                # IS NOT NULL prunes all-null directories; IS NULL is
                # recorded but never proves a skip (stats carry value
                # ranges, not null presence)
                self.predicates.append((
                    f.attribute[0],
                    "IS NULL" if isinstance(f, dsf.IsNull) else "IS NOT NULL",
                    None,
                ))
            elif (
                isinstance(f, dsf.In)
                and len(f.attribute) == 1
                and f.value
                and all(_ok(v) for v in f.value)
            ):
                # IN prunes disjunctively: a directory survives iff ANY
                # value may match (each value probed like an equality,
                # so bloom bitmaps skip point-lookup IN lists too)
                self.in_predicates.append((f.attribute[0], tuple(f.value)))
        # every filter is UNSUPPORTED from Spark's point of view: the
        # manifest prune is a superset proof, not an exact filter, so
        # Spark must re-apply all of them on the scan output
        return filters

    def _resolve_version(self, table) -> int | None:
        if self.ts is not None:
            return table.version_as_of(self.ts)
        return self.version

    def _keep_dir(self, st: dict | None, bl: dict | None) -> bool:
        """The one-sided directory proof every batch-read plan applies:
        pushed-down predicates, the lenient-parsed ``where`` AST, and
        disjunctive IN probes — a directory survives unless some proof
        shows no row can match."""
        from ceneton_database_tools_spark.sinks.txnlog import TxnTable

        return (
            (
                not self.predicates
                or TxnTable._dir_may_match(st, self.predicates, bl)
            )
            and (
                self.where_ast is None
                or _ast_may_match(st, bl, self.where_ast)
            )
            and all(
                any(
                    TxnTable._dir_may_match(st, [(col, "=", v)], bl)
                    for v in values
                )
                for col, values in self.in_predicates
            )
        )

    def partitions(self) -> Sequence[InputPartition]:
        import json

        from ceneton_database_tools_spark.sinks.txnlog import TxnTable

        table = TxnTable(self.path)
        # ONE snapshot drives the whole plan: resolving 'latest' more
        # than once would let a commit landing mid-plan mix two
        # versions in one scan (e.g. version N's file list with
        # N+1's dv sidecars after an optimize dropped them)
        version = self._resolve_version(table)
        if version is None:
            version = table.latest_version()
        stub = table._stub(version)
        kept_dv: list[tuple[str, bool]] = []
        if "files_checkpoint" in stub:
            # checkpointed: decide keep/skip as the sidecar's columns
            # stream past — driver state is O(kept), never the full
            # per-directory dict (the read plan's output is O(kept
            # files) regardless)
            import pyarrow.parquet as pq

            src = pq.ParquetFile(
                os.path.join(
                    self.path, "_txnlog", stub["files_checkpoint"]
                )
            )
            for batch in src.iter_batches(
                columns=["dir", "dv_rows", "stats", "blooms"]
            ):
                for rel, dv, st, bl in zip(
                    batch.column("dir").to_pylist(),
                    batch.column("dv_rows").to_pylist(),
                    batch.column("stats").to_pylist(),
                    batch.column("blooms").to_pylist(),
                ):
                    if self._keep_dir(
                        json.loads(st) if st is not None else None,
                        json.loads(bl) if bl is not None else None,
                    ):
                        kept_dv.append((rel, bool(dv)))
        else:
            snap = stub  # inline: the stub IS the manifest
            stats, blooms = snap.get("stats", {}), snap.get("blooms", {})
            dvr = snap.get("dv_rows", {})
            kept_dv = [
                (rel, bool(dvr.get(rel)))
                for rel in snap["files"]
                if self._keep_dir(stats.get(rel), blooms.get(rel))
            ]
        sidecars = tuple(
            os.path.join(self.path, s) for s in stub.get("dvs", [])
        )
        return [
            TxnFilePartition(
                f,
                self.read_columns,
                self.arrow_types,
                os.path.relpath(f, self.path),
                sidecars if has_dv else (),
                name_history=stub.get("column_names"),
            )
            for rel, has_dv in kept_dv
            for f in _parquet_files(os.path.join(self.path, rel))
        ]

    def read(self, partition: TxnFilePartition) -> Iterator:
        if partition is None:
            # partitions() proved every directory irrelevant; Spark
            # still runs one task with a None partition — emit nothing
            return
        for batch in _emit_file_batches(
            partition.file_path,
            partition.columns,
            partition.arrow_types,
            partition.rel_file,
            partition.sidecars,
            name_history=partition.name_history,
        ):
            if self.where_ast is not None:
                # the `where` load option is EXACT: pruning above was
                # one-sided, the row-level residue applies here
                batch = _where_mask(batch, self.where_ast)
            if self.read_columns != self.columns:
                # transient where-filter columns were read for the
                # mask only; the emitted batch is the declared schema
                batch = batch.select(list(self.columns))
            yield batch


class _TxnTaskMessage(WriterCommitMessage):
    """One successful task's contribution to a staged commit: the
    uniquely-named temp file it wrote under ``tmpstream/`` (None for an
    empty task), its row count, per-column min/max, and — when the
    writer was configured with bloom columns — the task's folded
    per-column bloom bitmap bytes. ``nbytes`` is the temp file's size,
    measured TASK-SIDE right after close (the executor just wrote the
    file — a free stat there, one LIST per commit on the driver
    otherwise), so the manifest's per-directory byte sizes cost the
    commit worker zero filesystem calls. Must stay picklable — plain
    attributes only."""

    def __init__(
        self,
        tmp_file: str | None,
        rows: int,
        stats: dict,
        blooms: dict | None = None,
        violations: dict | None = None,
        nbytes: int | None = None,
    ):
        self.tmp_file = tmp_file
        self.rows = rows
        self.stats = stats
        self.blooms = blooms or {}
        self.violations = violations or {}
        self.nbytes = nbytes


class _TxnPartTaskMessage(WriterCommitMessage):
    """A PARTITIONED write task's contribution: one entry per distinct
    partition tuple the task saw — ``(parts, tmp_file, rows, stats,
    blooms, nbytes)`` with ``parts`` the manifest-representation value
    dict and ``nbytes`` the temp file's task-side measured size."""

    def __init__(self, entries: list, violations: dict | None = None):
        self.entries = entries
        self.violations = violations or {}


def _part_norm(v):
    """One partition value in manifest representation — the
    :meth:`TxnTable._parse_part_value` convention: ints stay ints,
    NULL stays None, everything else (dates, Decimals) goes through
    ``str()`` whose ISO form matches ``_json_stat``."""
    if v is None or isinstance(v, (int, str)):
        return v
    return str(v)


class _BloomAcc:
    """Executor-side bloom accumulator: OR values into per-column
    bitmaps bit-compatible with :meth:`TxnTable._bloom_hashes` /
    ``_bloom_pos_expr`` (canonical-string md5 double hashing), so a
    face-written directory and a Python-API-written one probe
    identically at prune time. The irreducible Python cost is one md5
    per DISTINCT value per batch (hashlib has no batch API); values
    are deduped with Arrow first and the k bit positions are computed
    as one vectorized numpy expression — for bulk loads the Python
    API's codegen'd builder (``TxnTable._collect_blooms``) remains
    the fast path."""

    def __init__(self, cols: tuple[str, ...], bits: int, k: int):
        self.cols = cols
        self.bits = bits
        self.k = k
        self.bm: dict = {}

    def fold(self, batch) -> None:
        import numpy as np
        import pyarrow.compute as pc

        from ceneton_database_tools_spark.sinks.txnlog import TxnTable

        nbytes = (self.bits + 7) // 8
        for c in self.cols:
            vals = pc.unique(pc.drop_null(batch.column(c))).to_pylist()
            if not vals:
                continue
            acc = self.bm.get(c)
            if acc is None:
                acc = self.bm[c] = np.zeros(nbytes, dtype=np.uint8)
            # reduce the hash pair mod bits FIRST so h1m + i*h2m can
            # never overflow int64 whatever k is; (h1%m + i*(h2%m)) % m
            # == (h1 + i*h2) % m, so probes still match bit-for-bit
            h = np.array(
                [TxnTable._bloom_hashes(str(v)) for v in vals],
                dtype=np.int64,
            ) % np.int64(self.bits)
            pos = (
                h[:, :1] + np.arange(self.k, dtype=np.int64) * h[:, 1:]
            ) % np.int64(self.bits)
            flat = pos.reshape(-1)
            np.bitwise_or.at(
                acc, flat >> 3, (np.uint8(1) << (flat & 7).astype(np.uint8))
            )

    def payload(self) -> dict:
        return {c: bm.tobytes() for c, bm in self.bm.items()}


def _zero_row_batch(schema: SqlT.StructType):
    """A zero-row Arrow RecordBatch with the written schema — the
    compile target for function-bearing CHECK constraints."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow = to_arrow_schema(schema)
    return pa.RecordBatch.from_arrays(
        [pa.nulls(0, type=f.type) for f in arrow], schema=arrow
    )


def _parse_table_checks(path: str, schema: SqlT.StructType) -> dict:
    """``{(name, expr): node}`` for every CHECK constraint of the
    table's latest snapshot so WRITE-FACE tasks validate incoming
    batches executor-side (SQL CHECK semantics: only FALSE violates).
    Grammar-expressible constraints parse into the where-option AST and
    evaluate as Arrow kleene masks; FUNCTION-BEARING constraints
    (``length(c_name) <= 25``-style, beyond the grammar) fall back to
    ``("sql", expr)`` nodes evaluated per batch by the embedded ANSI
    engine (:func:`_sql_check_count`) — compile-checked HERE, at writer
    construction, against a zero-row table of the written schema, so a
    misspelled column or unsupported function refuses loudly before any
    task runs. The staged-commit hooks still refuse any constraint that
    appears AFTER this snapshot was read (race-safe: only
    task-validated policies commit)."""
    latest = _latest_version(path)
    if latest is None:
        return {}
    m = _stub_of(path, latest)  # constraints are table-level
    names = set(schema.fieldNames())
    out: dict = {}
    for name, expr in (m.get("constraints") or {}).items():
        try:
            node = _parse_where_option(expr)
        except ValueError:
            # beyond the grammar: accept iff the embedded engine can
            # bind it against the written schema (zero-row compile)
            try:
                _sql_check_count(_zero_row_batch(schema), expr)
            except Exception as e:
                raise ValueError(
                    f"CHECK constraint {name!r} ({expr}) is outside the "
                    "face-validatable grammar AND the embedded ANSI "
                    f"evaluator refuses it ({e}) — write through "
                    "TxnTable.write, which validates with a Spark job"
                ) from None
            out[(name, expr)] = ("sql", expr)
            continue
        missing = sorted(_where_columns(node) - names)
        if missing:
            raise ValueError(
                f"CHECK constraint {name!r} ({expr}) references "
                f"column(s) {missing} the written schema lacks "
                f"({sorted(names)})"
            )
        out[(name, expr)] = node
    return out


def _fold_violations(messages) -> dict:
    """Sum per-constraint violation counts across task messages."""
    out: dict = {}
    for m in messages:
        if m is None:
            continue
        for name, n in getattr(m, "violations", {}).items():
            out[name] = out.get(name, 0) + n
    return out


def _raise_if_violated(path: str, messages) -> None:
    from ceneton_database_tools_spark.sinks.txnlog import (
        ConstraintViolation,
    )

    viol = {k: n for k, n in _fold_violations(messages).items() if n}
    if viol:
        # nothing was renamed out of tmpstream yet: discard the task
        # files and fail the job before any directory is staged
        flat = []
        for m in messages:
            if m is None:
                continue
            if hasattr(m, "entries"):
                flat.extend(
                    _TxnTaskMessage(e[1], e[2], {}) for e in m.entries
                )
            else:
                flat.append(m)
        _abort_task_tmpfiles(path, flat)
        raise ConstraintViolation(
            "incoming rows violate CHECK constraint(s) "
            + ", ".join(f"{k!r} ({n} rows)" for k, n in sorted(viol.items()))
        )


def _parse_layout_options(
    schema: SqlT.StructType, options: dict
) -> tuple:
    """Parse/validate the layout options both WRITE faces share —
    ``statscols``, ``partitionby``, ``bloomcols``/``bloombits``/
    ``bloomk`` — against the written schema, with the same type
    refusals as the Python API (float/bool partition columns,
    non-integral/non-string bloom columns). Returns
    ``(stats_cols, pcols, bloom_cols, bloom_bits, bloom_k)``."""
    names = schema.fieldNames()
    type_of = {f.name: f.dataType.simpleString() for f in schema.fields}

    def _cols(key: str) -> tuple[str, ...]:
        cols = tuple(
            c.strip() for c in options.get(key, "").split(",") if c.strip()
        )
        bad = [c for c in cols if c not in names]
        if bad:
            raise ValueError(f"{key} {bad} not in the written schema {names}")
        return cols

    stats_cols = _cols("statscols")
    pcols = _cols("partitionby")
    floaty = [c for c in pcols if type_of[c] in ("double", "float")]
    if floaty:
        raise ValueError(
            f"floating-point partition columns {floaty} are not "
            "supported (dir-name round-trip is inexact); cast to "
            "string or decimal first"
        )
    boolish = [c for c in pcols if type_of[c] == "boolean"]
    if boolish:
        raise ValueError(
            f"boolean partition columns {boolish} are not supported "
            "(hive dir-name spelling 'true'/'false' does not "
            "round-trip probe values); cast to string or int first"
        )
    bloom_cols = _cols("bloomcols")
    bloom_bits = int(options.get("bloombits", 8192) or 8192)
    bloom_k = int(options.get("bloomk", 5) or 5)
    if bloom_cols:
        if bloom_bits < 8 or bloom_k < 1:
            raise ValueError(
                f"bloombits >= 8 and bloomk >= 1 required, got "
                f"({bloom_bits}, {bloom_k})"
            )
        allowed = ("bigint", "int", "smallint", "tinyint", "string")
        bad = [c for c in bloom_cols if type_of[c] not in allowed]
        if bad:
            raise ValueError(
                f"bloomcols {bad} have non-integral/non-string types "
                f"({[type_of[c] for c in bad]}): the canonical-string "
                "hash is only exact for integrals and strings"
            )
    return stats_cols, pcols, bloom_cols, bloom_bits, bloom_k


def _assemble_partitioned_leaves(
    path: str,
    staged: str,
    messages,
    pcols: tuple[str, ...],
    bloom_cols: tuple[str, ...],
    bloom_bits: int,
    bloom_k: int,
) -> dict:
    """Driver half of a partitioned face write, shared by the batch
    writer and the streaming sink: group the task entries by exact
    partition tuple, rename each entry's temp file into its hive-named
    leaf under ``staged`` (metadata-only on one filesystem), and fold
    per-leaf rows/stats/blooms. Leaf names are for humans; the
    manifest's exact ``parts`` values are the source of truth, decoded
    nowhere from paths. Returns the ``leaves`` mapping
    :meth:`TxnTable.commit_staged_partitioned` takes (empty for an
    empty job)."""
    from urllib.parse import quote

    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    by_key: dict = {}
    for m in messages:
        if m is None:
            continue
        for parts, tmp_file, rows, stats, blooms, nbytes in m.entries:
            key = tuple(parts[c] for c in pcols)
            by_key.setdefault(key, []).append(
                (parts, tmp_file, rows, stats, blooms, nbytes)
            )
    leaves: dict = {}
    for key, entries in by_key.items():
        segs = [
            f"{c}={TxnTable._HIVE_NULL}"
            if v is None
            else f"{c}={quote(str(v), safe='')}"
            for c, v in zip(pcols, key)
        ]
        rel = "/".join([staged] + segs)
        out_dir = os.path.join(path, rel)
        os.makedirs(out_dir, exist_ok=True)
        lo: dict = {}
        hi: dict = {}
        nc: dict = {}
        rows_total = 0
        bytes_total = 0
        for parts, tmp_file, rows, stats, _, nbytes in entries:
            os.rename(
                os.path.join(path, "tmpstream", tmp_file),
                os.path.join(out_dir, tmp_file),
            )
            rows_total += rows
            bytes_total += int(nbytes)
            for c, (bl, bh, bn) in stats.items():
                if bl is not None and (c not in lo or bl < lo[c]):
                    lo[c] = bl
                if bh is not None and (c not in hi or bh > hi[c]):
                    hi[c] = bh
                nc[c] = nc.get(c, 0) + bn
        leaves[rel] = {
            "parts": entries[0][0],
            "rows": rows_total,
            "bytes": bytes_total,
            "stats": _stats_entries(lo, hi, nc, TxnTable._json_stat),
            "blooms": _fold_bloom_payloads(
                [e[4] for e in entries if e[4]], bloom_bits, bloom_k
            )
            if bloom_cols
            else {},
        }
    return leaves


def _fold_bloom_payloads(payloads: list, bits: int, k: int) -> dict:
    """Driver half: OR task bitmap bytes per column into the manifest's
    base64 ``{b, m, k}`` entries (one finished bitmap per column)."""
    import base64

    import numpy as np

    acc: dict = {}
    for p in payloads:
        for c, raw in p.items():
            a = np.frombuffer(raw, dtype=np.uint8)
            if c in acc:
                acc[c] = acc[c] | a
            else:
                acc[c] = a.copy()
    return {
        c: {
            "b": base64.b64encode(bm.tobytes()).decode("ascii"),
            "m": bits,
            "k": k,
        }
        for c, bm in acc.items()
    }


def _write_task_tmpfile(
    iterator,
    path: str,
    stats_cols: tuple[str, ...],
    bloom: _BloomAcc | None = None,
    checks: dict | None = None,
) -> _TxnTaskMessage:
    """Executor half shared by the batch WRITE face and the STREAMING
    SINK face: stream the task's Arrow batches into ONE uniquely-named
    parquet temp file under ``tmpstream/`` and report its name, row
    count, and per-column min/max in the commit message. Nothing a
    task writes is visible until the driver renames message-named
    files into a staged directory — so a failed-then-retried or
    speculatively duplicated task's file is simply never published
    (only the attempt whose message Spark accepts gets renamed), and
    orphans are reclaimed by :meth:`TxnTable.vacuum`."""
    import uuid as _uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tmp_dir = os.path.join(path, "tmpstream")
    tmp_file = None
    writer = None
    rows = 0
    lo: dict = {}
    hi: dict = {}
    nc: dict = {}
    viol: dict = {}
    try:
        for batch in iterator:
            if writer is None:
                os.makedirs(tmp_dir, exist_ok=True)
                tmp_file = f"part-{_uuid.uuid4().hex}.parquet"
                writer = pq.ParquetWriter(
                    os.path.join(tmp_dir, tmp_file), batch.schema
                )
            writer.write_batch(batch)
            rows += batch.num_rows
            for c in stats_cols:
                col = batch.column(c)
                mm = pc.min_max(col)
                bl, bh = mm["min"].as_py(), mm["max"].as_py()
                if bl is not None and (c not in lo or bl < lo[c]):
                    lo[c] = bl
                if bh is not None and (c not in hi or bh > hi[c]):
                    hi[c] = bh
                nc[c] = nc.get(c, 0) + col.null_count
            if bloom is not None:
                bloom.fold(batch)
            for (name, _), parsed in (checks or {}).items():
                n = _count_check_violations(batch, parsed)
                if n:
                    viol[name] = viol.get(name, 0) + n
    finally:
        if writer is not None:
            writer.close()
    return _TxnTaskMessage(
        tmp_file,
        rows,
        {
            c: (lo.get(c), hi.get(c), n)
            for c, n in nc.items()
            if c in lo or n  # all-null columns still record their count
        },
        bloom.payload() if bloom is not None else None,
        viol,
        nbytes=(
            os.path.getsize(os.path.join(tmp_dir, tmp_file))
            if tmp_file
            else 0
        ),
    )


def _write_task_partitioned(
    iterator,
    path: str,
    pcols: tuple[str, ...],
    stats_cols: tuple[str, ...],
    bloom_cols: tuple[str, ...],
    bloom_bits: int,
    bloom_k: int,
    checks: dict | None = None,
) -> _TxnPartTaskMessage:
    """Executor half of the PARTITIONED write face: split the task's
    Arrow batches by exact partition tuple and stream each group into
    its own uniquely-named temp file under ``tmpstream/``, tracking
    per-group rows / min-max / bloom bitmaps. Partition columns are
    usually low-cardinality, so a task holds O(partitions-it-sees)
    open writers — the same working set as Spark's own dynamic
    partition write."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tmp_dir = os.path.join(path, "tmpstream")
    state: dict = {}  # key tuple -> [tmp_file, writer, rows, lo, hi, bloom]
    viol: dict = {}
    try:
        for batch in iterator:
            for (name, _), parsed in (checks or {}).items():
                n = _count_check_violations(batch, parsed)
                if n:
                    viol[name] = viol.get(name, 0) + n
            key_rows: dict = {}
            cols = [batch.column(c).to_pylist() for c in pcols]
            for i, kv in enumerate(zip(*cols)):
                key_rows.setdefault(
                    tuple(_part_norm(x) for x in kv), []
                ).append(i)
            for key, idxs in key_rows.items():
                sub = (
                    batch
                    if len(idxs) == batch.num_rows
                    else batch.take(pa.array(idxs, pa.int64()))
                )
                st = state.get(key)
                if st is None:
                    os.makedirs(tmp_dir, exist_ok=True)
                    tmp_file = f"part-{_uuid.uuid4().hex}.parquet"
                    st = state[key] = [
                        tmp_file,
                        pq.ParquetWriter(
                            os.path.join(tmp_dir, tmp_file), batch.schema
                        ),
                        0,
                        {},
                        {},
                        _BloomAcc(bloom_cols, bloom_bits, bloom_k)
                        if bloom_cols
                        else None,
                        {},
                    ]
                st[1].write_batch(sub)
                st[2] += sub.num_rows
                for c in stats_cols:
                    col = sub.column(c)
                    mm = pc.min_max(col)
                    bl, bh = mm["min"].as_py(), mm["max"].as_py()
                    if bl is not None and (c not in st[3] or bl < st[3][c]):
                        st[3][c] = bl
                    if bh is not None and (c not in st[4] or bh > st[4][c]):
                        st[4][c] = bh
                    st[6][c] = st[6].get(c, 0) + col.null_count
                if st[5] is not None:
                    st[5].fold(sub)
    finally:
        for st in state.values():
            st[1].close()
    return _TxnPartTaskMessage(
        [
            (
                dict(zip(pcols, key)),
                st[0],
                st[2],
                {
                    c: (st[3].get(c), st[4].get(c), n)
                    for c, n in st[6].items()
                    if c in st[3] or n
                },
                st[5].payload() if st[5] is not None else {},
                # task-side size of the group's closed temp file — the
                # free stat that keeps the commit worker metadata-only
                os.path.getsize(os.path.join(tmp_dir, st[0])),
            )
            for key, st in state.items()
        ],
        viol,
    )


def _fold_task_stats(
    messages,
) -> tuple[list[str], int, dict, dict, dict, int | None]:
    """Driver half shared by both write faces: the successful tasks'
    temp-file names, total row count, folded per-column
    (lo, hi, null count), and summed task-reported byte sizes (None
    when any task predates the nbytes field — the commit then falls
    back to sizing the staged directory once)."""
    files = [m.tmp_file for m in messages if m is not None and m.tmp_file]
    total = sum(m.rows for m in messages if m is not None)
    sizes = [
        getattr(m, "nbytes", None)
        for m in messages
        if m is not None and m.tmp_file
    ]
    nbytes = sum(sizes) if all(s is not None for s in sizes) else None
    lo: dict = {}
    hi: dict = {}
    nc: dict = {}
    for m in messages:
        if m is None:
            continue
        for c, (bl, bh, bn) in m.stats.items():
            if bl is not None and (c not in lo or bl < lo[c]):
                lo[c] = bl
            if bh is not None and (c not in hi or bh > hi[c]):
                hi[c] = bh
            nc[c] = nc.get(c, 0) + bn
    return files, total, lo, hi, nc, nbytes


def _stats_entries(lo: dict, hi: dict, nc: dict, json_stat) -> dict:
    """Folded per-column values -> manifest [lo, hi, nulls] entries
    (an all-null column records [None, None, n])."""
    return {
        c: [json_stat(lo.get(c)), json_stat(hi.get(c)), int(n)]
        for c, n in nc.items()
        if c in lo or n
    }


def _abort_task_tmpfiles(path: str, messages) -> None:
    for m in messages:
        if m is not None and getattr(m, "tmp_file", None):
            try:
                os.remove(os.path.join(path, "tmpstream", m.tmp_file))
            except FileNotFoundError:
                pass


class TxnTableArrowWriter(DataSourceArrowWriter):
    """The WRITE face: ``df.write.format("txntable").mode(...)``.

    Executor tasks stream their Arrow batches into uniquely-named
    per-task temp files under ``tmpstream/`` and report the file name
    (plus observed row count and per-column min/max) in their commit
    message; the driver-side ``commit`` renames ONLY message-named
    files into a fresh ``data/<uuid>`` directory and publishes it
    through :meth:`TxnTable.commit_staged` — the same rebase-loop +
    atomic link(2) protocol as every Python-API commit, so DataSource
    writes, API writes, and streaming-sink writes all serialize
    through one log. Staging through the temp directory (not straight
    into the staged directory) is what makes task RETRIES and
    SPECULATIVE DUPLICATES safe: a failed attempt's file has no
    accepted message, so it is never renamed, never published, and is
    reclaimed by :meth:`TxnTable.vacuum`; the manifest row count can
    therefore never disagree with the committed data. ``abort`` (any
    task failed terminally) removes the messaged temp files; nothing
    was ever visible.

    Options: ``statscols`` (comma-separated) records manifest [min,
    max] stats for those columns so the pruned read faces skip over
    this commit too; ``mergeschema`` opts into schema evolution;
    ``partitionby`` (comma-separated) stages one leaf directory PER
    DISTINCT PARTITION TUPLE with its exact values in the manifest's
    ``parts`` — the full :meth:`TxnTable.write_partitioned` layout
    (exact pruning, ``drop_partitions``' metadata-only deletes,
    partition-aligned appends) from the pure Spark API; ``bloomcols``
    (+ ``bloombits``/``bloomk``) folds per-directory bloom bitmaps on
    executors, bit-compatible with the Python API's builder, so
    point-lookup skipping covers face-written commits too. Row counts
    ride the task messages (zero driver-side footer walks). CHECK
    constraints validate executor-side per Arrow batch — kleene masks
    for the grammar subset, the embedded ANSI evaluator for
    function-bearing expressions — so constraint-bearing tables are
    fully writable through the face."""

    def __init__(self, schema: SqlT.StructType, options: dict, overwrite: bool):
        self.path = _path_option(options)
        if not self.path:
            raise ValueError("txntable write requires a path")
        self.overwrite = overwrite
        self.merge_schema = str(
            options.get("mergeschema", "false")
        ).strip().lower() in ("true", "1", "yes")
        (
            self.stats_cols,
            self.pcols,
            self.bloom_cols,
            self.bloom_bits,
            self.bloom_k,
        ) = _parse_layout_options(schema, options)
        if self.pcols and self.merge_schema:
            raise ValueError(
                "mergeschema is not supported with partitionby (same "
                "rule as TxnTable.write_partitioned: evolve through an "
                "unpartitioned overwrite, or keep the schema exact)"
            )
        # .option("enablechangedatafeed", "true"): this write's commit
        # also sets the enableChangeDataFeed TABLE PROPERTY, so every
        # later delete()/merge() defaults to staging commit-time
        # _change_data sidecars — the pure-Spark-API way to make the
        # CDF stream representable across rewrites
        self.set_props = (
            {"enableChangeDataFeed": True}
            if str(options.get("enablechangedatafeed", "")).strip().lower()
            in ("true", "1", "yes")
            else None
        )
        # CHECK constraints validate ON EXECUTORS, per Arrow batch —
        # kleene masks for the grammar subset, the embedded ANSI
        # evaluator for function-bearing expressions — so
        # constraint-bearing tables are writable through the face
        self.checks = _parse_table_checks(self.path, schema)
        self.schema_json = schema.jsonValue()

    # -- executor-side -------------------------------------------------------

    def write(self, iterator):
        if self.pcols:
            return _write_task_partitioned(
                iterator,
                self.path,
                self.pcols,
                # partition values land as exact [v, v] stats entries;
                # measuring them again per leaf would be redundant
                tuple(c for c in self.stats_cols if c not in self.pcols),
                self.bloom_cols,
                self.bloom_bits,
                self.bloom_k,
                self.checks,
            )
        return _write_task_tmpfile(
            iterator,
            self.path,
            self.stats_cols,
            _BloomAcc(self.bloom_cols, self.bloom_bits, self.bloom_k)
            if self.bloom_cols
            else None,
            self.checks,
        )

    # -- driver-side ---------------------------------------------------------

    def commit(self, messages) -> None:
        _raise_if_violated(self.path, messages)
        if self.pcols:
            self._commit_partitioned(messages)
            return
        import uuid as _uuid

        from ceneton_database_tools_spark.sinks.txnlog import TxnTable

        files, total, lo, hi, nc, nbytes = _fold_task_stats(messages)
        table = TxnTable(self.path)
        stats = _stats_entries(lo, hi, nc, table._json_stat)
        blooms = (
            _fold_bloom_payloads(
                [m.blooms for m in messages if m is not None and m.blooms],
                self.bloom_bits,
                self.bloom_k,
            )
            if self.bloom_cols
            else {}
        )
        staged = f"data/{_uuid.uuid4().hex}"
        out_dir = os.path.join(self.path, staged)
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            os.rename(
                os.path.join(self.path, "tmpstream", f),
                os.path.join(out_dir, f),
            )
        if not files:
            self._write_empty_leaf(out_dir)
            if nbytes is not None:
                # the one driver-written file; its stat is free here
                nbytes += os.path.getsize(
                    os.path.join(out_dir, "part-empty.parquet")
                )
        table.commit_staged(
            staged,
            total,
            mode="overwrite" if self.overwrite else "append",
            schema_json=self.schema_json,
            merge_schema=self.merge_schema,
            staged_stats=stats or None,
            staged_blooms=blooms or None,
            set_props=self.set_props,
            validated_constraints=set(self.checks),
            staged_bytes=nbytes,
        )

    def _write_empty_leaf(self, out_dir: str) -> None:
        # an empty DataFrame wrote no files: stage one zero-row
        # parquet so the committed directory is a valid scan target
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        os.makedirs(out_dir, exist_ok=True)
        arrow = to_arrow_schema(SqlT.StructType.fromJson(self.schema_json))
        pq.write_table(
            pa.Table.from_arrays(
                [pa.nulls(0, type=f.type) for f in arrow], schema=arrow
            ),
            os.path.join(out_dir, "part-empty.parquet"),
        )

    def _commit_partitioned(self, messages) -> None:
        """Assemble the task entries into one hive-named leaf directory
        per distinct partition tuple (rename — metadata-only on one
        filesystem), fold per-leaf rows/stats/blooms across tasks, and
        publish through :meth:`TxnTable.commit_staged_partitioned`.
        Leaf names are for humans; the manifest's exact ``parts``
        values are the source of truth, decoded nowhere from paths."""
        import uuid as _uuid

        from ceneton_database_tools_spark.sinks.txnlog import TxnTable

        table = TxnTable(self.path)
        staged = f"data/{_uuid.uuid4().hex}"
        leaves = _assemble_partitioned_leaves(
            self.path,
            staged,
            messages,
            self.pcols,
            self.bloom_cols,
            self.bloom_bits,
            self.bloom_k,
        )
        if not leaves:
            # empty input: stage the bare root (one zero-row file, no
            # partition values) — the same shape the Python API leaves
            self._write_empty_leaf(os.path.join(self.path, staged))
            leaves[staged] = {
                "parts": {},
                "rows": 0,
                "bytes": os.path.getsize(
                    os.path.join(self.path, staged, "part-empty.parquet")
                ),
            }
        table.commit_staged_partitioned(
            staged,
            leaves,
            self.pcols,
            mode="overwrite" if self.overwrite else "append",
            schema_json=self.schema_json,
            set_props=self.set_props,
            validated_constraints=set(self.checks),
        )

    def abort(self, messages) -> None:
        flat = []
        for m in messages:
            if m is None:
                continue
            if hasattr(m, "entries"):
                flat.extend(
                    _TxnTaskMessage(e[1], e[2], {}) for e in m.entries
                )
            else:
                flat.append(m)
        _abort_task_tmpfiles(self.path, flat)


class TxnTableStreamSink(DataSourceStreamArrowWriter):
    """The STREAMING SINK face: ``df.writeStream.format("txntable")``.

    Per micro-batch, executor tasks stream their Arrow batches into
    per-task temp files under ``tmpstream/`` (task names are unique, so
    concurrent batches and zombie retries can never collide); the
    driver's ``commit(messages, batchId)`` then moves exactly THIS
    batch's files into a fresh ``data/<uuid>`` directory (rename on the
    same filesystem — metadata-only) and publishes it through
    :meth:`TxnTable.commit_staged` with the writer watermark
    ``(app_id, batchId)`` — the Delta txnAppId/txnVersion contract, so
    a REPLAYED micro-batch (checkpoint recovery re-delivers the same
    batchId) discards its staging and lands zero duplicate rows.

    ``.option("txnappid", ...)`` pins the watermark key across query
    RESTARTS (Spark does not expose the query id to the writer; with
    the option unset a per-writer-instance key still dedupes retries
    within one run, and the docstring is the contract: set it for
    cross-restart exactly-once). ``statscols`` records manifest
    [min,max] from task-observed values, ``partitionby`` stages each
    micro-batch as one leaf per exact partition tuple (spec-matched
    appends onto a partitioned table — a streaming ingest keeps
    ``drop_partitions`` and exact pruning working), and ``bloomcols``
    folds per-directory bloom bitmaps — all the same options as the
    batch face. ``abort`` deletes the failed batch's temp files;
    files orphaned by task crashes live under ``tmpstream/`` and are
    reclaimed by :meth:`TxnTable.vacuum` under the usual retention
    window."""

    def __init__(self, schema: SqlT.StructType, options: dict):
        import uuid as _uuid

        self.path = _path_option(options)
        if not self.path:
            raise ValueError("txntable stream sink requires a path")
        if not options.get("txnappid"):
            import warnings

            warnings.warn(
                "txntable stream sink started without .option('txnappid', "
                "...): micro-batch replays within THIS run dedupe, but a "
                "RESTARTED query gets a fresh watermark key and will "
                "re-deliver its recovered batch — set txnappid to a stable "
                "per-query id for cross-restart exactly-once",
                UserWarning,
                stacklevel=2,
            )
        self.app_id = options.get("txnappid") or f"txnsink-{_uuid.uuid4().hex}"
        (
            self.stats_cols,
            self.pcols,
            self.bloom_cols,
            self.bloom_bits,
            self.bloom_k,
        ) = _parse_layout_options(schema, options)
        self.checks = _parse_table_checks(self.path, schema)
        self.schema_json = schema.jsonValue()

    # -- executor-side -------------------------------------------------------

    def write(self, iterator):
        if self.pcols:
            return _write_task_partitioned(
                iterator,
                self.path,
                self.pcols,
                tuple(c for c in self.stats_cols if c not in self.pcols),
                self.bloom_cols,
                self.bloom_bits,
                self.bloom_k,
                self.checks,
            )
        return _write_task_tmpfile(
            iterator,
            self.path,
            self.stats_cols,
            _BloomAcc(self.bloom_cols, self.bloom_bits, self.bloom_k)
            if self.bloom_cols
            else None,
            self.checks,
        )

    # -- driver-side ---------------------------------------------------------

    def commit(self, messages, batchId: int) -> None:
        import uuid as _uuid

        from ceneton_database_tools_spark.sinks.txnlog import TxnTable

        _raise_if_violated(self.path, messages)
        if self.pcols:
            staged = f"data/{_uuid.uuid4().hex}"
            leaves = _assemble_partitioned_leaves(
                self.path,
                staged,
                messages,
                self.pcols,
                self.bloom_cols,
                self.bloom_bits,
                self.bloom_k,
            )
            if not leaves:
                return  # empty micro-batch: no empty commit
            TxnTable(self.path).commit_staged_partitioned(
                staged,
                leaves,
                self.pcols,
                mode="append",
                schema_json=self.schema_json,
                app_id=self.app_id,
                txn_version=int(batchId),
                validated_constraints=set(self.checks),
            )
            return
        files, total, lo, hi, nc, nbytes = _fold_task_stats(messages)
        if not files:
            return  # empty micro-batch: nothing staged, nothing to commit
        blooms = (
            _fold_bloom_payloads(
                [m.blooms for m in messages if m is not None and m.blooms],
                self.bloom_bits,
                self.bloom_k,
            )
            if self.bloom_cols
            else {}
        )
        staged = f"data/{_uuid.uuid4().hex}"
        out_dir = os.path.join(self.path, staged)
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            os.rename(
                os.path.join(self.path, "tmpstream", f),
                os.path.join(out_dir, f),
            )
        table = TxnTable(self.path)
        stats = _stats_entries(lo, hi, nc, table._json_stat)
        table.commit_staged(
            staged,
            total,
            mode="append",
            schema_json=self.schema_json,
            staged_stats=stats or None,
            staged_blooms=blooms or None,
            app_id=self.app_id,
            txn_version=int(batchId),
            validated_constraints=set(self.checks),
            staged_bytes=nbytes,
        )

    def abort(self, messages, batchId: int) -> None:
        flat = []
        for m in messages:
            if m is None:
                continue
            if hasattr(m, "entries"):
                flat.extend(
                    _TxnTaskMessage(e[1], e[2], {}) for e in m.entries
                )
            else:
                flat.append(m)
        _abort_task_tmpfiles(self.path, flat)


class TxnTableDataSource(DataSource):
    """``spark.read.format("txntable").load(path)`` (batch, with
    manifest pruning wired to filter pushdown) and
    ``spark.readStream.format("txntable").load(path)`` (streaming).

    The schema is derived from the table's own manifest — the recorded
    schema IS the projection contract — so neither face needs
    hand-written DDL; an explicit ``.schema(...)`` still wins (e.g. to
    stream a historical column order)."""

    @classmethod
    def name(cls) -> str:
        return "txntable"

    def schema(self) -> SqlT.StructType:
        opts = dict(self.options)
        path = _path_option(opts)
        if path:
            latest = _latest_version(path)
            if latest is not None:
                v = opts.get("version")
                ts = opts.get("timestampasof")
                if v is not None:
                    pick = int(v)
                elif ts is not None:
                    from ceneton_database_tools_spark.sinks.txnlog import (
                        TxnTable,
                    )

                    pick = TxnTable(path).version_as_of(float(ts))
                else:
                    pick = latest
                m = _stub_of(path, pick)  # schema is table-level
                if m.get("schema") is not None:
                    st = SqlT.StructType.fromJson(m["schema"])
                    want = [
                        c.strip()
                        for c in opts.get("columns", "").split(",")
                        if c.strip()
                    ]
                    if want:
                        # COLUMN PROJECTION rides the load options: the
                        # declared schema IS the Arrow emit contract, so
                        # trimming it here means executors read ONLY
                        # these columns from parquet (iter_batches'
                        # column pushdown) — a wide table pays 2-column
                        # I/O for a 2-column query. Relation-keyed like
                        # `where`, hence reuse-safe by construction.
                        by_name = {f.name: f for f in st.fields}
                        bad = [c for c in want if c not in by_name]
                        if bad or len(set(want)) != len(want):
                            raise ValueError(
                                f"columns option names unknown or duplicate "
                                f"column(s) {bad or want}; table columns are "
                                f"{[f.name for f in st.fields]}"
                            )
                        st = SqlT.StructType([by_name[c] for c in want])
                    if str(opts.get("readchangefeed", "")).lower() in (
                        "true",
                        "1",
                        "yes",
                    ):
                        # the change-feed stream carries the table's
                        # columns plus the two change-meta columns
                        st = SqlT.StructType(
                            list(st.fields)
                            + [
                                SqlT.StructField(
                                    "change_type", SqlT.StringType(), False
                                ),
                                SqlT.StructField(
                                    "commit_version", SqlT.LongType(), False
                                ),
                            ]
                        )
                    return st
        raise ValueError(
            "cannot derive the txntable schema: no committed manifest "
            f"with a recorded schema under {path!r} — pass an explicit "
            ".schema(...) (legacy logs), or check the path option"
        )

    def reader(self, schema: SqlT.StructType) -> TxnTableBatchReader:
        return TxnTableBatchReader(schema, dict(self.options))

    def streamReader(self, schema: SqlT.StructType) -> TxnTableStreamReader:
        return TxnTableStreamReader(schema, dict(self.options))

    def writer(self, schema: SqlT.StructType, overwrite: bool):
        return TxnTableArrowWriter(schema, dict(self.options), overwrite)

    def streamWriter(self, schema: SqlT.StructType, overwrite: bool):
        return TxnTableStreamSink(schema, dict(self.options))


def register_txn_source(spark: SparkSession) -> None:
    """Idempotently register the txntable batch+streaming format."""
    if not hasattr(spark, "dataSource"):
        raise RuntimeError(
            "this SparkSession has no Python DataSource registry "
            "(spark.dataSource) — the txntable source needs PySpark >= 4.0"
        )
    # pushFilters is rejected at plan time unless the session opts into
    # Python-source pushdown; a runtime SQL conf, safe to set here so
    # foreign sessions (the driver's) get the batch face's pruning too
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxnTableDataSource)
