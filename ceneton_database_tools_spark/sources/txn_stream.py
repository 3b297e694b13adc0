"""Streaming SOURCE over the transactional table: versions are the
offsets — Delta's table-streaming contract re-expressed with the
Python DataSource API.

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

Change-handling semantics follow Delta's streaming source:

* pure ``append`` commits stream their added directories;
* a non-append commit (``delete`` / ``merge`` / ``optimize`` /
  ``overwrite``) in the consumed range RAISES by default — an
  insert-only reader silently skipping a rewrite would miss or
  double-count rows;
* ``.option("ignorechanges", "true")`` opts into Delta's documented
  ``ignoreChanges`` behavior instead: rewritten directories are
  re-emitted in full (downstream must tolerate re-delivered
  survivors, e.g. by keying on a primary key).

History bounds: streaming from versions dropped by ``truncate_log`` /
``vacuum`` fails loudly (the manifest is gone), exactly like streaming
a Delta table past its retention.

The reference has no streaming and no table format (its one sink is a
single JDBC load, ``sql.py:17-37``); this closes the loop the
exactly-once SINK (txnlog.write_idempotent) opened — the table now
streams in both directions.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as SqlT
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class TxnFilePartition(InputPartition):
    """One parquet file of one newly-committed directory. Carries the
    absolute path plus the projected column order so executors emit
    batches in declared-schema order regardless of file layout."""

    def __init__(self, file_path: str, columns: tuple[str, ...]):
        self.file_path = file_path
        self.columns = columns


def _manifest(table_path: str, version: int) -> dict:
    import json

    p = os.path.join(table_path, "_txnlog", f"{version:011d}.json")
    try:
        with open(p) as f:
            return json.load(f)
    except FileNotFoundError:
        raise RuntimeError(
            f"cannot stream version {version} of {table_path}: its manifest "
            "is gone (truncate_log/vacuum dropped it) — restart the query "
            "from a fresh checkpoint to begin at the current snapshot"
        ) from None


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


class TxnTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: SqlT.StructType, options: dict):
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("txntable stream requires a path option")
        self.columns = tuple(schema.fieldNames())
        self.ignore_changes = str(
            options.get("ignorechanges", "false")
        ).strip().lower() in ("true", "1", "yes")

    # -- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:
        # -1 = "before version 0": the first batch consumes the whole
        # current snapshot (v0's full file set plus later diffs)
        return {"version": -1}

    def latestOffset(self) -> dict:
        latest = _latest_version(self.path)
        return {"version": -1 if latest is None else latest}

    # -- planning (driver-side) --------------------------------------------

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[InputPartition] = []

        def add_dirs(rels) -> None:
            for rel in rels:
                for f in _parquet_files(os.path.join(self.path, rel)):
                    parts.append(TxnFilePartition(f, self.columns))

        if lo == -1:
            # INITIAL SNAPSHOT (Delta's semantics): the first batch is
            # the full CURRENT snapshot at `hi`, not a replay of every
            # historical commit — so mid-history deletes/merges never
            # block a stream that starts on today's table
            if hi >= 0:
                add_dirs(sorted(_manifest(self.path, hi)["files"]))
            return parts
        prev_files = set(_manifest(self.path, lo)["files"])
        for v in range(lo + 1, hi + 1):
            m = _manifest(self.path, v)
            cur = set(m["files"])
            if m.get("op") != "append" and not self.ignore_changes:
                raise RuntimeError(
                    f"version {v} of {self.path} is a {m.get('op')!r} "
                    "commit; an insert-only stream cannot represent it. "
                    "Set .option('ignorechanges', 'true') to re-emit "
                    "rewritten directories (Delta ignoreChanges "
                    "semantics), or stream the change feed instead."
                )
            add_dirs(sorted(cur - prev_files))
            prev_files = cur
        return parts

    # -- execution (executor-side) -----------------------------------------

    def read(self, partition: TxnFilePartition) -> Iterator:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.file_path)
        want = [c for c in partition.columns if c in pf.schema_arrow.names]
        for batch in pf.iter_batches(columns=want):
            # project to declared order; schema mismatches surface as
            # loud Arrow conversion errors, never silent column swaps
            yield batch.select(list(partition.columns))

    def commit(self, end: dict) -> None:
        pass  # offsets are derived from the immutable log; nothing to ack


class TxnTableDataSource(DataSource):
    """``spark.readStream.format("txntable").schema(ddl).load(path)``.

    Batch reads of a txn table go through ``TxnTable.read`` /
    ``read_pruned`` (plain parquet scans with manifest pruning); this
    DataSource is the STREAMING face only."""

    @classmethod
    def name(cls) -> str:
        return "txntable"

    def schema(self) -> str:
        raise ValueError(
            "txntable streaming needs an explicit .schema(...) — the "
            "declared schema is the projection contract executors emit "
            "Arrow batches against (derive it once driver-side with "
            "TxnTable(path).read(spark).schema)"
        )

    def streamReader(self, schema: SqlT.StructType) -> TxnTableStreamReader:
        return TxnTableStreamReader(schema, dict(self.options))


def register_txn_source(spark: SparkSession) -> None:
    """Idempotently register the txntable streaming format."""
    if not hasattr(spark, "dataSource"):
        raise RuntimeError(
            "this SparkSession has no Python DataSource registry "
            "(spark.dataSource) — the txntable source needs PySpark >= 4.0"
        )
    spark.dataSource.register(TxnTableDataSource)
