"""SQL database sink: all-string DDL, exists-guard, metadata KV table,
batched inserts — parity with the reference's ``create_db`` path
(``/root/reference/src/ceneton_database_utils/sql.py:17-125``,
``_cli.py:108-180``).

Two modes:

* **parity** (``sqlite:///path``) — the reference's exact observable
  behavior: refuse if the table or its ``_metadata`` twin exists
  (``sql.py:66-75``), create every data column as TEXT (``sql.py:35``),
  write the KV metadata rows (``sql.py:96-123``), then load in batches
  of 500 inside ONE transaction (``_cli.py:164-180``). Single-writer
  semantics fundamentally do not distribute, so this path streams
  partitions through the driver (``toLocalIterator`` — one partition
  resident at a time, never a full collect). Uses stdlib sqlite3; no
  SQLAlchemy dependency.
* **scale** (``jdbc:...``) — ``df.write.jdbc`` with
  ``batchsize=500`` and ``errorifexists``: per-partition transactions,
  distributed writers. This is the 100 TB path; it trades the
  reference's one-transaction guarantee for parallelism (documented,
  not silent).

The ``--mapping-column`` value becomes the column *comment*, not the
column *name* — the reference does the same despite its README calling
it a rename (``sql.py:30-35``; SURVEY.md §2 A9). SQLite has no column
comments, so parity output carries them only in the generated DDL text
(as ``--`` comment lines), exactly as observable from the reference's
SQLite output (none). ``apply_as="rename"`` opts into true renaming.
"""

from __future__ import annotations

import datetime
import sqlite3
from collections.abc import Iterable

from pyspark.sql import DataFrame

BATCH_SIZE = 500  # reference: _cli.py:166


def _quote(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def generate_ddl(
    table_name: str,
    fields: list[str],
    mapping: dict[str, str] | None = None,
) -> str:
    """All-string CREATE TABLE, original headers as ``--`` comments
    (parity with ``sql.py:17-37``: every column String; the mapping
    value is attached as a comment, never a rename)."""
    lines = []
    for i, name in enumerate(fields):
        comma = "," if i < len(fields) - 1 else ""
        # comment text is arbitrary user data (CSV mapping values, FMP
        # field names) — a newline would terminate the `--` comment and
        # inject the remainder as live SQL; collapse all whitespace
        comment = (
            f"  -- {' '.join(mapping[name].split())}"
            if mapping and name in mapping
            else ""
        )
        lines.append(f"  {_quote(name)} TEXT{comma}{comment}")
    return f"CREATE TABLE {_quote(table_name)} (\n" + "\n".join(lines) + "\n)"


def _metadata_ddl(table_name: str) -> str:
    return (
        f"CREATE TABLE {_quote(table_name + '_metadata')} (\n"
        '  "key" VARCHAR(255) PRIMARY KEY,\n'
        '  "value" VARCHAR(1000),\n'
        '  "created_at" TIMESTAMP\n'
        ")"
    )


def build_metadata_rows(
    schema_name: str,
    record_count: int,
    db_metadata: dict[str, str] | None = None,
    created_at: datetime.datetime | None = None,
) -> list[tuple[str, str, str]]:
    """The KV rows the reference writes (``sql.py:96-120``):
    created_at / source_schema_name / record_count, then user pairs
    (the CLI adds source_url / source_sha256 into ``db_metadata``).

    Byte parity for the ``created_at`` COLUMN: the reference binds a
    datetime through SQLAlchemy's sqlite DATETIME, which renders
    ``YYYY-MM-DD HH:MM:SS.ffffff`` (no timezone); only the
    ``created_at`` KV *value* is the ISO-8601 string
    (``value=creation_time.isoformat()``, ``sql.py:98-102``)."""
    now = created_at or datetime.datetime.now(datetime.timezone.utc)
    ts_value = now.isoformat()
    ts_col = now.strftime("%Y-%m-%d %H:%M:%S.%f")
    rows = [
        ("created_at", ts_value, ts_col),
        ("source_schema_name", schema_name, ts_col),
        ("record_count", str(record_count), ts_col),
    ]
    for key, value in (db_metadata or {}).items():
        rows.append((key, str(value), ts_col))
    return rows


def _sqlite_path(db_url: str) -> str:
    return db_url[len("sqlite:///") :]


def create_db_from_df(
    df: DataFrame,
    db_url: str,
    table_name: str,
    schema_name: str,
    record_count: int,
    mapping: dict[str, str] | None = None,
    db_metadata: dict[str, str] | None = None,
    apply_as: str = "comment",
    batch_size: int = BATCH_SIZE,
    created_at: datetime.datetime | None = None,
) -> None:
    """Create the table + ``_metadata`` twin and load ``df``.

    ``sqlite:///`` URLs run the parity path; ``jdbc:`` URLs run the
    distributed path (requires the matching JDBC driver jar on the
    cluster).
    """
    if apply_as not in ("comment", "rename"):
        raise ValueError(
            f"apply_as must be 'comment' or 'rename', got {apply_as!r}"
        )
    if apply_as == "rename" and mapping:
        df = df.withColumnsRenamed({k: v for k, v in mapping.items() if k in df.columns})
        mapping = None
    fields = df.columns
    meta_rows = build_metadata_rows(schema_name, record_count, db_metadata, created_at)

    if db_url.startswith("sqlite:///"):
        _create_sqlite(df, _sqlite_path(db_url), table_name, fields, mapping, meta_rows, batch_size)
    elif db_url.startswith("jdbc:"):
        _create_jdbc(df, db_url, table_name, meta_rows, batch_size)
    else:
        raise ValueError(f"unsupported db url (want sqlite:/// or jdbc:): {db_url}")


def _existing_tables(conn: sqlite3.Connection) -> set[str]:
    return {
        r[0] for r in conn.execute("SELECT name FROM sqlite_master WHERE type = 'table'")
    }


def _create_sqlite(
    df: DataFrame,
    path: str,
    table_name: str,
    fields: list[str],
    mapping: dict[str, str] | None,
    meta_rows: list[tuple[str, str, str]],
    batch_size: int,
) -> None:
    conn = sqlite3.connect(path)
    try:
        existing = _existing_tables(conn)
        # exists-guard on both tables (sql.py:66-75)
        if table_name in existing:
            raise ValueError(f"Table '{table_name}' already exists in the database")
        if f"{table_name}_metadata" in existing:
            raise ValueError(
                f"Metadata table '{table_name}_metadata' already exists in the database"
            )
        # Explicit BEGIN so the DDL joins the load transaction: Python's
        # sqlite3 only implicitly begins before DML, so without this the
        # CREATE TABLEs run in autocommit and a mid-load rollback leaves
        # empty tables behind that block every rerun on the exists-guard.
        conn.execute("BEGIN")
        conn.execute(generate_ddl(table_name, fields, mapping))
        conn.execute(_metadata_ddl(table_name))
        conn.executemany(
            f"INSERT INTO {_quote(table_name + '_metadata')} VALUES (?, ?, ?)", meta_rows
        )
        placeholders = ", ".join("?" for _ in fields)
        insert_sql = f"INSERT INTO {_quote(table_name)} VALUES ({placeholders})"
        # One transaction over the whole load, batches of 500
        # (_cli.py:169-180); partitions stream through the driver one
        # at a time — parity mode is single-writer by definition.
        batch: list[tuple] = []
        for row in df.toLocalIterator():
            batch.append(tuple(row))
            if len(batch) >= batch_size:
                conn.executemany(insert_sql, batch)
                batch.clear()
        if batch:
            conn.executemany(insert_sql, batch)
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()


def _create_jdbc(
    df: DataFrame,
    db_url: str,
    table_name: str,
    meta_rows: list[tuple[str, str, str]],
    batch_size: int,
) -> None:
    """Distributed JDBC load: both tables are existence-probed UP
    FRONT (like the reference's two-table guard, sql.py:66-75) so a
    stale metadata twin fails fast instead of after the expensive data
    load — errorifexists alone would discover it only after fully
    writing the data table, leaving a partial, rerun-blocking state.
    ``batchsize`` matches the reference's 500-row INSERT batches;
    transactions are per-partition (the scale trade-off)."""
    spark = df.sparkSession
    # "table absent" must be diagnosed, not assumed: a connectivity /
    # auth / SELECT-permission failure from the probe would otherwise
    # silently skip the guard and proceed to the expensive load —
    # exactly the partial, rerun-blocking state the probe prevents.
    # Markers cover the ANSI SQLSTATEs (42S02 / 42P01) plus the
    # table-not-found message shapes of sqlite, Postgres, MySQL,
    # SQL Server, and Spark's own AnalysisException.
    not_found_markers = (
        "no such table",
        "not found",
        "does not exist",
        "doesn't exist",
        "unknown table",
        "42s02",
        "42p01",
    )
    for t in (table_name, f"{table_name}_metadata"):
        try:
            spark.read.jdbc(db_url, t).schema  # metadata-only probe
        except Exception as exc:
            msg = str(exc).lower()
            # the markers alone also match DATABASE-level failures
            # ('database "x" does not exist' from a bad URL) — require
            # the message to name the probed table, as every covered
            # engine's table-not-found shape does; a marker WITHOUT the
            # table name is a connection-level error wearing similar
            # words, so it re-raises like any other probe failure
            if any(m in msg for m in not_found_markers) and t.lower() in msg:
                continue  # table absent — the good case
            raise  # connection/auth/permission: fail fast, keep the guard
        raise ValueError(f"Table '{t}' already exists in the database")
    props = {"batchsize": str(batch_size)}
    df.write.mode("errorifexists").options(**props).jdbc(db_url, table_name)
    meta_df = spark.createDataFrame(
        [(k, v, datetime.datetime.fromisoformat(ts)) for k, v, ts in meta_rows],
        schema="key string, value string, created_at timestamp",
    )
    # match the parity DDL's column shapes (VARCHAR sizes + TIMESTAMP;
    # a PRIMARY KEY constraint is not expressible through the JDBC
    # writer — documented divergence from the sqlite parity table)
    (
        meta_df.write.mode("errorifexists")
        .options(**props)
        .option(
            "createTableColumnTypes",
            "key VARCHAR(255), value VARCHAR(1000), created_at TIMESTAMP",
        )
        .jdbc(db_url, f"{table_name}_metadata")
    )
