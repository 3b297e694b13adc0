"""Table catalog: load the driver's parquet tables and register views.

The driver materializes a TPC-H-ish star schema plus ``events``,
``documents``, ``embeddings`` under ``/root/testdata/sf*``
(TESTDATA.md / FIXTURES.md). At 100 TB these would be partitioned
parquet/Delta directories; ``load_tables`` keeps the access path
identical (``spark.read.parquet`` handles one file or a partitioned
directory transparently, with pushdown + pruning either way).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at every realistic scale factor
# (region/nation are fixed-size; supplier/part/customer stay << the
# autoBroadcastJoinThreshold at the scale factors we run — on a real
# 100 TB deployment Catalyst/AQE re-checks actual sizes, so hints below
# are advisory, not hard-coded plan choices).
BROADCAST_DIMS = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize ``events.ts`` to session-local TIMESTAMP regardless of
    the parquet physical type the generator used that round:

    * TIMESTAMP(NANOS) — Spark rejects it by default
      (PARQUET_TYPE_ILLEGAL); the session factory sets the legacy
      nanos-as-long flag, and the bigint is truncated to microseconds
      (exactly what DuckDB does reading the same file). Nano→micro must
      be integer division: epoch nanos (~1.7e18) exceed a double's
      53-bit mantissa, so float ``/ 1000`` can be off by ±1 µs.
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark infers
      TIMESTAMP_NTZ, which watermarks/``unix_micros`` reject; cast to
      LTZ. The session timezone is pinned UTC, so the wall-clock values
      stay identical to DuckDB's naive read.
    * TIMESTAMP(MICROS, adjusted) — already session-local, no-op.
    """
    ensure_nanos_conf(spark)
    return normalize_events_ts(spark.read.parquet(table_path(sf_dir, "events")))


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Self-heal the legacy nanos-as-long flag (the driver's session may
    not have been built by our factory). Must run BEFORE the parquet
    read whose schema it affects."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """ONE copy of the events ts dispatch (see _load_events' docstring
    for the physical-type history) — shared by the batch loader and the
    streaming reader so a future fixture variant cannot be handled in
    only one of them."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def register_txn_table(
    spark: SparkSession,
    name: str,
    path: str,
    global_view: bool = False,
    **options: str,
) -> None:
    """Register a transactional table under a SQL NAME — the catalog
    spelling for :class:`~ceneton_database_tools_spark.sinks.txnlog.
    TxnTable`, so pure-SQL users query it like any other table::

        register_txn_table(spark, "sales", "/data/sales", where="year >= 2024")
        spark.sql("SELECT * FROM sales").show()

    Mechanics: ``CREATE OR REPLACE TEMPORARY VIEW name USING txntable
    OPTIONS (...)`` (``GLOBAL TEMPORARY`` with ``global_view=True`` —
    reachable as ``global_temp.name`` from every session of this
    SparkContext). Every txntable load option passes through
    (``where``, ``columns``, ``version``, ``timestampasof``,
    ``pushdown``).

    Honest limitation, verified against Spark 4.1: a PERSISTENT
    ``CREATE TABLE ... USING txntable`` accepts the DDL but the scan
    worker receives an EMPTY options map — the catalog does not
    forward a Python DataSource's storage options to reads — so
    metastore persistence is not reachable for Python sources today;
    the temp-view spelling is the supported catalog surface."""
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )

    register_txn_source(spark)
    kind = "GLOBAL TEMPORARY" if global_view else "TEMPORARY"
    opts = {"path": path, **options}

    def _ident(s: str) -> str:
        # backticks inside a backtick-quoted identifier are escaped by
        # doubling, same as the option-value quote escaping below
        return "`" + str(s).replace("`", "``") + "`"

    rendered = ", ".join(
        f"{_ident(k)} '{str(v).replace(chr(39), chr(39) * 2)}'"
        for k, v in opts.items()
    )
    spark.sql(
        f"CREATE OR REPLACE {kind} VIEW {_ident(name)} "
        f"USING txntable OPTIONS ({rendered})"
    )
