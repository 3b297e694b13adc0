"""Partitioned parquet sink — the 100 TB table layout.

At scale, tables are directories partitioned by a low-cardinality
column (``dt=…/part-*.parquet``): queries that filter on the partition
column prune whole directories before any IO happens (visible as
``PartitionFilters`` in the scan node), and writers append new
partitions without touching old ones. This module is the thin,
declared wrapper; the pruning behavior is proven in
``tests/test_scale_patterns.py``.

The reference has no partitioned output (one SQLite table); this is
the engine-side layout its data would live in at 1000× the size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``.
    Writers scale per partition; ``mode="overwrite"`` replaces only the
    partitions present in ``df`` — the per-write ``partitionOverwriteMode``
    option is pinned to ``dynamic`` because the session default is
    STATIC, which would first truncate the ENTIRE base path (a df
    holding one day would silently destroy every other partition)."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back (partition columns are restored
    from the directory structure; filters on them prune directories)."""
    return spark.read.parquet(path)
