"""Relational operator catalog (SURVEY.md §2 Part B).

The reference (`kws/ceneton-database-tools`) implements none of the
standard relational operators (SURVEY.md §2 Part B table: no filters,
joins, aggregations, windows, sorts, or set ops anywhere in
`fmp_reader.py` / `_cli.py` / `sql.py`) — the general query surface is
what Spark itself provides, and this module *declares* that surface as
named, tested queries so the driver's oracle gate can exercise every
operator class.

Design rules (see registry module docstring):
* Declarative DataFrame API only — Catalyst handles pushdown, pruning,
  join strategy (broadcast hints added where a dimension is known
  small), and AQE handles runtime re-planning at scale.
* Float aggregates rounded identically on both engine and oracle side.
* Any query whose output would otherwise have nondeterministic row
  content (top-k with ties) carries a deterministic tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                    AS sum_qty,
      round(sum(l_extendedprice), 2)                               AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      round(avg(l_quantity), 6)                                    AS avg_qty,
      round(avg(l_extendedprice), 6)                               AS avg_price,
      round(avg(l_discount), 6)                                    AS avg_disc,
      count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "sort"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filter + 8-way hash aggregate.

    Scale posture: partial aggregation (map-side combine) collapses
    6e5..6e11 rows into 6 groups before the shuffle; the parquet scan
    carries a pushed `l_shipdate` predicate and prunes to 7 columns.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
