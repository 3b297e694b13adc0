"""Data-quality validation operators (constraint-report shape).

The Deequ/Great-Expectations-style surface a production pipeline runs
before publishing a table: null-rate, range, uniqueness, and
referential-integrity checks, each evaluated as a declarative aggregate
and unioned into one small report relation.

The reference (kws/ceneton-database-tools) validates only the header
record count (fmp_reader.py:155-161); this family generalizes that
"does the data match its contract?" idea to relational constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators.registry import register


@register(
    "dq_validation_report",
    oracle="""
    SELECT 'orders_orphan_customer' AS rule,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'customer_acctbal_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'orders_unique_orderkey',
           CAST(count(*) AS BIGINT),
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_tax_range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    """,
    tags=("quality", "validation"),
)
def dq_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report: six declarative data-quality rules
    (referential integrity, value ranges, key uniqueness, value
    domains) each reduced to (rule, n_checked, n_violations) and
    unioned into one small relation — the publish-gate report shape.

    Scale shape: every rule is a scan + map-side conditional aggregate
    (the three lineitem rules share one scan via a single multi-
    aggregate each; Spark reuses the exchange where it can). The
    referential check is a left join on the key — AQE broadcasts the
    smaller side when it fits — and the uniqueness check is the
    two-phase distinct aggregate. The report itself is six rows no
    matter the input size.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def _report(name: str, df: DataFrame, violation) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.count("*").cast("long").alias("n_checked"),
            F.sum(F.when(violation, 1).otherwise(0)).cast("long").alias("n_violations"),
        ).select("rule", "n_checked", "n_violations")

    orphan = _report(
        "orders_orphan_customer",
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left"),
        F.col("c_custkey").isNull(),
    )
    qty = _report(
        "lineitem_qty_range", li, (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
    )
    disc = _report(
        "lineitem_discount_range",
        li,
        (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
    )
    acctbal = _report(
        "customer_acctbal_range",
        cust,
        (F.col("c_acctbal") < -1000) | (F.col("c_acctbal") > 10000),
    )
    unique = orders.agg(
        F.lit("orders_unique_orderkey").alias("rule"),
        F.count("*").cast("long").alias("n_checked"),
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("n_violations"),
    ).select("rule", "n_checked", "n_violations")
    tax = _report(
        "lineitem_tax_range", li, (F.col("l_tax") < 0) | (F.col("l_tax") > 0.08)
    )
    return orphan.unionAll(qty).unionAll(disc).unionAll(acctbal).unionAll(unique).unionAll(tax)
