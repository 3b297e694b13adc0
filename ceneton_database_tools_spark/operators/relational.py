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
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(1 - l_discount AS DECIMAL(9,6))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(1 - l_discount AS DECIMAL(9,6))
                     * CAST(1 + l_tax AS DECIMAL(9,6))), 2) AS DOUBLE) AS sum_charge,
      CAST(floor(CAST(sum(l_quantity) AS BIGINT) * 1000000.0 / count(*) + 0.5)
           AS DOUBLE) / 1000000.0                                 AS avg_qty,
      CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*) * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS avg_price,
      CAST(floor(CAST(sum(CAST(l_discount AS DECIMAL(9,6))) AS DOUBLE)
                 / count(*) * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS avg_disc,
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
    # Money sums in DECIMAL: decimal addition is EXACT and therefore
    # order-independent — float sums differ in the last ulp between
    # partial-aggregation trees and can flip boundary rounding (the
    # local sf0.1 parity sweep caught exactly that in sibling queries).
    # Averages divide the exact decimal sum ONCE, as a double, on both
    # engines. avg(l_quantity) stays float: integer-valued doubles sum
    # exactly at any order.
    price_d = F.col("l_extendedprice").cast("decimal(18,6)")
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    one_plus_tax = (F.lit(1) + F.col("l_tax")).cast("decimal(9,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(price_d), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(price_d * one_minus_disc), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(price_d * one_minus_disc * one_plus_tax), 2)
            .cast("double")
            .alias("sum_charge"),
            F.expr(
                "CAST(floor(CAST(sum(l_quantity) AS BIGINT) * 1000000.0 / count(*)"
                " + 0.5) AS DOUBLE) / 1000000.0"
            ).alias("avg_qty"),
            # floor-quantized at 1e-6: floor of identical doubles — no
            # engine-specific round(double) at half boundaries
            F.expr(
                "CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)"
                " / count(*) * 1000000 + 0.5) AS DOUBLE) / 1000000.0"
            ).alias("avg_price"),
            F.expr(
                "CAST(floor(CAST(sum(CAST(l_discount AS DECIMAL(9,6))) AS DOUBLE)"
                " / count(*) * 1000000 + 0.5) AS DOUBLE) / 1000000.0"
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_distinct_stats",
    oracle="""
    SELECT
      l_returnflag,
      count(DISTINCT l_orderkey)  AS distinct_orders,
      count(DISTINCT l_partkey)   AS distinct_parts,
      count(DISTINCT l_suppkey)   AS distinct_supps,
      count(*)                    AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT DISTINCT (expand-based distinct aggregation).

    Scale posture: Spark rewrites multiple distincts via `expand` +
    two-phase aggregation — shuffle volume is rows × #distinct-cols;
    at 100 TB swap exact distinct for `approx_count_distinct` where
    tolerable (declared separately, not oracle-checked).
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("distinct_orders"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT
      coalesce(o_orderstatus, '<ALL>')   AS orderstatus,
      coalesce(o_orderpriority, '<ALL>') AS orderpriority,
      count(*)                           AS n_orders,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status+priority → grand total)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<ALL>")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<ALL>")).alias("orderpriority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT
      coalesce(l_returnflag, '<ALL>') AS returnflag,
      coalesce(l_linestatus, '<ALL>') AS linestatus,
      count(*)                        AS n_rows,
      round(sum(l_quantity), 2)       AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two grouping columns (all 2^2 grouping sets)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<ALL>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<ALL>")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT
      coalesce(c_mktsegment, '<ALL>') AS mktsegment,
      coalesce(n_name, '<ALL>')       AS nation,
      count(*)                        AS n_customers,
      CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
    """,
    tags=("agg", "grouping-sets", "join"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by-segment and by-nation in one pass)."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    joined.createOrReplaceTempView("_gs_cust_nat")
    return spark.sql(
        """
        SELECT
          coalesce(c_mktsegment, '<ALL>') AS mktsegment,
          coalesce(n_name, '<ALL>')       AS nation,
          count(*)                        AS n_customers,
          CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_acctbal
        FROM _gs_cust_nat
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_partkey, count(*) AS n_lines, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 40
    """,
    tags=("agg", "having"),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .filter(F.col("n_lines") >= 40)
    )


# ---------------------------------------------------------------------------
# Filters / predicates
# ---------------------------------------------------------------------------


@register(
    "filter_complex_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_size BETWEEN 10 AND 40
      AND p_name LIKE '%a%'
      AND NOT (p_retailprice < 500.0)
      AND p_type IS NOT NULL
    """,
    tags=("filter",),
)
def filter_complex_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / NOT / IS NOT NULL predicate combination.

    All predicates are Catalyst-pushable into the parquet scan
    (verified via PushedFilters in `.explain`).
    """
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(10, 40)
        & F.col("p_name").like("%a%")
        & ~(F.col("p_retailprice") < 500.0)
        & F.col("p_type").isNotNull()
    )


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("distinct",),
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a two-column projection."""
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l_orderkey,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6))), 2) AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + aggregate + top-k.

    Scale posture: customer scales with SF, so no hard broadcast hint —
    the segment-filtered side is still ~1/5 of all customers, and
    ``F.broadcast`` overrides the size threshold unconditionally (OOM at
    100 TB). AQE picks broadcast when the filtered side is actually
    small, SMJ otherwise. lineitem⋈orders is the big shuffle. Top-k
    uses a rounded sort key + unique tiebreaker so LIMIT is
    deterministic across engines.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")), 2).cast("double").alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
      n_name AS nation,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey   = o_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with region filter.

    Scale posture: region/nation broadcast (fixed-size: 5 and 25 rows
    at every SF). supplier SCALES with SF, so it carries no hint — AQE
    broadcasts it while it fits under the threshold and degrades to a
    shuffle join instead of OOMing at 100×. The only large shuffle is
    lineitem⋈orders⋈customer on the order/customer keys. Catalyst
    pushes the region filter through the broadcast chain so non-ASIA
    suppliers never reach the probe side.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")), 2).cast("double").alias(
                "revenue"
            )
        )
        .withColumnRenamed("n_name", "nation")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
           CAST(round(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6))),
                               0.00), 2) AS DOUBLE) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("join", "outer"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers (count = 0)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,6)")),
                    F.lit(0).cast("decimal(18,6)"),
                ),
                2,
            )
            .cast("double")
            .alias("spend"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust_n AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_cust
      FROM customer GROUP BY c_nationkey
    ), supp_n AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT
      coalesce(cust_n.nationkey, supp_n.nationkey) AS nationkey,
      coalesce(n_cust, 0) AS n_cust,
      coalesce(n_supp, 0) AS n_supp
    FROM cust_n FULL OUTER JOIN supp_n ON cust_n.nationkey = supp_n.nationkey
    """,
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nations with only customers
    or only suppliers survive with zero-filled counts)."""
    cust_n = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust_n.join(supp_n, cust_n.c_nk == supp_n.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 300000.0
    )
    """,
    tags=("join", "semi", "subquery"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ correlated EXISTS (big-ticket customers)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 250000.0
    )
    """,
    tags=("join", "anti", "subquery"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS (customers who never placed a
    large order — predicate chosen so the result is non-empty at
    every scale factor, keeping the test meaningful)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, o_orderstatus, count(*) AS n
    FROM region CROSS JOIN orders
    GROUP BY r_name, o_orderstatus
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join (small fixed dimension × fact, broadcast NLJ).

    The fact side is pre-aggregated to its |statuses| distinct groups
    BEFORE the cross join, so the explosion is 3×5 rows instead of
    5×|orders| — the pattern that matters when `orders` is 100 TB.
    """
    reg = _t(spark, sf_dir, "region")
    orders_by_status = (
        _t(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    )
    return orders_by_status.crossJoin(F.broadcast(reg)).select("r_name", "o_orderstatus", "n")


@register(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name, CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal
    FROM customer
    WHERE CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) > (SELECT CAST(floor(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / count(*) + 0.5) AS DOUBLE) / 100.0 FROM customer)
    """,
    tags=("subquery", "filter"),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (above-average account balance).

    Expressed via a broadcast cross-join of the 1-row aggregate —
    the same physical plan Catalyst produces for an uncorrelated
    scalar subquery; no driver-side collect. Both the average and the
    compared balance are rounded identically on both engines: an
    unrounded float avg can differ in the last ulp between Spark and
    DuckDB (summation order), flipping boundary rows.
    """
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.agg(
        F.expr(
            "CAST(floor(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)"
            " / count(*) + 0.5) AS DOUBLE) / 100.0"
        ).alias("_avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)") > F.col("_avg_bal"))
        .select("c_custkey", "c_name", F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("acctbal"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT
        c_mktsegment,
        c_custkey,
        CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal,
        row_number() OVER (
          PARTITION BY c_mktsegment
          ORDER BY c_acctbal DESC, c_custkey
        ) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via row_number (deterministic tiebreak on key).

    Scale posture: Spark plans this as WindowGroupLimit (top-k pushed
    before the full sort) — no global sort, per-partition heaps.
    """
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_frame",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      CAST(floor(sum(o_totalprice) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) * 100 + 0.5) AS DOUBLE) / 100 AS running_spend,
      CAST(floor(avg(o_totalprice) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
      ) * 1000000 + 0.5) AS DOUBLE) / 1000000.0 AS moving_avg_3
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 3-row moving average (explicit ROWS frames)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        # floor(x+0.5) quantization instead of engine round(double):
        # identical on both engines at every half boundary; the frame
        # sums are order-deterministic (unique ORDER BY tie-break)
        F.expr(
            "CAST(floor(sum(o_totalprice) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            ") * 100 + 0.5) AS DOUBLE) / 100"
        ).alias("running_spend"),
        F.expr(
            "CAST(floor(avg(o_totalprice) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
            " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"
            ") * 1000000 + 0.5) AS DOUBLE) / 1000000.0"
        ).alias("moving_avg_3"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      datediff('day',
        lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        o_orderdate) AS days_since_prev,
      lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        AS next_orderkey
    FROM orders
    """,
    tags=("window", "lag-lead"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD navigation (inter-order gap per customer)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      first_value(o_orderkey) OVER w AS first_orderkey,
      last_value(o_orderkey) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS last_orderkey,
      nth_value(o_orderkey, 2) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS second_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "navigation"),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value navigation. The gotcha this
    query pins down: the DEFAULT window frame is ``RANGE BETWEEN
    UNBOUNDED PRECEDING AND CURRENT ROW``, under which last_value and
    nth_value see only the prefix — both engines need the explicit
    full-partition ROWS frame for the intuitive "last/2nd of the whole
    partition" semantics (first_value is prefix-stable, so its default
    frame is fine). Ordering is the unique (date, orderkey) tuple so
    ties can't reassign values between engines."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w_full).alias("last_orderkey"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_orderkey"),
    )


@register(
    "scalar_null_semantics",
    oracle="""
    SELECT
      c.c_custkey,
      o.o_orderkey IS NOT DISTINCT FROM NULL      AS no_order,
      coalesce(o.o_totalprice, 0.0)               AS price_or_zero,
      nullif(c.c_mktsegment, 'BUILDING')          AS seg_nullified,
      CASE WHEN o.o_orderkey IS NULL THEN 'none'
           WHEN o.o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, min(o_orderkey) AS o_orderkey,
             CAST(round(CAST(min(o_totalprice) AS DECIMAL(18,6)), 2) AS DOUBLE)
               AS o_totalprice
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    tags=("scalar", "null"),
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling semantics pinned cross-engine: null-safe equality
    (Spark ``<=>`` == SQL ``IS NOT DISTINCT FROM``), ``coalesce``,
    ``nullif``, and CASE's null-branch ordering — exercised through a
    LEFT JOIN that actually produces NULL rows (order-less customers).
    The joined side is pre-aggregated to one row per customer so the
    outer join can't fan out."""
    cust = _t(spark, sf_dir, "customer")
    first_order = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderkey").alias("o_orderkey"),
            F.expr(
                "CAST(round(CAST(min(o_totalprice) AS DECIMAL(18,6)), 2) AS DOUBLE)"
            ).alias("o_totalprice"),
        )
    )
    joined = cust.join(first_order, cust.c_custkey == first_order.o_custkey, "left")
    return joined.select(
        "c_custkey",
        F.col("o_orderkey").eqNullSafe(F.lit(None)).alias("no_order"),
        F.coalesce("o_totalprice", F.lit(0.0)).alias("price_or_zero"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullified"),
        F.when(F.col("o_orderkey").isNull(), "none")
        .when(F.col("o_totalprice") > 100000, "big")
        .otherwise("small")
        .alias("bucket"),
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT
      p_brand,
      p_partkey,
      rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk,
      dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)                    AS drnk,
      ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)       AS quartile
    FROM part
    """,
    tags=("window", "rank"),
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile ranking family."""
    by_price_desc = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    by_size_desc = W.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    by_price_asc = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return _t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        F.rank().over(by_price_desc).alias("rnk"),
        F.dense_rank().over(by_size_desc).alias("drnk"),
        F.ntile(4).over(by_price_asc).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE) AS totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "topk"),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no full sort at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.expr("CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("totalprice"), "o_orderdate")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000.0
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.union(b).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.intersect(b)


@register(
    "setop_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers minus open-order customers."""
    a = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.subtract(b)


@register(
    "setop_union_all",
    oracle="""
    SELECT 'customer' AS src, c_custkey AS key FROM customer
    UNION ALL
    SELECT 'supplier' AS src, s_suppkey AS key FROM supplier
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle)."""
    a = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_custkey").alias("key")
    )
    b = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"), F.col("s_suppkey").alias("key")
    )
    return a.unionAll(b)


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------


@register(
    "pivot_segment_status",
    oracle="""
    SELECT
      c_mktsegment,
      count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
      count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("pivot", "join", "agg"),
)
def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT order status across market segments.

    Uses df.groupBy().pivot() with explicit pivot values (never let
    Spark scan for the value set at scale) and renames the generated
    columns to engine-neutral names.
    """
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # customer scales with SF → no hard broadcast hint; AQE decides.
    pivoted = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return pivoted.select(
        "c_mktsegment",
        F.coalesce("O", F.lit(0)).alias("n_open"),
        F.coalesce("F", F.lit(0)).alias("n_filled"),
        F.coalesce("P", F.lit(0)).alias("n_pending"),
    )


@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'size' AS metric, round(CAST(p_size AS DOUBLE), 2) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, CAST(round(CAST(p_retailprice AS DECIMAL(18,6)), 2) AS DOUBLE) AS value
    FROM part
    """,
    tags=("unpivot",),
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) via the native unpivot operator."""
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "metric", "_v")
        .select(
            "p_partkey",
            "metric",
            F.expr("CAST(round(CAST(_v AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
                "value"
            ),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(9,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "scan"),
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + global agg —
    the scan-bandwidth benchmark. Every predicate pushes into the
    parquet reader (shown as PushedFilters), only 4 columns are read,
    and the aggregation is a single partial+final pair with no
    group-by shuffle at all.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * F.col("l_discount").cast("decimal(9,6)")), 2).cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(floor(
             100.0 * CAST(sum(CASE WHEN p_type LIKE 'STANDARD%'
                              THEN CAST(l_extendedprice AS DECIMAL(18,6))
                                   * CAST(1 - l_discount AS DECIMAL(9,6))
                              ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6))) AS DOUBLE)
             * 10000 + 0.5) AS DOUBLE) / 10000.0 AS promo_share,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("agg", "join", "conditional"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue
    share). One join + one aggregate producing a single ratio row; the
    CASE rides inside the sum so both terms come from the same pass."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(9,6)")
    promo = F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(
        F.lit(0).cast("decimal(24,4)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).alias("_promo"),
            F.sum(rev).alias("_rev"),
            F.count("*").alias("n"),
        )
        .select(
            F.expr(
                "CAST(floor(100.0 * CAST(_promo AS DOUBLE) / CAST(_rev AS DOUBLE)"
                " * 10000 + 0.5) AS DOUBLE) / 10000.0"
            ).alias("promo_share"),
            "n",
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE)
             AS avg_yearly, count(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("subquery", "correlated", "join", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group scalar subquery
    (below-half-average quantity per part). Decorrelated the way
    Catalyst does it: pre-aggregate the per-part average once, join it
    back, filter — one extra tiny aggregate instead of |parts|
    subquery executions. The threshold multiply stays unrounded on
    both engines; comparisons against it use identical double math."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity >= 5  AND l_quantity <= 25)
       OR (p_brand = 'Brand#3' AND p_size <= 50 AND l_quantity >= 1  AND l_quantity <= 15)
    """,
    tags=("filter", "disjunction", "join"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    extracts the common `p_brand IN (...)`-style implications for scan
    pruning and evaluates the residual disjunction post-join — the
    pattern that breaks naive pushdown logic."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    c = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15)
         & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 25)
           & F.col("l_quantity").between(5, 25))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 50)
           & F.col("l_quantity").between(1, 15))
    )
    return j.filter(c).agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")), 2).cast("double").alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c_mktsegment,
           count(*)                 AS n_custs,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) > (SELECT CAST(floor(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / count(*) + 0.5) AS DOUBLE) / 100.0 FROM customer
                                 WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    tags=("subquery", "anti", "agg"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS composition —
    above-average-balance customers who never placed a high-value
    (>300k) order. NOT EXISTS compiles to a LEFT ANTI join against the
    filtered orders; the scalar average broadcasts. Both sides round
    the threshold identically (ulp rule)."""
    cust = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.expr(
            "CAST(floor(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)"
            " / count(*) + 0.5) AS DOUBLE) / 100.0"
        ).alias("_avg")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)") > F.col("_avg"))
        .join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "agg_listagg_sorted",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("agg", "listagg"),
)
def agg_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG WITHIN GROUP == DuckDB
    string_agg ORDER BY). The explicit ORDER BY inside the aggregate is
    what makes concatenation deterministic across engines and across
    partitionings — unordered listagg output is partition-order noise."""
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).createOrReplaceTempView(
        "_nations_regions"
    )
    return spark.sql(
        "SELECT r_name, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations "
        "FROM _nations_regions GROUP BY r_name"
    )


@register(
    "agg_argminmax",
    oracle="""
    SELECT c_mktsegment,
           arg_min(c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                           * 1000000000000 + c_custkey) AS poorest,
           arg_max(c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                           * 1000000000000 + c_custkey) AS richest,
           count(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "argminmax"),
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by (argmin/argmax aggregates): the customer holding
    the extreme balance per segment, without a join-back or window.
    Balances DO tie, and a tied arg_min picks an arbitrary row on
    either engine — so the ordering key is the EXACT integer composite
    (balance_cents, custkey) packed into one BIGINT: cents * 1e12 +
    custkey orders lexicographically as long as custkey < 1e12 (valid
    to sf ~6.7e6). An additive float perturbation (custkey * 1e-9) was
    rejected: it exceeds the 0.01 balance quantum once custkey > 1e7,
    silently reordering customers with different balances at scale."""
    key = F.expr(
        "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 1000000000000 + c_custkey"
    )
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.min_by("c_name", key).alias("poorest"),
            F.max_by("c_name", key).alias("richest"),
            F.count("*").alias("n"),
        )
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6)    AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal NULLS FIRST, c_custkey)
    """,
    tags=("window", "rank"),
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions (percent_rank, cume_dist) over a
    UNIQUE ordering tuple — (rank-1)/(n-1) on identical integer inputs
    is the same double on both engines. The null placement is PINNED
    explicitly on both sides: Spark's ASC default is NULLS FIRST,
    DuckDB's is NULLS LAST, so a nullable ordering key silently shifts
    every relative rank in its partition otherwise (caught by the
    round-8 NULL-c_acctbal perturbation)."""
    w = W.partitionBy("c_mktsegment").orderBy(
        F.asc_nulls_first("c_acctbal"), "c_custkey"
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "agg_stats_moments",
    oracle="""
    SELECT
      l_returnflag,
      round(stddev_samp(l_extendedprice), 4)              AS price_stddev,
      round(var_samp(l_quantity), 4)                      AS qty_var,
      round(corr(l_extendedprice, l_quantity), 4)         AS price_qty_corr,
      round(covar_samp(l_extendedprice, l_discount), 4)   AS price_disc_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "statistics"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-moment aggregates: sample stddev/variance,
    correlation, covariance — identical Welford-style definitions on
    both engines; results are ratios of large sums, so partition-order
    float noise sits far below the round(4) pin. All four merge
    map-side (each is a few running moments per group), so the shuffle
    carries 4 small states per (flag, partition) regardless of scale."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("price_disc_covar"),
    )


@register(
    "setop_except_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    EXCEPT ALL
    SELECT o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("setop", "bag"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (each duplicate counted, not
    collapsed): the (priority, status) multiset before 1998 minus the
    one after. Spark plans ``exceptAll`` as a count-aggregate +
    generate, so the shuffle carries one row per distinct pair with
    counts, never the full multiset."""
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    before = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderpriority", "o_orderstatus"
    )
    after = orders.filter(F.col("o_orderdate") >= cut).select(
        "o_orderpriority", "o_orderstatus"
    )
    return before.exceptAll(after)


@register(
    "setop_intersect_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    INTERSECT ALL
    SELECT o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("setop", "bag"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection (min of the two multiplicities
    per distinct row); same count-aggregate plan shape as EXCEPT ALL."""
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    before = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderpriority", "o_orderstatus"
    )
    after = orders.filter(F.col("o_orderdate") >= cut).select(
        "o_orderpriority", "o_orderstatus"
    )
    return before.intersectAll(after)


@register(
    "window_range_frame_time",
    oracle="""
    SELECT event_id,
           user_id,
           CAST(count(*) OVER w AS BIGINT)      AS n_72h,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE)
                                                AS sum_72h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY epoch_us(ts)
      RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW
    )
    """,
    tags=("window", "range-frame", "time-series"),
)
def window_range_frame_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-user trailing-72-hour event
    count and value sum — the value-based frame (all rows within an
    interval of the current row's timestamp), as opposed to the
    ROWS-based frames elsewhere in this module.

    Cross-engine determinism: ordering and the frame bound compare at
    epoch-microseconds on BOTH engines (``unix_micros`` / ``epoch_us``
    — the repo-wide rule for timestamp arithmetic), and (user_id, ts)
    is unique so frame membership is a total function of the data.

    Scale shape: one shuffle on user_id, one in-partition sort; the
    running frame evaluates with a sliding two-pointer over the sorted
    partition — no per-row rescan, no global window.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-259_200_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_72h"),
        # exact DECIMAL frame sum (the repo float-discipline idiom) —
        # a double running sum is order-dependent in the last ulp
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
        .cast("double")
        .alias("sum_72h"),
    )


@register(
    "window_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(round(CAST(value AS DECIMAL(18,6)), 2) AS DOUBLE) AS value
    FROM (
      SELECT *,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    tags=("window", "dedup", "scd"),
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-record-per-key (the SCD/changelog compaction shape):
    row_number over (key ORDER BY ts DESC) = 1. Ordering tie-breaks on
    the unique event_id per the repo's unique-window-ordering rule.

    Scale shape: one shuffle on the key; with AQE the rank filter
    evaluates per partition after an in-partition sort — the same plan
    a dropDuplicates-keep-latest needs, but with deterministic
    tie-breaking (dropDuplicates keeps an arbitrary row).
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.expr("CAST(round(CAST(value AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("value"),
        )
    )


@register(
    "agg_mode_per_group",
    oracle="""
    SELECT user_id, event_type AS mode_event, n
    FROM (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type ASC) AS rn
      FROM events
      GROUP BY user_id, event_type
    )
    WHERE rn = 1
    """,
    tags=("agg", "mode"),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent event_type per user), expressed as
    count + rank so ties break deterministically (count DESC, value
    ASC) — engine-native ``mode()`` is tie-nondeterministic on BOTH
    engines, which is exactly what a cross-engine gate can't accept.

    Scale shape: two-phase count aggregate (map-side partials) on
    (user_id, event_type), then a per-user rank over at most
    |event_type| rows — the heavy reduction happens before the window.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").cast("long").alias("n"))
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), "n")
    )
