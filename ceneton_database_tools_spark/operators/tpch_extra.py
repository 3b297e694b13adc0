"""TPC-H-shaped relational coverage beyond the round-2 set.

Fourteen more classic decision-support shapes — correlated EXISTS,
nation-pair volume, market share, returned-item ranking, conditional
category counts, distribution histograms, view-plus-argmax, HAVING-IN
composition, multi-way correlated self-joins, and (round 4) the five
partsupp-dependent shapes Q2/Q9/Q11/Q16/Q20 — each reshaped to the
columns the driver's synthetic tables actually carry (no ``partsupp``
table, so supply cost/availqty are derived from lineitem — see the
round-4 section; no ``l_commitdate``/``l_receiptdate``/``l_shipmode``,
so the date/shipmode predicates of Q4, Q12, and Q21 are re-expressed
over ``l_shipdate`` lateness vs ``o_orderdate`` and ``o_orderpriority``
classes). With these, all 22 TPC-H query shapes are registered and
oracle-gated.

Scale posture shared by all nine: filters sit before joins so they push
into the parquet scans; only fixed-size dimensions (region: 5 rows,
nation: 25 rows) carry broadcast hints; everything that scales with SF
is left to AQE; every aggregate is partial-aggregated map-side by
Catalyst; ratios/rounding match the oracle exactly.

Reference note: the reference (kws/ceneton-database-tools) has no query
surface at all — this family is the driver-mandated general relational
surface (SURVEY.md §2 Part B), widened for round 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "subquery", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → priority histogram.

    The reference Q4 tests ``l_commitdate < l_receiptdate``; those
    columns don't exist here, so "a late line item exists" becomes
    ``l_shipdate > o_orderdate + 90 days``. The EXISTS compiles to a
    LEFT SEMI join on l_orderkey — lineitem is never widened, orders
    rows appear at most once, and the priority group-by is 5 groups.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1997-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6)) AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "multi-table"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: directed nation-pair trade volume by year.

    The disjunctive nation-pair predicate filters the two BROADCAST
    nation copies (25 rows each — the hint is scale-safe) before the
    fact-table joins, so the big lineitem⋈orders⋈customer shuffle only
    carries rows that can still satisfy a pair.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")), 2
            ).cast("double").alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(floor(
             CAST(sum(CASE WHEN nation = 'NATION_11' THEN volume
                           ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) * 1000000 + 0.5) AS DOUBLE)
             / 1000000.0 AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6)) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN part     ON l_partkey  = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation n1 ON c_nationkey  = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN supplier  ON l_suppkey   = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type LIKE 'ECONOMY%'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "agg", "conditional", "multi-table"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share inside a region/part
    segment — an 8-way join where the numerator is a conditional sum
    over the same pass as the denominator (no second scan, no second
    shuffle). nation/region broadcast (fixed-size); part's LIKE filter
    sits before its join so the probe side shrinks first.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").startswith("ECONOMY"))
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1998-01-01 00:00:00"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(9,6)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(reg), F.col("c_rk") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("volume", volume)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # exact decimal sums; the ratio is floor-quantized at 1e-6
            # (floor of identical doubles — no engine-specific rounding)
            F.expr(
                "CAST(floor(CAST(sum(CASE WHEN nation = 'NATION_11' THEN volume "
                "ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE) "
                "/ CAST(sum(volume) AS DOUBLE) * 1000000 + 0.5) AS DOUBLE) "
                "/ 1000000.0"
            ).alias("mkt_share")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6))), 2) AS DOUBLE) AS revenue,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal,
           n_name AS nation
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. The returnflag and date filters push into the scans; the
    final top-20 is ``orderBy().limit()`` (TakeOrderedAndProject — each
    partition ships only its local top 20), ordered by (revenue DESC,
    c_custkey) so the cut is deterministic across engines.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1996-10-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")), 2
            ).cast("double").alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("join", "agg", "conditional"),
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-category high/low priority line counts.

    The reference Q12 groups by ``l_shipmode`` with receipt-date
    predicates; neither column exists here, so the same
    CASE-inside-sum shape runs over ``l_linestatus`` with a shipdate
    year window. Two conditional sums share one join and one shuffle.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "outer", "agg", "histogram"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT JOIN
    with an extra join-condition predicate (NOT a WHERE filter: rows
    that fail it must still produce count 0), then a histogram of the
    counts. Two shuffles total: by custkey, then by count; the second
    input is one row per customer, the third one row per distinct
    count.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "subquery", "argmax"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue — a derived revenue view consumed twice (once for the max,
    once for the equality filter). The single-row max aggregate is a
    broadcast-safe cross join; rounding BEFORE the max keeps the
    equality comparison identical on both engines.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")), 2).cast("double").alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE) AS totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("join", "agg", "subquery", "having"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders — an IN
    subquery whose body is itself a grouped HAVING aggregate. The
    subquery compiles to a LEFT SEMI join on l_orderkey; the qualifying
    key set is tiny (top ~1% of orders by quantity) so AQE broadcasts
    it back onto the fact join.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.expr("CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("totalprice"),
            "total_qty",
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    JOIN nation     ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_9'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY s_name
    """,
    tags=("join", "subquery", "exists", "anti"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the only supplier who shipped late on a
    multi-supplier order — EXISTS (another supplier participated) plus
    NOT EXISTS (no other supplier was ALSO late), composed as LEFT SEMI
    and LEFT ANTI joins over the same lineitem self-join key.

    Lateness is ``l_shipdate > o_orderdate + 30 days`` (the reference's
    receipt-vs-commit columns don't exist here). The correlated
    o_orderdate in both subqueries is carried on the probe rows, so
    each EXISTS is one equi-join on l_orderkey with the extra
    predicates as join conditions — no per-row re-scan.
    """
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")

    l1 = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"),
        F.col("l_suppkey").alias("s2"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("k3") == F.col("l_orderkey"))
            & (F.col("s3") != F.col("l_suppkey"))
            & (F.col("d3") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Round 4: the five partsupp-dependent TPC-H shapes, reshaped over a
# lineitem-DERIVED supply table. There is no partsupp fixture, so
# "supply cost" is min(l_extendedprice) per (part, supplier) — an
# order-independent exact-double aggregate (no summation), safe for
# cross-engine equality joins — and "availqty" is the integer shipped
# quantity. With these stand-ins Q2/Q9/Q11/Q16/Q20 keep their defining
# plan shapes (min-per-group equality join, profit measure, global-
# fraction HAVING, NOT-IN distinct count, nested quantity threshold).
# ---------------------------------------------------------------------------

_DERIVED_PS = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
"""


def _derived_ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem-derived partsupp stand-in: one row per (part,
    supplier) that ever traded, cost = exact min extendedprice. One
    shuffle on (partkey, suppkey) with map-side partial min; at 100 TB
    this is the natural pre-aggregation that shrinks lineitem to
    partsupp cardinality before any dimension join."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_DERIVED_PS}),
    eu AS (
      SELECT s_suppkey, s_name, CAST(round(CAST(s_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
    FROM part
    JOIN ps ON p_partkey = ps_partkey
    JOIN eu ON s_suppkey = ps_suppkey
    WHERE p_size <= 15 AND p_type = 'STANDARD'
      AND ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM ps ps2 JOIN eu eu2 ON eu2.s_suppkey = ps2.ps_suppkey
        WHERE ps2.ps_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "topk", "multi-table"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest regional supplier per part.

    The correlated min-cost subquery decorrelates to a window min over
    ps_partkey AFTER the region filter — one extra shuffle on partkey,
    never a re-scan per part. Equality against the min is exact (the
    cost is a stored double, no arithmetic). nation/region broadcast
    (fixed-size); supplier and the derived ps scale with SF and are
    left to AQE. Top-100 is orderBy().limit() over a unique key tuple.
    """
    ps = _derived_ps(spark, sf_dir)
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", F.expr("CAST(round(CAST(s_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias("s_acctbal"), "n_name")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    regional = ps.join(eu, F.col("s_suppkey") == F.col("ps_suppkey"))
    win_min = F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    best = regional.withColumn("min_cost", win_min).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        best.join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,6))
               * CAST(1 - l_discount AS DECIMAL(9,6))
               - CAST(0.1 AS DECIMAL(2,1))
                 * CAST(p_retailprice AS DECIMAL(18,6))
                 * CAST(l_quantity AS DECIMAL(12,0)) AS amount
      FROM lineitem
      JOIN part     ON l_partkey  = p_partkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("join", "agg", "multi-table"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year.

    Supply cost is proxied as 10% of retail price per unit (no
    ps_supplycost fixture). The p_name LIKE filter sits on the part
    scan, so the 5-way join starts from the pruned part side; nation
    broadcasts (fixed-size), everything else is AQE's choice. One
    shuffle for the (nation, year) group-by, partial-aggregated
    map-side.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(9,6)") - F.lit(0.1).cast("decimal(2,1)") * F.col(
        "p_retailprice"
    ).cast("decimal(18,6)") * F.col("l_quantity").cast("decimal(12,0)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH nation_value AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey,
           round(value_cents / 100.0, 2) AS value
    FROM nation_value
    WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM nation_value)
    ORDER BY value DESC, partkey
    """,
    tags=("join", "agg", "subquery", "having"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose single-nation traded value exceeds
    a fraction (0.1%) of that nation's total.

    Values are summed as integer CENTS (exact, order-independent), so
    the global-fraction HAVING compares integers — no cross-engine
    float boundary. The global total is a 1-row aggregate broadcast
    into the filter (scalar subquery shape); the per-part aggregation
    is the only data-sized shuffle.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    per_part = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))  # 1-row aggregate: fixed-size by construction
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value_cents") / 100.0, 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "anti", "agg", "distinct"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute
    triple, excluding a supplier denylist.

    The complaint denylist (no comment column) is suppliers with
    negative balances; NOT IN over a non-null key compiles to a LEFT
    ANTI join. Part's brand/type/size predicates all push to its scan;
    countDistinct is Catalyst's two-phase expand-aggregate — no
    driver-side distinct.
    """
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    deny = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(deny, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_name, n_name
    FROM shipped
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE qty * 10 > 3 * (
      SELECT sum(s2.qty) FROM shipped s2 WHERE s2.l_partkey = shipped.l_partkey
    )
    ORDER BY s_name
    """,
    tags=("join", "subquery", "window"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant share (>30%) of a
    part line's shipped volume in one year.

    Quantities sum as integers (exact both engines); the correlated
    per-part total decorrelates to a window sum over l_partkey on the
    already part+supplier-aggregated table (partsupp cardinality, not
    lineitem). The share test is integer cross-multiplication — no
    float division. The final DISTINCT is supplier-cardinality.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
    )
    shipped = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    part_total = F.sum("qty").over(W.partitionBy("l_partkey"))
    dominant = shipped.withColumn("total_qty", part_total).filter(
        F.col("qty") * 10 > 3 * F.col("total_qty")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        dominant.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Interval-overlap self-join (interval algebra over shipping windows)
# ---------------------------------------------------------------------------


@register(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT l_orderkey, l_linenumber,
             l_shipdate AS s,
             l_shipdate + to_days(CAST(floor(l_quantity) AS INTEGER) % 14 + 1) AS e
      FROM lineitem
    ),
    pairs AS (
      SELECT a.l_orderkey,
             date_diff('day',
                       greatest(a.s, b.s),
                       least(a.e, b.e)) + 1 AS overlap_days
      FROM iv a JOIN iv b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_linenumber < b.l_linenumber
       AND a.s <= b.e AND b.s <= a.e
    )
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT)          AS n_overlapping_pairs,
           CAST(sum(overlap_days) AS BIGINT) AS total_overlap_days,
           CAST(max(overlap_days) AS BIGINT) AS max_overlap_days
    FROM pairs
    GROUP BY l_orderkey
    """,
    tags=("join", "interval", "temporal"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each line item carries a shipping window
    [shipdate, shipdate + quantity-derived days]; find, per order, the
    line-item pairs whose windows overlap and the total/max overlap in
    days (inclusive-end interval algebra: overlap = least(ends) -
    greatest(starts) + 1).

    Scale shape: the overlap predicate rides ON an equi-join key
    (l_orderkey), so Catalyst plans a hash join with the interval
    condition as a post-join filter — never a cross product. For
    interval joins WITHOUT an equi key, the scalable formulation is
    time-grid binning (explode each interval to its buckets, equi-join
    on bucket, dedupe) — the same bucket-join shape as join_range;
    this query demonstrates the equi-anchored case a real order/log
    workload mostly hits.
    """
    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").alias("s"),
        # timestampadd keeps TIMESTAMP type (date_add truncates to DATE
        # and would drop time-of-day — the oracle's `+ to_days(...)`
        # stays a timestamp); floor() on both engines because DuckDB's
        # CAST(double AS INT) rounds while Spark's truncates
        F.expr(
            "timestampadd(DAY, CAST(floor(l_quantity) AS INT) % 14 + 1, l_shipdate)"
        ).alias("e"),
    )
    a, b = iv.alias("a"), iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        (
            F.datediff(
                F.least(F.col("a.e"), F.col("b.e")),
                F.greatest(F.col("a.s"), F.col("b.s")),
            )
            + 1
        ).alias("overlap_days"),
    )
    return pairs.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_overlapping_pairs"),
        F.sum("overlap_days").cast("long").alias("total_overlap_days"),
        F.max("overlap_days").cast("long").alias("max_overlap_days"),
    )
