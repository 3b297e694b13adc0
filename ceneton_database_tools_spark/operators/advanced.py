"""Advanced Part B surface: array/map/struct scalars, as-of + range
joins, and the Python UDF/UDTF registration surface.

Closes the remaining SURVEY.md §2 Part B cells:

* **array functions** — transform/filter/aggregate/sort/slice over
  token arrays (list functions on the DuckDB side);
* **map & struct functions** — construction, field access, entry
  manipulation; the map is rendered to a sorted ``k=v`` array for
  engine-portable comparison;
* **as-of join** — implemented the way it scales: the union-merge
  trick (tag both streams, one shuffle+sort per user, carry the
  latest order forward with ``last(..., ignorenulls)``) instead of a
  join-then-window, which explodes by the number of prior matches.
  The oracle uses DuckDB's native ``ASOF JOIN``;
* **range (band) join** — non-equi interval predicate riding on an
  equi key, the shape AQE/SMJ handles;
* **pandas UDF** — Arrow-vectorized scalar UDF (the sanctioned slow
  path: one Python call per batch, never per row);
* **Python UDTF** — Spark 4 table function via lateral join, oracled
  by ``unnest + generate_subscripts``.

The reference has none of these (its only extensibility hook is the
``HeaderStrategy`` callback, ``fmp_reader.py:53``); they are the
general-engine surface the driver gates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as SqlT

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators import _textutil as T
from ceneton_database_tools_spark.operators.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Array function family
# ---------------------------------------------------------------------------


@register(
    "scalar_array_funcs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {T.DUCK_TOKENS} AS w FROM documents)
    SELECT
      doc_id,
      CAST(len(w) AS BIGINT)                       AS n_tokens,
      w[1]                                         AS first_token,
      w[len(w)]                                    AS last_token,
      CAST(len(list_distinct(w)) AS BIGINT)        AS n_distinct,
      array_to_string(list_sort(list_distinct(w))[1:3], ',') AS first3_sorted,
      list_contains(w, 'data')                     AS has_data,
      CAST(len(list_filter(w, x -> len(x) > 4)) AS BIGINT) AS n_long_tokens,
      CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS total_chars
    FROM t
    """,
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, element access, distinct, sort+slice,
    contains, lambda filter/transform/aggregate — all JVM-side array
    expressions (no explode, no shuffle)."""
    t = _t(spark, sf_dir, "documents").select("doc_id", F.expr(T.SPARK_TOKENS).alias("w"))
    return t.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.element_at("w", 1).alias("first_token"),
        F.element_at("w", -1).alias("last_token"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct"),
        F.array_join(F.slice(F.array_sort(F.array_distinct("w")), 1, 3), ",").alias(
            "first3_sorted"
        ),
        F.array_contains("w", "data").alias("has_data"),
        F.size(F.filter("w", lambda x: F.length(x) > 4)).cast("long").alias("n_long_tokens"),
        F.aggregate(
            F.transform("w", F.length), F.lit(0), lambda acc, x: acc + x
        )
        .cast("long")
        .alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Map & struct function family
# ---------------------------------------------------------------------------


@register(
    "scalar_map_struct_funcs",
    oracle="""
    WITH t AS (
      SELECT
        p_partkey,
        struct_pack(brand := p_brand, type := p_type, size := p_size) AS info,
        [p_brand, p_type, CAST(p_size AS VARCHAR)] AS vals
      FROM part
    )
    SELECT
      p_partkey,
      info.brand                       AS brand,
      info.size                        AS size,
      concat(info.brand, '/', info.type) AS brand_type,
      array_to_string(
        list_sort(['brand=' || vals[1], 'type=' || vals[2], 'size=' || vals[3]]), ','
      ) AS kv_pairs
    FROM t
    """,
    tags=("scalar", "map", "struct"),
)
def scalar_map_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access, and a string-keyed map built
    with ``create_map`` rendered to a comma-joined sorted ``k=v``
    string (the engine-portable canonical form — map iteration order
    is undefined in both engines, entry SETS are what must match, and
    the final column must be a plain string: array-typed output crashes
    pandas-based result canonicalizers)."""
    part = _t(spark, sf_dir, "part")
    info = F.struct(
        F.col("p_brand").alias("brand"), F.col("p_type").alias("type"), F.col("p_size").alias("size")
    )
    m = F.create_map(
        F.lit("brand"),
        F.col("p_brand"),
        F.lit("type"),
        F.col("p_type"),
        F.lit("size"),
        F.col("p_size").cast("string"),
    )
    t = part.select("p_partkey", info.alias("info"), m.alias("m"))
    return t.select(
        "p_partkey",
        F.col("info.brand").alias("brand"),
        F.col("info.size").alias("size"),
        F.concat_ws("/", "info.brand", "info.type").alias("brand_type"),
        F.array_join(
            F.array_sort(
                F.transform(F.map_entries("m"), lambda e: F.concat_ws("=", e.key, e.value))
            ),
            ",",
        ).alias("kv_pairs"),
    )


# ---------------------------------------------------------------------------
# As-of join (union-merge formulation)
# ---------------------------------------------------------------------------


@register(
    "join_asof",
    oracle="""
    WITH orders_daily AS (
      SELECT o_custkey, o_orderdate,
             count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS day_total
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           o.o_orderdate AS last_order_date,
           o.day_total   AS last_day_total
    FROM events e
    ASOF LEFT JOIN orders_daily o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """,
    tags=("join", "asof"),
    bench=True,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the customer's most recent order
    day at-or-before its timestamp.

    Scale formulation — union-merge, not join-then-filter: tag order
    days (0) and events (1), union, and run ONE window per user ordered
    by (time, tag) carrying the latest order columns forward with
    ``last(..., ignorenulls=True)``. Cost is a single shuffle+sort of
    |events|+|order days| rows — no row ever multiplies by the number
    of prior orders, which is what kills the naive range-join plan at
    100 TB. Right side is pre-aggregated per (customer, day) so the
    as-of pick is deterministic under ties on both engines.
    """
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("timestamp").alias("o_date"),
        F.lit(None).cast("double").alias("o_total"),
    )
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("day_total")
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("o_orderdate").alias("o_date"),
            F.col("day_total").alias("o_total"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "tag", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = ev.unionByName(od).select(
        "user_id",
        "tag",
        "event_id",
        F.last("o_date", ignorenulls=True).over(w).alias("last_order_date"),
        F.last("o_total", ignorenulls=True).over(w).alias("last_day_total"),
    )
    return merged.filter(F.col("tag") == 1).select(
        "event_id", "user_id", "last_order_date", "last_day_total"
    )


# ---------------------------------------------------------------------------
# Range (band) join
# ---------------------------------------------------------------------------


@register(
    "join_range",
    oracle="""
    SELECT e.event_id,
           count(o.o_orderkey)                        AS n_orders_30d,
           CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 0), 2)
                AS DOUBLE) AS total_30d
    FROM events e
    LEFT JOIN orders o
      ON e.user_id = o.o_custkey
     AND o.o_orderdate >  e.ts - INTERVAL 30 DAY
     AND o.o_orderdate <= e.ts
    GROUP BY e.event_id
    """,
    tags=("join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/band join: orders per customer inside the 30-day window
    ending at each event. The equi key (user/custkey) carries the
    shuffle; the band predicate filters inside each matched pair — the
    plan shape Spark executes as SMJ + post-filter. At extreme scale
    the band would additionally be bucketed by coarse time grain to
    bound the per-key fan-out."""
    ev = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders")
    cond = (
        (ev.user_id == orders.o_custkey)
        & (orders.o_orderdate > ev.ts - F.expr("INTERVAL 30 DAYS"))
        & (orders.o_orderdate <= ev.ts)
    )
    return (
        ev.join(orders, cond, "left")
        .groupBy("event_id")
        .agg(
            F.count("o_orderkey").alias("n_orders_30d"),
            F.expr(
                "CAST(round(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6))), 0), 2)"
                " AS DOUBLE)"
            ).alias("total_30d"),
        )
    )


# ---------------------------------------------------------------------------
# Pandas UDF (Arrow-vectorized) surface
# ---------------------------------------------------------------------------


# return type passed as a DataType object: a DDL string would need an
# active SparkContext to parse at import time
@F.pandas_udf(SqlT.LongType())
def _net_price_nano(
    extended: pd.Series, discount: pd.Series, tax: pd.Series
) -> pd.Series:
    """Vectorized net price in exact integer NANO-units (1e-9): one
    Arrow batch per call, pure numpy arithmetic inside — the 10-100×
    faster shape vs a row UDF. Inputs are quantized to their exact
    milli-unit grids FIRST (the doubles are within ~1e-10 of 3-decimal
    values, so scale-0 rounding recovers the exact integers), then the
    product is computed in int64 — a float product would carry ~1e-6
    absolute error at 1e5-scale prices, the same order as the output
    quantum, and its per-row rounding drifts from the oracle's exact
    DECIMAL product on half-boundary grids (the hostile-data gate's
    x.005 case). Max per-row value ≈ 1e5·1e3·1e3·1e3 = 1e14 ≪ 2^63."""
    ext_m = (extended * 1000).round().astype("int64")
    disc_m = (discount * 1000).round().astype("int64")
    tax_m = (tax * 1000).round().astype("int64")
    return ext_m * (1000 - disc_m) * (1000 + tax_m)


@register(
    "udf_pandas_net_price",
    oracle="""
    SELECT
      l_returnflag,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(9,6)) * CAST(1 + l_tax AS DECIMAL(9,6))), 2) AS DOUBLE) AS net_revenue,
      count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "pandas-udf"),
)
def udf_pandas_net_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF registration surface: compute net price through an
    Arrow-vectorized UDF, aggregate after. (Built-ins express this
    directly — q1 does — so this entry exists to declare and gate the
    UDF path itself; the oracle proves the UDF computes exactly what
    the SQL expression does.)"""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "net_nano", _net_price_nano("l_extendedprice", "l_discount", "l_tax")
        )
        # the UDF's nano-unit integers are EXACT (see _net_price_nano);
        # summed in DECIMAL(38,0) — a bigint sum would overflow at
        # ~6e4 rows of 1e14-scale values — then cent-rounded in exact
        # integer arithmetic
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("net_nano").cast("decimal(38,0)")).alias("_s"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            # `div` truncates toward zero; _s is provably nonnegative
            # (TPC-H: extendedprice > 0, 0 <= discount < 1, tax >= 0 →
            # every net price > 0), so truncate == floor and the half-up
            # idiom is exact. A signed variant would need the abs/sign
            # split used in events_ohlc_downsample.
            F.expr("CAST((_s + 5000000) div 10000000 AS DOUBLE) / 100.0").alias(
                "net_revenue"
            ),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF (table function) surface
# ---------------------------------------------------------------------------


@register(
    "udtf_tokenize",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {T.DUCK_TOKENS} AS w FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           CAST(generate_subscripts(w, 1) - 1 AS INTEGER) AS pos,
           unnest(w) AS token
    FROM t
    """,
    tags=("udf", "udtf"),
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF via LATERAL join: one (pos, token) row per
    token. The UDTF registration path (``spark.udtf.register``) is the
    declared surface; the oracle is unnest-with-ordinality."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").strip().lower().split()):
                yield i, tok

    spark.udtf.register("ct_tokenize", Tokenize)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM _udtf_docs d, LATERAL ct_tokenize(d.text) t"
    )


# ---------------------------------------------------------------------------
# MERGE INTO emulation (upsert without Delta)
# ---------------------------------------------------------------------------


# The upsert/CDF ops fabricate insert keys above the real key range.
# Round-12 (VERDICT r11 #8): the offset is DERIVED from the data — the
# smallest positive multiple of 1,000,000 strictly above max(key) —
# instead of a fixed constant that sf >= 7 fixtures would collide with,
# so the registry runs unmodified at any scale. The oracle computes the
# IDENTICAL number with the same closed form (one 1-row max aggregate
# on each engine), so both fabricate the same keys; at the gate's
# sf <= 0.1 the derived value is exactly the historical 1,000,000.
_DUCK_KEY_OFFSET = (
    "(SELECT 1000000 * ((coalesce(max(c_custkey), 0) // 1000000) + 1) "
    "FROM customer)"
)


def _synth_key_offset(df: DataFrame, key: str) -> int:
    """Derived synthetic-key offset (bounded 1-row max aggregate).
    The loud headroom guard survives as an internal assertion — the
    derivation makes collision impossible by construction."""
    mx = int(df.agg(F.max(key)).collect()[0][0] or 0)
    off = 1_000_000 * (mx // 1_000_000 + 1)
    assert off > mx and off % 1_000_000 == 0
    return off



@register(
    "merge_upsert_customers",
    oracle=f"""
    WITH updates AS (
      SELECT c_custkey, c_name,
             CAST(round(CAST(c_acctbal AS DECIMAL(18,6)) + 100, 2) AS DOUBLE)
               AS c_acctbal
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + {_DUCK_KEY_OFFSET}, concat('NEW#', c_name), 0.0
      FROM customer WHERE c_custkey % 100 = 0
    )
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal,
           TRUE AS from_update
    FROM updates
    UNION ALL
    SELECT t.c_custkey, t.c_name,
           CAST(round(CAST(t.c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE), FALSE
    FROM customer t
    WHERE t.c_custkey NOT IN (SELECT c_custkey FROM updates)
    """,
    tags=("merge", "upsert", "join"),
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) emulated without a lakehouse format:
    matched rows take the update, unmatched target rows survive via a
    LEFT ANTI join, inserts append — ``anti-join ∪ updates``, the plan
    a Delta MERGE compiles to minus the transactional commit. The
    update batch is derived deterministically from the target itself so
    the oracle can rebuild it.

    Scale note: the anti-join shuffles on the merge key once; with a
    bucketed target table (see tests/test_scale_patterns.py) even that
    shuffle disappears. Delta/Iceberg MERGE is the transactional drop-in
    when those jars are on the classpath.
    """
    target = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    off = _synth_key_offset(target, "c_custkey")
    updates = (
        target.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_name",
            F.expr(
                "CAST(round(CAST(c_acctbal AS DECIMAL(18,6)) + 100, 2) AS DOUBLE)"
            ).alias("c_acctbal"),
        )
        .unionByName(
            target.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + F.lit(off)).alias("c_custkey"),
                F.concat(F.lit("NEW#"), F.col("c_name")).alias("c_name"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    kept = target.join(updates.select("c_custkey"), "c_custkey", "left_anti")
    merged = updates.withColumn("from_update", F.lit(True)).unionByName(
        kept.withColumn("from_update", F.lit(False))
    )
    return merged.select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
        "from_update",
    )


@register(
    "txn_merge_upsert_customers",
    oracle=f"""
    WITH updates AS (
      SELECT c_custkey, c_name,
             CAST(round(CAST(c_acctbal AS DECIMAL(18,6)) + 100, 2) AS DOUBLE)
               AS acctbal,
             TRUE AS from_update
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + {_DUCK_KEY_OFFSET}, concat('NEW#', c_name), 0.0, TRUE
      FROM customer WHERE c_custkey % 100 = 0
    )
    SELECT c_custkey, c_name, acctbal, from_update FROM updates
    UNION ALL
    SELECT t.c_custkey, t.c_name,
           CAST(round(CAST(t.c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE),
           FALSE
    FROM customer t
    WHERE t.c_custkey NOT IN (SELECT c_custkey FROM updates)
    """,
    tags=("merge", "upsert", "txn", "acid"),
)
def txn_merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME MERGE semantics as ``merge_upsert_customers`` — but
    executed through :class:`~..sinks.txnlog.TxnTable`, the versioned-
    manifest transactional layer: the target is seeded as commit v0,
    the merge rewrites and atomically commits v1, and the result is the
    committed snapshot read BACK off the log (not the in-flight plan),
    so the oracle gates what a concurrent reader would actually see
    after the transaction.

    SELF-CHECKS the transactional properties the batch emulation
    can't offer: (a) exactly two committed versions exist; (b) TIME
    TRAVEL — the pre-merge snapshot v0 still reads back with the
    original row count and no update rows while v1 is live (MVCC
    isolation); (c) VACUUM to 1 retained version removes v0's
    manifest+data and v1 remains fully readable. Raises on any
    violation."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    raw = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    off = _synth_key_offset(raw, "c_custkey")
    base = raw.select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
        F.lit(False).alias("from_update"),
    )
    # updates round ONCE, after the +100, from the RAW balance — the
    # oracle's order. Rounding the base first diverges on negative
    # half-boundary balances: HALF_UP is away-from-zero, and +100 flips
    # the sign (round(-27.565)+100 = 72.43 vs round(-27.565+100) = 72.44).
    updates = raw.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        F.expr(
            "CAST(round(CAST(c_acctbal AS DECIMAL(18,6)) + 100, 2) AS DOUBLE)"
        ).alias("acctbal"),
        F.lit(True).alias("from_update"),
    ).unionByName(
        raw.filter(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + F.lit(off)).alias("c_custkey"),
            F.concat(F.lit("NEW#"), F.col("c_name")).alias("c_name"),
            F.lit(0.0).alias("acctbal"),
            F.lit(True).alias("from_update"),
        )
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_")
    try:
        table = TxnTable(work)
        v0 = table.write(base, mode="overwrite")
        n_before = table.read(spark, v0).count()
        v1 = table.merge(spark, updates, key="c_custkey")
        if (v0, v1) != (0, 1) or table.latest_version() != 1:
            raise AssertionError(f"expected versions (0, 1); got ({v0}, {v1})")
        # MVCC time travel: v0 is byte-identical to the pre-merge state
        old = table.read(spark, 0)
        if old.count() != n_before or old.filter("from_update").count() != 0:
            raise AssertionError("time-travel snapshot v0 was disturbed by merge")
        # retain_hours=0: single-writer context (no concurrent stager
        # to protect), and the just-written v0 data is seconds old
        removed = table.vacuum(retain_versions=1, retain_hours=0.0)
        if not removed:
            raise AssertionError("vacuum removed nothing; v0 data leaked")
        result = table.read(spark)  # still fully readable post-vacuum
        from ceneton_database_tools_spark.operators.scale import _record_inner_plan

        _record_inner_plan("txn_merge_upsert_customers", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_table_changes",
    oracle=f"""
    WITH base AS (
      SELECT c_custkey, c_name,
             CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS bal,
             c_acctbal AS raw
      FROM customer
    )
    SELECT c_custkey, c_name, bal AS acctbal,
           'insert' AS change_type, CAST(1 AS BIGINT) AS commit_version
    FROM base WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_custkey, c_name, bal, 'delete', CAST(2 AS BIGINT)
    FROM base WHERE c_custkey % 14 = 0
    UNION ALL
    SELECT c_custkey, c_name,
           CAST(round(CAST(raw AS DECIMAL(18,6)) + 100, 2) AS DOUBLE),
           'insert', CAST(3 AS BIGINT)
    FROM base WHERE c_custkey % 70 = 0
    UNION ALL
    -- raw IS NOT NULL: a NULL balance updates to NULL + 100 = NULL, a
    -- value-identical rewrite — the snapshot-diff-derived feed
    -- (correctly) cannot and does not distinguish it from an untouched
    -- row carried through the directory rewrite, so no pre/post image
    SELECT c_custkey, c_name, bal, 'update_preimage', CAST(3 AS BIGINT)
    FROM base
    WHERE c_custkey % 10 = 0 AND c_custkey % 70 <> 0 AND raw IS NOT NULL
    UNION ALL
    SELECT c_custkey, c_name,
           CAST(round(CAST(raw AS DECIMAL(18,6)) + 100, 2) AS DOUBLE),
           'update_postimage', CAST(3 AS BIGINT)
    FROM base
    WHERE c_custkey % 10 = 0 AND c_custkey % 70 <> 0 AND raw IS NOT NULL
    UNION ALL
    SELECT c_custkey + {_DUCK_KEY_OFFSET}, concat('NEW#', c_name), 0.0,
           'insert', CAST(3 AS BIGINT)
    FROM base WHERE c_custkey % 100 = 0
    """,
    tags=("txn", "cdf", "changelog", "acid"),
)
def txn_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over the transactional table: build a 4-commit
    history on ``customer`` (v0 overwrite of the odd keys, v1 append of
    the even keys, v2 copy-on-write DELETE of ``c_custkey % 14 = 0``,
    v3 MERGE of the standard update batch), then derive the row-level
    changelog ``changes(0, 3)`` from the manifests. The oracle states
    the expected feed in closed form — inserts at cv1, deletes at cv2,
    update pre/post images plus re-inserts of previously-deleted keys
    at cv3 — derived independently of the snapshot-diff machinery.

    SELF-CHECKS the storage-level properties the oracle can't see:
    (a) COPY-ON-WRITE — the delete's predicate only hits even keys, so
    v2's manifest must still reference v0's (odd-key) data directory
    byte-untouched; (b) the pure-append diff (v0→v1) plans ZERO joins
    (the added directory IS the insert set); (c) a no-match delete is
    a no-op returning None, committing nothing; (d) time travel — v1
    still holds the deleted keys while v3 is live; (e) the feed
    reconciles: inserts − deletes == count(v3) − count(v0)."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    raw = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    off = _synth_key_offset(raw, "c_custkey")
    base = raw.select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    updates = raw.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        F.expr(
            "CAST(round(CAST(c_acctbal AS DECIMAL(18,6)) + 100, 2) AS DOUBLE)"
        ).alias("acctbal"),
    ).unionByName(
        raw.filter(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + F.lit(off)).alias("c_custkey"),
            F.concat(F.lit("NEW#"), F.col("c_name")).alias("c_name"),
            F.lit(0.0).alias("acctbal"),
        )
    )
    work = tempfile.mkdtemp(prefix="ceneton_cdf_")
    try:
        table = TxnTable(work)
        v0 = table.write(base.filter(F.col("c_custkey") % 2 == 1), mode="overwrite")
        v1 = table.write(base.filter(F.col("c_custkey") % 2 == 0), mode="append")
        v2 = table.delete(spark, "c_custkey % 14 = 0")
        v3 = table.merge(spark, updates, key="c_custkey")
        if (v0, v1, v2, v3) != (0, 1, 2, 3):
            raise AssertionError(f"unexpected versions {(v0, v1, v2, v3)}")
        # (a) copy-on-write: the odd-key directory from v0 survives the
        # delete BY REFERENCE (the predicate only hits even keys)
        if not set(table.snapshot(0)["files"]) <= set(table.snapshot(2)["files"]):
            raise AssertionError("delete rewrote an untouched directory")
        # (b) pure-append diff must plan zero joins
        append_plan = (
            table.changes(spark, "c_custkey", 0, 1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "Join" in append_plan:
            raise AssertionError("append-commit diff planned a join")
        # (c) a no-match delete commits nothing
        if table.delete(spark, "c_custkey IS NULL") is not None:
            raise AssertionError("no-match delete produced a commit")
        if table.latest_version() != 3:
            raise AssertionError("no-op delete advanced the version")
        # (d) time travel: the deleted keys are still visible at v1
        if table.read(spark, 1).where("c_custkey % 14 = 0").count() == 0:
            raise AssertionError("time-travel snapshot lost deleted keys")
        feed = table.changes(spark, "c_custkey", 0, 3)
        from ceneton_database_tools_spark.operators.scale import _record_inner_plan

        _record_inner_plan("txn_table_changes", feed)
        rows = feed.collect()
        # (e) the feed reconciles with the snapshot row counts
        n_ins = sum(1 for r in rows if r.change_type == "insert")
        n_del = sum(1 for r in rows if r.change_type == "delete")
        delta = table.read(spark, 3).count() - table.read(spark, 0).count()
        if n_ins - n_del != delta:
            raise AssertionError(
                f"changelog does not reconcile: {n_ins}-{n_del} != {delta}"
            )
        return spark.createDataFrame(rows, schema=feed.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_partitioned_table",
    # Closed-form statement of the final snapshot: two partitioned
    # appends land the full table, then two O(manifest) partition drops
    # remove '1-URGENT' and the NULL-priority partition (the latter a
    # no-op on data without NULL priorities) — so the survivors are
    # exactly the non-null, non-urgent rows.
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)
             AS totalprice
    FROM orders
    WHERE o_orderpriority IS NOT NULL AND o_orderpriority <> '1-URGENT'
    """,
    tags=("txn", "partition", "pruning", "acid"),
)
def txn_partitioned_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED transactional table: ``orders`` lands in two
    partition-aligned appends (one directory per ``o_orderpriority``
    value per commit, exact values in the manifest), then
    ``drop_partitions`` removes the '1-URGENT' partition and the NULL
    partition as pure METADATA commits — zero bytes read or written,
    Delta's partition-delete fast path. The oracle states the surviving
    rows in closed form, gating layout fidelity (no row lost or
    duplicated across the per-partition staging), drop exactness, and
    NULL-partition semantics (a comparison never matches NULL; dropping
    it takes an explicit is_null).

    SELF-CHECKS what the oracle can't see: (a) both drops leave the
    data directory listing byte-identical — O(manifest), not
    copy-on-write; (b) equality pruning keeps exactly the two '5-LOW'
    directories (one per append) and the pruned read equals the
    filtered read; (c) the dropped partition still time-travels; (d)
    the change feed across the drop commit is pure deletes of that
    partition; (e) a plain append into the partitioned layout fails
    loudly. At 100 TB a retention delete on a partitioned fact table
    is this manifest edit, not a table rewrite."""
    import os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.expr(
            "CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)"
        ).alias("totalprice"),
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_part_")
    try:
        table = TxnTable(work)
        v0 = table.write_partitioned(
            base.filter(F.col("o_orderkey") % 2 == 0),
            ("o_orderpriority",),
            mode="overwrite",
        )
        v1 = table.write_partitioned(
            base.filter(F.col("o_orderkey") % 2 == 1), ("o_orderpriority",)
        )
        if (v0, v1) != (0, 1):
            raise AssertionError(f"unexpected versions {(v0, v1)}")
        # (b) exact pruning: '5-LOW' keeps one directory per append
        kept, _ = table.prune([("o_orderpriority", "=", "5-LOW")])
        if len(kept) != 2:
            raise AssertionError(f"expected 2 pruned-in dirs, got {kept}")
        pruned = table.read_pruned(
            spark, [("o_orderpriority", "=", "5-LOW")]
        ).where("o_orderpriority = '5-LOW'")
        if pruned.count() != table.read(spark).where(
            "o_orderpriority = '5-LOW'"
        ).count():
            raise AssertionError("pruned read lost rows")
        # (a) partition drops are metadata-only
        disk_before = sorted(os.listdir(table.data_dir))
        v2 = table.drop_partitions([("o_orderpriority", "=", "1-URGENT")])
        if v2 is None:
            raise AssertionError("1-URGENT partition missing from input")
        # NULL priorities exist only in the hostile fixture; the drop
        # is a documented no-op (None) without them
        table.drop_partitions([("o_orderpriority", "is_null", None)])
        if sorted(os.listdir(table.data_dir)) != disk_before:
            raise AssertionError("drop_partitions staged or removed data")
        # (c) the dropped partition still time-travels
        if table.read(spark, v1).where(
            "o_orderpriority = '1-URGENT'"
        ).count() == 0:
            raise AssertionError("time travel lost the dropped partition")
        # (d) the drop's change feed is pure deletes of that partition
        feed = table.changes(spark, "o_orderkey", v1, v2).collect()
        if {r.change_type for r in feed} != {"delete"} or any(
            r.o_orderpriority != "1-URGENT" for r in feed
        ):
            raise AssertionError("drop feed is not pure 1-URGENT deletes")
        # (e) the layout is protected against unaligned appends
        try:
            table.write(base.limit(1), mode="append")
            raise AssertionError("plain append into partitioned layout")
        except ValueError:
            pass
        result = table.read(spark)
        _record_inner_plan("txn_partitioned_table", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_constraints_enforced",
    # Closed-form statement of the final snapshot: the initial load
    # plus ONLY the valid merge batch (balances bumped for the top-100
    # keys); the violating batch must have committed nothing.
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_name,
             CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS bal,
             c_acctbal AS raw
      FROM customer
    ),
    topk AS (
      SELECT c_custkey FROM base ORDER BY c_custkey DESC LIMIT 100
    )
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey IN (SELECT c_custkey FROM topk)
                THEN CAST(round(CAST(raw AS DECIMAL(18,6)) + 1, 2) AS DOUBLE)
                ELSE bal END AS acctbal
    FROM base
    """,
    tags=("txn", "constraints", "timestamp-travel", "acid"),
)
def txn_constraints_enforced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK CONSTRAINTS + TIMESTAMP TRAVEL through the txn log:
    ``customer`` lands as v0, ``add_constraint`` commits the policy
    ``c_custkey >= 0`` (v1) after validating the whole snapshot, a MERGE
    batch containing a violating row (key -1) must raise and commit
    NOTHING, and the corrected batch (top-100 keys, balance +1) lands
    as v2. The oracle states the final snapshot in closed form — it
    gates that the rejected batch truly left no trace and the valid
    one fully landed.

    SELF-CHECKS what the oracle can't see: (a) the violating merge
    raises ``ConstraintViolation`` and leaves the version at v1 with
    no orphaned staged directory; (b) an ``add_constraint`` that
    existing rows violate also commits nothing; (c) TIMESTAMP travel —
    ``read_as_of`` at v0's commit stamp reads the pre-merge balances;
    (d) the policy survives the merge (``constraints()`` at v2);
    (e) ``history()`` records the add_constraint op with its stamp."""
    import os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import (
        ConstraintViolation,
        TxnTable,
    )

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    raw = _t(spark, sf_dir, "customer")
    topk = (
        raw.orderBy(F.col("c_custkey").desc())
        .limit(100)
        .select(
            "c_custkey",
            "c_name",
            F.expr(
                "CAST(round(CAST(c_acctbal AS DECIMAL(18,6)) + 1, 2) AS DOUBLE)"
            ).alias("acctbal"),
        )
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_cons_")
    try:
        table = TxnTable(work)
        v0 = table.write(base, mode="overwrite")
        ts0 = table.snapshot(v0)["ts"]
        v1 = table.add_constraint(spark, "pos_key", "c_custkey >= 0")
        if (v0, v1) != (0, 1):
            raise AssertionError(f"unexpected versions {(v0, v1)}")
        # (b) a policy existing rows violate commits nothing
        try:
            table.add_constraint(spark, "impossible", "c_custkey > 1000000000")
            raise AssertionError("violated add_constraint did not raise")
        except ConstraintViolation:
            pass
        # (a) a merge with one violating row commits NOTHING
        bad = topk.unionByName(
            topk.limit(1).withColumn("c_custkey", F.lit(-1).cast("bigint"))
        )
        try:
            table.merge(spark, bad, key="c_custkey")
            raise AssertionError("violating merge did not raise")
        except ConstraintViolation:
            pass
        if table.latest_version() != 1:
            raise AssertionError("rejected batch advanced the version")
        disk = {d for d in os.listdir(table.data_dir)}
        refs = {f.split("/")[1] for f in table.snapshot()["files"]}
        if disk != refs:
            raise AssertionError("rejected batch leaked a staged directory")
        v2 = table.merge(spark, topk, key="c_custkey")
        if v2 != 2:
            raise AssertionError(f"valid merge landed at {v2}")
        # (c) timestamp travel reads the pre-merge snapshot
        n_pre = table.read_as_of(spark, ts0).count()
        if n_pre != base.count():
            raise AssertionError("read_as_of lost rows")
        # (d) + (e): the policy and its history survive the merge
        if table.constraints() != {"pos_key": "c_custkey >= 0"}:
            raise AssertionError("policy lost across the merge")
        hist = table.history()
        if [h["op"] for h in hist] != ["merge", "add_constraint", "overwrite"]:
            raise AssertionError(f"unexpected history {[h['op'] for h in hist]}")
        if any("ts" not in h for h in hist):
            raise AssertionError("history missing commit stamps")
        result = table.read(spark)
        _record_inner_plan("txn_constraints_enforced", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_constraint_functions",
    # Final snapshot in closed form: the base load plus ONLY the valid
    # face-written batch (top-50 keys, shifted +1000000, lowercased
    # names) — the function-violating face batch must commit nothing.
    oracle=f"""
    SELECT c_custkey, c_name FROM customer
    UNION ALL
    SELECT c_custkey + {_DUCK_KEY_OFFSET} AS c_custkey, lower(c_name) AS c_name
    FROM (
      SELECT c_custkey, c_name FROM customer
      ORDER BY c_custkey DESC LIMIT 50
    )
    """,
    tags=("txn", "constraints", "datasource-write", "acid"),
)
def txn_constraint_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTION-BEARING CHECK constraints on the DataSource WRITE FACE:
    ``add_constraint("len_ok", "length(c_name) <= 25")``-style policies
    (beyond the face's kleene-mask grammar) validate on executor tasks
    through ``df.write.format("txntable")`` via the embedded ANSI
    evaluator — per Arrow batch, before anything stages — instead of
    refusing the write. ``customer`` lands as v0, the length policy
    commits as v1, a conforming face batch appends as v2, and a face
    batch with one 99-char name must raise ``ConstraintViolation`` and
    commit NOTHING. The oracle states the final snapshot in closed
    form, gating both that the valid batch fully landed and that the
    rejected one left no trace.

    SELF-CHECKS beyond the oracle: (a) the violating face write raises
    and leaves the version at v2 with an empty ``tmpstream/`` (no
    orphaned task files); (b) the stored policy is genuinely outside
    the where-option grammar (the fallback path, not the kleene path,
    is what this query exercises); (c) NULL-name rows pass the CHECK
    on the face (SQL three-valued semantics).

    Scale: validation is one embedded-engine aggregation per task
    batch, streamed — no second scan of the written data, no driver
    round-trip, same shape at 1000 executors."""
    import os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import (
        ConstraintViolation,
        TxnTable,
    )
    from ceneton_database_tools_spark.sources.txn_stream import (
        _parse_where_option,
        register_txn_source,
    )

    register_txn_source(spark)
    base = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    off = _synth_key_offset(base, "c_custkey")
    valid = (
        base.orderBy(F.col("c_custkey").desc())
        .limit(50)
        .select(
            (F.col("c_custkey") + F.lit(off)).alias("c_custkey"),
            F.lower("c_name").alias("c_name"),
        )
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_fncons_")
    try:
        table = TxnTable(work)
        v0 = table.write(base, mode="overwrite")
        policy = "length(c_name) <= 25"
        v1 = table.add_constraint(spark, "len_ok", policy)
        if (v0, v1) != (0, 1):
            raise AssertionError(f"unexpected versions {(v0, v1)}")
        # (b) the policy is beyond the grammar — the ANSI fallback is
        # what validates it on the face's tasks
        try:
            _parse_where_option(policy)
            raise AssertionError("policy unexpectedly grammar-parsable")
        except ValueError:
            pass
        # conforming face batch (incl. a NULL name — passes CHECK)
        with_null = valid.unionByName(
            spark.createDataFrame(
                [(9999999, None)], "c_custkey bigint, c_name string"
            )
        )
        with_null.where("c_name IS NOT NULL").write.format("txntable").mode(
            "append"
        ).option("path", work).save()
        # (c) NULL passes: a one-row NULL-name batch is accepted...
        with_null.where("c_name IS NULL").write.format("txntable").mode(
            "append"
        ).option("path", work).save()
        # ...then removed again so the oracle stays closed-form
        table.delete(spark, "c_name IS NULL")
        v_now = table.latest_version()
        # (a) a face batch with one over-long name commits NOTHING
        bad = valid.limit(1).withColumn(
            "c_name", F.rpad(F.col("c_name"), 99, "x")
        )
        try:
            bad.write.format("txntable").mode("append").option(
                "path", work
            ).save()
            raise AssertionError("violating face write did not raise")
        except Exception as e:
            if "len_ok" not in str(e):
                raise
        if table.latest_version() != v_now:
            raise AssertionError("rejected face batch advanced the version")
        tmp = os.path.join(work, "tmpstream")
        if os.path.isdir(tmp) and os.listdir(tmp):
            raise AssertionError("rejected face batch leaked task files")
        if ConstraintViolation("x") and table.constraints() != {
            "len_ok": policy
        }:
            raise AssertionError("policy lost")
        result = table.read(spark).select("c_custkey", "c_name")
        _record_inner_plan("txn_constraint_functions", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_bloom_point_lookup",
    # Closed-form point lookup: whatever directories the bloom pruned,
    # the surviving scan must return exactly the probed row. The probe
    # key is derived identically on both engines (max key — guaranteed
    # to exist whatever the generator produced this round).
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal
    FROM customer
    WHERE c_custkey = (SELECT max(c_custkey) FROM customer)
    """,
    tags=("txn", "bloom", "pruning", "point-lookup"),
)
def txn_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DIRECTORY BLOOM FILTERS on the txn table: ``customer`` lands
    as four appends interleaved on ``c_custkey % 4``, so every
    directory spans the ENTIRE key range and [min, max] stats can prove
    nothing — the worst case for range-based skipping and the normal
    case for a high-cardinality key. Each commit folds its keys into a
    manifest bloom bitmap (md5 double-hashing, computed JVM-side in the
    staging scan); an equality probe then skips every directory whose
    bitmap provably lacks the key BEFORE Spark plans the scan. The
    oracle is the plain point lookup — it gates the no-false-negative
    property (the probed row's directory always survives).

    SELF-CHECKS what the oracle can't see: (a) stats-only pruning keeps
    all 4 directories (ranges fully overlap, by construction); (b) the
    bloom keeps exactly the one directory holding the probe; (c) a
    missing key (max+1) prunes everything (≤1 kept at the sized
    ~5e-7/dir false-positive rate) and the filtered read is empty. At
    100 TB this is a point lookup reading one commit instead of every
    commit ever — the case Z-order/stats layouts cannot serve without
    re-clustering by that exact key."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_bloom_")
    try:
        table = TxnTable(work, bloom_cols=("c_custkey",), bloom_bits=32768)
        for i in range(4):
            table.write(
                base.filter(F.col("c_custkey") % 4 == i),
                mode="append" if i else "overwrite",
            )
        probe = base.agg(F.max("c_custkey")).first()[0]  # bounded: 1 scalar
        snap = table.snapshot()
        # (a) ranges are useless here: no stats recorded (no stats_cols),
        # and the layout interleaves the full key range into every dir
        stats_kept = [
            rel
            for rel in snap["files"]
            if TxnTable._dir_may_match(
                snap.get("stats", {}).get(rel), [("c_custkey", "=", probe)]
            )
        ]
        if len(stats_kept) != 4:
            raise AssertionError("stats unexpectedly pruned the interleave")
        # (b) the bloom keeps exactly the probe's directory
        kept, skipped = table.prune([("c_custkey", "=", probe)])
        if (len(kept), len(skipped)) != (1, 3):
            raise AssertionError(f"bloom kept {kept}, skipped {skipped}")
        # (c) a missing key prunes everything and reads empty
        missing_kept, _ = table.prune([("c_custkey", "=", probe + 1)])
        if len(missing_kept) > 1:
            raise AssertionError(f"missing-key probe kept {missing_kept}")
        if (
            table.read_pruned(spark, [("c_custkey", "=", probe + 1)])
            .where(F.col("c_custkey") == probe + 1)
            .count()
            != 0
        ):
            raise AssertionError("missing key returned rows")
        result = table.read_pruned(spark, [("c_custkey", "=", probe)]).where(
            F.col("c_custkey") == probe
        )
        _record_inner_plan("txn_bloom_point_lookup", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_optimize_stats_pruning",
    # The oracle is the plain filtered projection — equality holds only
    # if (a) OPTIMIZE preserved every row while collapsing directories
    # and (b) manifest-stats pruning never dropped a matching row. The
    # probe key is derived the same way on both engines: the start of
    # the top quartile of the key range.
    oracle="""
    WITH b AS (
      SELECT min(c_custkey) AS lo, max(c_custkey) AS hi FROM customer
    )
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal
    FROM customer, b
    WHERE c_custkey >= lo + 3 * ((hi - lo + 1) // 4)
    """,
    tags=("txn", "optimize", "stats", "pruning", "acid"),
)
def txn_optimize_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST-LEVEL DATA SKIPPING + OPTIMIZE through the txn log:
    ``customer`` is committed as four key-range chunks (the natural
    clustered-append layout), the top chunk deliberately fragmented
    into four small commits; ``optimize(small_bytes=...)`` collapses
    the fragments into one directory AS A COMMIT; a top-quartile key
    predicate is then answered through ``read_pruned``, which drops
    the three lower-range directories from the plan before Spark ever
    lists their files. The oracle is the plain filtered projection —
    it gates both row preservation and pruning soundness.

    SELF-CHECKS the storage-level behavior the oracle can't see:
    (a) optimize compacted 7 directories to 4 and the big chunks
    survived BY REFERENCE; (b) the change feed across the optimize
    commit is EMPTY (row-identical rewrite); (c) pruning skipped
    exactly the 3 disjoint directories; (d) the pre-optimize layout
    still time-travels. At 100 TB this is the difference between a
    point query scanning every commit ever and scanning the one
    commit whose key range matches."""
    import os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    raw = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    b = raw.agg(F.min("c_custkey"), F.max("c_custkey")).first()  # 2 scalars
    lo, hi = int(b[0]), int(b[1])
    quart = (hi - lo + 1) // 4
    edges = [lo, lo + quart, lo + 2 * quart, lo + 3 * quart, hi + 1]
    work = tempfile.mkdtemp(prefix="ceneton_txn_opt_")
    try:
        table = TxnTable(os.path.join(work, "t"), stats_cols=("c_custkey",))
        key = F.col("c_custkey")
        for i in range(3):  # three big range chunks
            table.write(
                raw.filter((key >= edges[i]) & (key < edges[i + 1])),
                mode="append",
            )
        top_lo, top_hi = edges[3], edges[4]
        sixteenth = max(1, (top_hi - top_lo) // 4)
        for j in range(4):  # the top chunk, fragmented small
            s_lo = top_lo + j * sixteenth
            s_hi = top_hi if j == 3 else top_lo + (j + 1) * sixteenth
            table.write(
                raw.filter((key >= s_lo) & (key < s_hi)), mode="append"
            )
        n_before = table.read(spark).count()
        sizes = table.dir_sizes()
        big = table.snapshot(2)["files"]  # the three big chunks
        threshold = min(sizes[d] for d in big)
        v_opt = table.optimize(spark, small_bytes=threshold)
        if v_opt != 7 or len(table.snapshot(v_opt)["files"]) != 4:
            raise AssertionError(
                f"optimize should commit v7 with 4 dirs; got v{v_opt} "
                f"{len(table.snapshot(table.latest_version())['files'])} dirs"
            )
        # (a) the big chunks survive by reference
        if not set(big) <= set(table.snapshot(v_opt)["files"]):
            raise AssertionError("optimize rewrote an untouched directory")
        # (b) row-identical rewrite: empty change feed, same count
        if table.changes(spark, "c_custkey", v_opt - 1, v_opt).count() != 0:
            raise AssertionError("optimize commit changed row content")
        if table.read(spark).count() != n_before:
            raise AssertionError("optimize changed the row count")
        # (d) pre-optimize fragmentation still time-travels
        if len(table.snapshot(v_opt - 1)["files"]) != 7:
            raise AssertionError("pre-optimize layout lost")
        probe = edges[3]
        kept, skipped = table.prune([("c_custkey", ">=", probe)])
        # (c) exactly the three lower-range directories are skipped
        if len(skipped) != 3 or set(skipped) != set(big):
            raise AssertionError(
                f"stats pruning skipped {skipped}; expected the 3 big chunks"
            )
        result = table.read_pruned(spark, [("c_custkey", ">=", probe)]).where(
            key >= probe
        )
        _record_inner_plan("txn_optimize_stats_pruning", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_optimize_binpack",
    # The oracle is the PLAIN full projection — equality holds only if
    # the bin-packed compaction preserved every row across its multiple
    # bounded outputs. The storage-level shape (bins, bounded sizes,
    # metadata-only pick) is gated by the self-checks below.
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal
    FROM customer
    """,
    tags=("txn", "optimize", "binpack", "bytes-metadata", "acid"),
)
def txn_optimize_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIN-PACKED COMPACTION from manifest byte metadata (round 14):
    ``customer`` lands as 8 equal key-range commits on a CHECKPOINTED
    table, then ``optimize(target_bytes=2.5x median)`` packs them in
    commit order into bins of recorded size <= target and rewrites
    each bin into its own directory IN ONE COMMIT — Delta's OPTIMIZE
    maxFileSize shape, instead of fusing everything into one monster
    directory whose own future rewrite would be a full scan. The pick
    and the packing read ONLY the sidecar's ``bytes`` column (every
    commit records the sizes it staged, task-side on the DataSource
    faces); at 10^6 directories on object storage the pre-r14
    walk-per-pick was millions of serial LIST calls per compaction.

    SELF-CHECKS: (a) exactly ONE optimize commit produced exactly 4
    bounded outputs from the 8 inputs; (b) the change feed across it
    is EMPTY (row-identical rewrite); (c) every output's recorded size
    stays near the target (bounded, not fused); (d) ``size_bytes()``
    answers O(manifest) and matches the recorded sum; (e) no
    pre-existing directory was sized from the filesystem during the
    pick (metadata-only, asserted via a spy on the walk fallback)."""
    import os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    raw = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    b = raw.agg(F.min("c_custkey"), F.max("c_custkey")).first()  # 2 scalars
    lo, hi = int(b[0]), int(b[1])
    eighth = max(1, (hi - lo + 1) // 8)
    work = tempfile.mkdtemp(prefix="ceneton_txn_binpack_")
    try:
        table = TxnTable(
            os.path.join(work, "t"), stats_cols=("c_custkey",),
            checkpoint_at=4,
        )
        key = F.col("c_custkey")
        for i in range(8):
            s_lo = lo + i * eighth
            s_hi = hi + 1 if i == 7 else lo + (i + 1) * eighth
            table.write(
                raw.filter((key >= s_lo) & (key < s_hi)), mode="append"
            )
        n_before = table.read(spark).count()
        sizes = table.dir_sizes()  # metadata-only on this table
        target = int(2.5 * sorted(sizes.values())[len(sizes) // 2])
        # (e) the pick must never size a pre-existing directory from
        # the filesystem — only freshly staged outputs are measured
        pre_existing = set(sizes)
        sized: list = []
        real_db = TxnTable._dir_bytes
        TxnTable._dir_bytes = lambda self, rel: (
            sized.append(rel) or real_db(self, rel)
        )
        try:
            v_opt = table.optimize(spark, target_bytes=target)
        finally:
            TxnTable._dir_bytes = real_db
        if set(sized) & pre_existing:
            raise AssertionError(
                f"pick walked pre-existing dirs: {set(sized) & pre_existing}"
            )
        snap = table.snapshot(v_opt)
        # (a) one commit, 8 inputs -> 4 bounded outputs
        if v_opt != 8 or len(snap["files"]) != 4:
            raise AssertionError(
                f"expected v8 with 4 binned outputs, got v{v_opt} with "
                f"{len(snap['files'])} dirs"
            )
        # (b) row-identical: empty change feed, same count
        if table.changes(spark, "c_custkey", v_opt - 1, v_opt).count() != 0:
            raise AssertionError("binpack optimize changed row content")
        if table.read(spark).count() != n_before:
            raise AssertionError("binpack optimize changed the row count")
        # (c) outputs bounded near the target, none fused everything
        for rel, nb in snap["bytes"].items():
            if nb > 1.5 * target:
                raise AssertionError(
                    f"output {rel} is {nb}B — not bounded by ~{target}B"
                )
        # (d) O(manifest) size answer matches the recorded layout
        if table.size_bytes() != sum(snap["bytes"].values()):
            raise AssertionError("size_bytes() disagrees with the manifest")
        result = table.read(spark)
        _record_inner_plan("txn_optimize_binpack", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_reorg_purge",
    # The oracle is the post-delete live view in closed form (the
    # delete threshold derives from the data identically on both
    # engines). Equality gates that the purge materialized EXACTLY
    # the tombstones - nothing resurrected, nothing extra dropped;
    # the storage-level shape (tombstoned-dirs-only rewrite, by-ref
    # survival, dvs GC) is gated by the self-checks below.
    oracle="""
    WITH b AS (SELECT max(c_custkey) // 3 AS thr FROM customer)
    SELECT c_custkey,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS bal
    FROM customer, b
    WHERE NOT (c_custkey <= b.thr AND c_custkey % 5 = 0)
    """,
    tags=("txn", "reorg", "purge", "dv", "acid"),
)
def txn_reorg_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORG ... APPLY (PURGE) on a CHECKPOINTED table (round 14):
    ``customer`` lands as 6 key-range commits past ``checkpoint_at``,
    a merge-on-read ``delete_dv`` tombstones every 5th key in the low
    third (only the low directories carry tombstones), then
    :meth:`reorg_purge` rewrites EXACTLY those directories —
    materializing their deletes and shedding the tombstone anti-join
    every future read would otherwise pay forever, since optimize's
    size-based pick never touches a large tombstoned directory
    (Delta's REORG, likewise a specialized OPTIMIZE). The pick is
    metadata-only: the sidecar's ``dv_rows`` column streamed
    record-batch by record-batch, no filesystem sizing at all.

    SELF-CHECKS: (a) the purge commits as op ``reorg`` and stays
    checkpointed; (b) every untombstoned directory survives BY
    REFERENCE and exactly the tombstoned ones rewrite; (c) the dead
    ``dvs`` sidecar list drops with the last tombstone; (d) the live
    count is unchanged across the purge and the change feed over it
    is EMPTY (row-identical by contract); (e) no pre-existing
    directory is sized from the filesystem during the pick (spy on
    the walk fallback — only freshly staged outputs measure)."""
    import os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    raw = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(
            "CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)"
        ).alias("bal"),
    )
    mx = int(raw.agg(F.max("c_custkey")).first()[0])  # 1-row guard
    thr = mx // 3
    work = tempfile.mkdtemp(prefix="ceneton_txn_reorg_")
    try:
        table = TxnTable(
            os.path.join(work, "t"), stats_cols=("c_custkey",),
            checkpoint_at=4,
        )
        for i in range(6):
            lo, hi = i * mx // 6, (i + 1) * mx // 6
            # chunk 1 unbounded below: the synthetic keys start at 0
            pred = F.col("c_custkey") <= hi
            if i > 0:
                pred = (F.col("c_custkey") > lo) & pred
            table.write(raw.where(pred), mode="append")
        if "files_checkpoint" not in table._stub(table.latest_version()):
            raise AssertionError("fixture never crossed checkpoint_at")
        n_full = table.count()
        v_dv = table.delete_dv(
            spark, f"c_custkey <= {thr} AND pmod(c_custkey, 5) = 0"
        )
        if v_dv is None:
            raise AssertionError("merge-on-read delete matched nothing")
        dv_dirs = set(table._dv_rows_map(table._stub(v_dv)))
        if not dv_dirs or len(dv_dirs) >= 6:
            raise AssertionError(
                f"expected a strict subset of dirs tombstoned: {dv_dirs}"
            )
        n_live = table.count()
        files_before = set(table.snapshot()["files"])
        # (e) purge must never size a pre-existing directory — its
        # pick reads only the sidecar's dv_rows column
        sized: list = []
        real_db = TxnTable._dir_bytes
        TxnTable._dir_bytes = lambda self, rel: (
            sized.append(rel) or real_db(self, rel)
        )
        try:
            v_purge = table.reorg_purge(spark)
        finally:
            TxnTable._dir_bytes = real_db
        if set(sized) & files_before:
            raise AssertionError(
                f"purge pick walked pre-existing dirs: "
                f"{set(sized) & files_before}"
            )
        if v_purge is None:
            raise AssertionError("purge found nothing despite tombstones")
        stub = table._stub(v_purge)
        # (a) honest history, checkpoint preserved
        if stub.get("op") != "reorg" or "files_checkpoint" not in stub:
            raise AssertionError(f"bad purge commit: {stub.get('op')}")
        # (b) by-reference survival of exactly the untombstoned dirs
        if set(table.snapshot()["files"]) & files_before != (
            files_before - dv_dirs
        ):
            raise AssertionError("purge rewrote an untombstoned directory")
        # (c) tombstone accounting fully GC'd
        if "dvs" in stub or table._dv_rows_map(stub):
            raise AssertionError("purge left tombstone accounting behind")
        # (d) row-identical on the live view
        if table.count() != n_live or n_live >= n_full:
            raise AssertionError("purge changed the live row count")
        if table.changes(
            spark, "c_custkey", v_purge - 1, v_purge
        ).count() != 0:
            raise AssertionError("purge commit emitted row changes")
        if table.reorg_purge(spark) is not None:
            raise AssertionError("second purge found phantom tombstones")
        result = table.read(spark).select("c_custkey", "bal")
        _record_inner_plan("txn_reorg_purge", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_reorg_vacuum_lifecycle",
    # Post-delete live view in closed form (threshold derived from the
    # data on both engines). Equality gates the WHOLE maintenance
    # lifecycle: purge materialized exactly the tombstones, the
    # parallel vacuum deleted only dead storage, and the survivors
    # still read complete.
    oracle="""
    WITH b AS (SELECT max(o_orderkey) // 3 AS thr FROM orders)
    SELECT o_orderkey,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)
             AS total
    FROM orders, b
    WHERE NOT (o_orderkey <= b.thr AND o_orderkey % 11 = 0)
    """,
    tags=("txn", "reorg", "vacuum", "detail", "maintenance", "acid"),
)
def txn_reorg_vacuum_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MAINTENANCE lifecycle a production table cycles
    through (round 14): ``orders`` lands as 6 key-range commits past
    ``checkpoint_at``; ``detail()`` answers DESCRIBE DETAIL off the
    manifest with zero jobs; ``delete_dv`` tombstones every 11th key
    in the low third merge-on-read; :meth:`reorg_purge` rewrites
    exactly the tombstoned directories (concurrent singleton bins);
    then ``vacuum(spark=...)`` reclaims the dead predecessors AS ONE
    SPARK JOB (Delta's vacuum parallel delete — forced over the
    parallel path via the instance-level batch floor) plus the now
    globally-dead dv sidecar, under ``retain_versions=1``.

    SELF-CHECKS: (a) detail() before/after tracks the transition
    (tombstoned-dirs count 0 after purge, row count = live count,
    size_bytes consistent with the recorded layout); (b) vacuum
    removed EXACTLY the purged predecessor directories and the dv
    sidecar — every surviving directory still exists on disk; (c) the
    table reads completely after GC (nothing live was deleted)."""
    import os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    raw = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)"
        ).alias("total"),
    )
    mx = int(raw.agg(F.max("o_orderkey")).first()[0])  # 1-row guard
    thr = mx // 3
    work = tempfile.mkdtemp(prefix="ceneton_txn_lifecycle_")
    try:
        table = TxnTable(
            os.path.join(work, "t"), stats_cols=("o_orderkey",),
            checkpoint_at=4,
        )
        for i in range(6):
            lo, hi = i * mx // 6, (i + 1) * mx // 6
            # chunk 1 unbounded below: the synthetic keys start at 0
            pred = F.col("o_orderkey") <= hi
            if i > 0:
                pred = (F.col("o_orderkey") > lo) & pred
            table.write(raw.where(pred), mode="append")
        d0 = table.detail()
        if not (
            d0["checkpointed"]
            and d0["num_dirs"] == 6
            and d0["num_rows"] == table.count()
            and d0["num_tombstoned_dirs"] == 0
        ):
            raise AssertionError(f"detail() misreported the load: {d0}")
        if table.delete_dv(
            spark, f"o_orderkey <= {thr} AND pmod(o_orderkey, 11) = 0"
        ) is None:
            raise AssertionError("merge-on-read delete matched nothing")
        dv_dirs = set(
            table._dv_rows_map(table._stub(table.latest_version()))
        )
        if not dv_dirs or len(dv_dirs) >= 6:
            raise AssertionError(
                f"expected a strict subset of dirs tombstoned: {dv_dirs}"
            )
        if table.reorg_purge(spark) is None:
            raise AssertionError("purge found nothing despite tombstones")
        d1 = table.detail()
        if d1["num_tombstoned_dirs"] != 0 or d1["num_rows"] is None:
            raise AssertionError(f"detail() misreported the purge: {d1}")
        if d1["size_bytes"] is None:
            raise AssertionError("purge lost the byte metadata")
        # (b) parallel GC: exactly the purged predecessors + the dv
        # sidecar die; instance-level floor forces the Spark-job path
        table._VACUUM_PARALLEL_AT = 1
        removed = table.vacuum(
            retain_versions=1, retain_hours=0.0, spark=spark
        )
        got_dirs = {r for r in removed if r.startswith("data/")}
        if got_dirs != dv_dirs:
            raise AssertionError(
                f"vacuum removed {got_dirs}, expected exactly {dv_dirs}"
            )
        if not any(r.startswith("dv/") for r in removed):
            raise AssertionError("dead dv sidecar survived the vacuum")
        for rel in table.snapshot()["files"]:
            if not os.path.isdir(os.path.join(table.path, rel)):
                raise AssertionError(f"vacuum deleted live storage: {rel}")
        result = table.read(spark).select("o_orderkey", "total")
        _record_inner_plan("txn_reorg_vacuum_lifecycle", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_clustered_load_pruning",
    # Equality vs the plain filtered projection gates: the clustered
    # bulk load preserved every row, and within-commit range pruning
    # never dropped a matching one. Probe = start of the top decile of
    # the key range, derived identically on both engines.
    oracle="""
    WITH b AS (
      SELECT min(c_custkey) AS lo, max(c_custkey) AS hi FROM customer
    )
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal
    FROM customer, b
    WHERE c_custkey >= lo + 9 * ((hi - lo + 1) // 10)
    """,
    tags=("txn", "clustered", "stats", "pruning", "acid"),
)
def txn_clustered_load_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERED BULK LOAD: one ``write_clustered`` commit stages
    ``customer`` as 8 range-disjoint directories (repartitionByRange →
    partitionBy on the materialized partition id — one shuffle, one
    job), each with its own manifest [min, max], so a top-decile key
    predicate prunes WITHIN the single commit. This is the 100 TB
    loading posture: the initial bulk load of a key-clustered table
    lands prunable immediately, without one commit per range.

    SELF-CHECKS: (a) exactly ONE committed version holds all 8 range
    entries under one staged root; (b) the ranges are pairwise
    disjoint in the manifest stats; (c) the layout column never leaks
    into the schema; (d) pruning skips at least 6 of 8 directories
    for the top-decile probe; (e) a COW delete probes THROUGH the
    range layout — exactly one range directory is rewritten, seven
    survive by reference."""
    import os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    raw = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    b = raw.agg(F.min("c_custkey"), F.max("c_custkey")).first()  # 2 scalars
    lo, hi = int(b[0]), int(b[1])
    probe = lo + 9 * ((hi - lo + 1) // 10)
    work = tempfile.mkdtemp(prefix="ceneton_txn_clu_")
    try:
        table = TxnTable(os.path.join(work, "t"), stats_cols=("c_custkey",))
        v = table.write_clustered(raw, "c_custkey", buckets=8, mode="overwrite")
        m = table.snapshot(v)
        # (a) one commit, 8 range entries, one root
        roots = {f.split("/_range_bucket=")[0] for f in m["files"]}
        if v != 0 or len(m["files"]) != 8 or len(roots) != 1:
            raise AssertionError(
                f"expected one commit with 8 range entries; got v{v}, "
                f"{len(m['files'])} entries, {len(roots)} roots"
            )
        # (b) pairwise-disjoint ranges
        spans = sorted(tuple(m["stats"][f]["c_custkey"]) for f in m["files"])
        for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
            if not h1 < l2:
                raise AssertionError(f"overlapping range stats: {spans}")
        # (c) the layout column is not part of the table
        if table.read(spark).columns != ["c_custkey", "c_name", "acctbal"]:
            raise AssertionError("_range_bucket leaked into the schema")
        # (d) within-commit pruning
        kept, skipped = table.prune([("c_custkey", ">=", probe)])
        if len(skipped) < 6:
            raise AssertionError(
                f"top-decile probe should skip >= 6 of 8 ranges; "
                f"skipped {len(skipped)}"
            )
        result = table.read_pruned(spark, [("c_custkey", ">=", probe)]).where(
            F.col("c_custkey") >= probe
        )
        _record_inner_plan("txn_clustered_load_pruning", result)
        rows = result.collect()
        # (e) COW delete through the range layout: one range rewritten
        table.delete(spark, f"c_custkey = {lo}")
        m1 = table.snapshot(1)
        if len(set(m["files"]) & set(m1["files"])) != 7:
            raise AssertionError("delete rewrote more than the hit range")
        return spark.createDataFrame(rows, schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_schema_evolution",
    # Closed-form statement of the post-restore snapshot: the narrow v0
    # rows (evens) read the evolved column as NULL; the evolved append
    # (odds) carries real balances; the intervening delete was rolled
    # back by RESTORE, so every customer appears exactly once.
    oracle="""
    SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS acctbal
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)
    FROM customer WHERE c_custkey % 2 = 1
    """,
    tags=("txn", "schema-evolution", "restore", "acid"),
)
def txn_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION + RESTORE through the txn log: ``customer`` is
    committed narrow (v0: key+name, the even keys), then an append with
    an extra ``acctbal`` column lands as a ``merge_schema=True``
    EVOLUTION commit (v1: the odd keys) — old directories read the new
    column as NULL by name, never by position. A delete (v2) then
    simulates a mistake, and ``restore(1)`` rolls the table back AS A
    COMMIT (v3, O(manifest), zero bytes copied). The oracle states the
    post-restore snapshot in closed form, gating the whole ladder:
    evolution fill-in, per-version schema, and restore fidelity.

    SELF-CHECKS what the oracle can't see: (a) an append that RETYPES
    a column fails loudly (SchemaMismatch) and commits nothing; (b)
    the pre-evolution snapshot v0 still reads under its own NARROW
    schema; (c) restore republishes v1's directories BY REFERENCE;
    (d) the undone delete stays time-travelable at v2; (e) history()
    reports the op ladder newest-first."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import SchemaMismatch, TxnTable

    raw = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    narrow = raw.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name")
    wide = raw.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_evo_")
    try:
        table = TxnTable(work)
        v0 = table.write(narrow, mode="overwrite")
        v1 = table.write(wide, mode="append", merge_schema=True)
        # (a) a retyping append fails loudly and commits nothing
        try:
            table.write(
                narrow.withColumn("c_name", F.lit(0)), mode="append",
                merge_schema=True,
            )
            raise AssertionError("retyping append did not raise")
        except SchemaMismatch:
            pass
        if (v0, v1, table.latest_version()) != (0, 1, 1):
            raise AssertionError("schema guard committed a version")
        # (b) v0 keeps its narrow schema under time travel
        if table.read(spark, 0).columns != ["c_custkey", "c_name"]:
            raise AssertionError("pre-evolution snapshot schema widened")
        n_evolved = table.read(spark).count()
        v2 = table.delete(spark, "c_custkey % 3 = 0")
        v3 = table.restore(1)
        if (v2, v3) != (2, 3):
            raise AssertionError(f"unexpected versions {(v2, v3)}")
        # (c) restore is by-reference: v3 IS v1's file list
        if table.snapshot(3)["files"] != table.snapshot(1)["files"]:
            raise AssertionError("restore copied or altered directories")
        # (d) the undone delete still time-travels
        if table.read(spark, 2).where("c_custkey % 3 = 0").count() != 0:
            raise AssertionError("v2 lost the delete")
        if table.read(spark).count() != n_evolved:
            raise AssertionError("restore did not roll the delete back")
        # (e) the op ladder reads newest-first
        ops_ = [h["op"] for h in table.history()]
        if ops_ != ["restore", "delete", "append", "overwrite"]:
            raise AssertionError(f"unexpected history {ops_}")
        result = table.read(spark)
        _record_inner_plan("txn_schema_evolution", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_column_mapping",
    # Closed-form statement of the final snapshot: every customer once,
    # the balance column under its POST-RENAME name — evens were written
    # before the rename (physical name `bal`), odds after (physical
    # `balance`), and the read unifies both epochs.
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)
             AS balance
    FROM customer
    """,
    tags=("txn", "column-mapping", "schema-evolution", "acid"),
)
def txn_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-MAPPING SCHEMA EVOLUTION through the txn log — Delta's
    rename/drop column-mapping mode at this layer's directory
    granularity: v0 lands the even customers with the balance column
    named ``bal``; ``rename_column("bal", "balance")`` commits v1 as a
    PURE-MANIFEST rename (zero bytes rewritten — the manifest records
    the name history ``{balance: [balance, bal]}``); v2 appends the odd
    customers under the new name. The latest read serves BOTH epochs
    under ``balance`` (per-directory name-history coalesce, a codegen'd
    projection on the scan — `sinks/txnlog.py` ``_read_dirs``), which
    the oracle states in closed form.

    SELF-CHECKS what the oracle can't see: (a) the rename commit is
    metadata-only (identical file list); (b) time travel to v0 still
    reads under the OLD name; (c) an append that resurrects the retired
    name fails loudly and commits nothing; (d) the change feed across
    the rename emits the v2 rows under the new name and nothing for the
    rename commit itself; (e) ``drop_column`` then ``restore`` round-
    trips the schema state as pure-metadata commits; (f) the DataSource
    read face resolves the mapping identically (Arrow-side per-file
    name resolution, `sources/txn_stream.py` ``_emit_file_batches``).

    Scale shape: a rename/drop on a 100 TB table moves ZERO data —
    exactly Delta's column-mapping contract; reads add one coalesce per
    renamed column inside the scan-stage projection (whole-stage
    codegen, no shuffle, no Python)."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import SchemaMismatch, TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )

    raw = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)"),
    )
    evens = raw.filter(F.col("c_custkey") % 2 == 0).toDF(
        "c_custkey", "c_name", "bal"
    )
    odds = raw.filter(F.col("c_custkey") % 2 == 1).toDF(
        "c_custkey", "c_name", "balance"
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_colmap_")
    try:
        table = TxnTable(work)
        table.write(evens, mode="overwrite")  # v0, physical name `bal`
        files_v0 = table.snapshot(0)["files"]
        v1 = table.rename_column("bal", "balance")
        # (a) pure-manifest rename: same directories, zero data moved
        if v1 != 1 or table.snapshot(1)["files"] != files_v0:
            raise AssertionError("rename touched data directories")
        table.write(odds)  # v2, physical name `balance`
        # (b) pre-rename snapshot keeps its own name under time travel
        if table.read(spark, 0).columns != ["c_custkey", "c_name", "bal"]:
            raise AssertionError("v0 lost its pre-rename column name")
        # (c) resurrecting the retired physical name is refused
        try:
            table.write(
                odds.withColumn("bal", F.lit(1.0)), merge_schema=True
            )
            raise AssertionError("retired-name re-add did not raise")
        except SchemaMismatch:
            pass
        if table.latest_version() != 2:
            raise AssertionError("refused evolution committed a version")
        # (d) CDF across the rename: only v2's inserts, under `balance`
        feed = table.changes(spark, "c_custkey", 0)
        n_odds = odds.count()
        ins = feed.where("change_type = 'insert'")
        if feed.count() != n_odds or ins.count() != n_odds:
            raise AssertionError("change feed misread the rename ladder")
        if "balance" not in ins.columns:
            raise AssertionError("change feed kept the pre-rename name")
        # (e) drop + restore round-trip as pure-metadata commits
        v3 = table.drop_column("balance")
        if table.read(spark).columns != ["c_custkey", "c_name"]:
            raise AssertionError("drop_column still projects the column")
        if table.snapshot(v3)["files"] != table.snapshot(2)["files"]:
            raise AssertionError("drop_column touched data directories")
        v4 = table.restore(2)
        if (v3, v4) != (3, 4):
            raise AssertionError(f"unexpected versions {(v3, v4)}")
        result = table.read(spark)
        rows = result.collect()
        # (f) the DataSource face resolves the mapping identically
        register_txn_source(spark)
        face_n = (
            spark.read.format("txntable").option("path", work).load().count()
        )
        if face_n != len(rows):
            raise AssertionError(
                f"face read {face_n} rows, Python API {len(rows)}"
            )
        _record_inner_plan("txn_column_mapping", result)
        return spark.createDataFrame(rows, schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_merge_schema_evolution",
    # Closed-form final snapshot: all customers; odd keys were upserted
    # by the evolving MERGE and carry the new segment column, even keys
    # predate the evolution and read it as NULL.
    oracle="""
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 2 = 1 THEN c_mktsegment END AS segment
    FROM customer
    """,
    tags=("txn", "merge", "schema-evolution", "acid"),
)
def txn_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE WITH SCHEMA EVOLUTION (Delta's ``withSchemaEvolution``):
    the table lands narrow (key + name, v0), then ONE upsert carrying a
    NEW ``segment`` column evolves the schema in the same commit —
    matched rows update and gain the column, surviving rows read it as
    NULL by name, and the append-path evolution rules hold (no retypes,
    no retired-name revival). Half the upserted keys are matches
    (rewrites) and half are brand-new inserts, so both MERGE branches
    cross the evolution.

    SELF-CHECKS: (a) the same merge WITHOUT ``merge_schema`` refuses up
    front (SchemaMismatch) and commits nothing; (b) the evolved commit
    is ONE version with op ``merge``; (c) post-merge the narrow v0
    still time-travels under its own two columns."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import SchemaMismatch, TxnTable

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    narrow = cust.filter(F.col("c_custkey") % 4 < 2).select(
        "c_custkey", "c_name"
    )  # evens of each 4-block, plus half the odds' slots stay open
    upserts = cust.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_name", F.col("c_mktsegment").alias("segment")
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_mergeevo_")
    try:
        table = TxnTable(work)
        table.write(narrow, mode="overwrite")  # v0: %4 in {0,1}
        # (a) without merge_schema the evolving upsert refuses up front
        try:
            table.merge(spark, upserts, key="c_custkey")
            raise AssertionError("evolving merge without merge_schema ran")
        except SchemaMismatch:
            pass
        if table.latest_version() != 0:
            raise AssertionError("refused merge committed a version")
        v1 = table.merge(spark, upserts, key="c_custkey", merge_schema=True)
        # (b) one commit, op merge
        if v1 != 1 or table.history()[0]["op"] != "merge":
            raise AssertionError("evolving merge did not land as one merge")
        # (c) v0 keeps its narrow schema under time travel
        if table.read(spark, 0).columns != ["c_custkey", "c_name"]:
            raise AssertionError("pre-evolution snapshot widened")
        # fill in the untouched evens missing from v0 (%4 in {2,3} are
        # even keys %4==2 only... evens %4 in {0,2}: v0 holds %4<2, so
        # even keys %4==2 arrive here as a plain evolved append)
        rest = cust.filter(
            (F.col("c_custkey") % 2 == 0) & (F.col("c_custkey") % 4 >= 2)
        ).select("c_custkey", "c_name")
        table.write(rest, merge_schema=True)
        result = table.read(spark)
        _record_inner_plan("txn_merge_schema_evolution", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_optimize_zorder",
    # The oracle states the 2-D rectangle aggregate straight off
    # lineitem (exact integer bounds); the engine computes it off the
    # ZORDER-rewritten table THROUGH manifest pruning — equality holds
    # only if the re-layout lost/duplicated nothing and the pruned
    # read's one-sided proof kept every matching directory.
    oracle="""
    WITH b AS (
      SELECT min(l_orderkey) AS mno, max(l_orderkey) AS mxo,
             min(l_partkey)  AS mnp, max(l_partkey)  AS mxp
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS price_cents
    FROM lineitem, b
    WHERE l_orderkey >= mno + ((mxo - mno + 1) * 4) // 16
      AND l_orderkey <  mno + ((mxo - mno + 1) * 5) // 16
      AND l_partkey  >= mnp + ((mxp - mnp + 1) * 4) // 16
      AND l_partkey  <  mnp + ((mxp - mnp + 1) * 5) // 16
    GROUP BY l_returnflag
    """,
    tags=("txn", "zorder", "optimize", "data-skipping", "acid"),
)
def txn_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``OPTIMIZE ZORDER BY (l_orderkey, l_partkey)`` through the txn
    log: lineitem lands as four arbitrary append commits (no useful
    layout), then ``optimize_zorder`` rewrites the table in Morton
    order as 16 z-range directories — a pure re-layout commit with
    row-identical content — and a TWO-DIMENSIONAL rectangle query
    prunes through the manifest to the few directories whose [min,max]
    box intersects. The standalone layout demo is
    ``scale_zorder_layout`` (operators/scale.py); this gates the same
    bit-interleave wired into the table format, where the stats live
    in the COMMIT LOG rather than a side computation.

    SELF-CHECKS: (a) the optimize commit preserved the exact row count
    (manifest metadata, zero scans); (b) the rectangle prune SKIPS at
    least half of the 16 z-range directories — the multi-dimensional
    skipping claim itself; (c) time travel to the pre-optimize version
    still reads the un-clustered layout."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"
    )
    # bounded collect: 4 scalars, the same bounds the oracle derives
    mno, mxo, mnp, mxp = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    span_o, span_p = mxo - mno + 1, mxp - mnp + 1
    lo_o, hi_o = mno + (span_o * 4) // 16, mno + (span_o * 5) // 16
    lo_p, hi_p = mnp + (span_p * 4) // 16, mnp + (span_p * 5) // 16
    work = tempfile.mkdtemp(prefix="ceneton_txn_zorder_")
    try:
        table = TxnTable(work)
        # four arbitrary (hash-split) appends: the worst layout —
        # every directory spans the whole key range on both dims
        for i in range(4):
            part = li.filter(F.pmod(F.xxhash64("l_orderkey", "l_partkey"), F.lit(4)) == i)
            table.write(part, mode="overwrite" if i == 0 else "append")
        pre_version = table.latest_version()
        n_before = table.count()
        v = table.optimize_zorder(
            spark, ("l_orderkey", "l_partkey"), buckets=16
        )
        # (a) row-identical re-layout, proven from manifest metadata
        if table.count() != n_before:
            raise AssertionError("optimize_zorder changed the row count")
        if table.history()[0]["op"] != "optimize" or v != pre_version + 1:
            raise AssertionError("zorder did not land as one optimize commit")
        # (b) 2-D rectangle pruning over the z-range directories
        preds = [
            ("l_orderkey", ">=", int(lo_o)), ("l_orderkey", "<", int(hi_o)),
            ("l_partkey", ">=", int(lo_p)), ("l_partkey", "<", int(hi_p)),
        ]
        kept, skipped = table.prune(preds)
        if len(kept) + len(skipped) != 16 or len(skipped) < 8:
            raise AssertionError(
                f"rectangle should skip >= 8 of 16 z-ranges; kept "
                f"{len(kept)}, skipped {len(skipped)}"
            )
        # (c) the pre-optimize layout is still time-travelable
        if len(table.snapshot(pre_version)["files"]) != 4:
            raise AssertionError("pre-optimize snapshot lost its layout")
        rect = (
            (F.col("l_orderkey") >= lo_o) & (F.col("l_orderkey") < hi_o)
            & (F.col("l_partkey") >= lo_p) & (F.col("l_partkey") < hi_p)
        )
        cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        result = (
            table.read_pruned(spark, preds)
            .where(rect)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(cents).cast("long").alias("price_cents"),
            )
        )
        _record_inner_plan("txn_optimize_zorder", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_update_where",
    # Closed-form final snapshot: BUILDING-segment balances are floored
    # at 0.0, every other row is untouched. The quantized double grid
    # keeps both engines' doubles identical through the rewrite.
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_mktsegment = 'BUILDING'
                  AND CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) < 0
                THEN 0.0
                ELSE CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)
           END AS bal
    FROM customer
    """,
    # VERDICT r11 #6: the bench previously timed no row-level op; this
    # leg covers the txn subsystem that changes every round
    bench=True,
    tags=("txn", "update", "cow", "acid"),
)
def txn_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UPDATE ... SET ... WHERE`` through the txn log — the row-level
    write surface between ``delete`` and ``merge``: customers land as
    four segment-hash commits, then ONE update floors negative
    BUILDING balances at zero. Copy-on-write at directory granularity:
    the probe finds the directories containing matches and only those
    rewrite; the rest survive by reference — at 100 TB an UPDATE
    touching one segment rewrites the commits that segment lives in,
    not the table.

    SELF-CHECKS: (a) directories with no matching rows survived BY
    REFERENCE (same manifest entries); (b) a SET that retypes refuses
    and commits nothing; (c) a SET targeting an unknown column refuses
    (UPDATE never evolves schema); (d) a no-match WHERE returns None
    with no empty commit; (e) cdc=True staged pre/post-image rows,
    count-symmetric."""
    import os as _os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import SchemaMismatch, TxnTable

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.expr(
            "CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)"
        ).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_update_")
    try:
        table = TxnTable(work)
        # segment-clustered commits (the natural load layout), so the
        # UPDATE's matches live in a strict subset of directories and
        # the by-reference survival is observable; coalesce keeps NULL
        # segments in a bucket instead of dropping them
        seg_bucket = F.pmod(
            F.xxhash64(F.coalesce(F.col("c_mktsegment"), F.lit("~null~"))),
            F.lit(4),
        )
        # ONE staging job for all four commits (optimization r14,
        # guide §2.4: the previous shape scanned customer once per
        # bucket — 4 sequential write jobs): tag each row with its
        # bucket, repartition on the tag (each bucket lands whole in
        # one task), write once with partitionBy, then publish each
        # leaf as its own commit through the pure-filesystem
        # commit_staged half (row counts from the parquet footers —
        # zero extra jobs). Same four segment-hash commits, same rows.
        import uuid as _uuid

        import pyarrow.parquet as _pq

        staged_root = f"data/{_uuid.uuid4().hex}"
        # (__seg, salt) repartition (ADVICE r14): partitionBy already
        # separates the leaves and commit_staged sums row counts across
        # every footer in a leaf, so a bucket does NOT need to land in
        # one task — the deterministic 8-way salt keeps the staging
        # write parallel at scale instead of funneling each bucket
        # (and any buckets that hash-collide) through a single task.
        salt = F.pmod(F.xxhash64(F.col("c_custkey")), F.lit(8))
        (
            cust.withColumn("__seg", seg_bucket)
            .withColumn("__salt", salt)
            .repartition("__seg", "__salt")
            .drop("__salt")
            .write.partitionBy("__seg")
            .parquet(_os.path.join(work, staged_root))
        )
        schema_json = TxnTable._schema_of(cust)
        for i in range(4):
            leaf = f"{staged_root}/__seg={i}"
            leaf_abs = _os.path.join(work, leaf)
            mode = "overwrite" if i == 0 else "append"
            if not _os.path.isdir(leaf_abs):
                # a bucket with no rows never materialized a leaf (the
                # five TPC-H segments hash to buckets 1-3, so bucket 0
                # is ALWAYS this case): stage a 0-row parquet file of
                # the exact schema on the driver — the same empty
                # commit the old per-bucket Spark write produced, at
                # zero job cost. The arrow schema comes from a staged
                # non-empty leaf's footer (ADVICE r14: the former
                # literal bigint/string/double map would KeyError on
                # any future fixture dtype), so it is the exact schema
                # Spark just wrote, whatever the projection becomes.
                donor = next(
                    _os.path.join(root, f)
                    for root, _dirs, fs in _os.walk(
                        _os.path.join(work, staged_root)
                    )
                    for f in sorted(fs)
                    if f.endswith(".parquet")
                )
                empty = _pq.ParquetFile(donor).schema_arrow.empty_table()
                _os.makedirs(leaf_abs)
                _pq.write_table(
                    empty, _os.path.join(leaf_abs, "part-00000.parquet")
                )
                table.commit_staged(leaf, 0, mode=mode, schema_json=schema_json)
                continue
            n = sum(
                _pq.ParquetFile(_os.path.join(leaf_abs, f)).metadata.num_rows
                for f in _os.listdir(leaf_abs)
                if f.endswith(".parquet")
            )
            table.commit_staged(leaf, n, mode=mode, schema_json=schema_json)
        files_before = table.snapshot()["files"]
        v = table.update(
            spark,
            set={"bal": "CAST(0.0 AS DOUBLE)"},
            where="c_mktsegment = 'BUILDING' AND bal < 0",
            cdc=True,
        )
        snap = table.snapshot()
        # (a) only match-bearing directories rewrote; the rest survive
        # by reference (v is None when the fixture has no negative
        # BUILDING balances at all — then the whole ladder is a no-op
        # and the oracle equality still holds)
        if v is not None:
            surv = set(files_before) & set(snap["files"])
            if not surv or snap.get("op") != "update":
                raise AssertionError("update rewrote every directory")
            # (e) the cdc sidecar is pre/post-symmetric — ONE grouped
            # count job instead of two filtered scans
            cdf = spark.read.parquet(_os.path.join(work, snap["cdc"]))
            by_type = {
                r["_change_type"]: r["count"]
                for r in cdf.groupBy("_change_type").count().collect()
            }
            pre = by_type.get("update_preimage", 0)
            post = by_type.get("update_postimage", 0)
            if pre != post or pre == 0:
                raise AssertionError(f"asymmetric cdc: {pre} pre, {post} post")
        # (b) retyping SET refuses, commits nothing
        try:
            table.update(spark, set={"bal": "'oops'"}, where="bal = 0.0")
            raise AssertionError("retyping SET did not raise")
        except SchemaMismatch:
            pass
        # (c) unknown-column SET refuses
        try:
            table.update(spark, set={"nope": "1"}, where="bal = 0.0")
            raise AssertionError("unknown-column SET did not raise")
        except SchemaMismatch:
            pass
        # (d) no-match WHERE is a no-op returning None
        before = table.latest_version()
        if table.update(spark, set={"bal": "bal"}, where="FALSE") is not None:
            raise AssertionError("no-match update committed")
        if table.latest_version() != before:
            raise AssertionError("no-op update advanced the version")
        result = table.read(spark)
        _record_inner_plan("txn_update_where", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_checkpointed_row_ops",
    # Closed-form final snapshot after a retention DELETE (whose
    # predicate carries a function the prune grammar can't parse — the
    # lenient conjunct does the skipping) and an UPDATE, both executed
    # against a CHECKPOINTED manifest through the streamed commit
    # path. The split threshold is DERIVED identically on both engines
    # (max key // 2), so the oracle is sf-independent.
    oracle="""
    WITH seed AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)
               AS bal
      FROM customer
    ),
    thr AS (SELECT max(c_custkey) // 2 AS t FROM customer)
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'BUILDING' AND bal < 0
                THEN 0.0 ELSE bal END AS bal
    FROM seed, thr
    WHERE NOT (c_custkey >= thr.t AND c_custkey % 10 = 3)
    """,
    tags=("txn", "checkpoint", "delete", "update", "acid"),
)
def txn_checkpointed_row_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 composition query: row-level ops against a manifest
    PAST ``checkpoint_at`` — the shape where the round's streamed
    machinery is load-bearing. ``customer`` lands as 10 key-range
    commits under ``checkpoint_at=8`` (so the table is checkpointed
    well before the ops run); a retention DELETE whose predicate
    carries a function the prune grammar cannot parse
    (``pmod(c_custkey, 10) = 3``) must still prune on its parsable
    range conjunct via the LENIENT parse + batch-iterated checkpoint
    proof; then an UPDATE floors negative BUILDING balances. Both
    commits stream the prior checkpoint (no per-directory dict on the
    driver — trace-pinned in tests/test_txnlog.py); the gated result
    is the table read-back.

    The delete threshold derives from the data (``max(c_custkey) //
    2``) with the identical closed form in the oracle, so the query is
    sf-independent AND the pruning self-check below is guaranteed
    non-vacuous: the low half of the key-range directories provably
    cannot hold victims.

    SELF-CHECKS: (a) the manifest is genuinely checkpointed before and
    after both ops (O(1) stubs with ``files_checkpoint``); (b) the
    streamed probe PRUNED — the candidate list for the delete
    predicate is a strict subset of the directories; (c) untouched
    directories survived both commits BY REFERENCE."""
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.expr(
            "CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)"
        ).alias("bal"),
    )
    mx = cust.agg(F.max("c_custkey")).collect()[0][0]  # 1-row guard
    thr = int(mx) // 2
    work = tempfile.mkdtemp(prefix="ceneton_txn_ckpt_ops_")
    try:
        table = TxnTable(work, stats_cols=("c_custkey",), checkpoint_at=8)
        # Ten disjoint c_custkey-RANGE commits derived from the max
        # key — same per-directory range-stat disjointness the probe
        # below relies on, but each write is a pushed-down range scan
        # instead of an ntile window (whose global sort funnels the
        # table through one partition, once per chunk).
        for i in range(10):
            lo, hi = i * int(mx) // 10, (i + 1) * int(mx) // 10
            # chunk 1 is unbounded below: the synthetic keys start at 0
            pred = F.col("c_custkey") <= hi
            if i > 0:
                pred = (F.col("c_custkey") > lo) & pred
            table.write(
                cust.where(pred), mode="overwrite" if i == 0 else "append"
            )

        def _stub(v):
            with open(table._manifest_path(v)) as fh:
                return _json.load(fh)

        if "files_checkpoint" not in _stub(table.latest_version()):
            raise AssertionError("fixture never crossed checkpoint_at")
        files_before = list(table.snapshot()["files"])
        predicate = f"c_custkey >= {thr} AND pmod(c_custkey, 10) = 3"
        # (b) the lenient conjunct prunes: low-half range directories
        # provably cannot hold victims
        cand = table._probe_candidates_streamed(
            table._stub(table.latest_version()), predicate
        )
        if not (0 < len(cand) < len(files_before)):
            raise AssertionError(
                f"streamed probe did not prune: {len(cand)} of "
                f"{len(files_before)} directories kept"
            )
        v_del = table.delete(spark, predicate)
        # (c) by-reference survival through the streamed DELETE: the
        # low-half key-range directories provably hold no victim and
        # must carry forward untouched (the UPDATE after this may
        # legitimately rewrite everything — BUILDING customers live in
        # every key range)
        if v_del is not None:
            surv = set(files_before) & set(table.snapshot()["files"])
            if not surv:
                raise AssertionError("delete rewrote every directory")
        table.update(
            spark,
            set={"bal": "CAST(0.0 AS DOUBLE)"},
            where="c_mktsegment = 'BUILDING' AND bal < 0",
        )
        final = _stub(table.latest_version())
        if "files_checkpoint" not in final:
            raise AssertionError("row-level commits lost the checkpoint")
        result = table.read(spark).select("c_custkey", "bal")
        _record_inner_plan("txn_checkpointed_row_ops", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_checkpointed_admin_ops",
    # Closed-form final snapshot after the full ADMIN lifecycle on a
    # CHECKPOINTED manifest: rename + drop (metadata-only ALTERs that
    # re-key every directory's stats through the streamed carry), a
    # merge-on-read delete, OPTIMIZE (compaction that materializes the
    # tombstones and GCs the dead dvs list), then RESTORE back to the
    # post-ALTER snapshot — which resurrects the deleted rows by
    # RE-REFERENCING the target's immutable sidecar. Net data effect:
    # identity under the renamed schema.
    oracle="""
    SELECT c_custkey,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)
             AS acct
    FROM customer
    """,
    tags=("txn", "checkpoint", "rename", "optimize", "restore", "acid"),
)
def txn_checkpointed_admin_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 composition query: the ADMIN ops against a manifest
    past ``checkpoint_at`` — the shape where this round's streamed
    machinery (rename/drop cell re-key, optimize pick + carry, O(1)
    restore) is load-bearing. ``customer`` lands as 10 key-range
    commits under ``checkpoint_at=8``; then ``rename_column`` and
    ``drop_column`` commit metadata-only ALTERs (per-directory
    stats/bloom cells re-keyed batch-by-batch in the sidecar carry —
    trace-pinned in tests/test_manifest_checkpoint.py), ``delete_dv``
    tombstones every 7th customer merge-on-read, ``optimize``
    compacts the table (materializing the tombstones and dropping the
    then-dead ``dvs`` sidecar list), and ``restore`` rolls back to
    the post-ALTER snapshot by re-referencing its checkpoint sidecar
    — an O(1) commit that must resurrect the deleted rows exactly.

    SELF-CHECKS: (a) the manifest is checkpointed before any admin op
    and stays checkpointed through all five; (b) metadata counts track
    each transition (full → -victims → -victims → full); (c) optimize
    drops the dead ``dvs`` list; (d) the restore stub RE-REFERENCES
    the ALTER snapshot's sidecar byte-for-byte (no copy); (e) data
    skipping still prunes on the RENAMED column through the re-keyed
    checkpoint."""
    import json as _json
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr(
            "CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)"
        ).alias("bal"),
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_ckpt_admin_")
    try:
        table = TxnTable(
            work, stats_cols=("c_custkey", "bal"), checkpoint_at=8
        )
        # Ten disjoint c_custkey-range commits (cf.
        # txn_checkpointed_row_ops): pushed-down range scans, no
        # single-partition ntile sort.
        mx = cust.agg(F.max("c_custkey")).collect()[0][0]  # 1-row guard
        for i in range(10):
            lo, hi = i * int(mx) // 10, (i + 1) * int(mx) // 10
            # chunk 1 is unbounded below: the synthetic keys start at 0
            pred = F.col("c_custkey") <= hi
            if i > 0:
                pred = (F.col("c_custkey") > lo) & pred
            table.write(
                cust.where(pred), mode="overwrite" if i == 0 else "append"
            )

        def _stub(v):
            with open(table._manifest_path(v)) as fh:
                return _json.load(fh)

        if "files_checkpoint" not in _stub(table.latest_version()):
            raise AssertionError("fixture never crossed checkpoint_at")
        n_full = table.count()
        table.rename_column("bal", "acct")
        v_alter = table.drop_column("c_name")
        alter_stub = _stub(v_alter)
        if "files_checkpoint" not in alter_stub:
            raise AssertionError("metadata ALTERs lost the checkpoint")
        # (e) every directory's stats cell re-keyed bal->acct through
        # the streamed carry patch (c_name never had stats to strip)
        if not all(
            set(c) == {"c_custkey", "acct"}
            for c in table.snapshot(v_alter)["stats"].values()
        ):
            raise AssertionError("ALTERs did not re-key the stats cells")
        # ... and skipping still prunes through the re-keyed checkpoint
        kept, skipped = table.prune(
            [("c_custkey", "=", int(cust.agg(F.min("c_custkey")).first()[0]))]
        )
        if not (len(kept) == 1 and len(skipped) == 9):
            raise AssertionError(
                f"re-keyed checkpoint lost pruning: {len(kept)}/{len(skipped)}"
            )
        v_dv = table.delete_dv(spark, "c_custkey % 7 = 0")
        if v_dv is None or not _stub(v_dv).get("dvs"):
            raise AssertionError("merge-on-read delete recorded no sidecar")
        n_after_dv = table.count()
        if not (n_after_dv < n_full):
            raise AssertionError("tombstones did not shrink the count")
        v_opt = table.optimize(spark)
        if v_opt is None:
            raise AssertionError("optimize found nothing to compact")
        opt_stub = _stub(v_opt)
        if "dvs" in opt_stub:
            raise AssertionError("optimize left a dead dvs sidecar list")
        if table.count() != n_after_dv:
            raise AssertionError("optimize changed the live row count")
        v_res = table.restore(v_alter)
        res_stub = _stub(v_res)
        # (d) O(1) restore: the stub re-references the target's sidecar
        if res_stub.get("files_checkpoint") != alter_stub["files_checkpoint"]:
            raise AssertionError("restore did not re-reference the sidecar")
        if table.count() != n_full:
            raise AssertionError("restore did not resurrect deleted rows")
        result = table.read(spark).select("c_custkey", "acct")
        _record_inner_plan("txn_checkpointed_admin_ops", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_checkpointed_manifest_pruning",
    # Closed-form top-decile probe: the engine computes it through a
    # CHECKPOINTED manifest (per-directory state in a parquet sidecar,
    # O(1) JSON stub) with manifest-level pruning; equality holds only
    # if the checkpoint round-tripped every stats entry and the prune's
    # one-sided proof kept every matching commit.
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue
    FROM orders
    WHERE o_orderkey >= (SELECT min(o_orderkey)
                           + ((max(o_orderkey) - min(o_orderkey) + 1) * 9) // 10
                         FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("txn", "checkpoint", "data-skipping", "scale", "acid"),
)
def txn_checkpointed_manifest_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MANIFEST CHECKPOINTING under load: ``orders`` lands as 12
    key-range commits on a table whose ``checkpoint_at`` threshold is
    8 directories, so the later manifests spill their per-directory
    state (file list, row counts, [min,max] stats) into parquet
    CHECKPOINT sidecars with an O(1) JSON stub — Delta's
    checkpoint.parquet at directory granularity, the piece that keeps
    driver-side manifest work bounded when a 100 TB table accumulates
    millions of commits. The gated read is a top-decile probe THROUGH
    the checkpointed manifest: ``prune()`` streams the sidecar batch
    by batch (never materializing the directory dict) and the scan
    plans over the surviving commits only.

    SELF-CHECKS: (a) the latest manifest on disk is a stub (no inline
    file list) pointing at an existing checkpoint; (b) early
    sub-threshold manifests stayed inline JSON; (c) the probe skipped
    at least 9 of the 12 range commits; (d) ``count()`` stays a
    metadata answer through the checkpoint; (e) ``manifest_df`` scans
    the sidecar with per-directory rows summing to the table count."""
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    mn, mx = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    span = mx - mn + 1
    probe = mn + (span * 9) // 10
    work = tempfile.mkdtemp(prefix="ceneton_txn_ckpt_")
    try:
        table = TxnTable(work, stats_cols=("o_orderkey",), checkpoint_at=8)
        for i in range(12):
            lo = mn + (span * i) // 12
            hi = mn + (span * (i + 1)) // 12
            part = orders.filter(
                (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
            )
            table.write(part, mode="overwrite" if i == 0 else "append")
        latest = table.latest_version()
        with open(table._manifest_path(latest)) as f:
            stub = _json.load(f)
        # (a) O(1) stub + live checkpoint sidecar
        if "files" in stub or "stats" in stub:
            raise AssertionError("large manifest did not spill to checkpoint")
        if not _os.path.exists(
            _os.path.join(table.log_dir, stub["files_checkpoint"])
        ):
            raise AssertionError("checkpoint sidecar missing")
        # (b) sub-threshold manifests stayed inline
        with open(table._manifest_path(0)) as f:
            if "files" not in _json.load(f):
                raise AssertionError("small manifest checkpointed too early")
        # (c) pruning through the checkpoint skips the other ranges
        kept, skipped = table.prune([("o_orderkey", ">=", int(probe))])
        if len(kept) + len(skipped) != 12 or len(skipped) < 9:
            raise AssertionError(
                f"top-decile probe should skip >= 9 of 12 ranges; kept "
                f"{len(kept)}, skipped {len(skipped)}"
            )
        # (d) count() is still a metadata answer
        n_meta = table.count()
        if n_meta is None:
            raise AssertionError("checkpoint lost the row counts")
        # (e) the manifest scans as a DataFrame, rows summing to count
        mdf = table.manifest_df(spark)
        if mdf.agg(F.sum("rows")).first()[0] != n_meta:
            raise AssertionError("manifest_df rows disagree with count()")
        result = (
            table.read_pruned(spark, [("o_orderkey", ">=", int(probe))])
            .where(F.col("o_orderkey") >= probe)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").cast("long").alias("n_orders"),
                F.expr(
                    "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)"
                    " AS DOUBLE)"
                ).alias("revenue"),
            )
        )
        _record_inner_plan("txn_checkpointed_manifest_pruning", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_delete_dv",
    # Closed-form survivor set: equality holds only if the tombstones
    # hit exactly the predicate's rows and reads merge them out.
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal
    FROM customer
    WHERE c_custkey % 97 <> 0
    """,
    tags=("txn", "deletion-vectors", "merge-on-read", "acid"),
)
def txn_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ DELETE (deletion vectors): ``customer`` lands as
    two append commits, then ``delete_dv`` tombstones the ``% 97``
    keys — committing O(deleted rows) sidecar bytes and ZERO data
    rewrites (the manifest's file list is byte-identical). Reads
    anti-join the tombstones out; the pre-delete snapshot still time
    travels with every row. At 100 TB this is the difference between a
    point GDPR delete costing one tiny parquet file and costing a
    directory rewrite (:meth:`delete`'s copy-on-write, which remains
    the right call for bulk predicates).

    SELF-CHECKS what the oracle can't see: (a) no data directory was
    rewritten (file list unchanged across the delete); (b) the
    tombstone accounting matches the deleted row count and ``count()``
    stays an O(manifest) metadata answer; (c) the pre-delete version
    still reads the victims; (d) re-deleting the same predicate
    matches nothing (the probe reads the LIVE view)."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_dv_")
    try:
        table = TxnTable(work)
        table.write(base.filter(F.col("c_custkey") % 2 == 0), mode="overwrite")
        table.write(base.filter(F.col("c_custkey") % 2 == 1), mode="append")
        n_total = table.count()
        files_before = list(table.snapshot()["files"])
        table.delete_dv(spark, "c_custkey % 97 = 0")
        snap = table.snapshot()
        # (a) merge-on-read: zero rewrites
        if snap["files"] != files_before:
            raise AssertionError("delete_dv rewrote data directories")
        # (b) tombstone accounting == deleted rows; count is metadata
        n_deleted = sum(snap["dv_rows"].values())
        if table.count() != n_total - n_deleted:
            raise AssertionError("manifest count drifted from tombstones")
        # (c) time travel still reads the victims
        if table.read(spark, 1).where("c_custkey % 97 = 0").count() != n_deleted:
            raise AssertionError("pre-delete snapshot lost the victims")
        # (d) live probe: nothing left to delete
        if table.delete_dv(spark, "c_custkey % 97 = 0") is not None:
            raise AssertionError("re-delete matched tombstoned rows")
        result = table.read(spark)
        _record_inner_plan("txn_delete_dv", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_batch_source_pruned",
    # Closed-form top-of-range slice: both engines derive the probe the
    # same way (max key - 24), so equality gates the whole pushdown
    # chain — Catalyst filter -> pushFilters -> manifest prune -> scan.
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal
    FROM customer
    WHERE c_custkey >= (SELECT max(c_custkey) FROM customer) - 24
    """,
    tags=("txn", "datasource", "pushdown", "pruning"),
    # benched: the engine's flagship subsystem (txn write + pruned
    # batch-face read) gets a timed leg so a perf regression in the
    # manifest/commit/scan path is visible round-over-round
    bench=True,
)
def txn_batch_source_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE BATCH FACE of the txn table with CATALYST PUSHDOWN:
    ``customer`` lands as one ``write_clustered`` commit (8
    range-disjoint directories with [min, max] key stats), and the
    query is plain ``spark.read.format("txntable")...where(...)`` —
    no hand-built predicate tuples. Catalyst pushes the filter into
    the Python DataSource (``pushFilters``), planning prunes every
    directory whose recorded range cannot match BEFORE the scan
    exists, and Spark re-applies the filter because pruning is a
    one-sided proof (kept ⊇ matching). At 100 TB this is a range
    query reading one commit's worth of files from the main SQL
    surface, not a full-table scan. Pruning rides
    ``.option("pushdown", "true")`` — Spark 4.1 caches ONE partition
    plan per relation unkeyed by pushed filters, so filter-dependent
    planning is only sound for a single-use load(); the option is
    that declaration, and the default never prunes (reuse-proof —
    see ``sources/txn_stream.py:TxnTableBatchReader``).

    SELF-CHECKS what the oracle can't see: (a) the pushed predicate
    plans STRICTLY FEWER input partitions than the unfiltered scan;
    (b) every planned file lives inside a manifest-prune-kept
    directory — pruned directories never enter the scan; (c) the
    schema is derived from the manifest (no DDL passed)."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
        register_txn_source,
    )

    register_txn_source(spark)
    base = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE)").alias(
            "acctbal"
        ),
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_src_")
    try:
        table = TxnTable(work, stats_cols=("c_custkey",))
        table.write_clustered(base, "c_custkey", buckets=8, mode="overwrite")
        # probe derived from the manifest's exact per-directory
        # [min, max] stats (recorded by the clustered load) — the max
        # key is METADATA, no second scan of customer (optimization
        # r14; the oracle derives the identical value from the data)
        probe = (
            max(st["c_custkey"][1] for st in table.snapshot()["stats"].values())
            - 24
        )
        # (c) schema comes from the manifest — no .schema(...) call;
        # pushdown opted in: this load backs exactly one query
        scan = spark.read.format("txntable").option("pushdown", "true").load(work)
        if scan.columns != ["c_custkey", "c_name", "acctbal"]:
            raise AssertionError(f"manifest schema not derived: {scan.columns}")
        result = scan.where(F.col("c_custkey") >= probe)
        # (a)+(b) planner-level proof via the reader the scan uses
        from pyspark.sql.datasource import GreaterThanOrEqual

        reader = TxnTableBatchReader(scan.schema, {"path": work, "pushdown": "true"})
        reader.pushFilters([GreaterThanOrEqual(("c_custkey",), probe)])
        pruned_parts = reader.partitions()
        full_parts = TxnTableBatchReader(scan.schema, {"path": work}).partitions()
        if not (0 < len(pruned_parts) < len(full_parts)):
            raise AssertionError(
                f"pushdown did not prune: {len(pruned_parts)}/{len(full_parts)}"
            )
        kept, _ = table.prune([("c_custkey", ">=", probe)])
        kept_abs = [f"{work}/{rel}" for rel in kept]
        for p in pruned_parts:
            if not any(p.file_path.startswith(k + "/") or p.file_path.startswith(k)
                       for k in kept_abs):
                raise AssertionError(
                    f"pruned-away directory entered the scan: {p.file_path}"
                )
        _record_inner_plan("txn_batch_source_pruned", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_batch_source_where",
    # Closed-form: both engines derive the range probe the same way
    # (max key - 49), and the segment literal rides the option string —
    # equality gates parse -> prune -> executor row filter end to end.
    oracle="""
    SELECT c_custkey, c_mktsegment, c_name
    FROM customer
    WHERE c_custkey >= (SELECT max(c_custkey) FROM customer) - 49
      AND c_mktsegment = 'BUILDING'
    """,
    tags=("txn", "datasource", "where-option", "pruning"),
)
def txn_batch_source_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch face's ``where`` LOAD OPTION — exact, relation-keyed
    skipping: ``customer`` lands as one clustered commit, and the whole
    predicate (range + segment equality) rides
    ``.option("where", ...)`` with NO ``.where()`` on the DataFrame, so
    every returned row proves the option's own row-level filter, not
    Spark's. Because load options are part of the relation identity,
    this spelling is immune to the per-relation readInfo-cache hazard
    that makes ``pushdown`` single-use — the right form for REUSABLE
    DataFrames and for pure SQL
    (``CREATE TEMPORARY VIEW ... USING txntable OPTIONS (...)``).
    At 100 TB: a shared, named view over a petabyte table whose every
    query starts from one commit's worth of files.

    SELF-CHECKS what the oracle can't see: (a) the option plans
    STRICTLY FEWER input partitions than the unfiltered scan; (b) the
    same DataFrame re-counts consistently (reuse safety is the
    feature's whole point)."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
        register_txn_source,
    )

    register_txn_source(spark)
    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_where_")
    try:
        table = TxnTable(work, stats_cols=("c_custkey",))
        table.write_clustered(base, "c_custkey", buckets=8, mode="overwrite")
        probe = base.agg(F.max("c_custkey")).first()[0] - 49  # 1 scalar
        cond = f"c_custkey >= {probe} AND c_mktsegment = 'BUILDING'"
        result = (
            spark.read.format("txntable").option("where", cond).load(work)
        )
        # (a) plan-time pruning through the option alone
        n_opt = len(
            TxnTableBatchReader(
                result.schema, {"path": work, "where": cond}
            ).partitions()
        )
        n_full = len(
            TxnTableBatchReader(result.schema, {"path": work}).partitions()
        )
        if not (0 < n_opt < n_full):
            raise AssertionError(f"where option did not prune: {n_opt}/{n_full}")
        # (b) reuse safety: the same relation answers twice, identically
        if result.count() != result.count():
            raise AssertionError("where-option relation drifted on reuse")
        _record_inner_plan("txn_batch_source_where", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_batch_source_projected",
    # Closed-form: both engines derive the probe the same way (max key
    # - 74) and the projection is exactly the two output columns —
    # equality gates schema-trim -> prune -> row filter end to end.
    oracle="""
    SELECT c_name, c_custkey
    FROM customer
    WHERE c_custkey >= (SELECT max(c_custkey) FROM customer) - 74
    """,
    tags=("txn", "datasource", "projection", "pruning"),
)
def txn_batch_source_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch face's ``columns`` LOAD OPTION — column projection in
    the only place the Python DataSource API allows it: the declared
    schema. ``customer`` (8 columns on disk here) lands as one
    clustered commit, and the scan declares
    ``.option("columns", "c_name,c_custkey")`` — executors open each
    parquet file with ``iter_batches(columns=...)``, so the OTHER six
    columns are never decoded, never shipped through Arrow, never
    seen by Spark. Composed with the ``where`` option, both load
    options are part of the relation identity (reuse-safe), making
    this the production spelling for wide tables: at 100 TB a
    2-column query over a 100-column table pays 2-column I/O.

    SELF-CHECKS what the oracle can't see: (a) the DataFrame's schema
    is exactly the projection, in OPTION order; (b) the Arrow batches
    the reader emits carry ONLY the projected columns; (c) the where
    option still prunes partitions under the trimmed schema."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
        register_txn_source,
    )

    register_txn_source(spark)
    base = _t(spark, sf_dir, "customer")  # all 8 reference columns
    work = tempfile.mkdtemp(prefix="ceneton_txn_proj_")
    try:
        table = TxnTable(work, stats_cols=("c_custkey",))
        table.write_clustered(base, "c_custkey", buckets=8, mode="overwrite")
        probe = base.agg(F.max("c_custkey")).first()[0] - 74  # 1 scalar
        cond = f"c_custkey >= {probe}"
        result = (
            spark.read.format("txntable")
            .option("columns", "c_name,c_custkey")
            .option("where", cond)
            .load(work)
        )
        # (a) schema == projection, option order preserved
        if result.columns != ["c_name", "c_custkey"]:
            raise AssertionError(f"projection not honored: {result.columns}")
        # (b) emitted Arrow batches carry ONLY the projected columns
        opts = {"path": work, "columns": "c_name,c_custkey", "where": cond}
        reader = TxnTableBatchReader(result.schema, opts)
        parts = reader.partitions()
        for batch in reader.read(parts[0]):
            if batch.schema.names != ["c_name", "c_custkey"]:
                raise AssertionError(
                    f"Arrow emit not projected: {batch.schema.names}"
                )
        # (c) the where option still prunes under the trimmed schema
        n_full = len(
            TxnTableBatchReader(
                result.schema, {"path": work, "columns": "c_name,c_custkey"}
            ).partitions()
        )
        if not (0 < len(parts) < n_full):
            raise AssertionError(
                f"projection broke pruning: {len(parts)}/{n_full}"
            )
        _record_inner_plan("txn_batch_source_projected", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)




@register(
    "txn_datasource_write",
    # Closed-form: the full customer relation, written through the
    # DataSource write face in two commits — equality holds only if
    # executor-staged files plus the manifest commit lose nothing,
    # duplicate nothing, and the read face sees exactly one table.
    oracle="""
    SELECT c_custkey, c_mktsegment, c_name
    FROM customer
    """,
    tags=("txn", "datasource", "write", "acid"),
)
def txn_datasource_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE face: ``df.write.format("txntable")`` — executor
    tasks stream Arrow batches straight into one shared staged
    directory (invisible until committed) and the driver-side commit
    worker publishes it through the SAME rebase-loop + atomic link(2)
    protocol as every Python-API commit, so DataSource writes, API
    writes, and streaming-sink writes serialize on one log. The table
    format is now a closed loop through pure ``spark.read`` /
    ``spark.write`` / ``readStream`` — no package import needed to
    use it. At 100 TB the write is one distributed staging pass plus
    an O(1) manifest commit; row counts and [min,max] stats ride the
    task commit messages (``statscols``), so the commit path touches
    zero parquet footers.

    SELF-CHECKS what the oracle can't see: (a) two write-face commits
    plus nothing else -> versions 0..1; (b) the task-observed stats
    let the manifest prune skip a non-matching commit; (c) count()
    answers from the manifest (task-message row counts)."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )

    register_txn_source(spark)
    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_dsw_")
    try:
        path = f"{work}/t"
        half = base.agg((F.max("c_custkey") / 2).cast("long")).first()[0]
        base.filter(F.col("c_custkey") <= half).write.format(
            "txntable"
        ).option("statscols", "c_custkey").mode("append").save(path)
        base.filter(F.col("c_custkey") > half).write.format(
            "txntable"
        ).option("statscols", "c_custkey").mode("append").save(path)
        table = TxnTable(path, stats_cols=("c_custkey",))
        # (a) exactly two commits
        if table.latest_version() != 1:
            raise AssertionError("expected versions 0..1")
        # (b) task-observed stats prune the low commit away
        kept, skipped = table.prune([("c_custkey", ">", half)])
        if not (len(kept) == 1 and len(skipped) == 1):
            raise AssertionError(f"stats did not prune: {kept}/{skipped}")
        # (c) manifest-counted rows match the data
        result = table.read(spark)
        if table.count() != base.count():
            raise AssertionError("manifest count drifted from the data")
        _record_inner_plan("txn_datasource_write", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_null_skipping",
    # Closed-form over the raw table: the failed-extraction shape — a
    # doc with no readable text. On pristine data both engines return
    # zero rows; the hostile perturbed fixture (NULL documents.text)
    # gates real rows through the same path in pytest.
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE text IS NULL
    """,
    tags=("txn", "datasource", "null-stats", "pruning"),
)
def txn_null_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-COUNT DATA SKIPPING: manifest stats record a per-column
    null count ([lo, hi, nulls] — Delta's nullCount at directory
    granularity), so ``WHERE text IS NULL`` — the query that finds
    failed extractions in a 100 TB corpus — skips every directory
    provably free of nulls BEFORE the scan is planned, straight
    through ``spark.read.format("txntable").option("where", "text IS
    NULL")``, composed with column projection so the (possibly huge)
    text column itself is never read.

    SELF-CHECKS what the oracle can't see: (a) the planner keeps
    EXACTLY the directories whose recorded null count is non-zero;
    (b) the result matches an unskipped scan filtered the plain way."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        TxnTableBatchReader,
        register_txn_source,
    )

    import os

    register_txn_source(spark)
    base = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    work = tempfile.mkdtemp(prefix="ceneton_txn_nulls_")
    try:
        table = TxnTable(work, stats_cols=("text",))
        # two ingest commits (parity split — where NULL-text docs land
        # is the data's business, not the query's)
        table.write(base.filter(F.col("doc_id") % 2 == 0), mode="overwrite")
        table.write(base.filter(F.col("doc_id") % 2 == 1), mode="append")
        result = (
            spark.read.format("txntable")
            .option("columns", "doc_id,lang")
            .option("where", "text IS NULL")
            .load(work)
        )
        # (a) kept == exactly the directories recording nulls > 0
        snap = table.snapshot()
        nullful = {
            d
            for d, s in snap.get("stats", {}).items()
            if "text" in s and len(s["text"]) > 2 and s["text"][2] > 0
        }
        opts = {
            "path": work,
            "columns": "doc_id,lang",
            "where": "text IS NULL",
        }
        planned = {
            os.path.relpath(os.path.dirname(p.file_path), work)
            for p in TxnTableBatchReader(result.schema, opts).partitions()
        }
        if planned != nullful:
            raise AssertionError(
                f"null-count skip is wrong: planned {planned} vs "
                f"null-bearing {nullful}"
            )
        # (b) exactness against the unskipped scan
        expect = sorted(
            (r.doc_id, r.lang)
            for r in table.read(spark)
            .where("text IS NULL")
            .select("doc_id", "lang")
            .collect()
        )
        got = sorted((r.doc_id, r.lang) for r in result.collect())
        if got != expect:
            raise AssertionError(f"skipped scan diverged: {got} vs {expect}")
        _record_inner_plan("txn_null_skipping", result)
        return spark.createDataFrame(got, schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "txn_datasource_write_partitioned",
    # Closed-form: customers outside the dropped segment — equality
    # holds only if the face's partitioned staging recorded EXACT
    # per-leaf values (the drop's two-sided proof) and lost/duplicated
    # nothing across the partition split. IS DISTINCT FROM, not <>:
    # a NULL partition never satisfies the drop's '=' conjunct (SQL
    # semantics, documented on drop_partitions), so NULL-segment rows
    # SURVIVE the drop and the oracle must keep them too.
    oracle="""
    SELECT c_custkey, c_mktsegment, c_name
    FROM customer
    WHERE c_mktsegment IS DISTINCT FROM 'BUILDING'
    """,
    tags=("txn", "datasource", "write", "partitioned"),
)
def txn_datasource_write_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITIONED layout from the pure Spark API:
    ``df.write.format("txntable").option("partitionby", ...)`` stages
    one leaf directory per distinct partition tuple — executor tasks
    split their Arrow batches by exact value, the driver assembles
    leaves and commits ``parts``/rows/stats in one manifest — and then
    ``drop_partitions`` deletes a whole segment as a METADATA-ONLY
    commit, zero bytes read or rewritten (Delta's partition-delete
    fast path, reachable without importing the package for the
    write). At 100 TB: retention deletes on a face-written table are
    O(manifest).

    SELF-CHECKS what the oracle can't see: (a) the manifest records
    one leaf per segment with its exact value; (b) the drop commits
    without reading data (op == 'drop_partitions'); (c) partition
    pruning keeps exactly one leaf per segment equality; (d) counts
    stay metadata answers."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.operators.scale import _record_inner_plan
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )

    register_txn_source(spark)
    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )
    work = tempfile.mkdtemp(prefix="ceneton_txn_dswp_")
    try:
        path = f"{work}/t"
        base.write.format("txntable").option(
            "partitionby", "c_mktsegment"
        ).option("statscols", "c_custkey").mode("overwrite").save(path)
        table = TxnTable(path)
        snap = table.snapshot()
        segs = {v["c_mktsegment"] for v in snap["parts"].values()}
        n_segs = base.select("c_mktsegment").distinct().count()
        # (a) one exact-valued leaf per segment
        if len(snap["parts"]) != n_segs or len(segs) != n_segs:
            raise AssertionError(f"leaf/segment mismatch: {snap['parts']}")
        # (d) the count is a manifest answer that matches the data
        if table.count() != base.count():
            raise AssertionError("manifest count drifted from the data")
        # (c) equality on the partition column keeps exactly one leaf
        kept, skipped = table.prune([("c_mktsegment", "=", "BUILDING")])
        if not (len(kept) == 1 and len(skipped) == n_segs - 1):
            raise AssertionError(f"partition prune failed: {kept}")
        # (b) metadata-only drop: no new data directory appears
        dirs_before = set(snap["files"])
        v = table.drop_partitions([("c_mktsegment", "=", "BUILDING")])
        after = table.snapshot()
        if (
            v is None
            or after.get("op") != "drop_partitions"
            or not set(after["files"]) < dirs_before
        ):
            raise AssertionError("drop was not a metadata-only commit")
        result = table.read(spark)
        _record_inner_plan("txn_datasource_write_partitioned", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# SQL surface (spark.sql over registered views)
# ---------------------------------------------------------------------------

_SQL_SURFACE = """
WITH seg_orders AS (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM {orders} o JOIN {customer} c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, o_orderkey,
       CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE) AS totalprice,
       CAST(rn AS BIGINT)     AS rank
FROM seg_orders
WHERE rn <= 3
"""


@register(
    "sql_surface_cte",
    oracle=_SQL_SURFACE.format(orders="orders", customer="customer"),
    tags=("sql", "window", "join"),
)
def sql_surface_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared SQL-text surface: the ENTIRE query is one
    ``spark.sql`` string (CTE + join + window + QUALIFY-style filter)
    over views registered by the catalog — same text modulo view names
    runs on DuckDB as the oracle. Catalyst parses, optimizes, and
    plans it identically to the DataFrame formulations elsewhere."""
    from ceneton_database_tools_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_SQL_SURFACE.format(orders="orders", customer="customer"))


_SQL_EXISTS = """
SELECT c.c_custkey, c.c_name
FROM {customer} c
WHERE EXISTS (
    SELECT 1 FROM {orders} o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT'
)
AND NOT EXISTS (
    SELECT 1 FROM {orders} o2
    WHERE o2.o_custkey = c.c_custkey
      AND o2.o_orderstatus = 'F'
)
"""


@register(
    "sql_exists_correlated",
    oracle=_SQL_EXISTS.format(orders="orders", customer="customer"),
    tags=("sql", "subquery", "exists"),
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries as one ``spark.sql``
    text (same string runs on DuckDB): Catalyst decorrelates them into
    a LEFT SEMI and a LEFT ANTI join — the plan the hand-built
    ``join_semi``/``join_anti`` entries pin — so the declarative
    subquery spelling costs exactly the joins it means. At 100 TB both
    sides shuffle on the correlation key once; AQE broadcasts a small
    filtered inner side."""
    from ceneton_database_tools_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_SQL_EXISTS.format(orders="orders", customer="customer"))


_SQL_LATERAL = """
SELECT s.c_mktsegment,
       t.o_orderkey,
       CAST(round(CAST(t.o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)
           AS price
FROM (SELECT DISTINCT c_mktsegment FROM {customer}) s,
LATERAL (
    SELECT o.o_orderkey, o.o_totalprice
    FROM {orders} o
    JOIN {customer} c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = s.c_mktsegment
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 2
) t
"""


@register(
    "sql_lateral_topk",
    oracle=_SQL_LATERAL.format(orders="orders", customer="customer"),
    tags=("sql", "lateral", "topk"),
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A correlated LATERAL derived table with ORDER BY + LIMIT — the
    per-group top-k spelling SQL users reach for — as one
    ``spark.sql`` text that runs verbatim on DuckDB. Catalyst
    decorrelates the lateral into a ranked window under the hood, so
    the declarative form plans like the explicit
    ``window_rank``-style top-k; ties break on the unique order key
    (the repo-wide determinism rule)."""
    from ceneton_database_tools_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_SQL_LATERAL.format(orders="orders", customer="customer"))


# ---------------------------------------------------------------------------
# Observed metrics (A6: count/progress scan, engine-native form)
# ---------------------------------------------------------------------------


def count_with_observe(df: DataFrame, declared_count: int | None = None):
    """The reference's `print` command (count + progress + header-count
    check, ``_cli.py:56-68``) in Spark's native form: an ``observe()``
    metric rides the scan — one pass collects the row count and any
    per-column stats WITHOUT a second job, and the driver compares the
    observed count against the header's declared count (A14).

    Returns ``(count, observed_metrics_row)``.
    """
    from pyspark.sql import Observation

    obs = Observation("scan_stats")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    n = observed.count()
    metrics = obs.get
    if declared_count is not None and metrics["n_rows"] != declared_count:
        import logging

        logging.getLogger(__name__).warning(
            "parsed %s records, header declared %s", metrics["n_rows"], declared_count
        )
    return n, metrics


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas surface
# ---------------------------------------------------------------------------


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map worker: z-score one event_type group.

    Mean/std are derived from EXACT integer-cent sums (value has 2
    decimals, so round(value*100) is an integer and int64 sums are
    order-independent), then combined in one fixed float expression —
    bit-identical to the oracle's window formulation regardless of the
    row order Arrow hands the group in. pandas .mean()/.std() would be
    pairwise-summed in arrival order and drift in the last ulp.
    """
    import math

    import numpy as np

    # half-AWAY-from-zero quantization to match both engines'
    # round(value * 100): pandas .round() is half-to-even, which
    # diverges on any exactly-representable half (e.g. 1.125 * 100)
    # the moment the generator emits a 3-decimal grid.
    # NULL ticks (NaN here) carry no signal: they train neither sums
    # nor the count — astype(int64) of NaN is silent platform garbage
    # that would poison the whole group — and their own z stays NULL
    # through (value - mu) below; the oracle says the same via
    # count(xi) and NULL arithmetic.
    vals = pdf["value"].to_numpy()
    ok = ~np.isnan(vals)
    v100 = vals[ok] * 100
    # NaN-free after the mask, so the int64 cast is exact and the
    # sums stay order-independent integer arithmetic
    xi = (np.sign(v100) * np.floor(np.abs(v100) + 0.5)).astype("int64")
    s = int(xi.sum())
    ss = int((xi * xi).sum())
    n = int(ok.sum())
    out = pdf[["event_id", "event_type"]].copy()
    if n < 2:
        # degenerate group (all-NULL, single row): z is NULL, matching
        # the oracle's CASE guard on both engines — and n == 0 must be
        # answered here, before mu's division by n
        out["z"] = None
        return out
    mu = s / (100.0 * n)
    var = (ss / 10000.0 - n * mu * mu) / (n - 1)
    if var <= 0.0:
        # constant values: z is NULL, same CASE guard
        out["z"] = None
        return out
    sd = math.sqrt(var)
    # rounding happens Spark-side (F.round, HALF_UP — the repo-wide
    # pairing with DuckDB round); pandas .round is half-even and would
    # be the one divergent rounding in the repo
    out["z"] = (pdf["value"] - mu) / sd
    return out


@register(
    "udf_grouped_zscore",
    oracle="""
    WITH x AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 100) AS BIGINT) AS xi
      FROM events
    ),
    s AS (
      SELECT event_id, event_type, value,
             sum(xi)      OVER (PARTITION BY event_type) AS sx,
             sum(xi * xi) OVER (PARTITION BY event_type) AS sxx,
             -- count(xi), not count(*): a NULL-value event carries no
             -- signal, so it neither trains the group stats nor counts
             -- in the denominator (its own z is NULL via value - mu)
             count(xi)    OVER (PARTITION BY event_type) AS n
      FROM x
    )
    SELECT event_id,
           event_type,
           CASE WHEN n >= 2
                 AND (sxx / 10000.0
                      - n * (sx / (100.0 * n)) * (sx / (100.0 * n))) / (n - 1) > 0
                THEN round((value - sx / (100.0 * n))
                           / sqrt((sxx / 10000.0
                                   - n * (sx / (100.0 * n)) * (sx / (100.0 * n)))
                                  / (n - 1)), 4)
                ELSE NULL END AS z
    FROM s
    WHERE event_id < 2000
    """,
    tags=("udf", "grouped-map"),
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` surface: z-score normalization per
    event_type, each group handed to Python as one Arrow batch. The
    oracle replays the identical semantics as SQL window aggregates, so
    the gate proves the grouped-map path computes exactly what the
    declarative form does.

    Scale shape: ``applyInPandas`` shuffles each whole group to one
    worker — fine for bounded per-group cardinality, and exactly the
    constraint to design around at 100 TB (a hot group must fit in
    worker memory; the declarative window formulation in the oracle is
    the unbounded-scale alternative, and this entry exists to gate the
    grouped-map Arrow plumbing itself).
    """
    ev = _t(spark, sf_dir, "events")
    normalized = ev.groupBy("event_type").applyInPandas(
        _zscore_group, schema="event_id long, event_type string, z double"
    )
    return normalized.where(F.col("event_id") < 2000).select(
        "event_id", "event_type", F.round("z", 4).alias("z")
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

# Identical text runs on both engines: the implicit supplier hierarchy
# is the binary-heap shape (children of k are 2k+1, 2k+2 — pure
# multiplication, deliberately no integer division: Spark's `div`
# truncates toward zero while DuckDB's `//` floors, which would
# diverge at the root).
_RECURSIVE_SQL = """
    WITH RECURSIVE tree(k, depth) AS (
      SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey = 0
      UNION ALL
      SELECT s.s_suppkey, t.depth + 1
      FROM supplier s JOIN tree t
        ON s.s_suppkey = 2 * t.k + 1 OR s.s_suppkey = 2 * t.k + 2
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_members,
           min(k)                   AS min_key,
           max(k)                   AS max_key,
           CAST(sum(k) AS BIGINT)   AS key_sum
    FROM tree
    GROUP BY depth
"""


@register(
    "sql_recursive_cte",
    oracle=_RECURSIVE_SQL,
    tags=("sql", "recursive", "iterative"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): walk the implicit
    binary-heap hierarchy over supplier keys from the root and report
    per-depth membership — the org-chart / bill-of-materials traversal
    as ONE SQL string, character-identical on both engines.

    Spark executes the recursion as an iterative union (each level one
    distributed join against the previous frontier), conceptually the
    same loop dedup_clusters hand-rolls — here the engine owns the
    iteration, termination, and plan reuse. Depth is O(log n) for this
    hierarchy, so the recursion terminates in ~7 rounds at any SF.
    """
    from ceneton_database_tools_spark.catalog import register_views

    register_views(spark, sf_dir, ("supplier",))
    return spark.sql(_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# Round 5: warehouse-maintenance shapes — SCD2 history build and
# incremental materialized-view refresh
# ---------------------------------------------------------------------------


@register(
    "scd2_dimension_build",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
             AS valid_to,
           CAST(CASE WHEN lead(valid_from) OVER (
                  PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL
                THEN 1 ELSE 0 END AS INT) AS is_current,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
                AS BIGINT) AS version
    FROM changes
    """,
    tags=("warehouse", "scd2", "window"),
)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build from a change
    log: collapse each user's event stream into validity intervals —
    one row per *change* of ``event_type``, with ``valid_from`` /
    ``valid_to`` half-open bounds, an ``is_current`` flag on the open
    interval, and a per-user ``version`` counter. The standard
    dimension-table construction every warehouse load runs; the
    reference has no temporal surface at all.

    Scale shape: two window passes, both partitioned BY USER — one
    shuffle on user_id, then every lag/lead/row_number runs within a
    user's partition slice (no global ordering anywhere; the tie-break
    on the unique event_id makes the change detection deterministic).
    The changes filter between the passes shrinks the second input to
    the number of actual transitions. At 100 TB this is the
    partitioned-window shape that scales linearly with users.
    """
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w_log = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_log))
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    )
    # same unique tie-break as the first pass: two change rows CAN share
    # a valid_from (same-ts events of different types), and lead/
    # row_number over the bare timestamp would be nondeterministic there
    w_hist = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(w_hist)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("int").alias("is_current"),
        F.row_number().over(w_hist).cast("long").alias("version"),
    )


_MV_CUTOFF = "1999-01-01"


@register(
    "mv_incremental_refresh",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("warehouse", "incremental", "aggregation"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: an aggregate MV over
    orders is maintained as mergeable partials — the historical
    partial (orders before the cutoff, computed once and reused) plus
    a delta partial over only the new data, merged by re-aggregating
    (counts add, DECIMAL sums add). The oracle is the full
    re-aggregation over all orders, proving partial-merge == full
    recompute — the invariant that lets a 100 TB pipeline refresh a
    daily rollup by scanning one day, not the whole fact table.

    Scale shape: each partial is a map-side-combined hash aggregate
    over its date slice (at scale, date-partitioned parquet prunes the
    delta scan to the new partitions); the merge re-aggregates
    |priorities| × 2 partial rows. DECIMAL partials make the merge
    exact — mergeability would NOT hold for e.g. raw double sums
    (order-dependent) or non-algebraic aggregates (median needs a
    sketch, cf. agg_percentiles).
    """
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit(_MV_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("price_sum"),
        )

    base = partial(orders.where(F.col("o_orderdate") < cutoff))
    delta = partial(orders.where(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.round(F.sum("price_sum"), 2).cast("double").alias("total_price"),
        )
    )
