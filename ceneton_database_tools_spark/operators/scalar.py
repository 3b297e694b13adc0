"""Scalar function families (SURVEY.md §2 Part B: string/date/math/json).

The reference's only scalar computation is whole-row ``json.dumps``
(`_cli.py:82`), metadata-name sanitization (`fmp_reader.py:56-61`) and
a whole-file sha256 (`_cli.py:148`); the general scalar surface comes
from ``pyspark.sql.functions``. Each query below exercises one family
with a DuckDB-portable formulation (identical semantics both sides —
e.g. explicit character classes instead of engine-specific ``\\w``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators import _textutil as T
from ceneton_database_tools_spark.operators.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT
      p_partkey,
      upper(p_name)                              AS name_upper,
      lower(p_brand)                             AS brand_lower,
      substr(p_type, 1, 5)                       AS type_prefix,
      length(p_name)                             AS name_len,
      concat(p_brand, ':', p_type)               AS brand_type,
      trim(p_name)                               AS name_trim,
      lpad(CAST(p_size AS VARCHAR), 4, '0')      AS size_padded,
      replace(p_name, ' ', '_')                  AS name_snake,
      regexp_extract(p_name, '([a-z]+)', 1)      AS first_word,
      contains(p_name, 'a')                      AS has_a,
      split_part(p_type, ' ', 1)                 AS type_word1
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, substring, pad, regexp, split."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.col("p_name").contains("a").alias("has_a"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_word1"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      year(o_orderdate)                             AS order_year,
      month(o_orderdate)                            AS order_month,
      day(o_orderdate)                              AS order_day,
      quarter(o_orderdate)                          AS order_quarter,
      dayofweek(o_orderdate)                        AS order_dow,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      CAST(o_orderdate + INTERVAL 90 DAY AS DATE)   AS due_date,
      datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
      strftime(o_orderdate, '%Y-%m')                AS year_month
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family: extract, trunc, arithmetic, format.

    Note: DuckDB ``dayofweek`` is 0=Sunday..6; Spark ``dayofweek`` is
    1=Sunday..7 — normalized by subtracting 1 on the Spark side.
    """
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


@register(
    "scalar_math_case",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(CASE WHEN (abs(l_discount - 0.05)) < 0 THEN -floor(-(abs(l_discount - 0.05)) * 1000000 + 0.5) ELSE  floor( (abs(l_discount - 0.05)) * 1000000 + 0.5) END AS DOUBLE) / 1000000 AS disc_dev,
      CAST(ceil(l_quantity / 10.0) AS BIGINT)      AS qty_bucket,
      CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_kbucket,
      l_linenumber % 3                             AS line_mod,
      CAST(CASE WHEN (sqrt(l_extendedprice)) < 0 THEN -floor(-(sqrt(l_extendedprice)) * 1000000 + 0.5) ELSE  floor( (sqrt(l_extendedprice)) * 1000000 + 0.5) END AS DOUBLE) / 1000000 AS price_sqrt,
      CAST(CASE WHEN (ln(l_extendedprice)) < 0 THEN -floor(-(ln(l_extendedprice)) * 1000000 + 0.5) ELSE  floor( (ln(l_extendedprice)) * 1000000 + 0.5) END AS DOUBLE) / 1000000 AS price_ln,
      CAST(CASE WHEN (power(1 + l_tax, 2)) < 0 THEN -floor(-(power(1 + l_tax, 2)) * 1000000 + 0.5) ELSE  floor( (power(1 + l_tax, 2)) * 1000000 + 0.5) END AS DOUBLE) / 1000000 AS tax_sq,
      CASE
        WHEN l_quantity >= 40 THEN 'bulk'
        WHEN l_quantity >= 10 THEN 'mid'
        ELSE 'small'
      END                                          AS qty_class,
      greatest(l_tax, l_discount)                  AS max_rate,
      least(l_tax, l_discount)                     AS min_rate,
      CAST(sign(l_discount - l_tax) AS INTEGER)    AS disc_vs_tax
    FROM lineitem
    """,
    tags=("scalar", "math", "case"),
)
def scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional family: abs/ceil/floor/mod/sqrt/ln/power,
    CASE WHEN, greatest/least/sign."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        T.quantize_col(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 10.0).cast("bigint").alias("qty_bucket"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_kbucket"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        T.quantize_col(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        T.quantize_col(F.log("l_extendedprice"), 6).alias("price_ln"),
        T.quantize_col(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_class"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_discount") - F.col("l_tax")).cast("int").alias("disc_vs_tax"),
    )


@register(
    "scalar_json_extract",
    # json_valid guard: DuckDB's json functions ERROR on malformed
    # JSON where Spark's get_json_object returns NULL — a single
    # corrupt props row must degrade to NULL on both engines, not kill
    # the oracle.
    oracle="""
    SELECT
      event_id,
      event_type,
      CAST(CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS BIGINT) AS prop_k,
      CAST(CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS BIGINT) % 10 AS k_mod10
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props string column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        "event_type",
        k.alias("prop_k"),
        (k % 10).alias("k_mod10"),
    )


@register(
    "scalar_hash_funcs",
    oracle="""
    SELECT
      c_custkey,
      md5(c_name)                          AS name_md5,
      sha256(c_mktsegment)                 AS segment_sha256
    FROM customer
    """,
    tags=("scalar", "hash"),
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family (row-level analogue of the
    reference's whole-file sha256, `_cli.py:146-150`)."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_mktsegment"), 256).alias("segment_sha256"),
    )


@register(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT
      p_partkey,
      p_partkey & 255                       AS low_byte,
      p_partkey | 4096                      AS with_flag,
      xor(p_partkey, p_size)                AS key_xor_size,
      p_partkey << 2                        AS shifted,
      CAST(bit_count(p_partkey) AS BIGINT)  AS popcount
    FROM part
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (AND/OR/XOR/shift/popcount) — exact integer
    semantics, identical on both engines; the building blocks the
    SimHash/sign-LSH operators use in anger."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr("p_partkey & 255").alias("low_byte"),
        F.expr("p_partkey | 4096").alias("with_flag"),
        F.expr("p_partkey ^ p_size").alias("key_xor_size"),
        F.expr("shiftleft(p_partkey, 2)").alias("shifted"),
        F.expr("bit_count(p_partkey)").cast("long").alias("popcount"),
    )


@register(
    "scalar_string_distance",
    oracle="""
    SELECT
      p_partkey,
      CAST(levenshtein(p_brand, p_type) AS BIGINT)        AS brand_type_dist,
      CAST(levenshtein(p_name, p_brand) AS BIGINT)        AS name_brand_dist,
      CAST(position('AND' in upper(p_type)) AS BIGINT)    AS and_pos,
      p_brand = p_type                                    AS exact_equal
    FROM part
    """,
    tags=("scalar", "string", "similarity"),
)
def scalar_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance family: Levenshtein edit distance (exact DP —
    deterministic, unlike float similarity scores) plus substring
    position — the row-level fuzzy-matching primitives under entity
    resolution. Per-row JVM work, no shuffle; at 100 TB the pair
    SELECTION must come from a blocked candidate join (see
    dedup_ngram_jaccard), never an all-pairs distance matrix."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.levenshtein("p_name", "p_brand").cast("long").alias("name_brand_dist"),
        F.expr("position('AND' in upper(p_type))").cast("long").alias("and_pos"),
        (F.col("p_brand") == F.col("p_type")).alias("exact_equal"),
    )


@register(
    "scalar_variant_funcs",
    # The oracle reconstructs Spark's canonical VARIANT outputs from
    # plain JSON functions: props is always a single-key object
    # {"k": N}, so to_json(parse_json(props)) is exactly '{"k":' || k
    # || '}' and schema_of_variant is the constant 'OBJECT<k: BIGINT>'
    # for every row — the oracle thereby VERIFIES Spark infers that
    # schema and canonicalizes that round-trip on every single row.
    # json_valid guards mirror Spark's try_parse_json: a malformed
    # props row yields a NULL variant, so every derived column is NULL
    # (missing_is_null stays TRUE: extracting from NULL is NULL on
    # both engines). Valid props keep the generator's {"k": N} shape
    # contract the vschema/vjson reconstruction documents above.
    oracle="""
    SELECT
      event_id,
      CAST(CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS BIGINT) AS prop_k,
      CASE WHEN json_valid(props)
           THEN json_extract_string(props, '$.missing') IS NULL
           ELSE TRUE END                                 AS missing_is_null,
      CASE WHEN json_valid(props)
           THEN 'OBJECT<k: BIGINT>' END                  AS vschema,
      CASE WHEN json_valid(props)
           THEN '{"k":' || json_extract_string(props, '$.k') || '}' END AS vjson
    FROM events
    """,
    tags=("scalar", "json", "variant"),
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT: ``parse_json`` the semi-structured props column
    into the binary VARIANT type, then typed path extraction
    (``variant_get`` with a target type), missing-path NULL semantics,
    per-row schema inference (``schema_of_variant``), and the
    canonical ``to_json`` round-trip. VARIANT is the 100 TB answer to
    ragged JSON columns: one binary-encoded column, no schema
    unification pass, typed extraction pushed into the scan stage.
    """
    ev = _t(spark, sf_dir, "events")
    # try_parse_json, not parse_json: one corrupt props row must
    # degrade to a NULL variant (NULL everything downstream), not
    # abort the whole scan with MALFORMED_RECORD_IN_PARSING
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.expr("variant_get(try_parse_json(props), '$.k', 'bigint')").alias("prop_k"),
        F.expr(
            "variant_get(try_parse_json(props), '$.missing', 'string') IS NULL"
        ).alias("missing_is_null"),
        F.schema_of_variant(v).alias("vschema"),
        F.to_json(v).alias("vjson"),
    )
