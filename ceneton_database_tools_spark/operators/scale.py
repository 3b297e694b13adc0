"""Scale-pattern operators: the formulations that change at 100 TB.

Each query here is the declared scale variant of a pattern that is
correct-but-expensive in its naive form:

* **approximate distinct counting** — ``approx_count_distinct`` (HLL++)
  instead of the exact expand-based ``countDistinct``: constant memory
  per group at any cardinality. HLL sketches are engine-specific, so
  the gate is a pytest error-bound check, not a DuckDB hash match.
* **salted two-stage aggregation** — pre-aggregate on
  ``(key, salt)`` then re-aggregate on ``key``: bounds the per-task
  load of a skewed hot key. Result is identical to the direct
  aggregation, which is exactly what the oracle verifies.
* **exact percentiles** — ``percentile`` (exact, interpolated) matches
  DuckDB's ``quantile_cont`` definition; the sketch-based
  ``approx_percentile`` is the >memory-scale swap (same shape,
  engine-specific sketch — documented, not gated).
* **TF-IDF** — pure-SQL term weighting over the token stream: two
  hash aggregations (term-per-doc, doc-frequency) + a broadcast-sized
  IDF table joined back onto terms. The ML-pipeline equivalent is
  ``HashingTF + IDF``; the SQL form is exact and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators import _textutil as T
from ceneton_database_tools_spark.operators.registry import register

TFIDF_TOP_K = 5
TFIDF_DOCS = 50


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "agg_approx_distinct",
    # HLL sketch VALUES are engine-specific (DuckDB's approx sketch
    # differs from Spark's HLL++), so the gateable form asserts the
    # sketch's error BOUND instead: exact distinct count + a boolean
    # that the HLL estimate landed within max(10% relative, 5 abs) of
    # it. rsd=0.02 makes a 10%/5 excursion a many-sigma event, so the
    # row is deterministically TRUE on both engines unless the sketch
    # genuinely regresses — which is exactly what a gate should catch.
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)                AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE                                    AS approx_within_bound
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "approx", "scale"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via HLL++
    (``approx_count_distinct``, rsd 2%) — the declared 100 TB variant
    of ``events_tumbling_window``'s exact ``countDistinct``, which
    plans an expand + full shuffle of the distinct pairs. The sketch
    aggregates in constant memory and merges map-side.

    The gated form computes BOTH the exact count and the sketch purely
    to prove the error bound cross-engine; the production 100 TB shape
    (sketch only, no expand) is :func:`agg_approx_distinct_raw`, whose
    values pytest checks against the same bound."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "n_events",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.greatest(F.col("exact_users") * 0.10, F.lit(5.0))
            ).alias("approx_within_bound"),
        )
    )


def agg_approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure HLL-only aggregation — constant memory per group, no
    expand, no exact pass: what a 100 TB pipeline actually runs.
    Engine-specific values → pytest-bounded, not oracle-gated."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "agg_salted_two_stage",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "skew", "scale"),
)
def agg_salted_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation: stage 1 aggregates on
    ``(event_type, salt)`` (splits any hot key across 16 reducers),
    stage 2 merges the partials per key. Identical result to the
    direct group-by — the oracle proves it — at the cost of one extra
    tiny shuffle; the pattern that keeps a skewed 100 TB key from
    serializing into one task. (AQE skew handling covers joins; salting
    is the aggregation-side counterpart.) Salt uses a hash of a unique
    column, not rand(), so the plan stays deterministic."""
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    # DECIMAL partials merge exactly across salt buckets (double
    # partials would make the two-stage sum order-dependent in the
    # last ulp — the float-discipline idiom, applied per stage)
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.expr("sum(CAST(value AS DECIMAL(18,6)))").alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.expr("CAST(round(sum(pv), 2) AS DOUBLE)").alias("total"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT
      c_mktsegment,
      round(quantile_cont(c_acctbal, 0.5), 4)  AS p50,
      round(quantile_cont(c_acctbal, 0.9), 4)  AS p90,
      round(quantile_cont(c_acctbal, 0.99), 4) AS p99
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "percentile", "scale"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``: linear interpolation over the sorted group).
    Exact percentile sorts each group; past executor memory the
    declared swap is ``approx_percentile`` (KLL/GK sketch — constant
    memory, engine-specific values, same query shape)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(c_acctbal, 0.99)"), 4).alias("p99"),
    )


@register(
    "scale_hash_split",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, n_chars,
             CASE WHEN {T.duck_md5_mod("CAST(doc_id AS VARCHAR)", 100, hex_digits=8)} < 90
                  THEN 'train' ELSE 'holdout' END AS split
      FROM documents
    )
    SELECT split,
           count(*)                AS n_docs,
           CAST(floor(CAST(sum(n_chars) AS DOUBLE) * 100 / count(*) + 0.5)
                AS DOUBLE) / 100   AS avg_chars,
           min(doc_id)             AS min_doc_id
    FROM tagged
    GROUP BY split
    """,
    tags=("sample", "split", "scale", "llm-pipeline"),
)
def scale_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/holdout split via content hashing — the
    reproducible-sampling pattern a training pipeline needs instead of
    ``rand()``/``sample()`` (whose assignment changes with partitioning,
    retries, and engine): a document's split is a pure function of its
    id (first 32 md5 bits mod 100), so reruns, backfills, and a DuckDB
    oracle all agree row-for-row. Map-side only; the aggregate here just
    summarizes the two buckets. The same predicate works as a
    WHERE-clause sampler at any rate (``< 10`` → 10% sample).
    """
    docs = _t(spark, sf_dir, "documents")
    bucket = F.expr(T.spark_md5_mod("CAST(doc_id AS STRING)", 100, hex_digits=8))
    return (
        docs.withColumn(
            "split", F.when(bucket < 90, F.lit("train")).otherwise(F.lit("holdout"))
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr(
                "CAST(floor(CAST(sum(n_chars) AS DOUBLE) * 100 / count(*) + 0.5)"
                " AS DOUBLE) / 100"
            ).alias("avg_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({T.DUCK_TOKENS}) AS token
      FROM documents WHERE doc_id < {TFIDF_DOCS}
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, count(DISTINCT doc_id) AS dfreq FROM toks GROUP BY token
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(n.n_docs / df.dfreq), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf,
           CAST(row_number() OVER (
             PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token)
            <= {TFIDF_TOP_K}
    """,
    tags=("text", "tfidf", "llm-pipeline", "scale"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF, pure SQL: term frequency per doc, document
    frequency per term, idf = ln(N/df), top-5 terms per document.

    Scale shape: two partial-aggregated shuffles over the token
    stream. The (token → idf) table grows with the corpus vocabulary,
    so it carries NO broadcast hint — AQE broadcasts it while small and
    falls back to a shuffle join at web-corpus vocabulary sizes. The
    single-row n_docs aggregate is always broadcast-safe. The
    ``HashingTF + IDF`` ML pipeline is the fixed-width-vector
    alternative when downstream wants features, not rankings."""
    toks = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < TFIDF_DOCS)
        .select("doc_id", F.explode(F.expr(T.SPARK_TOKENS)).alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("dfreq"))
    n_docs = toks.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            # ln() tail exposure here is negligible without quantization
            # tricks: the rounding grid is 5e-7 on a ~1-magnitude value,
            # while a 1-ulp Math.log-vs-libm divergence perturbs the
            # product by ~1e-15 — eight orders of headroom (contrast
            # text_unigram_logprob, whose 1e8 integer grid needed the
            # explicit margin analysis).
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")), 6).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "token", "tfidf", "rank")
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l.l_discount AS DECIMAL(9,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "skew", "scale"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: the fact side adds a deterministic salt in
    0..7 (hash of its unique line number, not rand()), the dimension
    side is replicated across all 8 salt values via a posexplode'd
    literal array, and the join runs on (key, salt) — splitting any
    hot orderkey across 8 reducers. Identical result to the plain
    join — the oracle proves it.

    This is the manual escape hatch when AQE's skew-join splitting
    can't apply (e.g. the skewed side feeds a co-partitioned
    aggregation that would lose its partitioning to the split). The
    8x dimension replication costs one map-side explode — no extra
    shuffle — and the residual aggregation reuses the (key, salt)
    partitioning for its partial phase.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    n_salt = 8
    fact = li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt)))
    dim = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("salt"),
    )
    joined = fact.join(
        dim,
        (fact["l_orderkey"] == dim["o_orderkey"]) & (fact["salt"] == dim["salt"]),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")), 2).cast("double").alias(
            "revenue"
        ),
    )



# Inner-plan Exchange counts of the plan-self-checking operators,
# recorded at execution time: their registry-visible return value is a
# driver-side snapshot (LocalRelation), so the plan-drift baseline
# cannot read the interesting plan the way it does for every other
# query. regen_plan_baseline.py pins these counts and test_plan_lint.py
# re-executes + re-checks them (same Exchange regex as the baseline:
# ReusedExchange and BroadcastExchange excluded).
INNER_PLAN_EXCHANGES: dict[str, int] = {}


def _record_inner_plan(name: str, df: DataFrame) -> None:
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    INNER_PLAN_EXCHANGES[name] = len(re.findall(r"(?<![A-Za-z])Exchange ", plan))


@register(
    "scale_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                          * CAST(1 - l_discount AS DECIMAL(9,6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("scale", "join", "bucketed"),
)
def scale_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle co-located join: both sides bucketed + sorted on
    the join key, so the sort-merge join runs with NO Exchange at all
    — the one-time layout cost that turns a repeated 100 TB shuffle
    into a local merge. The operator SELF-CHECKS its plan (raises if
    the join gains an Exchange or loses SortMergeJoin), so the gate
    fails on plan regression, and the oracle verifies the values are
    identical to the plain join.

    Bucketed tables are written per call into the session warehouse
    under unique names and dropped afterwards; in production the
    layout is written once and amortized over every subsequent join
    on the key."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    bo, bl = f"bjoin_orders_{tag}", f"bjoin_lineitem_{tag}"
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable(bo)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable(bl)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(bl).join(
            spark.table(bo), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "SortMergeJoin" not in plan or "Exchange" in plan:
            raise AssertionError(
                "bucketed join must be an exchange-free SortMergeJoin; got:\n"
                + plan[:2000]
            )
        result = joined.groupBy("o_orderpriority").agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
        _record_inner_plan("scale_bucketed_join", result)
        # snapshot before the backing tables are dropped
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {bo}")
        spark.sql(f"DROP TABLE IF EXISTS {bl}")


@register(
    "scale_partition_pruned_read",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)          AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    tags=("scale", "partitioning", "pruning"),
)
def scale_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan: orders written partitioned by
    o_orderstatus, read back with a partition-column filter that must
    prune at PLAN time (PartitionFilters on the scan — only the
    matching directory is listed/read, the layout that turns a 100 TB
    full scan into a directory lookup). Self-checks the executed plan
    for the pruning filter; the oracle verifies the filtered aggregate
    against the unpartitioned table."""
    import shutil
    import tempfile

    from ceneton_database_tools_spark.sinks import read_partitioned, write_partitioned

    import os

    work = tempfile.mkdtemp(prefix="ceneton_prune_")
    out = os.path.join(work, "orders_by_status")  # writer requires a fresh path
    try:
        write_partitioned(_t(spark, sf_dir, "orders"), out, ["o_orderstatus"])
        pruned = read_partitioned(spark, out).filter(F.col("o_orderstatus") == "O")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        if "PartitionFilters" not in plan or "o_orderstatus" not in plan.split(
            "PartitionFilters", 1
        )[1].split("]", 1)[0]:
            raise AssertionError(
                "partition-column filter must prune at plan time; got:\n"
                + plan[:2000]
            )
        result = pruned.groupBy("o_orderpriority").agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        _record_inner_plan("scale_partition_pruned_read", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "scale_runtime_bloom_join",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                          * CAST(1 - l_discount AS DECIMAL(9,6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    tags=("scale", "join", "runtime-filter"),
)
def scale_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning (Spark 3.3+ row-level runtime
    filtering): a selective dimension predicate (urgent orders only)
    is turned by the optimizer into a ``bloom_filter_agg`` over the
    build side's join keys, and the FACT scan is pre-filtered with
    ``might_contain`` BEFORE the shuffle — at 100 TB this drops the
    ~80% of lineitem rows that would never match from ever being
    shuffled, the single biggest win available on a selective
    fact-dim join that is too big to broadcast. The operator
    SELF-CHECKS the executed plan for the injected ``might_contain``
    probe (raises if the runtime filter was not inserted), then
    verifies values against the plain-join oracle.

    The thresholds are lowered only inside this operator because the
    test tables are tiny (production defaults — 10 MB creation side /
    10 GB application side — are exactly right at cluster scale, where
    this kicks in untouched); broadcast is disabled so the join
    actually exercises the shuffle path being pruned. Confs are
    restored in ``finally``; the result is snapshotted first.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        orders = _t(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = _t(spark, sf_dir, "lineitem")
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "might_contain" not in plan:
            raise AssertionError(
                "runtime bloom filter was not injected into the fact scan; got:\n"
                + plan[:2000]
            )
        result = joined.groupBy("l_returnflag").agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
        _record_inner_plan("scale_runtime_bloom_join", result)
        # snapshot before the confs are restored
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@register(
    "scale_small_file_compaction",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS price_cents,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * l_linenumber) AS BIGINT) AS checksum
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("scale", "layout", "compaction"),
)
def scale_small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance job every 100 TB
    lake needs: a fragmented table (here: lineitem deliberately written
    as 64 tiny files, the streaming-ingest / over-parallel-writer
    failure mode) is rewritten into size-targeted files WITHOUT a
    shuffle (``coalesce`` merges input splits per task; ``repartition``
    would pay a full exchange to achieve the same byte layout). Target
    file count = ceil(input bytes / target size), capped by the read's
    split count (coalesce merges splits, never creates them); the
    operator SELF-CHECKS that (a) the compacted directory holds exactly
    min(target, read splits) parquet files, (b) compaction reduced the
    file count, and (c) the rewrite plan contains ZERO shuffle
    exchanges. Content
    preservation is what the oracle verifies: exact integer-cent sums
    and an order-independent per-row checksum must survive the rewrite
    byte-for-byte.

    At production scale the same job runs per partition with
    ``spark.sql.files.maxRecordsPerFile`` bounding the upper end; the
    reference has no table-maintenance surface at all (its only sink
    is a single JDBC load, ``sql.py``).
    """
    import math
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ceneton_compact_")
    frag = os.path.join(work, "fragmented")
    compact = os.path.join(work, "compacted")
    target_bytes = 8 * 1024 * 1024  # test-scale stand-in for 128MB-1GB
    try:
        _t(spark, sf_dir, "lineitem").repartition(64).write.parquet(frag)
        n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
        frag_bytes = sum(
            os.path.getsize(os.path.join(frag, f))
            for f in os.listdir(frag)
            if f.endswith(".parquet")
        )
        # adaptive target: byte-sized at test scale, but never more
        # than n_frag/8 once the fragments themselves grow past the
        # target size (sf>=1) — a fixed 8MB target would otherwise ask
        # for MORE files than the input has and fail spuriously
        target_bytes = max(target_bytes, -(-frag_bytes // 8))
        n_target = max(1, math.ceil(frag_bytes / target_bytes))
        compacted = spark.read.parquet(frag).coalesce(n_target)
        # coalesce merges read splits, never creates them: the achieved
        # count is min(n_target, read splits), and the read-split count
        # is governed by maxSplitBytes/defaultParallelism, not by file
        # count — probe it so the self-check holds at any sf/core count
        n_splits = spark.read.parquet(frag).rdd.getNumPartitions()
        n_effective = min(n_target, n_splits)
        plan = compacted._jdf.queryExecution().executedPlan().toString()
        import re

        if re.search(r"(?<![A-Za-z])Exchange ", plan):
            raise AssertionError(
                "compaction must be shuffle-free (coalesce, not repartition); "
                "got:\n" + plan[:2000]
            )
        compacted.write.parquet(compact)
        n_out = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
        if n_out != n_effective:
            raise AssertionError(
                f"compacted file count {n_out} != expected {n_effective} "
                f"(target {n_target}, read splits {n_splits})"
            )
        if n_frag > 1 and n_out >= n_frag:
            raise AssertionError(
                f"compaction did not reduce file count: {n_frag} -> {n_out}"
            )
        cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        result = (
            spark.read.parquet(compact)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(cents).cast("long").alias("price_cents"),
                F.sum(cents * F.col("l_linenumber")).cast("long").alias("checksum"),
            )
        )
        _record_inner_plan("scale_small_file_compaction", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "scale_zorder_layout",
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
    tags=("scale", "layout", "zorder", "data-skipping"),
)
def scale_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering — multi-dimensional data skipping, the layout
    job behind ``OPTIMIZE ... ZORDER BY`` (Delta) / ``sort_order``
    (Iceberg): interleave the bits of two key columns into a Morton
    code, range-partition + sort the table on that code, and every
    written file's (min,max) bounding box becomes a tight RECTANGLE in
    key space instead of a stripe — so a query constrained on BOTH
    dimensions prunes to the few files whose box intersects its
    rectangle, where a linear sort on either key alone prunes on that
    key only. The whole pipeline is codegen'd bit arithmetic
    (shiftleft/AND/OR bucket spreading — no UDF) plus ONE range
    exchange, exactly what the rewrite costs at 100 TB.

    SELF-CHECKS the skipping claim with the file-stats model the real
    lakes use (per-file min/max, kept in the txn log at scale; probed
    here by aggregation): for a centered 1/16-per-dim rectangle, the
    count of z-ordered files whose bounding box intersects the
    rectangle must be STRICTLY SMALLER than under a linear
    ``repartitionByRange(l_orderkey)`` layout of the same file count.
    Also asserts the rewrite plan holds exactly one shuffle (the range
    exchange) and that the rectangle scan's predicate reaches the
    parquet reader (PushedFilters).

    The oracle gates content + filter correctness in closed form: the
    rectangle aggregate off the z-ordered rewrite must equal the same
    aggregate DuckDB computes straight off ``lineitem`` (bounds via
    exact integer arithmetic on both engines)."""
    import os
    import shutil
    import tempfile

    n_files = 128
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"
    )
    # bounded collect: 4 scalars (the trained-artifact pattern)
    mno, mxo, mnp, mxp = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).collect()[0]
    span_o, span_p = mxo - mno + 1, mxp - mnp + 1

    def _bucket(col: str, mn: int, span: int):
        # exact integer 16-bit bucket, identical on any engine
        return (
            (F.col(col).cast("long") - F.lit(mn)) * F.lit(65536) / F.lit(span)
        ).cast("long")

    def _spread(x):
        # interleave-ready bit spread: 16 data bits -> 32 bits
        # (bitwiseOR/AND: `|`/`&` on Columns are the BOOLEAN operators)
        x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
        x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
        x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
        return x

    zval = _spread(_bucket("l_orderkey", mno, span_o)).bitwiseOR(
        F.shiftleft(_spread(_bucket("l_partkey", mnp, span_p)), 1)
    )
    work = tempfile.mkdtemp(prefix="ceneton_zorder_")
    zdir = os.path.join(work, "zorder")
    ldir = os.path.join(work, "linear")
    try:
        zdf = (
            li.withColumn("_z", zval)
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
        plan = zdf._jdf.queryExecution().executedPlan().toString()
        import re

        n_ex = len(re.findall(r"(?<![A-Za-z])Exchange ", plan))
        if n_ex != 1:
            raise AssertionError(f"z-order rewrite must shuffle once, saw {n_ex}")
        zdf.write.parquet(zdir)
        (
            li.repartitionByRange(n_files, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.parquet(ldir)
        )
        # rectangle: [4/16, 5/16) of each key span — inside one quadrant
        lo_o = mno + (span_o * 4) // 16
        hi_o = mno + (span_o * 5) // 16
        lo_p = mnp + (span_p * 4) // 16
        hi_p = mnp + (span_p * 5) // 16

        def _touched(path: str) -> int:
            """File-stats skipping model: files whose (min,max) box
            intersects the query rectangle (at scale these stats come
            from the commit log / parquet footers, not a scan)."""
            stats = (
                spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg(
                    F.min("l_orderkey").alias("mno"), F.max("l_orderkey").alias("mxo"),
                    F.min("l_partkey").alias("mnp"), F.max("l_partkey").alias("mxp"),
                )
            )
            return stats.where(
                (F.col("mxo") >= lo_o) & (F.col("mno") < hi_o)
                & (F.col("mxp") >= lo_p) & (F.col("mnp") < hi_p)
            ).count()

        z_touched, lin_touched = _touched(zdir), _touched(ldir)
        if not z_touched < lin_touched:
            raise AssertionError(
                f"z-order did not improve 2-D skipping: {z_touched} files "
                f"touched vs linear {lin_touched}"
            )
        rect = (
            (F.col("l_orderkey") >= lo_o) & (F.col("l_orderkey") < hi_o)
            & (F.col("l_partkey") >= lo_p) & (F.col("l_partkey") < hi_p)
        )
        cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
        result = (
            spark.read.parquet(zdir)
            .where(rect)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(cents).cast("long").alias("price_cents"),
            )
        )
        rplan = result._jdf.queryExecution().executedPlan().toString()
        pushed = (
            rplan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
            if "PushedFilters: [" in rplan
            else ""
        )
        if "GreaterThanOrEqual(l_orderkey" not in pushed:
            raise AssertionError(
                f"rectangle predicate not pushed to parquet scan: [{pushed}]"
            )
        _record_inner_plan("scale_zorder_layout", result)
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
