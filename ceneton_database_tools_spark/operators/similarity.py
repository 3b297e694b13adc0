"""Similarity search over the ``embeddings`` table.

Two paths, mirroring how ANN works at scale:

* **brute-force exact top-k** — the correctness baseline: broadcast the
  (small) query set against the full corpus, compute exact cosine
  map-side, take top-k per query. At 100 TB the corpus side never
  shuffles until the final per-query top-k (a k·|queries|-row
  aggregation), which is the optimal exact plan.
* **sign-LSH bucketed ANN** — the scale path: corpus and queries hash
  to sign-bit buckets; candidate generation is a bucket equi-join, so
  each query scans ~|corpus|/2^bits candidates instead of everything.
  Approximate by construction; the oracle runs the identical algorithm
  so results match exactly.

Cosines use explicit left-associated double-precision chains
(_textutil.dot_chain) so Spark and DuckDB sum in the same order —
bit-identical doubles, safe to ORDER BY without rounding first.

The reference (kws/ceneton-database-tools) has no similarity surface;
this family is mandated by the driver's brief (SURVEY.md §2 Part C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators import _textutil as T
from ceneton_database_tools_spark.operators.registry import register

EMB_DIM = 64
TOP_K = 5
N_QUERIES = 10
ANN_TOP_K = 3
ANN_N_QUERIES = 20
ANN_SIGN_BITS = 4


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with double-cast vector + precomputed norm."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).select("vec_id", "v", F.expr(T.norm_chain("v", EMB_DIM, one_based=False)).alias("nrm"))


_DUCK_BASE = f"""
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {T.norm_chain("(embedding::DOUBLE[])", EMB_DIM, one_based=True)} AS nrm
      FROM embeddings
"""


@register(
    "similarity_topk_exact",
    oracle=f"""
    WITH base AS ({_DUCK_BASE}),
    queries AS (SELECT * FROM base WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ({T.dot_chain("q.v", "c.v", EMB_DIM, one_based=True)}) / (q.nrm * c.nrm) AS cos
      FROM queries q JOIN base c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
           round(cos, 6) AS cosine
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= {TOP_K}
    """,
    tags=("similarity", "ann", "llm-pipeline"),
    bench=True,
)
def similarity_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k: broadcast the query set, compute
    cosine map-side against every corpus vector, window top-k per query.

    The ORDER BY uses the raw (unrounded) cosine — safe because both
    engines compute the identical left-associated double chain — with
    neighbor_id as the total-order tiebreak.
    """
    base = _base(spark, sf_dir)
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.expr(T.dot_chain("qv", "v", EMB_DIM, one_based=False)) / (
        F.col("qnrm") * F.col("nrm")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def _ann_bucket_duck() -> str:
    return " || ".join(
        f"CASE WHEN v[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, ANN_SIGN_BITS + 1)
    )


@register(
    "similarity_ann_lsh",
    oracle=f"""
    WITH base AS ({_DUCK_BASE}),
    bucketed AS (
      SELECT vec_id, v, nrm, {_ann_bucket_duck()} AS bucket FROM base
    ),
    queries AS (SELECT * FROM bucketed WHERE vec_id < {ANN_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ({T.dot_chain("q.v", "c.v", EMB_DIM, one_based=True)}) / (q.nrm * c.nrm) AS cos
      FROM queries q JOIN bucketed c
        ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
           round(cos, 6) AS cosine
    FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= {ANN_TOP_K}
    """,
    tags=("similarity", "ann", "lsh", "llm-pipeline"),
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed approximate top-k: 4 sign bits → 16 buckets;
    each query only scores candidates sharing its bucket (~1/16 of the
    corpus), then window top-k within the candidate set.

    This is the shape that scales: candidate generation is an equi-join
    on the bucket key (shuffle on a low-cardinality key — salt or add
    bits when buckets outgrow executor memory). Recall is approximate;
    the oracle runs the identical algorithm, so the gate checks the
    implementation, not the recall."""
    base = _base(spark, sf_dir)
    bucket = F.concat(
        *[
            F.when(F.expr(f"v[{i}]") >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(ANN_SIGN_BITS)
        ]
    )
    bucketed = base.withColumn("bucket", bucket)
    queries = bucketed.filter(F.col("vec_id") < ANN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        "bucket",
    )
    cos = F.expr(T.dot_chain("qv", "v", EMB_DIM, one_based=False)) / (
        F.col("qnrm") * F.col("nrm")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        bucketed.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= ANN_TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

IVF_NLIST = 8  # coarse centroids
IVF_NPROBE = 2  # probed lists per query
IVF_TOP_K = 3
IVF_N_QUERIES = 10


def _ivf_oracle() -> str:
    dot_cv = T.dot_chain("c.v", "e.v", EMB_DIM, one_based=True)
    dot_qc = T.dot_chain("q.v", "c.v", EMB_DIM, one_based=True)
    dot_qe = T.dot_chain("q.v", "e.v", EMB_DIM, one_based=True)
    return f"""
    WITH base AS ({_DUCK_BASE}),
    centroids AS (
      SELECT vec_id AS cid, v, nrm FROM base WHERE vec_id < {IVF_NLIST}
    ),
    assigned AS (
      SELECT e.vec_id, e.v, e.nrm, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY ({dot_cv}) / (c.nrm * e.nrm) DESC, c.cid) AS rn
      FROM base e CROSS JOIN centroids c
    ),
    lists AS (SELECT vec_id, v, nrm, cid FROM assigned WHERE rn = 1),
    queries AS (SELECT vec_id AS query_id, v, nrm FROM base WHERE vec_id < {IVF_N_QUERIES}),
    probed AS (
      SELECT q.query_id, q.v, q.nrm, c.cid,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY ({dot_qc}) / (q.nrm * c.nrm) DESC, c.cid) AS prn
      FROM queries q CROSS JOIN centroids c
    ),
    cand AS (
      SELECT p.query_id, p.v AS qv, p.nrm AS qnrm, e.vec_id AS neighbor_id,
             e.v, e.nrm
      FROM probed p JOIN lists e ON e.cid = p.cid
      WHERE p.prn <= {IVF_NPROBE} AND e.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
             PARTITION BY query_id
             ORDER BY ({T.dot_chain("qv", "v", EMB_DIM, one_based=True)}) / (qnrm * nrm) DESC,
                      neighbor_id) AS BIGINT) AS rank,
           round(({T.dot_chain("qv", "v", EMB_DIM, one_based=True)}) / (qnrm * nrm), 6)
             AS cosine
    FROM cand
    QUALIFY row_number() OVER (
      PARTITION BY query_id
      ORDER BY ({T.dot_chain("qv", "v", EMB_DIM, one_based=True)}) / (qnrm * nrm) DESC,
               neighbor_id) <= {IVF_TOP_K}
    """


@register(
    "similarity_ann_ivf",
    oracle=_ivf_oracle(),
    tags=("similarity", "ann", "ivf", "llm-pipeline"),
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbor: assign every
    vector to its nearest of 8 coarse centroids (the inverted lists),
    then each query probes only its 2 closest lists and ranks exact
    cosine inside them.

    Centroid "training" is deterministic — the first ``nlist`` vectors
    by id — so the oracle reproduces the index bit-for-bit; swapping in
    k-means centroids changes recall, not the plan. Scale shape: the
    centroid table broadcasts everywhere (assignment is map-side), the
    only shuffle is the list-id equi-join, and each query scans
    ~nprobe/nlist of the corpus instead of all of it. At 100 TB the
    lists are the partitioning key of the stored index."""
    base = _base(spark, sf_dir)
    centroids = base.filter(F.col("vec_id") < IVF_NLIST).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cnrm")
    )
    cos_ce = F.expr(T.dot_chain("cv", "v", EMB_DIM, one_based=False)) / (
        F.col("cnrm") * F.col("nrm")
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    lists = (
        base.crossJoin(F.broadcast(centroids))
        .withColumn("ccos", cos_ce)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )
    queries = base.filter(F.col("vec_id") < IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    cos_qc = F.expr(T.dot_chain("qv", "cv", EMB_DIM, one_based=False)) / (
        F.col("qnrm") * F.col("cnrm")
    )
    w_probe = W.partitionBy("query_id").orderBy(F.col("qcos").desc(), F.col("cid"))
    probed = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("qcos", cos_qc)
        .withColumn("prn", F.row_number().over(w_probe))
        .filter(F.col("prn") <= IVF_NPROBE)
        .select("query_id", "qv", "qnrm", "cid")
    )
    cos_qe = F.expr(T.dot_chain("qv", "v", EMB_DIM, one_based=False)) / (
        F.col("qnrm") * F.col("nrm")
    )
    w_rank = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        lists.join(F.broadcast(probed), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos_qe.alias("cos"))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )
