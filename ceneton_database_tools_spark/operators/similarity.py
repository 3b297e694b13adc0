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
    return (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        )
        .select(
            "vec_id", "v", F.expr(T.norm_chain("v", EMB_DIM, one_based=False)).alias("nrm")
        )
        # cosine similarity is undefined for a zero vector (its norm
        # divides every score); exclude at the base on BOTH engines —
        # otherwise the first all-zero embedding a real corpus ships
        # kills the whole family with DIVIDE_BY_ZERO under ANSI mode
        .filter(F.col("nrm") > 0)
    )


_DUCK_BASE = f"""
      SELECT * FROM (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {T.norm_chain("(embedding::DOUBLE[])", EMB_DIM, one_based=True)} AS nrm
      FROM embeddings
      ) WHERE nrm > 0
"""


def _query_set(df: DataFrame, n: int, extra: tuple[str, ...] = ()) -> DataFrame:
    """First-n query projection — the (query_id, qv, qnrm) shape every
    similarity query broadcasts (ONE definition; it appeared
    copy-pasted in four operators before round 5)."""
    return df.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        *extra,
    )


def _score_rank(cands: DataFrame, k: int, with_cosine: bool = True) -> DataFrame:
    """Shared scoring tail: drop self-pairs, score with the
    left-associated cosine chain, window top-k per query (cos DESC,
    neighbor_id tiebreak). ``cands`` carries the corpus columns
    (vec_id, v, nrm) joined with a query projection."""
    cos = F.expr(T.dot_chain("qv", "v", EMB_DIM, one_based=False)) / (
        F.col("qnrm") * F.col("nrm")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    ranked = (
        cands.filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    if with_cosine:
        return ranked.select(
            "query_id",
            "neighbor_id",
            "rank",
            F.expr(T.quantize("cos", 6)).alias("cosine"),
        )
    return ranked.select("query_id", "neighbor_id")


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
           CAST(CASE WHEN (cos) < 0 THEN -floor(-(cos) * 1000000 + 0.5) ELSE  floor( (cos) * 1000000 + 0.5) END AS DOUBLE) / 1000000 AS cosine
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= {TOP_K}
    """,
    tags=("similarity", "ann", "llm-pipeline"),
    bench=True,
)
def similarity_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k: score every corpus vector against
    the bounded query set map-side in a vectorized Arrow batch function,
    keep the per-batch top-k, then window the exact global top-k per
    query over the tiny survivor set.

    Optimization r15 (guide §4.2 + VERDICT r14 #6): the previous shape
    computed the cosine as a 64-term SQL expression chain per pair-row.
    That chain is exactly why the stage could not run fast: the
    generated whole-stage code for a 127-operator expression tree is too
    large for JIT (the executed plan carries NO codegen annotation), and
    the measured cost was ~28 µs/pair — wholeStage OFF ran the same
    projection 2× faster, i.e. the JVM was the bottleneck, not the
    flops. The scoring now runs in numpy inside ``mapInArrow`` with an
    EXACT left-associated column-stepped loop::

        acc = q[0]*M[:,0]; acc += q[1]*M[:,1]; ...; cos = acc/(qnrm*nrm)

    Every step is an IEEE-754 binary64 multiply/add/divide — the same
    correctly-rounded operation sequence as the SQL chain, so the
    doubles are BIT-IDENTICAL (this is NOT the BLAS/np.dot rewrite r14
    rejected: np.dot reassociates, a column-stepped loop cannot).
    Pinned by ``test_topk_numpy_cos_equals_sql_chain`` and the oracle at
    sf0.001/0.01/0.1.

    Scale/shuffle shape (VERDICT #6): per-batch selection keeps ≤
    |queries|·k rows by the SAME total order (cos DESC, neighbor_id) the
    final window uses, so the one Exchange ships ~batches·|queries|·k
    rows instead of |corpus|·|queries| (the plan's former partial
    ``WindowGroupLimit`` bounded this per task; the batch-local top-k
    bounds it per ~10k-row batch AND removes the full local sort of all
    scored pairs). The query set (N_QUERIES rows, a constant) is
    collected once and closed over — the production shape for a query
    artifact, same precedent as the trained-centroid table in
    ``_ivf_centroids``; the corpus side never collects.
    """
    import numpy as np

    base = _base(spark, sf_dir)
    qrows = sorted(
        _query_set(base, N_QUERIES).collect(), key=lambda r: r["query_id"]
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank long, cosine double"
        )
    queries = [
        (int(r["query_id"]), np.asarray(r["qv"], dtype=np.float64), float(r["qnrm"]))
        for r in qrows
    ]
    k = TOP_K

    def _score_local_topk(batches):
        import numpy as np
        import pyarrow as pa

        schema = pa.schema(
            [
                pa.field("query_id", pa.int64()),
                pa.field("neighbor_id", pa.int64()),
                pa.field("cos", pa.float64()),
            ]
        )
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            vid = b.column("vec_id").to_numpy(zero_copy_only=False)
            vals = b.column("v").flatten().to_numpy(zero_copy_only=False)
            if vals.size != n * EMB_DIM:
                raise ValueError(
                    f"expected fixed {EMB_DIM}-dim vectors, got "
                    f"{vals.size} values for {n} rows"
                )
            mat = vals.reshape(n, EMB_DIM)
            nrm = b.column("nrm").to_numpy(zero_copy_only=False)
            out_q, out_n, out_c = [], [], []
            for qid, qv, qnrm in queries:
                # exact left-associated chain, column-stepped — each
                # step one correctly-rounded IEEE binary64 op, same
                # sequence as T.dot_chain (NO np.dot: it reassociates)
                acc = qv[0] * mat[:, 0]
                for d in range(1, EMB_DIM):
                    acc += qv[d] * mat[:, d]
                cos = acc / (qnrm * nrm)
                mask = vid != qid
                m_vid, m_cos = vid[mask], cos[mask]
                if m_vid.size == 0:
                    continue
                # batch-local top-k by the final window's exact total
                # order (cos DESC, neighbor_id ASC); negation of a
                # double is exact, lexsort is stable on equal keys
                take = np.lexsort((m_vid, -m_cos))[: min(k, m_vid.size)]
                out_q.append(np.full(take.size, qid, dtype=np.int64))
                out_n.append(m_vid[take])
                out_c.append(m_cos[take])
            if out_q:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_q), type=pa.int64()),
                        pa.array(np.concatenate(out_n), type=pa.int64()),
                        pa.array(np.concatenate(out_c), type=pa.float64()),
                    ],
                    schema=schema,
                )

    scored = base.select("vec_id", "v", "nrm").mapInArrow(
        _score_local_topk, "query_id long, neighbor_id long, cos double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.expr(T.quantize("cos", 6)).alias("cosine"),
        )
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
           CAST(CASE WHEN (cos) < 0 THEN -floor(-(cos) * 1000000 + 0.5) ELSE  floor( (cos) * 1000000 + 0.5) END AS DOUBLE) / 1000000 AS cosine
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
    queries = _query_set(bucketed, ANN_N_QUERIES, extra=("bucket",))
    cands = bucketed.join(F.broadcast(queries), "bucket")
    return _score_rank(cands, ANN_TOP_K)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

IVF_NLIST = 8  # coarse centroids
IVF_NPROBE = 2  # probed lists per query
IVF_TOP_K = 3
IVF_N_QUERIES = 10
IVF_KMEANS_ITERS = 2  # fixed Lloyd iterations — part of the index spec

# Centroid updates are the one place k-means sums floats across rows,
# which is partition-order-dependent in the last ulp — a 1-ulp centroid
# wobble can flip an assignment and cascade into a different index. So
# updates run in EXACT integer space: coordinates quantize to micro-unit
# BIGINTs (floor(x*1e6 + 0.5) — embeddings are float32, so the double is
# within ~1e-9 of the exact 1e-6-precision value and the quantization is
# engine-stable), sum exactly in any order, and the new centroid
# coordinate is the identical double s/(n*1e6) on both engines.
_QUANT_SPARK = "transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"
_QUANT_DUCK = "list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"


def _cos_vs_centroid(dot: str, vec_nrm: str, cent_nrm: str) -> str:
    """Centroid-side cosine, total on BOTH engines: a centroid can be
    zero-norm even though base excludes zero vectors (a sub-quantum
    vector quantizes to all-zero init coordinates; integer cluster
    sums can cancel exactly), and x/0 on doubles is where the engines
    part ways — Spark follows IEEE (NaN/Inf, and NaN sorts FIRST under
    DESC) while DuckDB yields NULL (sorts LAST). The sentinel -2 is
    below any real cosine, so a degenerate centroid deterministically
    loses every assignment/probe on both engines. Valid as the same
    string in Spark SQL and DuckDB."""
    return (
        f"CASE WHEN {cent_nrm} = 0 THEN -2.0"
        f" ELSE ({dot}) / ({vec_nrm} * {cent_nrm}) END"
    )


def _ivf_centroids(base: DataFrame) -> DataFrame:
    """Seeded spherical k-means: deterministic init (the first ``nlist``
    vectors by id, coordinates derived from the same integer
    quantization the updates use), then ``IVF_KMEANS_ITERS`` Lloyd
    iterations assigning by cosine (the index's own probe metric) and
    recomputing centroids as exact-integer means. An emptied cluster
    keeps its previous centroid (left join + coalesce — identical
    semantics in the oracle). Everything is deterministic, so the
    DuckDB oracle reproduces the trained index bit-for-bit.

    Scale shape: centroids are a broadcast-sized table at any corpus
    size; each iteration is one map-side broadcast assignment plus one
    (cid, 64 ints) aggregation — the same two-stage shape FAISS-style
    coarse training has, expressed as DataFrame ops."""
    pts = base.select("vec_id", "v", "nrm", F.expr(_QUANT_SPARK).alias("vq"))
    cents = (
        pts.filter(F.col("vec_id") < IVF_NLIST)
        .select(
            F.col("vec_id").alias("cid"),
            F.expr("transform(vq, s -> CAST(s AS DOUBLE) / 1000000.0)").alias("cv"),
        )
        .withColumn("cnrm", F.expr(T.norm_chain("cv", EMB_DIM, one_based=False)))
    )
    cos = F.expr(
        _cos_vs_centroid(
            T.dot_chain("v", "cv", EMB_DIM, one_based=False), "nrm", "cnrm"
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.col("acos_").desc(), F.col("cid"))
    for _ in range(IVF_KMEANS_ITERS):
        assigned = (
            pts.crossJoin(F.broadcast(cents))
            .withColumn("acos_", cos)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cid", "vq")
        )
        upd = (
            assigned.groupBy("cid")
            .agg(
                F.count("*").alias("n"),
                *[F.sum(F.expr(f"vq[{j}]")).alias(f"s{j}") for j in range(EMB_DIM)],
            )
            .select(
                "cid",
                F.array(
                    *[
                        F.expr(f"CAST(s{j} AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)")
                        for j in range(EMB_DIM)
                    ]
                ).alias("ncv"),
            )
        )
        cents = (
            cents.join(upd, "cid", "left")
            .select("cid", F.coalesce("ncv", "cv").alias("cv"))
            .withColumn("cnrm", F.expr(T.norm_chain("cv", EMB_DIM, one_based=False)))
        )
    # Materialize the trained index: nlist rows × 64 doubles. Without
    # this, every downstream reference to the centroid table (lists +
    # probe branches of the ANN query, plus the recall query's nested
    # call) re-executes the FULL two-iteration training lineage —
    # crossJoin, window, 64-column aggregate over the corpus — once
    # per reference. Training runs exactly once; consumers broadcast a
    # local relation, which is also the production shape (a trained
    # coarse index is a small artifact loaded next to the query plan).
    return cents.sparkSession.createDataFrame(cents.collect(), schema=cents.schema)


def _kmeans_ctes() -> str:
    """DuckDB CTE chain mirroring :func:`_ivf_centroids` exactly;
    terminates in ``cents(cid, cv, cnrm)``."""
    dims = range(1, EMB_DIM + 1)
    ctes = [
        f"pts AS MATERIALIZED (SELECT vec_id, v, nrm, {_QUANT_DUCK} AS vq FROM base)",
        f"""cent0 AS MATERIALIZED (
      SELECT vec_id AS cid,
             list_transform(vq, s -> CAST(s AS DOUBLE) / 1000000.0) AS cv
      FROM pts WHERE vec_id < {IVF_NLIST})""",
    ]
    prev = "cent0"
    for it in range(1, IVF_KMEANS_ITERS + 1):
        dot = T.dot_chain("p.v", "c.cv", EMB_DIM, one_based=True)
        cnrm = T.norm_chain("c.cv", EMB_DIM, one_based=True)
        coords = ", ".join(
            f"CAST(sum(vq[{j}]) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0)"
            for j in dims
        )
        ctes.append(
            f"""assign{it} AS MATERIALIZED (
      SELECT p.vq, c.cid,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY {_cos_vs_centroid(dot, "p.nrm", cnrm)} DESC, c.cid) AS rn
      FROM pts p CROSS JOIN {prev} c)"""
        )
        ctes.append(
            f"upd{it} AS MATERIALIZED (SELECT cid, [{coords}] AS ncv "
            f"FROM assign{it} WHERE rn = 1 GROUP BY cid)"
        )
        ctes.append(
            f"cent{it} AS MATERIALIZED (SELECT c.cid, COALESCE(u.ncv, c.cv) AS cv "
            f"FROM {prev} c LEFT JOIN upd{it} u ON u.cid = c.cid)"
        )
        prev = f"cent{it}"
    ctes.append(
        f"cents AS MATERIALIZED (SELECT cid, cv, {T.norm_chain('cv', EMB_DIM, one_based=True)} "
        f"AS cnrm FROM {prev})"
    )
    return ",\n    ".join(ctes)


def _ivf_common_ctes() -> str:
    """Shared IVF CTE prefix: trained centroids, inverted lists,
    query set, and every query's centroid ranking (``probed`` carries
    the FULL ranking ``prn`` — each nprobe setting is just a different
    cut of it)."""
    dot_cv = T.dot_chain("c.cv", "e.v", EMB_DIM, one_based=True)
    dot_qc = T.dot_chain("q.v", "c.cv", EMB_DIM, one_based=True)
    return f"""{_kmeans_ctes()},
    assigned AS MATERIALIZED (
      SELECT e.vec_id, e.v, e.nrm, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_vs_centroid(dot_cv, "e.nrm", "c.cnrm")} DESC, c.cid) AS rn
      FROM base e CROSS JOIN cents c
    ),
    lists AS MATERIALIZED (SELECT vec_id, v, nrm, cid FROM assigned WHERE rn = 1),
    queries AS (SELECT vec_id AS query_id, v, nrm FROM base WHERE vec_id < {IVF_N_QUERIES}),
    probed AS MATERIALIZED (
      SELECT q.query_id, q.v, q.nrm, c.cid,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {_cos_vs_centroid(dot_qc, "q.nrm", "c.cnrm")} DESC, c.cid) AS prn
      FROM queries q CROSS JOIN cents c
    )"""


def _ivf_rank_ctes(nprobe: int, suffix: str = "") -> str:
    """Per-nprobe candidate + top-k CTEs (``cand{suffix}`` /
    ``ivf{suffix}``) over the shared prefix."""
    dot_qe = T.dot_chain("qv", "v", EMB_DIM, one_based=True)
    return f"""cand{suffix} AS MATERIALIZED (
      SELECT p.query_id, p.v AS qv, p.nrm AS qnrm, e.vec_id AS neighbor_id,
             e.v, e.nrm
      FROM probed p JOIN lists e ON e.cid = p.cid
      WHERE p.prn <= {nprobe} AND e.vec_id <> p.query_id
    ),
    ivf{suffix} AS MATERIALIZED (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY ({dot_qe}) / (qnrm * nrm) DESC, neighbor_id) AS BIGINT) AS rank,
             ({dot_qe}) / (qnrm * nrm) AS cos
      FROM cand{suffix}
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY ({dot_qe}) / (qnrm * nrm) DESC, neighbor_id) <= {IVF_TOP_K}
    )"""


def _ivf_ctes() -> str:
    """Everything up to the IVF result set: trained centroids, inverted
    lists, probed lists, candidates, and ``ivf(query_id, neighbor_id,
    rank, cos)`` at the default ``IVF_NPROBE``."""
    return f"""{_ivf_common_ctes()},
    {_ivf_rank_ctes(IVF_NPROBE)}"""


def _ivf_oracle() -> str:
    return f"""
    WITH base AS MATERIALIZED ({_DUCK_BASE}),
    {_ivf_ctes()}
    SELECT query_id, neighbor_id, rank, CAST(CASE WHEN (cos) < 0 THEN -floor(-(cos) * 1000000 + 0.5) ELSE  floor( (cos) * 1000000 + 0.5) END AS DOUBLE) / 1000000 AS cosine FROM ivf
    """


@register(
    "similarity_ann_ivf",
    oracle=_ivf_oracle(),
    tags=("similarity", "ann", "ivf", "llm-pipeline"),
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbor: assign every
    vector to its nearest of 8 trained coarse centroids (the inverted
    lists), then each query probes only its 2 closest lists and ranks
    exact cosine inside them.

    Centroids come from deterministic seeded spherical k-means
    (:func:`_ivf_centroids`: first-nlist init + 2 exact-integer Lloyd
    iterations), so the oracle reproduces the trained index
    bit-for-bit and ``similarity_ivf_recall_eval`` measures real index
    quality. Scale shape: the centroid table broadcasts everywhere
    (assignment is map-side), the only shuffle is the list-id
    equi-join, and each query scans ~nprobe/nlist of the corpus
    instead of all of it. At 100 TB the lists are the partitioning key
    of the stored index."""
    base = _base(spark, sf_dir)
    return _ivf_topk(base, _ivf_centroids(base), IVF_NPROBE)


def _ivf_topk(base: DataFrame, centroids: DataFrame, nprobe: int) -> DataFrame:
    """The IVF probe/rank core over an already-trained centroid table,
    with the probe width a PARAMETER — the recall/latency knob every
    production IVF index exposes (FAISS's ``nprobe``). Callers sweeping
    several settings train once and reuse ``centroids`` (a broadcast
    local relation), so the sweep costs only the bounded candidate
    joins, never re-training."""
    cos_ce = F.expr(
        _cos_vs_centroid(
            T.dot_chain("cv", "v", EMB_DIM, one_based=False), "nrm", "cnrm"
        )
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid"))
    lists = (
        base.crossJoin(F.broadcast(centroids))
        .withColumn("ccos", cos_ce)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )
    queries = _query_set(base, IVF_N_QUERIES)
    cos_qc = F.expr(
        _cos_vs_centroid(
            T.dot_chain("qv", "cv", EMB_DIM, one_based=False), "qnrm", "cnrm"
        )
    )
    w_probe = W.partitionBy("query_id").orderBy(F.col("qcos").desc(), F.col("cid"))
    probed = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("qcos", cos_qc)
        .withColumn("prn", F.row_number().over(w_probe))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "qnrm", "cid")
    )
    return _score_rank(lists.join(F.broadcast(probed), "cid"), IVF_TOP_K)


def _ivf_recall_oracle() -> str:
    dot = T.dot_chain("q.v", "c.v", EMB_DIM, one_based=True)
    return f"""
    WITH base AS MATERIALIZED ({_DUCK_BASE}),
    {_ivf_ctes()},
    exact AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM base q JOIN base c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {IVF_N_QUERIES}
      QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY ({dot}) / (q.nrm * c.nrm) DESC, c.vec_id) <= {IVF_TOP_K}
    )
    SELECT CAST({IVF_N_QUERIES} AS BIGINT) AS n_queries,
           CAST({IVF_TOP_K} AS BIGINT)     AS k,
           CAST(count(*) AS BIGINT)        AS hits,
           CAST(CASE WHEN (CAST(count(*) AS DOUBLE) / ({IVF_N_QUERIES} * {IVF_TOP_K})) < 0 THEN -floor(-(CAST(count(*) AS DOUBLE) / ({IVF_N_QUERIES} * {IVF_TOP_K})) * 10000 + 0.5) ELSE  floor( (CAST(count(*) AS DOUBLE) / ({IVF_N_QUERIES} * {IVF_TOP_K})) * 10000 + 0.5) END AS DOUBLE) / 10000 AS recall_at_k
    FROM exact e JOIN ivf i
      ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
    """


@register(
    "similarity_ivf_recall_eval",
    oracle=_ivf_recall_oracle(),
    tags=("similarity", "ann", "ivf", "recall", "llm-pipeline"),
)
def similarity_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the trained IVF index against brute-force ground
    truth (the ANN analogue of ``dedup_lsh_recall_eval``): exact
    cosine top-k per query vs the index's top-k; recall is the overlap
    fraction. Because the whole pipeline — k-means training included —
    is deterministic, both engines compute the SAME recall, so the
    gate verifies index quality measurement end-to-end.

    Scale shape: ground truth is the broadcast-query exact plan over
    the full corpus (affordable because the query SET is small — the
    standard way recall is sampled in production), the index side is
    the nprobe-bounded IVF plan."""
    base = _base(spark, sf_dir)
    exact = _score_rank(
        base.crossJoin(F.broadcast(_query_set(base, IVF_N_QUERIES))),
        IVF_TOP_K,
        with_cosine=False,
    )
    ivf = similarity_ann_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    return (
        exact.join(ivf, ["query_id", "neighbor_id"])
        .agg(F.count("*").alias("hits"))
        .select(
            F.lit(IVF_N_QUERIES).cast("long").alias("n_queries"),
            F.lit(IVF_TOP_K).cast("long").alias("k"),
            F.col("hits").cast("long").alias("hits"),
            T.quantize_col(
                F.col("hits").cast("double") / (IVF_N_QUERIES * IVF_TOP_K), 4
            ).alias("recall_at_k"),
        )
    )


# The documented recall/latency trade-off curve: probe widths swept by
# similarity_ivf_recall_curve. nprobe == nlist is exhaustive (recall
# 1.0 by construction) — kept in the sweep as the self-calibrating
# upper anchor.
IVF_NPROBE_SWEEP = (1, 2, 4, IVF_NLIST)


def _ivf_recall_curve_oracle() -> str:
    branches = ",\n".join(
        _ivf_rank_ctes(np_, suffix=f"_{np_}") for np_ in IVF_NPROBE_SWEEP
    )
    dot = T.dot_chain("q.v", "c.v", EMB_DIM, one_based=True)
    selects = "\nUNION ALL\n".join(
        f"""SELECT CAST({np_} AS BIGINT) AS nprobe,
           CAST({IVF_TOP_K} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT)    AS hits,
           CAST({T.quantize(f"CAST(count(*) AS DOUBLE) / ({IVF_N_QUERIES} * {IVF_TOP_K})", 4)} AS DOUBLE) AS recall_at_k
    FROM exact e JOIN ivf_{np_} i
      ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id"""
        for np_ in IVF_NPROBE_SWEEP
    )
    return f"""
    WITH base AS MATERIALIZED ({_DUCK_BASE}),
    {_ivf_common_ctes()},
    {branches},
    exact AS MATERIALIZED (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM base q JOIN base c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {IVF_N_QUERIES}
      QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY ({dot}) / (q.nrm * c.nrm) DESC, c.vec_id) <= {IVF_TOP_K}
    )
    {selects}
    """


@register(
    "similarity_ivf_recall_curve",
    oracle=_ivf_recall_curve_oracle(),
    tags=("similarity", "ann", "ivf", "recall", "llm-pipeline"),
)
def similarity_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k AS A FUNCTION OF nprobe — the trade-off curve a
    production ANN deployment tunes against (FAISS's nprobe sweep),
    one row per probe width in ``IVF_NPROBE_SWEEP``. The index trains
    ONCE (:func:`_ivf_centroids` materializes the centroid table, a
    broadcast local relation); each sweep point is just a different cut
    of the query→centroid ranking, so the whole curve costs four
    bounded candidate joins over the same inverted lists. The exhaustive
    anchor (nprobe == nlist) must report recall 1.0 — self-calibration
    the oracle also checks — and recall is monotone in nprobe by
    construction (wider probes only ADD candidates).

    Scale shape: ground truth is sampled over the bounded query set
    (the standard production recall probe); everything else reuses the
    similarity_ann_ivf plan shape — broadcast centroids, list-id
    equi-join, no all-pairs anywhere."""
    base = _base(spark, sf_dir)
    centroids = _ivf_centroids(base)
    exact = _score_rank(
        base.crossJoin(F.broadcast(_query_set(base, IVF_N_QUERIES))),
        IVF_TOP_K,
        with_cosine=False,
    ).select("query_id", "neighbor_id")
    out = None
    for np_ in IVF_NPROBE_SWEEP:
        ivf = _ivf_topk(base, centroids, np_).select("query_id", "neighbor_id")
        row = (
            exact.join(ivf, ["query_id", "neighbor_id"])
            .agg(F.count("*").alias("hits"))
            .select(
                F.lit(np_).cast("long").alias("nprobe"),
                F.lit(IVF_TOP_K).cast("long").alias("k"),
                F.col("hits").cast("long").alias("hits"),
                T.quantize_col(
                    F.col("hits").cast("double") / (IVF_N_QUERIES * IVF_TOP_K),
                    4,
                ).alias("recall_at_k"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
