"""Text-analysis operators over the ``documents`` table.

The training-data-pipeline text surface (SURVEY.md §2 Part C): corpus
statistics, per-document quality scoring, corpus-learned language
identification, token frequency, and rolling document fingerprints.
Everything is built-in Spark SQL functions over token arrays — no
Python UDFs anywhere on this path, so the whole family stays inside
whole-stage codegen.

Cross-engine determinism: tokenization is the shared ``\\s+`` split
(_textutil); ratios divide exact integers into doubles and round
identically; ranking tie-breaks are total orders on (count desc, token).

The reference (kws/ceneton-database-tools) treats text as opaque
strings; this family is mandated by the driver's brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators import _textutil as T
from ceneton_database_tools_spark.operators.registry import register

TOP_TOKENS = 20
PROFILE_SIZE = 10
FINGERPRINT_TOKENS = 5
TWIN_OFFSET = 1_000_000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _with_tokens(docs: DataFrame) -> DataFrame:
    return docs.withColumn("w", F.expr(T.SPARK_TOKENS))


# ---------------------------------------------------------------------------
# Corpus statistics
# ---------------------------------------------------------------------------


@register(
    "text_stats_by_lang",
    oracle=f"""
    SELECT
      lang,
      count(*)                                   AS n_docs,
      count(DISTINCT source)                     AS n_sources,
      round(avg(n_chars), 2)                     AS avg_chars,
      round(avg(len({T.DUCK_TOKENS})), 2)        AS avg_tokens,
      min(n_chars)                               AS min_chars,
      max(n_chars)                               AS max_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "llm-pipeline"),
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (doc/source counts, length and
    token-count distributions). Single hash aggregation; the token
    count is an array length computed map-side, so nothing but the
    5-language aggregate ever shuffles."""
    return (
        _with_tokens(_docs(spark, sf_dir))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(F.size("w")), 2).alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex
# ---------------------------------------------------------------------------

# BPE-style pre-tokenization classes (GPT-2-ish, simplified to the
# RE2/Java-common subset): letter runs, digit runs, punctuation runs.
# Splitting digits and punctuation away from words is what makes BPE
# counts diverge from whitespace counts — the divergence ratio is the
# interesting per-doc statistic for budgeting token costs.
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


@register(
    "text_token_count_bpe",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {T.DUCK_TOKENS} AS w,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+') AS bpe
      FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT)   AS n_ws_tokens,
           CAST(len(bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_filter(bpe, x -> regexp_matches(x, '^[A-Za-z]+$'))) AS BIGINT)
             AS n_word,
           CAST(len(list_filter(bpe, x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT)
             AS n_number,
           CAST(len(bpe)
                - len(list_filter(bpe, x -> regexp_matches(x, '^[A-Za-z]+$')))
                - len(list_filter(bpe, x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT)
             AS n_punct,
           round(len(bpe)::DOUBLE / len(w), 4) AS bpe_per_ws
    FROM t
    """,
    tags=("text", "tokens", "llm-pipeline"),
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways: whitespace split AND a BPE-style
    pre-tokenizer regex (letter runs / digit runs / punctuation runs —
    the class structure BPE vocabularies are trained over). Pure
    map-side JVM regex work per document, no shuffle at all; the
    per-class counts are array filters over the one extraction pass.
    ``bpe_per_ws`` is the per-doc expansion factor a token-budget
    planner needs when converting corpus word counts to model tokens.
    """
    docs = _with_tokens(_docs(spark, sf_dir))
    bpe = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    n_word = F.size(F.filter("bpe", lambda x: x.rlike("^[A-Za-z]+$")))
    n_number = F.size(F.filter("bpe", lambda x: x.rlike("^[0-9]+$")))
    return (
        docs.withColumn("bpe", bpe)
        .select(
            "doc_id",
            F.size("w").cast("long").alias("n_ws_tokens"),
            F.size("bpe").cast("long").alias("n_bpe_tokens"),
            n_word.cast("long").alias("n_word"),
            n_number.cast("long").alias("n_number"),
            (F.size("bpe") - n_word - n_number).cast("long").alias("n_punct"),
            F.round(F.size("bpe").cast("double") / F.size("w"), 4).alias("bpe_per_ws"),
        )
    )


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


@register(
    "text_quality_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {T.DUCK_TOKENS} AS w FROM documents
    ),
    feat AS (
      SELECT
        doc_id, lang,
        CAST(len(w) AS BIGINT)                  AS n_tokens,
        CAST(len(list_distinct(w)) AS BIGINT)   AS n_types,
        round(len(list_distinct(w)) / len(w), 4) AS type_token_ratio,
        round(list_sum(list_transform(w, x -> len(x))) / len(w), 4) AS avg_token_len
      FROM toks
    )
    SELECT *,
      CASE WHEN n_tokens >= 40 AND type_token_ratio >= 0.45 THEN 'high'
           WHEN n_tokens >= 15 THEN 'medium'
           ELSE 'low' END AS quality_class
    FROM feat
    """,
    tags=("text", "quality", "llm-pipeline"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, vocabulary size,
    type-token ratio, mean token length, and a classed quality label.
    All features are array expressions over the token array — computed
    in one map-side pass, zero shuffles, zero UDFs."""
    toks = _with_tokens(_docs(spark, sf_dir)).select("doc_id", "lang", "w")
    n_tokens = F.size("w").cast("long")
    n_types = F.size(F.array_distinct("w")).cast("long")
    ttr = F.round(n_types / n_tokens, 4)
    sum_len = F.expr("aggregate(transform(w, x -> length(x)), 0, (acc, x) -> acc + x)")
    atl = F.round(sum_len / n_tokens, 4)
    feat = toks.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        ttr.alias("type_token_ratio"),
        atl.alias("avg_token_len"),
    )
    quality = (
        F.when(
            (F.col("n_tokens") >= 40) & (F.col("type_token_ratio") >= 0.45), F.lit("high")
        )
        .when(F.col("n_tokens") >= 15, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return feat.withColumn("quality_class", quality)


# ---------------------------------------------------------------------------
# Corpus-learned language identification
# ---------------------------------------------------------------------------


@register(
    "text_langid_profile",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(list_distinct({T.DUCK_TOKENS})) AS token
      FROM documents
    ),
    profiles AS (
      SELECT lang AS plang, token
      FROM (SELECT lang, token, count(*) AS n FROM toks GROUP BY lang, token)
      QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) <= {PROFILE_SIZE}
    ),
    scores AS (
      SELECT t.doc_id, p.plang, count(*) AS score
      FROM toks t JOIN profiles p ON t.token = p.token
      GROUP BY t.doc_id, p.plang
    ),
    pred AS (
      SELECT doc_id, plang
      FROM scores
      QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) = 1
    )
    SELECT d.lang, coalesce(p.plang, 'und') AS predicted_lang, count(*) AS n_docs
    FROM documents d LEFT JOIN pred p ON d.doc_id = p.doc_id
    GROUP BY d.lang, coalesce(p.plang, 'und')
    """,
    tags=("text", "langid", "llm-pipeline"),
)
def text_langid_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-profile language ID, corpus-learned: build a top-10
    token profile per labeled language, score each document by profile
    overlap, predict the argmax, and report the confusion matrix
    (labeled lang × predicted lang).

    Two shuffles that scale: token counts aggregate partial map-side;
    the profile table (5 langs × 10 tokens) broadcasts onto the token
    stream for scoring."""
    docs = _docs(spark, sf_dir)
    toks = _with_tokens(docs).select(
        "doc_id", "lang", F.explode(F.array_distinct("w")).alias("token")
    )
    counts = toks.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w_prof = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    profiles = (
        counts.withColumn("rn", F.row_number().over(w_prof))
        .filter(F.col("rn") <= PROFILE_SIZE)
        .select(F.col("lang").alias("plang"), "token")
    )
    scores = (
        toks.join(F.broadcast(profiles), "token")
        .groupBy("doc_id", "plang")
        .agg(F.count("*").alias("score"))
    )
    w_pred = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("plang"))
    pred = (
        scores.withColumn("rn", F.row_number().over(w_pred))
        .filter(F.col("rn") == 1)
        .select("doc_id", "plang")
    )
    return (
        docs.join(pred, "doc_id", "left")
        .groupBy("lang", F.coalesce("plang", F.lit("und")).alias("predicted_lang"))
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Token frequency
# ---------------------------------------------------------------------------


@register(
    "text_token_topk",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({T.DUCK_TOKENS}) AS token FROM documents
    ),
    counts AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
    SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
    FROM counts
    QUALIFY row_number() OVER (ORDER BY n DESC, token) <= {TOP_TOKENS}
    """,
    tags=("text", "tokens", "llm-pipeline"),
    bench=True,
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 token frequencies. Explode → partial-agg map-side
    → ``orderBy().limit(k)``, which plans as TakeOrderedAndProject:
    each partition keeps only its local top-k and the driver merges k
    rows per partition — no global-window single-partition funnel even
    at web-corpus vocabulary sizes. The rank is then computed over the
    ≤ k survivors (that window IS bounded, so its single partition is
    fine). (Whitespace tokenizer; a BPE-style regex tokenizer drops in
    by swapping the split pattern.)"""
    toks = _with_tokens(_docs(spark, sf_dir)).select(F.explode("w").alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    topk = counts.orderBy(F.col("n").desc(), F.col("token")).limit(TOP_TOKENS)
    w = W.orderBy(F.col("n").desc(), F.col("token"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("token", "n", "rank")
    )


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------


@register(
    "text_fingerprint",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {TWIN_OFFSET}, upper(text) FROM documents
    ),
    fps AS (
      SELECT doc_id,
             md5(array_to_string(list_slice({T.DUCK_TOKENS}, 1, {FINGERPRINT_TOKENS}), ' '))
               AS fingerprint
      FROM corpus
    )
    SELECT fingerprint, min(doc_id) AS keep_doc_id, count(*) AS n_docs
    FROM fps
    GROUP BY fingerprint
    """,
    tags=("text", "fingerprint", "dedup", "llm-pipeline"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix fingerprint (md5 of the first 5 normalized tokens) —
    the cheap candidate-grouping pass a dedup pipeline runs before
    expensive pairwise verification. Corpus includes case-mangled
    twins so fingerprint groups actually collapse (n_docs = 2).

    Shuffle carries only (fingerprint, doc_id); min/count are partial
    map-side — the same scale shape as dedup_exact."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    twins = docs.select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"), F.upper("text").alias("text")
    )
    corpus = docs.unionByName(twins)
    fp = F.md5(F.array_join(F.slice(F.expr(T.SPARK_TOKENS), 1, FINGERPRINT_TOKENS), " "))
    return (
        corpus.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
    )
