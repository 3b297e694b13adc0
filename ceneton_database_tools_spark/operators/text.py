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
# twin ids are DERIVED (T.derived_twin_offset / T.DUCK_TWIN_OFFSET_DOCS
# in the oracles) — see the contract note in operators/dedup.py


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
      CAST(floor(CAST(sum(n_chars) AS DOUBLE) * 100 / count(*) + 0.5)
           AS DOUBLE) / 100                       AS avg_chars,
      CAST(floor(CAST(sum(len({T.DUCK_TOKENS})) AS DOUBLE) * 100 / count(*) + 0.5)
           AS DOUBLE) / 100                       AS avg_tokens,
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
            F.expr(
                "CAST(floor(CAST(sum(n_chars) AS DOUBLE) * 100 / count(*) + 0.5)"
                " AS DOUBLE) / 100"
            ).alias("avg_chars"),
            F.expr(
                "CAST(floor(CAST(sum(size(w)) AS DOUBLE) * 100 / count(*) + 0.5)"
                " AS DOUBLE) / 100"
            ).alias("avg_tokens"),
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
             regexp_extract_all(text, '{_BPE_PATTERN}') AS bpe
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
           CAST(CASE WHEN (len(bpe)::DOUBLE / len(w)) < 0 THEN -floor(-(len(bpe)::DOUBLE / len(w)) * 10000 + 0.5) ELSE  floor( (len(bpe)::DOUBLE / len(w)) * 10000 + 0.5) END AS DOUBLE) / 10000 AS bpe_per_ws
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
            T.quantize_col(F.size("bpe").cast("double") / F.size("w"), 4).alias("bpe_per_ws"),
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
        CAST(CASE WHEN (len(list_distinct(w)) / len(w)) < 0 THEN -floor(-(len(list_distinct(w)) / len(w)) * 10000 + 0.5) ELSE  floor( (len(list_distinct(w)) / len(w)) * 10000 + 0.5) END AS DOUBLE) / 10000 AS type_token_ratio,
        CAST(CASE WHEN (list_sum(list_transform(w, x -> len(x))) / len(w)) < 0 THEN -floor(-(list_sum(list_transform(w, x -> len(x))) / len(w)) * 10000 + 0.5) ELSE  floor( (list_sum(list_transform(w, x -> len(x))) / len(w)) * 10000 + 0.5) END AS DOUBLE) / 10000 AS avg_token_len
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
    ttr = T.quantize_col(n_types / n_tokens, 4)
    sum_len = F.expr("aggregate(transform(w, x -> length(x)), 0, (acc, x) -> acc + x)")
    atl = T.quantize_col(sum_len / n_tokens, 4)
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
      -- lang IS NOT NULL: an unlabeled document cannot TRAIN a
      -- profile (no label to learn); it is still scored and predicted.
      -- Letting the NULL group train creates a NULL plang whose
      -- tie-break ordering diverges between engines (Spark NULLS
      -- FIRST vs DuckDB NULLS LAST) and conflates "predicted the
      -- NULL-labeled language" with "no prediction" at the coalesce.
      SELECT lang AS plang, token
      FROM (SELECT lang, token, count(*) AS n FROM toks
            WHERE lang IS NOT NULL GROUP BY lang, token)
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
    # unlabeled docs never train a profile (see the oracle note) —
    # they are still scored and predicted below
    counts = (
        toks.where(F.col("lang").isNotNull())
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
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
      SELECT doc_id + {T.DUCK_TWIN_OFFSET_DOCS}, upper(text) FROM documents
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
    off = T.derived_twin_offset(spark, sf_dir)
    twins = docs.select(
        (F.col("doc_id") + off).alias("doc_id"), F.upper("text").alias("text")
    )
    corpus = docs.unionByName(twins)
    fp = F.md5(F.array_join(F.slice(F.expr(T.SPARK_TOKENS), 1, FINGERPRINT_TOKENS), " "))
    return (
        corpus.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling k-gram hash + window-min selection)
# ---------------------------------------------------------------------------

K_GRAM = 8          # character k-gram width
WINNOW_WINDOW = 4   # fingerprints = min hash per window of 4 k-grams
_HASH_MOD = 2147483647  # 2^31-1; Horner step stays < 2^40, no overflow


def _horner_unrolled(char_fn, i_expr: str) -> str:
    """The Rabin-Karp polynomial hash of the k-gram at position
    ``i_expr``, unrolled as k Horner steps with a mod after each step
    (intermediates stay << 2^63). The rolling recurrence
    h_i = (h_{i-1} - c*B^{k-1})*B + c is the streaming optimization of
    THIS same polynomial; evaluating it positionally keeps the SQL
    pure and the output identical. ``char_fn(pos_expr)`` renders the
    code point at a 1-based position."""
    h = "CAST(0 AS BIGINT)"
    for j in range(K_GRAM):
        h = f"(({h}) * 257 + {char_fn(f'{i_expr} + {j}')}) % {_HASH_MOD}"
    return h


# Spark: substr() on UTF8String seeks from the string start (O(i) per
# call → O(n²) per document inside the position lambda — measured 13×
# slower than this form); split the text into a code-point array ONCE
# and read it with O(1) element_at instead.
_SPARK_CODES = "transform(split(txt, ''), c -> ascii(c))"
_SPARK_KH = (
    f"CASE WHEN length(txt) >= {K_GRAM} THEN "
    f"transform(sequence(1, length(txt) - {K_GRAM - 1}), i -> {{h}}) "
    "ELSE array() END"
).format(h=_horner_unrolled(lambda p: f"element_at(cs, {p})", "i"))
# Spark sequence(1, n) DESCENDS when n < 1 — both levels need guards.
def _spark_fps(col: str) -> str:
    """Window-min fingerprint selection over a k-gram hash array
    column (parameterized so base and twin arrays share one
    projection stage — optimization r14)."""
    return (
        f"CASE WHEN size({col}) >= {WINNOW_WINDOW} THEN "
        f"array_distinct(transform(sequence(1, size({col}) - {WINNOW_WINDOW - 1}), "
        f"i -> array_min(slice({col}, i, {WINNOW_WINDOW})))) "
        f"WHEN size({col}) > 0 THEN array(array_min({col})) ELSE array() END"
    )


_SPARK_FPS = _spark_fps("kh")

# DuckDB r15: the same O(1)-per-char fix the Spark side got in r7 —
# per-position ord(substr(txt, p, 1)) walks the string from the start
# (O(len²) per document; the sf0.01 winnow oracle alone cost 2×130 s
# of the test suite, and sf0.1 parity was a documented >2 h abort).
# Split the text into a codepoint list ONCE ('(?s).' matches every
# codepoint incl. newlines; verified equal to substr/ord on empty/
# NUL/newline/combining/CJK/long strings) and index it O(1). Same
# hash values, same rows — only the oracle's complexity changes.
_DUCK_CODES = "list_transform(regexp_extract_all(txt, '(?s).'), c -> ord(c))"
_DUCK_KH = (
    f"[{_horner_unrolled(lambda p: f'cs[{p}]', 'i')} "
    f"for i in range(1, len(cs) - {K_GRAM - 2})]"
)
_DUCK_FPS = (
    f"CASE WHEN len(kh) >= {WINNOW_WINDOW} THEN "
    f"list_distinct([list_min(kh[i:i+{WINNOW_WINDOW - 1}]) "
    f"for i in range(1, len(kh) - {WINNOW_WINDOW - 2})]) "
    "WHEN len(kh) > 0 THEN [list_min(kh)] ELSE [] END"
)

# normalized char stream: tokens rejoined on single spaces, so the twin
# (first token dropped) shares the original's exact character suffix
_SPARK_NORM = f"concat_ws(' ', {T.SPARK_TOKENS})"
_DUCK_NORM = f"array_to_string({T.DUCK_TOKENS}, ' ')"

# Astral-plane scrub: Spark's split('')/ascii() walks UTF-16 units
# while DuckDB's substr/ord walks codepoints, so any char >= U+10000
# (emoji, CJK extensions) would silently desynchronize every k-gram
# hash from that position on. Both engines replace such codepoints
# with '?' before hashing (verified identical on both), keeping the
# fingerprint defined over the BMP char stream.
_ASTRAL = "[\\x{10000}-\\x{10FFFF}]"


@register(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, {_DUCK_NORM} AS txt FROM documents
      UNION ALL
      SELECT doc_id + {T.DUCK_TWIN_OFFSET_DOCS},
             {T.DUCK_DROP_FIRST_TOKEN}
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id, regexp_replace(txt, '{_ASTRAL}', '?', 'g') AS txt FROM corpus
    ),
    coded AS (SELECT doc_id, {_DUCK_CODES} AS cs FROM scrubbed),
    hashed AS (SELECT doc_id, {_DUCK_KH} AS kh FROM coded),
    fps AS (SELECT doc_id, {_DUCK_FPS} AS fp FROM hashed),
    twin_fps AS (
      -- r15: shift the twin ids in a PROJECTION so the pairing is a
      -- plain equi-join; the former `b.doc_id = a.doc_id + (scalar
      -- subquery)` condition planned as a blockwise NL join that
      -- re-evaluated the whole winnowing chain per PAIR (71 s of the
      -- oracle's 72 s at sf0.01)
      SELECT doc_id - {T.DUCK_TWIN_OFFSET_DOCS} AS doc_id, fp
      FROM fps WHERE doc_id >= {T.DUCK_TWIN_OFFSET_DOCS}
    ),
    paired AS (
      SELECT a.doc_id,
             len(a.fp) AS n_fp,
             len(b.fp) AS n_fp_twin,
             len(list_intersect(a.fp, b.fp))::DOUBLE /
               (len(a.fp) + len(b.fp) - len(list_intersect(a.fp, b.fp))) AS j
      FROM fps a JOIN twin_fps b USING (doc_id)
      WHERE len(a.fp) > 0 AND len(b.fp) > 0
    )
    SELECT doc_id,
           CAST(n_fp AS BIGINT)      AS n_fp,
           CAST(n_fp_twin AS BIGINT) AS n_fp_twin,
           CAST(CASE WHEN (j) < 0 THEN -floor(-(j) * 1000000 + 0.5) ELSE  floor( (j) * 1000000 + 0.5) END AS DOUBLE) / 1000000 AS fp_jaccard
    FROM paired
    WHERE j >= 0.5
    """,
    tags=("text", "fingerprint", "dedup", "llm-pipeline"),
    bench=True,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): a
    Rabin-Karp polynomial hash over every character 8-gram, then the
    minimum hash of each 4-hash sliding window, deduplicated — a
    position-robust fingerprint set. The eval pairs each document with
    its first-token-dropped twin: a PREFIX fingerprint breaks on any
    shift (text_fingerprint's failure mode), while ~all winnowed
    fingerprints survive, so the twin comparison reports fingerprint
    Jaccard ≥ 0.5 for essentially the whole corpus.

    Everything is built-in expression work inside the scan stage
    (transform/slice/array_min over codegen'd arrays — no explode; the
    twin's hash array is a suffix slice of the base's, so base and
    twin fingerprints come out of ONE hashing pass with no join at
    all); at 100 TB the fingerprint sets feed an inverted index
    (explode → bucket join), exactly the LSH-bucket shape
    dedup_minhash_lsh already implements.
    """
    docs = _docs(spark, sf_dir)
    base = docs.select("doc_id", F.expr(_SPARK_NORM).alias("txt"))
    # Plan-shape discipline: the winnowing expression tree is LARGE (an
    # unrolled 8-step Horner inside two nested transforms), and fp/kh/cs
    # each appear several times in their consumers — any optimizer
    # substitution that inlines them multiplies the tree (a pre-fix
    # `where(size(fp) > 0)` pushed through the projection made analysis
    # hang). Each stage below is one select whose downstream references
    # are plain attributes; no filter sits between the expensive
    # projections.
    # The hashing is by far the most expensive per-row projection in
    # this module; a small single-file input arrives as ONE partition,
    # which would serialize it on one core. Repartitioning costs a tiny
    # shuffle of raw texts and buys full-core parallelism; at real
    # scale the input already has enough partitions and this coalesces
    # into normal narrow execution.
    #
    # Optimization r14 (guide §1.2 "the distributed algorithm"): the
    # twin's normalized text is EXACTLY the base's normalized text
    # with the first token and its following space removed — a
    # character SUFFIX. Rabin-Karp k-gram hashes are positional, so
    # the twin's hash array is a suffix SLICE of the base's:
    # kh_twin = kh[q+1:], q = locate(' ', txt) (astral scrubbing is
    # per-character and never touches a space, so the cut survives
    # it). One Horner pass per document therefore yields BOTH
    # fingerprint sets, replacing the previous two full hashing
    # passes plus a doc_id equi-join (2 repartitions + 1 shuffle
    # join) with a single embarrassingly-parallel projection.
    n_parts = spark.sparkContext.defaultParallelism
    _KH_TWIN = (
        "CASE WHEN q > 0 THEN slice(kh, q + 1, greatest(size(kh) - q, 0)) "
        "ELSE array() END"
    )
    sized = (
        base.repartition(n_parts, "doc_id")
        .select(
            "doc_id",
            F.regexp_replace("txt", _ASTRAL, "?").alias("txt"),
        )
        .select("doc_id", F.expr(_SPARK_CODES).alias("cs"), "txt")
        .select(
            "doc_id",
            F.expr(_SPARK_KH).alias("kh"),
            F.expr("locate(' ', txt)").alias("q"),
        )
        .select("doc_id", "kh", F.expr(_KH_TWIN).alias("kh_b"))
        .select(
            "doc_id",
            F.expr(_spark_fps("kh")).alias("fp"),
            F.expr(_spark_fps("kh_b")).alias("fp_b"),
        )
        .select(
            "doc_id",
            F.size(F.array_intersect("fp", "fp_b")).alias("ni"),
            F.size("fp").alias("na"),
            F.size("fp_b").alias("nb"),
        )
        # Aggregate as the PUSHDOWN BARRIER: without the join of the
        # pre-r14 shape, PushPredicateThroughNonJoin would sink the
        # j >= 0.5 filter through every projection above, substituting
        # aliases at each step — the winnowing tree multiplies
        # exponentially and optimization never terminates (measured:
        # any filter over this chain hangs >5 min at sf0.001).
        # Predicates cannot push below an Aggregate except on grouping
        # keys, and doc_id is unique, so min() over a single-row group
        # is the identity; the agg reuses the doc_id hash partitioning
        # already established for parallelism.
        .groupBy("doc_id")
        .agg(
            F.min("ni").alias("ni"),
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
        )
    )
    # CASE-guarded division: a doc with ZERO fingerprints (empty or
    # sub-k-gram text) meets its equally-empty twin with denominator 0
    # — ANSI mode raises DIVIDE_BY_ZERO. The guard yields NULL there,
    # which the j >= 0.5 filter drops, matching the oracle's
    # len(fp) > 0 exclusion. (A size(fp) > 0 filter instead of a guard
    # re-inlines the giant winnowing tree — the analysis-hang case the
    # comment above documents.)
    denom = F.col("na") + F.col("nb") - F.col("ni")
    j = F.when(denom > 0, F.col("ni").cast("double") / denom)
    return (
        sized.withColumn("j", j)
        .where(F.col("j") >= 0.5)
        .select(
            "doc_id",
            F.col("na").cast("long").alias("n_fp"),
            F.col("nb").cast("long").alias("n_fp_twin"),
            T.quantize_col(F.col("j"), 6).alias("fp_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection + scrubbing
# ---------------------------------------------------------------------------

# Deliberately dialect-portable regexes: every construct below (\b, \d,
# character classes, bounded quantifiers) means the same thing in
# Java's regex (Spark) and RE2 (DuckDB), so one pattern string drives
# both engines.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

# Synthetic, doc_id-derived contact block appended to every non-NULL
# document so the scrub path is exercised on real matches (the corpus
# itself is PII-free); NULL text stays NULL through concat in BOTH
# engines, preserving the corpus's hostile-fixture behavior.
_PII_AUG_SPARK = (
    "concat(text, ' Contact user', CAST(doc_id AS STRING),"
    " '@mail.example.com or 10.', CAST(doc_id % 200 AS STRING),"
    " '.0.', CAST(doc_id % 250 AS STRING),"
    " ' tel 555-', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'),"
    " '-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
)
_PII_AUG_DUCK = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 250 AS VARCHAR)"
    " || ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "text_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id, """ + _PII_AUG_DUCK + """ AS t FROM documents
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(t, '""" + _PII_EMAIL + """')) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(t, '""" + _PII_IPV4 + """')) AS BIGINT)  AS n_ipv4,
      CAST(len(regexp_extract_all(t, '""" + _PII_PHONE + """')) AS BIGINT) AS n_phone,
      md5(regexp_replace(regexp_replace(regexp_replace(t,
            '""" + _PII_EMAIL + """', '<EMAIL>', 'g'),
            '""" + _PII_IPV4 + """', '<IP>', 'g'),
            '""" + _PII_PHONE + """', '<PHONE>', 'g')) AS scrub_md5
    FROM aug
    """,
    tags=("text", "pii", "llm-pipeline", "scrub"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII DETECTION + REDACTION — the scrub pass every training-data
    pipeline runs before anything else: per-document counts of emails,
    IPv4 addresses, and phone numbers, plus the md5 of the text after
    chained placeholder redaction (email → ip → phone, so the hash
    gates the exact replacement semantics, not just the counts). The
    corpus carries no real PII, so a deterministic doc_id-derived
    contact block is appended first — identically on both engines —
    guaranteeing every non-NULL document exercises all three patterns;
    NULL text rides NULL concat to NULL counts and a NULL hash.

    Pure map-side JVM regex per document — no shuffle, no UDF, no
    explode: the 100 TB shape is 'one pass over the corpus, codegen
    end to end'."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_PII_AUG_SPARK).alias("t")
    )
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    return docs.select(
        "doc_id",
        F.regexp_count("t", F.lit(_PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count("t", F.lit(_PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count("t", F.lit(_PII_PHONE)).cast("long").alias("n_phone"),
        F.md5(scrub).alias("scrub_md5"),
    )
