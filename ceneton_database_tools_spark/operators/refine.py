"""Corpus refinement operators (round 5): the RefinedWeb/Gopher-style
filters a large-scale training-data pipeline runs between raw ingest
and dedup — passage-level duplicate measurement, composite rule-based
quality filtering, and bigram language-model scoring.

These extend the reference's data-processing surface (the reference,
``/root/reference/src/ceneton_database_utils``, stops at ingest; the
LLM-pipeline operators are the driver-mandated extensions) with three
shapes every web-scale curation pipeline needs:

* passage dedup — the CCNet/RefinedWeb "shared-span" measurement:
  hash fixed-size token windows, count cross-document repetition,
  score each document by its duplicated-passage fraction;
* a Gopher-style composite filter — several cheap per-document rules
  (length bounds, mean word length, stopword presence, repetition)
  evaluated in one map pass, each rule reported separately so the
  pipeline can tune thresholds from the rule-level pass rates;
* bigram LM scoring — the add-one-smoothed conditional-probability
  upgrade of the unigram perplexity filter;
* passage scrub — the write-side of passage dedup: rebuild the corpus
  with every cross-document duplicated span kept only in its owner
  document.

All four are pure DataFrame compositions (no UDFs): tokenization,
hashing and rule math are codegen'd JVM expressions; the only shuffles
are key-partitioned aggregates/joins that carry hashes and counts,
never document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators import _textutil as T
from ceneton_database_tools_spark.operators.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Passage-level duplicate measurement (RefinedWeb / CCNet shape)
# ---------------------------------------------------------------------------

_PASSAGE = 8  # tokens per passage window (stride = window: disjoint chunks)

# Spark: 1-based slice; chunk i covers tokens [i*8+1, i*8+8].
_SPARK_PASSAGES = (
    f"transform(sequence(0, CAST(ceil(size(w) / {_PASSAGE}.0) AS INT) - 1), "
    f"i -> md5(array_join(slice(w, i * {_PASSAGE} + 1, {_PASSAGE}), ' ')))"
)
# DuckDB: range(0, n) is exclusive; list_slice is 1-based inclusive.
_DUCK_PASSAGES = (
    f"[md5(array_to_string(list_slice(w, i * {_PASSAGE} + 1, i * {_PASSAGE} + {_PASSAGE}), ' ')) "
    f"for i in range(0, CAST(ceil(len(w) / {_PASSAGE}.0) AS INT))]"
)


@register(
    "text_passage_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {T.DUCK_TOKENS} AS w FROM documents
    ),
    pas AS (
      SELECT doc_id, lang, unnest({_DUCK_PASSAGES}) AS ph FROM toks
    ),
    pairs AS (SELECT DISTINCT doc_id, lang, ph FROM pas),
    freq AS (
      SELECT ph, count(*) AS n_docs_with FROM pairs GROUP BY ph
    )
    SELECT p.doc_id,
           p.lang,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN f.n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           round(sum(CASE WHEN f.n_docs_with >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS shared_frac,
           CAST(CASE WHEN sum(CASE WHEN f.n_docs_with >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) <= 0.5 THEN 1 ELSE 0 END AS INT) AS keep
    FROM pairs p JOIN freq f USING (ph)
    GROUP BY p.doc_id, p.lang
    """,
    tags=("text", "dedup", "llm-pipeline"),
    bench=True,
)
def text_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level duplicate measurement: split each document into
    disjoint 8-token windows, md5 each window, count how many DISTINCT
    documents contain each window hash, and score every document by the
    fraction of its passages that appear in at least one other
    document (``shared_frac``; ``keep`` drops documents that are
    mostly recycled spans — the CCNet/RefinedWeb "duplicated
    paragraph" filter, re-expressed over token windows because the
    synthetic corpus is single-line).

    Scale shape: the only data that ever shuffles is ``(passage_md5,
    doc_id)`` pairs — 16-byte hashes, never text. Two hash aggregates
    (distinct pairs, then per-hash doc counts, both map-side partial)
    and one hash-key equi-join back to the pairs; per-doc rollup is a
    third partial-aggregated groupBy. At 100 TB the frequency table is
    the corpus's distinct-passage count — orders of magnitude smaller
    than the corpus, and AQE broadcasts it if it fits.

    Reference parity: extension (no passage surface in the reference);
    algorithm per RefinedWeb §"deduplication" / CCNet paragraph dedup.
    """
    toks = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.expr(T.SPARK_TOKENS).alias("w")
    )
    pairs = (
        toks.select("doc_id", "lang", F.explode(F.expr(_SPARK_PASSAGES)).alias("ph"))
        .distinct()
    )
    freq = pairs.groupBy("ph").agg(F.count("*").alias("n_docs_with"))
    shared = F.sum(F.when(F.col("n_docs_with") >= 2, 1).otherwise(0))
    return (
        pairs.join(freq, "ph")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_passages"),
            shared.cast("long").alias("n_shared"),
            F.round(shared.cast("double") / F.count("*"), 4).alias("shared_frac"),
            (shared.cast("double") / F.count("*") <= 0.5)
            .cast("int")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style composite quality filter
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "data", "table")  # corpus-appropriate stopword list


@register(
    "text_gopher_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {T.DUCK_TOKENS} AS w FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
        CAST(len(w) AS BIGINT) AS n_tokens,
        round(list_sum(list_transform(w, x -> len(x)))::DOUBLE / len(w), 4)
          AS mean_word_len,
        CAST(len(list_filter(w, x -> list_contains(
          ['the', 'a', 'data', 'table'], x))) AS BIGINT) AS n_stopwords,
        round(len(list_distinct(w))::DOUBLE / len(w), 4) AS distinct_frac
      FROM toks
    )
    SELECT doc_id, lang, n_tokens, mean_word_len, n_stopwords, distinct_frac,
      CAST(CASE WHEN n_tokens BETWEEN 15 AND 400 THEN 1 ELSE 0 END AS INT)
        AS r_length,
      CAST(CASE WHEN mean_word_len BETWEEN 2.5 AND 8.0 THEN 1 ELSE 0 END AS INT)
        AS r_word_len,
      CAST(CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END AS INT) AS r_stopwords,
      CAST(CASE WHEN distinct_frac >= 0.2 THEN 1 ELSE 0 END AS INT)
        AS r_repetition,
      CAST(CASE WHEN n_tokens BETWEEN 15 AND 400
                 AND mean_word_len BETWEEN 2.5 AND 8.0
                 AND n_stopwords >= 2
                 AND distinct_frac >= 0.2 THEN 1 ELSE 0 END AS INT) AS keep
    FROM feat
    """,
    tags=("text", "quality", "llm-pipeline"),
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality filter: four cheap per-document
    rules — token-count bounds, mean word length bounds, minimum
    stopword count, minimum distinct-token fraction — each reported as
    its own 0/1 column plus the conjunction (``keep``). Reporting the
    rules separately is what makes the filter tunable: the pipeline
    reads per-rule pass rates before committing to thresholds
    (Gopher / MassiveText filtering rules, Rae et al. 2021, Table A1).

    Scale shape: one map-only pass — every feature is an array
    expression over the token split inside the scan stage; zero
    shuffles, zero UDFs. mean_word_len divides by len(w), which the
    whitespace-split of a trimmed non-empty string guarantees >= 1.
    """
    toks = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.expr(T.SPARK_TOKENS).alias("w")
    )
    n_tokens = F.size("w").cast("long")
    sum_len = F.expr("aggregate(transform(w, x -> length(x)), 0, (acc, x) -> acc + x)")
    mean_word_len = F.round(sum_len.cast("double") / F.size("w"), 4)
    sw_lit = ", ".join(f"'{s}'" for s in _STOPWORDS)
    n_stopwords = F.expr(
        f"size(filter(w, x -> array_contains(array({sw_lit}), x)))"
    ).cast("long")
    distinct_frac = F.round(
        F.size(F.array_distinct("w")).cast("double") / F.size("w"), 4
    )
    feat = toks.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        n_stopwords.alias("n_stopwords"),
        distinct_frac.alias("distinct_frac"),
    )
    r_length = F.col("n_tokens").between(15, 400)
    r_word_len = F.col("mean_word_len").between(2.5, 8.0)
    r_stopwords = F.col("n_stopwords") >= 2
    r_repetition = F.col("distinct_frac") >= 0.2

    # when/otherwise, not a bare cast: a NULL-text document has NULL
    # metrics, and a quality rule that cannot evaluate has FAILED (0),
    # never NULL — the filter must make a keep/drop decision for every
    # document (and the oracle's CASE ... ELSE 0 says the same)
    def _rule(cond):
        return F.when(cond, 1).otherwise(0)

    return feat.select(
        "*",
        _rule(r_length).alias("r_length"),
        _rule(r_word_len).alias("r_word_len"),
        _rule(r_stopwords).alias("r_stopwords"),
        _rule(r_repetition).alias("r_repetition"),
        _rule(r_length & r_word_len & r_stopwords & r_repetition).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring (perplexity-filter upgrade)
# ---------------------------------------------------------------------------


@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {T.DUCK_TOKENS} AS w FROM documents
    ),
    big AS (
      SELECT doc_id, lang, unnest([w[i] || ' ' || w[i+1]
                                   for i in range(1, len(w))]) AS bg
      FROM toks WHERE len(w) >= 2
    ),
    bfreq AS (SELECT bg, count(*) AS c2 FROM big GROUP BY bg),
    cfreq AS (
      SELECT string_split(bg, ' ')[1] AS w1, sum(c2) AS c1
      FROM bfreq GROUP BY 1
    ),
    vocab AS (
      SELECT count(DISTINCT token) AS v
      FROM (SELECT unnest(w) AS token FROM toks)
    ),
    per_doc AS (
      SELECT b.doc_id, b.lang,
             CAST(floor(
               CAST(sum(CAST(floor(
                 ln((f.c2 + 1)::DOUBLE / (cf.c1 + vocab.v)) * 100000000 + 0.5
               ) AS BIGINT)) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS lp_q
      FROM big b
      JOIN bfreq f USING (bg)
      JOIN cfreq cf ON string_split(b.bg, ' ')[1] = cf.w1
      CROSS JOIN vocab
      GROUP BY b.doc_id, b.lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(floor(CAST(sum(lp_q) AS DOUBLE) / count(*) / 10000 + 0.5) AS DOUBLE)
             / 10000.0 AS avg_logprob,
           CAST(floor(CAST(min(lp_q) AS DOUBLE) / 10000 + 0.5) AS DOUBLE)
             / 10000.0 AS min_logprob,
           CAST(floor(CAST(max(lp_q) AS DOUBLE) / 10000 + 0.5) AS DOUBLE)
             / 10000.0 AS max_logprob
    FROM per_doc
    GROUP BY lang
    """,
    tags=("text", "quality", "llm-pipeline"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing: train
    bigram counts on the corpus itself, score each document by its
    mean ln P(w_i | w_{i-1}) = ln((c(w1,w2)+1) / (c1(w1)+V)), and
    report the per-language distribution — the conditional-probability
    upgrade of ``text_unigram_logprob`` (a much sharper fluency signal
    than unigram frequency for perplexity-style filtering). Documents
    with fewer than two tokens have no bigrams and are excluded, on
    both engines, by construction.

    Scale shape: LM "training" is one bigram-count aggregate (map-side
    partial; the context-count table c1 derives from the bigram table,
    not a second corpus pass). Scoring joins bigram occurrences to the
    two frequency tables on the bigram / context keys — AQE broadcasts
    them when the vocabulary fits, shuffle-joins otherwise. Per-doc
    and per-language rollups follow the exact-integer quantization
    discipline of the unigram scorer (ints on a 1e8 ln-grid, floor
    (x+0.5) everywhere — see text_unigram_logprob's caveat on libm).
    """
    toks = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.expr(T.SPARK_TOKENS).alias("w")
    )
    big = (
        toks.where(F.size("w") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2), "
                    "i -> concat(w[i], ' ', w[i+1]))"
                )
            ).alias("bg"),
        )
    )
    bfreq = big.groupBy("bg").agg(F.count("*").alias("c2"))
    cfreq = (
        bfreq.groupBy(F.expr("split(bg, ' ')[0]").alias("w1"))
        .agg(F.sum("c2").alias("c1"))
    )
    vocab = (
        toks.select(F.explode("w").alias("token"))
        .agg(F.countDistinct("token").alias("v"))
    )
    lp_q = F.expr(
        "CAST(floor(ln(CAST(c2 + 1 AS DOUBLE) / (c1 + v)) * 100000000 + 0.5) AS BIGINT)"
    )
    per_doc = (
        big.join(bfreq, "bg")
        .join(cfreq, F.expr("split(bg, ' ')[0]") == F.col("w1"))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "lang")
        .agg(F.sum(lp_q).alias("s"), F.count("*").alias("c"))
        .select(
            "doc_id",
            "lang",
            F.expr("CAST(floor(CAST(s AS DOUBLE) / c + 0.5) AS BIGINT)").alias("lp_q"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(
            "CAST(floor(CAST(sum(lp_q) AS DOUBLE) / count(*) / 10000 + 0.5) AS DOUBLE) / 10000.0"
        ).alias("avg_logprob"),
        F.expr(
            "CAST(floor(CAST(min(lp_q) AS DOUBLE) / 10000 + 0.5) AS DOUBLE) / 10000.0"
        ).alias("min_logprob"),
        F.expr(
            "CAST(floor(CAST(max(lp_q) AS DOUBLE) / 10000 + 0.5) AS DOUBLE) / 10000.0"
        ).alias("max_logprob"),
    )


# Passage texts (not hashes) for the scrub variant: slice i covers
# tokens [i*8+1, i*8+8] (1-based), joined back with single spaces.
_SPARK_PASSAGE_TEXTS = (
    f"transform(sequence(0, CAST(ceil(size(w) / {_PASSAGE}.0) AS INT) - 1), "
    f"i -> array_join(slice(w, i * {_PASSAGE} + 1, {_PASSAGE}), ' '))"
)
_DUCK_PASSAGE_TEXTS = (
    f"[array_to_string(list_slice(w, i * {_PASSAGE} + 1, i * {_PASSAGE} + {_PASSAGE}), ' ') "
    f"for i in range(0, CAST(ceil(len(w) / {_PASSAGE}.0) AS INT))]"
)


@register(
    "text_passage_scrub",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {T.DUCK_TOKENS} AS w FROM documents
    ),
    pas AS (
      SELECT doc_id, lang,
             unnest(range(0, CAST(ceil(len(w) / {_PASSAGE}.0) AS INT))) AS idx,
             unnest({_DUCK_PASSAGE_TEXTS}) AS ptext
      FROM toks
    ),
    hashed AS (SELECT *, md5(ptext) AS ph FROM pas),
    owner AS (SELECT ph, min(doc_id) AS owner_doc FROM hashed GROUP BY ph)
    SELECT h.doc_id, h.lang,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN h.doc_id = o.owner_doc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           coalesce(string_agg(
             CASE WHEN h.doc_id = o.owner_doc THEN h.ptext END, ' '
             ORDER BY h.idx), '') AS cleaned_text
    FROM hashed h JOIN owner o USING (ph)
    GROUP BY h.doc_id, h.lang
    """,
    tags=("text", "dedup", "llm-pipeline"),
)
def text_passage_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-side of passage dedup: REBUILD the corpus with every
    cross-document duplicated passage kept only in its owner document
    (the lowest doc_id containing it) and removed everywhere else —
    each 8-token window survives exactly once corpus-wide, and each
    document comes back as its surviving passages re-joined in
    original order (of the lower+trim-normalized text; within-document
    repeats are the owner's own and are kept). ``n_kept``/``
    n_passages`` give the per-doc retention rate.

    Scale shape: the corpus-wide state is the passage→owner table —
    md5 keys and a min(doc_id), built by one map-side-combined hash
    aggregate; the scrub is an equi-join on the hash key. The
    reconstruction aggregate carries struct(idx, passage) per doc and
    sorts WITHIN each document's group (array_sort on the collected
    list — bounded by document length, never a global order). This is
    the join-then-rebuild shape that scrubs a 100 TB corpus in one
    pass over it plus one pass over the (much smaller) passage table.
    """
    toks = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.expr(T.SPARK_TOKENS).alias("w")
    )
    pas = toks.select(
        "doc_id",
        "lang",
        F.posexplode(F.expr(_SPARK_PASSAGE_TEXTS)).alias("idx", "ptext"),
    ).withColumn("ph", F.md5("ptext"))
    owner = pas.groupBy("ph").agg(F.min("doc_id").alias("owner_doc"))
    marked = pas.join(owner, "ph").withColumn(
        "kept", F.col("doc_id") == F.col("owner_doc")
    )
    return marked.groupBy("doc_id", "lang").agg(
        F.count("*").cast("long").alias("n_passages"),
        F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort("
            "collect_list(CASE WHEN kept THEN struct(idx, ptext) END)"
            "), x -> x.ptext), ' ')"
        ).alias("cleaned_text"),
    )


# ---------------------------------------------------------------------------
# Intra-document repeated-passage removal (MassiveText/C4 repetition scrub)
# ---------------------------------------------------------------------------

# The corpus-level passage ops above dedup ACROSS documents; this one
# dedups WITHIN each document — the C4/MassiveText repetition scrub
# that strips boilerplate a page repeats internally (navigation blocks,
# chorus lines, crawler echo). Eval corpus: documents ∪ self-repetition
# twins (token stream doubled), so exactly half of every twin's chunks
# are drops and the oracle verifies the kept SEQUENCE byte-for-byte.
# intradoc twin ids are DERIVED (T.derived_twin_offset / the oracle's
# closed-form subquery) — same contract note as operators/dedup.py


@register(
    "text_intradoc_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {{DUCK_TOKENS}} AS w FROM documents
      UNION ALL
      SELECT doc_id + {T.DUCK_TWIN_OFFSET_DOCS}, list_concat(al, al)
      FROM (
        SELECT doc_id,
               w[1:greatest(len(w) - len(w) % {_PASSAGE},
                            least(len(w), {_PASSAGE}))] AS al
        FROM (SELECT doc_id, {{DUCK_TOKENS}} AS w FROM documents)
      )
    ),
    chunked AS (
      SELECT doc_id, {_DUCK_PASSAGES} AS ph FROM toks
    ),
    kept AS (
      SELECT doc_id, ph,
             [ph[i] for i in range(1, len(ph) + 1)
              if list_position(ph[1:i-1], ph[i]) = 0] AS kh
      FROM chunked
    )
    SELECT doc_id,
           CAST(len(ph) AS BIGINT) AS n_chunks,
           CAST(len(kh) AS BIGINT) AS n_kept,
           CAST(floor((len(ph) - len(kh)) * 10000.0 / len(ph) + 0.5) AS DOUBLE)
             / 10000 AS dup_ratio,
           md5(array_to_string(kh, '|')) AS kept_md5
    FROM kept
    """.replace("{DUCK_TOKENS}", T.DUCK_TOKENS),
    tags=("text", "dedup", "refine", "llm-pipeline"),
)
def text_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-passage removal: token stream → disjoint
    8-token chunks → keep each chunk only at its FIRST occurrence inside
    the same document, preserving order. ``kept_md5`` hashes the kept
    chunk sequence so the gate verifies the exact scrub output, not just
    the counts.

    Scale shape: zero shuffles and zero UDFs — chunking, first-occurrence
    detection (an indexed ``filter`` probing the chunk prefix), and the
    output hash are all codegen'd array expressions in the scan stage.
    The prefix probe is O(chunks²) per document, bounded by document
    length, never by corpus size — the per-row cost a 1000-executor scan
    absorbs without a single byte moving.
    """
    base = _docs(spark, sf_dir)
    off = T.derived_twin_offset(spark, sf_dir)
    docs = base.select("doc_id", F.expr(T.SPARK_TOKENS).alias("w"))
    twins = docs.select(
        (F.col("doc_id") + off).alias("doc_id"),
        F.expr(
            # CHUNK-ALIGNED prefix doubled (full chunks only), so every
            # twin chunk repeats exactly once and dup_ratio is 0.5 by
            # construction; sub-chunk docs double unaligned
            # (deterministic, and verified all the same)
            f"concat(slice(w, 1, greatest(size(w) - size(w) % {_PASSAGE},"
            f" least(size(w), {_PASSAGE}))),"
            f" slice(w, 1, greatest(size(w) - size(w) % {_PASSAGE},"
            f" least(size(w), {_PASSAGE}))))"
        ).alias("w"),
    )
    corpus = docs.unionByName(twins)
    chunked = corpus.select("doc_id", F.expr(_SPARK_PASSAGES).alias("ph"))
    kept = chunked.select(
        "doc_id",
        "ph",
        # (c, i): Spark's indexed filter lambda; i is 0-based, so
        # slice(ph, 1, i) is exactly the chunk prefix before position i
        F.expr(
            "filter(ph, (c, i) -> array_position(slice(ph, 1, i), c) = 0)"
        ).alias("kh"),
    )
    return kept.select(
        "doc_id",
        F.size("ph").cast("long").alias("n_chunks"),
        F.size("kh").cast("long").alias("n_kept"),
        F.expr(
            "CAST(floor((size(ph) - size(kh)) * 10000.0 / size(ph) + 0.5) AS DOUBLE)"
            " / 10000"
        ).alias("dup_ratio"),
        F.md5(F.array_join("kh", "|")).alias("kept_md5"),
    )
