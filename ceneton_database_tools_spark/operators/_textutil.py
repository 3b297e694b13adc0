"""Shared text-normalization / hashing SQL fragments for the LLM-data
pipeline operators (dedup / similarity / text analysis).

Every fragment exists in TWO dialects — Spark SQL (used via ``F.expr``)
and DuckDB SQL (used in the oracle strings) — engineered so both
engines produce bit-identical values:

* tokens: split on ``\\s+`` after lower+trim — same regex semantics;
* hashes: ``md5`` hex strings, compared/min'd lexicographically
  (lowercase-hex ASCII orders identically under both engines'
  binary string collation) — this makes MinHash/SimHash portable
  without sharing a numeric hash implementation;
* dot products: explicit left-associated ``a[i]*b[i] + …`` chains over
  ``DOUBLE``-cast arrays, so floating-point summation order is fixed
  by construction on both engines (no reliance on either engine's
  reduction order).
"""

from __future__ import annotations

# -- derived twin-id offset -------------------------------------------------
# The dedup/text/refine eval corpora fabricate twin ids at
# ``id + offset``. Round-13 (VERDICT r12 #6): the offset is DERIVED
# from the data — the smallest positive multiple of 1,000,000 strictly
# above max(id) — with the IDENTICAL closed form on both engines
# (Python ``//`` == DuckDB ``//`` on non-negative ints), so a fixture
# at any scale can never collide twin ids with real ids. At the gate's
# sf <= 0.1 the derived value is exactly the historical 1,000,000
# constant, so every baked oracle result is unchanged.
DUCK_TWIN_OFFSET_DOCS = (
    "(SELECT 1000000 * ((coalesce(max(doc_id), 0) // 1000000) + 1) "
    "FROM documents)"
)
DUCK_TWIN_OFFSET_VECS = (
    "(SELECT 1000000 * ((coalesce(max(vec_id), 0) // 1000000) + 1) "
    "FROM embeddings)"
)

_DERIVED_TWIN_OFFSETS: dict[tuple[str, str, str], int] = {}


def derived_twin_offset(
    spark, sf_dir: str, table: str = "documents", id_col: str = "doc_id"
) -> int:
    """The Spark side of :data:`DUCK_TWIN_OFFSET_DOCS` /
    :data:`DUCK_TWIN_OFFSET_VECS`: one bounded 1-row max aggregate over
    the UNFILTERED table (the oracle subquery scans the full table, so
    deriving from a filtered frame could disagree once the max lives in
    the filtered-out rows), memoized per (application, sf, table). The
    former ``assert_twin_headroom`` guard survives as the internal
    assertion — the derivation makes collision impossible by
    construction, and a violated invariant still fails loudly."""
    from ceneton_database_tools_spark.catalog import load_table

    key = (spark.sparkContext.applicationId, sf_dir, table)
    if key not in _DERIVED_TWIN_OFFSETS:
        from pyspark.sql import functions as F

        mx = load_table(spark, sf_dir, table).agg(F.max(id_col)).first()[0]
        mx = int(mx or 0)
        off = 1_000_000 * (mx // 1_000_000 + 1)
        assert off > mx and off % 1_000_000 == 0, (mx, off)
        _DERIVED_TWIN_OFFSETS[key] = off
    return _DERIVED_TWIN_OFFSETS[key]


# -- tokenization -----------------------------------------------------------
# Spark SQL string literals process backslash escapes → '\\s+' in SQL text.
SPARK_TOKENS = "split(lower(trim(text)), '\\\\s+')"
DUCK_TOKENS = "string_split_regex(lower(trim(text)), '\\s+')"

# -- word-bigram shingles over a token array column `w` ---------------------
# Distinct bigram shingles; single-token docs fall back to the whole text
# as one shingle so the shingle set is never empty.
SPARK_SHINGLES = (
    "CASE WHEN size(w) >= 2 THEN "
    "array_distinct(transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))) "
    "ELSE array(array_join(w, ' ')) END"
)
# coalesce: DuckDB array_to_string([]) is NULL where Spark
# array_join([]) is '' — a zero-token doc (empty text, or the
# drop-first-token twin of a single-token doc) must shingle to ['']
# on BOTH engines or every degenerate doc desyncs the fuzzy-dedup
# family (found by the perturbed-data gate, round 6)
DUCK_SHINGLES = (
    "CASE WHEN len(w) >= 2 THEN "
    "list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) "
    "ELSE [coalesce(array_to_string(w, ' '), '')] END"
)

# -- text with the first token dropped (near-duplicate twin) ----------------
SPARK_DROP_FIRST_TOKEN = (
    "array_join(slice(split(lower(trim(text)), '\\\\s+'), 2, "
    "greatest(size(split(lower(trim(text)), '\\\\s+')) - 1, 0)), ' ')"
)
# coalesce for the same array_to_string([]) → NULL asymmetry as
# DUCK_SHINGLES: the twin of a single-token doc is the EMPTY string,
# not NULL
DUCK_DROP_FIRST_TOKEN = (
    "coalesce(array_to_string(list_slice(string_split_regex(lower(trim(text)), '\\s+'), 2, "
    "len(string_split_regex(lower(trim(text)), '\\s+'))), ' '), '')"
)


def spark_minhash(j: int, shingles: str = "sh") -> str:
    """Spark SQL: MinHash value #j = lexicographic min of seeded md5 hex.

    (Direct formulation — j md5 evaluations per shingle. The dedup
    pipeline uses the single-md5 Carter-Wegman variant below, which is
    ~12× cheaper; this one is kept for callers wanting string mins.)"""
    return f"array_min(transform({shingles}, s -> md5(concat('{j}|', s))))"


def duck_minhash(j: int, shingles: str = "sh") -> str:
    return f"list_aggregate(list_transform({shingles}, s -> md5('{j}|' || s)), 'min')"


# -- single-md5 MinHash: hash each shingle ONCE to a 60-bit int, derive the
# -- j-th "permutation" with integer Carter-Wegman arithmetic (identical
# -- integer semantics on both engines; all values positive).
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1; (P-1)*(2j+1) stays < 2^36

def spark_hash60(s: str) -> str:
    """Spark SQL scalar: the 60-bit shingle hash (md5 → first 15 hex
    digits → BIGINT mod P) applied to one string expression — the same
    per-shingle hash SPARK_HASH_BASE maps over an array."""
    return f"(CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT) % {MINHASH_PRIME})"


SPARK_HASH_BASE = (
    f"transform(sh, s -> CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT) "
    f"% {MINHASH_PRIME})"
)
DUCK_HASH_BASE = (
    f"list_transform(sh, s -> (('0x' || substr(md5(s), 1, 15))::BIGINT) "
    f"% {MINHASH_PRIME})"
)


def spark_minhash_cw(j: int, base: str = "ba") -> str:
    """MinHash #j from the precomputed base-hash array: min over
    shingles of (b*(2j+1) + j*7919) mod P."""
    return (
        f"array_min(transform({base}, b -> (b * {2 * j + 1} + {j * 7919}) % {MINHASH_PRIME}))"
    )


def duck_minhash_cw(j: int, base: str = "ba") -> str:
    return (
        f"list_aggregate(list_transform({base}, "
        f"b -> (b * {2 * j + 1} + {j * 7919}) % {MINHASH_PRIME}), 'min')"
    )


def dot_chain(a: str, b: str, dim: int, one_based: bool) -> str:
    """Left-associated explicit dot-product chain (identical FP order on
    both engines). ``a``/``b`` name DOUBLE-array columns; Spark indexes
    arrays 0-based via ``col[i]``, DuckDB 1-based."""
    off = 1 if one_based else 0
    return " + ".join(f"{a}[{i + off}]*{b}[{i + off}]" for i in range(dim))


def norm_chain(v: str, dim: int, one_based: bool) -> str:
    return f"sqrt({dot_chain(v, v, dim, one_based)})"


def quantize(expr: str, scale: int) -> str:
    """Sign-safe floor quantization of a double to ``scale`` decimals —
    the cross-engine replacement for ``round(x, scale)`` on DERIVED
    doubles (ratios, cosines, z-scores): Spark round() is HALF_UP on
    the shortest decimal repr while DuckDB rounds the raw binary
    double, so they disagree whenever the value's shortest repr lands
    on a half boundary one digit past ``scale``. ``floor`` of the
    bit-identical double is identical on both engines; the sign split
    keeps half-ties away-from-zero (matching round()'s direction) for
    negatives. Valid as the SAME string in Spark SQL and DuckDB."""
    f = 10**scale
    # the divisor must force DOUBLE division: a bare `{f}.0` literal
    # parses as DECIMAL in Spark SQL (decimal literals are exact) and
    # the quotient silently becomes DECIMAL(·, scale+3)
    return (
        f"CAST(CASE WHEN ({expr}) < 0"
        f" THEN -floor(-({expr}) * {f} + 0.5)"
        f" ELSE  floor( ({expr}) * {f} + 0.5) END AS DOUBLE) / {f}"
    )


# -- exact money sum (shared by batch events, streaming events, and all
# their oracle twins — parity depends on these strings staying literally
# identical, so there is exactly ONE rendering) ------------------------------
MONEY_SUM_VALUE = "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)"


def money_sum(col: str) -> str:
    """Exact money sum of a double column: DECIMAL(18,6) hop → exact,
    order-independent decimal addition → ONE decimal-domain HALF_UP
    round → one deterministic decimal→double conversion. A raw
    ``round(sum(double), 2)`` diverges between Spark's shortest-repr
    rounding and DuckDB's binary-double rounding as soon as values
    leave the 2-decimal grid. Valid as the same string in Spark SQL
    and DuckDB."""
    return f"CAST(round(sum(CAST({col} AS DECIMAL(18,6))), 2) AS DOUBLE)"


def quantize_col(col, scale: int):
    """Column-expression form of :func:`quantize` for Spark-side code
    that already holds a ``Column`` (floor of the bit-identical double
    — never engine round())."""
    from pyspark.sql import functions as F

    f = 10**scale
    return (
        F.when(col < 0, -F.floor(-col * f + 0.5)).otherwise(F.floor(col * f + 0.5))
        / float(f)
    )


# -- distinct word-trigram count over a token array column `w` --------------
# (shared by the repetition-ratio operator and the curation quality gate —
# the 30%-distinct threshold only means the same thing in both if the
# trigram definition is literally shared)
SPARK_TRIGRAM_DISTINCT = (
    "size(array_distinct(transform(sequence(0, size(w) - 3), "
    "i -> concat_ws(' ', slice(w, i + 1, 3)))))"
)
DUCK_TRIGRAM_DISTINCT = (
    "len(list_distinct([array_to_string(w[i:i+2], ' ') "
    "for i in range(1, len(w) - 1)]))"
)


def spark_md5_mod(expr: str, modulus: int, hex_digits: int = 15) -> str:
    """Integer hash ``md5(expr)``'s first ``hex_digits`` hex chars as a
    BIGINT, reduced mod ``modulus`` — the cross-engine bucket/sampling
    recipe (pairs with :func:`duck_md5_mod`; same integer semantics on
    both engines, all values non-negative)."""
    return (
        f"CAST(conv(substr(md5({expr}), 1, {hex_digits}), 16, 10) AS BIGINT)"
        f" % {modulus}"
    )


def duck_md5_mod(expr: str, modulus: int, hex_digits: int = 15) -> str:
    return f"(('0x' || substr(md5({expr}), 1, {hex_digits}))::BIGINT) % {modulus}"
