"""Property-based tests (hypothesis): sanitizer invariants and an
FMP-XML build→parse round-trip over generated schemas and values.

The reference ships no tests at all; these pin the behaviors whose
breakage would be silent — name cleaning, null/value fidelity through
the XML parser, and JSONL field order.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape, quoteattr

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ceneton_database_tools_spark.schema import sanitize_name
from ceneton_database_tools_spark.sources.fmp_xml import read_fmp_xml

# -- sanitize_name invariants -------------------------------------------------

names = st.text(min_size=1, max_size=40).filter(lambda s: s.strip())


@given(names)
def test_sanitize_idempotent(name):
    once = sanitize_name(name)
    assert sanitize_name(once) == once


@given(names)
def test_sanitize_output_shape(name):
    import re

    out = sanitize_name(name)
    # lowercase, no uppercase survives
    assert out == out.lower()
    # every non-word run collapsed: output contains only \w characters
    assert re.fullmatch(r"[\w_]*", out), out
    # never starts with a digit
    assert not re.match(r"^\d", out)


# -- FMP XML round-trip -------------------------------------------------------

# XML 1.0-legal text: no control chars except \t \n \r; avoid the
# parser-irrelevant surrogate range.
xml_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), whitelist_characters="\t\n"
    ),
    min_size=0,
    max_size=60,
)
# values: None models an empty <DATA/>; parsers cannot distinguish "" from
# a self-closed tag, so generated values are None or non-empty
values = st.one_of(st.none(), xml_text.filter(lambda s: s != ""))


def build_fmp_xml(field_names: list[str], rows: list[list[str | None]]) -> bytes:
    fields = "\n".join(
        f'    <FIELD EMPTYOK="YES" MAXREPEAT="1" NAME={quoteattr(n)} TYPE="TEXT"/>'
        for n in field_names
    )
    row_xml = []
    for row in rows:
        cols = "".join(
            "<COL/>" if v is None else f"<COL><DATA>{escape(v)}</DATA></COL>" for v in row
        )
        row_xml.append(f'    <ROW MODID="1" RECORDID="1">{cols}</ROW>')
    body = "\n".join(row_xml)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">\n'
        "  <ERRORCODE>0</ERRORCODE>\n"
        f'  <DATABASE DATEFORMAT="D.m.yyyy" LAYOUT="" NAME="prop.fmp12" '
        f'RECORDS="{len(rows)}" TIMEFORMAT="k:mm:ss"/>\n'
        f"  <METADATA>\n{fields}\n  </METADATA>\n"
        f'  <RESULTSET FOUND="{len(rows)}">\n{body}\n  </RESULTSET>\n'
        "</FMPXMLRESULT>\n"
    ).encode("utf-8")


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.integers(2, 6).flatmap(
        lambda width: st.tuples(
            st.just([f"Field {i}" for i in range(width)]),
            st.lists(
                st.lists(values, min_size=width, max_size=width), min_size=0, max_size=8
            ),
        )
    )
)
def test_fmp_roundtrip(tmp_path_factory, data):
    field_names, rows = data
    path = tmp_path_factory.mktemp("fmp") / "prop.xml"
    path.write_bytes(build_fmp_xml(field_names, rows))
    stream = read_fmp_xml(str(path))
    schema = next(stream)
    parsed = list(stream)
    assert schema.record_count == len(rows)
    assert schema.clean_names == [sanitize_name(n) for n in field_names]
    # XML text nodes normalize \r\n and \r to \n (XML 1.0 §2.11) — the
    # parser is REQUIRED to do this; normalize expectations the same way
    def norm(v):
        return v.replace("\r\n", "\n").replace("\r", "\n") if v is not None else None

    assert parsed == [tuple(norm(v) for v in row) for row in rows]


def test_roundtrip_through_jsonl(spark, tmp_path):
    """DataFrame → JSONL lines → parse back: values and field order."""
    from ceneton_database_tools_spark.sinks.jsonl import iter_jsonl
    from ceneton_database_tools_spark.sources.fmp_xml import read_fmp_xml_df

    names = ["Nummer", "Omschrijving"]
    rows = [["0001", "mét ünïcode"], ["0002", None]]
    path = tmp_path / "rt.xml"
    path.write_bytes(build_fmp_xml(names, rows))
    df = read_fmp_xml_df(spark, str(path))
    lines = [json.loads(line) for line in iter_jsonl(df)]
    assert sorted(lines, key=lambda d: d["nummer"]) == [
        {"nummer": "0001", "omschrijving": "mét ünïcode"},
        {"nummer": "0002", "omschrijving": None},
    ]
    assert all(list(d) == ["nummer", "omschrijving"] for d in lines)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.integers(2, 5).flatmap(
        lambda width: st.tuples(
            st.just([f"Kolom {i}" for i in range(width)]),
            st.lists(
                st.lists(values, min_size=width, max_size=width), min_size=1, max_size=6
            ),
        )
    )
)
def test_fast_scanner_equals_et_parser(tmp_path_factory, data):
    """The regex fast path and the ElementTree parser must agree on
    every generated document (values incl. entities, newlines, nulls)."""
    from ceneton_database_tools_spark.sources.fmp_xml import (
        iter_fmp_rows_et,
        iter_fmp_rows_fast,
    )

    field_names, rows = data
    path = tmp_path_factory.mktemp("fmp") / "cmp.xml"
    path.write_bytes(build_fmp_xml(field_names, rows))
    with open(path, "rb") as f:
        fast = list(iter_fmp_rows_fast(f, len(field_names)))
    with open(path, "rb") as f:
        et = list(iter_fmp_rows_et(f, len(field_names)))
    assert fast == et


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.integers(2, 6).flatmap(
        lambda width: st.tuples(
            st.just([f"Field {i}" for i in range(width)]),
            st.lists(
                st.lists(values, min_size=width, max_size=width), min_size=0, max_size=8
            ),
        )
    )
)
def test_region_scanner_equals_et_parser(tmp_path_factory, data):
    """Property: the batch-columnar region scanner produces exactly the
    row scanner's cells on arbitrary generated exports (entities from
    escape(), \\r normalization, empty-DATA None mapping, unicode)."""
    from ceneton_database_tools_spark.sources.fmp_xml import (
        iter_fmp_rows,
        iter_fmp_value_regions,
        open_xml_stream,
    )

    field_names, rows = data
    width = len(field_names)
    path = tmp_path_factory.mktemp("fmpr") / "prop.xml"
    path.write_bytes(build_fmp_xml(field_names, rows))
    with open_xml_stream(str(path)) as stream:
        expected = list(iter_fmp_rows(stream, width))
    flat, total = [], 0
    with open_xml_stream(str(path)) as stream:
        for n_rows, vals in iter_fmp_value_regions(stream, width):
            assert len(vals) == n_rows * width
            flat.extend(vals)
            total += n_rows
    got = [tuple(flat[i * width : (i + 1) * width]) for i in range(total)]
    assert got == expected


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.integers(2, 5).flatmap(
        lambda width: st.tuples(
            st.just([f"Veld {i}" for i in range(width)]),
            st.lists(
                st.lists(values, min_size=width, max_size=width), min_size=0, max_size=10
            ),
        )
    ),
    cut_fracs=st.lists(st.floats(0.0, 1.0), min_size=0, max_size=5),
)
def test_split_scan_equals_whole_scan(tmp_path_factory, data, cut_fracs):
    """Property (the InputSplit invariant): byte-range splits at
    ARBITRARY cut positions yield each generated row exactly once, in
    file order, for any generated export — the contract that makes a
    single large FMP file parallel-scannable."""
    from ceneton_database_tools_spark.sources.fmp_xml import (
        iter_fmp_rows,
        iter_fmp_split_regions,
        open_xml_stream,
    )

    field_names, rows = data
    width = len(field_names)
    path = tmp_path_factory.mktemp("fmps") / "prop.xml"
    path.write_bytes(build_fmp_xml(field_names, rows))
    size = path.stat().st_size
    with open_xml_stream(str(path)) as stream:
        expected = list(iter_fmp_rows(stream, width))
    bounds = sorted({0, size, *(int(f * size) for f in cut_fracs)})
    got = []
    for s, e in zip(bounds, bounds[1:]):
        with open(path, "rb") as f:
            for n_rows, flat in iter_fmp_split_regions(f, s, e, width):
                assert len(flat) == n_rows * width
                got.extend(
                    tuple(flat[i * width : (i + 1) * width]) for i in range(n_rows)
                )
    assert got == expected


# ---------------------------------------------------------------------------
# _binpack: the OPTIMIZE/PURGE bin grouper is pure driver logic — pin
# its invariants over arbitrary (dir, size) sequences


@given(
    sizes=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=1 << 40)),
        max_size=200,
    ),
    target=st.one_of(
        st.none(), st.integers(min_value=1, max_value=1 << 32)
    ),
    keep_singletons=st.booleans(),
)
def test_binpack_invariants(sizes, target, keep_singletons):
    """No directory is ever lost or duplicated across bins; commit
    order is preserved within and across bins; every multi-item bin's
    PREFIX stays under the target (greedy first-fit: the bin closed
    before the item that would overflow it); singleton bins appear
    only under keep_singletons (the PURGE pick) except the documented
    oversized-single-dir case."""
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    pairs = [(f"data/d{i}", sz) for i, sz in enumerate(sizes)]
    bins = TxnTable._binpack(pairs, target, keep_singletons=keep_singletons)
    flat = [d for b in bins for d in b]
    # subset, no dups, order preserved (subsequence of commit order)
    assert len(flat) == len(set(flat))
    order = {d: i for i, (d, _) in enumerate(pairs)}
    assert all(order[a] < order[b] for a, b in zip(flat, flat[1:]))
    by_dir = dict(pairs)
    if keep_singletons:
        # PURGE: every picked dir must be rewritten — nothing dropped
        assert flat == [d for d, _ in pairs]
    else:
        assert all(len(b) >= 2 for b in bins)
    if target is None:
        if keep_singletons:
            assert all(len(b) == 1 for b in bins)  # one bin per dir
        else:
            assert len(bins) <= 1  # single fused bin (or nothing)
    else:
        for b in bins:
            # greedy close rule: all but the last item fit under target
            run = 0
            for d in b[:-1]:
                run += int(by_dir[d] or 0)
            assert run <= target or len(b) == 1


@given(
    live=st.sets(
        st.lists(
            st.sampled_from(["a", "b", "k=1", "k=2", "x"]),
            min_size=0, max_size=3,
        ).map(lambda parts: "/".join(["data", "root"] + parts)),
        max_size=30,
    ),
    probe=st.lists(
        st.sampled_from(["a", "b", "k=1", "k=2", "x", "z"]),
        min_size=0, max_size=3,
    ).map(lambda parts: "/".join(["data", "root"] + parts)),
)
def test_live_ancestor_index_equals_prefix_scan(live, probe):
    """The vacuum ancestor index answers EXACTLY the question the old
    per-candidate scan did: 'does any live entry live strictly below
    this path?' — same truth value for every probe, just O(1) per
    ask instead of O(live)."""
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable

    anc = TxnTable._live_ancestor_index(live)
    brute = any(e.startswith(probe + "/") for e in live)
    assert (probe in anc) == brute


# ---------------------------------------------------------------------------
# Winnowing twin = suffix-slice equivalence (r14 rewrite invariant)
# ---------------------------------------------------------------------------

_WINNOW_TEXTS = st.lists(
    st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=0x20, max_codepoint=0x7E),
            st.sampled_from("àßф中 \t\r\n&<>'\"😀𝄞"),
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow  # rewrite-equivalence pin vs the pre-r14 formulation; the always-on oracle+perturbed parity gate the SAME query end-to-end every run
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_WINNOW_TEXTS)
def test_winnow_twin_is_suffix_slice(spark, texts):
    """The r14 text_winnow_fingerprint rewrite rests on one positional
    identity: the first-token-dropped twin's normalized text is a
    character SUFFIX of the base's normalized text, so the twin's
    k-gram hash array equals slice(kh, q+1, ...) with q = locate(' ',
    scrubbed base). Check the identity directly against the OLD
    formulation (independent winnowing of the twin text) over texts
    with empty strings, single tokens, sub-k-gram lengths, entities,
    CRs, multi-byte and astral characters."""
    from pyspark.sql import functions as F

    from ceneton_database_tools_spark.operators import _textutil as T
    from ceneton_database_tools_spark.operators import text as TX

    rows = [(i, s) for i, s in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def winnow_fp(src, txt_expr):
        return (
            src.select("doc_id", F.expr(txt_expr).alias("txt"))
            .select(
                "doc_id", F.regexp_replace("txt", TX._ASTRAL, "?").alias("txt")
            )
            .select("doc_id", F.expr(TX._SPARK_CODES).alias("cs"), "txt")
            .select("doc_id", F.expr(TX._SPARK_KH).alias("kh"))
            .select("doc_id", F.expr(TX._spark_fps("kh")).alias("fp"))
        )

    # OLD formulation: twin text winnowed independently
    old = {
        r["doc_id"]: r["fp"]
        for r in winnow_fp(docs, T.SPARK_DROP_FIRST_TOKEN).collect()
    }
    # NEW formulation: one hashing pass + suffix slice (as in text.py)
    kh_twin = (
        "CASE WHEN q > 0 THEN slice(kh, q + 1, greatest(size(kh) - q, 0)) "
        "ELSE array() END"
    )
    new = {
        r["doc_id"]: r["fp_b"]
        for r in (
            docs.select("doc_id", F.expr(TX._SPARK_NORM).alias("txt"))
            .select(
                "doc_id", F.regexp_replace("txt", TX._ASTRAL, "?").alias("txt")
            )
            .select("doc_id", F.expr(TX._SPARK_CODES).alias("cs"), "txt")
            .select(
                "doc_id",
                F.expr(TX._SPARK_KH).alias("kh"),
                F.expr("locate(' ', txt)").alias("q"),
            )
            .select("doc_id", F.expr(kh_twin).alias("kh_b"))
            .select("doc_id", F.expr(TX._spark_fps("kh_b")).alias("fp_b"))
            .collect()
        )
    }
    assert old == new

# ---------------------------------------------------------------------------
# MinHash base twin = suffix-slice equivalence (r15 rewrite invariant)
# ---------------------------------------------------------------------------

_MINHASH_TEXTS = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.one_of(
                st.characters(min_codepoint=0x20, max_codepoint=0x7E),
                st.sampled_from("àßф中 \t\r\n&<>'\"😀𝄞"),
            ),
            max_size=40,
        ),
        st.sampled_from(["", " ", "a", "a b", "a b a b a", "x  y\tz"]),
    ),
    min_size=1,
    max_size=10,
)


@pytest.mark.slow  # rewrite-equivalence pin vs the pre-r15 formulation; the always-on oracle+perturbed parity gate the SAME queries end-to-end every run
@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_MINHASH_TEXTS)
def test_minhash_base_twin_is_suffix_slice(spark, texts, tmp_path_factory):
    """The r15 _minhash_base rewrite rests on one positional identity:
    the drop-first-token twin's word-bigram sequence is the base's
    bigram sequence minus its first element, so ONE md5 pass over the
    base's positional bigram hashes yields both documents' hashed
    shingle SETS. Check the real builder against the OLD formulation
    (union corpus shingled and hashed independently per branch) over
    corpora with NULL/empty/single-token/two-token/repeated-bigram/
    whitespace-variant/astral texts."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ceneton_database_tools_spark.operators import _textutil as T
    from ceneton_database_tools_spark.operators import dedup as D

    sf_dir = str(tmp_path_factory.mktemp("minhash_prop") / _uuid.uuid4().hex)
    # every degenerate shape rides EVERY example (3 examples suffice;
    # hypothesis supplies the adversarial remainder)
    texts = list(texts) + [None, "", " ", "a", "a b", "a b a b a", "x  y\tz"]
    rows = [(i, s) for i, s in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.coalesce(1).write.parquet(sf_dir + "/documents.parquet")

    # OLD formulation (pre-r15): union corpus -> distinct bigram
    # shingles per branch -> md5 per distinct shingle -> distinct set
    old_based = (
        D._near_corpus_tokens(spark, sf_dir)
        .select("doc_id", F.expr(T.SPARK_SHINGLES).alias("sh"))
        .select(
            "doc_id", F.expr(f"array_distinct({T.SPARK_HASH_BASE})").alias("ba")
        )
    )
    old = {r["doc_id"]: sorted(r["ba"]) for r in old_based.collect()}
    # NEW formulation: the real builder
    D.release_persisted()
    new = {
        r["doc_id"]: sorted(r["ba"])
        for r in D._minhash_base(spark, sf_dir).collect()
    }
    D.release_persisted()
    assert old == new


def test_topk_numpy_cos_equals_sql_chain(spark):
    """similarity_topk_exact r15: the mapInArrow scorer computes the
    cosine with a column-stepped numpy loop claimed BIT-IDENTICAL to
    the SQL left-associated chain (T.dot_chain / norm product /
    divide). Verify 64-bit patterns over an adversarial float32 corpus:
    mixed signs, huge/tiny exponents (overflow-to-inf products,
    subnormal underflow), exact duplicates, near-cancellation sums —
    the shapes where ANY reassociation or fused-multiply-add would
    change the double."""
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from ceneton_database_tools_spark.operators import _textutil as T
    from ceneton_database_tools_spark.operators.similarity import EMB_DIM

    rng = np.random.default_rng(20260818)
    n = 300
    mat = rng.standard_normal((n, EMB_DIM)).astype(np.float32)
    mat[1] = mat[0]                       # exact duplicate
    mat[2] = 0.0                          # zero vector
    mat[3] = np.float32(1e19)             # product overflow territory
    mat[4] = np.float32(1e-23)            # subnormal products
    mat[5, ::2] = np.float32(1e8)         # cancellation against...
    mat[5, 1::2] = np.float32(-1e8)       # ...alternating signs
    mat[6] = np.float32(0.125)            # exact dyadic constant
    qv64 = mat[0].astype(np.float64)

    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    qcols = ", ".join(repr(float(x)) for x in qv64)
    sql_cos = (
        df.withColumn("qv", F.expr(f"array({qcols})"))
        .select(
            "vec_id",
            F.expr(T.dot_chain("qv", "v", EMB_DIM, one_based=False)).alias("dot"),
            F.expr(T.norm_chain("v", EMB_DIM, one_based=False)).alias("nrm"),
        )
        .collect()
    )
    qnrm = float(np.sqrt(np.add.reduce([qv64[d] * qv64[d] for d in range(EMB_DIM)])))

    m64 = mat.astype(np.float64)
    for row in sql_cos:
        i = row["vec_id"]
        acc = qv64[0] * m64[i, 0]
        for d in range(1, EMB_DIM):
            acc += qv64[d] * m64[i, d]
        assert struct.pack("<d", acc) == struct.pack("<d", row["dot"]), (
            f"dot bits diverge at row {i}: numpy {acc!r} vs sql {row['dot']!r}"
        )
        if row["nrm"] and row["nrm"] > 0:
            np_cos = acc / (qnrm * row["nrm"])
            sql_c = row["dot"] / (qnrm * row["nrm"])
            assert struct.pack("<d", np_cos) == struct.pack("<d", sql_c)
