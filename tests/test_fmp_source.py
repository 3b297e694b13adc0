"""FMP-XML source parity tests (FIXTURES.md §B).

Golden expectations derive from the reference's documented semantics
(fmp_reader.py / _cli.py, studied in SURVEY.md §1-3): sanitize_name
unicode behavior, empty-DATA → null, schema-then-rows contract,
record-count warning, duplicate-name error, bz2 + directory-latest
resolution. The deliberate improvements over the reference (COL-level
handling, real namespace resolution) are asserted as their own
documented behaviors.
"""

from __future__ import annotations

import logging
import os

import pytest

from ceneton_database_tools_spark.schema import (
    FMPField,
    default_header_strategy,
    sanitize_name,
)
from ceneton_database_tools_spark.sources import (
    open_xml_stream,
    parse_fmp_header,
    read_fmp_xml_df,
    resolve_input_path,
)
from ceneton_database_tools_spark.sources.fmp_xml import (
    REPEAT_SEPARATOR,
    iter_fmp_rows,
    read_fmp_xml,
)

DATA = os.path.join(os.path.dirname(__file__), "data")
BASIC = os.path.join(DATA, "fmp_basic.xml")
EDGES = os.path.join(DATA, "fmp_edges.xml")
DUPES = os.path.join(DATA, "fmp_dupes.xml")
REPEAT = os.path.join(DATA, "fmp_repeat.xml")

BASIC_CLEAN = ["nummer", "auteur", "titel", "jaar", "genre", "aantal_bedr_", "enschedé", "ubl"]


# -- sanitize_name: unicode-exact reference semantics (fmp_reader.py:56-61,
#    outputs verified against field_mappings.csv:2,18,35) -------------------


@pytest.mark.parametrize(
    ("raw", "clean"),
    [
        ("Nummer", "nummer"),
        ("Aantal bedr.", "aantal_bedr_"),
        ("Enschedé", "enschedé"),  # unicode \W keeps é
        ("BNF Yth.", "bnf_yth_"),
        ("15e bibliotheek", "_15e_bibliotheek"),  # leading digit
        ("  Trailing  ", "trailing"),
        ("A.B", "a_b"),
    ],
)
def test_sanitize_name(raw, clean):
    assert sanitize_name(raw) == clean


def test_duplicate_clean_names_raise():
    fields = [FMPField(name="A.B"), FMPField(name="A B")]
    with pytest.raises(ValueError, match="Duplicate field name: a_b"):
        default_header_strategy(fields)


def test_duplicate_names_raise_from_header_parse():
    with open(DUPES, "rb") as f, pytest.raises(ValueError, match="Duplicate field name"):
        parse_fmp_header(f)


# -- header parse -----------------------------------------------------------


def test_header_schema_and_metadata():
    with open(BASIC, "rb") as f:
        schema = parse_fmp_header(f)
    assert schema.name == "Ceneton.fmp12"
    assert schema.record_count == 4
    assert schema.database_record_count == 4
    assert schema.clean_names == BASIC_CLEAN
    st = schema.to_struct_type()
    assert [f.name for f in st.fields] == BASIC_CLEAN
    assert all(f.dataType.typeName() == "string" for f in st.fields)
    nummer = st["nummer"].metadata
    assert nummer == {
        "original_name": "Nummer",
        "fmp_type": "TEXT",
        "empty_ok": False,
        "max_repeat": 1,
    }
    assert st["enschedé"].metadata["original_name"] == "Enschedé"


def test_unknown_field_type_lenient_default_and_strict_raise():
    """Reference parity gate on TYPE: strict mode reproduces
    FMPFieldType[...] raising on unknown TYPEs (fmp_reader.py:133);
    the lenient default degrades to TEXT (documented deviation)."""
    import io

    xml = (
        open(BASIC, "rb").read().replace(b'TYPE="TEXT"', b'TYPE="BLOB"', 1)
    )
    schema = parse_fmp_header(io.BytesIO(xml))
    assert schema.fields[0].fmp_type == "BLOB"  # kept as metadata, parsed as text
    with pytest.raises(ValueError, match="unknown FMP field TYPE 'BLOB'"):
        parse_fmp_header(io.BytesIO(xml), strict_types=True)
    with open(BASIC, "rb") as f:  # known TYPEs pass strict mode
        assert parse_fmp_header(f, strict_types=True).record_count == 4


def test_record_count_mismatch_warns(caplog):
    with caplog.at_level(logging.WARNING), open(EDGES, "rb") as f:
        schema = parse_fmp_header(f)
    assert schema.record_count == 2
    assert schema.database_record_count == 100
    assert any("subset of the database" in r.message for r in caplog.records)


# -- streaming row contract (schema first, then tuples) ---------------------


def test_read_fmp_xml_schema_then_rows():
    stream = read_fmp_xml(BASIC)
    schema = next(stream)
    assert schema.clean_names == BASIC_CLEAN
    rows = list(stream)
    assert len(rows) == 4
    # row 1: empty <DATA/> → None (enschedé)
    assert rows[0] == (
        "000001",
        "Vondel, Joost van den",
        "Gysbreght van Aemstel",
        "1637",
        "treurspel",
        "5",
        None,
        "1091 B 12",
    )
    # row 2: multiline text survives; <COL/> with no DATA → None (ubl)
    assert rows[1][2] == "De Spaanschen Brabander Jerolimo.\nTreur-spel."
    assert rows[1][7] is None
    # row 3: <COL/> auteur → None
    assert rows[2][1] is None
    # row 4: unicode values intact
    assert rows[3][2] == "Trijntje Cornelis, 'n klucht mét ongewone tékens"


def test_slow_path_rejects_non_data_markup_in_col():
    """Contract: any structural surprise in a COL body raises
    FMPFastPathError so the strict ET parser decides — a comment or
    CDATA wrapper must not be silently captured as cell text."""
    from ceneton_database_tools_spark.sources.fmp_xml import (
        FMPFastPathError,
        _parse_row_chunk_slow,
    )

    ok = "<COL><DATA>a</DATA></COL><COL><DATA>b</DATA><DATA>c</DATA></COL>"
    assert _parse_row_chunk_slow(ok, 2, "join") == ("a", "b\x1dc")
    for bad in (
        "<COL><!-- x --><DATA>a</DATA></COL><COL><DATA>b</DATA></COL>",
        "<COL><![CDATA[raw]]></COL><COL><DATA>b</DATA></COL>",
        "<COL><SPAN>a</SPAN></COL><COL><DATA>b</DATA></COL>",
    ):
        with pytest.raises(FMPFastPathError, match="non-DATA markup"):
            _parse_row_chunk_slow(bad, 2, "join")


def test_repeating_field_error_and_join():
    stream = read_fmp_xml(REPEAT)
    next(stream)
    with pytest.raises(ValueError, match="repeating field"):
        list(stream)
    stream = read_fmp_xml(REPEAT, repeats="join")
    next(stream)
    rows = list(stream)
    assert rows == [("Een spel", REPEAT_SEPARATOR.join(["UBL", "KB", "BL"]))]


# -- path resolution: bz2 + directory-latest (_cli.py:23-35 semantics) ------


def test_bz2_transparent():
    stream = read_fmp_xml(os.path.join(DATA, "fmp_basic.xml.bz2"))
    schema = next(stream)
    assert schema.clean_names == BASIC_CLEAN
    assert len(list(stream)) == 4


def test_directory_resolves_to_latest_snapshot():
    snapdir = os.path.join(DATA, "snapshots")
    resolved = resolve_input_path(snapdir)
    assert resolved.name == "export_2025.xml.bz2"  # lexicographically last
    with open_xml_stream(snapdir) as f:
        schema = parse_fmp_header(f)
    assert schema.name == "Ceneton.fmp12"  # 2025 content, not 2024's "Edge Cases"


def test_directory_without_snapshots_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve_input_path(str(tmp_path))


# -- Spark DataSource -------------------------------------------------------


def test_datasource_basic(spark):
    df = read_fmp_xml_df(spark, BASIC)
    assert df.columns == BASIC_CLEAN
    rows = df.collect()
    assert len(rows) == 4
    byid = {r.nummer: r for r in rows}
    assert byid["000001"].enschedé is None
    assert byid["000002"].ubl is None
    assert byid["000002"].titel == "De Spaanschen Brabander Jerolimo.\nTreur-spel."
    assert byid["000004"].auteur == "Huygens, Constantijn"
    # all-string schema parity with the reference sink (sql.py:35)
    assert {f.dataType.typeName() for f in df.schema.fields} == {"string"}


def test_datasource_bz2_and_dir(spark):
    assert read_fmp_xml_df(spark, os.path.join(DATA, "fmp_basic.xml.bz2")).count() == 4
    df = read_fmp_xml_df(spark, os.path.join(DATA, "snapshots"))
    assert df.count() == 4  # latest snapshot (2025 = basic content)


def test_datasource_number_stays_string(spark):
    df = read_fmp_xml_df(spark, EDGES)
    assert df.columns == ["_15e_bibliotheek", "aantal_pag_"]
    rows = {r._15e_bibliotheek: r for r in df.collect()}
    # NUMBER-typed field keeps its string verbatim (sql.py:35 parity)
    assert rows["KB Den Haag"].aantal_pag_ == "0042"
    assert rows["UB Leiden"].aantal_pag_ is None


def test_datasource_multi_file_parallel_scan(spark, tmp_path):
    """A glob of sharded exports reads as one DataFrame with one input
    partition per file (files are the parallel unit for XML)."""
    shard_rows = {"a": ["100", "101"], "b": ["200"], "c": ["300", "301", "302"]}
    for name, nums in shard_rows.items():
        rows = "".join(
            f'<ROW MODID="1" RECORDID="1"><COL><DATA>{n}</DATA></COL>'
            f"<COL><DATA>t{n}</DATA></COL></ROW>"
            for n in nums
        )
        (tmp_path / f"shard_{name}.xml").write_text(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">\n'
            "<ERRORCODE>0</ERRORCODE>\n"
            f'<DATABASE DATEFORMAT="D.m.yyyy" LAYOUT="" NAME="Shards" RECORDS="{len(nums)}" '
            'TIMEFORMAT="k:mm:ss"/>\n'
            "<METADATA>"
            '<FIELD EMPTYOK="NO" MAXREPEAT="1" NAME="Nummer" TYPE="TEXT"/>'
            '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Titel" TYPE="TEXT"/>'
            "</METADATA>\n"
            f'<RESULTSET FOUND="{len(nums)}">{rows}</RESULTSET>\n'
            "</FMPXMLRESULT>\n"
        )
    df = read_fmp_xml_df(spark, str(tmp_path / "shard_*.xml"))
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r.nummer for r in df.collect()) == ["100", "101", "200", "300", "301", "302"]
    # directory + multi=true resolves the same set
    df2 = read_fmp_xml_df(spark, str(tmp_path), multi=True)
    assert df2.count() == 6


def test_datasource_typed_mode(spark):
    """typed=true: NUMBER fields become DOUBLE with SQL-CAST null
    semantics; default stays all-string parity."""
    df = read_fmp_xml_df(spark, EDGES, typed=True)
    types = dict(df.dtypes)
    assert types["aantal_pag_"] == "double"
    assert types["_15e_bibliotheek"] == "string"
    rows = {r._15e_bibliotheek: r for r in df.collect()}
    assert rows["KB Den Haag"].aantal_pag_ == 42.0
    assert rows["UB Leiden"].aantal_pag_ is None


# ---------------------------------------------------------------------------
# Batch-columnar region scanner
# ---------------------------------------------------------------------------


def _rows_via_regions(path, n_fields, repeats="error"):
    from ceneton_database_tools_spark.sources.fmp_xml import (
        iter_fmp_value_regions,
        open_xml_stream,
    )

    flat, total = [], 0
    with open_xml_stream(path) as stream:
        for n_rows, vals in iter_fmp_value_regions(stream, n_fields, repeats=repeats):
            assert len(vals) == n_rows * n_fields
            flat.extend(vals)
            total += n_rows
    return [tuple(flat[i * n_fields : (i + 1) * n_fields]) for i in range(total)]


@pytest.mark.parametrize(
    "fixture,n_fields",
    [("fmp_basic.xml", 8), ("fmp_basic.xml.bz2", 8), ("fmp_edges.xml", 2)],
)
def test_region_scanner_matches_row_scanner(fixture, n_fields):
    """The batch-columnar scanner yields exactly the row scanner's cells
    (entities, CR normalization, empty-cell None mapping included)."""
    path = os.path.join(DATA, fixture)
    with open_xml_stream(path) as stream:
        expected = list(iter_fmp_rows(stream, n_fields))
    assert _rows_via_regions(path, n_fields) == expected


def test_region_scanner_repeating_field_falls_back_per_row():
    """A repeating field breaks the region count check; the per-row
    reparse inside the region must produce the join semantics (and the
    error semantics) identical to the row scanner."""
    path = os.path.join(DATA, "fmp_repeat.xml")
    with open_xml_stream(path) as stream:
        expected = list(iter_fmp_rows(stream, 2, repeats="join"))
    assert _rows_via_regions(path, 2, repeats="join") == expected
    with pytest.raises(ValueError, match="repeating field"):
        _rows_via_regions(path, 2, repeats="error")


def test_region_scanner_rejects_compensating_col_errors():
    """An extra fast-shaped COL in one row plus a missing COL in the
    next cancels out in region-global counts; the per-row split
    validation must still catch it and route through the strict per-row
    reparse (which raises)."""
    import io

    from ceneton_database_tools_spark.sources.fmp_xml import (
        FMPFastPathError,
        iter_fmp_value_regions,
    )

    xml = (
        '<?xml version="1.0" encoding="UTF-8"?><FMPXMLRESULT>'
        '<RESULTSET FOUND="2">'
        "<ROW><COL><DATA>a</DATA></COL><COL><DATA>b</DATA></COL>"
        "<COL><DATA>c</DATA></COL></ROW>"
        "<ROW><COL><DATA>d</DATA></COL></ROW>"
        "</RESULTSET></FMPXMLRESULT>"
    ).encode()
    with pytest.raises((FMPFastPathError, ValueError)):
        list(iter_fmp_value_regions(io.BytesIO(xml), 2))


# ---------------------------------------------------------------------------
# Streaming ingest (directory watch)
# ---------------------------------------------------------------------------


def _write_stream_shard(path, nums):
    rows = "".join(
        f'<ROW MODID="1" RECORDID="1"><COL><DATA>{n}</DATA></COL>'
        f"<COL><DATA>t{n}</DATA></COL></ROW>"
        for n in nums
    )
    path.write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">\n'
        "<ERRORCODE>0</ERRORCODE>\n"
        f'<DATABASE DATEFORMAT="D.m.yyyy" LAYOUT="" NAME="Stream" RECORDS="{len(nums)}" '
        'TIMEFORMAT="k:mm:ss"/>\n'
        "<METADATA>"
        '<FIELD EMPTYOK="NO" MAXREPEAT="1" NAME="Nummer" TYPE="TEXT"/>'
        '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Titel" TYPE="TEXT"/>'
        "</METADATA>\n"
        f'<RESULTSET FOUND="{len(nums)}">{rows}</RESULTSET>\n'
        "</FMPXMLRESULT>\n"
    )


def test_streaming_ingest_incremental(spark, tmp_path):
    """readStream over a directory of exports: the first availableNow
    run ingests the files present; a restart from the same checkpoint
    ingests ONLY files that arrived in between (offset = ingested file
    set) — the reference's one-shot load as continuous ingest."""
    from ceneton_database_tools_spark.sources.fmp_xml import register_fmp_source

    src = tmp_path / "in"
    src.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    _write_stream_shard(src / "export_a.xml", ["100", "101"])
    register_fmp_source(spark)

    def run_once():
        sdf = (
            spark.readStream.format("fmpxml")
            .option("multi", "true")
            .load(str(src))
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.nummer for r in spark.read.parquet(out).collect())

    assert run_once() == ["100", "101"]
    _write_stream_shard(src / "export_b.xml", ["200", "201", "202"])
    # restart from the same checkpoint: ONLY the new file is ingested —
    # a replay bug would append shard A again (7 rows, with dupes)
    assert run_once() == ["100", "101", "200", "201", "202"]


def test_streaming_offsets_trim_archived_files(tmp_path):
    """Offset boundedness: a file that was ingested and later archived
    (no longer listed) drops out of the next offset, so checkpoint
    size tracks the CURRENT directory, not history; a new arrival is
    still ingested exactly once."""
    from ceneton_database_tools_spark.sources.fmp_xml import FMPXMLSimpleStreamReader

    src = tmp_path / "in"
    src.mkdir()
    a, b = src / "a.xml", src / "b.xml"
    _write_stream_shard(a, ["1"])
    reader = FMPXMLSimpleStreamReader(str(src), ["nummer", "titel"], "error")
    rows1, off1 = reader.read(reader.initialOffset())
    assert [r[0] for r in rows1] == ["1"]
    assert [e[0] for e in off1["seen"]] == [str(a)]
    a.unlink()  # archive after (simulated) commit
    _write_stream_shard(b, ["2"])
    rows2, off2 = reader.read(off1)
    assert [r[0] for r in rows2] == ["2"]
    assert [e[0] for e in off2["seen"]] == [str(b)]  # archived a.xml aged out


def test_streaming_empty_dir_schema_error_guides(spark, tmp_path):
    """Starting a stream on an empty watch directory cannot infer a
    schema; the error must say how to proceed (explicit .schema())."""
    from ceneton_database_tools_spark.sources.fmp_xml import register_fmp_source

    src = tmp_path / "empty"
    src.mkdir()
    register_fmp_source(spark)
    with pytest.raises(Exception, match="pass the schema explicitly"):
        (
            spark.readStream.format("fmpxml")
            .option("multi", "true")
            .load(str(src))
        )


def test_streaming_typed_mode_rejected(spark, tmp_path):
    from ceneton_database_tools_spark.sources.fmp_xml import register_fmp_source

    src = tmp_path / "in"
    src.mkdir()
    _write_stream_shard(src / "export_a.xml", ["1"])
    register_fmp_source(spark)
    sdf = (
        spark.readStream.format("fmpxml")
        .option("multi", "true")
        .option("typed", "true")
        .load(str(src))
    )
    q = None
    with pytest.raises(Exception, match="typed=true is a batch-reader mode"):
        q = (
            sdf.writeStream.format("memory")
            .queryName("fmp_stream_typed")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if q is not None:
        q.stop()


# ---------------------------------------------------------------------------
# Byte-range splits (parallel scan of one large file)
# ---------------------------------------------------------------------------


def _write_split_fixture(path, nrows=60, ncols=3):
    """Export exercising everything byte slicing could break: XML
    entities, CR/LF normalization, empty cells, and multibyte UTF-8
    (so naive byte cuts would land mid-codepoint)."""
    from xml.sax.saxutils import escape

    cells = []
    for r in range(nrows):
        row = []
        for c in range(ncols):
            k = (r * ncols + c) % 5
            if k == 0:
                row.append("<COL><DATA/></COL>")
            elif k == 1:
                row.append(f"<COL><DATA>{escape('a&b<c>' + str(r))}</DATA></COL>")
            elif k == 2:
                row.append(f"<COL><DATA>café ☕ 日本語 {r}-{c}</DATA></COL>")
            elif k == 3:
                row.append(f"<COL><DATA>line1&#13;&#10;line2 {r}</DATA></COL>")
            else:
                row.append(f"<COL><DATA>plain {r}-{c}</DATA></COL>")
        cells.append('<ROW MODID="1" RECORDID="1">' + "".join(row) + "</ROW>")
    fields = "".join(
        f'<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="F{c}" TYPE="TEXT"/>' for c in range(ncols)
    )
    path.write_bytes(
        (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">\n'
            "<ERRORCODE>0</ERRORCODE>\n"
            f'<DATABASE DATEFORMAT="D.m.yyyy" LAYOUT="" NAME="Split" RECORDS="{nrows}" '
            'TIMEFORMAT="k:mm:ss"/>\n'
            f"<METADATA>{fields}</METADATA>\n"
            f'<RESULTSET FOUND="{nrows}">\n' + "\n".join(cells) + "\n</RESULTSET>\n"
            "</FMPXMLRESULT>\n"
        ).encode("utf-8")
    )


def _rows_via_splits(path, bounds, n_fields, repeats="error"):
    from ceneton_database_tools_spark.sources.fmp_xml import iter_fmp_split_regions

    out = []
    for s, e in zip(bounds, bounds[1:]):
        with open(path, "rb") as f:
            for n_rows, flat in iter_fmp_split_regions(f, s, e, n_fields, repeats=repeats):
                assert len(flat) == n_rows * n_fields
                out.extend(
                    tuple(flat[i * n_fields : (i + 1) * n_fields]) for i in range(n_rows)
                )
    return out


def test_split_sizing_policy(tmp_path):
    """The auto-split policy matrix, asserted directly on the reader:
    small files and .bz2 never split; a large single file splits at
    the 16 MiB floor; the same file among many splits at the 64 MiB
    multi-file floor (files are already the parallel unit); explicit
    sizes are honored with the 4096-byte test floor."""
    from ceneton_database_tools_spark.sources.fmp_xml import FMPXMLReader

    def ranges(reader, path, total):
        return reader._split_ranges(str(path), path.stat().st_size, total)

    # fixtures carry a literal <ROW so the planner's split-safety probe
    # (namespace-prefix guard) sees a splittable grammar
    big = tmp_path / "big.xml"
    big.write_bytes(b"<ROW" + b"x" * ((48 << 20) - 4))  # 48 MiB: 3 splits at 16 MiB floor
    small = tmp_path / "small.xml"
    small.write_bytes(b"<ROW" + b"x" * ((1 << 20) - 4))
    bz = tmp_path / "big.xml.bz2"
    bz.write_bytes(b"<ROW" + b"x" * ((48 << 20) - 4))

    single = FMPXMLReader([str(big)], ["f"], "error", split_bytes=None, parallelism=32)
    assert len(ranges(single, big, big.stat().st_size)) == 3
    assert ranges(single, small, small.stat().st_size) == [(0, None)]

    multi = FMPXMLReader(
        [str(big), str(bz)], ["f"], "error", split_bytes=None, parallelism=32
    )
    # multi-file floor is 64 MiB -> a 48 MiB file stays whole
    assert ranges(multi, big, 96 << 20) == [(0, None)]
    assert ranges(multi, bz, 96 << 20) == [(0, None)]  # bz2 never splits

    never = FMPXMLReader([str(big)], ["f"], "error", split_bytes=0, parallelism=32)
    assert ranges(never, big, big.stat().st_size) == [(0, None)]

    explicit = FMPXMLReader([str(big)], ["f"], "error", split_bytes=1 << 20, parallelism=32)
    rs = ranges(explicit, big, big.stat().st_size)
    assert len(rs) == 48
    # ranges tile [0, size) exactly, in order
    assert rs[0][0] == 0 and rs[-1][1] == big.stat().st_size
    assert all(rs[i][1] == rs[i + 1][0] for i in range(len(rs) - 1))


def test_split_every_byte_boundary_exactly_once(tmp_path):
    """The InputSplit invariant: for EVERY possible cut position, the
    two splits together yield each row exactly once, in file order —
    cuts mid-tag, mid-row, mid-multibyte-codepoint, in the header and
    in the trailer included."""
    path = tmp_path / "split.xml"
    _write_split_fixture(path, nrows=40, ncols=3)
    size = path.stat().st_size
    with open_xml_stream(str(path)) as stream:
        expected = list(iter_fmp_rows(stream, 3))
    assert len(expected) == 40
    for cut in range(0, size + 1, 1):
        got = _rows_via_splits(path, [0, cut, size], 3)
        assert got == expected, f"cut at byte {cut} lost or duplicated rows"


def test_split_chunk_boundary_between_rows(tmp_path, monkeypatch):
    """Regression (round-4 review): when a read-chunk boundary falls
    between the last owned </ROW> and the next split's <ROW, a prior
    iteration has already emitted every owned row and the pre-cut
    region is row-less whitespace — the scanner must return, not raise
    'split cut does not fall on a row boundary'. Tiny chunk sizes force
    emit-then-cut-search sequences at every possible alignment."""
    from ceneton_database_tools_spark.sources import fmp_xml as mod

    path = tmp_path / "split.xml"
    _write_split_fixture(path, nrows=12, ncols=2)
    size = path.stat().st_size
    with open_xml_stream(str(path)) as stream:
        expected = list(iter_fmp_rows(stream, 2))
    for chunk in (31, 53, 97):
        monkeypatch.setattr(mod, "_REGION_CHUNK", chunk)
        for cut in range(0, size + 1, 7):
            got = _rows_via_splits(path, [0, cut, size], 2)
            assert got == expected, f"chunk={chunk} cut={cut}"


def test_split_many_ranges_match_whole(tmp_path):
    path = tmp_path / "split.xml"
    _write_split_fixture(path, nrows=200, ncols=4)
    size = path.stat().st_size
    with open_xml_stream(str(path)) as stream:
        expected = list(iter_fmp_rows(stream, 4))
    for nparts in (1, 2, 3, 7, 16):
        bounds = [size * k // nparts for k in range(nparts + 1)]
        assert _rows_via_splits(path, bounds, 4) == expected


def test_split_datasource_partitions_and_rows(spark, tmp_path):
    """End-to-end through the DataSource: an explicit split size yields
    multiple input partitions and the same rows in the same order as
    the whole-file scan."""
    path = tmp_path / "big.xml"
    _write_split_fixture(path, nrows=300, ncols=3)
    whole = read_fmp_xml_df(spark, str(path), split="never")
    assert whole.rdd.getNumPartitions() == 1
    split = read_fmp_xml_df(spark, str(path), split=4096)
    assert split.rdd.getNumPartitions() > 1
    assert split.collect() == whole.collect()


def test_split_bz2_and_small_files_stay_whole(spark, tmp_path):
    """Small plain files never auto-split; a small .bz2 under AUTO
    sizing stays a whole-file single partition (no spool below the
    1 MiB compressed floor), and bz2spool='never' forces whole-file
    even when an explicit split size would otherwise spool."""
    import bz2 as _bz2

    path = tmp_path / "small.xml"
    _write_split_fixture(path, nrows=20, ncols=3)
    (tmp_path / "small.xml.bz2").write_bytes(_bz2.compress(path.read_bytes()))
    assert read_fmp_xml_df(spark, str(path)).rdd.getNumPartitions() == 1  # auto
    auto = read_fmp_xml_df(spark, str(tmp_path / "small.xml.bz2"))
    assert auto.rdd.getNumPartitions() == 1
    bz = read_fmp_xml_df(
        spark, str(tmp_path / "small.xml.bz2"), split=4096, bz2spool="never"
    )
    assert bz.rdd.getNumPartitions() == 1
    assert bz.count() == 20


def test_bz2_spool_then_split(spark, tmp_path):
    """An explicit split size on a .bz2 input decompresses once into a
    cached spool and scans it in parallel byte-range splits, with rows
    identical to the whole-file bz2 scan; the spool carries a sha256
    sidecar of the decompressed bytes and is re-used on re-read."""
    import bz2 as _bz2
    import glob
    import hashlib

    path = tmp_path / "snap.xml"
    _write_split_fixture(path, nrows=300, ncols=3)
    raw = path.read_bytes()
    bzpath = tmp_path / "snap.xml.bz2"
    bzpath.write_bytes(_bz2.compress(raw))
    spool_dir = tmp_path / "spools"

    whole = read_fmp_xml_df(spark, str(bzpath), bz2spool="never")
    split = read_fmp_xml_df(
        spark, str(bzpath), split=4096, spooldir=str(spool_dir)
    )
    assert split.rdd.getNumPartitions() > 1
    assert split.collect() == whole.collect()

    spools = glob.glob(str(spool_dir / "fmpspool_*.xml"))
    assert len(spools) == 1
    assert open(spools[0], "rb").read() == raw
    sidecar = open(spools[0] + ".sha256").read().strip()
    assert sidecar == hashlib.sha256(raw).hexdigest()

    # second read re-uses the cached spool (same identity key)
    read_fmp_xml_df(spark, str(bzpath), split=4096, spooldir=str(spool_dir)).count()
    assert glob.glob(str(spool_dir / "fmpspool_*.xml")) == spools

    # a REGENERATED snapshot (new mtime/size) re-spools under a new key
    import os
    import time

    time.sleep(0.01)
    bzpath.write_bytes(_bz2.compress(raw))
    os.utime(bzpath)
    read_fmp_xml_df(spark, str(bzpath), split=4096, spooldir=str(spool_dir)).count()
    assert len(glob.glob(str(spool_dir / "fmpspool_*.xml"))) == 2


def test_split_region_et_fallback_comment_in_col(tmp_path):
    """A comment inside a COL breaks the fast grammar; the split path
    must recover per-region via the synthetic-root ET fallback and
    still produce the whole-file parser's cells."""
    path = tmp_path / "comment.xml"
    _write_split_fixture(path, nrows=30, ncols=3)
    data = path.read_bytes()
    assert b"<COL><DATA>plain 6-1</DATA></COL>" in data
    data = data.replace(
        b"<COL><DATA>plain 6-1</DATA></COL>",
        b"<COL><!-- odd --><DATA>plain 6-1</DATA></COL>",
    )
    path.write_bytes(data)
    size = path.stat().st_size
    with open_xml_stream(str(path)) as stream:
        expected = list(iter_fmp_rows(stream, 3))
    bounds = [size * k // 5 for k in range(6)]
    assert _rows_via_splits(path, bounds, 3) == expected


def test_split_repeating_field_semantics(tmp_path):
    """repeats='join'/'error' behave identically under byte-range
    splits (the per-region row-by-row reparse path)."""
    path = tmp_path / "rep.xml"
    _write_split_fixture(path, nrows=30, ncols=3)
    data = path.read_bytes()
    assert b"<COL><DATA>plain 11-1</DATA></COL>" in data
    data = data.replace(
        b"<COL><DATA>plain 11-1</DATA></COL>",
        b"<COL><DATA>u</DATA><DATA>v</DATA></COL>",
    )
    path.write_bytes(data)
    size = path.stat().st_size
    with open_xml_stream(str(path)) as stream:
        expected = list(iter_fmp_rows(stream, 3, repeats="join"))
    bounds = [size * k // 4 for k in range(5)]
    assert _rows_via_splits(path, bounds, 3, repeats="join") == expected
    with pytest.raises(ValueError, match="repeating field"):
        _rows_via_splits(path, bounds, 3, repeats="error")


def test_zscore_group_degenerate_returns_null():
    """Single-row and constant-value groups yield NULL z (matching the
    oracle's CASE guard) instead of crashing or emitting inf."""
    import pandas as pd

    from ceneton_database_tools_spark.operators.advanced import _zscore_group

    one = pd.DataFrame({"event_id": [1], "event_type": ["x"], "value": [5.0]})
    assert _zscore_group(one)["z"].isna().all()
    const = pd.DataFrame(
        {"event_id": [1, 2, 3], "event_type": ["x"] * 3, "value": [5.0, 5.0, 5.0]}
    )
    assert _zscore_group(const)["z"].isna().all()
    # an all-NULL group has n == 0 signal rows: z is NULL for every
    # row, never a ZeroDivisionError (the oracle's CASE returns NULL)
    all_null = pd.DataFrame(
        {
            "event_id": [1, 2],
            "event_type": ["x"] * 2,
            "value": [float("nan"), float("nan")],
        }
    )
    assert _zscore_group(all_null)["z"].isna().all()


def test_reader_non_seekable_stream_spools_to_fast_path(monkeypatch):
    """A non-seekable input must not silently drop to the row-wise ET
    path: the reader spools it to a seekable temp file and keeps the
    columnar fast path (ADVICE r3: throughput cliff guard)."""
    import io

    from ceneton_database_tools_spark.sources import fmp_xml as mod

    class _NonSeekable(io.RawIOBase):
        def __init__(self, data: bytes):
            self._buf = io.BytesIO(data)

        def readable(self):
            return True

        def seekable(self):
            return False

        def readinto(self, b):
            chunk = self._buf.read(len(b))
            b[: len(chunk)] = chunk
            return len(chunk)

    with open(BASIC, "rb") as f:
        raw = f.read()

    schema = parse_fmp_header(open_xml_stream(BASIC))
    names = schema.clean_names

    monkeypatch.setattr(
        mod, "open_xml_stream", lambda path: io.BufferedReader(_NonSeekable(raw))
    )
    reader = mod.FMPXMLReader([BASIC], list(names), repeats="error")
    batches = list(reader.read(mod.InputPartition(0)))
    assert sum(b.num_rows for b in batches) == 4
    # columnar fast path: Arrow RecordBatches, not row tuples
    assert all(hasattr(b, "num_rows") for b in batches)
    first_col = batches[0].column(names.index("nummer")).to_pylist()
    assert first_col[0] == "000001"


# -- repeats='array': MAXREPEAT>1 fields as typed array<string> columns -----
# (SURVEY.md §1.4 commitment; the reference parses MAXREPEAT at
# fmp_reader.py:135 and then crashes on any multi-DATA column)


def _write_array_fixture(path, nrows=5):
    """3 fields: scalar, MAXREPEAT=3 repeating, scalar — rows cover
    multi-DATA, single-DATA (fast-path wrap), <COL/> (null array),
    <DATA/> (array holding a null element), and entity escapes."""
    shapes = [
        "<COL><DATA>UBL</DATA><DATA>KB</DATA></COL>",
        "<COL><DATA>solo</DATA></COL>",
        "<COL/>",
        "<COL><DATA/></COL>",
        "<COL><DATA>a&amp;b</DATA><DATA>c&lt;d</DATA><DATA>e</DATA></COL>",
    ]
    rows = []
    for r in range(nrows):
        rows.append(
            '<ROW MODID="1" RECORDID="1">'
            f"<COL><DATA>name {r}</DATA></COL>"
            f"{shapes[r % len(shapes)]}"
            f"<COL><DATA>tail {r}</DATA></COL>"
            "</ROW>"
        )
    path.write_bytes(
        (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">\n'
            "<ERRORCODE>0</ERRORCODE>\n"
            f'<DATABASE DATEFORMAT="D.m.yyyy" LAYOUT="" NAME="Arr" RECORDS="{nrows}" '
            'TIMEFORMAT="k:mm:ss"/>\n'
            "<METADATA>"
            '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Naam" TYPE="TEXT"/>'
            '<FIELD EMPTYOK="YES" MAXREPEAT="3" NAME="Vindplaats" TYPE="TEXT"/>'
            '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Tail" TYPE="TEXT"/>'
            "</METADATA>\n"
            f'<RESULTSET FOUND="{nrows}">\n' + "\n".join(rows) + "\n</RESULTSET>\n"
            "</FMPXMLRESULT>\n"
        ).encode("utf-8")
    )


ARRAY_EXPECT = [
    ["UBL", "KB"],
    ["solo"],
    None,
    [None],
    ["a&b", "c<d", "e"],
]


def test_repeats_array_driver_side():
    stream = read_fmp_xml(REPEAT, repeats="array")
    schema = next(stream)
    assert [f.max_repeat for f in schema.fields] == [1, 3]
    assert list(stream) == [("Een spel", ["UBL", "KB", "BL"])]


def test_to_struct_type_array_mode():
    with open_xml_stream(REPEAT) as stream:
        schema = parse_fmp_header(stream)
    arr = schema.to_struct_type(repeats="array")
    assert arr["vindplaats"].dataType.typeName() == "array"
    assert arr["vindplaats"].dataType.elementType.typeName() == "string"
    assert arr["titel"].dataType.typeName() == "string"
    # string modes unchanged
    assert schema.to_struct_type()["vindplaats"].dataType.typeName() == "string"
    assert schema.to_struct_type(repeats="join")["vindplaats"].dataType.typeName() == "string"


def test_array_mode_scanner_matches_et(tmp_path):
    """Fast scanner ≡ strict ET for every array-mode COL shape."""
    from ceneton_database_tools_spark.sources.fmp_xml import (
        iter_fmp_rows_et,
        iter_fmp_rows_fast,
    )

    path = tmp_path / "arr.xml"
    _write_array_fixture(path, nrows=10)
    spec = frozenset([1])
    with open_xml_stream(str(path)) as stream:
        fast = list(iter_fmp_rows_fast(stream, 3, repeats=spec))
    with open_xml_stream(str(path)) as stream:
        et = list(iter_fmp_rows_et(stream, 3, repeats=spec))
    assert fast == et
    assert [r[1] for r in fast] == ARRAY_EXPECT * 2


def test_datasource_array_mode(spark, tmp_path):
    from pyspark.sql import functions as F

    path = tmp_path / "arr.xml"
    _write_array_fixture(path, nrows=5)
    df = read_fmp_xml_df(spark, str(path), repeats="array")
    assert dict(df.dtypes)["vindplaats"] == "array<string>"
    rows = df.orderBy("naam").collect()
    assert [r.vindplaats for r in rows] == ARRAY_EXPECT
    # the column is genuinely queryable as an array
    sizes = (
        df.select(F.size("vindplaats").alias("n")).orderBy("naam").collect()
    )
    assert [r.n for r in sizes] == [2, 1, None, 1, 3]  # ANSI: size(null) = null


def test_datasource_array_mode_other_modes_unchanged(spark, tmp_path):
    path = tmp_path / "arr.xml"
    _write_array_fixture(path, nrows=5)
    joined = read_fmp_xml_df(spark, str(path), repeats="join").orderBy("naam").collect()
    assert joined[0].vindplaats == REPEAT_SEPARATOR.join(["UBL", "KB"])
    with pytest.raises(Exception, match="repeating field"):
        read_fmp_xml_df(spark, str(path), repeats="error").collect()


def test_array_mode_header_mismatch_raises(tmp_path):
    """Multi-DATA in a column the header declares MAXREPEAT=1 must
    raise under repeats='array' — never silently flatten."""
    path = tmp_path / "bad.xml"
    _write_array_fixture(path, nrows=1)
    data = path.read_bytes().replace(
        b"<COL><DATA>tail 0</DATA></COL>",
        b"<COL><DATA>t1</DATA><DATA>t2</DATA></COL>",
    )
    path.write_bytes(data)
    stream = read_fmp_xml(str(path), repeats="array")
    next(stream)
    with pytest.raises(ValueError, match="repeating field"):
        list(stream)


def test_split_array_semantics(tmp_path):
    """Byte-range splits produce the same array cells as the
    whole-file scan (per-region row reparse path included)."""
    path = tmp_path / "arr.xml"
    _write_array_fixture(path, nrows=40)
    spec = frozenset([1])
    with open_xml_stream(str(path)) as stream:
        expected = list(iter_fmp_rows(stream, 3, repeats=spec))
    size = path.stat().st_size
    bounds = [size * k // 4 for k in range(5)]
    assert _rows_via_splits(path, bounds, 3, repeats=spec) == expected
    assert [r[1] for r in expected[:5]] == ARRAY_EXPECT


def test_array_mode_single_data_only_region(spark, tmp_path):
    """Regression: a region whose array-column cells are ALL
    single-DATA (the common sparsely-filled repeating field) used to
    pass the region-global fast branch unwrapped, and pyarrow then
    exploded each string into its characters. Array mode must take the
    per-row path and wrap every cell."""
    path = tmp_path / "solo.xml"
    rows = "\n".join(
        '<ROW MODID="1" RECORDID="1">'
        f"<COL><DATA>name {r}</DATA></COL>"
        f"<COL><DATA>solo {r}</DATA></COL>"
        f"<COL><DATA>tail {r}</DATA></COL>"
        "</ROW>"
        for r in range(6)
    )
    path.write_bytes(
        (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">\n'
            "<ERRORCODE>0</ERRORCODE>\n"
            '<DATABASE DATEFORMAT="D.m.yyyy" LAYOUT="" NAME="Arr" RECORDS="6" '
            'TIMEFORMAT="k:mm:ss"/>\n'
            "<METADATA>"
            '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Naam" TYPE="TEXT"/>'
            '<FIELD EMPTYOK="YES" MAXREPEAT="3" NAME="Vindplaats" TYPE="TEXT"/>'
            '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Tail" TYPE="TEXT"/>'
            "</METADATA>\n"
            '<RESULTSET FOUND="6">\n' + rows + "\n</RESULTSET>\n"
            "</FMPXMLRESULT>\n"
        ).encode("utf-8")
    )
    from ceneton_database_tools_spark.sources.fmp_xml import iter_fmp_value_regions

    spec = frozenset([1])
    with open_xml_stream(str(path)) as stream:
        flat = [v for _, vals in iter_fmp_value_regions(stream, 3, repeats=spec) for v in vals]
    assert flat[1::3] == [[f"solo {r}"] for r in range(6)]
    df = read_fmp_xml_df(spark, str(path), repeats="array")
    rows_out = df.orderBy("naam").collect()
    assert [r.vindplaats for r in rows_out] == [[f"solo {r}"] for r in range(6)]


# -- round-5 review regressions ---------------------------------------------


def test_et_path_constant_memory():
    """root.clear() alone freed nothing (ROWs accumulate under the
    live RESULTSET element) — the ET fallback must stay bounded on a
    100 GB-class export. 5k rows must peak well under the full-tree
    footprint."""
    import io
    import tracemalloc

    from ceneton_database_tools_spark.sources.fmp_xml import iter_fmp_rows_et

    rows = "".join(
        f'<ROW MODID="1" RECORDID="{i}"><COL><DATA>v{i}</DATA></COL></ROW>'
        for i in range(5000)
    )
    doc = (
        '<?xml version="1.0"?>'
        '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">'
        '<ERRORCODE>0</ERRORCODE><DATABASE RECORDS="5000"/><METADATA>'
        '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="A" TYPE="TEXT"/></METADATA>'
        f'<RESULTSET FOUND="5000">{rows}</RESULTSET></FMPXMLRESULT>'
    ).encode()
    tracemalloc.start()
    out = list(iter_fmp_rows_et(io.BytesIO(doc), 1))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(out) == 5000 and out[-1] == ("v4999",)
    assert peak < 3_000_000, f"ET path held the whole tree: peak={peak}"


def _prefixed_doc(nrows: int) -> bytes:
    rows = "".join(
        f'<f:ROW MODID="1" RECORDID="{i}"><f:COL><f:DATA>v{i}</f:DATA></f:COL></f:ROW>'
        for i in range(nrows)
    )
    return (
        '<?xml version="1.0"?>'
        '<f:FMPXMLRESULT xmlns:f="http://www.filemaker.com/fmp/1/result">'
        f'<f:ERRORCODE>0</f:ERRORCODE><f:DATABASE RECORDS="{nrows}"/><f:METADATA>'
        '<f:FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="A" TYPE="TEXT"/></f:METADATA>'
        f'<f:RESULTSET FOUND="{nrows}">{rows}</f:RESULTSET></f:FMPXMLRESULT>'
    ).encode()


def test_namespace_prefixed_export_never_silently_empty(spark, tmp_path):
    """A namespace-PREFIXED export has no literal b'<ROW' for the
    byte-range scanner; the split planner must detect that (driver-side
    probe) and fall back to the whole-file ET path instead of loading
    an empty DataFrame."""
    path = tmp_path / "prefixed.xml"
    path.write_bytes(_prefixed_doc(400))
    # force a split size small enough that the planner WOULD split
    df = read_fmp_xml_df(spark, str(path), split=4096)
    rows = df.collect()
    assert len(rows) == 400
    assert rows[0][0] == "v0"


def test_non_utf8_export_falls_back_to_et(tmp_path):
    """A declared non-UTF-8 encoding must fall back to ET (which honors
    the prolog) instead of crashing with UnicodeDecodeError."""
    from ceneton_database_tools_spark.sources.fmp_xml import iter_fmp_rows

    doc = (
        "<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>"
        '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">'
        '<ERRORCODE>0</ERRORCODE><DATABASE RECORDS="1"/><METADATA>'
        '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="A" TYPE="TEXT"/></METADATA>'
        '<RESULTSET FOUND="1">'
        "<ROW MODID=\"1\" RECORDID=\"1\"><COL><DATA>caf\xe9</DATA></COL></ROW>"
        "</RESULTSET></FMPXMLRESULT>"
    ).encode("iso-8859-1")
    path = tmp_path / "latin1.xml"
    path.write_bytes(doc)
    with open_xml_stream(str(path)) as stream:
        rows = list(iter_fmp_rows(stream, 1))
    assert rows == [("café",)]


def test_literal_path_with_brackets(tmp_path):
    """A real file whose NAME contains glob metacharacters (browser
    download dedup: export[1].xml) must resolve literally, not as a
    character class."""
    from ceneton_database_tools_spark.sources.fmp_xml import resolve_source_paths

    p = tmp_path / "export[1].xml"
    p.write_bytes(b"<x/>")
    assert resolve_source_paths(str(p)) == [str(p)]


def test_to_double_rejects_underscores():
    from ceneton_database_tools_spark.sources.fmp_xml import _to_double

    assert _to_double("1_000") is None  # SQL CAST rejects PEP 515 forms
    assert _to_double("1000") == 1000.0
    assert _to_double("1.5e2") == 150.0
    assert _to_double("x") is None


def test_register_fmp_source_requires_spark4():
    from ceneton_database_tools_spark.sources.fmp_xml import register_fmp_source

    class _NoRegistry:  # pre-4.0 session shape
        pass

    with pytest.raises(RuntimeError, match="PySpark >= 4.0"):
        register_fmp_source(_NoRegistry())


# -- round-6: typed=true + repeats='array' → array<double> -------------------


def _write_typed_array_fixture(path, rows_xml, nrows):
    path.write_bytes(
        (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">\n'
            "<ERRORCODE>0</ERRORCODE>\n"
            f'<DATABASE DATEFORMAT="D.m.yyyy" LAYOUT="" NAME="Num" RECORDS="{nrows}" '
            'TIMEFORMAT="k:mm:ss"/>\n'
            "<METADATA>"
            '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Naam" TYPE="TEXT"/>'
            '<FIELD EMPTYOK="YES" MAXREPEAT="3" NAME="Bedrag" TYPE="NUMBER"/>'
            '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Prijs" TYPE="NUMBER"/>'
            "</METADATA>\n"
            f'<RESULTSET FOUND="{nrows}">\n' + rows_xml + "\n</RESULTSET>\n"
            "</FMPXMLRESULT>\n"
        ).encode("utf-8")
    )


def test_datasource_typed_array_mode(spark, tmp_path):
    """typed=true extends to repeating NUMBER fields under
    repeats='array': array<double> with SQL-CAST null semantics per
    ELEMENT (unparseable → null element, list shape preserved), while
    the scalar NUMBER column still casts to plain double."""
    path = tmp_path / "num.xml"
    shapes = [
        "<COL><DATA>1.5</DATA><DATA>2.25</DATA></COL>",  # multi-DATA
        "<COL><DATA>7</DATA></COL>",                     # single-DATA fast wrap
        "<COL/>",                                        # null array
        "<COL><DATA>oops</DATA><DATA>3</DATA></COL>",    # unparseable element
        "<COL><DATA/></COL>",                            # empty element
    ]
    rows = "\n".join(
        '<ROW MODID="1" RECORDID="1">'
        f"<COL><DATA>name {r}</DATA></COL>"
        f"{shapes[r % len(shapes)]}"
        f"<COL><DATA>{r}.25</DATA></COL>"
        "</ROW>"
        for r in range(5)
    )
    _write_typed_array_fixture(path, rows, 5)
    df = read_fmp_xml_df(spark, str(path), repeats="array", typed=True)
    assert dict(df.dtypes)["bedrag"] == "array<double>"
    assert dict(df.dtypes)["prijs"] == "double"
    out = df.orderBy("naam").collect()
    assert [r.bedrag for r in out] == [
        [1.5, 2.25],
        [7.0],
        None,
        [None, 3.0],
        [None],
    ]
    assert [r.prijs for r in out] == [0.25, 1.25, 2.25, 3.25, 4.25]
    # untyped array mode unchanged
    df_s = read_fmp_xml_df(spark, str(path), repeats="array", typed=False)
    assert dict(df_s.dtypes)["bedrag"] == "array<string>"


def test_datasource_typed_array_fast_path_region(spark, tmp_path):
    """All-single-DATA regions take the grammar-scanner FAST path —
    typed array conversion must produce identical arrays there (the
    fast-path/slow-path split is this source's recurring bug class)."""
    path = tmp_path / "numsolo.xml"
    rows = "\n".join(
        '<ROW MODID="1" RECORDID="1">'
        f"<COL><DATA>name {r}</DATA></COL>"
        f"<COL><DATA>{r}.5</DATA></COL>"
        f"<COL><DATA>{r}</DATA></COL>"
        "</ROW>"
        for r in range(6)
    )
    _write_typed_array_fixture(path, rows, 6)
    df = read_fmp_xml_df(spark, str(path), repeats="array", typed=True)
    out = df.orderBy("naam").collect()
    assert [r.bedrag for r in out] == [[r + 0.5] for r in range(6)]


# -- round-7 review hardening: fast-path well-formedness parity with ET,
#    CAST-exact typed mode, identity-keyed streaming offsets ---------------


def _one_field_doc(data_markup: str) -> bytes:
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">'
        '<ERRORCODE>0</ERRORCODE><DATABASE RECORDS="1"/><METADATA>'
        '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="A" TYPE="TEXT"/></METADATA>'
        '<RESULTSET FOUND="1">'
        f'<ROW MODID="1" RECORDID="1"><COL>{data_markup}</COL></ROW>'
        "</RESULTSET></FMPXMLRESULT>"
    ).encode()


def _pipeline_rows(tmp_path, doc: bytes):
    path = tmp_path / "doc.xml"
    path.write_bytes(doc)
    with open_xml_stream(str(path)) as stream:
        return list(iter_fmp_rows(stream, 1))


@pytest.mark.parametrize(
    "payload",
    [
        "<DATA>x&nbsp;y</DATA>",  # undefined entity (no DTD)
        "<DATA>a&#0;b</DATA>",  # illegal XML char reference
        "<DATA>a&#xD800;b</DATA>",  # surrogate code point
        "<DATA>a&#1114112;b</DATA>",  # > U+10FFFF (bare chr() ValueError)
        "<DATA>a & b</DATA>",  # bare ampersand
    ],
)
def test_fastpath_rejects_undefined_entities_like_et(tmp_path, payload):
    """Round-7 review: the fast path used to silently pass these
    through as cell text while ET (and the reference) reject the
    document. 'Any structural surprise raises, never a silent wrong
    answer' now holds for entity errors too: the fast path defers to
    ET, whose ParseError propagates."""
    from xml.etree.ElementTree import ParseError

    with pytest.raises(ParseError):
        _pipeline_rows(tmp_path, _one_field_doc(payload))


def test_fastpath_valid_character_references_still_decode(tmp_path):
    assert _pipeline_rows(
        tmp_path, _one_field_doc("<DATA>caf&#233; &#x1F600; &amp;</DATA>")
    ) == [("café \U0001f600 &",)]


@pytest.mark.parametrize(
    ("payload", "expected"),
    [
        ("<DATA>a<!--x-->b</DATA>", "ab"),  # comment inside DATA
        ("<DATA>a<![CDATA[b]]></DATA>", "ab"),  # CDATA inside DATA
    ],
)
def test_fastpath_defers_markup_nested_inside_data_to_et(
    tmp_path, payload, expected
):
    """Round-7 review: _DATA_RE's non-greedy span used to capture
    nested markup as raw cell text ('a<!--x-->b'); now the fast path
    raises and ET produces the spec-correct merged text."""
    assert _pipeline_rows(tmp_path, _one_field_doc(payload)) == [(expected,)]


def test_to_double_rejects_non_ascii_numerals():
    """Round-7 review: Python float() takes fullwidth/Arabic-Indic
    digits and Unicode whitespace that Java's Double.parseDouble
    (Spark CAST) rejects — typed=true must match a CAST oracle."""
    from ceneton_database_tools_spark.sources.fmp_xml import _to_double

    assert _to_double("１２３") is None  # fullwidth digits
    assert _to_double("١٢٣") is None  # Arabic-Indic digits
    assert _to_double("\xa01\xa0") is None  # NBSP padding
    assert _to_double(" 1.5 ") == 1.5  # ASCII whitespace still trims


def test_mislabeled_encoding_takes_et_path_not_silent_utf8(tmp_path):
    """Round-7 review: a file DECLARED ISO-8859-1 whose bytes happen to
    be valid UTF-8 used to decode cleanly on the fast path, yielding
    different text than a spec-correct parse. The declared-encoding
    guard now routes it to ET, which honors the prolog: the UTF-8
    bytes 0xC3 0xA9 come back as the two latin-1 chars 'Ã©' — exactly
    what the reference's parser would produce."""
    doc = (
        '<?xml version="1.0" encoding="ISO-8859-1"?>'
        '<FMPXMLRESULT xmlns="http://www.filemaker.com/fmp/1/result">'
        '<ERRORCODE>0</ERRORCODE><DATABASE RECORDS="1"/><METADATA>'
        '<FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="A" TYPE="TEXT"/></METADATA>'
        '<RESULTSET FOUND="1">'
        '<ROW MODID="1" RECORDID="1"><COL><DATA>cafÃ©</DATA></COL></ROW>'
        "</RESULTSET></FMPXMLRESULT>"
    ).encode("latin-1")  # bytes 0xC3 0xA9 — valid UTF-8 for 'é'
    path = tmp_path / "mislabeled.xml"
    path.write_bytes(doc)
    with open_xml_stream(str(path)) as stream:
        rows = list(iter_fmp_rows(stream, 1))
    assert rows == [("cafÃ©",)]


def test_probe_refuses_split_for_declared_legacy_encoding(tmp_path):
    """Byte-range splits decode UTF-8 with no whole-document fallback;
    the planning probe must keep declared-legacy-encoding exports on
    the whole-file partition."""
    from ceneton_database_tools_spark.sources.fmp_xml import _probe_literal_row

    utf8 = tmp_path / "ok.xml"
    utf8.write_bytes(b'<?xml version="1.0" encoding="UTF-8"?><R><ROW/></R>')
    assert _probe_literal_row(str(utf8))
    latin = tmp_path / "legacy.xml"
    latin.write_bytes(b'<?xml version="1.0" encoding="ISO-8859-1"?><R><ROW/></R>')
    assert not _probe_literal_row(str(latin))
    nodecl = tmp_path / "nodecl.xml"
    nodecl.write_bytes(b"<R><ROW/></R>")
    assert _probe_literal_row(str(nodecl))


def test_streaming_offset_reingests_overwritten_snapshot(tmp_path):
    """Round-7 review: offsets keyed by NAME alone skipped a snapshot
    atomically renamed OVER an existing name (rolling 'latest.xml') —
    silent data loss. Identity-keyed offsets re-ingest it."""
    import os

    from ceneton_database_tools_spark.sources.fmp_xml import (
        FMPXMLSimpleStreamReader,
    )

    src = tmp_path / "in"
    src.mkdir()
    latest = src / "latest.xml"
    _write_stream_shard(latest, ["1", "2"])
    reader = FMPXMLSimpleStreamReader(str(src), ["nummer", "titel"], "error")
    rows1, off1 = reader.read(reader.initialOffset())
    assert [r[0] for r in rows1] == ["1", "2"]
    # same listing, same identity: nothing new
    rows1b, off1b = reader.read(off1)
    assert list(rows1b) == [] and off1b == off1
    # atomic rename OVER the same name (force a distinct mtime_ns for
    # filesystems with coarse timestamps)
    staged = src / ".staged.tmp"
    _write_stream_shard(staged, ["3"])
    st = os.stat(latest)
    os.replace(staged, latest)
    os.utime(latest, ns=(st.st_mtime_ns + 1_000_000, st.st_mtime_ns + 1_000_000))
    rows2, off2 = reader.read(off1)
    assert [r[0] for r in rows2] == ["3"]
    # the stale identity entry aged out; only the new snapshot remains
    assert [e[0] for e in off2["seen"]] == [str(latest)]
    assert off2["seen"][0][1:] != list(off1["seen"][0][1:])


def test_streaming_offset_legacy_name_entries_still_honored(tmp_path):
    """A checkpoint written before identity-keyed offsets holds plain
    path strings; they must keep suppressing re-ingest (no mass replay
    on upgrade) and replay correctly through readBetweenOffsets."""
    from ceneton_database_tools_spark.sources.fmp_xml import (
        FMPXMLSimpleStreamReader,
    )

    src = tmp_path / "in"
    src.mkdir()
    a, b = src / "a.xml", src / "b.xml"
    _write_stream_shard(a, ["1"])
    _write_stream_shard(b, ["2"])
    reader = FMPXMLSimpleStreamReader(str(src), ["nummer", "titel"], "error")
    rows, off = reader.read({"seen": [str(a)]})  # legacy offset
    assert [r[0] for r in rows] == ["2"]  # a.xml stays suppressed
    assert str(a) in off["seen"]  # legacy entry carried forward as-is
    replay = list(reader.readBetweenOffsets({"seen": [str(a)]}, off))
    assert [r[0] for r in replay] == ["2"]


def test_replay_verifies_committed_identity(tmp_path):
    """Round-8 (ADVICE): a crash-recovery replay of a committed batch
    must verify the on-disk file still IS the committed snapshot —
    re-reading an atomically-overwritten file under the old offset
    would silently hand the recovered batch different rows. Matching
    identity replays; changed or vanished identity fails loudly."""
    import os

    from ceneton_database_tools_spark.sources.fmp_xml import (
        FMPXMLSimpleStreamReader,
    )

    src = tmp_path / "in"
    src.mkdir()
    latest = src / "latest.xml"
    _write_stream_shard(latest, ["1", "2"])
    reader = FMPXMLSimpleStreamReader(str(src), ["nummer", "titel"], "error")
    rows, off = reader.read(reader.initialOffset())
    assert [r[0] for r in rows] == ["1", "2"]
    # untouched file: replay reproduces the committed rows
    replay = list(reader.readBetweenOffsets({"seen": []}, off))
    assert [r[0] for r in replay] == ["1", "2"]
    # snapshot atomically overwritten since the commit: replay refuses
    staged = src / ".staged.tmp"
    _write_stream_shard(staged, ["9"])
    st = os.stat(latest)
    os.replace(staged, latest)
    os.utime(latest, ns=(st.st_mtime_ns + 1_000_000, st.st_mtime_ns + 1_000_000))
    with pytest.raises(RuntimeError, match="no longer the committed snapshot"):
        list(reader.readBetweenOffsets({"seen": []}, off))
    # file vanished since the commit: refuse too
    os.unlink(latest)
    with pytest.raises(RuntimeError, match="is gone"):
        list(reader.readBetweenOffsets({"seen": []}, off))


def test_stream_reader_requires_path_option(spark, tmp_path):
    """A missing path must raise, not silently watch the driver's cwd
    (Path('') normalizes to '.')."""
    from ceneton_database_tools_spark.sources.fmp_xml import register_fmp_source

    register_fmp_source(spark)
    sdf = spark.readStream.schema("nummer string, titel string").format(
        "fmpxml"
    ).load()
    q = None
    with pytest.raises(Exception, match="requires a path"):
        q = (
            sdf.writeStream.format("memory")
            .queryName("no_path_stream")
            .option(
                "checkpointLocation", str(tmp_path / "ck_nopath")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if q is not None:
        q.stop()


def test_streaming_ingest_bz2_landings(spark, tmp_path):
    """readStream ingests .bz2 snapshot drops exactly once — the
    reference's compressed-snapshot convention (VERDICT r10 #7) on the
    streaming face: the watch listing already matches *.xml.bz2 and
    the row path opens through the decompression-transparent seam
    (sources/paths.py open_xml_stream), so a bz2 landing behaves
    identically to a plain one, including restart semantics."""
    import bz2 as _bz2

    from ceneton_database_tools_spark.sources.fmp_xml import register_fmp_source

    src = tmp_path / "in"
    src.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def _drop_bz2(name: str, nums) -> None:
        plain = tmp_path / "plain.xml"
        _write_stream_shard(plain, nums)
        # stage-and-rename arrival: compress outside the watch dir,
        # then atomically move in (the documented landing contract)
        staged = tmp_path / (name + ".tmp")
        staged.write_bytes(_bz2.compress(plain.read_bytes()))
        staged.rename(src / name)
        plain.unlink()

    _drop_bz2("export_a.xml.bz2", ["100", "101"])
    register_fmp_source(spark)

    def run_once():
        sdf = (
            spark.readStream.format("fmpxml")
            .option("multi", "true")
            .load(str(src))
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.nummer for r in spark.read.parquet(out).collect())

    # schema inference itself read the bz2 header (no plain file exists)
    assert run_once() == ["100", "101"]
    # replay from the same checkpoint: nothing re-ingested
    assert run_once() == ["100", "101"]
    # a later bz2 drop and a PLAIN drop land together, each exactly once
    _drop_bz2("export_b.xml.bz2", ["200"])
    _write_stream_shard(src / "export_c.xml", ["300", "301"])
    assert run_once() == ["100", "101", "200", "300", "301"]
