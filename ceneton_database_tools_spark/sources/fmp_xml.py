"""FMP-XML source: Spark 4 Python DataSource for FileMaker Pro exports.

Re-expresses the reference's streaming parser
(``/root/reference/src/ceneton_database_utils/fmp_reader.py:79-186``)
Spark-first:

* the XML header (``<DATABASE>`` / ``<METADATA><FIELD>``) is parsed
  **driver-side** — it is the first few KB of the file — producing the
  all-string StructType (schema.py);
* rows stream **executor-side** through the DataSource reader,
  constant memory per partition;
* parallelism comes from BOTH axes: one input partition per export
  file, AND — because the rigid FMP grammar keeps ``<`` escaped in
  all text, making ``b"<ROW"`` an unambiguous row boundary — byte-range
  splits WITHIN a large plain ``.xml`` file (the Hadoop InputSplit
  protocol; see ``iter_fmp_split_regions``). A single 100 GB export
  scans on every core instead of one.

Deliberate behavior differences from the reference (documented, not
accidental — SURVEY.md §1.4 quirks):

* namespaces are resolved by splitting the Clark-notation tag
  (``{ns}TAG``) instead of positional string slicing, so exports with
  a different default namespace parse correctly instead of silently
  producing garbage tag names (``fmp_reader.py:75-76,103``);
* the ``<COL>`` element level is honored: a ``<COL/>`` with no
  ``<DATA>`` yields NULL, and repeating fields (``MAXREPEAT`` > 1,
  multiple ``<DATA>`` per ``<COL>``) either join on the ASCII group
  separator or raise, per the ``repeats`` option — the reference
  ignores ``<COL>`` entirely and crashes on both cases
  (``fmp_reader.py:109-117``);
* the header/resultset record-count mismatch still warns exactly like
  ``fmp_reader.py:155-161``.
"""

from __future__ import annotations

import logging
import re
from collections.abc import Iterator
from typing import IO, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as SqlT
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ceneton_database_tools_spark.schema import (
    FMPField,
    FMPSchema,
    default_header_strategy,
)
from ceneton_database_tools_spark.sources.paths import (
    open_xml_stream,
    resolve_input_path,
)

logger = logging.getLogger(__name__)

REPEAT_SEPARATOR = "\x1d"  # ASCII group separator for joined repeating fields

HeaderStrategy = Callable[[list[FMPField]], list[str]]

#: Parse-level repeating-field mode. The public option is a string —
#: ``"error"`` (reference-crash parity), ``"join"`` (GS-joined string),
#: ``"array"`` (typed arrays) — but ``"array"`` needs the header to
#: know WHICH columns are arrays, so before parsing it is resolved to a
#: frozenset of MAXREPEAT>1 column indices; the parse functions accept
#: either form and every intermediate layer forwards it untouched.
RepeatSpec = "str | frozenset[int]"


def repeat_spec_for_fields(repeats: str, fields: list[FMPField]):
    """Resolve the public ``repeats`` option against a parsed header:
    ``"array"`` → frozenset of array-typed column indices; the string
    modes pass through."""
    if repeats == "array":
        return frozenset(i for i, f in enumerate(fields) if f.max_repeat > 1)
    return repeats


def _repeat_error(n: int) -> ValueError:
    return ValueError(
        f"repeating field with {n} DATA values in one COL; pass "
        "repeats='join' to join on the ASCII group separator or "
        "repeats='array' for typed ArrayType columns (declared "
        "MAXREPEAT > 1 fields only)"
    )


def _local_tag(tag: object) -> str:
    """Clark-notation ``{ns}TAG`` → ``TAG`` (namespace-agnostic)."""
    if isinstance(tag, str) and tag.startswith("{"):
        return tag.rsplit("}", 1)[1]
    return str(tag)


#: TYPE values the reference's ``FMPFieldType`` enum accepts
#: (``fmp_reader.py:32-34``); anything else raises there
#: (``FMPFieldType[elem.attrib["TYPE"]]``, ``fmp_reader.py:133``).
KNOWN_FMP_TYPES = frozenset({"TEXT", "NUMBER"})


def parse_fmp_header(
    stream: IO[bytes],
    header_strategy: HeaderStrategy = default_header_strategy,
    strict_types: bool = False,
) -> FMPSchema:
    """Parse only the export header and return the FMPSchema.

    Stops at the ``<RESULTSET>`` start tag — rows are never touched, so
    schema inference costs a few KB of parsing regardless of file size
    (the property the reference's dump_headers relies on,
    ``_cli.py:44-48``).

    ``strict_types=True`` reproduces the reference's behavior of
    raising on a TYPE outside {TEXT, NUMBER} (``fmp_reader.py:133``).
    The default is a DOCUMENTED deviation: unknown TYPEs degrade to
    TEXT (every cell is a string at parse time anyway), so an export
    from a newer FMP version still loads instead of failing on a
    metadata attribute.
    """
    from xml.etree.ElementTree import iterparse

    header_attrs: dict[str, str] = {}
    fields: list[FMPField] = []
    database_count: int | None = None

    for event, elem in iterparse(stream, events=("start", "end")):
        tag = _local_tag(elem.tag)
        if event == "end" and tag == "DATABASE":
            header_attrs.update(elem.attrib)
            database_count = int(elem.attrib["RECORDS"])
        elif event == "end" and tag == "FIELD":
            fmp_type = elem.attrib.get("TYPE", "TEXT")
            if strict_types and fmp_type not in KNOWN_FMP_TYPES:
                raise ValueError(
                    f"unknown FMP field TYPE {fmp_type!r} for field "
                    f"{elem.attrib.get('NAME', '?')!r}; known: "
                    f"{sorted(KNOWN_FMP_TYPES)} (strict_types=True reproduces "
                    "the reference's FMPFieldType[...] KeyError)"
                )
            fields.append(
                FMPField(
                    name=elem.attrib["NAME"],
                    empty_ok=elem.attrib.get("EMPTYOK") == "YES",
                    max_repeat=int(elem.attrib.get("MAXREPEAT", "1")),
                    fmp_type=fmp_type,
                )
            )
        elif event == "start" and tag == "RESULTSET":
            found = int(elem.attrib["FOUND"])
            if database_count is not None and found != database_count:
                logger.warning(
                    "Number of records in header (%s) does not match number of "
                    "records in result set (%s). We are looking at a subset of "
                    "the database.",
                    database_count,
                    found,
                )
            clean_names = header_strategy(fields)
            if len(set(clean_names)) != len(fields):
                raise ValueError(
                    f"There are duplicate 'cleaned' names in the field list: {clean_names}"
                )
            return FMPSchema(
                name=header_attrs.get("NAME", ""),
                fields=fields,
                clean_names=clean_names,
                record_count=found,
                database_record_count=database_count,
                header_attrs=header_attrs,
            )
    raise ValueError("not an FMP XML export: no RESULTSET section found")


def iter_fmp_rows_et(
    stream: IO[bytes], n_fields: int, repeats: str = "error"
) -> Iterator[tuple]:
    """Stream the ``<RESULTSET>`` rows as tuples of ``str | None`` via
    ElementTree iterparse — the reference parser used as the fallback
    for inputs the fast scanner declines.

    Walks ROW → COL → DATA honoring the COL level; constant memory
    (each completed ROW subtree is discarded). ``repeats`` controls
    multi-DATA columns: ``"error"`` raises, ``"join"`` joins on the
    ASCII group separator.
    """
    from xml.etree.ElementTree import iterparse

    in_results = False
    row_values: list[str | None] = []
    col_data: list[str | None] = []
    in_col = False
    root = None
    resultset = None

    for event, elem in iterparse(stream, events=("start", "end")):
        if root is None:
            root = elem
        tag = _local_tag(elem.tag)
        if not in_results:
            if event == "start" and tag == "RESULTSET":
                in_results = True
                resultset = elem
            continue
        if event == "start":
            if tag == "ROW":
                row_values = []
            elif tag == "COL":
                in_col = True
                col_data = []
            continue
        # end events inside RESULTSET
        if tag == "DATA":
            if in_col:
                col_data.append(elem.text)
            elif isinstance(repeats, frozenset) and len(row_values) in repeats:
                # COL-less export: an array-declared column still emits
                # a (one-element) list so the tuple shape matches schema
                row_values.append([elem.text])
            else:  # COL-less export (the shape the reference assumes)
                row_values.append(elem.text)
        elif tag == "COL":
            in_col = False
            if isinstance(repeats, frozenset) and len(row_values) in repeats:
                # array column: <COL/> → null, else the DATA list
                row_values.append(list(col_data) if col_data else None)
            elif len(col_data) == 0:
                row_values.append(None)
            elif len(col_data) == 1:
                row_values.append(col_data[0])
            elif repeats == "join":
                row_values.append(
                    REPEAT_SEPARATOR.join("" if v is None else v for v in col_data)
                )
            else:
                # array mode with multi-DATA in a column the header
                # declared MAXREPEAT=1 lands here too: the header and
                # the data disagree, which must not silently flatten
                raise _repeat_error(len(col_data))
        elif tag == "ROW":
            if len(row_values) != n_fields:
                raise ValueError(
                    f"row has {len(row_values)} values but the header declares "
                    f"{n_fields} fields"
                )
            yield tuple(row_values)
            row_values = []
            # Completed ROW subtrees accumulate as children of the
            # LIVE RESULTSET element (the parser stack holds it), so
            # clearing the root alone frees nothing — clear RESULTSET
            # itself for actual constant memory on 100 GB exports.
            resultset.clear()
            root.clear()


# ---------------------------------------------------------------------------
# Fast-path row scanner
# ---------------------------------------------------------------------------
#
# FMP exports are machine-generated with a rigid row grammar —
# `<ROW …><COL><DATA>text</DATA></COL><COL/>…</ROW>` with the five XML
# entities (+ numeric refs) as the only escaping and no CDATA/comments.
# A find/regex scanner over that grammar parses ~8-10× faster than
# generic XML event parsing (measured: ~1.5k rec/s ET vs >10k rec/s
# scanner on a 126-column export), which is what lets the engine beat
# the reference's lxml figure without native code. Any structural
# surprise raises FMPFastPathError and the caller transparently
# re-parses with the strict ElementTree path above.

_COL_RE = re.compile(r"<COL\s*/>|<COL>(.*?)</COL>", re.DOTALL)
_DATA_RE = re.compile(r"<DATA\s*/>|<DATA>(.*?)</DATA>", re.DOTALL)
# single-pass findall for the three shapes covering ~100% of real rows:
# one capture group, so findall returns plain strings ('' for both the
# empty-COL shapes — ElementTree reports those as None too). The DATA
# content class is [^<]* — raw '<' is always escaped in XML text, so
# this can never swallow markup (e.g. a second <DATA> of a repeating
# field), and it avoids non-greedy backtracking entirely. Any COL shape
# outside these three (repeating fields, `<COL />` whitespace variants)
# simply produces no match, the value count comes up short, and the row
# re-parses on the strict per-COL slow path. findall over finditer is
# a measured ~1.7x on the scanner: no Match objects, no per-COL Python
# loop.
_FAST_COL_RE = re.compile(r"<COL><DATA>([^<]*)</DATA></COL>|<COL(?:><DATA/></COL|/)>")
_ENTITY_RE = re.compile(r"&(amp|lt|gt|quot|apos|#[0-9]+|#x[0-9a-fA-F]+);")
_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


class FMPFastPathError(Exception):
    """Input deviates from the rigid FMP grammar; use the ET parser."""


# The fast scanners decode UTF-8 unconditionally and count on
# UnicodeDecodeError to reach the encoding-honoring ET fallback — but a
# file DECLARED as e.g. ISO-8859-1 whose bytes happen to be valid UTF-8
# (the common mislabeled-export case) decodes cleanly and would silently
# yield different text than a spec-correct parse. Any declared encoding
# outside the UTF-8/ASCII aliases therefore raises for the ET path
# (whole-file scan) and disables byte-range splitting (planning probe).
_XML_DECL_ENC_RE = re.compile(r"""<\?xml[^>]*?encoding\s*=\s*["']([^"']+)["']""")
_XML_DECL_ENC_RE_B = re.compile(rb"""<\?xml[^>]*?encoding\s*=\s*["']([^"']+)["']""")
_UTF8_COMPAT_ENCODINGS = frozenset({"utf-8", "utf8", "utf_8", "us-ascii", "ascii"})


def _check_declared_encoding(prefix: str) -> None:
    m = _XML_DECL_ENC_RE.match(prefix.lstrip("\ufeff \t\r\n"))
    if m and m.group(1).strip().lower() not in _UTF8_COMPAT_ENCODINGS:
        raise FMPFastPathError(
            f"declared encoding {m.group(1)!r} is not UTF-8; ET honors it"
        )


def _unescape(s: str) -> str:
    if "&" not in s:
        return s
    n_matched = 0

    def sub(m: re.Match) -> str:
        nonlocal n_matched
        n_matched += 1
        t = m.group(1)
        if t in _ENTITIES:
            return _ENTITIES[t]
        cp = int(t[2:], 16) if t.startswith("#x") else int(t[1:])
        # XML 1.0 §2.2 Char production: a reference outside it (&#0;,
        # surrogates, > U+10FFFF) is not well-formed — ET rejects the
        # document, so the fast path must not silently emit the char
        # (chr() would even raise a bare ValueError past U+10FFFF and
        # skip the ET fallback entirely).
        if not (
            cp in (0x9, 0xA, 0xD)
            or 0x20 <= cp <= 0xD7FF
            or 0xE000 <= cp <= 0xFFFD
            or 0x10000 <= cp <= 0x10FFFF
        ):
            raise FMPFastPathError(f"illegal character reference &#{cp};")
        return chr(cp)

    out = _ENTITY_RE.sub(sub, s)
    if n_matched != s.count("&"):
        # an '&' that did not start a recognized reference: either a
        # bare ampersand (not well-formed) or an entity outside the
        # XML-predefined five (&nbsp; — undefined without a DTD, ET
        # raises 'undefined entity'). Never pass it through as text.
        raise FMPFastPathError("bare '&' or undefined entity in DATA text")
    return out


def _norm_text(s: str) -> str | None:
    # XML 1.0 §2.11 end-of-line normalization + empty-element → None
    # (ElementTree reports both <DATA/> and <DATA></DATA> as text=None)
    if not s:
        return None
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    return _unescape(s)


def _parse_row_chunk(chunk: str, n_fields: int, repeats) -> tuple:
    values = _FAST_COL_RE.findall(chunk)
    if len(values) != n_fields:
        # a COL outside the three fast shapes (repeating field,
        # whitespace variant) yields no match — re-parse this row on
        # the strict per-COL path, which itself raises FMPFastPathError
        # on anything structurally surprising.
        return _parse_row_chunk_slow(chunk, n_fields, repeats)
    if isinstance(repeats, frozenset) and repeats:
        # array mode: a single-DATA array cell must still come out as a
        # one-element list; an empty match is ambiguous between <COL/>
        # (→ null) and <COL><DATA/></COL> (→ [null]) at findall level,
        # so that cell re-parses on the per-COL path.
        if any(not values[i] for i in repeats):
            return _parse_row_chunk_slow(chunk, n_fields, repeats)
        out = [
            None if not v else (_norm_text(v) if "&" in v or "\r" in v else v)
            for v in values
        ]
        for i in repeats:
            out[i] = [out[i]]
        return tuple(out)
    # hot path: most cells have no CR and no entity — skip both calls
    return tuple(
        None
        if not v
        else (_norm_text(v) if "&" in v or "\r" in v else v)
        for v in values
    )


def _parse_row_chunk_slow(chunk: str, n_fields: int, repeats) -> tuple:
    array_cols = repeats if isinstance(repeats, frozenset) else frozenset()
    values: list = []
    for m in _COL_RE.finditer(chunk):
        body = m.group(1)
        is_array = len(values) in array_cols
        if body is None:  # <COL/>
            values.append(None)
            continue
        # Contract: any structural surprise raises FMPFastPathError so
        # the strict ET parser decides. A COL body must be DATA elements
        # plus whitespace — CDATA sections, comments, or stray markup
        # would otherwise be captured as raw cell text.
        leftover = _DATA_RE.sub("", body)
        if leftover.strip():
            raise FMPFastPathError(
                f"COL body contains non-DATA markup: {leftover.strip()[:60]!r}"
            )
        datas = _DATA_RE.findall(body)
        # _DATA_RE's non-greedy span swallows markup NESTED inside a
        # DATA element (<DATA>a<!--x-->b</DATA> captures 'a<!--x-->b'),
        # which the between-DATA leftover guard above cannot see. Raw
        # '<' is never legal in XML character data, so its presence in
        # captured text always means comments/CDATA/child elements —
        # let ET parse them properly instead of emitting raw markup.
        if any("<" in d for d in datas):
            raise FMPFastPathError("markup nested inside DATA text")
        if is_array:
            values.append([_norm_text(d) for d in datas] if datas else None)
        elif len(datas) == 1:
            values.append(_norm_text(datas[0]))
        elif len(datas) == 0:
            values.append(None)
        elif repeats == "join":
            values.append(
                REPEAT_SEPARATOR.join(_norm_text(d) or "" for d in datas)
            )
        else:
            # includes array mode's MAXREPEAT=1 columns: header and
            # data disagree — never silently flatten
            raise _repeat_error(len(datas))
    if len(values) != n_fields:
        raise FMPFastPathError(
            f"row has {len(values)} COL groups, header declares {n_fields}"
        )
    return tuple(values)


class _ScanBuffer:
    """Chunked text window over the byte stream, shared by the row and
    region scanners: grow-on-demand buffer with consumed-prefix
    trimming, the RESULTSET seek, and the detach-not-close contract
    (the caller may rewind the underlying binary stream for the ET
    fallback)."""

    def __init__(self, stream: IO[bytes], chunk_size: int):
        import io

        self.text = io.TextIOWrapper(stream, encoding="utf-8", newline="")
        self.chunk_size = chunk_size
        self.buf = ""
        self.pos = 0

    def fill(self) -> bool:
        piece = self.text.read(self.chunk_size)
        if self.pos:
            self.buf = self.buf[self.pos :]
            self.pos = 0
        self.buf += piece
        return bool(piece)

    def seek_resultset(self) -> None:
        if not self.buf:
            self.fill()
            _check_declared_encoding(self.buf[:256])
        while True:
            idx = self.buf.find("<RESULTSET", self.pos)
            if idx >= 0:
                self.pos = idx
                return
            self.pos = max(0, len(self.buf) - 16)  # a split tag can straddle chunks
            if not self.fill():
                raise FMPFastPathError("no RESULTSET section found")

    def detach(self) -> None:
        self.text.detach()


def iter_fmp_rows_fast(
    stream: IO[bytes], n_fields: int, repeats: str = "error"
) -> Iterator[tuple]:
    """Scanner fast path: chunked read, ``</ROW>``-delimited slices,
    regex COL/DATA extraction. Constant memory (buffer holds at most
    one chunk + one partial row). Raises FMPFastPathError on any
    structural deviation so the caller can fall back to ET."""
    sb = _ScanBuffer(stream, 1 << 20)
    try:
        sb.seek_resultset()
        while True:
            end = sb.buf.find("</ROW>", sb.pos)
            while end == -1:
                if not sb.fill():
                    if "<ROW" in sb.buf[sb.pos :]:
                        raise FMPFastPathError("unterminated ROW at end of input")
                    return
                end = sb.buf.find("</ROW>", sb.pos)
            start = sb.buf.find("<ROW", sb.pos)
            if start == -1 or start > end:
                raise FMPFastPathError("ROW structure out of order")
            body_start = sb.buf.find(">", start, end)
            if body_start == -1:
                raise FMPFastPathError("malformed ROW start tag")
            yield _parse_row_chunk(sb.buf[body_start + 1 : end], n_fields, repeats)
            sb.pos = end + len("</ROW>")
    finally:
        sb.detach()


def iter_fmp_rows(
    stream: IO[bytes], n_fields: int, repeats: str = "error"
) -> Iterator[tuple]:
    """Row stream with automatic strategy choice: try the fast scanner;
    on a structural surprise, rewind and re-parse with ElementTree,
    skipping any rows the fast path already produced. The fallback
    needs a seekable stream (plain files and bz2 both are)."""
    try:
        start_pos = stream.tell() if stream.seekable() else None
    except Exception:
        start_pos = None
    if start_pos is None:
        yield from iter_fmp_rows_et(stream, n_fields, repeats=repeats)
        return
    yielded = 0
    try:
        for row in iter_fmp_rows_fast(stream, n_fields, repeats=repeats):
            yield row
            yielded += 1
    except (FMPFastPathError, UnicodeDecodeError):
        # UnicodeDecodeError: the fast scanner hardcodes UTF-8; a
        # non-UTF-8 export (declared encoding in the XML prolog) must
        # fall back exactly like a structural surprise — ET honors the
        # declaration.
        stream.seek(start_pos)
        for i, row in enumerate(iter_fmp_rows_et(stream, n_fields, repeats=repeats)):
            if i >= yielded:
                yield row


def read_fmp_xml(
    source: IO[bytes] | str,
    header_strategy: HeaderStrategy = default_header_strategy,
    repeats: str = "error",
) -> Iterator[FMPSchema | tuple]:
    """Driver-side generator: yields the FMPSchema first, then row
    tuples — the reference's schema-then-rows streaming contract
    (``fmp_reader.py:79-113``), used by the CLI's metadata-only paths.

    Needs two passes over the header because stdlib iterparse cannot
    hand one parser between functions cheaply; the header is KBs.
    """
    owns = isinstance(source, str)
    stream = open_xml_stream(source) if owns else source
    try:
        schema = parse_fmp_header(stream, header_strategy)
        yield schema
        if owns:
            stream.close()
            stream = open_xml_stream(source)
        else:
            stream.seek(0)
        spec = repeat_spec_for_fields(repeats, schema.fields)
        yield from iter_fmp_rows(stream, len(schema.fields), repeats=spec)
    finally:
        if owns:
            stream.close()


# 4096 measured ~1.7x faster than 1024 on the Arrow-conversion leg of a
# 126-column export (per-batch pa.array call overhead amortizes); memory
# per in-flight batch stays ~15 MB at reference column widths.
ARROW_BATCH_ROWS = 4096

# Region size for the batch-columnar scanner: one regex pass per region
# instead of one per row. 4 MiB ≈ a few thousand reference-width rows.
_REGION_CHUNK = 4 << 20


def _parse_region_text(region: str, n_fields: int, repeats: str) -> tuple[int, list]:
    """Parse one ``</ROW>``-terminated region of complete rows into
    ``(n_rows, flat_values)`` — the shared core of the whole-file and
    byte-range region scanners.

    Per-row validation via one C-level split: every piece before the
    tail must open exactly one ROW and contain exactly n_fields COL
    units. This catches COMPENSATING structural errors (an extra COL in
    one row plus a missing COL in another) that region-global counts
    would cancel out; the global match-count check then ensures every
    COL was one of the fast shapes (a repeating field matches nothing
    and comes up short). Entity/CR normalization runs per-value only
    when the region contains ``&`` or ``\\r`` at all — the common
    machine-generated region skips it wholesale.
    """
    # array mode (non-empty frozenset) must take the per-row path: the
    # region-global branch returns plain strings, so a region whose
    # array cells are all single-DATA would pass the count check yet
    # never get wrapped into one-element lists (and pa.array(...,
    # list_(string())) would then explode each string into its
    # characters). _parse_row_chunk wraps correctly and keeps its own
    # fast path per row — and skipping the region-global findall/split
    # here avoids paying that full-region scan twice in array mode.
    if not (isinstance(repeats, frozenset) and repeats):
        pieces = region.split("</ROW>")
        n_rows = len(pieces) - 1
        values = _FAST_COL_RE.findall(region)
        if (
            len(values) == n_rows * n_fields
            and not pieces[-1].strip()
            and all(
                p.count("<ROW") == 1 and p.count("<COL") == n_fields
                for p in pieces[:-1]
            )
        ):
            if "&" in region or "\r" in region:
                return n_rows, [_norm_text(v) if v else None for v in values]
            return n_rows, [v or None for v in values]
    # row-by-row reparse of just this region: exact per-row
    # validation, same contract as the row scanner
    flat: list = []
    cnt = 0
    p = 0
    while True:
        e = region.find("</ROW>", p)
        if e == -1:
            break
        s = region.find("<ROW", p)
        if s == -1 or s > e:
            raise FMPFastPathError("ROW structure out of order")
        bs = region.find(">", s, e)
        if bs == -1:
            raise FMPFastPathError("malformed ROW start tag")
        flat.extend(_parse_row_chunk(region[bs + 1 : e], n_fields, repeats))
        cnt += 1
        p = e + 6
    return cnt, flat


def iter_fmp_value_regions(
    stream: IO[bytes], n_fields: int, repeats: str = "error"
) -> Iterator[tuple[int, list]]:
    """Batch-columnar scanner: yield ``(n_rows, flat_values)`` regions
    where ``flat_values`` is the row-major ``str | None`` cell list for
    ``n_rows`` complete rows.

    One ``findall`` per multi-MiB region replaces one per row — the COL
    regex only ever matches real COL units, so scanning straight across
    ``</ROW><ROW …>`` boundaries is safe. ANY structural deviation
    (repeating field, whitespace variant, stray markup) re-parses that
    region row-by-row with the strict per-row checks (which in turn
    raise :class:`FMPFastPathError` for the ET fallback to decide) —
    see :func:`_parse_region_text`.
    """
    sb = _ScanBuffer(stream, _REGION_CHUNK)
    try:
        sb.seek_resultset()
        while True:
            last = sb.buf.rfind("</ROW>")
            if last < sb.pos:
                if not sb.fill():
                    if "<ROW" in sb.buf[sb.pos :]:
                        raise FMPFastPathError("unterminated ROW at end of input")
                    return
                continue
            region = sb.buf[sb.pos : last + 6]
            sb.pos = last + 6
            yield _parse_region_text(region, n_fields, repeats)
    finally:
        sb.detach()


# ---------------------------------------------------------------------------
# Byte-range splits: parallel scan of ONE large export file
# ---------------------------------------------------------------------------
#
# XML in general is not byte-splittable, but the FMP grammar is: `<` is
# always escaped inside text (XML 1.0 §2.4 — raw `<` is a well-formedness
# error), so the byte pattern b"<ROW" can only occur at a real row start.
# That makes the Hadoop InputSplit protocol applicable: a split [start,
# end) owns every row whose `<ROW` byte offset lies in [start, end) — it
# scans forward from `start` to the first row start, and keeps reading
# PAST `end` until the first row start at or after `end` (which the next
# split will find the same way). Splits cut at ASCII tag boundaries, so
# each region decodes as UTF-8 independently of its neighbors.
#
# Exotic structure a machine-generated export never contains (comments /
# CDATA sections with "<ROW" or "</ROW>" inside) would make byte slicing
# ambiguous; the per-region validation catches every such case LOUDLY
# (FMPFastPathError via the ET-fragment fallback's parse error) — never
# a silent wrong answer — and `split="never"` restores the whole-file
# scanner with its full-document ET fallback.


def _parse_region_et(region: bytes, n_fields: int, repeats: str) -> tuple[int, list]:
    """Strict fallback for one split region: wrap the complete-row
    fragment in a synthetic RESULTSET root and ET-parse it (handles
    comments, CDATA, whitespace variants inside rows). A fragment the
    wrapper cannot make well-formed means byte slicing itself was
    ambiguous — raise with the split="never" escape hatch."""
    import io
    from xml.etree.ElementTree import ParseError

    stream = io.BytesIO(b"<RESULTSET>" + region + b"</RESULTSET>")
    try:
        rows = list(iter_fmp_rows_et(stream, n_fields, repeats=repeats))
    except ParseError as exc:
        raise FMPFastPathError(
            f"split region is not a well-formed row fragment ({exc}); this "
            "export needs the whole-file parser — read with split='never'"
        ) from exc
    return len(rows), [v for row in rows for v in row]


def _parse_region_bytes(region: bytes, n_fields: int, repeats: str) -> tuple[int, list]:
    try:
        return _parse_region_text(region.decode("utf-8"), n_fields, repeats)
    except (FMPFastPathError, UnicodeDecodeError):
        # non-UTF-8 bytes end up at the ET region parser, whose
        # ParseError → FMPFastPathError carries the split='never'
        # escape hatch (a fragment has no prolog for ET to honor)
        return _parse_region_et(region, n_fields, repeats)


def iter_fmp_split_regions(
    f: IO[bytes], start: int, end: int, n_fields: int, repeats: str = "error"
) -> Iterator[tuple[int, list]]:
    """Bounded byte-range scanner over one split of a plain ``.xml``
    export: yields ``(n_rows, flat_values)`` regions for exactly the
    rows whose ``<ROW`` start offset lies in ``[start, end)``.

    Constant memory: complete-row prefixes are emitted as they
    accumulate; the buffer holds at most one chunk plus one partial row.
    """
    f.seek(start)
    base = start  # absolute file offset of buf[0]
    buf = b""
    # Phase 1: find the first row starting at offset >= start. A `<ROW`
    # straddling `start` belongs to the previous split (its `<` is
    # before `start`) and is invisible to this scan by construction.
    while True:
        i = buf.find(b"<ROW")
        if i >= 0:
            break
        keep = min(len(buf), 3)  # a split `<ROW` tag can straddle chunks
        base += len(buf) - keep
        buf = buf[len(buf) - keep :]
        piece = f.read(_REGION_CHUNK)
        if not piece:
            return  # no row starts in [start, EOF)
        buf += piece
    if base + i >= end:
        return  # first row of this range belongs to the next split
    base += i
    buf = buf[i:]
    # Phase 2: emit regions of complete rows; stop at the first row
    # starting at offset >= end (scanning past `end` to finish the row
    # in flight — the next split skips it symmetrically).
    while True:
        if base + len(buf) > end:
            cut = buf.find(b"<ROW", max(0, end - base))
            if cut >= 0:
                region = buf[:cut]
                last = region.rfind(b"</ROW>")
                if last == -1:
                    # Every owned row was already emitted by a previous
                    # iteration (a chunk boundary fell between the last
                    # owned </ROW> and the next split's <ROW); a
                    # whitespace-only remainder is the normal end of
                    # this split, not a structural error.
                    if region.strip():
                        raise FMPFastPathError(
                            "split cut does not fall on a row boundary; "
                            "read with split='never'"
                        )
                    return
                if region[last + 6 :].strip():
                    raise FMPFastPathError(
                        "split cut does not fall on a row boundary; "
                        "read with split='never'"
                    )
                yield _parse_region_bytes(region[: last + 6], n_fields, repeats)
                return
        # Every complete row currently buffered started before `end`
        # (a later start would have matched the cut search above) —
        # safe to emit before reading more.
        last = buf.rfind(b"</ROW>")
        if last >= 0:
            yield _parse_region_bytes(buf[: last + 6], n_fields, repeats)
            base += last + 6
            buf = buf[last + 6 :]
        piece = f.read(_REGION_CHUNK)
        if not piece:
            if b"<ROW" in buf:
                raise FMPFastPathError("unterminated ROW at end of input")
            return  # trailer (</RESULTSET>…) only
        buf += piece


#: files below this size never auto-split (split overhead > parse cost)
_SPLIT_MIN_FILE = 8 << 20
#: auto split-size floors — measured, not guessed. Each Python
#: DataSource task pays a fixed worker-handshake + import cost
#: (~0.3 s here), so splits must be coarse enough to amortize it:
#: on a 57 MB / 12,500-row export, 4 splits (~16 MiB) scan ~2.3x
#: faster than whole-file, while 14 splits scan SLOWER. A single
#: file leaves every other core idle, so fine (16 MiB) splits pay
#: off; a multi-file input already parallelizes by file, so
#: intra-file splits only help once they are big enough (64 MiB)
#: that the fixed cost is noise (measured: 8 files × 4 fine splits
#: ran 2.3x SLOWER than 8 whole files). Ceiling: Hadoop-block
#: ballpark.
_SPLIT_AUTO_MIN_SINGLE = 16 << 20
_SPLIT_AUTO_MIN_MULTI = 64 << 20
_SPLIT_AUTO_MAX = 128 << 20
#: explicit split sizes are floored here (tests use tiny splits)
_SPLIT_EXPLICIT_MIN = 4096

#: .bz2 inputs below this COMPRESSED size never auto-spool: the
#: decompressed file would land under / near the _SPLIT_MIN_FILE
#: never-split floor anyway (bz2 on FMP XML measures 6-16x, so 1 MiB
#: compressed ≈ 6-16 MB plain), and the spool would buy no parallelism
_BZ2_SPOOL_MIN = 1 << 20


def parse_split_option(raw: object) -> int | None:
    """Normalize the user-facing ``split`` option — ``auto`` /
    ``never`` / a byte count — to the internal encoding: ``None`` =
    auto, ``0`` = never, ``>0`` = explicit target split size. The one
    place the option's spelling is interpreted; the reader and the CLI
    both go through it."""
    s = str(raw).strip().lower()
    if s in ("never", "false", "0"):
        return 0
    if s in ("auto", "true", ""):
        return None
    return int(s)


def would_spool(
    path: str, size: int | None, split_bytes: int | None, bz2_spool: bool = True
) -> bool:
    """THE spool-then-split decision, shared by the reader's planner
    (``FMPXMLReader._spoolable``) and the CLI's hash fast path
    (``cli._spooled_bz2_sha256``): spool a ``.bz2`` when spooling is
    enabled, splitting is on (``split_bytes`` ≠ 0), and either an
    explicit split size was given (an instruction to parallelize;
    tests use tiny ones) or the file clears the auto threshold.
    Keeping both callers on one helper is what guarantees the CLI
    never re-decompresses a file the reader won't spool (or vice
    versa) after a future tweak to this rule."""
    if not (bz2_spool and path.endswith(".bz2")):
        return False
    if split_bytes == 0 or size is None:
        return False
    if split_bytes is not None:  # explicit split size
        return True
    return size >= _BZ2_SPOOL_MIN


def _probe_literal_row(path: str, limit: int = 1 << 20) -> bool:
    """Driver-side split-safety probe: True iff the file's first
    ``limit`` bytes contain a literal ``b'<ROW'`` AND the XML
    declaration does not name a non-UTF-8 encoding. The byte-range
    scanner keys on that exact byte sequence and decodes regions as
    UTF-8, so an export without the literal (namespace prefixes,
    exotic layouts) or with a declared legacy encoding must NOT be
    split — only the whole-file partition carries the prolog the
    encoding-honoring ET fallback needs. The probe costs one bounded
    read per large file at planning time. A false negative (>1 MiB of
    pre-row header) only costs parallelism, never correctness."""
    try:
        with open(path, "rb") as fh:
            head = fh.read(limit)
    except OSError:
        return False
    m = _XML_DECL_ENC_RE_B.match(head.lstrip(b"\xef\xbb\xbf \t\r\n"))
    if m and m.group(1).strip().lower().decode("ascii", "replace") not in _UTF8_COMPAT_ENCODINGS:
        return False
    return b"<ROW" in head


def spool_bz2(path: str, spool_dir: str | None = None) -> str:
    """Driver-side decompress-once for a ``.bz2`` export: stream the
    file into a plain ``.xml`` spool (hashing as it goes) so the
    byte-range splitter can scan it on every core — bz2 is not
    seekable-splittable, so without the spool the reference's flagship
    input (``_cli.py:23-35``, a single large ``.bz2`` snapshot) parses
    on exactly one core.

    The spool is cached under a name keyed on the source's identity
    (abspath, size, mtime_ns): re-reading the same snapshot re-uses it,
    a regenerated snapshot re-spools. Completion is signalled by the
    atomic rename — a crashed spool leaves only a ``.tmp``. The
    streamed sha256 of the DECOMPRESSED bytes (the reference's content
    hash, ``_cli.py:146-150``) is written to a ``.sha256`` sidecar so a
    later hash pass needn't re-read the data.

    Cluster note: in local mode any temp dir works; on a multi-executor
    cluster ``spool_dir`` must be shared storage (the executors open
    the spool by path) — or pass ``bz2spool=never`` and accept the
    whole-file scan.
    """
    import bz2 as _bz2
    import hashlib
    import os
    import tempfile

    st = os.stat(path)
    key = hashlib.md5(
        f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()
    base = spool_dir or tempfile.gettempdir()
    spool = os.path.join(base, f"fmpspool_{key}.xml")
    if os.path.exists(spool):
        return spool
    os.makedirs(base, exist_ok=True)
    tmp = spool + f".tmp{os.getpid()}"
    digest = hashlib.sha256()
    with _bz2.open(path, "rb") as src, open(tmp, "wb") as dst:
        while True:
            chunk = src.read(8 << 20)
            if not chunk:
                break
            digest.update(chunk)
            dst.write(chunk)
    with open(tmp + ".sha256", "w") as f:
        f.write(digest.hexdigest() + "\n")
    os.replace(tmp + ".sha256", spool + ".sha256")
    os.replace(tmp, spool)
    return spool


class FMPXMLReader(DataSourceReader):
    """Input partitions: one per file, and — for large plain ``.xml``
    files — one per byte-range split WITHIN a file (see the InputSplit
    protocol above ``iter_fmp_split_regions``). ``.bz2`` files are not
    byte-addressable; large ones decompress once into a cached plain
    spool that splits like any plain file (``spool_bz2``), small ones
    (or ``bz2_spool=False``) stay whole-file.

    Rows leave Python as Arrow RecordBatches (4096 rows × all-string
    columns): one columnar transfer per batch instead of one pickled
    tuple per row — the difference between the DataSource adding ~2×
    overhead and adding ~none over the raw parse."""

    def __init__(
        self,
        paths: list[str],
        field_names: list[str],
        repeats,
        double_cols: tuple[int, ...] = (),
        array_double_cols: tuple[int, ...] = (),
        split_bytes: int | None = None,
        parallelism: int = 0,
        bz2_spool: bool = True,
        spool_dir: str | None = None,
    ):
        self._paths = paths
        self._field_names = field_names
        self._repeats = repeats
        # array mode arrives pre-resolved as the frozenset of
        # ArrayType column indices (repeat_spec_for_fields)
        self._array_cols = repeats if isinstance(repeats, frozenset) else frozenset()
        self._double_cols = frozenset(double_cols)
        self._array_double_cols = frozenset(array_double_cols)
        # None = auto (size/parallelism, clamped), 0 = never split,
        # >0 = explicit target split size in bytes
        self._split_bytes = split_bytes
        self._parallelism = max(parallelism, 2)
        self._bz2_spool = bz2_spool
        self._spool_dir = spool_dir

    def _split_ranges(
        self, path: str, size: int | None, total_size: int
    ) -> list[tuple[int, int | None]]:
        """Byte ranges for one file (``size`` = stat from partitions(),
        None if unstattable). ``(0, None)`` = whole-file scan (keeps
        the full-document ET fallback). Auto sizing targets
        ``total_input / parallelism`` clamped per the floors above —
        computed over ALL input files so a sharded directory of large
        exports does not over-split each shard."""
        if self._split_bytes == 0 or path.endswith(".bz2") or size is None:
            return [(0, None)]
        if self._split_bytes is None:
            if size < _SPLIT_MIN_FILE:
                return [(0, None)]
            floor = (
                _SPLIT_AUTO_MIN_SINGLE
                if len(self._paths) == 1
                else _SPLIT_AUTO_MIN_MULTI
            )
            target = min(
                max(-(-total_size // self._parallelism), floor),
                _SPLIT_AUTO_MAX,
            )
        else:
            target = max(self._split_bytes, _SPLIT_EXPLICIT_MIN)
        n = -(-size // target)
        if n <= 1:
            return [(0, None)]
        if not _probe_literal_row(path):
            # namespace-PREFIXED exports (<f:ROW>) contain no literal
            # b'<ROW' for the byte-range scanner to find — splitting
            # would return a silently EMPTY result. Fall back to the
            # whole-file partition, whose scanner raises loudly at
            # seek_resultset and re-parses with namespace-aware ET.
            return [(0, None)]
        bounds = [size * k // n for k in range(n + 1)]
        return [(bounds[k], bounds[k + 1]) for k in range(n)]

    def _spoolable(self, path: str, size: int | None) -> bool:
        """Spool-then-split a .bz2 when splitting is on and the input
        is big enough to benefit — the shared :func:`would_spool`
        rule, parameterized by this reader's options."""
        return would_spool(path, size, self._split_bytes, self._bz2_spool)

    def partitions(self) -> list[InputPartition]:
        import os

        def _size(p: str) -> int | None:
            try:
                return os.path.getsize(p)
            except OSError:
                return None

        # Resolve each input to its effective scan target first: a
        # large .bz2 decompresses once into a plain-xml spool
        # (driver-side, cached by source identity) so its byte ranges
        # can split like any plain file. Partitions carry the EFFECTIVE
        # path, not an index: the spool path must reach executors even
        # though self._paths still names the .bz2.
        effective: list[tuple[str, int | None]] = []
        for p in self._paths:
            size = _size(p)
            if self._spoolable(p, size):
                spool = spool_bz2(p, self._spool_dir)
                effective.append((spool, _size(spool)))
            else:
                effective.append((p, size))
        total = sum(s for _, s in effective if s)
        parts: list[InputPartition] = []
        for path, size in effective:
            for start, end in self._split_ranges(path, size, total):
                parts.append(InputPartition((path, start, end)))
        return parts

    def _emit_columnar(self, vals: list, k: int):
        """Arrow batch from the first k rows of the flat row-major cell
        list (consumed in place): ONE ``pa.array`` over the flat cells,
        then a C-level strided ``take`` per column — measured ~3.4x
        faster than per-column Python step-slices at 126 columns."""
        import numpy as np
        import pyarrow as pa

        n = len(self._field_names)
        take = vals[: k * n]
        del vals[: k * n]
        if self._array_cols:
            # array mode: the flat cell list mixes str and list[str]
            # cells, so the single-pa.array + strided-take trick cannot
            # apply; fall back to per-column Python step-slices (the
            # compatibility mode trades this measured ~3.4x Arrow-leg
            # factor for typed arrays).
            arrays = []
            for j in range(n):
                col = take[j::n]
                if j in self._array_double_cols:
                    # typed array mode: SQL-CAST null semantics per
                    # ELEMENT (unparseable → null element, list shape
                    # preserved)
                    arrays.append(
                        pa.array(
                            [
                                None
                                if cell is None
                                else [_to_double(x) for x in cell]
                                for cell in col
                            ],
                            type=pa.list_(pa.float64()),
                        )
                    )
                elif j in self._array_cols:
                    arrays.append(pa.array(col, type=pa.list_(pa.string())))
                elif j in self._double_cols:
                    arrays.append(
                        pa.array([_to_double(v) for v in col], type=pa.float64())
                    )
                else:
                    arrays.append(pa.array(col, type=pa.string()))
            return pa.RecordBatch.from_arrays(arrays, names=self._field_names)
        flat = pa.array(take, type=pa.string())
        arrays = []
        for j in range(n):
            col = flat.take(pa.array(np.arange(j, k * n, n, dtype=np.int64)))
            if j in self._double_cols:
                # typed mode: SQL-CAST semantics — unparseable → null
                arrays.append(
                    pa.array([_to_double(v) for v in col.to_pylist()], type=pa.float64())
                )
            else:
                arrays.append(col)
        return pa.RecordBatch.from_arrays(arrays, names=self._field_names)

    def read(self, partition: InputPartition):
        value = partition.value
        if isinstance(value, tuple):
            target, start, end = value
        else:  # plain file index (direct callers / older pickles)
            target, start, end = value, 0, None
        # partitions() emits effective paths (str); an int is a direct
        # caller indexing self._paths
        path = target if isinstance(target, str) else self._paths[target]
        if end is not None:
            yield from self._read_split(path, start, end)
            return
        yield from self._read_whole(path)

    def _read_split(self, path: str, start: int, end: int):
        """One byte-range split of a plain .xml file: bounded region
        scan → columnar Arrow batches. Structural surprises fall back
        per-region (ET over a synthetic root), never per-file — a
        corrupt region cannot silently shift its neighbors."""
        n_fields = len(self._field_names)
        with open(path, "rb") as f:
            vals: list = []
            rows = 0
            for n_rows, flat in iter_fmp_split_regions(
                f, start, end, n_fields, repeats=self._repeats
            ):
                vals.extend(flat)
                rows += n_rows
                while rows >= ARROW_BATCH_ROWS:
                    yield self._emit_columnar(vals, ARROW_BATCH_ROWS)
                    rows -= ARROW_BATCH_ROWS
            if rows:
                yield self._emit_columnar(vals, rows)

    def _read_whole(self, path: str):
        stream = open_xml_stream(path)
        n_fields = len(self._field_names)
        try:
            try:
                start_pos = stream.tell() if stream.seekable() else None
            except Exception:
                start_pos = None
            if start_pos is None:
                # Unreachable via open_xml_stream today (files and bz2 are
                # both seekable), but a future non-seekable source must not
                # silently drop to the row-wise ET path: spool to a temp
                # file (memory-backed up to 64 MiB) so the ET-rewind
                # fallback works and the columnar fast path stays in play.
                import shutil
                import tempfile

                spool = tempfile.SpooledTemporaryFile(max_size=64 << 20)
                shutil.copyfileobj(stream, spool)
                stream.close()
                spool.seek(0)
                stream = spool
                start_pos = 0
            vals: list = []
            rows = 0
            emitted = 0
            try:
                for n_rows, flat in iter_fmp_value_regions(
                    stream, n_fields, repeats=self._repeats
                ):
                    vals.extend(flat)
                    rows += n_rows
                    while rows >= ARROW_BATCH_ROWS:
                        yield self._emit_columnar(vals, ARROW_BATCH_ROWS)
                        rows -= ARROW_BATCH_ROWS
                        emitted += ARROW_BATCH_ROWS
                if rows:
                    yield self._emit_columnar(vals, rows)
            except (FMPFastPathError, UnicodeDecodeError):
                # structural surprise the region scanner couldn't localize:
                # rewind, strict ET parse, skip rows already emitted as
                # batches (un-emitted accumulated rows are re-parsed)
                stream.seek(start_pos)
                rows_iter = (
                    row
                    for i, row in enumerate(
                        iter_fmp_rows_et(stream, n_fields, repeats=self._repeats)
                    )
                    if i >= emitted
                )
                yield from self._read_rowwise(rows_iter)
        finally:
            stream.close()

    def _read_rowwise(self, rows: Iterator[tuple]):
        # flatten row tuples and delegate to the one column-typing
        # dispatch (_emit_columnar) — a second copy of the
        # array/double/string branch here silently diverged once
        buf: list = []
        n_rows = 0
        for row in rows:
            buf.extend(row)
            n_rows += 1
            if n_rows >= ARROW_BATCH_ROWS:
                yield self._emit_columnar(buf, n_rows)
                n_rows = 0
        if n_rows:
            yield self._emit_columnar(buf, n_rows)


def _to_double(v: str | None) -> float | None:
    """SQL-CAST-style string→double: plain decimal / scientific
    notation and the Inf/NaN special literals; unparseable → null.
    Python float() accepts PEP 515 underscore separators ('1_000')
    and non-ASCII numerals/whitespace (fullwidth '１２３',
    Arabic-Indic '١٢٣', NBSP padding) which Java's Double.parseDouble
    — Spark's CAST — rejects; both are gated out below so typed=true
    matches a CAST oracle. (The reverse residue is accepted as a
    documented simplification: Java-only forms a Spark CAST would
    take — trailing 'd'/'f', hex-float — come back null here; no FMP
    export emits them.)"""
    if v is None or "_" in v or not v.isascii():
        return None
    try:
        return float(v)
    except ValueError:
        return None


def resolve_source_paths(path: str, multi: bool = False) -> list[str]:
    """Input resolution:

    * glob pattern (``*``/``?``/``[``) → every matching file, sorted;
    * directory with ``multi`` → every ``*.xml`` / ``*.xml.bz2`` inside,
      sorted (a sharded export: one file per partition);
    * directory without ``multi`` → the latest ``*.bz2`` snapshot
      (reference convention, ``_cli.py:26-28``);
    * plain file → itself.
    """
    import glob as _glob
    import os

    # a literal file whose NAME contains glob metacharacters (e.g.
    # browser-dedup'd "export[1].xml") wins over glob interpretation
    if any(ch in path for ch in "*?[") and not os.path.isfile(path):
        matches = sorted(_glob.glob(path))
        if not matches:
            raise FileNotFoundError(f"no files match {path}")
        return matches
    if os.path.isdir(path) and multi:
        matches = sorted(
            p
            for p in _glob.glob(os.path.join(path, "*"))
            if p.endswith((".xml", ".xml.bz2"))
        )
        if not matches:
            raise FileNotFoundError(f"no *.xml / *.xml.bz2 files in {path}")
        return matches
    return [str(resolve_input_path(path))]


class FMPXMLSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming FMP ingest: watch a directory (or glob) and emit each
    newly-arrived export's rows exactly once — the reference's one-shot
    ``create_db`` load re-expressed as continuous Structured-Streaming
    ingest (new snapshot lands → its rows flow to the sink).

    Offsets are the sorted list of already-ingested file paths, so a
    restart from a checkpoint replays nothing and picks up only files
    that arrived while the query was down (``readBetweenOffsets``
    provides exact microbatch replay for failure recovery).

    Spark's *simple* stream-reader API feeds rows through the driver by
    design (prefetched per microbatch) — right for the
    snapshot-every-so-often cadence of FMP exports; a high-throughput
    backfill belongs on the batch reader's partitioned/split path.

    Boundedness: the offset carries the ingested-file list, TRIMMED to
    files still present (a name neither listed nor newly read drops
    out of the next offset), so checkpoint size is bounded by the
    CURRENT directory size, not by history. The operational rule that
    makes failure recovery sound: archive/delete a file only AFTER the
    batch that ingested it has committed — replay of an uncommitted
    batch (readBetweenOffsets) re-opens that batch's files by name. A
    deleted-then-recreated name counts as a new snapshot and is
    ingested again.

    Arrival contract: exports must be staged elsewhere and atomically
    renamed into the watch directory (the standard Spark file-source
    contract). As defense-in-depth, ``read`` stats each candidate
    before and after parsing and defers any file whose size changed
    mid-read — a non-atomic copy is retried on a later microbatch
    instead of being permanently marked seen on a truncated prefix.
    """

    def __init__(self, path: str, field_names: list[str], repeats: str):
        self._path = path
        self._field_names = field_names
        self._repeats = repeats

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _list(self) -> list[str]:
        """Current matching files — same resolution as the batch
        reader's multi-file listing, except an empty/missing directory
        means 'no files yet', not an error (the watcher may start
        before the first export lands)."""
        try:
            return resolve_source_paths(self._path, multi=True)
        except FileNotFoundError:
            return []

    def _rows(self, paths: list[str]) -> Iterator[tuple]:
        """Materialized per-microbatch rows. Spark's simple-reader
        wrapper caches and copy.copy()s the iterator for replay, which
        a generator cannot survive — and the simple API prefetches the
        whole microbatch driver-side by contract, so a list iterator
        costs nothing extra."""
        n_fields = len(self._field_names)
        out: list[tuple] = []
        for path in paths:
            stream = open_xml_stream(path)
            try:
                # skip each file's header; rows follow the shared schema
                out.extend(iter_fmp_rows(stream, n_fields, repeats=self._repeats))
            finally:
                stream.close()
        return iter(out)

    def read(self, start: dict):
        import os

        # Offset entries carry the file's IDENTITY — [path, size,
        # mtime_ns] — not just its name: a snapshot atomically renamed
        # OVER an existing name (a rolling 'latest.xml', the documented
        # atomic-rename arrival contract) changes identity but not
        # name, and a name-only offset would skip it forever — silent
        # data loss. Plain-string entries from pre-identity checkpoints
        # are honored as name-only (no mass re-ingest on upgrade).
        seen_entries = start.get("seen", [])
        legacy_names = {e for e in seen_entries if isinstance(e, str)}
        seen = {tuple(e) for e in seen_entries if not isinstance(e, str)}
        listed = self._list()

        # In-flight-copy guard: a file listed while still being written
        # (non-atomic arrival) must not be ingested-and-marked-seen on
        # its truncated prefix — rows appended after that read would be
        # silently lost forever. Stat before AND after parsing; a file
        # whose size or mtime changed mid-read (or vanished) is
        # excluded from both the batch and the offset, so the next
        # microbatch retries it once it is stable.
        def _stat(p: str) -> tuple[int, int] | None:
            try:
                st = os.stat(p)
                return (st.st_size, st.st_mtime_ns)
            except OSError:
                return None

        stats0 = {p: _stat(p) for p in listed}
        new = [
            p
            for p in listed
            if p not in legacy_names
            and stats0[p] is not None
            and (p, *stats0[p]) not in seen
        ]
        stable: list[tuple[str, int, int]] = []
        rows: list[tuple] = []
        for p in new:
            try:
                batch = list(self._rows([p]))
            except Exception:
                # mid-copy XML is typically truncated → parse error;
                # leave the file out of `seen` so it retries next batch
                if _stat(p) != stats0[p]:
                    continue
                raise
            if _stat(p) != stats0[p]:
                continue
            stable.append((p, *stats0[p]))
            rows.extend(batch)
        # trim to present ∪ newly-ingested: archived files age out of
        # the offset; an entry whose identity no longer matches the
        # file on disk is dropped, so the overwriting snapshot ingests
        # as new next microbatch; unstable files stay pending
        kept = {e for e in seen if stats0.get(e[0]) == e[1:]}
        end = {
            "seen": sorted(legacy_names & set(listed))
            + [list(e) for e in sorted(kept | set(stable))]
        }
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Deterministic replay of a committed batch. The offset range
        pins each file's IDENTITY — (path, size, mtime_ns) — not just
        its name, so the replay must verify the file on disk is STILL
        the committed snapshot: if ``latest.xml`` was atomically
        overwritten between the commit and a crash-recovery replay,
        re-reading the current bytes under the old offset would
        silently hand the recovered batch DIFFERENT rows than the ones
        originally committed. That is corruption, not staleness — fail
        loudly rather than guess. Legacy name-only entries (pre-
        identity checkpoints) carry nothing to verify and replay by
        name as before."""
        import os

        def _key(e):
            return e if isinstance(e, str) else tuple(e)

        seen = {_key(e) for e in start.get("seen", [])}
        paths: list[str] = []
        for e in end.get("seen", []):
            if _key(e) in seen:
                continue
            if isinstance(e, str):
                paths.append(e)
                continue
            path, size, mtime_ns = e
            try:
                st = os.stat(path)
                current: tuple[int, int] | None = (st.st_size, st.st_mtime_ns)
            except OSError:
                current = None
            if current != (size, mtime_ns):
                raise RuntimeError(
                    f"cannot replay committed batch: {path!r} is "
                    f"{'gone' if current is None else 'no longer the committed snapshot'}"
                    f" (committed identity (size={size}, mtime_ns={mtime_ns}),"
                    f" on disk {current}); the original bytes are "
                    "unrecoverable — restart the query from a fresh "
                    "checkpoint instead of silently reading different data"
                )
            paths.append(path)
        return self._rows(paths)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained; nothing external to ack


class FMPXMLDataSource(DataSource):
    """``spark.read.format("fmpxml").load(path)``.

    Options:

    * ``path`` — a file, a ``.bz2``, a glob (every match becomes one
      input partition — the multi-file parallel scan), or a directory
      (with ``multi=true``: every export inside in parallel; without:
      the latest ``*.bz2`` snapshot, the reference's convention);
    * ``repeats`` — ``error`` (default, reference-crash parity),
      ``join`` (repeats GS-joined into one string), or ``array``
      (header MAXREPEAT>1 fields become ``array<string>`` columns —
      ``<COL/>`` → null, ``<COL><DATA>a</DATA><DATA>b</DATA></COL>``
      → ``["a","b"]``, a single DATA → a one-element array);
    * ``typed`` — ``false`` (default, all-string parity with the
      reference sink, ``sql.py:35``) or ``true``: NUMBER-typed fields
      are declared DOUBLE and cast on read (SURVEY.md §1.3's declared
      engine feature — an explicit mode, never an implicit guess);
    * ``split`` — ``auto`` (default), ``never``, or a target split
      size in bytes. Large plain ``.xml`` files are scanned in
      parallel byte-range splits (the FMP grammar is byte-splittable
      on ``<ROW`` — see ``iter_fmp_split_regions``); auto sizing is
      ``total_input / local parallelism`` clamped to [16 MiB (single
      file) or 64 MiB (multi-file), 128 MiB], files under 8 MiB never
      auto-split. On a multi-executor cluster set ``split`` explicitly
      (e.g. ``134217728``): the planner sizes splits driver-side and
      cannot see executor counts from here.
    * ``bz2spool`` — ``auto`` (default) or ``never``. bz2 is not
      byte-addressable, so a large ``.bz2`` export (the reference's
      flagship input) decompresses ONCE driver-side into a cached
      plain-xml spool which then byte-range splits like any plain
      file (see ``spool_bz2``; a streamed sha256 sidecar comes free).
      ``never`` — or a sub-1 MiB compressed input under ``auto``
      (≈6-16 MB plain at FMP XML's bz2 ratios: under / near the 8 MiB
      never-split floor, so the spool would buy no parallelism) —
      keeps the whole-file single-partition scan.
    * ``spooldir`` — where spools land (default: the system temp dir).
      On a multi-executor cluster this MUST be shared storage, since
      executors open the spool by path.

    The schema comes from a driver-side header parse of the FIRST file
    (sharded exports share one header); rows stream on executors, one
    partition per file plus one per byte-range split of large files.
    """

    @classmethod
    def name(cls) -> str:
        return "fmpxml"

    def _paths(self) -> list[str]:
        path = self.options.get("path")
        if not path:
            raise ValueError("fmpxml source requires a path")
        multi = str(self.options.get("multi", "false")).lower() == "true"
        return resolve_source_paths(path, multi=multi)

    def _fmp_schema(self) -> FMPSchema:
        try:
            first = self._paths()[0]
        except FileNotFoundError as exc:
            raise FileNotFoundError(
                f"{exc}. Schema inference needs at least one export "
                "present; to START a stream on an empty watch directory, "
                "pass the schema explicitly "
                "(spark.readStream.schema(...).format('fmpxml')...)"
            ) from exc
        stream = open_xml_stream(first)
        try:
            return parse_fmp_header(stream)
        finally:
            stream.close()

    def _typed(self) -> bool:
        return str(self.options.get("typed", "false")).lower() == "true"

    def _repeats_opt(self) -> str:
        raw = str(self.options.get("repeats", "error")).lower()
        if raw not in ("error", "join", "array"):
            raise ValueError(f"repeats must be error|join|array, got {raw!r}")
        return raw

    @staticmethod
    def _repeat_spec(repeats: str, schema: SqlT.StructType):
        """Resolve ``"array"`` against the (possibly user-supplied)
        schema: any ArrayType column parses as a repeating field. The
        string modes pass through unchanged."""
        if repeats == "array":
            return frozenset(
                i
                for i, f in enumerate(schema.fields)
                if f.dataType.typeName() == "array"
            )
        return repeats

    def schema(self) -> SqlT.StructType:
        struct = self._fmp_schema().to_struct_type(repeats=self._repeats_opt())
        typed = self._typed()
        # The published schema is metadata-free: the streaming runner
        # asserts (arrow-round-tripped schema == source schema), and
        # Arrow drops StructField metadata, so keeping the FMP header
        # attributes here would fail every streaming read. The rich
        # struct (original_name/fmp_type/empty_ok/max_repeat metadata)
        # stays available via parse_fmp_header().to_struct_type().
        def published(f: SqlT.StructField) -> SqlT.DataType:
            # typed=true maps NUMBER fields to double with SQL-CAST
            # null semantics — scalar columns to double, and (with
            # repeats='array') repeating NUMBER columns to
            # array<double>, cast per element
            if typed and f.metadata.get("fmp_type") == "NUMBER":
                if f.dataType.typeName() == "string":
                    return SqlT.DoubleType()
                if f.dataType.typeName() == "array":
                    return SqlT.ArrayType(SqlT.DoubleType())
            return f.dataType

        return SqlT.StructType(
            [SqlT.StructField(f.name, published(f), f.nullable) for f in struct.fields]
        )

    def _split_bytes(self) -> int | None:
        return parse_split_option(self.options.get("split", "auto"))

    def simpleStreamReader(self, schema: SqlT.StructType) -> FMPXMLSimpleStreamReader:
        """``spark.readStream.format("fmpxml").option("multi", "true")
        .load(dir)`` — continuous ingest of a directory of exports.
        Streaming is all-string only (``typed`` needs the batch
        reader's columnar conversion)."""
        if self._typed():
            raise ValueError(
                "fmpxml streaming is all-string (reference-sink parity); "
                "typed=true is a batch-reader mode"
            )
        # unlike the batch reader, a user-supplied schema() bypasses
        # _paths(), so validate here: Path("") normalizes to '.' and a
        # missing path would silently watch the driver's cwd
        if not self.options.get("path"):
            raise ValueError("fmpxml source requires a path")
        return FMPXMLSimpleStreamReader(
            path=self.options.get("path", ""),
            field_names=[f.name for f in schema.fields],
            repeats=self._repeat_spec(self._repeats_opt(), schema),
        )

    def reader(self, schema: SqlT.StructType) -> FMPXMLReader:
        import os

        return FMPXMLReader(
            paths=self._paths(),
            field_names=[f.name for f in schema.fields],
            repeats=self._repeat_spec(self._repeats_opt(), schema),
            double_cols=tuple(
                i
                for i, f in enumerate(schema.fields)
                if f.dataType.typeName() == "double"
            ),
            array_double_cols=tuple(
                i
                for i, f in enumerate(schema.fields)
                if f.dataType.typeName() == "array"
                and f.dataType.elementType.typeName() == "double"
            ),
            split_bytes=self._split_bytes(),
            parallelism=os.cpu_count() or 2,
            bz2_spool=str(self.options.get("bz2spool", "auto")).lower()
            not in ("never", "false", "0"),
            spool_dir=self.options.get("spooldir") or None,
        )


def register_fmp_source(spark: SparkSession) -> None:
    """Idempotently register the fmpxml format on this session.

    Spark 4 re-registration replaces silently (one WARN), so no
    exception needs swallowing here — a raise is a REAL failure
    (e.g. pre-4.0 PySpark without the Python DataSource API) and must
    propagate instead of resurfacing later as an unrelated
    'data source not found'."""
    if not hasattr(spark, "dataSource"):
        raise RuntimeError(
            "this SparkSession has no Python DataSource registry "
            "(spark.dataSource) — the fmpxml source needs PySpark >= 4.0"
        )
    spark.dataSource.register(FMPXMLDataSource)


def read_fmp_xml_df(
    spark: SparkSession,
    path: str,
    repeats: str = "error",
    multi: bool = False,
    typed: bool = False,
    split: str | int = "auto",
    bz2spool: str = "auto",
    spooldir: str | None = None,
) -> DataFrame:
    """Convenience: register + read FMP export(s) as a DataFrame."""
    register_fmp_source(spark)
    reader = (
        spark.read.format("fmpxml")
        .option("repeats", repeats)
        .option("multi", str(multi).lower())
        .option("typed", str(typed).lower())
        .option("split", str(split))
        .option("bz2spool", bz2spool)
    )
    if spooldir:
        reader = reader.option("spooldir", spooldir)
    return reader.load(path)
