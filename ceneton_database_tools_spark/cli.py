"""``ct-db``-compatible CLI over the Spark engine.

Four subcommands with the reference's exact surface
(``/root/reference/src/ceneton_database_utils/_cli.py``):

* ``dump_headers FILE`` — CSV ``(original_name, clean_name)`` on
  stdout. Schema-only: the header parse never touches a row
  (``_cli.py:38-53``), so no Spark session is started at all.
* ``print FILE`` — announce the export, count records, print Done
  (``_cli.py:56-68``); the count runs distributed through the
  DataSource.
* ``to_json FILE [--output DIR]`` — JSONL; stdout is byte-parity with
  the reference's ``json.dumps`` loop (``_cli.py:71-83``), ``--output``
  is the distributed writer.
* ``create_db FILE DB_URL [--mapping-column] [--table-name]
  [--db-metadata k=v ...]`` — all-string table + ``_metadata`` KV twin,
  sha256 of the decompressed bytes, batched load (``_cli.py:108-180``).

Run as ``python -m ceneton_database_tools_spark.cli <cmd> ...``
(alias it to ``ct-db`` for drop-in parity).

The front-end is a click group like the reference's (click ships in
this environment as a transitive dependency), so usage-error text,
exit codes, and ``--help`` formatting are click-exact; an equivalent
argparse parser remains as the import-gated fallback.
"""

from __future__ import annotations

import argparse
import csv
import hashlib
import os
import sys
from pathlib import Path

from ceneton_database_tools_spark.schema import sanitize_name
from ceneton_database_tools_spark.sources.paths import open_xml_stream, resolve_input_path


def _parse_header(file_path: str):
    from ceneton_database_tools_spark.sources.fmp_xml import parse_fmp_header

    with open_xml_stream(file_path) as stream:
        return parse_fmp_header(stream)


def cmd_dump_headers(args: argparse.Namespace) -> int:
    """CSV (original_name, clean_name) from the header only."""
    schema = _parse_header(args.file_path)
    writer = csv.writer(sys.stdout)
    writer.writerow(["original_name", "clean_name"])
    for clean, fmp_field in schema.name_mapping.items():
        writer.writerow([fmp_field.name, clean])
    return 0


def cmd_print(args: argparse.Namespace) -> int:
    """Parse the whole export and report the record count."""
    from ceneton_database_tools_spark.session import get_spark
    from ceneton_database_tools_spark.sources.fmp_xml import read_fmp_xml_df

    from ceneton_database_tools_spark.progress import stage_progress

    schema = _parse_header(args.file_path)
    print(f"Parsing {schema.record_count} records from {schema.name}")
    spark = get_spark(app_name="ct-db-print")
    # tqdm-parity progress (reference _cli.py:77-80): the count runs
    # distributed, so the bar tracks task completion via the status
    # tracker, scaled to the header's declared record count.
    with stage_progress(spark, schema.record_count):
        n = read_fmp_xml_df(spark, args.file_path, split=args.split).count()
    if n != schema.record_count:
        # stderr: the reference's stdout contract is exactly two lines
        # ("Parsing ..." / "Done"); its subset warning goes to the log
        print(
            f"warning: parsed {n} records, header declared {schema.record_count}",
            file=sys.stderr,
        )
    print("Done")
    return 0


def cmd_to_json(args: argparse.Namespace) -> int:
    """JSONL to stdout (reference byte parity) or --output dir (distributed)."""
    from ceneton_database_tools_spark.progress import progress, stage_progress
    from ceneton_database_tools_spark.session import get_spark
    from ceneton_database_tools_spark.sinks.jsonl import iter_jsonl, write_jsonl
    from ceneton_database_tools_spark.sources.fmp_xml import read_fmp_xml_df

    schema = _parse_header(args.file_path)
    spark = get_spark(app_name="ct-db-to-json")
    df = read_fmp_xml_df(spark, args.file_path, split=args.split)
    if args.output:
        with stage_progress(spark, schema.record_count):
            write_jsonl(df, args.output)
    else:
        # Exact reference shape (_cli.py:77-83): the driver-streamed
        # record iterator wrapped in a record-count-total progress bar
        # (stderr), JSONL on stdout.
        for line in progress(iter_jsonl(df), total=schema.record_count):
            print(line)
    return 0


def _read_mapping(mapping_column: str | None) -> dict[str, str] | None:
    """``file.csv[:column]`` → {clean_name: mapped value}. The key is
    always CSV column 1 (the clean name); the value column is named or
    defaults to column 1 itself (identity) — reference semantics
    (``_cli.py:86-105``)."""
    if mapping_column is None:
        return None
    mapping_file, column = mapping_column, 1
    if ":" in mapping_column:
        head, tail = mapping_column.rsplit(":", 1)
        # The tail is a column selector only when the head is an actual
        # file: a colon-containing path with NO selector (e.g.
        # 'dir:with:colon/map.csv') must be used whole — mirrors the
        # isfile disambiguation in resolve_source_paths. (The
        # reference's bare split crashes on such paths.)
        if os.path.isfile(head):
            mapping_file, column = head, tail
        elif not os.path.isfile(mapping_column):
            # Neither reading fits an existing file: a typo'd
            # 'missing.csv:2' must fail naming BOTH interpretations, not
            # fall through to open('missing.csv:2') (whose error names
            # the wrong path — or worse, reads a literally-colon-named
            # file whole, silently dropping the selector).
            raise FileNotFoundError(
                f"mapping file not found: neither {head!r} (with column "
                f"selector {tail!r}) nor the literal path "
                f"{mapping_column!r} exists"
            )
    mapping: dict[str, str] = {}
    with open(mapping_file, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        idx = header.index(column) if isinstance(column, str) else column
        for row in reader:
            mapping[row[1]] = row[idx]
    return mapping


def _spooled_bz2_sha256(path: str, split: str) -> str | None:
    """If the batch reader's planner would spool-then-split this .bz2,
    spool it here and return the sidecar's streamed sha256; else None
    (stream-hash). The decision is the reader's own ``would_spool`` —
    one rule, two callers — so the CLI can never re-decompress a file
    the reader won't spool (or miss one it will) as the rule evolves."""
    import os

    from ceneton_database_tools_spark.sources.fmp_xml import (
        parse_split_option,
        spool_bz2,
        would_spool,
    )

    try:
        size: int | None = os.path.getsize(path)
    except OSError:
        size = None
    if not would_spool(path, size, parse_split_option(split)):
        return None
    spool = spool_bz2(path)
    try:
        with open(spool + ".sha256") as f:
            return f.read().strip() or None
    except OSError:  # pre-sidecar spool cache entry
        return None


def cmd_create_db(args: argparse.Namespace) -> int:
    """FMP export → SQL database (+ metadata KV table)."""
    from ceneton_database_tools_spark.session import get_spark
    from ceneton_database_tools_spark.sinks.sqldb import create_db_from_df
    from ceneton_database_tools_spark.sources.fmp_xml import read_fmp_xml_df

    mapping = _read_mapping(args.mapping_column)

    metadata: dict[str, str] = {}
    for item in args.db_metadata or []:
        if "=" not in item:
            raise SystemExit(f"Metadata must be in key=value format, got: {item}")
        key, value = item.split("=", 1)
        metadata[key.strip()] = value.strip()

    # sha256 over the DECOMPRESSED bytes + absolute source path
    # (reference: _cli.py:146-150) — streamed, never fully buffered.
    # A .bz2 the reader is about to spool-then-split would otherwise
    # be decompressed TWICE (once here for the hash, once in
    # spool_bz2): spool it NOW and take the hash from the streamed
    # .sha256 sidecar; the reader's own spool_bz2 call then hits the
    # cache, so the flagship large-.bz2 input decompresses exactly once.
    resolved = resolve_input_path(args.file_path)
    digest_hex = _spooled_bz2_sha256(str(resolved), args.split)
    if digest_hex is None:
        digest = hashlib.sha256()
        with open_xml_stream(resolved) as stream:
            for chunk in iter(lambda: stream.read(1 << 20), b""):
                digest.update(chunk)
        digest_hex = digest.hexdigest()
    metadata["source_url"] = Path(resolved).absolute().resolve().as_posix()
    metadata["source_sha256"] = digest_hex

    schema = _parse_header(args.file_path)
    table_name = args.table_name or sanitize_name(schema.name)

    spark = get_spark(app_name="ct-db-create-db")
    df = read_fmp_xml_df(spark, args.file_path, split=args.split)
    create_db_from_df(
        df,
        db_url=args.db_url,
        table_name=table_name,
        schema_name=schema.name,
        record_count=schema.record_count,
        mapping=mapping,
        db_metadata=metadata,
    )
    return 0


def _add_split(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--split",
        default="auto",
        help="byte-range splits for large plain .xml files: auto "
        "(default), never, or a target split size in bytes",
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ct-db", description="FMP XML export tools (PySpark engine)"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("dump_headers", help="Dump the headers of the FMP XML file.")
    p.add_argument("file_path")
    p.set_defaults(fn=cmd_dump_headers)

    p = sub.add_parser("print", help="Print the stream of records from the FMP XML file.")
    p.add_argument("file_path")
    _add_split(p)
    p.set_defaults(fn=cmd_print)

    p = sub.add_parser("to_json", help="Convert the FMP XML file to JSONL format.")
    p.add_argument("file_path")
    p.add_argument("--output", help="write a JSONL directory instead of stdout")
    _add_split(p)
    p.set_defaults(fn=cmd_to_json)

    p = sub.add_parser("create_db", help="Create a database from FMP XML file.")
    p.add_argument("file_path")
    p.add_argument("db_url", help="sqlite:///file.db (parity) or jdbc:... (distributed)")
    p.add_argument("--mapping-column", help="mapping CSV as file[:column]")
    p.add_argument("--table-name", help="target table name")
    p.add_argument(
        "--db-metadata",
        action="append",
        help="key=value metadata rows (repeatable)",
    )
    _add_split(p)
    p.set_defaults(fn=cmd_create_db)
    return parser


# ---------------------------------------------------------------------------
# click front-end (reference-exact UX)
#
# The reference is a click group (_cli.py:18-20), and click's usage
# errors, exit codes, and --help formatting are observable surface for
# scripts that parse them ("Error: No such command '...'.",
# "Error: Missing argument 'FILE_PATH'.", exit 2, the Commands block).
# click ships in this environment as a transitive dependency, so the
# CLI uses it when importable — exact parity by construction — and
# degrades to the equivalent argparse parser above when it is absent
# (same commands, same semantics, argparse-formatted messages).
# ---------------------------------------------------------------------------

try:
    import click as _click
except ImportError:  # pragma: no cover - click present in this container
    _click = None


def _ns(**kw) -> argparse.Namespace:
    return argparse.Namespace(**kw)


if _click is not None:

    _split_option = _click.option(
        "--split",
        default="auto",
        help="Byte-range splits for large plain .xml files: auto, never, or bytes.",
    )

    @_click.group()
    def cli():
        pass

    @cli.command(name="dump_headers")
    @_click.argument("file_path", type=_click.Path(exists=True))
    def dump_headers(file_path: str):
        """Dump the headers of the FMP XML file."""
        return cmd_dump_headers(_ns(file_path=file_path))

    @cli.command(name="print")
    @_click.argument("file_path", type=_click.Path(exists=True))
    @_split_option
    def print_stream(file_path: str, split: str):
        """Print the stream of records from the FMP XML file."""
        return cmd_print(_ns(file_path=file_path, split=split))

    @cli.command(name="to_json")
    @_click.argument("file_path", type=_click.Path(exists=True))
    @_click.option("--output", help="Write a JSONL directory instead of stdout.")
    @_split_option
    def to_json(file_path: str, output: str | None, split: str):
        """Convert the FMP XML file to JSONL (JSON Lines) format."""
        return cmd_to_json(_ns(file_path=file_path, output=output, split=split))

    @cli.command(name="create_db")
    @_click.argument("file_path", type=_click.Path(exists=True))
    @_click.argument("db_url", type=str)
    @_click.option("--mapping-column", type=str, help="Column name to use for mapping")
    @_click.option("--table-name", type=str, help="Name of the table to create")
    @_click.option(
        "--db-metadata",
        multiple=True,
        help="Metadata to store as key=value pairs (can be repeated)",
    )
    @_split_option
    def create_db(
        file_path: str,
        db_url: str,
        mapping_column: str | None,
        table_name: str | None,
        db_metadata: tuple[str, ...],
        split: str,
    ):
        """Create a database from FMP XML file."""
        for item in db_metadata:
            if "=" not in item:
                # reference raises click.BadParameter here (_cli.py:139)
                raise _click.BadParameter(
                    f"Metadata must be in key=value format, got: {item}"
                )
        return cmd_create_db(
            _ns(
                file_path=file_path,
                db_url=db_url,
                mapping_column=mapping_column,
                table_name=table_name,
                db_metadata=list(db_metadata),
                split=split,
            )
        )


def main(argv: list[str] | None = None) -> int:
    if _click is not None:
        # standalone_mode=False so main() returns an exit CODE (tests
        # and the console script both want one); click's own rendering
        # of usage errors / --help / aborts is reproduced here exactly
        # as BaseCommand.main does in standalone mode.
        try:
            rc = cli.main(args=argv, prog_name="ct-db", standalone_mode=False)
            return int(rc) if isinstance(rc, int) else 0
        except _click.ClickException as e:
            e.show()
            return e.exit_code
        except _click.exceptions.Exit as e:  # --help / ctx.exit()
            return e.exit_code
        except _click.exceptions.Abort:
            sys.stderr.write("Aborted!\n")
            return 1
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
