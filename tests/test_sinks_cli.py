"""Sink + CLI parity tests: JSONL field order/null handling, sqlite
DDL + metadata KV + exists-guard + batching, mapping-file semantics,
and the four ct-db commands end-to-end."""

from __future__ import annotations

import datetime
import json
import sqlite3
import glob
import hashlib
import os
import subprocess
import sys
from pathlib import Path

import pytest

from ceneton_database_tools_spark.cli import _read_mapping, main
from ceneton_database_tools_spark.sinks.jsonl import iter_jsonl, write_jsonl
from ceneton_database_tools_spark.sinks.sqldb import (
    build_metadata_rows,
    create_db_from_df,
    generate_ddl,
)
from ceneton_database_tools_spark.sources.fmp_xml import read_fmp_xml_df

DATA = os.path.join(os.path.dirname(__file__), "data")
BASIC = os.path.join(DATA, "fmp_basic.xml")
BASIC_CLEAN = ["nummer", "auteur", "titel", "jaar", "genre", "aantal_bedr_", "enschedé", "ubl"]


# -- JSONL -------------------------------------------------------------------


def test_iter_jsonl_reference_parity(spark):
    """Byte parity with the reference loop: json.dumps of an ordered
    dict — schema field order, explicit nulls, ensure_ascii escapes."""
    df = read_fmp_xml_df(spark, BASIC)
    lines = sorted(iter_jsonl(df))
    assert len(lines) == 4
    first = json.loads(lines[0])
    assert list(first) == BASIC_CLEAN  # field order = schema order
    assert first["enschedé"] is None  # null explicit
    assert '"ensched\\u00e9"' in lines[0]  # ensure_ascii like json.dumps
    multiline = json.loads(lines[1])
    assert multiline["titel"] == "De Spaanschen Brabander Jerolimo.\nTreur-spel."


def test_write_jsonl_distributed(spark, tmp_path):
    df = read_fmp_xml_df(spark, BASIC)
    out = str(tmp_path / "out.jsonl")
    write_jsonl(df, out)
    rows = []
    for part in glob.glob(f"{out}/part-*"):
        rows += [json.loads(line) for line in open(part)]
    assert len(rows) == 4
    assert all(list(r) == BASIC_CLEAN for r in rows)  # order + nulls kept
    assert any(r["ubl"] is None for r in rows)


# -- sqlite sink --------------------------------------------------------------


def test_generate_ddl_all_text_with_comments():
    ddl = generate_ddl("plays", ["nummer", "auteur"], {"nummer": "Nummer", "auteur": "Auteur"})
    assert '"nummer" TEXT,  -- Nummer' in ddl
    assert '"auteur" TEXT  -- Auteur' in ddl
    sqlite3.connect(":memory:").execute(ddl)  # valid DDL


def test_metadata_rows_reference_set():
    ts = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    rows = build_metadata_rows("Ceneton.fmp12", 4, {"source_url": "/x", "k": "v"}, ts)
    assert [r[0] for r in rows] == [
        "created_at",
        "source_schema_name",
        "record_count",
        "source_url",
        "k",
    ]
    assert rows[0][1] == ts.isoformat()
    assert rows[2][1] == "4"


def test_create_db_sqlite_end_to_end(spark, tmp_path):
    df = read_fmp_xml_df(spark, BASIC)
    db = tmp_path / "ceneton.db"
    create_db_from_df(
        df,
        db_url=f"sqlite:///{db}",
        table_name="ceneton_fmp12",
        schema_name="Ceneton.fmp12",
        record_count=4,
        db_metadata={"source_sha256": "abc"},
        batch_size=2,  # force multiple batches
    )
    conn = sqlite3.connect(db)
    cols = [r[1] for r in conn.execute("PRAGMA table_info(ceneton_fmp12)")]
    assert cols == BASIC_CLEAN
    types = {r[2] for r in conn.execute("PRAGMA table_info(ceneton_fmp12)")}
    assert types == {"TEXT"}  # all-string parity (sql.py:35)
    rows = list(conn.execute('SELECT nummer, enschedé FROM ceneton_fmp12 ORDER BY nummer'))
    assert len(rows) == 4
    assert rows[0] == ("000001", None)
    meta = dict(
        (k, v) for k, v, _ in conn.execute("SELECT * FROM ceneton_fmp12_metadata")
    )
    assert meta["source_schema_name"] == "Ceneton.fmp12"
    assert meta["record_count"] == "4"
    assert meta["source_sha256"] == "abc"
    # exists-guard: second run must refuse (sql.py:66-75)
    with pytest.raises(ValueError, match="already exists"):
        create_db_from_df(
            df,
            db_url=f"sqlite:///{db}",
            table_name="ceneton_fmp12",
            schema_name="Ceneton.fmp12",
            record_count=4,
        )
    conn.close()


def test_create_db_rename_mode(spark, tmp_path):
    df = read_fmp_xml_df(spark, BASIC)
    db = tmp_path / "renamed.db"
    create_db_from_df(
        df,
        db_url=f"sqlite:///{db}",
        table_name="plays",
        schema_name="Ceneton.fmp12",
        record_count=4,
        mapping={"nummer": "ceneton_id", "titel": "title"},
        apply_as="rename",
    )
    cols = [r[1] for r in sqlite3.connect(db).execute("PRAGMA table_info(plays)")]
    assert cols[0] == "ceneton_id" and cols[2] == "title"


# -- mapping file (A8) --------------------------------------------------------


def test_read_mapping_named_and_default(tmp_path):
    csv_path = tmp_path / "map.csv"
    csv_path.write_text(
        "original_name,clean_name,english_name\n"
        "Nummer,nummer,ceneton_id\n"
        "Aantal bedr.,aantal_bedr_,act_count\n"
    )
    named = _read_mapping(f"{csv_path}:english_name")
    assert named == {"nummer": "ceneton_id", "aantal_bedr_": "act_count"}
    default = _read_mapping(str(csv_path))
    assert default == {"nummer": "nummer", "aantal_bedr_": "aantal_bedr_"}  # identity
    assert _read_mapping(None) is None


def test_read_mapping_colon_path_without_selector(tmp_path):
    """A colon INSIDE the path with no column selector: the tail is a
    selector only when the head is an existing file, otherwise the
    whole string is the path."""
    d = tmp_path / "dir:with:colon"
    d.mkdir()
    csv_path = d / "map.csv"
    csv_path.write_text("original_name,clean_name,english_name\nNummer,nummer,ceneton_id\n")
    assert _read_mapping(str(csv_path)) == {"nummer": "nummer"}
    # ... and a selector on the same colon-containing path still works
    assert _read_mapping(f"{csv_path}:english_name") == {"nummer": "ceneton_id"}


def test_read_mapping_missing_file_names_both_interpretations(tmp_path):
    """A typo'd 'missing.csv:2' must fail with an error naming BOTH the
    selector reading and the literal-path reading — not open() the
    whole string (wrong path in the error, and a later-created file
    literally named 'missing.csv:2' would be read whole)."""
    bogus = str(tmp_path / "missing.csv") + ":english_name"
    with pytest.raises(FileNotFoundError) as exc:
        _read_mapping(bogus)
    msg = str(exc.value)
    assert "missing.csv'" in msg and "english_name" in msg and bogus in msg


# -- CLI ----------------------------------------------------------------------


def test_cli_dump_headers(capsys):
    assert main(["dump_headers", BASIC]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "original_name,clean_name"
    assert "Aantal bedr.,aantal_bedr_" in out
    assert "Enschedé,enschedé" in out
    assert len(out) == 9


def test_cli_packaging_entry_point():
    """pyproject declares ct-db → cli:main (reference pyproject.toml:21-22),
    and `python -m ceneton_database_tools_spark` dispatches to the same main."""
    import tomllib

    root = Path(__file__).resolve().parent.parent
    with open(root / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["scripts"]["ct-db"] == "ceneton_database_tools_spark.cli:main"
    out = subprocess.run(
        [sys.executable, "-m", "ceneton_database_tools_spark", "dump_headers", BASIC],
        capture_output=True,
        text=True,
        check=True,
    )
    assert out.stdout.startswith("original_name,clean_name")


def test_cli_to_json_stdout(spark, capsys):
    assert main(["to_json", BASIC]) == 0
    captured = capsys.readouterr()
    lines = [json.loads(l) for l in captured.out.strip().splitlines()]
    assert len(lines) == 4
    assert all(list(r) == BASIC_CLEAN for r in lines)
    # tqdm-parity progress on stderr (reference _cli.py:77-83), with the
    # header count as the bar total; JSONL on stdout stays clean.
    assert "records: 4/4 100%" in captured.err


def test_cli_print(spark, capsys):
    assert main(["print", BASIC]) == 0
    captured = capsys.readouterr()
    assert "Parsing 4 records from Ceneton.fmp12" in captured.out
    assert "Done" in captured.out
    assert "records: 4/4 100%" in captured.err


def test_cli_create_db(spark, tmp_path):
    db = tmp_path / "cli.db"
    assert main(["create_db", BASIC, f"sqlite:///{db}", "--db-metadata", "origin=test"]) == 0
    conn = sqlite3.connect(db)
    # default table name = sanitize_name("Ceneton.fmp12")
    assert conn.execute("SELECT count(*) FROM ceneton_fmp12").fetchone()[0] == 4
    meta = dict((k, v) for k, v, _ in conn.execute("SELECT * FROM ceneton_fmp12_metadata"))
    assert meta["origin"] == "test"
    assert meta["source_url"].endswith("fmp_basic.xml")
    expected_sha = hashlib.sha256(open(BASIC, "rb").read()).hexdigest()
    assert meta["source_sha256"] == expected_sha
    conn.close()


def test_cli_click_exact_usage_surface(capsys):
    """Reference-exact CLI UX (the reference is a click group,
    _cli.py:18-20): usage-error texts, exit codes, and the --help
    Commands block are observable surface for scripts that parse them."""
    import pytest as _pytest

    click = _pytest.importorskip("click")  # noqa: F841 - parity needs real click
    from ceneton_database_tools_spark.cli import main

    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "Usage: ct-db [OPTIONS] COMMAND [ARGS]..." in out
    for cmd in ("create_db", "dump_headers", "print", "to_json"):
        assert f"\n  {cmd}" in out  # underscore names, not click-8 dashes

    assert main(["nosuch"]) == 2
    err = capsys.readouterr().err
    assert "Error: No such command 'nosuch'." in err
    assert "Try 'ct-db --help' for help." in err

    assert main(["dump_headers"]) == 2
    err = capsys.readouterr().err
    assert "Error: Missing argument 'FILE_PATH'." in err

    assert main(["dump_headers", "/no/such/file.xml"]) == 2
    err = capsys.readouterr().err
    assert "Error: Invalid value for 'FILE_PATH'" in err and "does not exist" in err


# -- round-5 review regressions ---------------------------------------------


def test_sqlite_rollback_leaves_no_empty_tables(spark, tmp_path):
    """DDL must join the load transaction: a mid-load failure used to
    leave empty tables behind (autocommitted CREATEs survived the
    rollback) and every rerun then died on the exists-guard."""
    import sqlite3

    from ceneton_database_tools_spark.sinks.sqldb import create_db_from_df

    from pyspark.sql import functions as F

    # rows fail during evaluation (raise_error) — the load dies AFTER
    # the DDL has executed, exercising the rollback path
    df = spark.range(10).select(
        F.when(F.col("id") < 5, F.col("id").cast("string"))
        .otherwise(F.expr("raise_error('boom')"))
        .alias("c1")
    )
    path = str(tmp_path / "fail.db")
    with pytest.raises(Exception):
        create_db_from_df(df, f"sqlite:///{path}", "t", "S", record_count=10)
    conn = sqlite3.connect(path)
    tables = {r[0] for r in conn.execute("SELECT name FROM sqlite_master WHERE type='table'")}
    conn.close()
    assert "t" not in tables and "t_metadata" not in tables, tables


def test_ddl_comment_newline_injection():
    """Mapping values are arbitrary user data — a newline must not
    escape the `--` comment and inject live SQL."""
    import sqlite3

    from ceneton_database_tools_spark.sinks.sqldb import generate_ddl

    ddl = generate_ddl("t", ["col1"], {"col1": "orig name\nDROP TABLE x; --"})
    assert "DROP TABLE" not in ddl.split("--", 1)[0]
    conn = sqlite3.connect(":memory:")
    conn.execute(ddl)  # must be valid SQL
    conn.close()


def test_write_partitioned_overwrite_keeps_untouched_partitions(spark, tmp_path):
    """mode='overwrite' must replace only the partitions present in the
    incoming df (dynamic overwrite), never truncate the base path."""
    from ceneton_database_tools_spark.sinks import read_partitioned, write_partitioned

    out = str(tmp_path / "part_table")
    full = spark.createDataFrame([("a", 1), ("b", 2)], schema="k string, v int")
    write_partitioned(full, out, ["k"])
    patch = spark.createDataFrame([("b", 99)], schema="k string, v int")
    write_partitioned(patch, out, ["k"], mode="overwrite")
    rows = {(r.k, r.v) for r in read_partitioned(spark, out).collect()}
    assert rows == {("a", 1), ("b", 99)}, rows


def test_create_db_rejects_unknown_apply_as(spark, tmp_path):
    """Round-7 review: a typo'd apply_as ('Rename') used to silently
    fall through to comment mode — unrenamed columns, no error."""
    df = read_fmp_xml_df(spark, BASIC)
    with pytest.raises(ValueError, match="apply_as must be"):
        create_db_from_df(
            df,
            db_url=f"sqlite:///{tmp_path}/x.db",
            table_name="t",
            schema_name="s",
            record_count=4,
            mapping={"Nummer": "nr"},
            apply_as="Rename",
        )


def test_cli_bz2_hash_reuses_spool_sidecar(spark, tmp_path, monkeypatch):
    """Round-7 review: create_db on a spool-worthy .bz2 used to
    decompress twice (stream-hash, then spool). The hash now comes
    from the spool's streamed .sha256 sidecar — one decompression —
    and matches the direct stream hash exactly."""
    import bz2

    from ceneton_database_tools_spark.cli import _spooled_bz2_sha256

    raw = open(BASIC, "rb").read()
    src = tmp_path / "export.xml.bz2"
    src.write_bytes(bz2.compress(raw))
    (tmp_path / "spools").mkdir()  # gettempdir ignores missing candidates
    monkeypatch.setenv("TMPDIR", str(tmp_path / "spools"))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    try:
        # explicit split size => spool regardless of size
        got = _spooled_bz2_sha256(str(src), "4096")
        assert got == hashlib.sha256(raw).hexdigest()
        spools = glob.glob(str(tmp_path / "spools" / "fmpspool_*.xml"))
        assert len(spools) == 1  # cached for the reader's own call
        # split=never → no spool, stream-hash path
        assert _spooled_bz2_sha256(str(src), "never") is None
        # tiny file on auto → no spool
        assert _spooled_bz2_sha256(str(src), "auto") is None
    finally:
        tempfile.tempdir = None
