"""JSONL sink with reference field-order parity.

The reference's ``to_json`` emits one ``json.dumps(record._asdict())``
per row (``/root/reference/src/ceneton_database_utils/_cli.py:71-83``):
fields appear in schema order, nulls are explicit ``null``, non-ASCII
is escaped (json.dumps default ``ensure_ascii=True``).

Spark's JSON writer is JSON Lines natively and preserves struct field
order, but by default it (a) drops null fields and (b) writes raw
UTF-8. ``write_jsonl`` pins both to reference behavior
(``ignoreNullFields=false``; Spark always emits unescaped UTF-8, which
is byte-different from the reference but JSON-equal — documented).

``iter_jsonl`` is the stdout variant: exact ``json.dumps`` bytes,
streamed through ``toLocalIterator`` (one partition in driver memory
at a time, never a full collect).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame


def write_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    """Distributed JSONL write (the 100 TB path): one part file per
    partition, nulls explicit, schema field order."""
    df.write.mode(mode).option("ignoreNullFields", "false").json(path)


def iter_jsonl(df: DataFrame) -> Iterator[str]:
    """Driver-streamed JSONL lines, byte-exact with the reference's
    ``json.dumps(record._asdict())`` (key order = schema order,
    ``ensure_ascii`` escaping). For stdout/pipe parity — use
    ``write_jsonl`` for datasets that should not pass through the
    driver."""
    cols = df.columns
    for row in df.toLocalIterator():
        yield json.dumps(dict(zip(cols, row)))
