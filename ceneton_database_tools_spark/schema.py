"""FMP schema model: field descriptors, name sanitization, StructType mapping.

Re-expresses the reference's schema layer (FMPField/FMPSchema/
``sanitize_name``/``default_header_strategy``,
``/root/reference/src/ceneton_database_utils/fmp_reader.py:37-72``) on
Spark's type system:

* ``FMPField`` → ``StructField(clean_name, StringType(), nullable)``
  with the original name / FMP type / EMPTYOK / MAXREPEAT preserved in
  the StructField metadata (Spark's analogue of the reference's
  ``name_mapping`` dict, ``fmp_reader.py:171``).
* every column is a string for sink parity — the reference's SQL sink
  declares all columns ``String`` regardless of the declared FMP type
  (``sql.py:35``); a typed mode is a later cast, never implicit.
* ``sanitize_name`` must be unicode-exact: Python's ``\\W`` is
  unicode-aware, so ``"Enschedé" → "enschedé"`` (é survives) while
  ``"Aantal bedr." → "aantal_bedr_"`` and a leading digit gains a
  ``_`` prefix (``fmp_reader.py:56-61``; verified against
  ``field_mappings.csv:2,18,35``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as SqlT

FMP_NS = "http://www.filemaker.com/fmp/1/result"


@dataclass
class FMPField:
    """One FMP export field (header ``<FIELD>`` element attributes)."""

    name: str
    empty_ok: bool = False
    max_repeat: int = 1
    fmp_type: str = "TEXT"  # TEXT | NUMBER — parsed, kept as metadata


@dataclass
class FMPSchema:
    """Parsed FMP export header: table name, ordered fields, row count."""

    name: str
    fields: list[FMPField]
    clean_names: list[str]
    record_count: int
    database_record_count: int | None = None
    header_attrs: dict = field(default_factory=dict)

    @property
    def name_mapping(self) -> dict[str, FMPField]:
        return dict(zip(self.clean_names, self.fields))

    def to_struct_type(self, repeats: str = "error") -> SqlT.StructType:
        """All-string StructType (parity with the reference sink,
        ``sql.py:35``); provenance kept in per-field metadata.

        ``repeats="array"`` is the typed compatibility mode the
        reference parses but never uses (``fmp_reader.py:135`` reads
        MAXREPEAT, then crashes on any multi-DATA column): fields the
        header declares ``MAXREPEAT > 1`` become
        ``ArrayType(StringType())`` — a queryable array instead of the
        ``join`` mode's separator-flattened string."""
        return SqlT.StructType(
            [
                SqlT.StructField(
                    clean,
                    SqlT.ArrayType(SqlT.StringType())
                    if repeats == "array" and f.max_repeat > 1
                    else SqlT.StringType(),
                    nullable=True,  # reference never enforces EMPTYOK
                    metadata={
                        "original_name": f.name,
                        "fmp_type": f.fmp_type,
                        "empty_ok": f.empty_ok,
                        "max_repeat": f.max_repeat,
                    },
                )
                for clean, f in zip(self.clean_names, self.fields)
            ]
        )


def sanitize_name(name: str) -> str:
    """strip → lower → collapse non-word runs to ``_`` → prefix ``_``
    if the result starts with a digit. Unicode-aware ``\\W`` (same
    semantics as the reference, ``fmp_reader.py:56-61``)."""
    name = re.sub(r"\W+", "_", name.strip().lower())
    if re.match(r"^\d", name):
        name = "_" + name
    return name


def default_header_strategy(fields: list[FMPField]) -> list[str]:
    """Sanitize every field name; duplicates after cleaning are an
    error (the reference raises the same way, ``fmp_reader.py:68-69``)."""
    cleaned: list[str] = []
    for f in fields:
        name = sanitize_name(f.name)
        if name in cleaned:
            raise ValueError(f"Duplicate field name: {name}")
        cleaned.append(name)
    return cleaned
