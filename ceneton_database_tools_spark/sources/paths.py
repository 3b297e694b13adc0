"""Input path resolution: directory-latest convention + transparent bz2.

Parity with the reference's ``_open_xml_stream``
(``/root/reference/src/ceneton_database_utils/_cli.py:23-35``):

* a directory argument resolves to the lexicographically LAST
  ``*.bz2`` inside it (the latest-snapshot convention);
* a ``.bz2`` suffix opens through the bz2 codec, anything else raw.

Resolution is driver-side (cheap metadata work); the resolved path
feeds ``spark.read`` — at scale the same convention applies per
partition directory.
"""

from __future__ import annotations

import bz2
import io
from pathlib import Path


def resolve_input_path(file_path: str | Path) -> Path:
    """Directory → lexicographically last *.bz2 inside it; file → itself."""
    path = Path(file_path)
    if path.is_dir():
        candidates = sorted(path.glob("*.bz2"))
        if not candidates:
            raise FileNotFoundError(f"no *.bz2 snapshots in directory {path}")
        return candidates[-1]
    return path


def open_xml_stream(file_path: str | Path) -> io.BufferedIOBase:
    """Open the resolved input for binary reading, decompressing
    ``.bz2`` transparently. Caller owns closing."""
    path = resolve_input_path(file_path)
    if path.suffix == ".bz2":
        return bz2.open(path, "rb")
    return open(path, "rb")
