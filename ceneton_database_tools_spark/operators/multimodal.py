"""Multimodal column plumbing: opaque binary payloads + typed metadata.

At 100 TB a multimodal corpus is parquet with ``binary`` payload
columns (image/audio/video bytes) plus typed metadata structs; the
pipeline pattern is: scan → cheap metadata extraction JVM-side →
expensive decode/feature-extract in Arrow-batched Python
(``mapInPandas``) only on the surviving rows. This module implements
that plumbing end-to-end:

* ``multimodal_binary_metadata`` — binary column built from utf-8 text
  bytes + metadata struct (byte length, md5, mime). Oracle-checked:
  md5 over utf-8 bytes is identical in both engines.
* ``multimodal_binaryfile_scan`` — the real ``binaryFile`` source over
  the parquet files themselves (path, length, content digest).
  Oracle-gated via sha256-over-hex (DuckDB v1.0.0 cannot hash raw
  blobs, but hex(blob) is a byte-faithful VARCHAR both engines hash
  identically); the raw-bytes sha256 variant is hashlib-verified in
  pytest.
* ``multimodal_feature_extract`` — Arrow-batched ``mapInPandas``
  "decoder". The image/audio libraries are not in this container, so
  the decode is a deterministic fake (header-byte arithmetic); the
  Spark-side contract — schema, batch iteration, partitioning — is
  real and tested, and the byte arithmetic is oracle-checked via
  DuckDB ``hex(encode(text))``. ``decode_image_real`` marks where a
  real decoder plugs in.

The reference (kws/ceneton-database-tools) has no binary handling; its
closest analogue is the file-level sha256 in ``_cli.py:146-150``,
which ``multimodal_binaryfile_scan`` generalizes to a distributed scan.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as SqlT

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.operators.registry import register

if TYPE_CHECKING:
    import pandas as pd


@register(
    "multimodal_binary_metadata",
    oracle="""
    SELECT
      doc_id,
      CAST(strlen(text) AS BIGINT) AS n_bytes,
      md5(text)                    AS content_md5,
      'text/plain'                 AS mime
    FROM documents
    """,
    tags=("multimodal", "binary", "llm-pipeline"),
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata struct.

    The payload is the utf-8 encoding of ``documents.text`` (the only
    byte stream both engines can hash identically); metadata is a
    struct ``(n_bytes, content_md5, mime)`` flattened for the gate.
    At scale this projection is pure map-side JVM work."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    meta = F.struct(
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.lit("text/plain").alias("mime"),
    )
    return docs.withColumn("meta", meta).select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
        F.col("meta.mime").alias("mime"),
    )


@register(
    "multimodal_binaryfile_scan",
    # This container's DuckDB (v1.0.0) types md5()/sha256() as
    # VARCHAR-only, so raw blobs from read_blob() cannot be hashed
    # directly — but hex(blob) IS a VARCHAR with identical bytes in
    # both engines (uppercase hex), so sha256-over-hex gives a real
    # content-integrity hash the oracle can compute (any byte flip
    # changes the hex, hence the digest). The raw-bytes sha256 variant
    # (binaryfile_scan_raw, = reference _cli.py:146-150 semantics) is
    # pytest-verified against hashlib. read_blob takes a filesystem
    # glob, not a registered view, so the oracle uses the {SF_DIR}
    # token: oracle_sql() renders it to the driver gate's sf0.01 and
    # the local harness renders it to whatever scale it is testing.
    oracle="""
    SELECT
      string_split(filename, '/')[-1]     AS file_name,
      CAST(size AS BIGINT)                AS n_bytes,
      sha256(hex(content))                AS sha256_hex
    FROM read_blob('{SF_DIR}/*.parquet')
    """,
    tags=("multimodal", "binary", "source", "llm-pipeline"),
)
def multimodal_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed binary-file scan: Spark's ``binaryFile`` source over
    the parquet files themselves → (file name, byte length, content
    digest).

    This is the reference's whole-file sha256 (``_cli.py:146-150``)
    re-expressed as a distributed scan: each file hashes where it is
    read, nothing funnels through the driver. The gated digest is
    sha256 over the hex encoding (the only byte-faithful VARCHAR both
    engines can hash — see the oracle note); ``binaryfile_scan_raw``
    below hashes the raw bytes for exact reference parity."""
    files = spark.read.format("binaryFile").load(_parquet_paths(sf_dir))
    return files.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.hex("content"), 256)).alias("sha256_hex"),
    )


def _parquet_paths(sf_dir: str) -> list[str]:
    """Resolve the glob driver-side: passing a literal '*.parquet'
    string into load() makes Spark's FileStreamSink metadata probe
    stat the glob literal and log a FileNotFoundException traceback
    (harmless but alarming in driver logs); an explicit file list
    skips the probe."""
    import glob

    paths = sorted(glob.glob(f"{sf_dir}/*.parquet"))
    if not paths:
        raise FileNotFoundError(f"no parquet files under {sf_dir}")
    return paths


def binaryfile_scan_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-bytes sha256 over the same distributed binary scan — the
    exact reference semantics (``_cli.py:146-150``); DuckDB cannot
    hash blobs, so this variant is hashlib-verified in pytest instead
    of oracle-gated."""
    files = spark.read.format("binaryFile").load(_parquet_paths(sf_dir))
    return files.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("n_bytes"),
        F.lower(F.sha2("content", 256)).alias("sha256"),
    )


# ---------------------------------------------------------------------------
# Arrow-batched decode / feature extraction
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = SqlT.StructType(
    [
        SqlT.StructField("doc_id", SqlT.LongType()),
        SqlT.StructField("n_bytes", SqlT.LongType()),
        SqlT.StructField("fake_width", SqlT.LongType()),
        SqlT.StructField("fake_height", SqlT.LongType()),
        SqlT.StructField("n_frames", SqlT.LongType()),
    ]
)


def decode_image_real(payload: bytes) -> dict:
    """Plug-in point for a real decoder (PIL / torchvision / ffmpeg).

    Those libraries are not available in this container, so the real
    path is an explicit stub; ``_decode_fake`` below provides the
    deterministic stand-in the pipeline runs with."""
    raise NotImplementedError(
        "real image/audio decode requires PIL/ffmpeg, not present in this environment; "
        "the pipeline uses the deterministic fake decoder instead"
    )


def _decode_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake 'decode': header-byte arithmetic standing in
    for (width, height, frame count). Same bytes → same features."""
    if not payload:
        return (0, 0, 0)
    w = payload[0] * 256 + (payload[1] if len(payload) > 1 else 0)
    h = (payload[2] if len(payload) > 2 else 0) * 256 + (payload[3] if len(payload) > 3 else 0)
    return (w, h, len(payload) % 16 + 1)


def _extract_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """mapInPandas worker: one Arrow batch in, one feature frame out.
    Vectorized per-batch (Python runs once per ~10k-row batch, not per
    row); this is the multimodal hot-path shape at 100 TB."""
    import pandas as pd

    for batch in batches:
        feats = [_decode_fake(p) for p in batch["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_bytes": [len(p) for p in batch["payload"]],
                "fake_width": [f[0] for f in feats],
                "fake_height": [f[1] for f in feats],
                "n_frames": [f[2] for f in feats],
            }
        )


@register(
    "multimodal_feature_extract",
    # The fake decode is header-byte arithmetic over the utf-8 payload,
    # which IS SQL-expressible: hex(encode(text)) exposes the bytes and
    # '0x..'::INT parses each pair, replicating _decode_fake exactly.
    oracle="""
    WITH t AS (
      SELECT doc_id,
             hex(encode(text))          AS h,
             octet_length(encode(text)) AS nb
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT
      doc_id,
      CAST(nb AS BIGINT) AS n_bytes,
      CAST(CASE WHEN nb = 0 THEN 0 ELSE
        ('0x' || substr(h, 1, 2))::INT * 256 +
        CASE WHEN nb > 1 THEN ('0x' || substr(h, 3, 2))::INT ELSE 0 END
      END AS BIGINT) AS fake_width,
      CAST(CASE WHEN nb = 0 THEN 0 ELSE
        CASE WHEN nb > 2 THEN ('0x' || substr(h, 5, 2))::INT ELSE 0 END * 256 +
        CASE WHEN nb > 3 THEN ('0x' || substr(h, 7, 2))::INT ELSE 0 END
      END AS BIGINT) AS fake_height,
      CAST(CASE WHEN nb = 0 THEN 0 ELSE nb % 16 + 1 END AS BIGINT) AS n_frames
    FROM t
    """,
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over a binary column via Arrow-batched
    ``mapInPandas`` — the canonical multimodal UDF shape: JVM scan and
    filter first, Python only sees the binary payloads it must decode,
    one Arrow transfer per batch (never per row). A NULL payload (the
    missing/corrupt-blob shape) is dropped by a JVM prefilter — the
    decoder never sees undecodable rows."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
        .where(F.col("payload").isNotNull())
    )
    return docs.mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame sampling + resize (fan-out / reduce shapes of the decode pipeline)
# ---------------------------------------------------------------------------

FRAME_OFFSETS = (0, 100, 200, 300)  # 0-based character offsets
FRAME_WIDTH = 64

FRAME_SCHEMA = SqlT.StructType(
    [
        SqlT.StructField("doc_id", SqlT.LongType()),
        SqlT.StructField("frame_idx", SqlT.LongType()),
        SqlT.StructField("frame_md5", SqlT.StringType()),
        SqlT.StructField("frame_chars", SqlT.LongType()),
    ]
)


def _frame_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """mapInPandas worker: each document fans out to ≤4 sampled frames —
    the one-row-in / k-rows-out shape of video frame extraction. A real
    decoder would emit JPEG bytes per frame; the deterministic stand-in
    emits fixed character windows (md5 of a text window is computable on
    both engines, unlike raw binary)."""
    import hashlib

    import pandas as pd

    for batch in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_md5": [], "frame_chars": []}
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            for idx, off in enumerate(FRAME_OFFSETS):
                if off >= len(text):
                    break
                frame = text[off : off + FRAME_WIDTH]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_md5"].append(hashlib.md5(frame.encode("utf-8")).hexdigest())
                out["frame_chars"].append(len(frame))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int64"),
                "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
                "frame_chars": pd.Series(out["frame_chars"], dtype="int64"),
            }
        )


def _frame_oracle() -> str:
    rows = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {i} AS frame_idx, "
        f"substr(text, {off + 1}, {FRAME_WIDTH}) AS frame FROM documents "
        f"WHERE length(text) > {off}"
        for i, off in enumerate(FRAME_OFFSETS)
    )
    return f"""
    WITH frames AS (
{rows}
    )
    SELECT doc_id, frame_idx, md5(frame) AS frame_md5,
           CAST(length(frame) AS BIGINT) AS frame_chars
    FROM frames
    """


@register(
    "multimodal_frame_sample",
    oracle=_frame_oracle(),
    tags=("multimodal", "pandas-udf", "fanout", "llm-pipeline"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: each payload fans out to ≤4 fixed-offset frames
    through Arrow-batched ``mapInPandas`` (1 row in → k rows out — the
    video-decode shape; a UDTF is the row-at-a-time alternative, this is
    the batched one). Frames are fixed character windows so the md5 per
    frame is oracle-checkable; a real ffmpeg frame grab plugs into the
    same worker with only the window slicing swapped out. Fan-out is
    bounded (≤4 frames/doc), so downstream partition sizes stay
    predictable at 100 TB."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # JVM prefilter: a NULL payload has no frames to sample — drop
        # it in the scan so the Python worker never sees it (the
        # oracle's length(text) > off excludes NULL the same way)
        .where(F.col("text").isNotNull())
    )
    return docs.mapInPandas(_frame_batches, schema=FRAME_SCHEMA)


@register(
    "multimodal_resize_stub",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)  AS orig_chars,
           CAST(length(substr(text, 1, 128)) AS BIGINT) AS resized_chars,
           md5(substr(text, 1, 128))     AS resized_md5
    FROM documents
    """,
    tags=("multimodal", "llm-pipeline"),
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize: payload reduced to a bounded-size derivative (here a
    128-char prefix standing in for a thumbnail) plus new metadata —
    the reduce counterpart to frame sampling's fan-out. The transform
    is JVM-side column work because the FAKE resize is; a real
    image resize is exactly ``multimodal_feature_extract``'s
    ``mapInPandas`` worker with PIL's ``thumbnail()`` at the
    ``decode_image_real`` plug-in point."""
    docs = load_table(spark, sf_dir, "documents")
    resized = F.substring("text", 1, 128)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("orig_chars"),
        F.length(resized).cast("long").alias("resized_chars"),
        F.md5(F.encode(resized, "utf-8")).alias("resized_md5"),
    )
