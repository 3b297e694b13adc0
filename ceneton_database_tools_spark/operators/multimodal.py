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
  the parquet files themselves (path, length, sha256 of content).
  DuckDB v1.0.0 cannot hash raw blobs (md5/sha256 are VARCHAR-only),
  so the gate is rows-only; the pytest suite verifies the sha256
  values against hashlib ground truth.
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
    # PERMANENTLY no_oracle: this container's DuckDB (v1.0.0) types both
    # md5() and sha256() as VARCHAR-only — raw blobs from read_blob()
    # cannot be hashed at all (verified: `sha256(content)` and
    # `md5(content)` both raise Binder Error), and parquet bytes are not
    # valid UTF-8 so no VARCHAR detour exists. The pytest suite instead
    # checks every sha256 value against hashlib ground truth
    # (tests/test_multimodal.py).
    oracle=None,
    tags=("multimodal", "binary", "source", "llm-pipeline"),
)
def multimodal_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed binary-file scan: Spark's ``binaryFile`` source over
    the parquet files themselves → (file name, byte length, sha256).

    This is the reference's whole-file sha256 (``_cli.py:146-150``)
    re-expressed as a distributed scan: each file hashes where it is
    read, nothing funnels through the driver."""
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
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
    one Arrow transfer per batch (never per row)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)
