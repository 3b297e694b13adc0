"""Multimodal plumbing tests: the two queries the DuckDB gate can only
rows-check get exact value verification here (sha256 vs hashlib; fake
decode vs a Python reimplementation)."""

from __future__ import annotations

import glob
import hashlib
import os

from ceneton_database_tools_spark.operators.multimodal import (
    _decode_fake,
    multimodal_binaryfile_scan,
    multimodal_feature_extract,
)


def test_binaryfile_scan_sha256_matches_hashlib(spark, sf_smoke):
    import binascii

    from ceneton_database_tools_spark.operators.multimodal import binaryfile_scan_raw

    raw = {r.file_name: r for r in binaryfile_scan_raw(spark, sf_smoke).collect()}
    hexed = {r.file_name: r for r in multimodal_binaryfile_scan(spark, sf_smoke).collect()}
    paths = glob.glob(f"{sf_smoke}/*.parquet")
    assert len(raw) == len(hexed) == len(paths) > 0
    for path in paths:
        blob = open(path, "rb").read()
        name = os.path.basename(path)
        assert raw[name].n_bytes == hexed[name].n_bytes == len(blob)
        assert raw[name].sha256 == hashlib.sha256(blob).hexdigest()
        assert hexed[name].sha256_hex == hashlib.sha256(
            binascii.hexlify(blob).upper()
        ).hexdigest()


def test_feature_extract_matches_local_decode(spark, sf_smoke):
    from ceneton_database_tools_spark.catalog import load_table

    feats = {r.doc_id: r for r in multimodal_feature_extract(spark, sf_smoke).collect()}
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    assert len(feats) == len(docs) > 0
    for d in docs:
        payload = d.text.encode("utf-8")
        w, h, nf = _decode_fake(payload)
        row = feats[d.doc_id]
        assert (row.n_bytes, row.fake_width, row.fake_height, row.n_frames) == (
            len(payload),
            w,
            h,
            nf,
        )


def test_real_decoder_is_explicit_stub():
    import pytest

    from ceneton_database_tools_spark.operators.multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
