from __future__ import annotations

import hashlib

import pytest

from data_pipeline_who_gho_spark.operators.multimodal import (
    attach_binary,
    decode_media,
    extract_media_meta,
    sniff_media_type,
)


def test_binary_roundtrip_and_meta(spark, tmp_path):
    df = spark.createDataFrame([(1, "hello world"), (2, "spark")], "doc_id LONG, text STRING")
    bin_df = attach_binary(df)
    # parquet round-trip of the binary column (the at-rest contract)
    path = str(tmp_path / "media")
    bin_df.write.parquet(path)
    back = spark.read.parquet(path)

    meta = {r["doc_id"]: r for r in extract_media_meta(back).collect()}
    assert meta[1]["n_bytes"] == len(b"hello world")
    assert meta[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert meta[2]["media_type"] == "application/octet-stream"


def test_magic_sniffing():
    assert sniff_media_type(b"\x89PNG\r\n\x1a\n...") == "image/png"
    assert sniff_media_type(b"\xff\xd8\xff\xe0rest") == "image/jpeg"
    assert sniff_media_type(b"RIFF....WAVE") == "audio/wav"
    assert sniff_media_type(b"") == "empty"
    assert sniff_media_type(None) == "empty"


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")
