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


def test_codec_formats_still_stubbed_and_bad_magic_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"ID3\x04rest of an mp3", "audio/mp3")
    # PNG/JPEG now decode for real — bare magics are TRUNCATED payloads
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG", "image/png")
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff...", "image/jpeg")


def test_resize_plumbing_with_fake_decoder(spark):
    import numpy as np
    from data_pipeline_who_gho_spark.operators.multimodal import resize_images
    from data_pipeline_who_gho_spark.sources.testing import fake_image_decoder

    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id LONG, text STRING")
    out = resize_images(attach_binary(df), 4, 6, decoder=fake_image_decoder).collect()
    assert len(out) == 2
    for r in out:
        assert (r.out_h, r.out_w) == (4, 6)
        assert len(r.pixels) == 4 * 6  # uint8 plane re-serialized
    # deterministic: same input -> same pixels
    again = resize_images(attach_binary(df), 4, 6, decoder=fake_image_decoder).collect()
    assert {r.doc_id: bytes(r.pixels) for r in out} == {
        r.doc_id: bytes(r.pixels) for r in again
    }
    # resize math is real: matches a local nearest-neighbor reference
    img = fake_image_decoder(b"alpha", "application/octet-stream")
    h, w = img.shape
    yi = (np.arange(4) * h // 4).clip(0, h - 1)
    xi = (np.arange(6) * w // 6).clip(0, w - 1)
    expected = img[yi][:, xi].tobytes()
    assert bytes(next(r.pixels for r in out if r.doc_id == 1)) == expected


def test_frame_sampling_fans_out(spark):
    from data_pipeline_who_gho_spark.operators.multimodal import sample_frames
    from data_pipeline_who_gho_spark.sources.testing import fake_video_decoder

    df = spark.createDataFrame([(1, "clip-a"), (2, "clip-b")], "doc_id LONG, text STRING")
    rows = sample_frames(attach_binary(df), every_n=2, decoder=fake_video_decoder).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        assert idxs == sorted(idxs)
        assert all(i % 2 == 0 for i in idxs)  # every 2nd frame
        assert len(idxs) >= 2  # fake videos have >= 4 frames


def test_default_decoder_rejects_unknown_payloads(spark):
    """The default decoder is REAL for the supported formats, but an
    unsniffable payload (here: plain utf-8 text) must still fail loudly
    inside the Arrow task rather than produce garbage pixels."""
    from data_pipeline_who_gho_spark.operators.multimodal import resize_images

    df = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    with pytest.raises(Exception) as exc_info:
        resize_images(attach_binary(df), 2, 2).collect()
    assert "NotImplementedError" in str(exc_info.value) or "media decoding" in str(
        exc_info.value
    )


def test_byte_features_real_and_normalized(spark):
    from data_pipeline_who_gho_spark.operators.multimodal import extract_byte_features

    df = spark.createDataFrame([(1, "aab"), (2, "")], "doc_id LONG, text STRING")
    feats = {r.doc_id: r.features for r in extract_byte_features(attach_binary(df)).collect()}
    assert len(feats[1]) == 256
    assert abs(sum(feats[1]) - 1.0) < 1e-6  # normalized histogram
    assert feats[1][ord("a")] == pytest.approx(2 / 3)
    assert feats[1][ord("b")] == pytest.approx(1 / 3)
    assert sum(feats[2]) == 0.0  # empty payload -> zero vector


def test_byte_features_arrow_matches_pandas(spark):
    """mapInArrow and mapInPandas forms produce identical histograms."""
    from data_pipeline_who_gho_spark.operators.multimodal import (
        attach_binary,
        extract_byte_features,
        extract_byte_features_arrow,
    )

    df = attach_binary(
        spark.createDataFrame(
            [(1, "hello world"), (2, ""), (3, "aaa")], "doc_id long, text string"
        )
    )
    a = {r.doc_id: r.features for r in extract_byte_features(df).collect()}
    b = {r.doc_id: r.features for r in extract_byte_features_arrow(df).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]
