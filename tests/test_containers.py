"""MP4 (ISO BMFF) and MP3 container-probe tests — the metadata layer
is real (box walk / frame-header arithmetic); sample decode stays an
explicit stub, and these tests pin the boundary exactly."""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.operators.containers import (
    _MP3_BITRATE,
    build_mp3,
    build_mp4,
    probe_mp4,
    scan_mp3_frames,
)


def _two_tracks():
    return [
        {"track_id": 1, "handler": "vide", "duration": 5000,
         "timescale": 600, "language": "und", "width": 640, "height": 480},
        {"track_id": 2, "handler": "soun", "duration": 44100,
         "timescale": 44100, "language": "eng", "width": 0, "height": 0},
    ]


def test_mp4_probe_roundtrip():
    p = build_mp4(1000, 12345, _two_tracks(), mdat_bytes=777)
    info = probe_mp4(p)
    assert info["major_brand"] == "isom"
    assert info["timescale"] == 1000 and info["duration"] == 12345
    assert info["mdat_bytes"] == 777
    t0, t1 = info["tracks"]
    assert t0 == {"track_id": 1, "handler": "vide", "duration": 5000,
                  "timescale": 600, "language": "und",
                  "width": 640, "height": 480}
    assert (t1["handler"], t1["language"], t1["timescale"]) == (
        "soun", "eng", 44100)


def test_mp4_sniffer_recognizes_built_containers():
    from data_pipeline_who_gho_spark.operators.multimodal import (
        sniff_media_type,
    )

    p = build_mp4(1000, 1, _two_tracks()[:1])
    assert sniff_media_type(p) == "video/mp4"


def test_mp4_largesize_and_to_end_boxes():
    p = build_mp4(1000, 42, _two_tracks())
    large = (1).to_bytes(4, "big") + b"free" + (24).to_bytes(8, "big") + bytes(8)
    tail = (0).to_bytes(4, "big") + b"skip" + bytes(5)  # size 0: to EOF
    info = probe_mp4(p + large + tail)
    assert info["duration"] == 42 and len(info["tracks"]) == 2


def test_mp4_rejects_malformed():
    p = build_mp4(1000, 42, _two_tracks())
    with pytest.raises(ValueError):
        probe_mp4(p[:-3])  # truncated mdat
    with pytest.raises(ValueError):
        probe_mp4(b"\x00\x00\x00\x08free")  # no ftyp/moov
    bad = bytearray(p)
    bad[0:4] = (4).to_bytes(4, "big")  # box size < header
    with pytest.raises(ValueError):
        probe_mp4(bytes(bad))


def test_mp3_vbr_scan_with_tags():
    frames = [(i % 14 + 1, i % 2) for i in range(20)]
    s = scan_mp3_frames(build_mp3(frames, sr_idx=1, id3v2_payload=99,
                                  id3v1=True))
    assert (s["version"], s["layer"], s["samplerate"]) == ("1", 3, 48000)
    assert s["n_frames"] == 20 and s["samples"] == 20 * 1152
    assert s["id3v2_bytes"] == 109 and s["id3v1"]
    tbl = _MP3_BITRATE[(1, 3)]
    assert s["sum_kbps"] == sum(tbl[i % 14 + 1] for i in range(20))
    assert s["frame_bytes"] == sum(
        144 * tbl[i % 14 + 1] * 1000 // 48000 + i % 2 for i in range(20)
    )


@pytest.mark.parametrize(
    "version,layer,sr_idx,sr,spf",
    [
        (1, 3, 0, 44100, 1152),
        (2, 3, 1, 24000, 576),
        (25, 3, 1, 12000, 576),
        (1, 1, 0, 44100, 384),
        (1, 2, 0, 44100, 1152),
    ],
)
def test_mp3_versions_and_layers(version, layer, sr_idx, sr, spf):
    s = scan_mp3_frames(build_mp3([(5, 0)] * 4, sr_idx=sr_idx,
                                  version=version, layer=layer))
    assert s["samplerate"] == sr and s["samples"] == 4 * spf


def test_mp3_rejects_malformed():
    good = build_mp3([(5, 0)] * 4)
    with pytest.raises(ValueError):
        scan_mp3_frames(good[:40])  # frame overruns stream
    with pytest.raises(ValueError):
        scan_mp3_frames(b"\xff\xfb" + bytes(10))  # truncated
    with pytest.raises(ValueError):
        scan_mp3_frames(bytes(16))  # no sync
    # free-format bitrate index rejected
    h = bytearray(good)
    h[2] &= 0x0F  # zero the bitrate index of frame 0
    with pytest.raises(ValueError):
        scan_mp3_frames(bytes(h))


def test_mp3_sample_decode_still_raises():
    """The honest boundary: the container scans, the codec does not."""
    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        sniff_media_type,
    )

    p = build_mp3([(5, 0)] * 2, id3v2_payload=4)
    assert sniff_media_type(p) == "audio/mp3"
    with pytest.raises(NotImplementedError):
        decode_media(p, "audio/mp3")
