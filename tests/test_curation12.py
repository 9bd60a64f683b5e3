"""Round-9 queue queries (plans/curation12.py): oracle parity pinned in
pytest ahead of their r10 driver registration."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation12")


def test_jpeg420_decode_stats_matches_oracle(spark):
    """The full 4:2:0 pipeline — interleaved MCU walk, restart markers,
    DC prediction resets, dequant, IDCT, 2x2 chroma replication — must
    reproduce the closed-form oracle on every doc, including the
    position-weighted sums that pin block order and upsample
    geometry."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation12 import (
        JPEG420_DECODE_STATS_SQL,
        jpeg420_decode_stats,
    )

    got = sorted(tuple(r) for r in jpeg420_decode_stats(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in
                  con.execute(JPEG420_DECODE_STATS_SQL).fetchall())
    assert got == want
    assert len(got) > 0


def test_audio_fingerprint_neardup_matches_oracle_and_recall(spark):
    """Banded audio-fingerprint near-dup over the real WAV decode path:
    must equal the closed-form oracle at sf0.001, and every planted
    even/odd pair must survive with exactly 3 of 4 matched bands (the
    perturbed frame flips one nibble, killing exactly one band)."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation12 import (
        AUDIO_FP_NEARDUP_SQL,
        audio_fingerprint_neardup,
    )

    got = sorted(tuple(r) for r in audio_fingerprint_neardup(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in
                  con.execute(AUDIO_FP_NEARDUP_SQL).fetchall())
    assert got == want
    pairs = {(a, b): m for a, b, m in got}
    doc_ids = {r["doc_id"] for r in
               spark.read.parquet(f"{SF}/documents.parquet")
               .select("doc_id").collect()}
    planted = [(d, d + 1) for d in doc_ids if d % 2 == 0 and d + 1 in doc_ids]
    assert planted, "fixture should contain even/odd partner pairs"
    for a, b in planted:
        assert pairs.get((a, b)) == 3, (a, b, pairs.get((a, b)))


def test_flac_decode_stats_matches_oracle_and_compresses(spark):
    """Rice-coded FLAC decode as a production body: engine stats must
    equal the closed-form oracle at sf0.001, and the synthesized
    signal (sawtooth-modular, order-1-predictable) must actually
    compress — a verbatim-only 'encoder' would fail the ratio bound."""
    import duckdb
    import numpy as np

    from data_pipeline_who_gho_spark.operators.flac import encode_flac
    from data_pipeline_who_gho_spark.plans.curation12 import (
        _FLAC_BS,
        _FLAC_FORM,
        _FLAC_N,
        FLAC_DECODE_STATS_SQL,
        flac_decode_stats,
    )

    got = sorted(tuple(r) for r in flac_decode_stats(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in
                  con.execute(FLAC_DECODE_STATS_SQL).fetchall())
    assert got == want
    assert len(got) > 0
    i = np.arange(_FLAC_N, dtype=np.int64)
    sig = ((7 * _FLAC_FORM[0] + i * _FLAC_FORM[1]) % 199 - 99).astype(np.int16)
    payload = encode_flac(sig, rate=16000, block_size=_FLAC_BS)
    assert len(payload) < 0.5 * sig.size * 2


def test_audio_spectral_features_matches_oracle_and_parseval(spark):
    """4-point-DFT filterbank over the FLAC decode path: engine rows
    must equal the closed-form oracle, and Parseval must hold against
    the time-domain energy (e_dc + 2*e_mid + e_nyq = 4*sum(s^2)) — an
    independent arithmetic pin on the bin formulas."""
    import duckdb
    import numpy as np

    from data_pipeline_who_gho_spark.plans.curation12 import (
        _ASF_FORM,
        AUDIO_SPECTRAL_SQL,
        audio_spectral_features,
    )

    rows = audio_spectral_features(spark, SF).collect()
    got = sorted(tuple(r) for r in rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(AUDIO_SPECTRAL_SQL).fetchall())
    assert got == want
    assert len(got) > 0
    a_d, a_i = _ASF_FORM
    for d, f, e_dc, e_mid, e_nyq in got[:50]:
        i = np.arange(16 * f, 16 * (f + 1), dtype=np.int64)
        s = (d * a_d + i * a_i) % 65536 - 32768
        assert e_dc + 2 * e_mid + e_nyq == 4 * int((s * s).sum()), (d, f)


def test_audio_fingerprint_decodes_payloads_once(spark):
    """The fingerprint relation is localCheckpoint-ed before the banded
    self-join: the join plan must read the materialized relation (no
    MapInPandas on either side), otherwise every payload is decoded
    twice — the same guard image_blockhash_neardup carries."""
    from data_pipeline_who_gho_spark.plans.curation12 import (
        audio_fingerprint_neardup,
    )

    df = audio_fingerprint_neardup(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert plan.count("ExistingRDD") >= 2  # both join sides reuse it


def test_jpeg_progressive_decode_stats_matches_oracle(spark):
    """The 6-scan progressive pipeline — DC first/refine, split-band AC
    first, cross-band AC refinement, EOB runs — must reproduce the
    closed-form oracle on every doc.  The sign-grid checksum isolates
    the F(4,4) AC coefficient (the plain sum cancels it), so chk/wchk
    fail if ANY progressive AC scan mislands a coefficient."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation12 import (
        JPEG_PROGRESSIVE_DECODE_STATS_SQL,
        jpeg_progressive_decode_stats,
    )

    got = sorted(
        tuple(r) for r in jpeg_progressive_decode_stats(spark, SF).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in
                  con.execute(JPEG_PROGRESSIVE_DECODE_STATS_SQL).fetchall())
    assert got == want
    assert len(got) > 0


def test_mp4_container_stats_matches_oracle(spark):
    """The real box-tree probe (64/32-bit sizes, FullBox fields, 16.16
    dims, packed language) must reproduce the synthesis formulas on
    every doc — the engine emits what the PROBE returned, so any walk
    slip (offset, fixed-point, language unpack) breaks parity."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation12 import (
        MP4_CONTAINER_STATS_SQL,
        mp4_container_stats,
    )

    got = sorted(tuple(r) for r in mp4_container_stats(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in
                  con.execute(MP4_CONTAINER_STATS_SQL).fetchall())
    assert got == want
    assert len(got) > 0


def test_mp3_frame_stats_matches_oracle(spark):
    """The frame-header walk (sync, bitrate/samplerate tables, exact
    frame-length stepping, ID3 skip) must land every VBR stream's
    aggregate exactly on the spec formula the oracle replays."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation12 import (
        MP3_FRAME_STATS_SQL,
        mp3_frame_stats,
    )

    got = sorted(tuple(r) for r in mp3_frame_stats(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in
                  con.execute(MP3_FRAME_STATS_SQL).fetchall())
    assert got == want
    assert len(got) > 0
