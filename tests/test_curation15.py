"""Round-10 second-set queries (plans/curation15.py): modality quality
gates over the real WAV/BMP/Y4M decode paths."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation15")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_audio_quality_gates_matches_oracle(spark):
    """Decoded-sample clip/silence counts and the exact DC sum must
    land on the three-region closed form; every doc carries a real
    clipped burst and a real near-silent lead-in."""
    from data_pipeline_who_gho_spark.plans.curation15 import (
        AUDIO_QUALITY_GATES_SQL,
        audio_quality_gates,
    )

    got = sorted(tuple(r) for r in audio_quality_gates(spark, SF).collect())
    assert got == _oracle(AUDIO_QUALITY_GATES_SQL)
    for _, n, n_clip, n_sil, _, peak in got:
        assert 40 <= n_clip <= 99          # the planted clipped burst
        assert n_sil >= 160                # the planted silent lead-in
        assert peak == 32768               # negative rail dominates
        assert n_clip + n_sil < n


def test_image_quality_gates_matches_oracle(spark):
    """Luma stats from the decoded BMP must match the per-pixel replay;
    even (washed) docs flag low-contrast, odd (full-contrast) never."""
    from data_pipeline_who_gho_spark.plans.curation15 import (
        IMAGE_QUALITY_GATES_SQL,
        image_quality_gates,
    )

    got = sorted(tuple(r) for r in image_quality_gates(spark, SF).collect())
    assert got == _oracle(IMAGE_QUALITY_GATES_SQL)
    for doc_id, lo, hi, mean, nd, flag in got:
        assert flag == (1 if doc_id % 2 == 0 else 0)
        assert lo <= mean <= hi
        if doc_id % 2 == 0:
            assert hi - lo < 8 and nd == 4 + doc_id % 4


def test_video_scene_cut_stats_matches_oracle(spark):
    """Frame-difference cut counts and the exact total SAD must match
    the flat-scene replay; every 7th doc is static, the rest have at
    least two scenes."""
    from data_pipeline_who_gho_spark.plans.curation15 import (
        VIDEO_SCENE_CUT_STATS_SQL,
        video_scene_cut_stats,
    )

    got = sorted(
        tuple(r) for r in video_scene_cut_stats(spark, SF).collect()
    )
    assert got == _oracle(VIDEO_SCENE_CUT_STATS_SQL)
    for doc_id, nf, n_cuts, total_sad, static in got:
        assert nf == 12
        if doc_id % 7 == 0:
            assert static == 1 and n_cuts == 0 and total_sad == 0
        else:
            assert static == 0 and n_cuts >= 2 and total_sad > 0
