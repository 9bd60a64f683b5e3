"""Round-10 additions (plans/curation14.py): EXIF-orientation-aware
fingerprinting and the orientation operators under it."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation14")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_apply_orientation_roundtrip_all_eight():
    """store_with_orientation must be the exact inverse of
    apply_orientation for every EXIF tag, on 2-D and 3-D arrays."""
    import numpy as np

    from data_pipeline_who_gho_spark.operators.exif import (
        apply_orientation,
        store_with_orientation,
    )

    rng = np.random.default_rng(3)
    img2 = rng.integers(0, 256, (12, 20), dtype=np.uint8)
    img3 = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    for img in (img2, img3):
        seen = set()
        for tag in range(1, 9):
            stored = store_with_orientation(img, tag)
            assert np.array_equal(apply_orientation(stored, tag), img)
            seen.add(stored.tobytes() + bytes([*stored.shape[:2]]))
        # the eight transforms are genuinely distinct on an asymmetric
        # image — a wrong-but-self-consistent pair would still round-trip
        assert len(seen) == 8
    with pytest.raises(ValueError):
        apply_orientation(img2, 9)
    with pytest.raises(ValueError):
        apply_orientation(img2, 0)


def test_exif_orientation_neardup_matches_oracle(spark):
    """Hash parity with the upright closed form proves the
    decode→parse-tag→normalize arc is exact under all eight stored
    orientations; every planted even/odd pair must be found with
    exactly 3 matched bands."""
    from data_pipeline_who_gho_spark.plans.curation14 import (
        EXIF_ORIENTATION_NEARDUP_SQL,
        exif_orientation_neardup,
    )

    got = sorted(
        tuple(r) for r in exif_orientation_neardup(spark, SF).collect()
    )
    assert got == _oracle(EXIF_ORIENTATION_NEARDUP_SQL)
    pairs = {(a, b) for a, b, _ in got}
    import duckdb

    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT COUNT(*), MIN(doc_id) FROM '{SF}/documents.parquet'"
    ).fetchone()
    n, lo = n_docs
    planted = {
        (d, d + 1) for d in range(lo, lo + n - 1) if d % 2 == 0
    }
    assert planted <= pairs  # 100% planted recall
    bands = dict(((a, b), m) for a, b, m in got)
    assert all(bands[p] == 3 for p in planted)  # true near-dups, not exact


def test_orientation_normalization_is_load_bearing():
    """Control: fingerprinting the STORED (unnormalized) array under a
    quarter-rotation yields a different nibble grid — the pair the
    query finds would split without apply_orientation."""
    import numpy as np

    from data_pipeline_who_gho_spark.operators.exif import (
        store_with_orientation,
    )

    vals = (np.arange(16).reshape(4, 4) * 16 + 5).astype(np.int64)
    stored = store_with_orientation(vals, 6)
    assert not np.array_equal(stored, vals)
    # band values (rows of the grid) all change under the rotation
    assert all(
        not np.array_equal(stored[r], vals[r]) for r in range(4)
    )
