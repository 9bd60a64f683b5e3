"""Round-8 ops: PNG decode query, newline-unit boilerplate strip."""

from __future__ import annotations

import hashlib

from data_pipeline_who_gho_spark.plans.curation11 import (
    boilerplate_strip_newline,
    media_decode_png_stats,
)


def test_png_stats_equal_bmp_ppm_stats(spark):
    """The PNG query shares the pixel formula with media_decode_stats —
    a correct zlib+unfilter decode must therefore produce IDENTICAL
    per-doc statistics to the BMP/PPM decode path (different bytes on
    the wire, same pixels). Any filter-inversion defect shows up as a
    per-row divergence on the rows whose (doc_id + y) % 5 hits it."""
    from data_pipeline_who_gho_spark.plans.curation10 import media_decode_stats

    sf = "/root/testdata/sf0.001"
    png = {r["doc_id"]: r for r in media_decode_png_stats(spark, sf).collect()}
    base = {r["doc_id"]: r for r in media_decode_stats(spark, sf).collect()}
    assert set(png) == set(base) and len(png) > 0
    for d, r in png.items():
        b = base[d]
        for c in ("h", "w", "n_px", "sum_r", "sum_g", "sum_b", "wsum"):
            assert r[c] == b[c], (d, c)


def test_boilerplate_newline_matches_pure_python(spark, tmp_path):
    """End-to-end pin of the newline production path on a constructed
    corpus: multiline synthesis → split('\\n') → strip → '\\n' rejoin
    must equal an independent pure-Python recomputation (including the
    md5 of the newline-joined cleaned text, which differs from the
    chunk-unit query's space-joined md5)."""
    header = " ".join(f"h{i}" for i in range(10))
    uniq = {d: " ".join(f"u{d}x{i}" for i in range(10)) for d in range(4)}
    tail = {d: " ".join(f"t{d}y{i}" for i in range(10)) for d in range(4)}
    rows = [(d, f"{header} {uniq[d]} {tail[d]}") for d in range(3)]
    rows.append((3, f"{uniq[3]} {tail[3]}"))  # no header
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id LONG, text STRING").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {r["doc_id"]: r for r in boilerplate_strip_newline(spark, sf).collect()}
    for d in range(3):
        clean = "\n".join([uniq[d], tail[d]])
        assert out[d]["n_lines"] == 3
        assert out[d]["n_removed"] == 1
        assert out[d]["clean_n_chars"] == len(clean)
        assert out[d]["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
    clean3 = "\n".join([uniq[3], tail[3]])
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_md5"] == hashlib.md5(clean3.encode()).hexdigest()
