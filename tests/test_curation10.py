"""Round-7 ops: real BMP/PPM decode, boilerplate line strip,
token-budget-exact sampling, scale-safe grouped running sum."""

from __future__ import annotations

import numpy as np
import pytest


from data_pipeline_who_gho_spark.operators.multimodal import (
    decode_media,
    encode_bmp,
    encode_ppm,
    resize_images,
    sniff_media_type,
)
from data_pipeline_who_gho_spark.operators.rank import grouped_running_sum


# ---------------------------------------------------------------------------
# pure-numpy decoders
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(3, 5), (4, 4), (1, 1), (7, 6)])
def test_bmp_roundtrip(shape):
    """Odd widths exercise the 4-byte row padding; encode→decode must be
    the identity including bottom-up row order and BGR channel order."""
    h, w = shape
    rng = np.random.default_rng(h * 100 + w)
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    payload = encode_bmp(a)
    assert sniff_media_type(payload) == "image/bmp"
    assert (decode_media(payload, "image/bmp") == a).all()


def test_bmp_top_down_negative_height():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(a))
    b[22:26] = (-3).to_bytes(4, "little", signed=True)  # top-down flag
    stride = (5 * 3 + 3) // 4 * 4
    body = np.frombuffer(bytes(b[54:]), np.uint8).reshape(3, stride)
    b[54:] = body[::-1].tobytes()  # re-store rows top-down
    assert (decode_media(bytes(b), "image/bmp") == a).all()


def test_ppm_roundtrip_with_comment():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    assert (decode_media(encode_ppm(a), "image/ppm") == a).all()
    commented = b"P6\n# a header comment\n5 3\n255\n" + a.tobytes()
    assert (decode_media(commented, "image/ppm") == a).all()


def test_codec_stub_is_now_only_mp3_mp4():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00\x18ftypisom", "video/mp4")


def test_malformed_ppm_raises_instead_of_hanging():
    """sniff_media_type routes ANY payload starting with 'P6' to the PPM
    decoder — a text doc beginning 'P6...' or a truncated upload must
    raise, not spin the header scan forever (ADVICE r07)."""
    a = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    good = encode_ppm(a)
    for bad in (
        b"P6",                          # nothing after the magic
        b"P6\n",                        # whitespace then EOF
        b"P6\n# comment with no newline",
        b"P6\n2 2",                     # EOF inside the dims token run
        b"P6\n2 2\n255",                # header ends at EOF, no body
        good[:-1],                      # body one byte short
        b"P6 please read this doc",     # text that merely starts with P6
        b"P6\n-3 2\n255\n" + b"\x00" * 64,  # negative dimension
    ):
        with pytest.raises(ValueError):
            decode_media(bad, "image/ppm")
    assert (decode_media(good, "image/ppm") == a).all()


def test_truncated_bmp_raises():
    a = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)
    payload = encode_bmp(a)
    with pytest.raises(ValueError):
        decode_media(payload[:-4], "image/bmp")
    assert (decode_media(payload, "image/bmp") == a).all()


def test_resize_with_default_decoder_on_real_bmp(spark):
    """The decode seam is now runnable end-to-end in-container: resize
    uses the DEFAULT decoder (no injection) over a real BMP payload."""
    a = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    df = spark.createDataFrame([(1, bytearray(encode_bmp(a)))], "doc_id LONG, payload BINARY")
    out = resize_images(df, 3, 2).collect()[0]
    got = np.frombuffer(bytes(out["pixels"]), np.uint8).reshape(3, 2, 3)
    yi = (np.arange(3) * 6 // 3).clip(0, 5)
    xi = (np.arange(2) * 4 // 2).clip(0, 3)
    assert (got == a[yi][:, xi]).all()


# ---------------------------------------------------------------------------
# boilerplate strip
# ---------------------------------------------------------------------------


def test_boilerplate_line_stripped_everywhere(spark, tmp_path):
    """A 10-token header repeated across >= 3 docs vanishes from EVERY
    doc while unique text survives (VERDICT r06 item 3's pin)."""
    from data_pipeline_who_gho_spark.plans import curation10

    header = " ".join(f"h{i}" for i in range(10))  # one aligned line
    uniq = {
        d: " ".join(f"u{d}x{i}" for i in range(10)) for d in range(4)
    }
    rows = [(d, f"{header} {uniq[d]}") for d in range(3)]  # header first
    rows.append((3, uniq[3]))  # no header
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id LONG, text STRING").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {
        r["doc_id"]: r
        for r in curation10.boilerplate_strip_audit(spark, sf).collect()
    }
    for d in range(3):
        assert out[d]["n_lines"] == 2
        assert out[d]["n_removed"] == 1
        assert out[d]["clean_n_chars"] == len(uniq[d])
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_n_chars"] == len(uniq[3])


def test_boilerplate_all_lines_removed_doc_survives(spark, tmp_path):
    from data_pipeline_who_gho_spark.plans import curation10

    header = " ".join(f"h{i}" for i in range(10))
    rows = [(d, f"{header} only{d} extra{d}") for d in range(3)]
    rows.append((9, header))  # doc that IS pure boilerplate
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id LONG, text STRING").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {
        r["doc_id"]: r
        for r in curation10.boilerplate_strip_audit(spark, sf).collect()
    }
    assert out[9]["n_lines"] == 1
    assert out[9]["n_removed"] == 1
    assert out[9]["clean_n_chars"] == 0  # empty cleaned text, row kept


# ---------------------------------------------------------------------------
# token budget sample + grouped running sum
# ---------------------------------------------------------------------------


def test_grouped_running_sum_matches_naive_window(spark):
    """Exclusive per-group prefix sums across many range partitions must
    equal the single-task window result."""
    import pandas as pd

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 3, 500).astype("int64"),
            "k": rng.permutation(500).astype("int64"),
            "v": rng.integers(1, 50, 500).astype("int64"),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        grouped_running_sum(df, ["g"], ["k"], "v", out_col="c", partitions=13)
        .select("g", "k", "c")
        .toPandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    pdf = pdf.sort_values(["g", "k"]).reset_index(drop=True)
    pdf["c"] = pdf.groupby("g")["v"].cumsum() - pdf["v"]
    assert (got["c"].to_numpy() == pdf["c"].to_numpy()).all()


def test_token_budget_boundary_doc_included(spark, tmp_path):
    """The doc that STRADDLES the budget boundary is included; the next
    one is not. Constructed: 4 docs of 10 tokens each per source →
    budget = 40 // 4 = 10, and whichever doc sorts second starts at
    cum_before = 10, exactly the budget → excluded; the first
    (cum_before = 0 < 10) is included even though it REACHES 10."""
    from data_pipeline_who_gho_spark.plans import curation10

    rows = [
        (d, "s0", " ".join(f"w{d}t{i}" for i in range(10))) for d in range(4)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = curation10.token_budget_sample(spark, sf).orderBy("cum_before").collect()
    assert [r["budget"] for r in out] == [10, 10, 10, 10]
    assert [r["cum_before"] for r in out] == [0, 10, 20, 30]
    assert [r["selected"] for r in out] == [True, False, False, False]
    # selected tokens == budget exactly here; with uneven docs the rule
    # overshoots by at most the straddling doc and never undershoots
    assert sum(r["n_tok"] for r in out if r["selected"]) == 10


def test_media_resize_checksum_matches_duckdb_oracle(spark):
    """r08 registration candidate, gate-checked here already: the
    Spark encode->resize_images->stats chain must hash-match the SQL
    replay of the nearest-neighbor index math at sf0.001."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation10 import (
        MEDIA_RESIZE_CHECKSUM_SQL,
        media_resize_checksum,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in media_resize_checksum(spark, sf).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(MEDIA_RESIZE_CHECKSUM_SQL).fetchall())
    assert got == want


def test_newline_line_unit(spark):
    """Production path: real '\n' lines + '\n' joiner through the
    library core — a header line shared by 3 docs is stripped while
    body lines and document structure survive."""
    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.plans.curation10 import strip_frequent_lines

    header = "COMMON SITE HEADER"
    rows = [(d, f"{header}\nbody {d} alpha\nbody {d} beta") for d in range(3)]
    rows.append((3, "standalone doc\nno header here"))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("line_no", "line")
    )
    out = {
        r["doc_id"]: r
        for r in strip_frequent_lines(lines, min_docs=3, joiner="\n").collect()
    }
    import hashlib

    for d in range(3):
        cleaned = f"body {d} alpha\nbody {d} beta"
        assert out[d]["n_lines"] == 3
        assert out[d]["n_removed"] == 1
        assert out[d]["clean_n_chars"] == len(cleaned)
        assert out[d]["clean_md5"] == hashlib.md5(cleaned.encode()).hexdigest()
    assert out[3]["n_removed"] == 0
    assert out[3]["n_lines"] == 2


def test_token_budget_null_source_is_one_group(spark, tmp_path):
    """A NULL source must behave as ONE group end-to-end (null-safe
    budget attach + null-safe offsets join inside grouped_running_sum);
    the fixtures carry no NULL sources, so only this constructed table
    catches the equi-join drop."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation10 import (
        TOKEN_BUDGET_SAMPLE_SQL,
        token_budget_sample,
    )

    rows = [
        (d, None if d < 4 else "s1", " ".join(f"w{d}t{i}" for i in range(10)))
        for d in range(8)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING"
    ).write.parquet(f"{sf}/documents.parquet")

    got = sorted(tuple(r) for r in token_budget_sample(spark, sf).collect())
    assert len(got) == 8  # no NULL-source row dropped
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(TOKEN_BUDGET_SAMPLE_SQL).fetchall())
    assert got == want


def test_dedup_lines_within_doc(spark):
    """First occurrence of each line survives IN ORDER; later repeats
    are dropped; other docs are untouched."""
    import hashlib

    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.plans.curation10 import dedup_lines_within_doc

    docs = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb\na"),
            (2, "x\ny"),
            (3, "z\nz\nz"),
        ],
        "doc_id LONG, text STRING",
    )
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("line_no", "line")
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines_within_doc(lines, joiner="\n").collect()
    }
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (6, 3)
    assert out[1]["clean_md5"] == hashlib.md5(b"a\nb\nc").hexdigest()
    assert (out[2]["n_lines"], out[2]["n_removed"]) == (2, 0)
    assert out[2]["clean_md5"] == hashlib.md5(b"x\ny").hexdigest()
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (3, 2)
    assert out[3]["clean_n_chars"] == 1


def test_intradoc_line_dedup_matches_duckdb_oracle(spark):
    """Third r08 registration candidate, gate-checked here."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation10 import (
        INTRADOC_LINE_DEDUP_SQL,
        intradoc_line_dedup,
    )

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        got = sorted(tuple(r) for r in intradoc_line_dedup(spark, sf).collect())
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = sorted(
            tuple(r) for r in con.sql(INTRADOC_LINE_DEDUP_SQL).fetchall()
        )
        assert got == want, sf
        assert len(got) > 0


# ---------------------------------------------------------------------------
# PNG codec (round 8): stdlib zlib + numpy un-filtering
# ---------------------------------------------------------------------------

def test_png_roundtrip_every_filter_type():
    from data_pipeline_who_gho_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    for f in range(5):  # one uniform filter type per image
        payload = encode_png(a, row_filters=[f] * 7)
        assert sniff_media_type(payload) == "image/png"
        assert (decode_media(payload, "image/png") == a).all(), f"filter {f}"
    # mixed per-row filters (the registered query's shape)
    mixed = encode_png(a, row_filters=[y % 5 for y in range(7)])
    assert (decode_media(mixed, "image/png") == a).all()


def test_png_roundtrip_shapes():
    from data_pipeline_who_gho_spark.operators.multimodal import encode_png

    for shape in [(1, 1, 3), (3, 5, 3), (6, 4, 3), (8, 8, 3)]:
        a = (np.arange(np.prod(shape)) * 37 % 256).astype(np.uint8).reshape(shape)
        filters = [y % 5 for y in range(shape[0])]
        assert (decode_media(encode_png(a, filters), "image/png") == a).all()


def test_png_rejects_corruption_and_unsupported():
    import zlib

    from data_pipeline_who_gho_spark.operators.multimodal import encode_png

    a = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    good = encode_png(a)
    # flip one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_media(bytes(bad), "image/png")
    with pytest.raises(ValueError):
        decode_media(good[:-5], "image/png")  # truncated
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n", "image/png")  # header only
    # grayscale (color type 0) stays a documented stub
    ihdr = (4).to_bytes(4, "big") + (3).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    def chunk(t, d):
        return len(d).to_bytes(4, "big") + t + d + (zlib.crc32(t + d) & 0xFFFFFFFF).to_bytes(4, "big")
    gray = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (3 * 5)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_media(gray, "image/png")
