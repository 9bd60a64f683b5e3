"""Property-based tests (hypothesis): operator invariants that must hold
for arbitrary inputs — the reference's tests only pin single fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.load import merge_upsert
from data_pipeline_who_gho_spark.operators.transform import dedup_keep_first, normalize_year

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.text(alphabet="abc", min_size=1, max_size=2)
rows = st.lists(st.tuples(keys, st.integers(0, 99)), min_size=0, max_size=30)


@_slow
@given(data=rows)
def test_dedup_idempotent_and_minimal(spark, data):
    if not data:
        return
    df = spark.createDataFrame(data, "k STRING, v INT")
    out = dedup_keep_first(df, ["k"], order_by=["v"])
    got = {(r["k"], r["v"]) for r in out.collect()}
    # exactly one row per key, and it's the minimum-v row (keep-first parity)
    expect = {}
    for k, v in data:
        expect[k] = min(expect.get(k, v), v)
    assert got == set(expect.items())


@_slow
@given(t=rows, u=rows)
def test_merge_upsert_properties(spark, t, u):
    # dedup inputs per key first (upsert contract requires unique keys)
    def uniq(d):
        m = {}
        for k, v in d:
            m[k] = v
        return list(m.items())

    t, u = uniq(t), uniq(u)
    target = spark.createDataFrame(t, "k STRING, v INT") if t else None
    updates = spark.createDataFrame(u, "k STRING, v INT") if u else None
    if updates is None:
        return
    out = {(r["k"], r["v"]) for r in merge_upsert(target, updates, ["k"]).collect()}
    expect = dict(t)
    expect.update(dict(u))  # updates win
    assert out == set(expect.items())


year_strings = st.one_of(
    st.integers(1000, 2100).map(str),
    st.tuples(st.integers(1000, 2100), st.integers(1000, 2100)).map(
        lambda p: f"{p[0]}-{p[1]}"
    ),
    st.just("garbage"),
    st.none(),
)


@_slow
@given(ys=st.lists(year_strings, min_size=1, max_size=20))
def test_normalize_year_first_segment(spark, ys):
    df = spark.createDataFrame([(y,) for y in ys], "y STRING")
    out = [r["n"] for r in df.select(normalize_year("y").alias("n")).collect()]
    for y, n in zip(ys, out):
        if y is None or y == "garbage":
            assert n is None
        else:
            assert n == int(y.split("-")[0])


# ---------------------------------------------------------------------------
# PassJoin fuzzy matcher ≡ quadratic definition (random corpora)
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


# tiny alphabet + shared stems force same-block collisions, near-misses,
# exact dups, and short docs onto every code path
_doc_text = st.one_of(
    st.text(alphabet="ab", min_size=0, max_size=80),
    st.builds(lambda stem, tail: stem * 6 + tail,
              st.text(alphabet="ab", min_size=2, max_size=2),
              st.text(alphabet="abc", min_size=0, max_size=60)),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(texts=st.lists(_doc_text, min_size=2, max_size=14))
def test_fuzzy_passjoin_matches_quadratic_on_random_corpora(spark, tmp_path_factory, texts):
    from data_pipeline_who_gho_spark.plans.analytics5 import (
        _BLOCK_LEN,
        _MAX_DIST,
        _PREFIX_LEN,
        fuzzy_match_docs,
    )

    d = tmp_path_factory.mktemp("fuzzprop")
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_match_docs(spark, str(d)).collect()}

    want = {}
    for ia, ta in enumerate(texts):
        for ib in range(ia + 1, len(texts)):
            tb = texts[ib]
            if ta[:_BLOCK_LEN] == tb[:_BLOCK_LEN]:
                dist = _lev(ta[:_PREFIX_LEN], tb[:_PREFIX_LEN])
                if dist <= _MAX_DIST:
                    want[(ia, ib)] = dist
    assert got == want


agg_rows = st.lists(
    st.tuples(st.text(alphabet="xy", min_size=1, max_size=1),
              st.integers(-50, 50)),
    min_size=1, max_size=40,
)


@_slow
@given(data=agg_rows, buckets=st.sampled_from([1, 2, 7]))
def test_salted_agg_equals_plain_for_any_frame(spark, data, buckets):
    """salted_agg is result-identical to the plain groupBy for every
    frame and every salt width (salting is pure spreading)."""
    from data_pipeline_who_gho_spark.operators.skew import salted_agg

    df = spark.createDataFrame(data, "k STRING, v INT")
    got = {
        (r["k"], r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "s": ("sum", F.sum("v")),
                "mx": ("max", F.max("v")),
            },
            salt_buckets=buckets,
        ).collect()
    }
    expect = {}
    for k, v in data:
        n, s, mx = expect.get(k, (0, 0, None))
        expect[k] = (n + 1, s + v, v if mx is None else max(mx, v))
    assert got == {(k, n, s, mx) for k, (n, s, mx) in expect.items()}


@_slow
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=2, max_size=12),
        min_size=1,
        max_size=15,
    )
)
def test_cms_one_sided_on_random_streams(spark, tmp_path_factory, docs):
    """CMS never underestimates on arbitrary corpora, and is exact for
    any bigram whose buckets are collision-free."""
    from data_pipeline_who_gho_spark.plans.sketches import cms_bigram_counts

    sf = str(tmp_path_factory.mktemp("cmsprop"))
    spark.createDataFrame(
        [(i, " ".join(d), "en", "s", len(d)) for i, d in enumerate(docs)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = cms_bigram_counts(spark, sf).collect()
    exact = {}
    for d in docs:
        for a, b in zip(d, d[1:]):
            exact[f"{a} {b}"] = exact.get(f"{a} {b}", 0) + 1
    for r in rows:
        assert r["n_exact"] == exact[r["bigram"]]
        assert r["cms_estimate"] >= r["n_exact"]


@_slow
@given(
    seq=st.lists(
        st.tuples(st.booleans(), st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=20,
    )
)
def test_interp_bounded_by_neighbor_observations(spark, seq):
    """Every interpolated value lies within [min, max] of the user's
    observations; observation rows keep their own value."""
    import datetime as dt

    from data_pipeline_who_gho_spark.plans import analytics6 as A6

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=10 * i), 1,
         "view" if is_obs else "click", float(v))
        for i, (is_obs, v) in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE",
    )
    orig = A6.load_table
    A6.load_table = lambda *a: ev
    try:
        got = {r["event_id"]: r["filled"]
               for r in A6.interp_linear_fill(spark, "x").collect()}
    finally:
        A6.load_table = orig
    obs = {i: v for i, (is_obs, v) in enumerate(seq) if is_obs}
    if not obs:
        assert all(v is None for v in got.values())
        return
    lo, hi = min(obs.values()), max(obs.values())
    for eid, filled in got.items():
        assert filled is not None
        assert lo - 1e-6 <= filled <= hi + 1e-6
        if eid in obs:
            assert abs(filled - obs[eid]) < 1e-6


@_slow
@given(
    hist=st.lists(st.text(alphabet="abcdef0123456789", min_size=1, max_size=12),
                  min_size=1, max_size=40),
    batch=st.lists(st.text(alphabet="abcdef0123456789", min_size=1, max_size=12),
                   min_size=1, max_size=40),
)
def test_bloom_probe_lossless_for_any_keys(spark, hist, batch):
    """For ARBITRARY key sets: (1) no false negatives — every key folded
    into the bitmap probes maybe-present; (2) the bloom-pruned admit
    (sure-new ∪ verified) equals the plain anti-join result exactly."""
    from data_pipeline_who_gho_spark.plans.curation8 import (
        bloom_bitmap,
        bloom_probe,
    )

    hdf = spark.createDataFrame([(h,) for h in hist], "fingerprint string")
    bdf = spark.createDataFrame(
        [(i, b) for i, b in enumerate(batch)], "doc_id long, fingerprint string"
    )
    bm = bloom_bitmap(hdf)
    # (1) probing the bitmap's OWN keys can never miss
    self_probe = bloom_probe(
        hdf.withColumn("doc_id", F.monotonically_increasing_id()), bm, "doc_id"
    )
    assert self_probe.filter(~F.col("maybe_present")).count() == 0
    # (2) pruned admit == plain anti-join
    probed = bloom_probe(bdf, bm, "doc_id")
    sure = probed.filter(~F.col("maybe_present")).select("doc_id", "fingerprint")
    verified = (
        probed.filter(F.col("maybe_present"))
        .select("doc_id", "fingerprint")
        .join(hdf, "fingerprint", "left_anti")
        .select("doc_id", "fingerprint")
    )
    got = {tuple(r) for r in sure.unionByName(verified).collect()}
    want = {(i, b) for i, b in enumerate(batch) if b not in set(hist)}
    assert got == want


@_slow
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda t: t[0] < t[1]),
        min_size=0,
        max_size=40,
    )
)
def test_triangle_join_matches_enumeration_on_random_graphs(spark, edges):
    """The degree-oriented wedge-join triangle count equals brute-force
    enumeration for arbitrary graphs (not just the fixture's shape)."""
    from itertools import combinations

    from data_pipeline_who_gho_spark.plans.extras import triangle_stats

    if not edges:
        return
    e = spark.createDataFrame(sorted(edges), "s1 long, s2 long")
    row = triangle_stats(e).collect()[0]
    nodes = {v for ed in edges for v in ed}
    want = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    assert row["n_triangles"] == want
    deg: dict = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert row["n_wedges"] == sum(d * (d - 1) // 2 for d in deg.values())


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_ppm_roundtrip_any_shape(h, w, seed):
    """Pure-numpy BMP/PPM encode→decode is the identity for ANY
    (h, w) uint8 RGB image — every stride-padding residue class of w
    and arbitrary pixel content (no Spark needed: the codec is the
    unit under test)."""
    import numpy as np

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_ppm,
        sniff_media_type,
    )

    a = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    for enc in (encode_bmp, encode_ppm):
        payload = enc(a)
        mtype = sniff_media_type(payload)
        out = decode_media(payload, mtype)
        assert out.shape == (h, w, 3)
        assert (out == a).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31),
    data=st.data(),
)
def test_png_roundtrip_any_shape_and_filters(h, w, seed, data):
    """PNG encode→decode is the identity for ANY (h, w) uint8 RGB image
    under ANY per-row filter assignment — the un-filtering math (Sub/Up/
    Average/Paeth left-up dependencies) must hold on arbitrary content,
    not just the fixture formula."""
    import numpy as np

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        encode_png,
    )

    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    a = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_media(encode_png(a, row_filters=filters), "image/png")
    assert (out == a).all()


@settings(max_examples=50, deadline=None)
@given(w=st.integers(1, 80), mode=st.integers(3, 4), seed=st.integers(0, 2**31))
def test_png_unfilter_scan_matches_naive_reference(w, mode, seed):
    """The optimized per-channel int scan (_unfilter_scan) equals the
    literal RFC 2083 §6.5-6.6 per-pixel recurrence on arbitrary rows —
    pinned directly (not just via round-trip) so an encode-side bug
    can't mask a decode-side one, and at widths beyond the fixture's."""
    import numpy as np

    from data_pipeline_who_gho_spark.operators.multimodal import (
        _paeth,
        _unfilter_scan,
    )

    rng = np.random.default_rng(seed)
    cur = rng.integers(0, 256, w * 3).tolist()
    up = rng.integers(0, 256, w * 3).tolist()
    ref = [0] * (w * 3)
    for x in range(w * 3):
        left = ref[x - 3] if x >= 3 else 0
        upleft = up[x - 3] if x >= 3 else 0
        pred = (left + up[x]) // 2 if mode == 3 else _paeth(left, up[x], upleft)
        ref[x] = (cur[x] + pred) % 256
    assert _unfilter_scan(cur, up, mode) == ref


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 200),
    ch=st.integers(1, 4),
    rate=st.integers(1000, 192000),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_any_signal(n, ch, rate, seed):
    import numpy as np

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        encode_wav,
        wav_sample_rate,
    )

    a = np.random.default_rng(seed).integers(-32768, 32768, (n, ch), dtype=np.int16)
    payload = encode_wav(a, rate=rate)
    assert (decode_media(payload, "audio/wav") == a).all()
    assert wav_sample_rate(payload) == rate


@settings(max_examples=20, deadline=None)
@given(
    t=st.integers(1, 8),
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**31),
)
def test_y4m_roundtrip_any_video(t, h, w, seed):
    import numpy as np

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        encode_y4m,
    )

    a = np.random.default_rng(seed).integers(0, 256, (t, h, w), dtype=np.uint8)
    assert (decode_media(encode_y4m(a), "video/y4m") == a).all()


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31), by=st.integers(1, 3), bx=st.integers(1, 3))
def test_jpeg_coefficient_roundtrip_any_blocks(seed, by, bx):
    """Arbitrary in-category quantized coefficient blocks survive the
    full JPEG entropy pipeline exactly — Huffman, DC prediction, ZRL,
    EOB, inverse zig-zag all content-independent."""
    import numpy as np

    from data_pipeline_who_gho_spark.operators.jpeg import (
        _idct_block,
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(seed)
    coefs = rng.integers(-200, 200, (by, bx, 8, 8)).astype(np.int64)
    # sparsify: most blocks in real JPEGs are mostly zero — and this
    # exercises ZRL/EOB far more than dense blocks do
    mask = rng.random((by, bx, 8, 8)) < 0.8
    coefs[mask] = 0
    img = decode_jpeg(encode_jpeg_gray(coef_blocks=coefs, shape=(by * 8, bx * 8)))
    for i in range(by):
        for j in range(bx):
            s = _idct_block(coefs[i, j].astype(float))
            want = np.clip(np.trunc(s + 0.5 * np.sign(s)) + 128, 0, 255)
            assert (img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] == want).all()
