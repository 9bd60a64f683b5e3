"""Round-10 third-set queries (plans/curation16.py): content-defined
chunking and chunk-level cross-document dedup."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation16")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_chunk_spans_properties():
    """Spans partition the text exactly; boundaries are content-defined
    (an inserted prefix shifts offsets but downstream chunks
    re-synchronize — the property fixed-size blocking lacks)."""
    from data_pipeline_who_gho_spark.plans.curation16 import _chunk_spans

    text = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the rain keeps falling "
        "on the quiet grey roof of the old house by the river bend"
    )
    spans = _chunk_spans(text)
    assert spans[0][0] == 0 and spans[-1][1] == len(text) - 1
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 == e1 + 1 and s1 <= e1
    # content-defined re-synchronization: chunk CONTENTS after the
    # perturbation point are shared with the original
    shifted = "XY " + text
    orig = {text[s : e + 1] for s, e in spans}
    shift = {shifted[s : e + 1] for s, e in _chunk_spans(shifted)}
    assert len(orig & shift) >= len(spans) - 2
    # degenerate inputs
    assert _chunk_spans("") == []
    assert _chunk_spans("short") == [(0, 4)]  # < window: one chunk


def test_cdc_chunk_stats_matches_oracle(spark):
    """The 16-way windowed-join SQL replay of the rolling hash must
    place every boundary exactly where the engine's convolution does —
    chunks_md5 breaks on any one-character disagreement."""
    from data_pipeline_who_gho_spark.plans.curation16 import (
        CDC_CHUNK_STATS_SQL,
        cdc_chunk_stats,
    )

    got = sorted(tuple(r) for r in cdc_chunk_stats(spark, SF).collect())
    assert got == _oracle(CDC_CHUNK_STATS_SQL)
    assert all(r[1] >= 1 and r[2] >= 1 for r in got)
    assert sum(r[1] for r in got) > 2 * len(got)  # genuinely multi-chunk


def test_cdc_shared_chunks_matches_oracle(spark):
    """Chunk-level dedup over the corpus with injected doc twins: every
    twin pair shares all its chunks, so the shared-chunk relation is
    non-trivial and exactly replayable."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation16 import (
        CDC_SHARED_CHUNKS_SQL,
        cdc_shared_chunks,
    )

    got = sorted(tuple(r) for r in cdc_shared_chunks(spark, SF).collect())
    assert got == _oracle(CDC_SHARED_CHUNKS_SQL)
    con = duckdb.connect()
    n_twins = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' WHERE doc_id % 7 = 0"
    ).fetchone()[0]
    # at least one shared chunk per planted twin pair
    assert len(got) >= n_twins
    assert all(r[1] >= 2 for r in got)


def test_crossmodal_dedup_union_matches_oracle(spark):
    """The either-modality rule: image-banded pairs (every consecutive
    even/odd original pair, texts unrelated) and text chunk-containment
    pairs (the corpus twins, images unrelated) must union exactly, with
    correct provenance labels."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation16 import (
        CROSSMODAL_DEDUP_UNION_SQL,
        crossmodal_dedup_union,
    )

    got = sorted(
        tuple(r) for r in crossmodal_dedup_union(spark, SF).collect()
    )
    assert got == _oracle(CROSSMODAL_DEDUP_UNION_SQL)
    via = {(a, b): v for a, b, v in got}
    con = duckdb.connect()
    n, lo = con.execute(
        f"SELECT COUNT(*), MIN(doc_id) FROM '{SF}/documents.parquet'"
    ).fetchone()
    # planted image pairs: consecutive even/odd originals, found via image
    img_planted = {(d, d + 1) for d in range(lo, lo + n - 1) if d % 2 == 0}
    assert img_planted <= set(via)
    assert all(via[p] in ("image", "both") for p in img_planted)
    # planted text pairs: the corpus twins, found via text
    twins = {
        (d, d + 1000000)
        for (d,) in con.execute(
            f"SELECT doc_id FROM '{SF}/documents.parquet' WHERE doc_id % 7 = 0"
        ).fetchall()
    }
    assert twins <= set(via)
    assert all(via[p] in ("text", "both") for p in twins)
    # the two populations are genuinely disjoint detectors
    assert not (img_planted & twins)


def test_text_containment_df_cap_bounds_hot_chunk(spark):
    """The discriminative-chunk df cap: a chunk shared by MORE than
    _XM_DF_CAP documents must be dropped before the inverted-index
    self-join (no d^2 pair blowup on one hot boilerplate key), while
    full twin pairs — even ones whose shared text includes the hot
    chunk — still pair at 100% containment."""
    from data_pipeline_who_gho_spark.plans.curation16 import (
        _XM_DF_CAP,
        _text_containment_pairs,
    )

    n_hot = _XM_DF_CAP + 150  # hot chunk df: far past the cap
    rows = []
    for d in range(n_hot):
        rows.append((d, "HOT"))          # the shared boilerplate chunk
        rows.append((d, f"u{d}"))        # otherwise unique content
        rows.append((d, f"v{d}"))
    # one planted twin pair that ALSO carries the hot chunk
    rows += [(9001, "HOT"), (9001, "tw1"), (9001, "tw2"),
             (9002, "HOT"), (9002, "tw1"), (9002, "tw2")]
    ch = spark.createDataFrame(rows, "doc_id BIGINT, chunk_md5 STRING")
    got = {(a, b) for a, b in _text_containment_pairs(ch).collect()}
    # without the cap the hot chunk alone yields C(n_hot+2, 2) >= 20k
    # candidate pairs; with it, only the twins (who share ALL their
    # discriminative chunks) survive
    assert got == {(9001, 9002)}
    # and a corpus where the cap is not hit behaves as plain containment
    small = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "z")],
        "doc_id BIGINT, chunk_md5 STRING",
    )
    assert {(a, b) for a, b in _text_containment_pairs(small).collect()} == {
        (1, 2)
    }


def test_cdc_oracle_unbounded_long_doc():
    """The oracle's chars CTE derives its bound from each text (no
    static range cap): a >2000-char doc — the exact shape that silently
    truncated and hash-diverged under the old range(2000) — must chunk
    identically to the engine's convolution."""
    import duckdb
    import hashlib

    from data_pipeline_who_gho_spark.plans.curation16 import (
        _cdc_spans_sql,
        _chunk_spans,
    )

    import random

    rng = random.Random(1611)
    words = "rain roof quiet grey falls river bend old house cat dog".split()
    text = " ".join(rng.choice(words) for _ in range(700))[:3100]
    assert len(text) > 2000
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    sql = _cdc_spans_sql() + """
    SELECT doc_id, s, e, md5(ctext) AS h FROM chunks ORDER BY s"""
    got = con.execute(sql).fetchall()
    want = [
        (1, s, e, hashlib.md5(text[s : e + 1].encode()).hexdigest())
        for s, e in _chunk_spans(text)
    ]
    # the corpus CTE also injects the %7 twin; doc 1 is not a multiple
    # of 7 so exactly the original rows come back
    assert got == want
    assert len(want) > 30  # genuinely multi-chunk at this length


def test_chunk_spans_fuzz_vs_naive():
    """The vectorized convolution chunker must agree with a
    character-at-a-time naive reference on random inputs (including
    non-ASCII code points), and boundaries must be local: editing one
    character never moves a boundary more than a window away."""
    import random

    from data_pipeline_who_gho_spark.plans.curation16 import (
        _CDC_DIV,
        _CDC_K,
        _CDC_M,
        _CDC_RES,
        _CDC_W,
        _chunk_spans,
    )

    def naive(text):
        n = len(text)
        if n == 0:
            return []
        ends = []
        for i in range(_CDC_W - 1, n):
            h = 0
            for j in range(_CDC_W):
                h += ord(text[i - j]) * pow(_CDC_K, j, _CDC_M)
            if (h % _CDC_M) % _CDC_DIV == _CDC_RES:
                ends.append(i)
        if not ends or ends[-1] != n - 1:
            ends.append(n - 1)
        spans, start = [], 0
        for e in ends:
            spans.append((start, e))
            start = e + 1
        return spans

    rng = random.Random(11)
    alpha = "ab c.xyz\né中\U0001f680"
    for _ in range(120):
        text = "".join(
            rng.choice(alpha) for _ in range(rng.randint(0, 120))
        )
        assert _chunk_spans(text) == naive(text), repr(text)
