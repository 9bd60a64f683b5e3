"""Unigram-LM tokenizer training pinned against an independent
pure-Python reference (VERDICT r06 item 7's 'Done' criterion).

The reference below re-implements the same semantics with DIFFERENT
mechanics: Fraction-valued scores (exact rationals) instead of integer
cross-multiplication, recursive memoized segmentation instead of
iterative DP, collections.Counter M-steps instead of Spark aggregation.
Agreement on every word and on the whole trained inventory therefore
pins the semantics, not the implementation."""

from __future__ import annotations

from collections import Counter
from fractions import Fraction
from functools import lru_cache

import pytest

from data_pipeline_who_gho_spark.plans.unigram import (
    _viterbi,
    em_step,
    seed_pieces,
    unigram_encode,
    unigram_train,
    word_freqs,
)

MAXP = 4


# ---------------------------------------------------------------------------
# pure-Python reference (independent implementation)
# ---------------------------------------------------------------------------


def ref_seed(freqs: dict[str, int], max_len: int, seed_size: int) -> dict[str, int]:
    c: Counter = Counter()
    for w, f in freqs.items():
        for i in range(len(w)):
            for n in range(1, min(max_len, len(w) - i) + 1):
                c[w[i : i + n]] += f
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    out = dict(top)
    for p, n in c.items():
        if len(p) == 1:
            out.setdefault(p, n)
    return out


def ref_segment(word: str, counts: dict[str, int], total: int) -> list[str]:
    @lru_cache(maxsize=None)
    def go(s: str):
        """Best (score, -len?) — returns (score Fraction, k, pieces)."""
        if not s:
            return (Fraction(1), 0, ())
        best = None
        for n in range(1, min(MAXP, len(s)) + 1):
            piece = s[:n]
            cnt = counts.get(piece)
            if not cnt:
                continue
            sub = go(s[n:])
            if sub is None:
                continue
            cand = (
                Fraction(cnt, total) * sub[0],
                1 + sub[1],
                (piece,) + sub[2],
            )
            if (
                best is None
                or cand[0] > best[0]
                or (cand[0] == best[0] and (cand[1], cand[2]) < (best[1], best[2]))
            ):
                best = cand
        return best

    r = go(word)
    return list(word) if r is None else list(r[2])


def ref_train(freqs, vocab_size, iters, max_len, seed_size):
    inv = ref_seed(freqs, max_len, seed_size)
    for _ in range(iters):
        total = sum(inv.values())
        new: Counter = Counter()
        for w, f in freqs.items():
            for p in ref_segment(w, inv, total):
                new[p] += f
        prev_chars = [p for p in inv if len(p) == 1]
        nxt = dict(sorted(new.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size])
        for ch in prev_chars:
            nxt.setdefault(ch, max(new.get(ch, 0), 1))
        inv = nxt
    return inv


CORPUS = [
    "the spark table scan",
    "the table scan is fast",
    "fast table scan the spark",
    "spark spark the the scanner",
    "a scan a table a spark",
]


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("unigram")
    rows = [(i, t) for i, t in enumerate(CORPUS)]
    spark.createDataFrame(rows, "doc_id LONG, text STRING").write.parquet(
        f"{d}/documents.parquet"
    )
    return str(d)


def _freqs() -> dict[str, int]:
    c: Counter = Counter()
    for t in CORPUS:
        c.update(t.split())
    return dict(c)


def test_word_freqs_matches_counter(spark, sf_dir):
    got = {r["word"]: r["freq"] for r in word_freqs(spark, sf_dir).collect()}
    assert got == _freqs()


def test_seed_matches_reference(spark, sf_dir):
    words = word_freqs(spark, sf_dir)
    got = {
        r["piece"]: r["count"]
        for r in seed_pieces(words, MAXP, 50).collect()
    }
    assert got == ref_seed(_freqs(), MAXP, 50)


def test_viterbi_matches_reference_on_every_word():
    inv = ref_seed(_freqs(), MAXP, 50)
    total = sum(inv.values())
    for w in _freqs():
        assert _viterbi(w, inv, total, MAXP) == ref_segment(w, inv, total), w


def test_em_step_matches_reference(spark, sf_dir):
    freqs = _freqs()
    inv = ref_seed(freqs, MAXP, 50)
    total = sum(inv.values())
    words = word_freqs(spark, sf_dir)
    got = {r["piece"]: r["count"] for r in em_step(words, inv, MAXP).collect()}
    want: Counter = Counter()
    for w, f in freqs.items():
        for p in ref_segment(w, inv, total):
            want[p] += f
    assert got == dict(want)


def test_full_training_matches_reference(spark, sf_dir):
    got = {
        r["piece"]: r["count"]
        for r in unigram_train(
            spark, sf_dir, vocab_size=24, iters=2, max_piece_len=MAXP, seed_size=50
        ).collect()
    }
    want = ref_train(_freqs(), 24, 2, MAXP, 50)
    assert got == want


def test_encode_surface(spark, sf_dir):
    inv = ref_train(_freqs(), 24, 2, MAXP, 50)
    words = word_freqs(spark, sf_dir)
    out = {r["word"]: list(r["pieces"]) for r in unigram_encode(words, inv, MAXP).collect()}
    total = sum(inv.values())
    for w in _freqs():
        assert "".join(out[w]) == w
        assert out[w] == ref_segment(w, inv, total)


def test_maxmatch_greedy_longest_first(spark, sf_dir):
    """Greedy longest-match: independent per-word reference."""
    from data_pipeline_who_gho_spark.plans.unigram import maxmatch_encode

    inv = {"scan", "spar", "k", "ner", "ta", "ble", "the", "fas", "t"}
    words = word_freqs(spark, sf_dir)
    got = {
        r["word"]: list(r["pieces"])
        for r in maxmatch_encode(words, inv, MAXP).collect()
    }

    def ref(w):
        out, i = [], 0
        while i < len(w):
            ln = min(MAXP, len(w) - i)
            while ln > 1 and w[i : i + ln] not in inv:
                ln -= 1
            out.append(w[i : i + ln])
            i += ln
        return out

    for w in _freqs():
        assert got[w] == ref(w), w
        assert "".join(got[w]) == w
    # pinned concrete case: 'scanner' -> scan + ner; 'spark' -> spar + k
    assert got["scanner"] == ["scan", "ner"]
    assert got["spark"] == ["spar", "k"]


def test_maxmatch_segment_stats_matches_duckdb_oracle(spark):
    """r08 registration candidate: greedy longest-match segmentation
    under the SQL-computable seed inventory must match the recursive-
    CTE oracle row for row at sf0.001."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.unigram import (
        MAXMATCH_SEGMENT_SQL,
        maxmatch_segment_stats,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in maxmatch_segment_stats(spark, sf).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(MAXMATCH_SEGMENT_SQL).fetchall())
    assert len(got) == len(want)
    assert got == want


def test_unigram_encode_stats_matches_bruteforce_and_oracle(spark, tmp_path):
    """Registered r08: the quantized-inventory Viterbi encode must (a)
    equal an independent brute-force enumeration over ALL segmentations
    under the same quantized scores, and (b) match the recursive-CTE
    DuckDB oracle row for row — on a CONSTRUCTED corpus with tie-bait
    words, not just the fixture."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.unigram import (
        UNIGRAM_ENCODE_STATS_SQL,
        UNIGRAM_MAX_PIECE,
        _UE_SEED,
        seed_pieces,
        unigram_encode_stats,
        word_freqs,
    )

    # tie-bait: 'abab' segments as ab+ab / a+bab? / aba+b ... with many
    # equal-count pieces; 'zzzz' stresses repeated chars
    docs = [
        (1, "abab banana zzzz scan scanner"),
        (2, "abab banana band scan the"),
        (3, "ab ba banana scanner zzzz the"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id LONG, text STRING").write.parquet(
        f"{sf}/documents.parquet"
    )

    got = {r["word"]: r for r in unigram_encode_stats(spark, sf).collect()}

    # (a) brute force: enumerate every segmentation, score exactly
    words = {r["word"]: int(r["freq"]) for r in word_freqs(spark, sf).collect()}
    raw = {
        r["piece"]: int(r["count"])
        for r in seed_pieces(
            word_freqs(spark, sf).localCheckpoint(eager=True),
            UNIGRAM_MAX_PIECE, _UE_SEED,
        ).collect()
    }
    q = {p: c.bit_length() - 1 for p, c in raw.items()}  # exponents
    t = sum(raw.values()).bit_length()

    def all_segs(w):
        if not w:
            yield ()
            return
        for ln in range(1, min(UNIGRAM_MAX_PIECE, len(w)) + 1):
            if w[:ln] in q:
                for rest in all_segs(w[ln:]):
                    yield (w[:ln],) + rest

    import hashlib

    for w, freq in words.items():
        best = max(
            all_segs(w),
            key=lambda s: (
                sum(q[p] for p in s) - t * len(s),   # score
                -len(s),                             # fewer pieces
                tuple(-ord(ch) for ch in "\t".join(s)),  # lexicographically smaller
            ),
        )
        assert got[w]["n_pieces"] == len(best), (w, best)
        assert (
            got[w]["seg_md5"]
            == hashlib.md5("|".join(best).encode()).hexdigest()
        ), (w, best)
        assert got[w]["freq"] == freq

    # (b) oracle parity on the same constructed corpus
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(UNIGRAM_ENCODE_STATS_SQL).fetchall())
    assert sorted(tuple(r) for r in got.values()) == want
