"""Text-analysis column kernels (north-star extension ops).

All pure Catalyst expressions over ``pyspark.sql.functions`` — no Python
UDFs — so they run JVM-side inside whole-stage codegen and scale as
map-only stages. Each kernel has an exact SQL twin used by the DuckDB
oracles (see plans/extensions.py); keep both in sync.

The reference has no text analytics; these generalize its validation/
cleaning layer toward LLM-training-data pipelines (BASELINE.json
north-star: language-ID, quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed stopword lists (deterministic heuristic language-ID).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
    "es": ["el", "los", "de", "y", "que", "en", "una"],
    "de": ["der", "die", "und", "das", "ein", "nicht", "ist"],
}
LANG_ORDER = ["en", "fr", "es", "de"]  # deterministic tie-break order


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(c: Column | str) -> Column:
    """Token count; empty/blank text counts 0."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


# BPE-ish tokenization: alphanumeric runs OR single non-space symbols —
# the regex shape of byte-pair pretokenizers (GPT-2-style split) without
# a vocab. Counts are deterministic and cheap (one regexp pass).
BPE_TOKEN_RE = "[a-z0-9]+|[^a-z0-9\\s]"


def bpe_token_count(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_RE), F.lit(0)))


def stopword_hits(c: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(c), lambda t: t.isin(*words)))


def lang_id(c: Column | str) -> Column:
    """Heuristic language-ID: argmax of per-language stopword hits
    (deterministic tie-break by LANG_ORDER); no hits → 'und'."""
    hits = {lang: stopword_hits(c, lang) for lang in LANG_ORDER}
    best = F.greatest(*[hits[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    # reversed so earlier langs win ties (last .when checked first wins in
    # a chain; build from lowest priority upward)
    for lang in reversed(LANG_ORDER):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text_col: Column | str, n_chars_col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: token volume + stopword
    density + length. Pure double arithmetic with a fixed evaluation
    shape → bit-identical across engines (no rounding needed)."""
    tc = token_count(text_col).cast("double")
    sw = stopword_hits(text_col, "en").cast("double")
    nc = (F.col(n_chars_col) if isinstance(n_chars_col, str) else n_chars_col).cast("double")
    token_term = F.least(tc / F.lit(100.0), F.lit(1.0))
    stop_term = F.when(tc > 0, sw / tc).otherwise(F.lit(0.0))
    len_term = F.least(nc / F.lit(500.0), F.lit(1.0))
    return token_term * F.lit(0.4) + stop_term * F.lit(0.3) + len_term * F.lit(0.3)


def fingerprint_md5(c: Column | str) -> Column:
    """Document fingerprint: md5 hex of the raw text (exact-dedup key)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.md5(col.cast("binary"))
