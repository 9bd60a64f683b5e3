"""Deterministic sketches: HyperLogLog distinct counts (Flajolet et
al., 2007) and Count-Min frequency estimation (Cormode &
Muthukrishnan, 2005).

``approx_count_distinct`` exists as a Spark built-in (its tolerance
contract is pinned in tests/test_sketches.py), but its register layout
is engine-internal, so it cannot be oracle-twinned. These queries
implement HLL FROM ITS DEFINITION over md5 — register index = first
two hex nibbles (m = 256), rho = leading-zero rank of the next 32 hash
bits — so DuckDB computes the identical sketch from the identical
algorithm text, and the driver's hash gate pins every register and
estimate bit-for-bit. The Count-Min sketch follows the same recipe:
row hashes are md5 with per-row salts, so both engines hold the
identical d×w counter table and the identical (over)estimates.

Two deliberate design points for cross-engine exactness:

* Register sums use FIXED-POINT integers: Z = Σ 2^(32-M_j) summed as
  BIGINT (exact regardless of order), divided out as a double only
  once at the end. A naive Σ 2^-M_j in doubles is order-sensitive at
  the margin, and shuffle order differs between engines.
* The small-range ``m·ln(m/V)`` correction is intentionally OMITTED
  (raw estimator + the zero-register count are reported instead):
  ``ln`` is not guaranteed identically rounded across libm
  implementations, which would poison the hash gate. The sketched key
  is therefore the distinct word-5-gram SHINGLE (the cardinality a
  near-dup planner sizes LSH work by, and the same fingerprint space
  as ``curation6.source_overlap_matrix``) — its per-source and corpus
  cardinalities sit well above the 2.5·m small-range cutoff, where the
  raw estimator is the textbook path. The ±1.04/√m accuracy contract
  is asserted in tests.

Why this matters at 100 TB: the per-register MAX is a partial
aggregate (map-side combined), so a corpus-wide distinct estimate
costs one 256-row-per-group shuffle instead of a full distinct
shuffle of the key universe — and sketches MERGE (``hll_union_total``
demonstrates union-by-register-max), which is what makes incremental /
cross-shard distinct rollups possible at all.

The reference has no sketches (its only aggregate is COUNT(*),
dags/who_gho_etl_dag.py:194-206); this extends SURVEY §2c's
aggregation gap with the production approximate path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.catalog import load_table, spread_by_hash
from .curation6 import _ngrams, _sql_ngrams
from .training import _nibble, _sql_nibble

_HLL_M = 256  # 2^8 registers: index = first two md5 nibbles
_HLL_BITS = 32  # rho drawn from the next 32 hash bits
_HLL_K = 5  # shingle width of the sketched key
# alpha_256 = 0.7213 / (1 + 1.079/256) = 0.7182726... ≈ 0.718273; ONE
# literal text shared by both engines so they hold the identical double
_HLL_ALPHA = "0.718273"


def _shingles(docs: DataFrame) -> DataFrame:
    """(source, word): the 5-gram shingle stream, with the token array
    materialized as a column so the split evaluates once per doc.
    Spread first: the single-row-group fixture scan is one task, which
    serialized the shingle+md5 stream on one core (r13; no-op at
    production scale — catalog.spread_by_hash)."""
    return spread_by_hash(docs.select("source", "text"), "text").select(
        "source", TX.tokens(F.col("text")).alias("toks")
    ).select("source", F.explode(_ngrams(F.col("toks"), _HLL_K)).alias("word"))


def _hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, reg, m_j): per-source HLL register maxima over the
    5-gram shingle stream. rho = 33 - bit_length(v) where v is the
    32-bit slice of md5 after the register byte (v = 0 → rho = 33);
    bit_length via length(bin(v)) — identical semantics in Spark and
    DuckDB. The register max is a partial aggregate: map-side
    combined, one ≤256-rows-per-source exchange."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token ARRAY as a named column before shingling:
    # passing the tokens EXPRESSION into _ngrams re-evaluates the split
    # inside the transform lambda for every shingle index (no CSE
    # through lambdas) — O(doc²) per document, measured 10× slower
    toks = _shingles(docs).select("source", F.col("word"))
    h = F.md5("word")
    # r13: one conv() hex parse per field instead of 10 instr()-based
    # nibble extractions per row — identical integer values (reg = the
    # first 2 hex nibbles, v = the next 8 as a 32-bit slice; the SQL
    # oracle keeps the nibble form, proving value equality)
    reg = F.conv(F.substring(F.col("h"), 1, 2), 16, 10).cast("int").alias("reg")
    v = F.conv(F.substring(F.col("h"), 3, 8), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(_HLL_BITS + 1)).otherwise(
        F.lit(_HLL_BITS + 1) - F.length(F.bin(v))
    )
    return (
        toks.withColumn("h", h)
        .select("source", reg, rho.alias("rho"))
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("m_j"))
    )


def _fixed_point_term() -> F.Column:
    """2^(32 - m_j) as an exact BIGINT (shiftright semantics match
    DuckDB's ``>>`` for every reachable m_j; m_j = 33 truncates the
    2^-33 tail to 0 identically in both engines)."""
    return F.expr(
        f"cast(shiftright(cast({1 << _HLL_BITS} as bigint), "
        "cast(m_j as int)) as bigint)"
    )


def _estimate(zsum: F.Column, n_regs: F.Column) -> F.Column:
    """Raw HLL estimate from the fixed-point register sum. Registers
    absent from the sparse table count as M_j = 0 (term 2^32)."""
    total = zsum + (F.lit(_HLL_M) - n_regs) * F.lit(1 << _HLL_BITS)
    return F.round(
        F.lit(float(_HLL_ALPHA))
        * F.lit(_HLL_M * _HLL_M)
        * F.lit(float(1 << _HLL_BITS))
        / total.cast("double"),
        6,
    )


def hll_distinct_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-shingle estimate: the deterministic HLL
    estimate next to the exact count (so the row itself documents the
    sketch error). zero_regs = registers still at M_j = 0."""
    regs = _hll_registers(spark, sf_dir)
    # the register table is sparse (absent register ⇔ M_j = 0, and a
    # present register always has rho ≥ 1), so zero_regs = m - n_regs
    sketch = regs.groupBy("source").agg(
        F.sum(_fixed_point_term()).alias("zsum"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    docs = load_table(spark, sf_dir, "documents")
    exact = (
        _shingles(docs)
        .groupBy("source")
        .agg(F.countDistinct("word").alias("n_exact"))
    )
    return (
        sketch.join(exact, "source")
        .select(
            "source",
            "n_exact",
            _estimate(F.col("zsum"), F.col("n_regs")).alias("hll_estimate"),
            (F.lit(_HLL_M) - F.col("n_regs")).cast("long").alias("zero_regs"),
        )
        .orderBy("source")
    )


def hll_union_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide distinct estimate by MERGING the per-source sketches
    (register-wise max) — the mergeability that makes sketch rollups
    work across shards/days without re-scanning: one row, estimate next
    to the exact corpus distinct count."""
    regs = _hll_registers(spark, sf_dir)
    merged = regs.groupBy("reg").agg(F.max("m_j").alias("m_j"))
    sketch = merged.agg(
        F.sum(_fixed_point_term()).alias("zsum"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    docs = load_table(spark, sf_dir, "documents")
    exact = _shingles(docs).agg(F.countDistinct("word").alias("n_exact"))
    return sketch.crossJoin(exact).select(
        "n_exact",
        _estimate(F.col("zsum"), F.col("n_regs")).alias("hll_estimate"),
    )


_SQL_REG = f"({_sql_nibble('h', 1)} * 16 + {_sql_nibble('h', 2)})"
_SQL_V = " + ".join(
    f"CAST({_sql_nibble('h', i)} AS BIGINT) * {16 ** (10 - i)}"
    for i in range(3, 11)
)

_SQL_TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_SQL_SHINGLES = _sql_ngrams(_SQL_TOKS, _HLL_K)

_HLL_REG_CTES = f"""shingles AS (
  SELECT source, unnest({_SQL_SHINGLES}) AS word
  FROM documents
),
tok AS (
  SELECT source, md5(word) AS h FROM shingles
),
rr AS (
  SELECT source, {_SQL_REG} AS reg,
         CASE WHEN ({_SQL_V}) = 0 THEN {_HLL_BITS + 1}
              ELSE {_HLL_BITS + 1} - length(bin({_SQL_V})) END AS rho
  FROM tok
),
regs AS (
  SELECT source, reg, MAX(rho) AS m_j FROM rr GROUP BY source, reg
)"""


def _sql_estimate(zsum: str, n_regs: str) -> str:
    total = f"({zsum} + ({_HLL_M} - {n_regs}) * {1 << _HLL_BITS})"
    # every constant cast to DOUBLE explicitly: DuckDB otherwise parses
    # the literals as DECIMAL and the product overflows DECIMAL(18)
    return (
        f"round(CAST({_HLL_ALPHA} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE)"
        f" * CAST({float(1 << _HLL_BITS)} AS DOUBLE)"
        f" / CAST({total} AS DOUBLE), 6)"
    )


HLL_PER_SOURCE_SQL = f"""
WITH {_HLL_REG_CTES},
sketch AS (
  SELECT source,
         CAST(SUM({1 << _HLL_BITS} >> m_j) AS BIGINT) AS zsum,
         COUNT(*) AS n_regs
  FROM regs GROUP BY source
),
exact AS (
  SELECT source, COUNT(DISTINCT word) AS n_exact
  FROM shingles GROUP BY source
)
SELECT s.source, e.n_exact,
       {_sql_estimate('s.zsum', 's.n_regs')} AS hll_estimate,
       CAST({_HLL_M} - s.n_regs AS BIGINT) AS zero_regs
FROM sketch s JOIN exact e USING (source)
ORDER BY s.source
"""

HLL_UNION_SQL = f"""
WITH {_HLL_REG_CTES},
merged AS (SELECT reg, MAX(m_j) AS m_j FROM regs GROUP BY reg),
sketch AS (
  SELECT CAST(SUM({1 << _HLL_BITS} >> m_j) AS BIGINT) AS zsum,
         COUNT(*) AS n_regs
  FROM merged
),
exact AS (
  SELECT COUNT(DISTINCT word) AS n_exact FROM shingles
)
SELECT e.n_exact, {_sql_estimate('s.zsum', 's.n_regs')} AS hll_estimate
FROM sketch s CROSS JOIN exact e
"""


# ---------------------------------------------------------------------------
# Count-Min sketch: bigram frequency estimation
# ---------------------------------------------------------------------------
#
# The sketched key is the word BIGRAM: the 31-word fixture vocabulary
# yields ≤ 961 distinct bigrams against w = 256 buckets per row, so
# counter collisions — the thing a CMS trades space for — are live at
# every scale factor (a unigram stream would be collision-free and the
# overestimate column vacuously zero). Estimating n-gram frequencies
# under fixed memory is the classic CMS deployment in LM pipelines.
#
# Why this matters at 100 TB: the sketch is a FIXED d×w counter table
# built by one map-side-combined count per (row, bucket) — a ≤1024-row
# shuffle regardless of corpus size — and CMS tables MERGE by cell-wise
# addition, so per-shard sketches roll up without re-scanning. The
# exact column exists to make the error observable under the oracle
# gate (same pattern as hll_distinct_per_source's n_exact).

_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row: first two md5 nibbles of the salted hash
_CMS_N = 2  # sketched key = word 2-gram
_CMS_TOPK = 15  # exact heavy hitters probed against the sketch


def _cms_bucket(col: F.Column, row: int) -> F.Column:
    """Bucket of `col` under the row-salted md5 hash: rows use distinct
    salts ("cms{row}_") so the d hash functions are independent."""
    h = F.md5(F.concat(F.lit(f"cms{row}_"), col))
    return (_nibble_of(h, 1) * 16 + _nibble_of(h, 2)).cast("int")


def _nibble_of(h: F.Column, i: int) -> F.Column:
    """Hex nibble i (1-based) of an md5 string column as an int."""
    return (
        F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - F.lit(1)
    ).cast("int")


def _cms_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bigram stream (one row per corpus bigram occurrence)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(TX.tokens(F.col("text")).alias("toks"))
    return toks.select(F.explode(_ngrams(F.col("toks"), _CMS_N)).alias("bg"))


def cms_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the corpus's top bigrams:
    exact count next to the CMS estimate and the (always ≥ 0)
    overestimate, so the row itself documents the sketch error.

    Plan: ONE stream scan builds the sketch (stack to (row, bucket),
    map-side-combined count → ≤ d·w rows); the exact top-k is a
    TakeOrdered over the bigram-grain counts; the probe is a broadcast
    join of the 4·k probe rows against the tiny sketch. No full-vocab
    shuffle rides the sketch path — at scale the exact column would be
    dropped and the sketch IS the product."""
    bg = _cms_bigrams(spark, sf_dir)
    # build the d bucket columns, then stack to (row, bucket)
    with_buckets = bg.select(
        *[_cms_bucket(F.col("bg"), i).alias(f"b{i}") for i in range(_CMS_D)]
    )
    stacked = with_buckets.select(
        F.expr(
            "stack("
            + str(_CMS_D)
            + ", "
            + ", ".join(f"{i}, b{i}" for i in range(_CMS_D))
            + ") as (row, bucket)"
        )
    )
    sketch = stacked.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))

    exact_top = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("bg"))
        .limit(_CMS_TOPK)
    )
    probe = exact_top.select(
        "bg",
        "n_exact",
        *[_cms_bucket(F.col("bg"), i).alias(f"b{i}") for i in range(_CMS_D)],
    ).select(
        "bg",
        "n_exact",
        F.expr(
            "stack("
            + str(_CMS_D)
            + ", "
            + ", ".join(f"{i}, b{i}" for i in range(_CMS_D))
            + ") as (row, bucket)"
        ),
    )
    est = (
        probe.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("bg")
        .agg(F.max("n_exact").alias("n_exact"), F.min("c").alias("cms_estimate"))
    )
    return est.select(
        F.col("bg").alias("bigram"),
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
    ).orderBy(F.col("n_exact").desc(), F.col("bigram"))


_SQL_CMS_BIGRAMS = _sql_ngrams(_SQL_TOKS, _CMS_N)


def _sql_cms_bucket(col: str, row: int) -> str:
    h = f"md5('cms{row}_' || {col})"

    def nib(i: int) -> str:
        return f"(instr('0123456789abcdef', substring({h}, {i}, 1)) - 1)"

    return f"({nib(1)} * 16 + {nib(2)})"


CMS_BIGRAM_SQL = f"""
WITH stream AS (
  SELECT unnest({_SQL_CMS_BIGRAMS}) AS bg FROM documents
),
stacked AS (
  {" UNION ALL ".join(f"SELECT {i} AS row, {_sql_cms_bucket('bg', i)} AS bucket FROM stream" for i in range(_CMS_D))}
),
sketch AS (
  SELECT row, bucket, COUNT(*) AS c FROM stacked GROUP BY row, bucket
),
exact_top AS (
  SELECT bg, COUNT(*) AS n_exact FROM stream GROUP BY bg
  ORDER BY n_exact DESC, bg LIMIT {_CMS_TOPK}
),
probe AS (
  {" UNION ALL ".join(f"SELECT bg, n_exact, {i} AS row, {_sql_cms_bucket('bg', i)} AS bucket FROM exact_top" for i in range(_CMS_D))}
),
est AS (
  SELECT bg, MAX(n_exact) AS n_exact, MIN(c) AS cms_estimate
  FROM probe JOIN sketch USING (row, bucket)
  GROUP BY bg
)
SELECT bg AS bigram, n_exact, cms_estimate,
       cms_estimate - n_exact AS overestimate
FROM est ORDER BY n_exact DESC, bigram
"""




# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta-style) distinct + intersection sketch
# ---------------------------------------------------------------------------

_KMV_K = 32          # sketch size; < the smallest per-type cardinality (153)
_KMV_SHIFT = 20      # 60-bit md5 hash >> 20 → 40-bit estimate arithmetic
_KMV_SCALE = 1 << 40


def kmv_user_day_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct/intersection estimation over per-type (user, day)
    activity — the sketch family's SET-ALGEBRA member (HLL here only
    unions; KMV/theta also intersects).

    Universe: distinct (event_type, user_id, day). Hash = first 15 md5
    hex digits of "user:day" (60 bits — order-defining; collision odds
    ~1e-8 at sf1); estimate arithmetic uses the top 40 bits so
    (k−1)·2^40 stays far inside BIGINT. Per type, the sketch is the k=32
    smallest hashes (one per-key window — scale-safe); the distinct
    estimate is the textbook (k−1)·2^40 div kth_hash40, all-integer so
    both engines hold it bit-for-bit. For every type pair the UNION
    sketch (k smallest over A∪B) is intersected with the exact member
    sets: jaccard_est = |{x ∈ K(A∪B) : x ∈ A ∧ x ∈ B}| / k and
    inter_est = est_union · in_both div k — the standard KMV set
    algebra. Exact n_a/n_b/inter_exact ride along as the error witness
    (the same observable-approximation contract as cms_bigram_counts).

    100 TB posture: a KMV sketch is a k-row mergeable state per key —
    distinct AND overlap rollups across shards/sources cost k-row
    unions instead of re-shuffling the key universe; the per-type
    window partitions by event_type (5 keys here; at real key counts
    the TOP-K per key is WindowGroupLimit-pruned map-side).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.col("ts").cast("date").cast("string").alias("day"),
    )
    ded = ev.dropDuplicates(["event_type", "user_id", "day"]).withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("user_id"), F.col("day")).cast("binary")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
    )
    # r13: the deduped universe is referenced ~7 times below (census,
    # pair intersection both sides, union sketch, two membership semis)
    # — materialize it once instead of re-running the scan + dedup per
    # reference. Values identical.
    ded = ded.localCheckpoint(eager=True)
    exact = ded.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))

    types = ded.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    # exact pair intersection (error witness): one self-join on (user, day)
    inter_exact = (
        ded.alias("x")
        .join(
            ded.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.day") == F.col("y.day"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter_exact"))
    )

    # union sketch per pair: k smallest hashes over distinct A∪B members
    pu = (
        F.broadcast(pairs)
        .join(
            ded,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .dropDuplicates(["type_a", "type_b", "user_id", "day"])
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h", "user_id", "day")
    # ≤ k·pairs rows, referenced three times.  r14: the r13 eager
    # checkpoint here is GONE — all three consumers sit in the ONE
    # final job, whose identical window exchanges dedupe via
    # ReusedExchange off the checkpointed universe, so the blocking
    # materialization only serialized an extra job (A/B: 2.75 →
    # 2.2-2.4 s; the ded checkpoint above still pays for itself — its
    # 7 references span the scan+dedup exchange)
    usk = pu.withColumn("rn", F.row_number().over(wu)).filter(
        F.col("rn") <= _KMV_K
    )
    member = ded.select("event_type", "user_id", "day")
    in_a = usk.join(
        member.alias("ma"),
        (F.col("ma.event_type") == F.col("type_a"))
        & (F.col("ma.user_id") == usk["user_id"])
        & (F.col("ma.day") == usk["day"]),
        "left_semi",
    )
    in_both = in_a.join(
        member.alias("mb"),
        (F.col("mb.event_type") == F.col("type_b"))
        & (F.col("mb.user_id") == in_a["user_id"])
        & (F.col("mb.day") == in_a["day"]),
        "left_semi",
    )
    both_counts = in_both.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("in_both")
    )
    union_est = usk.groupBy("type_a", "type_b").agg(
        F.max(F.shiftright(F.col("h"), _KMV_SHIFT)).alias("kth40")
    ).select(
        "type_a",
        "type_b",
        F.expr(f"{(_KMV_K - 1) * _KMV_SCALE} div kth40").alias("union_est"),
    )

    na = exact.select(F.col("event_type").alias("type_a"), F.col("n_exact").alias("n_a"))
    nb = exact.select(F.col("event_type").alias("type_b"), F.col("n_exact").alias("n_b"))
    return (
        pairs.join(na, "type_a")
        .join(nb, "type_b")
        .join(inter_exact, ["type_a", "type_b"])
        .join(union_est, ["type_a", "type_b"])
        .join(both_counts, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "inter_exact",
            "union_est",
            "in_both",
            F.expr(f"(1000 * in_both) div {_KMV_K}").alias("jaccard_est_permille"),
            F.expr(f"(union_est * in_both) div {_KMV_K}").alias("inter_est"),
        )
        .orderBy("type_a", "type_b")
    )


KMV_OVERLAP_SQL = f"""
WITH ded AS (
  SELECT DISTINCT event_type, user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
  FROM events
),
hashed AS (
  SELECT event_type, user_id, day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || day), 1, 15))::BIGINT AS h
  FROM ded
),
exact AS (SELECT event_type, COUNT(*) AS n_exact FROM hashed GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM hashed) a,
       (SELECT DISTINCT event_type FROM hashed) b
  WHERE a.event_type < b.event_type
),
inter_exact AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b, COUNT(*) AS inter_exact
  FROM hashed x JOIN hashed y
    ON x.user_id = y.user_id AND x.day = y.day AND x.event_type < y.event_type
  GROUP BY 1, 2
),
pu AS (
  SELECT DISTINCT p.type_a, p.type_b, h.user_id, h.day, h.h
  FROM pairs p JOIN hashed h
    ON h.event_type = p.type_a OR h.event_type = p.type_b
),
usk AS (
  SELECT * FROM (
    SELECT type_a, type_b, user_id, day, h,
           row_number() OVER (PARTITION BY type_a, type_b
                              ORDER BY h, user_id, day) AS rn
    FROM pu
  ) WHERE rn <= {_KMV_K}
),
in_both AS (
  SELECT u.type_a, u.type_b, COUNT(*) AS in_both
  FROM usk u
  WHERE EXISTS (SELECT 1 FROM hashed a WHERE a.event_type = u.type_a
                AND a.user_id = u.user_id AND a.day = u.day)
    AND EXISTS (SELECT 1 FROM hashed b WHERE b.event_type = u.type_b
                AND b.user_id = u.user_id AND b.day = u.day)
  GROUP BY 1, 2
),
union_est AS (
  SELECT type_a, type_b,
         {(_KMV_K - 1) * _KMV_SCALE} // MAX(h >> {_KMV_SHIFT}) AS union_est
  FROM usk GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       ea.n_exact AS n_a, eb.n_exact AS n_b,
       i.inter_exact,
       u.union_est,
       ib.in_both,
       (1000 * ib.in_both) // {_KMV_K} AS jaccard_est_permille,
       (u.union_est * ib.in_both) // {_KMV_K} AS inter_est
FROM pairs p
JOIN exact ea ON ea.event_type = p.type_a
JOIN exact eb ON eb.event_type = p.type_b
JOIN inter_exact i USING (type_a, type_b)
JOIN union_est u USING (type_a, type_b)
JOIN in_both ib USING (type_a, type_b)
ORDER BY type_a, type_b
"""



# ---------------------------------------------------------------------------
# Bottom-k hash sampling → approximate quantiles
# ---------------------------------------------------------------------------

_QSK_K = 64  # sample size per group


def quantile_sketch_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from a BOTTOM-K HASH SAMPLE — the sketch
    family's quantile member (HLL=distinct, CMS=frequency, KMV=set
    algebra), next to ``exact_percentiles`` (the exact path).

    Per l_returnflag, the k=64 rows with the smallest md5(orderkey:line)
    form a uniform, DETERMINISTIC, MERGEABLE sample (bottom-k by hash:
    the union of two groups' samples re-cut to k is the sample of the
    union — the same algebra as KMV). Estimates are percentile_disc on
    the sample — an actual data value picked by integer index, so both
    engines hold it bit-for-bit; the exact interpolated quantiles ride
    along as the error witness (l_quantity is integer-valued, so the
    interpolation is IEEE-exact, the exact_percentiles contract).

    Scale: the bottom-k window is rank-limit-prunable
    (WindowGroupLimit: per-partition top-k then merge — census-visible)
    so the sample NEVER funnels a full group through one task; the
    estimate window then runs on ≤ k rows per group.
    """
    # r13: spread the single-row-group fixture scan so the per-row md5
    # keying + bottom-k window AND the exact-percentile witness branch
    # both parallelize (2.6 -> 1.1 s at sf0.1; no-op at production
    # scale via the spread_by_hash guard); values identical
    li = spread_by_hash(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"
        ),
        "l_orderkey",
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col("l_orderkey"), F.col("l_linenumber")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keyed = li.withColumn("h", h)
    wk = Window.partitionBy("l_returnflag").orderBy(
        "h", "l_orderkey", "l_linenumber"
    )
    sample = keyed.withColumn("rn", F.row_number().over(wk)).filter(
        F.col("rn") <= _QSK_K
    )
    wv = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "h", "l_orderkey", "l_linenumber"
    )
    ranked = sample.withColumn("vn", F.row_number().over(wv)).withColumn(
        "k_actual", F.count(F.lit(1)).over(Window.partitionBy("l_returnflag"))
    )
    est = ranked.groupBy("l_returnflag", "k_actual").agg(
        F.max(
            F.when(
                F.col("vn") == F.ceil(F.col("k_actual") * 0.5), F.col("l_quantity")
            )
        ).alias("est_p50"),
        F.max(
            F.when(
                F.col("vn") == F.ceil(F.col("k_actual") * 0.9), F.col("l_quantity")
            )
        ).alias("est_p90"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("l_quantity", 0.5).alias("exact_p50"),
        F.percentile("l_quantity", 0.9).alias("exact_p90"),
    )
    return (
        exact.join(est, "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            "k_actual",
            "est_p50",
            "est_p90",
            "exact_p50",
            "exact_p90",
        )
        .orderBy("l_returnflag")
    )


QUANTILE_SKETCH_SQL = f"""
WITH keyed AS (
  SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                             CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM lineitem
),
sample AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                 ORDER BY h, l_orderkey, l_linenumber) AS rn
    FROM keyed
  ) WHERE rn <= {_QSK_K}
),
ranked AS (
  SELECT l_returnflag, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_quantity, h, l_orderkey, l_linenumber) AS vn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS k_actual
  FROM sample
),
est AS (
  SELECT l_returnflag, k_actual,
         MAX(CASE WHEN vn = CAST(ceil(k_actual * 0.5) AS BIGINT)
                  THEN l_quantity END) AS est_p50,
         MAX(CASE WHEN vn = CAST(ceil(k_actual * 0.9) AS BIGINT)
                  THEN l_quantity END) AS est_p90
  FROM ranked GROUP BY 1, 2
),
exact AS (
  SELECT l_returnflag, COUNT(*) AS n,
         quantile_cont(l_quantity, 0.5) AS exact_p50,
         quantile_cont(l_quantity, 0.9) AS exact_p90
  FROM lineitem GROUP BY 1
)
SELECT e.l_returnflag, e.n, s.k_actual, s.est_p50, s.est_p90,
       e.exact_p50, e.exact_p90
FROM exact e JOIN est s USING (l_returnflag)
ORDER BY l_returnflag
"""


SKETCH_QUERIES = {
    "hll_distinct_per_source": hll_distinct_per_source,
    "hll_union_total": hll_union_total,
    "cms_bigram_counts": cms_bigram_counts,
    "kmv_user_day_overlap": kmv_user_day_overlap,
    "quantile_sketch_by_flag": quantile_sketch_by_flag,
}

SKETCH_ORACLE_SQL = {
    "hll_distinct_per_source": HLL_PER_SOURCE_SQL,
    "hll_union_total": HLL_UNION_SQL,
    "cms_bigram_counts": CMS_BIGRAM_SQL,
    "kmv_user_day_overlap": KMV_OVERLAP_SQL,
    "quantile_sketch_by_flag": QUANTILE_SKETCH_SQL,
}
