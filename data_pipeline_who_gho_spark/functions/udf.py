"""The engine's user-extension point: vectorized pandas UDFs ONLY
(SURVEY §2c — never row-at-a-time Python; Arrow batches keep the Python
boundary ~10-100× cheaper).

UDF registration needs an active SparkSession, so kernels are exposed as
factories (``@pandas_udf`` resolves the return type against the session);
call them after the session exists.

``make_winsorize_udf`` is the worked example — a shape (per-batch numpy
arithmetic) built-ins could also do; real uses are model scoring /
tokenizer calls where a Python library is unavoidable.
"""

from __future__ import annotations

import pandas as pd


def make_winsorize_udf():
    """Clip to [1st, 99th] percentile of the *batch* — illustrative only;
    for exact global winsorization compute bounds with approxQuantile
    first and pass them via ``make_affine_udf``-style literals."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def winsorized(v: pd.Series) -> pd.Series:
        lo, hi = v.quantile(0.01), v.quantile(0.99)
        return v.clip(lo, hi)

    return winsorized


def make_weighted_mean_udaf():
    """UDAF form: a GROUPED_AGG pandas_udf — Σ(v·w)/Σw per group. Usable
    in groupBy().agg() and over windows; Arrow-batched like the rest."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else float("nan")

    return weighted_mean


def make_ngram_udtf():
    """UDTF form: one input row → many output rows (character bigrams with
    positions). Lateral-joins like any table function."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, bigram STRING")
    class Bigrams:
        def eval(self, text: str):
            if text:
                for i in range(len(text) - 1):
                    yield i, text[i : i + 2]

    return Bigrams


def make_affine_udf(scale: float, shift: float):
    """UDF factory: y = scale·x + shift as an Arrow-vectorized kernel —
    the pattern for parameterized user extensions."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def affine(v: pd.Series) -> pd.Series:
        return v * scale + shift

    return affine
