"""User-defined function surface: scalar pandas UDF, grouped-agg pandas
UDAF, and a Python UDTF — one canonical example of each extension point.

These exist to prove the extension surfaces, not to bypass the JVM: every
operator in the engine that CAN be a built-in expression is one
(tests/test_plans.py asserts the declared queries never cross into
Python). Use these patterns only for logic Catalyst genuinely cannot
express. All are Arrow-vectorized — never row-at-a-time `F.udf` in a hot
path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def log1p_scaled(v: pd.Series) -> pd.Series:
    """Scalar pandas UDF (Arrow batches): log1p(|x|) with sign kept.
    Equivalent to SIGN(x)*LN(1+ABS(x)) — the built-in form is preferred in
    queries; this exists as the scalar-UDF reference implementation."""
    import numpy as np

    return pd.Series(np.sign(v.to_numpy()) * np.log1p(np.abs(v.to_numpy())))


@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-aggregate pandas UDAF: exp(mean(ln x)) over positive x.
    Usable in groupBy().agg() and as an unbounded window aggregate. NULLs
    ignored (pandas mean), non-positive values excluded."""
    import numpy as np

    x = v.dropna()
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x.to_numpy()).mean()))


@udtf(returnType="ngram string, pos int")
class NGrams:
    """Python UDTF: explode a text into word n-grams with positions.
    Table-function form of the shingle generator — the set-returning
    extension point (UDTF), complementing scalar (pandas_udf) and
    aggregate (grouped-agg pandas_udf) above. Register per-session via
    `register_all` and call as `ngrams(text, n)` in SQL FROM/LATERAL."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            yield (" ".join(toks[i : i + n]), i)


def register_all(spark) -> None:
    """Register the UDF surface in a session's SQL namespace."""
    spark.udf.register("log1p_scaled", log1p_scaled)
    spark.udf.register("geometric_mean", geometric_mean)
    spark.udtf.register("ngrams", NGrams)


__all__ = ["log1p_scaled", "geometric_mean", "NGrams", "register_all"]
