"""Table profiling: per-column stats in a single scan (ANALYZE-style).

The first thing anyone runs against an unfamiliar 100 TB table: null
counts, cardinalities, numeric ranges per column. One DataFrame
aggregate computes every statistic for every column in a single pass;
the 1-row result is pivoted to long format (one row per column) with
an explode over an in-row struct array — no second scan, no driver
loop over columns.

NDV default is ``approx_count_distinct`` (HLL++, mergeable, one pass):
exact multi-column COUNT(DISTINCT) makes Catalyst EXPAND the input
once per distinct aggregate — a P-fold blow-up of the scan at P
profiled columns, which is exactly the wrong plan at scale. Pass
``exact_ndv=True`` only when cross-engine-exact results matter more
than the expand cost (the oracle harness does, on small fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_ndv: bool = False
) -> DataFrame:
    """Long-format profile: (column, n_nulls, n_distinct, min_value,
    max_value) — min/max as double for numeric columns, NULL otherwise
    (cross-type min/max stringification is engine-specific and lies
    about collation; keep the typed lanes honest). Row order follows
    the input column order."""
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in by_name]
    if unknown:
        raise ValueError(f"columns not in schema: {unknown}")
    ndv = F.count_distinct if exact_ndv else F.approx_count_distinct
    null_d = F.lit(None).cast("double")
    aggs, fields = [], []
    for i, c in enumerate(cols):
        numeric = isinstance(by_name[c], NumericType)
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_n{i}"),
            ndv(F.col(c)).alias(f"_d{i}"),
            (F.min(F.col(c)).cast("double") if numeric else null_d).alias(f"_lo{i}"),
            (F.max(F.col(c)).cast("double") if numeric else null_d).alias(f"_hi{i}"),
        ]
        fields.append(
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(f"_n{i}"), F.lit(0)).alias("n_nulls"),
                F.col(f"_d{i}").alias("n_distinct"),
                F.col(f"_lo{i}").alias("min_value"),
                F.col(f"_hi{i}").alias("max_value"),
            )
        )
    return (
        df.agg(*aggs)
        .select(F.explode(F.array(*fields)).alias("_p"))
        .select("_p.*")
    )
