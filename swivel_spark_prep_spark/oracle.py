"""DuckDB oracle harness — mirrors the driver's correctness gate.

Runs a declared query's Spark implementation and its DuckDB oracle SQL on
the same parquet tables and compares the result frames value-by-value
after dtype normalization (FIXTURES.md determinism rules).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from swivel_spark_prep_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize a result frame so Spark and DuckDB outputs are comparable:
    sort columns by name, normalize numeric/datetime dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # mixed int/None columns from Spark arrive as object
            if all(isinstance(v, (int, np.integer)) or pd.isna(v) for v in s):
                df[c] = s.astype("Int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row counts differ: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        sa, sb = a[c], b[c]
        if str(sa.dtype) != str(sb.dtype):
            problems.append(f"dtype[{c}]: spark={sa.dtype} oracle={sb.dtype}")
            continue
        if pd.api.types.is_float_dtype(sa):
            ok = (
                (sa.isna() & sb.isna())
                | (sa == sb)
                | (np.isclose(sa, sb, rtol=0, atol=1e-12, equal_nan=True))
            )
        else:
            ok = (sa.isna() & sb.isna()) | (sa == sb)
        bad = (~ok.fillna(False)).to_numpy().nonzero()[0]
        if len(bad):
            i = int(bad[0])
            problems.append(
                f"value[{c}] {len(bad)} mismatches; first at row {i}: "
                f"spark={sa.iloc[i]!r} oracle={sb.iloc[i]!r}"
            )
    return problems
