"""Data-quality expectations: declarative constraints + quarantine.

The pipeline primitive popularized by Delta Live Tables expectations /
Great Expectations: name → boolean SQL condition, evaluated per row.
Two consumption shapes:

- :func:`check_expectations` — one row of pass/fail stats per rule,
  computed in a SINGLE scan (one conditional-sum aggregate per rule,
  all inside whole-stage codegen; no per-rule passes, no shuffle beyond
  the 1-row aggregate).
- :func:`quarantine` — split the frame into (good, bad); bad rows carry
  a ``_failed`` array naming every violated rule, so a quarantine sink
  can triage. NULL conditions count as failures (a rule that cannot
  evaluate did not pass — the conservative reading).

Rules are Spark SQL boolean expressions (strings) or Columns, so the
whole surface stays declarative and Catalyst-optimizable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_expectations", "quarantine"]


def _as_col(rule) -> Column:
    return F.expr(rule) if isinstance(rule, str) else rule


def _passed(rule) -> Column:
    # NULL → failed (conservative): coalesce the tri-state to false
    return F.coalesce(_as_col(rule), F.lit(False))


def check_expectations(df: DataFrame, rules: dict) -> DataFrame:
    """Per-rule stats: (rule, n_rows, n_pass, n_fail, pass_rate) — one
    scan, one aggregate row, regardless of rule count."""
    if not rules:
        raise ValueError("rules must be non-empty")
    # positional aliases: rule names are user strings and may contain
    # dots/spaces/backticks that F.col would parse as struct paths; the
    # display name only ever appears as a literal in the output struct
    names = list(rules)
    aggs = [
        F.sum(_passed(rules[name]).cast("long")).alias(f"__p_{i}")
        for i, name in enumerate(names)
    ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_rows"),
                F.col(f"__p_{i}").alias("n_pass"),
                (F.col("__n") - F.col(f"__p_{i}")).alias("n_fail"),
                F.round(F.col(f"__p_{i}") / F.col("__n"), 4).alias(
                    "pass_rate"
                ),
            )
            for i, name in enumerate(names)
        ]
    )
    return (
        row.select(F.explode(per_rule).alias("r"))
        .select("r.rule", "r.n_rows", "r.n_pass", "r.n_fail", "r.pass_rate")
    )


def quarantine(
    df: DataFrame, rules: dict, failed_col: str = "_failed"
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): good rows pass every rule; bad rows carry the array
    of violated rule names. One shared lineage — callers persist or
    write `bad` first if they need both sides materialized once."""
    if not rules:
        raise ValueError("rules must be non-empty")
    failed = F.filter(
        F.array(
            *[
                F.when(~_passed(rules[name]), F.lit(name))
                for name in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn(failed_col, failed)
    good = tagged.filter(F.size(failed_col) == 0).drop(failed_col)
    bad = tagged.filter(F.size(failed_col) > 0)
    return good, bad
