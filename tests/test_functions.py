"""UDF surface tests: scalar pandas UDF, grouped-agg pandas UDAF, Python
UDTF — each checked against an equivalent built-in formulation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from swivel_spark_prep_spark.catalog import load_table
from swivel_spark_prep_spark.functions import (
    NGrams,
    geometric_mean,
    log1p_scaled,
    register_all,
)


def test_scalar_pandas_udf_matches_builtin(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    got = ev.select(
        "event_id",
        F.round(log1p_scaled("value"), 6).alias("u"),
        F.round(
            F.signum("value") * F.log1p(F.abs("value")), 6
        ).alias("b"),
    )
    assert got.filter(F.col("u") != F.col("b")).count() == 0


def test_grouped_agg_udaf_geometric_mean(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # group-agg pandas UDFs cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — run the two formulations separately
    got = {
        r.l_returnflag: r.gm
        for r in li.groupBy("l_returnflag")
        .agg(geometric_mean("l_quantity").alias("gm"))
        .collect()
    }
    want = {
        r.l_returnflag: r.builtin
        for r in li.groupBy("l_returnflag")
        .agg(F.exp(F.avg(F.log("l_quantity"))).alias("builtin"))
        .collect()
    }
    assert got and set(got) == set(want)
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k


def test_udtf_ngrams_matches_shingle_explode(spark, sf_dir):
    register_all(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("t_docs_udtf")
    got = spark.sql(
        """SELECT doc_id, g.ngram, g.pos
           FROM t_docs_udtf, LATERAL ngrams(text, 3) g"""
    )
    toks = F.split("text", " ")
    want = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
                lambda _, i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            )
        ).alias("pos", "ngram"),
    ).select("doc_id", "ngram", "pos")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0
