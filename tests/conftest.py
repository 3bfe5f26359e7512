from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from swivel_spark_prep_spark.session import get_session

    spark = get_session(
        "swivel-spark-prep-tests",
        master="local[8]",
        conf={"spark.sql.shuffle.partitions": "8", "spark.driver.memory": "8g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck(sf_dir):
    from swivel_spark_prep_spark.oracle import duckdb_connection

    con = duckdb_connection(sf_dir)
    yield con
    con.close()
