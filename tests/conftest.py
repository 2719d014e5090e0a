"""Shared pytest fixtures: one tuned SparkSession + a DuckDB oracle connection
with the star-schema views registered (mirrors the driver's harness)."""

from __future__ import annotations

import os

import duckdb
import pytest

from flink_1_6_0_spark.catalog import TABLES
from flink_1_6_0_spark.session import get_spark

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="flink-1.6.0-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()
