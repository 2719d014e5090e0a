"""Oracle correctness gate, run locally: every registered query with an oracle
is executed on Spark and DuckDB over the same parquet and compared
order-insensitively — the same check the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from flink_1_6_0_spark.registry import load_all, resolve_oracle
from tests.helpers import assert_frames_match, driver_canon

_SPECS = load_all()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = _SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # weaker rows-only check, mirroring the driver — but still require the
        # output to survive the driver's raw pandas canonicalization
        pdf = df.toPandas()
        driver_canon(pdf)
        assert len(pdf) >= 0
        return
    assert_frames_match(df, duck.sql(resolve_oracle(spec, sf_dir)), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
