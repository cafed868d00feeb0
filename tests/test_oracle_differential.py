"""The main correctness gate, run locally exactly the way the driver does:
every registered query with an oracle is executed on Spark AND DuckDB at
sf0.01 and compared (row count + schema + order-insensitive exact values)."""

from __future__ import annotations

import pytest

from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
from tests.conftest import run_differential

# the full sweep is the CI/round gate; the inner loop (-m "not slow") relies
# on the targeted per-family tests instead and stays under ~5 min
pytestmark = pytest.mark.slow

_WITH_ORACLE = sorted(name for name, spec in QUERY_REGISTRY.items() if spec.oracle)
_ROWS_ONLY = sorted(name for name, spec in QUERY_REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, name):
    spec = QUERY_REGISTRY[name]
    run_differential(spark, ddb, name, spec.fn, spec.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = QUERY_REGISTRY[name]
    df = spec.fn(spark, "/root/testdata/sf0.01")
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
