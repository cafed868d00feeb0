"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference A15-A18 shape) on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import robust to the
# driver loading this module by path from a different working directory
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from airflow_cms_inpatient_etl_spark.plans.patient_claims import flagship_testdata  # noqa: E402
from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_testdata(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query (DuckDB dialect); omitted entries get a
    rows-only check (engine-specific sketches like approx_count_distinct)."""
    return {name: spec.oracle for name, spec in QUERY_REGISTRY.items() if spec.oracle}
