"""Named query registry — the engine's graded surface.

Every operator family from SURVEY.md §2 is exercised by at least one named
query here.  Each entry pairs a DataFrame-API implementation (the engine
surface) with an equivalent ANSI-SQL oracle string that DuckDB runs on the
same parquet tables; the driver hash-compares the two at sf0.01.

Import side effect: importing this package registers all queries.
"""

from airflow_cms_inpatient_etl_spark.queries.base import QUERY_REGISTRY, QuerySpec, register

# registration side effects
from airflow_cms_inpatient_etl_spark.queries import (  # noqa: E402,F401
    parity,
    relational,
    relational2,
    scalarfuncs,
    windows,
    timeseries,
    textops,
    dedup,
    similarity,
    multimodal,
    streaming_live,
)

__all__ = ["QUERY_REGISTRY", "QuerySpec", "register"]
