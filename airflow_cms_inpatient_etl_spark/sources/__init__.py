"""Sources: file readers, HTTP+ZIP ingest, table registry, JDBC."""

from airflow_cms_inpatient_etl_spark.sources.registry import TESTDATA_TABLES, load_table, register_views

__all__ = ["TESTDATA_TABLES", "load_table", "register_views"]
