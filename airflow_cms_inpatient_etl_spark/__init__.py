"""airflow_cms_inpatient_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``HashikaVenkat/airflow-cms-inpatient-etl``
(an Airflow DAG pair that delegates every relational operation to PostgreSQL 13),
extended with the LLM-data-pipeline operator families (dedup, similarity search,
multimodal columns, text analysis) that a 100 TB training-data pipeline needs.

Design tenets
-------------
* DataFrame / Spark SQL first — declare logical plans, let Catalyst pick the
  physical strategy (broadcast vs sort-merge, partial aggregation, AQE).
* No driver-side materialization of data (the reference buffers whole CSVs in
  driver memory; see ``/root/reference/dags/patient_claims_plus_postgres.py:46-53``) —
  every operator here is expressed as a distributed plan.
* UDFs are the slow path: built-in ``pyspark.sql.functions`` everywhere; Arrow
  Pandas UDFs / ``mapInPandas`` only where built-ins cannot express semantics
  (multimodal decode stubs).
* Every operator is designed for a 1000-executor cluster: broadcast the small
  side, pre-aggregate before shuffles, keep filters/pruning pushed to the scan.
"""

__version__ = "0.1.0"
