"""Tier-A parity queries — the reference's own operator surface (SURVEY §2.A).

The reference's only real relational query is the flagship projection/rename +
CASE decode + LEFT broadcast join + materialize
(``/root/reference/dags/patient_claims_plus_postgres.py:160-190``); the rest of
its surface is scalar COUNT(*) DQ checks (``:128,:153,:197``), typed projection
with cast-at-load (``:46-51,:84``), and idempotent CTAS.  Each is expressed here
over the driver testdata so the oracle harness can grade it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.plans.patient_claims import (
    FLAGSHIP_ORACLE_SQL,
    flagship_testdata,
)
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table

register(
    "flagship_patient_claims_plus",
    oracle=FLAGSHIP_ORACLE_SQL,
    doc="A15-A18: projection/rename + CASE decode + LEFT broadcast equi-join "
    "(orders⋈customer analog of claims⋈beneficiary, reference :160-190).",
)(flagship_testdata)


@register(
    "dq_rowcount_flag",
    oracle="""
    SELECT CASE WHEN COUNT(*) > 0 THEN 1 ELSE 0 END AS ok, COUNT(*) AS n
    FROM lineitem
    """,
)
def dq_rowcount_flag(spark, sf_dir):
    """A12-A14: scalar COUNT(*) + CASE WHEN flag (reference :128,:153,:197)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.when(F.count(F.lit(1)) > 0, 1).otherwise(0).alias("ok"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "projection_typed_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS claim_payment_amount,
           o_orderstatus AS claim_status
    FROM orders
    """,
)
def projection_typed_cast(spark, sf_dir):
    """A7+A9: column projection with rename and text→NUMERIC-style typed cast
    (reference keep_cols :115-120 and DDL cast targets :84)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("claim_payment_amount"),
        F.col("o_orderstatus").alias("claim_status"),
    )


@register(
    "null_default_decode",
    oracle="""
    SELECT e.event_id,
           COALESCE(e.props, '') AS props_filled,
           CASE WHEN e.value IS NULL THEN 0.0 ELSE e.value END AS value_filled
    FROM events e
    """,
)
def null_default_decode(spark, sf_dir):
    """A8: missing-value defaulting (empty-cell→NULL→default) as an expression."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.coalesce(F.col("props"), F.lit("")).alias("props_filled"),
        F.when(F.col("value").isNull(), 0.0).otherwise(F.col("value")).alias("value_filled"),
    )


@register(
    "dq_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS class_size,
           COUNT(*) < 8 AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity release gate (plans/dq.py:k_anonymity_profile) over the
    customer table with (nation, market segment) as the quasi-identifier set:
    every equivalence class's size plus an at-risk flag for classes under
    k=8 — the check a privacy-aware data release runs after PII scrubbing
    (rare attribute combinations re-identify even scrubbed rows).  k=8 is
    chosen so the flag is non-trivially exercised at the sf0.01 gate scale
    (smallest class there is 5)."""
    from airflow_cms_inpatient_etl_spark.plans.dq import k_anonymity_profile

    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment")
    return k_anonymity_profile(c, ["c_nationkey", "c_mktsegment"], k=8)
