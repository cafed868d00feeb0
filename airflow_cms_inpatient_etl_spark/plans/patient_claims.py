"""The flagship query: ``patient_claims_plus`` (reference A15-A18) — twice.

1. ``build_patient_claims_plus``: the true CMS-shaped pipeline over claims ⋈
   beneficiary, mirroring ``/root/reference/dags/patient_claims_plus_postgres.py:160-190``
   column-for-column (20 output columns, one row per claim, LEFT join, sex code
   decoded with NULL→'Unknown').  Exercised by the CSV-fixture tests.
2. ``flagship_testdata``: the same operator shape over the driver testdata
   (orders ⋈ customer stands in for claims ⋈ beneficiary) so the driver's
   smoke/oracle harness can grade it.

Scale notes: the dimension side (beneficiary / customer) is the small side —
broadcast it so the fact side never shuffles.  At 100 TB the fact scan is
pruned to the projected columns by Catalyst and the join is map-side; the
materialization writes partitioned parquet through the distributed commit
protocol (no driver buffering, unlike the reference's StringIO load at
``:46-53``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.sources.registry import load_table


def decode_sex(col: F.Column) -> F.Column:
    """Reference CASE decode (:182-186): 1→Male, 2→Female, else/NULL→Unknown."""
    return (
        F.when(col == 1, "Male").when(col == 2, "Female").otherwise("Unknown")
    )


def build_patient_claims_plus(claims: DataFrame, beneficiary: DataFrame) -> DataFrame:
    """claims ⋈ beneficiary → the 20-column analytics table (reference :161-189)."""
    c = claims.select(
        F.col("desynpuf_id").alias("patient_id"),
        F.col("clm_from_dt").alias("claim_from_date"),
        F.col("clm_thru_dt").alias("claim_thru_date"),
        F.col("clm_id").alias("claim_id"),
        F.col("prvdr_num").alias("provider_number"),
        F.col("clm_pmt_amt").alias("claim_payment_amount"),
        *[F.col(f"icd9_dgns_cd_{i}").alias(f"icd_diagnosis_code_{i}") for i in range(1, 10)],
    )
    b = beneficiary.select(
        F.col("desynpuf_id").alias("patient_id"),
        F.col("bene_hi_cvrage_tot_mons").alias("patient_hospital_insurance_total_months"),
        F.col("bene_smi_cvrage_tot_mons").alias(
            "patient_supplementary_medical_insurance_total_months"
        ),
        F.col("bene_birth_dt").alias("patient_birth_date"),
        F.col("bene_death_dt").alias("patient_death_date"),
        F.col("bene_sex_ident_cd").alias("sex_code"),
    )
    return (
        c.join(F.broadcast(b), on="patient_id", how="left")
        .withColumn("patient_sex", decode_sex(F.col("sex_code")))
        .drop("sex_code")
    )


def flagship_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship operator shape on driver testdata: fact LEFT JOIN broadcast
    dim + renames + CASE decode with NULL→'Unknown' (orders⋈customer as the
    claims⋈beneficiary analog)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    dim = customer.select(
        F.col("c_custkey"),
        F.col("c_name").alias("patient_name"),
        F.col("c_acctbal").alias("patient_acctbal"),
        F.col("c_mktsegment"),
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left")
        .select(
            F.col("o_orderkey").alias("claim_id"),
            F.col("o_orderdate").alias("claim_date"),
            F.col("o_totalprice").alias("claim_payment_amount"),
            F.col("o_orderpriority").alias("claim_priority"),
            F.col("patient_name"),
            F.col("patient_acctbal"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", "Automobile")
            .when(F.col("c_mktsegment") == "BUILDING", "Building")
            .otherwise("Unknown")
            .alias("patient_segment"),
        )
    )


FLAGSHIP_ORACLE_SQL = """
SELECT o.o_orderkey AS claim_id,
       o.o_orderdate AS claim_date,
       o.o_totalprice AS claim_payment_amount,
       o.o_orderpriority AS claim_priority,
       c.c_name AS patient_name,
       c.c_acctbal AS patient_acctbal,
       CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 'Automobile'
            WHEN c.c_mktsegment = 'BUILDING' THEN 'Building'
            ELSE 'Unknown' END AS patient_segment
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""
