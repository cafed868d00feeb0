"""Full reference-pipeline integration: DAG 1 (ZIP ingest) feeding DAG 2
(load → DQ → join → publish), end to end through the engine's public surface."""

from __future__ import annotations

import os
import zipfile

from airflow_cms_inpatient_etl_spark.plans.orchestration import patient_claims_pipeline
from airflow_cms_inpatient_etl_spark.sources.http_zip import ingest_zip_url
from tests.test_cms_parity import BENEFICIARY_CSV, CLAIMS_CSV


def test_zip_ingest_to_published_table(spark, tmp_path):
    # DAG 1: a CMS-shaped ZIP arrives over the (file://) wire
    zip_path = tmp_path / "cms_drop.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("inpatient_claims.csv", CLAIMS_CSV)
        zf.writestr("beneficiary.csv", BENEFICIARY_CSV)
    staging = str(tmp_path / "csv_data")
    staged = ingest_zip_url(f"file://{zip_path}", staging)
    assert sorted(os.path.basename(p) for p in staged) == [
        "beneficiary.csv",
        "inpatient_claims.csv",
    ]

    # DAG 2: load → DQ → join/decode → publish → DQ
    out = str(tmp_path / "patient_claims_plus")
    pipeline = patient_claims_pipeline(
        spark,
        os.path.join(staging, "inpatient_claims.csv"),
        os.path.join(staging, "beneficiary.csv"),
        out,
    )
    results = pipeline.run(sleep=lambda s: None)
    assert results["dq_final"] == 4

    published = spark.read.parquet(out)
    assert published.count() == 4 and len(published.columns) == 20
    sexes = {r["claim_id"]: r["patient_sex"] for r in published.collect()}
    assert sexes == {"C1": "Male", "C2": "Male", "C3": "Female", "C4": "Unknown"}

    # idempotent re-run of the whole chain (reference drop-if-exists semantics)
    staged2 = ingest_zip_url(f"file://{zip_path}", staging)
    assert len(staged2) == 2
    pipeline2 = patient_claims_pipeline(
        spark,
        os.path.join(staging, "inpatient_claims.csv"),
        os.path.join(staging, "beneficiary.csv"),
        out,
    )
    pipeline2.run(sleep=lambda s: None)
    assert spark.read.parquet(out).count() == 4
