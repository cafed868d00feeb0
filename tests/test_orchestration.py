"""Pipeline-runner tests: topological order, retries, failure propagation,
and the end-to-end patient_claims pipeline (reference DAG 2 shape)."""

from __future__ import annotations

import pytest

from airflow_cms_inpatient_etl_spark.plans.orchestration import (
    Pipeline,
    PipelineError,
    patient_claims_pipeline,
)
from tests.test_cms_parity import BENEFICIARY_CSV, CLAIMS_CSV


def test_topological_order_and_results():
    log = []
    p = (
        Pipeline()
        .add("a", lambda: log.append("a") or 1)
        .add("b", lambda: log.append("b") or 2, upstream=["a"])
        .add("c", lambda: log.append("c") or 3, upstream=["a"])
        .add("d", lambda: log.append("d") or 4, upstream=["b", "c"])
    )
    results = p.run(sleep=lambda s: None)
    assert results == {"a": 1, "b": 2, "c": 3, "d": 4}
    assert log[0] == "a" and log[-1] == "d"


def test_unknown_upstream_and_cycle_rejected():
    with pytest.raises(ValueError, match="unknown task"):
        Pipeline().add("x", lambda: 1, upstream=["nope"])


def test_retries_then_success():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return "ok"

    slept = []
    p = Pipeline().add("flaky", flaky, retries=1, retry_delay_s=120)
    assert p.run(sleep=slept.append)["flaky"] == "ok"
    assert slept == [120]  # reference retry_delay=2min (:18)


def test_failure_after_retries_raises():
    def always_fails():
        raise RuntimeError("boom")

    p = Pipeline().add("bad", always_fails, retries=1)
    with pytest.raises(PipelineError, match="after 2 attempts"):
        p.run(sleep=lambda s: None)


def test_patient_claims_pipeline_end_to_end(spark, tmp_path):
    claims_csv = tmp_path / "claims.csv"
    bene_csv = tmp_path / "beneficiary.csv"
    claims_csv.write_text(CLAIMS_CSV)
    bene_csv.write_text(BENEFICIARY_CSV)
    out = str(tmp_path / "patient_claims_plus")
    p = patient_claims_pipeline(spark, str(claims_csv), str(bene_csv), out)
    results = p.run(sleep=lambda s: None)
    assert results["dq_claims"] == 4
    assert results["dq_final"] == 4  # all claims survive the LEFT join
    assert spark.read.parquet(out).count() == 4


def test_airflow_dag_builder_gated():
    from airflow_cms_inpatient_etl_spark.plans.orchestration import build_airflow_dag

    with pytest.raises(ImportError, match="not installed"):
        build_airflow_dag("x", Pipeline().add("a", lambda: 1))
