"""Round-9 additions: curation-v7 exchange-payload contract, plus fixtures
for the round's new operators (cross-document exact-substring dedup,
image-text alignment)."""

from __future__ import annotations

from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
from tests.conftest import SF_SMOKE


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _plan_blocks(plan: str) -> list[str]:
    """Split a formatted explain into per-node detail blocks."""
    return plan.split("\n\n")


def test_curation_v7_dedup_exchange_carries_no_payload(spark):
    """The v6 exchange contract: document payload never rides a shuffle.
    v7's exact-dedup window must partition on a MATERIALIZED md5 key —
    the exchange feeding the row_number window carries (doc_id, dedup_key,
    ntok) only, never the cleaned text.  (The doc-rebuild aggregate
    upstream necessarily moves line payloads once, doc-keyed; that is the
    documented corpus-linear floor, not this contract.)"""
    df = QUERY_REGISTRY["corpus_curation_v7"].fn(spark, SF_SMOKE)
    plan = _formatted(df)
    dedup_blocks = [
        b
        for b in _plan_blocks(plan)
        if b.strip() and "Exchange" in b.strip().splitlines()[0]
        and "hashpartitioning(dedup_key" in b
    ]
    assert dedup_blocks, "expected an exchange hash-partitioned on dedup_key"
    for b in dedup_blocks:
        assert "dedup_text" not in b, f"payload rides the dedup exchange:\n{b}"
