"""Physical-plan assertions for the late-round-3 curation operators: the
scale properties their docstrings promise must be visible in the plans."""

from __future__ import annotations

from tests.test_plans import SF, _formatted_plan


def test_pii_scrub_is_map_only(spark):
    """The scrub chain must be a single codegen'd projection over the scan —
    zero shuffles, zero Python: at 100 TB this is the difference between a
    pass-through map stage and a job."""
    plan = _formatted_plan(spark, "text_pii_scrub")
    assert "Exchange" not in plan  # no shuffle of any kind
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan  # the projection runs inside whole-stage codegen


def test_repetition_metrics_partial_aggregation(spark):
    """Both (doc_id, term) counts must partial-aggregate map-side before the
    shuffle (a token explode without map-side combine ships one row per token
    occurrence — corpus-sized shuffles)."""
    plan = _formatted_plan(spark, "text_repetition_metrics")
    assert "partial_count" in plan  # HashAggregate(partial) before Exchange


def test_incremental_index_is_equi_join(spark):
    """The delta-vs-corpus-index join must be an equi-join on the int64
    shingle hash — never a nested-loop/cartesian (the all-pairs trap)."""
    plan = _formatted_plan(spark, "dedup_incremental_index")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "[h]" in plan or "h#" in plan  # join keys on the hash column


def test_source_cap_two_phase_window_shuffles(spark):
    """The quota query is one hash projection + the skew-safe two-phase
    top-K (round 9): exactly two exchanges — phase 1 hash-partitioned on
    (source, __shard) so no single task ever sorts a whole hot domain, and
    phase 2 on source over the ≤ shards·K survivors."""
    import re

    plan = _formatted_plan(spark, "docs_source_cap")
    # formatted mode renders each node once as "(N) Exchange" with its
    # arguments on the next line — count node headers, not substrings
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert shuffles == 2, f"expected the 2 two-phase window shuffles, saw {shuffles}"
    assert "hashpartitioning(source" in plan
    assert "__shard" in plan, "phase-1 exchange lost its salt key"
