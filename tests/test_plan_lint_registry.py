"""Repo-wide physical-plan lint: EVERY registered query's plan is swept for
the two scale killers — non-broadcast cartesian products and Python
evaluation stages — so a regression anywhere in the registry (every entry is
swept; the failure message reports the live count) fails CI by name, not by
a slow bench three rounds later.

Allowed Python stages are exactly the documented Arrow-batched multimodal
decode paths (the image/audio libs are stubbed, but the mapInPandas plumbing
is the real contract).  Row-at-a-time BatchEvalPython is allowed NOWHERE.

Two gates: the full registry sweep is ``slow`` (round-gate only); the
NOT-slow variant lints just the queries added or materially changed since
the last green round gate (``_NEW_SINCE_GATE``), so a cartesian or
Python-eval regression in fresh code surfaces in the inner loop, not three
days later at the gate.  Rotate ``_NEW_SINCE_GATE`` each round: after the
gate goes green, replace its contents with the next round's additions.
"""

from __future__ import annotations

import pytest

from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
from tests.conftest import SF_SMOKE

# live-streaming queries execute real micro-batch jobs at construction time;
# their plan shapes are asserted by tests/test_streaming.py instead
_SKIP = {
    "streaming_tumbling_live",
    "streaming_late_data_live",
    "streaming_stream_stream_join_live",
    "streaming_stateful_profile_live",
    "streaming_dedup_gate_live",
    "streaming_heavy_hitters_live",
    "streaming_percentiles_live",
    "streaming_asof_live",
}

# the ONLY queries allowed to cross into Python, all Arrow-batched
_ARROW_WHITELIST = {
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "dq_group_checksum_udaf",
    "text_wordcount_udtf",
}

_ARROW_NODES = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapCoGroupsInPandas",
    "ArrowAggregatePython",
)

# queries added or plan-changed since the round-14 gate went green — linted
# in the NOT-slow inner loop.
_NEW_SINCE_GATE = [
    # r15: code-changed — true equal-price dominance + sharded prefix-min
    # (the round-14 weak finding's fix; no fact-sized single-partition window)
    "orders_pareto_skyline",
    # r15: new — cell-bucketed block-nested-loop dominance join in 3-D
    "orders_pareto_skyline_3d",
    # r15: new — ER composition: banded blocking / scoring / components /
    # survivorship
    "er_blocking_pairs",
    "er_resolve_customers",
    # r15: new — planted-hotspot proximity joins through the two remedies
    "geo_hotspot_salted_join",
    "geo_quadtree_refined_join",
    # (streaming_asof_live is new too, but live streams are plan-asserted in
    # tests/test_streaming.py / test_round15.py — see _SKIP)
]


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _lint(spark, names):
    # Building snapshot-using queries pins localCheckpoint blocks (under AQE
    # the subtree's shuffle stages run at construction); release them and any
    # plan-keyed cache entries afterward so the lint is storage-neutral for
    # the rest of the pytest session.
    from airflow_cms_inpatient_etl_spark.sources.registry import release_snapshots

    violations = []
    try:
        for name in names:
            if name in _SKIP:
                continue
            plan = _formatted(QUERY_REGISTRY[name].fn(spark, SF_SMOKE))
            if "CartesianProduct" in plan:
                violations.append(f"{name}: CartesianProduct")
            if "BatchEvalPython" in plan:
                violations.append(f"{name}: row-at-a-time Python UDF")
            arrow = [n for n in _ARROW_NODES if n in plan]
            if arrow and name not in _ARROW_WHITELIST:
                violations.append(f"{name}: unexpected Python stage {arrow}")
            if name in _ARROW_WHITELIST and not arrow:
                violations.append(f"{name}: whitelist entry no longer uses Arrow — prune it")
    finally:
        release_snapshots(spark)
        spark.catalog.clearCache()
    return violations


def test_new_queries_plan_lint(spark):
    """Inner-loop lint of queries added/changed since the last green gate."""
    stale = [n for n in _NEW_SINCE_GATE if n not in QUERY_REGISTRY]
    assert not stale, f"_NEW_SINCE_GATE names not in registry: {stale}"
    assert len(set(_NEW_SINCE_GATE)) == len(_NEW_SINCE_GATE), (
        "_NEW_SINCE_GATE has duplicates — each entry is linted once; "
        "a repeat is a stale rotation artifact"
    )
    violations = _lint(spark, _NEW_SINCE_GATE)
    assert not violations, (
        f"plan lint over {len(_NEW_SINCE_GATE)} since-gate queries:\n"
        + "\n".join(violations)
    )


@pytest.mark.slow
def test_no_cartesian_and_no_python_outside_whitelist(spark):
    violations = _lint(spark, list(QUERY_REGISTRY))
    assert not violations, (
        f"plan lint over {len(QUERY_REGISTRY)} registered queries "
        f"({len(_SKIP)} live-streaming skips):\n" + "\n".join(violations)
    )
