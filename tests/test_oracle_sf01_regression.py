"""sf0.1 oracle regression for the numeric-hazard query class.

Four cross-engine determinism hazards (cast digit limits, non-unique sort
keys, DuckDB decimal truncation, decimal→double ulp drift) only manifested at
10× the driver's sf0.01 gate.  This module re-checks the queries that
aggregate full-precision doubles at sf0.1 so those hazard classes stay fixed.

Set SPARK_GRAFT_SWEEP_ALL=1 to sweep every oracle query at sf0.1 (slower).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
from airflow_cms_inpatient_etl_spark.sources.registry import TESTDATA_TABLES
from tests.conftest import run_differential

# sf0.1 inputs => minutes-scale; CI/round gate only, not the inner loop
pytestmark = pytest.mark.slow

SF_BENCH = "/root/testdata/sf0.1"

_HAZARD_CLASS = [
    "q1_pricing_summary",
    "join_multiway_revenue",
    "group_agg_orders",
    "filter_scalar_subquery",
    "window_running_sum",
    "window_sliding_frame_avg",
    "window_range_frame_1h",
    "agg_exact_moments",
    "agg_exact_correlation",
    "events_tumbling_window",
    "count_distinct_segments",
    "conditional_aggregation",
    # round-5 float-bearing additions: LOG2 ulp (entropy), percentile
    # interpolation (winsorize, also inside curation v3), ordered-fold
    # cosines (semdedup, incremental IVF), integer-ratio doubles
    # (containment) — each cleared sf0.1 on landing; this pins them
    "text_entropy_quality",
    "winsorize_quality_clip",
    "corpus_curation_v3",
    "semdedup_prune",
    "sim_incremental_ivf",
    "dedup_containment",
    # round-6 float-bearing additions: LOG2 ulp inside an ordered log-prob
    # fold (LM perplexity) + percentile interpolation over rounded doubles
    # (curation v4 terciles)
    "quality_lm_perplexity",
    "corpus_curation_v4",
    # round-6 wave 5: LN ulp inside term-ordered folds (BM25), LOG2 ulp +
    # double Gumbel transform (DSIR), exact-percentile double medians (MAD)
    "text_bm25_search",
    "quality_dsir_importance",
    "events_anomaly_mad",
    # decimal-exact sums grouped under a temporal join
    "cdc_scd2_point_in_time",
    # fractional-index interpolation over global order statistics
    "quality_quantile_normalize",
    # decimal window prefix sums (double sums would be segment-tree-ordered)
    "events_cusum_drift",
    # round-6 waves 12-16: the full-sweep at sf0.1 caught assortativity's
    # zero-variance /0 (complete graph at sf0.1 — ANSI raise vs DuckDB NULL);
    # these pin that guard plus the other float-emitting additions
    "graph_degree_assortativity",
    "events_time_weighted_avg",
    "events_autocorrelation",
    "events_ab_test_zscore",
    "contribution_pct_of_total",
    "corpus_mixture_plan",
    "graph_modularity",
    "basket_association_rules",
    # round-7: wide decimal sums rescaled before the double cast (promo ratio,
    # disjunctive revenue) and the events Markov double ratio's new sibling —
    # all cleared sf0.1 on landing; this pins them
    "q14_promo_revenue_by_month",
    "q19_disjunctive_predicates",
    # round-10: double RRF sums over BM25 (LN-ulp, ROUND(...,6) contract) +
    # ordered-fold cosine legs, with CAST(1.0 AS DOUBLE) reciprocal terms —
    # cleared sf0.1 (and both smaller scales) on landing; this pins it
    "search_hybrid_rrf",
    # round-13 float-bearing additions: KMV estimates (255*2^60/h_k double
    # division), retrieval-metric integer ratios, and the ALS closed-form
    # division — all cleared sf0.1 on landing; this pins them
    "sketch_theta_set_ops",
    "ml_ranking_metrics",
    "recsys_als_step",
    # round-13 wave 2 float-bearers: ordered-fold cosines in both rerank
    # stages + the recall ratio; the double-squared chi-square terms
    "sim_two_stage_rerank",
    "dq_chisquare_drift",
    # round-13 wave 3 float-bearers: the KS statistic + threshold (sqrt),
    # the agreement-rate ratio
    "dq_ks_drift",
    "labels_annotator_agreement",
    # the middle-credit double division (0.2/(n-2))
    "events_attribution_multitouch",
]

_NAMES = (
    sorted(n for n, s in QUERY_REGISTRY.items() if s.oracle)
    if os.environ.get("SPARK_GRAFT_SWEEP_ALL")
    else _HAZARD_CLASS
)


@pytest.fixture(scope="module")
def ddb_sf01():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_BENCH}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_match_at_sf01(spark, ddb_sf01, name):
    spec = QUERY_REGISTRY[name]
    run_differential(spark, ddb_sf01, f"{name}@sf0.1", spec.fn, spec.oracle, sf_dir=SF_BENCH)
