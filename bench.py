#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced through the noop sink (full plan runs distributed; no
driver-side result transfer skews the timing).  The headline set spans every
operator family: parity flagship, TPC-H-style aggregation + multiway join,
windows, event-time ops, dedup (exact + MinHash LSH), similarity (brute +
ANN), text analysis, multimodal decode.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
from airflow_cms_inpatient_etl_spark.session import get_spark
from airflow_cms_inpatient_etl_spark.sources.registry import release_snapshots

HEADLINE = [
    "flagship_patient_claims_plus",
    "q1_pricing_summary",
    "join_multiway_revenue",
    "filter_complex_predicates",
    "topk_orders_by_price",
    "window_rank_topk_per_group",
    "window_running_sum",
    "events_tumbling_window",
    "events_session_window",
    "events_asof_last_click",
    "dedup_exact_text",
    "dedup_minhash_lsh",
    "sim_cosine_topk_brute",
    "sim_ann_lsh_topk",
    "text_quality_scores",
    "text_tfidf_top_terms",
    "sim_ann_ivf_topk",
    "lateral_correlated_agg",
    "multimodal_decode_stub",
    "decontaminate_ngram_overlap",
    "corpus_curation_pipeline",
    # round-3 additions: the big-big non-equi interval join and the
    # repetition-metrics double-explode are the heaviest new plans
    "events_interval_attribution",
    "text_repetition_metrics",
    # round-4 (verdict #6): remaining heavy round-3 additions measured
    # per-round from here on
    "corpus_curation_v2",
    "sim_pq_adc_topk",
    "dedup_incremental_index",
    # round-5 additions: every new operator family measured from day one —
    # the heavy ones are the SemDeDup pair join, the 6-round integer
    # PageRank (iteration overhead dominates at bench scale), and the
    # overlap chunker's output expansion
    "doc_chunk_overlap",
    "weighted_corpus_sample",
    "dedup_source_precedence",
    "text_entropy_quality",
    "heavy_hitters_cms",
    "graph_pagerank",
    "semdedup_prune",
    "winsorize_quality_clip",
    "epoch_shuffle_order",
    "dedup_containment",
    "bloom_semijoin_lineitem",
    "graph_triangle_count",
    "corpus_curation_v3",
    "graph_personalized_pagerank",
    "sim_incremental_ivf",
    # round-6 additions: the bigram-LM scoring pass (explode + broadcast
    # model joins + ordered fold) and its tercile-bucketing composition
    "quality_lm_perplexity",
    "corpus_curation_v4",
    "dedup_repeated_spans",
    # round-6 wave 2: SQ8 compressed-scan ANN, k-core peel (6 snapshot
    # rounds — same fixed-overhead band as pagerank at bench scale), the
    # 8-tap EWMA window pass, and the zero-shuffle linear quality filter
    "sim_sq8_topk",
    "graph_kcore",
    "events_ewma_kernel",
    "quality_linear_score",
    # round-6 wave 3: column-pruned union-branch profiler and the
    # exact-boundary range sharder (histogram cumsum + broadcast assign)
    "profile_table_stats",
    "corpus_range_shards",
    "corpus_curation_v5",
    # round-6 wave 4: the q18 aggregate-then-join shape and the
    # dominant-key skew profiler (two-level decimal aggregation)
    "q18_large_orders",
    "skew_dominant_supplier_orders",
    # round-6 wave 5: inverted-index BM25 ranking, the DSIR double-model
    # scoring pass, and the two-median MAD robust outlier flags
    "text_bm25_search",
    "quality_dsir_importance",
    "events_anomaly_mad",
    "cdc_scd2_point_in_time",
    "global_rank_via_sharding",
    "dedup_simhash_hamming",
    "cdc_apply_change_feed",
    "hierarchy_rollup_subtree",
    "quality_quantile_normalize",
    "events_cusum_drift",
    # round-6 wave 12: behavioral analytics / DQ / mining — heaviest are the
    # sliding distinct-user expansion (12x distinct pairs into one distinct
    # agg), the 8-edge referential audit (two lineitem-sized key joins), and
    # the user-timeline window pair (LOCF integral + gaps-and-islands)
    "window_sliding_distinct_users",
    "events_time_weighted_avg",
    "events_gaps_islands",
    "events_cohort_retention",
    "events_markov_transitions",
    "events_ab_test_zscore",
    "dq_referential_integrity",
    "dq_benford_first_digit",
    "contribution_pct_of_total",
    "customer_rfm_segments",
    "sim_hard_negatives",
    "graph_jaccard_neighbors",
    # round-6 wave 13: order-keyed pair self-join (apriori-pruned), the
    # daily-series ordered-fold ACF, and the one-shuffle DOW profile
    "basket_association_rules",
    "events_autocorrelation",
    "events_dow_seasonality",
    # round-6 wave 14: the map-side token-mass mixture plan and the live
    # session-window drain (state-store merge path, complete mode)
    "corpus_mixture_plan",
    "streaming_session_window_live",
    # round-6 wave 15: partition-quality + degree-correlation aggregates
    # over the distinct-edge list
    "graph_modularity",
    "graph_degree_assortativity",
    # round-6 wave 16: payload chunk explode into one hash-keyed aggregate,
    # and the in-row higher-order content-defined chunker
    "multimodal_cas_chunk_dedup",
    "multimodal_cdc_chunk_dedup",
    # round-6 wave 17: order-2 path mining + sessionized engagement KPI
    "events_path_trigrams",
    "events_bounce_rate_daily",
    # round-6 wave 18: PoP growth + bounded-expansion rolling actives +
    # the declarative Kaplan-Meier fold
    "orders_mom_growth",
    "events_rolling_active_users",
    "events_survival_time_to_convert",
    # round-6 wave 19: directed co-occurrence CF ranking + the BPE merge
    # frontier over the distinct-word table
    "recsys_item_item_cosine",
    "bpe_merge_candidates",
    # round-6 wave 20: the raw-SQL entry path (TPC-H Q3)
    "sql_q3_shipping_priority",
    # round-6 wave 21: grouped exact percentiles over a fact join, the
    # repurchase-gap window, and the zero-shuffle readability map
    "orders_leadtime_percentiles",
    "customer_repurchase_intervals",
    "text_readability_scores",
    # round-6 wave 22: single-pass multi-column drift audit + the live
    # sliding-window drain
    "snapshot_column_drift_profile",
    "streaming_sliding_window_live",
    # round-7: the zero-shuffle BPE encoder (56-replace tokenizer kernel
    # in-row) and its curation close (encode + dedup window + packing)
    "bpe_apply_encode",
    "corpus_curation_v6",
    # round-7 wave 2: the LSH->connected-components dedup close, the
    # vocabulary-bounded tokenizer fit report, the classic TPC-H plan
    # families, the strict-order windowed funnel, and the data card
    "dedup_cluster_canonical",
    "tokenizer_vocab_coverage",
    "q4_late_shipping_priority",
    "q14_promo_revenue_by_month",
    "q19_disjunctive_predicates",
    "events_funnel_steps",
    "corpus_datacard",
    # round-7 wave 3: bounded-frontier BFS layers and the label-centroid
    # confusion matrix (one corpus-sized aggregate, then label-sized math)
    "graph_bfs_khop",
    "embedding_label_confusion",
    # round-7 wave 4: hash-keyed full-outer recrawl accounting, and the
    # LSH pipeline grading itself against exact-Jaccard ground truth
    "corpus_delta_report",
    "dedup_lsh_recall_report",
    "orders_cohort_ltv",
    # round-7 wave 6: exact ABC classification via two-level sum sharding
    "customer_pareto_class",
    # round-7 wave 7: the UDAF/UDTF members of the Python-escape-hatch triad
    "dq_group_checksum_udaf",
    "text_wordcount_udtf",
    # round-7 wave 8: additive seasonal-trend decomposition (integer-cents
    # daily base, calendar-bounded windows)
    "events_stl_daily",
    "supplier_concentration_hhi",
    # round-8: the C4/FineWeb cross-document line dedup (content-defined
    # pseudo-line segmentation, df-capped drop-all, per-doc ordered rebuild)
    # and the average-hash image near-dup (banded Hamming join)
    "dedup_cross_doc_lines",
    "multimodal_phash_neardup",
    # round-8: CDC-delta -> freshness-weighted temperature mixture
    "corpus_mixture_refresh",
    # round-8 wave 2: TPC-H plan-family depth (Q5 local-supplier condition,
    # Q6 pure pushdown scan, Q7 dual-role dimension, Q10 decimal-keyed
    # top-20, Q13 outer-join histogram, Q15 decimal argmax, Q17
    # cross-multiplied correlated avg)
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    # round-8 wave 3: line-cleanse-first curation (the FineWeb ordering)
    # and the sharded sweep-line max-overlap
    "corpus_curation_v7",
    "events_peak_concurrency",
    # round-8 wave 4: prefix-filtering candidate generation (lossless by
    # construction — the oracle IS the exact ground truth) and the
    # cross-multiplied exact weighted median
    "dedup_prefix_jaccard",
    "weighted_median_price",
    # round-8 wave 5: the TPC-H close — correlated scalar-min (Q2), the
    # 8-relation market share (Q8), LIKE-filtered profit (Q9), the
    # global-scalar HAVING (Q11), dual CASE lateness counts (Q12), NOT-IN
    # distinct-supplier counts (Q16), the nested dominant-supplier semi
    # chain (Q20), shipped-last order statistics (Q21), idle customers (Q22)
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_brands",
    "q12_late_line_priority",
    "q16_supplier_part_count",
    "q20_dominant_supplier",
    "q21_waiting_supplier",
    "q22_idle_customers",
    # round-9 additions: ExactSubstr-family span dedup (per-token gram
    # hashing + islands + rebuild — same cost family as the line pass) and
    # the CLIP-shaped caption-containment alignment gate
    "dedup_cross_doc_spans",
    "multimodal_caption_align",
    # round-9 wave 2: per-doc marginal-novelty scoring (gram-first census —
    # the inverted-index cost family) and the eval-leakage embedding gate
    # (broadcast eval, map-side argmax)
    "corpus_ngram_novelty",
    "decontaminate_embedding_cosine",
    # round-9 wave 3: per-chunk language-consistency gate (map-side
    # classification + two keyed aggregations)
    "text_mixed_language_flag",
    # round-10: the full iterative BPE trainer (16 sequential census →
    # argmax → merge rounds over the snapshot vocab table; cost is
    # iteration overhead at bench scale, like the pagerank family)
    "bpe_train_vocab",
    # round-10 wave 2: hybrid retrieval — BM25 leg + broadcast-query cosine
    # leg fused by reciprocal rank (two constant-size lists joined)
    "search_hybrid_rrf",
    # round-10 wave 3: the tokenizer loop closed — train the merges, encode
    # the corpus with them, per-doc compression (trainer cost + one
    # vocab-sized encode join)
    "bpe_train_apply_compression",
    # round-10 wave 4: leakage-safe cluster-keyed train/eval split (pair
    # graph + large-star/small-star components + rep-keyed hash split)
    "split_cluster_aware",
    # round-10 wave 5: the live streaming ingest dedup gate (two forced
    # micro-batches through foreachBatch against the standing index)
    "streaming_dedup_gate_live",
    # round-10 wave 6: the exact-Jaccard pair family measured directly (its
    # shared producer gained the cache_shingles snapshot this round)
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    # round-11: the ASR-shaped audio-transcript alignment gate (map-side
    # chunk hashing + hash-equi containment join) and the delta-only
    # incremental recrawl pipeline (delta shingling + standing-index gate +
    # incremental mixture rebalance — the production refresh shape)
    "multimodal_audio_transcript_align",
    "corpus_curation_v8",
    # round-11 wave 2: TPC-H Q3 completes the 22-query suite (segment-pruned
    # broadcast dim + fact-fact join + exact-decimal top-10)
    "q3_shipping_priority",
    # round-11 wave 3: unigram Viterbi segmentation (one census shuffle,
    # then a vocab-sized map-side HOF dynamic program per word)
    "tokenizer_unigram_viterbi",
    # round-11 wave 4: one-pass Poisson bootstrap CIs (map-side x32 replica
    # expansion collapsing under partial aggregation; hex-slice inverse-CDF
    # draws, exact BIGINT weighted sums)
    "stats_bootstrap_ci_price",
    # round-11 wave 5: Matryoshka two-stage retrieval (prefix-cosine prune →
    # full-dim rerank, map-side partial top-k before the one qid exchange)
    # and video scene-cut segmentation (metadata-driven frame explode, one
    # doc_id exchange shared by both windows and the scene aggregation)
    "sim_matryoshka_topk",
    "multimodal_scene_cuts",
    # round-11 wave 6: Z-order shard manifest (scalar stats broadcast +
    # map-side quantize/interleave + histogram-quantile boundaries)
    "layout_zorder_locality",
    # round-11 wave 7: synchronous LPA (two key-bounded exchanges per round,
    # 3-round unrolled lazy plan — the iterative-join family's newest member)
    "graph_label_propagation",
    # round-11 wave 8: integer-exact ML primitives — rank-statistic AUC
    # (histogram window, not a global sort) and LOO target encoding
    # (broadcast stats back over the fact scan)
    "ml_auc_exact",
    "ml_target_encoding_loo",
    # round-11 wave 8b: MOSS winnowing (doc-keyed window + 8-byte census join)
    "dedup_winnowing",
    # round-11 wave 9: Gonzalez k-center (k sequential 1-row argmax passes)
    "sample_kcenter_diverse",
    # round-11 wave 9b: TextRank (pagerank_integer over the word graph)
    "text_textrank_keywords",
    # round-11 wave 9c: l-diversity census/roll-up
    "dq_l_diversity",
    # round-11 wave 10: CMS as streaming state (complete-mode drain ==
    # batch sketch, incl. stream startup overhead like the other lives)
    "streaming_heavy_hitters_live",
    # round-11 wave 10b: bilinear join-view IVM (3 broadcast delta joins)
    "ivm_join_view_delta",
    # round-11 wave 10c: purged temporal split (map-side label + 3-group agg)
    "split_temporal_embargo",
    # round-11 wave 11: hash negative sampling (dim broadcast + anti-join)
    # and integer calibration bins (map-side 10-group rollup)
    "recsys_negative_samples",
    "ml_calibration_bins",
    # round-11 wave 12: IVF-PQ residual composite (byte-code list index)
    "sim_ivfpq_residual_topk",
    # round-11 wave 12b: per-scene keyframe argmax (shares the scene chain)
    "multimodal_scene_keyframes",
    # round-11 wave 13: KWIC concordance (histogram argmax broadcast +
    # map-side context slices)
    "text_concordance_kwic",
    # round-12 wave 1: crawl front-end (markup strip / URL canonicalization /
    # blocklist rollup — all map-side projections + one narrow shuffle)
    "text_html_strip_c4",
    "dedup_url_canonical",
    "filter_domain_blocklist",
    # round-12 wave 2: mergeable rank sketch (2 narrow shuffles + sketch-sized
    # broadcasts) and RAG chunking (map-side explode + hash-keyed dedup)
    "sketch_qdigest_quantiles",
    "rag_chunk_sliding",
    # round-13 wave: KMV set algebra (3 narrow shuffles + sketch-sized
    # tails), concat-and-chunk packing (shard-window cumsum + span explode),
    # retrieval eval (broadcast brute scorer + label joins), the bloom
    # ingest gate (16-KiB build collect + one flagged delta scan), and the
    # closed-form ALS half-step (one user-keyed shuffle + broadcast dim)
    "sketch_theta_set_ops",
    "pack_concat_chunks",
    "ml_ranking_metrics",
    "dedup_bloom_gate",
    "recsys_als_step",
    # round-13 wave 2: two-stage ANN rerank (IVF multiprobe + brute
    # verification leg — the heaviest new plan), shelf packing (per-class
    # rank windows), chi-square drift (one bucket groupBy), majority vote
    # (first-writer window + tally window)
    "sim_two_stage_rerank",
    "pack_shelf_bins",
    "dq_chisquare_drift",
    "labels_majority_vote",
    # round-13 wave 3: rater-quality join, exact-KS cumsum over the cents
    # histogram, and the two-carry nearest as-of
    "labels_annotator_agreement",
    "dq_ks_drift",
    "events_asof_nearest",
    # round-13 wave 4: the user-keyed attribution pair join + per-purchase
    # ranking windows (pair volume = activity x lookback)
    "events_attribution_multitouch",
    # round-13 wave 5: eval-gram semi-join + islands + doc-keyed rebuild
    "decontaminate_span_excision",
    # round-14 wave 1: crawl link-graph (corpus-sized extraction collapsing
    # to a host-sized 4-round integer pagerank), the fetch-log revisit
    # scheduler (two keyed shuffles + global-now broadcast), and the full
    # Dawid-Skene EM step (ballot window + two broadcast-joined elections)
    "crawl_linkgraph_pagerank",
    "crawl_revisit_policy",
    "labels_dawid_skene_em",
    # round-14 wave 2: the q-digest census as streaming aggregation state
    # (two forced micro-batches + the batch verification tail — stream
    # startup overhead dominates at bench scale, like the other lives)
    "streaming_percentiles_live",
    # round-14 wave 3: the crawl front-end threaded into curation — one
    # corpus-sized map projection (strip + gates), the canonical-URL
    # groupBy, the md5 dedup window and a domain rollup + mixture broadcast
    "corpus_curation_v9",
    # round-14 wave 4: HITS (shared extraction + 4 host-graph half-steps
    # with 1-row sum broadcasts) and the frontier-schedule composition
    # (both crawl queries re-run end-to-end + a 12-row join/window)
    "crawl_hits_scores",
    "crawl_frontier_schedule",
    # round-14 wave 5: the HumanEval pass@k reduction (one problem-keyed
    # groupBy + codegen'd unrolled term-ratio products) and two
    # Bradley-Terry MM rounds over the pair table (lag window + pair
    # groupBy, then leaderboard-sized joins with 1-row broadcasts)
    "ml_pass_at_k",
    "labels_bradley_terry_mm",
    # round-14 wave 6: the SQL:1999 recursion entry path (engine-driven
    # fixpoint, frontier halves per round over the planted binary hierarchy)
    "sql_recursive_cte_ancestors",
    # round-14 wave 7: exact distinct-count IVM under deletes (standing
    # refcount snapshot + one full-outer delta merge + group rollup)
    "ivm_distinct_view_delta",
    # round-14 wave 8: the Hilbert manifest (8 unrolled map-side curve
    # levels + the zorder boundary machinery — same exchange budget)
    "layout_hilbert_locality",
    # round-14 wave 9: the salted skew machinery under the hash oracle
    # (two-phase hot-key aggregate; replicated-dim salted join)
    "skew_salted_aggregate_hot_key",
    "skew_salted_join_hot_dim",
    # round-14 wave 10: the grid-bucketed spatial proximity self-join
    # (9-cell probe explode -> hash equi-join -> exact integer predicate;
    # ~5.6M candidates at sf0.1 — the heaviest new plan by volume)
    "geo_grid_proximity_join",
    # round-14 wave 11: the 2-D skyline (one global-ordered prefix-min pass)
    "orders_pareto_skyline",
    # round-15: the verdict-directive additions — the 3-D cell-bucketed
    # dominance join, the ER composition (blocking -> components ->
    # survivorship), the planted-hotspot proximity joins through the two
    # remedies, and the live streaming as-of join
    "orders_pareto_skyline_3d",
    "er_blocking_pairs",
    "er_resolve_customers",
    "geo_hotspot_salted_join",
    "geo_quadtree_refined_join",
    "streaming_asof_live",
]


# --------------------------------------------------------------------------- #
# Contention sentinels (round-13 verdict directive #1).                        #
#                                                                              #
# Nine gated recordings across rounds 12-13 all auto-stamped contended: the    #
# box carries external load around the clock (the round-13 judge's own         #
# isolated probes read 1.44-1.71x the pin), so a whole-recording contended     #
# stamp discards every per-query number and the calibrated 1.3x screen never   #
# validly runs.  Fix: interleave THREE fixed sentinel plans — map-bound        #
# (32-way JVM arithmetic, the parallel probe), serial-bound (1-partition       #
# arithmetic, the serial probe), and iteration-bound (a canned 4-round         #
# integer PageRank on a fixed synthetic 500-node graph: 8 shuffle stages, so   #
# it prices scheduler/stage overhead the arithmetic probes can't see) — every  #
# SPARK_GRAFT_SENTINEL_EVERY (default 15) query samples.  Each station's       #
# contention factor = geomean of its three (reading / pin) ratios, clamped     #
# >= 1 (contention only ever inflates; sub-pin readings are noise).  Every     #
# query sample is then normalized by the mean factor of its two bracketing     #
# stations, and the per-query screen runs on NORMALIZED p50s with a            #
# PER-QUERY contended flag (median bracketing factor > 1.10) instead of one    #
# global stamp — a loaded box yields a decidable flag list instead of a        #
# discarded recording.                                                         #
#                                                                              #
# Pins: map/serial come from the healthy-probe round-10 recording pinned in    #
# BENCH_REFERENCE.json.  The iteration sentinel has no healthy-window pin      #
# (the box has never been quiet since it was added), so SENTINEL_PINS.json     #
# carries a monotonically-decreasing min-ever-observed value: normalization    #
# via it removes within-run drift immediately and converges to absolute-load   #
# removal as quieter windows are ever observed.  The map/serial pins carry     #
# the absolute component meanwhile.                                            #
# --------------------------------------------------------------------------- #

_ITER_SENTINEL_NODES = 500
_ITER_SENTINEL_ROUNDS = 4


def _build_iter_sentinel(spark):
    """Canned 4-round integer PageRank on a fixed synthetic graph — engine-
    code-independent (pure range + join/groupBy recurrence, same arithmetic
    family as operators.graph.pagerank_integer but deliberately NOT calling
    it, so engine changes can never move the sentinel)."""
    n = _ITER_SENTINEL_NODES
    ids = spark.range(n)
    edges = ids.select(
        F.col("id").alias("src"),
        ((F.col("id") * 7 + 1) % n).alias("dst"),
        ((F.col("id") % 5) + 1).alias("w"),
    ).union(
        ids.select(
            F.col("id").alias("src"),
            ((F.col("id") * 13 + 2) % n).alias("dst"),
            ((F.col("id") % 3) + 1).alias("w"),
        )
    )
    outd = edges.groupBy("src").agg(F.sum("w").alias("wsum"))
    e = edges.join(outd, "src")
    init = 10**12 // n
    tele = 15 * init // 100
    ranks = ids.select(F.col("id").alias("node"), F.lit(init).alias("rank"))
    for _ in range(_ITER_SENTINEL_ROUNDS):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank * w div wsum").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = (
            ids.select(F.col("id").alias("node"))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.lit(tele) + F.expr("85 * coalesce(inbound, 0L) div 100")).alias("rank"),
            )
        )
    return ranks.selectExpr("sum(rank) AS s")


def _time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _load_sentinel_pins(repo_dir: str, ref: dict) -> dict:
    """map/serial pins come from the healthy round-10 recording and are
    FIXED — the normalization target is the reference recording's
    environment, so lowering them to best-ever box readings would deflate
    normalized times relative to the reference query p50s (an optimistic
    bias).  Only the iter sentinel, which has no reference-environment
    reading, uses the monotonic min-ever value from SENTINEL_PINS.json."""
    pins = {
        "map": float(ref.get("probe_parallel_sec") or 0) or None,
        "serial": float(ref.get("probe_serial_sec") or 0) or None,
        "iter": None,
    }
    try:
        with open(os.path.join(repo_dir, "SENTINEL_PINS.json")) as f:
            stored = json.load(f)
        v = stored.get("iter")
        if v:
            pins["iter"] = float(v)
    except (OSError, ValueError):
        pass
    return pins


def _save_sentinel_pins(repo_dir: str, pins: dict, stations: list[dict]) -> None:
    """Lower the iter pin monotonically to the min observed this recording
    (never raise — contention only inflates, so min-ever is the tightest
    quiet-box bound available for the one sentinel without a reference-
    environment pin).  map/serial are recorded for audit but never used as
    pins (see _load_sentinel_pins)."""
    observed_iter = min(s["iter"] for s in stations)
    out = {
        "iter": round(min(pins["iter"], observed_iter), 4)
        if pins.get("iter")
        else round(observed_iter, 4),
        "observed_min_map": round(min(s["map"] for s in stations), 4),
        "observed_min_serial": round(min(s["serial"] for s in stations), 4),
    }
    try:
        with open(os.path.join(repo_dir, "SENTINEL_PINS.json"), "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # read-only checkout


def _station_factor(station: dict, pins: dict) -> float:
    """Geomean of the sentinel (reading / pin) ratios, clamped >= 1."""
    ratios = [station[k] / pins[k] for k in ("map", "serial", "iter") if pins.get(k)]
    if not ratios:
        return 1.0
    g = 1.0
    for r in ratios:
        g *= r
    return max(1.0, g ** (1.0 / len(ratios)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Dev-only knob for quick harness iteration (the driver never sets it):
    # limit the headline set so a protocol change can be smoke-run in minutes.
    limit = int(os.environ.get("SPARK_GRAFT_HEADLINE_LIMIT", "0"))
    if limit:
        HEADLINE[:] = HEADLINE[:limit]
    spark = get_spark(app_name="engine-bench")
    # The driver records only a 2 KiB stdout tail: Spark WARN/progress noise
    # after the result line has cost a round's per-query numbers before
    # (BENCH_r06 parsed: null).  Run silent and make the JSON the last line.
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state warm-up: run every headline query once at the smallest SF.
    # Whole-stage codegen caches by generated source, so this compiles each
    # plan's classes and spins up the Python worker pool; the timed sf0.1 runs
    # then measure engine throughput, not first-touch JIT.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            QUERY_REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # a warm-up failure must not kill the measured run

    # Machine probes: fixed synthetic workloads independent of the engine
    # code, so cross-round per-query comparisons can be normalized for
    # environment drift (VM/boot/JIT variance has measured ±15-20% across
    # rounds on identical code).  parallel = 32-way JVM arithmetic;
    # serial = single-partition arithmetic (the fixtures are single-row-group
    # parquet, so most map stages here are serial-bound).
    def _probe(df) -> float:
        xs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.selectExpr("sum(id * 2 + 1) AS s").write.format("noop").mode(
                "overwrite"
            ).save()
            xs.append(time.perf_counter() - t0)
        return round(statistics.median(xs), 4)

    release_snapshots(spark)  # drop any blocks the warm-up pass pinned
    spark.catalog.clearCache()

    probe_parallel = _probe(spark.range(200_000_000))
    probe_serial = _probe(spark.range(20_000_000, numPartitions=1))

    # ------------------------------------------------------------------ #
    # Probe gate (round-11 verdict directive #2).  Rounds 9-11 each spent #
    # a manual adjudication session because a CLOSING recording was taken #
    # on a contended box (parallel probe 1.24-2.0x the pin's) and the     #
    # calibrated 1.3x screen flagged 20+ spurious regressions.  Automate  #
    # it: if the parallel probe reads >1.10x the pinned reference probe,  #
    # sleep and re-probe up to SPARK_GRAFT_PROBE_RETRIES times; if it     #
    # never settles, the recording still runs but is stamped              #
    # "contended": true so no one treats its per-query numbers as a       #
    # regression screen.  SPARK_GRAFT_PROBE_GATE=0 skips the wait (quick  #
    # iteration runs); the gate itself always reports its verdict.        #
    # ------------------------------------------------------------------ #
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_REFERENCE.json"
    )
    ref: dict = {}
    try:
        with open(ref_path) as f:
            ref = json.load(f)
    except (OSError, ValueError):
        ref = {}
    # contended: True = probe gate never settled (numbers are NOT a
    # regression screen); False = gate verified healthy vs the pin;
    # None = no usable reference pin exists, so 'unverified' is
    # distinguishable from 'verified clean' (round-12 ADVICE).
    contended: bool | None = None
    ref_probe = ref.get("probe_parallel_sec")
    if ref_probe:
        gate_on = os.environ.get("SPARK_GRAFT_PROBE_GATE", "1") != "0"
        retries = int(os.environ.get("SPARK_GRAFT_PROBE_RETRIES", "5"))
        threshold = 1.10 * float(ref_probe)
        attempt = 0
        while gate_on and probe_parallel > threshold and attempt < retries:
            attempt += 1
            print(
                f"# probe gate: parallel probe {probe_parallel:.4f}s > "
                f"1.10x pin ({threshold:.4f}s); retry {attempt}/{retries} "
                "after 30s",
                file=sys.stderr,
            )
            time.sleep(30)
            probe_parallel = _probe(spark.range(200_000_000))
        contended = probe_parallel > threshold
        if attempt:
            # the serial probe at line ~387 predates the sleeps; only
            # re-measure when the gate actually waited (round-12 ADVICE).
            probe_serial = _probe(spark.range(20_000_000, numPartitions=1))

    # p50 of 3 runs per query: single-shot numbers drift ~15% run-to-run
    # (GC, codegen cache warmth), which is larger than most optimizations
    # being measured.  Rounds interleave (run 1 of all queries, then run 2,
    # ...) so same-query runs don't share just-touched OS page cache state.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}

    # Arrow worker warm (round-11 verdict directive #3): the four Arrow-
    # whitelisted queries are the only Python-crossing plans, so by the time
    # the interleaved rounds come back to one of them the reusable Python
    # worker pool has idled out and the timed sample pays worker fork +
    # pandas/pyarrow import on every active thread — the
    # multimodal_decode_stub "transient" that read 2.2-2.9x in-loop while
    # 1.12x isolated across rounds 9-11.  One throwaway 32-partition
    # mapInPandas pass IMMEDIATELY before each timed sample of an Arrow
    # query re-forks the pool outside the timed region; worker reuse then
    # hands the warm workers to the measured run.
    def _warm_arrow(it):
        for b in it:
            yield b

    arrow_warm_df = spark.range(64, numPartitions=32).mapInPandas(_warm_arrow, "id long")

    def _warm_arrow_workers() -> None:
        arrow_warm_df.write.format("noop").mode("overwrite").save()

    arrow_queries = {
        "multimodal_decode_stub",
        "multimodal_frame_sample",
        "dq_group_checksum_udaf",
        "text_wordcount_udtf",
    }
    # Sentinel stations (directive #1, round 14): interleave the three fixed
    # sentinel plans every SENTINEL_EVERY samples so every query sample has a
    # bracketing pair of contention readings; per-sample normalization +
    # per-query contended flags replace the whole-recording stamp as the
    # regression screen (the global stamp survives as a summary field).
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    pins = _load_sentinel_pins(repo_dir, ref)
    sentinel_map_df = spark.range(200_000_000).selectExpr("sum(id * 2 + 1) AS s")
    sentinel_serial_df = spark.range(20_000_000, numPartitions=1).selectExpr(
        "sum(id * 2 + 1) AS s"
    )
    sentinel_iter_df = _build_iter_sentinel(spark)
    for df in (sentinel_map_df, sentinel_serial_df, sentinel_iter_df):
        _time_noop(df)  # codegen-compile each sentinel outside the recording

    stations: list[dict] = []

    def _run_station(idx: int) -> None:
        s = {
            "i": idx,
            "map": round(_time_noop(sentinel_map_df), 4),
            "serial": round(_time_noop(sentinel_serial_df), 4),
            "iter": round(_time_noop(sentinel_iter_df), 4),
        }
        s["factor"] = round(_station_factor(s, pins), 4)
        stations.append(s)

    every = max(1, int(os.environ.get("SPARK_GRAFT_SENTINEL_EVERY", "15")))
    sample_idx: dict[str, list[int]] = {name: [] for name in HEADLINE}
    gi = 0  # global sample counter; sample j runs between stations i<=j-1 and i>=j
    _run_station(gi)
    for _ in range(n_runs):
        for name in HEADLINE:
            fn = QUERY_REGISTRY[name].fn
            if name in arrow_queries:
                _warm_arrow_workers()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            gi += 1
            sample_idx[name].append(gi)
            # free this invocation's storage INSIDE the timed region's
            # boundary (after the action): tracked snapshots via the
            # registry, and CacheManager entries via clearCache — the
            # iterative graph operators' unrolled mode persists its
            # edge/node inputs keyed by LOGICAL PLAN, so without the
            # clearCache samples 2+ of the same query would read the warm
            # cache (the round-8 pHash artifact, in persist form).
            # Executor storage stays O(one query) across the recording and
            # no sample can read a prior sample's materialization.
            release_snapshots(spark)
            spark.catalog.clearCache()
            if gi % every == 0:
                _run_station(gi)
    if stations[-1]["i"] != gi:
        _run_station(gi)
    _save_sentinel_pins(repo_dir, pins, stations)

    # Per-sample local contention factor = mean of the two bracketing
    # stations' factors; per-query normalized p50 + contended flag.
    def _bracket_factor(j: int) -> float:
        before = max((s for s in stations if s["i"] <= j - 1), key=lambda s: s["i"])
        after = min((s for s in stations if s["i"] >= j), key=lambda s: s["i"])
        return (before["factor"] + after["factor"]) / 2.0

    factors: dict[str, list[float]] = {
        name: [_bracket_factor(j) for j in sample_idx[name]] for name in HEADLINE
    }
    timings = {name: round(statistics.median(s), 4) for name, s in samples.items()}
    timings_norm = {
        name: round(
            statistics.median([t / f for t, f in zip(samples[name], factors[name])]), 4
        )
        for name in HEADLINE
    }
    query_factors = {
        name: round(statistics.median(factors[name]), 4) for name in HEADLINE
    }
    query_contended = {name: query_factors[name] > 1.10 for name in HEADLINE}
    total = round(sum(timings.values()), 4)
    # continuity fields: the stations' map readings ARE the per-round probes
    probe_rounds = [s["map"] for s in stations]
    if ref_probe and any(p > 1.10 * float(ref_probe) for p in probe_rounds):
        contended = True

    # The per-query screen (normalized): flag queries whose NORMALIZED p50
    # exceeds 1.3x the pinned reference p50 — decidable even on a loaded box.
    ref_queries = ref.get("queries", {}) or {}
    screen_flagged = {
        name: round(timings_norm[name] / ref_queries[name], 4)
        for name in timings_norm
        if name in ref_queries and timings_norm[name] / ref_queries[name] > 1.3
    }
    screen = {
        "threshold": 1.3,
        "normalization": "per-sample / mean(bracketing station factors)",
        "n_screened": len(set(timings_norm) & set(ref_queries)),
        "flagged_norm_ratio": dict(
            sorted(screen_flagged.items(), key=lambda kv: -kv[1])
        ),
    }

    # Matched-probe cross-round comparison (the round-7 closing-pass protocol,
    # now committed code instead of BASELINE.md prose): against the pinned
    # reference recording, sum the p50s of the queries BOTH recordings carry
    # and emit the ratio (<1 = faster than the reference round), alongside the
    # reference probe pair so environment drift is visible next to the ratio
    # instead of silently inflating it.
    comparable: dict[str, object] = {}
    try:
        shared = sorted(set(timings) & set(ref["queries"]))
        cur_sum = sum(timings[q] for q in shared)
        cur_sum_norm = sum(timings_norm[q] for q in shared)
        ref_sum = sum(ref["queries"][q] for q in shared)
        comparable = {
            "comparable_subset_ratio": round(cur_sum / ref_sum, 4) if ref_sum else None,
            "comparable_subset_ratio_norm": round(cur_sum_norm / ref_sum, 4)
            if ref_sum
            else None,
            "comparable_subset_n": len(shared),
            "comparable_subset_sec": round(cur_sum, 4),
            "reference_subset_sec": round(ref_sum, 4),
            "reference_probe_parallel_sec": ref.get("probe_parallel_sec"),
            "reference_probe_serial_sec": ref.get("probe_serial_sec"),
        }
    except (OSError, KeyError, ValueError):
        comparable = {"comparable_subset_ratio": None, "comparable_subset_n": 0}

    # Full per-query record → file (lossless; committed to the repo so the
    # judge can audit every number even though stdout is tail-truncated).
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_norm": timings_norm,
        "query_factors": query_factors,
        "query_contended": query_contended,
        "stations": stations,
        "sentinel_pins": pins,
        "screen": screen,
        "sf": sf,
        "probe_parallel_sec": probe_parallel,
        "probe_serial_sec": probe_serial,
        "probe_parallel_rounds": probe_rounds,
        "contended": contended,
        "registry_total": len(QUERY_REGISTRY),
        "queries_omitted": len(QUERY_REGISTRY) - len(timings),
        **comparable,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_LATEST.json")
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        full_path = None  # read-only checkout: the stdout line still carries the summary

    # Stdout line → must survive a 2 KiB tail capture.  Emit per-query numbers
    # heaviest-first only while the encoded line stays under the budget; the
    # remainder lives in the full file (count recorded so truncation is
    # self-documenting, never silent).
    # "queries_omitted" = registry queries NOT in the headline set (the
    # round-11 judge read the old stdout-truncation count as this and found
    # the arithmetic inconsistent — registry_total now makes it checkable:
    # n_queries + queries_omitted == registry_total).  The count of per-query
    # numbers squeezed out of the 2 KiB stdout tail is its own field,
    # "stdout_queries_truncated"; the full file always carries all of them.
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    base = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "registry_total": len(QUERY_REGISTRY),
        "queries_omitted": len(QUERY_REGISTRY) - len(timings),
        "probe_parallel_sec": probe_parallel,
        "probe_serial_sec": probe_serial,
        "contended": contended,
        "comparable_subset_ratio": comparable.get("comparable_subset_ratio"),
        "comparable_subset_ratio_norm": comparable.get("comparable_subset_ratio_norm"),
        "comparable_subset_n": comparable.get("comparable_subset_n"),
        "screen_flagged_n": len(screen["flagged_norm_ratio"]),
        "full_results": "BENCH_FULL_LATEST.json" if full_path else None,
    }
    budget = 1900  # leave headroom inside the 2048-byte tail window
    # Round-15 PERF lost coverage of exactly the queries that improved: a
    # query that got faster fell out of the heaviest-that-fit stdout window
    # and the driver recorded it as "dropped_from_bench" (round-15 verdict
    # item #8).  Emission priority is therefore the PREVIOUS committed stdout
    # set first (so round-over-round PERF keeps comparing the same queries),
    # then everything else heaviest-first, greedily while the line fits.
    # Additions-only: nothing is removed from `queries` that still fits, and
    # the full file stays lossless either way.
    stdout_set_path = os.path.join(repo_dir, "BENCH_STDOUT_SET.json")
    prev_stdout: list[str] = []
    try:
        with open(stdout_set_path) as f:
            prev_stdout = [q for q in json.load(f) if q in timings]
    except (OSError, ValueError):
        prev_stdout = []
    prev_order = set(prev_stdout)
    prio = sorted(prev_stdout, key=lambda q: -timings[q]) + [
        q for q, _ in ranked if q not in prev_order
    ]
    kept: dict[str, float] = {}
    for name in prio:
        kept[name] = timings[name]
        line = json.dumps({**base, "stdout_queries_truncated": len(timings) - len(kept), "queries": kept})
        if len(line) > budget:
            del kept[name]
            break
    if not limit:  # full runs persist the emitted set for the next round
        try:
            with open(stdout_set_path, "w") as f:
                json.dump(sorted(kept), f, indent=0)
                f.write("\n")
        except OSError:
            pass  # read-only checkout
    out = json.dumps({**base, "stdout_queries_truncated": len(timings) - len(kept), "queries": kept})
    sys.stdout.flush()
    print(out, flush=True)


if __name__ == "__main__":
    sys.exit(main())
