"""Round-13 additions: KMV/theta sketch set algebra (merge exactness, the
property the sketch exists for), concat-and-chunk packing invariants
(token conservation, capacity, continuity), the bloom gate's one-sidedness
(no false negatives; prune ≡ flag-filter), the ALS half-step's closed form
(normal equations hold exactly), and retrieval-metric structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.bloom import (
    bloom_build,
    bloom_flag,
    bloom_prune,
)
from airflow_cms_inpatient_etl_spark.operators.sketch import (
    KMV_K,
    kmv_merge,
    kmv_sketch,
)
from airflow_cms_inpatient_etl_spark.operators.text import hash60
from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
from tests.conftest import SF_SMOKE


def _hashed_set(spark, set_id: str, lo: int, hi: int):
    """(set_id, key, hv) rows for the integer interval [lo, hi) — the same
    portable-hash keying the registry query uses."""
    return spark.range(lo, hi).select(
        F.lit(set_id).alias("set_id"),
        F.col("id").alias("key"),
        hash60(F.concat(F.lit("kmv:"), F.col("id").cast("string"))).alias("hv"),
    )


# --------------------------------------------------------------------------- #
# KMV: union merge is EXACT — merging two per-set sketches yields the same     #
# k minima as sketching the union directly (the theta-sketch algebra's         #
# load-bearing lemma; see operators/sketch.py module comment)                  #
# --------------------------------------------------------------------------- #
def test_kmv_merge_equals_direct_union_sketch(spark):
    k = 64
    a = _hashed_set(spark, "a", 0, 700)  # overlaps b on [400, 700)
    b = _hashed_set(spark, "b", 400, 1200)
    sk = kmv_sketch(a.unionByName(b), "set_id", "hv", k)
    merged = sorted(r["hv"] for r in kmv_merge(sk, "hv", k).collect())
    direct_union = (
        a.unionByName(b).select("key", "hv").distinct().select(F.lit("u").alias("set_id"), "hv")
    )
    direct = sorted(
        r["hv"] for r in kmv_sketch(direct_union, "set_id", "hv", k).collect()
    )
    assert merged == direct and len(merged) == k


def test_kmv_merge_associative_three_way(spark):
    k = 48
    parts = [_hashed_set(spark, s, lo, hi) for s, lo, hi in
             [("a", 0, 300), ("b", 200, 600), ("c", 500, 900)]]
    all_rows = parts[0].unionByName(parts[1]).unionByName(parts[2])
    sk = kmv_sketch(all_rows, "set_id", "hv", k)
    # (a ⊕ b) ⊕ c
    ab = kmv_merge(sk.filter(F.col("set_id").isin("a", "b")), "hv", k)
    abc_left = sorted(
        r["hv"]
        for r in kmv_merge(
            ab.unionByName(sk.filter(F.col("set_id") == "c").select("hv")), "hv", k
        ).collect()
    )
    # a ⊕ (b ⊕ c)
    bc = kmv_merge(sk.filter(F.col("set_id").isin("b", "c")), "hv", k)
    abc_right = sorted(
        r["hv"]
        for r in kmv_merge(
            bc.unionByName(sk.filter(F.col("set_id") == "a").select("hv")), "hv", k
        ).collect()
    )
    assert abc_left == abc_right


def test_kmv_small_set_degrades_to_exact(spark):
    d = _hashed_set(spark, "tiny", 0, 40)
    sk = kmv_sketch(d, "set_id", "hv", KMV_K)
    rows = sk.collect()
    assert len(rows) == 40  # complete hash list: the sketch IS the set
    assert sorted(r["rn"] for r in rows) == list(range(1, 41))


def test_kmv_prefilter_returns_exactly_k_on_large_set(spark):
    d = _hashed_set(spark, "big", 0, 20000)  # 78x the 4k oversample target
    sk = kmv_sketch(d, "set_id", "hv", 64).collect()
    assert len(sk) == 64
    # the k minima really are the global minima (no prefilter shortfall)
    lows = sorted(r["hv"] for r in d.orderBy("hv").limit(64).collect())
    assert sorted(r["hv"] for r in sk) == lows


# --------------------------------------------------------------------------- #
# pack_concat_chunks: layout invariants                                        #
# --------------------------------------------------------------------------- #
def test_pack_concat_chunks_invariants(spark):
    from airflow_cms_inpatient_etl_spark.queries.pipeline import _PACK_CTX
    from airflow_cms_inpatient_etl_spark.sources.registry import load_table

    out = QUERY_REGISTRY["pack_concat_chunks"].fn(spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), "[ \t\r\n]+", " "))
    total_tokens = (
        d.filter(F.col("text").isNotNull() & (norm != ""))
        .select(F.size(F.split(norm, " ")).alias("ntok"))
        .agg(F.sum("ntok"))
        .collect()[0][0]
    )
    # token conservation: every token lands in exactly one window
    assert sum(r["n_tokens"] for r in out) == total_tokens
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 < r["n_tokens"] <= _PACK_CTX
        assert 0 <= r["n_continuing"] <= r["n_docs"]
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["window_idx"])
        # windows are contiguous from 0 (the stream has no holes)
        assert [r["window_idx"] for r in rows] == list(range(len(rows)))
        # every window except the shard's last is exactly full
        for r in rows[:-1]:
            assert r["n_tokens"] == _PACK_CTX, (shard, r)
        # a window is entered mid-document iff the previous window's last
        # doc spills over; window 0 never continues
        assert rows[0]["n_continuing"] == 0


# --------------------------------------------------------------------------- #
# bloom gate: one-sidedness + flag/prune agreement                             #
# --------------------------------------------------------------------------- #
def test_bloom_flag_has_no_false_negatives_and_prune_matches(spark):
    members = spark.range(0, 500).select(F.md5(F.col("id").cast("string")).alias("k"))
    words = bloom_build(members, "k")
    probe = spark.range(0, 2000).select(F.md5(F.col("id").cast("string")).alias("k"))
    flagged = bloom_flag(probe, "k", words, "hit")
    # every true member passes the gate
    misses = (
        flagged.join(members, "k", "left_semi").filter(~F.col("hit")).count()
    )
    assert misses == 0
    # prune is exactly filter-on-flag
    assert (
        bloom_prune(probe, "k", words).count()
        == flagged.filter("hit").count()
    )


def test_dedup_bloom_gate_booleans_hold(spark):
    rows = QUERY_REGISTRY["dedup_bloom_gate"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["no_false_negatives"] is True
    assert r["fp_rate_bounded"] is True
    assert r["n_dup_exact"] > 0, "planted duplicates missing — the FN claim is vacuous"


# --------------------------------------------------------------------------- #
# ALS half-step: the closed form solves the normal equations exactly           #
# --------------------------------------------------------------------------- #
def test_recsys_als_step_solves_normal_equations(spark):
    from airflow_cms_inpatient_etl_spark.queries.analytics import (
        _ALS_LAMBDA,
        _ALS_SCALE,
    )
    from airflow_cms_inpatient_etl_spark.sources.registry import load_table

    out = {r["user_id"]: r for r in QUERY_REGISTRY["recsys_als_step"].fn(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").filter(F.col("value").isNotNull())
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    r = (
        ev.groupBy("user_id", "event_type")
        .agg(F.sum(cents).alias("s"), F.count(F.lit(1)).alias("n"))
        .select("user_id", "event_type", F.expr("s div n").alias("rc"))
    )
    q = r.select("event_type").distinct().select(
        "event_type",
        F.pmod(hash60(F.concat(F.lit("alsq1:"), F.col("event_type"))), F.lit(_ALS_SCALE)).alias("q1"),
        F.pmod(hash60(F.concat(F.lit("alsq2:"), F.col("event_type"))), F.lit(_ALS_SCALE)).alias("q2"),
    )
    sums = {
        row["user_id"]: row
        for row in r.join(q, "event_type")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("q1") * F.col("q1")).alias("s11"),
            F.sum(F.col("q1") * F.col("q2")).alias("s12"),
            F.sum(F.col("q2") * F.col("q2")).alias("s22"),
            F.sum(F.col("rc") * F.col("q1")).alias("b1"),
            F.sum(F.col("rc") * F.col("q2")).alias("b2"),
        )
        .collect()
    }
    assert out.keys() == sums.keys() and len(out) > 0
    for uid, s in sums.items():
        m11, m12, m22 = s["s11"] + _ALS_LAMBDA, s["s12"], s["s22"] + _ALS_LAMBDA
        p1, p2 = out[uid]["p1"], out[uid]["p2"]
        # M p = b to float round-off (the solve is exact integer algebra
        # followed by one division, so residuals are ~ulp-scale)
        assert abs(m11 * p1 + m12 * p2 - s["b1"]) <= 1e-6 * max(1.0, abs(s["b1"]))
        assert abs(m12 * p1 + m22 * p2 - s["b2"]) <= 1e-6 * max(1.0, abs(s["b2"]))


# --------------------------------------------------------------------------- #
# ranking metrics: per-query structure                                         #
# --------------------------------------------------------------------------- #
def test_ml_ranking_metrics_structure(spark):
    from airflow_cms_inpatient_etl_spark.queries.similarity import _RANK_K, _RANK_NQ

    rows = QUERY_REGISTRY["ml_ranking_metrics"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == _RANK_NQ
    for r in rows:
        assert 0 <= r["hits_at_k"] <= _RANK_K
        assert r["p_at_k"] == r["hits_at_k"] / _RANK_K
        assert 0.0 <= r["r_at_k"] <= 1.0
        if r["first_rel_rank"] is None:
            assert r["mrr_at_k"] == 0.0 and r["hits_at_k"] == 0
        else:
            assert 1 <= r["first_rel_rank"] <= _RANK_K
            assert r["mrr_at_k"] == 1.0 / r["first_rel_rank"]
            assert r["hits_at_k"] >= 1


def test_ml_ranking_metrics_planted_duplicate_ranks_first(spark):
    """A corpus vector identical to the query must be retrieved at rank 1
    with cosine 1.0 — the metric tail then reports first_rel_rank == 1."""
    from airflow_cms_inpatient_etl_spark.operators.similarity import brute_force_topk

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 7),
        (1, [1.0, 0.0, 0.0, 0.0], 7),   # exact duplicate of the query
        (2, [0.0, 1.0, 0.0, 0.0], 3),
        (3, [0.0, 0.0, 1.0, 0.0], 3),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    top = brute_force_topk(e, e.filter("vec_id = 0"), k=2)
    got = {r["rn"]: r["cid"] for r in top.collect()}
    assert got[1] == 1


# --------------------------------------------------------------------------- #
# wave 2: shelf packing invariants                                             #
# --------------------------------------------------------------------------- #
def test_pack_shelf_bins_invariants(spark):
    from airflow_cms_inpatient_etl_spark.queries.pipeline import _SHELF_CTX
    from airflow_cms_inpatient_etl_spark.sources.registry import load_table

    out = QUERY_REGISTRY["pack_shelf_bins"].fn(spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), "[ \t\r\n]+", " "))
    stats = (
        d.filter(F.col("text").isNotNull() & (norm != ""))
        .select(F.size(F.split(norm, " ")).alias("ntok"))
        .agg(F.count(F.lit(1)), F.sum("ntok"))
        .collect()[0]
    )
    # every doc lands in exactly one bin; every token is preserved
    assert sum(r["n_docs"] for r in out) == stats[0]
    assert sum(r["n_tokens"] for r in out) == stats[1]
    for r in out:
        # no-split guarantee: a bin never exceeds the window unless it holds
        # a single oversized doc (escalated via the flag, never silent)
        if not r["has_overflow_doc"]:
            assert r["n_tokens"] <= _SHELF_CTX, r
            assert r["n_docs"] <= r["capacity_class"]
        else:
            assert r["capacity_class"] == 1


def test_pack_shelf_bins_nonfinal_bins_full(spark):
    """Within (shard, class), every bin except the last holds exactly
    ``class`` docs — the shelf construction's fill discipline."""
    rows = QUERY_REGISTRY["pack_shelf_bins"].fn(spark, SF_SMOKE).collect()
    groups: dict[tuple, list] = {}
    for r in rows:
        groups.setdefault((r["shard"], r["capacity_class"]), []).append(r)
    for (shard, cls), rs in groups.items():
        rs.sort(key=lambda r: r["bin_idx"])
        assert [r["bin_idx"] for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r["n_docs"] == cls, (shard, cls, r)


# --------------------------------------------------------------------------- #
# wave 2: two-stage rerank — recall leg really is vs brute truth               #
# --------------------------------------------------------------------------- #
def test_two_stage_rerank_recall_consistency(spark):
    from airflow_cms_inpatient_etl_spark.operators.similarity import brute_force_topk
    from airflow_cms_inpatient_etl_spark.sources.registry import load_table

    out = {r["qid"]: r for r in QUERY_REGISTRY["sim_two_stage_rerank"].fn(spark, SF_SMOKE).collect()}
    assert len(out) == 8
    for r in out.values():
        assert 0 <= r["n_overlap"] <= 10
        assert r["recall_at_k"] == r["n_overlap"] / 10.0
        assert r["shortlist_bounded"] is True
    # full-probe degenerate case: probing ALL lists must give recall 1.0
    from airflow_cms_inpatient_etl_spark.operators.similarity import ivf_topk

    e = load_table(spark, SF_SMOKE, "embeddings")
    queries = e.filter(e.vec_id < 3)
    cents = e.filter((e.vec_id >= 100) & (e.vec_id <= 107))
    ann_all = ivf_topk(e, queries, cents, k=5, n_probes=8)
    brute = brute_force_topk(e, queries, k=5)
    got = {(r["qid"], r["cid"]) for r in ann_all.collect()}
    want = {(r["qid"], r["cid"]) for r in brute.collect()}
    assert got == want


# --------------------------------------------------------------------------- #
# wave 2: chi-square drift — identical cohorts score zero; a planted shift     #
# flags                                                                        #
# --------------------------------------------------------------------------- #
def test_chisquare_zero_on_identical_cohorts(spark):
    from airflow_cms_inpatient_etl_spark.queries.analytics import _CHI_BUCKET  # noqa: F401

    rows = QUERY_REGISTRY["dq_chisquare_drift"].fn(spark, SF_SMOKE).collect()
    assert all(r["chi2_term"] is not None or r["n_ref"] == 0 for r in rows)
    # hand-check one bucket's term against the closed form
    tot_ref = sum(r["n_ref"] for r in rows)
    tot_cur = sum(r["n_cur"] for r in rows)
    for r in rows:
        if r["n_ref"] > 0:
            d = r["n_cur"] * tot_ref - tot_cur * r["n_ref"]
            want = float(d) * float(d) / float(tot_cur * r["n_ref"]) / float(tot_ref)
            assert r["chi2_term"] == want


# --------------------------------------------------------------------------- #
# wave 2: majority vote — deterministic tie-break and ballot discipline        #
# --------------------------------------------------------------------------- #
def test_majority_vote_tiebreak_and_ballot(spark):
    rows = QUERY_REGISTRY["labels_majority_vote"].fn(spark, SF_SMOKE).collect()
    assert all(1 <= r["majority_count"] <= r["n_votes"] for r in rows)
    assert all(
        r["strict_majority"] == (r["majority_count"] * 2 > r["n_votes"]) for r in rows
    )
    # planted frame: 2-2 tie elects the lexicographically smaller label;
    # a re-judgment by the same annotator does not stuff the ballot
    import datetime

    t = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t, 10, "view", 1.0, None),
            (2, t, 11, "view", 1.0, None),
            (3, t, 12, "click", 1.0, None),
            (4, t, 13, "click", 1.0, None),
            # annotator 10 re-judges later: ignored (earliest vote stands)
            (5, datetime.datetime(2024, 2, 1), 10, "click", 1.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    from pyspark.sql import Window as W

    votes0 = ev.select(
        F.lit(0).alias("item_id"),  # one item: every event votes on it
        F.col("user_id").alias("annotator"),
        F.col("event_type").alias("label"),
        "ts",
        "event_id",
    )
    w_first = W.partitionBy("item_id", "annotator").orderBy("ts", "event_id")
    votes = (
        votes0.withColumn("vrn", F.row_number().over(w_first))
        .filter("vrn = 1")
        .groupBy("item_id", "label")
        .count()
        .collect()
    )
    tally = {r["label"]: r["count"] for r in votes}
    assert tally == {"view": 2, "click": 2}  # 2-2 → 'click' < 'view' wins


# --------------------------------------------------------------------------- #
# wave 3: nearest as-of — crafted directions, ties, and missing sides          #
# --------------------------------------------------------------------------- #
def test_events_asof_nearest_crafted(spark):
    import datetime

    def t(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # purchase at :10 — click :07 (gap 3) vs click :12 (gap 2) → fwd
        (1, t(7), 100, "click", 1.0, None),
        (2, t(12), 100, "click", 1.0, None),
        (3, t(10), 100, "purchase", 1.0, None),
        # purchase at :20 — clicks :18 and :22 (both gap 2) → tie → back
        (4, t(18), 200, "click", 1.0, None),
        (5, t(22), 200, "click", 1.0, None),
        (6, t(20), 200, "purchase", 1.0, None),
        # purchase with clicks only AFTER → fwd (backward-only would NULL)
        (7, t(30), 300, "purchase", 1.0, None),
        (8, t(31), 300, "click", 1.0, None),
        # purchase with no clicks at all → NULLs
        (9, t(40), 400, "purchase", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import airflow_cms_inpatient_etl_spark.sources.registry as reg

    # drive the registry fn on the planted frame by monkeypatching the scan
    orig = reg.load_table
    try:
        reg.load_table = lambda spark_, sf_dir, name: ev
        import airflow_cms_inpatient_etl_spark.queries.timeseries as ts_mod

        orig_ts = ts_mod.load_table
        ts_mod.load_table = lambda spark_, sf_dir, name: ev
        try:
            out = {r["event_id"]: r for r in QUERY_REGISTRY["events_asof_nearest"].fn(spark, SF_SMOKE).collect()}
        finally:
            ts_mod.load_table = orig_ts
    finally:
        reg.load_table = orig
    assert out[3]["direction"] == "fwd" and out[3]["gap_us"] == 2_000_000
    assert out[6]["direction"] == "back" and out[6]["gap_us"] == 2_000_000
    assert out[7]["direction"] == "fwd" and out[7]["gap_us"] == 1_000_000
    assert out[9]["direction"] is None and out[9]["nearest_click_ts"] is None


# --------------------------------------------------------------------------- #
# wave 3: KS drift — identity gives zero, a planted shift flags                #
# --------------------------------------------------------------------------- #
def test_ks_identity_is_zero_and_shift_flags(spark):
    from pyspark.sql import Window as W2

    def ks_of(df):
        hist = df.groupBy("cents").agg(
            F.sum("is_ref").cast("long").alias("ca"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("cb"),
        )
        w = W2.orderBy("cents").rowsBetween(W2.unboundedPreceding, 0)
        cum = hist.select(
            "cents",
            F.sum("ca").over(w).alias("cum_a"),
            F.sum("cb").over(w).alias("cum_b"),
        )
        r = cum.agg(
            F.max("cum_a").alias("na"), F.max("cum_b").alias("nb")
        ).collect()[0]
        d = cum.select(
            F.abs(F.col("cum_a") * r["nb"] - F.col("cum_b") * r["na"]).alias("d")
        ).agg(F.max("d")).collect()[0][0]
        return d, r["na"], r["nb"]

    # identical cohorts: every value appears once on each side → D == 0
    ident = spark.range(0, 500).selectExpr("id AS cents", "1 AS is_ref").unionAll(
        spark.range(0, 500).selectExpr("id AS cents", "0 AS is_ref")
    )
    d0, na, nb = ks_of(ident)
    assert d0 == 0
    # disjoint shift: cohort b entirely above cohort a → D == na*nb (KS = 1)
    shift = spark.range(0, 500).selectExpr("id AS cents", "1 AS is_ref").unionAll(
        spark.range(1000, 1500).selectExpr("id AS cents", "0 AS is_ref")
    )
    d1, na1, nb1 = ks_of(shift)
    assert d1 == na1 * nb1


def test_dq_ks_drift_registry_sane(spark):
    r = QUERY_REGISTRY["dq_ks_drift"].fn(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert r["ks_num"] == round(r["ks_stat"] * r["n_a"] * r["n_b"])


# --------------------------------------------------------------------------- #
# wave 3: annotator agreement — shares the election's ballots                  #
# --------------------------------------------------------------------------- #
def test_annotator_agreement_consistent_with_election(spark):
    agg = QUERY_REGISTRY["labels_annotator_agreement"].fn(spark, SF_SMOKE).collect()
    assert len(agg) > 0
    for r in agg:
        assert 0 <= r["n_agree"] <= r["n_items"]
        assert r["agreement_rate"] == r["n_agree"] / r["n_items"]
        assert r["below_coin_flip"] == (r["n_agree"] * 2 < r["n_items"])
    # total agreements across annotators == total majority_count across items
    maj = QUERY_REGISTRY["labels_majority_vote"].fn(spark, SF_SMOKE).collect()
    assert sum(r["n_agree"] for r in agg) == sum(r["majority_count"] for r in maj)


# --------------------------------------------------------------------------- #
# wave 4: multi-touch attribution — credit conservation and position rules     #
# --------------------------------------------------------------------------- #
def test_attribution_multitouch_credit_conserves(spark):
    rows = QUERY_REGISTRY["events_attribution_multitouch"].fn(spark, SF_SMOKE).collect()
    assert rows, "no attribution pairs on the fixture"
    per_p: dict[int, list] = {}
    for r in rows:
        per_p.setdefault(r["purchase_id"], []).append(r)
    for pid, rs in per_p.items():
        n = rs[0]["n_touch"]
        assert len(rs) == n
        assert sorted(r["pos"] for r in rs) == list(range(1, n + 1))
        # exact credit schedule, and conservation to float round-off
        total = sum(r["credit"] for r in rs)
        assert abs(total - 1.0) < 1e-9, (pid, total)
        for r in rs:
            if n == 1:
                assert r["credit"] == 1.0
            elif n == 2:
                assert r["credit"] == 0.5
            elif r["pos"] in (1, n):
                assert r["credit"] == 0.4
            else:
                assert r["credit"] == 0.2 / (n - 2)


# --------------------------------------------------------------------------- #
# wave 5: eval-span excision — planted contamination cut, clean doc intact     #
# --------------------------------------------------------------------------- #
def test_span_excision_planted_contamination(spark):
    from airflow_cms_inpatient_etl_spark.operators.dedup import span_excision_against

    passage = " ".join(f"ev{i}" for i in range(14))  # 14-token eval passage
    eval_df = spark.createDataFrame(
        [(1, "intro words " + passage + " outro words")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # contaminated: carries the passage verbatim mid-document
            (100, "alpha beta " + passage + " gamma delta"),
            # clean: no 5-gram overlap with the eval set
            (101, " ".join(f"tr{i}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_excision_against(train, eval_df).collect()}
    # the planted 14-token run exceeds min_len=12 and is excised whole
    assert out[100]["n_spans_removed"] == 1
    assert out[100]["n_tokens_removed"] == 14
    assert "ev0" not in out[100]["decontam_text"]
    assert out[100]["decontam_text"].startswith("alpha beta")
    assert out[100]["decontam_text"].endswith("gamma delta")
    # the clean document is byte-identical
    assert out[101]["n_tokens_removed"] == 0
    assert out[101]["decontam_text"] == " ".join(f"tr{i}" for i in range(20))


def test_span_excision_short_overlap_survives(spark):
    """An overlap shorter than min_len (12 tokens) is NOT excised — the
    GPT-3 rule removes only substantial verbatim runs."""
    from airflow_cms_inpatient_etl_spark.operators.dedup import span_excision_against

    short = " ".join(f"ev{i}" for i in range(8))  # 8 < 12 tokens
    eval_df = spark.createDataFrame([(1, short)], "doc_id long, text string")
    train = spark.createDataFrame(
        [(100, "alpha beta " + short + " gamma delta")], "doc_id long, text string"
    )
    r = span_excision_against(train, eval_df).collect()[0]
    assert r["n_spans_removed"] == 0 and r["n_tokens_removed"] == 0
