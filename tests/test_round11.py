"""Round-11 additions: BPE trainer lineage-bound canary, spread_scan
allowlist plan walk, and the round-11 verdict-directive fixes."""

from __future__ import annotations

import os
import statistics

import pytest
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.text import bpe_train
from airflow_cms_inpatient_etl_spark.sources.registry import (
    load_table,
    release_snapshots,
    spread_scan,
)
from tests.conftest import SF_SMOKE


# --------------------------------------------------------------------------- #
# BPE trainer: periodic re-snapshot (round-10 verdict directive #4)            #
# --------------------------------------------------------------------------- #


def _synthetic_words(spark, n_words: int = 400):
    """Deterministic distinct-word table that sustains 128+ merges: words are
    mixed-radix digit strings over a 7-letter alphabet, 12 tokens each, so
    the pair census stays rich as merges consume pairs."""
    alpha = "abcdefg"
    rows = []
    for i in range(n_words):
        x, chars = i * 2654435761 % (7**12), []
        for _ in range(12):
            chars.append(alpha[x % 7])
            x //= 7
        rows.append((" " + "; ".join(chars) + ";", (i % 9) + 1))
    return spark.createDataFrame(rows, schema="seq string, freq int")


def test_bpe_resnapshot_semantically_invisible(spark):
    """The re-snapshot cadence is a pure execution detail: every cadence
    yields the identical merge table (the correctness guard for the
    O(n_merges^2) lineage fix)."""
    words = _synthetic_words(spark, 120)
    try:
        base = bpe_train(words, 24, resnapshot_every=10**9)  # never re-snapshot
        for every in (4, 7, 24):
            assert bpe_train(words, 24, resnapshot_every=every) == base
    finally:
        release_snapshots(spark)


@pytest.mark.slow
def test_bpe_128_merge_flat_slope_canary(spark):
    """Per-merge wall time stays flat across a 128-merge budget with the
    default re-snapshot cadence — the directive's canary that the census at
    merge k no longer replays k-1 replace maps.  Windows skip the first 16
    merges (session/codegen warmup) and the bound is generous (3x) because
    fixture-scale merges are scheduling-overhead-dominated."""
    words = _synthetic_words(spark, 400)
    timings: list[float] = []
    try:
        merges = bpe_train(words, 128, resnapshot_every=32, merge_seconds=timings)
        assert len(merges) == 128, "fixture must sustain the full budget"
        assert len(timings) == 128
        early = statistics.mean(timings[16:48])
        late = statistics.mean(timings[96:128])
        assert late <= 3.0 * early, (
            f"per-merge cost grew {late / early:.2f}x across the budget "
            f"(early {early:.3f}s, late {late:.3f}s) - lineage replay is back"
        )
    finally:
        release_snapshots(spark)


def test_bpe_resnapshot_releases_superseded_blocks(spark):
    """Mid-loop re-snapshots FREE the superseded snapshot: after training
    with a tight cadence, at most one tracked vocab snapshot remains pinned
    (plus nothing from the released predecessors)."""
    jsc = spark.sparkContext._jsc

    def live() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    release_snapshots(spark)
    before = live()
    words = _synthetic_words(spark, 120)
    try:
        bpe_train(words, 24, resnapshot_every=4)
        leaked = live() - before
        # one live snapshot (the final one) is the operator's documented
        # contract; 6 would mean the mid-loop releases did not happen
        assert len(leaked) <= 1, f"superseded snapshots still pinned: {leaked}"
    finally:
        release_snapshots(spark)


# --------------------------------------------------------------------------- #
# spread_scan: allowlist plan-tree walk (round-10 ADVICE)                      #
# --------------------------------------------------------------------------- #


def test_spread_scan_ignores_banned_words_in_column_names(spark):
    """The old substring screen false-positived on plans whose COLUMN NAMES
    contain banned node words; the node-name tree walk must not."""
    d = (
        load_table(spark, SF_SMOKE, "documents")
        .select(
            F.col("doc_id").alias("SortKey"),
            F.col("text").alias("JoinHint"),
            F.lit("Aggregate Window Except").alias("Repartition"),
        )
        .filter(F.col("SortKey") >= 0)
    )
    out = spread_scan(d, "SortKey")
    assert out.count() > 0


def test_spread_scan_rejects_expression_subquery(spark):
    """Scalar subqueries live in EXPRESSIONS, not plan children — the walk
    must still refuse them (AQE wraps subquery plans)."""
    load_table(spark, SF_SMOKE, "documents").createOrReplaceTempView("r11_docs")
    d = spark.sql(
        "SELECT doc_id, text FROM r11_docs "
        "WHERE doc_id > (SELECT MIN(doc_id) FROM r11_docs)"
    )
    with pytest.raises(ValueError, match="subquery"):
        spread_scan(d, "doc_id")


def test_spread_scan_rejects_unknown_nodes_by_default(spark):
    """Allowlist semantics: a node the list does not know (here Sort) is
    rejected even though the old denylist would also have caught it — the
    point is future exchange-introducing nodes fail closed."""
    d = load_table(spark, SF_SMOKE, "documents").orderBy("doc_id")
    with pytest.raises(ValueError, match="scan-shaped"):
        spread_scan(d, "doc_id")


# --------------------------------------------------------------------------- #
# cluster_aware_split: LSH-pairs scale variant (round-10 verdict directive #5) #
# --------------------------------------------------------------------------- #


def test_cluster_split_lsh_pairs_equivalent_where_recall_is_1(spark):
    """The 100-TB posture swaps the exact-Jaccard pair graph for the verified
    MinHash-LSH pairs inside the SAME cluster_aware_split machinery.  Both
    produce verified-Jaccard edges, so wherever LSH recall = 1 the edge sets
    — and therefore clusters, reps, sizes, and splits — are identical."""
    from airflow_cms_inpatient_etl_spark.operators.dedup import (
        cluster_aware_split,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    try:
        exact = ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.8)
        lsh = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.8)
        e_pairs = {(r.id1, r.id2) for r in exact.select("id1", "id2").collect()}
        l_pairs = {(r.id1, r.id2) for r in lsh.select("id1", "id2").collect()}
        # precondition the equivalence claim is scoped to: banding missed
        # nothing at >=0.8 on this fixture (RECALL.md tracks this over rounds)
        assert l_pairs == e_pairs, (
            f"LSH recall != 1 on fixture: missed {len(e_pairs - l_pairs)}, "
            f"extra {len(l_pairs - e_pairs)} - equivalence test needs a "
            f"recall-1 slice"
        )
        split_e = {
            tuple(r)
            for r in cluster_aware_split(d, "doc_id", exact, train_pct=90).collect()
        }
        split_l = {
            tuple(r)
            for r in cluster_aware_split(d, "doc_id", lsh, train_pct=90).collect()
        }
        assert split_e == split_l
    finally:
        release_snapshots(spark)


def test_cluster_split_leakage_guarantee(spark):
    """The invariant that holds at EVERY corpus snapshot (unlike rep-hash
    stability, which the round-10 verdict corrected): both ends of every
    near-dup pair land on the same side of the holdout."""
    from airflow_cms_inpatient_etl_spark.operators.dedup import (
        cluster_aware_split,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    try:
        pairs = ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.8)
        split = cluster_aware_split(d, "doc_id", pairs, train_pct=90)
        s1 = split.select(F.col("doc_id").alias("id1"), F.col("split").alias("split1"))
        s2 = split.select(F.col("doc_id").alias("id2"), F.col("split").alias("split2"))
        straddlers = (
            pairs.join(s1, "id1").join(s2, "id2")
            .filter(F.col("split1") != F.col("split2"))
            .count()
        )
        assert straddlers == 0
        # and the pair graph is non-trivial, so the test has teeth
        assert pairs.count() > 0
    finally:
        release_snapshots(spark)


# --------------------------------------------------------------------------- #
# audio-transcript alignment gate (round-10 verdict directive #7)              #
# --------------------------------------------------------------------------- #


def test_audio_transcript_gate_separation(spark):
    """Engineered mis-pairings (every 10th doc gets its neighbour's
    transcript) are separated EXACTLY: matched pairs score 10000 bp, planted
    mismatches score below the gate — and the flag partitions on precisely
    the planted key set."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    out = QUERY_REGISTRY["multimodal_audio_transcript_align"].fn(
        spark, "/root/testdata/sf0.01"
    )
    rows = out.collect()
    assert rows
    for r in rows:
        planted = r["doc_id"] % 10 == 0 and r["transcript_doc"] == r["doc_id"] + 1
        if planted:
            assert not r["is_aligned"] and r["align_bp"] < 5000, r
        else:
            assert r["is_aligned"] and r["align_bp"] == 10000, r
    n_planted = sum(1 for r in rows if not r["is_aligned"])
    assert n_planted > 0, "fixture must plant mismatches for the gate to work on"


def test_audio_transcript_gate_sf01_hash(spark):
    """The new gate at 10x the oracle scale (the round-1 hazard class that
    only appears at sf0.1)."""
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["multimodal_audio_transcript_align"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.1/documents.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "ata:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# corpus_curation_v8 — delta-only recrawl pipeline (round-10 stretch #8)       #
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
def test_curation_v8_hash_across_scales(spark, sf_dir):
    """The delta-only pipeline vs its full-recompute oracle at the two
    non-driver scales (sf0.01 runs in the standard differential)."""
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["corpus_curation_v8"]
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        sp = spec.fn(spark, sf_dir).toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), f"v8:{sf_dir}")
    finally:
        con.close()
        release_snapshots(spark)


def test_curation_v8_gate_does_real_work(spark):
    """Both gate branches are exercised: boilerplate refetches are gated out
    as near-dups of the standing index, novel (reversed-text) changes and
    additions are accepted — and the incremental token identity holds row
    by row (n_tokens_next = carried + accepted)."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    rows = QUERY_REGISTRY["corpus_curation_v8"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    try:
        assert rows
        assert sum(r["n_dup_gated"] for r in rows) > 0, "no refetch was gated"
        assert sum(r["n_accepted"] for r in rows) > 0, "no novel doc survived"
        for r in rows:
            assert r["n_tokens_next"] == r["tokens_carried"] + r["tokens_accepted"]
            assert r["n_delta"] == r["n_dup_gated"] + r["n_accepted"]
            assert 0.0 < r["weight"] < 1.0
    finally:
        release_snapshots(spark)


# --------------------------------------------------------------------------- #
# tokenizer_unigram_viterbi (round-11 addition)                                #
# --------------------------------------------------------------------------- #


def test_unigram_viterbi_dp_equals_exhaustive_on_adversarial_words(spark):
    """The HOF-DP against a python exhaustive search on engineered words —
    including exact (np, score) ties so the lexicographic parts tiebreak is
    actually exercised (the fixture's 30 words may never tie)."""
    from itertools import combinations

    from airflow_cms_inpatient_etl_spark.operators.text import unigram_viterbi_segment

    vocab = [
        ("banana", 5), ("bandana", 2), ("nan", 7), ("ana", 4), ("ban", 1),
        # 'xyxy': 'xy xy' vs 'x yxy'/'xyx y' — piece scores engineered close
        ("xyxy", 3), ("yx", 3),
        # symmetric tie bait: 'abab' with equal-scored 'ab'/'ba' contexts
        ("abab", 2), ("baba", 2),
        ("q0q0q0q0", 1),  # max fixture-like length, repeated structure
    ]
    words = spark.createDataFrame(vocab, schema="w string, freq int")
    got = {
        r["w"]: (r["n_pieces"], r["piece_score"], r["segmentation"])
        for r in unigram_viterbi_segment(words).collect()
    }

    # python exhaustive reference
    score: dict[str, int] = {}
    for w, f in vocab:
        for l in range(1, 5):
            for j in range(len(w) - l + 1):
                score[w[j:j + l]] = score.get(w[j:j + l], 0) + f

    def segmentations(w):
        if not w:
            yield []
            return
        for l in range(1, min(4, len(w)) + 1):
            for rest in segmentations(w[l:]):
                yield [w[:l]] + rest

    for w, f in vocab:
        best = min(
            segmentations(w),
            key=lambda ps: (len(ps), -sum(score[p] for p in ps), " ".join(ps)),
        )
        assert got[w] == (
            len(best),
            sum(score[p] for p in best),
            " ".join(best),
        ), f"{w}: engine {got[w]} != exhaustive {best}"


def test_unigram_viterbi_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["tokenizer_unigram_viterbi"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.1/documents.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "uv:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# stats_bootstrap_ci_price (round-11 addition)                                 #
# --------------------------------------------------------------------------- #


def test_bootstrap_ci_statistical_sanity(spark):
    """The rank-based interval brackets the point mean tightly (n is in the
    tens of thousands per flag, so replica means concentrate ~1/sqrt(n)),
    and the interval is non-degenerate."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    rows = QUERY_REGISTRY["stats_bootstrap_ci_price"].fn(
        spark, "/root/testdata/sf0.1"
    ).collect()
    assert len(rows) == 3  # A / N / R
    for r in rows:
        assert r["ci_lo_cents"] < r["ci_hi_cents"]
        assert r["ci_lo_cents"] <= r["mean_cents"] <= r["ci_hi_cents"]
        halfwidth = (r["ci_hi_cents"] - r["ci_lo_cents"]) / 2
        assert halfwidth / r["mean_cents"] < 0.05, "interval implausibly wide"
        assert halfwidth > 0


def test_bootstrap_ci_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["stats_bootstrap_ci_price"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            "'/root/testdata/sf0.1/lineitem.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "boot:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# sim_matryoshka_topk — prefix-prune / full-rerank retrieval (wave 5)          #
# --------------------------------------------------------------------------- #


def test_matryoshka_exhaustive_overfetch_equals_brute_force(spark):
    """With overfetch large enough that phase 1 keeps every candidate, the
    two-stage rerank must reproduce exact brute-force top-k bit-for-bit —
    proving the rerank stage itself is exact; the registry differential then
    proves the PRUNED variant against the same-pruning oracle."""
    from airflow_cms_inpatient_etl_spark.operators.similarity import (
        brute_force_topk,
        matryoshka_topk,
    )

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    n = e.count()
    mrl = matryoshka_topk(e, q, k=5, prefix_dim=16, overfetch=n).toPandas()
    brute = brute_force_topk(e, q, k=5).toPandas()
    key = lambda df: df.sort_values(["qid", "rn"]).reset_index(drop=True)
    a, b = key(mrl), key(brute)
    assert a[["qid", "cid", "rn"]].equals(b[["qid", "cid", "rn"]])
    assert (a["cosine"] == b["cosine"]).all()  # bit-exact, same fold


def test_matryoshka_results_come_from_prefix_survivors(spark):
    """Every returned hit must be inside the phase-1 prefix-cosine top-
    (k*overfetch) set for its query — the structural prune invariant."""
    from pyspark.sql import Window as W

    from airflow_cms_inpatient_etl_spark.operators.similarity import (
        dot,
        matryoshka_topk,
        norm,
    )

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    out = matryoshka_topk(e, q, k=3, prefix_dim=16, overfetch=4).toPandas()

    pre = F.slice(F.col("embedding"), 1, 16)
    qs = q.select(
        F.col("vec_id").alias("qid"), pre.alias("qpre"), norm(pre).alias("qpn")
    )
    cs = e.select(
        F.col("vec_id").alias("cid"), pre.alias("cpre"), norm(pre).alias("cpn")
    )
    w = W.partitionBy("qid").orderBy(
        (dot(F.col("qpre"), F.col("cpre")) / (F.col("qpn") * F.col("cpn"))).desc(),
        F.col("cid"),
    )
    survivors = (
        cs.crossJoin(F.broadcast(qs))
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("prn", F.row_number().over(w))
        .filter(F.col("prn") <= 12)
        .select("qid", "cid")
        .toPandas()
    )
    allowed = set(map(tuple, survivors.values))
    assert all((r.qid, r.cid) in allowed for r in out.itertuples())


def test_matryoshka_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["sim_matryoshka_topk"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            "'/root/testdata/sf0.1/embeddings.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "mrl:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# multimodal_scene_cuts — video shot segmentation (wave 5)                     #
# --------------------------------------------------------------------------- #


def test_scene_cuts_python_reference(spark):
    """Recompute scene segmentation with a direct python loop over the same
    stub feature and compare every scene row — independent of both engines'
    window machinery."""
    from airflow_cms_inpatient_etl_spark.operators.multimodal import (
        attach_binary_payload,
        scene_cut_segments,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r.doc_id, r.scene_id): (r.start_frame, r.end_frame, r.scene_frames, r.sum_intensity)
        for r in scene_cut_segments(attach_binary_payload(d)).collect()
    }

    docs = d.select("doc_id", "text").collect()
    want = {}
    for row in docs:
        n_bytes = len(row.text.encode("utf-8"))
        n_frames = n_bytes // 100 + 1
        scene, prev = 0, None
        agg = {}
        for idx in range(n_frames):
            inten = (n_bytes * (idx + 1)) % 251
            if prev is not None and abs(inten - prev) > 125:
                scene += 1
            prev = inten
            s = agg.setdefault(scene, [idx, idx, 0, 0])
            s[1], s[2], s[3] = idx, s[2] + 1, s[3] + inten
        for scene_id, (a, b, n, tot) in agg.items():
            want[(row.doc_id, scene_id)] = (a, b, n, tot)
    assert got == want


def test_scene_cuts_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["multimodal_scene_cuts"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.1/documents.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "scenes:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# layout_zorder_locality — Morton shard manifest (wave 6)                      #
# --------------------------------------------------------------------------- #


def test_zorder_python_reference_and_locality(spark):
    """Recompute quantization + bit interleave + boundary sharding in plain
    python (independent of both engines' SQL) and compare the full manifest;
    then assert the locality property z-order exists for: every shard's span
    is narrow on BOTH dimensions (vs a 1-D sort, which leaves the second
    dimension spanning ~the whole domain)."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    got = {
        r.shard_id: (r.n_rows, r.z_lo, r.z_hi, r.cust_lo, r.cust_hi, r.cents_lo, r.cents_hi)
        for r in QUERY_REGISTRY["layout_zorder_locality"].fn(spark, SF_SMOKE).collect()
    }

    import decimal

    rows = [
        (r.o_custkey, int(decimal.Decimal(str(round(r.o_totalprice, 2))) * 100))
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    ]
    lo_c, hi_c = min(r[0] for r in rows), max(r[0] for r in rows)
    lo_p, hi_p = min(r[1] for r in rows), max(r[1] for r in rows)

    def z(c, p):
        qc = ((c - lo_c) * 256) // (hi_c - lo_c + 1)
        qp = ((p - lo_p) * 256) // (hi_p - lo_p + 1)
        out = 0
        for b in range(8):
            out |= ((qc >> b) & 1) << (2 * b)
            out |= ((qp >> b) & 1) << (2 * b + 1)
        return out

    zs = sorted(z(c, p) for c, p in rows)
    n = len(zs)
    import bisect

    bounds = []
    for i in range(1, 8):
        target = (i * n + 7) // 8
        # min zkey value whose cumulative count reaches target
        bounds.append(zs[target - 1])
    want = {}
    for (c, p) in rows:
        zk = z(c, p)
        shard = 1 + sum(1 for b in bounds if zk > b)
        s = want.setdefault(shard, [0, zk, zk, c, c, p, p])
        s[0] += 1
        s[1], s[2] = min(s[1], zk), max(s[2], zk)
        s[3], s[4] = min(s[3], c), max(s[4], c)
        s[5], s[6] = min(s[5], p), max(s[6], p)
    want = {k: tuple(v) for k, v in want.items()}
    assert got == want

    # locality: median per-shard span is well under the full domain on BOTH dims
    cust_spans = sorted((v[4] - v[3]) / max(hi_c - lo_c, 1) for v in got.values())
    cents_spans = sorted((v[6] - v[5]) / max(hi_p - lo_p, 1) for v in got.values())
    assert cust_spans[len(cust_spans) // 2] < 0.75
    assert cents_spans[len(cents_spans) // 2] < 0.75


def test_zorder_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["layout_zorder_locality"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            "'/root/testdata/sf0.1/orders.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "zorder:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# graph_label_propagation — synchronous LPA (wave 7)                           #
# --------------------------------------------------------------------------- #


def test_lpa_python_reference(spark):
    """Recompute 3 synchronous LPA rounds with plain python dicts over the
    same transition graph and compare every node's community — independent of
    both engines' join/window machinery; also asserts the run does real work
    (some labels move off the identity and a community has > 1 member)."""
    from collections import defaultdict

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
    from airflow_cms_inpatient_etl_spark.queries.curation2 import _transition_graph

    got = {
        r.node: (r.label, r.community_size)
        for r in QUERY_REGISTRY["graph_label_propagation"].fn(spark, SF_SMOKE).collect()
    }

    _, edges_df, nodes_df = _transition_graph(spark, SF_SMOKE)
    nodes = [r.node for r in nodes_df.collect()]
    sym = defaultdict(int)
    for r in edges_df.collect():
        if r.src != r.dst:
            sym[(r.src, r.dst)] += r.w
            sym[(r.dst, r.src)] += r.w
    nbrs = defaultdict(list)
    for (u, v), w in sym.items():
        nbrs[v].append((u, w))  # incident weight arriving at v from u
    label = {n: n for n in nodes}
    for _ in range(3):
        nxt = {}
        for n in nodes:
            census = defaultdict(int)
            for u, w in nbrs[n]:
                census[label[u]] += w
            if census:
                # max weight, tie -> smallest label
                nxt[n] = min(census, key=lambda L: (-census[L], L))
            else:
                nxt[n] = label[n]
        label = nxt
    sizes = defaultdict(int)
    for n in nodes:
        sizes[label[n]] += 1
    want = {n: (label[n], sizes[label[n]]) for n in nodes}
    assert got == want
    assert any(label[n] != n for n in nodes)
    assert max(sizes.values()) > 1


def test_lpa_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["graph_label_propagation"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.1/events.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "lpa:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# ml_auc_exact — tie-corrected Mann-Whitney ROC-AUC (wave 7)                   #
# --------------------------------------------------------------------------- #


def test_auc_python_reference(spark):
    """Recompute the per-dow AUC with a direct O(n log n) python
    implementation of tie-averaged ranks and compare bit-for-bat — plus
    sanity bounds (0 <= auc <= 1, counts add up)."""
    from collections import defaultdict

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    got = {
        r.dow: (r.n_pos, r.n_neg, r.auc_num2, r.auc)
        for r in QUERY_REGISTRY["ml_auc_exact"].fn(spark, SF_SMOKE).collect()
    }

    import decimal

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .select(F.dayofweek("ts").alias("dow"), "value", "event_type")
        .collect()
    )
    by_dow = defaultdict(list)
    for r in rows:
        cents = int(decimal.Decimal(str(round(r.value, 2))) * 100)
        by_dow[r.dow].append((cents, 1 if r.event_type == "purchase" else 0))
    want = {}
    for dow, data in by_dow.items():
        data.sort()
        n = len(data)
        npos = sum(p for _, p in data)
        nneg = n - npos
        if npos == 0 or nneg == 0:
            continue
        # tie-averaged ranks, x2 to stay integral
        rs2 = 0
        i = 0
        while i < n:
            j = i
            while j < n and data[j][0] == data[i][0]:
                j += 1
            # group ranks i+1..j (1-based); 2*avg_rank = (i+1) + j
            grp_pos = sum(p for _, p in data[i:j])
            rs2 += grp_pos * ((i + 1) + j)
            i = j
        num2 = rs2 - npos * (npos + 1)
        want[dow] = (npos, nneg, num2, num2 / (2 * npos * nneg))
    assert got == want
    for npos, nneg, num2, auc in got.values():
        assert 0.0 <= auc <= 1.0


def test_auc_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["ml_auc_exact"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.1/events.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "auc:sf0.1")
    finally:
        con.close()


def test_target_encoding_loo_no_self_leakage(spark):
    """Structural leakage check: for every order, the LOO encoding must not
    include the row's own cents — verified by reconstructing the category
    mean WITH the row and asserting enc differs whenever cents differs from
    the category mean (plus exact identity loo_sum = cat_sum - cents)."""
    from collections import defaultdict

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    rows = QUERY_REGISTRY["ml_target_encoding_loo"].fn(spark, SF_SMOKE).collect()
    cat_sum = defaultdict(int)
    cat_cnt = defaultdict(int)
    for r in rows:
        cat_sum[r.nation] += r.cents
        cat_cnt[r.nation] += 1
    for r in rows:
        assert r.loo_sum_cents == cat_sum[r.nation] - r.cents
        assert r.loo_cnt == cat_cnt[r.nation] - 1
        if r.loo_cnt > 0:
            assert r.enc == r.loo_sum_cents / r.loo_cnt


def test_target_encoding_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["ml_target_encoding_loo"]
    con = duckdb.connect()
    try:
        for t in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.1/{t}.parquet'"
            )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "loo:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# dedup_winnowing — MOSS robust fingerprints (wave 8)                          #
# --------------------------------------------------------------------------- #


def test_winnowing_shared_run_guarantee(spark):
    """Schleimer et al.'s core guarantee: any shared run of window+k-1 = 6
    words yields at least one IDENTICAL selected fingerprint in both
    documents — even when the run sits at different positions (winnowing is
    position-robust).  Construct doc pairs embedding the same 8-word run at
    different offsets amid different noise and assert overlap; a control
    pair with no shared run must share nothing."""
    from airflow_cms_inpatient_etl_spark.operators.dedup import winnow_fingerprints

    run = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, "x1 y1 z1 " + run + " q1 r1"),
        (2, "a2 b2 c2 d2 e2 f2 " + run),
        (3, "unrelated words only here nothing shared at all"),
        (4, "totally different content again nothing in common whatsoever"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fps = winnow_fingerprints(df, "doc_id", "text", k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fh)
    assert by_doc[1] & by_doc[2], "shared 8-word run must share a fingerprint"
    assert not (by_doc[3] & by_doc[4])
    assert not (by_doc[1] & by_doc[3])


def test_winnowing_density(spark):
    """Selected fingerprints must be a small fraction of grams (the point of
    winnowing): expected density 2/(w+1) = 0.4; assert well under 1.0 and
    above the theoretical floor 1/w."""
    from airflow_cms_inpatient_etl_spark.operators.dedup import winnow_fingerprints
    from airflow_cms_inpatient_etl_spark.operators.text import shingles, words

    d = load_table(spark, SF_SMOKE, "documents")
    n_grams = (
        d.select(F.explode(shingles(words(F.col("text")), 3))).count()
    )
    n_sel = winnow_fingerprints(d, "doc_id", "text", k=3, window=4).count()
    assert 0.25 * n_grams * 0.9 <= n_sel <= 0.6 * n_grams


def test_winnowing_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["dedup_winnowing"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.1/documents.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "winnow:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# sample_kcenter_diverse — Gonzalez greedy coreset (wave 9)                    #
# --------------------------------------------------------------------------- #


def test_kcenter_python_reference(spark):
    """Replay the greedy trajectory in plain python (numpy-free exact float
    arithmetic over the same fold order) and compare every pick and radius;
    then assert the greedy invariants: radii are non-increasing from rank 2
    on, and all picks are distinct."""
    from airflow_cms_inpatient_etl_spark.operators.similarity import kcenter_select

    e = load_table(spark, SF_SMOKE, "embeddings")
    got = kcenter_select(e, k=6)

    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in e.collect()}

    def l2sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    first = min(vecs)
    picks = [(0, first, 0.0)]
    dmin = {v: l2sq(vecs[v], vecs[first]) for v in vecs}
    for rank in range(1, 6):
        best = max(sorted(dmin), key=lambda v: (dmin[v], -v))
        picks.append((rank, best, dmin[best]))
        for v in vecs:
            d = l2sq(vecs[v], vecs[best])
            if d < dmin[v]:
                dmin[v] = d
    assert got == picks
    radii = [r for _, _, r in got[1:]]
    assert all(radii[i] >= radii[i + 1] for i in range(len(radii) - 1))
    assert len({v for _, v, _ in got}) == 6


def test_kcenter_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["sample_kcenter_diverse"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            "'/root/testdata/sf0.1/embeddings.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "kcenter:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# text_textrank_keywords — PageRank-composed keyword extraction (wave 9)       #
# --------------------------------------------------------------------------- #


def test_textrank_python_reference(spark):
    """Replay the full TextRank pipeline (tokenize -> co-occurrence graph ->
    4 integer PageRank rounds -> top-20) in plain python integer arithmetic
    and compare every (word, rank, rn) row."""
    from collections import defaultdict

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    got = [
        (r.word, r.rank, r.rn)
        for r in QUERY_REGISTRY["text_textrank_keywords"].fn(spark, SF_SMOKE).collect()
    ]

    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    edges = defaultdict(int)
    for row in docs:
        toks = [t for t in row.text.strip().lower().split() if len(t) >= 4]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges[(a, b)] += 1
                edges[(b, a)] += 1
    nodes = sorted({s for s, _ in edges})
    outw = defaultdict(int)
    for (s, _), w in edges.items():
        outw[s] += w
    scale, d = 10**12, 85
    n = len(nodes)
    rank = {v: scale // n for v in nodes}
    for _ in range(4):
        inbound = defaultdict(int)
        for (s, t), w in edges.items():
            inbound[t] += rank[s] * w // outw[s]
        rank = {v: (15 * (scale // n)) // 100 + d * inbound[v] // 100 for v in nodes}
    top = sorted(nodes, key=lambda v: (-rank[v], v))[:20]
    want = [(v, rank[v], i + 1) for i, v in enumerate(top)]
    assert got == want


def test_textrank_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["text_textrank_keywords"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.1/documents.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "textrank:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# dq_l_diversity — sensitive-attribute diversity gate (wave 9)                 #
# --------------------------------------------------------------------------- #


def test_l_diversity_python_reference(spark):
    """Recompute the census/roll-up in python and check the gate fires for
    the right reason on constructed classes: low distinct count AND
    single-value dominance must both flag; a balanced class must pass."""
    from airflow_cms_inpatient_etl_spark.plans.dq import l_diversity_profile

    rows = (
        # class A: 4 rows, 1 sensitive value -> l=1 at risk
        [("A", "x", 1)] * 4
        # class B: 6 rows, 3 values but one covers 4/6 > half -> dominance risk
        + [("B", "x", 1)] * 4 + [("B", "x", 2), ("B", "x", 3)]
        # class C: 6 rows, 3 values, max 2 of 6 -> passes
        + [("C", "x", 1), ("C", "x", 1), ("C", "x", 2), ("C", "x", 2), ("C", "x", 3), ("C", "x", 3)]
    )
    df = spark.createDataFrame(rows, ["q1", "q2", "sens"])
    got = {r.q1: (r.class_size, r.l_distinct, r.top_sensitive_n, r.at_risk)
           for r in l_diversity_profile(df, ["q1", "q2"], "sens", l=3).collect()}
    assert got["A"] == (4, 1, 4, True)
    assert got["B"] == (6, 3, 4, True)
    assert got["C"] == (6, 3, 2, False)


def test_l_diversity_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["dq_l_diversity"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM "
            "'/root/testdata/sf0.1/customer.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "ldiv:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# streaming_heavy_hitters_live — CMS as streaming state (wave 10)              #
# --------------------------------------------------------------------------- #


def test_streaming_heavy_hitters_equals_batch(spark):
    """The live two-micro-batch CMS run must produce the SAME final table as
    the batch heavy_hitters_cms query (cell updates are associative adds, so
    batching is invisible) — the multiset equality that justifies reusing
    the batch oracle."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    live = sorted(
        map(tuple, QUERY_REGISTRY["streaming_heavy_hitters_live"]
            .fn(spark, SF_SMOKE).toPandas().values.tolist())
    )
    batch = sorted(
        map(tuple, QUERY_REGISTRY["heavy_hitters_cms"]
            .fn(spark, SF_SMOKE).toPandas().values.tolist())
    )
    assert live == batch and len(live) > 0


# --------------------------------------------------------------------------- #
# ivm_join_view_delta — bilinear join-view maintenance (wave 10)               #
# --------------------------------------------------------------------------- #


def test_ivm_join_delta_terms_all_nonempty(spark):
    """The delta algebra is only proven if every term does work: each of the
    four partial aggregates (old⋈old, dO⋈L, O⋈dL, dO⋈dL) must contribute
    rows at the smoke scale — in particular the doubly-new dO⋈dL corner the
    naive implementation drops; dropping any term must change the result."""
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long").alias("cents"),
    )
    d_o = o.filter(F.col("o_orderkey") % 17 == 0)
    old_o = o.filter(F.col("o_orderkey") % 17 != 0)
    d_l = li.filter(F.col("l_orderkey") % 23 == 0)
    old_l = li.filter(F.col("l_orderkey") % 23 != 0)
    counts = {
        "old_old": old_o.join(old_l, old_o.o_orderkey == old_l.l_orderkey).count(),
        "d_old": d_o.join(old_l, d_o.o_orderkey == old_l.l_orderkey).count(),
        "old_d": old_o.join(d_l, old_o.o_orderkey == d_l.l_orderkey).count(),
        "d_d": d_o.join(d_l, d_o.o_orderkey == d_l.l_orderkey).count(),
    }
    assert all(v > 0 for v in counts.values()), counts
    full = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert sum(counts.values()) == full


def test_ivm_join_delta_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["ivm_join_view_delta"]
    con = duckdb.connect()
    try:
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.1/{t}.parquet'"
            )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "ivm:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# split_temporal_embargo — purged time split (wave 10)                         #
# --------------------------------------------------------------------------- #


def test_temporal_embargo_hard_gap(spark):
    """The leakage guarantee: every test event is at least the embargo gap
    after every train event, and the three splits partition the table."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
    from airflow_cms_inpatient_etl_spark.queries.pipeline import _EMBARGO_US

    rows = {
        r.split: r
        for r in QUERY_REGISTRY["split_temporal_embargo"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"train", "embargoed", "test"}
    assert rows["train"].hi_us + _EMBARGO_US <= rows["test"].lo_us
    total = sum(r.n_events for r in rows.values())
    n_all = load_table(spark, SF_SMOKE, "events").count()
    assert total == n_all


def test_temporal_embargo_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["split_temporal_embargo"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.1/events.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "embargo:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# recsys_negative_samples + ml_calibration_bins (wave 11)                      #
# --------------------------------------------------------------------------- #


def test_negative_samples_never_positive(spark):
    """The false-negative filter is the point: no emitted negative may be a
    true positive for its user, draws stay within the item vocabulary, and
    the sampler is reproducible run to run."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    fn = QUERY_REGISTRY["recsys_negative_samples"].fn
    out = fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    pos = {
        (r.user_id, r.item)
        for r in ev.filter(F.col("event_type") == "click")
        .select("user_id", F.get_json_object("props", "$.k").cast("long").alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
        .collect()
    }
    items = {i for _, i in pos}
    assert len(out) > 0
    for r in out:
        assert (r.user_id, r.neg_item) not in pos
        assert r.neg_item in items
        assert 1 <= r.draw <= 3
    again = fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_calibration_bins_partition_and_bounds(spark):
    """Bins partition the rows, ppm columns are exact integer ratios, and
    bin means sit inside their bin's score range."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    rows = QUERY_REGISTRY["ml_calibration_bins"].fn(spark, SF_SMOKE).collect()
    n_all = (
        load_table(spark, SF_SMOKE, "events").filter(F.col("value").isNotNull()).count()
    )
    assert sum(r.n for r in rows) == n_all
    for r in rows:
        assert 0 <= r.bin <= 9
        assert r.pos_rate_ppm == r.n_pos * 1_000_000 // r.n
        lo, hi = r.bin * 100_000, (r.bin + 1) * 100_000
        assert lo <= r.mean_score_ppm < hi


def test_negative_samples_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["recsys_negative_samples"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.1/events.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "negs:sf0.1")
    finally:
        con.close()


def test_calibration_bins_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["ml_calibration_bins"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.1/events.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "calib:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# sim_ivfpq_residual_topk — FAISS-shape composite index (wave 12)              #
# --------------------------------------------------------------------------- #


def test_ivfpq_candidates_stay_in_list_and_recall(spark):
    """Structural: every returned candidate shares the query's inverted list
    (nprobe=1), every query with a non-singleton list returns k hits, and
    the residual-PQ ranking is measured against the in-list exact ranking —
    the synthetic gaussian fixture is PQ's documented adversarial case
    (RECALL.md: pairwise distances concentrate, raw-PQ recall 0.06-0.31), so
    this asserts the pipeline produces full result sets and SOME true
    neighbors, not a recall bar the data cannot support."""
    from airflow_cms_inpatient_etl_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
    )
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    e = load_table(spark, SF_SMOKE, "embeddings")
    got = QUERY_REGISTRY["sim_ivfpq_residual_topk"].fn(spark, SF_SMOKE).collect()
    assigned = {
        r.vec_id: r.centroid_id
        for r in ivf_assign(e, e.filter(F.col("vec_id").between(100, 107))).collect()
    }
    for r in got:
        assert assigned[r.qid] == assigned[r.cid]
    exact = ivf_topk(
        e, e.filter(F.col("vec_id") < 8), e.filter(F.col("vec_id").between(100, 107)), k=3
    ).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.cid)
    mine = {}
    for r in got:
        mine.setdefault(r.qid, set()).add(r.cid)
    hits = sum(len(mine[q] & truth[q]) for q in truth if q in mine)
    assert set(mine) == set(truth)
    assert all(len(v) == 3 for v in mine.values())
    assert hits >= 1


def test_ivfpq_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["sim_ivfpq_residual_topk"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            "'/root/testdata/sf0.1/embeddings.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "ivfpq:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# multimodal_scene_keyframes — detect→select video pair (wave 12)              #
# --------------------------------------------------------------------------- #


def test_scene_keyframes_inside_scene_and_maximal(spark):
    """Every keyframe must lie inside its scene's frame span, carry that
    scene's maximum intensity, and be the earliest frame achieving it —
    checked against the python frame walk."""
    from airflow_cms_inpatient_etl_spark.operators.multimodal import (
        attach_binary_payload,
        scene_cut_segments,
        scene_keyframes,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    mm = attach_binary_payload(d)
    spans = {
        (r.doc_id, r.scene_id): (r.start_frame, r.end_frame)
        for r in scene_cut_segments(mm).collect()
    }
    keys = scene_keyframes(mm).collect()
    assert len(keys) == len(spans)
    docs = {r.doc_id: len(r.text.encode("utf-8")) for r in d.select("doc_id", "text").collect()}
    for r in keys:
        lo, hi = spans[(r.doc_id, r.scene_id)]
        assert lo <= r.keyframe_idx <= hi
        n_bytes = docs[r.doc_id]
        inten = lambda idx: (n_bytes * (idx + 1)) % 251
        assert r.keyframe_intensity == inten(r.keyframe_idx)
        assert all(inten(i) <= r.keyframe_intensity for i in range(lo, hi + 1))
        firsts = [i for i in range(lo, hi + 1) if inten(i) == r.keyframe_intensity]
        assert r.keyframe_idx == firsts[0]


def test_scene_keyframes_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["multimodal_scene_keyframes"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.1/documents.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "keyframes:sf0.1")
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# text_concordance_kwic — keyword-in-context (wave 13)                         #
# --------------------------------------------------------------------------- #


def test_kwic_python_reference(spark):
    """Recompute the concordance in plain python — term argmax, every
    occurrence, boundary-clamped 3-word contexts — and compare all rows."""
    from collections import Counter

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    got = sorted(
        (r.doc_id, r.pos, r.term, r.left_ctx, r.right_ctx)
        for r in QUERY_REGISTRY["text_concordance_kwic"].fn(spark, SF_SMOKE).collect()
    )
    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    counts = Counter(w for toks in docs.values() for w in toks if len(w) >= 4)
    term = min(counts, key=lambda w: (-counts[w], w))
    want = []
    for doc_id, toks in docs.items():
        for i, w in enumerate(toks):
            if w == term:
                pos = i + 1
                left = " ".join(toks[max(i - 3, 0):i])
                right = " ".join(toks[i + 1:i + 4])
                want.append((doc_id, pos, term, left, right))
    assert got == sorted(want)
    assert any(l == "" for _, _, _, l, _ in got) or any(
        r == "" for *_, r in got
    ), "fixture should exercise at least one boundary context"


def test_kwic_sf01_hash(spark):
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    spec = QUERY_REGISTRY["text_concordance_kwic"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.1/documents.parquet'"
        )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), "kwic:sf0.1")
    finally:
        con.close()


def test_residualize_promotes_before_subtract(spark):
    """The documented 1-ulp hazard: float32-subtract-then-promote differs
    from promote-then-subtract whenever the float32 difference rounds.
    Construct such a pair and assert the operator produces the
    promote-first value (what the DuckDB oracle computes), not the
    float32-rounded one."""
    import struct

    a32 = struct.unpack("f", struct.pack("f", 0.1))[0]   # float32(0.1)
    b32 = struct.unpack("f", struct.pack("f", 0.3))[0]   # float32(0.3)
    promote_first = float(a32) - float(b32)
    f32_first = struct.unpack("f", struct.pack("f", a32 - b32))[0]
    assert promote_first != f32_first, "fixture must hit the rounding trap"

    from airflow_cms_inpatient_etl_spark.operators.similarity import residualize

    assigned = spark.createDataFrame(
        [(1, [a32] * 64, 100)], "vec_id long, embedding array<float>, centroid_id long"
    )
    cents = spark.createDataFrame(
        [(100, [b32] * 64)], "vec_id long, embedding array<float>"
    )
    out = residualize(assigned, cents).collect()[0]
    assert all(v == promote_first for v in out.embedding)
