"""Round-7 additions: the BPE apply encoder, its curation-v6 composition,
and the rolling-hash CDC chunker's recurrence equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
from tests.conftest import SF_ORACLE


# ---------------------------------------------------------------------------
# BPE apply
# ---------------------------------------------------------------------------


def _ref_bpe(word: str, merges) -> list[str]:
    """Classic rescan-from-lowest-rank BPE apply (Sennrich ACL'16): repeatedly
    merge the lowest-rank adjacent pair present until none applies."""
    rank = {m: i for i, m in enumerate(merges)}
    toks = list(word)
    while True:
        best, best_i = None, None
        for i in range(len(toks) - 1):
            r = rank.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            return toks
        a, b = merges[best]
        # merge ALL non-overlapping occurrences of this pair left-to-right
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out


def test_bpe_sequential_passes_equal_classic_bpe(spark):
    """The static replace chain applies merges one exhaustive pass per rank;
    topological consistency of the merge table makes that equivalent to the
    classic rescan algorithm — asserted word-by-word against a reference
    implementation over every distinct fixture word."""
    from airflow_cms_inpatient_etl_spark.queries.analytics import (
        _BPE_MERGES,
        bpe_token_count_spark,
    )

    # the topological precondition itself: every compound input is produced
    # by a strictly lower rank (single chars are rank -1 by definition)
    produced = {a + b: i for i, (a, b) in enumerate(_BPE_MERGES)}
    for i, (a, b) in enumerate(_BPE_MERGES):
        for part in (a, b):
            if len(part) > 1:
                assert produced.get(part, 10**9) < i, (part, i)

    words = [
        r["w"]
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
        .filter("w != ''")
        .distinct()
        .collect()
    ]
    assert len(words) > 10
    got = {
        r["w"]: r["n"]
        for r in spark.createDataFrame([(w,) for w in words], ["w"])
        .select("w", F.expr(bpe_token_count_spark("w")).alias("n"))
        .collect()
    }
    for w in words:
        assert got[w] == len(_ref_bpe(w, _BPE_MERGES)), w


def test_bpe_known_words_reach_single_token(spark):
    from airflow_cms_inpatient_etl_spark.queries.analytics import bpe_token_count_spark

    rows = spark.createDataFrame(
        [("table",), ("hash",), ("sort",), ("spark",), ("window",), ("zzz",), ("|",)],
        ["w"],
    ).select("w", F.expr(bpe_token_count_spark("w")).alias("n")).collect()
    got = {r["w"]: r["n"] for r in rows}
    assert got["table"] == 1
    assert got["hash"] == 1
    # rank order is load-bearing: the early (o,r)/(a,r) merges preempt the
    # s-o-r-t / s-p-a-r-k chains exactly as classic BPE would
    assert got["sort"] == 3      # [s, or, t]
    assert got["spark"] == 3     # [s, par, k]
    assert got["window"] == 1
    assert got["zzz"] == 3       # no merge covers zz
    assert got["|"] == 1         # delimiter fallback: one opaque token


def test_bpe_counts_bounded_by_chars_and_words(spark):
    df = QUERY_REGISTRY["bpe_apply_encode"].fn(spark, SF_ORACLE)
    bad = df.filter(
        (F.col("bpe_tokens") < F.col("ws_tokens")) & (F.col("ws_tokens") > 0)
    ).count()
    assert bad == 0, "a word can never encode to fewer than one token"
    joined = df.join(
        QUERY_REGISTRY["bpe_apply_encode"]
        .fn(spark, SF_ORACLE)
        .sparkSession.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", "n_chars"),
        "doc_id",
    )
    assert joined.filter(F.col("bpe_tokens") > F.col("n_chars")).count() == 0


def test_bpe_encoder_is_shuffle_free(spark):
    """The encode pass must stay a pure map: no aggregation/join exchange.

    Round 9 added the guarded degenerate-scan repartition
    (``sources.registry.spread_scan``) in front of the per-token fold, so
    locally — where the fixture is a single unsplittable parquet file — the
    plan legitimately contains exactly one REPARTITION exchange that a
    multi-split production scan would not have.  The invariant this test
    protects is unchanged: nothing in the encode itself shuffles."""
    plan = (
        QUERY_REGISTRY["bpe_apply_encode"]
        .fn(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchanges = [ln.strip() for ln in plan.splitlines() if "Exchange" in ln]
    assert all("REPARTITION" in ln for ln in exchanges), (
        "the tokenizer encode pass must be a pure map aside from the "
        f"spread_scan guard; found exchanges: {exchanges}"
    )
    assert len(exchanges) <= 1, f"expected at most the spread_scan guard: {exchanges}"


# ---------------------------------------------------------------------------
# curation v6
# ---------------------------------------------------------------------------


def test_v6_shards_respect_budget_overhang(spark):
    """Greedy prefix packing: every shard except a bucket's last holds at
    least the budget minus one doc's overhang; shard ids are dense from 0."""
    from airflow_cms_inpatient_etl_spark.queries.pipeline import _V6_BUDGET

    m = QUERY_REGISTRY["corpus_curation_v6"].fn(spark, SF_ORACLE).collect()
    assert m
    by_bucket: dict = {}
    for r in m:
        by_bucket.setdefault((r["lang"], r["bucket"]), []).append(r)
    for (lang, bucket), rows in by_bucket.items():
        shards = sorted(r["shard"] for r in rows)
        assert shards == list(range(len(shards))), (lang, bucket, shards)
        for r in rows:
            if r["shard"] != max(shards):
                # a non-final shard only closes once its cumulative total
                # crossed the budget boundary
                assert r["shard_tokens"] > 0
    total = sum(r["shard_tokens"] for r in m)
    assert total > 0


def test_v6_gate_and_dedup_monotone(spark):
    """v6's survivors are a subset of the encoded corpus: manifest token mass
    never exceeds the corpus BPE token mass, and duplicate texts contribute
    once."""
    enc = QUERY_REGISTRY["bpe_apply_encode"].fn(spark, SF_ORACLE)
    corpus_tokens = enc.agg(F.sum("bpe_tokens")).collect()[0][0]
    manifest = QUERY_REGISTRY["corpus_curation_v6"].fn(spark, SF_ORACLE)
    kept_tokens = manifest.agg(F.sum("shard_tokens")).collect()[0][0]
    assert 0 < kept_tokens <= corpus_tokens


# ---------------------------------------------------------------------------
# rolling-hash CDC chunker
# ---------------------------------------------------------------------------


def test_cdc_rolling_recurrence_matches_direct_definition(spark):
    """The O(1) rolling update must equal the O(W) window-hash definition at
    every position — checked here in-engine (the DuckDB oracle re-proves it
    cross-engine)."""
    from airflow_cms_inpatient_etl_spark.queries.multimodal import (
        _CDC_B,
        _CDC_BW,
        _CDC_D,
        _CDC_M,
        _CDC_POWS,
        _CDC_W,
    )

    assert _CDC_BW == pow(_CDC_B, _CDC_W, _CDC_M)
    import random

    rng = random.Random(7)
    texts = [
        "".join(rng.choice("abcdefgh ") for _ in range(n)) for n in (0, 3, 8, 9, 57, 400)
    ]
    for s in texts:
        h = 0
        rolling = []
        for p in range(1, len(s) + 1):
            h = (
                h * _CDC_B
                + ord(s[p - 1])
                - (ord(s[p - 1 - _CDC_W]) * _CDC_BW if p > _CDC_W else 0)
            ) % _CDC_M
            if p >= _CDC_W:
                direct = (
                    sum(ord(s[p - 1 - j]) * _CDC_POWS[j] for j in range(_CDC_W)) % _CDC_M
                )
                assert h == direct, (s, p)
                if h % _CDC_D == 0:
                    rolling.append(p)
        # and the engine agrees with the host-language recurrence
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [s]}))
        from airflow_cms_inpatient_etl_spark.queries.multimodal import (
            multimodal_cdc_chunk_dedup,  # noqa: F401  (import proves registration)
        )

        newh = (
            f"pmod(acc.h * {_CDC_B} + ascii(c) - IF(acc.p + 1 > {_CDC_W}, "
            f"ascii(element_at(cs, acc.p + 1 - {_CDC_W})) * {_CDC_BW}L, 0L), {_CDC_M}L)"
        )
        fold = (
            f"aggregate(cs, named_struct('p', 0, 'h', cast(0 as bigint), "
            f"'ends', cast(array() as array<int>)), (acc, c) -> named_struct("
            f"'p', acc.p + 1, 'h', {newh}, "
            f"'ends', IF(acc.p + 1 >= {_CDC_W} AND pmod({newh}, {_CDC_D}) = 0, "
            f"concat(acc.ends, array(acc.p + 1)), acc.ends)), acc -> acc.ends)"
        )
        got = (
            df.select(F.split("text", "").alias("cs"))
            .select(F.expr(fold).alias("ends"))
            .collect()[0]["ends"]
        )
        assert got == rolling, s


# ---------------------------------------------------------------------------
# round-7 wave 2: cluster canonical, funnel, datacard, TPC-H plan families
# ---------------------------------------------------------------------------


def test_cluster_canonical_transitive_chain(spark, tmp_path):
    """A near-dup CHAIN (A~B, B~C, A!~C) must land in ONE cluster with ONE
    canonical — the case pairwise-greedy dedup breaks on."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    words = base.split()
    mid = words[:]; mid[-1] = "changed"               # ~A
    far = mid[:]; far[0] = "mutated"                  # ~mid, further from A
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 99],
            "text": [" ".join(words), " ".join(mid), " ".join(far), "totally different content here"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(" ".join(words)), len(" ".join(mid)), len(" ".join(far)), 30],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = QUERY_REGISTRY["dedup_cluster_canonical"].fn(spark, str(tmp_path)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 99 not in by_id, "singleton must not enter the cluster output"
    assert len(out) >= 2
    clusters = {r["cluster_id"] for r in out}
    assert len(clusters) == 1, "chain must close transitively into one cluster"
    canon = [r for r in out if r["is_canonical"]]
    assert len(canon) == 1
    sizes = {r["cluster_size"] for r in out}
    assert sizes == {len(out)}


def test_funnel_windows_share_one_exchange(spark):
    """The three stacked per-user window minima must reuse a single user-keyed
    exchange — a funnel that re-shuffles per step triples the dominant cost."""
    df = QUERY_REGISTRY["events_funnel_steps"].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_user_exchanges = plan.count("hashpartitioning(user_id")
    assert n_user_exchanges <= 1, plan[:2000]
    rows = {r["step"]: r for r in df.collect()}
    assert rows["view"]["n_users"] >= rows["click"]["n_users"] >= rows["purchase"]["n_users"]
    assert rows["view"]["conv_from_prev_x10000"] == 10000


def test_funnel_strict_order_and_window(spark, tmp_path):
    """purchase before the click, or outside the 24 h window, never counts."""
    import pandas as pd

    rows = [
        # u1: clean in-order funnel within windows
        (1, "2024-01-01 00:00:00", 10, "view"),
        (2, "2024-01-01 01:00:00", 10, "click"),
        (3, "2024-01-01 02:00:00", 10, "purchase"),
        # u2: purchase BEFORE click -> stops at click
        (4, "2024-01-01 00:00:00", 20, "view"),
        (5, "2024-01-01 02:00:00", 20, "purchase"),
        (6, "2024-01-01 03:00:00", 20, "click"),
        # u3: click 25h after view -> stops at view
        (7, "2024-01-01 00:00:00", 30, "view"),
        (8, "2024-01-02 01:00:00", 30, "click"),
        (9, "2024-01-02 02:00:00", 30, "purchase"),
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ['{"k": 1}'] * len(rows),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["step"]: r["n_users"] for r in QUERY_REGISTRY["events_funnel_steps"].fn(spark, str(tmp_path)).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_datacard_shares_sum_to_whole(spark):
    import pandas as pd

    df = QUERY_REGISTRY["corpus_datacard"].fn(spark, SF_ORACLE).toPandas()
    assert (df["dup_pct_x10000"] <= 10000).all()
    # integer floor division: shares sum to <= 10000 and within n_sources of it
    assert 10000 - len(df) <= df["token_share_x10000"].sum() <= 10000
    assert (df["n_docs"] > 0).all() and (df["bpe_tokens"] > 0).all()


def test_q19_pushes_factored_predicates_to_both_scans(spark):
    df = QUERY_REGISTRY["q19_disjunctive_predicates"].fn(spark, SF_ORACLE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l for l in pushed), "lineitem side lost its implied filter"
    assert any("p_brand" in l for l in pushed), "part side lost its implied filter"
    assert "CartesianProduct" not in plan


def test_q4_semi_join_no_fanout(spark):
    """LEFT SEMI: an order with many late lines appears once."""
    df = QUERY_REGISTRY["q4_late_shipping_priority"].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    total = sum(r["order_count"] for r in df.collect())
    import duckdb

    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_ORACLE}/orders.parquet' "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'"
    ).fetchone()[0]
    assert total <= n_orders


# ---------------------------------------------------------------------------
# round-7 plan pins for the optimized heavy entries
# ---------------------------------------------------------------------------


def test_v6_dedup_window_partitions_by_md5_key_not_text(spark):
    plan = (
        QUERY_REGISTRY["corpus_curation_v6"]
        .fn(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(tkey" in plan, "dedup window lost its md5 key"
    assert "hashpartitioning(text" not in plan, "corpus text entered an exchange"


def test_datacard_dup_count_is_one_window_not_join(spark):
    df = QUERY_REGISTRY["corpus_datacard"].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(tkey") == 1
    # the only join left is the 1-row broadcast of the corpus total
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_vocab_coverage_single_chain_transform(spark):
    """The 56-replace chain must ride ONE transform feeding both folds — two
    independent folds re-run the chain per word (measured 2.1x)."""
    opt = (
        QUERY_REGISTRY["tokenizer_vocab_coverage"]
        .fn(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # each chain instance mentions the (t,h) merge's '|th|' replacement twice
    # (as replacement text and inside the '|th||e|' pattern); runtime CSE
    # dedupes identical subtrees, so the cap guards against a rewrite into
    # DIFFERENT lambda bodies, which CSE cannot merge
    assert opt.count("'|t||h|'") <= 2, "chain duplicated into non-identical folds"


# ---------------------------------------------------------------------------
# degenerate inputs: the round-7 queries on an EMPTY corpus must agree with
# the oracle engine-for-engine (aggregates over zero rows are a classic
# cross-engine divergence point)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_round7_queries_survive_empty_corpus(spark, tmp_path):
    import duckdb
    import pandas as pd

    empty_docs = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
            "lang": pd.Series([], dtype="object"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64"),
        }
    )
    empty_events = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "value": pd.Series([], dtype="float64"),
            "props": pd.Series([], dtype="object"),
        }
    )
    spark.createDataFrame(
        empty_docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    spark.createDataFrame(
        empty_events,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    from tests.conftest import assert_frames_match

    for name in [
        "bpe_apply_encode",
        "tokenizer_vocab_coverage",
        "corpus_datacard",
        "corpus_curation_v6",
        "dedup_cluster_canonical",
        "events_funnel_steps",
        "multimodal_cdc_chunk_dedup",
    ]:
        spec = QUERY_REGISTRY[name]
        sp = spec.fn(spark, str(tmp_path)).toPandas()
        od = con.execute(spec.oracle).df()
        assert_frames_match(sp, od, f"{name} on empty corpus")


# ---------------------------------------------------------------------------
# round-7 wave 3: BFS layers and the embedding confusion matrix
# ---------------------------------------------------------------------------


def test_bfs_layers_are_sound(spark):
    from airflow_cms_inpatient_etl_spark.queries.curation2 import _transition_graph

    rows = QUERY_REGISTRY["graph_bfs_khop"].fn(spark, SF_ORACLE).collect()
    dist = {r["node"]: r["dist"] for r in rows}
    assert min(dist.values()) == 0 and list(dist.values()).count(0) == 1
    # every node at layer d>0 must have a neighbor at layer d-1 (BFS frontier
    # soundness — a layer can never be reached except through the previous one)
    _, edges, _ = _transition_graph(spark, SF_ORACLE)
    sym = set()
    for r in edges.collect():
        if r["src"] != r["dst"]:
            sym.add((r["src"], r["dst"])); sym.add((r["dst"], r["src"]))
    for node, d in dist.items():
        if d > 0:
            assert any(
                dist.get(m) == d - 1 for (a, m) in sym if a == node
            ), (node, d)


def test_confusion_matrix_self_cosine_is_one(spark):
    rows = QUERY_REGISTRY["embedding_label_confusion"].fn(spark, SF_ORACLE).collect()
    labels = {r["label_a"] for r in rows} | {r["label_b"] for r in rows}
    n = len(labels)
    assert len(rows) == n * (n + 1) // 2
    for r in rows:
        if r["label_a"] == r["label_b"]:
            assert abs(r["centroid_cosine"] - 1.0) < 1e-9, r
        assert -1.0 - 1e-9 <= r["centroid_cosine"] <= 1.0 + 1e-9


def test_delta_report_conserves_documents(spark):
    """added = docs spawned (doc_id % 13 == 0), removed = dead links
    (doc_id % 11 == 0), changed = refetches (doc_id % 11 == 1) — the
    report's totals must equal the derivation's residue classes exactly."""
    import duckdb

    rows = QUERY_REGISTRY["corpus_delta_report"].fn(spark, SF_ORACLE).collect()
    tot = {
        k: sum(r[k] for r in rows)
        for k in ("n_added", "n_removed", "n_changed", "n_unchanged")
    }
    n, n11_0, n11_1, n13_0 = duckdb.sql(
        f"""SELECT COUNT(*),
                   COUNT(*) FILTER (WHERE doc_id % 11 = 0),
                   COUNT(*) FILTER (WHERE doc_id % 11 = 1),
                   COUNT(*) FILTER (WHERE doc_id % 13 = 0)
            FROM '{SF_ORACLE}/documents.parquet'"""
    ).fetchone()
    assert tot["n_removed"] == n11_0
    assert tot["n_changed"] == n11_1
    assert tot["n_added"] == n13_0
    assert tot["n_unchanged"] == n - n11_0 - n11_1


@pytest.mark.slow
def test_lsh_recall_report_metrics_are_consistent(spark):
    r = QUERY_REGISTRY["dedup_lsh_recall_report"].fn(spark, SF_ORACLE).collect()[0]
    assert r["n_hit"] <= min(r["n_truth"], r["n_lsh"])
    # the LSH path verifies candidates with EXACT Jaccard, so precision is
    # 1.0 by construction; recall measures pure banding loss
    assert r["precision_x10000"] == 10000
    assert 0 <= r["recall_x10000"] <= 10000


def test_pareto_never_sorts_customers_in_one_partition(spark):
    """The corpus-sized window must hash-partition by bucket; only the
    1024-row bucket-offset table may use a single partition.  And the ABC
    classes must be a contiguous prefix/midfix/suffix of the rank order."""
    df = QUERY_REGISTRY["customer_pareto_class"].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(bkt" in plan, "per-bucket window collapsed"
    rows = sorted(df.collect(), key=lambda r: r["rnk"])
    ranks = [r["rnk"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    classes = [r["abc_class"] for r in rows]
    assert classes == sorted(classes), "ABC classes must be monotone in rank"
    # cumulative totals telescope exactly
    run = 0
    for r in rows:
        run += r["cents"]
        assert r["cum_cents"] == run, r
