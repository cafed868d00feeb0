"""Round-10 additions: the iterative BPE trainer, the spread_scan scan-only
precondition, and the scoped snapshot release API."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.text import bpe_train
from airflow_cms_inpatient_etl_spark.sources.registry import (
    load_table,
    release_snapshots,
    spread_scan,
    tracked_localcheckpoint,
)
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# Canonical reference BPE (list-based greedy merge — the Sennrich semantics),
# implemented INDEPENDENTLY of the engine's boundary-encoded replace trick.
# ---------------------------------------------------------------------------


def _canonical_merge(tokens: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == left and tokens[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def _canonical_bpe(vocab: dict[str, int], n_merges: int):
    state = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        census: Counter = Counter()
        for w, toks in state.items():
            for a, b in zip(toks, toks[1:]):
                census[(a, b)] += vocab[w]
        if not census:
            break
        (l, r), n = sorted(census.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))[0]
        merges.append((rank, l, r, l + r, n))
        state = {w: _canonical_merge(t, l, r) for w, t in state.items()}
    return merges


def _encode(word: str) -> str:
    return "".join(f" {ch};" for ch in word)


def test_bpe_train_matches_canonical_greedy(spark):
    """The boundary-encoded replace loop equals canonical list-based greedy
    BPE — including the run-of-4 case where a naive space-separated replace
    would under-merge ('aaaa' must become [aa, aa], not [aa, a, a])."""
    vocab = {
        "aaaa": 7,   # run of 4: the encoding's hardest case
        "aaa": 5,    # odd run: [aa, a]
        "banana": 4,
        "bandana": 3,
        "aab": 6,    # 'a aa' vs 'aa a' disambiguation after (a,a) merges
        "zz11": 2,
    }
    try:
        words = spark.createDataFrame(
            [(_encode(w), n) for w, n in vocab.items()], "seq string, freq bigint"
        )
        got = bpe_train(words, 8)
        assert got == _canonical_bpe(vocab, 8)
    finally:
        release_snapshots(spark)


def test_bpe_train_exhausts_gracefully(spark):
    """Fewer available merges than the budget: loop stops at exhaustion."""
    try:
        words = spark.createDataFrame([(_encode("ab"), 3)], "seq string, freq bigint")
        got = bpe_train(words, 10)
        # 'ab' -> one merge (a,b); then a single token remains, no pairs
        assert got == [(1, "a", "b", "ab", 3)]
    finally:
        release_snapshots(spark)


# ---------------------------------------------------------------------------
# spread_scan precondition
# ---------------------------------------------------------------------------


def test_spread_scan_rejects_non_scan_shaped_input(spark):
    """Downstream of an exchange, probing df.rdd would finalize the AQE plan
    and run upstream stages at build time — spread_scan must refuse."""
    agg = (
        load_table(spark, SF_SMOKE, "documents")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    with pytest.raises(ValueError, match="scan-shaped"):
        spread_scan(agg, "doc_id")


def test_spread_scan_accepts_scan_with_projection_and_filter(spark):
    d = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") % 2 == 0)
    out = spread_scan(d.select("doc_id", "text"), "doc_id")
    assert out.count() > 0


# ---------------------------------------------------------------------------
# Scoped snapshot release
# ---------------------------------------------------------------------------


def _live_ids(spark) -> set[int]:
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def test_release_snapshots_scoped_by_ids(spark):
    """release_snapshots(spark, ids=...) frees ONLY the handle's blocks; a
    concurrent still-unconsumed snapshot survives (the ADVICE hazard: the
    all-or-nothing release stranding overlapping query lifetimes)."""
    release_snapshots(spark)  # isolate from earlier tests in the session
    d = load_table(spark, SF_SMOKE, "nation")
    a, ids_a = tracked_localcheckpoint(d.select("n_nationkey"), eager=True)
    b, ids_b = tracked_localcheckpoint(d.select("n_name"), eager=True)
    assert ids_a and ids_b and not (set(ids_a) & set(ids_b))
    try:
        assert release_snapshots(spark, ids=ids_a) == len(ids_a)
        live = _live_ids(spark)
        assert not (set(ids_a) & live), "scoped release left its own blocks"
        assert set(ids_b) <= live, "scoped release yanked a foreign snapshot"
        assert b.count() == 25  # the surviving snapshot is still consumable
        # double-release of the same handle is a no-op, not an error
        assert release_snapshots(spark, ids=ids_a) == 0
    finally:
        release_snapshots(spark)


def test_cluster_aware_split_never_straddles(spark):
    """The leakage guarantee is structural: every member of a near-dup
    cluster carries the SAME split (the hash is keyed on the cluster rep),
    and both sides are non-empty at fixture scale."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    try:
        out = QUERY_REGISTRY["split_cluster_aware"].fn(spark, SF_SMOKE)
        g = out.groupBy("cluster_rep").agg(
            F.count_distinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n"),
            F.max("cluster_size").alias("sz"),
        )
        bad = g.filter(F.col("n_splits") > 1).count()
        assert bad == 0, f"{bad} clusters straddle the split"
        # the size column is consistent with actual membership
        assert g.filter(F.col("n") != F.col("sz")).count() == 0
        splits = {r["split"] for r in out.select("split").distinct().collect()}
        assert splits == {"train", "eval"}
        # real multi-doc clusters exist, else the guarantee is vacuous here
        assert out.filter(F.col("cluster_size") > 1).count() > 0
    finally:
        from airflow_cms_inpatient_etl_spark.sources.registry import (
            release_snapshots,
        )

        release_snapshots(spark)


def test_streaming_dedup_gate_equals_batch(spark):
    """The live foreachBatch gate's drained sink equals the batch
    incremental-dedup query exactly — batching cannot change a per-document
    gate (this is what justifies reusing the batch oracle verbatim)."""
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    try:
        live = QUERY_REGISTRY["streaming_dedup_gate_live"].fn(spark, SF_SMOKE)
        batch = QUERY_REGISTRY["dedup_incremental_index"].fn(spark, SF_SMOKE)
        a = {tuple(r) for r in live.collect()}
        b = {tuple(r) for r in batch.collect()}
        assert a == b and len(a) > 0
    finally:
        release_snapshots(spark)
