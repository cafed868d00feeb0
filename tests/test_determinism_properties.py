"""Property-based tests for the engine's determinism core: exact-decimal
aggregation and ordered-fold dot products must be bit-identical under any
partitioning/ordering — that is the claim that makes the oracle gate and
cluster reproducibility work."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.functions.exact import dsum
from airflow_cms_inpatient_etl_spark.operators.similarity import dot

# 2-dp "money" doubles, the shape of every testdata measure column
money = st.decimals(
    min_value=-99_999_999, max_value=99_999_999, places=2, allow_nan=False, allow_infinity=False
)


@pytest.mark.slow
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(money, min_size=1, max_size=60), st.integers(min_value=1, max_value=7))
def test_dsum_is_partition_invariant_and_exact(spark, values, n_parts):
    """dsum must equal the exact rational sum and be bit-identical no matter
    how the rows are partitioned (raw SUM(double) fails both)."""
    floats = [float(v) for v in values]
    df = spark.createDataFrame([(x,) for x in floats], "x double")
    got_1 = df.coalesce(1).agg(dsum("x", "s")).first()["s"]
    got_n = df.repartition(n_parts).agg(dsum("x", "s")).first()["s"]
    # exact decimal arithmetic on the double's true decimal cast (scale 6)
    from decimal import Decimal

    expected = float(sum(Decimal(str(round(x, 6))) for x in floats))
    assert got_1 == got_n  # bit-identical across partitionings
    assert math.isclose(got_1, expected, rel_tol=0, abs_tol=1e-6 * max(1, len(floats)))


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=64,
    )
)
def test_ordered_fold_dot_matches_python_left_fold(spark, vec):
    """The F.aggregate fold must equal a strict left-to-right Python fold —
    the same order DuckDB's list_reduce uses."""
    df = spark.createDataFrame([(vec, vec)], "a array<float>, b array<float>")
    got = df.select(dot(F.col("a"), F.col("b")).alias("d")).first()["d"]
    import numpy as np

    acc = 0.0
    for x in vec:
        xf = float(np.float32(x))
        acc = acc + xf * xf
    assert got == acc  # bit-exact, no tolerance


def test_dsum_differs_from_naive_double_sum_in_concept(spark):
    """Sanity: the decimal path is exact where double accumulation drifts."""
    # 0.1 is inexact in binary; summing it 10_000 times drifts in double
    df = spark.range(10_000).select(F.lit(0.1).alias("x"))
    exact = df.agg(dsum("x", "s")).first()["s"]
    assert exact == 1000.0  # decimal sum of 0.1 × 10k is exactly 1000


# word tokens over the corpus alphabet (lowercase + digits), joined by
# messy whitespace — the chunker must be invariant to whitespace shape
_token = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
_ws = st.sampled_from([" ", "  ", "\t", " \t ", "\n"])


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_token, min_size=1, max_size=130), st.data())
def test_doc_chunk_overlap_covers_any_token_stream(spark, tokens, data):
    """For ANY token stream and whitespace shape: chunk starts are exactly
    range(0, n, stride), stride-prefixes reassemble the original stream, and
    full chunks overlap their successor by chunk-stride tokens."""
    text = ""
    for i, t in enumerate(tokens):
        text += (data.draw(_ws) if i else "") + t
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = df.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    chunks = (
        toks.select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(0), F.size("w") - 1, F.lit(30))).alias("start_tok"),
        )
        .select(
            "start_tok",
            F.slice(F.col("w"), F.col("start_tok") + 1, 40).alias("chunk"),
        )
        .collect()
    )
    n = len(tokens)
    got = {r["start_tok"]: list(r["chunk"]) for r in chunks}
    assert sorted(got) == list(range(0, n, 30))
    rebuilt = []
    for s in sorted(got):
        rebuilt.extend(got[s][: min(30, n - s)])
    assert rebuilt == tokens
    for s in sorted(got):
        if len(got[s]) == 40 and s + 30 in got:
            assert got[s][30:] == got[s + 30][:10]


@pytest.mark.slow
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    snap=st.dictionaries(st.integers(0, 6), st.text("ab", min_size=1, max_size=3), max_size=5),
    ops=st.lists(
        st.tuples(
            st.integers(0, 6),
            st.sampled_from(["I", "U", "D"]),
            st.text("cd", min_size=1, max_size=3),
        ),
        max_size=8,
    ),
)
def test_change_feed_matches_sequential_dict_replay(spark, snap, ops):
    """apply_change_feed must equal a sequential replay of the log against a
    dict: for ANY snapshot and ANY op sequence (seq = position), per-key
    last-write-wins compaction + anti join + union == fold the ops in
    order.  This is the compaction soundness property: one pass over the
    feed is equivalent to applying every change one at a time."""
    from airflow_cms_inpatient_etl_spark.operators.upsert import apply_change_feed

    expected = dict(snap)
    for k, op, v in ops:
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = v

    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()], "k int, v string"
    )
    ch_df = spark.createDataFrame(
        [(k, v, op, seq) for seq, (k, op, v) in enumerate(ops)],
        "k int, v string, op string, seq int",
    )
    got = {r["k"]: r["v"] for r in apply_change_feed(snap_df, ch_df, ["k"]).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# round-7 kernels: the BPE replace-chain encoder and the Rabin rolling hash
# ---------------------------------------------------------------------------


@pytest.mark.slow
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=14),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_replace_chain_equals_classic_bpe_on_random_words(spark, words):
    """The static replace-chain encoder must agree with the classic
    rescan-from-lowest-rank BPE algorithm on ARBITRARY lowercase words, not
    just fixture vocabulary — the topological-consistency argument holds for
    any input or it holds for none."""
    from airflow_cms_inpatient_etl_spark.queries.analytics import (
        _BPE_MERGES,
        bpe_token_count_spark,
    )
    from tests.test_round7 import _ref_bpe

    rows = (
        spark.createDataFrame([(w,) for w in set(words)], ["w"])
        .select("w", F.expr(bpe_token_count_spark("w")).alias("n"))
        .collect()
    )
    for r in rows:
        assert r["n"] == len(_ref_bpe(r["w"], _BPE_MERGES)), r["w"]


@pytest.mark.slow
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.text(alphabet="abcdefgh xyz.,", min_size=0, max_size=300))
def test_cdc_rolling_hash_cuts_match_reference_on_random_text(spark, s):
    """The engine's O(1) rolling-recurrence cut positions must equal a
    host-language implementation of the window-hash DEFINITION for arbitrary
    payloads (incl. empty and sub-width strings)."""
    from airflow_cms_inpatient_etl_spark.queries.multimodal import (
        _CDC_B,
        _CDC_BW,
        _CDC_D,
        _CDC_M,
        _CDC_POWS,
        _CDC_W,
    )

    expected = []
    for e in range(_CDC_W, len(s) + 1):
        h = sum(ord(s[e - 1 - j]) * _CDC_POWS[j] for j in range(_CDC_W)) % _CDC_M
        if h % _CDC_D == 0:
            expected.append(e)
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
        spark.createDataFrame([(s,)], "text string")
        .select(F.split("text", "").alias("cs"))
        .select(F.expr(fold).alias("ends"))
        .collect()[0]["ends"]
    )
    assert got == expected, s


# --------------------------------------------------------------------------- #
# BPE boundary-encoding theorem (round 10)                                     #
# --------------------------------------------------------------------------- #
# The trainer applies a merge as ONE single-pass string replace over the
# ' tok;' boundary encoding.  The claim: for ANY token sequence and ANY merge
# pair, that replace equals the canonical left-to-right greedy list merge.
# Python's str.replace has the same single-pass non-overlapping semantics as
# Spark's and DuckDB's REPLACE (the 3-scale oracle differentials pin the
# engines to each other; this pins the shared semantics to the canonical
# algorithm over the whole input space, not just the fixture corpus).

_tok = st.text(alphabet="ab1", min_size=1, max_size=3)  # tiny alphabet → dense collisions


def _greedy_merge(tokens, left, right):
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == left and tokens[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(_tok, min_size=1, max_size=12), _tok, _tok)
def test_boundary_encoded_replace_equals_greedy_merge(tokens, left, right):
    encoded = "".join(f" {t};" for t in tokens)
    replaced = encoded.replace(f" {left}; {right};", f" {left}{right};")
    decoded = replaced[1:].rstrip(";").split("; ") if replaced else []
    assert decoded == _greedy_merge(tokens, left, right)
