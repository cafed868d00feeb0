"""Round-12 additions: q-digest dyadic rank sketch (merge associativity,
exactness, bounds under skew, domain guard) and sliding-window RAG chunking
(python reference, duplicate plant, standing-index composition), plus the
sf0.1 hash pins for both new registry queries."""

from __future__ import annotations

import hashlib
import math
import os
import sys

import pytest
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.sketch import (
    QD_EPS_DEN,
    dyadic_merge,
    dyadic_tree,
    qdigest_prune,
    qdigest_rank_cdf,
)
from airflow_cms_inpatient_etl_spark.operators.text import sliding_chunks
from airflow_cms_inpatient_etl_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE

_BITS = 24
_RADIX = 4
_LEVELS = _BITS // _RADIX


def _cents(spark, sf_dir=SF_SMOKE):
    return load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )


# --------------------------------------------------------------------------- #
# q-digest: merge associativity — the property the sketch EXISTS for           #
# --------------------------------------------------------------------------- #


def test_dyadic_merge_equals_tree_of_union(spark):
    """tree(A) ⊎ tree(B) == tree(A ∪ B) EXACTLY (cell-for-cell), and pruning
    the merged tree gives the bit-identical sketch — sums are commutative/
    associative, so shard-then-merge is lossless no matter how a 1000-node
    cluster splits the data.  (KLL's random compaction cannot make this
    claim; that trade-off is documented on the operator.)"""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    a = li.filter(F.col("l_orderkey") % 2 == 0).select("cents")
    b = li.filter(F.col("l_orderkey") % 2 == 1).select("cents")
    merged = dyadic_merge(dyadic_tree(a, "cents", _BITS), dyadic_tree(b, "cents", _BITS))
    full = dyadic_tree(li.select("cents"), "cents", _BITS)

    def cells(t):
        return sorted(map(tuple, t.collect()))

    assert cells(merged) == cells(full)
    pm = sorted(map(tuple, qdigest_prune(merged).collect()))
    pf = sorted(map(tuple, qdigest_prune(full).collect()))
    assert pm == pf and len(pf) > 0


def test_dyadic_tree_root_and_leaves_exact(spark):
    """Level 0 carries n; level `bits` IS the exact value histogram; every
    intermediate level's counts sum to n (no value lost or double-counted
    on any level — the invariant the rank bounds are proven from)."""
    vals = _cents(spark)
    n = vals.count()
    tree = dyadic_tree(vals, "cents", _BITS).collect()
    by_level: dict[int, int] = {}
    for r in tree:
        by_level[r.level] = by_level.get(r.level, 0) + r.cnt
    assert by_level == {lvl: n for lvl in range(_LEVELS + 1)}
    leaves = {r.node: r.cnt for r in tree if r.level == _LEVELS}
    exact = {r.cents: r.n for r in vals.groupBy("cents").agg(F.count("*").alias("n")).collect()}
    assert leaves == exact


def test_unpruned_cdf_is_exact(spark):
    """With the prune threshold below 1/n the sketch keeps every node,
    residuals collapse onto the leaves, and the 'estimated' CDF becomes the
    exact distribution — the eps → 0 limit sanity check."""
    rows = [(v,) for v in [3, 3, 3, 7, 9, 9, 20, 21, 21, 21, 100, 1000]]
    df = spark.createDataFrame(rows, "cents long")
    kept = qdigest_prune(dyadic_tree(df, "cents", 12), eps_den=10_000)
    cdf = {r.upper: r.cum_est for r in qdigest_rank_cdf(kept, 12).collect()}
    vals = sorted(v for (v,) in rows)
    for u, cum in cdf.items():
        assert cum == sum(1 for v in vals if v <= u), (u, cum)
    # leaf endpoints are present, so every distinct value is queryable
    for v in set(vals):
        assert v in cdf


def test_qdigest_bounds_hold_under_90pct_skew(spark):
    """Adversarial hot-value fixture: 90 % of the mass on ONE value (the
    boilerplate-price analogue).  The sketch must stay bounded and every
    rank estimate must respect the proven two-sided bound — skew
    concentrates counts high in the tree, which is exactly the case the
    residual attribution has to get right."""
    hot = [(5_000_00,)] * 9000
    tail = [((i * 9973) % (1 << 20),) for i in range(1000)]
    df = spark.createDataFrame(hot + tail, "cents long")
    n = 10_000
    kept = qdigest_prune(dyadic_tree(df, "cents", _BITS))
    cells = kept.collect()
    assert len(cells) <= (_LEVELS + 1) * QD_EPS_DEN
    cdf = sorted((r.upper, r.cum_est) for r in qdigest_rank_cdf(kept, _BITS).collect())
    values = sorted(v for (v,) in hot + tail)
    bound = (_LEVELS + 1) * (1 << _RADIX) * n / QD_EPS_DEN
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        r = math.ceil(q * n)
        v_est = next(u for u, c in cdf if c >= r)
        cnt_le = sum(1 for v in values if v <= v_est)
        cnt_lt = sum(1 for v in values if v < v_est)
        assert cnt_le >= r, (q, v_est, cnt_le, r)
        assert cnt_lt < r + bound, (q, v_est, cnt_lt, r, bound)


def test_dyadic_tree_rejects_out_of_domain(spark):
    """A value >= 2^bits must raise loudly, never alias another interval
    (the winnowing position-packing lesson applied on day one)."""
    df = spark.createDataFrame([(5,), (1 << 12,)], "cents long")
    with pytest.raises(Exception, match="dyadic_tree"):
        dyadic_tree(df, "cents", 12).collect()


# --------------------------------------------------------------------------- #
# RAG chunking: python reference + duplicate plant + composition               #
# --------------------------------------------------------------------------- #


def _py_chunks(doc_id: int, text: str, width=32, stride=16):
    toks = " ".join(text.split()).split()
    if not toks:
        return []
    ntok = len(toks)
    n_chunks = 1 if ntok <= width else math.ceil((ntok - width) / stride) + 1
    out = []
    for i in range(n_chunks):
        piece = toks[i * stride : i * stride + width]
        out.append(
            (
                doc_id,
                i,
                min(ntok - i * stride, width),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
        )
    return out


def test_sliding_chunks_matches_python_reference(spark):
    """Edge widths: empty, 1 token, width-1, exact width, width+1, one full
    extra stride, and a long doc — the off-by-one surface of the
    ceil((ntok-w)/m)+1 count and the truncated last slice."""
    docs = [
        (1, ""),
        (2, "   \t \n "),
        (3, "a"),
        (4, " ".join(f"w{i}" for i in range(31))),
        (5, " ".join(f"w{i}" for i in range(32))),
        (6, " ".join(f"w{i}" for i in range(33))),
        (7, " ".join(f"w{i}" for i in range(48))),
        (8, " ".join(f"w{i}" for i in range(49))),
        (9, " ".join(f"x{i % 7}" for i in range(500))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        map(tuple, sliding_chunks(df, "doc_id", "text").collect())
    )
    want = sorted(c for d, t in docs for c in _py_chunks(d, t))
    assert got == want
    # documents with no tokens yield no chunks at all
    assert not any(d in (1, 2) for d, *_ in got)


def test_rag_duplicate_chunk_single_canonical(spark):
    """Two docs sharing an identical stride-aligned 32-token window collide
    on chunk_hash; exactly one copy is canonical and it belongs to the
    lexicographically-first (doc_id, chunk_idx)."""
    para = " ".join(f"boiler{i}" for i in range(32))
    tail = " ".join(f"t{i}" for i in range(16))
    df = spark.createDataFrame(
        [(10, para), (20, para + " " + tail)], "doc_id long, text string"
    )
    chunks = sliding_chunks(df, "doc_id", "text")
    firsts = chunks.groupBy("chunk_hash").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("_first")
    )
    flagged = chunks.join(firsts, "chunk_hash").select(
        "doc_id",
        "chunk_idx",
        (
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("chunk_idx") == F.col("_first.chunk_idx"))
        ).alias("is_canonical"),
    ).collect()
    dup = [r for r in flagged if (r.doc_id, r.chunk_idx) in ((10, 0), (20, 0))]
    assert sorted((r.doc_id, r.is_canonical) for r in dup) == [(10, True), (20, False)]


def test_rag_packed_key_rejects_out_of_domain(spark):
    """The (doc_id << 20) | chunk_idx first-writer key must raise loudly
    outside its packing domain instead of silently mis-ranking writers —
    same doctrine as the winnowing position guard.  A doc_id >= 2^43
    triggers it (a >16.7M-token doc would be the chunk_idx variant).

    Exercises the SAME ``packed_first_writer_key`` helper the query uses
    (round-12 ADVICE: a reconstructed inline copy would let guard drift in
    the query go uncaught)."""
    from airflow_cms_inpatient_etl_spark.operators.text import packed_first_writer_key

    df = spark.createDataFrame(
        [(1 << 43, " ".join(f"w{i}" for i in range(5)))], "doc_id long, text string"
    )
    chunks = sliding_chunks(df, "doc_id", "text")
    packed = packed_first_writer_key("doc_id", "chunk_idx", "rag_chunk_sliding")
    with pytest.raises(Exception, match="packing domain"):
        chunks.withColumn("_pk", packed).collect()


def test_rag_chunks_feed_incremental_index_gate(spark):
    """Composition (round-11 verdict stretch #8): canonical chunks of a BASE
    corpus form the standing hash index; a DELTA doc that plagiarizes a base
    paragraph is flagged by the same delta-vs-index join shape as
    `dedup_incremental_index` — chunk-level instead of shingle-level, and
    the standing side is never re-chunked."""
    base_para = " ".join(f"base{i}" for i in range(32))
    base = spark.createDataFrame(
        [(1, base_para), (2, " ".join(f"u{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    standing = (
        sliding_chunks(base, "doc_id", "text").select("chunk_hash").distinct()
    )
    delta = spark.createDataFrame(
        [(100, base_para + " " + " ".join(f"n{i}" for i in range(16))),
         (200, " ".join(f"fresh{i}" for i in range(32)))],
        "doc_id long, text string",
    )
    dch = sliding_chunks(delta, "doc_id", "text")
    tot = dch.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    hit = dch.join(standing, "chunk_hash").groupBy("doc_id").agg(
        F.count("*").alias("n_shared")
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_shared)
        for r in tot.join(hit, "doc_id", "left")
        .select("doc_id", "n_chunks", F.coalesce("n_shared", F.lit(0)).alias("n_shared"))
        .collect()
    }
    assert got[100][1] >= 1  # the plagiarized window is caught
    assert got[200] == (1, 0)  # fresh content passes the gate


# --------------------------------------------------------------------------- #
# sf0.1 hash pins for the two round-12 wave-2 registry queries                 #
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("qname", ["sketch_qdigest_quantiles", "rag_chunk_sliding"])
def test_round12_wave2_sf01_hash(spark, qname):
    import duckdb

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import assert_frames_match

    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
    from airflow_cms_inpatient_etl_spark.sources.registry import TESTDATA_TABLES

    spec = QUERY_REGISTRY[qname]
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.1/{t}.parquet'"
            )
        sp = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
        assert_frames_match(sp, con.execute(spec.oracle).df(), f"{qname}:sf0.1")
    finally:
        con.close()
