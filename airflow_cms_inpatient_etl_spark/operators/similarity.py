"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the brief:
* brute-force cosine top-k — the exactness baseline; cost |Q|·|C|·d, fine when
  the query set is small and the candidate side is scanned once;
* LSH-bucketed ANN — sign-bit buckets on fixed hyperplanes, so only same-bucket
  pairs are scored: the 100 TB path (bucket column is precomputable and
  partition-prunable at write time).

Determinism: dot products and norms are computed as an *ordered left fold* over
the dimension index (``F.aggregate`` over a zipped product array, double
accumulator).  IEEE addition in a fixed order is bit-deterministic, which makes
cosine scores reproducible across runs/engines — no epsilon tolerances needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Ordered left fold Σ (bit-deterministic, unlike SUM over a shuffle)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """⟨a,b⟩ with per-element promotion to double before multiplication."""
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def norm_sq(a: Column) -> Column:
    return _fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the candidate scan,
    then per-query top-k via row_number (tie-broken on candidate id)."""
    from pyspark.sql import Window as W

    q = queries.select(F.col(id_col).alias(qid_col), F.col(vec_col).alias("qvec"))
    c = embeddings.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cid") != F.col(qid_col))
        .withColumn("cosine", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(qid_col, "cid", "cosine", "rn")
    )


def sign_lsh_bucket(vec: Column, dims: tuple[int, ...] = (1, 17, 33, 49)) -> Column:
    """Sign-bit LSH bucket key from fixed coordinate hyperplanes.

    Axis-aligned hyperplanes keep the bucket function engine-portable (no
    random projection matrix to ship); for production, swap in seeded random
    hyperplanes broadcast as a literal array — the operator shape is identical.
    """
    bits = [
        F.when(F.element_at(vec, d) >= 0, F.lit("1")).otherwise(F.lit("0")) for d in dims
    ]
    return F.concat(*bits)


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's LSH bucket.

    The bucket equi-join replaces the cross join — at scale, candidates are
    pre-bucketed (partitioned/bucketed table) so each query touches one bucket.
    Recall is tunable via bucket bits / multi-probe; exactness is *not* the
    contract here (the oracle replicates the same algorithm)."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias(qid_col),
        F.col(vec_col).alias("qvec"),
        sign_lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        sign_lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cid") != F.col(qid_col))
        .withColumn("cosine", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(qid_col, "cid", "cosine", "rn")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    (max cosine, centroid-id tie-break).  Centroids are a tiny broadcast side;
    at scale the assignment is a write-time column and the posting lists are
    partition-pruned."""
    from pyspark.sql import Window as W

    c = centroids.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"))
    scored = embeddings.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(c)
    ).withColumn("c_cos", cosine(F.col(vec_col), F.col("cvec")))
    w = W.partitionBy(id_col).orderBy(F.col("c_cos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
) -> DataFrame:
    """IVF ANN top-k: both sides are coarse-quantized; each query scores only
    the vectors in its own (top-1 probe) inverted list.  Recall improves with
    more probes — the operator shape (quantize → list equi-join → rank) is the
    scale path for embedding search when sign-LSH buckets are too coarse."""
    from pyspark.sql import Window as W

    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    q = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias(qid_col), F.col(vec_col).alias("qvec"), "centroid_id"
    )
    c = assigned.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"), "centroid_id")
    scored = (
        c.join(F.broadcast(q), "centroid_id")
        .filter(F.col("cid") != F.col(qid_col))
        .withColumn("cosine", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(qid_col, "cid", "cosine", "rn")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cosine > threshold),
    restricted to same-LSH-bucket pairs — the blocked (not all-pairs) variant."""
    a = embeddings.select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
        sign_lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
        sign_lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cosine", cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") > threshold)
        .select("id1", "id2", "cosine")
    )
