"""spark.ml-backed alternates for the text/similarity operators.

The hand-rolled DataFrame implementations in ``operators/dedup.py`` and
``operators/similarity.py`` are the engine's primary path (portable hashes,
oracle-checkable).  These wrappers expose the spark.ml equivalents —
HashingTF/IDF features, MinHashLSH approximate-similarity join,
BucketedRandomProjectionLSH for euclidean ANN — for users who want the ml
Pipeline ecosystem.  Seeds are pinned so runs are reproducible, but the hash
families are JVM-specific, hence no SQL oracle (test-verified instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tfidf_features(
    df: DataFrame, text_col: str = "text", num_features: int = 1 << 16
) -> DataFrame:
    """Tokenize → HashingTF → IDF: classic sparse tf-idf document vectors."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="__tokens")
    tf = HashingTF(inputCol="__tokens", outputCol="__tf", numFeatures=num_features)
    with_tf = tf.transform(tok.transform(df))
    idf = IDF(inputCol="__tf", outputCol="tfidf").fit(with_tf)
    return idf.transform(with_tf).drop("__tokens", "__tf")


def minhash_neardup_ml(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_distance_threshold: float = 0.3,
    num_hash_tables: int = 8,
    num_features: int = 1 << 16,
    seed: int = 42,
) -> DataFrame:
    """MinHashLSH approxSimilarityJoin over binarized token vectors.

    Returns (id1, id2, jaccard_distance) pairs with id1 < id2 — the ml-native
    equivalent of ``operators.dedup.minhash_lsh_pairs`` (note: ml reports
    Jaccard *distance*, 1 - similarity)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="__tokens")
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(tok.transform(df)).select(id_col, "__features")
    lsh = MinHashLSH(
        inputCol="__features", outputCol="__hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(feats)
    pairs = lsh.approxSimilarityJoin(feats, feats, jaccard_distance_threshold, distCol="jaccard_distance")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id1"),
            F.col(f"datasetB.{id_col}").alias("id2"),
            "jaccard_distance",
        )
        .filter(F.col("id1") < F.col("id2"))
    )


def euclidean_ann_ml(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    distance_threshold: float = 10.0,
    seed: int = 42,
) -> DataFrame:
    """BucketedRandomProjectionLSH near-neighbor join over dense vectors."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("__vec")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="__vec",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(feats)
    pairs = lsh.approxSimilarityJoin(feats, feats, distance_threshold, distCol="euclidean_distance")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id1"),
            F.col(f"datasetB.{id_col}").alias("id2"),
            "euclidean_distance",
        )
        .filter(F.col("id1") < F.col("id2"))
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    max_iters: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Full spherical k-means training loop (Lloyd's): the registered
    ``embedding_kmeans_iteration`` query is ONE step of this; here the step
    runs to convergence (no assignment changes) with the same distributed
    shape — broadcast centroids for assignment, one shuffle per iteration
    for the per-dimension means, driver coordinating rounds only (the
    GraphX/Pregel superstep pattern, like connected components).

    Deterministic: init = the k lowest-``id_col`` vectors; assignment ties
    break on centroid id; convergence is an integer count (vectors whose
    assignment changed).  Empty clusters keep their previous centroid.
    ``localCheckpoint`` truncates lineage each round.

    Returns ``(assignments, centroids, n_iters)`` — assignments as
    (id, centroid_id), centroids as (centroid_id, vec) with double
    components.
    """
    from airflow_cms_inpatient_etl_spark.operators.similarity import ivf_assign

    from pyspark.sql import Window as W

    centroids = (
        embeddings.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(W.orderBy(id_col)).alias("centroid_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col),
        )
        .localCheckpoint(eager=True)
    )
    assignments = None
    for it in range(1, max_iters + 1):
        new_assign = (
            ivf_assign(
                embeddings,
                centroids.withColumnRenamed("centroid_id", id_col),
                id_col,
                vec_col,
            )
            .select(F.col(id_col), "centroid_id")
            .localCheckpoint(eager=True)
        )
        if assignments is not None:
            changed = (
                new_assign.withColumnRenamed("centroid_id", "new_cid")
                .join(assignments, id_col)
                .filter(F.col("new_cid") != F.col("centroid_id"))
                .count()
            )
            if changed == 0:
                return assignments, centroids, it - 1
        assignments = new_assign
        member_dims = (
            embeddings.join(assignments, id_col)
            .select("centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
        )
        new_centroids = (
            member_dims.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias(vec_col)
            )
        )
        # empty clusters keep their previous centroid
        centroids = (
            centroids.select("centroid_id", F.col(vec_col).alias("__old"))
            .join(new_centroids, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col(vec_col), F.col("__old")).alias(vec_col),
            )
            .localCheckpoint(eager=True)
        )
    return assignments, centroids, max_iters
