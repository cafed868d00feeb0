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
