"""Round-6 additions: operator guard rails from the round-5 advice pass
(bloom key type parity, pagerank/cms degenerate inputs), plus tests for the
operators added this round."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.graph import pagerank_integer
from airflow_cms_inpatient_etl_spark.operators.sketch import cms_merge
from airflow_cms_inpatient_etl_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE

# --------------------------------------------------------------------------- #
# guard rails                                                                  #
# --------------------------------------------------------------------------- #


def test_bloom_semi_join_rejects_mismatched_key_types(spark):
    """xxhash64 hashes INT and BIGINT differently, so a type-mismatched
    build/probe pair would compute different bit positions — silent false
    negatives.  The operator must refuse rather than quietly drop rows."""
    from airflow_cms_inpatient_etl_spark.operators.bloom import bloom_semi_join

    probe = spark.range(100).select(F.col("id").alias("k"))  # bigint
    build = spark.range(10).select(F.col("id").cast("int").alias("j"))  # int
    with pytest.raises(ValueError, match="dtype mismatch"):
        bloom_semi_join(probe, build, "k", "j")
    # same data, canonicalized: works and is exact
    n = bloom_semi_join(probe, build.select(F.col("j").cast("long").alias("j")), "k", "j").count()
    assert n == 10


def test_pagerank_rejects_empty_teleport_set(spark):
    edges = spark.range(1).select(
        F.lit(0).cast("long").alias("src"),
        F.lit(1).cast("long").alias("dst"),
        F.lit(1).cast("long").alias("w"),
    )
    nodes = spark.range(2).select(F.col("id").alias("node"))
    empty = nodes.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty nodes"):
        pagerank_integer(edges, empty)
    with pytest.raises(ValueError, match="empty seeds"):
        pagerank_integer(edges, nodes, seeds=empty)


def test_cms_merge_rejects_zero_sketches():
    with pytest.raises(ValueError, match="at least one sketch"):
        cms_merge()


def test_semdedup_requires_exactly_one_sizing_knob(spark):
    from airflow_cms_inpatient_etl_spark.operators.similarity import (
        semdedup_assign_prune,
    )

    e = load_table(spark, SF_ORACLE, "embeddings")
    with pytest.raises(ValueError, match="exactly one"):
        semdedup_assign_prune(e)
    with pytest.raises(ValueError, match="exactly one"):
        semdedup_assign_prune(e, k=8, target_cluster_size=100)
