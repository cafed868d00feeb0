"""Round-8 additions: cross-document line-level dedup (C4/FineWeb boilerplate
pass) — crafted-fixture semantics plus multi-scale oracle checks."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.dedup import (
    LINE_BOUNDARY_PERIOD,
    content_defined_lines,
    cross_doc_line_dedup,
)
from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY
from airflow_cms_inpatient_etl_spark.sources.registry import TESTDATA_TABLES
from tests.conftest import run_differential


def _h60(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


# Tokens chosen so the test controls boundary placement exactly:
# hash60 % 8 == 0 for the boundary tokens, != 0 for the rest (asserted below
# so a constant change can't silently invalidate the fixture).
_BOUNDARY = ["charlie", "india", "mark"]
_PLAIN = ["alpha", "bravo", "delta", "echo", "foxtrot", "golf", "hotel", "kilo"]


def test_fixture_tokens_have_expected_boundary_status():
    assert LINE_BOUNDARY_PERIOD == 8
    assert all(_h60(t) % 8 == 0 for t in _BOUNDARY)
    assert all(_h60(t) % 8 != 0 for t in _PLAIN)


_HEADER = "alpha bravo charlie"  # ends at a boundary → forms a complete line


def _fixture_docs(spark):
    # 5 docs share the boilerplate header; docs 4 and 5 carry it at a
    # DIFFERENT token offset (after a prefix that itself ends at a boundary),
    # exercising the content-defined re-synchronization that fixed-width
    # windows cannot do.  2 docs have no header.  Bodies are unique
    # (df = 1) and boundary-free, so each forms a single trailing line.
    rows = [
        (1, f"{_HEADER} delta echo"),
        (2, f"{_HEADER} foxtrot golf"),
        (3, f"{_HEADER} hotel delta"),
        (4, f"kilo india {_HEADER} echo golf"),
        (5, f"golf hotel india {_HEADER} kilo delta"),
        (6, "delta golf kilo"),
        (7, "echo hotel foxtrot"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_content_defined_lines_resynchronize(spark):
    lines = {
        (r["doc_id"], r["pos"]): r["line"]
        for r in content_defined_lines(_fixture_docs(spark)).collect()
    }
    # doc 1: header line + trailing body line
    assert lines[(1, 1)] == _HEADER and lines[(1, 2)] == "delta echo"
    # doc 4: prefix closes at 'india', then the header aligns despite offset 2
    assert lines[(4, 1)] == "kilo india"
    assert lines[(4, 2)] == _HEADER
    assert lines[(4, 3)] == "echo golf"
    # doc 5: offset 3 — still aligned
    assert lines[(5, 2)] == _HEADER
    # headerless docs are one line each
    assert lines[(6, 1)] == "delta golf kilo" and (6, 2) not in lines


def test_cross_doc_line_dedup_drops_boilerplate_everywhere(spark):
    out = {
        r["doc_id"]: r
        for r in cross_doc_line_dedup(_fixture_docs(spark), max_df=3).collect()
    }
    # header df = 5 > 3 → removed from ALL five docs (no canonical survivor,
    # unlike dedup_repeated_spans' keep-first rule); unique lines untouched
    assert [out[1]["n_lines"], out[1]["n_removed"]] == [2, 1]
    assert out[1]["dedup_text"] == "delta echo"
    assert out[4]["n_removed"] == 1
    assert out[4]["dedup_text"] == "kilo india\necho golf"
    assert out[5]["dedup_text"] == "golf hotel india\nkilo delta"
    assert out[6]["n_removed"] == 0 and out[6]["dedup_text"] == "delta golf kilo"
    # removal is by document frequency, not occurrence count: at max_df=5
    # nothing crosses the threshold
    kept = cross_doc_line_dedup(_fixture_docs(spark), max_df=5).collect()
    assert all(r["n_removed"] == 0 for r in kept)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_cross_doc_lines",
        "multimodal_phash_neardup",
        "corpus_mixture_refresh",
        # wave 2: TPC-H plan-family depth
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q10_returned_items",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        # wave 3: the line-cleanse-first curation composition and the
        # sharded sweep-line
        "corpus_curation_v7",
        "events_peak_concurrency",
        # wave 4: lossless prefix-filtering join + exact weighted median
        "dedup_prefix_jaccard",
        "weighted_median_price",
        # wave 5: the TPC-H close (the nine families wave 2 deferred)
        "q2_min_cost_supplier",
        "q8_market_share",
        "q9_product_profit",
        "q11_important_brands",
        "q12_late_line_priority",
        "q16_supplier_part_count",
        "q20_dominant_supplier",
        "q21_waiting_supplier",
        "q22_idle_customers",
    ],
)
@pytest.mark.parametrize(
    "sf_dir",
    [
        "/root/testdata/sf0.001",
        pytest.param("/root/testdata/sf0.1", marks=pytest.mark.slow),
    ],
)
def test_round8_queries_oracle_other_scales(spark, sf_dir, name):
    # sf0.01 is covered by the registry-wide differential; this pins the
    # smallest and 10× scales (three round-1 hazard classes only appeared
    # at 10×).
    if name not in QUERY_REGISTRY:
        pytest.skip(f"{name} not registered yet")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spec = QUERY_REGISTRY[name]
    run_differential(spark, con, name, spec.fn, spec.oracle, sf_dir)


def test_prefix_filter_candidates_strictly_prune(spark):
    """The prefix self-join must generate strictly fewer candidate pairs than
    the full posting-list self-join (that pruning is the technique's whole
    point), while the query result equals exact ground truth by construction
    (the oracle differential proves losslessness)."""
    from airflow_cms_inpatient_etl_spark.operators.text import exploded_shingle_hashes
    from airflow_cms_inpatient_etl_spark.sources.registry import load_table
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    ex = exploded_shingle_hashes(d, "doc_id", "text")
    df_ = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))

    def pair_volume(posting):
        occ = posting.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
        return occ.agg(
            F.sum(F.col("occ") * (F.col("occ") - 1) / 2).cast("long")
        ).first()[0]

    full_vol = pair_volume(ex)
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    ranked = (
        ex.join(df_, "h")
        .join(sizes, "doc_id")
        .withColumn("rk", F.row_number().over(W.partitionBy("doc_id").orderBy("df", "h")))
    )
    plen = F.col("set_size") - F.expr("(7 * set_size + 9) div 10") + 1
    prefix_vol = pair_volume(ranked.filter(F.col("rk") <= plen).select("doc_id", "h"))
    assert 0 < prefix_vol < full_vol, (prefix_vol, full_vol)
