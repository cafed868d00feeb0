"""Skew-handling operators: salted join/aggregate equal their unsalted
counterparts; grouped merge_asof matches the carry-forward as-of query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.joins import (
    merge_asof_grouped,
    salted_aggregate,
    salted_join,
)
from airflow_cms_inpatient_etl_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey").select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (99, "orphan")], "k long, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, d string")
    out = salted_join(fact, dim, "k", n_salts=4, how="left").collect()
    by_key = {r["k"]: r["d"] for r in out}
    assert by_key == {1: "x", 2: "y", 99: None}


def test_salted_join_rejects_full_outer(spark):
    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, fact, "k", how="full")


def test_salted_aggregate_equals_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
    )
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n": F.count(F.lit(1)),
            "sum_qty": F.sum("l_quantity"),
            "min_qty": F.min("l_quantity"),
            "max_qty": F.max("l_quantity"),
        },
    )
    p = {r["l_returnflag"]: (r["n"], round(r["sum_qty"], 4), r["min_qty"], r["max_qty"]) for r in plain.collect()}
    s = {r["l_returnflag"]: (r["n"], round(r["sum_qty"], 4), r["min_qty"], r["max_qty"]) for r in salted.collect()}
    assert p == s


def test_merge_asof_grouped_matches_carry_forward(spark):
    """The pandas merge_asof operator agrees with the pure-DataFrame as-of
    query on (user, purchase-ts) → last click ts."""
    e = load_table(spark, SF_SMOKE, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value"))
        .dropDuplicates(["user_id", "click_ts"])
    )
    out = merge_asof_grouped(
        purchases.select("user_id", "ts"),
        clicks.withColumnRenamed("click_ts", "cts"),
        key="user_id",
        left_ts="ts",
        right_ts="cts",
        right_value_cols=["click_value"],
    )
    # compare against the registered as-of query's semantics
    from airflow_cms_inpatient_etl_spark.queries import QUERY_REGISTRY

    expected = QUERY_REGISTRY["events_asof_last_click"].fn(spark, SF_SMOKE)
    exp = {(r["user_id"], r["ts"]): r["last_click_ts"] for r in expected.collect()}
    got_rows = out.collect()
    assert len(got_rows) == len(exp)
    # merge_asof returns the click's value; map back via the clicks table
    click_ts_by_value = {
        (r["user_id"], r["click_value"]): r["click_ts"] for r in clicks.collect()
    }
    for r in got_rows:
        want_ts = exp[(r["user_id"], r["ts"])]
        if r["click_value"] is None:
            assert want_ts is None
        else:
            assert click_ts_by_value[(r["user_id"], r["click_value"])] == want_ts


def test_merge_asof_with_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (1, "2024-01-01 02:00:00")], "user_id long, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:09:00", 5.0)], "user_id long, cts_s string, click_value double"
    ).select("user_id", F.col("cts_s").cast("timestamp").alias("cts"), "click_value")
    out = merge_asof_grouped(
        left, right, "user_id", "ts", "cts", ["click_value"], tolerance_us=30 * 60 * 1_000_000
    ).collect()
    by_ts = {str(r["ts"]): r["click_value"] for r in out}
    assert by_ts["2024-01-01 00:10:00"] == 5.0  # within 30 min
    assert by_ts["2024-01-01 02:00:00"] is None  # beyond tolerance
