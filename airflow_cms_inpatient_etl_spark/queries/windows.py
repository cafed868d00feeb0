"""Window functions (SURVEY §2.B): ranking, lag/lead, running frames, ntile.

Every ORDER BY inside a window includes a unique tie-breaker column so results
are deterministic and oracle-comparable.  Running sums go through the exact
decimal cast (both engines accumulate in-frame sequentially, but decimal keeps
it provably order-independent).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.functions.exact import dec
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table


@register(
    "window_rank_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
               DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS drnk
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank_topk_per_group(spark, sf_dir):
    """Top-k per group via row_number — the scalable top-k idiom (single
    shuffle on the partition key, per-partition heap under AQE)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead_events",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_events(spark, sf_dir):
    """lag/lead over per-user event timelines; gap computed in exact integer
    microseconds (no float time arithmetic)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_orders_so_far
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """Cumulative frame (ROWS UNBOUNDED PRECEDING → CURRENT ROW)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice", scale=4, precision=18)).over(w).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_orders_so_far"),
    )


@register(
    "window_sliding_frame_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_3row_sum
    FROM lineitem
    """,
)
def window_sliding_frame_avg(spark, sf_dir):
    """Bounded sliding frame (moving 3-row sum per supplier timeline)."""
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so the
    # summed column itself joins the ORDER BY: any residual tie then has equal
    # quantity and the frame sum is order-invariant.
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(-2, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("double").alias("qty_3row_sum"),
    )


@register(
    "window_ntile_percent_rank",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS balance_quartile,
           PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS pct_rank
    FROM customer
    """,
)
def window_ntile_percent_rank(spark, sf_dir):
    """Distribution functions over a global ordering (single-partition window —
    at 100 TB you'd bucket first; kept global here to match ANSI semantics)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@register(
    "window_range_frame_1h",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_events_trailing_1h,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sum_value_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame_1h(spark, sf_dir):
    """Value-based RANGE frame (trailing 1 hour per user, in exact integer
    microseconds) — the time-windowed running aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events_trailing_1h"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_value_trailing_1h"),
    )


@register(
    "window_cume_dist_nth",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey) AS cdist,
           NTH_VALUE(s_suppkey, 3) OVER (ORDER BY s_acctbal, s_suppkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS third_poorest
    FROM supplier
    """,
)
def window_cume_dist_nth(spark, sf_dir):
    """cume_dist + nth_value over a total ordering (n/total fractions are
    exact integer divisions → deterministic doubles)."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy("s_acctbal", "s_suppkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.cume_dist().over(w).alias("cdist"),
        F.nth_value("s_suppkey", 3).over(wfull).alias("third_poorest"),
    )


@register(
    "window_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderdate) OVER w AS first_order_date,
           LAST_VALUE(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_value(spark, sf_dir):
    """first_value/last_value with an explicit full-partition frame for
    last_value (the default frame would truncate at the current row)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(wfull).alias("last_order_date"),
    )
