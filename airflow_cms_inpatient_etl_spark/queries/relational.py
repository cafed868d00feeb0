"""Tier-B relational breadth (SURVEY §2.B): filters, grouped aggregation,
joins of every flavor, set ops, cube/rollup/grouping-sets, scalar functions.

All aggregation over doubles goes through the exact-decimal helpers
(``functions.exact``) so results are order-independent and hash-match the
DuckDB oracle bit-for-bit.  Scale notes appear per query: what shuffles, what
broadcasts, what is pre-aggregated.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.functions.exact import davg, dec, dsum
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table


# --------------------------------------------------------------------------- #
# grouped aggregation                                                         #
# --------------------------------------------------------------------------- #
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sum_base_price,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                    * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                    * (1 - CAST(l_discount AS DECIMAL(8,4)))
                    * (1 + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DECIMAL(38,4)) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter → hash agg (8 aggregates, 2 group cols).
    Map-side partial aggregation collapses the shuffle to |groups|·|partitions|
    rows; the parquet scan prunes to the 7 referenced columns.

    Measures are full-precision doubles, so each column is cast to decimal
    ONCE (≤12 significant digits — beyond ~13 the engines' double→decimal
    casts disagree) and all derived arithmetic stays in exact decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice", scale=4, precision=18)
    disc = dec("l_discount", scale=4, precision=8)
    tax = dec("l_tax", scale=4, precision=8)
    # the literal 1 must be a narrow decimal, or Spark widens it to
    # decimal(10,0) and the triple product blows past precision 38 (lossy)
    one = F.lit("1").cast("decimal(5,4)")
    disc_price = price * (one - disc)   # (18,4)*(9,4) -> (28,8), exact
    charge = disc_price * (one + tax)   # (28,8)*(9,4) -> (38,12), exact
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            # rescale to 4 decimals before the double cast: a wide-scale
            # decimal sum needs >17 significant digits, where decimal->double
            # conversion differs by 1 ulp across engines
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,4)").cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "group_agg_orders",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def group_agg_orders(spark, sf_dir):
    """Grouped agg with count/sum/avg/min/max over doubles and timestamps."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "sum_price", scale=4, precision=18),
        davg("o_totalprice", "avg_price", scale=4, precision=18),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "count_distinct_segments",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS sum_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def count_distinct_segments(spark, sf_dir):
    """COUNT(DISTINCT) — Spark plans expand + two-phase agg; stays exact."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "sum_acctbal"),
    )


@register(
    "approx_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
           TRUE AS distinct_within_5pct,
           TRUE AS q50_in_bounds,
           TRUE AS q90_in_bounds,
           TRUE AS q99_in_bounds
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_aggregates(spark, sf_dir):
    """approx_count_distinct (HLL++) + approx percentiles — the 100 TB-scale
    substitutes for exact COUNT(DISTINCT)/percentile.  Sketch *estimates* are
    engine-specific, so the oracle-checkable surface is (a) the exact counts
    (DuckDB recomputes them) and (b) accuracy CLAIMS as booleans: the HLL
    estimate lands within 5 % of exact (rsd 0.01 → ~5σ margin) and each
    approx percentile lands between the exact percentiles ±0.02 rank (the
    sketch's rank-error guarantee is 1/accuracy = 1e-4, two orders tighter).
    DuckDB asserts the booleans are literally TRUE — a drifted sketch flips a
    flag and hash-mismatches.  Sketches are deterministic for fixed data, so
    this is a stable check, not a flaky one."""
    li = load_table(spark, sf_dir, "lineitem")
    agged = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("_approx_parts"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("_pq"),
        F.percentile(
            "l_extendedprice", [0.48, 0.52, 0.88, 0.92, 0.985, 0.995]
        ).alias("_pe"),
    )
    def in_bounds(i: int, lo: int, hi: int):
        q = F.element_at("_pq", i)
        return (q >= F.element_at("_pe", lo)) & (q <= F.element_at("_pe", hi))
    rel_err = F.abs(F.col("_approx_parts") - F.col("exact_distinct")) / F.col(
        "exact_distinct"
    )
    return agged.select(
        "l_returnflag",
        "n_rows",
        "exact_distinct",
        (rel_err <= F.lit(0.05)).alias("distinct_within_5pct"),
        in_bounds(1, 1, 2).alias("q50_in_bounds"),
        in_bounds(2, 3, 4).alias("q90_in_bounds"),
        in_bounds(3, 5, 6).alias("q99_in_bounds"),
    )


# --------------------------------------------------------------------------- #
# filters / predicates                                                        #
# --------------------------------------------------------------------------- #
@register(
    "filter_complex_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 45
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_linestatus = 'F'
      AND (l_discount < 0.05 OR l_tax > 0.03)
    """,
)
def filter_complex_predicates(spark, sf_dir):
    """BETWEEN / IN / comparison / boolean-combination predicates — all pushed
    to the parquet scan (PushedFilters in the physical plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 45)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_linestatus") == "F")
        & ((F.col("l_discount") < 0.05) | (F.col("l_tax") > 0.03))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")


@register(
    "filter_like_null",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE text LIKE '%spark%' AND lang IS NOT NULL AND source LIKE 'src1%'
    """,
)
def filter_like_null(spark, sf_dir):
    """LIKE prefix/infix patterns + IS NOT NULL."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.col("text").like("%spark%") & F.col("lang").isNotNull() & F.col("source").like("src1%")
    ).select("doc_id", "lang", "source")


@register(
    "filter_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM orders
    )
    """,
)
def filter_scalar_subquery(spark, sf_dir):
    """Filter against a global scalar aggregate (above-average orders).
    Expressed as a broadcast cross-join of the 1-row aggregate — no driver
    round-trip, works unchanged on a cluster."""
    orders = load_table(spark, sf_dir, "orders")
    threshold = orders.agg(davg("o_totalprice", "avg_price", scale=4, precision=18))
    return (
        orders.crossJoin(F.broadcast(threshold))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------- #
# joins                                                                       #
# --------------------------------------------------------------------------- #
@register(
    "join_multiway_revenue",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway_revenue(spark, sf_dir):
    """TPC-H Q5 shape: fact⋈fact sort-merge (lineitem⋈orders) then a chain of
    broadcast joins for the dimensions; Catalyst/AQE picks broadcast for
    customer/nation/region automatically under the 64 MB threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                dec("l_extendedprice", scale=4, precision=18)
                * (F.lit("1").cast("decimal(5,4)") - dec("l_discount", scale=4, precision=8))
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark, sf_dir):
    """LEFT SEMI join (EXISTS): emits each left row at most once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_right_outer_item_counts",
    oracle="""
    SELECT o.o_orderkey, COUNT(l.l_linenumber) AS n_items
    FROM lineitem l
    RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
    """,
)
def join_right_outer_item_counts(spark, sf_dir):
    """RIGHT OUTER join preserving order rows with zero lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "right")
        .groupBy("o_orderkey")
        .agg(F.count("l_linenumber").alias("n_items"))
    )


@register(
    "join_full_outer_nation_profile",
    oracle="""
    WITH cust AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         supp AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           cust.n_cust AS n_cust, supp.n_supp AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def join_full_outer_nation_profile(spark, sf_dir):
    """FULL OUTER join — pre-aggregated per side first (the 100 TB pattern:
    shrink both inputs to |keys| rows before the join shuffle)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "nationkey", "full_outer").select(
        "nationkey", "n_cust", "n_supp"
    )


@register(
    "join_range_quantity_tiers",
    oracle="""
    SELECT t.tier_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem l
    JOIN (VALUES ('t00_small', 0, 10), ('t10_mid', 10, 25), ('t25_large', 25, 40),
                 ('t40_bulk', 40, 1000)) AS t(tier_name, lo, hi)
      ON l.l_quantity >= t.lo AND l.l_quantity < t.hi
    GROUP BY t.tier_name
    """,
)
def join_range_quantity_tiers(spark, sf_dir):
    """Range (theta) join against a tiny tier table — broadcast nested loop;
    at scale the small side is always broadcast so this never shuffles the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    tiers = spark.createDataFrame(
        [("t00_small", 0, 10), ("t10_mid", 10, 25), ("t25_large", 25, 40), ("t40_bulk", 40, 1000)],
        "tier_name string, lo int, hi int",
    )
    return (
        li.join(
            F.broadcast(tiers),
            (li.l_quantity >= tiers.lo) & (li.l_quantity < tiers.hi),
        )
        .groupBy("tier_name")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity", "sum_qty"))
    )


# --------------------------------------------------------------------------- #
# sort / limit / top-k                                                        #
# --------------------------------------------------------------------------- #
@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def topk_orders_by_price(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge of k rows — no global sort). Tie-broken on the unique key so
    the result set is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(20)
    )


# --------------------------------------------------------------------------- #
# set operations                                                              #
# --------------------------------------------------------------------------- #
@register(
    "set_union_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_nations(spark, sf_dir):
    """UNION (distinct) — union + distinct collapses map-side via hash agg."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect_custkeys",
    oracle="""
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    """,
)
def set_intersect_custkeys(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.intersect(o)


@register(
    "set_except_custkeys",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def set_except_custkeys(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.subtract(o)


# --------------------------------------------------------------------------- #
# cube / rollup / grouping sets / pivot                                       #
# --------------------------------------------------------------------------- #
@register(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark, sf_dir):
    """CUBE: all 4 grouping combinations in one pass (Expand + hash agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


@register(
    "rollup_region_nation",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_region_nation(spark, sf_dir):
    """ROLLUP over a dimension hierarchy reached via broadcast joins."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "sum_acctbal"))
    )


@register(
    "grouping_sets_events",
    oracle="""
    SELECT event_type, user_id, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id), ())
    """,
)
def grouping_sets_events(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL surface (same Catalyst Expand node).
    Uses a call-scoped view name so concurrent calls with different sf_dirs
    cannot race on a shared temp view; the view is dropped immediately —
    spark.sql analyzes eagerly, so the returned plan no longer needs it."""
    import uuid

    view = f"events_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "events").createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT event_type, user_id, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
            FROM {view}
            GROUP BY GROUPING SETS ((event_type), (user_id), ())
            """
        )
    finally:
        spark.catalog.dropTempView(view)


@register(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(27,6)) END) AS DOUBLE) AS "O",
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(27,6)) END) AS DOUBLE) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark, sf_dir):
    """PIVOT with explicit value list (no extra pass to discover values)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )


@register(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
    """,
)
def unpivot_part_attrs(spark, sf_dir):
    """UNPIVOT (melt) wide columns into (attr, val) rows."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice"
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


@register(
    "approx_distinct_sketch_merge",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
           TRUE AS merged_within_2pct,
           TRUE AS direct_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_sketch_merge(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg): per-shard partial sketches union into
    the same estimate a single global pass produces — the property that lets
    100 TB pipelines maintain distinct counts incrementally (per partition,
    per micro-batch) and merge at read time instead of re-scanning history.
    Sketch internals are engine-specific, so the oracled surface is the exact
    count (DuckDB recomputes it) plus accuracy claims as booleans: merged and
    single-pass estimates each land within 2 % of exact (note the union path
    is NOT bit-identical to the single-pass sketch — sparse→dense promotion
    during union shifts the estimate slightly; both stay inside the bound).
    Deterministic for fixed data, so the booleans are stable TRUEs."""
    li = load_table(spark, sf_dir, "lineitem")
    partials = li.groupBy(
        "l_returnflag", (F.col("l_orderkey") % 8).alias("shard")
    ).agg(F.hll_sketch_agg("l_partkey").alias("sk"))
    merged = partials.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
    )
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("direct_estimate"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
    )
    def within(est: str, bound: float):
        return (
            F.abs(F.col(est) - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= F.lit(bound)
        )
    return merged.join(direct, "l_returnflag").select(
        "l_returnflag",
        "exact_distinct",
        within("merged_estimate", 0.02).alias("merged_within_2pct"),
        within("direct_estimate", 0.02).alias("direct_within_2pct"),
    )
