"""TPC-H plan-family depth, wave 2 (round 8): the remaining classic shapes
expressible over the fixture's reduced column set — local-supplier volume
(Q5), the single-scan forecast aggregate (Q6), bidirectional volume shipping
(Q7), returned-item top-k (Q10), the outer-join order-count distribution
(Q13), the decimal-exact argmax view join (Q15), and the cross-multiplied
small-quantity filter (Q17).

Q2/Q9/Q11/Q16/Q20 need ``partsupp`` and Q12/Q21 need
``l_shipmode``/``l_commitdate``/``l_receiptdate`` — columns the fixture does
not carry — so wave 5 (``relational4.py``) adapts those nine families onto
the available columns; together the registry covers all 22 classic shapes.

Determinism: every revenue/quantity aggregate uses the exact-decimal recipe
(``functions/exact.py``) with ONE terminal double cast; ratio comparisons
(Q17's 0.2·avg filter) are integer-free decimal CROSS-MULTIPLICATIONS, never
a decimal division (decimal-division rounding differs across engines);
argmax selection (Q15) compares decimals, not doubles.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.functions.exact import dec
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table

# the exact-decimal revenue term shared by Q5/Q7/Q10/Q15 (mirrors
# join_multiway_revenue): price×(1−discount) in exact decimal
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(19,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))"
)


def _rev() -> F.Column:
    return dec("l_extendedprice", scale=4, precision=18) * (
        F.lit("1").cast("decimal(5,4)") - dec("l_discount", scale=4, precision=8)
    )


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------- #
# Q5 — local supplier volume                                                   #
# --------------------------------------------------------------------------- #


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 proper — `join_multiway_revenue` is the Q5 JOIN SHAPE, this
    is the full semantics: the supplier join carries the LOCAL-supplier
    condition (c_nationkey = s_nationkey), a second equality that rides the
    same broadcast join rather than becoming a post-join filter.  Plan:
    orders' date range prunes FIRST (pushed to the parquet scan), lineitem
    joins the pruned orders fact-to-fact, then a chain of broadcast dims;
    the region filter cuts the nation broadcast before it reaches the fact.
    Revenue is the shared exact-decimal term with one terminal double
    cast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------- #
# Q6 — forecast revenue change                                                 #
# --------------------------------------------------------------------------- #


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                    * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: the purest scan shape in the suite — one table, three
    pushed-down predicates, one global aggregate, zero joins.  Its job in
    this registry is to pin the floor: every predicate reaches the parquet
    scan (`PushedFilters`), the projection reads exactly four columns, and
    the whole plan is a single WholeStageCodegen span over map-side partial
    aggregation (the shape 100 TB scans must collapse to).  The discount
    BETWEEN compares raw doubles to literals — comparison only, no float
    arithmetic; the revenue product is exact decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                dec("l_extendedprice", scale=4, precision=18)
                * dec("l_discount", scale=4, precision=8)
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------- #
# Q7 — volume shipping between two nations                                     #
# --------------------------------------------------------------------------- #


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bidirectional trade volume between two nations by ship
    year.  The interesting plan property is the SAME dimension joined
    TWICE under different roles (nation as supplier-side n1 and
    customer-side n2) with a disjunctive cross-role predicate — the shape
    that breaks naive join-reorder heuristics.  Both nation broadcasts are
    pre-filtered to the two-nation subset, so the disjunction evaluates
    over a 2×2 role space after the joins, not as a residual over the full
    fact.  Ship-year extraction groups exactly like the SQL YEAR()."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------- #
# Q10 — returned item reporting (top 20)                                       #
# --------------------------------------------------------------------------- #


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name AS nation_name
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY SUM({_REV_SQL}) DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: customers who returned the most revenue in a quarter —
    join + group + global top-20.  The ORDER BY ... LIMIT compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of 20-row
    tops, never a global sort), and the sort key is the EXACT DECIMAL
    revenue with c_custkey as a total-order tiebreak, so the top-20
    frontier is engine-deterministic even under revenue ties.  The
    returnflag predicate pushes to the lineitem scan; the quarter predicate
    prunes orders before the fact-fact join."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation_name")
        )
        .agg(F.sum(_rev()).alias("__rev_dec"))
        .orderBy(F.col("__rev_dec").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("__rev_dec").cast("double").alias("revenue"),
            "c_acctbal",
            "nation_name",
        )
    )


# --------------------------------------------------------------------------- #
# Q13 — customer order-count distribution                                      #
# --------------------------------------------------------------------------- #


@register(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderstatus <> 'F'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: the double-aggregation histogram — LEFT OUTER join so
    order-less customers survive with count 0 (COUNT(o_orderkey) counts
    non-NULL join matches, the outer-join-aware count), aggregate per
    customer, then aggregate the counts into a distribution.  The
    filtered-join predicate (status <> 'F') lives IN the join condition,
    not a WHERE — a WHERE would silently turn the outer join inner, the
    classic Q13 trap.  Second aggregate is histogram-sized; output is
    fully ordered on (custdist, c_count) so the frame is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------- #
# Q15 — top supplier (argmax against an aggregate view)                        #
# --------------------------------------------------------------------------- #


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue_view AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_REV_SQL}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue_view r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue_view)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: the argmax-against-a-view shape — a quarter's revenue per
    supplier, then the supplier(s) hitting the maximum.  The max and the
    equality comparison both run in EXACT DECIMAL (the double cast happens
    only on output), so 'revenue = max revenue' selects identical rows in
    both engines — the same reason Q17 cross-multiplies instead of
    dividing.  The scalar-subquery max broadcasts; the view aggregates
    once and is consumed twice (Catalyst re-derives it per consumer — at
    supplier-dimension size the re-scan is cheaper than a shuffle-breaking
    cache; at 100 TB you'd materialize the view, which `write_table`
    covers)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------- #
# Q17 — small-quantity-order revenue (correlated avg, cross-multiplied)        #
# --------------------------------------------------------------------------- #


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(27,6))) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) / 7.0
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#11'
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(27,6)) * 5 * a.cnt < a.sum_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue locked in small-quantity orders — each lineitem
    compares against 20 % of its part's AVERAGE quantity.  The correlated
    scalar subquery decorrelates into one per-part aggregate joined back to
    the fact (aggregate-then-join, the q18 ordering), and the
    `quantity < 0.2·avg` filter is the integer-free CROSS-MULTIPLICATION
    `5·quantity·count < sum` — decimal division would round differently
    across engines (the `customer_pareto_class` discipline), multiplication
    is exact.  The brand predicate rides the part broadcast join; the final
    division by 7.0 is the single terminal float op."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("a_partkey"))
        .filter(dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (
                F.sum(dec("l_extendedprice", scale=4, precision=18)).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --------------------------------------------------------------------------- #
# weighted_median_price — exact weighted percentile via cross-multiplication   #
# --------------------------------------------------------------------------- #


@register(
    "weighted_median_price",
    oracle="""
    WITH pw AS (
        SELECT l_returnflag, l_extendedprice AS price,
               SUM(CAST(l_quantity AS DECIMAL(27,6))) AS w
        FROM lineitem GROUP BY l_returnflag, l_extendedprice
    ),
    cum AS (
        SELECT l_returnflag, price, w,
               SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                            ROWS UNBOUNDED PRECEDING) AS cumw
        FROM pw
    ),
    tot AS (
        SELECT l_returnflag, SUM(w) AS wtot,
               CAST(COUNT(*) AS BIGINT) AS n_prices
        FROM pw GROUP BY l_returnflag
    )
    SELECT c.l_returnflag, t.n_prices,
           CAST(t.wtot AS DOUBLE) AS total_weight,
           MIN(c.price) AS weighted_median
    FROM cum c JOIN tot t ON c.l_returnflag = t.l_returnflag
    WHERE 2 * c.cumw >= t.wtot
    GROUP BY c.l_returnflag, t.n_prices, t.wtot
    """,
)
def weighted_median_price(spark, sf_dir):
    """Exact WEIGHTED median (lower weighted median): the smallest price at
    which the cumulative quantity weight reaches half the total — the
    robust center the plain median family (`agg_median_price`,
    `agg_exact_percentiles`) can't express when observations carry mass.
    Every comparison is exact: weights are decimal sums, the half-total
    crossing is the cross-multiplication 2·cumw ≥ wtot (never wtot/2 — a
    decimal division would round), and the median itself is a raw input
    value, so the only float in the output is the terminal total-weight
    cast.  Plan: one (flag, price) pre-aggregate shrinks the fact before
    any window; then the cumulative sum AND the per-flag total/count ride
    the SAME per-flag window pass (whole-partition frames share the
    cumulative window's exchange+sort, so the pre-aggregate is consumed
    ONCE — the earlier aggregate-then-broadcast-join form re-ran the
    fact-sized pre-aggregate for the totals side; measured ~1.9× at
    sf0.1).  At 100 TB the `events_peak_concurrency` shard-offset identity
    applies verbatim to this prefix sum, since decimal addition is
    associative."""
    li = load_table(spark, sf_dir, "lineitem")
    pw = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price")).agg(
        F.sum(dec("l_quantity")).alias("w")
    )
    cw = (
        W.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    whole = W.partitionBy("l_returnflag").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = (
        pw.withColumn("cumw", F.sum("w").over(cw))
        .withColumn("wtot", F.sum("w").over(whole))
        .withColumn("n_prices", F.count(F.lit(1)).over(whole))
    )
    return (
        cum.filter(F.lit(2) * F.col("cumw") >= F.col("wtot"))
        .groupBy("l_returnflag", "n_prices", "wtot")
        .agg(F.min("price").alias("weighted_median"))
        .select(
            "l_returnflag",
            "n_prices",
            F.col("wtot").cast("double").alias("total_weight"),
            "weighted_median",
        )
    )


# --------------------------------------------------------------------------- #
# Q3 — shipping priority (top 10 unshipped-revenue orders)                     #
# --------------------------------------------------------------------------- #


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY SUM({_REV_SQL}) DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3: top-10 orders by revenue not yet shipped as of a date, for
    one market segment — completing the 22-query TPC-H suite (the fixture
    has no o_shippriority column, so o_orderpriority is carried in its
    place; semantics otherwise per spec Q3).  Plan: the segment predicate
    prunes CUSTOMER to ~1/5 and broadcasts it into ORDERS (dimension
    filter before the fact join); the two date predicates push to their
    scans; one fact-fact hash join on l_orderkey; exact-decimal revenue
    sum; ORDER BY ... LIMIT 10 compiles to TakeOrderedAndProject
    (per-partition heaps, never a global sort) with l_orderkey as the
    total-order tiebreak under revenue ties."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-03-15 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-03-15 00:00:00")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).alias("__rev"))
        .orderBy(F.col("__rev").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.col("__rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )
