"""TPC-H plan-family depth, wave 5 (round 8): the nine families wave 2
deferred, adapted to the fixture's reduced column set.  With these the
registry covers ALL 22 classic TPC-H plan shapes.

Adaptations (the fixture has no ``partsupp``, ``l_commitdate`` /
``l_receiptdate`` / ``l_shipmode``, ``c_phone``, ``s_comment``,
``p_container`` / ``p_mfgr``):

* Q2's ``ps_supplycost`` → each supplier's minimum observed sale price per
  part (``MIN(l_extendedprice)`` over the supplier's lines) — the
  correlated-scalar-min + multi-dimension join + ordered-top-k family is
  intact.
* Q9's ``ps_supplycost`` → catalog cost ``p_retailprice × l_quantity``.
* Q11's per-``ps_partkey`` value → per-brand revenue (scale-stable group
  count); the defining shape — group aggregate HAVING > fraction × global
  scalar — is intact.
* Q12's commit/receipt lateness → ``l_shipdate > o_orderdate + 30 days``;
  ``l_shipmode`` → ``l_linestatus``.
* Q16's complaint suppliers → ``s_acctbal < 2000``.
* Q20's ``ps_availqty > ½·qty`` → dominant supplier: shipped more than half
  a part's 1996 volume.
* Q21's receipt-after-commit lateness → the supplier whose line shipped
  last in a multi-supplier order.
* Q22's phone country codes → market segments.

Determinism (screened against the cross-engine hazard list): money and
quantity aggregates use the exact-decimal recipe with ONE terminal double
cast; every fraction/average threshold is a decimal CROSS-MULTIPLICATION
(×30 for Q11's 1/30, ×2 for Q20's ½, ×n for Q22's mean) — never a decimal
division; Q2's per-part minimum is a double MIN (order-independent, no
summation); Q21 compares exact microsecond timestamps.  No ratio column is
emitted anywhere — numerator and denominator ship separately (the q14
discipline).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.functions.exact import dec
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(19,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))"
)


def _rev() -> F.Column:
    return dec("l_extendedprice", scale=4, precision=18) * (
        F.lit("1").cast("decimal(5,4)") - dec("l_discount", scale=4, precision=8)
    )


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def _region_suppliers(spark, sf_dir, region: str):
    """Suppliers in a region, with nation name — dimension-sized at any SF
    (supplier:lineitem stays ~1:600), so every use site broadcasts it."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


_EURO_SUPP_SQL = """
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
"""


# --------------------------------------------------------------------------- #
# Q2 — minimum-cost supplier (correlated scalar min)                           #
# --------------------------------------------------------------------------- #


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH eligible_parts AS (
        SELECT p_partkey, p_name FROM part
        WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
    ),
    euro_supp AS ({_EURO_SUPP_SQL}),
    offers AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice) AS offer_price
        FROM lineitem
        JOIN eligible_parts ON l_partkey = p_partkey
        JOIN euro_supp ON l_suppkey = s_suppkey
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, s.n_name,
           o.l_partkey AS p_partkey, ep.p_name, o.offer_price
    FROM offers o
    JOIN euro_supp s ON o.l_suppkey = s.s_suppkey
    JOIN eligible_parts ep ON o.l_partkey = ep.p_partkey
    WHERE o.offer_price = (SELECT MIN(o2.offer_price) FROM offers o2
                           WHERE o2.l_partkey = o.l_partkey)
    ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p_partkey, s.s_suppkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 family: for each eligible part, the European supplier(s)
    offering it at the minimum price, ordered by supplier account balance.
    ``ps_supplycost`` is adapted to MIN(l_extendedprice) per (part,
    supplier) — see module docstring.

    Plan: the part predicate (type + size band) and the region restriction
    both prune BEFORE the fact is touched — eligible parts and European
    suppliers broadcast into the lineitem scan, so the only fact shuffle is
    the (partkey, suppkey) offer aggregation over the doubly-pruned lines.
    The correlated scalar min (``WHERE offer = (SELECT MIN … per part)``)
    becomes a per-part MIN WINDOW over the offer AGGREGATE — post-agg data
    is (eligible parts × suppliers)-bounded, never fact-bounded, and the
    window partitions by part (parallel at any SF).  The oracle keeps the
    correlated-subquery formulation: different derivation, same fixpoint.
    Determinism: MIN over doubles is order-independent (no summation
    anywhere); the top-100 tiebreak (acctbal DESC, nation, s_name,
    p_partkey, s_suppkey) is a TOTAL order because (p_partkey, s_suppkey)
    is the offers grain — s_name alone is not guaranteed unique, so the
    key the uniqueness argument rests on must itself appear in the sort."""
    supp = _region_suppliers(spark, sf_dir, "EUROPE")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    offers = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("offer_price"))
    )
    w = W.partitionBy("l_partkey")
    best = offers.withColumn("min_offer", F.min("offer_price").over(w)).filter(
        F.col("offer_price") == F.col("min_offer")
    )
    return (
        best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "offer_price",
            "s_suppkey",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey")
        .limit(100)
        .drop("s_suppkey")
    )


# --------------------------------------------------------------------------- #
# Q8 — national market share                                                   #
# --------------------------------------------------------------------------- #


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(CAST(ROUND(SUM(CASE WHEN sn.n_name = 'NATION_3'
                    THEN {_REV_SQL} ELSE 0 END), 4) AS DECIMAL(38,4)) AS DOUBLE)
               AS nation_volume,
           CAST(CAST(ROUND(SUM({_REV_SQL}), 4) AS DECIMAL(38,4)) AS DOUBLE)
               AS total_volume,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cr.r_name = 'AMERICA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 family: NATION_3's share of ECONOMY-part volume sold to
    AMERICA-region customers, per order year — the deepest classic join
    (8 relations) feeding a two-level conditional aggregate.

    Plan: the two selective predicates prune before any fact-fact work —
    the part filter broadcasts into the lineitem scan and the date range
    pushes to the orders scan; American customers are pre-restricted by a
    broadcast nation⋈region semi-reduction so the orders⋈customer join
    carries 1/5 of customers.  Only orders⋈lineitem shuffles fact-to-fact;
    every dimension rides a broadcast.  The market-share RATIO is NOT
    emitted: numerator (conditional sum) and denominator ship as separate
    exact-decimal sums with one terminal double cast each (the q14
    discipline — cross-engine decimal division scale rules never enter)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    am_nations = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(am_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    sn = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = _rev()
    zero = F.lit("0").cast("decimal(28,8)")
    j = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("nation_volume"),
        F.sum(rev).cast("decimal(38,4)").cast("double").alias("total_volume"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------- #
# Q9 — product-type profit                                                     #
# --------------------------------------------------------------------------- #


@register(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation_name,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(CAST(ROUND(SUM(
               CAST(l_extendedprice AS DECIMAL(19,4))
                   * (1 - CAST(l_discount AS DECIMAL(8,4)))
               - CAST(p_retailprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2))
           ), 4) AS DECIMAL(38,4)) AS DOUBLE) AS sum_profit,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 family: profit on 'gear' parts by supplier nation and order
    year.  ``ps_supplycost`` is adapted to catalog cost p_retailprice ×
    l_quantity (module docstring); the family's defining shape — a LIKE
    filter on part feeding a 5-relation join with a compound arithmetic
    aggregate over (nation, year) — is intact.

    Plan: the LIKE-filtered part list broadcasts into the lineitem scan
    (pruning the fact to ~1/8 before the only fact-fact join with orders);
    supplier⋈nation broadcasts.  Profit stays in exact decimal end-to-end —
    revenue at scale 8, catalog cost at scale 4, subtraction widens to the
    common scale exactly — with one terminal rescale-then-double cast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    profit = _rev() - dec("p_retailprice", scale=2, precision=12) * dec(
        "l_quantity", scale=2, precision=12
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(profit).cast("decimal(38,4)").cast("double").alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------- #
# Q11 — important stock (global-scalar HAVING)                                 #
# --------------------------------------------------------------------------- #


@register(
    "q11_important_brands",
    oracle=f"""
    WITH euro_supp AS ({_EURO_SUPP_SQL}),
    brand_value AS (
        SELECT p_brand, SUM({_REV_SQL}) AS v
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN euro_supp ON l_suppkey = s_suppkey
        GROUP BY p_brand
    )
    SELECT p_brand,
           CAST(CAST(ROUND(v, 4) AS DECIMAL(38,4)) AS DOUBLE) AS brand_value
    FROM brand_value
    WHERE CAST(v AS DECIMAL(34,8)) * 30
          > (SELECT CAST(SUM(v) AS DECIMAL(34,8)) FROM brand_value)
    ORDER BY brand_value DESC, p_brand
    """,
)
def q11_important_brands(spark, sf_dir):
    """TPC-H Q11 family: brands whose European-supplied revenue exceeds
    1/30 of the global total — a group aggregate gated by a GLOBAL scalar
    (the HAVING-vs-scalar-subquery shape).  Grouping is by brand (25
    groups, scale-stable) instead of the fixture-absent ``ps_partkey``.

    Plan: part and the region-restricted supplier set broadcast into the
    fact; ONE aggregation exchange (25 keys, map-side partials collapse it)
    produces brand values; the global total is the SUM OF THE 25 BRAND SUMS
    (decimal addition is associative-exact, so this equals the direct total
    bit-for-bit) computed on the post-agg micro-relation and attached as a
    broadcast 1-row cross join — the fact is scanned ONCE.  The 1/30
    threshold is the cross-multiplication v×30 > total in decimal(34,8)
    (×30 fits: 34+2+1 ≤ 38 precision), never a division."""
    supp = _region_suppliers(spark, sf_dir, "EUROPE").select("s_suppkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem")
    brand_value = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand")
        .agg(F.sum(_rev()).alias("v"))
    )
    total = brand_value.agg(
        F.sum("v").cast("decimal(34,8)").alias("total_v")
    )
    return (
        brand_value.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("decimal(34,8)") * 30 > F.col("total_v"))
        .select(
            "p_brand",
            F.col("v").cast("decimal(38,4)").cast("double").alias("brand_value"),
        )
        .orderBy(F.col("brand_value").desc(), "p_brand")
    )


# --------------------------------------------------------------------------- #
# Q12 — late lines by priority class                                           #
# --------------------------------------------------------------------------- #


@register(
    "q12_late_line_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_linestatus
    """,
)
def q12_late_line_priority(spark, sf_dir):
    """TPC-H Q12 family: high- vs low-priority counts of LATE lines per
    line status (commit/receipt lateness adapted to shipped >30 days after
    order; shipmode adapted to linestatus — module docstring).  The
    defining shape — a fact-fact join whose residual is a cross-table date
    comparison, feeding dual CASE-counted aggregates — is intact.

    Plan: the ship-year range pushes to the lineitem scan; the 30-day
    lateness predicate is a non-equi RESIDUAL on the orderkey equi-join
    (never a nested loop); one aggregation exchange over ≤2 keys with
    map-side partials.  Counts are integers — exact by construction."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------- #
# Q16 — supplier diversity per part class (NOT-IN anti)                        #
# --------------------------------------------------------------------------- #


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 2000)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 family: distinct-supplier counts per (brand, type, size)
    class, EXCLUDING a denylisted supplier set (complaint comments adapted
    to ``s_acctbal < 2000``).  The defining shape — NOT IN over a subquery
    turned anti-join, feeding COUNT(DISTINCT) over a composite group — is
    intact.

    Plan: the part class predicate broadcasts into the fact scan; the
    NOT IN becomes a broadcast LEFT ANTI join (suppkey is non-null so
    NOT-IN and anti-join agree); COUNT(DISTINCT suppkey) is the standard
    two-phase expand — partial distinct within (brand,type,size,suppkey)
    partitions then the final count — no row ever carries the payload."""
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select("s_suppkey")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------- #
# Q20 — dominant suppliers (nested semi chain)                                 #
# --------------------------------------------------------------------------- #


@register(
    "q20_dominant_supplier",
    oracle="""
    WITH asia_supp AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    ),
    small_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    qty_sp AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q_sp
        FROM lineitem
        JOIN small_parts ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    qty_p AS (
        SELECT l_partkey, SUM(q_sp) AS q_p FROM qty_sp GROUP BY l_partkey
    )
    SELECT DISTINCT a.s_name, a.n_name
    FROM asia_supp a
    WHERE a.s_suppkey IN (
        SELECT sp.l_suppkey
        FROM qty_sp sp JOIN qty_p p ON sp.l_partkey = p.l_partkey
        WHERE CAST(sp.q_sp AS DECIMAL(30,2)) * 2 > CAST(p.q_p AS DECIMAL(30,2))
    )
    ORDER BY a.s_name
    """,
)
def q20_dominant_supplier(spark, sf_dir):
    """TPC-H Q20 family: Asian suppliers who DOMINATED some 'small' part's
    1996 volume (shipped more than half of it — the ``availqty > ½·qty``
    shape adapted per the module docstring).  The defining nested
    semi-join chain — supplier ⋉ (pair aggregate ⋉ filtered parts) — is
    intact.

    Plan: the part-name filter broadcasts into the date-pruned fact scan;
    ONE fact shuffle builds the (part, supplier) quantity aggregate; the
    per-part total is the sum of the per-pair sums (associative-exact
    decimal) on post-agg data, joined back per part; the ½ threshold is the
    cross-multiplication 2·q_sp > q_p in decimal(30,2).  The supplier
    dimension receives a LEFT SEMI join from the dominant-pair keys — the
    IN-subquery never materializes duplicates."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li96 = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    qty_sp = (
        li96.join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity", scale=2, precision=12)).alias("q_sp"))
    )
    qty_p = qty_sp.groupBy("l_partkey").agg(F.sum("q_sp").alias("q_p"))
    dominant = qty_sp.join(qty_p, "l_partkey").filter(
        F.col("q_sp").cast("decimal(30,2)") * 2 > F.col("q_p").cast("decimal(30,2)")
    )
    return (
        asia_supp.join(
            dominant.select("l_suppkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "semi",
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------- #
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)                #
# --------------------------------------------------------------------------- #


@register(
    "q21_waiting_supplier",
    oracle=f"""
    WITH euro_supp AS ({_EURO_SUPP_SQL})
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM euro_supp s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 family: European suppliers whose line was the LAST to ship
    in a finished multi-supplier order (receipt-after-commit lateness
    adapted to shipped-last — module docstring), counted per supplier.
    The family's double correlation — EXISTS(another supplier) AND NOT
    EXISTS(another supplier shipped later) — is the oracle's formulation;
    the engine derives the same fixpoint WITHOUT correlated re-scans:

    a line l1 of supplier s qualifies iff  l1.shipdate ≥ max(shipdate over
    OTHER suppliers' lines in the order)  and the order has ≥2 suppliers.
    The per-(order, supplier) max is a partial-aggregated groupBy (line
    volume collapses MAP-SIDE before its exchange), and the order-level
    top-1 / tie-count / top-2 statistics are three windows over one
    orderkey exchange that carries only per-(order, supplier) rows — both
    exchanges move pair-sized data, never line-sized; `max_other` is then
    top1 when s is not the unique top achiever, else top2 (defined whenever
    n_supp ≥ 2).  The qualifying join back to lines is keyed (orderkey,
    suppkey) — broadcast at fixture scale by AQE's size estimate, a pair-
    keyed shuffle join at cluster scale.  Timestamps compare in exact
    microseconds; counts are integers."""
    f_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    li_f = li.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "semi")
    per_os = li_f.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("max_s")
    )
    w = W.partitionBy("l_orderkey")
    x = (
        per_os.withColumn("top1", F.max("max_s").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_top",
            F.sum(F.when(F.col("max_s") == F.col("top1"), 1).otherwise(0)).over(w),
        )
        .withColumn(
            "top2",
            F.max(F.when(F.col("max_s") < F.col("top1"), F.col("max_s"))).over(w),
        )
        .filter(F.col("n_supp") >= 2)
        .withColumn(
            "max_other",
            F.when(
                (F.col("max_s") < F.col("top1")) | (F.col("n_top") >= 2),
                F.col("top1"),
            ).otherwise(F.col("top2")),
        )
        .select("l_orderkey", "l_suppkey", "max_other")
    )
    supp = _region_suppliers(spark, sf_dir, "EUROPE").select("s_suppkey", "s_name")
    qualifying = li_f.join(x, ["l_orderkey", "l_suppkey"]).filter(
        F.col("l_shipdate") >= F.col("max_other")
    )
    return (
        qualifying.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------- #
# Q22 — idle high-balance customers (scalar-avg threshold + anti join)         #
# --------------------------------------------------------------------------- #


@register(
    "q22_idle_customers",
    oracle="""
    WITH seg AS (
        SELECT c_custkey, c_mktsegment,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE')
    ),
    pos AS (
        SELECT CAST(SUM(bal) AS DECIMAL(33,2)) AS total_pos,
               COUNT(*) AS n_pos
        FROM seg WHERE bal > 0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(bal) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
    FROM seg, pos
    WHERE CAST(bal AS DECIMAL(12,2)) * n_pos > total_pos
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-02-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 family: customers in three market segments (country codes
    adapted — module docstring) with above-average account balance and NO
    RECENT order (none since 2001-02-01 — the fixture gives every customer
    ~10 lifetime orders, so the classic no-orders-ever test is vacuous;
    idle-since keeps the anti-join non-trivial at every SF), aggregated per
    segment.  The two defining correlations — the scalar-subquery MEAN
    threshold and the NOT-EXISTS anti-join — are intact.

    Plan: the segment filter pushes to the customer scan; the positive-
    balance mean is a 1-row aggregate attached via broadcast cross join;
    the above-average test is the cross-multiplication bal × n > total in
    exact decimal (never a decimal division — the mean itself is never
    materialized); NOT EXISTS is a LEFT ANTI join against the orders
    custkey projection with the recency filter PUSHED TO THE ORDERS SCAN
    before the anti join (key-only — the anti side never carries payload).
    Segment sums are exact decimal with one terminal double cast."""
    seg = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "FURNITURE"))
        .select(
            "c_custkey",
            "c_mktsegment",
            dec("c_acctbal", scale=2, precision=12).alias("bal"),
        )
    )
    pos = seg.filter(F.col("bal") > 0).agg(
        F.sum("bal").cast("decimal(33,2)").alias("total_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2001-02-01"))
        .select("o_custkey")
    )
    return (
        seg.crossJoin(F.broadcast(pos))
        .filter(F.col("bal") * F.col("n_pos") > F.col("total_pos"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("decimal(38,2)").cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------- #
# orders_pareto_skyline — 2-D dominance (skyline) via sharded prefix-min       #
# --------------------------------------------------------------------------- #
# A point dominates another when it is <= on both objectives and < on at
# least one (Borzsony/Kossmann/Stocker 2001).  Under that definition a
# point also loses to a SAME-price point with a strictly earlier day, so
# within each price level only the min-day points (all ties among them,
# which are mutually non-dominating) can survive.  In 2-D the skyline then
# falls out of a prefix-min over the per-price-level best days: level
# (p, d_min) survives iff every strictly-cheaper level's best day is
# strictly later.

_SKY_SHARDS = 64


@register(
    "orders_pareto_skyline",
    oracle="""
    WITH pts AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS price_cents,
               CAST(EPOCH(o_orderdate) // 86400 AS BIGINT) AS day
        FROM orders
    ),
    lvl AS (
        SELECT price_cents, MIN(day) AS day FROM pts GROUP BY price_cents
    ),
    ranked AS (
        SELECT price_cents, day,
               MIN(day) OVER (
                   ORDER BY price_cents
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_day_cheaper
        FROM lvl
    ),
    sky AS (
        SELECT price_cents, day FROM ranked
        WHERE best_day_cheaper IS NULL OR best_day_cheaper > day
    )
    SELECT s.price_cents, s.day,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(p.o_orderkey) AS first_orderkey
    FROM sky s JOIN pts p
      ON p.price_cents = s.price_cents AND p.day = s.day
    GROUP BY s.price_cents, s.day
    """,
)
def orders_pareto_skyline(spark, sf_dir):
    """2-D Pareto skyline (Borzsony/Kossmann/Stocker 2001, the SKYLINE
    operator) over orders minimizing (price, order day): the set of orders
    no other order beats on BOTH objectives, where "beats" is <= on both
    and < on at least one — so within an equal-price group only the
    earliest-day orders survive (they are mutually non-dominating; any
    later same-price order is dominated).  Emits one row per surviving
    price level: its best day, the count of tied skyline orders at that
    (price, day), and the deterministic first orderkey among them.

    Plan — the quadratic dominance self-join collapses to a prefix-min,
    computed WITHOUT any fact-sized single-partition window (the sharded
    prefix-min identity of `global_rank_via_sharding`):

      1. per-(price, day) count + min orderkey, then per-price min-day
         struct — two parallel shuffled aggregates;
      2. the (still potentially fact-sized — order prices are near-unique)
         price-level table is range-sharded by VALUE into 64 shards from
         one broadcast (lo, hi) row; the strict-predecessor prefix-min of
         best-day runs as 64 INDEPENDENT per-shard windows;
      3. the cross-shard carry-in is a prefix-min over the 64 per-shard
         minima — a 64x64 broadcast self-join, never a fact-sized window;
      4. a level survives iff least(within-shard, carried) prefix-min is
         NULL or strictly later than its own best day.

    Value-range sharding balances when prices spread over their range
    (true for TPC-H-style totals); for adversarial value clustering swap
    in the exact count-balanced boundaries of `corpus_range_shards`.
    Headroom: (price_cents - lo) * 64 must stay inside int64 — price
    levels up to 2^57 cents ($1.4e15), loudly beyond any order total.
    Integer cents/days keep the hash exact."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").alias(
            "price_cents"
        ),
        (F.unix_date(F.col("o_orderdate").cast("date"))).cast("long").alias("day"),
    )
    # per-(price, day) tie stats, then per-price best-day struct: the struct
    # MIN is ordered by day first, and (price, day) rows are unique after the
    # first aggregate, so m.n / m.k are exactly the min-day group's stats
    by_pd = pts.groupBy("price_cents", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("o_orderkey").alias("k"),
    )
    lvl = (
        by_pd.groupBy("price_cents")
        .agg(F.min(F.struct("day", "n", "k")).alias("m"))
        .select(
            "price_cents",
            F.col("m.day").alias("gmin"),
            F.col("m.n").alias("n_points"),
            F.col("m.k").alias("first_orderkey"),
        )
    )
    rng = lvl.agg(
        F.min("price_cents").alias("lo"), F.max("price_cents").alias("hi")
    )
    sharded = lvl.crossJoin(F.broadcast(rng)).withColumn(
        "shard",
        F.expr(f"((price_cents - lo) * {_SKY_SHARDS}) div (hi - lo + 1)"),
    )
    from airflow_cms_inpatient_etl_spark.sources.registry import snapshot

    sharded = snapshot(sharded)  # within-shard window + shard-minima agg
    w_in = (
        W.partitionBy("shard")
        .orderBy("price_cents")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    with_in = sharded.withColumn("pre_in", F.min("gmin").over(w_in))
    smins = sharded.groupBy("shard").agg(F.min("gmin").alias("smin"))
    carry = (
        smins.alias("a")
        .join(
            F.broadcast(smins.alias("b")),
            F.col("b.shard") < F.col("a.shard"),
            "left",
        )
        .groupBy(F.col("a.shard").alias("shard"))
        .agg(F.min("b.smin").alias("pre_sh"))
    )
    best = F.least("pre_in", "pre_sh")  # least skips NULLs
    return (
        with_in.join(F.broadcast(carry), "shard", "left")
        .filter(best.isNull() | (best > F.col("gmin")))
        .select(
            "price_cents",
            F.col("gmin").alias("day"),
            "n_points",
            "first_orderkey",
        )
    )


# --------------------------------------------------------------------------- #
# orders_pareto_skyline_3d — >2-D dominance via cell-bucketed BNL join         #
# --------------------------------------------------------------------------- #
# Past two dimensions the ordered-pass trick dies (no total order agrees
# with dominance), so the skyline needs a dominance JOIN — but never the
# all-pairs one.  Cube-bucketing (the geo join's grid, one dimension up)
# bounds every quadratic pass: cells that are strictly dominated by any
# non-empty cell drop wholesale, the within-cell pass runs on ~target-pop
# points, and the cross-cell pass only compares LOCAL SURVIVORS of
# component-wise-comparable cells.

_SKY3_TARGET_POP = 64  # aimed points per cell (Q adapts to the row count)
_SKY3_MAX_Q = 16       # cells table stays <= 16^3 = 4096 rows (broadcastable)


def _sky3_cube(spark, sf_dir):
    """The 1996 order cohort as integer 3-D points with adaptive cube-cell
    keys: Q = clamp(ceil(cbrt(n / target_pop)), 1, max_q) per dimension,
    quantized from one broadcast (per-dim lo/hi + count) row.  Shared by
    the skyline query and its candidate-volume scale canary."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").alias(
            "price_cents"
        ),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("day"),
        F.expr("((o_orderkey % 1000003) * 2654435761) % 1000").alias("prio"),
    )
    rng = pts.agg(
        F.min("price_cents").alias("lox"),
        F.max("price_cents").alias("hix"),
        F.min("day").alias("loy"),
        F.max("day").alias("hiy"),
        F.min("prio").alias("loz"),
        F.max("prio").alias("hiz"),
        F.count(F.lit(1)).alias("n"),
    ).withColumn(
        "q",
        F.greatest(
            F.lit(1),
            F.least(
                F.lit(_SKY3_MAX_Q),
                F.ceil(F.cbrt(F.col("n") / F.lit(_SKY3_TARGET_POP))).cast("int"),
            ),
        ),
    )
    return pts.crossJoin(F.broadcast(rng)).select(
        "o_orderkey",
        "price_cents",
        "day",
        "prio",
        F.expr("((price_cents - lox) * q) div (hix - lox + 1)").alias("qx"),
        F.expr("((day - loy) * q) div (hiy - loy + 1)").alias("qy"),
        F.expr("((prio - loz) * q) div (hiz - loz + 1)").alias("qz"),
    )


@register(
    "orders_pareto_skyline_3d",
    oracle="""
    WITH pts AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS price_cents,
               CAST(EPOCH(o_orderdate) // 86400 AS BIGINT) AS day,
               ((o_orderkey % 1000003) * 2654435761) % 1000 AS prio
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT p.o_orderkey, p.price_cents, p.day, p.prio
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price_cents <= p.price_cents
          AND q.day <= p.day
          AND q.prio <= p.prio
          AND (q.price_cents < p.price_cents OR q.day < p.day OR q.prio < p.prio)
    )
    """,
)
def orders_pareto_skyline_3d(spark, sf_dir):
    """3-D Pareto skyline over the 1996 order cohort minimizing
    (price, order day, planted priority) — the block-nested-loop dominance
    join the 2-D query's docstring deferred, cell-bucketed so NO stage is
    all-pairs (the oracle IS the all-pairs NOT-EXISTS definition, so the
    hash match proves the bucketed plan exact):

      1. one broadcast row carries per-dim (lo, hi) AND the cohort count;
         the per-dim quantizer Q = clamp(ceil(cbrt(n / 64)), 1, 16) adapts
         cell population toward ~64 as the input grows (the geo join's
         fixed-radius grid, one dimension up and self-sizing);
      2. CELL PRUNE: a non-empty cell strictly dominated by another
         non-empty cell on ALL axes drops wholesale (its every point is
         dominated by the witness cell's every point) — a <=4096-row
         broadcast anti self-join, never point-level work;
      3. LOCAL pass: within-cell dominance join (~64 x 64 per cell) keeps
         each cell's local skyline; dominance is transitive, so local
         losers can neither survive nor be NEEDED as dominators;
      4. GLOBAL pass: local survivors of cell B challenge local survivors
         of cell C only when B <= C component-wise and B != C — the
         comparable cell-pair list is a broadcast product of two <=4096-row
         sides, the point-level join is equi on the victim's cell key.

    The 1996 slice (pushed to the parquet scan) keeps the oracle's
    quadratic NOT EXISTS tractable at every testdata scale; the engine
    plan never materializes it.  Priority is planted from the orderkey
    with a pre-mod ((okey % 1000003) * 2654435761 < 2^51 — inside int64 at
    EVERY scale, no ANSI caveat needed).  Scale: each stage is bounded by
    cell population (driven to ~64 by adaptive Q) or by cell count
    (<= 4096); past the Q cap (n > 64 * 16^3 = 262k cohort rows) per-cell
    population grows again — the documented remedy is one more bucketing
    level inside hot cells, i.e. exactly the `refine_hot_cells` octree
    step of `operators/spatial.py`.  All-integer outputs keep the hash
    exact."""
    from airflow_cms_inpatient_etl_spark.sources.registry import snapshot

    cube = _sky3_cube(spark, sf_dir)
    cube = snapshot(cube)  # cells census + the semi-join back
    cells = cube.groupBy("qx", "qy", "qz").agg(F.count(F.lit(1)).alias("pop"))
    cells = snapshot(cells)  # prune anti-join reads it twice
    surv_cells = (
        cells.alias("c")
        .join(
            F.broadcast(cells.alias("b")),
            (F.col("b.qx") < F.col("c.qx"))
            & (F.col("b.qy") < F.col("c.qy"))
            & (F.col("b.qz") < F.col("c.qz")),
            "left_anti",
        )
        .select("qx", "qy", "qz")
    )
    surv_cells = snapshot(surv_cells)  # semi-join + both sides of the pair list
    spts = cube.join(F.broadcast(surv_cells), ["qx", "qy", "qz"], "semi")
    spts = snapshot(spts)  # victim + dominator sides of the local pass

    def _dominates(d, v):
        return (
            (F.col(f"{d}.price_cents") <= F.col(f"{v}.price_cents"))
            & (F.col(f"{d}.day") <= F.col(f"{v}.day"))
            & (F.col(f"{d}.prio") <= F.col(f"{v}.prio"))
            & (
                (F.col(f"{d}.price_cents") < F.col(f"{v}.price_cents"))
                | (F.col(f"{d}.day") < F.col(f"{v}.day"))
                | (F.col(f"{d}.prio") < F.col(f"{v}.prio"))
            )
        )

    local_losers = (
        spts.alias("v")
        .join(
            spts.alias("d"),
            (F.col("d.qx") == F.col("v.qx"))
            & (F.col("d.qy") == F.col("v.qy"))
            & (F.col("d.qz") == F.col("v.qz"))
            & _dominates("d", "v"),
            "semi",
        )
        .select("o_orderkey")
    )
    ls = spts.join(local_losers, "o_orderkey", "left_anti")
    ls = snapshot(ls)  # victim side, dominator side, and the final anti-join
    pairs = (
        surv_cells.alias("b")
        .join(
            F.broadcast(surv_cells.alias("c")),
            (F.col("b.qx") <= F.col("c.qx"))
            & (F.col("b.qy") <= F.col("c.qy"))
            & (F.col("b.qz") <= F.col("c.qz"))
            & ~(
                (F.col("b.qx") == F.col("c.qx"))
                & (F.col("b.qy") == F.col("c.qy"))
                & (F.col("b.qz") == F.col("c.qz"))
            ),
        )
        .select(
            F.col("b.qx").alias("bqx"),
            F.col("b.qy").alias("bqy"),
            F.col("b.qz").alias("bqz"),
            F.col("c.qx").alias("qx"),
            F.col("c.qy").alias("qy"),
            F.col("c.qz").alias("qz"),
        )
    )
    dominators = ls.select(
        F.col("qx").alias("bqx"),
        F.col("qy").alias("bqy"),
        F.col("qz").alias("bqz"),
        F.col("price_cents").alias("d_price"),
        F.col("day").alias("d_day"),
        F.col("prio").alias("d_prio"),
    )
    cross_losers = (
        ls.alias("v")
        .join(F.broadcast(pairs), ["qx", "qy", "qz"])
        .join(
            dominators,
            ["bqx", "bqy", "bqz"],
        )
        .filter(
            (F.col("d_price") <= F.col("price_cents"))
            & (F.col("d_day") <= F.col("day"))
            & (F.col("d_prio") <= F.col("prio"))
            & (
                (F.col("d_price") < F.col("price_cents"))
                | (F.col("d_day") < F.col("day"))
                | (F.col("d_prio") < F.col("prio"))
            )
        )
        .select("o_orderkey")
        .distinct()
    )
    return (
        ls.join(cross_losers, "o_orderkey", "left_anti")
        .select("o_orderkey", "price_cents", "day", "prio")
    )
