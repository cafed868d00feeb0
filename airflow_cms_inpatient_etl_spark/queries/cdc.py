"""CDC queries: the incremental-merge layer, driver-checked.

The reference drops and fully reloads its tables every run
(``/root/reference/dags/patient_claims_plus_postgres.py:63-68``); these
queries exercise the engine's incremental equivalents
(``operators/upsert.py``) on deterministic testdata slices so the CDC
surface gets the same hash-level oracle verification as the relational
queries.  The oracles derive the expected states from the MERGE semantics
directly (NOT by replaying the operator's join plan), so the anti-join +
union machinery is checked against an independent formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.upsert import apply_scd2, scd2_init, upsert
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table, snapshot


@register(
    "cdc_upsert_orders",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 <> 0
    ),
    updates AS (
        SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000 AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
    FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
    """,
)
def cdc_upsert_orders(spark, sf_dir):
    """Type-1 MERGE (last-write-wins upsert): a CDC batch of repriced orders
    replaces same-key rows in the base table and inserts the rest — the
    operators/upsert.upsert anti-join + union, which at 100 TB is one
    key-shuffle (co-located if the target is bucketed on the key).  The
    price bump is double + integer, IEEE-exact in both engines."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = o.filter(F.col("o_orderkey") % 3 != 0)
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    return upsert(target, updates, ["o_orderkey"])


@register(
    "cdc_scd2_segment_history",
    oracle="""
    WITH snap AS (SELECT c_custkey, c_mktsegment FROM customer),
    upd AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN 'CHURNED' ELSE c_mktsegment END
                   AS c_mktsegment
        FROM customer
    )
    SELECT c_custkey, c_mktsegment,
           TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
           TIMESTAMP '2024-06-01 00:00:00' AS valid_to,
           FALSE AS is_current
    FROM snap WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment,
           TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS TIMESTAMP), TRUE
    FROM snap WHERE c_custkey % 5 <> 0
    UNION ALL
    SELECT c_custkey, c_mktsegment,
           TIMESTAMP '2024-06-01 00:00:00', CAST(NULL AS TIMESTAMP), TRUE
    FROM upd WHERE c_custkey % 5 = 0
    """,
)
def cdc_scd2_segment_history(spark, sf_dir):
    """SCD2 history build: open a dimension from the initial customer
    snapshot, then apply a second snapshot where every fifth customer churned
    segment — changed keys get their current version closed
    (valid_to = as_of) and a fresh open version appended; unchanged keys pass
    through.  Runs the real operators (scd2_init + apply_scd2); the oracle
    states the expected history rows directly from SCD2 semantics, so the
    operator's join machinery is verified against an independent derivation."""
    snap = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    history = scd2_init(snap, "2024-01-01 00:00:00")
    updates = snap.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, "CHURNED")
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    return apply_scd2(
        history,
        updates,
        key_cols=["c_custkey"],
        compare_cols=["c_mktsegment"],
        as_of="2024-06-01 00:00:00",
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def incremental_agg_merge(spark, sf_dir):
    """Incremental materialized-view maintenance for insert-only deltas: the
    standing aggregate (80% of lineitem) is merged with a delta batch's
    partial aggregate via a FULL OUTER join on the group key — counts and
    decimal-exact sums add, extrema combine with least/greatest (valid
    because inserts can only extend a min/max, never retract it; deletions
    would need a full or two-level recompute).  Merge cost is O(|groups|),
    not O(|history|) — the point of incremental maintenance at 100 TB.  The
    oracle recomputes the aggregate over the FULL table, so the merge
    arithmetic is checked against an independent derivation."""
    from airflow_cms_inpatient_etl_spark.functions.exact import dec

    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 5 != 0)
    delta = li.filter(F.col("l_orderkey") % 5 == 0)

    def partial(df):
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("l_quantity")).alias("sum_dec"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )

    b = partial(base)
    d = partial(delta)
    zero = F.lit(0).cast("decimal(37,6)")
    return (
        b.withColumnsRenamed({c: f"b_{c}" for c in b.columns if c != "l_returnflag"})
        .join(
            d.withColumnsRenamed({c: f"d_{c}" for c in d.columns if c != "l_returnflag"}),
            "l_returnflag",
            "full_outer",
        )
        .select(
            "l_returnflag",
            (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n"),
            (F.coalesce(F.col("b_sum_dec"), zero) + F.coalesce(F.col("d_sum_dec"), zero))
            .cast("double")
            .alias("sum_qty"),
            F.least("b_min_qty", "d_min_qty").alias("min_qty"),
            F.greatest("b_max_qty", "d_max_qty").alias("max_qty"),
        )
    )


@register(
    "snapshot_table_diff",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    nxt AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 97 = 1 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 97 != 0
        UNION ALL
        SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 97 = 2
    ),
    j AS (
        SELECT COALESCE(b.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN b.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                     AND b.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                    THEN 'unchanged'
                    ELSE 'changed' END AS change_type,
               b.o_orderstatus AS old_o_orderstatus,
               n.o_orderstatus AS new_o_orderstatus,
               b.o_totalprice AS old_o_totalprice,
               n.o_totalprice AS new_o_totalprice
        FROM base b FULL OUTER JOIN nxt n ON b.o_orderkey = n.o_orderkey
    )
    SELECT * FROM j WHERE change_type != 'unchanged'
    """,
)
def snapshot_table_diff(spark, sf_dir):
    """Snapshot regression diff (operators/upsert.py:snapshot_diff): classify
    every key across two pipeline-run snapshots as added / removed / changed
    via a full outer key join with null-safe column comparison — the audit a
    100 TB incremental pipeline runs to prove a code change didn't silently
    alter yesterday's partitions.  The 'next' snapshot is derived
    deterministically from the fixture (delete keys ≡0, reprice keys ≡1,
    re-key-insert keys ≡2 mod 97), so the expected diff is known and
    oracle-checkable; only non-unchanged rows materialize."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    m = F.col("o_orderkey") % 97
    nxt = (
        o.filter(m != 0)
        .withColumn(
            "o_totalprice",
            F.when(m == 1, F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(m == 2).withColumn(
                "o_orderkey", F.col("o_orderkey") + 1_000_000_000
            )
        )
    )
    from airflow_cms_inpatient_etl_spark.operators.upsert import snapshot_diff

    return snapshot_diff(
        o, nxt, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    ).filter(F.col("change_type") != "unchanged")


# --------------------------------------------------------------------------- #
# cdc_scd2_point_in_time — temporal join of facts to an SCD2 dimension         #
# --------------------------------------------------------------------------- #


@register(
    "cdc_scd2_point_in_time",
    oracle="""
    WITH hist AS (
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '1992-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 5 = 0
                    THEN TIMESTAMP '1996-01-01 00:00:00' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 'CHURNED',
               TIMESTAMP '1996-01-01 00:00:00', CAST(NULL AS TIMESTAMP)
        FROM customer WHERE c_custkey % 5 = 0
    ),
    pit AS (
        SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate, h.c_mktsegment
        FROM orders o JOIN hist h
          ON h.c_custkey = o.o_custkey
         AND CAST(o.o_orderdate AS TIMESTAMP) >= h.valid_from
         AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < h.valid_to)
    )
    SELECT c_mktsegment AS segment_at_order, CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
    FROM pit GROUP BY 1, 2
    """,
)
def cdc_scd2_point_in_time(spark, sf_dir):
    """Point-in-time (temporal) join: revenue per market segment AS THE
    SEGMENT WAS when each order was placed.  The dimension is a real SCD2
    history built by the operators (scd2_init at 1992-01-01, then every
    fifth customer churns at 1996-01-01 via apply_scd2); each order then
    joins the version valid at its order date — churned customers' orders
    split between their old segment (pre-1996) and CHURNED (post-1996),
    which joining the current version would silently rewrite.  The oracle
    derives the same history from SCD2 semantics directly, so both the
    history build AND the temporal matching are independently checked.
    Plan: equi-join on custkey (AQE broadcasts the dimension when small)
    with the interval check as a post-match filter — at most one version
    matches per fact by the SCD2 non-overlap invariant; decimal-exact
    revenue sums."""
    from airflow_cms_inpatient_etl_spark.functions.exact import dsum
    from airflow_cms_inpatient_etl_spark.operators.upsert import (
        scd2_point_in_time_join,
    )

    snap = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    history = scd2_init(snap, "1992-01-01 00:00:00")
    updates = snap.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, "CHURNED")
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    history = apply_scd2(
        history,
        updates,
        key_cols=["c_custkey"],
        compare_cols=["c_mktsegment"],
        as_of="1996-01-01 00:00:00",
    )
    o = load_table(spark, sf_dir, "orders")
    pit = scd2_point_in_time_join(
        o, history, keys=[("o_custkey", "c_custkey")], ts_col="o_orderdate"
    )
    return pit.groupBy(
        F.col("c_mktsegment").alias("segment_at_order"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


# --------------------------------------------------------------------------- #
# cdc_delete_propagation — right-to-be-forgotten cascade                       #
# --------------------------------------------------------------------------- #


@register(
    "cdc_delete_propagation",
    oracle="""
    WITH del_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    del_o AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM del_c)
    ),
    del_l AS (
        SELECT l_orderkey FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM del_o)
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT COUNT(*) FROM del_c) AS BIGINT) AS n_deleted,
           CAST((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM del_c) AS BIGINT) AS n_remaining
    UNION ALL
    SELECT 'orders',
           CAST((SELECT COUNT(*) FROM del_o) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM del_o) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT COUNT(*) FROM del_l) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) - (SELECT COUNT(*) FROM del_l) AS BIGINT)
    """,
)
def cdc_delete_propagation(spark, sf_dir):
    """Right-to-be-forgotten cascade: a deletion request set (every 97th
    customer) propagates through the foreign-key chain customer → orders →
    lineitem via key-equality SEMI joins, and the audit summary reports
    deleted/remaining per table — the manifest a GDPR erasure job must
    produce before rewriting files.  Plan: each cascade level is one
    semi-join keyed by the FK (AQE turns the small deletion side into a
    broadcast/runtime filter; at 100 TB the same shape drives a MERGE
    DELETE file rewrite, with the semi-join selecting which files to
    rewrite); counts are three pairs of single-row aggregates — no level
    materializes the surviving rows just to count them."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_c = c.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    del_o = o.join(
        del_c, o["o_custkey"] == del_c["c_custkey"], "semi"
    ).select("o_orderkey")
    del_l = li.join(
        del_o, li["l_orderkey"] == del_o["o_orderkey"], "semi"
    ).select("l_orderkey")

    def level(name, deleted, full):
        a = deleted.agg(F.count(F.lit(1)).alias("n_deleted"))
        b = full.agg(F.count(F.lit(1)).alias("n_total"))
        return a.crossJoin(F.broadcast(b)).select(
            F.lit(name).alias("table_name"),
            F.col("n_deleted"),
            (F.col("n_total") - F.col("n_deleted")).alias("n_remaining"),
        )

    return (
        level("customer", del_c, c)
        .unionAll(level("orders", del_o, o))
        .unionAll(level("lineitem", del_l, li))
    )


# --------------------------------------------------------------------------- #
# cdc_apply_change_feed — full I/U/D merge from an ordered change log          #
# --------------------------------------------------------------------------- #


@register(
    "cdc_apply_change_feed",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 7 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, 'N', 42.0
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def cdc_apply_change_feed(spark, sf_dir):
    """Debezium-style CDC apply: a change log with all THREE verbs — updates
    (every 5th order doubles its price, seq 1), deletes (every 7th order,
    seq 2), inserts (new keys at +1e8 for every 11th order, seq 1) — lands
    on the orders snapshot via ``apply_change_feed``.  Keys divisible by 35
    receive an update THEN a delete, so the per-key compaction must let the
    later delete win; the oracle derives the final state independently from
    the rules (rows %7 gone, rows %5 re-priced, inserts appended), so the
    window-compaction + anti-join + union machinery is value-checked, not
    replayed.  All payload arithmetic is exactly-rounded IEEE (×2, literal
    42.0) — hash-exact with no rounding."""
    from airflow_cms_inpatient_etl_spark.operators.upsert import apply_change_feed

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    dels = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
    )
    ins = o.filter(F.col("o_orderkey") % 11 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(42.0).alias("o_totalprice"),
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    return apply_change_feed(o, changes, ["o_orderkey"])


@register(
    "snapshot_column_drift_profile",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    nxt AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 3 THEN 'X' ELSE o_orderstatus END
                 AS o_orderstatus,
               CASE WHEN o_orderkey % 97 = 1 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 97 != 0
    ),
    j AS (
        SELECT CASE WHEN b.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    THEN 1 ELSE 0 END AS status_drift,
               CASE WHEN b.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 1 ELSE 0 END AS price_drift
        FROM base b JOIN nxt n ON b.o_orderkey = n.o_orderkey
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_compared,
               CAST(SUM(status_drift) AS BIGINT) AS n_status,
               CAST(SUM(price_drift) AS BIGINT) AS n_price
        FROM j
    )
    SELECT 'o_orderstatus' AS column_name, n_status AS n_changed, n_compared,
           CAST(n_status AS DOUBLE) / n_compared AS change_rate
    FROM agg
    UNION ALL
    SELECT 'o_totalprice', n_price, n_compared,
           CAST(n_price AS DOUBLE) / n_compared
    FROM agg
    """,
)
def snapshot_column_drift_profile(spark, sf_dir):
    """Column-level drift profile between two pipeline snapshots: for every
    tracked column, how many matched keys changed value and at what rate —
    the drilldown a data-ops team runs after `snapshot_table_diff` says
    SOMETHING changed, to see WHICH columns a code change touched.  One
    co-partitioned key join and one aggregate computing every column's
    null-safe drift sum in the same pass (no per-column scans); the derived
    'next' snapshot mutates two columns on disjoint key classes (status on
    ≡3, price on ≡1 mod 97) so each column's expected rate is independent
    and known.  Rates are bigint ratios."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    m = F.col("o_orderkey") % 97
    nxt = o.filter(m != 0).select(
        "o_orderkey",
        F.when(m == 3, F.lit("X")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(m == 1, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    b = o.alias("b")
    n = nxt.alias("n")
    j = b.join(n, F.col("b.o_orderkey") == F.col("n.o_orderkey")).select(
        (~F.col("b.o_orderstatus").eqNullSafe(F.col("n.o_orderstatus")))
        .cast("int")
        .alias("status_drift"),
        (~F.col("b.o_totalprice").eqNullSafe(F.col("n.o_totalprice")))
        .cast("int")
        .alias("price_drift"),
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n_compared"),
        F.sum("status_drift").cast("long").alias("n_status"),
        F.sum("price_drift").cast("long").alias("n_price"),
    )
    return agg.selectExpr(
        "stack(2, 'o_orderstatus', n_status, 'o_totalprice', n_price) "
        "AS (column_name, n_changed)",
        "n_compared",
    ).select(
        "column_name",
        "n_changed",
        "n_compared",
        (F.col("n_changed").cast("double") / F.col("n_compared")).alias("change_rate"),
    )


# --------------------------------------------------------------------------- #
# corpus_delta_report — recrawl accounting over the documents corpus           #
# --------------------------------------------------------------------------- #


@register(
    "corpus_delta_report",
    oracle="""
    WITH base AS (SELECT doc_id, source, MD5(text) AS h FROM documents),
    recrawl AS (
        -- deterministic recrawl twin: every doc_id % 11 = 0 dropped (dead
        -- link), % 11 = 1 re-fetched with changed content, % 13 = 0 spawns
        -- a NEW doc under a shifted id
        SELECT doc_id, source,
               CASE WHEN doc_id % 11 = 1 THEN MD5(text || ' refetched')
                    ELSE MD5(text) END AS h
        FROM documents WHERE doc_id % 11 != 0
        UNION ALL
        SELECT doc_id + 1000000, source, MD5(text || ' new')
        FROM documents WHERE doc_id % 13 = 0
    ),
    j AS (
        SELECT COALESCE(b.source, r.source) AS source,
               CASE WHEN b.doc_id IS NULL THEN 'added'
                    WHEN r.doc_id IS NULL THEN 'removed'
                    WHEN b.h != r.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM base b FULL OUTER JOIN recrawl r ON b.doc_id = r.doc_id
    )
    SELECT source,
           CAST(COUNT(*) FILTER (WHERE status = 'added') AS BIGINT) AS n_added,
           CAST(COUNT(*) FILTER (WHERE status = 'removed') AS BIGINT) AS n_removed,
           CAST(COUNT(*) FILTER (WHERE status = 'changed') AS BIGINT) AS n_changed,
           CAST(COUNT(*) FILTER (WHERE status = 'unchanged') AS BIGINT) AS n_unchanged
    FROM j GROUP BY source
    """,
)
def corpus_delta_report(spark, sf_dir):
    """Recrawl accounting — the report every incremental corpus refresh
    publishes before the expensive downstream stages rerun: per source, how
    many documents were added, removed, content-changed, and unchanged
    between the standing corpus and the new crawl.  (The recrawl side is a
    deterministic twin of the fixture — drop ∕ refetch ∕ spawn by doc_id
    residue — exactly like the CDC family's snapshot derivations.)  The
    comparison joins 32-hex CONTENT HASHES, never text (both sides reduce
    to (doc_id, source, h) before the full-outer join — at 100 TB the join
    moves ~50 bytes/doc), change classes come from one CASE over the join,
    and the per-source rollup is a tiny aggregate.  One co-partitioned
    full-outer shuffle; this is the corpus-side sibling of
    `snapshot_table_diff`."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", F.md5(F.col("text").cast("binary")).alias("h"))
    recrawl = (
        d.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            "source",
            F.when(
                F.col("doc_id") % 11 == 1,
                F.md5(F.concat(F.col("text"), F.lit(" refetched")).cast("binary")),
            )
            .otherwise(F.md5(F.col("text").cast("binary")))
            .alias("h"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "source",
                F.md5(F.concat(F.col("text"), F.lit(" new")).cast("binary")).alias("h"),
            )
        )
    )
    b, r = base.alias("b"), recrawl.alias("r")
    j = b.join(r, F.col("b.doc_id") == F.col("r.doc_id"), "full_outer").select(
        F.coalesce(F.col("b.source"), F.col("r.source")).alias("source"),
        F.when(F.col("b.doc_id").isNull(), "added")
        .when(F.col("r.doc_id").isNull(), "removed")
        .when(F.col("b.h") != F.col("r.h"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return j.groupBy("source").agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).alias("n_changed"),
        F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0)).alias("n_unchanged"),
    )


# --------------------------------------------------------------------------- #
# ivm_join_view_delta — incremental maintenance of a JOIN view (round 11)      #
# --------------------------------------------------------------------------- #


@register(
    "ivm_join_view_delta",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def ivm_join_view_delta(spark, sf_dir):
    """Incremental maintenance of a JOIN view under deltas on BOTH inputs —
    the classic bilinear delta rule: with orders = O ∪ dO and lineitem =
    L ∪ dL, the new view's aggregate is the MERGE of four partial
    aggregates, old⋈old (the standing view, not recomputed in production)
    plus the three delta terms dO⋈L, O⋈dL, dO⋈dL — cost O(|delta| · join
    fan-out + |groups|), never O(|history|²).  Deltas here are key-sliced
    (orders % 17, lineitem % 23) so all four terms are non-trivially
    exercised, including the doubly-new dO⋈dL corner the naive
    "delta-join-the-old-side-only" implementation silently drops.  Counts
    and exact bigint cent sums merge by addition (insert-only); the oracle
    recomputes the aggregate over the FULL join, so hash equality proves the
    delta algebra.  Scale shape: the three delta joins broadcast the delta
    side; the merge is a union of |groups|-sized partials."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    d_o = o.filter(F.col("o_orderkey") % 17 == 0)
    old_o = o.filter(F.col("o_orderkey") % 17 != 0)
    d_l = li.filter(F.col("l_orderkey") % 23 == 0)
    old_l = li.filter(F.col("l_orderkey") % 23 != 0)

    def part(odf, ldf, broadcast_side=None):
        j = odf.join(ldf, odf.o_orderkey == ldf.l_orderkey)
        return j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).alias("n_lines"), F.sum("cents").alias("cents")
        )

    terms = [
        part(old_o, old_l),                       # standing view
        part(F.broadcast(d_o), old_l),            # dO ⋈ L
        part(old_o, F.broadcast(d_l)),            # O ⋈ dL
        part(F.broadcast(d_o), d_l),              # dO ⋈ dL (the dropped corner)
    ]
    merged = terms[0]
    for t in terms[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("priority").agg(
        F.sum("n_lines").alias("n_lines"), F.sum("cents").alias("cents")
    )


# --------------------------------------------------------------------------- #
# ivm_distinct_view_delta — incremental COUNT(DISTINCT) via refcounts          #
# --------------------------------------------------------------------------- #


@register(
    "ivm_distinct_view_delta",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS grp, o_custkey AS x, o_orderkey
        FROM orders WHERE o_orderkey % 5 <> 0
    ),
    dels AS (SELECT grp, x FROM base WHERE o_orderkey % 35 = 7),
    ins AS (
        SELECT o_orderpriority AS grp, o_custkey AS x
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    final AS (
        SELECT grp, x FROM base WHERE o_orderkey % 35 <> 7
        UNION ALL SELECT grp, x FROM ins
    ),
    oldd AS (
        SELECT grp, CAST(COUNT(DISTINCT x) AS BIGINT) AS old_distinct
        FROM base GROUP BY grp
    ),
    newd AS (
        SELECT grp, CAST(COUNT(DISTINCT x) AS BIGINT) AS new_distinct
        FROM final GROUP BY grp
    ),
    di AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS inserts_applied FROM ins GROUP BY grp),
    dd AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS deletes_applied FROM dels GROUP BY grp),
    bkeys AS (SELECT DISTINCT grp, x FROM base),
    fkeys AS (SELECT DISTINCT grp, x FROM final),
    app AS (
        SELECT f.grp, CAST(COUNT(*) AS BIGINT) AS keys_appeared
        FROM fkeys f LEFT JOIN bkeys b ON b.grp = f.grp AND b.x = f.x
        WHERE b.grp IS NULL GROUP BY f.grp
    ),
    van AS (
        SELECT b.grp, CAST(COUNT(*) AS BIGINT) AS keys_vanished
        FROM bkeys b LEFT JOIN fkeys f ON f.grp = b.grp AND f.x = b.x
        WHERE f.grp IS NULL GROUP BY b.grp
    )
    SELECT o.grp AS o_orderpriority,
           o.old_distinct,
           COALESCE(di.inserts_applied, 0) AS inserts_applied,
           COALESCE(dd.deletes_applied, 0) AS deletes_applied,
           COALESCE(app.keys_appeared, 0) AS keys_appeared,
           COALESCE(van.keys_vanished, 0) AS keys_vanished,
           n.new_distinct
    FROM oldd o
    JOIN newd n ON n.grp = o.grp
    LEFT JOIN di ON di.grp = o.grp
    LEFT JOIN dd ON dd.grp = o.grp
    LEFT JOIN app ON app.grp = o.grp
    LEFT JOIN van ON van.grp = o.grp
    """,
)
def ivm_distinct_view_delta(spark, sf_dir):
    """Incremental maintenance of a COUNT(DISTINCT) view — the aggregate
    plain delta-merge CANNOT maintain (`incremental_agg_merge`'s sums and
    insert-only extrema add; distinct counts don't): the standing state is
    the per-(group, value) REFCOUNT table, and a mixed insert/delete delta
    merges as refcount arithmetic — a key contributes +1 to the view when
    its refcount goes 0 -> positive and -1 when it returns to 0, which is
    exactly the information the refcounts exist to preserve across
    deletions.  Fixture: view = distinct customers per order priority;
    base = 80% of orders, delta = the remaining inserts plus deletion of
    every (orderkey % 35 == 7) base row.  A negative merged refcount
    (deleting a row the base never had) RAISES instead of silently
    wrapping.  The oracle recomputes old/new states from scratch, so the
    refcount machinery is checked against an independent derivation.

    Scale: the standing refcount table is (groups x live values) — the
    view's own support, not history-sized; the merge is one (grp, x)-keyed
    FULL OUTER join bounded by |delta| + touched keys, then a group-sized
    rollup.  At 100 TB the refcount table is the price of exact
    distinct-IVM under deletes; the sketch alternative (theta) trades it
    for bounded error — both live in this registry."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").alias("x"),
        "o_orderkey",
    )
    base = o.filter(F.col("o_orderkey") % 5 != 0)
    ins = o.filter(F.col("o_orderkey") % 5 == 0).select("grp", "x", F.lit(1).alias("d"))
    dels = base.filter(F.col("o_orderkey") % 35 == 7).select(
        "grp", "x", F.lit(-1).alias("d")
    )
    standing = snapshot(
        base.groupBy("grp", "x").agg(F.count(F.lit(1)).cast("long").alias("rc"))
    )
    delta_rc = (
        ins.unionByName(dels).groupBy("grp", "x").agg(F.sum("d").cast("long").alias("dc"))
    )
    merged = standing.join(delta_rc, ["grp", "x"], "full_outer").select(
        "grp",
        "x",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("dc", F.lit(0)).alias("dc"),
    )
    new_rc = F.col("rc") + F.col("dc")
    guarded = merged.select(
        "grp",
        "x",
        "rc",
        F.when(new_rc >= 0, new_rc)
        .otherwise(
            F.raise_error(
                F.lit("ivm_distinct_view_delta: negative refcount — delete of a "
                      "row the standing state never held")
            )
        )
        .alias("nrc"),
    )
    per_grp = guarded.groupBy("grp").agg(
        F.sum(F.when(F.col("rc") > 0, 1).otherwise(0)).cast("long").alias("old_distinct"),
        F.sum(F.when((F.col("rc") == 0) & (F.col("nrc") > 0), 1).otherwise(0))
        .cast("long")
        .alias("keys_appeared"),
        F.sum(F.when((F.col("rc") > 0) & (F.col("nrc") == 0), 1).otherwise(0))
        .cast("long")
        .alias("keys_vanished"),
    )
    applied = (
        ins.unionByName(dels)
        .groupBy("grp")
        .agg(
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("inserts_applied"),
            F.sum(F.when(F.col("d") < 0, 1).otherwise(0)).cast("long").alias("deletes_applied"),
        )
    )
    return (
        per_grp.join(applied, "grp", "left")
        .select(
            F.col("grp").alias("o_orderpriority"),
            "old_distinct",
            F.coalesce("inserts_applied", F.lit(0)).alias("inserts_applied"),
            F.coalesce("deletes_applied", F.lit(0)).alias("deletes_applied"),
            "keys_appeared",
            "keys_vanished",
            (F.col("old_distinct") + F.col("keys_appeared") - F.col("keys_vanished")).alias(
                "new_distinct"
            ),
        )
    )
