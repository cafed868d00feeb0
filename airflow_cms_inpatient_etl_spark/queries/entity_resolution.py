"""Entity resolution — the classic large-scale record-linkage pipeline as a
composition of operators the registry already exercises one by one:

    banded blocking (sorted-neighborhood, the geo join's 1-D cousin)
      -> pairwise match scoring
      -> connected components (operators/graph.py star rounds)
      -> survivorship (source precedence + freshness -> golden record)

Fixture: every customer is exploded into three "source system" variants of
one logical entity with planted near-identical match values; every 97th
customer's third variant is planted NEAR THE NEXT customer's values instead
— a wrong-entity record that the closure must pull across, making the
component structure non-trivial (and the survivorship pick exercise the
source/freshness tiebreaks across custkeys).

The DuckDB oracles are derivation-independent: pair generation is a literal
range self-join (no bands), and the cluster step is a recursive-CTE
transitive closure — the Spark side must reproduce both exactly through the
banded/starred machinery.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table

_ER_TOL = 10    # match tolerance on the planted value
_ER_BAND = 500  # blocking band width (> 2*tol, so +/-1 band covers all pairs)

_ER_RECS_SQL = """
    recs AS (
        SELECT c_custkey * 4 + v AS rec_id,
               c_custkey AS custkey,
               v AS src,
               c_custkey * 1000 + CASE WHEN v = 0 THEN 0
                                       WHEN v = 1 THEN 3
                                       WHEN c_custkey % 97 = 0 THEN 995
                                       ELSE 7 END AS val,
               (c_custkey * 7 + v * 13) % 1000 AS updated_at
        FROM customer
        CROSS JOIN (VALUES (0), (1), (2)) AS variants(v)
    )
"""


def _er_records(spark, sf_dir):
    """The three-source record explosion of the customer table (see module
    docstring).  Planted integers only — byte-stable across engines; the
    largest product, custkey*1000+995, stays inside int64 to custkey ~9e15
    (every conceivable scale)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    v = c.select("custkey", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("src"))
    noise = (
        F.when(F.col("src") == 0, 0)
        .when(F.col("src") == 1, 3)
        .when(F.col("custkey") % 97 == 0, 995)
        .otherwise(7)
    )
    return v.select(
        (F.col("custkey") * 4 + F.col("src")).alias("rec_id"),
        "custkey",
        "src",
        (F.col("custkey") * 1000 + noise).alias("val"),
        ((F.col("custkey") * 7 + F.col("src") * 13) % 1000).alias("updated_at"),
    )


def _er_pairs(recs):
    """Banded blocking + match scoring: band = val div BAND; the probe side
    explodes to its own and both adjacent bands, candidates meet in a hash
    EQUI-join on the band key, and the exact predicate |dv| <= tol prunes
    post-join.  BAND > 2*tol guarantees every qualifying pair shares a band
    or sits in adjacent bands, and rec_a < rec_b makes each pair appear
    exactly once (the geo grid join's discipline in one dimension).

    Scale: candidate volume = sum over bands of |probe| x |home| — linear
    in n at bounded band population (the plant gives <= 4 records per
    band); a value-hotspot band goes quadratic in itself, with the same
    salting remedy as the geo join."""
    home = recs.select(
        F.col("rec_id").alias("rec_b"),
        F.col("custkey").alias("custkey_b"),
        F.col("val").alias("val_b"),
        F.expr(f"val div {_ER_BAND}").alias("band"),
    )
    probe = recs.select(
        F.col("rec_id").alias("rec_a"),
        F.col("custkey").alias("custkey_a"),
        F.col("val").alias("val_a"),
        F.explode(
            F.array(
                F.expr(f"val div {_ER_BAND} - 1"),
                F.expr(f"val div {_ER_BAND}"),
                F.expr(f"val div {_ER_BAND} + 1"),
            )
        ).alias("band"),
    )
    return (
        probe.join(home, "band")
        .filter(
            (F.col("rec_a") < F.col("rec_b"))
            & (F.abs(F.col("val_a") - F.col("val_b")) <= _ER_TOL)
        )
        .select(
            "rec_a",
            "rec_b",
            "custkey_a",
            "custkey_b",
            F.abs(F.col("val_a") - F.col("val_b")).cast("long").alias("dist"),
        )
    )


@register(
    "er_blocking_pairs",
    oracle=f"""
    WITH {_ER_RECS_SQL}
    SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
           a.custkey AS custkey_a, b.custkey AS custkey_b,
           CAST(ABS(a.val - b.val) AS BIGINT) AS dist
    FROM recs a
    JOIN recs b
      ON b.val BETWEEN a.val - {_ER_TOL} AND a.val + {_ER_TOL}
     AND a.rec_id < b.rec_id
    """,
)
def er_blocking_pairs(spark, sf_dir):
    """ER stage 1+2 — candidate generation by banded blocking plus exact
    match scoring, checked against a literal range self-join oracle (DuckDB
    IEJoin; the engine side never materializes the range join).  Emits each
    matching pair exactly once with both custkeys and the value distance;
    the planted bridge records surface as cross-custkey pairs.  See
    `_er_pairs` for the plan and its scale contract."""
    return _er_pairs(_er_records(spark, sf_dir))


@register(
    "er_resolve_customers",
    oracle=f"""
    WITH RECURSIVE {_ER_RECS_SQL},
    pairs AS (
        SELECT a.rec_id AS ra, b.rec_id AS rb
        FROM recs a
        JOIN recs b
          ON b.val BETWEEN a.val - {_ER_TOL} AND a.val + {_ER_TOL}
         AND a.rec_id < b.rec_id
    ),
    edges AS (SELECT ra AS a, rb AS b FROM pairs UNION SELECT rb, ra FROM pairs),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    lbl AS (SELECT a AS rec_id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a),
    labeled AS (
        SELECT r.*, COALESCE(l.comp, r.rec_id) AS comp
        FROM recs r LEFT JOIN lbl l USING (rec_id)
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY comp
                   ORDER BY src, updated_at DESC, rec_id
               ) AS rn
        FROM labeled
    )
    SELECT comp AS entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(DISTINCT custkey) AS BIGINT) AS n_custkeys,
           MIN(CASE WHEN rn = 1 THEN rec_id END) AS canonical_rec_id,
           MIN(CASE WHEN rn = 1 THEN custkey END) AS canonical_custkey,
           MIN(CASE WHEN rn = 1 THEN updated_at END) AS canonical_updated_at
    FROM ranked
    GROUP BY comp
    """,
)
def er_resolve_customers(spark, sf_dir):
    """The full ER pipeline over the three-source customer explosion:
    banded blocking -> pair scoring (`_er_pairs`) -> connected components
    (alternating star rounds, `operators/graph.py` — O(log n) regardless of
    chain length) -> survivorship.  One row per resolved entity: the
    component id (min rec_id), record and distinct-custkey counts (the
    planted bridges make some entities span two custkeys), and the golden
    record chosen by SOURCE PRECEDENCE first (lower src wins: v0 is the
    system of record), FRESHNESS second (newer updated_at), rec_id last —
    picked with one min_by aggregate, no per-component sort.  The oracle
    resolves the same graph through a recursive-CTE transitive closure and
    a window-ranked survivor — independent derivations, identical fixpoint.

    Scale: blocking and scoring are band-keyed equi-joins (linear at
    bounded band population); components are edge-count-bounded star
    rounds; survivorship is one grouped aggregate.  Singleton records
    (never paired) keep their own rec_id as entity — the left join +
    coalesce, not a special case."""
    from airflow_cms_inpatient_etl_spark.operators.graph import connected_components
    from airflow_cms_inpatient_etl_spark.sources.registry import snapshot

    recs = _er_records(spark, sf_dir)
    recs = snapshot(recs)  # pair generation + the label join read it
    pairs = _er_pairs(recs).select(
        F.col("rec_a").alias("id1"), F.col("rec_b").alias("id2")
    )
    labels = connected_components(pairs)
    labeled = (
        recs.join(
            labels.select(F.col("node").alias("rec_id"), "label"), "rec_id", "left"
        )
        .withColumn("comp", F.coalesce("label", "rec_id"))
    )
    # survivorship: lexicographic (src asc, freshness desc, rec_id asc) via
    # one min_by struct — updated_at is in [0, 1000), so 999-updated_at is a
    # clean descending proxy
    ordk = F.struct(
        F.col("src"), (F.lit(999) - F.col("updated_at")).alias("inv"), F.col("rec_id")
    )
    return labeled.groupBy(F.col("comp").alias("entity_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.countDistinct("custkey").cast("long").alias("n_custkeys"),
        F.min_by("rec_id", ordk).alias("canonical_rec_id"),
        F.min_by("custkey", ordk).alias("canonical_custkey"),
        F.min_by("updated_at", ordk).alias("canonical_updated_at"),
    )
