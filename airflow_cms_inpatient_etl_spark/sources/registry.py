"""Testdata table registry.

The driver testdata (TESTDATA.md) is a TPC-H-ish star schema plus ``events``
(stream-shaped), ``documents`` (text corpus) and ``embeddings`` (64-d float
vectors), one parquet file per table under ``/root/testdata/sf{0.001,0.01,0.1}``.

At 100 TB these would be partitioned/bucketed tables in a metastore; locally we
read single parquet files.  All scans go through ``load_table`` so predicate
pushdown / column pruning behavior is uniform and testable in one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (columnar parquet scan; Catalyst prunes/pushes).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark rejects by
    default (PARQUET_TYPE_ILLEGAL).  We read it as raw nanos via the legacy
    conf and convert to a microsecond timestamp — lossless for this data (the
    generator emits whole microseconds) and identical to what DuckDB sees.
    The conf is set at scan time so the fix works under any caller's session,
    and deliberately never restored: lazy plans capture SQL confs at execution
    time, so a save/restore around the read would break any not-yet-
    materialized events scan.  The tuned factory (session.get_spark) sets the
    same conf up front and documents it as a session-wide invariant; a session
    that needs true-nanos parquet semantics elsewhere must unset it.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return _normalize_ntz(df)
    return _normalize_ntz(spark.read.parquet(path))


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-tz TIMESTAMP.

    The fixture generator has shipped ``events.ts`` as TIMESTAMP(NANOS)
    (bigint under ``nanosAsLong``), tz-aware TIMESTAMP(MICROS), and naive
    TIMESTAMP(MICROS) (inferred as TIMESTAMP_NTZ) across rounds.  The engine
    standardizes on TIMESTAMP_LTZ with the session timezone pinned to UTC
    (session.py), under which this cast is wall-clock-preserving and matches
    DuckDB's naive-timestamp arithmetic — and functions like ``unix_micros``
    that require LTZ keep working regardless of which variant the generator
    produced."""
    from pyspark.sql import functions as F

    for cname, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(cname, F.col(cname).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL surface)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread_scan(df: DataFrame, key_col: str, min_partitions: int | None = None) -> DataFrame:
    """Hash-repartition a SMALL-PARALLELISM scan by ``key_col`` so expensive
    map-side work (per-token md5 pipelines, HOF gram hashing) uses every
    core — and do NOTHING when the scan is already parallel.

    Why: a single parquet file with one row group cannot be split by
    ``maxPartitionBytes``, so locally the whole pre-shuffle map stage runs
    on ONE task no matter how wide the session is (measured 1.9× on the
    span-dedup gram pipeline at sf0.1 under local[32]).  At 100 TB the scan
    has thousands of splits, the condition is false, and this helper adds
    NO exchange — the guard is what makes it safe to leave in production
    plans.  Hash partitioning on the row key (not round-robin) avoids the
    sort-before-repartition pass and keeps rows co-located by the key the
    downstream rebuild groups on.  ``getNumPartitions`` triggers plan
    analysis only, never a job.
    """
    target = min_partitions
    if target is None:
        spark = df.sparkSession
        target = min(
            spark.sparkContext.defaultParallelism,
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        )
    if df.rdd.getNumPartitions() >= target:
        return df
    from pyspark.sql import functions as F

    return df.repartition(target, F.col(key_col))


# --------------------------------------------------------------------------- #
# Tracked multi-consumer snapshots                                             #
# --------------------------------------------------------------------------- #
# Several queries materialize an expensive intermediate exactly once for 2-5
# downstream consumers (LSH posting lists, band tables, per-doc score tables).
# Neither storage primitive self-releases in a long-lived PySpark session:
#   - ``.persist()``/``.cache()`` pins a CacheManager entry keyed by logical
#     plan with no unpersist hook in a lazily-returned function — AND silently
#     serves REPEATED invocations of the same query from the warm cache
#     (measured: it faked the round-8 bench number for the pHash query).
#   - ``.localCheckpoint()`` avoids the plan-keyed reuse, but its blocks are
#     in practice never freed from Python either: the JVM-side RDD stays
#     strongly reachable through the Py4J gateway bindings, so the
#     ContextCleaner's weak references never fire (measured: blocks survive
#     del + gc.collect() + System.gc()).
# So snapshots must be RELEASED EXPLICITLY.  ``snapshot`` wraps a lazy
# localCheckpoint and records the pinned RDD ids; ``release_snapshots`` frees
# every block any snapshot pinned.  Long-lived callers (bench loops, REPL
# sessions, services) call ``release_snapshots(spark)`` once the results of a
# query have been fully consumed; short-lived jobs may skip it (executor
# storage dies with the session).  Iterative operators (operators/graph.py)
# keep their own tighter per-round tracking and are unaffected.

_SNAPSHOT_RDD_IDS: set[int] = set()


def tracked_localcheckpoint(df: DataFrame, eager: bool) -> tuple[DataFrame, frozenset]:
    """``localCheckpoint`` plus the ids of the persistent RDDs it pinned,
    all registered with the session-level release registry.

    The shared primitive behind ``snapshot`` (lazy, query-level) and the
    iterative graph operators' per-round snapshots (eager, with the ids
    also used for immediate intra-loop frees).  ``RDD.localCheckpoint``
    marks persistence at call time, so the pinned ids are visible via
    ``getPersistentRDDs`` without waiting for a job.
    """
    jsc = df.sparkSession.sparkContext._jsc
    before = {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}
    out = df.localCheckpoint(eager=eager)
    after = {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}
    ids = frozenset(after - before)
    _SNAPSHOT_RDD_IDS.update(ids)
    return out, ids


def snapshot(df: DataFrame) -> DataFrame:
    """Lazy-action localCheckpoint whose pinned RDD ids are tracked for
    release.

    ``eager=False`` defers the final materialization to the first action —
    every later consumer then reads the stored blocks instead of
    recomputing the subtree.  NOTE: under AQE (on in the tuned session),
    checkpoint construction still materializes the subtree's SHUFFLE
    stages at call time (AdaptiveSparkPlanExec resolves its final plan by
    running the query stages), so ``fn(spark, dir)`` on a snapshot-using
    query is not job-free — only the final stage waits for the action.
    Cost attribution is unchanged for callers that time construction and
    action together (bench.py does).
    """
    return tracked_localcheckpoint(df, eager=False)[0]


def track_snapshot_ids(ids) -> None:
    """Register already-pinned localCheckpoint RDD ids for release.

    For operators that manage their own intermediate snapshots (the
    iterative graph loops) but leave the FINAL snapshot alive as the
    returned result's storage — tracking it here lets the caller free it
    with the same ``release_snapshots`` call that frees query-level
    snapshots, instead of waiting on the (slow, GC-dependent)
    ContextCleaner drain."""
    _SNAPSHOT_RDD_IDS.update(int(i) for i in ids)


def release_snapshots(spark: SparkSession) -> int:
    """Unpersist every tracked snapshot's blocks; returns how many released.

    DESTRUCTIVE for in-flight plans: a localCheckpointed RDD has no lineage
    to recompute from, so call this only between queries, after the previous
    results are fully consumed.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for i in list(_SNAPSHOT_RDD_IDS):
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)
            released += 1
        _SNAPSHOT_RDD_IDS.discard(i)
    return released
