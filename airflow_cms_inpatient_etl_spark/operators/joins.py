"""Join strategies for skewed and co-located workloads (100 TB tooling).

AQE's skew-join splitting handles most skew automatically; these operators are
the explicit fallbacks for the cases AQE can't fix:

* ``salted_join`` — one fact key receiving a large fraction of all rows (a
  null-ish default id, a bot user): salt the fact side N ways and replicate
  the dimension side N ways, so the hot key spreads over N reducers.
* ``salted_aggregate`` — the same trick for aggregations: two-phase agg via a
  random-ish salt (here a deterministic hash salt, keeping runs reproducible),
  partial per (key, salt) then final per key.
* ``merge_asof_grouped`` — as-of join with pd.merge_asof semantics
  (backward + tolerance) as a pure-JVM union + carry-forward window over
  (key, time-bucket) partitions: hot keys split across buckets, no Python.
* ``binned_interval_join`` — big-big interval/range joins: Spark plans a
  non-equi join with no equi-key as BroadcastNestedLoop/Cartesian, O(n·m);
  binning both sides turns it into a shuffle equi-join on the bin key with an
  exact post-filter — the standard range-join optimization.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fact rows get a deterministic salt in
    [0, n_salts); the dim side is replicated n_salts times; the join key
    becomes (key, salt).  Output equals ``fact.join(dim, key, how)`` exactly —
    only the shuffle distribution changes.

    Salt is a hash of the whole fact row's key + a per-row uniform spreader
    (monotonically_increasing_id is partition-deterministic, which is enough:
    the goal is spreading, not randomness)."""
    if how not in ("inner", "left"):
        # replicating the dim side breaks right/full semantics (unmatched dim
        # rows would appear n_salts times)
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = (F.monotonically_increasing_id() % n_salts).cast("int")
    salted_fact = fact.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    salted_dim = dim.withColumn("__salt", salts)
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Column, Callable[[str], Column]]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps output name → ``(partial_expr, recombine_fn)``: the phase-1
    aggregate per (key, salt) and the phase-2 function that merges the
    n_salts partials per key (e.g. ``F.sum`` for sums AND counts, ``F.min`` /
    ``F.max`` for extrema).  The recombiner is explicit per output — an
    aggregate whose partials don't recombine by any of these (avg, exact
    countDistinct) must be decomposed by the caller (avg = sum/count), never
    guessed from the alias.  Phase 1 splits the hot key's rows across n_salts
    reducers; phase 2 touches n_salts rows per key."""
    salt = (F.monotonically_increasing_id() % n_salts).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _fn) in aggs.items()])
    )
    recombine = [fn(name).alias(name) for name, (_expr, fn) in aggs.items()]
    return partial.groupBy(*key_cols).agg(*recombine)


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Join points to the ``[lo, hi)`` intervals containing them WITHOUT a
    nested-loop: both sides get an integer bin key (``point DIV bin_width``;
    intervals explode into every bin they overlap), the join is a plain
    shuffle equi-join on the bin, and the exact containment predicate runs as
    a post-filter.  Output equals
    ``points.join(intervals, (point >= lo) & (point < hi))`` exactly.

    Cost model: the interval side replicates ``⌈width/bin_width⌉ + 1``× and
    the join shuffles on a key with ~uniform time distribution — at 100 TB
    this is two bounded shuffles instead of |points|·|intervals| comparisons.
    Pick ``bin_width`` near the typical interval width (replication ≈ 2×);
    degenerate ``hi <= lo`` intervals match nothing and are dropped up front
    (sequence() would reject the reversed bounds at runtime).

    Column names must not collide across the two sides (select/alias first);
    ``point_col``/``lo_col``/``hi_col`` are NON-NEGATIVE integer domain (cast
    timestamps with ``unix_micros`` first — integer bins have no float edge
    rounding; SQL DIV truncates toward zero, which equals floor only for
    non-negative values)."""
    pb = points.withColumn(
        "__bin", F.expr(f"CAST({point_col} AS BIGINT) DIV {bin_width}")
    )
    ib = intervals.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"CAST({lo_col} AS BIGINT) DIV {bin_width}"),
                F.expr(f"(CAST({hi_col} AS BIGINT) - 1) DIV {bin_width}"),
            )
        ),
    )
    return (
        pb.join(ib, "__bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bin")
    )


def merge_asof_grouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tolerance_us: int | None = None,
    bucket_us: int | None = None,
) -> DataFrame:
    """As-of join with ``pd.merge_asof`` semantics (backward direction,
    inclusive tolerance), executed ENTIRELY JVM-side: both sides union into
    one event stream and a running ``last(ignorenulls)`` window carries the
    most recent right row forward onto each left row — zero Python stages,
    so the whole operator lives inside whole-stage codegen instead of paying
    an Arrow round-trip per group (the round-3 plan audit's one remaining
    Python join stage, now retired).

    Each left row at time t matches the latest right row with
    ``rt <= t`` and, when ``tolerance_us`` is set, ``t - rt <= tolerance``
    (both inclusive, exactly ``pd.merge_asof(..., direction='backward')``).
    Right rows are ordered before left rows at equal timestamps so an
    ``rt == t`` row matches; equal-``rt`` duplicates within a key break ties
    by value order (pandas breaks them by input order — both are arbitrary;
    dedup the right side first when ties are possible and meaningful).

    Hot-key bounding: when a tolerance is set, the window partitions on
    ``(key, time_bucket)`` — left rows go to their own bucket, right rows are
    replicated into their bucket and the next one, so every lookback of up to
    ``bucket_us`` (≥ tolerance) stays inside one partition.  A key that owns
    90 % of all events is then split across its time buckets instead of
    concentrating its entire history (and its sort) in one task.
    ``bucket_us`` defaults to the tolerance; raise it to trade per-partition
    size for less right replication.  Without a tolerance the lookback is
    unbounded and the window falls back to per-key partitioning (the same
    shape as ``queries/timeseries.events_asof_last_click``)."""
    from pyspark.sql import Window as W

    if tolerance_us is None and bucket_us is not None:
        raise ValueError(
            "bucket_us requires tolerance_us (unbounded lookback can't be bucketed)"
        )

    l2 = left.select(
        F.col(key).cast("bigint").alias(key),
        F.col(left_ts).alias("__ts"),
        F.monotonically_increasing_id().alias("left_row_id"),
        F.lit(1).alias("__is_left"),
    )
    # one struct keeps (rt, values) atomic: the carried values always come
    # from the SAME right row whose timestamp the tolerance check inspects
    rv = F.struct(
        F.col(right_ts).alias("__rt"),
        *[F.col(c).cast("double").alias(c) for c in right_value_cols],
    )
    r2 = right.select(
        F.col(key).cast("bigint").alias(key),
        F.col(right_ts).alias("__ts"),
        rv.alias("__rv"),
        F.lit(0).alias("__is_left"),
    )

    part_cols = [key]
    if tolerance_us is not None:
        if bucket_us is None:
            bucket_us = tolerance_us
        if bucket_us < tolerance_us:
            raise ValueError(
                f"bucket_us ({bucket_us}) must be >= tolerance_us ({tolerance_us}): "
                "a left row may need right rows up to one full tolerance back"
            )
        l2 = l2.withColumn("__b", F.floor(F.unix_micros("__ts") / F.lit(bucket_us)))
        rbucket = F.floor(F.unix_micros("__ts") / F.lit(bucket_us))
        r2 = r2.withColumn("__b", F.explode(F.array(rbucket, rbucket + 1)))
        part_cols.append("__b")

    l3 = l2.withColumn("__rv", F.lit(None).cast(r2.schema["__rv"].dataType))
    r3 = r2.withColumn("left_row_id", F.lit(None).cast("bigint"))
    unioned = l3.unionByName(r3.select(*l3.columns))

    # right (0) sorts before left (1) at equal __ts → rt == t matches; the
    # trailing __rv order makes equal-rt duplicates deterministic per run
    w = (
        W.partitionBy(*part_cols)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__rv").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("__last", F.last("__rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance_us is not None:
        within = (
            F.unix_micros("__ts") - F.unix_micros(F.col("__last.__rt"))
        ) <= F.lit(tolerance_us)
        out = out.withColumn("__last", F.when(within, F.col("__last")))
    return out.select(
        key,
        F.col("__ts").alias(left_ts),
        "left_row_id",
        *[F.col(f"__last.{c}").alias(c) for c in right_value_cols],
    )
