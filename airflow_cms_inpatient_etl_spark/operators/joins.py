"""Join strategies for skewed and co-located workloads (100 TB tooling).

AQE's skew-join splitting handles most skew automatically; these operators are
the explicit fallbacks for the cases AQE can't fix:

* ``salted_join`` — one fact key receiving a large fraction of all rows (a
  null-ish default id, a bot user): salt the fact side N ways and replicate
  the dimension side N ways, so the hot key spreads over N reducers.
* ``salted_aggregate`` — the same trick for aggregations: two-phase agg via a
  random-ish salt (here a deterministic hash salt, keeping runs reproducible),
  partial per (key, salt) then final per key.
* ``merge_asof_grouped`` — per-key pandas merge_asof for as-of joins whose
  semantics exceed the union-and-carry-forward pattern (tolerance windows,
  nearest-direction): Arrow-batched, state bounded per group.
"""

from __future__ import annotations

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
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps output name → partial aggregate expression; the same
    expression must be re-aggregable by SUM/MIN/MAX at the final stage, so
    pass decomposable aggregates (sum, count via F.count, min, max).  Phase 1
    aggregates per (key, salt) — the hot key's rows split across n_salts
    reducers — phase 2 combines the n_salts partials per key."""
    salt = (F.monotonically_increasing_id() % n_salts).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    # re-combination: sums/counts add, min/max re-min/max — caller picks names
    recombine = []
    for name in aggs:
        if name.startswith("min_"):
            recombine.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            recombine.append(F.max(name).alias(name))
        else:  # sums and counts recombine by summation
            recombine.append(F.sum(name).alias(name))
    return partial.groupBy(*key_cols).agg(*recombine)


def merge_asof_grouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join via per-key ``pd.merge_asof`` (Arrow-batched cogroup).

    For semantics the pure-DataFrame carry-forward pattern can't express
    (e.g. a max-staleness tolerance).  Each key group is processed in pandas;
    state is bounded by the group size, and groups parallelize across
    executors."""
    import pandas as pd

    out_fields = (
        [f"{key} bigint", f"{left_ts} timestamp", "left_row_id bigint"]
        + [f"{c} double" for c in right_value_cols]
    )
    schema = ", ".join(out_fields)

    lt, rt = left_ts, right_ts

    def asof(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(lt)
        r_sorted = r_pdf.sort_values(rt)
        merged = pd.merge_asof(
            l_sorted,
            r_sorted[[rt] + right_value_cols],
            left_on=lt,
            right_on=rt,
            tolerance=pd.Timedelta(microseconds=tolerance_us) if tolerance_us else None,
            direction="backward",
        )
        return merged[[key, lt, "left_row_id"] + right_value_cols]

    l2 = left.select(
        key, left_ts, F.monotonically_increasing_id().alias("left_row_id")
    )
    r2 = right.select(key, right_ts, *right_value_cols)
    return (
        l2.groupBy(key)
        .cogroup(r2.groupBy(key))
        .applyInPandas(lambda _k, l, r: asof(l, r), schema=schema)
    )
