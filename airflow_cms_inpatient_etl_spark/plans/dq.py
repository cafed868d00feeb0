"""Data-quality assertions — the reference's DQ checks, made real.

The reference runs three ``SELECT CASE WHEN COUNT(*) > 0 THEN 1 ELSE 0 END``
"checks" (``/root/reference/dags/patient_claims_plus_postgres.py:125-130,
:150-155,:194-199``) that can never fail the DAG — a SELECT returning 0 still
succeeds.  Here they raise (SURVEY.md A14), and we add the join-key uniqueness
check the reference silently assumes (beneficiary must be ≤1 row per patient or
the LEFT join fans out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DataQualityError(AssertionError):
    pass


def assert_non_empty(df: DataFrame, name: str) -> int:
    n = df.count()
    if n == 0:
        raise DataQualityError(f"DQ failed: table {name!r} is empty")
    return n


def assert_unique_key(df: DataFrame, key: str, name: str) -> None:
    """Fail if any key value occurs more than once (single aggregate pass —
    no driver-side collect of the data)."""
    dup = (
        df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1).limit(1).count()
    )
    if dup:
        raise DataQualityError(f"DQ failed: key {key!r} not unique in {name!r}")


def dq_flag(df: DataFrame) -> DataFrame:
    """The reference's literal check shape: 1/0 non-empty flag plus the count
    (kept for parity; `assert_non_empty` is the enforcing variant)."""
    return df.agg(
        F.when(F.count(F.lit(1)) > 0, 1).otherwise(0).alias("ok"),
        F.count(F.lit(1)).alias("n"),
    )


def observe_dq(df: DataFrame, name: str, null_check_cols: list[str]):
    """Single-pass DQ profiling via ``df.observe``: row count and per-column
    null counts are accumulated AS the plan executes — no second scan.

    At 100 TB this is the only affordable way to profile every pipeline
    stage: ``assert_non_empty``-style checks each re-run the plan (fine for
    gates, ruinous for monitoring), while observed metrics ride the existing
    job like accumulators with SQL semantics (exactly-once per row even under
    task retries, unlike raw accumulators).

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` AFTER an action has materialized the returned frame.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}") for c in null_check_cols
    ]
    return df.observe(obs, *metrics), obs


def k_anonymity_profile(df, quasi_identifiers: list[str], k: int = 5):
    """Per-equivalence-class k-anonymity profile over a set of
    quasi-identifier columns: group size and an at-risk flag for classes
    smaller than ``k``.  The privacy counterpart of the PII scrub
    (operators/scrub.py): scrubbing removes direct identifiers, while rare
    quasi-identifier combinations can still single out individuals — the
    release gate is "no equivalence class below k" (Sweeney 2002, public
    literature).  One hash aggregation with map-side partial counts: the same
    cost/shape as any groupBy at 100 TB, no per-row state."""
    from pyspark.sql import functions as F

    return df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("class_size"),
        (F.count(F.lit(1)) < k).alias("at_risk"),
    )


def l_diversity_profile(df, quasi_identifiers: list[str], sensitive: str, l: int = 3):
    """Per-equivalence-class l-diversity profile (Machanavajjhala et al. 2007,
    public literature): k-anonymity bounds class SIZE, but a class whose
    members all share one sensitive value still leaks it — l-diversity
    requires >= l distinct sensitive values per class, and the dominance
    check flags classes where one value covers more than half the rows
    (the integer form of the entropy/recursive variants — no libm, so
    engine-exact).  Shape: one (quasi, sensitive) census with map-side
    partials, then a class-level roll-up that reuses the same hash
    partitioning (quasi is a prefix of the census key) — two exchanges,
    both census-sized, never row-sized."""
    from pyspark.sql import functions as F

    census = df.groupBy(*quasi_identifiers, sensitive).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return census.groupBy(*quasi_identifiers).agg(
        F.sum("__n").alias("class_size"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.max("__n").alias("top_sensitive_n"),
        (
            (F.count(F.lit(1)) < l)
            | (2 * F.max("__n") > F.sum("__n"))
        ).alias("at_risk"),
    )
