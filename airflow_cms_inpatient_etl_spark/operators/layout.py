"""Write-time data layout for scan pruning: Z-order (Morton) clustering.

At 100 TB the cheapest query is the one that never reads the file: engines
skip parquet files/row-groups whose footer min-max ranges exclude the
predicate.  A single-column sort makes ONE column's ranges tight and leaves
every other column's ranges spanning the whole domain; interleaving the bits
of several columns (Z-order) makes EVERY participating column's per-file
range narrow, so point/range predicates on any of them skip most files.

Shape: one tiny min/max aggregate per column (driver scalars, embedded as
plan literals) → equi-width quantization to ``2^bits`` buckets per column
(``width_bucket``, JVM-side) → bit interleave → ``repartitionByRange`` +
within-partition sort on the Z key.  The Z column is dropped before write;
only the layout survives.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton key interleaving ``bits`` quantized bits of each column.

    Quantization is equi-width over the observed [min, max] (one scalar
    aggregate; at scale use table-level stats instead).  Works for any
    numeric/castable-to-double columns; NULLs land in bucket 0.
    """
    n_buckets = 2**bits
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).first()
    quantized = []
    for c in cols:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        if lo is None or hi is None or lo == hi:
            quantized.append(F.lit(0).cast("bigint"))
            continue
        q = F.width_bucket(
            F.col(c).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n_buckets)
        ) - F.lit(1)
        quantized.append(
            F.coalesce(
                F.least(F.greatest(q, F.lit(0)), F.lit(n_buckets - 1)), F.lit(0)
            ).cast("bigint")
        )
    k = len(cols)
    terms = [
        (F.shiftright(q, bit).bitwiseAND(F.lit(1)) * F.lit(1 << (bit * k + j))).cast("bigint")
        for bit in range(bits)
        for j, q in enumerate(quantized)
    ]
    return reduce(lambda a, b: a + b, terms).alias("zorder_key")


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8, bits: int = 8
) -> None:
    """Write parquet clustered by the Z-order of ``cols``: range-partitioned
    and sorted on the Morton key so every listed column gets tight per-file
    min-max footer ranges (multi-dimensional file skipping)."""
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
