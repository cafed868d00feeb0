"""Bloom-filter semi-join pruning: the runtime-filter pattern as an explicit,
portable operator.

Shape: build a k-hash Bloom filter over the (already-filtered, small) build
side with one tiny aggregation, ship it to every probe task as a LITERAL
int64 word array, and prefilter the probe side ENTIRELY MAP-SIDE before the
exact join.  At 100 TB this is the difference between shuffling the full
fact table into a join and shuffling only the ~matching fraction — the same
effect as Spark's AQE runtime bloom filter (`spark.sql.optimizer.runtime.
bloomFilter.enabled`), but explicit, engine-portable, and available when the
optimizer's heuristics decline to inject one.

The filter is one-sided: NO false negatives (every matching row survives),
tunable false positives (survivors are re-checked by the exact join that
follows).  That one-sidedness is what makes the composition exactly
verifiable: bloom-prune + exact semi-join ≡ exact semi-join, bit for bit.

The collected word array is a model parameter, not data: ``n_words`` int64s
(default 2048 words = 16 KiB) regardless of input size — same driver-side
footprint class as a PQ codebook or a k-means centroid table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_BITS = 1 << 17  # 131072 bits = 2048 int64 words = 16 KiB
_DEFAULT_HASHES = 4


def _bit_positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(j)), F.lit(n_bits)) for j in range(n_hashes)]


def bloom_build(
    build: DataFrame, key_col: str, n_bits: int = _DEFAULT_BITS, n_hashes: int = _DEFAULT_HASHES
) -> list[int]:
    """Aggregate the build side into the filter's word array.

    One narrow pass: explode each key into its ``n_hashes`` bit positions,
    OR the per-word masks together (map-side partial aggregation collapses
    per-partition filters before the <= n_bits/64-row shuffle), collect the
    word list.  Missing words (no bits set) come back as 0.
    """
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    n_words = n_bits // 64
    bits = F.explode(F.array(*_bit_positions(F.col("__key"), n_bits, n_hashes))).alias("bit")
    words = (
        build.select(F.col(key_col).alias("__key"))
        .select(bits)
        .select(
            F.expr("bit div 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = [0] * n_words
    for r in words:
        arr[r["word"]] = r["bits"]
    return arr


def bloom_flag(
    df: DataFrame,
    key_col: str,
    words: list[int],
    flag_col: str,
    n_bits: int = _DEFAULT_BITS,
    n_hashes: int = _DEFAULT_HASHES,
) -> DataFrame:
    """Add a boolean membership column (no false negatives, tunable false
    positives) — pure map-side JVM expression (element_at on a
    constant-folded array literal + bit tests), no join, no shuffle,
    codegen-friendly.  The flag form of ``bloom_prune`` for plans that
    need to COUNT gate decisions (verified FP accounting) instead of
    filtering on them."""
    # one server-side parse for the whole word array (referenced once via a
    # projected column, not inlined per hash): building it from per-element
    # lit() Columns costs thousands of py4j round-trips PER INVOCATION
    # (measured ~4 s of pure driver overhead at 2048 words)
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    tagged = df.withColumn("__bloom", F.expr(arr_sql))
    conds = []
    for j in range(n_hashes):
        pos = f"pmod(xxhash64(`{key_col}`, {j}), {n_bits})"
        word = f"element_at(__bloom, CAST({pos} div 64 AS INT) + 1)"
        mask = f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))"
        conds.append(f"(({word} & {mask}) != 0)")
    return tagged.withColumn(flag_col, F.expr(" AND ".join(conds))).drop("__bloom")


def bloom_prune(
    df: DataFrame,
    key_col: str,
    words: list[int],
    n_bits: int = _DEFAULT_BITS,
    n_hashes: int = _DEFAULT_HASHES,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter — see
    ``bloom_flag``."""
    return (
        bloom_flag(df, key_col, words, "__might", n_bits, n_hashes)
        .filter(F.col("__might"))
        .drop("__might")
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_bits: int = _DEFAULT_BITS,
    n_hashes: int = _DEFAULT_HASHES,
) -> DataFrame:
    """Exact LEFT SEMI join with a Bloom prefilter on the probe side.

    Correctness does not depend on the filter (no false negatives; false
    positives are removed by the exact semi join) — the filter only cuts
    the rows that reach the join's shuffle/broadcast.

    Type-parity contract: xxhash64 is input-TYPE-sensitive, so a build key
    and probe key of different types (INT vs BIGINT, string vs numeric)
    would compute different bit positions — silent FALSE NEGATIVES the
    exact semi join cannot recover.  Mismatched key dtypes are therefore
    rejected; cast both sides to one canonical type at the call site."""
    probe_t = dict(probe.dtypes)[probe_key]
    build_t = dict(build.dtypes)[build_key]
    if probe_t != build_t:
        raise ValueError(
            f"bloom_semi_join key dtype mismatch: {probe_key}:{probe_t} vs "
            f"{build_key}:{build_t} — xxhash64 bit positions diverge across "
            "types (silent false negatives); cast both keys to one type first"
        )
    words = bloom_build(build, build_key, n_bits, n_hashes)
    pruned = bloom_prune(probe, probe_key, words, n_bits, n_hashes)
    return pruned.join(build, pruned[probe_key] == build[build_key], "left_semi")
