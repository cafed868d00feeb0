"""Text primitives shared by the dedup / text-analysis operators.

All JVM-side expressions (no Python UDFs): tokenization is ``split`` on
whitespace, shingling is a ``transform`` over an index ``sequence``, and the
portable 60-bit hash is an md5-prefix — chosen because md5 produces identical
hex across engines, which keeps MinHash/SimHash signatures oracle-comparable
(and deterministic across cluster re-runs, unlike seed-per-JVM hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Guarded small-scan parallelization (see sources.registry.spread_scan);
    imported lazily to keep operators importable without the sources pkg."""
    from airflow_cms_inpatient_etl_spark.sources.registry import spread_scan

    return spread_scan(df, id_col)


def words(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles(words_col: Column, k: int = 3) -> Column:
    """Word k-gram shingles: ['a','b','c','d'] → ['a b c', 'b c d'].

    Shingles (not unigrams) are the dedup unit: with a small vocabulary,
    unigram posting lists are dense and the candidate join goes quadratic;
    k-gram shingles keep document-frequency near 1 so the inverted-index
    self-join stays linear in corpus size.
    """
    n = F.size(words_col) - (k - 1)
    arr = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.concat_ws(" ", *[F.element_at(words_col, i + j) for j in range(k)]),
    )
    # sequence(1, 0) would run backwards in Spark — guard short documents
    return F.when(n >= 1, arr).otherwise(F.array().cast("array<string>"))


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) rows, one per *distinct* shingle per document.

    The words array is materialized in its own projection first: Catalyst does
    not eliminate common subexpressions inside higher-order-function lambdas,
    so inlining ``split()`` would re-run the regex per ``element_at`` (measured
    ~10× slower).  The scan is spread across cores first when its parallelism
    is degenerate (single-file fixture) — a guarded no-op on a parallel
    production scan (``sources.registry.spread_scan``; measured 1.6× on the
    MinHash pipeline at sf0.1 under local[32]).
    """
    tokenized = _spread(
        df.select(F.col(id_col), words(F.col(text_col)).alias("__words")), id_col
    )
    return (
        tokenized.select(F.col(id_col), F.explode(shingles(F.col("__words"), k)).alias("shingle"))
        .distinct()
    )


def hash60(col: Column, seed: str = "") -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5(seed || value).

    Engine-portable (md5 is bit-identical everywhere) and collision-safe enough
    for MinHash permutations (2^60 space).
    """
    prefixed = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(prefixed), 1, 15), 16, 10).cast("long")


def exploded_shingle_hashes(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, h) rows: one 60-bit hash per distinct shingle per document.

    Hashing before the distinct/shuffle is the scale move: posting lists carry
    8-byte ints instead of ~50-byte shingle strings, and every downstream
    consumer (Jaccard join, MinHash permutations, SimHash bit votes) works on
    the int.  At 2^60 hash space, collisions are ~|shingles|²/2^61 — nil even
    at 100 TB corpus scale — and the md5-based hash is engine-portable, so
    results stay oracle-exact.
    """
    tokenized = _spread(
        df.select(F.col(id_col), words(F.col(text_col)).alias("__words")), id_col
    )
    return (
        tokenized.select(F.col(id_col), F.explode(shingles(F.col("__words"), k)).alias("shingle"))
        .select(F.col(id_col), hash60(F.col("shingle")).alias("h"))
        .distinct()
    )


def normalized_fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace-collapsed lowercased text —
    the exact-dedup key that survives formatting noise."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))
