"""Count-min sketch as DataFrame ops: mergeable frequency estimation.

A CMS is a ``depth × width`` grid of counters; each of the ``depth`` rows
hashes every item into one of ``width`` cells.  The point estimate for an
item is the minimum of its ``depth`` cells — always >= the true count, and
within ``2N/width`` of it with high probability (Cormode & Muthukrishnan,
J. Algorithms 2005).

Spark-first shape: the sketch IS a tiny DataFrame of ``(row, col, cnt)``
cells (at most depth*width rows), built with ONE shuffle (groupBy on the
cell key).  Sketches from different partitions/days merge by unioning cell
tables and re-summing — the same mergeability that makes CMS the standard
streaming/distributed heavy-hitters structure.  Estimation joins the
broadcast cell table, so probing any number of items costs no extra shuffle
of the sketch side.

Reference parity: the reference engine has no sketch support; this is part
of the LLM-pipeline extension surface (heavy-hitter detection over 100 TB
event/token streams where exact per-key counts are the expensive path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(item: Column, row: Column, width: int) -> Column:
    """Cell index for (item, row): xxhash64 seeded by the row id — depth
    independent hash functions from one 64-bit family, all JVM-side."""
    return F.pmod(F.xxhash64(item, row), F.lit(width))


def cms_build(df: DataFrame, item_col: str, depth: int = 4, width: int = 64) -> DataFrame:
    """Build the cell table ``(row, col, cnt)`` — one wide-then-narrow pass:
    explode each input row into ``depth`` cell updates, then a single
    groupBy over at most depth*width distinct keys (map-side partial
    aggregation collapses the per-partition grids before the shuffle)."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    return (
        df.select(F.col(item_col).alias("item"))
        .select("item", rows)
        .select(F.col("row"), _cell(F.col("item"), F.col("row"), width).alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, hash family):
    union the cell tables and re-sum per cell."""
    if not sketches:
        raise ValueError("cms_merge requires at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    items: DataFrame, sketch: DataFrame, item_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point estimates for ``items``: explode each item into its ``depth``
    cells, broadcast-join the (<= depth*width row) cell table, take the
    min.  Missing cells count 0 (cannot happen for items that were fed to
    the sketch, but keeps probes of unseen items well-defined)."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    probed = (
        items.select(F.col(item_col).alias("item"))
        .distinct()
        .select("item", rows)
        .select("item", "row", _cell(F.col("item"), F.col("row"), width).alias("col"))
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
        .withColumnRenamed("item", item_col)
    )
