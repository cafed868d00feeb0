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

# --------------------------------------------------------------------------- #
# q-digest-style dyadic rank sketch: mergeable quantiles with rank-error      #
# bounds (Shrivastava, Buragohain, Agrawal, Suri — SenSys 2004).  The KLL/    #
# t-digest niche — mergeable percentile state for 100-TB monitoring — but     #
# expressed so the WHOLE construction is relational aggregation:              #
#                                                                             #
#   1. values are non-negative ints < 2^bits (prices as cents here);          #
#   2. the "tree" is the radix-2^r interval histogram: for every value,       #
#      its ancestor node at every level 0..bits/r carries the subtree         #
#      count — built with ONE ancestor-explode over the distinct-value        #
#      histogram and ONE groupBy (level, node);                               #
#   3. the SKETCH is the heavy subset: nodes whose subtree count exceeds      #
#      n/eps_den.  Per level at most eps_den such nodes exist, so the         #
#      sketch is <= (levels+1)*eps_den cells (levels = bits/radix) NO         #
#      MATTER HOW LARGE n IS;                                                 #
#   4. each kept node's residual (its count minus its kept children's)       #
#      attributes every input value to exactly one kept node, and the         #
#      estimated rank at any kept right-endpoint e is the residual cumsum    #
#      — an UNDER-estimate of the true rank by at most                        #
#      (levels+1) * fanout * n/eps_den (the straddling root-to-leaf path's   #
#      residuals, each below fanout x the keep threshold).                    #
#                                                                             #
# Unlike KLL/t-digest, nothing here depends on partition layout, merge        #
# order, or randomness: sums are commutative/associative, so sketches from    #
# different shards/days MERGE EXACTLY (union + re-sum, `dyadic_merge`) and    #
# the merged sketch is bit-identical to the one built on the union — the      #
# associativity property test in tests/test_round12.py.  KLL's random         #
# compaction gives a better size/error trade-off on unbounded domains, but    #
# is nondeterministic under Spark's nondeterministic merge order; for the     #
# bounded-integer domains a pipeline monitors (cents, token counts,           #
# latencies in ms) the dyadic sketch is the deterministic choice.             #
# --------------------------------------------------------------------------- #

QD_EPS_DEN = 8192  # prune denominator: keep node iff cnt * QD_EPS_DEN > n


def dyadic_tree(
    df: DataFrame,
    value_col: str,
    bits: int,
    radix: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Radix-2^radix interval histogram ``(level, node, cnt)`` for
    non-negative integer values < 2^bits: node at ``level`` covers
    ``[node << (bits - radix*level), ((node+1) << (bits - radix*level)) - 1]``;
    ``cnt`` is the number (or weight sum) of values inside it.  Level 0 is
    the root (cnt = n); level ``bits/radix`` is the leaf histogram.

    Two narrow shuffles: distinct-value collapse (8-byte key), then the
    (level, node) census over the ancestor explode — the explode runs on
    the DISTINCT histogram, so its width is (levels+1) x distinct values,
    never x rows.  ``radix`` trades census volume against bound tightness:
    radix 4 over 24-bit cents is a 7-row explode per distinct value and a
    rank bound of (levels+1)*16*n/eps_den, vs radix 1's 25-row explode for
    a (levels+1)*2*n/eps_den bound — measured 3-4x cheaper to build for a
    still-sub-2%-of-n guarantee.  Out-of-domain values raise loudly
    instead of silently aliasing another node's interval."""
    if bits % radix != 0:
        raise ValueError(f"bits ({bits}) must be a multiple of radix ({radix})")
    levels = bits // radix
    x = F.col(value_col).cast("long")
    guarded = F.when((x >= 0) & (x < F.lit(1 << bits)), x).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"dyadic_tree: value outside [0, 2^{bits}): "),
                F.col(value_col).cast("string"),
            )
        )
    )
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    leaves = (
        df.select(guarded.alias("_v"), w.alias("_w"))
        .groupBy("_v")
        .agg(F.sum("_w").alias("_w"))
    )
    return (
        leaves.select(
            "_v", "_w", F.explode(F.sequence(F.lit(0), F.lit(levels))).alias("level")
        )
        .select(
            "level",
            F.expr(f"shiftright(_v, {bits} - {radix} * level)").alias("node"),
            "_w",
        )
        .groupBy("level", "node")
        .agg(F.sum("_w").alias("cnt"))
    )


def dyadic_merge(*trees: DataFrame) -> DataFrame:
    """Merge trees built with the same ``bits``: union + re-sum.  Exact —
    the merged tree equals the tree of the concatenated inputs, so pruning
    the merged tree gives the identical sketch (associativity test)."""
    if not trees:
        raise ValueError("dyadic_merge requires at least one tree")
    out = trees[0]
    for t in trees[1:]:
        out = out.unionByName(t)
    return out.groupBy("level", "node").agg(F.sum("cnt").alias("cnt"))


def qdigest_prune(
    tree: DataFrame, eps_den: int = QD_EPS_DEN, radix: int = 4
) -> DataFrame:
    """Heavy-node sketch ``(level, node, cnt, residual, n_rows)``: keep nodes
    with ``cnt * eps_den > n`` (n read off the tree's own root — no separate
    count pass), then attribute to each kept node the residual its kept
    children don't cover.  Integer compare throughout — no float threshold.
    The root is always kept, so residuals total exactly n.  Sketch size is
    bounded by (levels x eps_den) regardless of n; the joins below are
    sketch-sized and broadcast."""
    root = tree.filter(F.col("level") == 0).select(F.col("cnt").alias("n_rows"))
    kept = (
        tree.crossJoin(F.broadcast(root))
        .filter(F.col("cnt") * eps_den > F.col("n_rows"))
    )
    children = (
        kept.filter(F.col("level") > 0)
        .select(
            (F.col("level") - 1).alias("level"),
            F.expr(f"shiftright(node, {radix})").alias("node"),
            F.col("cnt").alias("_child_cnt"),
        )
        .groupBy("level", "node")
        .agg(F.sum("_child_cnt").alias("_covered"))
    )
    return kept.join(F.broadcast(children), ["level", "node"], "left").select(
        "level",
        "node",
        "cnt",
        (F.col("cnt") - F.coalesce(F.col("_covered"), F.lit(0))).alias("residual"),
        "n_rows",
    )


def qdigest_rank_cdf(kept: DataFrame, bits: int, radix: int = 4) -> DataFrame:
    """Estimated-rank CDF over kept-node right endpoints:
    ``(upper, cum_est)`` where ``cum_est`` under-estimates the true count
    of values <= upper by at most ``(levels+1) * 2^radix * n / eps_den``
    (one straddling node per root-to-leaf level, each with residual below
    fanout x threshold).  The cumsum window is a single partition over the
    SKETCH (<= (levels+1)*eps_den rows by construction — never
    data-sized), the same bounded-structure exemption as the CMS grid."""
    from pyspark.sql.window import Window

    per_upper = (
        kept.select(
            F.expr(f"((node + 1) << ({bits} - {radix} * level)) - 1").alias("upper"),
            "residual",
        )
        .groupBy("upper")
        .agg(F.sum("residual").alias("_res"))
    )
    w = Window.orderBy("upper").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_upper.select("upper", F.sum("_res").over(w).alias("cum_est"))


# --------------------------------------------------------------------------- #
# KMV / theta sketch: mergeable distinct-count state that supports SET         #
# ALGEBRA (Bar-Yossef et al. RANDOM 2002; Beyer et al. SIGMOD 2007; the        #
# Apache DataSketches "theta sketch" generalization).  HLL (the sketch         #
# behind approx_count_distinct / approx_distinct_sketch_merge) unions          #
# losslessly but CANNOT intersect; KMV keeps the k MINIMUM hash VALUES, so     #
# two sketches can be intersected/differenced by treating the merged k         #
# smallest values as a uniform sample of the union:                           #
#                                                                              #
#   est(S)      = (k-1) / theta_S          theta_S = k-th smallest h/2^60     #
#   union       = k smallest of (KMV_A u KMV_B)  — EXACT KMV of A u B         #
#                 (every union value below min(theta_A, theta_B) is present    #
#                 in one of the input sketches, and the k-th smallest of       #
#                 A u B is <= both thetas: subsets have larger k-th minima)    #
#   intersect   = |{v in union sketch : v in KMV_A and v in KMV_B}| / k       #
#                 x est(A u B)            (Beyer et al. ratio estimator)      #
#                                                                              #
# The merge-exactness makes the union estimator associative and               #
# partition-layout-independent — property-tested in tests/test_round13.py,    #
# the q-digest doctrine.  Hashes come from the portable 60-bit md5 family     #
# (operators.text.hash60), so a DuckDB oracle replays the ENTIRE sketch       #
# algebra bit-for-bit — estimates hash-match, not just bound booleans.        #
#                                                                              #
# Scale posture: the k smallest per set are found WITHOUT a global sort:      #
# the exact per-set distinct count (needed by the verification output         #
# anyway) sets a hash-value prefilter at 4x oversampling                      #
# (threshold = 2^60 * 4k / n, expected survivors 4k, shortfall probability    #
# < e^-k by Chernoff), and only survivors enter the per-set row_number        #
# window — at 10^9 distinct keys the window sees ~1k rows, not 10^9.          #
# --------------------------------------------------------------------------- #

KMV_K = 256  # sketch size: relative std error ~ 1/sqrt(k-2) ~ 6.3 %


def kmv_sketch(
    distinct_keys: DataFrame, set_col: str, hash_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-set KMV sketch ``(set_col, hash_col, rn)`` — the k minimum hash
    values of each set, rn = 1..k ascending.  ``distinct_keys`` must already
    be distinct on (set, key-hash); sets with fewer than k distinct values
    yield their complete hash list (the sketch degrades to exact)."""
    from pyspark.sql.window import Window

    counts = distinct_keys.groupBy(set_col).agg(F.count(F.lit(1)).alias("_n"))
    # 4x-oversampled prefilter; sets at/below 4k keep everything (threshold
    # saturates past the hash range).  Engine-side only — the oracle windows
    # the unfiltered set and gets the same k minima.
    thr = F.when(
        F.col("_n") <= 4 * k, F.lit(float(1 << 60))
    ).otherwise(F.lit(float((1 << 60) * 4 * k)) / F.col("_n"))
    survivors = (
        distinct_keys.join(F.broadcast(counts), set_col)
        .filter(F.col(hash_col) < thr)
        .drop("_n")
    )
    w = Window.partitionBy(set_col).orderBy(hash_col)
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(set_col, hash_col, "rn")
    )


def kmv_merge(sketches: DataFrame, hash_col: str, k: int = KMV_K) -> DataFrame:
    """Union sketch: the k smallest DISTINCT hash values across all input
    sketch rows — exactly the KMV of the underlying set union (see module
    comment).  TakeOrderedAndProject over <= (n_sets x k) rows."""
    return sketches.select(hash_col).distinct().orderBy(hash_col).limit(k)
