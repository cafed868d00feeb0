"""Spatial proximity-join operators with hotspot remedies.

The flat grid join (cell size = search radius, 3x3 neighbor probe,
`queries/timeseries.geo_grid_proximity_join`) is linear at bounded density,
but an urban-core hotspot makes ONE cell quadratic in its own population —
and worse, puts that whole quadratic block on a single join task.  Two
complementary remedies, both exact (they emit the identical pair set):

* **salting** (`salted_proximity_pairs`): split a hot cell's home side into
  s = ceil(pop / max_cell_pop) salt buckets and explode only the probes
  TARGETING that cell by s.  Total candidate volume is unchanged, but the
  per-task volume drops s-fold — the remedy when the crowd genuinely is
  mutually within R (the quadratic output is inherent; what must scale is
  its parallelism).

* **quadtree refinement** (`quadtree_proximity_pairs`): re-bucket a hot
  cell's points at HALF the cell size and let probes target only the
  subcells whose box intersects their R-ball bounding box.  Per-key
  volume drops ~4x per level (finer parallelism, like salting); CANDIDATE
  pruning is geometric and compounds with depth — at one level the probed
  area shrinks from the coarse (3R)^2 neighborhood toward the exact
  (2R+rf)^2 bbox (~30%), and only once the refined cell is smaller than
  the crowd's internal spread do within-crowd candidates start dropping
  too.  One refinement level is implemented; iterating it (split subcells
  that are still hot) is the same step applied again.

Both degrade to the plain flat-grid join when no cell exceeds
``max_cell_pop`` (the hot-cell map is empty), which the tests exploit:
hash-equal pairs on a uniform fixture, bounded per-key candidate volume on
a planted hotspot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFSETS = "explode(arrays_zip(array(-1,-1,-1,0,0,0,1,1,1), array(-1,0,1,-1,0,1,-1,0,1)))"


def grid_points(pts: DataFrame, r: int) -> DataFrame:
    """Attach flat-grid cell keys (cell size = r) to integer points
    (id, x, y)."""
    return pts.select(
        "id", "x", "y", F.expr(f"x div {r}").alias("cx"), F.expr(f"y div {r}").alias("cy")
    )


def hot_cells(gridded: DataFrame, max_cell_pop: int) -> DataFrame:
    """Cells whose population exceeds the bound, with their salt factor
    s = ceil(pop / max_cell_pop).  Hotspots are by definition FEW (a cell
    census aggregate, then a filter), so every consumer broadcasts this."""
    return (
        gridded.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("pop"))
        .filter(F.col("pop") > max_cell_pop)
        .select(
            "cx",
            "cy",
            F.expr(f"(pop + {max_cell_pop} - 1) div {max_cell_pop}").alias("s"),
        )
    )


def _exact_pairs(candidates: DataFrame, r: int) -> DataFrame:
    """id < b_id (each unordered pair survives exactly once — both
    orderings reach the candidate set) + the exact integer distance
    predicate (squared — no sqrt, no floats)."""
    dx = F.col("x") - F.col("bx")
    dy = F.col("y") - F.col("by")
    return (
        candidates.filter(
            (F.col("id") < F.col("b_id"))
            & (dx * dx + dy * dy <= F.lit(r).cast("long") * r)
        )
        .select(F.col("id").alias("a_id"), "b_id")
    )


def salted_sides(g: DataFrame, max_cell_pop: int) -> tuple[DataFrame, DataFrame]:
    """(probe, home) sides of the salted grid join, keyed on
    (px, py, salt) — exposed separately so canaries can measure per-key
    candidate volume without running the join."""
    hot = hot_cells(g, max_cell_pop)
    home = (
        g.join(F.broadcast(hot), ["cx", "cy"], "left")
        .select(
            F.col("id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.col("cx").alias("px"),
            F.col("cy").alias("py"),
            # hash, not id % s: regular id strides (every-200th plants, sharded
            # sequences) correlate with small moduli and collapse every hot
            # point into one bucket.  The salt never reaches the output, so an
            # engine-internal hash is fine.
            F.pmod(F.hash(F.col("id")), F.coalesce(F.col("s"), F.lit(1))).cast("long").alias("salt"),
        )
    )
    probe = (
        g.select("id", "x", "y", "cx", "cy", F.expr(_OFFSETS).alias("o"))
        .select(
            "id",
            "x",
            "y",
            (F.col("cx") + F.col("o.0")).alias("px"),
            (F.col("cy") + F.col("o.1")).alias("py"),
        )
        .join(
            F.broadcast(hot.select(F.col("cx").alias("px"), F.col("cy").alias("py"), "s")),
            ["px", "py"],
            "left",
        )
        .withColumn(
            "salt",
            F.explode(F.sequence(F.lit(0).cast("long"), F.coalesce(F.col("s"), F.lit(1)).cast("long") - 1)),
        )
        .drop("s")
    )
    return probe, home


def salted_proximity_pairs(pts: DataFrame, r: int, max_cell_pop: int) -> DataFrame:
    """All unordered point pairs within distance r, via the flat grid join
    with HOT-CELL SALTING: the home side of a hot cell is split into s salt
    buckets by id HASH, and every probe targeting that cell fans out over
    the s buckets (cold targets keep s = 1, a single probe row).  Each candidate
    (a, b) still appears exactly once per direction — b sits in exactly one
    salt bucket and a's fan-out covers each bucket exactly once — so the
    pair set is identical to the plain join's; only the join-key population
    changes, bounding per-task candidate volume by
    ~(probe pop) * max_cell_pop."""
    g = grid_points(pts, r)
    from airflow_cms_inpatient_etl_spark.sources.registry import snapshot

    g = snapshot(g)  # census + home + probe all read it
    probe, home = salted_sides(g, max_cell_pop)
    return _exact_pairs(probe.join(home, ["px", "py", "salt"]), r)


def quadtree_sides(g: DataFrame, r: int, max_cell_pop: int) -> tuple[DataFrame, DataFrame]:
    """(probe, home) sides of the one-level quadtree-refined grid join,
    keyed on (lvl, kx, ky) — exposed separately so canaries can measure
    per-key candidate volume without running the join."""
    assert r % 2 == 0, "quadtree refinement halves the cell size: r must be even"
    rf = r // 2
    hot = hot_cells(g, max_cell_pop).select("cx", "cy", F.lit(True).alias("is_hot"))
    # home: one key per point — fine key inside hot cells, coarse elsewhere
    home = (
        g.join(F.broadcast(hot), ["cx", "cy"], "left")
        .select(
            F.col("id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.when(F.col("is_hot"), 1).otherwise(0).alias("lvl"),
            F.when(F.col("is_hot"), F.expr(f"x div {rf}")).otherwise(F.col("cx")).alias("kx"),
            F.when(F.col("is_hot"), F.expr(f"y div {rf}")).otherwise(F.col("cy")).alias("ky"),
        )
    )
    # probe: 3x3 coarse neighborhood; hot targets explode to the <=4
    # subcells intersecting [x-r, x+r] x [y-r, y+r], cold targets stay coarse
    neigh = (
        g.select("id", "x", "y", "cx", "cy", F.expr(_OFFSETS).alias("o"))
        .select(
            "id",
            "x",
            "y",
            (F.col("cx") + F.col("o.0")).alias("px"),
            (F.col("cy") + F.col("o.1")).alias("py"),
        )
        .join(
            F.broadcast(hot.select(F.col("cx").alias("px"), F.col("cy").alias("py"), "is_hot")),
            ["px", "py"],
            "left",
        )
    )
    probe_cold = neigh.filter(F.col("is_hot").isNull()).select(
        "id", "x", "y", F.lit(0).alias("lvl"), F.col("px").alias("kx"), F.col("py").alias("ky")
    )
    sub = F.expr("explode(arrays_zip(array(0,0,1,1), array(0,1,0,1)))")
    probe_hot = (
        neigh.filter(F.col("is_hot"))
        .select("id", "x", "y", "px", "py", sub.alias("o"))
        .select(
            "id",
            "x",
            "y",
            F.lit(1).alias("lvl"),
            (F.col("px") * 2 + F.col("o.0")).alias("kx"),
            (F.col("py") * 2 + F.col("o.1")).alias("ky"),
        )
        # keep only subcells whose box intersects the R-ball bounding box
        .filter(
            (F.col("kx") * rf <= F.col("x") + r)
            & ((F.col("kx") + 1) * rf > F.col("x") - r)
            & (F.col("ky") * rf <= F.col("y") + r)
            & ((F.col("ky") + 1) * rf > F.col("y") - r)
        )
    )
    return probe_cold.unionByName(probe_hot), home


def quadtree_proximity_pairs(pts: DataFrame, r: int, max_cell_pop: int) -> DataFrame:
    """All unordered point pairs within distance r, with ONE quadtree
    refinement level: points of a hot cell re-bucket at half cell size
    (rf = r div 2; r must be even), and a probe targeting a hot cell fans
    out only to the subcells whose box intersects its R-ball bounding box
    — distant corners of the hot cell are PRUNED, not just parallelized.
    Home keys are (level, kx, ky): exactly one per point, so with the
    bbox-cover argument each candidate appears once per direction and the
    a < b filter keeps exactly one."""
    g = grid_points(pts, r)
    from airflow_cms_inpatient_etl_spark.sources.registry import snapshot

    g = snapshot(g)
    probe, home = quadtree_sides(g, r, max_cell_pop)
    return _exact_pairs(probe.join(home, ["lvl", "kx", "ky"]), r)


def neighbor_counts(gridded: DataFrame, pairs: DataFrame) -> DataFrame:
    """Per-point neighbor counts from an unordered pair set, including
    isolated points (count 0) — the standard output grain of the proximity
    queries."""
    ncount = (
        pairs.select(F.col("a_id").alias("id"))
        .unionAll(pairs.select(F.col("b_id").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        gridded.select("id", "cx", "cy")
        .join(ncount, "id", "left")
        .select("id", "cx", "cy", F.coalesce("n", F.lit(0)).alias("n_neighbors"))
    )
