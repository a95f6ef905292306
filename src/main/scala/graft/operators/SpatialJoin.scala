package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed bbox-intersects join — PBSM/grid join (Patel & DeWitt,
  * SIGMOD '96), the equi-join form of a spatial predicate Spark has no
  * native operator for (gate `stac12_spatial_join`; the scaladoc-cited
  * reference has no spatial join at all — its only spatial compute is the
  * bbox codec, `stac_geoparquet/arrow/_spatial.py` analog in
  * `graft/stac/Wkb.scala`).
  *
  * Plan shape: each side explodes to the fixed-size grid cells its box
  * covers (the explode factor is ⌈w/cell⌉+1 × ⌈h/cell⌉+1, bounded by
  * choosing `cell` near the typical box size), candidates come from an
  * EQUI-join on the cell pair — never a cartesian/nested-loop — the exact
  * closed-interval overlap predicate verifies, and multi-cell duplicate
  * candidates are eliminated ROW-LOCAL by the reference-point rule: a
  * surviving pair is kept only in the cell containing the intersection's
  * min corner, which lies in exactly one cell — no distinct, no
  * post-join shuffle.
  *
  * Scale: both sides shuffle on the cell key (broadcast never required;
  * the optimizer may still pick it for a small side); skewed cells (a
  * city's worth of boxes in one cell) are ordinary join-key skew — AQE
  * skew-split applies, or re-run with a finer `cell`.
  *
  * @param left     frame carrying `leftBox` columns (+ any payload)
  * @param right    frame carrying `rightBox` columns (+ any payload);
  *                 ALL column names must be disjoint from `left`'s, and
  *                 neither side may use the reserved `__cx`/`__cy`
  *                 (enforced)
  * @param cell     grid cell size in coordinate units (> 0)
  * @param leftBox  left bbox column names: xmin, ymin, xmax, ymax
  * @param rightBox right bbox column names: xmin, ymin, xmax, ymax
  * @return one row per intersecting pair with both sides' columns
  */
object SpatialJoin {

  def bboxJoin(left: DataFrame, right: DataFrame, cell: Double,
               leftBox: Seq[String], rightBox: Seq[String]): DataFrame = {
    require(cell > 0, s"cell size must be positive, got $cell")
    require(leftBox.length == 4 && rightBox.length == 4,
      "leftBox/rightBox must name xmin, ymin, xmax, ymax")
    // fail fast at the call site, not at a downstream select: ALL output
    // columns (payloads included) must be unambiguous, and the internal
    // cell columns must not clobber caller data
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty,
      s"column names must be disjoint across sides, both have: $collisions")
    val reserved = (left.columns ++ right.columns).toSet.intersect(Set("__cx", "__cy"))
    require(reserved.isEmpty, s"__cx/__cy are reserved cell columns, input has: $reserved")
    val Seq(lx0, ly0, lx1, ly1) = leftBox.map(col)
    val Seq(rx0, ry0, rx1, ry1) = rightBox.map(col)
    // LONG cell indices: an int cast would wrap silently past 2^31 cells
    // (tiny cell size × planet-scale coordinates) and drop true pairs.
    // Explode-factor guard: a cell much smaller than a box's extent (or a
    // planet-spanning box) would make sequence() emit up to millions of
    // indices per row — Spark's sequence errors past ~2^31 elements and
    // memory blows far earlier, with a stack trace that never mentions the
    // misconfigured parameter. Cap the per-axis fan-out and fail with
    // routing advice naming `cell`, like the broadcast guards do.
    val maxCellsPerAxis = 4096L
    def cells(lo: Column, hi: Column): Column = {
      val first = floor(lo / cell).cast("long")
      val last = floor(hi / cell).cast("long")
      val n = last - first + 1L
      when(n > maxCellsPerAxis,
        raise_error(concat(
          lit("SpatialJoin.bboxJoin: a box spans "), n.cast("string"),
          lit(s" grid cells on one axis (cap $maxCellsPerAxis) at cell=$cell — " +
            "pick `cell` near the typical box extent, or split oversized boxes " +
            "before the join"))))
        .otherwise(sequence(first, last))
    }
    val l = left
      .withColumn("__cx", explode(cells(lx0, lx1)))
      .withColumn("__cy", explode(cells(ly0, ly1)))
    val r = right
      .withColumn("__cx", explode(cells(rx0, rx1)))
      .withColumn("__cy", explode(cells(ry0, ry1)))
    l.join(r, Seq("__cx", "__cy"))
      .filter(lx0 <= rx1 && lx1 >= rx0 && ly0 <= ry1 && ly1 >= ry0)
      // reference point: the intersection's min corner owns exactly one
      // cell, so multi-cell candidate copies die row-local
      .filter(floor(greatest(lx0, rx0) / cell).cast("long") === col("__cx") &&
        floor(greatest(ly0, ry0) / cell).cast("long") === col("__cy"))
      .drop("__cx", "__cy")
  }

  /** Exact-geometry spatial join: [[bboxJoin]]'s grid candidates + bbox
    * overlap as the PREFILTER, then a JTS `intersects` verify over the
    * two WKB geometry columns — pairs whose envelopes overlap but whose
    * shapes don't are rejected here and only here (gate
    * stac20_exact_geom_join pins a population where the two answers
    * differ). The verify runs on the candidate survivors, never the
    * cross product, so WKB parse count ∝ candidate pairs — the same
    * filter-behind-prefilter layering as [[graft.stac.Cql2]]'s spatial
    * predicates. */
  def geomJoin(left: DataFrame, right: DataFrame, cell: Double,
               leftBox: Seq[String], rightBox: Seq[String],
               leftWkb: String, rightWkb: String): DataFrame =
    bboxJoin(left, right, cell, leftBox, rightBox)
      .filter(graft.stac.GeoFunctions.st_intersects(col(leftWkb), col(rightWkb)))
}
