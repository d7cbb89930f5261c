package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial operators on planar integer coordinates. The scale shape for
  * "all pairs within radius d" is the GRID join: bucket points into
  * d-sized cells, join each point's cell against the 3×3 neighborhood
  * (every qualifying pair is guaranteed to sit in adjacent cells), and
  * verify the exact distance only on those candidates — the candidate
  * set is density-bounded per cell, never the O(n²) cross product. All
  * arithmetic is integer (cell ids, squared distances), so results are
  * bit-identical on any engine and any partitioning.
  */
object GeoOps {

  /** All unordered point pairs within `d` (Euclidean, strict ≤) via the
    * grid join. `points` carries (id, x, y) integer columns. One
    * 9×-explode of cell probes on ONE side, one equi-join on the
    * (cell_x, cell_y) pair — shuffles move 8-byte ids + two ints per
    * probe. The exact filter computes squared distance in BIGINT (no
    * sqrt: d² compares exactly). Pair dedup is by id order, and points
    * in the same location are one pair (a < b), so the output is a set.
    */
  def gridRadiusJoin(points: DataFrame, d: Long): DataFrame = {
    require(d > 0, "need d > 0")
    val probes = points.select(col("id").as("a"), col("x").as("xa"),
        col("y").as("ya"),
        explode(array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
          struct(expr(s"(x div $d) + $dx").as("cx"),
            expr(s"(y div $d) + $dy").as("cy")))): _*)).as("p"))
      .select(col("a"), col("xa"), col("ya"),
        col("p.cx").as("cx"), col("p.cy").as("cy"))
    val cells = points.select(col("id").as("b"), col("x").as("xb"),
      col("y").as("yb"), expr(s"x div $d").as("cx"),
      expr(s"y div $d").as("cy"))
    // each qualifying pair matches in EXACTLY one probe cell (b's own
    // cell equals exactly one of a's nine probes), so no pair dedup is
    // needed — the join output is already a set
    probes.join(cells, Seq("cx", "cy"))
      .filter(col("a") < col("b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= d * d)
      .select(col("a"), col("b"), col("dist2"))
  }

  /** Deterministic synthetic planar coordinates from an integer key —
    * the fixtures ship no geo columns, so spatial queries derive
    * portable positions with the multiplicative-hash recipe (exact
    * BIGINT, identical in any engine). Box is [0, side). */
  def hashCoord(key: Column, mult: Long, side: Long): Column =
    pmod(pmod(key, lit(1000000007L)) * lit(mult), lit(1000000007L)) % side

  /** Second-axis variant: squares the reduced key before the multiply.
    * Two LINEAR hashes of the same key are affinely related mod p — the
    * points land on a sparse lattice with no close pairs at all; the
    * quadratic term breaks the relation so the axes behave
    * independently. Same overflow headroom: every factor < p ≈ 2³⁰ so
    * products stay under 2⁶². */
  def hashCoordSq(key: Column, mult: Long, side: Long): Column = {
    val p = 1000000007L
    val r = pmod(key, lit(p))
    pmod(pmod(r * r, lit(p)) * lit(mult), lit(p)) % side
  }
}
