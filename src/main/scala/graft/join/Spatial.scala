package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Spatial radius join on planar integer coordinates — "every right
 * point within r of each left point" without the cross join Spark
 * would plan for a raw distance predicate. Coordinates are integers
 * in the caller's unit (project lat/lon upstream — equirectangular
 * meters, or micro-degrees for small extents); all candidate and
 * distance arithmetic is exact integer, so any engine agrees on the
 * result set bit-for-bit.
 */
object Spatial {

  /**
   * Grid-bucketed radius join: space is tiled into `r × r` cells;
   * each LEFT point probes its cell's 3×3 neighborhood (every point
   * within r of it lies there by the triangle inequality), the join
   * is an EQUI-join on the cell id, and the exact
   * `dx² + dy² ≤ r²` predicate filters in the same stage.
   *
   * Replication: the RIGHT side materializes once per own cell (no
   * replication); the LEFT side explodes ×9 (its neighborhood) —
   * put the smaller/denser side left if asymmetric. Self-joins pass
   * the same frame twice; pairs include both orientations and the
   * self-pair (filter `leftId < rightId` downstream for unordered
   * pairs).
   *
   * Output: (leftId, rightId, d2) — the squared distance, exact.
   *
   * Scale posture: one cell-keyed equi-join; per-cell cost is local
   * density × 9, never the global point count. Degenerate density
   * (everything in one cell) degrades to that cell's quadratic — the
   * caller's unit/radius choice is the lever, same contract as the
   * 1-D binned range join.
   */
  def radiusJoin(left: DataFrame, right: DataFrame,
                 leftId: String, lx: String, ly: String,
                 rightId: String, rx: String, ry: String,
                 radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    require(leftId != rightId,
      "leftId and rightId must be distinct output names (alias upstream)")
    val r2 = radius * radius
    def cell(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(radius))) / lit(radius)).cast("long")
    val l = left
      .filter(col(lx).isNotNull && col(ly).isNotNull)
      .select(col(leftId).as("__lid"),
        col(lx).cast("long").as("__lx"), col(ly).cast("long").as("__ly"))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("__lid"), col("__lx"), col("__ly"),
        struct((cell(col("__lx")) + col("__dx")).as("cx"),
          (cell(col("__ly")) + col("__dy")).as("cy")).as("__cell"))
    val r = right
      .filter(col(rx).isNotNull && col(ry).isNotNull)
      .select(col(rightId).as("__rid"),
        col(rx).cast("long").as("__rx"), col(ry).cast("long").as("__ry"))
      .withColumn("__cell",
        struct(cell(col("__rx")).as("cx"), cell(col("__ry")).as("cy")))
    val d2 = (col("__lx") - col("__rx")) * (col("__lx") - col("__rx")) +
      (col("__ly") - col("__ry")) * (col("__ly") - col("__ry"))
    l.join(r, Seq("__cell"))
      .filter(d2 <= r2)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        d2.as("d2"))
  }
}
