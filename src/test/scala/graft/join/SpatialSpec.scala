package graft.join

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SpatialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gridClusters: 8-adjacent dense cells merge, isolated dense " +
    "cell labels itself, sparse points are noise") {
    val pts = Seq(
      (1L, 1L, 1L), (2L, 2L, 3L),        // cell (0,0): dense
      (3L, 11L, 12L), (4L, 13L, 14L),    // cell (1,1): dense, diagonal
      (5L, 55L, 55L), (6L, 57L, 51L),    // cell (5,5): dense, isolated
      (7L, 99L, 99L)                     // cell (9,9): sparse -> noise
    ).toDF("id", "x", "y")
    val out = Spatial.gridClusters(pts, "id", "x", "y",
      cellSize = 10L, minPts = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap
    assert(out(1L) == ((0L, 0L, Some("0:0"))))
    assert(out(4L) == ((1L, 1L, Some("0:0")))) // merged diagonally
    assert(out(5L)._3.contains("5:5") && out(6L)._3.contains("5:5"))
    assert(out(7L) == ((9L, 9L, None))) // noise
  }

  test("radiusJoin: exact d² predicate, cross-cell neighbors found, " +
    "negative coordinates, brute-force agreement") {
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L),     // d=5 exactly
      (3L, 10L, 0L), (4L, -4L, -3L),              // negatives, d(1,4)=5
      (5L, 100L, 100L)).toDF("id", "x", "y")
    val out = Spatial.radiusJoin(
      pts.toDF("a_id", "x", "y"), pts.toDF("b_id", "x", "y"),
      "a_id", "x", "y", "b_id", "x", "y", radius = 5L)
      .filter($"a_id" < $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // brute force over the same points
    val raw = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 10L, 0L),
      (4L, -4L, -3L), (5L, 100L, 100L))
    val want = (for {
      (i, xi, yi) <- raw; (j, xj, yj) <- raw if i < j
      d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) if d2 <= 25
    } yield (i, j) -> d2).toMap
    assert(out == want)
    assert(out((1L, 2L)) == 25L) // boundary inclusive
    assert(out.contains((1L, 4L)))
    intercept[IllegalArgumentException] {
      Spatial.radiusJoin(pts, pts, "id", "x", "y", "id", "x", "y", 5L)
    }
  }
}
