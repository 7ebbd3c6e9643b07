package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coOccurrenceEdges: canonical pairs with co-occurrence weights") {
    val df = Seq(("g1", "a"), ("g1", "b"), ("g1", "c"),
      ("g2", "a"), ("g2", "b"), ("g2", "b")) // dup item collapses
      .toDF("g", "item")
    val e = Graph.coOccurrenceEdges(df, "g", "item", maxPerGroup = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(e == Set(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("coOccurrenceEdges: oversized groups are dropped by the skew cap") {
    val df = (Seq("a", "b", "c", "d").map(("big", _)) ++
      Seq("x", "y").map(("ok", _))).toDF("g", "item")
    val e = Graph.coOccurrenceEdges(df, "g", "item", maxPerGroup = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(e == Set(("x", "y")))
  }

  test("triangleCounts: one triangle plus a dangling edge") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("u", "v")
    val out = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // vertex 4: none
  }

  test("triangleCounts: K4 has 4 triangles, 3 per vertex; dup/reversed edges collapse") {
    val base = for {
      i <- 1L to 4L; j <- 1L to 4L if i != j
    } yield (i, j) // both orientations + no self loops
    val edges = (base ++ Seq((1L, 1L), (2L, 1L))).toDF("u", "v")
    val out = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle-free bipartite graph is empty") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("u", "v")
    assert(Graph.triangleCounts(edges).collect().isEmpty)
  }
}
