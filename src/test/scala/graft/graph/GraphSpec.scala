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

  test("clusteringCoefficient: triangle + pendant; K4 all 1.0; " +
      "degree-1 null") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("u", "v")
    val out = Graph.clusteringCoefficient(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((2L, 1L, Some(1.0))))
    assert(out(2L) == ((2L, 1L, Some(1.0))))
    assert(out(3L) == ((3L, 1L, Some(2.0 * 1.0 / (3.0 * 2.0)))))
    assert(out(4L) == ((1L, 0L, None))) // pendant: undefined
    val k4 = (for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j))
      .toDF("u", "v")
    val cc4 = Graph.clusteringCoefficient(k4)
      .collect().map(r => r.getAs[Double]("clustering_coeff"))
    assert(cc4.length == 4 && cc4.forall(_ == 1.0))
    // empty graph
    assert(Graph.clusteringCoefficient(
      Seq.empty[(Long, Long)].toDF("u", "v")).count() == 0)
  }

  test("linkPredictionRA: hand-derived scores, known edges excluded, hub cap") {
    // path graph 1-2-3 plus 1-4, 3-4: common neighbors of (1,3): {2, 4}
    // deg: 1->2, 2->2, 3->2, 4->2; all degs 2 -> contrib 5e11 each
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L)).toDF("u", "v")
    val out = Graph.linkPredictionRA(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // (1,3) via 2 and 4; (2,4) via 1 and 3; no others (adjacent pairs drop)
    assert(out.keySet == Set(1L -> 3L, 2L -> 4L))
    assert(out(1L -> 3L) == ((2L, 1000000000000L)))
    assert(out(2L -> 4L) == ((2L, 1000000000000L)))
    // cap below 2 removes every hub -> empty
    assert(Graph.linkPredictionRA(edges, maxDegree = 2).collect().nonEmpty)
  }
  test("kCore: cascade peel (removing a leaf drops its neighbor), " +
    "unique core, empty when none exists") {
    // triangle {1,2,3} + tail 3-4-5: the 2-core is exactly the
    // triangle — peeling 5 (deg 1) drops 4 to deg 1, which drops too
    val edges = Seq((1, 2), (2, 3), (1, 3), (3, 4), (4, 5))
      .toDF("u", "v")
    val core = Graph.kCore(edges, k = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(core == Map(1 -> 2L, 2 -> 2L, 3 -> 2L))
    // no 3-core anywhere: empty result, not an error
    assert(Graph.kCore(edges, k = 3).count() == 0)
    // k=1 keeps everything (after self-loop/dup normalization)
    assert(Graph.kCore(edges, k = 1).count() == 5)
    // duplicate + self-loop edges normalize away
    val messy = Seq((1, 2), (2, 1), (1, 1), (2, 3), (1, 3)).toDF("u", "v")
    assert(Graph.kCore(messy, k = 2).count() == 3)
    assert(Graph.kCore(edges.limit(0), k = 2).count() == 0)
  }

  test("bfsHops: min hop distance from seeds, hop cap, undirected, " +
    "off-graph seeds, early exit on empty frontier") {
    // path 1-2-3-4-5 + shortcut 1-4: distances from {1} are
    // 1:0, 2:1, 4:1, 3:2, 5:2 (the shortcut beats the long path)
    val edges = Seq((1, 2), (2, 3), (3, 4), (4, 5), (1, 4)).toDF("u", "v")
    val seeds1 = Seq(1).toDF("vertex")
    val out = Graph.bfsHops(edges, seeds1, maxHops = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 0L, 2 -> 1L, 4 -> 1L, 3 -> 2L, 5 -> 2L))
    // hop cap: maxHops = 1 keeps only the seeds' direct neighbors
    val capped = Graph.bfsHops(edges, seeds1, maxHops = 1)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(capped == Map(1 -> 0L, 2 -> 1L, 4 -> 1L))
    // a seed absent from the edge set still reports at hop 0 and the
    // disconnected component stays unreached (early frontier exit)
    val far = Graph.bfsHops(Seq((1, 2), (8, 9)).toDF("u", "v"),
      Seq(1, 99).toDF("vertex"), maxHops = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(far == Map(1 -> 0L, 99 -> 0L, 2 -> 1L))
    // multi-source: min over seeds, not per-seed rows
    val multi = Graph.bfsHops(edges, Seq(1, 5).toDF("vertex"), maxHops = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(multi == Map(1 -> 0L, 5 -> 0L, 2 -> 1L, 4 -> 1L, 3 -> 2L))
  }

  test("assortativity: star is exactly -1, regular graph has zero " +
    "degree variance -> null") {
    // star: hub degree 3, leaves 1 -> perfectly disassortative.
    // n=6 orientations, Sx=12, 2*Sp=18, Sxx=30:
    // r = (6*18-144)/(6*30-144) = -36/36 = -1 exactly
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val rs = Graph.assortativity(star).collect().head
    assert(rs.getLong(0) == 4L && rs.getLong(1) == 3L)
    assert(rs.getDouble(2) == -1.0)
    // triangle: every degree 2 -> denominator 0 -> null
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val rt = Graph.assortativity(tri).collect().head
    assert(rt.getLong(0) == 3L && rt.getLong(1) == 3L && rt.isNullAt(2))
  }

  test("modularity: two bridged triangles — hand Q per community; " +
    "unassigned nodes still count in m") {
    // triangles {1,2,3} and {4,5,6} bridged by 3-4: m = 7,
    // m_A = m_B = 3, D_A = D_B = 7 -> Q_c = 3/7 - (7/14)^2 each
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("u", "v")
    val asg = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("node", "community")
    val out = Graph.modularity(edges, asg)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))))
      .toMap
    val qc = 3.0 / 7.0 - 0.5 * 0.5
    // cut = 7 - 2*3 = 1 (the bridge); conductance = 1/min(7, 14-7)
    assert(out("A") == ((3L, 3L, 7L, 1L, qc, 1.0 / 7.0)))
    assert(out("B") == ((3L, 3L, 7L, 1L, qc, 1.0 / 7.0)))
    // drop node 6 from the assignment: B keeps only edge 4-5
    // internal, degrees 3 + 2; m is still 7 (the graph's, not the
    // partition's)
    val partial = Graph.modularity(edges, asg.filter($"node" =!= 6L))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(partial("B") == ((2L, 1L, 5L)))
    assert(partial("A") == ((3L, 3L, 7L)))
  }
}
