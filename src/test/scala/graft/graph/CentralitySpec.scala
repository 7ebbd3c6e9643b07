package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CentralitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fixed-point pageRank: hand-computed sweeps on a 3-node cycle+chord") {
    // 1→2, 1→3, 2→3, 3→1; outdeg 1:2, 2:1, 3:1; r0 = 1e6 each
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    def ranksAfter(it: Int): Map[Long, Long] =
      Centrality.pageRank(edges, "src", "dst", iterations = it)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sweep 1: in(1)=r(3)=1e6 → 150000+850000; in(2)=r(1)/2=500000 →
    // 150000+425000; in(3)=500000+1e6 → 150000+1275000
    assert(ranksAfter(1) == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    // sweep 2: in(1)=1425000 → 150000+1211250; in(2)=1000000/2 →
    // 575000; in(3)=500000+575000 → 150000+913750
    assert(ranksAfter(2) == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("hits: hand-computed auth-then-hub sweeps with max " +
    "normalization on a 4-node funnel") {
    // 1→3, 2→3, 3→4: 1 and 2 are pure hubs, 3 is the authority that
    // also hubs into 4
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    def after(it: Int): Map[Long, (Long, Long)] =
      Centrality.hits(edges, "src", "dst", iterations = it)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    // sweep 1: auth raw (3: 2e6, 4: 1e6) → a3 1e6, a4 5e5;
    // hub raw (1: 1e6, 2: 1e6, 3: 5e5) → h1 h2 1e6, h3 5e5
    assert(after(1) == Map(
      1L -> ((1000000L, 0L)), 2L -> ((1000000L, 0L)),
      3L -> ((500000L, 1000000L)), 4L -> ((0L, 500000L))))
    // sweep 2: auth raw (3: 2e6, 4: 5e5) → a3 1e6, a4 25e4;
    // hub raw (1: 1e6, 2: 1e6, 3: 25e4) → h3 250000
    assert(after(2) == Map(
      1L -> ((1000000L, 0L)), 2L -> ((1000000L, 0L)),
      3L -> ((250000L, 1000000L)), 4L -> ((0L, 250000L))))
  }

  test("dangling and isolated nodes: leak documented, floor applied") {
    // 2 is a sink (dangling): its mass leaks; it still RECEIVES rank
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = Centrality.pageRank(edges, "src", "dst", iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 150000L)               // no in-edges: teleport base only
    assert(r(2L) == 150000L + 850000L)     // full rank of 1 flowed in
    // centralityPrior: ranked keys carry their rank, unseen keys earn
    // the isolated-node floor
    val docs = Seq((10L, 2L), (11L, 99L)).toDF("doc_id", "host")
    val out = Centrality.centralityPrior(docs, "host",
      Centrality.pageRank(edges, "src", "dst", 1))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(out(10L) == 1000000L)
    assert(out(11L) == 150000L)
  }
}
