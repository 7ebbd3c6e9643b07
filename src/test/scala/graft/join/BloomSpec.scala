package graft.join

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.mkString("|"))

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("bloom semi join equals plain semi join") {
    val seen = docs.filter($"doc_id" % 3 === 0).select("text")
    val got = Bloom.semiJoin(docs, seen, Seq("text"), expectedItems = 1000)
    val want = docs.join(seen, Seq("text"), "left_semi")
      .select(docs.columns.map(col).toIndexedSeq: _*)
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() > 0)
  }

  test("bloom anti join equals plain anti join") {
    val seen = docs.filter($"doc_id" % 3 === 0).select("text")
    val got = Bloom.antiJoin(docs, seen, Seq("text"), expectedItems = 1000)
    val want = docs.join(seen, Seq("text"), "left_anti")
      .select(docs.columns.map(col).toIndexedSeq: _*)
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() > 0 && got.count() < docs.count())
  }

  test("null keys follow SQL equi-join semantics (anti keeps, semi drops)") {
    val l = Seq((1L, Some("a")), (2L, None), (3L, Some("c"))).toDF("id", "k")
    val r = Seq(Some("a"), None).toDF("k")
    val anti = Bloom.antiJoin(l, r, Seq("k"), expectedItems = 10)
    assert(sortedRows(anti) ==
      sortedRows(l.join(r, Seq("k"), "left_anti")
        .select(l.columns.map(col).toIndexedSeq: _*)))
    assert(anti.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val semi = Bloom.semiJoin(l, r, Seq("k"), expectedItems = 10)
    assert(semi.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("multi-column keys") {
    val l = Seq((1L, "a", 1), (2L, "a", 2), (3L, "b", 1)).toDF("id", "k1", "k2")
    val r = Seq(("a", 1), ("b", 2)).toDF("k1", "k2")
    val got = Bloom.semiJoin(l, r, Seq("k1", "k2"), expectedItems = 10)
    assert(got.select("id").as[Long].collect().toSeq == Seq(1L))
    val anti = Bloom.antiJoin(l, r, Seq("k1", "k2"), expectedItems = 10)
    assert(anti.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("empty build side: semi empty, anti keeps all") {
    val l = Seq((1L, "a")).toDF("id", "k")
    val empty = Seq.empty[(Long, String)].toDF("id", "k").select("k")
    assert(Bloom.semiJoin(l, empty, Seq("k"), expectedItems = 10).count() == 0)
    assert(Bloom.antiJoin(l, empty, Seq("k"), expectedItems = 10).count() == 1)
  }

  test("prefilter actually prunes: misses never reach the residual join") {
    // keys disjoint from the build side must fail might_contain
    val bytes = Bloom.buildFilter(
      (0L until 1000L).toDF("k"), Seq("k"), expectedItems = 1000, fpp = 0.001).get
    val probeMisses = (100000L until 101000L).toDF("k")
      .filter(Bloom.mightContain(bytes, Seq("k"))).count()
    // fpp 0.001 over 1000 probes: expect ~1; tolerate a generous margin
    assert(probeMisses <= 20, s"false-positive count $probeMisses")
    val probeHits = (0L until 1000L).toDF("k")
      .filter(Bloom.mightContain(bytes, Seq("k"))).count()
    assert(probeHits == 1000, "no false negatives allowed")
  }
}
