package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pmiCollocations / tokenEntropy / charLmScore on hand-computable corpora. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pmiCollocations: probability-ratio PMI with deterministic ranks") {
    val df = Seq("x y", "x y", "x z").toDF("text")
    val out = TextAnalysis.pmiCollocations(df, "text", minCount = 1L, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    // unigrams x:3 y:2 z:1 (N=6); bigrams (x,y):2 (x,z):1 (N=3)
    // pmi(x,y) = ln((2/3)/((3/6)(2/6))) = ln 4; pmi(x,z) = ln((1/3)/((3/6)(1/6))) = ln 4
    // equal scores → tie broken (w1, w2): (x,y) then (x,z)
    val ln4 = BigDecimal(math.log(4.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(("x", "y", 2L, ln4, 1L), ("x", "z", 1L, ln4, 2L)))
  }

  test("pmiCollocations: minCount prunes, single-token docs emit nothing") {
    val df = Seq("x y", "x y", "x z", "solo").toDF("text")
    val out = TextAnalysis.pmiCollocations(df, "text", minCount = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("x", "y")))
  }

  test("tokenEntropy: entropy + TTR per doc; empty docs emit no row") {
    val df = Seq((1L, "a a b"), (2L, "w"), (3L, "  ")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(1L, 2L))
    val (n, ty, ttr, h) = out(1L)
    assert(n == 3L && ty == 2L)
    assert(math.abs(ttr - 2.0 / 3.0) < 1e-15)
    val expected = -(2.0 / 3.0 * math.log(2.0 / 3.0) +
      1.0 / 3.0 * math.log(1.0 / 3.0))
    assert(math.abs(h - expected) < 1e-12)
    assert(out(2L) == ((1L, 1L, 1.0, 0.0))) // single token: zero entropy
  }

  test("charLmScore: self-trained add-one trigram NLL") {
    // corpus {"aaaa", "aab"}: trigrams aaa×2, aab×1; ctx "aa"→3; V={a,b}=2
    val df = Seq((1L, "aaaa"), (2L, "aab"), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.charLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L)) // doc 3 shorter than a trigram
    val pAaa = 3.0 / 5.0 // (2+1)/(3+2)
    val pAab = 2.0 / 5.0
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._2 - -math.log(pAaa)) < 1e-12)
    assert(out(2L)._1 == 1L)
    assert(math.abs(out(2L)._2 - -math.log(pAab)) < 1e-12)
    // fluent text (repeated trigram) scores LOWER than the rare one
    assert(out(1L)._2 < out(2L)._2)
  }
}
