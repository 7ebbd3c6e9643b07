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

  test("rakeKeywords: phrase boundaries at stopwords, degree/freq scoring") {
    val df = Seq(
      (1L, "deep learning is the deep learning of machine learning"),
      (2L, "quantum computing and deep learning")).toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeywords(df, "doc_id", "text", topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // occurrences: "deep learning"×3, "machine learning", "quantum computing"
    // freq: deep 3, learning 5, machine 1, quantum 1, computing 1
    // deg:  deep 6, learning 10, machine 2, quantum 2, computing 2
    val sDeep = 6.0 / 3.0; val sLearn = 10.0 / 5.0
    assert(out("deep learning")._2 == 3L)
    assert(out("deep learning")._3 == sDeep + sLearn)
    assert(out("machine learning")._3 == 2.0 + sLearn)
    assert(out("quantum computing")._3 == 4.0)
    // "machine learning" (4.0) ties "quantum computing" (4.0) and both
    // beat "deep learning" (4.0)... all tie at 4.0 → phrase asc order
    val ranks = out.toSeq.sortBy(_._2._4).map(_._1)
    assert(ranks == Seq("deep learning", "machine learning", "quantum computing"))
  }

  test("rakeKeywords: overlong runs dropped, empty docs ignored") {
    val df = Seq((1L, "alpha beta gamma delta epsilon"), (2L, "  "),
      (3L, "zeta of eta")).toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeywords(df, "doc_id", "text",
      maxLen = 4, topK = 10).collect().map(_.getString(0)).toSet
    assert(out == Set("zeta", "eta")) // the 5-token run is dropped
  }

  test("zipfSlope: exact power law fits slope -1; flat counts slope 0") {
    // counts (6,3,2) at ranks (1,2,3): ln-count = ln6 - ln-rank
    // exactly, so the fit is slope -1 / corr -1 (up to the 1e-9 grid)
    val zipf = Seq(("z", ("a " * 6 + "b " * 3 + "c " * 2).trim))
      .toDF("src", "text")
    val flat = Seq(("f", "x y z w")).toDF("src", "text")
    val out = TextAnalysis.zipfSlope(zipf.union(flat), Seq("src"), "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val z = out("z")
    assert(z.getAs[Long]("n") == 3L)
    // 1e-5, not 1e-6: the closing reads moments snapped to the 1e-6
    // grid, so the fit carries that quantization
    assert(math.abs(z.getAs[Double]("slope") + 1.0) < 1e-5)
    assert(math.abs(z.getAs[Double]("corr") + 1.0) < 1e-5)
    assert(math.abs(z.getAs[Double]("intercept") - math.log(6.0)) < 1e-5)
    // all counts equal: y constant -> slope 0, corr null (zero y var)
    val f = out("f")
    assert(f.getAs[Double]("slope") == 0.0)
    assert(f.isNullAt(f.fieldIndex("corr")))
  }

  test("jensenShannonBySlice: hand-derived shared/exclusive split; " +
      "identical slices at 0") {
    val df = Seq(("s1", "a a b"), ("s2", "a c"), ("s3", "a a b"))
      .toDF("src", "text")
    val out = TextAnalysis.jensenShannonBySlice(df, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // s1/s2 share {a}: p=2/3, q=1/2, m=7/12;
    // JSD = term/2 + ln2/2 * (1/3 + 1/2), term rounded to 9
    val term = BigDecimal(
      2.0 / 3.0 * math.log((2.0 / 3.0) / (7.0 / 12.0)) +
        0.5 * math.log(0.5 / (7.0 / 12.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = term / 2.0 +
      0.6931471805599453 / 2.0 * (1.0 / 3.0 + 1.0 / 2.0)
    assert(out(("s1", "s2"))._1 == 1L)
    assert(out(("s1", "s2"))._2 == expected)
    // identical distributions: every term ln(1)=0, no exclusive mass
    assert(out(("s1", "s3"))._1 == 2L && out(("s1", "s3"))._2 == 0.0)
    // bounded by ln 2
    assert(out.values.forall(v => v._2 >= 0.0 &&
      v._2 <= 0.6931471805599453 + 1e-9))
  }

  test("tokenBurstiness: zero-inclusive dispersion, total-order rank") {
    val df = Seq((1L, "a a a a"), (2L, "b"), (3L, "a b"), (4L, ""))
      .toDF("id", "text")
    val out = TextAnalysis.tokenBurstiness(df, "id", "text", topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // a: counts (4,1) over N=4 docs -> mean 5/4, E[x^2] 17/4
    val meanA = 5.0 / 4.0; val e2A = 17.0 / 4.0
    assert(out("a") == ((2L, 5L, (e2A - meanA * meanA) / meanA, 1L)))
    // b: counts (1,1) -> mean .5, E[x^2] .5 -> dispersion .5 (sub-
    // Poisson: evenly scattered)
    val meanB = 2.0 / 4.0; val e2B = 2.0 / 4.0
    assert(out("b") == ((2L, 2L, (e2B - meanB * meanB) / meanB, 2L)))
    // the bursty token disperses higher than the scattered one
    assert(out("a")._3 > out("b")._3)
  }
  test("scriptProfile: hand counts per ASCII class; empty text zeros") {
    val df = Seq((1L, "Ab1 .x"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("len") == 6L)
    assert(r1.getAs[Long]("n_alpha") == 3L &&
      r1.getAs[Long]("n_digit") == 1L && r1.getAs[Long]("n_space") == 1L &&
      r1.getAs[Long]("n_punct") == 1L && r1.getAs[Long]("n_other") == 0L)
    assert(r1.getAs[Double]("frac_alpha") == 3.0 / 6.0)
    // empty and null text: zero counts, null fractions
    for (id <- Seq(2L, 3L)) {
      assert(out(id).getAs[Long]("len") == 0L)
      assert(out(id).isNullAt(out(id).fieldIndex("frac_alpha")))
    }
    // non-ASCII lands in n_other
    val acc = TextAnalysis.scriptProfile(
      Seq((9L, "caf\u00e9")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(acc.getAs[Long]("n_alpha") == 3L &&
      acc.getAs[Long]("n_other") == 1L)
  }

  test("heapsLaw: cumulative curve OLS matches a scala replay; " +
    "degenerate single point null") {
    val df = Seq((1L, "s", "a b"), (2L, "s", "b c"), (3L, "s", "c d a"),
      (9L, "tiny", "q q")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.heapsLaw(df, Seq("source"), "doc_id", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val s = out("s")
    // curve: (N,V) = (2,2), (4,3), (7,4)
    assert(s.getAs[Long]("n_points") == 3L)
    def snap9(d: Double) = BigDecimal(d).setScale(9,
      BigDecimal.RoundingMode.HALF_UP)
    val xs = Seq(2.0, 4.0, 7.0).map(n => snap9(math.log(n)))
    val ys = Seq(2.0, 3.0, 4.0).map(n => snap9(math.log(n)))
    def t6(b: BigDecimal) = (b - (b % BigDecimal("0.000001"))).toDouble
    val n = 3.0
    val sx = t6(xs.sum); val sy = t6(ys.sum)
    val sxy = t6(xs.zip(ys).map { case (a, b) => a * b }.sum)
    val sxx = t6(xs.map(a => a * a).sum)
    val cov = n * sxy - sx * sy; val vx = n * sxx - sx * sx
    assert(math.abs(s.getAs[Double]("beta") - cov / vx) < 1e-12)
    assert(s.getAs[Double]("corr") > 0.99)
    // one checkpoint: zero x-variance, null fit
    val tiny = out("tiny")
    assert(tiny.getAs[Long]("n_points") == 1L &&
      tiny.isNullAt(tiny.fieldIndex("beta")))
    assert(TextAnalysis.heapsLaw(df.limit(0), Seq("source"), "doc_id",
      "text").count() == 0)
  }
  test("hashingTrick: deterministic buckets, counts sum to tokens, " +
    "dim bound, empty doc none") {
    val df = Seq((1L, "a b a"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hashingTrick(df, "doc_id", "text", dim = 8)
      .collect()
    assert(out.forall(_.getLong(0) == 1L))
    assert(out.map(_.getAs[Long]("cnt")).sum == 3L)
    assert(out.forall(r => r.getAs[Long]("bucket") >= 0 &&
      r.getAs[Long]("bucket") < 8))
    // same token -> same bucket: "a" appears once with cnt 2
    assert(out.count(_.getAs[Long]("cnt") == 2L) == 1)
    // deterministic across runs
    val again = TextAnalysis.hashingTrick(df, "doc_id", "text", dim = 8)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bucket"),
        r.getAs[Long]("cnt"))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getAs[Long]("bucket"),
      r.getAs[Long]("cnt"))).toSet)
    intercept[IllegalArgumentException] {
      TextAnalysis.hashingTrick(df, "doc_id", "text", dim = 1)
    }
  }
  test("logTemplates: hex masked before digits, counts and min example") {
    val df = Seq(
      (3L, "GET /api/user/123 took 45ms"),
      (1L, "GET /api/user/999 took 7ms"),
      (2L, "session deadbeefcafe1234 expired"),
      (4L, "session 0123456789abcdef expired"),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "msg")
    val out = TextAnalysis.logTemplates(df, "id", "msg")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_messages"), r.getAs[Long]("example_id"))).toMap
    assert(out("GET /api/user/<N> took <N>ms") == ((2L, 1L)))
    // 8+ hex chars mask as ONE <H>, not a shredded digit run
    assert(out("session <H> expired") == ((2L, 2L)))
    assert(out.size == 2)
  }
}
