package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("targetEncode: smoothed means shrink to the prior; null " +
    "category passes through null") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0),
      (null.asInstanceOf[String], 5.0)).toDF("cat", "y")
    val out = Encode.targetEncode(df, "cat", "y", smoothing = 3.0)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val prior = 14.0 / 3.0
    // a: (4 + 3·prior)/(2 + 3); b: (10 + 3·prior)/(1 + 3)
    assert(out((Some("a"), 1.0)).get == (4.0 + 3.0 * prior) / 5.0)
    assert(out((Some("b"), 10.0)).get == (10.0 + 3.0 * prior) / 4.0)
    assert(out((None, 5.0)).isEmpty)
    // smoothing 0 = raw category mean
    val raw = Encode.targetEncode(df, "cat", "y", smoothing = 0.0)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(raw((Some("a"), 3.0)).get == 2.0)
  }

  test("targetEncode leave-one-out: own label excluded; singleton " +
    "category null at m=0, prior at m>0") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("cat", "y")
    val loo0 = Encode.targetEncode(df, "cat", "y", smoothing = 0.0,
      leaveOneOut = true)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(loo0(("a", 1.0)).get == 3.0) // the OTHER a-row's label
    assert(loo0(("a", 3.0)).get == 1.0)
    assert(loo0(("b", 10.0)).isEmpty)  // n−1 = 0, no smoothing
    val loo3 = Encode.targetEncode(df, "cat", "y", smoothing = 3.0,
      leaveOneOut = true)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getDouble(2)).toMap
    val prior = 14.0 / 3.0
    assert(loo3(("b", 10.0)) == (0.0 + 3.0 * prior) / 3.0) // pure prior
    assert(Encode.targetEncode(df.limit(0), "cat", "y",
      leaveOneOut = true).count() == 0)
  }

  test("indexEncode: dense (freq DESC, value ASC) indexes; null null") {
    val df = Seq("a", "a", "a", "c", "b", null).map(Tuple1(_)).toDF("cat")
    val out = Encode.indexEncode(df, "cat")
      .collect().map(r => Option(r.getString(0)) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out(Some("a")) == Some(0L))
    assert(out(Some("b")) == Some(1L)) // tie with c: value asc
    assert(out(Some("c")) == Some(2L))
    assert(out(None).isEmpty)
  }

  test("kFoldAssign: stratified, balanced, deterministic") {
    val df = (1 to 10).map(i => (if (i <= 7) "x" else "y", i.toLong))
      .toDF("s", "id")
    val out = Encode.kFoldAssign(df, Seq("s"), "id", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // stratum x: ids 1..7 -> folds 0,1,2,0,1,2,0
    val x = out.filter(_._1 == "x").sortBy(_._2).map(_._3).toSeq
    assert(x == Seq(0, 1, 2, 0, 1, 2, 0))
    // stratum y: ids 8..10 -> 0,1,2
    assert(out.filter(_._1 == "y").sortBy(_._2).map(_._3).toSeq ==
      Seq(0, 1, 2))
    // WITHIN each stratum, fold sizes differ by at most 1
    for (st <- Seq("x", "y")) {
      val sizes = out.filter(_._1 == st)
        .groupBy(_._3).map(_._2.length)
      assert(sizes.max - sizes.min <= 1, s"stratum $st: $sizes")
    }
  }

  test("rankMeanNormalize: equal-size slices map to rank means; " +
    "ragged ranks average over slices that have them") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 5.0), ("a", 3L, 9.0),
      ("b", 4L, 2.0), ("b", 5L, 4.0), ("b", 6L, 6.0),
      ("c", 7L, 100.0) // ragged: only rank 1
    ).toDF("s", "id", "v")
    val out = Encode.rankMeanNormalize(df, "s", "v", "id")
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // rank1 ref = (1+2+100)/3; rank2 = (5+4)/2; rank3 = (9+6)/2
    assert(out(1L) == (1.0 + 2.0 + 100.0) / 3)
    assert(out(4L) == (1.0 + 2.0 + 100.0) / 3)
    assert(out(7L) == (1.0 + 2.0 + 100.0) / 3)
    assert(out(2L) == 4.5 && out(5L) == 4.5)
    assert(out(3L) == 7.5 && out(6L) == 7.5)
  }

  test("rankMeanNormalize: null slice/value rows pass through null " +
    "and never shift real ranks") {
    val df = Seq(
      (Some("a"), 1L, Some(-100.0)), // real rank 1
      (Some("a"), 2L, Some(3.0)),
      (None, 3L, Some(1.0)),
      (Some("a"), 4L, Option.empty[Double])
    ).toDF("s", "id", "v")
    val out = Encode.rankMeanNormalize(df, "s", "v", "id")
    val got = out.collect()
      .map(r => r.getLong(1) -> Option(r.get(3))).toMap
    assert(got(1L) == Some(-100.0) && got(2L) == Some(3.0))
    assert(got(3L).isEmpty && got(4L).isEmpty)
  }
}
