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
}
