package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeStates: merged half-states equal the from-scratch state, " +
    "single-sided keys pass through, nulls excluded per measure") {
    val full = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(10.0)), ("c", Some(7.0))).toDF("k", "x")
    val ms = Seq(Incremental.Measure("x"))
    val s1 = Incremental.aggState(full.filter($"k" =!= "c"), Seq("k"), ms)
    val s2 = Incremental.aggState(full.filter($"k" === "c"), Seq("k"), ms)
    val merged = Incremental.finish(
      Incremental.mergeStates(s1, s2, Seq("k"), ms), Seq("k"), ms)
      .collect().map(r => r.getString(0) -> r).toMap
    val scratch = Incremental.finish(
      Incremental.aggState(full, Seq("k"), ms), Seq("k"), ms)
      .collect().map(r => r.getString(0) -> r).toMap
    for (k <- Seq("a", "b", "c"); f <- Seq("n", "sum_x", "min_x",
      "max_x", "avg_x")) {
      assert(merged(k).getAs[Any](f) == scratch(k).getAs[Any](f),
        s"$k.$f")
    }
    val a = merged("a")
    assert(a.getAs[Long]("n") == 3L)          // null row counted in n
    assert(a.getAs[Double]("sum_x") == 4.0)   // but not in the sum
    assert(a.getAs[Double]("avg_x") == 4.0 / 3.0)
    assert(a.getAs[Double]("min_x") == 1.0 && a.getAs[Double]("max_x") == 3.0)
  }
}
