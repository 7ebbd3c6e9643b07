package graft.agg

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pearsonMatrix: perfect positive / negative / zero-variance null") {
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0))
      .toDF("a", "b", "c")
    val out = Stats.pearsonMatrix(df, Seq(("a", 2), ("b", 2), ("c", 2)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // sqrt rounding can land a perfect correlation 1 ulp past 1.0
    assert(math.abs(out(("a", "b")).get - 1.0) < 1e-12)
    assert(out(("a", "c")).isEmpty) // c has zero variance
    assert(out(("b", "c")).isEmpty)
  }

  test("pearsonMatrix: hand-checked value and listwise deletion") {
    val df = Seq((Some(1.0), Some(1.0)), (Some(2.0), Some(3.0)),
      (Some(3.0), Some(2.0)), (None, Some(9.0))).toDF("x", "y")
    val r = Stats.pearsonMatrix(df, Seq(("x", 2), ("y", 2))).collect()(0)
    assert(r.getLong(2) == 3L) // null row excluded
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-15) // cov=1, sd=1·2 → 0.5
  }

  test("linearFit: exact line recovered per group; zero-x-variance null") {
    val df = (1 to 5).map(i => ("up", i.toLong, 2.0 * i + 1.0)) ++
      Seq(("flat", 7L, 1.0), ("flat", 7L, 9.0))
    val out = df.toDF("g", "x", "y")
    val rows = Stats.linearFit(out, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val up = rows("up")
    assert(up.getLong(1) == 5L)
    assert(up.getDouble(2) == 2.0 && up.getDouble(3) == 1.0)
    assert(math.abs(up.getDouble(4) - 1.0) < 1e-15)
    val flat = rows("flat")
    assert(flat.isNullAt(2) && flat.isNullAt(3) && flat.isNullAt(4))
  }
}
