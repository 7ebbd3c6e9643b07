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

  test("welchT: hand-derived t and dof; degenerate arms null out") {
    // arm a: 1,2,3 (mean 2, var 1); arm b: 2,4,6,8 (mean 5, var 20/3)
    val df = (Seq(1.0, 2.0, 3.0).map(("k", "a", _)) ++
      Seq(2.0, 4.0, 6.0, 8.0).map(("k", "b", _)) ++
      Seq(("solo", "a", 1.0), ("solo", "b", 2.0)))
      .toDF("key", "arm", "v")
    val out = Stats.welchT(df, Seq("key"), "arm", "a", "b", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getAs[Long]("n_a") == 3L && k.getAs[Long]("n_b") == 4L)
    assert(k.getAs[Double]("mean_a") == 2.0 && k.getAs[Double]("mean_b") == 5.0)
    val va = 1.0; val vb = 20.0 / 3.0
    val sea = va / 3.0; val seb = vb / 4.0
    val se2 = sea + seb
    assert(k.getAs[Double]("t") == (2.0 - 5.0) / math.sqrt(se2))
    assert(k.getAs[Double]("dof") ==
      se2 * se2 / (sea * sea / 2.0 + seb * seb / 3.0))
    // n < 2 per arm: t/dof null, means still emitted
    val solo = out("solo")
    assert(solo.isNullAt(solo.fieldIndex("t")) &&
      solo.isNullAt(solo.fieldIndex("dof")))
    assert(solo.getAs[Double]("mean_a") == 1.0)
  }
}
