package graft.agg

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AggregatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weightedMean computes exact sum(v*w)/sum(w) per group") {
    val df = Seq(
      ("a", 10.0, 1.0), ("a", 20.0, 3.0),   // (10 + 60) / 4 = 17.5
      ("b", 5.0, 2.0))                      // 10 / 2 = 5
      .toDF("k", "v", "w")
    val out = df.groupBy("k")
      .agg(Aggregators.weightedMean(col("v"), col("w")).as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 17.5, "b" -> 5.0))
  }

  test("weightedMean is partition-order independent (exact decimal buffer)") {
    val data = (1 to 1000).map(i => ("g", i * 0.01, (i % 7 + 1) * 0.5))
    val one = data.toDF("k", "v", "w").coalesce(1)
    val many = data.reverse.toDF("k", "v", "w").repartition(13)
    def wm(df: org.apache.spark.sql.DataFrame) = df.groupBy("k")
      .agg(Aggregators.weightedMean(col("v"), col("w"))).collect()(0).getDouble(1)
    assert(wm(one) == wm(many)) // bit-exact, not approx
  }

  test("weightedMean of zero weight is NaN") {
    val out = Seq(("a", 1.0, 0.0)).toDF("k", "v", "w")
      .groupBy("k").agg(Aggregators.weightedMean(col("v"), col("w")))
      .collect()(0).getDouble(1)
    assert(out.isNaN)
  }

  test("weightedMeanExpr is bit-equal to the udaf (and NaN on zero weight)") {
    val data = (1 to 500).map(i => (s"g${i % 3}", i * 0.731, (i % 11) * 0.25))
    val df = data.toDF("k", "v", "w").repartition(7)
    val both = df.groupBy("k").agg(
      Aggregators.weightedMean(col("v"), col("w")).as("udaf"),
      Aggregators.weightedMeanExpr(col("v"), col("w")).as("expr"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"mismatch for ${r.getString(0)}")
    }
    val z = Seq(("a", 1.0, 0.0)).toDF("k", "v", "w")
      .groupBy("k").agg(Aggregators.weightedMeanExpr(col("v"), col("w")))
      .collect()(0).getDouble(1)
    assert(z.isNaN)
  }

  test("weightedMean plugs into the GroupBy builder as a custom agg") {
    val df = Seq(("a", 2.0, 1.0), ("a", 4.0, 1.0)).toDF("k", "v", "w")
    val out = GroupBy("k")
      .agg(Aggregators.weightedMean(col("v"), col("w")).as("wm"))
      .count("n").apply(df).collect()(0)
    assert(out.getDouble(1) == 3.0 && out.getLong(2) == 2L)
  }
}
