package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("observed: counters ride the action and equal a direct agg") {
    val df = Seq(Some(1.5), Some(2.5), None).toDF("v")
    val out = Observe.observed(spark, df, Observe.counters("v"))(
      _.write.format("noop").mode("overwrite").save())
      .collect().head
    assert(out.getAs[Long]("n_rows") == 3L)
    assert(out.getAs[Long]("n_null") == 1L)
    assert(out.getAs[java.math.BigDecimal]("sum_value")
      .compareTo(new java.math.BigDecimal("4.00")) == 0)
  }

  test("observed: custom metric expressions work; empty metrics rejected") {
    val df = Seq(1L, 5L, 9L).toDF("x")
    val out = Observe.observed(spark, df,
      Seq(max(col("x")).as("mx"), min(col("x")).as("mn")))(
      _.write.format("noop").mode("overwrite").save())
      .collect().head
    assert(out.getAs[Long]("mx") == 9L && out.getAs[Long]("mn") == 1L)
    intercept[IllegalArgumentException] {
      Observe.observed(spark, df, Nil)(_ => ())
    }
  }
}
