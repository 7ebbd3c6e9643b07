package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registered SQL functions work from spark.sql") {
    Functions.register(spark)
    Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0)).toDF("k", "v", "w")
      .createOrReplaceTempView("fn_test")
    val r = spark.sql(
      "SELECT graft_weighted_mean(v, w) AS wm FROM fn_test GROUP BY k")
      .collect()(0).getDouble(0)
    assert(r == 17.5)
  }

  test("Tables.registerAll exposes the star schema to SQL") {
    graft.core.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l JOIN orders o
        |ON l.l_orderkey = o.o_orderkey""".stripMargin).collect()(0).getLong(0)
    assert(n > 0)
  }
}
