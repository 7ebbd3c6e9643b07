package graft.agg

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GroupBySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    ("a", 1L, Option(10.0)), ("a", 2L, Option(20.0)),
    ("b", 3L, None)).toDF("k", "n", "v")

  test("builder composes count/sum/avg/min/max and custom aggs") {
    val out = GroupBy("k").count("cnt").sum("n", "sn")
      .avg("v", "av").min("n", "mn").max("n", "mx")
      .agg(count_distinct(col("n")).as("nd"))
      .sorted.apply(df)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(out("a") == Seq(2L, 3L, 15.0, 1L, 2L, 2L))
    // avg over all-null group is null, like the reference (groupby.go:315-317)
    assert(out("b") == Seq(1L, 3L, null, 3L, 3L, 1L))
  }

  test("global aggregate yields exactly one row; empty aggs rejected") {
    val r = GroupBy.global(count(lit(1)).as("n"), sum(col("n")).as("s"))(df).collect()
    assert(r.length == 1 && r(0).getLong(0) == 3L && r(0).getLong(1) == 6L)
    intercept[IllegalArgumentException](GroupBy.global())
    intercept[IllegalArgumentException](GroupBy("k").apply(df))
  }
}
