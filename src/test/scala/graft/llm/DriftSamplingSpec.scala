package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DriftSamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("centroidDrift: identical segments cosine 1, opposite segments -1") {
    val df = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(1.0f, 0.0f)),
      ("b", Seq(1.0f, 0.0f)),
      ("c", Seq(-1.0f, 0.0f))
    ).toDF("g", "v")
    val out = Similarity.centroidDrift(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("a", "b"))._3 == 1.0)
    assert(out(("a", "b"))._1 == 2L && out(("a", "b"))._2 == 1L)
    assert(out(("a", "c"))._3 == -1.0)
    assert(out(("b", "c"))._3 == -1.0)
  }

  test("centroidDrift: orthogonal centroids, zero-norm segment -> null") {
    val df = Seq(
      ("x", Seq(1.0f, 0.0f)), ("y", Seq(0.0f, 2.0f)),
      ("z", Seq(0.0f, 0.0f))
    ).toDF("g", "v")
    val out = Similarity.centroidDrift(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(("x", "y")).contains(0.0))
    assert(out(("x", "z")).isEmpty)
  }

  test("negativeSamples: k per anchor, never self, in range, deterministic") {
    val df = spark.range(0, 50).toDF("id")
    val out = Sampling.negativeSamples(df, "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 150)
    assert(out.forall { case (a, _, n) => n != a && n >= 0 && n < 50 })
    // partitioning-independent
    val out2 = Sampling.negativeSamples(df.repartition(7), "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet == out2.toSet)
  }
}
