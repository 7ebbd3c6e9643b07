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

  test("classSeparation: hand Fisher ratio on a separated dim; " +
    "constant dim emits null and ranks last") {
    // dim 0 separates classes (means 0.1 vs 1.1, within 0.04);
    // dim 1 is constant (zero within-scatter -> null)
    val df = Seq(
      (0, Seq(0.0f, 1.0f)), (0, Seq(0.2f, 1.0f)),
      (1, Seq(1.0f, 1.0f)), (1, Seq(1.2f, 1.0f))
    ).toDF("label", "v")
    val out = Similarity.classSeparation(df, "v", "label")
      .collect().map(r => r.getInt(0) -> r).toMap
    val d0 = out(0)
    assert(d0.getLong(1) == 4L)
    // between = 2·(0.5)²·2 = 1.0, within = 0.04 -> fisher 25
    assert(math.abs(d0.getDouble(2) - 25.0) < 1e-9)
    assert(d0.getInt(3) == 1)
    val d1 = out(1)
    assert(d1.isNullAt(2) && d1.getInt(3) == 2)
  }

  test("classSeparation: null labels/vectors dropped; a single class " +
    "has zero between-scatter") {
    val df = Seq(
      (Some(0), Some(Seq(1.0f, 2.0f))), (Some(0), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(9.0f, 9.0f))), (Some(0), None)
    ).toDF("label", "v")
    val out = Similarity.classSeparation(df, "v", "label").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.values.forall(_.getLong(1) == 2L)) // only 2 live rows
    // one class: Σ s_c²/n_c == (Σs)²/n exactly -> fisher 0
    assert(out(0).getDouble(2) == 0.0 && out(1).getDouble(2) == 0.0)
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
