package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantileNormalize: sources align to the pooled distribution; " +
      "ties map equal; nulls pass through") {
    val df = Seq(
      ("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 10.0), ("B", 20.0), ("B", 30.0)).toDF("src", "v")
    val out = Normalize.quantileNormalize(df, "src", "v")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1),
        r.getDecimal(2).doubleValue()))
    // midpoint-rank ceil convention: both 3-row sources hit pooled
    // ranks 2/4/6 -> values 2, 10, 30 — the SAME multiset for both
    val a = out.filter(_._1 == "A").map(_._3).sorted.toSeq
    val b = out.filter(_._1 == "B").map(_._3).sorted.toSeq
    assert(a == b && a == Seq(2.0, 10.0, 30.0))
    // equal inputs map equal (midpoint convention, no row tie-break)
    val tied = Seq(("A", 5.0), ("A", 5.0), ("A", 9.0), ("B", 7.0))
      .toDF("src", "v")
    val t = Normalize.quantileNormalize(tied, "src", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        r.getDecimal(2).doubleValue()))
    val fives = t.filter(r => r._1 == "A" && r._2 == 5.0).map(_._3)
    assert(fives.length == 2 && fives.distinct.length == 1)
    // null source / value -> null normalized, row retained
    val nn = Seq((Some("A"), Some(1.0)), (None, Some(2.0)),
      (Some("B"), None)).toDF("src", "v")
    val r = Normalize.quantileNormalize(nn, "src", "v").collect()
    assert(r.length == 3 && r.count(_.isNullAt(2)) == 2)
  }

  test("quantileNormalize: skewed source follows the pooled shape") {
    // A clusters low, B high; after normalization the per-source
    // multisets draw from the pooled values and A != its input
    val df = ((1 to 8).map(i => ("A", i.toDouble)) ++
      (1 to 8).map(i => ("B", 100.0 + i))).toDF("src", "v")
    val out = Normalize.quantileNormalize(df, "src", "v").collect()
      .map(r => (r.getString(0), r.getDecimal(2).doubleValue()))
    val a = out.filter(_._1 == "A").map(_._2).sorted.toSeq
    val b = out.filter(_._1 == "B").map(_._2).sorted.toSeq
    assert(a == b) // identical target distribution
    assert(a.exists(_ > 100.0)) // A's upper half pulled into B's range
  }
}
