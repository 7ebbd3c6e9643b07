package graft.agg

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sketch rollup: merged estimate within tolerance of exact; rollup never rescans") {
    // 3 groups × overlapping member sets; distinct across groups = 2000
    val df = (0 until 3).flatMap(g =>
      (g * 500 until g * 500 + 1000).map(v => (g, v.toLong)))
      .toDF("g", "v")
    val perGroup = Sketches.sketches(df, Seq("g"), "v")
    assert(perGroup.count() == 3)
    val total = Sketches.rollup(perGroup, Nil).collect()(0)
    val est = total.getLong(total.fieldIndex("estimate")).toDouble
    val exact = df.select("v").distinct().count().toDouble // 2000 distinct
    assert(math.abs(est - exact) <= 0.05 * exact, s"est=$est exact=$exact")
    // sketching the whole column directly lands in the same band —
    // rollup-of-parts is as good as a raw-data pass
    val whole = Sketches.sketches(df, Nil, "v")
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))
      .collect()(0)
    val wEst = whole.getLong(whole.fieldIndex("estimate")).toDouble
    assert(math.abs(wEst - exact) <= 0.05 * exact, s"whole=$wEst exact=$exact")
  }

  test("estimates stay in-band under any partitioning (merge order shifts registers, not the contract)") {
    // DataSketches HLL merge is NOT bit-stable across merge orders
    // (sparse→dense promotion differs by partial layout — observed
    // 1999 vs 1997 on the same 2000 values), which is exactly why the
    // q146 gate pins the tolerance claim, never the estimate value
    val df = (0 until 2000).map(v => ("k", v.toLong)).toDF("g", "v")
    def est(d: org.apache.spark.sql.DataFrame): Double =
      Sketches.rollup(Sketches.sketches(d, Seq("g"), "v"), Seq("g"))
        .collect()(0).getLong(2).toDouble
    val e1 = est(df.repartition(1))
    val e7 = est(df.repartition(7, col("v")))
    assert(math.abs(e1 - 2000.0) <= 100.0, s"e1=$e1")
    assert(math.abs(e7 - 2000.0) <= 100.0, s"e7=$e7")
  }

  test("heavyHitters: exact items at or above the ceil(f·N) threshold") {
    val items = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      Seq.fill(5)("c")).toDF("item")
    // N = 155, thr = ceil(0.3·155) = 47 → {a, b}
    val out = Sketches.heavyHitters(items, "item", fraction = 0.3, k = 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 100L, "b" -> 50L))
  }

  test("heavyHitters: recall survives adversarial partitioning (merge guarantee)") {
    // heavy item scattered thin across partitions among distinct noise
    val rows = (0 until 4000).map { i =>
      if (i % 4 == 0) "hot" else s"noise_$i"
    }
    val items = rows.toDF("item").repartition(16)
    // N = 4000, hot = 1000; fraction 0.2 → thr = 800
    val out = Sketches.heavyHitters(items, "item", fraction = 0.2, k = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("hot" -> 1000L))
  }

  test("heavyHitters: guarantee precondition is enforced") {
    val items = Seq("a").toDF("item")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(items, "item", fraction = 0.01, k = 50)
    }
  }

  test("thetaOverlap: set algebra on sketches matches exact overlap in exact mode") {
    val df = (Seq.tabulate(300)(i => ("a", i.toLong)) ++
      Seq.tabulate(300)(i => ("b", (i + 200).toLong)) ++
      Seq.tabulate(50)(i => ("c", (i + 1000).toLong))).toDF("g", "u")
    val ov = Sketches.thetaOverlap(
      Sketches.thetaSketches(df, Seq("g"), "u"), "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // below nominal entries the sketch is exact (estimates are longs)
    assert(ov(("a", "b"))._1 == 100L) // ids 200..299 shared
    assert(ov(("a", "b"))._2 == 500L)
    assert(ov(("a", "c"))._1 == 0L)
    assert(ov(("b", "c"))._1 == 0L)
  }

  test("kllRollup: merged daily sketches answer quantiles within rank error") {
    val df = (1 to 1000).map(v => (s"d${v % 10}", v.toDouble)).toDF("day", "v")
    val rolled = Sketches.kllRollup(
      Sketches.kllSketches(df, Seq("day"), "v"), Nil, Seq(0.5))
    val med = rolled.collect()(0).getDouble(1)
    // k=200 on 1000 values: well within a 5% rank band around 500
    assert(med >= 450.0 && med <= 550.0, s"median=$med")
  }

  test("rollingDistinct: trailing-window union over present periods") {
    val df = Seq(
      ("d1", 1L), ("d1", 2L), ("d2", 2L), ("d2", 3L), ("d3", 9L),
      ("d5", 1L) // d4 absent: row-frame sees d2, d3, d5
    ).toDF("day", "u")
    val daily = Sketches.sketches(df, Seq("day"), "u")
    val out = Sketches.rollingDistinct(daily, Nil, "day", window = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // exact mode at this size: estimates are exact
    assert(out("d1") == 2L)            // {1,2}
    assert(out("d2") == 3L)            // {1,2,3}
    assert(out("d3") == 3L)            // {2,3,9}
    assert(out("d5") == 2L)            // {9,1} (previous PRESENT period)
  }
}
