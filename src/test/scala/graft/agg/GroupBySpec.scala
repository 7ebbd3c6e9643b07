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

  test("approxCountDistinct / approxQuantile: exact on small groups, " +
    "all-null group yields null quantile") {
    val out = GroupBy("k").approxCountDistinct("n", "acd")
      .approxQuantile("v", 0.5, "med").sorted.apply(df)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // HLL/KLL sketches are exact at these cardinalities
    assert(out("a") == Seq(2L, 10.0))
    assert(out("b") == Seq(1L, null))
  }

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

  test("rollup and cube emit subtotal rows disambiguated by grouping_id") {
    val src = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L)).toDF("g1", "g2", "v")
    val roll = GroupBy("g1", "g2").rollup.sum("v", "s")
      .agg(grouping_id().cast("int").as("gid")).apply(src)
    assert(roll.count() == 6) // 3 leaves + 2 g1-subtotals + 1 grand
    assert(roll.filter(col("gid") === 3).collect()(0).getLong(2) == 7L)
    val cube = GroupBy("g1", "g2").cube.sum("v", "s")
      .agg(grouping_id().cast("int").as("gid")).apply(src)
    assert(cube.count() == 8) // + 2 g2-subtotals
    assert(cube.filter(col("gid") === 2 && col("g2") === "x")
      .collect()(0).getLong(2) == 5L)
  }

  test("global aggregate yields exactly one row; empty aggs rejected") {
    val r = GroupBy.global(count(lit(1)).as("n"), sum(col("n")).as("s"))(df).collect()
    assert(r.length == 1 && r(0).getLong(0) == 3L && r(0).getLong(1) == 6L)
    intercept[IllegalArgumentException](GroupBy.global())
    intercept[IllegalArgumentException](GroupBy("k").apply(df))
  }

  test("percentilesDisc picks the value at rank ceil(p*n), per group") {
    val df = spark.range(1, 11).toDF("v")
      .withColumn("g", org.apache.spark.sql.functions.lit("a"))
    val out = GroupBy.percentilesDisc(df, Seq("g"), "v", Seq(0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    // n=10: p50 -> rank 5 -> 5; p90 -> rank 9 -> 9; p100 -> rank 10 -> 10
    assert(out == Map(0.5 -> 5L, 0.9 -> 9L, 1.0 -> 10L))
    intercept[IllegalArgumentException](
      GroupBy.percentilesDisc(df, Seq("g"), "v", Seq(0.0)))
  }

  test("stringAgg is sorted and partition-order independent") {
    val df = Seq((1, "c"), (1, "a"), (2, "z"), (1, "b")).toDF("g", "v")
    val once = GroupBy.stringAgg(df, Seq("g"), "v", "|")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(once == Map(1 -> "a|b|c", 2 -> "z"))
    val shuffled = GroupBy.stringAgg(df.repartition(7), Seq("g"), "v", "|")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(shuffled == once)
    // numeric values sort by VALUE, not lexicographically ("10" < "9")
    val nums = Seq((1, 9L), (1, 10L), (1, 2L)).toDF("g", "v")
    assert(GroupBy.stringAgg(nums, Seq("g"), "v", ",")
      .collect()(0).getString(1) == "2,9,10")
  }

  test("normalizePerKey: zscore/minmax formulas, constant groups null, null keys kept") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("a"), Some(3.0)), (Some("a"), Some(4.0)),
      (Some("c"), Some(7.0)), (Some("c"), Some(7.0)), // constant group
      (None, Some(5.0)), (None, Some(6.0)),           // null group KEY
      (Some("a"), None)                               // null value
    ).toDF("g", "v")
    val z = GroupBy.normalizePerKey(df, Seq("g"), "v", "zscore", "z")
    val za = z.filter($"g" === "a" && $"v" === 1.0).head.getDouble(2)
    assert(math.abs(za - (1.0 - 2.5) / math.sqrt(1.25)) < 1e-12)
    assert(z.filter($"g" === "c").select("z").collect().forall(_.isNullAt(0)))
    // null group key is a real group of its own, not dropped
    assert(z.filter($"g".isNull).count() == 2)
    assert(z.filter($"g".isNull && $"v" === 5.0).head.getDouble(2) == -1.0)
    assert(z.filter($"g" === "a" && $"v".isNull).head.isNullAt(2))
    val mm = GroupBy.normalizePerKey(df, Seq("g"), "v", "minmax", "mm")
    assert(mm.filter($"g" === "a" && $"v" === 2.0).head.getDouble(2)
      == (2.0 - 1.0) / 3.0)
    assert(mm.filter($"g" === "c").select("mm").collect().forall(_.isNullAt(0)))
    intercept[IllegalArgumentException](
      GroupBy.normalizePerKey(df, Seq("g"), "v", "sideways"))
  }

  test("normalizePerKey: a NaN value cannot poison its group's statistics") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", Double.NaN)).toDF("g", "v")
    val mm = GroupBy.normalizePerKey(df, Seq("g"), "v", "minmax", "mm")
    val vals = mm.orderBy("v").select("mm").collect()
    assert(vals(0).getDouble(0) == 0.0 && vals(1).getDouble(0) == 1.0)
    assert(vals(2).isNullAt(0)) // the NaN row itself normalizes to null
    val z = GroupBy.normalizePerKey(df, Seq("g"), "v", "zscore", "z")
    // stats over {1,2} only: mean 1.5, sd 0.5 → z(1) = -1
    assert(z.filter($"v" === 1.0).head.getDouble(2) == -1.0)
    assert(z.filter(isnan($"v")).head.isNullAt(2))
  }

  test("rollingByTime: mean averages observed values, not frame size") {
    import spark.implicits._
    val df = Seq((1L, 0L, Some(10.0)), (1L, 5L, None)).toDF("user", "t", "v")
    val out = GroupBy.rollingByTime(df, Seq("user"), "t", "v", lookback = 100L)
      .filter($"t" === 5L).head
    assert(out.getLong(3) == 2L)        // roll_n counts rows
    assert(out.getDouble(4) == 10.0)    // roll_sum skips the null
    assert(out.getDouble(5) == 10.0)    // mean over the ONE observed value
  }

  test("sessionize: gap boundaries are strict, ties stay in-session, ids are 1-based") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L), (1L, 100L), (1L, 100L),  // ties share a session
      (1L, 200L),                        // gap exactly 100 → same session
      (1L, 301L),                        // gap 101 > 100 → new session
      (2L, 50L)
    ).toDF("user", "t")
    val out = GroupBy.sessionize(df, Seq("user"), "t", gap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 0L)) == 1L && out((1L, 100L)) == 1L)
    assert(out((1L, 200L)) == 1L)
    assert(out((1L, 301L)) == 2L)
    assert(out((2L, 50L)) == 1L)
    // stable under repartitioning
    val again = GroupBy.sessionize(df.repartition(7), Seq("user"), "t", 100L)
    assert(again.collect().toSet ==
      GroupBy.sessionize(df, Seq("user"), "t", 100L).collect().toSet)
  }

  test("rollingByTime: RANGE frame includes ties and honors the lookback bound") {
    import spark.implicits._
    // user 1: t=0,50,100,3600,3700 — at t=3600 the 3600-lookback frame
    // is [0,3600] (inclusive both ends); at 3700 it drops t=0 and 50
    val df = Seq(
      (1L, 0L, 1.0), (1L, 50L, 2.0), (1L, 100L, 4.0),
      (1L, 3600L, 8.0), (1L, 3700L, 16.0),
      (2L, 0L, 100.0), (2L, 0L, 200.0) // tied times share a frame
    ).toDF("user", "t", "v")
    val out = GroupBy.rollingByTime(df, Seq("user"), "t", "v", lookback = 3600L)
      .select("user", "t", "v", "roll_n", "roll_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, 3600L, 8.0)) == (4L, 15.0))
    assert(out((1L, 3700L, 16.0)) == (3L, 28.0))
    assert(out((1L, 0L, 1.0)) == (1L, 1.0))
    // RANGE (not ROWS): both tied rows see both values
    assert(out((2L, 0L, 100.0)) == (2L, 300.0))
    assert(out((2L, 0L, 200.0)) == (2L, 300.0))
    intercept[IllegalArgumentException](
      GroupBy.rollingByTime(df.withColumn("t", lit("x")), Seq("user"), "t", "v", 1L))
  }

  test("binByQuantiles: edges are exact disc percentiles, equals fall low, null stays null") {
    val df = ((1 to 10).map(i => Some(i.toDouble)) :+ None)
      .map(Tuple1(_)).toDF("v")
    val out = GroupBy.binByQuantiles(df, "v", Seq(0.25, 0.5, 0.75))
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Double]) ->
        Option(r.get(1)).map(_.asInstanceOf[Int])).toMap
    // edges: ceil(.25*10)=3 -> 3.0, ceil(.5*10)=5 -> 5.0, ceil(.75*10)=8 -> 8.0
    assert(out(Some(1.0)) == Some(1) && out(Some(3.0)) == Some(1))
    assert(out(Some(4.0)) == Some(2) && out(Some(5.0)) == Some(2))
    assert(out(Some(6.0)) == Some(3) && out(Some(8.0)) == Some(3))
    assert(out(Some(9.0)) == Some(4) && out(Some(10.0)) == Some(4))
    assert(out(None).isEmpty)
  }

  test("binByQuantiles: duplicate edges (tight quantiles on skewed data) skip bins") {
    // 0.4/0.5/0.6 of ten equal values -> three identical edges; any
    // larger value counts all three and lands in bin 4
    val df = (Seq.fill(9)(1.0) :+ 9.0).map(Tuple1(_)).toDF("v")
    val out = GroupBy.binByQuantiles(df, "v", Seq(0.4, 0.5, 0.6))
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(out(1.0) == 1 && out(9.0) == 4)
  }

  test("winsorize clamps at exact per-key edges; edge-equal and null values untouched") {
    // g=a: 1..10 → p20 edge = 2, p80 edge = 8
    val rows = (1 to 10).map(i => ("a", i.toDouble)) ++
      Seq(("b", 100.0), ("b", 200.0), ("b", 300.0)) // n=3: p20→rank1=100, p80→rank3=300
    val df = (rows.map { case (g, v) => (g, Option(v)) } :+
      (("a", Option.empty[Double]))).toDF("g", "v")
    val out = GroupBy.winsorize(df, Seq("g"), "v", 0.2, 0.8)
      .collect().map(r => (r.getString(0), Option(r.get(1))) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(("a", Some(1.0))) == Some(2.0))   // below lo → lo
    assert(out(("a", Some(2.0))) == Some(2.0))   // AT the edge → itself
    assert(out(("a", Some(5.0))) == Some(5.0))
    assert(out(("a", Some(9.0))) == Some(8.0))   // above hi → hi
    assert(out(("a", Some(10.0))) == Some(8.0))
    assert(out(("a", None)) == None)             // null passes through
    // group b: everything inside [100, 300] stays
    assert(out(("b", Some(100.0))) == Some(100.0))
    assert(out(("b", Some(300.0))) == Some(300.0))
  }

  test("groupingSets: exactly the requested grains, one per grouping_id") {
    val df = Seq(("A", "x", 1L), ("A", "y", 2L), ("B", "x", 4L))
      .toDF("f", "g", "v")
    val out = GroupBy("f", "g")
      .groupingSets(Seq("f", "g"), Seq("g"), Seq())
      .sum("v", "s")
      .agg(org.apache.spark.sql.functions.grouping_id().cast("int").as("gid"))
      .apply(df)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        r.getLong(2), r.getInt(3))).toSet
    assert(out == Set(
      (Some("A"), Some("x"), 1L, 0), (Some("A"), Some("y"), 2L, 0),
      (Some("B"), Some("x"), 4L, 0),                      // finest grain
      (None, Some("x"), 5L, 2), (None, Some("y"), 2L, 2), // by g only
      (None, None, 7L, 3)))                               // grand total
  }

  test("groupingSets rejects grain columns outside the group fields") {
    intercept[IllegalArgumentException] {
      GroupBy("f").groupingSets(Seq("nope"))
    }
  }

  test("empiricalCdf: midrank CDF per group, nulls dropped") {
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(20.0)),
      ("a", Some(30.0)), ("a", None), ("b", Some(5.0)))
      .toDF("g", "v")
    val out = GroupBy.empiricalCdf(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    // group a (n=4): 10→1/4, 20 ties midrank 2.5→0.625, 30→4/4
    assert(out == Set(("a", 10.0, 0.25), ("a", 20.0, 0.625),
      ("a", 20.0, 0.625), ("a", 30.0, 1.0), ("b", 5.0, 1.0)))
  }

  test("skyline2D: Pareto front with ties and dominated interiors") {
    val df = Seq((1L, 1.0, 10), (2L, 2.0, 20), (3L, 3.0, 15),
      (4L, 2.0, 20), (5L, 2.5, 20), (6L, 1.0, 5))
      .toDF("id", "price", "size")
    val out = GroupBy.skyline2D(df, "price", "size")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // 1: cheapest at its size level -> frontier; 2 & 4 tie (both
    // frontier); 5 dominated by 2/4 (same size, pricier); 3 dominated
    // (pricier, smaller than 20); 6 dominated by 1 (same price, bigger)
    assert(out == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> false))
  }

  test("weightedPercentilesDisc: weight-crossing rule with ties") {
    // values 10(w=1), 20(w=8), 30(w=1): W=10
    // p=.25 -> threshold 2.5 -> 20; p=.5 -> 5 -> 20; p=.95 -> 9.5 -> 30
    val df = Seq((10.0, 1.0), (20.0, 5.0), (20.0, 3.0), (30.0, 1.0))
      .toDF("v", "w")
    val out = GroupBy.weightedPercentilesDisc(df, Nil, "v", "w",
      Seq(0.25, 0.5, 0.95), out = "v")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out == Map(0.25 -> 20.0, 0.5 -> 20.0, 0.95 -> 30.0))
    // boundary exactness: p=0.1 -> threshold 1.0 == cum(10) -> value 10
    val b = GroupBy.weightedPercentilesDisc(df, Nil, "v", "w",
      Seq(0.1), out = "v").collect()(0).getDouble(1)
    assert(b == 10.0)
  }

  test("histogram: dense equal-width buckets, max folds into last, degenerate group") {
    val df = Seq(("a", 0.0), ("a", 5.0), ("a", 9.9), ("a", 10.0),
      ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    val out = GroupBy.histogram(df, Seq("g"), "v", bins = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a: span [0,10], width 2.5: 0.0->b0, 5.0->b2, 9.9->b3, 10.0->b3
    assert(out(("a", 0L)) == 1L && out(("a", 1L)) == 0L)
    assert(out(("a", 2L)) == 1L && out(("a", 3L)) == 2L)
    // b: degenerate span -> everything bucket 0, rest zero-filled
    assert(out(("b", 0L)) == 2L && out(("b", 1L)) == 0L &&
      out(("b", 3L)) == 0L)
    assert(out.size == 8)
  }
  test("weightedMedian: exact lower median on the weight grid; " +
    "nonpositive weights excluded") {
    // values 1(w=1), 2(w=1), 3(w=10): total 12, half at 6 -> 3
    val df = Seq(("k", 1.0, 1.0), ("k", 2.0, 1.0), ("k", 3.0, 10.0),
      ("even", 1.0, 1.0), ("even", 9.0, 1.0), // tie: lower median 1
      ("z", 5.0, 0.0), ("z", 7.0, 2.0))       // zero weight ignored
      .toDF("key", "v", "w")
    val out = GroupBy.weightedMedian(df, Seq("key"), "v", "w")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k").getAs[Double]("wmedian") == 3.0)
    assert(out("k").getAs[Long]("total_weight") == 1200L) // cent grid
    assert(out("even").getAs[Double]("wmedian") == 1.0)
    val z = out("z")
    assert(z.getAs[Long]("n") == 1L && z.getAs[Double]("wmedian") == 7.0)
    assert(GroupBy.weightedMedian(df.limit(0), Seq("key"), "v", "w")
      .count() == 0)
  }

  test("topKOther: top-k kept with ranks, tail collapses to OTHER " +
    "with exact mass, measure-tie breaks on member") {
    val df = Seq(("g", "a", 30.0), ("g", "b", 20.0), ("g", "c", 6.0),
      ("g", "c", 4.0), ("g", "d", 5.0), ("g", "e", 1.0))
      .toDF("k", "m", "x")
    val out = GroupBy.topKOther(df, Seq("k"), "m", "x", k = 2)
      .collect().map(r => r.getAs[String]("member") -> r).toMap
    assert(out("a").getAs[Long]("rank") == 1L &&
      out("a").getAs[Double]("measure") == 30.0)
    assert(out("b").getAs[Long]("rank") == 2L)
    // OTHER = c(10) + d(5) + e(1): mass and row count exact
    assert(out("OTHER").getAs[Long]("rank") == 3L)
    assert(out("OTHER").getAs[Double]("measure") == 16.0)
    assert(out("OTHER").getAs[Long]("n_rows") == 4L)
    assert(out.size == 3)
    // tie on the measure: member ascending decides who makes the cut
    val tie = Seq(("g", "x", 5.0), ("g", "y", 5.0), ("g", "z", 5.0))
      .toDF("k", "m", "x")
    val t = GroupBy.topKOther(tie, Seq("k"), "m", "x", k = 2)
      .collect().map(r => r.getAs[String]("member") ->
        r.getAs[Long]("rank")).toMap
    assert(t == Map("x" -> 1L, "y" -> 2L, "OTHER" -> 3L))
  }

  test("runningDistinct: cumulative cardinality per key; repeats " +
    "don't bump, nulls carry the count without counting") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      ("u", ts("2024-01-01 10:00:00"), 1L, Some("a")),
      ("u", ts("2024-01-01 10:01:00"), 2L, Some("b")),
      ("u", ts("2024-01-01 10:02:00"), 3L, Some("a")), // repeat
      ("u", ts("2024-01-01 10:03:00"), 4L, Option.empty[String]),
      ("u", ts("2024-01-01 10:04:00"), 5L, Some("c")),
      ("w", ts("2024-01-01 10:00:00"), 6L, Some("a"))  // other key
    ).toDF("k", "ts", "id", "v")
    val out = GroupBy.runningDistinct(df, Seq("k"), "ts", "id", "v")
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 1L))
  }
}
