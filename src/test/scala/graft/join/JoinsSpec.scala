package graft.join

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
  private def right = Seq((2L, "x"), (3L, "y"), (3L, "z"), (4L, "w")).toDF("k", "rv")

  test("join types: inner/left/full/semi/anti cardinalities") {
    assert(Joins.join(left, right, Seq("k"), "inner").count() == 3) // 2,3,3
    assert(Joins.join(left, right, Seq("k"), "left").count() == 4)  // +1 unmatched
    assert(Joins.join(left, right, Seq("k"), "full").count() == 5)  // +4's row
    assert(Joins.join(left, right, Seq("k"), "semi").count() == 2)
    assert(Joins.join(left, right, Seq("k"), "anti").count() == 1)
    intercept[IllegalArgumentException](Joins.join(left, right, Seq("k"), "sideways"))
  }

  test("rightHint pins the join strategy; results unchanged") {
    val plain = Joins.join(left, right, Seq("k"), "inner").collect().toSet
    for (h <- Seq("broadcast", "merge", "shuffle_hash")) {
      val hinted = Joins.join(left, right, Seq("k"), "inner", rightHint = Some(h))
      assert(hinted.collect().toSet == plain, h)
    }
    val p = Joins.join(left, right, Seq("k"), "inner",
      rightHint = Some("shuffle_hash"))
    p.collect()
    assert(p.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
    val m = Joins.join(left, right, Seq("k"), "inner", rightHint = Some("merge"))
    m.collect()
    assert(m.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    intercept[IllegalArgumentException](
      Joins.join(left, right, Seq("k"), "inner", rightHint = Some("psychic")))
  }

  test("clashing non-key columns get right_ prefix by default") {
    val r2 = right.withColumnRenamed("rv", "lv")
    val out = Joins.join(left, r2, Seq("k"), "inner")
    assert(out.columns.toSeq == Seq("k", "lv", "right_lv"))
  }

  test("explicit per-side prefixes apply to non-key columns") {
    val out = Joins.join(left, right, Seq("k"), "inner",
      leftPrefix = "l_", rightPrefix = "r_")
    assert(out.columns.toSeq == Seq("k", "l_lv", "r_rv"))
  }

  test("intersect/except with distinct and ALL semantics") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 3L, 4L).toDF("k")
    assert(Joins.intersect(a, b).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(Joins.intersect(a, b, all = true).count() == 2)
    assert(Joins.except(a, b).collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(Joins.except(a, b, all = true).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("asOf join matches the latest earlier right row per key, inclusive at equal times") {
    val trades = Seq((1L, "k", 100L), (2L, "k", 205L), (3L, "k", 50L), (4L, "z", 10L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("k", 90L, 1.0), ("k", 100L, 2.0), ("k", 200L, 3.0))
      .toDF("sym", "t", "px")
    val out = Joins.asOf(trades, quotes, Seq("sym"), "t", "t")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((Some(100L), Some(2.0)))) // equal time matches (<=)
    assert(out(2L) == ((Some(200L), Some(3.0)))) // latest earlier quote
    assert(out(3L) == ((None, None)))            // nothing earlier
    assert(out(4L) == ((None, None)))            // no quotes for key z
  }

  test("asOfWithin: stale matches null out at the tolerance; rows stay") {
    val trades = Seq((1L, "k", 100L), (2L, "k", 205L), (3L, "k", 400L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("k", 90L, 1.0), ("k", 200L, 3.0))
      .toDF("sym", "t", "px")
    val out = Joins.asOfWithin(trades, quotes, Seq("sym"), "t", "t",
      maxGap = 10L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((Some(90L), Some(1.0))))  // gap 10: inside
    assert(out(2L) == ((Some(200L), Some(3.0)))) // gap 5: inside
    assert(out(3L) == ((None, None)))            // gap 200: nulled out
    assert(out.size == 3)                        // left rows all kept
  }

  test("binned range join equals the naive BETWEEN join") {
    val points = (1 to 200).map(i => (i.toLong, i * 1.7)).toDF("pid", "x")
    val intervals = (1 to 40).map(i => (i.toLong, i * 8.0 - 3.0, i * 8.0 + 4.5))
      .toDF("iid", "lo", "hi")
    val binned = Joins.rangeJoin(points, intervals, "x", "lo", "hi", binWidth = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
      col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive && binned.nonEmpty)
  }

  test("lookup broadcasts the dimension (plan assertion)") {
    val facts = (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    val dim = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    val plan = Joins.lookup(facts, dim, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("asOf equals a naive per-row latest-match computation on random data") {
    val rnd = new scala.util.Random(7)
    val lefts = (1 to 60).map(i => (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(100).toLong))
    val rights = (1 to 40).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(100).toLong, i.toDouble))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key,time)
    val l = lefts.toDF("lid", "k", "t")
    val r = rights.toDF("k", "t", "payload")
    val got = Joins.asOf(l, r, Seq("k"), "t", "t")
      .collect().map(row => row.getLong(0) ->
        (Option(row.get(3)).map(_.asInstanceOf[Long]),
          Option(row.get(4)).map(_.asInstanceOf[Double]))).toMap
    lefts.foreach { case (lid, k, t) =>
      val expect = rights.filter(x => x._1 == k && x._2 <= t)
        .sortBy(_._2).lastOption
      assert(got(lid) == ((expect.map(_._2), expect.map(_._3))), s"lid=$lid")
    }
  }

  test("salted join equals plain join on skewed data (inner and left)") {
    val hot = (1 to 500).map(_ => (1L, "hot")) ++ Seq((2L, "cold"), (9L, "nomatch"))
    val l = hot.toDF("k", "lv")
    val r = Seq((1L, "r1"), (1L, "r2"), (2L, "r3")).toDF("k", "rv")
    for (jt <- Seq("inner", "left")) {
      val plain = Joins.join(l, r, Seq("k"), jt)
        .groupBy("k", "lv", "rv").count()
      val salted = Joins.saltedJoin(l, r, Seq("k"), jt, saltFactor = 4)
        .groupBy("k", "lv", "rv").count()
      assert(TestSpark.rows(salted) == TestSpark.rows(plain), jt)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val spark2 = spark
    import spark2.implicits._
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    graft.sinks.Sinks.parquetBucketed(a, "bkt_a", 4, Seq("k"))
    graft.sinks.Sinks.parquetBucketed(b, "bkt_b", 4, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // bucketing co-locates both sides
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("unionAll tolerates heterogeneous schemas (missing cols → null)") {
    val a = Seq((1L, "x")).toDF("id", "only_a")
    val b = Seq((2L, 9.5)).toDF("id", "only_b")
    val u = Joins.unionAll(Seq(a, b))
    assert(u.count() == 2)
    assert(u.columns.toSet == Set("id", "only_a", "only_b"))
  }

  test("parquetBucketed handles db-qualified names and re-overwrite") {
    import graft.sinks.Sinks
    val spark = graft.TestSpark.spark
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bktdb")
    try {
      val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      // twice: the second overwrite exercises DROP of the parsed
      // two-part name + orphan-location cleanup under the db directory
      Sinks.parquetBucketed(df, "graft_bktdb.t1", 2, Seq("k"))
      Sinks.parquetBucketed(df.withColumn("v", org.apache.spark.sql.functions.lit("z")),
        "graft_bktdb.t1", 2, Seq("k"))
      val out = spark.table("graft_bktdb.t1").collect()
      assert(out.length == 2 && out.forall(_.getString(1) == "z"))
      // the single-part name in the CURRENT database still works
      Sinks.parquetBucketed(df, "bkt_single", 2, Seq("k"))
      assert(spark.table("bkt_single").count() == 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bktdb.t1")
      spark.sql("DROP TABLE IF EXISTS bkt_single")
      spark.sql("DROP DATABASE IF EXISTS graft_bktdb")
    }
  }
  test("asOfNearest: closer side wins, ties backward, no-match null, " +
    "gap emitted") {
    val left = Seq(
      ("u", 1L, 100L),  // clicks at 90 and 105: forward (5) beats back (10)
      ("u", 2L, 200L),  // clicks at 190 and 210: tie -> backward
      ("u", 3L, 50L),   // only forward exists
      ("w", 4L, 10L)    // user with no right rows at all
    ).toDF("user", "id", "t")
    val right = Seq(
      ("u", 101L, 90L), ("u", 102L, 105L),
      ("u", 103L, 190L), ("u", 104L, 210L)
    ).toDF("user", "rid", "t")
    val out = Joins.asOfNearest(left, right, Seq("user"), "t", "t")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("asof_gap")).map(_.toLong))).toMap
    assert(out(1L) == ((Some(102L), Some(5L))))
    assert(out(2L) == ((Some(103L), Some(10L)))) // tie: backward
    assert(out(3L) == ((Some(101L), Some(40L)))) // forward only
    assert(out(4L) == ((None, None)))
    // equal-time right row matches at distance 0
    val eq = Joins.asOfNearest(
      Seq(("u", 9L, 90L)).toDF("user", "id", "t"), right,
      Seq("user"), "t", "t").collect().head
    assert(eq.getAs[Long]("asof_rid") == 101L &&
      eq.getAs[Long]("asof_gap") == 0L)
  }

  test("overlapJoin emits each overlapping pair exactly once, " +
    "across any bin geometry") {
    val left = Seq(
      ("k", 1L, 0.0, 10.0),    // long interval spanning many bins
      ("k", 2L, 12.0, 13.0),
      ("k", 3L, 25.0, 30.0)
    ).toDF("g", "lid", "lo", "hi")
    val right = Seq(
      ("k", 101L, 5.0, 20.0),  // overlaps 1 and 2
      ("k", 102L, 9.9, 10.0),  // touches 1 at the boundary
      ("k", 103L, 31.0, 40.0), // overlaps nothing
      ("z", 104L, 0.0, 100.0)  // different key: never pairs
    ).toDF("g", "rid", "lo", "hi")
    for (w <- Seq(1.0, 3.0, 50.0)) {
      val pairs = Joins.overlapJoin(left, right, Seq("g"),
          "lo", "hi", binWidth = w)
        .select("lid", "r_rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(pairs == Seq((1L, 101L), (1L, 102L), (2L, 101L)),
        s"binWidth=$w got $pairs")
    }
  }

  test("overlapJoin: negative coordinates and null bounds") {
    val left = Seq(("k", 1L, Some(-7.5), Some(-2.0)),
      ("k", 2L, None, Some(1.0))).toDF("g", "lid", "lo", "hi")
    val right = Seq(("k", 9L, Some(-3.0), Some(-2.5)))
      .toDF("g", "rid", "lo", "hi")
    val pairs = Joins.overlapJoin(left, right, Seq("g"), "lo", "hi", 2.0)
      .select("lid", "r_rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 9L)))
  }
}
