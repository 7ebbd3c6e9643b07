package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LedgerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fifoMatch: hand-derived lot splits, shortfall emits no row") {
    // lots  [0,500) [500,800); demands [0,400) [400,700) [700,1700)
    val lots = Seq(
      ("u", ts("2024-01-01 00:00:01"), 1L, 5.0),
      ("u", ts("2024-01-01 00:00:02"), 2L, 3.0)
    ).toDF("user", "ts", "id", "qty")
    val demands = Seq(
      ("u", ts("2024-01-01 00:01:00"), 10L, 4.0),
      ("u", ts("2024-01-01 00:02:00"), 11L, 3.0),
      ("u", ts("2024-01-01 00:03:00"), 12L, 10.0)
    ).toDF("user", "ts", "id", "qty")
    val out = Ledger.fifoMatch(lots, demands, Seq("user"),
      "ts", "id", "qty", "ts", "id", "qty")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(out == Map(
      (1L, 10L) -> 400L, // lot1 covers demand1 fully
      (1L, 11L) -> 100L, // lot1's last unit into demand2
      (2L, 11L) -> 200L, // lot2 finishes demand2
      (2L, 12L) -> 100L  // lot2's remainder into demand3; 900 short
    ))
    // conservation: per-demand matches never exceed the demand
    assert(out.collect { case ((_, d), m) if d == 12L => m }.sum == 100L)
  }

  test("fifoMatch: zero/negative quantities ignored; empty sides") {
    val lots = Seq(("u", ts("2024-01-01 00:00:01"), 1L, 0.0),
      ("u", ts("2024-01-01 00:00:02"), 2L, -3.0)).toDF("user", "ts", "id", "qty")
    val demands = Seq(("u", ts("2024-01-01 00:01:00"), 10L, 4.0))
      .toDF("user", "ts", "id", "qty")
    assert(Ledger.fifoMatch(lots, demands, Seq("user"),
      "ts", "id", "qty", "ts", "id", "qty").count() == 0)
    assert(Ledger.fifoMatch(lots.limit(0), demands.limit(0), Seq("user"),
      "ts", "id", "qty", "ts", "id", "qty").count() == 0)
  }

  test("attribute: window membership, first/last flags, linear weight, " +
    "touchless reconciliation row") {
    val touches = Seq(
      ("u", 101L, ts("2024-01-01 00:00:01")),
      ("u", 102L, ts("2024-01-01 00:00:02")),
      ("u", 103L, ts("2024-01-01 00:00:10")), // after the conversion
      ("w", 301L, ts("2024-01-01 00:00:01"))  // other user's touch
    ).toDF("user", "id", "ts")
    val convs = Seq(
      ("u", 201L, ts("2024-01-01 00:00:05"), 10.0),
      ("u", 202L, ts("2024-01-01 00:00:00"), 3.0), // before all touches
      ("v", 203L, ts("2024-01-01 00:00:05"), 7.0)  // user with no touches
    ).toDF("user", "id", "ts", "value")
    val out = Attribution.attribute(touches, convs, Seq("user"),
      "id", "ts", "id", "ts", "value", windowMicros = 4000000L)
      .collect()
    val byConv = out.groupBy(_.getAs[Long]("conv_id"))
    // conv 201: touches at t=1 (>= 5−4, inclusive) and t=2; t=10 excluded
    val c201 = byConv(201L).sortBy(_.getAs[Long]("touch_id"))
    assert(c201.map(_.getAs[Long]("touch_id")).toSeq == Seq(101L, 102L))
    assert(c201.forall(_.getAs[Long]("n_touch") == 2L))
    assert(c201.map(r => (r.getAs[Boolean]("is_first"),
      r.getAs[Boolean]("is_last"))).toSeq == Seq((true, false), (false, true)))
    assert(c201.forall(_.getAs[Double]("w_linear") == 0.5))
    // conv 202 and 203: exactly one reconciliation row, null touch
    for (id <- Seq(202L, 203L)) {
      val rows = byConv(id)
      assert(rows.length == 1 && rows.head.isNullAt(
        rows.head.fieldIndex("touch_id")))
      assert(rows.head.getAs[Long]("n_touch") == 0L)
    }
    // revenue reconciles: every conversion appears
    assert(byConv.keySet == Set(201L, 202L, 203L))
  }
}
