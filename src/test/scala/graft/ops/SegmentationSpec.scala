package graft.ops

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SegmentationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("rfmScores: best/worst land on the right scores, exact " +
    "equal-frequency cut, id tie-break, per-cohort") {
    // 5 customers x 1 cohort with strictly ordered R/F/M so every
    // dimension's k=5 cut gives one customer per score
    val rows = (1 to 5).flatMap { c =>
      // customer c: c orders of 10.0 each, last date day c
      (1 to c).map(i => ("co", c.toLong, d(f"2024-01-${c}%02d"), 10.0))
    }
    val out = Segmentation.rfmScores(rows.toDF("k", "cust", "dt", "amt"),
      Seq("k"), "cust", "dt", "amt")
      .collect().map(r => r.getAs[Long]("cust") -> r).toMap
    // customer 5: most recent, most frequent, highest spend -> 555
    assert(out(5L).getAs[String]("segment") == "555")
    assert(out(1L).getAs[String]("segment") == "111")
    assert(out(3L).getAs[Long]("frequency") == 3L)
    assert(out(3L).getAs[Double]("monetary") == 30.0)
    assert((1 to 5).map(c => out(c.toLong).getAs[Long]("m_score")).toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
    // all-tied dimension: the customer-id tie-break makes scores
    // deterministic — lowest ids get the best scores
    val tied = (1 to 4).map(c => ("co", c.toLong, d("2024-01-01"), 5.0))
    val ts = Segmentation.rfmScores(tied.toDF("k", "cust", "dt", "amt"),
      Seq("k"), "cust", "dt", "amt", buckets = 2)
      .collect().map(r => r.getAs[Long]("cust") ->
        r.getAs[Long]("r_score")).toMap
    assert(ts == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    // cohorts score independently
    val two = Seq(("x", 1L, d("2024-01-01"), 1.0),
      ("y", 2L, d("2024-01-01"), 99.0))
    val tw = Segmentation.rfmScores(two.toDF("k", "cust", "dt", "amt"),
      Seq("k"), "cust", "dt", "amt")
      .collect().map(r => r.getAs[String]("k") ->
        r.getAs[String]("segment")).toMap
    assert(tw("x") == tw("y")) // each is its cohort's best
  }
}
