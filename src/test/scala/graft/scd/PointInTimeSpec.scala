package graft.scd

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PointInTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pointInTime: half-open validity, version boundaries, missing keys") {
    def d(s: String) = Date.valueOf(s)
    val dim = Seq(
      (1L, "v1", d("2020-01-01"), d("2021-01-01")),
      (1L, "v2", d("2021-01-01"), d("9999-12-31"))
    ).toDF("k", "attr", "vf", "vt")
    val fact = Seq(
      (10L, 1L, d("2020-06-01")),  // inside v1
      (11L, 1L, d("2021-01-01")),  // boundary: v1 closes, v2 opens -> v2
      (12L, 1L, d("2019-01-01")),  // pre-history -> null
      (13L, 2L, d("2021-06-01"))   // unknown key -> null
    ).toDF("fid", "k", "fd")
    val out = SCD.pointInTime(fact, dim, Seq("k"), "fd", "vf", "vt")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out == Map(10L -> Some("v1"), 11L -> Some("v2"),
      12L -> None, 13L -> None))
  }
}
