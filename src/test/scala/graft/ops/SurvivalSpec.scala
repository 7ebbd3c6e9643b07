package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r9(x: Double): java.math.BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).bigDecimal

  test("kaplanMeier: hand-derived risk sets, factors, censoring; " +
      "all-dead final point nulls log_surv") {
    val subj = Seq(
      ("k", 1L, true),
      ("k", 2L, true), ("k", 2L, true), ("k", 2L, false),
      ("k", 3L, false),
      ("z", 1L, true), ("z", 1L, true))
      .toDF("cohort", "dur", "obs")
    val out = Survival.kaplanMeier(subj, Seq("cohort"), "dur", "obs")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // k@1: risk 5, d 1 -> ln(4/5); k@2: risk 4, d 2, c 1 -> +ln(2/4);
    // k@3: risk 1, d 0 -> +ln(1) = same
    val k1 = out(("k", 1L))
    assert(k1.getAs[Long]("n_risk") == 5L && k1.getAs[Long]("d") == 1L)
    val l1 = r9(math.log(4.0 / 5.0)).doubleValue
    assert(k1.getAs[Double]("log_surv") == l1)
    val k2 = out(("k", 2L))
    assert(k2.getAs[Long]("n_risk") == 4L && k2.getAs[Long]("d") == 2L &&
      k2.getAs[Long]("c") == 1L)
    val l2 = r9(math.log(4.0 / 5.0)).add(r9(math.log(2.0 / 4.0))).doubleValue
    assert(k2.getAs[Double]("log_surv") == l2)
    val k3 = out(("k", 3L))
    assert(k3.getAs[Long]("n_risk") == 1L && k3.getAs[Long]("d") == 0L)
    assert(k3.getAs[Double]("log_surv") == l2) // ln(1) adds nothing
    // z: both die at t=1 -> survival 0 -> null log
    val z1 = out(("z", 1L))
    assert(z1.getAs[Long]("n_risk") == 2L && z1.getAs[Long]("d") == 2L)
    assert(z1.isNullAt(z1.fieldIndex("log_surv")))
    // empty input
    assert(Survival.kaplanMeier(
      Seq.empty[(String, Long, Boolean)].toDF("cohort", "dur", "obs"),
      Seq("cohort"), "dur", "obs").count() == 0)
  }

  test("nelsonAalen: hand cumulative hazard on the same risk sets; " +
      "censoring-only times add zero; all-dead point is finite") {
    val subj = Seq(
      ("k", 1L, true),
      ("k", 2L, true), ("k", 2L, true), ("k", 2L, false),
      ("k", 3L, false),
      ("z", 1L, true), ("z", 1L, true))
      .toDF("cohort", "dur", "obs")
    val out = Survival.nelsonAalen(subj, Seq("cohort"), "dur", "obs")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // k@1: 1/5; k@2: + 2/4; k@3: + 0/1 (censoring-only -> no increment)
    val h1 = r9(1.0 / 5.0).doubleValue
    assert(out(("k", 1L)).getAs[Double]("cum_hazard") == h1)
    val h2 = r9(1.0 / 5.0).add(r9(2.0 / 4.0)).doubleValue
    assert(out(("k", 2L)).getAs[Double]("cum_hazard") == h2)
    assert(out(("k", 3L)).getAs[Double]("cum_hazard") == h2)
    // unlike KM's null log_surv, NA stays finite when everyone dies
    assert(out(("z", 1L)).getAs[Double]("cum_hazard") == 1.0)
  }

  test("rmst: hand step-function areas — event drop, censoring " +
    "keeps the curve flat, survival past the horizon caps at tau") {
    val subj = Seq(
      // k: death at 10 (S -> 0.5), death at 40 (past tau)
      ("k", 10L, true), ("k", 40L, true),
      // c: single subject censored at 5 -> curve stays at 1
      ("c", 5L, false),
      // f: observed at 50, past the horizon -> full tau
      ("f", 50L, true))
      .toDF("cohort", "dur", "obs")
    val out = Survival.rmst(subj, Seq("cohort"), "dur", "obs",
      tau = 30L)
      .collect().map(r => r.getString(0) -> r).toMap
    // 1.0*10 + 0.5*(30-10): S(10) = round(exp(round(ln(.5),9)),9) = .5
    assert(out("k").getAs[Double]("rmst") == 20.0)
    assert(out("k").getAs[Long]("n_events") == 2L)
    assert(out("c").getAs[Double]("rmst") == 30.0)
    assert(out("f").getAs[Double]("rmst") == 30.0)
  }

  test("survivalQuantiles: quartile read-off on a clean 4-death " +
    "curve; heavy censoring leaves the median unreached (null)") {
    val subj = Seq(
      ("k", 1L, true), ("k", 2L, true), ("k", 3L, true), ("k", 4L, true),
      // h: one early death (S = 2/3 > 0.5 forever after)
      ("h", 1L, true), ("h", 5L, false), ("h", 5L, false))
      .toDF("cohort", "dur", "obs")
    val out = Survival.survivalQuantiles(subj, Seq("cohort"),
      "dur", "obs")
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    // S: 0.75, 0.5, 0.25, 0 at t = 1..4 (9-dec snap lands exact)
    assert(k.getAs[Long]("t_25") == 1L)
    assert(k.getAs[Long]("median_t") == 2L)
    assert(k.getAs[Long]("t_75") == 3L)
    val h = out("h")
    assert(h.getAs[Long]("t_25") == 1L) // 2/3 <= 0.75
    assert(h.isNullAt(h.fieldIndex("median_t")))
    assert(h.isNullAt(h.fieldIndex("t_75")))
  }
}
