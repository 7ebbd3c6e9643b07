package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Survival analysis over subject-level durations — retention/churn
 * curves with CENSORING done right (users still active at the
 * observation edge are not churns; dropping them biases every naive
 * retention query).
 */
object Survival {

  /**
   * Kaplan-Meier estimator per cohort. Input: one row per subject
   * with a non-negative integer `durationCol` (time to event or to
   * censoring) and a boolean `observedCol` (true = the event
   * happened; false = censored at that duration). Output: one row per
   * (cohort, duration) event time with the at-risk count, deaths,
   * censorings, and the LOG survival function
   * `log_surv = Σ_{t' ≤ t} ln((n_{t'} − d_{t'})/n_{t'})`
   * (survival itself is `exp(log_surv)` — left to the caller, because
   * `exp` is not engine-pinned arithmetic while this log sum is).
   *
   * Conventions: deaths precede censorings at equal time (both still
   * count as at-risk at their own time — the standard KM tie rule);
   * rows where everyone at risk dies (`n_t = d_t`, survival hits 0)
   * emit null `log_surv` — by construction that can only be a
   * cohort's final event time.
   *
   * Reproducibility: counts are exact; each factor's log is the
   * libm-consistent [[graft.functions.MathFunctions.libmLog]] of one
   * pinned double division, rounded to 9 decimals onto a decimal
   * grid; the running sum accumulates in DECIMAL (exact,
   * order-independent) and casts to double once — the sum's integer
   * units stay far under 2⁵³, so the cast is single-rounded in every
   * engine.
   *
   * Scale posture: one (keys, duration) aggregation collapses
   * subjects to event times; ONE cohort-keyed exchange carries the
   * at-risk window and the running log sum. Nothing row-sized past
   * the first aggregate.
   */
  def kaplanMeier(df: DataFrame, keys: Seq[String], durationCol: String,
                  observedCol: String): DataFrame = {
    val (withRisk, w) = atRisk(df, keys, durationCol, observedCol)
    val logf = when(col("n_risk") > col("d"),
      round(graft.functions.MathFunctions.libmLog(
        (col("n_risk") - col("d")).cast("double") /
          col("n_risk").cast("double")), 9))
    withRisk
      .withColumn("__logf", logf.cast("decimal(12,9)"))
      .withColumn("log_surv",
        when(col("__logf").isNotNull,
          sum(col("__logf")).over(w).cast("double")))
      .select(keys.map(col) ++
        Seq(col("t"), col("n_risk"), col("d"), col("c"),
          col("log_surv")): _*)
  }

  /**
   * Nelson-Aalen cumulative-hazard estimator per cohort — the
   * counting-process companion to [[kaplanMeier]]:
   * `H(t) = Σ_{t' ≤ t} d_{t'} / n_{t'}` over event times. Where KM
   * answers "what fraction survives past t", Nelson-Aalen answers
   * "how much hazard has accumulated by t" — the form that stays
   * well-behaved under heavy ties and feeds hazard-ratio eyeballing.
   *
   * Same input contract, tie rule, and at-risk machinery as
   * [[kaplanMeier]]; censoring-only times contribute 0/n (a real grid
   * row with zero increment — the at-risk drop still matters
   * downstream).
   *
   * Reproducibility: each increment `d/n` is ONE pinned double
   * division rounded to 9 decimals onto a decimal grid; the running
   * sum accumulates in DECIMAL and casts once.
   *
   * Output: (keys…, t, n_risk, d, c, cum_hazard).
   *
   * Scale posture: identical to [[kaplanMeier]] — one (keys, duration)
   * collapse, ONE cohort exchange carrying both windows.
   */
  def nelsonAalen(df: DataFrame, keys: Seq[String], durationCol: String,
                  observedCol: String): DataFrame = {
    val (withRisk, w) = atRisk(df, keys, durationCol, observedCol)
    withRisk
      .withColumn("__h",
        round(col("d").cast("double") / col("n_risk").cast("double"), 9)
          .cast("decimal(12,9)"))
      .withColumn("cum_hazard", sum(col("__h")).over(w).cast("double"))
      .select(keys.map(col) ++
        Seq(col("t"), col("n_risk"), col("d"), col("c"),
          col("cum_hazard")): _*)
  }

  /**
   * Restricted mean survival time per cohort — the AREA under the
   * [[kaplanMeier]] curve up to the horizon τ: "of the first τ time
   * units, how many does the average subject survive?" — the
   * reported effect size when the median is never reached or
   * hazards cross (where a hazard ratio misleads), and the natural
   * companion to [[graft.agg.Stats.logRank]]'s p-value.
   *
   * Pinned semantics: [[kaplanMeier]]'s grid verbatim; survival
   * snaps to the 9-decimal grid (`round(e^log_surv, 9)` — the
   * transcendental-rounding discipline, extinction rows are exact
   * 0); the step-function integral folds in TIME order with a
   * three-double state [area, prev_t, prev_s] clamping each segment
   * at τ, and the open tail [t_last, τ) closes in one pinned chain.
   * Subjects surviving past τ contribute exactly τ.
   *
   * Output: (keys…, n_times, n_events, rmst) — rmst ∈ [0, τ].
   *
   * Scale posture: [[kaplanMeier]]'s one cohort exchange plus a
   * grid-sized fold; per-key state = the distinct-duration grid.
   */
  def rmst(df: DataFrame, keys: Seq[String], durationCol: String,
           observedCol: String, tau: Long): DataFrame = {
    require(tau > 0, s"tau must be > 0, got $tau")
    val km = kaplanMeier(df, keys, durationCol, observedCol)
    val tauD = lit(tau.toDouble)
    val s = when(col("log_surv").isNotNull,
      round(exp(col("log_surv")), 9)).otherwise(lit(0.0))
    val lst = sort_array(collect_list(struct(col("t"),
      s.as("__s"))))
    val fold = aggregate(lst, array(lit(0.0), lit(0.0), lit(1.0)),
      (acc, p) => {
        val eff = least(p.getField("t").cast("double"), tauD)
        val step = when(eff > element_at(acc, 2),
          element_at(acc, 3) * (eff - element_at(acc, 2)))
          .otherwise(lit(0.0))
        array(element_at(acc, 1) + step,
          greatest(element_at(acc, 2), eff), p.getField("__s"))
      })
    val m = (i: Int) => element_at(col("__m"), i)
    km.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_times"), sum(col("d")).as("n_events"),
        fold.as("__m"))
      .select(keys.map(col) ++ Seq(col("n_times"), col("n_events"),
        (m(1) + when(m(2) < tauD, m(3) * (tauD - m(2)))
          .otherwise(lit(0.0))).as("rmst")): _*)
  }

  /**
   * Survival quantiles per cohort — the headline numbers read off
   * the [[kaplanMeier]] curve: `t_25` / `median_t` / `t_75` are the
   * FIRST event times where survival drops to ≤ 0.75 / 0.50 / 0.25
   * ("by when has a quarter / half / three quarters of the cohort
   * churned"). The standard convention (R survfit): a threshold the
   * curve never reaches (heavy censoring) emits null — with
   * censoring, "median survival not reached" IS the result, and any
   * imputation would lie.
   *
   * Pinned semantics: [[rmst]]'s snapped survival verbatim —
   * `round(e^log_surv, 9)` per grid row (extinction rows exact 0),
   * so the ≤-threshold comparisons are grid-exact in every engine;
   * each quantile is one conditional MIN over the event-time grid.
   *
   * Output: (keys…, n_times, n_events, t_25, median_t, t_75).
   *
   * Scale posture: [[kaplanMeier]]'s one cohort exchange plus a
   * closing aggregate over the grid — nothing new materializes.
   */
  def survivalQuantiles(df: DataFrame, keys: Seq[String],
                        durationCol: String,
                        observedCol: String): DataFrame = {
    val km = kaplanMeier(df, keys, durationCol, observedCol)
    val s = when(col("log_surv").isNotNull,
      round(exp(col("log_surv")), 9)).otherwise(lit(0.0))
    def firstAtOrBelow(thr: Double): org.apache.spark.sql.Column =
      min(when(col("d") > 0L && s <= lit(thr), col("t")))
    km.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_times"), sum(col("d")).as("n_events"),
        firstAtOrBelow(0.75).as("t_25"),
        firstAtOrBelow(0.50).as("median_t"),
        firstAtOrBelow(0.25).as("t_75"))
  }

  /** Shared KM/NA grid: subjects collapse to (keys, t) with death and
   *  censoring counts; the at-risk count at t is everyone whose
   *  duration is ≥ t (deaths and censorings at t inclusive — the
   *  standard tie rule). One cohort-keyed exchange carries both the
   *  total and the running windows. */
  private def atRisk(df: DataFrame, keys: Seq[String], durationCol: String,
                     observedCol: String)
  : (DataFrame, org.apache.spark.sql.expressions.WindowSpec) = {
    val g = df
      .filter(col(durationCol).isNotNull && col(durationCol) >= 0 &&
        col(observedCol).isNotNull)
      .groupBy(keys.map(col) :+ col(durationCol).cast("long").as("t"): _*)
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("c"))
    val wk = Window.partitionBy(keys.map(col): _*)
    val w = wk.orderBy(col("t"))
    val withRisk = g
      .withColumn("__tot", sum(col("d") + col("c")).over(wk))
      .withColumn("__cum", sum(col("d") + col("c")).over(w))
      .withColumn("n_risk", col("__tot") - col("__cum") + col("d") + col("c"))
    (withRisk, w)
  }
}
