package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Second-moment statistics (correlation, least squares) computed the
 * only way they can be both DISTRIBUTED and REPRODUCIBLE: every sum
 * (Σx, Σy, Σxy, Σx², Σy²) runs in DECIMAL — exact, order-independent,
 * engine-identical — and the closing formula is a handful of pinned
 * double operations over those exact sums. A naive `corr()` aggregates
 * doubles in partition order: answers drift run to run and can never
 * be hash-verified cross-engine; the decimal path costs one widening
 * cast per term and buys bit-stable statistics at any parallelism.
 *
 * Exactness envelope: inputs must be decimal-representable at the
 * declared scale (money columns, counts, epoch seconds); products and
 * sums must fit DECIMAL(38) — e.g. 10^9-magnitude x with 10^5-scale y
 * over 10^12 rows stays inside. Past that envelope, pre-aggregate or
 * rescale the inputs; don't fall back to double sums.
 *
 * Everything is ONE aggregation pass (all moments for all columns in
 * a single map-side-combined aggregate), then formula arithmetic on
 * the tiny moment relation.
 */
object Stats {

  private def d(c: Column): Column = c.cast("double")

  /**
   * Pairwise Pearson correlation matrix over `cols` (each declared
   * with its decimal scale): one row per unordered pair
   * (col_x, col_y, n, corr), listwise deletion (rows with ANY null
   * among `cols` are excluded, so every pair shares one n).
   *
   * `corr = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − Σx·Σx) · sqrt(n·Σy² −
   * Σy·Σy))`, every operand an exact decimal sum cast once to double;
   * a zero-variance column yields null (0/0 is not a correlation).
   */
  def pearsonMatrix(df: DataFrame, cols: Seq[(String, Int)]): DataFrame = {
    require(cols.length >= 2, "pearsonMatrix needs at least two columns")
    val base = df.filter(cols.map { case (c, _) => col(c).isNotNull }
      .reduce(_ && _))
    def dec(c: String, s: Int) = col(c).cast(s"decimal(18,$s)")
    val moments =
      count(lit(1)).as("__n") +:
        cols.flatMap { case (c, s) =>
          Seq(sum(dec(c, s)).as(s"__s_$c"),
            sum(dec(c, s) * dec(c, s)).as(s"__ss_$c"))
        } ++:
        cols.combinations(2).toSeq.map { case Seq((x, sx), (y, sy)) =>
          sum(dec(x, sx) * dec(y, sy)).as(s"__sxy_${x}_$y")
        }
    val m = base.agg(moments.head, moments.tail: _*)
    val pairs = cols.combinations(2).toSeq.map { case Seq((x, _), (y, _)) =>
      val n = d(col("__n"))
      val sx = d(col(s"__s_$x")); val sy = d(col(s"__s_$y"))
      val vx = n * d(col(s"__ss_$x")) - sx * sx
      val vy = n * d(col(s"__ss_$y")) - sy * sy
      val cov = n * d(col(s"__sxy_${x}_$y")) - sx * sy
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        col("__n").as("n"),
        when(vx > 0 && vy > 0, cov / (sqrt(vx) * sqrt(vy))).as("corr"))
    }
    m.select(explode(array(pairs: _*)).as("__p")).select(col("__p.*"))
  }

  /**
   * Per-group ordinary least squares `y = slope·x + intercept` with
   * the Pearson r alongside — trend-per-segment over exact decimal
   * moments (same envelope and formula discipline as
   * [[pearsonMatrix]]):
   * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`,
   * `intercept = (Σy − slope·Σx) / n`.
   * Zero x-variance → null slope/intercept/corr. Rows with null x or
   * y are excluded.
   *
   * One shuffle on the group keys; the formula runs on |groups| rows.
   */
  def linearFit(df: DataFrame, groupCols: Seq[String],
                xCol: String, yCol: String,
                xScale: Int = 0, yScale: Int = 2): DataFrame = {
    val x = col(xCol).cast(s"decimal(19,$xScale)")
    val y = col(yCol).cast(s"decimal(18,$yScale)")
    val m = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
        sum(y * y).as("__syy"))
    val n = d(col("n"))
    val sx = d(col("__sx")); val sy = d(col("__sy"))
    val vx = n * d(col("__sxx")) - sx * sx
    val vy = n * d(col("__syy")) - sy * sy
    val cov = n * d(col("__sxy")) - sx * sy
    val slope = cov / vx
    m.select(groupCols.map(col) ++ Seq(
      col("n"),
      when(vx > 0, slope).as("slope"),
      when(vx > 0, (sy - slope * sx) / n).as("intercept"),
      when(vx > 0 && vy > 0, cov / (sqrt(vx) * sqrt(vy))).as("corr")): _*)
  }

  /**
   * Welch's unequal-variance t-test per group: for each key, compare
   * `valueCol` between the rows labeled `aLabel` and `bLabel` in
   * `groupCol` — the A/B-testing workhorse when variances differ
   * (always assume they do). Emits the t statistic and the
   * Welch-Satterthwaite degrees of freedom; p-values belong to the
   * caller's lookup (the incomplete beta is not engine-reproducible
   * arithmetic, t and dof are).
   *
   * Pinned arithmetic (the [[pearsonMatrix]] discipline): per-arm
   * count / Σx / Σx² as EXACT DECIMAL(18,2)-grid sums in ONE
   * aggregation pass, then a fixed IEEE composition: mean = s/n,
   * sample variance = (n·ss − s·s) / (n·(n−1)) — cross-multiplied,
   * single division — se² = v1/n1 + v2/n2 (left-to-right),
   * t = (m1 − m2)/sqrt(se²), dof = se²²/((v1/n1)²/(n1−1) +
   * (v2/n2)²/(n2−1)). sqrt is IEEE-correctly-rounded, so any engine
   * replays every bit. Arms with n < 2 (or zero variance in both
   * arms) yield null t/dof.
   *
   * Magnitude bound: v·v is computed at Spark's capped DECIMAL(38,4),
   * so Σv² must fit 34 integer digits — |v| ≤ ~1e15 with up to ~1e4
   * rows per arm, tightening with n (√(10³⁴/n) per value). Past the
   * bound Spark (ANSI off) nulls the moment SILENTLY while
   * HUGEINT-backed engines keep exact sums — t/dof degrade to null
   * and engines diverge; values that large are not on a money grid,
   * rescale upstream.
   *
   * Output: (keys…, n_a, n_b, mean_a, mean_b, t, dof).
   *
   * Scale posture: one key-partitioned exchange of CONSTANT-width
   * partial moments (map-side combined); nothing row-sized survives
   * the aggregation.
   */
  def welchT(df: DataFrame, keys: Seq[String], groupCol: String,
             aLabel: String, bLabel: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    def arm(l: String) = when(col(groupCol) === l, lit(1)).otherwise(lit(0))
    val m = df
      .filter(col(valueCol).isNotNull &&
        (col(groupCol) === aLabel || col(groupCol) === bLabel))
      .groupBy(keys.map(col): _*)
      .agg(sum(arm(aLabel)).as("n_a"),
        sum(when(col(groupCol) === aLabel, v)).as("__sa"),
        sum(when(col(groupCol) === aLabel, v * v)).as("__ssa"),
        sum(arm(bLabel)).as("n_b"),
        sum(when(col(groupCol) === bLabel, v)).as("__sb"),
        sum(when(col(groupCol) === bLabel, v * v)).as("__ssb"))
    val na = d(col("n_a")); val nb = d(col("n_b"))
    val sa = d(col("__sa")); val sb = d(col("__sb"))
    val ssa = d(col("__ssa")); val ssb = d(col("__ssb"))
    val va = (na * ssa - sa * sa) / (na * (na - lit(1.0)))
    val vb = (nb * ssb - sb * sb) / (nb * (nb - lit(1.0)))
    val sea = va / na
    val seb = vb / nb
    val se2 = sea + seb
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0.0
    m.select(keys.map(col) ++ Seq(
      col("n_a"), col("n_b"),
      when(col("n_a") > 0, sa / na).as("mean_a"),
      when(col("n_b") > 0, sb / nb).as("mean_b"),
      when(ok, (sa / na - sb / nb) / sqrt(se2)).as("t"),
      when(ok, (se2 * se2) /
        ((sea * sea) / (na - lit(1.0)) + (seb * seb) / (nb - lit(1.0))))
        .as("dof")): _*)
  }
}
