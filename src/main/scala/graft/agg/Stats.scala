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
}
