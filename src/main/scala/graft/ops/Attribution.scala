package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Multi-touch conversion attribution: credit each conversion to the
 * touches (clicks, impressions, emails) that preceded it within a
 * lookback window — the marketing-ETL primitive behind "which channel
 * gets the revenue". Emits the three standard models at once as
 * columns (first-touch, last-touch, linear), so downstream chooses by
 * selecting, not recomputing.
 */
object Attribution {

  /**
   * One output row per (conversion, attributed touch): the touches of
   * the same key whose time lies in `[convTime − windowMicros,
   * convTime)`. Conversions with NO touch in the window still emit
   * one row (null touch columns, n_touch = 0) so revenue reconciles.
   *
   * Columns: (keys…, conv_id, conv_value, touch_id, n_touch,
   * is_first, is_last, w_linear) — `is_first`/`is_last` flag the
   * earliest/latest touch (ties broken by touch id, a total order),
   * `w_linear = 1/n_touch` (one pinned IEEE division; multiply by
   * conv_value downstream for linear revenue). Every engine computes
   * the same bits.
   *
   * Scale posture: one key-equi join (touch streams and conversion
   * streams both partition by the key), range predicate applied as a
   * post-join filter — per-key blow-up is bounded by touches within
   * the lookback window, the quantity a caller already controls with
   * `windowMicros`. The per-conversion count/rank windows ride ONE
   * conv-keyed exchange. Hot keys (bot users) ride AQE skew handling;
   * cap their touch volume upstream if a key's window exceeds a task.
   */
  def attribute(touches: DataFrame, conversions: DataFrame,
                keys: Seq[String], touchId: String, touchTime: String,
                convId: String, convTime: String, convValue: String,
                windowMicros: Long): DataFrame = {
    require(keys.nonEmpty, "attribute needs key columns")
    val t = touches.select(keys.map(col) :+
      col(touchId).as("touch_id") :+
      unix_micros(col(touchTime)).as("__tt"): _*)
    val c = conversions.select(keys.map(col) :+
      col(convId).as("conv_id") :+
      col(convValue).as("conv_value") :+
      unix_micros(col(convTime)).as("__ct"): _*)
    val joined = c.join(t, keys, "left")
      .withColumn("__hit",
        col("__tt").isNotNull && col("__tt") < col("__ct") &&
          col("__tt") >= col("__ct") - lit(windowMicros))
    val wc = Window.partitionBy(col("conv_id"))
    // hits rank first in both directions, so rank 1 is the earliest /
    // latest HIT when any exists (and a deterministic placeholder row
    // when none does); the tie chain ends in the unique touch id
    val wAsc = wc.orderBy(col("__hit").desc,
      col("__tt").asc_nulls_last, col("touch_id").asc_nulls_last)
    val wDesc = wc.orderBy(col("__hit").desc,
      col("__tt").desc_nulls_last, col("touch_id").desc_nulls_last)
    val n = sum(when(col("__hit"), 1L).otherwise(0L)).over(wc)
    // keep matched touches, plus ONE row for touchless conversions
    joined
      .withColumn("__n", n)
      .withColumn("__rka",
        row_number().over(wAsc))
      .withColumn("__rkd",
        row_number().over(wDesc))
      .filter(col("__hit") || (col("__n") === 0 && col("__rka") === 1))
      .select(keys.map(col) ++ Seq(
        col("conv_id"), col("conv_value"),
        when(col("__hit"), col("touch_id")).as("touch_id"),
        col("__n").as("n_touch"),
        when(col("__hit"), col("__rka") === 1).as("is_first"),
        when(col("__hit"), col("__rkd") === 1).as("is_last"),
        when(col("__hit"),
          lit(1.0) / col("__n").cast("double")).as("w_linear")): _*)
  }
}
