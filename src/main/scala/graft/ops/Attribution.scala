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
   * streams both partition by the key) with the range predicate IN
   * the join condition — the probe emits only touches inside the
   * lookback window, so per-key intermediate size is bounded by
   * in-window touches (the quantity a caller already controls with
   * `windowMicros`), never conversions × all touches. Touchless
   * conversions ride the same left join's null extension — no second
   * pass. The per-conversion count/rank windows ride ONE conv-keyed
   * exchange. Hot keys (bot users) ride AQE skew handling; cap their
   * touch volume upstream if a key's window exceeds a task.
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
    // the range lives IN the join condition: the probe never emits a
    // (conversion, touch) pair outside the lookback window, and the
    // left join's null extension IS the touchless-conversion row —
    // one equi-join on the keys, zero post-join blow-up
    val ta = t.alias("__t"); val ca = c.alias("__c")
    val cond = keys.map(k => col(s"__c.$k") === col(s"__t.$k"))
      .reduce(_ && _) &&
      col("__t.__tt") < col("__c.__ct") &&
      col("__t.__tt") >= col("__c.__ct") - lit(windowMicros)
    val joined = ca.join(ta, cond, "left")
      .select(keys.map(k => col(s"__c.$k")) ++ Seq(
        col("conv_id"), col("conv_value"), col("__ct"),
        col("touch_id"), col("__tt")): _*)
    val hit = col("touch_id").isNotNull
    val wc = Window.partitionBy(col("conv_id"))
    // rank 1 is the earliest / latest hit; the tie chain ends in the
    // unique touch id (the null-extension row is alone in its group)
    val wAsc = wc.orderBy(col("__tt").asc_nulls_last,
      col("touch_id").asc_nulls_last)
    val wDesc = wc.orderBy(col("__tt").desc_nulls_last,
      col("touch_id").desc_nulls_last)
    val n = sum(when(hit, 1L).otherwise(0L)).over(wc)
    joined
      .withColumn("__n", n)
      .withColumn("__rka",
        row_number().over(wAsc))
      .withColumn("__rkd",
        row_number().over(wDesc))
      .select(keys.map(col) ++ Seq(
        col("conv_id"), col("conv_value"),
        col("touch_id"),
        col("__n").as("n_touch"),
        when(hit, col("__rka") === 1).as("is_first"),
        when(hit, col("__rkd") === 1).as("is_last"),
        when(hit,
          lit(1.0) / col("__n").cast("double")).as("w_linear")): _*)
  }
}
