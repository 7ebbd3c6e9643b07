package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * In-flight pipeline observability via Spark's `Observation` /
 * `CollectMetrics`: aggregate metrics (row counts, null counts, exact
 * decimal sums) computed DURING a write action — zero extra passes,
 * unlike a separate metrics query that rescans the source. The
 * production pattern: every sink write also emits its data-quality
 * counters.
 */
object Observe {

  /** The standard counter set for a column: rows, nulls, and (numeric
   *  columns) the exact decimal sum on the given scale. */
  def counters(valueCol: String, scale: Int = 2): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(when(col(valueCol).isNull, 1L).otherwise(0L)).as(s"n_null"),
    sum(col(valueCol).cast(s"decimal(18,$scale)")).as(s"sum_value"))

  /**
   * Run `action` over `df` while observing `metrics` (aggregate
   * expressions), and return the observed values as a ONE-ROW
   * DataFrame — queryable, joinable, writable like any other metric
   * relation.
   *
   * The metrics ride the action's own pass (Spark's CollectMetrics
   * operator); aggregate expressions must be order-independent to be
   * engine-reproducible — counts and decimal sums are, double sums
   * are not (same discipline as everywhere else in graft).
   *
   * Scale posture: zero additional scans; the observation's state is
   * one aggregation buffer per task, merged on the driver.
   */
  def observed(spark: SparkSession, df: DataFrame, metrics: Seq[Column])
              (action: DataFrame => Unit): DataFrame = {
    require(metrics.nonEmpty, "observed needs metric expressions")
    val obs = Observation()
    val instrumented = df.observe(obs, metrics.head, metrics.tail: _*)
    action(instrumented)
    val row = obs.get // blocks until the action's result arrives
    val names = row.keys.toSeq.sorted
    val values = org.apache.spark.sql.Row(names.map(row): _*)
    val schema = org.apache.spark.sql.types.StructType(names.map { n =>
      val fields = instrumented.queryExecution.analyzed.collect {
        case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics =>
          c.metrics.collect {
            case a if a.name == n => a.toAttribute.dataType
          }
      }.flatten
      org.apache.spark.sql.types.StructField(n, fields.head, nullable = true)
    })
    spark.createDataFrame(
      java.util.Collections.singletonList(values), schema)
  }
}
