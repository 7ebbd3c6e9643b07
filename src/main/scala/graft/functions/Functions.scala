package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/**
 * SQL-surface registration: exposes graft's custom functions to
 * `spark.sql(...)` users, so the engine's capabilities are reachable
 * from pure SQL as well as the Scala API (the reference is
 * library-only; this is part of the Spark-native surface).
 */
object Functions {

  /** Register all graft SQL functions on the session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    // Exact weighted mean (graft.agg.Aggregators.WeightedMean).
    spark.udf.register("graft_weighted_mean",
      udaf(new graft.agg.Aggregators.WeightedMean))
    // Native vector kernels (graft_dot, graft_sqdist).
    VectorExpressions.register(spark)
  }
}
