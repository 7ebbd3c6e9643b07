package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Categorical feature encoders — the fit-and-transform preprocessing
 * steps of an ML feature pipeline, expressed as single queries (the
 * "fit" is an aggregation, the "transform" a join/window against it)
 * so they distribute, incrementalize, and audit like any other
 * relational operator.
 */
object Encode {

  /**
   * Target (mean) encoding with additive smoothing: each category
   * value maps to `(Σy + m·prior) / (n + m)` — the category's label
   * mean shrunk toward the global prior by pseudo-count `m`, the
   * standard high-cardinality-categorical encoder.
   *
   * With `leaveOneOut = true`, each ROW's own label is excluded from
   * its category's statistic (`(Σy − yᵢ + m·prior) / (n − 1 + m)`) —
   * the leakage-safe variant for encoding the training split itself.
   *
   * Engine-exact arithmetic: labels snap to the 10⁻⁹ decimal grid, so
   * every Σy (global, per-category, leave-one-out) is an exact
   * decimal; the closing is one pinned IEEE division per row. Rows
   * with null category or label are passed through with a null
   * encoding.
   *
   * Output: input columns + `outCol` (double).
   *
   * Scale posture: fit = one map-side-combined aggregation to the
   * category grid; transform = a broadcast-sized join back (the grid
   * is |categories| rows) — or, leave-one-out, one category-keyed
   * window pass instead (no join at all). The 1-row global prior is
   * a broadcast literal either way.
   */
  def targetEncode(df: DataFrame, catCol: String, labelCol: String,
                   smoothing: Double = 20.0, leaveOneOut: Boolean = false,
                   out: String = "encoded"): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val y9 = col(labelCol).cast("double")
    val y = round(y9, 9).cast("decimal(18,9)")
    val ok = col(catCol).isNotNull && col(labelCol).isNotNull
    val g = df.agg(
      sum(when(ok, y)).as("__gs"),
      sum(when(ok, 1L).otherwise(0L)).as("__gn"))
    val prior = col("__gs").cast("double") / col("__gn").cast("double")
    val m = lit(smoothing)
    if (leaveOneOut) {
      val w = Window.partitionBy(when(ok, col(catCol)))
      df.crossJoin(broadcast(g))
        .withColumn("__cs", sum(when(ok, y)).over(w))
        .withColumn("__cn", sum(when(ok, 1L).otherwise(0L)).over(w))
        .withColumn(out,
          when(ok && (col("__cn") - 1L + m) > 0.0,
            ((col("__cs") - y).cast("double") + m * prior) /
              ((col("__cn") - 1L).cast("double") + m)))
        .drop("__gs", "__gn", "__cs", "__cn")
    } else {
      val grid = df.filter(ok)
        .groupBy(col(catCol).as("__cat"))
        .agg(sum(y).as("__cs"), count(lit(1)).as("__cn"))
      df.crossJoin(broadcast(g))
        .join(broadcast(grid), col(catCol) === col("__cat"), "left")
        .withColumn(out,
          when(ok,
            (col("__cs").cast("double") + m * prior) /
              (col("__cn").cast("double") + m)))
        .drop("__gs", "__gn", "__cat", "__cs", "__cn")
    }
  }

  /**
   * Deterministic label indexing (StringIndexer without the fit
   * object): categories map to dense indexes 0..k−1 ordered by
   * (frequency DESC, value ASC) — a total order, so the SAME corpus
   * yields the SAME index on any engine/partitioning (Spark ML's
   * StringIndexer leaves equal-frequency order undefined; this
   * doesn't). Null categories encode null.
   *
   * Output: input columns + `outCol` (long).
   *
   * Scale posture: fit = one map-side-combined count to the category
   * grid + a grid-sized rank window; transform = a broadcast join.
   */
  def indexEncode(df: DataFrame, catCol: String,
                  out: String = "encoded"): DataFrame = {
    val grid = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("__cat"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__idx", row_number().over(
        Window.orderBy(col("__n").desc, col("__cat").asc)).cast("long") - 1L)
    df.join(broadcast(grid.select(col("__cat"), col("__idx"))),
        col(catCol) === col("__cat"), "left")
      .withColumn(out, col("__idx"))
      .drop("__cat", "__idx")
  }
}
