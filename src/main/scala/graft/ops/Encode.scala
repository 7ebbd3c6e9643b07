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

  /**
   * Deterministic STRATIFIED k-fold assignment: within each stratum,
   * rows rank by `idCol` (a total order when ids are unique — the
   * q207 discipline) and fold `(rank − 1) mod k` — every stratum
   * splits ⌊n/k⌋-or-⌈n/k⌉ per fold, so class balance survives the
   * split exactly (the property random assignment only has in
   * expectation), and the SAME input always yields the SAME folds:
   * reproducible CV without storing an assignment table.
   *
   * Rows with a null stratum form their own stratum (they still need
   * a fold); a null id would break the total order — require it.
   *
   * Output: input columns + `outCol` (int in [0, k)).
   *
   * Scale posture: one stratum exchange carries the rank window;
   * nothing else. No join, no grid, no collect.
   */
  def kFoldAssign(df: DataFrame, strataCols: Seq[String], idCol: String,
                  k: Int, out: String = "fold"): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col(idCol))
    df.withColumn(out,
      ((row_number().over(w) - 1) % k).cast("int"))
  }

  /**
   * CLASSIC (rank-mean) quantile normalization across slices: each
   * slice's r-th smallest value is replaced by the MEAN of the r-th
   * smallest values over ALL slices — forcing every slice onto one
   * reference distribution while preserving each slice's internal
   * ranking (the batch-effect-removal standard from bioinformatics,
   * equally at home harmonizing per-source score scales before
   * training-data mixing).
   *
   * Which one do you want? THIS (rank-mean, per-row ranks, idCol tie
   * order) when slices have comparable sizes and you want the
   * textbook rank→reference-mean mapping; [[graft.ops.Normalize
   * .quantileNormalize]] (pooled-CDF alignment on the value GRID,
   * midpoint ties) when values repeat heavily or slices are wildly
   * uneven — it matches quantiles of the pooled distribution rather
   * than averaging rank-by-rank.
   *
   * Unequal slice sizes: rank r's reference is the mean over the
   * slices that HAVE an r-th element — deterministic and exact,
   * reducing to classic quantile normalization when sizes match.
   * Ties within a slice break by `idCol` (total order), matching the
   * rank they'd have in any engine.
   *
   * Engine-exact: values snap to the 10⁻⁹ grid; each rank's reference
   * mean is an exact decimal sum / count with ONE closing double
   * division. Null value/slice rows pass through with a null output.
   *
   * Output: input columns + `outCol` (double).
   *
   * Scale posture: one slice exchange for the rank window; the rank
   * grid (max slice length × 1 row) collapses map-side and comes
   * back as an equi-join keyed on rank — Spark plans it
   * broadcast when the grid is small and sort-merge when a slice is
   * genuinely huge; either way it is rank-keyed, never row-keyed.
   */
  def rankMeanNormalize(df: DataFrame, sliceCol: String, valueCol: String,
                        idCol: String, out: String = "value_qn")
  : DataFrame = {
    val ok = col(sliceCol).isNotNull && col(valueCol).isNotNull
    val y = round(col(valueCol).cast("double"), 9).cast("decimal(18,9)")
    // not-ok rows all land in the when()-null partition, so they can
    // never occupy (and shift) a real slice's ranks
    val w = Window.partitionBy(when(ok, col(sliceCol)))
      .orderBy(y.asc, col(idCol).asc)
    // the ranked frame feeds TWO consumers (the reference aggregate
    // and the join-back); without materialization each branch re-runs
    // the corpus-wide rank window — the resampleFill double-consumer
    // trade, settled the same way: lazy localCheckpoint = one window
    // pass + a local spill, instead of 2× (scan + exchange + sort)
    val ranked = df.withColumn("__r",
      when(ok, row_number().over(w)))
      .localCheckpoint(false)
    val ref = ranked.filter(col("__r").isNotNull)
      .groupBy(col("__r").as("__rr"))
      .agg((sum(y).cast("double") / count(lit(1)).cast("double"))
        .as("__ref"))
    ranked.join(ref, ranked("__r") === ref("__rr"), "left")
      .withColumn(out, col("__ref"))
      .drop("__r", "__rr", "__ref")
  }
}
