package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution alignment across sources. The ML-preprocessing
 * workhorse re-expressed relationally: make every source's value
 * column follow the POOLED distribution, so downstream thresholds and
 * mixtures compare like with like ("source A's length histogram is
 * shifted — normalize before the quality gate").
 */
object Normalize {

  /**
   * Discrete quantile normalization: each row's `valueCol` is replaced
   * by the pooled-distribution value at the row's own within-source
   * quantile — after it, every source has (as nearly as the discrete
   * grid allows) the SAME value distribution. Tie handling is the
   * midpoint convention: all rows of a source sharing a value map
   * through the tie run's midpoint rank, so equal inputs map to equal
   * outputs and the result is engine-reproducible with no row-identity
   * tie-breaks at all.
   *
   * Which one do you want? THIS (pooled-CDF alignment on the value
   * GRID, midpoint ties) when values repeat heavily or source sizes
   * are wildly uneven; [[graft.ops.Encode.rankMeanNormalize]] for the
   * CLASSIC bioinformatics rank-mean form (per-row ranks, id
   * tie-break, rank-wise reference means).
   *
   * Mechanics (all integer arithmetic): per source, the value grid's
   * doubled midpoint rank `lo+hi`; target pooled rank
   * `⌈(lo+hi)/2 · n_pool / n_src⌉ = (lo+hi)·n_pool + 2·n_src − 1) div
   * (2·n_src)`; the pooled CDF maps that rank back to a value.
   *
   * Output: input columns + `normalized` (the pooled value, at
   * `valueCol`'s decimal grid). Rows with a null source or value pass
   * through with null `normalized`.
   *
   * Scale posture: every statistic lives on the (source, value) GRID,
   * never on rows — per-source CDFs shuffle |grid| rows, the pooled
   * CDF's global window orders DISTINCT values only (grid-bounded; for
   * continuous doubles, bucket upstream — the scaladoc contract), and
   * the rank→value map explodes to n_pool rows ONCE for an equi-join
   * (shuffle-joinable at any scale; AQE broadcasts it when small). The
   * only corpus-sized operation is the final (source, value) equi-join
   * attaching `normalized` back to rows.
   */
  def quantileNormalize(df: DataFrame, sourceCol: String, valueCol: String,
                        valueScale: Int = 2,
                        out: String = "normalized"): DataFrame = {
    val v = col(valueCol).cast(s"decimal(18,$valueScale)")
    // checkpoint the 2-column projection: grid, pooled CDF, n_pool and
    // the rank map all derive from it — without this the source scans
    // once per consumer
    val base = df.filter(col(sourceCol).isNotNull && col(valueCol).isNotNull)
      .select(col(sourceCol).as("__src"), v.as("__v"))
      .localCheckpoint(false)
    // per-source value grid with doubled midpoint rank lo+hi
    val ws = Window.partitionBy(col("__src")).orderBy(col("__v"))
    val grid = base.groupBy(col("__src"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(ws))
      .withColumn("__r2", lit(2L) * col("__cum") - col("__c") + 1L)
      .withColumn("__ns",
        sum(col("__c")).over(Window.partitionBy(col("__src"))))
    // pooled CDF over distinct values (grid-bounded global window)
    val pooled = base.groupBy(col("__v").as("__pv"))
      .agg(count(lit(1)).as("__pc"))
      .withColumn("__pcum", sum(col("__pc")).over(Window.orderBy(col("__pv"))))
    val np = pooled.agg(max(col("__pcum")).as("__np"))
    // rank -> pooled value map, equi-joinable
    val rankMap = pooled.select(col("__pv"),
      explode(sequence(col("__pcum") - col("__pc") + lit(1L), col("__pcum")))
        .as("__t"))
    val tNum = col("__r2") * col("__np") + lit(2L) * col("__ns") - 1L
    val tDen = lit(2L) * col("__ns")
    val mapped = grid.crossJoin(broadcast(np))
      .withColumn("__t", ((tNum - pmod(tNum, tDen)) / tDen).cast("long"))
      .join(rankMap, Seq("__t"))
      .select(col("__src"), col("__v"), col("__pv"))
    df.withColumn("__src", col(sourceCol))
      .withColumn("__v", v)
      .join(mapped, Seq("__src", "__v"), "left")
      .withColumn(out, col("__pv"))
      .drop("__src", "__v", "__pv")
  }
}
