package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Customer-base segmentation operators — the marketing-analytics
 * staples (reference scope: goetl's aggregation surface stops at
 * grouped metrics; scoring cohorts on top of them is left to the
 * user — here it is a first-class operator).
 */
object Segmentation {

  /**
   * RFM scoring per customer within a cohort: Recency (latest
   * activity date), Frequency (event count), Monetary (summed spend),
   * each cut into `buckets` equal-frequency scores 1…`buckets`
   * (`buckets` = best: most recent / most frequent / highest spend),
   * plus the concatenated segment label ("555" = champions) — the
   * classic base-segmentation scheme behind churn and campaign
   * targeting.
   *
   * Scores come from the EXACT equal-frequency cut `⌊(r−1)·k/n⌋+1`
   * on a rank that is made TOTAL by the customer id tie-break (the
   * same discipline as [[graft.agg.Stats.liftTable]] — without it,
   * equal spends straddling a score boundary land nondeterministically).
   * Monetary ranks on the EXACT decimal sum; the output `monetary`
   * column is its double cast.
   *
   * Scoring is per cohort (e.g. market, country): scores compare
   * customers against their cohort, and the rank windows partition by
   * the cohort keys — at 100 TB a single global window would be a
   * one-partition sort, cohort windows are parallel. For one global
   * cohort pass a constant column and accept the single sort.
   *
   * Output: (cohortKeys…, customer, last_date, frequency, monetary,
   * r_score, f_score, m_score, segment).
   *
   * Scale posture: one map-side-combined (cohort, customer)
   * aggregation, then ONE cohort exchange carries all three rank
   * windows (same partitioning, three orderings) and the closing
   * projection.
   */
  def rfmScores(df: DataFrame, cohortKeys: Seq[String],
                customerCol: String, dateCol: String, amountCol: String,
                amountScale: Int = 2, buckets: Int = 5): DataFrame = {
    require(cohortKeys.nonEmpty, "rfmScores needs cohort keys " +
      "(pass a constant column for a global cohort)")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val kc = cohortKeys.map(col)
    val base = df
      .filter(col(customerCol).isNotNull && col(dateCol).isNotNull &&
        col(amountCol).isNotNull)
      .groupBy(kc :+ col(customerCol): _*)
      .agg(max(col(dateCol)).as("last_date"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast(s"decimal(18,$amountScale)")).as("__mon"))
    val wk = Window.partitionBy(kc: _*)
    val n = count(lit(1)).over(wk)
    // score k..1 by rank BEST-first: bucket ⌊(r−1)·k/n⌋+1 via exact
    // integer arithmetic (the subtract-remainder floor), then invert
    def score(ord: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column = {
      val r = row_number().over(wk.orderBy(ord: _*))
      val num = (r - 1L).cast("long") * lit(buckets.toLong)
      lit(buckets.toLong + 1L) -
        (((num - pmod(num, n)) / n).cast("long") + 1L)
    }
    base
      .withColumn("r_score",
        score(Seq(col("last_date").desc, col(customerCol).asc)))
      .withColumn("f_score",
        score(Seq(col("frequency").desc, col(customerCol).asc)))
      .withColumn("m_score",
        score(Seq(col("__mon").desc, col(customerCol).asc)))
      .select(kc ++ Seq(col(customerCol), col("last_date"),
        col("frequency"), col("__mon").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment")): _*)
  }
}
