package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental aggregate maintenance (materialized-view style): keep a
 * compact per-key STATE of mergeable aggregates, fold delta batches
 * into it, and finish to user-facing metrics — the pattern behind
 * hourly-rollup tables that must absorb late batches without
 * rescanning history. Everything here is a plain DataFrame, so the
 * state lives wherever tables live (parquet, a warehouse table) and
 * merging is one relational step.
 *
 * Mergeability is the whole design: count and decimal sums add, min/
 * max combine — so `state(a ∪ b) = merge(state(a), state(b))` holds
 * EXACTLY (decimal sums are order-independent), and a merged state is
 * indistinguishable from a from-scratch one. Averages and other
 * ratios are derived at [[finish]], never stored.
 */
object Incremental {

  /** A measure column and its decimal scale (exact-sum grid). */
  final case class Measure(name: String, scale: Int = 2)

  private def sumCol(m: Measure) = s"sum_${m.name}"
  private def minCol(m: Measure) = s"min_${m.name}"
  private def maxCol(m: Measure) = s"max_${m.name}"

  /** Build the aggregate state of a batch: (keys…, n, and per measure
   *  sum_<c> (exact decimal), min_<c>, max_<c>). Null measure values
   *  are excluded from their own measure only (SQL aggregate
   *  semantics). */
  def aggState(df: DataFrame, keys: Seq[String], measures: Seq[Measure])
  : DataFrame = {
    require(measures.nonEmpty, "aggState needs measures")
    val aggs = count(lit(1)).as("n") +: measures.flatMap { m =>
      val c = col(m.name).cast(s"decimal(18,${m.scale})")
      Seq(sum(c).as(sumCol(m)), min(c).as(minCol(m)), max(c).as(maxCol(m)))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two states (same keys + measures): union then combine —
   *  one grid-sized aggregation, exact. Keys present in only one
   *  state pass through unchanged. */
  def mergeStates(a: DataFrame, b: DataFrame, keys: Seq[String],
                  measures: Seq[Measure]): DataFrame = {
    val aggs = sum(col("n")).as("n") +: measures.flatMap { m =>
      Seq(sum(col(sumCol(m))).as(sumCol(m)),
        min(col(minCol(m))).as(minCol(m)),
        max(col(maxCol(m))).as(maxCol(m)))
    }
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Finish a state to user-facing metrics: per measure, the sum and
   *  min/max as doubles plus `avg_<c>` (one pinned division). The
   *  state's exact decimals stay internal. */
  def finish(state: DataFrame, keys: Seq[String], measures: Seq[Measure])
  : DataFrame = {
    val outs = measures.flatMap { m =>
      Seq(col(sumCol(m)).cast("double").as(sumCol(m)),
        col(minCol(m)).cast("double").as(minCol(m)),
        col(maxCol(m)).cast("double").as(maxCol(m)),
        when(col("n") > 0, col(sumCol(m)).cast("double") /
          col("n").cast("double")).as(s"avg_${m.name}"))
    }
    state.select(keys.map(col) ++ (col("n") +: outs): _*)
  }
}
