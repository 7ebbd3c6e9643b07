package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mergeable distinct-count sketches (Apache DataSketches HLL, the
 * `hll_sketch_agg` family Spark ships natively) — the pre-aggregation
 * shape exact `count(distinct)` cannot take: distinct counts do NOT
 * roll up (Σ per-day distincts ≠ monthly distinct), so a 100 TB
 * pipeline either re-scans raw data for every grain of a distinct-
 * count cube, or materializes SKETCHES once at the finest grain and
 * re-merges them upward — a byte-column union, no raw-data re-scan.
 * This module is that workflow:
 *
 *   sketches(raw, day grain)  →  tiny sketch table, persisted
 *   rollup(sketches, month)   →  merged sketches + estimates,
 *                                 raw data never touched again
 *
 * Estimates are NOT bit-stable: DataSketches HLL merge results shift
 * by a register or two with merge ORDER (sparse→dense promotion
 * depends on the partial layout — observed 1997 vs 1999 on the same
 * 2000 values under different partitionings), and the arithmetic is
 * not portable across engines at all (DuckDB's HLL differs). So the
 * gate asserts the ACCURACY CONTRACT against exact distinct counts
 * (|est − exact| ≤ tol·exact, with the exact side oracle-replayed)
 * rather than hash-matching the estimate itself — the q135 pattern:
 * engine-dependent value, engine-independent claim. `hll_sketch_
 * estimate` returns a rounded BIGINT.
 */
object Sketches {

  /** Per-group HLL sketches over `valueCol` at the finest grain you
   *  will ever query — one raw-data pass, output rows are
   *  (groupCols…, sketch binary). `lgK = 12` ⇒ ~1.6% RSE, 4 KB max
   *  per sketch. */
  def sketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
               lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll sketches UP to a coarser grain (a subset of the sketch
   *  table's group columns): merges the binary sketches — never the
   *  raw data — and surfaces the distinct-count estimate. */
  def rollup(sketchDf: DataFrame, groupCols: Seq[String]): DataFrame =
    sketchDf.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))

  /**
   * EXACT heavy hitters without a full-vocabulary shuffle: every item
   * whose frequency is ≥ `ceil(fraction · N)`, found by per-partition
   * Misra-Gries candidate generation + an exact recount of the
   * candidates only. The point at corpus scale: a naive
   * `groupBy(item) HAVING count ≥ t` shuffles the ENTIRE item
   * vocabulary (trillions of (token, 1) partials for a 100 TB text
   * corpus) to keep a handful of rows; here the shuffle carries at
   * most `partitions · k` candidate keys plus their exact counts.
   *
   * Why the answer is exact: an item with global count > N/(k+1)
   * must exceed N_p/(k+1) in at least one partition (pigeonhole), and
   * Misra-Gries with k counters over a partition of N_p items keeps
   * every key whose count exceeds N_p/(k+1). So the union of
   * per-partition MG keys is a SUPERSET of every item at or above the
   * threshold whenever `fraction > 1/(k+1)` (enforced), and the
   * recount pass — filtered to the broadcast candidate set before its
   * groupBy — returns exact counts to threshold against. MG's
   * per-partition output depends on encounter order, but any superset
   * yields the same final answer: candidates are a recall set, the
   * recount is the truth.
   *
   * Output: (item, n_item) with `n_item ≥ ceil(fraction · N)`, the
   * ceil in DECIMAL (a double `0.07·100 → 7.000…01` would overshoot
   * the threshold by one).
   *
   * Scale posture: two scans of `df` (candidate pass, recount pass —
   * cache upstream if the input is itself expensive), zero
   * vocabulary-sized shuffles, candidate set ≤ partitions · k rows
   * broadcast back. `N` is one `count()` action — a scalar, not a
   * collect.
   */
  def heavyHitters(df: DataFrame, itemCol: String, fraction: Double,
                   k: Int): DataFrame = {
    require(fraction > 0 && fraction < 1, s"fraction in (0,1), got $fraction")
    require(k + 1 > 1 / fraction,
      s"need k + 1 > 1/fraction for the Misra-Gries recall guarantee " +
        s"(k=$k, fraction=$fraction)")
    val items = df.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("item"))
    val n = items.count()
    val thr = (BigDecimal(fraction.toString) * BigDecimal(n))
      .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
    import items.sparkSession.implicits._
    val candidates = items.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { item =>
        if (counters.contains(item)) counters(item) += 1L
        else if (counters.size < k) counters(item) = 1L
        else {
          // decrement-all step; drop zeroed counters
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.foreach { case (key, v) => if (v <= 0L) dead += key }
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
    items.join(broadcast(candidates), Seq("item"), "leftsemi")
      .groupBy("item").agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= thr)
  }
}
