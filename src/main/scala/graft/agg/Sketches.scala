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
}
