package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for q131 duplicateSpans: does the k-gram
 *  window-count formulation stay LINEAR as the corpus grows — no
 *  pair blowup, no driver materialization?
 *
 *  Feed: the sf0.01 documents table replicated Nx with distinct doc
 *  ids. Replication makes every gram corpus-duplicated, so the hit
 *  relation is the FULL gram relation — the worst case for the
 *  islands stage (every doc collapses to one maximal span). Grams,
 *  hits and output spans must grow exactly linearly in N while the
 *  per-leg wall stays near-linear (the gram shuffle dominates).
 *  A pair-emitting design (or a collected dup set) would go
 *  quadratic / blow the driver here: each gram's occurrence list is
 *  N long, so there are ~grams·N² implicit pairs at 64x.
 */
object DupSpansProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.core.Tables(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    for (n <- Seq(1, 16, 64, 256)) {
      val corpus =
        if (n == 1) base
        else base.crossJoin(spark.range(n).select(col("id").as("__copy")))
          .select((col("doc_id") + col("__copy") * 10000000L).as("doc_id"),
            col("text"))
      for (hashed <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val out = graft.llm.Dedup.duplicateSpans(corpus, "doc_id", "text",
          k = 5, hashGrams = hashed)
        val agg = out.agg(count(lit(1)), sum("span_tokens")).collect()(0)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[probe] ${n}%dx hashed=$hashed%s docs=${500L * n}%d " +
          f"spans=${agg.getLong(0)}%d span_tokens=${agg.getLong(1)}%d wall=${wall}%.1fs")
      }
    }
    spark.stop()
  }
}
