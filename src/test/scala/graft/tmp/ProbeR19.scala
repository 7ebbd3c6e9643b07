package graft.tmp

import org.apache.spark.sql.functions._

/** Round-19 scale probe: the two one-pass panels — driftPanel (KS +
 *  CvM + AD + Kuiper + W1) and rankPanel (MWU + Cliff + Brunner-
 *  Munzel) — at 1x and 64x the gate row count off gate-shaped
 *  fixtures, in both value-cardinality regimes (BOUNDED grid ≤5k
 *  distinct cents per key — the design case; UNBOUNDED — every row
 *  its own cent value, the worst case), wall + driver heap observed.
 *  The claim under test: a panel costs ONE grid collapse + ONE key
 *  exchange regardless of member count, so its 64x curve must look
 *  like its single heaviest member's, not like five (three) of them.
 *  For calibration each run also times the heaviest single member
 *  (andersonDarling for drift, brunnerMunzel for rank) on the same
 *  fixture. Scratch main; results land in PLANS.md. */
object ProbeR19 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.local(8, "probe-r19", 8)
    spark.sparkContext.setLogLevel("ERROR")

    def heapMB: Long = {
      val r = Runtime.getRuntime
      System.gc()
      (r.totalMemory - r.freeMemory) / (1024 * 1024)
    }
    def time[A](label: String)(f: => A): Unit = {
      val h0 = heapMB
      val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-34s wall=${w}%7.2f s heap=${h0}%5d -> ${heapMB}%5d MB")
    }
    def fixture(mult: Int, bounded: Boolean) = {
      val rows = 10000L * mult
      val cents =
        if (bounded) (col("id") * 37) % 20000
        else col("id") * 7 + 1
      spark.range(rows)
        .select(col("id"),
          (col("id") % 4).cast("string").as("k"),
          when(col("id") % 8 < 4, "a").otherwise("b").as("arm"),
          cents.cast("double").as("c"))
        .withColumn("value", col("c") / 100.0)
        .localCheckpoint(true)
    }

    for (mult <- Seq(1, 64); bounded <- Seq(true, false)) {
      val regime = if (bounded) "bounded-grid" else "distinct-vals"
      val df = fixture(mult, bounded)
      time(s"driftPanel ${mult}x $regime") {
        graft.agg.Stats.driftPanel(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
      time(s"andersonDarling ${mult}x $regime") {
        graft.agg.Stats.andersonDarling(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
      time(s"rankPanel ${mult}x $regime") {
        graft.agg.Stats.rankPanel(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
      time(s"brunnerMunzel ${mult}x $regime") {
        graft.agg.Stats.brunnerMunzel(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
      df.unpersist()
    }
    spark.stop()
  }
}
