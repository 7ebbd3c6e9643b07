package graft.tmp

import org.apache.spark.sql.functions._

/** Round-18 scale probe (round-17 verdict #6): run the drift-distance
 *  panel's heaviest members — wasserstein1 / energyDistance (CDF-
 *  segment integrals on the value grid) and hodgesLehmann (the one
 *  with a documented grid×grid-per-key join envelope) — at 1x and
 *  64x the gate row count off gate-shaped fixtures, and report wall
 *  + driver-observed heap, so the "shuffled bytes scale with
 *  DISTINCT VALUES, not rows" posture is MEASURED, not argued.
 *
 *  Two value-cardinality regimes: a BOUNDED grid (≤5k distinct cents
 *  per key — the panel's design case, the grid collapse pays for
 *  itself) and an UNBOUNDED one (every row its own cent value — the
 *  worst case). The window-pass operators run both regimes at 1x and
 *  64x; hodgesLehmann's distinct-vals arm instead steps 1x → 8x → 16x
 *  because its pair-product envelope (|grid_a|·|grid_b| ≤ ~10⁸ per
 *  key, scaladoc) is CROSSED at 8x on this fixture ((1250·8)² = 10⁸)
 *  — the probe measures the approach to the cliff rather than
 *  pretending the documented cap doesn't exist. (The arm column is
 *  id%8<4, NOT id%2: with 4 keys from id%4, a parity arm would be
 *  constant within each key and the pair join would be empty.)
 *  Scratch main; results land in PLANS.md. */
object ProbeR18 {
  def main(args: Array[String]): Unit = {
    // "ad-only": just the andersonDarling rows (added wave 6 — the
    // rest of the table was already measured and recorded)
    val adOnly = args.contains("ad-only")
    val spark = graft.core.Engine.local(8, "probe-r18", 8)
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
      println(s"[probe] ---- ${10000L * mult} rows (x$mult, $regime) ----")
      time(s"andersonDarling x$mult $regime") {
        graft.agg.Stats.andersonDarling(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
      if (!adOnly) time(s"wasserstein1 x$mult $regime") {
        graft.agg.Stats.wasserstein1(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
      if (!adOnly) time(s"energyDistance x$mult $regime") {
        graft.agg.Stats.energyDistance(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
      if (bounded && !adOnly) time(s"hodgesLehmann x$mult $regime") {
        graft.agg.Stats.hodgesLehmann(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
    }
    // hodgesLehmann distinct-vals: pair products per key are
    // (1250·m)² — 1.56e6 at 1x, 1e8 at 8x (the documented envelope),
    // 4e8 at 16x (past it; expect the superlinear wall)
    for (mult <- Seq(1, 8, 16) if !adOnly) {
      val df = fixture(mult, bounded = false)
      println(s"[probe] ---- ${10000L * mult} rows (x$mult, " +
        s"distinct-vals, hl pair grid = ${1250L * mult} x " +
        s"${1250L * mult} per key) ----")
      time(s"hodgesLehmann x$mult distinct-vals") {
        graft.agg.Stats.hodgesLehmann(df, Seq("k"), "arm", "a", "b",
          "value").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
